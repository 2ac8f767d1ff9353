"""AOT compile-check TPU programs WITHOUT a TPU (no tunnel needed).

libtpu is installed locally, so an unattached v5e topology client can
run the FULL XLA+Mosaic compile pipeline (including Pallas kernel
compilation and VMEM allocation) on this host:

    TPU_ACCELERATOR_TYPE=v5litepod-4 TPU_WORKER_HOSTNAMES=localhost \
    PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
    python tools/aot_check.py

Catches unimplemented Mosaic primitives, layout errors, and VMEM
overflows before ever touching the axon tunnel.  (Found this way:
jnp.cbrt unimplemented in a Pallas kernel.)

Notes:
  - avals must carry a sharding on a ONE-device topology mesh, or XLA
    tries to auto-partition the Mosaic call and refuses.
  - compile only; no execution/timing.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

os.environ.setdefault("TPU_ACCELERATOR_TYPE", "v5litepod-4")
os.environ.setdefault("TPU_WORKER_HOSTNAMES", "localhost")


def main():
    import numpy as np
    import jax
    import jax.numpy as jnp
    from jax.experimental import topologies
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    topo = topologies.get_topology_desc("v5e:2x2", "tpu")
    mesh = Mesh(np.array(topo.devices[:1]), ("d",))
    rep = NamedSharding(mesh, P())

    def shaped(tree):
        return jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(
                jnp.shape(x), jnp.asarray(x).dtype, sharding=rep), tree)

    from mrt.scenes import get
    import mrt.integrator.persistent as PP
    import mrt.geometry.spheres as sph_mod

    sph_mod._use_pallas = lambda kind="packet": True  # force TPU path
    scene, camera = get("rtiow")(aspect_ratio=16 / 9).generate()
    w, h, samples, pool, depth = 1920, 1080, 8, 1 << 16, 50

    checks = []

    def chunk(st, film):
        return PP._chunk_run(scene, camera, st, film, 1, 0, samples,
                             jnp.int32(64), width=w, height=h,
                             max_depth=depth, pool=pool, rr_depth=None)

    st0, film0 = PP._chunk_init(
        scene, camera, jnp.zeros((w * h, 3)),
        jnp.zeros((w * h,), jnp.int32), 1, 0, samples, width=w,
        height=h, max_depth=depth, pool=pool, rr_depth=None)
    checks.append(("production chunk driver 1080p pool 2^16",
                   chunk, (shaped(st0), shaped(film0))))

    def pend_chunk(st, film):
        return PP._chunk_run(scene, camera, st, film, 1, 0, samples,
                             jnp.int32(64), width=w, height=h,
                             max_depth=depth, pool=pool, rr_depth=None,
                             pend=True)

    stp, filmp = PP._chunk_init(
        scene, camera, jnp.zeros((w * h, 3)),
        jnp.zeros((w * h,), jnp.int32), 1, 0, samples, width=w,
        height=h, max_depth=depth, pool=pool, rr_depth=None, pend=True)
    checks.append(("pend-deposit chunk driver",
                   pend_chunk, (shaped(stp), shaped(filmp))))

    if "--zoo" in sys.argv:
        # One persistent step per zoo scene at preview shape, through
        # the REAL TPU kernel selection (packet/streamed kernels).
        import mrt.geometry.spheres as sph_mod

        sph_mod._use_pallas = lambda kind="packet": True  # force TPU path
        wz, hz, sz = 480, 270, 4
        for sname in ("sphere_grid", "lucy", "eve", "menger"):
            if sname == "menger":
                from mrt.scenes.menger import Menger
                sc, cam2 = Menger(level=5, bake=2).generate()
            else:
                sc, cam2 = get(sname)().generate()
            (t2, mr2, step2, mf2, fin2, lay2, n2, _fp2) = PP._build(
                sc, cam2, wz, hz, 1, 0, sz, 16, 1 << 14, 0, None, 1,
                None, None)
            se2, sl2, np2, bm2 = lay2
            d2 = jnp.zeros((se2 if bm2 else np2, 4), jnp.float32)
            s2 = PP._init_state(mr2, 1 << 14, d2, jnp.float32(0),
                                jnp.int32(0), PP._BIG, n2)
            checks.append((f"zoo step: {sname}",
                           (lambda st, stp=step2: stp(st)),
                           (shaped(s2),)))

    failures = 0
    for name, fn, avals in checks:
        try:
            comp = jax.jit(fn).lower(*avals).compile()
            mem = comp.memory_analysis()
            extra = ""
            if mem is not None:
                extra = (f"  temp={mem.temp_size_in_bytes/1e6:.1f}MB"
                         f" argout={mem.output_size_in_bytes/1e6:.1f}MB")
            print(f"OK   {name}{extra}", flush=True)
        except Exception as e:  # noqa: BLE001
            failures += 1
            print(f"FAIL {name}: {type(e).__name__}: "
                  f"{str(e)[:500]}", flush=True)
    print("aot_check:", "FAILED" if failures else "OK", flush=True)
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
