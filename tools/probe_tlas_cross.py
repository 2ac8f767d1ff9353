"""Instanced-brute vs packet-TLAS crossover by geometry size.

Sweeps synthetic instanced fleets (one shared sphere mesh, varying
tessellation and instance count) under the decohered-bounce harness of
probe_sphere_cross to find where the dense per-round triangle scan
(geometry/tlas_brute.py) stops beating packet traversal — that sets
tlas_brute.MAX_TRIS.  Both paths share the deterministic tie rule, so
the per-variant hit counts must agree exactly.
"""
import time

import numpy as np

K = 12
N_RAYS = 1 << 16
# (mesh lat, mesh lon, grid) -> mesh tris = 2*lat*lon, inst = grid^2
SWEEP = ((6, 8, 6), (6, 8, 11), (10, 16, 6), (16, 32, 6), (16, 32, 11),
         (32, 64, 6), (32, 64, 11))


def main():
    import jax
    import jax.numpy as jnp

    print("devices:", jax.devices(), flush=True)

    from mrt.geometry.instance import MeshRegistry
    from mrt.geometry.tlas_brute import intersect_tlas_brute
    from mrt.geometry.shapes import sphere_mesh
    from mrt.math.rng import Sampler
    from mrt.math import sampling
    from mrt.ops import pallas_bvh, budget

    pix = jnp.arange(N_RAYS, dtype=jnp.uint32)
    s = Sampler(1, pix, salt=0xC0FFEE)
    u1, u2, u3, _ = s.next4()
    o0 = jnp.tile(jnp.array([[0.0, 0.0, -30.0]], jnp.float32),
                  (N_RAYS, 1))
    tgt = jnp.stack([u1 * 20 - 10, u2 * 20 - 10, u3 * 20 - 10], -1)
    d0 = tgt - o0

    for lat, lon, grid in SWEEP:
        reg = MeshRegistry()
        m = reg.add_mesh(sphere_mesh(radius=0.9, lat=lat, lon=lon,
                                     material=0))
        for i in range(grid):
            for j in range(grid):
                reg.add_instance(
                    m, translation=((i - grid / 2) * 3.5, 0.0,
                                    (j - grid / 2) * 3.5),
                    rotation=(0.02 * i, 0.03 * j, 0.0),
                    scale=1.0 + 0.05 * j)
        tlas = reg.build()
        fits = budget.fits(budget.tlas_tables_bytes(tlas))

        def variant(name):
            if name == "packet":
                if not fits:
                    from mrt.ops import pallas_stream
                    return lambda o, d: pallas_stream.intersect_tlas(
                        tlas, o, d, 1e-3, jnp.inf)
                return lambda o, d: pallas_bvh.intersect_tlas(
                    tlas, o, d, 1e-3, jnp.inf)
            return lambda o, d: intersect_tlas_brute(
                tlas, o, d, 1e-3, jnp.inf)

        row = (f"tris={int(tlas.tris.count):5d} inst={grid * grid:4d}"
               f"{'' if fits else ' (streamed)'}")
        hits = {}
        for name in ("packet", "brute"):
            isect = variant(name)

            def fn(i, carry):
                acc, o, d = carry
                h = isect(o, d)
                sp = Sampler(1, pix + i.astype(jnp.uint32), salt=7)
                v1, v2, _, _ = sp.next4()
                nd = h.normal + sampling.unit_vector(v1, v2)
                o = jnp.where(h.hit[:, None], h.point, o)
                d = jnp.where(h.hit[:, None], nd, d)
                return (acc + h.hit, o, d)

            f = jax.jit(lambda o, d: jax.lax.fori_loop(
                0, K, fn, (jnp.zeros((N_RAYS,)), o, d))[0])
            try:
                hits[name] = float(jnp.sum(jax.block_until_ready(
                    f(o0, d0))))
                t0 = time.time()
                jax.block_until_ready(f(o0, d0))
                dt = (time.time() - t0) / K
                row += f"  {name} {dt*1e3:7.3f} ms"
            except Exception as e:  # noqa: BLE001
                row += f"  {name} FAILED:{type(e).__name__}"
        if len(hits) == 2:
            row += ("  hits OK" if hits["packet"] == hits["brute"]
                    else f"  hits DIFFER {hits}")
        print(row, flush=True)
    print("OK", flush=True)


if __name__ == "__main__":
    import sys, os
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, root)
    main()
