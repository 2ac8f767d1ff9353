"""Hardware probe: fused megastep kernel vs the XLA persistent step.

Measures per-step time of an 8-step block at pool 2^16 on RTIOW, then
renders 480x270 spp=4 both ways and compares films (tolerant: FMA noise
reroutes a small fraction of paths; the estimator is unchanged).
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

POOL = 1 << 16


def main():
    import jax
    import jax.numpy as jnp

    print("devices:", jax.devices(), flush=True)

    from mrt.scenes import get
    from mrt.integrator import persistent as P
    from mrt.ops import pallas_megastep as mk

    scene, camera = get("rtiow")(aspect_ratio=16 / 9).generate()
    scene_b = mk.with_sphere_bvh(scene)
    print("spheres:", scene_b.spheres.count, "nodes:",
          scene_b.sphere_bvh.n_nodes, flush=True)

    w, h, samples, depth = 1920, 1080, 8, 50
    seed, sample_start = 1, 0
    npix = w * h

    (total, make_rays, step, maybe_flush, finalize, layout,
     neutral) = P._build(scene_b, camera, w, h, seed, sample_start,
                         samples, depth, POOL, 0, None, 1, None, None)
    slots_eff, slab, npix_pad, big_mode = layout
    dest = jnp.zeros((slots_eff if big_mode else npix_pad, 4),
                     jnp.float32)
    init_limit = (jnp.int32(slots_eff) * jnp.int32(samples) if big_mode
                  else P._BIG)
    state = P._init_state(make_rays, POOL, dest, jnp.float32(0),
                          jnp.int32(0), init_limit, neutral, mega=True)

    K = P.FLUSH_STEPS

    @jax.jit
    def xla_block(st):
        st10 = st[:10]
        st10 = jax.lax.fori_loop(0, K, lambda i, s: step(s), st10)
        return st10

    def mega_block(st, ablate=None, isect=None):
        return mk.run_block(
            scene_b, camera, st, width=w, height=h, seed=seed,
            sample_start=sample_start, samples=samples, max_depth=depth,
            pool=POOL, slots_eff=slots_eff, big_mode=big_mode,
            k_steps=K, t_min=P.T_MIN, neutral=neutral, ablate=ablate,
            isect=isect)

    mega_block_j = jax.jit(mega_block)
    mega_nodep = jax.jit(lambda st: mega_block(st, ablate="nodep"))
    mega_dense = jax.jit(lambda st: mega_block(st, isect="dense"))

    steps_ms = {}
    for name, fn in (("xla", xla_block), ("mega", mega_block_j),
                     ("mega-nodep", mega_nodep),
                     ("mega-dense", mega_dense)):
        st = jax.block_until_ready(fn(state))
        reps = 8
        t0 = time.time()
        for _ in range(reps):
            st = fn(st)
        jax.block_until_ready(st)
        dt = (time.time() - t0) / (reps * K)
        steps_ms[name] = round(dt * 1e3, 3)
        print(f"{name:5s} {dt*1e3:7.3f} ms/step", flush=True)

    # Film agreement at preview size.
    from mrt.integrator.persistent import render_samples_chunked
    w2, h2, spp = 480, 270, 4
    t0 = time.time()
    ref_sum, ref_d = render_samples_chunked(scene_b, camera, w2, h2,
                                            1, 0, spp, max_depth=16,
                                            pool=POOL, mega=False)
    jax.block_until_ready(ref_sum)
    t_ref = time.time() - t0
    t0 = time.time()
    got_sum, got_d = render_samples_chunked(scene_b, camera, w2, h2,
                                            1, 0, spp, max_depth=16,
                                            pool=POOL, mega=True)
    jax.block_until_ready(got_sum)
    t_got = time.time() - t0
    a, b = np.asarray(got_sum), np.asarray(ref_sum)
    close = np.isclose(a, b, rtol=1e-4, atol=1e-5).all(axis=-1)
    print(f"render xla {t_ref:.2f}s mega {t_got:.2f}s  "
          f"pixel agreement {close.mean():.4f}  "
          f"mean {a.mean():.5f} vs {b.mean():.5f}", flush=True)
    print("depth sums:", int(got_d.sum()), int(ref_d.sum()), flush=True)

    # Committed, regenerable artifact (VERDICT r2 #10).
    import json
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "artifacts", "megastep_r03.json")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "w") as f:
        json.dump({
            "workload": f"rtiow {w}x{h} spp{samples} d{depth} "
                        f"pool 2^16, per-step of {K}-step blocks",
            "ms_per_step": steps_ms,
            "film_check": {
                "shape": f"{w2}x{h2} spp{spp} d16",
                "xla_s": round(t_ref, 2), "mega_s": round(t_got, 2),
                "pixel_agreement": round(float(close.mean()), 4),
                "mega_mean": round(float(a.mean()), 5),
                "xla_mean": round(float(b.mean()), 5),
                "mega_depth_sum": int(got_d.sum()),
                "xla_depth_sum": int(ref_d.sum()),
            }}, f, indent=1)
    print("wrote", out, flush=True)
    print("OK", flush=True)


if __name__ == "__main__":
    main()
