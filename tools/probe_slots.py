"""Probe the slot-accumulator persistent step on hardware.

Measures (a) ms/step of the compiled chunk body at fixed chunk length,
(b) total steps + wall time to drain 8 spp, (c) lane utilisation —
to explain end-to-end bench numbers (tools/profile_* found the film
scatter cost; this checks the redesign actually harvested it in situ).
"""
import time

import numpy as np


def main():
    import sys

    import jax
    import jax.numpy as jnp

    print("devices:", jax.devices(), flush=True)

    from mrt.scenes import get
    from mrt.integrator import persistent as P

    W, H, DEPTH = 1920, 1080, 50
    scene, camera = get("rtiow")(aspect_ratio=W / H).generate()
    npix = W * H
    spp = 8
    seed = 1
    pool = int(sys.argv[1]) if len(sys.argv) > 1 else P.POOL
    sort_rays = bool(int(sys.argv[2])) if len(sys.argv) > 2 else False
    print(f"pool={pool} slots={P.SLOTS} sort={sort_rays}", flush=True)

    statics = dict(width=W, height=H, max_depth=DEPTH, pool=pool,
                   rr_depth=None, slots=None, sort_rays=sort_rays)
    film_sum = jnp.zeros((npix, 3), jnp.float32)
    depth_sum = jnp.zeros((npix,), jnp.int32)

    state, film = P._chunk_init(scene, camera, film_sum, depth_sum,
                                seed, 0, jnp.uint32(spp), **statics)
    # Warm the run fn.
    s2, f2, more = P._chunk_run(scene, camera, state, film, seed, 0,
                                jnp.uint32(spp), jnp.int32(P.FLUSH_STEPS),
                                **statics)
    jax.block_until_ready(f2)

    K = 64
    t0 = time.perf_counter()
    s3, f3, more = P._chunk_run(scene, camera, s2, f2, seed, 0,
                                jnp.uint32(spp), jnp.int32(K), **statics)
    jax.block_until_ready(f3)
    dt = time.perf_counter() - t0
    print(f"ms/step (K={K}): {dt/K*1e3:.3f}", flush=True)

    # Lane utilisation snapshot after those steps.
    total = npix * spp
    item = np.asarray(s3[0])
    print(f"active lanes: {(item < total).mean()*100:.1f}%  "
          f"next_work: {int(np.asarray(s3[6]))}/{total}  "
          f"flushed_q: {int(np.asarray(s3[8]))}/{npix}", flush=True)

    # Full drain from scratch, fixed big chunks, count steps.
    state, film = P._chunk_init(scene, camera, film_sum, depth_sum,
                                seed, 0, jnp.uint32(spp), **statics)
    steps = 0
    t0 = time.perf_counter()
    while True:
        tc = time.perf_counter()
        state, film, more = P._chunk_run(
            scene, camera, state, film, seed, 0, jnp.uint32(spp),
            jnp.int32(256), **statics)
        m = bool(more)
        dtc = time.perf_counter() - tc
        steps += 256  # upper bound; cond may stop earlier on last chunk
        print(f"  chunk: {dtc:.3f}s ({dtc/256*1e3:.3f} ms/step) "
              f"nw={int(np.asarray(state[6]))} "
              f"active={(np.asarray(state[0]) < total).mean()*100:.0f}%",
              flush=True)
        if not m:
            break
    fs, ds = P._chunk_finalize(scene, camera, state, film, seed, 0,
                               jnp.uint32(spp), **statics)
    jax.block_until_ready(fs)
    dt = time.perf_counter() - t0
    rays = npix * spp
    segs = int(np.asarray(ds).sum()) + rays
    print(f"drain: {dt:.2f}s  ~{steps} steps (chunked 256)  "
          f"{rays/dt/1e6:.2f}M rays/s  {segs/dt/1e6:.2f}M segs/s",
          flush=True)
    print("mean film:", float(np.asarray(fs).mean()), flush=True)
    print("PROBE_OK", flush=True)


if __name__ == "__main__":
    main()
