"""Steady-state A/B of lane sorting on Menger L5 bake=2 (streamed
TLAS): warmup pass compiles + fills caches, second pass is timed.
Both modes in one process."""
import time

import numpy as np


def main():
    import jax
    print("devices:", jax.devices(), flush=True)

    from mrt.scenes.menger import Menger
    from mrt.runtime.film import Film
    from mrt.runtime.render import render_pass_persistent

    W, H, DEPTH = 480, 270, 8
    scene, camera = Menger(level=5, bake=2).generate()
    print("built", flush=True)

    # sort is a cadence: 0 off, k = sort every k steps.
    for sort, pool in ((0, None), (1, None), (2, None), (8, None)):
        film = Film.create(W, H)
        t0 = time.time()
        film = render_pass_persistent(scene, camera, film, 1, 0,
                                      width=W, height=H,
                                      max_depth=DEPTH, samples=1,
                                      pool=pool, sort_rays=sort)
        film.sum.block_until_ready()
        warm = time.time() - t0
        t0 = time.time()
        film = render_pass_persistent(scene, camera, film, 1, 1,
                                      width=W, height=H,
                                      max_depth=DEPTH, samples=1,
                                      pool=pool, sort_rays=sort)
        film.sum.block_until_ready()
        dt = time.time() - t0
        rays = W * H
        print(f"sort={int(sort)} pool={pool}: warm {warm:.1f}s, "
              f"steady {dt:.1f}s -> {rays/dt/1e3:.2f}k rays/s  "
              f"mean={float(np.asarray(film.sum).mean()):.6f}",
              flush=True)
    print("MENGER_SORT_OK", flush=True)


if __name__ == "__main__":
    main()
