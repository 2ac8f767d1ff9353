"""Render every zoo scene on the TPU at preview size; record warm and
steady pass times (the steady number is the comparable one — first
pass includes the remote compile).  One process, one shape."""
import time


def main():
    import jax
    import numpy as np

    print("devices:", jax.devices(), flush=True)

    from mrt.scenes import get
    from mrt.runtime.film import Film
    from mrt.runtime.render import render_pass_persistent

    W, H, DEPTH, SPP = 480, 270, 16, 4
    for name in ("rtiow", "cornell", "sphere_grid", "lucy", "eve",
                 "playground"):
        t0 = time.time()
        scene, camera = get(name)().generate()
        build = time.time() - t0
        film = Film.create(W, H)
        t0 = time.time()
        film = render_pass_persistent(scene, camera, film, 1, 0,
                                      width=W, height=H,
                                      max_depth=DEPTH, samples=SPP)
        film.sum.block_until_ready()
        warm = time.time() - t0
        t0 = time.time()
        film = render_pass_persistent(scene, camera, film, 1, SPP,
                                      width=W, height=H,
                                      max_depth=DEPTH, samples=SPP)
        film.sum.block_until_ready()
        dt = time.time() - t0
        rays = W * H * SPP
        print(f"{name:12s} build {build:6.1f}s  warm {warm:6.1f}s  "
              f"steady {dt:6.2f}s ({rays/dt/1e6:.2f}M rays/s)  "
              f"mean={float(np.asarray(film.sum).mean()):.4f}",
              flush=True)
    print("ZOO_OK", flush=True)


if __name__ == "__main__":
    main()
