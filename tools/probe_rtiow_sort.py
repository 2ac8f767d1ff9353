"""Does per-step lane sorting pay on RTIOW (resident sphere-BVH packet
kernel)?  The argsort + 10-array gather costs ~fixed ms/step; the win
is tighter packet unions in the traversal.  A/B at the bench shape."""
import time


def main():
    import jax

    print("devices:", jax.devices(), flush=True)

    from mrt.scenes import get
    from mrt.runtime.film import Film
    from mrt.runtime.render import render_pass_persistent

    W, H, DEPTH, SPP = 1920, 1080, 50, 8
    scene, camera = get("rtiow")(aspect_ratio=W / H).generate()

    for sort in (0, 1, 4):
        film = Film.create(W, H)
        t0 = time.time()
        film = render_pass_persistent(scene, camera, film, 1, 0,
                                      width=W, height=H,
                                      max_depth=DEPTH, samples=SPP,
                                      sort_rays=sort)
        film.sum.block_until_ready()
        warm = time.time() - t0
        t0 = time.time()
        film = render_pass_persistent(scene, camera, film, 1, SPP,
                                      width=W, height=H,
                                      max_depth=DEPTH, samples=SPP,
                                      sort_rays=sort)
        film.sum.block_until_ready()
        dt = time.time() - t0
        rays = W * H * SPP
        print(f"sort={sort}: warm {warm:.1f}s steady {dt:.2f}s "
              f"-> {rays/dt/1e6:.2f}M rays/s", flush=True)
    print("RTIOW_SORT_OK", flush=True)


if __name__ == "__main__":
    main()
