"""EVE render A/B: lane coherence sorting on the resident packet TLAS.

profile_eve2 showed the EVE step is traversal-bound on decorrelated
mid-path rays (intersect 12.5 ms vs shade 2.5 ms at pool 2^16) — the
shared per-packet cursor pays the union of 1024 lanes' subtree visits.
The Morton+octant sorter (persistent.py) was only auto-enabled for
HBM-streamed scenes; measure it on EVE's SMEM-resident TLAS.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    import jax

    print("devices:", jax.devices(), flush=True)
    from mrt.scenes import get
    from mrt.runtime.render import render

    import sys as _sys
    names = _sys.argv[1:] or ["eve"]
    W, H, SPP, DEPTH = 480, 270, 8, 16
    for name in names:
        probe_scene(get, render, jax, name, W, H, SPP, DEPTH)
    print("OK", flush=True)


def probe_scene(get, render, jax, name, W, H, SPP, DEPTH):
    import time
    scene, camera = get(name)().generate()
    for sort_rays in (False, True):
        last = None
        for rep in range(2):
            t0 = time.time()
            film = render(scene, camera, W, H, spp=SPP, max_depth=DEPTH,
                          seed=1, persistent=True, sort_rays=sort_rays)
            jax.block_until_ready(film.sum)
            last = time.time() - t0
        rays = W * H * SPP
        print(f"{name:10s} sort={int(sort_rays)}: steady {last:.2f}s "
              f"{rays/last/1e3:.1f}k rays/s "
              f"mean {float(film.mean().mean()):.5f}", flush=True)


if __name__ == "__main__":
    main()
