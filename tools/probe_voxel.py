"""Steady-state throughput of the Menger VOXEL path on real TPU.

One process: warm pass (compile), then timed passes at the VERDICT r2
criterion workload (480x270, depth 8) and at the 1080p spp16 target
shape, printing camera rays/s for each.  Compare: the streamed-TLAS
mesh path measured ~9-12k rays/s at 480x270-d8 (BASELINE.md Menger
section); the criterion asks >= 200k.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from mrt.scenes import get
from mrt.runtime.render import render_pass_persistent
from mrt.runtime.film import Film


def steady(scene, camera, w, h, depth, spp, passes=3):
    film = Film.create(w, h)
    t0 = time.perf_counter()
    film = render_pass_persistent(scene, camera, film, 1, 0, width=w,
                                  height=h, max_depth=depth, samples=spp)
    film.sum.block_until_ready()
    warm = time.perf_counter() - t0
    times = []
    start = spp
    for _ in range(passes):
        t0 = time.perf_counter()
        film = render_pass_persistent(scene, camera, film, 1, start,
                                      width=w, height=h,
                                      max_depth=depth, samples=spp)
        film.sum.block_until_ready()
        times.append(time.perf_counter() - t0)
        start += spp
    dt = sorted(times)[len(times) // 2]
    rays = w * h * spp / dt
    print(json.dumps({
        "shape": f"{w}x{h} d{depth} spp{spp}",
        "cold_s": round(warm, 2),
        "steady_s": [round(t, 3) for t in times],
        "rays_per_sec": round(rays, 1),
        "film_mean": float(film.mean().mean()),
    }), flush=True)
    return rays


def main():
    scene, camera = get("menger")(aspect_ratio=16 / 9).generate()
    steady(scene, camera, 480, 270, 8, 8)
    steady(scene, camera, 1920, 1080, 50, 4)


if __name__ == "__main__":
    main()
