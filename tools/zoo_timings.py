"""Render every zoo scene on the TPU at preview size; record cold and
steady pass times (the steady number is the comparable one — the first
pass includes the remote compile).  One process, one shape.  Writes
artifacts/zoo_r05.json (VERDICT r2 #10: committed, regenerable
artifacts for every cited number).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

OUT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "artifacts", "zoo_r05.json")


def main():
    import jax
    import numpy as np

    print("devices:", jax.devices(), flush=True)

    from mrt.scenes import get
    from mrt.runtime.film import Film
    from mrt.runtime.render import render_pass_persistent

    W, H, DEPTH, SPP = 480, 270, 16, 4
    rows = {}
    for name in ("rtiow", "cornell", "sphere_grid", "lucy", "menger",
                 "eve", "playground"):
        t0 = time.time()
        scene, camera = get(name)().generate()
        build = time.time() - t0
        film = Film.create(W, H)
        t0 = time.time()
        film = render_pass_persistent(scene, camera, film, 1, 0,
                                      width=W, height=H,
                                      max_depth=DEPTH, samples=SPP)
        film.sum.block_until_ready()
        cold = time.time() - t0
        # MIN of 3 steady reps (BASELINE "Measurement protocol
        # correction": first post-idle dispatches read 20-70% slow).
        times = []
        for rep in range(3):
            t0 = time.time()
            film = render_pass_persistent(scene, camera, film, 1,
                                          SPP * (rep + 1),
                                          width=W, height=H,
                                          max_depth=DEPTH, samples=SPP)
            film.sum.block_until_ready()
            times.append(time.time() - t0)
        dt = min(times)
        rays = W * H * SPP
        rows[name] = {"build_s": round(build, 2), "cold_s": round(cold, 2),
                      "steady_s": round(dt, 3),
                      "rays_per_sec": round(rays / dt, 1),
                      "film_sum_mean": round(
                          float(np.asarray(film.sum).mean()), 5)}
        print(f"{name:12s} build {build:6.1f}s  cold {cold:6.1f}s  "
              f"steady {dt:6.2f}s ({rays/dt/1e6:.2f}M rays/s)  "
              f"mean={rows[name]['film_sum_mean']:.4f}", flush=True)
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "w") as f:
        json.dump({"shape": f"{W}x{H} d{DEPTH} spp{SPP}",
                   "scenes": rows}, f, indent=1)
    print("wrote", OUT, flush=True)
    print("ZOO_OK", flush=True)


if __name__ == "__main__":
    main()
