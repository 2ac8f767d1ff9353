"""Small-frame (zoo) A/B of the scatter-free film deposit.

The r5 law says the per-step scatter costs ~1.35 ms FIXED; zoo scenes
(480x270 = small mode, dest IS the film slice) pay it too.  This
probes film_mm off vs W in {16384, 32768} at the zoo shape.

    python tools/probe_zoo_mm.py [scene ...]   # default cornell eve sphere_grid
"""
import json
import os
import statistics
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

W_, H_, SPP, DEPTH = 480, 270, 4, 16


def main():
    import jax
    import numpy as np

    from mrt.scenes import get
    from mrt.integrator.persistent import render_samples_chunked
    from mrt.runtime.render import render_pass_persistent
    from mrt.runtime.film import Film

    scenes = sys.argv[1:] or ["cornell", "eve", "sphere_grid"]
    out = []
    for name in scenes:
        scene, camera = get(name)(aspect_ratio=W_ / H_).generate()
        for mm in (0, 16384, 32768):
            def one(film, start):
                film = render_pass_persistent(
                    scene, camera, film, 1, start, width=W_, height=H_,
                    max_depth=DEPTH, samples=SPP, film_mm=mm)
                film.sum.block_until_ready()
                return film

            film = one(Film.create(W_, H_), 0)
            runs = []
            st = SPP
            for _ in range(3):
                t0 = time.perf_counter()
                film = one(film, st)
                runs.append(time.perf_counter() - t0)
                st += SPP
            dt = statistics.median(runs)
            s = np.asarray(film.sum)
            r = {"scene": name, "film_mm": mm,
                 "median_s": round(dt, 3),
                 "mrays": round(W_ * H_ * SPP / dt / 1e6, 3),
                 "film_mean": float(np.nanmean(np.where(
                     np.isfinite(s), s, np.nan))) / float(film.samples),
                 "nonfinite_px": int((~np.isfinite(s.sum(-1))).sum())}
            out.append(r)
            print(json.dumps(r), flush=True)
    with open(os.path.join(ROOT, "artifacts", "zoo_mm_r05.json"),
              "w") as f:
        json.dump(out, f, indent=1)
    print("OK", flush=True)


if __name__ == "__main__":
    main()
