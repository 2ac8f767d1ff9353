"""Lucy r5: the C++ SAH default vs median trees at the zoo shape,
plus a step-time breakdown (intersect vs rest) on the production
wavefront.

    python tools/probe_lucy_r05.py
"""
import json
import os
import statistics
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

W_, H_, SPP, DEPTH = 480, 270, 4, 16

VARIANTS = {
    "sah": {},                       # r5 default (lucy opts in)
    "median": {"MRT_BVH": "median"},
}


def run_variant(name):
    import jax
    import numpy as np

    from mrt.scenes import get
    from mrt.runtime.render import render_pass_persistent
    from mrt.runtime.film import Film

    scene, camera = get("lucy")(aspect_ratio=W_ / H_).generate()

    def one(film, start):
        film = render_pass_persistent(scene, camera, film, 1, start,
                                      width=W_, height=H_,
                                      max_depth=DEPTH, samples=SPP)
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
    print(json.dumps({
        "name": name, "median_s": round(dt, 3),
        "mrays": round(W_ * H_ * SPP / dt / 1e6, 3),
        "film_mean": float(s.mean()) / float(film.samples)}),
        flush=True)


def main():
    rows = []
    for name, envs in VARIANTS.items():
        env = dict(os.environ)
        env.pop("MRT_BVH", None)
        env.update(envs)
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--run", name],
            env=env, cwd=ROOT, capture_output=True, text=True)
        out = [l for l in r.stdout.splitlines() if l.startswith("{")]
        print(name, out[-1] if out else f"FAILED rc={r.returncode}: "
              f"{r.stderr[-300:]}", flush=True)
        if out:
            rows.append(json.loads(out[-1]))
    with open(os.path.join(ROOT, "artifacts", "lucy_r05.json"),
              "w") as f:
        json.dump(rows, f, indent=1)
    print("OK", flush=True)


if __name__ == "__main__":
    if len(sys.argv) >= 3 and sys.argv[1] == "--run":
        run_variant(sys.argv[2])
    else:
        main()
