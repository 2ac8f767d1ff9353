"""Eve r5 A/B: miss-lane-compacted background + need-masked texel
fetches (both one-hot-kernel-backed), separately and together.

480x270 d16 spp16, warm + median-of-3, env-isolated subprocesses
(the flags are read at trace time).  Writes artifacts/eve_r05.json.

    python tools/probe_eve_r05.py [names...]
"""
import json
import os
import statistics
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

VARIANTS = {
    "base": {},
    "bg": {"MRT_BG_COMPACT": "1"},
    "tex": {"MRT_TEX_COMPACT": "1"},
    "both": {"MRT_BG_COMPACT": "1", "MRT_TEX_COMPACT": "1"},
}


def run_variant(name):
    import jax
    import jax.numpy as jnp

    from mrt.scenes import get
    from mrt.runtime.render import render_pass_persistent
    from mrt.runtime.film import Film

    scene, camera = get("eve")(aspect_ratio=480 / 270).generate()
    W_, H_, spp = 480, 270, 16

    def one(film, start):
        film = render_pass_persistent(scene, camera, film, 1, start,
                                      width=W_, height=H_,
                                      max_depth=16, samples=spp)
        film.sum.block_until_ready()
        return film

    film = one(Film.create(W_, H_), 0)
    runs = []
    st = spp
    for _ in range(3):
        t0 = time.perf_counter()
        film = one(film, st)
        runs.append(time.perf_counter() - t0)
        st += spp
    dt = statistics.median(runs)
    import numpy as np

    s = np.asarray(film.sum)
    finite = np.isfinite(s).all()
    print(json.dumps({
        "name": name, "median_s": round(dt, 3),
        "mrays": round(W_ * H_ * spp / dt / 1e6, 3),
        "film_mean_finite": float(np.nanmean(
            np.where(np.isfinite(s), s, np.nan))) / float(film.samples),
        "nonfinite_px": int((~np.isfinite(s.sum(-1))).sum()),
    }), flush=True)


def main():
    names = sys.argv[1:] or list(VARIANTS)
    rows = []
    for name in names:
        env = dict(os.environ)
        env.pop("MRT_BG_COMPACT", None)
        env.pop("MRT_TEX_COMPACT", None)
        env.update(VARIANTS[name])
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--run", name],
            env=env, cwd=ROOT, capture_output=True, text=True)
        out = [l for l in r.stdout.splitlines() if l.startswith("{")]
        print(name, out[-1] if out else f"FAILED rc={r.returncode}: "
              f"{r.stderr[-300:]}", flush=True)
        if out:
            rows.append(json.loads(out[-1]))
    with open(os.path.join(ROOT, "artifacts", "eve_r05.json"),
              "w") as f:
        json.dump(rows, f, indent=1)
    print("OK", flush=True)


if __name__ == "__main__":
    if len(sys.argv) >= 3 and sys.argv[1] == "--run":
        run_variant(sys.argv[2])
    else:
        main()
