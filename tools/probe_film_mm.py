"""A/B the windowed one-hot MXU film deposit (ops/film_deposit)
against the serial-scatter default at the exact bench workloads.

RTIOW 1080p d50; spp=64/pool 2^17 (the NAMED headline workload) and
spp=8/pool 2^16 (the steady detail).  Protocol per BASELINE
"Measurement protocol correction": every variant gets its own untimed
warm pass, then median-of-3 — all in one process (film_mm is a STATIC
jit argument, so variants compile distinct programs; no env-flip cache
aliasing).

Reports film mean + depth sum per variant: the matmul deposit is
f32-reassociation-only vs the scatter, so means must agree to ~1e-5
and depth sums exactly.

    python tools/probe_film_mm.py [W ...]       # default 8192 16384 32768
"""
import json
import os
import statistics
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

WIDTH, HEIGHT, DEPTH = 1920, 1080, 50


def run(spp, pool, film_mm):
    import jax
    from mrt.scenes import get
    from mrt.integrator.persistent import render_samples_chunked

    scene, camera = get("rtiow")(aspect_ratio=16 / 9).generate()
    res = {}
    start = 0

    def one(start, spp):
        s, d = render_samples_chunked(
            scene, camera, WIDTH, HEIGHT, 1, start, spp,
            max_depth=DEPTH, pool=pool, film_mm=film_mm)
        jax.block_until_ready(s)
        return s, d

    t0 = time.perf_counter()
    s, d = one(start, spp)
    warm = time.perf_counter() - t0
    start += spp
    runs = []
    for _ in range(3):
        t0 = time.perf_counter()
        s, d = one(start, spp)
        runs.append(time.perf_counter() - t0)
        start += spp
    dt = statistics.median(runs)
    return {
        "spp": spp, "pool": pool, "film_mm": film_mm,
        "warm_s": round(warm, 2),
        "runs_s": [round(r, 3) for r in runs],
        "median_s": round(dt, 3),
        "mrays_per_sec": round(WIDTH * HEIGHT * spp / dt / 1e6, 3),
        "film_mean": float(s.mean()) / spp,
        "depth_sum": int(d.sum()),
    }


def main():
    ws = [int(a) for a in sys.argv[1:]] or [8192, 16384, 32768]
    out = []
    for spp, pool in ((64, 1 << 17), (8, 1 << 16)):
        for film_mm in [0] + ws:
            r = run(spp, pool, film_mm)
            out.append(r)
            print(json.dumps(r), flush=True)
    with open(os.path.join(ROOT, "artifacts", "film_mm_probe_last.json"),
              "w") as f:
        json.dump(out, f, indent=1)
    print("OK", flush=True)


if __name__ == "__main__":
    main()
