"""Benchmark: RTIOW final scene throughput on real TPU hardware.

Workload per BASELINE.md: the RTIOW final scene at 1920x1080 with the
reference's MAX_DEPTH=50 (reference: src/main.rs:37-41).  The reference
publishes no numbers (README.md:1-5), so the recorded metric IS the
baseline; vs_baseline compares against the value stored in
`bench_baseline.json` (written on first run).

Protocol (VERDICT r2 #4, r3 #5): each spp bucket compiles its own
program, so each gets its own untimed warm-up pass; the HEADLINE is
the MEDIAN of 3 steady passes at spp=64 — the BASELINE.md-named
baseline workload — with the spp=8 steady numbers recorded alongside
in `bench_detail.json`.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

WIDTH, HEIGHT = 1920, 1080
SPP = 8
SPP_BASELINE = 64
MAX_DEPTH = 50
_DIR = os.path.dirname(os.path.abspath(__file__))
BASELINE_FILE = os.path.join(_DIR, "bench_baseline.json")
DETAIL_FILE = os.path.join(_DIR, "bench_detail.json")


def _device_alive(timeout=240):
    """Probe the accelerator in a subprocess: a wedged TPU tunnel hangs
    forever on the first op, which must not hang the benchmark."""
    import subprocess

    try:
        r = subprocess.run(
            [sys.executable, "-c",
             "import jax.numpy as j; j.arange(2).sum()"],
            timeout=timeout, capture_output=True)
        return r.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def main():
    if not _device_alive():
        print("# accelerator unreachable (tunnel down?); "
              "no measurement possible", file=sys.stderr)
        last = None
        if os.path.exists(DETAIL_FILE):
            try:
                with open(DETAIL_FILE) as f:
                    last = json.load(f).get(
                        "camera_rays_per_sec_spp64")
            except Exception:
                pass
        print(json.dumps({
            "metric": "camera_rays_per_sec_rtiow1080p_d50",
            "value": 0,
            "unit": "rays/s",
            "vs_baseline": 0.0,
            "error": "accelerator unreachable",
            "last_recorded_spp64": last,   # bench_detail.json, for
            # context only — NOT a fresh measurement
        }))
        return

    from mrt.scenes import get
    from mrt.runtime.render import render_pass_persistent
    from mrt.runtime.film import Film

    scene, camera = get("rtiow")(aspect_ratio=WIDTH / HEIGHT).generate()

    def one_pass(film, start, spp):
        film = render_pass_persistent(scene, camera, film, 1, start,
                                      width=WIDTH, height=HEIGHT,
                                      max_depth=MAX_DEPTH, samples=spp)
        film.sum.block_until_ready()
        return film

    film = Film.create(WIDTH, HEIGHT)
    # Warm-up: compile + adaptive chunk ramp with the SAME statics as
    # the timed passes (the pool is bucketed by spp, so a 1-spp warmup
    # would compile a different program and leave the timed one cold).
    t0 = time.perf_counter()
    film = one_pass(film, 0, SPP)
    warm_s = time.perf_counter() - t0
    depth_before = int(film.depth_sum.sum())

    runs = []
    start = SPP
    for _ in range(3):
        t0 = time.perf_counter()
        film = one_pass(film, start, SPP)
        runs.append(time.perf_counter() - t0)
        start += SPP

    camera_rays = WIDTH * HEIGHT * SPP
    dt = statistics.median(runs)
    rays_per_sec = camera_rays / dt
    segments = ((int(film.depth_sum.sum()) - depth_before) // 3
                + camera_rays)

    # The spp=64 program is DIFFERENT from the spp=8 one (the pool is
    # bucketed by spp), so warm it separately — r3's bench timed a cold
    # spp64 pass and reported 4.55M for what is really ~9M
    # (artifacts/spp64_r04.json).  spp=64 is the NAMED baseline
    # workload (BASELINE.md metrics table), so the HEADLINE is its
    # median-of-3; the spp=8 number stays in the detail file.
    t0 = time.perf_counter()
    film = one_pass(film, start, SPP_BASELINE)
    warm64_s = time.perf_counter() - t0
    start += SPP_BASELINE
    runs64 = []
    for _ in range(3):
        t0 = time.perf_counter()
        film = one_pass(film, start, SPP_BASELINE)
        runs64.append(time.perf_counter() - t0)
        start += SPP_BASELINE
    dt64 = statistics.median(runs64)
    rays64 = WIDTH * HEIGHT * SPP_BASELINE / dt64

    print(f"# warm-up (compile+ramp) {warm_s:.2f}s; steady spp={SPP} "
          f"runs {['%.3f' % r for r in runs]}s -> median {dt:.3f}s = "
          f"{rays_per_sec/1e6:.2f}M camera rays/s, "
          f"{segments/dt/1e6:.2f}M path segments/s; "
          f"spp={SPP_BASELINE} (named workload) warm {warm64_s:.1f}s, "
          f"runs {['%.2f' % r for r in runs64]}s -> median {dt64:.2f}s "
          f"= {rays64/1e6:.2f}M rays/s", file=sys.stderr)

    vs = 1.0
    if os.path.exists(BASELINE_FILE):
        with open(BASELINE_FILE) as f:
            base = json.load(f)
        if base.get("value"):
            vs = rays64 / base["value"]
    else:
        with open(BASELINE_FILE, "w") as f:
            json.dump({"metric": "camera_rays_per_sec",
                       "value": rays64}, f)

    with open(DETAIL_FILE, "w") as f:
        json.dump({
            "workload": {"width": WIDTH, "height": HEIGHT,
                         "max_depth": MAX_DEPTH},
            "warmup_s": round(warm_s, 3),
            "steady_runs_s": [round(r, 4) for r in runs],
            "median_s": round(dt, 4),
            "camera_rays_per_sec_spp8": round(rays_per_sec, 1),
            "path_segments_per_sec": round(segments / dt, 1),
            "spp64_warm_s": round(warm64_s, 3),
            "spp64_runs_s": [round(r, 3) for r in runs64],
            "spp64_s": round(dt64, 3),
            "camera_rays_per_sec_spp64": round(rays64, 1),
        }, f, indent=1)

    print(json.dumps({
        "metric": "camera_rays_per_sec_rtiow1080p_spp64_d50",
        "value": round(rays64, 1),
        "unit": "rays/s",
        "vs_baseline": round(vs, 4),
    }))


if __name__ == "__main__":
    main()
