"""Benchmark: RTIOW final scene throughput on real TPU hardware.

Workload per BASELINE.md: the RTIOW final scene at 1920x1080 with the
reference's MAX_DEPTH=50 (reference: src/main.rs:37-41).  The reference
publishes no numbers (README.md:1-5), so the recorded metric IS the
baseline; vs_baseline compares against the value stored in
`bench_baseline.json` (written on first run).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import os
import sys
import time

WIDTH, HEIGHT = 1920, 1080
SPP = 8
MAX_DEPTH = 50
BASELINE_FILE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "bench_baseline.json")


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
        print(json.dumps({
            "metric": "camera_rays_per_sec_rtiow1080p_d50",
            "value": 0,
            "unit": "rays/s",
            "vs_baseline": 0.0,
            "error": "accelerator unreachable",
        }))
        return

    from mrt.scenes import get
    from mrt.runtime.render import render_pass_persistent
    from mrt.runtime.film import Film

    scene, camera = get("rtiow")(aspect_ratio=WIDTH / HEIGHT).generate()

    film = Film.create(WIDTH, HEIGHT)
    # Warmup: compile + run with the SAME statics as the timed pass
    # (the pool is bucketed by spp, so a 1-spp warmup would compile a
    # different program and leave the timed one cold).
    film = render_pass_persistent(scene, camera, film, 1, 0, width=WIDTH,
                                  height=HEIGHT, max_depth=MAX_DEPTH,
                                  samples=SPP)
    film.sum.block_until_ready()
    warm_depth = int(film.depth_sum.sum())

    t0 = time.perf_counter()
    film = render_pass_persistent(scene, camera, film, 1, SPP,
                                  width=WIDTH, height=HEIGHT,
                                  max_depth=MAX_DEPTH, samples=SPP)
    film.sum.block_until_ready()
    dt = time.perf_counter() - t0

    camera_rays = WIDTH * HEIGHT * SPP
    rays_per_sec = camera_rays / dt
    # Path segments give the density-independent number for the record
    # (delta over the warmup pass: each path >= 1 segment).
    segments = (int(film.depth_sum.sum()) - warm_depth) + camera_rays
    print(f"# {dt:.2f}s for {SPP} spp @ {WIDTH}x{HEIGHT} depth {MAX_DEPTH}; "
          f"{rays_per_sec/1e6:.2f}M camera rays/s, "
          f"{segments/dt/1e6:.2f}M path segments/s", file=sys.stderr)

    vs = 1.0
    if os.path.exists(BASELINE_FILE):
        with open(BASELINE_FILE) as f:
            base = json.load(f)
        if base.get("value"):
            vs = rays_per_sec / base["value"]
    else:
        with open(BASELINE_FILE, "w") as f:
            json.dump({"metric": "camera_rays_per_sec",
                       "value": rays_per_sec}, f)

    print(json.dumps({
        "metric": "camera_rays_per_sec_rtiow1080p_d50",
        "value": round(rays_per_sec, 1),
        "unit": "rays/s",
        "vs_baseline": round(vs, 4),
    }))


if __name__ == "__main__":
    main()
