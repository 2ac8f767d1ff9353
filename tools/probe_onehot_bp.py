"""Kernel-block (MRT_ONEHOT_BP) A/B at the NAMED bench workload.

RTIOW 1920x1080 d50 spp64, warm-up pass + median-of-3 steady passes
through render_pass_persistent — the exact bench.py protocol.  Each BP
runs in a FRESH SUBPROCESS: pallas_onehot reads MRT_ONEHOT_BP at
import time and compiled chunk programs cache-key only on statics, so
an in-process env flip would silently reuse the old kernel (the r2
MRT_SPHERE_KERNEL lesson, tools/probe_bench_ab.py).

r5 context: BP swept 1024/2048 -> 2048 won (11.91M); 4096 was left
untried for VMEM risk (the deposit kernel holds a BPxW one-hot block).
"""
import json
import os
import statistics
import subprocess
import sys
import time

WIDTH, HEIGHT, SPP, DEPTH = 1920, 1080, 64, 50


def run_bp(bp):
    import jax
    print("devices:", jax.devices(), "BP", bp, flush=True)
    from mrt.scenes import get
    from mrt.runtime.render import render_pass_persistent
    from mrt.runtime.film import Film

    scene, camera = get("rtiow")(aspect_ratio=WIDTH / HEIGHT).generate()

    def one_pass(film, start):
        film = render_pass_persistent(scene, camera, film, 1, start,
                                      width=WIDTH, height=HEIGHT,
                                      max_depth=DEPTH, samples=SPP)
        film.sum.block_until_ready()
        return film

    film = Film.create(WIDTH, HEIGHT)
    t0 = time.perf_counter()
    film = one_pass(film, 0)
    warm = time.perf_counter() - t0
    runs = []
    start = SPP
    for _ in range(3):
        t0 = time.perf_counter()
        film = one_pass(film, start)
        runs.append(time.perf_counter() - t0)
        start += SPP
    med = statistics.median(runs)
    rays = WIDTH * HEIGHT * SPP / med
    print(json.dumps({
        "bp": bp, "warm_s": round(warm, 2),
        "runs_s": [round(r, 3) for r in runs],
        "median_s": round(med, 3),
        "mrays_per_s": round(rays / 1e6, 3),
        "film_mean": round(float(film.sum.mean()) / (start), 6),
    }), flush=True)


def main():
    if len(sys.argv) > 1:
        run_bp(int(sys.argv[1]))
        return
    for bp in (2048, 4096):
        env = dict(os.environ, MRT_ONEHOT_BP=str(bp))
        # keep the axon site dirs; just prepend the repo root
        env["PYTHONPATH"] = "/root/repo:" + env.get("PYTHONPATH", "")
        subprocess.run([sys.executable, __file__, str(bp)], env=env,
                       check=False)


if __name__ == "__main__":
    main()
