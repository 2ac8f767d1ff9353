"""Hardware A/B of Menger level-5 configurations.

Times one full persistent-integrator render step batch per config by
rendering a small spp at moderate resolution — the real path (TLAS via
the budget gate: resident packet kernel if it fits, streamed kernel
otherwise).

  python tools/tpu_menger_bench.py [--sort=0|1|auto] [bake ...]

Writes artifacts/menger_stream_r03.json (VERDICT r2 #10: every cited
number has a committed, regenerable artifact).
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    import jax
    print("devices:", jax.devices(), flush=True)

    from mrt.scenes.menger import Menger
    from mrt.runtime.render import render
    from mrt.ops import pallas_stream, budget

    sort_rays = None
    args = []
    for a in sys.argv[1:]:
        if a.startswith("--sort="):
            v = a.split("=")[1]
            sort_rays = None if v == "auto" else bool(int(v))
        else:
            args.append(a)
    bakes = [int(a) for a in args] or [3, 2]
    W, H, SPP, DEPTH = 480, 270, 2, 8
    print("sort_rays:", sort_rays, flush=True)

    rows = {}
    for bake in bakes:
        t0 = time.time()
        scene, camera = Menger(level=5, bake=bake).generate()
        nb = time.time() - t0
        tb = budget.tlas_tables_bytes(scene.tlas)
        plan = (None if budget.fits(tb)
                else pallas_stream.choose_streaming(scene.tlas))
        print(f"bake={bake}: build {nb:.1f}s "
              f"inst={scene.tlas.transform.shape[0]} "
              f"tris={scene.tlas.tris.count} tables={tb//1024}KB "
              f"plan={plan}", flush=True)
        cold = None
        for rep in range(2):
            t0 = time.time()
            film = render(scene, camera, W, H, spp=SPP,
                          max_depth=DEPTH, seed=1, persistent=True,
                          sort_rays=sort_rays)
            jax.block_until_ready(film.sum)
            dt = time.time() - t0
            if cold is None:
                cold = dt
        rays = W * H * SPP
        segs = float(np.asarray(film.depth_sum).sum())
        print(f"bake={bake}: cold {cold:.1f}s steady {dt:.1f}s for "
              f"{SPP}spp {W}x{H} d{DEPTH} "
              f"-> {rays/dt/1e3:.1f}k cam rays/s, "
              f"{segs/dt/1e6:.2f}M segs/s", flush=True)
        rows[f"bake{bake}"] = {
            "instances": int(scene.tlas.transform.shape[0]),
            "tris": int(scene.tlas.tris.count),
            "tables_kb": int(tb // 1024), "plan": plan,
            "cold_s": round(cold, 1), "steady_s": round(dt, 2),
            "cam_rays_per_sec": round(rays / dt, 1),
            "film_mean": round(float(np.asarray(film.sum).mean()), 5)}
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "artifacts",
        "menger_stream_r03.json")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "w") as f:
        json.dump({"shape": f"{W}x{H} d{DEPTH} spp{SPP}",
                   "sort_rays": sort_rays, "bakes": rows}, f, indent=1)
    print("wrote", out, flush=True)
    print("MENGER_BENCH_OK", flush=True)


if __name__ == "__main__":
    main()
