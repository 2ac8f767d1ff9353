"""Lane-sort cadence sweep on the real TPU (steps between sorts).

The ~1.3 ms argsort every step only pays on heavy divergence; this
sweeps sort_rays (cadence) per sorting scene.  sort_rays is a jit
STATIC, so one process can sweep safely (each cadence compiles its
own program).  Warm protocol: rep 0 discarded, min of 3.

Film differences across cadences are permutation-order-only (ulp f32
reassociation on duplicate same-pixel deposits — same class as the
sort-on/off comparison).

Writes artifacts/sort_cadence_r04.json.

Usage: python tools/probe_sort_cadence.py [scene ...]
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

SCENES = ("eve", "lucy", "sphere_grid")
CADENCES = (1, 2, 4, 8)
W, H, SPP, DEPTH = 480, 270, 8, 16
ART = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "artifacts", "sort_cadence_r04.json")


def main():
    import jax
    from mrt.scenes import get
    from mrt.runtime.render import render

    print("devices:", jax.devices(), flush=True)
    names = sys.argv[1:] or list(SCENES)
    rows = {}
    if os.path.exists(ART):
        with open(ART) as f:
            rows = json.load(f).get("scenes", {})
    for name in names:
        scene, camera = get(name)().generate()
        for cad in CADENCES:
            times = []
            for rep in range(4):
                t0 = time.time()
                film = render(scene, camera, W, H, spp=SPP,
                              max_depth=DEPTH, seed=1, persistent=True,
                              sort_rays=cad)
                jax.block_until_ready(film.sum)
                times.append(time.time() - t0)
            dt = min(times[1:])
            rows.setdefault(name, {})[f"cadence{cad}"] = dict(
                steady_s=round(dt, 3),
                krays=round(W * H * SPP / dt / 1e3, 1),
                mean=f"{float(film.mean().mean()):.9f}")
            print(f"{name} cadence={cad} steady={dt:.3f}s", flush=True)
    os.makedirs(os.path.dirname(ART), exist_ok=True)
    with open(ART, "w") as f:
        json.dump({"shape": f"{W}x{H} spp{SPP} d{DEPTH}",
                   "scenes": rows}, f, indent=1)
    print("wrote", ART, flush=True)
    print("OK", flush=True)


if __name__ == "__main__":
    main()
