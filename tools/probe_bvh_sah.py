"""Binned-SAH vs median-split BVH A/B on the real TPU.

MRT_BVH=sah switches every host BVH build (BLAS meshes, sphere BVH,
TLAS top level) from deterministic widest-axis median to binned SAH.
CPU microbench: 1.76x fewer mean node visits on scattered geometry;
per-ray hits are bit-identical (closest-hit is tree-independent up to
exact-t ties, which the deterministic tie rule resolves by reordered
primitive index — so film means can differ only on exact ties).

Warm protocol (BASELINE "Measurement protocol correction"): rep 0
discarded, MIN of 3 steady reps.  Fresh subprocess per variant (the
env is read at scene build).  Writes artifacts/bvh_sah_r04.json.

Usage: python tools/probe_bvh_sah.py [scene ...]
"""
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

SCENES = ("eve", "lucy", "sphere_grid", "cornell")
W, H, SPP, DEPTH = 480, 270, 8, 16
ART = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "artifacts", "bvh_sah_r04.json")

VARIANTS = {"median": "median", "sah": "sah"}


def run_variant(variant, names):
    import jax

    print("devices:", jax.devices(), "bvh:", variant, flush=True)
    from mrt.scenes import get
    from mrt.runtime.render import render

    for name in names:
        scene, camera = get(name)().generate()
        times = []
        for rep in range(4):
            t0 = time.time()
            film = render(scene, camera, W, H, spp=SPP, max_depth=DEPTH,
                          seed=1, persistent=True)
            jax.block_until_ready(film.sum)
            times.append(time.time() - t0)
        last = min(times[1:])
        rays = W * H * SPP
        print(f"RESULT variant={variant} scene={name} steady={last:.3f} "
              f"krays={rays/last/1e3:.1f} "
              f"mean={float(film.mean().mean()):.9f}", flush=True)


def main():
    names = sys.argv[1:] or list(SCENES)
    rows = {}
    if os.path.exists(ART):
        with open(ART) as f:
            rows = json.load(f).get("scenes", {})
    for variant, flag in VARIANTS.items():
        env = dict(os.environ, MRT_BVH=flag)
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--run",
             variant] + names, env=env, capture_output=True, text=True,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
        sys.stdout.write(r.stdout)
        sys.stderr.write(r.stderr[-2000:] if r.returncode else "")
        if r.returncode != 0:
            print(f"variant={variant} FAILED exit {r.returncode}",
                  flush=True)
            continue
        for line in r.stdout.splitlines():
            if line.startswith("RESULT"):
                kv = dict(p.split("=", 1) for p in line.split()[1:])
                rows.setdefault(kv["scene"], {})[kv["variant"]] = dict(
                    steady_s=float(kv["steady"]),
                    krays=float(kv["krays"]), mean=kv["mean"])
    os.makedirs(os.path.dirname(ART), exist_ok=True)
    with open(ART, "w") as f:
        json.dump({"shape": f"{W}x{H} spp{SPP} d{DEPTH}",
                   "scenes": rows}, f, indent=1)
    print("wrote", ART, flush=True)
    for name, r in rows.items():
        if "median" in r and "sah" in r:
            gain = r["median"]["steady_s"] / r["sah"]["steady_s"]
            dm = abs(float(r["median"]["mean"]) - float(r["sah"]["mean"]))
            print(f"{name:12s} median {r['median']['steady_s']:6.2f}s "
                  f"sah {r['sah']['steady_s']:6.2f}s ({gain:4.2f}x)  "
                  f"dmean={dm:.2e}", flush=True)
    print("OK", flush=True)


if __name__ == "__main__":
    if len(sys.argv) >= 3 and sys.argv[1] == "--run":
        run_variant(sys.argv[2], sys.argv[3:])
    else:
        main()
