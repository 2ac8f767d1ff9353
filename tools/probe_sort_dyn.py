"""Dynamic-origin-bounds lane sorting A/B on the real TPU.

Static scene bounds degenerate on lucy/eve (a distant sun sphere makes
the 64-cell origin grid ~195 units/cell, collapsing the detailed
geometry into one cell — the sort key reduces to direction bits).
MRT_SORT_DYN=1 quantises over the active wavefront's own origin
bounds.  Permutation-only: film means must be BIT-IDENTICAL between
variants; only packet coherence (and so wall time) may change.

Each variant runs in a fresh subprocess.  Writes
artifacts/sort_dyn_r04.json (merging partial re-runs).

Usage: python tools/probe_sort_dyn.py [scene ...]
"""
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

SCENES = ("lucy", "eve", "sphere_grid")
W, H, SPP, DEPTH = 480, 270, 8, 16
ART = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "artifacts", "sort_dyn_r04.json")

VARIANTS = {"static": "0", "dyn": "1"}


def run_variant(variant, names):
    import jax

    print("devices:", jax.devices(), "variant:", variant, flush=True)
    from mrt.scenes import get
    from mrt.runtime.render import render

    for name in names:
        scene, camera = get(name)().generate()
        # Rep 0 warms compile + chip clocks (an idle chip reads 20-70%
        # slow on first dispatches); MIN of 3 steady reps is robust to
        # transient host stalls.
        times = []
        for rep in range(4):
            t0 = time.time()
            film = render(scene, camera, W, H, spp=SPP, max_depth=DEPTH,
                          seed=1, persistent=True, sort_rays=1)
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
        env = dict(os.environ, MRT_SORT_DYN=flag)
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
        json.dump({"shape": f"{W}x{H} spp{SPP} d{DEPTH} sort=1",
                   "scenes": rows}, f, indent=1)
    print("wrote", ART, flush=True)
    for name, r in rows.items():
        if "static" in r and "dyn" in r:
            gain = r["static"]["steady_s"] / r["dyn"]["steady_s"]
            agree = r["static"]["mean"] == r["dyn"]["mean"]
            print(f"{name:12s} static {r['static']['steady_s']:6.2f}s "
                  f"dyn {r['dyn']['steady_s']:6.2f}s ({gain:4.2f}x)  "
                  f"means {'OK' if agree else 'DIFFER'}", flush=True)
    print("OK", flush=True)


if __name__ == "__main__":
    if len(sys.argv) >= 3 and sys.argv[1] == "--run":
        run_variant(sys.argv[2], sys.argv[3:])
    else:
        main()
