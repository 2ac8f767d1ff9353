"""World-flattened vs packet TLAS A/B on the real TPU.

Each variant runs in a FRESH SUBPROCESS (MRT_TLAS_KERNEL is read at
trace time; reusing a process would hit the first variant's compiled
program — the probe_bench_ab lesson).

Per flatten-eligible TLAS scene: render twice through the persistent
driver at the zoo preview shape, report the second (steady) wall time
and film mean.  Unlike the brute A/B the means are NOT bit-identical —
world-space triangle intersection is different arithmetic from the
object-space warp — so means must agree to MC tolerance (~1e-3).

Variants: packet (two-level, auto sort), flat (single-level world BVH,
auto sort rule = the TLAS instance-count rule), flat_ns (flat, sorting
forced off — flattening may already remove the divergence sorting
pays for).

Writes artifacts/tlas_flat_r04.json when run as the driver.

Usage: python tools/probe_tlas_flat.py [scene ...]
"""
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

SCENES = ("cornell", "playground", "eve", "lucy")
W, H, SPP, DEPTH = 480, 270, 8, 16
ART = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "artifacts", "tlas_flat_r04.json")

VARIANTS = {
    "packet": ("packet", None, {}),
    "flat": ("flat", None, {}),
    "flat_ns": ("flat", 0, {}),
    # Clustered even when the single flat BVH would fit: smaller
    # per-part trees shrink each packet's traversal union on
    # divergence-bound scenes (eve).  Only run when asked by name.
    "split1536": ("flat", None, {"MRT_FLAT_SPLIT": "1536"}),
    "split768": ("flat", None, {"MRT_FLAT_SPLIT": "768"}),
}
DEFAULT_VARIANTS = ("packet", "flat", "flat_ns")


def run_variant(variant, names):
    import jax

    kind, sort_rays, _ = VARIANTS[variant]
    print("devices:", jax.devices(), "variant:", variant, flush=True)
    from mrt.scenes import get
    from mrt.runtime.render import render

    for name in names:
        scene, camera = get(name)().generate()
        if (kind == "flat" and scene.tlas.flat_tris is None
                and scene.tlas.flat_parts is None):
            print(f"RESULT variant={variant} scene={name} skipped=1",
                  flush=True)
            continue
        # Rep 0 warms compile + chip clocks (an idle chip reads 20-70%
        # slow on first dispatches); MIN of 3 steady reps is robust to
        # transient host stalls.
        times = []
        for rep in range(4):
            t0 = time.time()
            film = render(scene, camera, W, H, spp=SPP, max_depth=DEPTH,
                          seed=1, persistent=True, sort_rays=sort_rays)
            jax.block_until_ready(film.sum)
            times.append(time.time() - t0)
        last = min(times[1:])
        rays = W * H * SPP
        print(f"RESULT variant={variant} scene={name} steady={last:.3f} "
              f"krays={rays/last/1e3:.1f} "
              f"mean={float(film.mean().mean()):.6f}", flush=True)


def main():
    args = sys.argv[1:]
    variants = [a for a in args if a in VARIANTS] or list(
        DEFAULT_VARIANTS)
    names = [a for a in args if a not in VARIANTS] or list(SCENES)
    rows = {}
    if os.path.exists(ART):  # merge partial re-runs, don't clobber
        with open(ART) as f:
            rows = json.load(f).get("scenes", {})
    for variant in variants:
        kind, _, extra = VARIANTS[variant]
        env = dict(os.environ, MRT_TLAS_KERNEL=kind, **extra)
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
            if line.startswith("RESULT") and "skipped" not in line:
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
        if "packet" in r and "flat" in r:
            gain = r["packet"]["steady_s"] / r["flat"]["steady_s"]
            dm = abs(float(r["packet"]["mean"]) - float(r["flat"]["mean"]))
            print(f"{name:12s} packet {r['packet']['steady_s']:6.2f}s "
                  f"flat {r['flat']['steady_s']:6.2f}s ({gain:4.2f}x) "
                  f"flat_ns {r.get('flat_ns', {}).get('steady_s', -1):6.2f}s"
                  f"  dmean={dm:.2e}", flush=True)
    print("OK", flush=True)


if __name__ == "__main__":
    if len(sys.argv) >= 3 and sys.argv[1] == "--run":
        run_variant(sys.argv[2], sys.argv[3:])
    else:
        main()
