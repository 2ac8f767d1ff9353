"""Instanced-brute vs packet TLAS A/B on the real TPU.

Each variant runs in a FRESH SUBPROCESS (MRT_TLAS_KERNEL is read at
trace time; reusing a process would hit the first variant's compiled
program — the probe_bench_ab lesson).

Per TLAS scene: render twice through the persistent driver at the zoo
preview shape, report the second (steady) wall time and the film mean.
Both paths share the deterministic (t, instance, triangle) tie rule,
so means must be bit-identical — any difference is a correctness bug.

Writes artifacts/tlas_brute_r04.json when run as the driver.

Usage: python tools/probe_tlas_brute.py [scene ...]
"""
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

SCENES = ("cornell", "playground", "lucy", "eve")
W, H, SPP, DEPTH = 480, 270, 8, 16
ART = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "artifacts", "tlas_brute_r04.json")


def run_variant(kind, names):
    import jax

    print("devices:", jax.devices(), "tlas kernel:", kind, flush=True)
    from mrt.scenes import get
    from mrt.runtime.render import render

    for name in names:
        scene, camera = get(name)().generate()
        last = None
        for rep in range(2):
            t0 = time.time()
            film = render(scene, camera, W, H, spp=SPP, max_depth=DEPTH,
                          seed=1, persistent=True)
            jax.block_until_ready(film.sum)
            last = time.time() - t0
        rays = W * H * SPP
        print(f"RESULT kind={kind} scene={name} steady={last:.3f} "
              f"krays={rays/last/1e3:.1f} "
              f"mean={float(film.mean().mean()):.6f}", flush=True)


def main():
    names = sys.argv[1:] or list(SCENES)
    rows = {}
    for kind in ("packet", "brute"):
        env = dict(os.environ, MRT_TLAS_KERNEL=kind)
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--run",
             kind] + names, env=env, capture_output=True, text=True,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
        sys.stdout.write(r.stdout)
        sys.stderr.write(r.stderr[-2000:] if r.returncode else "")
        if r.returncode != 0:
            print(f"kind={kind} FAILED exit {r.returncode}", flush=True)
            continue
        for line in r.stdout.splitlines():
            if line.startswith("RESULT"):
                kv = dict(p.split("=", 1) for p in line.split()[1:])
                rows.setdefault(kv["scene"], {})[kv["kind"]] = dict(
                    steady_s=float(kv["steady"]),
                    krays=float(kv["krays"]), mean=kv["mean"])
    os.makedirs(os.path.dirname(ART), exist_ok=True)
    with open(ART, "w") as f:
        json.dump({"shape": f"{W}x{H} spp{SPP} d{DEPTH}",
                   "scenes": rows}, f, indent=1)
    print("wrote", ART, flush=True)
    for name, r in rows.items():
        if "packet" in r and "brute" in r:
            gain = r["packet"]["steady_s"] / r["brute"]["steady_s"]
            agree = r["packet"]["mean"] == r["brute"]["mean"]
            print(f"{name:12s} packet {r['packet']['steady_s']:6.2f}s "
                  f"brute {r['brute']['steady_s']:6.2f}s "
                  f"({gain:4.2f}x)  means {'OK' if agree else 'DIFFER'}",
                  flush=True)
    print("OK", flush=True)


if __name__ == "__main__":
    if len(sys.argv) >= 3 and sys.argv[1] == "--run":
        run_variant(sys.argv[2], sys.argv[3:])
    else:
        main()
