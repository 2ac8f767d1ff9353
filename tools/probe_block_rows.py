"""Packet-size (BLOCK_ROWS) sweep for the resident packet kernels.

A packet shares one scalar traversal cursor; on divergent mid-path
wavefronts each packet visits ~the union of its lanes' subtrees, which
saturates toward the whole tree (eve/lucy).  Larger packets then do
~the same iterations over more rays, amortising the scalar control —
at the cost of more vector work per iteration.  This sweeps
MRT_BLOCK_ROWS (fresh subprocess per value: read at import) on the
packet-kernel zoo scenes.  Means must be bit-identical: packing
changes neither per-ray winners (deterministic tie rules) nor the
lane permutation.

Writes artifacts/block_rows_r04.json (merging partial re-runs).

Usage: python tools/probe_block_rows.py [rows ...] [scene ...]
"""
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

SCENES = ("eve", "lucy", "sphere_grid")
ROWS = ("8", "16", "32")
W, H, SPP, DEPTH = 480, 270, 8, 16
ART = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "artifacts", "block_rows_r04.json")


def run_variant(rows, names):
    import jax

    print("devices:", jax.devices(), "block_rows:", rows, flush=True)
    from mrt.scenes import get
    from mrt.runtime.render import render

    for name in names:
        scene, camera = get(name)().generate()
        # Rep 0 warms compile + chip clocks (a chip idle for minutes
        # reads 20-70% slow on its first dispatches — observed on eve:
        # 1.43 s cold-first vs 0.83 s warm); report the MIN of 3
        # steady reps, robust to transient host stalls.
        times = []
        for rep in range(4):
            t0 = time.time()
            film = render(scene, camera, W, H, spp=SPP, max_depth=DEPTH,
                          seed=1, persistent=True)
            jax.block_until_ready(film.sum)
            times.append(time.time() - t0)
        last = min(times[1:])
        rays = W * H * SPP
        print(f"RESULT rows={rows} scene={name} steady={last:.3f} "
              f"krays={rays/last/1e3:.1f} "
              f"mean={float(film.mean().mean()):.9f}", flush=True)


def main():
    args = sys.argv[1:]
    rows_list = [a for a in args if a.isdigit()] or list(ROWS)
    names = [a for a in args if not a.isdigit()] or list(SCENES)
    rows = {}
    if os.path.exists(ART):
        with open(ART) as f:
            rows = json.load(f).get("scenes", {})
    for br in rows_list:
        env = dict(os.environ, MRT_BLOCK_ROWS=br)
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--run",
             br] + names, env=env, capture_output=True, text=True,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
        sys.stdout.write(r.stdout)
        sys.stderr.write(r.stderr[-2000:] if r.returncode else "")
        if r.returncode != 0:
            print(f"rows={br} FAILED exit {r.returncode}", flush=True)
            continue
        for line in r.stdout.splitlines():
            if line.startswith("RESULT"):
                kv = dict(p.split("=", 1) for p in line.split()[1:])
                rows.setdefault(kv["scene"], {})[f"rows{kv['rows']}"] = \
                    dict(steady_s=float(kv["steady"]),
                         krays=float(kv["krays"]), mean=kv["mean"])
    os.makedirs(os.path.dirname(ART), exist_ok=True)
    with open(ART, "w") as f:
        json.dump({"shape": f"{W}x{H} spp{SPP} d{DEPTH}",
                   "scenes": rows}, f, indent=1)
    print("wrote", ART, flush=True)
    for name, r in rows.items():
        base = r.get("rows8")
        if not base:
            continue
        line = f"{name:12s} rows8 {base['steady_s']:6.2f}s"
        for k in sorted(r):
            if k == "rows8":
                continue
            gain = base["steady_s"] / r[k]["steady_s"]
            agree = "OK" if r[k]["mean"] == base["mean"] else "DIFFER"
            line += (f"  {k} {r[k]['steady_s']:6.2f}s ({gain:4.2f}x, "
                     f"means {agree})")
        print(line, flush=True)
    print("OK", flush=True)


if __name__ == "__main__":
    if len(sys.argv) >= 3 and sys.argv[1] == "--run":
        run_variant(sys.argv[2], sys.argv[3:])
    else:
        main()
