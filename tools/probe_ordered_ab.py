"""Ordered (front-to-back) packet traversal A/B on the real TPU.

Each variant runs in a FRESH SUBPROCESS (MRT_ORDERED binds at import
into pallas_bvh.ORDERED and the jitted traversals would otherwise reuse
the first variant's compiled program — the probe_bench_ab lesson).

Per scene: render twice through the persistent driver at the zoo
preview shape, report the second (steady) wall time and the film mean.
The deterministic tie rule makes means bit-identical across variants —
any difference is a correctness bug, not noise.

Usage: python tools/probe_ordered_ab.py [scene ...]
"""
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

SCENES = ("rtiow", "cornell", "sphere_grid", "lucy", "eve")
W, H, SPP, DEPTH = 480, 270, 8, 16


def run_variant(ordered, names):
    import jax

    print("devices:", jax.devices(), "ordered:", ordered, flush=True)
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
        print(f"ordered={ordered} {name:12s} steady {last:6.2f}s "
              f"{rays/last/1e3:8.1f}k rays/s "
              f"mean {float(film.mean().mean()):.6f}", flush=True)


def main():
    names = sys.argv[1:] or list(SCENES)
    for ordered in ("0", "1"):
        env = dict(os.environ, MRT_ORDERED=ordered)
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--run",
             ordered] + names, env=env,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
        if r.returncode != 0:
            print(f"ordered={ordered} FAILED exit {r.returncode}",
                  flush=True)
    print("OK", flush=True)


if __name__ == "__main__":
    if len(sys.argv) >= 3 and sys.argv[1] == "--run":
        run_variant(sys.argv[2], sys.argv[3:])
    else:
        main()
