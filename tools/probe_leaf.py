"""Leaf-size sweep for packet traversal (fresh subprocess per value).

Packet kernels share one scalar traversal cursor per 1024-lane packet:
inner-node steps are serial, leaf primitive tests are vector-wide.
Bigger leaves = fewer serial steps x more (cheap) vector tests.  Sweeps
MRT_LEAF_SIZE over the traversal-bound scenes; film means printed so a
sweep value can be checked for estimator neutrality (tree shape may
flip exact-tie winners only).

Usage: python tools/probe_leaf.py [scene ...]   (default: eve lucy)
"""
import os
import subprocess
import sys

LEAVES = tuple(int(x) for x in os.environ.get('MRT_LEAF_SWEEP','4,8,16').split(','))


def run_one(scene):
    import time

    import jax
    from mrt.scenes import get
    from mrt.runtime.render import render

    leaf = os.environ.get("MRT_LEAF_SIZE", "4")
    scene_obj, camera = get(scene)().generate()
    W, H, SPP, DEPTH = 480, 270, 8, 16
    last = None
    for rep in range(2):
        t0 = time.time()
        film = render(scene_obj, camera, W, H, spp=SPP, max_depth=DEPTH,
                      seed=1, persistent=True, sort_rays=True)
        jax.block_until_ready(film.sum)
        last = time.time() - t0
    rays = W * H * SPP
    print(f"{scene:10s} leaf={leaf:>2s}: steady {last:.2f}s "
          f"{rays/last/1e3:.1f}k rays/s "
          f"mean {float(film.mean().mean()):.5f}", flush=True)


def main():
    scenes = sys.argv[1:] or ["eve", "lucy"]
    for scene in scenes:
        for leaf in LEAVES:
            env = dict(os.environ, MRT_LEAF_SIZE=str(leaf))
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--run",
                 scene], env=env,
                cwd=os.path.dirname(os.path.dirname(
                    os.path.abspath(__file__))))
            if r.returncode != 0:
                print(f"{scene} leaf={leaf} FAILED", flush=True)
    print("OK", flush=True)


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    if len(sys.argv) >= 3 and sys.argv[1] == "--run":
        run_one(sys.argv[2])
    else:
        main()
