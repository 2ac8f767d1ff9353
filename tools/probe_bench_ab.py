"""Steady-state full-render A/B at the exact bench workload.

RTIOW 1920x1080 spp=8 depth=50, pool 2^16 (the driver's capped pool for
this frame): each variant renders TWICE through the real chunked driver
and reports the second (warm) wall time — first-run numbers include
remote compiles and are useless for decisions.

Each variant runs in a FRESH SUBPROCESS (ADVICE r2: MRT_SPHERE_KERNEL
is read at trace time, and the jitted chunk functions cache-key only on
the scene pytree + statics, so an in-process env flip after a prior
variant traced silently reuses the previous compiled program — the r2
xla-x number was the brute scan re-measured).

  xla-packet : current default (sphere BVH packet kernel)
  xla-brute  : sphere_bvh dropped -> fused XLA chunk scan
  xla-x      : sphere_bvh dropped + expanded dense Pallas sphere kernel
(The megastep variant was removed with the kernel in round 4 —
artifacts/megastep_r04.json records its final losing A/B.)
"""
import os
import subprocess
import sys
import time

POOL = 1 << 16
W, H, SPP, DEPTH = 1920, 1080, 8, 50

VARIANTS = {
    # name: (drop_sphere_bvh, MRT_SPHERE_KERNEL)
    "xla-packet": (False, None),
    "xla-brute": (True, None),
    "xla-x": (True, "x"),
}


def run_variant(name):
    drop_bvh, skern = VARIANTS[name]
    import jax

    print("devices:", jax.devices(), flush=True)
    from mrt.scenes import get
    from mrt.integrator.persistent import render_samples_chunked

    scene, camera = get("rtiow")(aspect_ratio=16 / 9).generate()
    if drop_bvh:
        scene = scene.replace(sphere_bvh=None)
    rays = W * H * SPP
    for rep in range(2):
        t0 = time.time()
        s, d = render_samples_chunked(
            scene, camera, W, H, 1, 0, SPP, max_depth=DEPTH,
            pool=POOL)
        jax.block_until_ready(s)
        dt = time.time() - t0
    print(f"{name:10s} {dt:7.2f}s warm  "
          f"{rays / dt / 1e6:6.2f} Mrays/s  "
          f"mean {float(s.mean()) / SPP:.5f}", flush=True)


def main():
    names = sys.argv[1:] or list(VARIANTS)
    for name in names:
        env = dict(os.environ)
        env.pop("MRT_SPHERE_KERNEL", None)
        skern = VARIANTS[name][2]
        if skern is not None:
            env["MRT_SPHERE_KERNEL"] = skern
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__),
             "--run", name], env=env,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
        if r.returncode != 0:
            print(f"{name:10s} FAILED (exit {r.returncode})", flush=True)
    print("OK", flush=True)


if __name__ == "__main__":
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, root)
    if len(sys.argv) >= 3 and sys.argv[1] == "--run":
        run_variant(sys.argv[2])
    else:
        main()
