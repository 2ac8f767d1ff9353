"""Steady-state full-render A/B at the exact bench workload.

RTIOW 1920x1080 spp=8 depth=50, pool 2^16 (the driver's capped pool for
this frame): each variant renders TWICE through the real chunked driver
and reports the second (warm) wall time — first-run numbers include
remote compiles and are useless for decisions.

  xla-packet : current default (sphere BVH packet kernel)
  xla-brute  : sphere_bvh dropped -> fused XLA chunk scan
  mega       : fused Pallas megastep kernel
"""
import time

POOL = 1 << 16
W, H, SPP, DEPTH = 1920, 1080, 8, 50


def main():
    import jax

    print("devices:", jax.devices(), flush=True)

    from mrt.scenes import get
    from mrt.integrator.persistent import render_samples_chunked

    scene, camera = get("rtiow")(aspect_ratio=16 / 9).generate()

    import os

    variants = [
        ("xla-packet", scene, False, None),
        ("xla-brute", scene.replace(sphere_bvh=None), False, None),
        ("xla-x", scene.replace(sphere_bvh=None), False, "x"),
        ("mega", scene, True, None),
    ]
    rays = W * H * SPP
    for name, sc, mega, skern in variants:
        if skern is None:
            os.environ.pop("MRT_SPHERE_KERNEL", None)
        else:
            os.environ["MRT_SPHERE_KERNEL"] = skern
        try:
            for rep in range(2):
                t0 = time.time()
                s, d = render_samples_chunked(
                    sc, camera, W, H, 1, 0, SPP, max_depth=DEPTH,
                    pool=POOL, mega=mega)
                jax.block_until_ready(s)
                dt = time.time() - t0
            print(f"{name:10s} {dt:7.2f}s warm  "
                  f"{rays / dt / 1e6:6.2f} Mrays/s  "
                  f"mean {float(s.mean()) / SPP:.5f}", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{name:10s} FAILED: {type(e).__name__}: {e}",
                  flush=True)
    print("OK", flush=True)


if __name__ == "__main__":
    import sys, os
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, root)
    main()
