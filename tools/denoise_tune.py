"""Two-stage denoiser tuning (VERDICT r2 #7: cornell embarrassed).

Stage 1 (TPU, once): render the metric buffers — noisy low-spp frame,
converged reference, AOV guides — and save them to artifacts/
denoise_buffers.npz.

Stage 2 (CPU, fast iteration): grid-search denoise() parameters
(iterations, firefly clamp, sigmas) against the saved buffers and print
a PSNR/SSIM table.  The winner goes into runtime/denoise.py defaults
and tools/denoise_metrics.py re-measures end-to-end.

Usage:
  python tools/denoise_tune.py --capture     # on TPU
  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
  python tools/denoise_tune.py               # tune on CPU
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np

BUF = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "artifacts", "denoise_buffers.npz")


def capture(size=160, spp_low=4, spp_ref=512):
    from mrt.scenes import get
    from mrt.runtime.render import render
    from mrt.runtime.film import DisplayMode
    from mrt.integrator.aov import albedo_normal_frame

    out = {}
    for name in ("rtiow", "cornell"):
        scene, camera = get(name)(aspect_ratio=1.0).generate()
        film_ref = render(scene, camera, size, size, spp=spp_ref,
                          max_depth=8, seed=1)
        film_low = render(scene, camera, size, size, spp=spp_low,
                          max_depth=8, seed=2)
        albedo, normal = albedo_normal_frame(scene, camera, size, size,
                                             seed=1)
        out[f"{name}_ref"] = np.asarray(
            film_ref.to_float_rgb(DisplayMode.DEFAULT))
        out[f"{name}_low"] = np.asarray(
            film_low.to_float_rgb(DisplayMode.DEFAULT))
        out[f"{name}_albedo"] = np.asarray(albedo)
        out[f"{name}_normal"] = np.asarray(normal)
        print("captured", name, flush=True)
    os.makedirs(os.path.dirname(BUF), exist_ok=True)
    np.savez_compressed(BUF, **out)
    print("wrote", BUF, flush=True)


def tune():
    from denoise_metrics import psnr, ssim
    from mrt.runtime.denoise import denoise

    d = np.load(BUF)
    grids = dict(
        iterations=(3, 4, 5, 6),
        firefly_k=(0.0, 2.0, 4.0, 8.0),
        sigma_color=(0.2, 0.35, 0.6),
    )
    base = dict(iterations=4, firefly_k=4.0, sigma_color=0.35)
    scenes = ("rtiow", "cornell")

    def score(cfg):
        vals = {}
        for name in scenes:
            den = np.asarray(denoise(d[f"{name}_low"],
                                     d[f"{name}_albedo"],
                                     d[f"{name}_normal"], **cfg))
            vals[name] = (psnr(den, d[f"{name}_ref"]),
                          ssim(den, d[f"{name}_ref"]))
        return vals

    for name in scenes:
        p = psnr(d[f"{name}_low"], d[f"{name}_ref"])
        s = ssim(d[f"{name}_low"], d[f"{name}_ref"])
        print(f"noisy      {name:8s} {p:6.2f}dB  ssim {s:.4f}",
              flush=True)

    # Axis-aligned sweep around the base config.
    for key, values in grids.items():
        for v in values:
            cfg = dict(base, **{key: v})
            vals = score(cfg)
            row = "  ".join(f"{n} {p:6.2f}dB/{s:.4f}"
                            for n, (p, s) in vals.items())
            print(f"{key}={v!s:6s} {row}", flush=True)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--capture", action="store_true")
    a = ap.parse_args()
    if a.capture:
        capture()
    else:
        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        tune()
