"""Quantify the denoiser: PSNR/SSIM of denoised low-spp vs converged.

VERDICT r2 #7: "implemented" without "is it actually good".  For each
scene, render a noisy SPP_LOW frame and a converged SPP_REF frame,
tonemap both exactly as the display path does (gamma 1/2.2, the surface
OIDN filters in the reference, main.rs:724-747), denoise the noisy one
with the AOV guides, and report PSNR/SSIM of noisy-vs-ref and
denoised-vs-ref.  Writes artifacts/denoise_r{N}.json.

Usage: python tools/denoise_metrics.py [--size 160] [--out FILE]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np


def psnr(a, b):
    mse = np.mean((a - b) ** 2)
    return float(10.0 * np.log10(1.0 / max(mse, 1e-12)))


def _gauss_win(size=11, sigma=1.5):
    x = np.arange(size) - size // 2
    k = np.exp(-(x ** 2) / (2 * sigma ** 2))
    return k / k.sum()


def ssim(a, b):
    """Mean SSIM over channels, 11x11 gaussian window, K1/K2 standard."""
    k = _gauss_win()

    def filt(img):
        out = np.apply_along_axis(
            lambda r: np.convolve(r, k, mode="valid"), 0, img)
        return np.apply_along_axis(
            lambda r: np.convolve(r, k, mode="valid"), 1, out)

    c1, c2 = 0.01 ** 2, 0.03 ** 2
    vals = []
    for ch in range(a.shape[-1]):
        x, y = a[..., ch], b[..., ch]
        mx, my = filt(x), filt(y)
        vx = filt(x * x) - mx * mx
        vy = filt(y * y) - my * my
        vxy = filt(x * y) - mx * my
        s = ((2 * mx * my + c1) * (2 * vxy + c2)
             / ((mx ** 2 + my ** 2 + c1) * (vx + vy + c2)))
        vals.append(s.mean())
    return float(np.mean(vals))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=160)
    ap.add_argument("--spp-low", type=int, default=4)
    ap.add_argument("--spp-ref", type=int, default=512)
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "artifacts", "denoise_r04.json"))
    args = ap.parse_args()

    from mrt.scenes import get
    from mrt.runtime.render import render
    from mrt.runtime.film import DisplayMode
    from mrt.runtime.denoise import denoise
    from mrt.integrator.aov import albedo_normal_frame

    size = args.size
    results = {}
    # cornell_nee: the production low-spp path for enclosed interiors.
    # The no-NEE cornell 4-spp frame carries ~18% of converged energy
    # (7% non-black pixels) — an estimator gap no post filter can
    # close, so the denoiser is also scored on the NEE estimator.
    for name in ("rtiow", "cornell", "cornell_nee"):
        nee = name.endswith("_nee")
        scene, camera = get(name[:-4] if nee else name)(
            aspect_ratio=1.0).generate()
        if nee:
            from mrt.geometry.scene import attach_lights
            scene = attach_lights(scene)
        t0 = time.time()
        film_ref = render(scene, camera, size, size, spp=args.spp_ref,
                          max_depth=8, seed=1)
        film_low = render(scene, camera, size, size, spp=args.spp_low,
                          max_depth=8, seed=2)
        albedo, normal = albedo_normal_frame(scene, camera, size, size,
                                             seed=1)
        rgb_ref = np.asarray(film_ref.to_float_rgb(DisplayMode.DEFAULT))
        rgb_low = np.asarray(film_low.to_float_rgb(DisplayMode.DEFAULT))
        den = np.asarray(denoise(rgb_low, np.asarray(albedo),
                                 np.asarray(normal)))
        dt = time.time() - t0
        r = {
            "noisy_psnr": round(psnr(rgb_low, rgb_ref), 2),
            "denoised_psnr": round(psnr(den, rgb_ref), 2),
            "noisy_ssim": round(ssim(rgb_low, rgb_ref), 4),
            "denoised_ssim": round(ssim(den, rgb_ref), 4),
            "wall_s": round(dt, 1),
        }
        results[name] = r
        print(f"{name}: noisy {r['noisy_psnr']}dB/{r['noisy_ssim']} -> "
              f"denoised {r['denoised_psnr']}dB/{r['denoised_ssim']}",
              flush=True)

    payload = {"size": size, "spp_low": args.spp_low,
               "spp_ref": args.spp_ref, "max_depth": 8,
               "scenes": results}
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(payload, f, indent=1)
    print("wrote", args.out, flush=True)


if __name__ == "__main__":
    main()
