"""Denoiser hard-case diagnosis: spp sweep on cornell WITHOUT NEE.

VERDICT r4 #2 / r5 #7: the à-trous filter gains only +1.0 dB on the
4-spp no-NEE cornell (artifacts/denoise_r04.json) and the
"energy-limited, not filter-limited" explanation was asserted without
data.  This sweep renders the same scene at 4/16/64/256 spp through
the SAME filter against one 1024-spp reference and records, per spp:

  * captured-energy ratio (sum of linear radiance vs the reference) —
    the estimator-side ceiling no post filter can move,
  * nonblack-pixel fraction (how sparse the paths-that-found-light
    are),
  * noisy and denoised PSNR/SSIM.

If denoised gain rises with spp while the 4-spp energy ratio sits
far below 1, the hard case is energy-limited: the filter has nothing
to redistribute where paths never found the light.  (The production
answer for enclosed interiors is the NEE estimator, scored in
denoise_metrics.py.)

    python tools/denoise_sweep.py [--size 160]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np

from tools.denoise_metrics import psnr, ssim


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=160)
    ap.add_argument("--spp-ref", type=int, default=1024)
    ap.add_argument("--spps", type=int, nargs="*",
                    default=[4, 16, 64, 256])
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "artifacts", "denoise_sweep_r05.json"))
    args = ap.parse_args()

    from mrt.scenes import get
    from mrt.runtime.render import render
    from mrt.runtime.film import DisplayMode
    from mrt.runtime.denoise import denoise
    from mrt.integrator.aov import albedo_normal_frame

    size = args.size
    scene, camera = get("cornell")(aspect_ratio=1.0).generate()
    t0 = time.time()
    film_ref = render(scene, camera, size, size, spp=args.spp_ref,
                      max_depth=8, seed=1, persistent=True)
    rgb_ref = np.asarray(film_ref.to_float_rgb(DisplayMode.DEFAULT))
    lin_ref = np.asarray(film_ref.sum) / args.spp_ref
    albedo, normal = albedo_normal_frame(scene, camera, size, size,
                                         seed=1)
    print(f"ref {args.spp_ref}spp in {time.time()-t0:.0f}s",
          flush=True)

    rows = []
    for spp in args.spps:
        t0 = time.time()
        film = render(scene, camera, size, size, spp=spp, max_depth=8,
                      seed=2, persistent=True)
        lin = np.asarray(film.sum) / spp
        rgb = np.asarray(film.to_float_rgb(DisplayMode.DEFAULT))
        den = np.asarray(denoise(rgb, np.asarray(albedo),
                                 np.asarray(normal)))
        r = {
            "spp": spp,
            "energy_ratio": round(float(lin.sum() / lin_ref.sum()), 4),
            "nonblack_frac": round(float((lin.sum(-1) > 1e-6).mean()),
                                   4),
            "noisy_psnr": round(psnr(rgb, rgb_ref), 2),
            "denoised_psnr": round(psnr(den, rgb_ref), 2),
            "noisy_ssim": round(ssim(rgb, rgb_ref), 4),
            "denoised_ssim": round(ssim(den, rgb_ref), 4),
            "wall_s": round(time.time() - t0, 1),
        }
        rows.append(r)
        print(f"spp{spp}: energy {r['energy_ratio']:.2%} nonblack "
              f"{r['nonblack_frac']:.2%} noisy {r['noisy_psnr']}dB -> "
              f"denoised {r['denoised_psnr']}dB "
              f"(+{r['denoised_psnr']-r['noisy_psnr']:.2f})",
              flush=True)

    payload = {"scene": "cornell (no NEE)", "size": size,
               "max_depth": 8, "spp_ref": args.spp_ref, "sweep": rows}
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(payload, f, indent=1)
    print("wrote", args.out, flush=True)


if __name__ == "__main__":
    main()
