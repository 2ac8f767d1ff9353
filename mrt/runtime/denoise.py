"""AOV-guided denoiser (the OIDN-equivalent post filter).

The reference optionally runs Intel Open Image Denoise over the
tonemapped sRGB frame with albedo+normal guide buffers
(reference: src/main.rs:724-747, behind the `denoise` cargo feature).
OIDN is a CPU neural filter; the TPU-native stand-in is an edge-aware
à-trous wavelet filter (SVGF-style) with joint albedo/normal/color
range weights — pure jnp, jittable, and it uses the exact same guide
buffers and in-place-on-sRGB call convention.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

# B3-spline 5-tap kernel for the a-trous pyramid.
_KERNEL = np.asarray([1.0, 4.0, 6.0, 4.0, 1.0], np.float32) / 16.0


def _shift2d(img, dy, dx):
    """Edge-clamped shift of (H,W,C)."""
    return jnp.roll(jnp.roll(img, dy, axis=0), dx, axis=1)


def _box3(img):
    """3x3 box blur of (H,W,C) via rolls."""
    acc = jnp.zeros_like(img)
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            acc = acc + _shift2d(img, dy, dx)
    return acc / 9.0


@partial(jax.jit, static_argnames=("iterations", "firefly_k"))
def denoise(rgb, albedo=None, normal=None, iterations=3,
            sigma_color=0.2, sigma_albedo=0.15, sigma_normal=0.25,
            firefly_k=4.0):
    """Edge-aware à-trous filter.

    Args:
      rgb: (H,W,3) tonemapped color (like OIDN's srgb in-place input).
      albedo/normal: optional (H,W,3) guides (main.rs:733-737 uses both
        when available, else filters unguided, main.rs:738-744).
      firefly_k: outlier pre-clamp — pixels brighter than the 3x3
        neighbour mean + k*std are pulled down to that bound before
        filtering.  Low-spp interiors (cornell at 4 spp) are sparse
        bright speckles on black; without the clamp each speckle
        survives the range weights and dominates its neighbourhood.
        None/0 disables.
    Returns filtered (H,W,3).

    Defaults were grid-searched against converged references on the
    captured buffers (tools/denoise_tune.py, artifacts/
    denoise_buffers.npz): iterations=3 + sigma_color=0.2 lifted rtiow
    4-spp from 27.05 to 29.13 dB (hardware-regenerated r4 artifact:
    artifacts/denoise_r04.json).  The no-NEE cornell regime is
    energy-limited, not filter-limited — its 4-spp frame carries 18%
    of the converged energy with 7% non-black pixels, so no post
    filter can exceed ~11 dB there; the production answer is NEE
    (the same artifact's cornell_nee row: 13.41 -> 20.11 dB).
    """
    out = rgb
    if firefly_k:
        mu = _box3(out)
        var = jnp.maximum(_box3(out * out) - mu * mu, 0.0)
        hi = mu + firefly_k * jnp.sqrt(var) + 1e-4
        out = jnp.minimum(out, hi)
    for it in range(iterations):
        step = 1 << it
        # SVGF-style variance-adaptive color weight: normalise the color
        # distance by a local (3x3) noise estimate, recomputed on the
        # progressively filtered image.  Without it, a very noisy input
        # (few spp) drives exp(-dc/sigma^2) to 0 for every neighbour and
        # the filter degenerates to the identity.
        mu = _box3(out)
        var = _box3(jnp.sum((out - mu) ** 2, axis=-1, keepdims=True))
        color_denom = sigma_color ** 2 + 8.0 * var
        accum = jnp.zeros_like(out)
        weight = jnp.zeros(out.shape[:2] + (1,), out.dtype)
        for ky in range(5):
            for kx in range(5):
                dy = (ky - 2) * step
                dx = (kx - 2) * step
                k = _KERNEL[ky] * _KERNEL[kx]
                c = _shift2d(out, dy, dx)
                w = jnp.full(out.shape[:2] + (1,), k, out.dtype)
                dc = jnp.sum((c - out) ** 2, axis=-1, keepdims=True)
                w = w * jnp.exp(-dc / color_denom)
                if albedo is not None:
                    da = jnp.sum((_shift2d(albedo, dy, dx) - albedo) ** 2,
                                 axis=-1, keepdims=True)
                    w = w * jnp.exp(-da / (sigma_albedo ** 2))
                if normal is not None:
                    dn = jnp.sum((_shift2d(normal, dy, dx) - normal) ** 2,
                                 axis=-1, keepdims=True)
                    w = w * jnp.exp(-dn / (sigma_normal ** 2))
                accum = accum + c * w
                weight = weight + w
        out = accum / jnp.maximum(weight, 1e-8)
    return out


def make_denoiser(iterations=3):
    """Adapter matching Film.to_float_rgb's `denoiser` hook:
    (rgb, albedo, normal) -> rgb."""
    def fn(rgb, albedo, normal):
        return denoise(rgb, albedo, normal, iterations=iterations)
    return fn
