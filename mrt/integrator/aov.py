"""AOV (arbitrary output variable) passes: albedo + normal guides.

The reference renders these in a separate pre-pass to feed the OIDN
denoiser and the Albedo/Normal display modes
(reference: src/world.rs:81-92, src/main.rs:167-222).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..math.rng import Sampler
from ..materials import shade
from .wavefront import T_MIN


def albedo_normal(scene, o, d, ray_id, seed):
    """First-hit albedo and normal per ray (reference: world.rs:81-92).

    Returns (albedo (N,3), normal (N,3)):
      hit & scatters   -> (scatter attenuation, hit normal)
      hit & absorbs    -> (emitted, hit normal)
      miss             -> (background, zero)
    """
    vol_sampler = Sampler(seed, ray_id, salt=0xA06)
    hits = scene.intersect(o, d, t_min=T_MIN, sampler=vol_sampler)
    em_sampler = Sampler(seed, ray_id, salt=0xA07)
    sc_sampler = Sampler(seed, ray_id, salt=0xA08)
    emitted, atten, _, scattered, _ = shade.shade_hit(
        scene, hits, d, em_sampler, sc_sampler)
    background = scene.background_eval(d)

    albedo = jnp.where(
        hits.hit[:, None],
        jnp.where(scattered[:, None], atten, emitted),
        background)
    normal = jnp.where(hits.hit[:, None], hits.normal, 0.0)
    return albedo, normal


def albedo_normal_frame(scene, camera, width, height, seed=0):
    """Full-frame AOV pass at pixel centers with defocus disabled jitter
    (the reference jitters these rays too, main.rs:189-192; we use pixel
    centers for a deterministic guide image)."""
    n = width * height
    ray_id = jnp.arange(n, dtype=jnp.uint32)
    px = (ray_id % jnp.uint32(width)).astype(jnp.float32)
    py = (ray_id // jnp.uint32(width)).astype(jnp.float32)
    s = (px + 0.5) / jnp.float32(width)
    t = (py + 0.5) / jnp.float32(height)
    zeros = jnp.zeros((n,), jnp.float32)
    o, d = camera.rays(s, t, zeros, zeros)

    from .wavefront import RAY_BATCH
    if n <= RAY_BATCH:
        albedo, normal = albedo_normal(scene, o, d, ray_id, seed)
    else:
        k = -(-n // RAY_BATCH)
        pad = k * RAY_BATCH - n

        def pad_to(x, value):
            widths = [(0, pad)] + [(0, 0)] * (x.ndim - 1)
            return jnp.pad(x, widths, constant_values=value)

        albedo, normal = jax.lax.map(
            lambda args: albedo_normal(scene, *args, seed),
            (pad_to(o, 0.0).reshape(k, RAY_BATCH, 3),
             pad_to(d, 1.0).reshape(k, RAY_BATCH, 3),
             pad_to(ray_id, 0).reshape(k, RAY_BATCH)))
        albedo = albedo.reshape(k * RAY_BATCH, 3)[:n]
        normal = normal.reshape(k * RAY_BATCH, 3)[:n]
    return (albedo.reshape(height, width, 3),
            normal.reshape(height, width, 3))
