"""Closed-form Monte Carlo sampling primitives.

The reference draws sphere/disk points by rejection loops
(src/math.rs:80-105).  Rejection is data-dependent control flow — poison
for XLA — so every sampler here is the closed-form inverse-CDF equivalent
with identical *distribution*:

- uniform direction on the unit sphere  (== random_in_unit_sphere().unit())
- uniform point in the unit ball        (== random_in_unit_sphere())
- uniform point in the unit disk        (== random_in_unit_disk())

Each takes pre-drawn uniforms so callers control the random stream, and all
are differentiable w.r.t. nothing (pure reparameterised noise).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

TAU = float(2.0 * np.pi)  # python float: no backend init at import


def unit_vector(u1, u2):
    """Uniform direction on S^2 from two uniforms."""
    z = 1.0 - 2.0 * u1
    r = jnp.sqrt(jnp.maximum(0.0, 1.0 - z * z))
    phi = TAU * u2
    return jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi), z], axis=-1)


def in_unit_sphere(u1, u2, u3):
    """Uniform point inside the unit ball from three uniforms."""
    d = unit_vector(u1, u2)
    r = jnp.cbrt(u3)
    return d * r[..., None]


def in_unit_disk(u1, u2):
    """Uniform point in the unit disk (z=0) from two uniforms."""
    r = jnp.sqrt(u1)
    phi = TAU * u2
    return jnp.stack(
        [r * jnp.cos(phi), r * jnp.sin(phi), jnp.zeros_like(r)], axis=-1)
