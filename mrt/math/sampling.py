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
    """Uniform point inside the unit ball from three uniforms.

    u3 is clamped off exact zero: the closed-form r = cbrt(u3) maps
    the RNG's u3 == 0.0 draw (~2^-24 per draw — reached in practice,
    the r5 eve NaN pixel) to the ZERO VECTOR, which as an isotropic
    scatter direction makes a degenerate ray whose background eval
    divides 0/0.  The reference's rejection sampler
    (src/math.rs:80-90) would need three exact-zero draws (~2^-72) to
    emit it, so the zero vector is OUR closed-form artifact, not a
    reference behavior.  Clamping moves a 2^-24-probability pointmass
    to r~0.003 — every nonzero draw is bit-identical."""
    d = unit_vector(u1, u2)
    r = jnp.cbrt(jnp.maximum(u3, 2.0 ** -25))
    return d * r[..., None]


def in_unit_disk(u1, u2):
    """Uniform point in the unit disk (z=0) from two uniforms."""
    r = jnp.sqrt(u1)
    phi = TAU * u2
    return jnp.stack(
        [r * jnp.cos(phi), r * jnp.sin(phi), jnp.zeros_like(r)], axis=-1)
