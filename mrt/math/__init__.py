from . import vec, m4, rng, sampling  # noqa: F401
from .vec import (  # noqa: F401
    v3, dot, length, length_squared, unit, cross, near_zero,
    reflect, refract, distance, hsl_to_rgb,
)
from .rng import Sampler, pcg4d  # noqa: F401
