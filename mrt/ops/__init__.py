from . import pallas_spheres  # noqa: F401
