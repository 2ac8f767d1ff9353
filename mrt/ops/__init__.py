from . import pallas_spheres, pallas_bvh  # noqa: F401
