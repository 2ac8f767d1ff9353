from . import hit, spheres, scene  # noqa: F401
from .scene import Scene  # noqa: F401
