from .film import Film, DisplayMode  # noqa: F401
from . import io  # noqa: F401
