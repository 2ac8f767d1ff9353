from .wavefront import trace_wavefront, render_sample, MAX_DEPTH  # noqa: F401
from .aov import albedo_normal  # noqa: F401
