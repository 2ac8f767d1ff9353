from .mesh import make_mesh, render_mesh  # noqa: F401
from .render import render_pass_sharded, render_sharded  # noqa: F401
