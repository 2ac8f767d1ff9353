from .obj import load_obj, ObjBuilder, FnObjBuilder, SimpleTexturedBuilder  # noqa: F401
from .ply import load_ply  # noqa: F401
from .stl import load_stl_binary  # noqa: F401
