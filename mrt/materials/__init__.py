from . import table, background, shade  # noqa: F401
from .table import MaterialTable, MaterialBuilder  # noqa: F401
