from .normalize import normalize_columns  # noqa: F401
from .manifest import Manifest  # noqa: F401
