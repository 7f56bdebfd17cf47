from .session import get_spark  # noqa: F401
