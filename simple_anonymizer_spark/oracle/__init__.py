from . import duck  # noqa: F401
