from . import incremental, stream  # noqa: F401
