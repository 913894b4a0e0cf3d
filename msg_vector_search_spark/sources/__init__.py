from . import readers, sinks, state  # noqa: F401
