from . import analysis, textops, vector  # noqa: F401
