from . import ingest, search, stats  # noqa: F401
