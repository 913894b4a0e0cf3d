from . import (  # noqa: F401
    aggregates,
    dedup,
    dims,
    enrich,
    filters,
    ivf,
    similarity,
    topk,
)
