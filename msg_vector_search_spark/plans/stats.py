"""The stats/metadata path (SURVEY 3.3) — ``get_database_stats`` as one
union-of-aggregates query instead of the reference's three serial
round-trips (reference: src/core/search/engine.py:228-284).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import textops


def database_stats(messages: DataFrame, embedded: DataFrame) -> DataFrame:
    """Total count, embedded count, coverage % (C11), timestamp range
    (E3) — one row.  Two aggregate subplans joined crosswise; each is a
    partial+final count, no full shuffle."""
    t = messages.agg(
        F.count("*").alias("total_messages"),
        F.min("ts").alias("min_ts"),
        F.max("ts").alias("max_ts"))
    e = embedded.agg(F.count("*").alias("embedded_messages"))
    return (
        t.crossJoin(e)
        .withColumn("coverage_pct",
                    # empty corpus: 0/0 coverage is 0.0, not an ANSI
                    # divide-by-zero (the reference reports zeros on an
                    # empty store, engine.py:228-284)
                    F.when(F.col("total_messages") == 0, F.lit(0.0))
                    .otherwise(textops.coverage_pct(
                        F.col("embedded_messages"),
                        F.col("total_messages"))))
        .select("total_messages", "embedded_messages", "coverage_pct",
                "min_ts", "max_ts")
    )
