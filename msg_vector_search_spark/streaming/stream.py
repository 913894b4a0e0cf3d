"""Structured Streaming variants (SURVEY 2.H mapping).

The reference's hand-rolled polling loop maps onto real streaming
primitives: checkpointed offsets replace the KV watermark,
``withWatermark`` replaces the clamp guards for late data,
``Trigger.AvailableNow`` replaces the bounded backfill run, and the
idempotent upsert sink becomes ``foreachBatch`` + last-wins dedup.

These run against the parquet fixtures via ``readStream`` with a fixed
schema; ``maxFilesPerTrigger`` is the input-rate cap (H4 analog).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import schemas


def read_event_stream(spark: SparkSession, sf_dir: str,
                      max_files_per_trigger: int | None = None) -> DataFrame:
    """File-source stream over the events fixture (H1: source offsets
    are the watermark; H4: maxFilesPerTrigger is the backfill cap)."""
    reader = (spark.readStream.schema(schemas.EVENTS)
              .format("parquet"))
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.load(f"{sf_dir}/events.parquet")


def tumbling_event_counts(events: DataFrame,
                          window: str = "1 hour",
                          late: str = "2 hours") -> DataFrame:
    """Event-time tumbling-window aggregation with late-data watermark
    (H2): counts and value sums per (window, event_type).  The batch
    twin of this query is ``tumbling_window_agg`` in __spark_entry__."""
    return (
        events.withWatermark("ts", late)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 6).alias("sum_value"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n",
                "sum_value")
    )


def run_stream_once(spark: SparkSession, sf_dir: str,
                    query_name: str = "tumbling_counts") -> DataFrame:
    """Drive the streaming query to completion over the current fixture
    contents (memory sink + processAllAvailable) and return the result
    as a DataFrame — the local smoke-test harness for the streaming
    path."""
    events = read_event_stream(spark, sf_dir)
    agg = tumbling_event_counts(events)
    q = (agg.writeStream.outputMode("append")
         .format("memory").queryName(query_name)
         .option("checkpointLocation", f"/tmp/ckpt_{query_name}")
         .start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.sql(f"SELECT * FROM {query_name}")
