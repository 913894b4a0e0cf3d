"""Scans / sources (SURVEY 2.A).

The reference scans an encrypted SQLite table row-by-row with manual
column projection and LIMIT/OFFSET pagination (reference:
src/core/database/processor.py:423-437) and discovers its source file by
picking the newest+largest ``main_*.sqlite`` (reference:
src/core/database/connection.py:56-76).  Here every scan is a columnar
Parquet read: column pruning and predicate pushdown reach the scan node
via Catalyst, pagination is replaced by partition parallelism, and
snapshot isolation is free because Parquet files are immutable.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .. import schemas
from ..session import widen  # noqa: F401  (re-export; historical home)

FIXTURE_TABLES = tuple(schemas.TABLES)


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Columnar scan of one fixture table.

    No explicit schema is passed: the Parquet footer is authoritative and
    matches ``schemas.TABLES`` (asserted in tests).  Keeping the footer
    schema preserves vectorized reading and min/max row-group skipping.

    ``events.ts`` has shipped in two physical forms across fixture
    generations: TIMESTAMP(MICROS) (reads natively) and
    TIMESTAMP(NANOS), which Spark's vectorized reader rejects — that
    one is read as a nanosecond long and truncated to microseconds,
    exactly what DuckDB 1.0 does on the oracle side, so both engines
    see identical instants.  The branch is decided by the footer
    schema Spark resolved, not by a config flag.
    """
    if name == "events":
        # NOTE (r14 review, deliberately kept): these two conf flips
        # are session-sticky — scoping them to this call is unsafe
        # because the returned frame is LAZY and the scan consults the
        # conf at execution, after a save/restore would have reverted
        # it.  Within this engine every parquet read goes through
        # read_table or engine-written micros stores, so the sticky
        # nanosAsLong is benign; a library consumer mixing RAW
        # spark.read.parquet calls on foreign TIMESTAMP(NANOS) data in
        # the same session would see longs and should read via
        # read_table or reset the conf.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        # micros fixtures must resolve to TIMESTAMP (with zone, session
        # tz = UTC), not TIMESTAMP_NTZ: downstream code and event-time
        # watermarks expect the with-zone type, and reading it natively
        # (rather than casting after the scan) keeps the watermark
        # predicate eligible for Parquet pushdown
        spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled",
                       "false")
        df = spark.read.parquet(table_path(sf_dir, name))
        if not isinstance(df.schema["ts"].dataType, T.LongType):
            # micros fixture: native timestamp scan, predicates push —
            # no raw-domain twin needed
            return df
        # nanos fixture: keep the RAW nanos long alongside the converted
        # timestamp: predicates on the converted column wrap it in an
        # expression Parquet can't push, so watermark filters
        # (filters.since_ts) add a coarse raw-domain twin on _ts_nanos
        # that DOES push — row-group min/max skipping is what makes the
        # incremental scan cheap at 100 TB
        return (df.withColumn("_ts_nanos", F.col("ts"))
                  .withColumn("ts", F.timestamp_micros(F.expr("ts div 1000"))))
    return spark.read.parquet(table_path(sf_dir, name))


def read_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: read_table(spark, sf_dir, name) for name in FIXTURE_TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view for the SQL API."""
    for name in FIXTURE_TABLES:
        read_table(spark, sf_dir, name).createOrReplaceTempView(name)


def scan_messages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 ``scan_messages``: projected scan of the message-shaped table.

    Reference: src/core/database/processor.py:428-435 —
    ``SELECT sid,_mid,c,t,_createAt,u FROM chat_message`` with manual
    column pruning.  Spark: ``select`` after a Parquet scan; Catalyst
    prunes the read schema to exactly these columns (visible as
    ``ReadSchema`` in the physical plan).
    """
    return read_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang", "source", "n_chars")


def find_latest_file(directory: str, suffix: str = ".parquet") -> str | None:
    """A2 source discovery: newest (mtime desc) then largest (size desc).

    Reference: src/core/database/connection.py:56-76 globs
    ``main_*.sqlite`` and sorts by (mtime, size) descending.  On a real
    deployment this generalizes to "latest partition" discovery; here it
    is a driver-side file pick, which is exactly what the reference does.
    """
    candidates = [
        os.path.join(directory, f)
        for f in os.listdir(directory)
        if f.endswith(suffix)
    ]
    if not candidates:
        return None
    candidates.sort(key=lambda p: (os.path.getmtime(p), os.path.getsize(p)),
                    reverse=True)
    return candidates[0]


def scan_latest_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2 ``scan_latest_file`` (data-level analog): rows carrying the
    latest timestamp — the "newest snapshot wins" semantics of the
    reference's file pick, expressed as a max-timestamp partition prune.

    Reference: src/core/database/connection.py:56-76.
    """
    events = read_table(spark, sf_dir, "events")
    latest = events.agg(F.max("ts").alias("max_ts"))
    return (
        events.join(F.broadcast(latest), events.ts == F.col("max_ts"), "inner")
        .select("event_id", "ts", "user_id", "event_type", "value")
    )


def snapshot(df: DataFrame) -> DataFrame:
    """A3 snapshot copy-on-read.

    The reference copies the live SQLite file before reading so a
    concurrent writer can't corrupt the scan (reference:
    src/core/database/connection.py:78-126, reuse check at :102-115).
    Parquet files are immutable, so a scan IS a snapshot; for intra-job
    reuse we cache, which is the moral equivalent of the reference's
    snapshot-reuse fast path.
    """
    return df.cache()


def connect_smoke(spark: SparkSession, sf_dir: str) -> bool:
    """A4 connection smoke test.

    Reference: src/core/database/connection.py:128-158 runs
    ``SELECT COUNT(*)`` after keying the encrypted DB.  Plaintext Parquet
    needs no key; the smoke is a count action.
    """
    return read_table(spark, sf_dir, "documents").count() >= 0
