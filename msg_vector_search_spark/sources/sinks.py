"""Sinks (SURVEY 2.A A5/A6).

The reference's vector store write is a bulk ``INSERT OR REPLACE``
inside one transaction (reference: src/core/embeddings/processor.py:
326-411) — i.e. an idempotent last-writer-wins upsert on the message-id
primary key, whose cost is O(batch), not O(table).

Spark has no in-place upsert on plain Parquet, so the store is laid out
as a HASH-BUCKET-PARTITIONED table: directory ``_bkt=<i>`` holds every
row whose key hashes to bucket *i*.  An incoming batch then only ever
touches the buckets its keys hash to: read THOSE partitions (directory
pruning — untouched buckets are never opened), merge + last-wins dedup,
rewrite only those directories.  Cost is O(batch + touched buckets),
matching the reference's O(batch) ``INSERT OR REPLACE`` up to the
bucket granularity; untouched partition files are byte-identical after
the upsert (asserted in tests/test_layout_scale.py).

With Delta/Iceberg on the classpath this whole function is a
format-level MERGE with file-level pruning; the jars are not in this
environment so the bucket-partitioned dedup-rewrite is the
implementation and the MERGE path is documented.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

#: Partition column of the upsert store layout.  Internal — readers go
#: through :func:`read_store`, which drops it.
BUCKET_COL = "_bkt"
DEFAULT_BUCKETS = 64

#: Layout metadata file inside the store directory.  The leading
#: underscore keeps Spark/Hadoop parquet listing from treating it as
#: data (same convention as ``_SUCCESS``).
LAYOUT_META = "_layout.json"


def bucket_of(key: Column | str, num_buckets: int) -> Column:
    """Deterministic bucket id for a key: uniform, retry-stable (pure
    hash, no ``rand()``), identical across batches — the invariant that
    makes per-bucket dedup equal global dedup: every version of a key
    lands in the same directory."""
    key = F.col(key) if isinstance(key, str) else key
    return F.pmod(F.xxhash64(key.cast("string")), F.lit(num_buckets)).cast("int")


def _read_layout(path: str) -> int | None:
    """The store's persisted bucket count, or None for a store written
    before layout metadata existed (or a plain flat parquet dir)."""
    try:
        with open(os.path.join(path, LAYOUT_META)) as f:
            return int(json.load(f)["num_buckets"])
    except (FileNotFoundError, NotADirectoryError, KeyError,
            ValueError, json.JSONDecodeError):
        return None


def _write_layout(path: str, num_buckets: int) -> None:
    with open(os.path.join(path, LAYOUT_META), "w") as f:
        json.dump({"num_buckets": num_buckets}, f)


def _dedup_last_wins_bucketed(df: DataFrame, key: str,
                              order_col: str) -> DataFrame:
    """Last-writer-wins dedup computed WITHIN the bucket partition: one
    shuffle on ``BUCKET_COL`` serves both the dedup (a key never spans
    buckets, so per-bucket last-wins == global last-wins) and the write
    layout (each bucket lands whole in exactly one task, so
    ``partitionBy(BUCKET_COL)`` emits ONE file per directory instead of
    tasks x buckets files).  Sort order (key asc, order_col desc) makes
    each key's newest row the first of its run; the ``lag`` probe keeps
    exactly those.  Tie handling on equal (key, order_col) matches
    :func:`~..operators.dedup.dedup_last_wins` (arbitrary among
    identical-order duplicates)."""
    w = (Window.partitionBy(BUCKET_COL)
         .orderBy(F.col(key).asc(), F.col(order_col).desc()))
    prev = F.lag(key).over(w)
    return (df.withColumn("_prev_key", prev)
              .filter(F.col("_prev_key").isNull()
                      | (F.col("_prev_key") != F.col(key)))
              .drop("_prev_key"))


def _swap_dir(src: str, dst: str) -> None:
    """Atomic-ish directory replace (rename old out, rename new in)."""
    if os.path.exists(dst):
        old = dst + "._old"
        os.rename(dst, old)
        os.rename(src, dst)
        shutil.rmtree(old)
    else:
        os.rename(src, dst)


def read_store(spark: SparkSession, path: str) -> DataFrame:
    """Read an upsert store, hiding the internal bucket layout column."""
    df = spark.read.parquet(path)
    return df.drop(BUCKET_COL) if BUCKET_COL in df.columns else df


def upsert_parquet(spark: SparkSession, incoming: DataFrame, path: str,
                   key: str, order_col: str,
                   num_buckets: int = DEFAULT_BUCKETS) -> None:
    """A5 ``sink_upsert_embeddings``: last-writer-wins upsert into a
    bucket-partitioned Parquet table.  Incoming rows shadow existing
    rows with the same key; among duplicates the largest *order_col*
    wins (reference semantics: the newest write replaces,
    embeddings/processor.py:382-388).

    Scale: the merge shuffles only (touched buckets + batch) — ONE
    shuffle on the bucket key that serves both the dedup and the write
    layout (see :func:`_dedup_last_wins_bucketed`), emitting one file
    per bucket directory; the rest of the table is neither read nor
    written.  A crash mid-swap leaves some buckets new and some old —
    each bucket is internally consistent (last-wins holds per key
    because a key never spans buckets); a table format (Delta/Iceberg
    MERGE) is the production answer for multi-partition atomicity.

    The bucket count is persisted in ``_layout.json`` at first write
    and is AUTHORITATIVE thereafter: a caller-supplied *num_buckets*
    only sizes a brand-new store.  (Hashing a later batch with a
    different count would scatter keys into different buckets and
    silently break per-bucket last-wins.)  A bucketed store without
    metadata — written before this guard — takes the one-time
    migration path below, which re-hashes everything and records the
    count.
    """
    exists = os.path.exists(path)
    stored_buckets = _read_layout(path) if exists else None
    if stored_buckets is not None:
        num_buckets = stored_buckets
    inc = incoming.withColumn(BUCKET_COL, bucket_of(key, num_buckets))

    if stored_buckets is None:
        # first write, or one-time migration of a legacy flat /
        # metadata-less store
        if exists:
            current = spark.read.parquet(path)
            if BUCKET_COL in current.columns:
                current = current.drop(BUCKET_COL)
            current = current.withColumn(
                BUCKET_COL, bucket_of(key, num_buckets))
            merged = current.unionByName(inc, allowMissingColumns=True)
        else:
            merged = inc
        deduped = _dedup_last_wins_bucketed(merged, key, order_col)
        tmp = path + "._staged"
        deduped.write.mode("overwrite").partitionBy(BUCKET_COL).parquet(tmp)
        _swap_dir(tmp, path)
        _write_layout(path, num_buckets)
        return

    # incremental path: touch only the buckets the batch hashes into.
    # The distinct() is driver-sized (<= num_buckets values); Catalyst
    # prunes every column but the key out of this action, so expensive
    # derived columns (e.g. the embed UDF) do NOT run here.
    touched = sorted(
        r[0] for r in inc.select(BUCKET_COL).distinct().collect())
    if not touched:
        return
    current = spark.read.parquet(path).filter(
        F.col(BUCKET_COL).isin(touched))  # directory-level pruning
    merged = current.unionByName(inc, allowMissingColumns=True)
    deduped = _dedup_last_wins_bucketed(merged, key, order_col)
    tmp = path + "._staged"
    deduped.write.mode("overwrite").partitionBy(BUCKET_COL).parquet(tmp)
    for b in touched:
        part = f"{BUCKET_COL}={b}"
        src = os.path.join(tmp, part)
        if os.path.exists(src):
            _swap_dir(src, os.path.join(path, part))
    shutil.rmtree(tmp)


def write_dimension(df: DataFrame, path: str, fmt: str = "parquet") -> None:
    """A6: persist a small dimension (the reference caches its user dim
    as a JSON file with a 24 h TTL, user_mapper.py:222-233).  Parquet by
    default; JSON kept for byte-level parity with the reference's cache
    format."""
    writer = df.coalesce(1).write.mode("overwrite")
    if fmt == "json":
        writer.json(path)
    else:
        writer.parquet(path)


def write_bucketed(df: DataFrame, table: str, n_buckets: int, key: str,
                   path: str | None = None,
                   sort_cols: list[str] | None = None) -> None:
    """Bucketed table write — the co-located-join layout (SURVEY 4b).

    Both sides of a recurring equi-join written with the same bucket
    count and key join WITHOUT a shuffle: each bucket pairs off by file.
    This is the batch analog of the reference's B-tree index on
    session_id (src/core/embeddings/processor.py:153-156) — except the
    'index' is the physical layout, so at 100 TB the join skips the
    exchange of the entire corpus, the single biggest cost in any
    enrich-at-scale plan.
    """
    w = df.write.mode("overwrite").format("parquet").bucketBy(n_buckets, key)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    if path:
        w = w.option("path", path)
    w.saveAsTable(table)
