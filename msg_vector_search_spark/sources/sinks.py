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

import os
import shutil

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.dedup import dedup_last_wins

#: Partition column of the upsert store layout.  Internal — readers go
#: through :func:`read_store`, which drops it.
BUCKET_COL = "_bkt"
DEFAULT_BUCKETS = 64


def bucket_of(key: Column | str, num_buckets: int) -> Column:
    """Deterministic bucket id for a key: uniform, retry-stable (pure
    hash, no ``rand()``), identical across batches — the invariant that
    makes per-bucket dedup equal global dedup: every version of a key
    lands in the same directory."""
    key = F.col(key) if isinstance(key, str) else key
    return F.pmod(F.xxhash64(key.cast("string")), F.lit(num_buckets)).cast("int")


def _is_bucketed(path: str) -> bool:
    try:
        return any(d.startswith(f"{BUCKET_COL}=") for d in os.listdir(path))
    except FileNotFoundError:
        return False


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

    Scale: the merge shuffles only (touched buckets + batch) on the
    uniform bucket key; the rest of the table is neither read nor
    written.  A crash mid-swap leaves some buckets new and some old —
    each bucket is internally consistent (last-wins holds per key
    because a key never spans buckets); a table format (Delta/Iceberg
    MERGE) is the production answer for multi-partition atomicity.
    """
    inc = incoming.withColumn(BUCKET_COL, bucket_of(key, num_buckets))

    exists = os.path.exists(path)
    if not exists or not _is_bucketed(path):
        # first write, or one-time migration of a legacy flat store
        if exists:
            current = spark.read.parquet(path).withColumn(
                BUCKET_COL, bucket_of(key, num_buckets))
            merged = current.unionByName(inc, allowMissingColumns=True)
        else:
            merged = inc
        deduped = dedup_last_wins(merged, key, order_col)
        tmp = path + "._staged"
        deduped.write.mode("overwrite").partitionBy(BUCKET_COL).parquet(tmp)
        _swap_dir(tmp, path)
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
    deduped = dedup_last_wins(merged, key, order_col)
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
