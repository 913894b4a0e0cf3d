"""Sinks (SURVEY 2.A A5/A6).

The reference's vector store write is a bulk ``INSERT OR REPLACE``
inside one transaction (reference: src/core/embeddings/processor.py:
326-411) — i.e. an idempotent last-writer-wins upsert on the message-id
primary key.  Spark has no in-place upsert on plain Parquet, so the
equivalent is: union incoming with existing, window-dedup keeping the
newest row per key, rewrite.  With Delta/Iceberg on the classpath this
becomes MERGE; the jars are not in this environment so the dedup-rewrite
is the implementation and the MERGE path is documented.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.dedup import dedup_last_wins


def upsert_parquet(spark: SparkSession, incoming: DataFrame, path: str,
                   key: str, order_col: str,
                   partition_by: list[str] | None = None) -> None:
    """A5 ``sink_upsert_embeddings``: last-writer-wins upsert into a
    Parquet table.  Incoming rows shadow existing rows with the same
    key; among duplicates the largest *order_col* wins (reference
    semantics: the newest write replaces, embeddings/processor.py:
    382-388).

    Scale: the union+dedup shuffles on the key once.  On a real lake the
    table is partitioned (e.g. by date) so the rewrite touches only the
    partitions present in ``incoming`` — pass *partition_by* and use
    dynamic partition overwrite.
    """
    exists = os.path.exists(path)
    if exists:
        current = spark.read.parquet(path)
        merged = current.unionByName(incoming, allowMissingColumns=True)
    else:
        merged = incoming
    deduped = dedup_last_wins(merged, key, order_col)
    writer = deduped.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    # stage-and-swap: the merged result reads `path`, so it cannot be
    # overwritten in place; write the new generation once and swap the
    # directories (the old double-write read the stage back and wrote a
    # full second copy — 2x the write IO of the table).  On an object
    # store this whole function is a format-level MERGE (Delta/Iceberg).
    tmp = path + "._staged"
    writer.parquet(tmp)
    if os.path.exists(path):
        old = path + "._old"
        os.rename(path, old)
        os.rename(tmp, path)
        shutil.rmtree(old)
    else:
        os.rename(tmp, path)


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
