"""Sequence packing — the LLM-dataloader step that concatenates
documents into fixed-token-budget training sequences.

The reference has no analog (it serves search results, not training
batches); this is part of the training-data-pipeline extension surface
the engine exists for: after dedup/quality filtering, a 100 TB corpus
is packed into ~budget-token sequences so the trainer wastes no
padding.  Two forms, one contract (input + a ``pack_id`` column):

* :func:`pack_sequential` — scan-riding approximation: pack_id =
  floor(exclusive-prefix-tokens / budget) within a shard.  Pure
  partitioned-window expression (no Python), but a document may
  straddle a budget boundary, so packs overflow by up to one document.
  The form you use when documents are tiny relative to the budget and
  you slice the concatenated token stream anyway (GPT-style pretrain
  packing).
* :func:`pack_greedy` — exact dataloader semantics: documents never
  split; a new pack starts when adding the next document would exceed
  the budget (an oversized document sits alone in its own pack).  The
  reset recurrence is inherently sequential, so it runs as ONE
  applyInPandas pass per shard — the shard is the parallel grain,
  exactly how a distributed dataloader shards its corpus.  State per
  task is one running counter; memory is the shard's rows (bounded by
  sharding, the same contract as any groupBy).

Both are deterministic given (shard, order) — no rand() anywhere — so
the driver's DuckDB oracle value-checks them: the window form as a
windowed cumsum, the greedy form as a recursive CTE over the same
recurrence.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pack_sequential(docs: DataFrame, budget: int, shard_col: str,
                    order_col: str, tok_col: str) -> DataFrame:
    """Budget packing as a pure partitioned-window expression:
    pack_id = floor(exclusive-prefix-sum(tokens) / budget) per shard.
    One shuffle on the shard key; the cumsum rides the sorted
    partition.  Packs can overflow by at most one document (the one
    straddling the boundary)."""
    w = (Window.partitionBy(shard_col).orderBy(order_col)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    excl_prefix = F.sum(tok_col).over(w) - F.col(tok_col)
    return docs.withColumn(
        "pack_id", F.floor(excl_prefix / F.lit(budget)).cast("long"))


def pack_greedy(docs: DataFrame, budget: int, shard_col: str,
                order_col: str, tok_col: str) -> DataFrame:
    """Exact greedy packing (documents never split, reset on budget
    overflow, oversized documents pack alone) as one applyInPandas
    pass per shard.

    The recurrence — ``run + t > budget and run > 0 -> new pack`` — is
    order-sequential within a shard, which is why it cannot be a
    window expression; per-shard it is O(rows) with O(1) state.  The
    pandas loop touches each shard's rows once; shards bound both the
    task's memory and the sequential span, so the wall time is
    rows/shards like any keyed aggregation."""
    from pyspark.sql import types as T

    # fresh StructType — StructType.add would MUTATE the DataFrame's
    # cached schema object and corrupt df.columns
    out_schema = T.StructType(list(docs.schema.fields)
                              + [T.StructField("pack_id", T.LongType())])
    cols = [f.name for f in docs.schema.fields]

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_col, kind="mergesort")
        run = 0
        pid = 0
        ids = []
        for t in pdf[tok_col]:
            t = int(t)
            if run + t > budget and run > 0:
                pid += 1
                run = 0
            run += t
            ids.append(pid)
        pdf = pdf[cols].copy()
        pdf["pack_id"] = ids
        return pdf

    return docs.groupBy(shard_col).applyInPandas(pack, schema=out_schema)


def pack_stats(packed: DataFrame, shard_col: str, tok_col: str) -> DataFrame:
    """Per-pack fill statistics — the packing-efficiency audit a
    dataloader publishes (docs per pack, token fill)."""
    return (packed.groupBy(shard_col, "pack_id")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum(tok_col).cast("long").alias("pack_tokens")))
