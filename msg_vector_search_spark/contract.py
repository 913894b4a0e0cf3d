"""Driver-contract query registry.

Every implemented operator from SURVEY.md section 2 (plus the
training-data-pipeline extension surface) registers here as a
``(spark, sf_dir) -> DataFrame`` callable together with the ANSI-SQL
oracle DuckDB runs over the same parquet tables.  ``__spark_entry__.py``
re-exports the registry.

Determinism rules applied uniformly (SURVEY section 7 hard points):

* every computed column is aliased identically in Spark and SQL;
* every float that passes through non-deterministically-ordered
  aggregation is rounded onto a grid far coarser than the worst-case
  float error but finer than the data's true decimals;
* derived floats (avg, ratios) are computed FROM the already-rounded
  inputs so both engines divide identical doubles;
* every top-k / limit is ordered with an explicit unique tiebreak key.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window

from .functions import analysis, textops, vector as V
from .operators import aggregates as agg_ops
from .operators import dedup as dedup_ops
from .operators import dims as dims_ops
from .operators import enrich as enrich_ops
from .operators import filters as filter_ops
from .operators import ivf as ivf_ops
from .operators import similarity as sim_ops
from .operators import topk as topk_ops
from .sources import readers, state

QueryFn = Callable[[SparkSession, str], DataFrame]

REGISTRY: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def rnd(col, n: int):
    """Grid rounding with signed-zero normalization (+0.0 folds -0.0 to
    0.0 — DuckDB and Spark disagree on round()'s zero sign)."""
    return F.round(col, n) + F.lit(0.0)


def duck_rnd(expr: str, n: int) -> str:
    """DuckDB twin of :func:`rnd`."""
    return f"(round({expr}, {n}) + 0)"


def register(name: str, oracle: str | None = None):
    def deco(fn: QueryFn) -> QueryFn:
        REGISTRY[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn
    return deco


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    # The driver hands us its own session; pin the runtime confs the
    # oracle comparison depends on (UTC rendering matches DuckDB's
    # naive timestamps).
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return readers.read_table(spark, sf_dir, name)


# The fixed query vector for single-query similarity operators: the
# stored embedding of vec_id = 0 (deterministic, exists at every sf).
def _query_vec(spark: SparkSession, sf_dir: str) -> list[float]:
    row = (_t(spark, sf_dir, "embeddings")
           .filter(F.col("vec_id") == 0).select("embedding").head())
    return [float(x) for x in row[0]]


_DUCK_QVEC = "(SELECT embedding FROM embeddings WHERE vec_id = 0)"


# =========================================================================
# Similarity family (SURVEY 2.C C10/C8, 2.B B7, 2.D D6, 2.F F1)
# =========================================================================

@register("cosine_similarity", oracle=f"""
SELECT e.vec_id,
       (round({V.duck_cosine('e.embedding', 'q.qv')}, 6) + 0) AS sim
FROM embeddings e, (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0) q
""")
def cosine_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C10: cosine of every stored vector against the fixed query vector.
    Reference: src/core/embeddings/processor.py:413-434."""
    qv = _query_vec(spark, sf_dir)
    return (
        sim_ops.similarity_to_query(_t(spark, sf_dir, "embeddings"), qv)
        .select("vec_id", rnd(F.col("sim"), 6).alias("sim"))
    )


@register("round_sim", oracle=f"""
SELECT e.vec_id,
       (round((round({V.duck_cosine('e.embedding', 'q.qv')}, 6) + 0), 3) + 0)
         AS similarity_score
FROM embeddings e, (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0) q
""")
def round_sim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C8: presentation rounding (reference: engine.py:203)."""
    qv = _query_vec(spark, sf_dir)
    return (
        sim_ops.similarity_to_query(_t(spark, sf_dir, "embeddings"), qv)
        .select("vec_id",
                (textops.round_sim(rnd(F.col("sim"), 6)) + F.lit(0.0))
                .alias("similarity_score"))
    )


@register("filter_sim_threshold", oracle=f"""
SELECT vec_id, label, sim FROM (
  SELECT e.vec_id, e.label,
         (round({V.duck_cosine('e.embedding', 'q.qv')}, 6) + 0) AS sim
  FROM embeddings e,
       (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0) q
) WHERE sim >= 0.3
""")
def filter_sim_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B7: threshold post-filter, default 0.3 (reference:
    embeddings/processor.py:508, server.py:206)."""
    qv = _query_vec(spark, sf_dir)
    scored = (
        sim_ops.similarity_to_query(_t(spark, sf_dir, "embeddings"), qv)
        .withColumn("sim", rnd(F.col("sim"), 6))
    )
    return filter_ops.sim_threshold(scored, 0.3).select("vec_id", "label", "sim")


@register("topk_by_similarity", oracle=f"""
SELECT vec_id, label, sim FROM (
  SELECT e.vec_id, e.label,
         (round({V.duck_cosine('e.embedding', 'q.qv')}, 6) + 0) AS sim
  FROM embeddings e,
       (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0) q
) WHERE sim >= 0.0
ORDER BY sim DESC, vec_id ASC LIMIT 30
""")
def topk_by_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1 THE flagship: score -> threshold -> deterministic top-30
    (reference: embeddings/processor.py:528-529; defaults server.py:205).
    Plans TakeOrderedAndProject — per-partition heaps, no global sort."""
    qv = _query_vec(spark, sf_dir)
    return (
        sim_ops.knn_search(_t(spark, sf_dir, "embeddings"), qv, k=30,
                           threshold=0.0)
        .select("vec_id", "label", "sim")
    )


@register("knn_broadcast_join", oracle=f"""
WITH q AS (
  SELECT vec_id AS q_id, embedding AS qv FROM embeddings WHERE vec_id < 3
), scored AS (
  SELECT q.q_id, e.vec_id,
         (round({V.duck_cosine('e.embedding', 'q.qv')}, 6) + 0) AS sim
  FROM embeddings e CROSS JOIN q
), ranked AS (
  SELECT q_id, vec_id, sim,
         row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, vec_id ASC)
           AS rank
  FROM scored
)
SELECT q_id, vec_id, sim, CAST(rank AS INT) AS rank
FROM ranked WHERE rank <= 5
""")
def knn_broadcast_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D6: query-set vs corpus broadcast nested-loop KNN (reference
    generalization of embeddings/processor.py:489-525)."""
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_embedding"))
    out = sim_ops.knn_join(emb, queries, k=5)
    return out.withColumn("rank", F.col("rank").cast("int"))


# =========================================================================
# Scans / sinks / state (SURVEY 2.A)
# =========================================================================

@register("scan_messages", oracle="""
SELECT doc_id, text, lang, source, n_chars FROM documents
""")
def scan_messages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1: projected columnar scan (reference: processor.py:428-435)."""
    return readers.scan_messages(spark, sf_dir)


@register("scan_latest_file", oracle="""
SELECT event_id, ts, user_id, event_type, value
FROM events WHERE ts = (SELECT max(ts) FROM events)
""")
def scan_latest_file(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2: newest-snapshot-wins discovery, data-level analog
    (reference: connection.py:56-76)."""
    return readers.scan_latest_rows(spark, sf_dir)


@register("sink_upsert_embeddings", oracle="""
WITH batches AS (
  SELECT vec_id, label, 1 AS batch FROM embeddings
  UNION ALL
  SELECT vec_id, label + 100 AS label, 2 AS batch
  FROM embeddings WHERE vec_id % 5 = 0
), ranked AS (
  SELECT vec_id, label, batch,
         row_number() OVER (PARTITION BY vec_id
                            ORDER BY batch DESC, vec_id) AS rn
  FROM batches
)
SELECT vec_id, label, batch FROM ranked WHERE rn = 1
""")
def sink_upsert_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5: INSERT OR REPLACE as union + last-writer-wins dedup — batch 2
    re-writes every 5th vector; its rows must shadow batch 1's
    (reference: embeddings/processor.py:326-411)."""
    emb = _t(spark, sf_dir, "embeddings").select("vec_id", "label")
    b1 = emb.withColumn("batch", F.lit(1))
    b2 = (emb.filter(F.col("vec_id") % 5 == 0)
          .withColumn("label", F.col("label") + 100)
          .withColumn("batch", F.lit(2)))
    merged = b1.unionByName(b2)
    return dedup_ops.dedup_last_wins(merged, "vec_id", "batch") \
        .select("vec_id", "label", "batch")


@register("watermark_read", oracle=f"""
WITH bounds AS (SELECT min(ts) AS min_ts, max(ts) AS max_ts FROM events),
cands AS (
  SELECT 'normal' AS k, min_ts + INTERVAL 1 DAY AS wm, max_ts AS as_of FROM bounds
  UNION ALL
  SELECT 'future', max_ts + INTERVAL 365 DAYS, max_ts FROM bounds
  UNION ALL
  SELECT 'ancient', max_ts - INTERVAL 7300 DAYS, max_ts FROM bounds
)
SELECT k, {state.duck_clamp_watermark('wm', 'as_of')} AS watermark
FROM cands
""")
def watermark_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7+H2: the three clamp behaviors (normal passthrough, future ->
    epoch reset, ancient -> as_of - 30 d), deterministic via an explicit
    as-of instant (reference: processor.py:32-75, guards :62-69)."""
    events = _t(spark, sf_dir, "events")
    bounds = events.agg(F.min("ts").alias("min_ts"), F.max("ts").alias("max_ts"))
    cands = bounds.selectExpr(
        "'normal' AS k", "min_ts + INTERVAL 1 DAY AS wm", "max_ts AS as_of"
    ).unionByName(bounds.selectExpr(
        "'future' AS k", "max_ts + INTERVAL 365 DAYS AS wm", "max_ts AS as_of"
    )).unionByName(bounds.selectExpr(
        "'ancient' AS k", "max_ts - INTERVAL 7300 DAYS AS wm", "max_ts AS as_of"
    ))
    return cands.select(
        "k", state.clamp_watermark(F.col("wm"), F.col("as_of")).alias("watermark"))
