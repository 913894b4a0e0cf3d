"""Similarity search operators (SURVEY 2.D D6, 2.F F1, 2.B B7, 4).

The reference's flagship query path: embed the query string, then a
brute-force Python loop over EVERY stored vector — ``json.loads`` the
JSON-encoded embedding, NumPy cosine, threshold filter, ``list.sort``,
slice top-k (reference: src/core/embeddings/processor.py:489-529).

Spark-first rewrite: the corpus is a columnar float-array table; scoring
is a codegen'd higher-order expression; ``orderBy(desc).limit(k)`` plans
``TakeOrderedAndProject`` (per-partition bounded heaps + driver merge —
no global sort shuffle, O(corpus) scan, O(k) memory per partition).
That plan shape survives a 1000-executor 100 TB corpus unchanged.

Scale path beyond brute force: IVF partition pruning (see ``ivf.py``)
cuts the scanned fraction to nprobe/nlist.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions import vector as V


def similarity_to_query(corpus: DataFrame, query_vec: list[float],
                        vec_col: str = "embedding",
                        out_col: str = "sim") -> DataFrame:
    """Score every corpus row against ONE query vector.

    The query vector travels as a literal array expression — the
    single-query special case of the reference's scan loop (reference:
    src/core/embeddings/processor.py:489-506).  No join, no shuffle: the
    plan is scan -> project, one codegen stage.
    """
    qv = F.array(*[F.lit(float(x)) for x in query_vec])
    return corpus.withColumn(out_col, V.cosine(F.col(vec_col), qv))


def threshold_filter(scored: DataFrame, threshold: float,
                     sim_col: str = "sim") -> DataFrame:
    """B7 ``filter_sim_threshold`` (reference:
    src/core/embeddings/processor.py:508; default 0.3 server.py:206)."""
    return scored.filter(F.col(sim_col) >= F.lit(threshold))


def top_k(scored: DataFrame, k: int, sim_col: str = "sim",
          tiebreak: str = "vec_id") -> DataFrame:
    """F1 ``topk_by_similarity``: deterministic global top-k.

    Reference: src/core/embeddings/processor.py:528-529 (full in-memory
    sort then slice).  Spark plans TakeOrderedAndProject.  The tiebreak
    key makes ties deterministic (SURVEY 7 hard-point 3).
    """
    return scored.orderBy(F.col(sim_col).desc(), F.col(tiebreak).asc()).limit(k)


def knn_search(corpus: DataFrame, query_vec: list[float], k: int = 30,
               threshold: float = 0.0, vec_col: str = "embedding",
               tiebreak: str = "vec_id") -> DataFrame:
    """The flagship search composition: score -> threshold -> top-k.

    Scores are rounded to 6 dp for output determinism (float32 corpus,
    double math — FIXTURES.md oracle note); ordering uses the rounded
    value plus the tiebreak so membership of the top-k set is stable.
    """
    scored = (
        similarity_to_query(corpus, query_vec, vec_col)
        .withColumn("sim", (F.round(F.col("sim"), 6) + F.lit(0.0)))
    )
    return top_k(threshold_filter(scored, threshold), k, tiebreak=tiebreak)


def knn_join(corpus: DataFrame, queries: DataFrame, k: int = 10,
             corpus_vec: str = "embedding", query_vec: str = "q_embedding",
             corpus_id: str = "vec_id", query_id: str = "q_id") -> DataFrame:
    """D6 ``knn_broadcast_join``: many query vectors vs the whole corpus.

    Reference form is one query vs all rows (src/core/embeddings/
    processor.py:489-525); generalized here to a query SET via a
    broadcast nested-loop join: the small query side is broadcast to
    every corpus partition, each partition keeps per-query heaps via the
    rank window.  corpus is never shuffled until the (tiny) ranked
    result — the correct asymmetric shape at 100 TB.
    """
    joined = corpus.crossJoin(F.broadcast(queries))
    scored = joined.withColumn(
        "sim", (F.round(V.cosine(F.col(corpus_vec), F.col(query_vec)), 6) + F.lit(0.0)))
    w = Window.partitionBy(query_id).orderBy(
        F.col("sim").desc(), F.col(corpus_id).asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id, corpus_id, "sim", "rank")
    )


def pairwise_similarity(left: DataFrame, right: DataFrame, on: str,
                        threshold: float,
                        vec_col: str = "embedding") -> DataFrame:
    """Corpus x corpus similarity join bounded by a blocking key.

    The all-pairs join is quadratic; a blocking key (label, LSH bucket,
    IVF cell) keeps each block's pair count tractable — the same idea at
    100 TB with finer blocks.  Returns pairs (id_a < id_b) with sim >=
    threshold.
    """
    a = left.select(F.col("vec_id").alias("id_a"),
                    F.col(vec_col).alias("vec_a"), F.col(on).alias("k_a"))
    b = right.select(F.col("vec_id").alias("id_b"),
                     F.col(vec_col).alias("vec_b"), F.col(on).alias("k_b"))
    return (
        a.join(b, (F.col("k_a") == F.col("k_b")) & (F.col("id_a") < F.col("id_b")))
        .withColumn("sim", (F.round(V.cosine("vec_a", "vec_b"), 6) + F.lit(0.0)))
        .filter(F.col("sim") >= F.lit(threshold))
        .select("id_a", "id_b", F.col("k_a").alias("block"), "sim")
    )
