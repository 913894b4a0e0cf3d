"""Deduplication operators — exact and near-duplicate (SURVEY 2.D D7 +
the training-data-pipeline extension surface).

The reference's only dedup is last-writer-wins ``INSERT OR REPLACE`` on
the message-id primary key (src/core/embeddings/processor.py:382-388).
A 100 TB corpus pipeline needs the full family; each variant below is a
composition of built-in DataFrame ops (explode / groupBy / self-join on
a blocking key) with the shared md5-prefix hash so every one of them is
DuckDB-oracle checkable.

Scale notes per operator are inline; the common theme: never form the
quadratic all-pairs set — always block first (hash bucket, LSH band,
SimHash value), and the post-block verification join is an equi-join on
the block key that AQE can size.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions import analysis
from ..functions import vector as V


def dedup_last_wins(df: DataFrame, key: str, order_col: str) -> DataFrame:
    """D7/A5 ``dedup_last_wins``: keep the newest row per key — the
    relational form of ``INSERT OR REPLACE`` (reference:
    embeddings/processor.py:382-388).  Deterministic: ties on
    *order_col* broken by the key itself."""
    w = Window.partitionBy(key).orderBy(F.col(order_col).desc(), F.col(key))
    return (df.withColumn("_rn", F.row_number().over(w))
              .filter(F.col("_rn") == 1).drop("_rn"))


def dedup_exact(df: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Exact dedup by normalized-text hash: group by fingerprint, keep
    the smallest id (deterministic canonical row).  One shuffle on the
    48-bit-uniform hash — no skew, map-side partial aggregation."""
    return (
        df.withColumn("fp", analysis.fingerprint_md5(text_col))
        .groupBy("fp")
        .agg(F.min(id_col).alias(id_col), F.count("*").alias("dup_count"))
    )


def shingles(text: Column | str, n: int = 3) -> Column:
    """Word n-gram shingles of normalized text -> array<string>.
    Documents shorter than *n* tokens yield their full token join."""
    toks = analysis.tokens(text)
    k = F.size(toks) - (n - 1)
    return F.when(
        k <= 0, F.array(F.concat_ws(" ", toks))
    ).otherwise(
        F.transform(
            F.sequence(F.lit(1), k),
            lambda i: F.concat_ws(
                " ", *[F.element_at(toks, i + j) for j in range(n)]),
        )
    )


def minhash_signature(shingle_col: Column, num_hashes: int = 8) -> Column:
    """MinHash signature: h_i = min over shingles of hash48(i || s).

    Seeding by prefixing the hash index keeps each h_i an independent
    permutation approximation while staying a pure SQL expression.
    Returns array<bigint> of length *num_hashes*.
    """
    def seeded_min(i: int) -> Column:
        # NB: the lambda must take exactly ONE arg — a 2-arg lambda is
        # interpreted by transform() as (element, index).
        prefix = f"{i}|"
        return F.array_min(F.transform(
            shingle_col,
            lambda s: analysis.token_hash(F.concat(F.lit(prefix), s))))

    return F.array(*[seeded_min(i) for i in range(num_hashes)])


def dedup_minhash_lsh(df: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id", num_hashes: int = 8,
                      bands: int = 4, shingle_n: int = 3) -> DataFrame:
    """MinHash + LSH near-dup candidate pairs.

    shingle -> minhash signature -> split into *bands* -> explode band
    buckets -> self-join per (band, bucket) -> distinct candidate pairs
    (id_a < id_b).

    Scale: the only shuffle keys are (band_idx, band_hash) — uniformly
    distributed by construction, so no skew; the corpus is never
    all-paired, only same-bucket rows meet.  At 100 TB raise
    num_hashes/bands and salt giant buckets (near-identical boilerplate
    docs) before the self-join.
    """
    rows_per_band = num_hashes // bands
    sig = minhash_signature(shingles(F.col(text_col), shingle_n), num_hashes)
    banded = df.withColumn("_sig", sig).select(
        F.col(id_col),
        F.posexplode(F.array(*[
            F.concat_ws("_", *[
                F.element_at(F.col("_sig"), b * rows_per_band + r + 1).cast("string")
                for r in range(rows_per_band)])
            for b in range(bands)
        ])).alias("band_idx", "band_hash"),
    )
    a = banded.select(F.col(id_col).alias("id_a"), "band_idx", "band_hash")
    b = banded.select(F.col(id_col).alias("id_b"), "band_idx", "band_hash")
    return (
        a.join(b, ["band_idx", "band_hash"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b").distinct()
    )


def simhash(text: Column | str, bits: int = 16) -> Column:
    """SimHash over whitespace tokens: bit b of the fingerprint is the
    sign of sum over tokens of (+1 if bit b of hash48(token) else -1).

    Pure higher-order expression; *bits* kept small (16) so the whole
    fingerprint is one int and the oracle SQL stays readable.  Hamming
    neighborhoods at scale: index by rotating bit-slices.
    """
    toks = analysis.tokens(text)
    hashes = F.transform(toks, analysis.token_hash)

    def bit_vote(b: int) -> Column:
        # closure (not default-arg lambda): aggregate's merge lambda must
        # take exactly two args
        vote = F.aggregate(
            hashes, F.lit(0).cast("long"),
            lambda acc, h: acc + F.when(
                F.shiftright(h, b).bitwiseAND(F.lit(1)) == 1,
                F.lit(1)).otherwise(F.lit(-1)))
        return F.when(vote > 0, F.lit(2 ** b).cast("long")).otherwise(F.lit(0))

    bit_terms = [bit_vote(b) for b in range(bits)]
    out = bit_terms[0]
    for t in bit_terms[1:]:
        out = out + t
    return out


def dedup_simhash(df: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id", bits: int = 16) -> DataFrame:
    """SimHash near-dup clusters: exact-fingerprint grouping (hamming
    distance 0).  Distance <= d at scale: d+1 bit-slice tables, union
    the candidate pairs."""
    return (
        df.withColumn("simhash", simhash(F.col(text_col), bits))
        .groupBy("simhash")
        .agg(F.count("*").alias("cluster_size"), F.min(id_col).alias("min_id"))
        .filter(F.col("cluster_size") > 1)
    )


def ngram_jaccard_pairs(df: DataFrame, block_col: str, text_col: str = "text",
                        id_col: str = "doc_id", shingle_n: int = 2,
                        threshold: float = 0.5) -> DataFrame:
    """Exact n-gram Jaccard similarity for pairs sharing a blocking key.

    explode distinct shingles -> self-join on (block, shingle) ->
    |intersection| per pair -> inclusion-exclusion with per-doc set
    sizes -> threshold.  The blocking key bounds the pair space; at
    100 TB the block is an LSH bucket from :func:`dedup_minhash_lsh`
    and this operator is the verification stage.
    """
    exploded = (
        df.select(F.col(id_col), F.col(block_col).alias("block"),
                  F.explode(F.array_distinct(shingles(F.col(text_col), shingle_n)))
                  .alias("shingle"))
    )
    sizes = exploded.groupBy(id_col, "block").agg(
        F.count("*").alias("set_size"))
    a = exploded.select(F.col(id_col).alias("id_a"), "block", "shingle")
    b = exploded.select(F.col(id_col).alias("id_b"), "block", "shingle")
    inter = (
        a.join(b, ["block", "shingle"])
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("block", "id_a", "id_b")
        .agg(F.count("*").alias("inter_size"))
    )
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("block"),
                      F.col("set_size").alias("size_a"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("block"),
                      F.col("set_size").alias("size_b"))
    return (
        inter.join(sa, ["id_a", "block"]).join(sb, ["id_b", "block"])
        .withColumn("jaccard", (F.round(
            F.col("inter_size").cast("double")
            / (F.col("size_a") + F.col("size_b") - F.col("inter_size")), 6) + F.lit(0.0)))
        .filter(F.col("jaccard") >= threshold)
        .select("block", "id_a", "id_b", "jaccard")
    )


def embedding_near_dup(embeddings: DataFrame, block_col: str = "label",
                       threshold: float = 0.95,
                       id_col: str = "vec_id",
                       vec_col: str = "embedding") -> DataFrame:
    """Embedding-cosine near-dup pairs within a blocking key.

    The block is the quadratic guard (at scale: an LSH/IVF bucket over
    the vectors themselves).  Cosine is the codegen'd higher-order
    expression from functions.vector.
    """
    a = embeddings.select(F.col(id_col).alias("id_a"),
                          F.col(vec_col).alias("vec_a"),
                          F.col(block_col).alias("block"))
    b = embeddings.select(F.col(id_col).alias("id_b"),
                          F.col(vec_col).alias("vec_b"),
                          F.col(block_col).alias("block"))
    return (
        a.join(b, "block")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("sim", (F.round(V.cosine("vec_a", "vec_b"), 6) + F.lit(0.0)))
        .filter(F.col("sim") >= threshold)
        .select("block", "id_a", "id_b", "sim")
    )
