"""Random-hyperplane LSH over embedding vectors — the second ANN scale
path next to IVF (SURVEY 4 "custom opportunity"; task brief: "an IVF or
LSH-bucketed variant as the scale path").

Brute force (reference: src/core/embeddings/processor.py:489-525) scans
the whole corpus per query.  Sign-LSH: pick ``nplanes`` hyperplanes;
bucket(v) = the nplanes-bit integer whose bit i is sign(dot(v, plane_i)).
Cosine-close vectors agree on most signs, so they collide.  At query
time probe the query's own bucket plus every bucket at Hamming distance
1 (multi-probe) and brute-force only inside those buckets — scanned
fraction ≈ (nplanes+1)/2^nplanes.

Physical design for 100 TB:

* bucket assignment is a NARROW map (one codegen'd expression per row —
  planes are literals, no join, no shuffle), so the index build is a
  single pass over the corpus;
* the stored table is written ``partitionBy(bucket)`` exactly like the
  IVF index (operators/ivf.py:write_index), turning the probe filter
  into literal Parquet partition pruning;
* multi-probe trades recall for scan fraction without rebuilding —
  widen to Hamming distance 2 by adding the :math:`\\binom{n}{2}` flip
  pairs to the probe set.

Hyperplane choice is deterministic (the nplanes smallest-id corpus
vectors) so the DuckDB oracle can reproduce it; swapping in Gaussian
random planes is a drop-in that changes no plan shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import vector as V


def seed_planes(embeddings: DataFrame, nplanes: int,
                id_col: str = "vec_id",
                vec_col: str = "embedding") -> list[list[float]]:
    """Deterministic hyperplane pick: the nplanes smallest vector ids,
    collected driver-side (index-build metadata, a few KB — the same
    role the centroid table plays for IVF)."""
    rows = (embeddings.orderBy(id_col).limit(nplanes)
            .select(vec_col).collect())
    return [[float(x) for x in r[0]] for r in rows]


def bucket_expr(vec_col, planes: list[list[float]]) -> F.Column:
    """The nplanes-bit sign bucket as ONE whole-stage-codegen expression:
    bit i = (dot(v, plane_i) >= 0).  Dots are rounded to the common 1e-6
    grid before the sign test so Spark and the oracle agree on
    knife-edge signs."""
    vec = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    bits = [
        F.when((F.round(V.dot(vec, F.array(*[F.lit(x) for x in p])), 6)
                + F.lit(0.0)) >= 0,
               F.lit(1 << i).cast("long")).otherwise(F.lit(0).cast("long"))
        for i, p in enumerate(planes)
    ]
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out.alias("bucket")


def assign_buckets(embeddings: DataFrame, planes: list[list[float]],
                   vec_col: str = "embedding") -> DataFrame:
    """Index build: corpus -> corpus + ``bucket``.  Narrow (no shuffle);
    follow with ``write.partitionBy("bucket")`` to materialize."""
    return embeddings.withColumn("bucket", bucket_expr(vec_col, planes))


def probe_buckets(assigned: DataFrame, query_id, nplanes: int,
                  id_col: str = "vec_id") -> DataFrame:
    """Multi-probe set: the query's bucket plus all Hamming-distance-1
    flips, built with DataFrame ops from the 1-row query entry (no
    driver collect in the query path)."""
    flips = F.array(F.lit(0).cast("long"),
                    *[F.lit(1 << i).cast("long") for i in range(nplanes)])
    # no .distinct(): XORing one bucket with 0, 2^0, ..., 2^(n-1) yields
    # inherently distinct values, and a distinct here would shuffle the
    # (tiny) probe set inside the broadcast build side for nothing
    return (assigned.filter(F.col(id_col) == query_id)
            .select(F.explode(flips).alias("flip"), "bucket")
            .select(F.col("bucket").bitwiseXOR(F.col("flip")).alias("pb")))


def lsh_search(embeddings: DataFrame, planes: list[list[float]],
               query_id, k: int = 10,
               id_col: str = "vec_id",
               vec_col: str = "embedding") -> DataFrame:
    """ANN search: assign buckets, probe the query's Hamming-1
    neighborhood, brute-force cosine inside it, deterministic top-k.

    Plan shape: narrow bucket map -> broadcast semi join on the probe
    set (partition pruning against a materialized index) -> cosine ->
    TakeOrderedAndProject.  The corpus is never shuffled.
    """
    assigned = assign_buckets(embeddings, planes, vec_col)
    probes = probe_buckets(assigned, query_id, len(planes), id_col)
    # limit(1): a duplicate-id corpus would otherwise crossJoin every
    # candidate against EACH copy of the query row, duplicating every
    # top-k entry (r14 review).  The orderBy in front makes the kept
    # copy DETERMINISTIC when duplicate ids carry different vectors
    # (r15 review): a bare limit(1) keeps whichever partition answers
    # first, so results would vary across runs/partitionings — the
    # vector-fingerprint tiebreak pins one copy the way every other
    # top-k in this package pins its order.  NOTE an ABSENT query_id
    # yields an empty result, indistinguishable from "no neighbors" —
    # the zero-collect query path cannot raise without a driver job;
    # validate ids upstream when that distinction matters.
    qrow = (assigned.filter(F.col(id_col) == query_id)
            .select(F.col(vec_col).alias("_qv"))
            .orderBy(F.xxhash64(F.col("_qv")).asc()).limit(1))
    cand = assigned.join(F.broadcast(probes),
                         assigned["bucket"] == probes["pb"], "left_semi")
    sim = V.cosine(F.col(vec_col), F.col("_qv"))
    return (cand.crossJoin(F.broadcast(qrow))
            .withColumn("sim", F.round(sim, 6) + F.lit(0.0))
            .orderBy(F.col("sim").desc(), F.col(id_col).asc())
            .limit(k)
            .select(id_col, "bucket", "sim"))
