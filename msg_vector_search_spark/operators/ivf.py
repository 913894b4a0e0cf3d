"""IVF (inverted-file) approximate nearest-neighbour index — the scale
path past brute force (SURVEY 4 "custom opportunity").

Brute force scans the whole corpus per query (reference:
src/core/embeddings/processor.py:489-525 — fine at 70 k rows, not at
100 TB).  IVF: pick nlist centroids, assign every vector to its nearest
centroid (the "cell"), PARTITION the stored table by cell; at query
time score the query against the nlist centroids only, probe the top
nprobe cells, and brute-force inside them.  Scanned fraction ≈
nprobe/nlist, and because the table is written ``partitionBy(cell)``
the pruning is literal Parquet partition pruning — the filter never
reads the other cells.

Centroid selection here is a deterministic seed-pick (every k-th vector
by id) rather than iterated k-means: deterministic => DuckDB-oracle
checkable, and the plan shape (broadcast centroids -> argmin ->
partitioned write -> pruned probe) is identical to what trained
centroids would use.  Swapping in MLlib KMeans centroids is a drop-in.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import vector as V


def seed_centroids(embeddings: DataFrame, nlist: int,
                   id_col: str = "vec_id",
                   vec_col: str = "embedding") -> DataFrame:
    """Deterministic centroid pick: the nlist smallest vector ids.
    (K-means refinement is a drop-in replacement; the index layout and
    query plan do not change.)"""
    return (
        embeddings.orderBy(id_col).limit(nlist)
        .select(F.col(id_col).alias("centroid_id"),
                F.col(vec_col).alias("centroid_vec"))
    )


def kmeans_centroids(embeddings: DataFrame, nlist: int,
                     vec_col: str = "embedding", max_iter: int = 10,
                     seed: int = 42) -> DataFrame:
    """K-means-refined centroids via MLlib — the quality upgrade over
    :func:`seed_centroids`, same output contract (centroid_id,
    centroid_vec), so every downstream stage (assign, partitioned write,
    pruned probe) is unchanged.

    Vectors are L2-normalized before fitting: MLlib KMeans minimizes
    Euclidean distance, and on the unit sphere Euclidean order equals
    cosine order, so the trained cells match the cosine assignment
    :func:`assign_cells` performs.  Training cost is
    O(max_iter * corpus * nlist) — run it on a sample at 100 TB
    (centroids only need to see the density, not every row).  Not used
    by oracle queries (k-means|| init is seed-stable but not
    dialect-reproducible in DuckDB); recall vs the seed pick is
    measured in tools/scaling_check.py.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    feats = embeddings.select(
        array_to_vector(V.l2_normalize(F.col(vec_col)).cast("array<double>"))
        .alias("features"))
    model = KMeans(k=nlist, maxIter=max_iter, seed=seed).fit(feats)
    rows = [(i, [float(x) for x in c])
            for i, c in enumerate(model.clusterCenters())]
    return embeddings.sparkSession.createDataFrame(
        rows, "centroid_id bigint, centroid_vec array<float>")


def assign_cells(embeddings: DataFrame, centroids: DataFrame,
                 id_col: str = "vec_id",
                 vec_col: str = "embedding",
                 keep_cols: tuple[str, ...] = ()) -> DataFrame:
    """Assign every vector to its nearest centroid by cosine (ties to
    the smallest centroid id).  Broadcast nested-loop against the tiny
    centroid table, argmax as a GROUPED ``max_by`` — map-side partial
    aggregation collapses each vector's nlist candidate rows inside
    their own partition, so the one exchange carries ~one row per
    vector (id + vector + cell).  The previous row_number-window form
    shuffled the crossJoin output whole: corpus x nlist rows WITH the
    embedding arrays — 16x the bytes at nlist=16, growing with nlist
    at exactly the scale where nlist must grow.  ``keep_cols`` pass
    through (metadata the index stores next to each vector, e.g. the
    filter columns of a hybrid filtered-ANN query)."""
    reserved = {"vec", "cell"} & set(keep_cols)
    if reserved:
        # 'vec'/'cell' are the payload struct's own field names — a
        # keep_cols entry shadowing them would make _w.vec/_w.cell
        # ambiguous and fail analysis with an opaque error
        raise ValueError(
            f"keep_cols may not contain reserved names {sorted(reserved)}; "
            "rename the column(s) before assignment")
    emb_n = embeddings.withColumn("_vn", V.norm(F.col(vec_col)))
    cent_n = centroids.withColumn("_cn", V.norm(F.col("centroid_vec")))
    nprod = F.col("_vn") * F.col("_cn")
    cos = F.when(nprod == 0.0, F.lit(0.0)).otherwise(
        V.dot(F.col(vec_col), F.col("centroid_vec")) / nprod)
    scored = emb_n.crossJoin(F.broadcast(cent_n)).withColumn(
        "cdist", (F.round(cos, 9) + F.lit(0.0)))
    # max over struct(cdist, -centroid_id): highest cosine, ties to
    # the SMALLEST centroid id — identical to the window ordering.
    # The WHOLE winning row (cell + vector + keep_cols) rides in one
    # max_by payload struct: with duplicate ids in the input, a split
    # any_value(vec)/max_by(cell) pair could mix fields from two
    # different duplicate rows, storing a (vector, cell) pair whose
    # re-assignment lands elsewhere — which would defeat
    # delete_index_keys' assignment-based cell pruning.
    # final key component: content hash of the vector, so when
    # duplicate-id rows tie exactly on (cdist, centroid) the winning
    # duplicate is the same on every run (smallest hash wins) — not
    # whichever partition layout fed max_by first
    best = F.max_by(
        F.struct(F.col("centroid_id").alias("cell"),
                 F.col(vec_col).alias("vec"),
                 *[F.col(c).alias(c) for c in keep_cols]),
        F.struct(F.col("cdist").alias("d"),
                 (-F.col("centroid_id")).alias("nid"),
                 (-F.xxhash64(F.col(vec_col))).alias("nh")))
    return (
        scored.groupBy(id_col)
        .agg(best.alias("_w"))
        .select(id_col,
                F.col("_w.vec").alias(vec_col),
                *[F.col(f"_w.{c}").alias(c) for c in keep_cols],
                F.col("_w.cell").alias("cell"))
    )


def assign_cells_multi(embeddings: DataFrame, centroids: DataFrame,
                       nprobe: int = 2, id_col: str = "vec_id",
                       vec_col: str = "embedding") -> DataFrame:
    """Multi-probe assignment: every vector lands in its *nprobe*
    nearest cells (one output row per assignment).  The similarity-JOIN
    recall fix: with p=1 a pair of near-dups straddling a cell boundary
    is never compared; with p=2 they meet whenever either's second cell
    is the other's first.  Corpus is replicated nprobe x — the standard
    IVF write-amplification trade (FAISS's IVF multi-assignment) — and
    downstream pair emission must dedup (a pair can share up to nprobe
    cells).

    Top-nprobe via grouped collect-sort-slice rather than a window:
    map-side partials fold each vector's nlist candidates into ONE row
    (an nlist-entry array of (cdist, id) pairs — the embedding itself
    ships once via any_value, not nlist times), so the exchange is
    ~corpus-sized instead of corpus x nlist rows of full vectors."""
    # content-derived discriminator: duplicate-id rows with DIFFERENT
    # vectors separate deterministically (same content -> same hash on
    # every run), unlike monotonically_increasing_id whose winner-among-
    # exact-ties depended on partition layout.  Identical duplicate rows
    # hash equal — their merged candidate lists interleave identical
    # structs, deduped below.
    emb_n = embeddings.withColumn("_vn", V.norm(F.col(vec_col))) \
                      .withColumn("_disc", F.xxhash64(F.col(vec_col)))
    cent_n = centroids.withColumn("_cn", V.norm(F.col("centroid_vec")))
    nprod = F.col("_vn") * F.col("_cn")
    cos = F.when(nprod == 0.0, F.lit(0.0)).otherwise(
        V.dot(F.col(vec_col), F.col("centroid_vec")) / nprod)
    scored = emb_n.crossJoin(F.broadcast(cent_n)).withColumn(
        "cdist", (F.round(cos, 9) + F.lit(0.0)))
    # array_sort on struct(-cdist, centroid_id, disc) ascending =
    # cosine descending with ties to the smallest id — the window's
    # ordering.  The per-input-row discriminator makes duplicate ids
    # safe: candidates from ALL duplicate rows merge into one list,
    # so we keep only the entries of the row that owns the globally
    # best candidate, and take the vector from that same row via an
    # identically-keyed max_by — (vector, cells) stay a consistent
    # pair instead of mixing fields across duplicates.
    entries = F.array_sort(F.collect_list(
        F.struct((-F.col("cdist")).alias("nd"),
                 F.col("centroid_id").alias("cid"),
                 F.col("_disc").alias("disc"))))
    vec_win = F.max_by(
        F.col(vec_col),
        F.struct(F.col("cdist").alias("d"),
                 (-F.col("centroid_id")).alias("nid"),
                 (-F.col("_disc")).alias("ndisc")))
    win_disc = F.element_at(F.col("_all"), 1)["disc"]
    # array_distinct: fully identical duplicate rows share a hash, so
    # the winning row's candidate list appears twice interleaved —
    # identical structs, collapsed before the slice
    top = F.slice(
        F.array_distinct(
            F.filter(F.col("_all"), lambda x: x["disc"] == win_disc)),
        1, nprobe)
    return (
        scored.groupBy(id_col)
        .agg(vec_win.alias(vec_col), entries.alias("_all"))
        .select(id_col, vec_col,
                F.explode(F.transform(top, lambda x: x.cid))
                .alias("cell"))
    )


def write_index(assigned: DataFrame, path: str) -> None:
    """Materialize the IVF index: the corpus partitioned by cell.  A
    probe that filters on ``cell`` prunes at the directory level."""
    assigned.write.mode("overwrite").partitionBy("cell").parquet(path)


def probe_cells(centroids: DataFrame, query_vec: list[float],
                nprobe: int) -> DataFrame:
    """Rank the centroids against the query, keep the top nprobe cell
    ids — a driver-sized computation (nlist rows)."""
    qv = F.array(*[F.lit(float(x)) for x in query_vec])
    return (
        centroids.withColumn("qdist", V.cosine(F.col("centroid_vec"), qv))
        .orderBy(F.col("qdist").desc(), F.col("centroid_id").asc())
        .limit(nprobe)
        .select(F.col("centroid_id").alias("cell"))
    )


def probe_cells_local(cent_rows, query_vec: list[float],
                      nprobe: int) -> list:
    """Driver-side :func:`probe_cells`: same cosine on the same
    operands in the same ORDER (Spark's F.aggregate folds left;
    Python's += loop is the identical IEEE-754 sequence, unlike
    numpy's pairwise/SIMD sums), same (qdist desc, centroid_id asc)
    tiebreak — bit-identical cell sets with NO scheduler round trip.
    For the batched serves that need Q probe results up front: the
    Spark probe job costs ~2 s local per call regardless of Q, while
    this is O(Q x nlist x d) driver arithmetic over the
    dimension-bounded centroid rows (collect them once, reuse across
    queries)."""
    qn = 0.0
    for x in query_vec:
        qn += float(x) * float(x)
    qn = math.sqrt(qn)
    scored = []
    for r in cent_rows:
        cv = r["centroid_vec"]
        if len(cv) != len(query_vec):
            # fail loudly like the Spark path (zip_with null-pads and
            # surfaces a null qdist); a silent zip truncation here
            # would return plausible-looking cells instead (ADVICE
            # r12) — the one way the bit-identical claim could break
            raise ValueError(
                f"query dim {len(query_vec)} != centroid dim {len(cv)}")
        cn = 0.0
        dot = 0.0
        for x, y in zip(cv, query_vec):
            fx = float(x)
            cn += fx * fx
            dot += fx * float(y)
        n = math.sqrt(cn) * qn
        cos = 0.0 if n == 0.0 else dot / n
        scored.append((-cos, r["centroid_id"]))
    scored.sort()
    return [cid for _, cid in scored[:nprobe]]


def ivf_search(assigned: DataFrame, centroids: DataFrame,
               query_vec: list[float], k: int = 10, nprobe: int = 2,
               id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """ANN search: probe the top nprobe cells, brute-force within.

    ``assigned`` may be the in-memory assignment or the partitioned
    parquet index; in the latter case the semi join on ``cell`` becomes
    a partition-pruning filter (broadcast DPP under AQE).
    """
    from .similarity import similarity_to_query

    cells = probe_cells(centroids, query_vec, nprobe)
    candidates = assigned.join(F.broadcast(cells), "cell", "left_semi")
    return (
        similarity_to_query(candidates, query_vec, vec_col)
        .withColumn("sim", (F.round(F.col("sim"), 6) + F.lit(0.0)))
        .orderBy(F.col("sim").desc(), F.col(id_col).asc())
        .limit(k)
        .select(id_col, "cell", "sim")
    )
