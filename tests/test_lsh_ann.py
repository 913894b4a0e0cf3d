"""Sign-LSH ANN: bucket assignment properties and search recall of the
exact neighbor (the oracle covers the integration query; these pin the
operator semantics on constructed vectors)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from msg_vector_search_spark.operators import lsh


def _emb(spark, rows):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows],
        "vec_id long, embedding array<float>")


def test_bucket_bits_follow_dot_signs(spark):
    planes = [[1.0, 0.0], [0.0, 1.0]]
    df = _emb(spark, [(0, [2.0, 3.0]), (1, [-2.0, 3.0]),
                      (2, [-2.0, -3.0]), (3, [2.0, -3.0])])
    out = {r["vec_id"]: r["bucket"]
           for r in lsh.assign_buckets(df, planes).collect()}
    # bit0 = sign(x >= 0), bit1 = sign(y >= 0)
    assert out == {0: 0b11, 1: 0b10, 2: 0b00, 3: 0b01}


def test_multiprobe_covers_hamming1_and_search_finds_duplicate(spark):
    planes = [[1.0, 0.0], [0.0, 1.0]]
    # query 0 at (1,1); vec 9 is an exact duplicate in the same bucket;
    # vec 5 is cosine-close but one sign flipped (bucket at hamming 1)
    df = _emb(spark, [(0, [1.0, 1.0]), (9, [1.0, 1.0]),
                      (5, [-0.05, 1.0]), (7, [-1.0, -1.0])])
    probes = {r["pb"] for r in
              lsh.probe_buckets(lsh.assign_buckets(df, planes), 0, 2)
              .collect()}
    assert probes == {0b11, 0b10, 0b01}  # own bucket + both 1-bit flips
    res = lsh.lsh_search(df, planes, query_id=0, k=3).collect()
    got = [r["vec_id"] for r in res]
    # duplicate found first (sim 1.0 tie with self, id order), the
    # hamming-1 neighbor found via multi-probe; opposite vector pruned
    assert got[0] == 0 and got[1] == 9 and 5 in got and 7 not in got
    assert math.isclose(res[0]["sim"], 1.0, abs_tol=1e-6)


def test_lsh_materialized_index_prunes_and_matches(spark, tmp_path):
    from msg_vector_search_spark.sources import readers

    emb = readers.read_table(spark, "/root/testdata/sf0.001", "embeddings")
    planes = lsh.seed_planes(emb, 4)
    assigned = lsh.assign_buckets(emb, planes)

    path = str(tmp_path / "lsh_index")
    assigned.write.mode("overwrite").partitionBy("bucket").parquet(path)
    on_disk = spark.read.parquet(path)

    mem = lsh.lsh_search(emb, planes, query_id=0, k=5)
    # on-disk search: bucket column already present, so probe + score
    probes = lsh.probe_buckets(on_disk, 0, len(planes))
    probe_vals = [r["pb"] for r in probes.collect()]
    pruned = on_disk.filter(F.col("bucket").isin(probe_vals))
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan
    part_filters = plan.split("PartitionFilters: [", 1)[1].split("]", 1)[0]
    assert "bucket" in part_filters

    disk = lsh.lsh_search(on_disk.drop("bucket"), planes, query_id=0, k=5)
    assert {tuple(r) for r in mem.collect()} == \
           {tuple(r) for r in disk.collect()}


def test_lsh_duplicate_id_distinct_vectors_deterministic(spark):
    """r15 review: when duplicate ids carry DIFFERENT vectors, the kept
    query copy is pinned by the vector-fingerprint tiebreak, so the
    result is identical across runs and partitionings (a bare limit(1)
    keeps whichever partition answers first)."""
    planes = [[1.0, 0.0], [0.0, 1.0]]
    rows = [(0, [1.0, 1.0]), (0, [1.0, 0.9]),  # duplicate id, two vecs
            (5, [0.9, 1.0]), (7, [-1.0, -1.0])]
    base = _emb(spark, rows)
    # same data, adversarial layouts: 1 partition vs 4, reversed order
    layouts = [base.coalesce(1),
               base.repartition(4),
               _emb(spark, list(reversed(rows))).repartition(3)]
    results = [tuple(tuple(r) for r in
                     lsh.lsh_search(df, planes, query_id=0, k=3).collect())
               for df in layouts]
    assert results[0] == results[1] == results[2]
