"""IVF materialized-index path: partitionBy(cell) write, then probing
reads ONLY the probed cells (literal Parquet partition pruning) and
returns the same rows as the in-memory search."""

from __future__ import annotations

from pyspark.sql import functions as F

from msg_vector_search_spark.operators import ivf
from msg_vector_search_spark.sources import readers

SF = "/root/testdata/sf0.001"


def test_ivf_index_prunes_partitions_and_matches(spark, tmp_path):
    emb = readers.read_table(spark, SF, "embeddings")
    cent = ivf.seed_centroids(emb, 8)
    assigned = ivf.assign_cells(emb, cent)
    qv = [float(x) for x in emb.filter(F.col("vec_id") == 0)
          .select("embedding").collect()[0][0]]

    path = str(tmp_path / "ivf_index")
    ivf.write_index(assigned, path)
    on_disk = spark.read.parquet(path)

    mem = ivf.ivf_search(assigned, cent, qv, k=5, nprobe=2)
    disk = ivf.ivf_search(on_disk, cent, qv, k=5, nprobe=2)
    assert {tuple(r) for r in mem.collect()} == \
           {tuple(r) for r in disk.collect()}

    # pruning: a literal cell filter must appear as PartitionFilters
    probe_cells = [r["cell"] for r in
                   ivf.probe_cells(cent, qv, 2).collect()]
    pruned = on_disk.filter(F.col("cell").isin(probe_cells))
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan
    part_filters = plan.split("PartitionFilters: [", 1)[1].split("]", 1)[0]
    assert "cell" in part_filters
    # and the probe really reads a subset of the cells
    assert pruned.select("cell").distinct().count() <= 2


def test_kmeans_centroids_drop_in(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    cents = ivf.kmeans_centroids(emb, nlist=4)
    rows = cents.collect()
    assert len(rows) == 4
    assert {r["centroid_id"] for r in rows} == {0, 1, 2, 3}
    dim = len(emb.select("embedding").head()[0])
    assert all(len(r["centroid_vec"]) == dim for r in rows)
    # drop-in: assignment covers every vector, cells within range,
    # and the pruned search still returns k rows
    assigned = ivf.assign_cells(emb, cents)
    assert assigned.count() == emb.count()
    assert assigned.select("cell").distinct().count() <= 4
    qv = [float(x) for x in emb.select("embedding").head()[0]]
    assert ivf.ivf_search(assigned, cents, qv, k=5, nprobe=2).count() == 5
