"""Physical-layout scale artifacts: bucketed co-located joins (no
exchange) and skew salting (result parity with the plain join)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from msg_vector_search_spark.operators import enrich
from msg_vector_search_spark.sources import readers, sinks

SF = "/root/testdata/sf0.001"


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    emb = readers.read_table(spark, SF, "embeddings")
    left = emb.select("vec_id", "label")
    right = emb.select(F.col("vec_id").alias("vec_id"),
                       F.col("embedding"))
    sinks.write_bucketed(left, "b_left", 4, "vec_id",
                         path=str(tmp_path / "b_left"))
    sinks.write_bucketed(right, "b_right", 4, "vec_id",
                         path=str(tmp_path / "b_right"))
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table("b_left").join(spark.table("b_right"), "vec_id")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert joined.count() == left.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.sql("DROP TABLE IF EXISTS b_left")
        spark.sql("DROP TABLE IF EXISTS b_right")


def test_salted_join_equals_plain_join(spark):
    events = readers.read_table(spark, SF, "events")
    # event_type is low-cardinality -> every key is 'hot'
    dim = (events.select("event_type").distinct()
           .withColumn("type_label", F.upper("event_type")))
    plain = events.join(dim, "event_type")
    salted = enrich.salted_join(events, dim, "event_type",
                                unique_col="event_id", n_salts=8)
    assert salted.count() == plain.count()
    a = {tuple(r) for r in
         salted.select("event_id", "type_label").collect()}
    b = {tuple(r) for r in
         plain.select("event_id", "type_label").collect()}
    assert a == b


def _partition_state(path):
    """(relative file path -> (size, mtime_ns)) for every parquet data
    file, grouped by bucket directory."""
    import os
    state = {}
    for root, _dirs, files in os.walk(path):
        for f in files:
            if not f.endswith(".parquet"):
                continue
            p = os.path.join(root, f)
            rel = os.path.relpath(p, path)
            st = os.stat(p)
            state[rel] = (st.st_size, st.st_mtime_ns)
    return state


def test_upsert_touches_only_incoming_buckets(spark, tmp_path):
    """The incremental upsert must leave every bucket the batch does not
    hash into byte-identical (same files, sizes, mtimes): the property
    that makes ingest O(batch), not O(table), at 100 TB."""
    from pyspark.sql import Row

    store = str(tmp_path / "store")
    base = spark.createDataFrame(
        [Row(k=i, v=f"v{i}", ord=1) for i in range(500)])
    sinks.upsert_parquet(spark, base, store, key="k", order_col="ord",
                         num_buckets=16)
    before = _partition_state(store)
    assert before, "first write produced no partition files"

    # a 2-row batch touches at most 2 of the 16 buckets
    batch = spark.createDataFrame(
        [Row(k=3, v="updated", ord=2), Row(k=999, v="new", ord=2)])
    sinks.upsert_parquet(spark, batch, store, key="k", order_col="ord",
                         num_buckets=16)
    after = _partition_state(store)

    touched_buckets = {
        r[0] for r in batch.withColumn(
            sinks.BUCKET_COL, sinks.bucket_of("k", 16))
        .select(sinks.BUCKET_COL).distinct().collect()}
    for rel, sig in before.items():
        bucket = int(rel.split("=")[1].split("/")[0])
        if bucket not in touched_buckets:
            assert after.get(rel) == sig, f"untouched {rel} was rewritten"

    # semantics: last-writer-wins, new key inserted, nothing lost
    final = sinks.read_store(spark, store)
    assert final.count() == 501
    assert final.filter(F.col("k") == 3).collect()[0]["v"] == "updated"
    assert final.filter(F.col("k") == 999).count() == 1


def test_upsert_migrates_legacy_flat_store(spark, tmp_path):
    """A pre-bucketing flat store is migrated in one pass on the next
    upsert, preserving last-writer-wins against the incoming batch."""
    from pyspark.sql import Row

    store = str(tmp_path / "legacy")
    spark.createDataFrame(
        [Row(k=i, v="old", ord=1) for i in range(20)]
    ).write.parquet(store)
    batch = spark.createDataFrame([Row(k=5, v="new", ord=2)])
    sinks.upsert_parquet(spark, batch, store, key="k", order_col="ord",
                         num_buckets=8)
    final = sinks.read_store(spark, store)
    assert final.count() == 20
    assert final.filter(F.col("k") == 5).collect()[0]["v"] == "new"
    import os
    assert any(d.startswith(sinks.BUCKET_COL + "=") for d in os.listdir(store))
