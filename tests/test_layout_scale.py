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
