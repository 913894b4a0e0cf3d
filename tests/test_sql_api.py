"""SQL API parity: the engine's tables register as views and the same
queries run through spark.sql — a reference user who prefers SQL over
the DataFrame API gets identical results."""

from __future__ import annotations

from pyspark.sql import functions as F

from msg_vector_search_spark import contract
from msg_vector_search_spark.sources import readers

SF = "/root/testdata/sf0.001"


def test_sql_views_match_dataframe_topk(spark):
    readers.register_views(spark, SF)
    got = spark.sql("""
        WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
        scored AS (
          SELECT e.vec_id,
                 aggregate(zip_with(e.embedding, q.qv,
                                    (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),
                           0.0D, (a, b) -> a + b)
                 / (sqrt(aggregate(e.embedding, 0.0D,
                        (a, x) -> a + CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))
                    * sqrt(aggregate(q.qv, 0.0D,
                        (a, x) -> a + CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
                   AS sim
          FROM embeddings e CROSS JOIN q
        )
        SELECT vec_id, round(sim, 6) + 0 AS sim FROM scored
        ORDER BY sim DESC, vec_id LIMIT 30
    """)
    want = contract.REGISTRY["topk_by_similarity"](spark, SF) \
        .select("vec_id", "sim")
    assert {tuple(r) for r in got.collect()} == \
           {tuple(r) for r in want.collect()}


def test_sql_group_agg_matches(spark):
    readers.register_views(spark, SF)
    got = spark.sql("""
        SELECT event_type, count(*) AS n
        FROM events GROUP BY event_type
    """)
    want = (readers.read_table(spark, SF, "events")
            .groupBy("event_type").agg(F.count("*").alias("n")))
    assert {tuple(r) for r in got.collect()} == \
           {tuple(r) for r in want.collect()}
