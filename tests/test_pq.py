"""Product-quantization ANN (operators/pq.py): encode determinism,
ADC scoring against a NumPy reference, and plan shape of the serving
path (pure codegen scoring, TakeOrderedAndProject top-k)."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from msg_vector_search_spark.operators import pq
from msg_vector_search_spark.sources import readers

from conftest import SF_SMALL


def _corpus(spark):
    return readers.read_table(spark, SF_SMALL, "embeddings")


def test_seed_codebooks_shape(spark):
    cb = pq.seed_codebooks(_corpus(spark), m=8, ncodes=16)
    assert cb.shape == (8, 16, 8)
    # subspace 0's codebook is the first 8 dims of the 16 seed vectors
    seeds = (_corpus(spark).orderBy("vec_id").limit(16)
             .select("embedding").collect())
    np.testing.assert_allclose(cb[0][0], [float(x) for x in seeds[0][0][:8]])


def test_encode_matches_numpy_reference(spark):
    emb = _corpus(spark)
    cb = pq.seed_codebooks(emb, m=8, ncodes=16)
    got = {r["vec_id"]: list(r["codes"])
           for r in pq.pq_encode(emb, cb).collect()}

    rows = emb.select("vec_id", "embedding").collect()
    for r in rows[:50]:
        x = np.array([float(v) for v in r["embedding"]])
        expect = [int(np.round(x[j * 8:(j + 1) * 8] @ cb[j].T, 9)
                      .argmax()) for j in range(8)]
        assert got[r["vec_id"]] == expect


def test_pq_search_equals_table_sum(spark):
    emb = _corpus(spark)
    cb = pq.seed_codebooks(emb, m=8, ncodes=16)
    codes = pq.pq_encode(emb, cb)
    q = [float(v) for v in emb.filter(F.col("vec_id") == 0)
         .select("embedding").head()[0]]
    table = pq.adc_table(q, cb)
    top = pq.pq_search(codes, table, k=5).collect()
    assert len(top) == 5
    # scores descend, ties broken by id
    sims = [r["adc_sim"] for r in top]
    assert sims == sorted(sims, reverse=True)
    # exact ADC value for the winner, recomputed in NumPy
    code_map = {r["vec_id"]: r["codes"] for r in codes.collect()}
    for r in top:
        expect = round(float(sum(table[j, code_map[r["vec_id"]][j]]
                                 for j in range(8))), 6)
        assert abs(r["adc_sim"] - expect) < 1e-9


def test_rerank_orders_by_exact_cosine(spark):
    emb = _corpus(spark)
    cb = pq.seed_codebooks(emb, m=8, ncodes=16)
    codes = pq.pq_encode(emb, cb)
    qrow = emb.filter(F.col("vec_id") == 0).select("embedding").head()
    q = [float(v) for v in qrow[0]]
    table = pq.adc_table(q, cb)
    got = pq.pq_rerank(emb, codes, table, q, k=3, shortlist=500).collect()
    # with the shortlist covering the whole corpus, re-rank == exact KNN
    from msg_vector_search_spark.operators import similarity
    exact = similarity.knn_search(emb, q, k=3).select("vec_id").collect()
    assert [r["vec_id"] for r in got] == [r["vec_id"] for r in exact]


def test_serving_path_plan_shape(spark):
    emb = _corpus(spark)
    cb = pq.seed_codebooks(emb, m=8, ncodes=16)
    codes = pq.pq_encode(emb, cb)
    table = pq.adc_table([0.0] * 64, cb)
    plan = (pq.pq_search(codes, table, k=10)
            ._jdf.queryExecution().executedPlan().toString())
    # top-k is a per-partition heap merge, not a global sort-shuffle
    assert "TakeOrderedAndProject" in plan
    assert "Exchange" not in plan
    # scoring stage is expression-only: no Python worker beyond encode
    assert plan.count("ArrowEvalPython") == 0  # encode is mapInPandas
