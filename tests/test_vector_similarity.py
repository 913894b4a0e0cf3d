"""Unit tests: vector math (C10 zero-norm contract), top-k
determinism, dedup last-wins, watermark clamps (SURVEY 5.3)."""

from __future__ import annotations

import datetime as dt
import math

import pytest
from pyspark.sql import functions as F

from msg_vector_search_spark.functions import vector as V
from msg_vector_search_spark.operators import dedup, similarity
from msg_vector_search_spark.sources import state


def test_cosine_basic(spark):
    df = spark.createDataFrame([([1.0, 0.0], [1.0, 0.0]),
                                ([1.0, 0.0], [0.0, 1.0]),
                                ([1.0, 2.0], [2.0, 4.0])], ["a", "b"])
    got = [r["c"] for r in df.select(V.cosine("a", "b").alias("c")).collect()]
    assert got[0] == pytest.approx(1.0)
    assert got[1] == pytest.approx(0.0)
    assert got[2] == pytest.approx(1.0)


def test_cosine_zero_norm_is_zero(spark):
    # reference contract: zero vector => similarity 0 (embeddings/
    # processor.py:431-432)
    df = spark.createDataFrame([([0.0, 0.0], [1.0, 1.0])], ["a", "b"])
    assert df.select(V.cosine("a", "b").alias("c")).head()["c"] == 0.0


def test_l2_normalize(spark):
    df = spark.createDataFrame([([3.0, 4.0],)], ["a"])
    got = df.select(V.l2_normalize("a").alias("n")).head()["n"]
    assert got == pytest.approx([0.6, 0.8])
    assert math.isclose(sum(x * x for x in got), 1.0)


def test_topk_deterministic_ties(spark):
    # two rows with identical vectors => tie on sim; tiebreak = vec_id
    rows = [(1, [1.0, 0.0]), (2, [1.0, 0.0]), (3, [0.0, 1.0])]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    got = similarity.knn_search(df, [1.0, 0.0], k=2)
    assert [r["vec_id"] for r in got.collect()] == [1, 2]


def test_dedup_last_wins(spark):
    rows = [("a", 1, "old"), ("a", 2, "new"), ("b", 1, "only")]
    df = spark.createDataFrame(rows, ["k", "v", "tag"])
    got = {r["k"]: r["tag"] for r in dedup.dedup_last_wins(df, "k", "v").collect()}
    assert got == {"a": "new", "b": "only"}


def test_watermark_clamps(spark):
    as_of = dt.datetime(2026, 1, 1)
    cases = spark.createDataFrame(
        [("future", dt.datetime(2027, 1, 1)),
         ("ancient", dt.datetime(2000, 1, 1)),
         ("normal", dt.datetime(2025, 12, 1))], ["k", "wm"])
    got = {r["k"]: r["out"] for r in cases.select(
        "k", state.clamp_watermark(F.col("wm"), F.lit(as_of)).alias("out")
    ).collect()}
    assert got["future"] == dt.datetime(1970, 1, 1)
    assert got["ancient"] == as_of - dt.timedelta(days=30)
    assert got["normal"] == dt.datetime(2025, 12, 1)


def test_knn_join_shapes(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_embedding"))
    out = similarity.knn_join(emb, queries, k=3).collect()
    assert len(out) == 6
    by_q = {}
    for r in out:
        by_q.setdefault(r["q_id"], []).append(r)
    for q, rs in by_q.items():
        # self-match first at sim ~1.0
        best = max(rs, key=lambda r: r["sim"])
        assert best["vec_id"] == q
        assert best["sim"] == pytest.approx(1.0, abs=1e-5)


def test_dequantize_int8_zero_vector_and_accuracy(spark):
    from msg_vector_search_spark.functions import vector as V
    df = spark.createDataFrame(
        [(1, [0.0, 0.0, 0.0]), (2, [1.0, -0.5, 0.25])],
        "vec_id long, embedding array<float>")
    out = {r["vec_id"]: r["dq"] for r in df.select(
        "vec_id", V.dequantize_int8("embedding").alias("dq")).collect()}
    assert out[1] == [0.0, 0.0, 0.0]            # zero vector passes through
    # max-abs element is reproduced exactly; others within one step
    scale = 1.0 / 127.0
    assert abs(out[2][0] - 1.0) < 1e-12
    assert abs(out[2][1] - (-0.5)) <= scale / 2 + 1e-12
    assert abs(out[2][2] - 0.25) <= scale / 2 + 1e-12


def test_similarity_join_topk_blocks_and_ranks(spark):
    from msg_vector_search_spark.operators import similarity as S
    df = spark.createDataFrame(
        [(1, [1.0, 0.0], "x"), (2, [0.9, 0.1], "x"), (3, [0.0, 1.0], "x"),
         (4, [1.0, 1.0], "y")],
        "vec_id long, embedding array<float>, cell string")
    out = S.similarity_join_topk(df, "cell", k=1).collect()
    by_a = {r["id_a"]: r for r in out}
    assert by_a[1]["id_b"] == 2          # nearest within block x
    assert by_a[2]["id_b"] == 1
    assert 4 not in by_a                 # singleton block -> no pairs


def test_similarity_join_topk_pandas_matches_expression(spark, sf_dir):
    from msg_vector_search_spark.operators import ivf

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").limit(400)
    cent = ivf.seed_centroids(emb, 4)
    assigned = ivf.assign_cells(emb, cent)
    expr = similarity.similarity_join_topk(assigned, "cell", k=3)
    fast = similarity.similarity_join_topk_pandas(assigned, "cell", k=3)
    e = {(r.id_a, r.id_b, r.cell) for r in expr.collect()}
    f_rows = fast.collect()
    f = {(r.id_a, r.id_b, r.cell) for r in f_rows}
    # identical neighbor sets; sims agree to float-reordering tolerance
    assert e == f
    esim = {(r.id_a, r.id_b): r.sim for r in expr.collect()}
    for r in f_rows:
        assert abs(esim[(r.id_a, r.id_b)] - r.sim) < 1e-9


def test_similarity_join_topk_pandas_single_row_cell(spark):
    df = spark.createDataFrame(
        [(1, [1.0, 0.0], 0), (2, [1.0, 0.1], 1), (3, [0.9, 0.1], 1)],
        "vec_id long, embedding array<float>, cell int")
    out = similarity.similarity_join_topk_pandas(df, "cell", k=5).collect()
    assert {(r.id_a, r.id_b) for r in out} == {(2, 3), (3, 2)}


def test_knn_join_pandas_matches_broadcast_join(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_embedding"))
    expr = similarity.knn_join(emb, queries, k=7)
    qrows = [(r["vec_id"], [float(x) for x in r["embedding"]])
             for r in emb.filter(F.col("vec_id") < 5)
             .select("vec_id", "embedding").collect()]
    fast = similarity.knn_join_pandas(emb, qrows, k=7)
    e = {(r.q_id, r.vec_id, r.rank) for r in expr.collect()}
    f = {(r.q_id, r.vec_id, r.rank) for r in fast.collect()}
    assert e == f


def test_knn_join_pandas_zero_norm_query_scores_zero(spark):
    corpus = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 2.0])],
        "vec_id long, embedding array<float>")
    out = similarity.knn_join_pandas(corpus, [(9, [0.0, 0.0])], k=2).collect()
    assert {r.sim for r in out} == {0.0}
    assert [r.vec_id for r in sorted(out, key=lambda r: r.rank)] == [1, 2]


def test_signbit_sketch_spark_matches_python(spark):
    """The packed sign sketch agrees between the codegen expression
    and the driver-side query twin — the equality the Hamming
    shortlist's literal xor rests on."""
    from pyspark.sql import functions as F

    from msg_vector_search_spark.operators import similarity as sim
    from msg_vector_search_spark.sources import readers

    emb = readers.read_table(spark, "/root/testdata/sf0.001",
                             "embeddings").limit(20)
    rows = emb.select("vec_id", "embedding",
                      sim.signbit_sketch("embedding").alias("sk")).collect()
    for r in rows:
        assert int(r["sk"]) == sim.signbit_sketch_py(r["embedding"])


def test_signbit_rerank_finds_query_vector(spark):
    """The query's own stored vector has Hamming distance 0 to its
    sketch, survives any shortlist, and re-ranks to the top with
    sim 1.0."""
    from msg_vector_search_spark.operators import similarity as sim
    from msg_vector_search_spark.sources import readers

    emb = readers.read_table(spark, "/root/testdata/sf0.001", "embeddings")
    qv = [float(x) for x in
          emb.filter("vec_id = 0").select("embedding").head()[0]]
    top = sim.signbit_rerank_search(emb, qv, k=5, shortlist=32).collect()
    assert top[0]["vec_id"] == 0
    assert top[0]["hamming"] == 0 and top[0]["sim"] == 1.0


def test_signbit_short_vector_zero_bit_parity(spark):
    """ADVICE r13: a query vector SHORTER than the sketch width must
    contribute 0-bits for the missing dims in all three renderings —
    the Spark expression (try_element_at -> NULL -> otherwise 0), the
    Python twin (was: IndexError), and by construction the DuckDB
    CASE — instead of diverging on the edge."""
    from pyspark.sql import functions as F

    from msg_vector_search_spark.operators import similarity as sim

    short = [1.0, -1.0, 1.0]  # 3 dims against a 48-bit sketch
    df = spark.createDataFrame([(short,)], "v array<double>")
    spark_sk = df.select(sim.signbit_sketch("v").alias("sk")).head()["sk"]
    assert sim.signbit_sketch_py(short) == int(spark_sk)
    # bit pattern: 101 followed by 45 zero bits
    assert int(spark_sk) == 0b101 << 45


def test_np_round6_half_away_from_zero_grid(spark):
    """ADVICE r13: the GEMM twins' rounding grid must be half-AWAY-
    from-zero (F.round / DuckDB parity), where np.round is half-to-
    even — the exact .5e-6 tie is where the twins used to diverge."""
    import numpy as np

    from msg_vector_search_spark.operators.similarity import _np_round6

    ties = np.array([0.0000005, 0.0000015, -0.0000005, -0.0000015,
                     0.1234565, -0.1234565])
    got = _np_round6(ties)
    np.testing.assert_allclose(
        got, [0.000001, 0.000002, -0.000001, -0.000002,
              0.123457, -0.123457])
    # np.round (half-to-even) disagrees on every odd tie — the bug
    assert np.round(0.0000005, 6) == 0.0
    # and the Spark expression agrees with _np_round6 on the ties
    from pyspark.sql import functions as F
    rows = spark.createDataFrame(
        [(float(x),) for x in ties], "x double").select(
        F.round("x", 6).alias("r")).collect()
    np.testing.assert_allclose(sorted(r["r"] for r in rows), sorted(got))


def test_np_round6_spark_decimal_tie_divergence(spark):
    """The documented EDGE of the rounding-parity claim (r14 review):
    _np_round6 is bit-parity with DuckDB round() — both round the
    BINARY double half-away — but Spark F.round rounds the value's
    SHORTEST-DECIMAL repr via BigDecimal HALF_UP.  A double whose
    shortest repr is an exact 7dp tie sitting just BELOW the binary
    boundary (0.5165865 -> binary 0.51658649999…) therefore rounds
    DOWN on the binary grid and UP on Spark's decimal grid.  Computed
    doubles essentially never round-trip in <= 7 digits, so the class
    is out-of-model for the shared oracles — this test pins that the
    divergence exists and is exactly the documented one."""
    import duckdb
    import numpy as np

    from msg_vector_search_spark.operators.similarity import _np_round6

    x = 0.5165865  # shortest repr is a 7dp tie; binary is below it
    grid = float(_np_round6(np.array([x]))[0])
    duck = duckdb.sql(f"SELECT round({x!r}::DOUBLE, 6)").fetchone()[0]
    assert grid == duck == 0.516586  # binary half-away: DOWN
    from pyspark.sql import functions as F
    spark_r = spark.range(1).select(
        F.round(F.lit(x), 6).alias("r")).head()["r"]
    assert spark_r == 0.516587  # decimal HALF_UP: UP — the known edge
