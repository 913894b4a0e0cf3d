"""Edge-semantics pins from the r14 fourth review pass: NULL-valued
ASOF rows, under-k order probes, duplicate-id LSH corpora, embed-dim
cache conflicts, and the perceptual-hash bit-width guard."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from msg_vector_search_spark.operators import asof, lsh, topk


def test_asof_join_null_values_not_skipped(spark):
    """The latest right ROW wins atomically even when its value is
    NULL: the old per-column last(..., ignorenulls=True) walked past
    it to a STALE older value — and with several value_cols mixed
    fields from different rows into one that never existed (DuckDB's
    ASOF JOIN, the oracle, takes the whole row)."""
    left = spark.createDataFrame(
        [(1, 3, 100)], "key long, ts long, lid long")
    right = spark.createDataFrame(
        [(1, 1, 5, 10), (1, 2, None, 20)],
        "key long, ts long, value long, view long")
    out = asof.asof_join(left, right, "key", "ts",
                         ["value", "view"], tiebreak="ts").head()
    assert out["asof_value"] is None   # the ts=2 row's value, not 5
    assert out["asof_view"] == 20      # same row's field — no mixing


def test_asof_join_no_right_row_yet(spark):
    """A left row before every right row gets NULLs (no match)."""
    left = spark.createDataFrame(
        [(1, 0, 100)], "key long, ts long, lid long")
    right = spark.createDataFrame(
        [(1, 5, 7, 70)], "key long, ts long, value long, view long")
    out = asof.asof_join(left, right, "key", "ts",
                         ["value", "view"], tiebreak="ts").head()
    assert out["asof_value"] is None and out["asof_view"] is None


def test_kth_ts_under_k_reports_null(spark):
    """r14 review: fewer than k rows -> NULL kth_ts (the reference's
    LIMIT 1 OFFSET k-1 returns no row), not min(ts) of the table."""
    df = spark.createDataFrame(
        [(i, 1000 + i) for i in range(5)], "id long, ts long")
    got = topk.kth_most_recent_ts(df, "ts", k=100, tiebreak="id").head()
    assert got["kth_ts"] is None
    exact = topk.kth_most_recent_ts(df, "ts", k=5, tiebreak="id").head()
    assert exact["kth_ts"] == 1000  # exactly k rows: the oldest kept


def test_lsh_search_duplicate_corpus_ids_no_duplicate_topk(spark):
    """r14 review: a duplicate-id corpus must not crossJoin every
    candidate against EACH copy of the query row (duplicated top-k
    entries crowding out real neighbors)."""
    rows = [(i, [float(i), 1.0, 0.5]) for i in range(10)]
    rows.append((3, [3.0, 1.0, 0.5]))  # duplicate id 3
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    planes = [[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]]
    got = lsh.lsh_search(emb, planes, query_id=3, k=8).collect()
    ids = [r["vec_id"] for r in got]
    assert len(ids) == len(set(ids)) + 1  # only id 3's own dup pair
    assert sum(1 for i in ids if i == 3) == 2  # both copies SCORED once


def test_perceptual_simhash_bits_guard(spark):
    from msg_vector_search_spark import multimodal

    media = spark.createDataFrame(
        [(1, "image", bytearray(b"xyz"), 1, 1, 0)],
        "media_id long, media_type string, payload binary, "
        "width int, height int, duration_ms long")
    with pytest.raises(ValueError, match="bits"):
        multimodal.perceptual_simhash(media, bits=64)


def test_embed_dim_conflict_raises():
    """r14 review: the per-process model cache refuses a different dim
    instead of silently returning the first-loaded width (which would
    null-pad against the corpus in zip_with and score garbage)."""
    from msg_vector_search_spark import embed

    old = embed._MODEL
    embed._MODEL = None
    try:
        m = embed._load_model(dim=64)
        assert m.dim == 64
        assert embed._load_model(dim=64) is m
        with pytest.raises(ValueError, match="dim"):
            embed._load_model(dim=128)
    finally:
        embed._MODEL = old


def test_fingerprint_md5_null_text_is_null(spark):
    """r14 review: NULL text fingerprints to NULL (the DuckDB twin's
    array_to_string propagates NULL) — concat_ws used to swallow the
    null token array into md5('') and silently merge null docs into
    the empty-text dedup group."""
    import duckdb

    from msg_vector_search_spark.functions import analysis

    df = spark.createDataFrame(
        [(1, None), (2, ""), (3, "  a  b ")], "id long, text string")
    got = {r["id"]: r["fp"] for r in df.select(
        "id", analysis.fingerprint_md5("text").alias("fp")).collect()}
    assert got[1] is None
    duck = duckdb.sql(
        "SELECT md5(array_to_string(string_split_regex("
        "trim(lower('  a  b ')), '\\s+'), ' '))").fetchone()[0]
    assert got[3] == duck          # normalized text agrees cross-engine
    assert got[2] is not None      # empty string still fingerprints


def test_users_from_group_info_deterministic_name_pick(spark):
    """r14 review: a uid carried with several names resolves to a
    FIXED pick (min), not whichever row partial aggregation saw
    first."""
    from msg_vector_search_spark.operators import dims

    msgs = spark.createDataFrame(
        [(1, '{"u": [{"uid": 7, "n": "Zed"}]}'),
         (2, '{"u": [{"uid": 7, "n": "Alice"}]}')],
        "mid long, c string")
    out = dims.users_from_group_info(msgs, "c").collect()
    assert [(r["user_id"], r["user_name"]) for r in out] == [(7, "Alice")]


def test_salted_join_rejects_other_side_preserving_how(spark):
    """r14 review: right/full outer would emit each unmatched
    other-side row once per salt replica — refused loudly."""
    from msg_vector_search_spark.operators import enrich

    a = spark.createDataFrame([(1, 10)], "k long, uid long")
    b = spark.createDataFrame([(2, 5)], "k long, v long")
    with pytest.raises(ValueError, match="salted_join"):
        enrich.salted_join(a, b, "k", "uid", n_salts=4, how="full")
    with pytest.raises(ValueError, match="salted_join"):
        enrich.salted_join(a, b, "k", "uid", n_salts=4, how="right")
    # the safe variants still serve
    got = enrich.salted_join(a, b, "k", "uid", n_salts=4, how="left")
    assert got.count() == 1


def test_context_prev_next_total_order_with_tiebreak(spark):
    """r14 review: rows tying on (part, ts, text) get deterministic
    prev/next once a unique tiebreak column completes the order."""
    from msg_vector_search_spark.operators import enrich

    rows = [(1, 1, "X", 10), (1, 2, "P", 11), (1, 2, "P", 12)]
    df = spark.createDataFrame(rows, "u long, ts long, t string, id long")
    out = {r["id"]: (r["prev_text"], r["next_text"])
           for r in enrich.context_prev_next(
               df, "u", "ts", "t", tiebreak_col="id").collect()}
    assert out[11] == ("X", "P")   # id asc breaks the (2, 'P') tie
    assert out[12] == ("P", None)
