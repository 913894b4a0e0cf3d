"""Sequence packing (operators/packing.py): greedy budget invariants,
sequential/greedy agreement on the packing contract, determinism."""

from __future__ import annotations

from pyspark.sql import functions as F

from msg_vector_search_spark.operators import packing


def _docs(spark):
    # token sizes that exercise resets, exact fits, and an oversized doc
    rows = [(i, i % 4, t) for i, t in enumerate(
        [3, 7, 10, 1, 1, 8, 2, 9, 10, 10, 25, 4, 6, 5, 5, 5])]
    return spark.createDataFrame(rows, "doc_id long, shard long, n_tok long")


def test_greedy_packs_respect_budget(spark):
    packed = packing.pack_greedy(_docs(spark), 10, "shard", "doc_id",
                                 "n_tok").collect()
    by_pack = {}
    for r in packed:
        by_pack.setdefault((r["shard"], r["pack_id"]), []).append(r["n_tok"])
    for toks in by_pack.values():
        # a pack exceeds the budget only as a single oversized document
        assert sum(toks) <= 10 or len(toks) == 1


def test_greedy_matches_reference_recurrence(spark):
    packed = {r["doc_id"]: r["pack_id"]
              for r in packing.pack_greedy(_docs(spark), 10, "shard",
                                           "doc_id", "n_tok").collect()}
    rows = sorted(_docs(spark).collect(), key=lambda r: r["doc_id"])
    state = {}  # shard -> (run, pid)
    for r in rows:
        run, pid = state.get(r["shard"], (0, 0))
        if run + r["n_tok"] > 10 and run > 0:
            pid, run = pid + 1, 0
        run += r["n_tok"]
        state[r["shard"]] = (run, pid)
        assert packed[r["doc_id"]] == pid, r


def test_sequential_is_monotone_and_budget_dense(spark):
    packed = packing.pack_sequential(_docs(spark), 10, "shard", "doc_id",
                                     "n_tok").collect()
    per_shard = {}
    for r in sorted(packed, key=lambda r: (r["shard"], r["doc_id"])):
        per_shard.setdefault(r["shard"], []).append(r)
    for rows in per_shard.values():
        # pack ids never decrease along the shard order, and the
        # exclusive prefix of each pack's first member is < its
        # boundary (floor semantics)
        ids = [r["pack_id"] for r in rows]
        assert ids == sorted(ids)
        prefix = 0
        for r in rows:
            assert r["pack_id"] == prefix // 10
            prefix += r["n_tok"]


def test_greedy_never_splits_and_covers_all_docs(spark):
    docs = _docs(spark)
    packed = packing.pack_greedy(docs, 10, "shard", "doc_id", "n_tok")
    assert packed.count() == docs.count()
    assert packed.select("doc_id").distinct().count() == docs.count()
