"""Unit edge cases for the dedup primitives (the oracle covers the
integration paths; these pin the boundary behaviors)."""

from __future__ import annotations

from pyspark.sql import functions as F

from msg_vector_search_spark.operators import dedup


def _one(spark, text, expr):
    return spark.createDataFrame([(text,)], ["text"]) \
        .select(expr.alias("out")).collect()[0]["out"]


def test_shingles_short_doc_falls_back_to_join(spark):
    out = _one(spark, "only two", dedup.shingles(F.col("text"), 3))
    assert out == ["only two"]


def test_shingles_exact_n_tokens(spark):
    out = _one(spark, "a b c", dedup.shingles(F.col("text"), 3))
    assert out == ["a b c"]


def test_shingles_sliding(spark):
    out = _one(spark, "a b c d", dedup.shingles(F.col("text"), 2))
    assert out == ["a b", "b c", "c d"]


def test_minhash_signature_shape_and_determinism(spark):
    sig_expr = dedup.minhash_signature(
        dedup.shingles(F.col("text"), 2), num_hashes=8)
    a = _one(spark, "the quick brown fox", sig_expr)
    b = _one(spark, "the quick brown fox", sig_expr)
    assert len(a) == 8 and a == b
    assert all(0 <= h < dedup.MINHASH_PRIME for h in a)


def test_minhash_similar_docs_share_signature_entries(spark):
    sig_expr = dedup.minhash_signature(
        dedup.shingles(F.col("text"), 2), num_hashes=8)
    a = _one(spark, "the quick brown fox jumps over the lazy dog", sig_expr)
    b = _one(spark, "the quick brown fox jumps over the lazy cat", sig_expr)
    c = _one(spark, "completely different text with no overlap at all", sig_expr)
    assert sum(x == y for x, y in zip(a, b)) > \
        sum(x == y for x, y in zip(a, c))


def test_simhash_deterministic_and_bounded(spark):
    expr = dedup.simhash(F.col("text"), bits=16)
    a = _one(spark, "hello world hello", expr)
    assert 0 <= a < 2 ** 16
    assert a == _one(spark, "hello world hello", expr)


def test_jaccard_identical_docs_score_one(spark):
    df = spark.createDataFrame(
        [(1, "b", "alpha beta gamma delta"),
         (2, "b", "alpha beta gamma delta")],
        ["doc_id", "source", "text"])
    out = dedup.ngram_jaccard_pairs(df, "source", shingle_n=2,
                                    threshold=0.5).collect()
    assert len(out) == 1 and out[0]["jaccard"] == 1.0


# ---------------------------------------------------------------------------
# Connected components (pairs -> dedup decisions)
# ---------------------------------------------------------------------------

def test_connected_components_chain_and_singletons(spark):
    # chain 1-2-3-4 plus isolated pair 10-11: min label must cross the
    # whole chain (transitivity), not just direct neighbors
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11)], ["id_a", "id_b"])
    out = {r["id"]: r["component"]
           for r in dedup.connected_components(pairs).collect()}
    assert out == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}


def test_connected_components_cycle_and_order_independence(spark):
    # cycle with edges given in arbitrary orientation
    pairs = spark.createDataFrame(
        [(7, 5), (5, 6), (6, 7), (9, 8)], ["id_a", "id_b"])
    out = {r["id"]: r["component"]
           for r in dedup.connected_components(pairs).collect()}
    assert out == {5: 5, 6: 5, 7: 5, 8: 8, 9: 8}


def test_simhash_blocks_partition_the_bits():
    blocks = dedup.simhash_blocks(16, 2)
    assert blocks == [(0, 63), (6, 31), (11, 31)]
    # slices tile the 16 bits exactly
    covered = sum(bin(mask).count("1") for _, mask in blocks)
    assert covered == 16


def test_simhash_hamming_pairs_match_brute_force(spark):
    rows = [(i, t) for i, t in enumerate([
        "the quick brown fox jumps over the lazy dog",
        "the quick brown fox jumps over the lazy cat",
        "the quick brown fox leaps over the lazy dog",
        "completely different text with no overlap at all",
        "another unrelated document about spark shuffles",
        "the quick brown fox jumps over the lazy dog",  # exact dup of 0
        "pack my box with five dozen liquor jugs",
        "sphinx of black quartz judge my vow",
    ])]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {(r.id_a, r.id_b): r.hamming
           for r in dedup.simhash_hamming_pairs(df, max_distance=2).collect()}
    # brute-force ground truth over all pairs
    fps = {r.doc_id: r.fp for r in df.select(
        "doc_id", dedup.simhash(F.col("text"), 16).alias("fp")).collect()}
    truth = {}
    ids = sorted(fps)
    for i in ids:
        for j in ids:
            if i < j:
                d = bin(fps[i] ^ fps[j]).count("1")
                if d <= 2:
                    truth[(i, j)] = d
    # blocking is a complete cover for d<=2 (pigeonhole): sets EQUAL
    assert got == truth
    assert got[(0, 5)] == 0  # the exact dup pair is in there


def test_minhash_estimate_identical_docs_score_one(spark):
    df = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta"),
         (2, "alpha beta gamma delta epsilon zeta"),
         (3, "totally different words entirely here now")],
        ["doc_id", "text"])
    rows = {(r.id_a, r.id_b): r.est_jaccard
            for r in dedup.minhash_estimate_pairs(df, shingle_n=2).collect()}
    assert rows[(1, 2)] == 1.0
    assert all(0.0 <= v <= 1.0 for v in rows.values())


def test_repeated_chunks_kill_both_copies_and_keep_unique(spark):
    base = " ".join(f"w{i}" for i in range(32))      # 2 chunks of 16
    uniq = " ".join(f"u{i}" for i in range(20))      # 2 chunks (16+4)
    df = spark.createDataFrame(
        [(1, base), (2, base), (3, uniq)], ["doc_id", "text"])
    out = {r.doc_id: r for r in
           dedup.dedup_repeated_chunks(df, chunk_tokens=16).collect()}
    # docs 1 and 2 are chunk-identical -> every chunk repeated -> gone
    assert set(out) == {3}
    assert out[3].kept_chunks == 2
    assert out[3].clean_text == uniq


def test_incremental_components_match_fresh(spark):
    """Incremental CC (star edges from the persisted prior labeling +
    batch band-join edges) must converge to exactly the from-scratch
    labeling, and the edge set entering the contraction must be
    SMALLER than the full pair graph when the batch is small."""
    from pyspark.sql import functions as F

    from msg_vector_search_spark import contract
    from msg_vector_search_spark.operators import dedup as d
    from msg_vector_search_spark.sources import readers

    docs = readers.read_table(spark, "/root/testdata/sf0.01", "documents")
    fresh = {(r.id, r.component)
             for r in d.connected_components_star(
                 d.dedup_minhash_lsh(docs)).collect()}
    inc = {(r.id, r.component)
           for r in contract.REGISTRY["dedup_components_incremental"](
               spark, "/root/testdata/sf0.01").collect()}
    assert inc == fresh

    # Scale shape: with the old graph entering pre-contracted, the
    # incremental contraction's input edges (star + batch edges) stay
    # well under the full candidate-pair count.
    full_pairs = d.dedup_minhash_lsh(docs).count()
    old = docs.filter(F.col("doc_id") % 4 != 0)
    star = (d.connected_components_star(d.dedup_minhash_lsh(old))
            .filter(F.col("id") != F.col("component")).count())
    assert star < full_pairs


def test_unaligned_substring_catches_one_token_shift(spark):
    """The pinned gap (VERDICT r12 item 1): a duplicate passage
    shifted by ONE token escapes the fixed chunk grid of
    dedup_repeated_chunks entirely (every 16-token chunk hash
    changes), but the overlapping-window operator catches every
    shared window at its shifted offset — the original's tokens are
    all covered and it drops out; the shifted copy keeps exactly its
    one novel prefix token."""
    passage = " ".join(f"tok{i}" for i in range(40))
    rows = [(1, passage), (2, "shift " + passage),
            (3, " ".join(f"other{i}" for i in range(40)))]
    df = spark.createDataFrame(rows, ["doc_id", "text"])

    grid = {r.doc_id: r.kept_chunks
            for r in dedup.dedup_repeated_chunks(
                df, chunk_tokens=16, max_occurrences=1).collect()}
    # chunk grid misses the shifted duplicate: all three docs keep
    # every chunk (ceil(40/16)=3, ceil(41/16)=3)
    assert grid == {1: 3, 2: 3, 3: 3}

    out = {r.doc_id: (r.kept_tokens, r.clean_text)
           for r in dedup.dedup_unaligned_substring(
               df, window_tokens=16, max_occurrences=1).collect()}
    # original fully covered -> dropped; copy keeps only 'shift';
    # the unrelated doc is untouched
    assert 1 not in out
    assert out[2] == (1, "shift")
    assert out[3][0] == 40


def test_unaligned_substring_keeps_unique_short_docs(spark):
    """Docs shorter than the window fall back to one whole-text
    window: unique short docs survive whole, identical short docs are
    corpus-wide duplicates and both vanish."""
    rows = [(1, "unique tiny doc"), (2, "same tiny"), (3, "same tiny")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r.doc_id: r.kept_tokens
           for r in dedup.dedup_unaligned_substring(
               df, window_tokens=16).collect()}
    assert out == {1: 3}


def test_cc_free_releases_blocks_on_supported_path(spark):
    """VERDICT r13 item 8: on a supported Spark the helper reports
    True and the checkpoint's pinned blocks are actually released
    (storage level drops to NONE on the underlying LogicalRDD)."""
    df = spark.range(100).localCheckpoint(eager=True)
    jrdd = df._jdf.queryExecution().analyzed().rdd()
    assert jrdd.getStorageLevel().useMemory()      # pinned by ckpt
    assert dedup._cc_free(df) is True
    assert not jrdd.getStorageLevel().useMemory()  # released


def test_cc_free_noop_fallbacks_never_raise(spark):
    """VERDICT r13 item 8: both fallbacks are explicit no-ops.
    (a) A derived (non-LogicalRDD) plan returns False per-call without
    disabling the helper; (b) a missing private-API chain flips the
    one-shot capability latch so every later call is a cheap no-op —
    and the latch resets cleanly for the rest of the suite."""
    derived = spark.range(10).withColumn("x", F.col("id") * 2)
    assert dedup._cc_free(derived) is False
    assert dedup._CC_FREE_DISABLED is False        # per-call, not latch

    class _Transient:          # e.g. a stopped session / py4j hiccup
        @property
        def _jdf(self):
            raise RuntimeError("connection reset")

    assert dedup._cc_free(_Transient()) is False
    assert dedup._CC_FREE_DISABLED is False  # transient must NOT latch

    class _StaleObject:        # py4j stale-object errors ALSO carry
        @property              # "does not exist" — r14 review: they
        def _jdf(self):        # must not poison the latch either
            raise RuntimeError(
                "Target Object ID does not exist for this gateway :o123")

    assert dedup._cc_free(_StaleObject()) is False
    assert dedup._CC_FREE_DISABLED is False

    class _DeadJvm:            # session restart: same words, transient
        @property
        def _jdf(self):
            raise RuntimeError(
                "SparkSession does not exist in the JVM")

    assert dedup._cc_free(_DeadJvm()) is False
    assert dedup._CC_FREE_DISABLED is False

    class _RenamedMethod:      # py4j's renamed-API signature DOES latch
        @property
        def _jdf(self):
            raise RuntimeError(
                "An error occurred while calling o12.queryExecution. "
                "Trace: py4j.Py4JException: "
                "Method queryExecution([]) does not exist")

    try:
        assert dedup._cc_free(_RenamedMethod()) is False
        assert dedup._CC_FREE_DISABLED is True
    finally:
        dedup._CC_FREE_DISABLED = False

    class _NoChain:                   # simulates a renamed private API
        @property
        def _jdf(self):
            raise AttributeError("queryExecution is gone")

    try:
        assert dedup._cc_free(_NoChain()) is False
        assert dedup._CC_FREE_DISABLED is True     # latched off
        ckpt = spark.range(5).localCheckpoint(eager=True)
        assert dedup._cc_free(ckpt) is False       # no-op while latched
    finally:
        dedup._CC_FREE_DISABLED = False


def test_corpus_key_counts_modes_agree(spark):
    """The single-pass window mode and the skew_safe groupBy+join mode
    of the sub-document dedup family must return identical results —
    the mode only moves WHERE the hot key's rows meet their count."""
    rows = [(1, " ".join(f"w{i}" for i in range(40))),
            (2, "shift " + " ".join(f"w{i}" for i in range(40))),
            (3, " ".join(f"other{i}" for i in range(40))),
            (4, "same tiny"), (5, "same tiny")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])

    def snap(frame):
        return sorted(tuple(r) for r in frame.collect())

    assert snap(dedup.dedup_unaligned_substring(df)) == \
        snap(dedup.dedup_unaligned_substring(df, skew_safe=True))
    assert snap(dedup.substring_novelty(df)) == \
        snap(dedup.substring_novelty(df, skew_safe=True))
    assert snap(dedup.dedup_repeated_chunks(df)) == \
        snap(dedup.dedup_repeated_chunks(df, skew_safe=True))


def test_minhash_num_hashes_guard(spark):
    """r14 review: num_hashes beyond the seeded family raises an
    actionable ValueError, not an IndexError deep in seed
    construction (mirrors the bands-divisibility guard)."""
    import pytest

    df = spark.createDataFrame([(1, ["a", "b"])],
                               "doc_id long, sh array<string>")
    with pytest.raises(ValueError, match="num_hashes"):
        df.select(dedup.minhash_signature(F.col("sh"), num_hashes=32))
    with pytest.raises(ValueError, match="num_hashes"):
        df.select(dedup.lsh_band_hashes(F.col("sh"), num_hashes=32,
                                        bands=8))
