"""Property-based tests (hypothesis): the operators whose correctness
is a mathematical invariant get checked against an independent
reference implementation on randomized inputs, not just fixed cases."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from msg_vector_search_spark.functions import vector as V
from msg_vector_search_spark.operators import dedup

SETTINGS = dict(max_examples=8, deadline=None)


def uf_components(pairs: list[tuple[int, int]]) -> dict[int, int]:
    """Reference union-find: node -> smallest id in its component."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


@settings(**SETTINGS)
@given(st.lists(
    st.tuples(st.integers(0, 30), st.integers(0, 30)).filter(
        lambda p: p[0] != p[1]),
    min_size=1, max_size=25))
def test_connected_components_matches_union_find(spark, pairs):
    df = spark.createDataFrame(pairs, ["id_a", "id_b"])
    got = {r["id"]: r["component"]
           for r in dedup.connected_components(df).collect()}
    assert got == uf_components(pairs)


@settings(**SETTINGS)
@given(st.lists(st.floats(-1e3, 1e3, allow_nan=False, width=32),
                min_size=1, max_size=12))
def test_dequantize_int8_error_bounded_by_half_step(spark, vec):
    df = spark.createDataFrame([(vec,)], "embedding array<float>")
    out = df.select(V.dequantize_int8("embedding").alias("dq")) \
        .collect()[0]["dq"]
    # float32 storage rounds the input; compare against what Spark read
    stored = df.collect()[0]["embedding"]
    scale = max(abs(x) for x in stored) / 127.0
    for orig, deq in zip(stored, out):
        assert abs(deq - orig) <= scale / 2 + 1e-9


@settings(**SETTINGS)
@given(st.lists(st.floats(-100, 100, allow_nan=False, width=32),
                min_size=2, max_size=10),
       st.lists(st.floats(-100, 100, allow_nan=False, width=32),
                min_size=2, max_size=10))
def test_cosine_bounded_and_symmetric(spark, a, b):
    n = min(len(a), len(b))
    a, b = a[:n], b[:n]
    df = spark.createDataFrame([(a, b)],
                               "a array<float>, b array<float>")
    row = df.select(V.cosine("a", "b").alias("ab"),
                    V.cosine("b", "a").alias("ba")).collect()[0]
    assert abs(row["ab"]) <= 1.0 + 1e-9
    assert abs(row["ab"] - row["ba"]) < 1e-9


@settings(**SETTINGS)
@given(st.lists(
    st.tuples(st.integers(0, 30), st.integers(0, 30)).filter(
        lambda p: p[0] != p[1]),
    min_size=1, max_size=25))
def test_star_components_match_union_find(spark, pairs):
    df = spark.createDataFrame(pairs, ["id_a", "id_b"])
    got = {r["id"]: r["component"]
           for r in dedup.connected_components_star(df).collect()}
    assert got == uf_components(pairs)


def test_star_components_path_graph_log2_rounds(spark):
    """Adversarial chain: a 1000-node path (diameter 999).  Min-label
    propagation needs ~999 rounds; the star contraction must stay
    within the Kiveris O(log^2 n) bound — log2(1000)^2 ~= 100, and in
    practice far fewer."""
    n = 1000
    pairs = [(i, i + 1) for i in range(n - 1)]
    df = spark.createDataFrame(pairs, ["id_a", "id_b"])
    stats: dict = {}
    got = dedup.connected_components_star(df, stats=stats)
    assert got.filter(F.col("component") != 0).count() == 0
    assert got.count() == n
    assert stats["rounds"] <= 100, stats


_WORDS = ["alpha", "beta", "gamma", "delta", "spark", "table", "row"]


@settings(**SETTINGS)
@given(st.lists(
    st.lists(st.sampled_from(_WORDS), min_size=3, max_size=8),
    min_size=2, max_size=12))
def test_grid_salted_lsh_equals_unsalted_on_random_corpora(spark, token_lists):
    """Exactness of the skew guard as an invariant: for ANY corpus,
    dedup_minhash_lsh(max_block=2) — nsub > 1 for every bucket beyond
    two members — emits exactly the plain join's pair set."""
    docs = [(i, " ".join(toks)) for i, toks in enumerate(token_lists)]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    plain = {(r.id_a, r.id_b)
             for r in dedup.dedup_minhash_lsh(df, shingle_n=2).collect()}
    salted = {(r.id_a, r.id_b)
              for r in dedup.dedup_minhash_lsh(df, shingle_n=2,
                                               max_block=2).collect()}
    assert plain == salted


def test_ts_quantile_cut_splits_requested_fraction(spark):
    """The approx-percentile scale twin of kth_ts_offset: the returned
    cut must split off ~fraction of rows (within the sketch's rank
    tolerance), and must never disagree with the exact k-th timestamp
    by more than that tolerance in rank terms."""
    from msg_vector_search_spark.operators import topk
    from msg_vector_search_spark.sources import readers

    events = readers.read_table(spark, "/root/testdata/sf0.001", "events")
    n = events.count()
    frac = 0.01
    cut = topk.ts_quantile_cut(events, "ts", frac).collect()[0]["cut_ts"]
    above = events.filter(F.col("ts") > F.lit(cut)).count()
    # approx_percentile default accuracy=10000 -> rank error <= n/10000;
    # allow a generous 1% of n on top of the target fraction
    assert abs(above - frac * n) <= max(2, 0.01 * n)

    exact = topk.kth_most_recent_ts(events, "ts", k=int(frac * n),
                                    tiebreak="event_id")
    kth = exact.collect()[0]["kth_ts"]
    # rank distance between the sketch cut and the exact k-th ts
    between = events.filter(
        (F.col("ts") > F.least(F.lit(cut), F.lit(kth)))
        & (F.col("ts") <= F.greatest(F.lit(cut), F.lit(kth)))).count()
    assert between <= max(2, 0.01 * n)


def test_incremental_agg_merge_batch_split_invariant(spark):
    """Folding the corpus into per-group counter state must give the
    same published stats for ANY batch split — 1 fold, 3 folds, or
    10 — because the merge is algebraic (sum/sum/min/max).  This is
    the invariant that makes the incremental stats refresh safe to
    re-shard or replay."""
    from msg_vector_search_spark.sources import readers

    ev = readers.read_table(spark, "/root/testdata/sf0.001", "events")

    def partials(df):
        return df.groupBy("event_type").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("value").alias("sum_value"),
            F.min("ts").alias("min_ts"),
            F.max("ts").alias("max_ts"))

    def merge(parts):
        folded = parts[0]
        for p in parts[1:]:
            folded = folded.unionByName(p)
        return (folded.groupBy("event_type")
                .agg(F.sum("n").alias("n"),
                     F.round(F.sum("sum_value"), 6).alias("s"),
                     F.min("min_ts").alias("min_ts"),
                     F.max("max_ts").alias("max_ts")))

    def snap(df):
        return {tuple(r) for r in df.collect()}

    whole = snap(merge([partials(ev)]))
    for nsplits in (3, 10):
        parts = [partials(ev.filter(F.col("event_id") % nsplits == i))
                 for i in range(nsplits)]
        assert snap(merge(parts)) == whole


def test_hll_union_equals_single_pass(spark):
    """Datasketches HLL union is lossless wrt the registers: merging
    per-slice sketches must produce bit-identical estimates to the
    single-pass sketch, for every slicing."""
    from msg_vector_search_spark.sources import readers

    ev = readers.read_table(spark, "/root/testdata/sf0.001", "events")
    single = (ev.groupBy("event_type")
              .agg(F.hll_sketch_estimate(
                  F.hll_sketch_agg("user_id")).alias("est")))
    ref = {r["event_type"]: r["est"] for r in single.collect()}
    for nsplits in (2, 5):
        parts = ev.withColumn("slice",
                              F.col("event_id") % nsplits)
        merged = (parts.groupBy("event_type", "slice")
                  .agg(F.hll_sketch_agg("user_id").alias("sk"))
                  .groupBy("event_type")
                  .agg(F.hll_sketch_estimate(
                      F.hll_union_agg("sk")).alias("est")))
        got = {r["event_type"]: r["est"] for r in merged.collect()}
        assert got == ref


@settings(**SETTINGS)
@given(st.lists(st.text(alphabet="abcdef", min_size=0, max_size=6),
                min_size=1, max_size=20),
       st.integers(0, 2))
def test_bpe_encode_against_reference_encoder(spark, tokens, n_merges):
    """bpe_encode vs an independent per-token Python BPE: space the
    characters, apply each merge left-to-right as whole-symbol
    replaces in training order, map to sorted-vocab positions.  Checks
    gating (^[a-z]+$ only), n_tokens == len(ids), and every id."""
    from msg_vector_search_spark.operators import corpus as corpus_ops

    merges = [["a b", "c d", "ab c"][i] for i in range(n_merges)]
    text = " ".join(tokens) or "x"
    docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
    row = corpus_ops.bpe_encode(docs, merges).head()

    vocab = corpus_ops.bpe_vocab(merges)

    def ref_encode(tok: str) -> list[int]:
        s = " " + " ".join(tok) + " "
        for m in merges:
            s = s.replace(f" {m} ", f" {m.replace(' ', '')} ")
        return [vocab.index(sym) + 1 for sym in s.split()]

    want: list[int] = []
    for t in text.lower().split():
        if t and all(c in "abcdefghijklmnopqrstuvwxyz" for c in t):
            want += ref_encode(t)
    assert row["n_tokens"] == len(want)
    assert list(row["token_ids"]) == want


@settings(**SETTINGS)
@given(st.lists(st.tuples(st.booleans(),
                          st.lists(st.sampled_from("abc"),
                                   min_size=1, max_size=5)),
                min_size=2, max_size=15).filter(
                    lambda rows: any(t for t, _ in rows)
                    and any(not t for t, _ in rows)))
def test_dsir_matches_reference_model(spark, rows):
    """dsir_importance vs an independent Python unigram-ratio model on
    random corpora: same smoothing, same candidate set, scores equal
    on the 6dp grid, ordering (score desc, id) exact."""
    import math as m

    from msg_vector_search_spark.operators import corpus as corpus_ops

    data = [(i, " ".join(toks), tgt)
            for i, (tgt, toks) in enumerate(rows)]
    docs = spark.createDataFrame(
        data, "doc_id long, text string, tgt boolean")
    got = [(r["doc_id"], r["n_toks"], r["avg_log_ratio"]) for r in
           corpus_ops.dsir_importance(docs, F.col("tgt"), k=100)
           .collect()]

    c_all: dict[str, int] = {}
    c_t: dict[str, int] = {}
    for _, text, tgt in data:
        for t in text.split():
            c_all[t] = c_all.get(t, 0) + 1
            if tgt:
                c_t[t] = c_t.get(t, 0) + 1
    v, n_all, n_t = len(c_all), sum(c_all.values()), sum(c_t.values())
    lr = {t: (m.log((c_t.get(t, 0) + 1) / (n_t + v))
              - m.log((c + 1) / (n_all + v))) for t, c in c_all.items()}
    want = []
    for i, text, tgt in data:
        if tgt:
            continue
        toks = text.split()
        score = round(sum(lr[t] for t in toks) / len(toks), 6) + 0.0
        want.append((score, i, len(toks)))
    gd = {i: (n, sc) for i, n, sc in got}
    wd = {i: (n, sc) for sc, i, n in want}
    assert set(gd) == set(wd)
    for i in gd:
        assert gd[i][0] == wd[i][0]
        # summation order differs (Spark partial aggregate vs Python
        # left fold), so compare on the grid with one-ulp-of-grid slack
        assert abs(gd[i][1] - wd[i][1]) <= 2e-6, i
    scores = [sc for _, _, sc in got]
    assert scores == sorted(scores, reverse=True)


def ref_bm25(corpus: dict, terms: list[str],
             k1: float = 1.2, b: float = 0.75) -> dict:
    """Reference BM25 over token lists (plain Python floats): doc ->
    (dl, score) for docs matching >= 1 query term.  Same formula and
    constants as retrieval._bm25_score_col, independent implementation."""
    import math

    n = len(corpus)
    sumdl = sum(len(t) for t in corpus.values())
    avgdl = sumdl / n
    df = {t: sum(1 for toks in corpus.values() if t in toks)
          for t in set(terms)}
    out = {}
    for doc, toks in corpus.items():
        tfs = [toks.count(t) for t in terms]
        if sum(tfs) == 0:
            continue
        dl = len(toks)
        score = 0.0
        for t, tf in zip(terms, tfs):
            idf = math.log(1.0 + (n - df[t] + 0.5) / (df[t] + 0.5))
            score += (idf * (tf * (k1 + 1.0))
                      / (tf + k1 * (1.0 - b + b * (dl / avgdl))))
        out[doc] = (dl, score)
    return out


@settings(max_examples=6, deadline=None)
@given(st.lists(st.lists(st.sampled_from("abcde"), min_size=1,
                         max_size=8),
                min_size=3, max_size=10),
       st.lists(st.sampled_from("abcdez"), min_size=6, max_size=6))
def test_batched_bm25_matches_reference_both_strategies(
        spark, docs, qterms):
    """search_inverted_index_many == brute-force BM25 computed in
    plain Python on random small corpora, for BOTH strategies — and
    the two strategies bit-identical to each other on a MIXED-length
    query batch, which is exactly the padding claim at
    retrieval.py (large-Q fold: a query's absent term positions
    contribute EXACT 0.0, so shorter queries in a wide batch score
    identically to their literal-path twins).  'z' never occurs in
    any document, so some queries carry zero-df terms and one query
    may match nothing at all (it must then return no rows)."""
    import tempfile

    from msg_vector_search_spark.operators import retrieval

    corpus = {i: toks for i, toks in enumerate(docs)}
    rows = [(i, " ".join(toks)) for i, toks in corpus.items()]
    from pyspark.sql import Row
    frame = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in rows])
    # mixed lengths exercise the joined strategy's padding positions
    queries = {0: qterms[:1], 1: qterms[1:3], 2: qterms[3:6]}
    with tempfile.TemporaryDirectory() as d:
        path = f"{d}/text"
        retrieval.build_inverted_index(frame, path, n_buckets=4)
        lit = retrieval.search_inverted_index_many(
            spark, path, queries, k=50, literal_max=10 ** 9)
        jnd = retrieval.search_inverted_index_many(
            spark, path, queries, k=50, literal_max=0)
        lit_rows = [tuple(r) for r in lit.collect()]
        jnd_rows = [tuple(r) for r in jnd.collect()]
    # strategies bit-identical (incl. the padded-zero positions)
    assert sorted(lit_rows) == sorted(jnd_rows)
    got = {}
    for qid, doc, dl, bm25 in lit_rows:
        got[(int(qid), doc)] = (dl, bm25)
    want = {}
    for qid, terms in queries.items():
        for doc, (dl, score) in ref_bm25(corpus, list(terms)).items():
            want[(qid, doc)] = (dl, score)
    assert set(got) == set(want)
    for key, (dl, bm25) in got.items():
        wdl, wscore = want[key]
        assert dl == wdl
        # Spark rounds to the 6dp serving grid; the reference is
        # unrounded — agreement within half a grid step
        assert abs(bm25 - wscore) <= 5.5e-7, (key, bm25, wscore)


def ref_bigram_nll(corpus: dict, lam: float = 0.7) -> dict:
    """Reference interpolated bigram LM: doc -> (n_bigrams, mean nll)
    over adjacent token pairs, counts from the corpus itself."""
    import math
    from collections import Counter

    uni = Counter(t for toks in corpus.values() for t in toks)
    n = sum(uni.values())
    big = Counter((u, w) for toks in corpus.values()
                  for u, w in zip(toks, toks[1:]))
    out = {}
    for doc, toks in corpus.items():
        pairs = list(zip(toks, toks[1:]))
        if not pairs:
            continue
        nll = [-math.log(lam * big[(u, w)] / uni[u]
                         + (1.0 - lam) * uni[w] / n)
               for u, w in pairs]
        out[doc] = (len(pairs), sum(nll) / len(nll))
    return out


@settings(max_examples=6, deadline=None)
@given(st.lists(st.lists(st.sampled_from("abcd"), min_size=1,
                         max_size=10),
                min_size=2, max_size=8))
def test_bigram_perplexity_matches_reference(spark, docs):
    from msg_vector_search_spark.operators import corpus as corpus_ops

    corpus = {i: toks for i, toks in enumerate(docs)}
    frame = spark.createDataFrame(
        [(i, " ".join(toks)) for i, toks in corpus.items()],
        ["doc_id", "text"])
    got = {r["doc_id"]: (r["n_bigrams"], r["avg_neg_ll"])
           for r in corpus_ops.bigram_perplexity(frame).collect()}
    want = ref_bigram_nll(corpus)
    assert set(got) == set(want)
    for doc, (nb, nll) in got.items():
        wnb, wnll = want[doc]
        assert nb == wnb
        assert abs(nll - wnll) <= 5.5e-7, (doc, nll, wnll)


@settings(max_examples=8, deadline=None)
@given(st.lists(st.sampled_from("abcde"), min_size=1, max_size=60),
       st.integers(0, 10 ** 6))
def test_span_corruption_reconstructs_original(spark, toks, doc_id):
    """The denoising invariant: splicing each sentinel's target span
    back into the input reproduces the original token stream exactly,
    masked count == sum of span lengths, and masking stays block-local
    (no span crosses a 20-token block boundary)."""
    from msg_vector_search_spark.operators import corpus as corpus_ops

    frame = spark.createDataFrame([(doc_id, " ".join(toks))],
                                  ["doc_id", "text"])
    row = corpus_ops.span_corruption_pairs(frame).collect()[0]
    inp = row["input_text"].split() if row["input_text"] else []
    tgt = row["target_text"].split() if row["target_text"] else []
    # parse target into sentinel -> span tokens
    spans: dict[str, list[str]] = {}
    cur = None
    for t in tgt:
        if t.startswith("<extra_id_"):
            cur = t
            spans[cur] = []
        else:
            spans[cur].append(t)
    rebuilt = []
    for t in inp:
        if t.startswith("<extra_id_"):
            rebuilt.extend(spans[t])
        else:
            rebuilt.append(t)
    assert rebuilt == toks
    assert row["n_masked"] == sum(len(v) for v in spans.values())
    assert row["n_tokens"] == len(toks)
    # block-locality: every span's tokens sit inside one 20-token block
    pos = 0
    for t in inp:
        if t.startswith("<extra_id_"):
            b = int(t[len("<extra_id_"):-1])
            for k in range(len(spans[t])):
                assert (pos + k) // 20 == b
            pos += len(spans[t])
        else:
            pos += 1


def ref_greedy_pack(rows: list[tuple[int, int]], budget: int) -> list[int]:
    """Reference greedy packer over (order, tokens) rows already
    sorted by order: run + t > budget with a non-empty run starts a
    new pack; oversized docs pack alone."""
    run, pid, out = 0, 0, []
    for _, t in rows:
        if run + t > budget and run > 0:
            pid += 1
            run = 0
        run += t
        out.append(pid)
    return out


@settings(**SETTINGS)
@given(st.lists(st.tuples(st.integers(0, 3),      # shard
                          st.integers(0, 1000),   # order key
                          st.integers(1, 40)),    # tokens
                min_size=1, max_size=40),
       st.integers(8, 60))
def test_pack_greedy_matches_reference(spark, rows, budget):
    """pack_greedy's distributed applyInPandas recurrence must equal
    the sequential reference per shard — including oversized docs
    (tokens > budget pack ALONE) and order ties (mergesort keeps
    input order stable, so dedupe order keys per shard to keep the
    reference well-defined)."""
    from msg_vector_search_spark.operators import packing

    seen = set()
    uniq = []
    for s, o, t in rows:
        if (s, o) not in seen:
            seen.add((s, o))
            uniq.append((s, o, t))
    df = spark.createDataFrame(uniq, ["shard", "ord", "toks"])
    got = packing.pack_greedy(df, budget, "shard", "ord", "toks").collect()

    by_shard: dict[int, list[tuple[int, int]]] = {}
    for s, o, t in uniq:
        by_shard.setdefault(s, []).append((o, t))
    want = {}
    for s, docs in by_shard.items():
        docs.sort()
        for (o, _), pid in zip(docs, ref_greedy_pack(docs, budget)):
            want[(s, o)] = pid
    assert {(r["shard"], r["ord"]): r["pack_id"] for r in got} == want
    # invariants: packs fill contiguously from 0 and never exceed the
    # budget except for a single oversized document
    fills: dict[tuple[int, int], list[int]] = {}
    for r in got:
        fills.setdefault((r["shard"], r["pack_id"]), []).append(r["toks"])
    for (s, pid), toks in fills.items():
        assert sum(toks) <= budget or len(toks) == 1
        if pid > 0:
            assert (s, pid - 1) in fills


@settings(**SETTINGS)
@given(st.data())
def test_pq_encode_and_adc_match_reference(spark, data):
    """pq_encode's GEMM argmax (9dp grid, first-max-lowest-code) and
    adc_score_col's literal-table fold must equal a per-row Python
    reference on random vectors and codebooks."""
    import numpy as np

    from msg_vector_search_spark.operators import pq

    m, ncodes, dsub = 2, 4, 3
    rng_vals = data.draw(st.lists(
        st.floats(-2, 2, allow_nan=False, width=32),
        min_size=m * ncodes * dsub, max_size=m * ncodes * dsub))
    codebooks = np.array(rng_vals, dtype=np.float64).reshape(m, ncodes, dsub)
    n = data.draw(st.integers(1, 6))
    vecs = [data.draw(st.lists(st.floats(-2, 2, allow_nan=False, width=32),
                               min_size=m * dsub, max_size=m * dsub))
            for _ in range(n)]
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>")

    encoded = pq.pq_encode(df, codebooks)
    got_codes = {r["vec_id"]: list(r["codes"]) for r in encoded.collect()}
    stored = {r["vec_id"]: np.array(r["embedding"], dtype=np.float64)
              for r in df.collect()}   # float32 storage is the input
    want_codes = {}
    for i, v in stored.items():
        cs = []
        for j in range(m):
            raw = codebooks[j] @ v[j * dsub:(j + 1) * dsub]
            # the serving kernel's half-away 9dp grid (r14 review —
            # np.round's half-to-even diverges on exact grid halves)
            dots = np.copysign(np.floor(np.abs(raw) * 1e9 + 0.5),
                               raw) / 1e9
            cs.append(int(np.flatnonzero(dots == dots.max())[0]))
        want_codes[i] = cs
    assert got_codes == want_codes

    qvec = stored[0]
    table = pq.adc_table([float(x) for x in qvec], codebooks)
    scored = {r["vec_id"]: r["adc"] for r in encoded.select(
        "vec_id", pq.adc_score_col(table).alias("adc")).collect()}
    for i, cs in want_codes.items():
        want = sum(float(table[j, c]) for j, c in enumerate(cs))
        assert abs(scored[i] - want) < 1e-9


@settings(**SETTINGS)
@given(st.data())
def test_maxsim_twins_and_reference_agree(spark, data):
    """The MaxSim expression form (maxsim_serve_many) and its GEMM
    twin (maxsim_join_pandas) must emit identical rows on random
    corpora — the shared-oracle bit-parity claim — and both must match
    a per-pair Python reference applying the same grid (round6 pair
    cosines -> order-free max -> ascending-i left fold -> round6)."""
    import numpy as np

    from msg_vector_search_spark.operators import similarity
    from msg_vector_search_spark.operators.similarity import _np_round6

    dt, dim, tq = 2, 3, 2
    n = data.draw(st.integers(1, 5))
    nq = data.draw(st.integers(1, 3))
    f32 = st.floats(-2, 2, allow_nan=False, width=32)
    docs = [(i, data.draw(st.lists(f32, min_size=dt * dim,
                                   max_size=dt * dim)))
            for i in range(n)]
    queries = [(100 + j,
                [data.draw(st.lists(f32, min_size=dim, max_size=dim))
                 for _ in range(tq)])
               for j in range(nq)]
    corpus = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in docs],
        "vec_id long, embedding array<float>")

    expr = similarity.maxsim_serve_many(
        corpus, queries, k=n, doc_tokens=dt, dim=dim).collect()
    gemm = similarity.maxsim_join_pandas(
        corpus, queries, k=n, doc_tokens=dt, dim=dim).collect()
    key = lambda r: (r["q_id"], r["vec_id"])
    expr_m = {key(r): (r["score"], r["rank"]) for r in expr}
    gemm_m = {key(r): (r["score"], r["rank"]) for r in gemm}
    assert expr_m == gemm_m

    # Python reference on the float32-stored vectors
    stored = {r["vec_id"]: np.array(r["embedding"], dtype=np.float64)
              for r in corpus.collect()}
    for (qid, toks) in queries:
        for i, _ in docs:
            dtoks = stored[i].reshape(dt, dim)
            dn = np.linalg.norm(dtoks, axis=1)
            total = 0.0
            for qt in toks:
                q = np.array(qt, dtype=np.float64)
                qn = float(np.linalg.norm(q))
                pair = []
                for t in range(dt):
                    denom = dn[t] * qn
                    c = 0.0 if denom == 0.0 else float(dtoks[t] @ q) / denom
                    pair.append(float(_np_round6(np.array([c]))[0]))
                total += max(pair)
            want = float(_np_round6(np.array([total]))[0]) + 0.0
            assert expr_m[(qid, i)][0] == want


@settings(**SETTINGS)
@given(st.lists(st.lists(st.text(alphabet="abcxyz 0", min_size=0,
                                 max_size=12),
                          min_size=0, max_size=15),
                min_size=1, max_size=6))
def test_minhash_signature_matches_reference(spark, docs):
    """minhash_signature's single streaming aggregate must equal the
    definitional reference — per shingle the 48-bit md5-prefix hash,
    per hash function min over (a*h+b) % p — including the empty
    shingle set (signature = all-PRIME init)."""
    import hashlib

    from msg_vector_search_spark.operators.dedup import (
        MINHASH_A, MINHASH_B, MINHASH_PRIME, minhash_signature)

    df = spark.createDataFrame(
        [(i, d) for i, d in enumerate(docs)],
        "doc_id long, shingles array<string>")
    got = {r["doc_id"]: list(r["sig"]) for r in df.select(
        "doc_id", minhash_signature(F.col("shingles")).alias("sig"))
        .collect()}

    for i, shingles in enumerate(docs):
        want = [MINHASH_PRIME] * 8
        for s in shingles:
            h = int(hashlib.md5(s.encode("utf-8")).hexdigest()[:12], 16)
            for j in range(8):
                want[j] = min(want[j],
                              (MINHASH_A[j] * h + MINHASH_B[j])
                              % MINHASH_PRIME)
        assert got[i] == want, f"doc {i}: {got[i]} != {want}"


@settings(**SETTINGS)
@given(st.data())
def test_ivf_assign_probe_search_match_reference(spark, data):
    """The IVF composition on random corpora: assign_cells must pick
    each vector's argmax-cosine centroid (9dp grid, ties to the
    smallest cell), probe_cells_local must equal the Spark probe, and
    ivf_search must equal brute-force cosine top-k RESTRICTED to the
    probed cells — i.e. cell blocking loses nothing inside the probe
    set."""
    import numpy as np

    from msg_vector_search_spark.operators import ivf

    dim, nlist = 4, 3
    f32 = st.floats(-2, 2, allow_nan=False, width=32)
    n = data.draw(st.integers(1, 8))
    docs = [(i, data.draw(st.lists(f32, min_size=dim, max_size=dim)))
            for i in range(n)]
    cents = [(c, data.draw(st.lists(f32, min_size=dim, max_size=dim)))
             for c in range(nlist)]
    qv = data.draw(st.lists(f32, min_size=dim, max_size=dim))

    emb = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in docs],
        "vec_id long, embedding array<float>")
    cdf = spark.createDataFrame(
        [(c, [float(x) for x in v]) for c, v in cents],
        "centroid_id int, centroid_vec array<double>")

    stored = {r["vec_id"]: np.array(r["embedding"], dtype=np.float64)
              for r in emb.collect()}
    cent = {c: np.array(v, dtype=np.float64) for c, v in cents}

    def cos(a, b):
        d = float(np.linalg.norm(a)) * float(np.linalg.norm(b))
        return 0.0 if d == 0.0 else float(a @ b) / d

    # assignment reference: argmax cosine on the 9dp grid, ties low id
    want_cell = {}
    for i, v in stored.items():
        best = max(range(nlist),
                   key=lambda c: (round_half_away(cos(v, cent[c]), 9), -c))
        want_cell[i] = best
    assigned = ivf.assign_cells(emb, cdf)
    got_cell = {r["vec_id"]: r["cell"] for r in assigned.collect()}
    assert got_cell == want_cell

    # probe parity: driver-side twin == Spark probe
    qvl = [float(x) for x in qv]
    local = ivf.probe_cells_local(cdf.collect(), qvl, nprobe=2)
    spark_cells = [r["cell"] for r in
                   ivf.probe_cells(cdf, qvl, nprobe=2).collect()]
    assert local == spark_cells

    # search == brute force restricted to the probed cells
    got = [(r["vec_id"], r["sim"]) for r in
           ivf.ivf_search(assigned, cdf, qvl, k=5, nprobe=2).collect()]
    q = np.array(qvl, dtype=np.float64)
    in_probe = [(i, round_half_away(cos(stored[i], q), 6) + 0.0)
                for i in stored if got_cell[i] in set(local)]
    in_probe.sort(key=lambda t: (-t[1], t[0]))
    assert got == in_probe[:5]


def round_half_away(x: float, nd: int) -> float:
    import math as _m

    s = 10.0 ** nd
    return _m.copysign(_m.floor(abs(x) * s + 0.5), x) / s


def ref_sessions(ts_sorted: list[int], gap: int) -> list[tuple]:
    """Batch-reference sessionization: maximal gap-bounded runs."""
    out = []
    for t in ts_sorted:
        if out and t - out[-1][1] <= gap:
            s, e, c = out[-1]
            out[-1] = (s, max(e, t), c + 1)
        else:
            out.append((t, t, 1))
    return out


@settings(**SETTINGS)
@given(st.lists(st.integers(0, 500), min_size=1, max_size=40),
       st.integers(5, 60),
       st.data())
def test_stateful_sessionize_core_matches_batch_reference(ts, gap, data):
    """The extracted _sessionize_group recurrence, driven over random
    TIME-ORDERED batch splits, must emit exactly the batch reference:
    closed sessions + the final open session == maximal gap-bounded
    runs of the union (this includes equal timestamps and batches
    splitting a session mid-run).  With ARBITRARY (late-delivery)
    splits, conservation still holds: every event is counted exactly
    once across closed + open."""
    from msg_vector_search_spark.streaming.stream import _sessionize_group

    ts_sorted = sorted(ts)
    # random split points -> time-ordered batches
    k = data.draw(st.integers(1, 5))
    cuts = sorted(data.draw(st.lists(
        st.integers(0, len(ts_sorted)), min_size=k - 1, max_size=k - 1)))
    bounds = [0] + cuts + [len(ts_sorted)]
    batches = [ts_sorted[a:b] for a, b in zip(bounds, bounds[1:])]

    state = None
    closed_all = []
    for b in batches:
        closed, state = _sessionize_group(b, state, gap)
        closed_all += closed
    got = closed_all + ([state] if state is not None else [])
    assert got == ref_sessions(ts_sorted, gap)

    # arbitrary (shuffled) batch order: event-count conservation
    order = data.draw(st.permutations(range(len(batches))))
    state = None
    closed_all = []
    for i in order:
        closed, state = _sessionize_group(sorted(batches[i]), state, gap)
        closed_all += closed
    total = sum(c for _, _, c in closed_all) + (state[2] if state else 0)
    assert total == len(ts_sorted)
    # and every emitted session is internally gap-bounded at its ends
    for s, e, c in closed_all:
        assert s <= e and (c >= 2 or s == e)
