"""Corpus-level audit operators: cross-source overlap, drift between
embedding snapshots, deterministic per-group reservoirs, and BPE merge
statistics.

These are curation jobs a training-data pipeline runs over the whole
corpus, not per-document transforms.  The reference has no analog (its
corpus is a single SQLite store, src/core/database/connection.py); the
operators exist because at 100 TB "is source A a re-crawl of source B"
and "did the embedding distribution move since the last snapshot" are
questions the pipeline must answer before spending GPU-hours.

Scale notes per operator are in the docstrings; the common theme is
that every one reduces to grouped aggregation on a uniform key (hash,
shingle, (label, position)) — one shuffle each, map-side partials, no
all-pairs stage anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import analysis
from . import dedup


def source_shingle_overlap(docs: DataFrame, shingle_n: int = 3,
                           top: int = 20,
                           source_col: str = "source",
                           text_col: str = "text") -> DataFrame:
    """Pairwise shingle-set overlap between sources: exact Jaccard and
    containment over distinct word n-grams.

    The cross-corpus contamination audit: a source pair with high
    containment means one feed is (partially) a re-crawl or mirror of
    the other, and the smaller side should be dropped before training.

    Scale: neither the quadratic document object nor a shingle-keyed
    self-join ever materializes — ONE shuffle keyed on the shingle
    builds each shingle's sorted source-set (map-side-partialed
    ``collect_set``, bounded by |sources|), and both the per-source
    distinct counts and the per-pair intersections are derived from
    that frame by exploding source-bounded arrays into aggregation
    domains of at most |sources| and |sources|^2 rows.  A stop-shingle
    shared by every source costs one |sources|-entry array, never a
    quadratic row blowup on a hot join key.
    """
    sets = (docs
            .select(F.col(source_col).alias("src"),
                    F.explode(dedup.shingles(F.col(text_col), shingle_n))
                    .alias("shingle"))
            .groupBy("shingle")
            .agg(F.array_sort(F.collect_set("src")).alias("srcs")))
    per = (sets.select(F.explode("srcs").alias("src"))
           .groupBy("src").agg(F.count("*").alias("n_sh")))
    pair_structs = F.expr(
        "flatten(transform(srcs, (a, i) -> "
        " transform(slice(srcs, i + 2, size(srcs)), "
        "  b -> struct(a AS src_a, b AS src_b))))")
    inter = (sets.select(F.explode(pair_structs).alias("p"))
             .select("p.src_a", "p.src_b")
             .groupBy("src_a", "src_b")
             .agg(F.count("*").alias("n_inter")))
    pa = per.select(F.col("src").alias("src_a"), F.col("n_sh").alias("n_a"))
    pb = per.select(F.col("src").alias("src_b"), F.col("n_sh").alias("n_b"))
    scored = (inter
              .join(F.broadcast(pa), "src_a")
              .join(F.broadcast(pb), "src_b")
              .withColumn(
                  "jaccard",
                  F.round(F.col("n_inter")
                          / (F.col("n_a") + F.col("n_b") - F.col("n_inter")),
                          6) + F.lit(0.0))
              .withColumn(
                  "containment",
                  F.round(F.col("n_inter")
                          / F.least(F.col("n_a"), F.col("n_b")),
                          6) + F.lit(0.0)))
    return (scored
            .select("src_a", "src_b", "n_a", "n_b", "n_inter",
                    "jaccard", "containment")
            .orderBy(F.col("jaccard").desc(), "src_a", "src_b")
            .limit(top))


def centroid_drift(old: DataFrame, new: DataFrame,
                   label_col: str = "label",
                   id_col: str = "vec_id",
                   vec_col: str = "embedding",
                   round_n: int = 6) -> DataFrame:
    """Per-label centroid shift between two embedding snapshots.

    The drift monitor a recurring-crawl deployment runs after each
    ingest: centroid(new) vs centroid(old) per label, L2 distance.  A
    label whose centroid moved is a label whose incoming data changed
    distribution — re-index (and maybe re-train quantizers) before
    serving it.

    Scale: ``posexplode`` turns each snapshot into (label, pos, val)
    rows — dim x corpus, but the aggregate is a plain grouped avg on
    the uniform (label, pos) key, map-side partialed down to
    labels x dim rows before the shuffle.  The drift join then touches
    only labels x dim rows.  No vector ever crosses the network whole.

    Centroid components are rounded before the distance so both engines
    (and successive runs under different partition orders) difference
    identical doubles.
    """
    def comps(df: DataFrame, out: str) -> DataFrame:
        return (df
                .select(F.col(label_col).alias("label"),
                        F.posexplode(F.col(vec_col)).alias("pos", "val"))
                .groupBy("label", "pos")
                .agg((F.round(F.avg("val"), round_n) + F.lit(0.0))
                     .alias(out)))

    o = comps(old, "c_old")
    n = comps(new, "c_new")
    diff = (o.join(n, ["label", "pos"])
            .withColumn("d2", (F.col("c_new") - F.col("c_old")) ** 2))
    counts_o = old.groupBy(F.col(label_col).alias("label")).agg(
        F.count("*").alias("n_old"))
    counts_n = new.groupBy(F.col(label_col).alias("label")).agg(
        F.count("*").alias("n_new"))
    return (diff.groupBy("label")
            .agg((F.round(F.sqrt(F.sum("d2")), round_n) + F.lit(0.0))
                 .alias("drift"))
            .join(F.broadcast(counts_o), "label")
            .join(F.broadcast(counts_n), "label")
            .select("label", "n_old", "n_new", "drift"))


def mix_token_budget(docs: DataFrame, budgets: dict,
                     text_col: str = "text", id_col: str = "doc_id",
                     source_col: str = "source",
                     buckets: int = 64) -> DataFrame:
    """Data mixing to per-source TOKEN budgets — the curriculum/mixture
    primitive a pretraining pipeline runs after quality gating: from
    each source, admit documents in a deterministic (hash, id) order
    until that source's token budget is filled; the first document
    that would overflow is dropped, as is everything after it.  The
    admitted set is reshuffle-stable (same docs every run, any
    cluster layout) and exactly reproducible from the budgets alone.

    SCALE — a distributed prefix sum, not a per-source window: a
    window partitioned by source serializes each source through one
    task, and sources are exactly the hot keys at 100 TB (a corpus is
    a handful of giant sources).  Instead the (hash, id) order is cut
    into ``buckets`` RANGE slices of the 48-bit hash space (uniform by
    construction), each (source, bucket) computes its LOCAL running
    sum in parallel — the per-window state is corpus/(sources x
    buckets) — and the bucket-boundary offsets (sources x buckets
    rows, dimension-bounded) are cumulated and broadcast back.  Global
    running total = bucket offset + local running sum; two narrow
    shuffles, no serialized source.  The oracle replays the same total
    as ONE window cumsum over the same (hash, id) order — identical
    longs, so the parallel decomposition is value-verified.

    Returns ``(id_col, source_col, n_tokens, cum_tokens)`` for the
    admitted docs (cum_tokens <= budget, running total inclusive)."""
    spark = docs.sparkSession
    h = analysis.token_hash(F.col(id_col).cast("string"))
    # 48-bit hash -> range bucket: bucket order == hash order
    span = (1 << 48) // buckets + 1
    toks = analysis.whitespace_token_count(F.col(text_col)).cast("long")
    base = (docs.select(F.col(id_col), F.col(source_col),
                        toks.alias("n_tokens"), h.alias("_h"))
            .withColumn("_b", (F.col("_h") / F.lit(span))
                        .cast("int")))
    w_local = Window.partitionBy(source_col, "_b").orderBy(
        F.col("_h").asc(), F.col(id_col).asc())
    local = base.withColumn("_cum_local",
                            F.sum("n_tokens").over(w_local))
    # bucket totals -> exclusive prefix offsets per source, over the
    # bucket index order; sources x buckets rows — broadcastable
    w_off = (Window.partitionBy(source_col).orderBy("_b")
             .rowsBetween(Window.unboundedPreceding, -1))
    offsets = (base.groupBy(source_col, "_b")
               .agg(F.sum("n_tokens").alias("_bt"))
               .withColumn("_off", F.coalesce(
                   F.sum("_bt").over(w_off), F.lit(0)))
               .select(source_col, "_b", "_off"))
    bdg = spark.createDataFrame(
        [(k, int(v)) for k, v in sorted(budgets.items())],
        f"{source_col} string, _budget long")
    return (local
            .join(F.broadcast(offsets), [source_col, "_b"])
            .join(F.broadcast(bdg), source_col)
            .withColumn("cum_tokens",
                        (F.col("_off") + F.col("_cum_local"))
                        .cast("long"))
            .filter(F.col("cum_tokens") <= F.col("_budget"))
            .select(id_col, source_col, "n_tokens", "cum_tokens")
            .orderBy(source_col, "cum_tokens"))


def bigram_perplexity(docs: DataFrame, lam: float = 0.7,
                      text_col: str = "text", id_col: str = "doc_id",
                      k: int = 100) -> DataFrame:
    """Interpolated bigram-LM quality gate — the upgrade over the
    unigram logprob filter (text_unigram_logprob): per document, the
    mean negative log of p(w|u) = lam * c(u,w)/c(u) + (1-lam) *
    c(w)/N over its adjacent token pairs, counts from the corpus
    itself (the CCNet-style "score against your own corpus LM"
    arrangement; a held-out LM swaps the count tables, same plan).
    High score = improbable word-to-word transitions — boilerplate,
    shredded text, wrong-language runs that unigram stats miss.

    Plan shape: one bigram count aggregate and one unigram count
    aggregate (uniform keys), the scoring join CO-PARTITIONS on the
    bigram key then the unigram key (count tables are
    vocabulary-sized — never broadcast at 100 TB), the scalar total
    IS broadcast, per-doc means are map-side partial, top-k is
    TakeOrderedAndProject.  The scoring join's INPUT is
    pre-aggregated to per-doc DISTINCT bigrams ``(doc, u, w, c)``
    before the three count joins (VERDICT r12 item 3): documents
    repeat bigrams, each (u, w) pair's -log p is one value, so the
    per-doc mean weighted by c is identical to the per-occurrence
    mean while the join shuffles only the distinct-pair frame —
    strictly less volume at any corpus with within-doc repetition.
    Returns ``(id_col, n_bigrams, avg_neg_ll)``, top-*k* by (score
    desc, id)."""
    toks = analysis.tokens(F.col(text_col))
    pairs = F.filter(
        F.zip_with(toks, F.slice(toks, 2, F.size(toks)),
                   lambda a, b: F.struct(a.alias("u"), b.alias("w"))),
        lambda p: p["w"].isNotNull())
    tok = (docs.select(F.col(id_col),
                       F.explode(analysis.tokens(F.col(text_col)))
                       .alias("term")))
    cnt_u = tok.groupBy("term").agg(F.count("*").alias("_c_u"))
    tot = tok.agg(F.count("*").alias("_n"))
    occ = (docs.select(F.col(id_col), F.explode(pairs).alias("p"))
           .select(id_col, F.col("p.u").alias("u"),
                   F.col("p.w").alias("w"))
           .groupBy(id_col, "u", "w").agg(F.count("*").alias("_c")))
    cnt_uw = occ.groupBy("u", "w").agg(F.sum("_c").alias("_c_uw"))
    p_col = (F.lit(lam) * F.col("_c_uw")
             / F.col("_c_prev")
             + F.lit(1.0 - lam) * F.col("_c_w") / F.col("_n"))
    scored = (occ
              .join(cnt_uw, ["u", "w"])
              .join(cnt_u.select(F.col("term").alias("u"),
                                 F.col("_c_u").alias("_c_prev")), "u")
              .join(cnt_u.select(F.col("term").alias("w"),
                                 F.col("_c_u").alias("_c_w")), "w")
              .crossJoin(F.broadcast(tot))
              .select(id_col, F.col("_c"),
                      (-F.log(p_col)).alias("_nll")))
    return (scored.groupBy(id_col)
            .agg(F.sum("_c").alias("n_bigrams"),
                 (F.round(F.sum(F.col("_c") * F.col("_nll"))
                          / F.sum("_c"), 6) + F.lit(0.0))
                 .alias("avg_neg_ll"))
            .orderBy(F.col("avg_neg_ll").desc(), F.col(id_col))
            .limit(k))


def span_corruption_pairs(docs: DataFrame, text_col: str = "text",
                          id_col: str = "doc_id", block: int = 20,
                          span_len: int = 3) -> DataFrame:
    """T5-style span corruption (Raffel et al. 2020) as a
    DETERMINISTIC data transform: every *block* tokens, one
    *span_len*-token span is masked; the input replaces each span
    with its block's sentinel ``<extra_id_b>`` and the target is the
    concatenation of sentinel + original span — the (input, target)
    pair layout a denoising pretrain consumes, reproducible from
    (doc_id, position) alone so re-runs and retried tasks emit
    identical pairs.

    Span starts come from the shared 48-bit hash of ``doc_id:block``
    and are BLOCK-LOCAL (a span never crosses its block), which makes
    the whole transform a per-position O(1) expression — each
    position consults only its own block's start; no sequential scan,
    no cross-position dependency, one narrow codegen map at any
    corpus size.  Masking rate = span_len/block (15% at defaults,
    the paper's operating point).  Short tail blocks whose drawn
    start falls past the end simply mask nothing."""
    toks = analysis.tokens(F.col(text_col))

    def hash_start(b):
        # 1-based start of block b's span: block offset + drawn
        # in-block offset (0 .. block-span_len), same md5 rule both
        # engines
        key = F.concat(F.col(id_col).cast("string"), F.lit(":"),
                       b.cast("string"))
        return (b * block
                + F.pmod(analysis.token_hash(key),
                         F.lit(block - span_len + 1)) + 1)

    def sentinel(b):
        return F.concat(F.lit("<extra_id_"), b.cast("string"),
                        F.lit(">"))

    n = F.size(toks)

    def blk(p):
        return ((p - 1) / F.lit(block)).cast("int")

    pos = F.sequence(F.lit(1), n)
    inp = F.flatten(F.transform(pos, lambda p: F.when(
        p == hash_start(blk(p)), F.array(sentinel(blk(p))))
        .when((p > hash_start(blk(p)))
              & (p <= hash_start(blk(p)) + F.lit(span_len - 1)),
              F.array().cast("array<string>"))
        .otherwise(F.array(F.element_at(toks, p)))))
    blocks = F.sequence(F.lit(0),
                        F.ceil(n / F.lit(block)).cast("int") - 1)
    valid = F.filter(blocks, lambda b: hash_start(b) <= n)
    tgt = F.flatten(F.transform(valid, lambda b: F.concat(
        F.array(sentinel(b)),
        F.slice(toks, hash_start(b), span_len))))
    n_masked = F.aggregate(
        valid, F.lit(0).cast("long"),
        lambda acc, b: acc + F.least(F.lit(span_len).cast("long"),
                                     (n - hash_start(b) + 1)
                                     .cast("long")))
    return docs.select(
        F.col(id_col),
        n.cast("long").alias("n_tokens"),
        n_masked.cast("long").alias("n_masked"),
        F.array_join(inp, " ").alias("input_text"),
        F.array_join(tgt, " ").alias("target_text"))


def deterministic_group_sample(df: DataFrame, group_col: str,
                               id_col: str, k: int) -> DataFrame:
    """Fixed-k-per-group sample, deterministic across runs and
    partitionings: order each group by the 48-bit md5 hash of the id
    and keep the first *k*.

    The balanced-eval-set builder: "give me exactly 5 docs from every
    source, the same 5 every run, no matter how the cluster is laid
    out".  ``rand()``-based sampling fails all three requirements;
    hash-order row_number is a reshuffle-stable reservoir.

    Scale: one shuffle on *group_col*; the window is partitioned (never
    global), and within-group sort cost is bounded by the group size.
    For pathologically hot groups, pre-filter ``hash % m < t`` with
    t sized to overshoot k, then rank the survivors.
    """
    h = analysis.token_hash(F.col(id_col).cast("string"))
    w = Window.partitionBy(group_col).orderBy(h.asc(), F.col(id_col).asc())
    return (df
            .withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= k)
            .drop("rk"))


def bpe_pair_counts(docs: DataFrame, top: int = 20,
                    text_col: str = "text") -> DataFrame:
    """Top adjacent character-pair frequencies over alphabetic tokens —
    the statistic the first BPE merge step maximizes (Sennrich et al.,
    ACL 2016).  Run iteratively with a symbol-remap between rounds this
    is tokenizer vocabulary induction; the single pass is the audit
    form ("what would the tokenizer learn from THIS corpus").

    Scale: explode(token) -> explode(pair) -> count.  The aggregate key
    is a 2-char string (tiny domain), so map-side partials collapse
    each partition to at most |alphabet|^2 rows before the shuffle —
    the shuffle is effectively free regardless of corpus size.  Tokens
    are gated to ``^[a-z]+$`` so code-point semantics agree across
    engines (CJK grapheme handling differs between dialects).
    """
    toks = (docs
            .select(F.explode(analysis.tokens(F.col(text_col)))
                    .alias("tok"))
            .filter(F.col("tok").rlike("^[a-z]+$"))
            .filter(F.length("tok") >= 2))
    pairs = toks.select(
        F.explode(F.expr(
            "transform(sequence(1, length(tok) - 1),"
            " i -> substring(tok, i, 2))")).alias("pair"))
    return (pairs.groupBy("pair")
            .agg(F.count("*").alias("cnt"))
            .orderBy(F.col("cnt").desc(), F.col("pair").asc())
            .limit(top))


def bpe_merge_rounds(docs: DataFrame, rounds: int = 3,
                     text_col: str = "text") -> DataFrame:
    """Iterative BPE vocabulary induction (Sennrich et al., ACL 2016) —
    the sequential training loop :func:`bpe_pair_counts` is one round
    of: count adjacent-SYMBOL pairs over the corpus, merge the argmax
    pair, rewrite the symbol sequences, repeat.  Returns one row per
    round: ``(round, pair, merged, cnt)``.

    The loop is inherently sequential (round r's counts depend on
    round r-1's merge — why tokenizer training is a scheduled job, not
    a query), but each round's WORK is fully distributed: one
    map-side-partial aggregate for the pair counts (key domain is the
    growing-but-tiny symbol-pair vocabulary), a 1-row driver argmax,
    and a scan-riding literal ``replace`` for the rewrite.  Symbol
    sequences are spaced strings (``'b p e'``) so a merge is a plain
    left-to-right non-overlapping string replace — identical semantics
    in Spark and the unrolled DuckDB oracle.  Each round's rewrite is
    checkpointed, so K rounds cost K corpus scans, not K^2 (at
    warehouse scale: a reliable-storage checkpoint per round, exactly
    how iterative MLlib jobs persist between passes)."""
    from ..session import widen

    spark = docs.sparkSession
    toks = (docs
            .select(F.explode(analysis.tokens(F.col(text_col)))
                    .alias("tok"))
            .filter(F.col("tok").rlike("^[a-z]+$"))
            .filter(F.length("tok") >= 2))
    # widen BEFORE the first checkpoint: a single-file corpus arrives
    # as ONE input split, and a localCheckpoint freezes that layout —
    # every round's pair count AND rewrite then run on one core for
    # the whole loop (measured: 3 x 1.3 s single-task round scans at
    # sf0.1; r18).  The round-robin spread is a one-time shuffle of
    # the token strings; at production scale the scan is already wide
    # and widen is a no-op.
    spaced = widen(toks.select(
        F.trim(F.regexp_replace("tok", "(.)", "$1 ")).alias("s"))) \
        .localCheckpoint()
    out = []
    for r in range(1, rounds + 1):
        arr = F.split(F.col("s"), " ")
        pairs = F.transform(
            F.sequence(F.lit(0), F.size(arr) - 2),
            lambda i: F.concat(F.get(arr, i), F.lit(" "),
                               F.get(arr, i + 1)))
        # fully-merged sequences (one symbol left) contribute no pairs;
        # without the guard, size-2 = -1 makes sequence(0,-1) emit a
        # DESCENDING [0,-1] whose out-of-bounds gets are null pairs
        best = (spaced.filter(F.size(arr) >= 2)
                .select(F.explode(pairs).alias("pair"))
                .groupBy("pair").agg(F.count("*").alias("cnt"))
                .orderBy(F.col("cnt").desc(), F.col("pair").asc())
                .head())
        if best is None:
            # no mergeable pair left: an all-short/no-letter corpus
            # yields none at all, or every sequence collapsed to one
            # symbol before `rounds` ran out — stop with the merges
            # trained so far instead of dereferencing None (r14 review)
            break
        merged = best["pair"].replace(" ", "")
        out.append((r, best["pair"], merged, int(best["cnt"])))
        # space-sentinel replace so a merge fires only on WHOLE-SYMBOL
        # boundaries: ' x y ' cannot match the tail of a multi-char
        # symbol ('th e' does not contain ' h e ') — a BPE pair is two
        # SYMBOLS, not two substrings.  Leftmost-first non-overlapping
        # literal replace (identical semantics in DuckDB) is BPE's
        # greedy application order, the re-inserted spaces chaining
        # adjacent matches.
        prev = spaced
        spaced = spaced.select(F.trim(F.replace(
            F.concat(F.lit(" "), F.col("s"), F.lit(" ")),
            F.lit(f" {best['pair']} "),
            F.lit(f" {merged} "))).alias("s")).localCheckpoint()
        # the new checkpoint supersedes the old one — release the old
        # round's pinned blocks, or K rounds pin K corpus copies for
        # the session's lifetime (the _cc_free contract from the
        # connected-components loop)
        dedup._cc_free(prev)
    dedup._cc_free(spaced)  # output is the driver-side rounds list
    return spark.createDataFrame(
        out, "round int, pair string, merged string, cnt long")


BPE_ALPHABET = "abcdefghijklmnopqrstuvwxyz"


def bpe_vocab(merges: list[str], alphabet: str = BPE_ALPHABET) -> list[str]:
    """The tokenizer's vocabulary: base alphabet plus each merge's
    merged symbol, sorted lexicographically.  Token id = 1-based
    position in this list — defined by the TOKENIZER (alphabet +
    trained merges), never by the corpus being encoded, so two corpora
    encoded with the same merges agree on every id.  Kept as a plain
    sorted list (no dedup) so an oracle building the same list gets
    identical positions."""
    return sorted(list(alphabet) + [m.replace(" ", "") for m in merges])


def bpe_encode(docs: DataFrame, merges: list[str],
               text_col: str = "text", id_col: str = "doc_id",
               alphabet: str = BPE_ALPHABET) -> DataFrame:
    """Apply a trained BPE merge list to tokenize a corpus — the
    encode/apply step :func:`bpe_merge_rounds` trains for, emitting the
    token-id arrays a training run consumes (the frames
    ``pack_sequences_*`` packs and ``vocab_coverage`` audits).

    *merges* is the ordered list of trained pair strings (``'t h'``,
    ``bpe_merge_rounds``'s ``pair`` column, in round order).  Encoding
    a token = space out its characters, then apply each merge in
    training order as the same space-sentinel whole-symbol replace the
    training rewrite uses (leftmost-first non-overlapping literal
    replace — BPE's greedy application order — with re-inserted spaces
    chaining adjacent matches), so encode(corpus) under K trained
    merges reproduces the training loop's round-K symbol state exactly.
    Symbols map to ids by position in :func:`bpe_vocab`.

    Returns ``(id_col, n_tokens, token_ids)``.  Tokens are gated to
    ``^[a-z]+$`` exactly as training gates them (cross-engine
    code-point agreement); other tokens contribute no ids.

    Scale: the whole encode is ONE narrow projection riding the corpus
    scan — per-token higher-order expressions (transform / filter /
    flatten) with a literal replace chain and a literal vocab array
    (|alphabet| + K entries, driver-side), no UDF, no join, no shuffle
    of any kind.  K corpus scans during training, ONE corpus scan per
    encode."""
    vocab = F.array(*[F.lit(v) for v in bpe_vocab(merges, alphabet)])

    def encode_tok(tok):
        # ' c h a r s ' spaced form, then the training-order merges
        s = F.concat(F.lit(" "),
                     F.trim(F.regexp_replace(tok, "(.)", "$1 ")),
                     F.lit(" "))
        for m in merges:
            s = F.replace(s, F.lit(f" {m} "),
                          F.lit(f" {m.replace(' ', '')} "))
        return F.split(F.trim(s), " ")

    gated = F.filter(analysis.tokens(F.col(text_col)),
                     lambda t: t.rlike("^[a-z]+$") & (F.length(t) >= 1))
    symbols = F.flatten(F.transform(gated, encode_tok))
    ids = F.transform(symbols, lambda sym: F.array_position(vocab, sym)
                      .cast("int"))
    return (docs.select(F.col(id_col), ids.alias("token_ids"))
            .withColumn("n_tokens", F.size("token_ids").cast("long"))
            .select(id_col, "n_tokens", "token_ids"))


def dsir_importance(docs: DataFrame, target_pred,
                    text_col: str = "text", id_col: str = "doc_id",
                    k: int = 100) -> DataFrame:
    """Data Selection via Importance Resampling (Xie et al., NeurIPS
    2023, arXiv:2302.03169): score every candidate document (rows
    where *target_pred* is false) by the mean per-token log importance
    ratio between a unigram model of the TARGET slice (rows where it
    is true) and a unigram model of the whole corpus — the hashed-
    n-gram DSIR estimator with n=1 and add-one smoothing over the
    shared corpus vocabulary.  High scores = candidates that look like
    the target distribution; a pipeline keeps the top slice as extra
    target-like training data.

    Returns ``(id_col, n_toks, avg_log_ratio)``, top-*k* candidates by
    (score desc, id).

    Scale shape (the text_unigram_logprob twin, doubled): two term
    aggregates build the vocabulary-sized count tables — too big to
    broadcast at 100 TB, so the per-token scoring join CO-PARTITIONS
    on the uniform token key instead; the two scalar totals (target
    token count; corpus vocab size + token count) ARE broadcast
    (one-row frames); the per-doc mean is a map-side-partial
    aggregate; the final top-k is TakeOrderedAndProject.  The target
    model would come from a held-out reference corpus at production
    scale — the plan is identical, only the left side of the count
    aggregate changes."""
    tok = docs.select(F.col(id_col), target_pred.alias("_tgt"),
                      F.explode(analysis.tokens(F.col(text_col)))
                      .alias("term"))
    cnt_all = tok.groupBy("term").agg(F.count("*").alias("_c_all"))
    cnt_t = (tok.filter(F.col("_tgt"))
             .groupBy("term").agg(F.count("*").alias("_c_t")))
    corpus_tot = cnt_all.agg(F.count("*").alias("_v"),
                             F.sum("_c_all").alias("_n_all"))
    target_tot = (tok.filter(F.col("_tgt"))
                  .agg(F.count("*").alias("_n_t")))
    lr = (F.log((F.coalesce(F.col("_c_t"), F.lit(0)) + F.lit(1))
                .cast("double") / (F.col("_n_t") + F.col("_v")))
          - F.log((F.col("_c_all") + F.lit(1)).cast("double")
                  / (F.col("_n_all") + F.col("_v"))))
    ratios = (cnt_all.join(cnt_t, "term", "left")
              .crossJoin(F.broadcast(corpus_tot))
              .crossJoin(F.broadcast(target_tot))
              .select("term", lr.alias("_lr")))
    return (tok.filter(~F.col("_tgt"))
            .join(ratios, "term")
            .groupBy(id_col)
            .agg(F.count(F.lit(1)).alias("n_toks"),
                 (F.round(F.avg("_lr"), 6) + F.lit(0.0))
                 .alias("avg_log_ratio"))
            .orderBy(F.col("avg_log_ratio").desc(), F.col(id_col))
            .limit(k))


def dsir_hashed_ngrams(docs: DataFrame, target_pred,
                       text_col: str = "text", id_col: str = "doc_id",
                       buckets: int = 4096, k: int = 100) -> DataFrame:
    """The PRODUCTION DSIR estimator (Xie et al., NeurIPS 2023,
    arXiv:2302.03169 section 3: hashed n-gram features): unigram AND
    bigram features, each hashed into a FIXED bucket space, scored by
    the same mean log importance ratio as :func:`dsir_importance`.
    Hashing is what the paper actually ships — the model is exactly
    ``buckets`` rows regardless of corpus vocabulary, so at 100 TB the
    count tables are bounded by construction (the n=1 exact-vocab form
    above keeps a vocabulary-sized table: fine for analysis, unbounded
    in principle), and bigrams give the estimator word-order signal a
    unigram model cannot see.

    Same plan shape as the exact-vocab form: two bucket-keyed count
    aggregates (uniform keys — the hash is the salt), the scalar
    totals broadcast as one-row frames, the per-feature scoring join
    CO-PARTITIONS on the bucket key, per-doc means are map-side
    partial aggregates, final top-k is TakeOrderedAndProject.
    Add-one smoothing runs over the fixed bucket space (denominator
    ``buckets``), which also drops the vocab-size count query.  The
    feature hash is the repo's shared 48-bit md5 prefix
    (analysis.token_hash) so DuckDB replays it exactly."""
    toks = analysis.tokens(F.col(text_col))
    # bigrams: zip the token array against itself shifted by one —
    # zip_with pads the tail with null, which concat propagates, so
    # one null-filter yields exactly the n-1 adjacent pairs
    bigrams = F.filter(
        F.zip_with(toks, F.slice(toks, 2, F.size(toks)),
                   lambda a, b: F.concat(a, F.lit(" "), b)),
        lambda x: x.isNotNull())
    feats = F.concat(toks, bigrams)
    tok = (docs.select(F.col(id_col), target_pred.alias("_tgt"),
                       F.explode(feats).alias("_f"))
           .select(id_col, "_tgt",
                   F.pmod(analysis.token_hash(F.col("_f")),
                          F.lit(buckets)).alias("b")))
    cnt_all = tok.groupBy("b").agg(F.count("*").alias("_c_all"))
    cnt_t = (tok.filter(F.col("_tgt"))
             .groupBy("b").agg(F.count("*").alias("_c_t")))
    tot_all = cnt_all.agg(F.sum("_c_all").alias("_n_all"))
    tot_t = tok.filter(F.col("_tgt")).agg(F.count("*").alias("_n_t"))
    lr = (F.log((F.coalesce(F.col("_c_t"), F.lit(0)) + F.lit(1))
                .cast("double") / (F.col("_n_t") + F.lit(buckets)))
          - F.log((F.col("_c_all") + F.lit(1)).cast("double")
                  / (F.col("_n_all") + F.lit(buckets))))
    ratios = (cnt_all.join(cnt_t, "b", "left")
              .crossJoin(F.broadcast(tot_all))
              .crossJoin(F.broadcast(tot_t))
              .select("b", lr.alias("_lr")))
    return (tok.filter(~F.col("_tgt"))
            .join(ratios, "b")
            .groupBy(id_col)
            .agg(F.count(F.lit(1)).alias("n_feats"),
                 (F.round(F.avg("_lr"), 6) + F.lit(0.0))
                 .alias("avg_log_ratio"))
            .orderBy(F.col("avg_log_ratio").desc(), F.col(id_col))
            .limit(k))
