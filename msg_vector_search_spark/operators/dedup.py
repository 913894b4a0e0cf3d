"""Deduplication operators — exact and near-duplicate (SURVEY 2.D D7 +
the training-data-pipeline extension surface).

The reference's only dedup is last-writer-wins ``INSERT OR REPLACE`` on
the message-id primary key (src/core/embeddings/processor.py:382-388).
A 100 TB corpus pipeline needs the full family; each variant below is a
composition of built-in DataFrame ops (explode / groupBy / self-join on
a blocking key) with the shared md5-prefix hash so every one of them is
DuckDB-oracle checkable.

Scale notes per operator are inline; the common theme: never form the
quadratic all-pairs set — always block first (hash bucket, LSH band,
SimHash value), and the post-block verification join is an equi-join on
the block key that AQE can size.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions import analysis
from ..functions import vector as V
from ..session import widen


def dedup_last_wins(df: DataFrame, key: str, order_col: str,
                    tiebreak: str | None = None) -> DataFrame:
    """D7/A5 ``dedup_last_wins``: keep the newest row per key — the
    relational form of ``INSERT OR REPLACE`` (reference:
    embeddings/processor.py:382-388).

    Rows tied on *order_col* are kept ARBITRARILY unless *tiebreak*
    names a distinguishing column — the same semantics as the
    reference's last-arrival REPLACE and the store's bucketed dedup
    (sinks._dedup_last_wins_bucketed).  Callers for whom tied versions
    differ in payload should either pass *tiebreak* or use a
    strictly-monotonic order column (the ingest plan's per-run
    generation, plans/ingest.py)."""
    order = [F.col(order_col).desc()]
    if tiebreak is not None:
        order.append(F.col(tiebreak).desc())
    w = Window.partitionBy(key).orderBy(*order)
    return (df.withColumn("_rn", F.row_number().over(w))
              .filter(F.col("_rn") == 1).drop("_rn"))


def dedup_exact(df: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Exact dedup by normalized-text hash: group by fingerprint, keep
    the smallest id (deterministic canonical row).  One shuffle on the
    48-bit-uniform hash — no skew, map-side partial aggregation."""
    return (
        widen(df).withColumn("fp", analysis.fingerprint_md5(text_col))
        .groupBy("fp")
        .agg(F.min(id_col).alias(id_col), F.count("*").alias("dup_count"))
    )


def shingles(text: Column | str, n: int = 3) -> Column:
    """Word n-gram shingles of normalized text -> array<string>.
    Documents shorter than *n* tokens yield their full token join.

    The token array is bound ONCE via :func:`analysis.bind_once`; a
    naive ``element_at(tokens(text), i+j)`` inside the lambda would
    re-tokenize the document per shingle position (O(tokens^2))."""
    def build(toks: Column) -> Column:
        k = F.size(toks) - (n - 1)
        return F.when(
            k <= 0, F.array(F.concat_ws(" ", toks))
        ).otherwise(
            F.transform(
                F.sequence(F.lit(1), k),
                lambda i: F.concat_ws(
                    " ", *[F.element_at(toks, i + j) for j in range(n)]),
            )
        )

    return analysis.bind_once(analysis.tokens(text), build)


# Universal-hash seeding for MinHash: h_i(x) = (A[i]*x + B[i]) mod P over
# the 48-bit base hash.  P is the largest prime < 2^48; A[i] < 2^15 keeps
# A[i]*x < 2^63 (no int64 overflow in either Spark or DuckDB).  ONE md5
# per shingle instead of num_hashes of them.
MINHASH_PRIME = 281474976710597
MINHASH_A = (10007, 12289, 15013, 18041, 21001, 24593, 27437, 31231,
             10009, 12301, 15017, 18043, 21011, 24611, 27449, 31237)
MINHASH_B = (7919, 104729, 1299709, 15485863, 32452843, 49979687,
             67867967, 86028121, 7927, 104743, 1299721, 15485867,
             32452867, 49979693, 67867979, 86028157)


def minhash_signature(shingle_col: Column, num_hashes: int = 8) -> Column:
    """MinHash signature as ONE streaming aggregate over the shingles.

    Each shingle is md5-hashed exactly once; the *num_hashes* seeded
    variants are cheap ``(a*h+b) % p`` arithmetic.  The accumulator is
    the array of running minima, so the whole signature is a single
    expression evaluated once per row — critical because higher-order
    functions don't participate in whole-stage codegen, so any repeated
    reference would re-run the md5 scan of the document.
    Returns array<bigint> of length *num_hashes*.
    """
    if not 1 <= num_hashes <= len(MINHASH_A):
        # actionable instead of an IndexError deep in seed
        # construction (r14 review) — mirrors the bands guard below
        raise ValueError(
            f"num_hashes ({num_hashes}) must be 1..{len(MINHASH_A)} "
            "(the seeded hash family's size)")
    seeds = F.array(*[
        F.struct(F.lit(MINHASH_A[i]).cast("long").alias("a"),
                 F.lit(MINHASH_B[i]).cast("long").alias("b"))
        for i in range(num_hashes)])
    hashed = F.transform(shingle_col, analysis.token_hash)
    init = F.array_repeat(F.lit(MINHASH_PRIME).cast("long"), num_hashes)
    return F.aggregate(
        hashed, init,
        lambda acc, h: F.zip_with(
            acc, seeds,
            lambda m, s: F.least(m, (s.a * h + s.b) % MINHASH_PRIME)))


def lsh_band_hashes(shingle_col: Column, num_hashes: int, bands: int) -> Column:
    """Band hashes (array<string>, length *bands*) computed in the same
    single aggregate as the signature: the ``finish`` lambda binds the
    signature ONCE (lambda variables are values, not re-evaluated
    expressions) and concatenates each band's rows."""
    if bands < 1 or num_hashes % bands != 0:
        # a remainder would silently drop hash functions, and
        # bands > num_hashes would make every band hash the empty
        # string — one global bucket, i.e. the O(n^2) all-pairs
        # explosion this operator exists to avoid
        raise ValueError(
            f"bands ({bands}) must evenly divide num_hashes "
            f"({num_hashes})")
    if not 1 <= num_hashes <= len(MINHASH_A):
        raise ValueError(
            f"num_hashes ({num_hashes}) must be 1..{len(MINHASH_A)} "
            "(the seeded hash family's size)")
    rows_per_band = num_hashes // bands
    seeds = F.array(*[
        F.struct(F.lit(MINHASH_A[i]).cast("long").alias("a"),
                 F.lit(MINHASH_B[i]).cast("long").alias("b"))
        for i in range(num_hashes)])
    hashed = F.transform(shingle_col, analysis.token_hash)
    init = F.array_repeat(F.lit(MINHASH_PRIME).cast("long"), num_hashes)
    return F.aggregate(
        hashed, init,
        lambda acc, h: F.zip_with(
            acc, seeds,
            lambda m, s: F.least(m, (s.a * h + s.b) % MINHASH_PRIME)),
        lambda sig: F.transform(
            F.sequence(F.lit(0), F.lit(bands - 1)),
            lambda b: F.concat_ws("_", *[
                F.element_at(sig, b * rows_per_band + r + 1).cast("string")
                for r in range(rows_per_band)])))


def band_hashes_of_sig(sig_col: Column, num_hashes: int,
                       bands: int) -> Column:
    """Band hashes derived from an ALREADY-COMPUTED signature column —
    the reuse path for consumers that need the signature AND its bands
    (:func:`minhash_estimate_pairs`): one md5 scan feeds both, where
    the self-contained :func:`lsh_band_hashes` aggregate would re-hash
    every shingle.  Identical arithmetic and validation."""
    if bands < 1 or num_hashes % bands != 0:
        raise ValueError(
            f"bands ({bands}) must evenly divide num_hashes "
            f"({num_hashes})")
    rows_per_band = num_hashes // bands
    return F.transform(
        F.sequence(F.lit(0), F.lit(bands - 1)),
        lambda b: F.concat_ws("_", *[
            F.element_at(sig_col, b * rows_per_band + r + 1)
            .cast("string") for r in range(rows_per_band)]))


def _banded_pairs(banded: DataFrame, id_col: str,
                  max_block: int | None) -> DataFrame:
    """Distinct candidate pairs (id_a < id_b) from an exploded
    (id, band_idx, band_hash) frame — the per-(band, bucket) self-join
    shared by :func:`dedup_minhash_lsh` and
    :func:`minhash_estimate_pairs`, with the grid-salted variant when
    *max_block* caps reducer blocks."""
    if max_block is not None:
        return _grid_salted_self_pairs(
            banded, ["band_idx", "band_hash"], id_col, max_block)
    a = banded.select(F.col(id_col).alias("id_a"), "band_idx",
                      "band_hash")
    b = banded.select(F.col(id_col).alias("id_b"), "band_idx",
                      "band_hash")
    return (a.join(b, ["band_idx", "band_hash"])
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b").distinct())


def _grid_salted_self_pairs(keyed: DataFrame, block_cols: list[str],
                            id_col: str, max_block: int,
                            payload_cols: tuple[str, ...] = (),
                            dedup_pairs: bool = True) -> DataFrame:
    """EXACT skew-safe self-join of *keyed* on *block_cols*: emits the
    identical (id_a, id_b) row set as a plain self-join, but a hot
    block's PAIR COMPUTE is divided over ceil(n / max_block) reducers
    instead of landing on one.  Per-reducer cost, stated precisely:
    compute is |A_block| x |B_sub| = n x max_block (vs n^2 unsalted);
    the BUFFERED join side is the sub-bucketed B group (O(max_block)
    rows) while A's replicas stream through — reducer memory stays
    bounded even though each salt reducer reads the block once from A
    (inherent: an exact all-pairs emission moves O(n x nsub) rows
    however it is parallelized; capping OUTPUT instead is what
    lsh_star_pairs is for).

    Grid salting: side B gets a deterministic sub-bucket ``hash48(id) %
    nsub``; side A is replicated once per sub-bucket, so every original
    pair still meets on exactly one (block, salt) key.  nsub adapts per
    block from a groupBy count — partial aggregation keeps the size scan
    itself skew-free (the reducer sees one row per block, not the
    block's members).  The salt hash is the shared md5-prefix primitive,
    so the construction is DuckDB-mirrorable (though mirroring is never
    needed: the output is equal to the unsalted join's).

    *payload_cols* ride each side of the pair as ``<col>_a`` /
    ``<col>_b`` (e.g. the comparison prefix edit_distance_pairs
    scores); *dedup_pairs=False* skips the final distinct for callers
    whose *keyed* has ONE row per id (a pair then meets on exactly one
    (block, salt) key, so no duplicates exist to drop — multi-row
    inputs like LSH band keys need the distinct)."""
    sizes = (keyed.groupBy(*block_cols).agg(F.count("*").alias("_bsz"))
             .withColumn("_nsub",
                         F.greatest(F.lit(1),
                                    F.ceil(F.col("_bsz") / max_block))
                         .cast("int"))
             .drop("_bsz"))
    sized = keyed.join(sizes, block_cols)
    a = sized.select(
        F.col(id_col).alias("id_a"),
        *[F.col(c).alias(f"{c}_a") for c in payload_cols],
        *block_cols,
        F.explode(F.sequence(F.lit(0), F.col("_nsub") - 1)).alias("_salt"))
    b = sized.select(
        F.col(id_col).alias("id_b"),
        *[F.col(c).alias(f"{c}_b") for c in payload_cols],
        *block_cols,
        F.pmod(analysis.token_hash(F.col(id_col).cast("string")),
               F.col("_nsub")).alias("_salt"))
    out_cols = (["id_a", "id_b"]
                + [f"{c}_a" for c in payload_cols]
                + [f"{c}_b" for c in payload_cols])
    pairs = (a.join(b, [*block_cols, "_salt"])
             .filter(F.col("id_a") < F.col("id_b"))
             .select(*out_cols))
    return pairs.distinct() if dedup_pairs else pairs


def dedup_minhash_lsh(df: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id", num_hashes: int = 8,
                      bands: int = 4, shingle_n: int = 3,
                      max_block: int | None = None) -> DataFrame:
    """MinHash + LSH near-dup candidate pairs.

    shingle -> minhash signature -> split into *bands* -> explode band
    buckets -> self-join per (band, bucket) -> distinct candidate pairs
    (id_a < id_b).

    Scale: the only shuffle keys are (band_idx, band_hash) — uniform for
    *distinct* texts by construction; the corpus is never all-paired,
    only same-bucket rows meet.  The skew that DOES happen is semantic:
    near-identical boilerplate docs (dedup's very target) all share a
    bucket.  *max_block* caps the per-reducer block via exact grid
    salting (:func:`_grid_salted_self_pairs`) — same output, hottest
    reducer divided by ceil(block/max_block).  The pair COUNT of a mega
    bucket is still quadratic; when the output itself is the problem,
    use :func:`lsh_star_pairs`.
    """
    band_arr = lsh_band_hashes(shingles(F.col(text_col), shingle_n),
                               num_hashes, bands)
    banded = widen(df).select(
        F.col(id_col),
        F.posexplode(band_arr).alias("band_idx", "band_hash"),
    )
    return _banded_pairs(banded, id_col, max_block)


def lsh_star_pairs(df: DataFrame, text_col: str = "text",
                   id_col: str = "doc_id", num_hashes: int = 8,
                   bands: int = 4, shingle_n: int = 3,
                   star_threshold: int = 64) -> DataFrame:
    """LSH candidate pairs with O(n) output for oversized buckets.

    Buckets at or under *star_threshold* emit full pairwise candidates
    (exactly as :func:`dedup_minhash_lsh`); bigger buckets emit only the
    STAR (min_id, member) spanning edges.  A 10M-doc boilerplate bucket
    contributes 10M-1 edges instead of 5*10^13 pairs, and
    :func:`connected_components` recovers the identical cluster — the
    spanning edges connect everything the clique would.  The trade is
    per-PAIR fidelity, not clustering fidelity: downstream pairwise
    verification (n-gram Jaccard) sees each big-bucket member compared
    against the canonical doc only.  This is the 100 TB default for
    dedup candidate generation.
    """
    band_arr = lsh_band_hashes(shingles(F.col(text_col), shingle_n),
                               num_hashes, bands)
    banded = widen(df).select(
        F.col(id_col),
        F.posexplode(band_arr).alias("band_idx", "band_hash"),
    )
    # groupBy (map-side partial agg), not a window: the size/min scan of
    # a mega bucket must not itself land the bucket on one reducer.
    stats = banded.groupBy("band_idx", "band_hash").agg(
        F.count("*").alias("_bsz"), F.min(id_col).alias("_bmin"))
    sized = banded.join(stats, ["band_idx", "band_hash"])
    small = sized.filter(F.col("_bsz") <= star_threshold)
    a = small.select(F.col(id_col).alias("id_a"), "band_idx", "band_hash")
    b = small.select(F.col(id_col).alias("id_b"), "band_idx", "band_hash")
    small_pairs = (a.join(b, ["band_idx", "band_hash"])
                   .filter(F.col("id_a") < F.col("id_b"))
                   .select("id_a", "id_b"))
    star_pairs = (sized.filter((F.col("_bsz") > star_threshold)
                               & (F.col(id_col) != F.col("_bmin")))
                  .select(F.col("_bmin").alias("id_a"),
                          F.col(id_col).alias("id_b")))
    return small_pairs.unionByName(star_pairs).distinct()


def _corpus_key_counts(exploded: DataFrame, key: str,
                       skew_safe: bool) -> DataFrame:
    """Annotate every exploded row with its key's CORPUS-WIDE count —
    the shared counting stage of the sub-document dedup family, with
    the single-pass/skew trade-off explicit (VERDICT r13 item 2 +
    the r14 review):

    * ``skew_safe=False`` (default): ``count(*) over (partition by
      key)`` — ONE pass over the exploded rows and one shuffle.
      WindowExec has no partial aggregation, so a pathological hot key
      (one boilerplate window repeated tens of millions of times
      corpus-wide) lands in a single task.  Right for corpora where
      the heaviest key fits a task's row budget — true of every
      fixture and most deduplicated crawls.
    * ``skew_safe=True``: map-side-partialed ``groupBy(key)`` (the hot
      key collapses to one partial per map task — skew-immune) joined
      back on the key; the join-side shuffle of exploded rows is the
      same volume as the window's but AQE's skew-join splitting
      applies to it.  Costs a second pass over the explode lineage —
      flip it when a single key's expected count exceeds ~a few
      million rows (boilerplate-heavy raw crawls).

    Both modes return identical rows (pinned in
    tests/test_dedup_units.py); downstream logic is mode-blind."""
    if not skew_safe:
        return exploded.withColumn(
            "_cnt", F.count("*").over(Window.partitionBy(key)))
    counts = exploded.groupBy(key).agg(F.count("*").alias("_cnt"))
    return exploded.join(counts, key)


def dedup_repeated_chunks(df: DataFrame, text_col: str = "text",
                          id_col: str = "doc_id", chunk_tokens: int = 16,
                          max_occurrences: int = 1,
                          skew_safe: bool = False) -> DataFrame:
    """Sub-document dedup: drop every fixed-width token chunk that
    occurs more than *max_occurrences* times ACROSS THE CORPUS and
    reassemble each document from its surviving chunks (the
    paragraph-dedup stage of CCNet/Dolma-style pipelines, on token
    windows since the fixtures have no paragraph breaks).

    Plan: tokenize once -> non-overlapping chunk windows -> explode ->
    corpus-wide counts via :func:`_corpus_key_counts` (single-pass
    count-over-window by default, map-side-partialed groupBy+join
    under ``skew_safe`` — see that docstring for the decision rule) ->
    filter -> re-assemble with an ordered collect per doc.  Documents
    whose chunks are all boilerplate drop out entirely.  At 100 TB
    partition chunk counts by a hash of the chunk, not the string, to
    keep shuffle keys narrow.
    """
    toks = analysis.tokens(F.col(text_col))
    nchunks = F.ceil(F.size("_toks") / F.lit(chunk_tokens)).cast("int")
    chunk_arr = F.transform(
        F.sequence(F.lit(0), F.col("_n") - 1),
        lambda i: F.concat_ws(
            " ", F.slice("_toks", i * chunk_tokens + 1, chunk_tokens)))
    exploded = (widen(df)
                .select(F.col(id_col), toks.alias("_toks"))
                .withColumn("_n", nchunks)
                .filter(F.col("_n") > 0)
                .select(id_col,
                        F.posexplode(chunk_arr).alias("pos", "chunk")))
    counted = _corpus_key_counts(exploded, "chunk", skew_safe)
    kept = counted.filter(F.col("_cnt") <= max_occurrences)
    reassembled = F.concat_ws(
        " ", F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "chunk"))),
            lambda x: x.chunk))
    return (kept.groupBy(id_col)
            .agg(F.count("*").alias("kept_chunks"),
                 reassembled.alias("clean_text")))


def _overlapping_window_hashes(df: DataFrame, text_col: str,
                               id_col: str, k: int):
    """The shared tokenize -> every-position k-token window hash stage
    of the unaligned-substring family: returns ``(base, wins)`` where
    base = (id, _toks, _n) for non-empty docs and wins = (id, wpos,
    whash) with one shared-48-bit hash per start position (docs
    shorter than k contribute one whole-text window).  One narrow
    transform + explode riding the scan.  The 48-bit hash key is
    UNIFORM over distinct windows, but repeated content repeats its
    hash — corpus-wide counting goes through
    :func:`_corpus_key_counts`, where the single-pass vs hot-key
    trade-off is explicit."""
    base = (widen(df)
            .select(F.col(id_col),
                    analysis.tokens(F.col(text_col)).alias("_toks"))
            .withColumn("_n", F.size("_toks"))
            .filter(F.col("_n") > 0))
    starts = F.sequence(F.lit(1),
                        F.greatest(F.col("_n") - F.lit(k - 1), F.lit(1)))
    warr = F.transform(
        starts,
        lambda p: F.struct(
            p.cast("int").alias("wpos"),
            analysis.token_hash(
                F.concat_ws(" ", F.slice(F.col("_toks"), p, F.lit(k))))
            .alias("whash")))
    wins = (base.select(F.col(id_col), F.explode(warr).alias("w"))
            .select(id_col, F.col("w.wpos").alias("wpos"),
                    F.col("w.whash").alias("whash")))
    return base, wins


def substring_novelty(df: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id",
                      window_tokens: int = 16,
                      skew_safe: bool = False) -> DataFrame:
    """Per-document NOVELTY score from the same overlapping-window
    machinery :func:`dedup_unaligned_substring` removes with: the
    fraction of a doc's k-token windows whose hash is unique in the
    corpus.  The quality-gate rendering of substring dedup — a
    curation pipeline scores first (keep novelty >= t, or weight
    sampling by it) and only destructive-rewrites when it must;
    novelty 0.0 means every passage appears elsewhere (a pure
    re-crawl/mirror/boilerplate doc), 1.0 means all content is
    corpus-unique.

    Plan: the shared window-hash stage, corpus-wide counts via
    :func:`_corpus_key_counts` (single-pass count-over-window by
    default — the old groupBy + join-back recomputed the
    tokenize+explode lineage twice, VERDICT r13 item 2; ``skew_safe``
    flips to the map-side-partialed two-pass form for
    boilerplate-heavy corpora) — then one per-doc aggregate.
    Returns ``(id_col, n_windows, dup_windows, novelty)``."""
    _, wins = _overlapping_window_hashes(df, text_col, id_col,
                                         window_tokens)
    flagged = _corpus_key_counts(wins, "whash", skew_safe)
    return (flagged.groupBy(id_col)
            .agg(F.count("*").alias("n_windows"),
                 F.sum(F.when(F.col("_cnt") > 1, 1).otherwise(0))
                 .alias("dup_windows"))
            .select(id_col, "n_windows", "dup_windows",
                    (F.round(F.lit(1.0) - F.col("dup_windows")
                             / F.col("n_windows"), 6) + F.lit(0.0))
                    .alias("novelty")))


def dedup_unaligned_substring(df: DataFrame, text_col: str = "text",
                              id_col: str = "doc_id",
                              window_tokens: int = 16,
                              max_occurrences: int = 1,
                              skew_safe: bool = False) -> DataFrame:
    """Unaligned repeated-substring dedup — the OVERLAPPING-window
    upgrade over :func:`dedup_repeated_chunks`, whose fixed
    non-overlapping chunk grid misses any duplicate passage shifted
    off its 16-token boundaries (shift a copied paragraph by ONE token
    and every chunk hash changes).  This is the Spark-shaped
    equivalent of the Lee et al. 2022 ("Deduplicating Training Data
    Makes Language Models Better") suffix-array result: hash EVERY
    k-token window, so a repeated run of >= k tokens matches at SOME
    window start regardless of alignment.

    Plan: tokenize once -> one narrow ``transform`` emits the window
    hash at every start position (Rabin-Karp economics: the hash here
    is the shared 48-bit md5 prefix of the joined window so DuckDB
    replays it exactly; a production deployment swaps in an O(1)-
    incremental rolling polynomial hash — same plan, cheaper map) ->
    corpus-wide counts via :func:`_corpus_key_counts` (single-pass
    count-over-window by default — the old groupBy + join-back
    recomputed the tokenize+explode lineage twice, VERDICT r13
    item 2; ``skew_safe`` flips to the map-side-partialed two-pass
    form when one boilerplate window dominates the corpus) ->
    every position covered by ANY over-threshold window is marked
    (explode of k positions per duplicate window only) -> uncovered
    tokens reassemble per doc.  Documents consisting entirely of
    repeated substrings drop out, exactly like the chunk-grid
    operator.  Documents shorter than *window_tokens* contribute one
    whole-text window (the :func:`shingles` short-doc rule).

    Returns ``(id_col, kept_tokens, clean_text)``."""
    k = window_tokens
    base, wins = _overlapping_window_hashes(df, text_col, id_col, k)
    counted = _corpus_key_counts(wins, "whash", skew_safe)
    covered = (counted
               .filter(F.col("_cnt") > max_occurrences)
               .select(id_col,
                       F.explode(F.sequence(
                           F.col("wpos"),
                           F.col("wpos") + F.lit(k - 1))).alias("pos"))
               .distinct())
    tokpos = (base.select(F.col(id_col),
                          F.posexplode("_toks").alias("_p0", "token"))
              .select(id_col, (F.col("_p0") + 1).alias("pos"), "token"))
    kept = tokpos.join(covered, [id_col, "pos"], "left_anti")
    reassembled = F.concat_ws(
        " ", F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "token"))),
            lambda x: x.token))
    return (kept.groupBy(id_col)
            .agg(F.count("*").alias("kept_tokens"),
                 reassembled.alias("clean_text")))


def minhash_estimate_pairs(df: DataFrame, text_col: str = "text",
                           id_col: str = "doc_id", num_hashes: int = 8,
                           bands: int = 4, shingle_n: int = 3,
                           max_block: int | None = None) -> DataFrame:
    """LSH candidate pairs scored with the MINHASH-SIGNATURE Jaccard
    estimate: est = fraction of matching signature components — the
    classic property E[match_i] = J(A,B).

    This is the cheap middle stage between candidate generation and
    exact verification: the signature is computed ONCE (num_hashes
    longs per doc), the band buckets derive from it, and scoring a
    pair costs num_hashes integer compares instead of re-shingling
    both documents the way exact n-gram Jaccard
    (:func:`ngram_jaccard_pairs`) must.  At 100 TB
    run estimate -> prune -> exact-verify survivors only.

    Join shape: the pair list (two narrow long columns) joins the
    signature table twice on its id — both joins are equi-joins on
    uniform ids; the signature table is corpus-sized but narrow
    (id + num_hashes longs).
    """
    # ONE md5 scan: the signature is materialized once (id + num_hashes
    # longs — narrow; at warehouse scale a persisted signature table)
    # and feeds the band derivation AND both join sides.  Routing
    # through dedup_minhash_lsh would re-shingle and re-hash the corpus
    # a second (and, with the two unmaterialized join references, a
    # third) time for an identical result.  The checkpoint is RELEASED
    # before returning (the result below is materialized first) — a
    # persist() here would register the corpus-sized signature table in
    # the session CacheManager, which holds SQL cache entries until an
    # explicit unpersist or session end (the ContextCleaner GC-reclaims
    # only raw RDD persists), so repeated calls would accumulate pinned
    # disk blocks.
    sigs = (widen(df).select(
        F.col(id_col),
        minhash_signature(shingles(F.col(text_col), shingle_n),
                          num_hashes).alias("sig"))
        .localCheckpoint(eager=True))
    banded = sigs.select(
        F.col(id_col),
        F.posexplode(band_hashes_of_sig(F.col("sig"), num_hashes,
                                        bands))
        .alias("band_idx", "band_hash"))
    pairs = _banded_pairs(banded, id_col, max_block)
    sa = sigs.select(F.col(id_col).alias("id_a"), F.col("sig").alias("sig_a"))
    sb = sigs.select(F.col(id_col).alias("id_b"), F.col("sig").alias("sig_b"))
    matches = F.aggregate(
        F.zip_with("sig_a", "sig_b",
                   lambda x, y: F.when(x == y, F.lit(1)).otherwise(F.lit(0))),
        F.lit(0), lambda acc, m: acc + m)
    # materialize the candidate-pair output (three narrow columns,
    # banding-bounded — the frame the exact-verify stage consumes
    # anyway), then release the corpus-sized signature checkpoint.
    # The caller may _cc_free the returned frame once consumed; until
    # then only output-sized blocks stay pinned, never the signatures.
    out = (pairs.join(sa, "id_a").join(sb, "id_b")
           .select("id_a", "id_b",
                   (F.round(matches.cast("double") / num_hashes, 6)
                    + F.lit(0.0)).alias("est_jaccard"))
           .localCheckpoint(eager=True))
    _cc_free(sigs)
    return out


def simhash(text: Column | str, bits: int = 16) -> Column:
    """SimHash over whitespace tokens: bit b of the fingerprint is the
    sign of sum over tokens of (+1 if bit b of hash48(token) else -1).

    Pure higher-order expression; *bits* kept small (16) so the whole
    fingerprint is one int and the oracle SQL stays readable.  Hamming
    neighborhoods at scale: index by rotating bit-slices.
    """
    toks = analysis.tokens(text)
    hashes = F.transform(toks, analysis.token_hash)
    # 2^b weights as a literal array (shiftleft/right need Python-int
    # amounts, so inside lambdas the bit test is arithmetic:
    # bit b of h is set iff h % 2^(b+1) >= 2^b).
    pows = F.array(*[F.lit(2 ** b).cast("long") for b in range(bits)])
    init = F.array_repeat(F.lit(0).cast("long"), bits)
    # ONE pass over the tokens: the accumulator is the array of per-bit
    # votes; the finish lambda folds the votes into the fingerprint int.
    # (A per-bit F.aggregate would re-hash every token `bits` times —
    # higher-order functions are interpreted, no subexpression reuse.)
    return F.aggregate(
        hashes, init,
        lambda acc, h: F.zip_with(
            acc, pows,
            lambda v, p: v + F.when(h % (p * 2) >= p, F.lit(1))
                              .otherwise(F.lit(-1))),
        lambda votes: F.aggregate(
            F.zip_with(
                votes, pows,
                lambda v, p: F.when(v > 0, p).otherwise(F.lit(0).cast("long"))),
            F.lit(0).cast("long"),
            lambda s, x: s + x))


def dedup_simhash(df: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id", bits: int = 16) -> DataFrame:
    """SimHash near-dup clusters: exact-fingerprint grouping (hamming
    distance 0).  Distance <= d at scale: d+1 bit-slice tables, union
    the candidate pairs."""
    return (
        widen(df).withColumn("simhash", simhash(F.col(text_col), bits))
        .groupBy("simhash")
        .agg(F.count("*").alias("cluster_size"), F.min(id_col).alias("min_id"))
        .filter(F.col("cluster_size") > 1)
    )


def simhash_blocks(bits: int, max_distance: int) -> list[tuple[int, int]]:
    """(shift, mask) per block: *bits* split into max_distance+1 nearly
    equal contiguous slices.  Pigeonhole: two fingerprints within
    hamming distance d differ in at most d blocks, so they MATCH
    exactly on at least one of the d+1 — the blocking key that makes
    hamming<=d dedup an equi-join (Manku et al., WWW'07)."""
    nblocks = max_distance + 1
    base, extra = divmod(bits, nblocks)
    out, shift = [], 0
    for i in range(nblocks):
        width = base + (1 if i < extra else 0)
        out.append((shift, (1 << width) - 1))
        shift += width
    return out


def simhash_hamming_pairs(df: DataFrame, text_col: str = "text",
                          id_col: str = "doc_id", bits: int = 16,
                          max_distance: int = 2) -> DataFrame:
    """SimHash near-dup pairs at hamming distance <= *max_distance* —
    the generalization past :func:`dedup_simhash`'s exact-fingerprint
    (distance 0) grouping.

    Bit-slice blocking: explode each fingerprint into its d+1 block
    values, self-join per (block_idx, block_val) — candidates are only
    same-slice rows, never all pairs — then verify the true hamming
    distance with one xor+popcount per candidate.  Shuffle keys are
    fingerprint slices (uniform for distinct texts); identical-text
    skew is bounded by the same grid-salting pattern as LSH if needed.
    Returns (id_a, id_b, hamming).

    Slice width = bits/(d+1) sets the blocking selectivity: a slice
    takes 2^width values, so expected candidates scale as
    (d+1) * n^2 / 2^width.  The 16-bit default (oracle-readable) is
    coarse — at 100 TB use 64-bit fingerprints (16-bit slices at d=3),
    which also shrinks true-collision clusters.
    """
    fps = (widen(df)
           .select(F.col(id_col),
                   simhash(F.col(text_col), bits).alias("fp")))
    return hamming_pairs(fps, id_col=id_col, bits=bits,
                         max_distance=max_distance)


def hamming_pairs(fps: DataFrame, id_col: str = "doc_id",
                  fp_col: str = "fp", bits: int = 16,
                  max_distance: int = 2) -> DataFrame:
    """All pairs within hamming distance *max_distance* of each other's
    *fp_col* fingerprint, via bit-slice blocking (Manku et al.,
    WWW'07): explode each fingerprint into its d+1 block values,
    equi-join per (block_idx, block_val) — pigeonhole guarantees every
    qualifying pair shares at least one block, so the blocked result
    EQUALS the all-pairs result — then verify with one xor+popcount
    per candidate.  Fingerprint-agnostic: text SimHash
    (:func:`simhash_hamming_pairs`) and the multimodal perceptual hash
    (multimodal.perceptual_simhash) both pair through here.  Returns
    (id_a, id_b, hamming)."""
    block_vals = F.array(*[
        F.shiftright(F.col("fp"), shift).bitwiseAND(F.lit(mask))
        for shift, mask in simhash_blocks(bits, max_distance)])
    banded = (fps.select(F.col(id_col), F.col(fp_col).alias("fp"))
              .select(id_col, "fp",
                      F.posexplode(block_vals)
                      .alias("block_idx", "block_val")))
    a = banded.select(F.col(id_col).alias("id_a"), F.col("fp").alias("fp_a"),
                      "block_idx", "block_val")
    b = banded.select(F.col(id_col).alias("id_b"), F.col("fp").alias("fp_b"),
                      "block_idx", "block_val")
    ham = F.bit_count(F.col("fp_a").bitwiseXOR(F.col("fp_b")))
    return (
        a.join(b, ["block_idx", "block_val"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", ham.alias("hamming"))
        .filter(F.col("hamming") <= max_distance)
        .distinct()
    )


def _blocked_shingle_intersections(df: DataFrame, block_col: str,
                                   text_col: str, id_col: str,
                                   shingle_n: int) -> DataFrame:
    """The shared candidate-pair stage of the exact shingle-overlap
    verifiers (:func:`ngram_jaccard_pairs`, :func:`containment_pairs`):
    explode distinct shingles -> per-doc set sizes -> self-join on
    (block, shingle) -> |intersection| per pair -> sizes joined back.
    Returns ``(block, id_a, id_b, inter_size, size_a, size_b)``; the
    callers differ only in the score expression and threshold.

    The blocking key bounds the pair space; at 100 TB the block is an
    LSH bucket from :func:`dedup_minhash_lsh` and this stage is the
    verification join — an equi-join on (block, shingle) that AQE can
    size, never an all-pairs product."""
    exploded = (
        widen(df).select(F.col(id_col), F.col(block_col).alias("block"),
                         F.explode(F.array_distinct(
                             shingles(F.col(text_col), shingle_n)))
                         .alias("shingle"))
    )
    sizes = exploded.groupBy(id_col, "block").agg(
        F.count("*").alias("set_size"))
    a = exploded.select(F.col(id_col).alias("id_a"), "block", "shingle")
    b = exploded.select(F.col(id_col).alias("id_b"), "block", "shingle")
    inter = (
        a.join(b, ["block", "shingle"])
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("block", "id_a", "id_b")
        .agg(F.count("*").alias("inter_size"))
    )
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("block"),
                      F.col("set_size").alias("size_a"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("block"),
                      F.col("set_size").alias("size_b"))
    return inter.join(sa, ["id_a", "block"]).join(sb, ["id_b", "block"])


def _pair_jaccard() -> Column:
    """Inclusion-exclusion Jaccard over the intersection frame's
    (inter_size, size_a, size_b), on the 6dp output grid."""
    return F.round(
        F.col("inter_size").cast("double")
        / (F.col("size_a") + F.col("size_b") - F.col("inter_size")),
        6) + F.lit(0.0)


def ngram_jaccard_pairs(df: DataFrame, block_col: str, text_col: str = "text",
                        id_col: str = "doc_id", shingle_n: int = 2,
                        threshold: float = 0.5) -> DataFrame:
    """Exact n-gram Jaccard similarity >= *threshold* for pairs sharing
    a blocking key (the verification stage after LSH candidate
    generation); plan shape in
    :func:`_blocked_shingle_intersections`."""
    return (
        _blocked_shingle_intersections(df, block_col, text_col, id_col,
                                       shingle_n)
        .withColumn("jaccard", _pair_jaccard())
        .filter(F.col("jaccard") >= threshold)
        .select("block", "id_a", "id_b", "jaccard")
    )


def containment_pairs(df: DataFrame, block_col: str,
                      text_col: str = "text", id_col: str = "doc_id",
                      shingle_n: int = 2,
                      threshold: float = 0.8) -> DataFrame:
    """Shingle CONTAINMENT >= threshold for pairs sharing a blocking
    key: containment = |A n B| / min(|A|, |B|) — the asymmetric-dup
    catcher Jaccard structurally misses.  A short document fully
    quoted inside a long one has Jaccard |A|/|B| (arbitrarily small)
    but containment 1.0; excerpt/quote/boilerplate-inclusion dup is
    the common crawl case (Broder's containment measure, the
    CCNet/Gopher subset-dup gate).  Same plan economics as
    :func:`ngram_jaccard_pairs` (the shared
    :func:`_blocked_shingle_intersections` stage — one shingle-keyed
    self-join bounded by the block), both scores reported so the gap
    is observable."""
    containment = F.round(
        F.col("inter_size").cast("double")
        / F.least(F.col("size_a"), F.col("size_b")), 6) + F.lit(0.0)
    return (
        _blocked_shingle_intersections(df, block_col, text_col, id_col,
                                       shingle_n)
        .withColumn("containment", containment)
        .withColumn("jaccard", _pair_jaccard())
        .filter(F.col("containment") >= threshold)
        .select("block", "id_a", "id_b", "containment", "jaccard")
    )


def edit_distance_pairs(df: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id", prefix_len: int = 12,
                        cmp_len: int = 64, max_dist: int = 2,
                        max_block: int = 64) -> DataFrame:
    """Fuzzy near-dup pairs by bounded edit distance within prefix
    blocks — the classic record-linkage form of fuzzy dedup.

    Block = the lowercased first *prefix_len* characters: an edit past
    the prefix never moves a document out of its block (edits inside
    the prefix are what the MinHash/SimHash families catch, so the two
    stages complement).  Comparison = ``levenshtein`` over the first
    *cmp_len* characters — a JVM codegen builtin, cost bounded at
    O(cmp_len^2) per candidate regardless of document length.  The
    pair space is bounded by the block, and a hot block (boilerplate
    openings at corpus scale) is grid-salted so no reducer ever holds
    more than ~*max_block* rows of one block; the emitted pair set is
    EXACTLY the plain block join's (each pair meets on one salt key).
    """
    keyed = widen(df).select(
        F.col(id_col),
        F.lower(F.substring(F.col(text_col), 1, prefix_len))
        .alias("block"),
        F.substring(F.col(text_col), 1, cmp_len).alias("_cmp"))
    # the shared grid-salted self-join (r14 review: this used to be an
    # inline near-copy of the helper) carrying the comparison prefix
    # as pair payload; keyed has one row per id, so no distinct needed
    pairs = _grid_salted_self_pairs(keyed, ["block"], id_col, max_block,
                                    payload_cols=("_cmp",),
                                    dedup_pairs=False)
    return (pairs
            .withColumn("dist",
                        F.levenshtein("_cmp_a", "_cmp_b").cast("long"))
            .filter(F.col("dist") <= max_dist)
            .select("id_a", "id_b", "dist"))


def connected_components(pairs: DataFrame, id_a: str = "id_a",
                         id_b: str = "id_b",
                         max_iter: int = 50) -> DataFrame:
    """Transitive closure of near-dup pairs -> (id, component) with
    component = the smallest id reachable — the clustering stage that
    turns candidate PAIRS into dedup DECISIONS (keep one canonical doc
    per component).

    Iterative min-label propagation: every node starts labelled with its
    own id; each round a node takes the min of its label and its
    neighbors' labels; stop at fixpoint.  Each round is one shuffle
    (join on src + groupBy), lineage is cut per round with
    ``localCheckpoint`` so the plan doesn't grow with iterations, and
    the loop exits early via a cheap changed-row count.

    Rounds needed = graph diameter.  Near-dup graphs are shallow (dup
    clusters are cliques or short chains), so this converges in a
    handful of rounds; for adversarially long chains at 100 TB switch
    to the large-star/small-star contraction (Kiveris et al.,
    "Connected Components in MapReduce and Beyond", SoCC'14), which
    converges in O(log^2 n) rounds with the same per-round plan shape.
    """
    _free = _cc_free  # shared release helper (defined below)

    fwd = pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
    rev = pairs.select(F.col(id_b).alias("src"), F.col(id_a).alias("dst"))
    edges = fwd.unionByName(rev).distinct().localCheckpoint(eager=True)

    prev_ckpt = (edges.select(F.col("src").alias("id")).distinct()
                 .withColumn("comp", F.col("id"))
                 .localCheckpoint(eager=True))
    labels = prev_ckpt

    for _ in range(max_iter):
        nbr_min = (
            edges.join(labels, edges["src"] == labels["id"])
            .groupBy("dst").agg(F.min("comp").alias("nbr_comp"))
        )
        updated = (
            labels.join(nbr_min, labels["id"] == nbr_min["dst"], "left")
            .select(
                "id",
                F.least(F.col("comp"),
                        F.coalesce(F.col("nbr_comp"), F.col("comp")))
                .alias("comp"),
                (F.col("nbr_comp") < F.col("comp")).alias("_changed"),
            )
        ).localCheckpoint(eager=True)
        changed = updated.filter(F.col("_changed")).limit(1).count()
        _free(prev_ckpt)
        prev_ckpt = updated
        labels = updated.drop("_changed")
        if changed == 0:
            break
    _free(edges)
    return labels.select("id", F.col("comp").alias("component"))


_CC_FREE_DISABLED = False  # flipped once by a failed capability probe


def _cc_free(ckpt_df: DataFrame) -> bool:
    """Release a superseded localCheckpoint's pinned blocks; returns
    True when blocks were released, False on the documented no-op
    fallback (so tests and callers can SEE which path ran —
    VERDICT r13 item 8).

    localCheckpoint pins blocks in the block manager for the session's
    lifetime; superseded iterations must release them or a long-lived
    driver accumulates one pinned RDD per round per call.  The blocks
    belong to the LogicalRDD's underlying RDD — unpersisting
    ``queryExecution().toRdd()`` (a fresh derived RDD) would be a
    silent no-op — so this reaches through the PRIVATE
    ``_jdf.queryExecution().analyzed().rdd()`` chain, which is
    version-fragile by nature.  Guard rails: (a) a pyspark
    major-version gate (3.x/4.x, where the chain is known-good);
    (b) a one-shot capability probe — if the chain itself is missing
    (a future Spark renaming the private API) the helper flips
    ``_CC_FREE_DISABLED`` and every later call is an explicit no-op;
    (c) a per-call fallback when the chain exists but THIS plan is
    not a bare LogicalRDD (a derived frame was passed).  The fallback
    costs memory, not correctness: blocks stay pinned until session
    end, exactly the behavior without the helper."""
    global _CC_FREE_DISABLED
    if _CC_FREE_DISABLED:
        return False
    try:
        import pyspark
        major = int(str(pyspark.__version__).split(".")[0])
    except (ImportError, ValueError):
        major = -1
    if major not in (3, 4):
        _CC_FREE_DISABLED = True
        return False
    try:
        plan = ckpt_df._jdf.queryExecution().analyzed()
    except Exception as exc:
        # Latch off ONLY on evidence the private chain itself is gone
        # (AttributeError on _jdf/queryExecution, or py4j's
        # "Method ... does not exist" for a RENAMED JVM method).  A
        # bare "does not exist" is NOT enough: py4j's stale-object
        # errors ("Target Object ID does not exist for this gateway",
        # "... does not exist in the JVM" after a session restart)
        # carry the same words but are transient — latching on them
        # would permanently disable the helper in the NEXT, healthy
        # session and silently reintroduce the unbounded pinned-block
        # leak.  Anything transient: return False for THIS call only.
        if (isinstance(exc, AttributeError)
                or ("Method " in str(exc) and "does not exist" in str(exc))):
            _CC_FREE_DISABLED = True
        return False
    try:
        plan.rdd().unpersist(False)
        return True
    except Exception:
        return False  # plan wasn't a bare LogicalRDD: per-call no-op


def connected_components_star(pairs: DataFrame, id_a: str = "id_a",
                              id_b: str = "id_b", max_iter: int = 50,
                              stats: dict | None = None) -> DataFrame:
    """Alternating large-star/small-star connected components — the
    O(log^2 n)-round contraction of Kiveris et al., "Connected
    Components in MapReduce and Beyond" (SoCC'14).  Same contract as
    :func:`connected_components` (-> (id, component=min reachable id))
    but the round count is bounded by log^2 of the component size, not
    its DIAMETER, so adversarial chain-shaped dup graphs (pairwise
    near-dups along a drifting document) converge in ~10 rounds where
    min-label propagation needs thousands.

    large-star(u): every neighbor v > u re-points to min(N(u) + {u});
    small-star(u): over parent edges (u > v), every v and u re-point to
    the min.  Both are one groupBy-min + one equi-join — two shuffles
    per half-round, lineage cut per round with released localCheckpoints.
    Convergence = edge multiset fixpoint, detected by (count, xor-ish
    checksum) — collision odds ~2^-64 per round; max_iter backstops.
    At fixpoint edges form stars rooted at each component's min id.
    """
    edges = (pairs.select(F.col(id_a).cast("long").alias("u"),
                          F.col(id_b).cast("long").alias("v"))
             .filter(F.col("u") != F.col("v"))
             .distinct().localCheckpoint(eager=True))
    nodes = (edges.select(F.col("u").alias("id"))
             .unionByName(edges.select(F.col("v").alias("id")))
             .distinct().localCheckpoint(eager=True))

    def large_star(e: DataFrame) -> DataFrame:
        bi = e.unionByName(e.select(F.col("v").alias("u"),
                                    F.col("u").alias("v")))
        mins = bi.groupBy("u").agg(F.least(F.min("v"), F.first("u"))
                                   .alias("m"))
        return (bi.filter(F.col("v") > F.col("u"))
                .join(mins, "u")
                .select(F.col("v").alias("u"), F.col("m").alias("v"))
                .filter(F.col("u") != F.col("v")).distinct())

    def small_star(e: DataFrame) -> DataFrame:
        dirn = e.select(F.greatest("u", "v").alias("u"),
                        F.least("u", "v").alias("v"))
        mins = dirn.groupBy("u").agg(F.min("v").alias("m"))
        nbrs = (dirn.join(mins, "u")
                .select(F.col("v").alias("u"), F.col("m").alias("v")))
        selfs = mins.select(F.col("u"), F.col("m").alias("v"))
        return (nbrs.unionByName(selfs)
                .filter(F.col("u") != F.col("v")).distinct())

    def checksum(e: DataFrame) -> tuple:
        row = e.agg(F.count("*"), F.sum(F.hash("u", "v"))).collect()[0]
        return (row[0], row[1])

    prev_ckpt = edges
    prev_sum = checksum(edges)
    rounds = 0
    for _ in range(max_iter):
        # lazy checkpoint: the checksum aggregate is the action that
        # materializes it — one job per round instead of two
        stepped = small_star(large_star(prev_ckpt)) \
            .localCheckpoint(eager=False)
        cur_sum = checksum(stepped)
        _cc_free(prev_ckpt)
        prev_ckpt = stepped
        rounds += 1
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    if stats is not None:
        stats["rounds"] = rounds
    # fixpoint edges are (member, component-min) stars; roots map to
    # themselves via the left join's coalesce
    labels = (nodes.join(prev_ckpt.withColumnRenamed("u", "id"),
                         "id", "left")
              .select("id", F.coalesce(F.col("v"), F.col("id"))
                      .alias("component")))
    out = labels.localCheckpoint(eager=True)
    _cc_free(prev_ckpt)
    _cc_free(nodes)
    return out


def embedding_near_dup(embeddings: DataFrame, block_col: str = "label",
                       threshold: float = 0.95,
                       id_col: str = "vec_id",
                       vec_col: str = "embedding") -> DataFrame:
    """Embedding-cosine near-dup pairs within a blocking key.

    The block is the quadratic guard (at scale: an LSH/IVF bucket over
    the vectors themselves).  Cosine is the codegen'd higher-order
    expression from functions.vector.
    """
    # norms computed once per ROW before the join — per pair only the
    # dot product remains, cutting the pairwise O(d) work to a third
    a = embeddings.select(F.col(id_col).alias("id_a"),
                          F.col(vec_col).alias("vec_a"),
                          V.norm(vec_col).alias("norm_a"),
                          F.col(block_col).alias("block"))
    b = embeddings.select(F.col(id_col).alias("id_b"),
                          F.col(vec_col).alias("vec_b"),
                          V.norm(vec_col).alias("norm_b"),
                          F.col(block_col).alias("block"))
    nprod = F.col("norm_a") * F.col("norm_b")
    sim = F.when(nprod == 0.0, F.lit(0.0)).otherwise(
        V.dot("vec_a", "vec_b") / nprod)
    return (
        a.join(b, "block")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("sim", F.round(sim, 6) + F.lit(0.0))
        .filter(F.col("sim") >= threshold)
        .select("block", "id_a", "id_b", "sim")
    )


def semdedup(embeddings: DataFrame, centroids: DataFrame,
             threshold: float = 0.99, id_col: str = "vec_id",
             vec_col: str = "embedding") -> DataFrame:
    """SemDeDup (Abbas et al., 2023): semantic dedup by clustering the
    embedding space and dropping, within each cluster, every vector
    whose cosine to a LOWER-id cluster-mate clears *threshold* — the
    keep-first canonical rule, so exactly one representative of each
    within-cell near-dup group survives.

    The cells double as the quadratic guard: pairwise cosine runs only
    inside a cell (the paper's recipe — k-means partitions the space so
    cross-cell pairs are far by construction).  Output is EVERY input
    row with its cell and a ``keep`` verdict, so the caller can filter,
    audit drop rates per cell, or join the verdict back to documents.

    Scale: assignment is the broadcast nested-loop from ivf.assign_cells
    (corpus never shuffles for it); the pair join is an equi-join on
    cell with norms hoisted per row; at 100 TB raise nlist so cells stay
    bounded (cell size ~ corpus/nlist) — hot cells get the same grid-
    salt treatment as sim_join_ivf.  One shuffle on cell, one broadcast
    anti-join of the (small) dropped-id set back onto the assignment.
    """
    from . import ivf

    assigned = ivf.assign_cells(embeddings, centroids, id_col=id_col,
                                vec_col=vec_col)
    a = assigned.select(F.col(id_col).alias("_ida"),
                        F.col(vec_col).alias("_va"),
                        V.norm(vec_col).alias("_na"), "cell")
    b = assigned.select(F.col(id_col).alias("_idb"),
                        F.col(vec_col).alias("_vb"),
                        V.norm(vec_col).alias("_nb"), "cell")
    nprod = F.col("_na") * F.col("_nb")
    sim = F.when(nprod == 0.0, F.lit(0.0)).otherwise(
        V.dot("_va", "_vb") / nprod)
    dropped = (a.join(b, "cell")
               .filter(F.col("_ida") < F.col("_idb"))
               .filter((F.round(sim, 6) + F.lit(0.0)) >= threshold)
               .select(F.col("_idb").alias(id_col))
               .distinct())
    return (assigned
            .join(dropped.withColumn("_drop", F.lit(1)), id_col, "left")
            .select(id_col, "cell",
                    F.col("_drop").isNull().alias("keep")))
