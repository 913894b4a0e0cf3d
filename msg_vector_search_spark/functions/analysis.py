"""Text-analysis functions for large-scale training-data pipelines:
language id, quality scoring, token counting, document fingerprinting.

Not present in the reference (its corpus is chat messages, already
language-known) — this is the extension surface a 100 TB document
pipeline needs.  Everything is a pure Column expression over built-in
functions, so the whole family runs inside one codegen'd scan stage.

Cross-dialect determinism: token hashing uses the first 12 hex chars of
md5 (48 bits), identical in Spark (``conv(substring(md5(x),1,12),16,10)``)
and DuckDB (``('0x'||substr(md5(x),1,12))::BIGINT``), so every operator
here is DuckDB-oracle checkable.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny English stopword list — deterministic, mirrored verbatim in the
# oracle SQL.  A real deployment swaps in a broadcast dictionary.
EN_STOPWORDS = ("the", "a", "an", "and", "is", "to", "of", "in", "it",
                "you", "that", "for", "on", "with", "as")

# BPE-ish pre-tokenizer: letter runs | digit runs | single non-space symbol
RE_BPE_TOKEN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"
RE_PUNCT = r"[^.,!?;:]"


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def bind_once(col: Column, fn) -> Column:
    """Evaluate *col* once and pass it to *fn* as a bound lambda
    variable.

    Higher-order-function lambdas re-evaluate every captured
    *expression* on each reference (they're interpreted, no
    subexpression elimination), but lambda *variables* are computed
    values.  ``transform(array(col), fn)[1]`` binds col exactly once —
    the idiom that turns O(n^2) shingle/ngram builders back into O(n).
    """
    return F.element_at(F.transform(F.array(col), fn), 1)


def tokens(text: Column | str) -> Column:
    """Whitespace tokenization of lowercased text -> array<string>."""
    return F.split(F.trim(F.lower(_c(text))), r"\s+")


def token_hash(tok: Column) -> Column:
    """48-bit md5-prefix hash of a token — the shared Spark/DuckDB
    deterministic hash primitive used by MinHash/SimHash/fingerprints."""
    return F.conv(F.substring(F.md5(tok), 1, 12), 16, 10).cast("long")


def duck_token_hash(expr: str) -> str:
    """DuckDB rendering of :func:`token_hash` (same 48 bits)."""
    return f"(('0x' || substr(md5({expr}), 1, 12))::BIGINT)"


def whitespace_token_count(text: Column | str) -> Column:
    """Token count by whitespace split (empty text counts 0)."""
    t = F.trim(_c(text))
    return F.when(F.length(t) == 0, F.lit(0)).otherwise(
        F.size(F.split(t, r"\s+")))


def bpe_token_count(text: Column | str) -> Column:
    """BPE-ish token count: letter runs, digit runs, and symbols counted
    separately (a cheap proxy for real BPE vocab growth)."""
    return F.size(F.regexp_extract_all(_c(text), F.lit(RE_BPE_TOKEN), 0))


def stopword_ratio(text: Column | str) -> Column:
    """Fraction of whitespace tokens that are common-English stopwords."""
    toks = tokens(text)
    stop = F.size(F.filter(toks, lambda t: t.isin(*EN_STOPWORDS)))
    return F.when(F.size(toks) == 0, F.lit(0.0)).otherwise(
        stop.cast("double") / F.size(toks))


def punct_ratio(text: Column | str) -> Column:
    """Fraction of characters that are sentence punctuation."""
    c = _c(text)
    puncts = F.length(F.regexp_replace(c, RE_PUNCT, ""))
    return F.when(F.length(c) == 0, F.lit(0.0)).otherwise(
        puncts.cast("double") / F.length(c))


def lang_id(text: Column | str, en_threshold: float = 0.08) -> Column:
    """Heuristic language id: stopword density over whitespace tokens.

    'en' when >= *en_threshold* of tokens are English stopwords, else
    'und' (undetermined).  The n-gram-profile generalization is the same
    plan shape: explode n-grams -> broadcast-join a profile dim ->
    argmax per doc.
    """
    return F.when(stopword_ratio(text) >= en_threshold, F.lit("en")).otherwise(
        F.lit("und"))


def quality_score(text: Column | str) -> Column:
    """Composite [0,1] quality score: length band + stopword presence
    - punctuation excess.  Deterministic arithmetic over the ratios
    above; weights are arbitrary but fixed."""
    c = _c(text)
    len_score = F.least(F.length(c).cast("double") / F.lit(400.0), F.lit(1.0))
    stop_score = F.least(stopword_ratio(c) * 5.0, F.lit(1.0))
    punct_penalty = F.least(punct_ratio(c) * 5.0, F.lit(1.0))
    return F.round(
        0.5 * len_score + 0.5 * stop_score - 0.25 * punct_penalty, 6)


def fingerprint_md5(text: Column | str) -> Column:
    """Exact-dup fingerprint: md5 of whitespace-normalized lowercase text."""
    norm = F.concat_ws(" ", tokens(text))
    return F.md5(norm)


def token_hash32(tok: Column) -> Column:
    """32-bit md5-prefix hash (first 8 hex chars) — used where hashes are
    SUMMED so the running total stays far from int64 overflow."""
    return F.conv(F.substring(F.md5(tok), 1, 8), 16, 10).cast("long")


def duck_token_hash32(expr: str) -> str:
    return f"(('0x' || substr(md5({expr}), 1, 8))::BIGINT)"


def fingerprint_rolling(text: Column | str) -> Column:
    """Positional rolling hash: sum over tokens of (position+1) *
    hash32(token).  Order-sensitive (unlike a bag-of-words hash) yet
    expressible as one higher-order aggregate — and in plain SQL for the
    oracle.  With 32-bit token hashes the sum stays under int64 up to
    ~65k tokens per document; longer docs would bucket by segment."""
    toks = tokens(text)
    idx = F.sequence(F.lit(1), F.size(toks))
    weighted = F.zip_with(toks, idx, lambda t, i: token_hash32(t) * i.cast("long"))
    return F.aggregate(weighted, F.lit(0).cast("long"), lambda acc, x: acc + x)


# ---------------------------------------------------------------------------
# PII scrubbing and sampling (training-data pipeline extension surface)
# ---------------------------------------------------------------------------

# Deliberately simple ASCII regexes, written once and mirrored verbatim
# in the oracle SQL (Spark replaces globally by default; DuckDB needs
# the 'g' flag — see duck_pii_scrub).
RE_PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
RE_PII_LONG_DIGITS = r"[0-9]{7,}"
RE_PII_URL = r"https?://[^\s]+"
PII_TOKEN = "<PII>"


def pii_scrub(text: Column | str) -> Column:
    """Redact emails, long digit runs (phone/account numbers), and URLs
    with a fixed placeholder.  Order matters: emails first (their local
    part may contain digit runs), then URLs, then bare digit runs —
    kept identical in the oracle."""
    t = _c(text)
    t = F.regexp_replace(t, RE_PII_EMAIL, PII_TOKEN)
    t = F.regexp_replace(t, RE_PII_URL, PII_TOKEN)
    t = F.regexp_replace(t, RE_PII_LONG_DIGITS, PII_TOKEN)
    return t


def duck_pii_scrub(expr: str) -> str:
    """DuckDB twin of :func:`pii_scrub` (same regexes, same order)."""
    out = f"regexp_replace({expr}, '{RE_PII_EMAIL}', '{PII_TOKEN}', 'g')"
    out = f"regexp_replace({out}, '{RE_PII_URL}', '{PII_TOKEN}', 'g')"
    return f"regexp_replace({out}, '{RE_PII_LONG_DIGITS}', '{PII_TOKEN}', 'g')"


def stratified_keep(id_col: Column | str, rate_pct: Column) -> Column:
    """Deterministic stratified-sampling predicate: keep iff
    hash48(id) % 100 < rate_pct.  Reproducible across runs/retries
    (unlike rand()-based sampling) and a NARROW filter — no shuffle, and
    at 100 TB the filter rides the scan, so a 10% stratum reads 10% of
    the rows out of the scan stage."""
    bucket = token_hash(_c(id_col).cast("string")) % 100
    return bucket < rate_pct
