"""Projection / filter / predicate operators (SURVEY 2.B).

Each is a thin declarative predicate so Catalyst can push it into the
Parquet scan (row-group min/max skipping for B1, dictionary filtering
for B3) — the reference hand-writes the same predicates into SQL strings
(citations per function).
"""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def since_ts(df: DataFrame, watermark: datetime | str,
             ts_col: str = "ts", inclusive: bool = False) -> DataFrame:
    """B1 ``filter_since_ts``: the incremental watermark predicate
    ``ts > ?`` (reference: src/core/database/processor.py:349-353,
    :428-437).  Pushed to the scan: only row groups whose max(ts)
    exceeds the watermark are read.

    When the frame carries a raw ``_ts_nanos`` column (the events
    reader's nanos workaround), the converted ``ts`` is an expression
    Parquet can't push — so a COARSE raw-domain twin is added: any row
    with ts > wm has nanos > wm-in-nanos, so the twin never drops a
    qualifying row, but it reaches PushedFilters and prunes row groups.
    The exact predicate still applies after conversion.

    *inclusive* (``ts >= ?``) is for capped incremental batches: when a
    size cap truncates a batch mid-timestamp, rows sharing the boundary
    instant that fell past the cap would be skipped forever by a strict
    predicate.  Reprocessing the boundary instant is safe because the
    upsert sink is last-writer-wins idempotent on the key.
    """
    exact = (F.col(ts_col) >= F.lit(watermark) if inclusive
             else F.col(ts_col) > F.lit(watermark))
    if "_ts_nanos" in df.columns and isinstance(watermark, datetime):
        # derive the raw-domain bound from the SAME timestamp literal
        # the exact predicate binds — a naive datetime is interpreted
        # by PySpark's literal conversion (driver OS timezone), and a
        # Python-side utc conversion here would disagree with it on any
        # non-UTC driver, silently dropping the rows in the offset
        # window.  unix_micros(lit)*1000 constant-folds to a plain long
        # literal, so the twin still reaches PushedFilters (pinned in
        # tests/test_plan_shapes.py).
        wm_nanos = F.unix_micros(F.lit(watermark)) * F.lit(1000)
        coarse = (F.col("_ts_nanos") >= wm_nanos if inclusive
                  else F.col("_ts_nanos") > wm_nanos)
        return df.filter(coarse & exact)
    return df.filter(exact)


def json_probe(df: DataFrame, col: str, *needles: str) -> DataFrame:
    """B2 ``filter_like_json_probe``: cheap substring pre-filter before
    the expensive JSON parse (reference: src/core/database/
    user_mapper.py:95-100 ``c LIKE '%\"uid\":%' AND c LIKE '%\"n\":%'``).
    Kept explicitly ahead of ``from_json`` in every pipeline here."""
    cond = F.lit(True)
    for needle in needles:
        cond = cond & F.col(col).contains(needle)
    return df.filter(cond)


def in_list(df: DataFrame, col: str, values: list) -> DataFrame:
    """B3 ``filter_in_list`` (reference: user_mapper.py:99,
    processor.py:213-215 type-code membership)."""
    return df.filter(F.col(col).isin(values))


def not_null_distinct(df: DataFrame, col: str) -> DataFrame:
    """B4 ``filter_not_null_distinct`` (reference: user_mapper.py:180,
    :212 ``SELECT DISTINCT u ... WHERE u IS NOT NULL``)."""
    return df.filter(F.col(col).isNotNull()).select(col).distinct()


def nonempty_text(df: DataFrame, col: str) -> DataFrame:
    """B5 ``filter_nonempty_text``: drop rows whose cleaned text is
    empty (reference: processor.py:449-451)."""
    return df.filter(F.length(F.trim(F.col(col))) > 0)


def dynamic_conjunction(df: DataFrame, **equals) -> DataFrame:
    """B6 ``filter_dynamic_conj``: optional equality predicates chained
    conjunctively — the reference builds this WHERE clause string by
    hand (reference: src/core/embeddings/processor.py:472-486).  None
    values are skipped, mirroring the optional-parameter behavior."""
    for key, value in equals.items():
        if value is not None:
            df = df.filter(F.col(key) == F.lit(value))
    return df


def sim_threshold(df: DataFrame, threshold: float,
                  sim_col: str = "sim") -> DataFrame:
    """B7 ``filter_sim_threshold`` (reference: embeddings/processor.py:
    508; default threshold 0.3 at server.py:206).  Thin delegate to
    the registry's serving implementation
    (:func:`..operators.similarity.threshold_filter`) so the predicate
    exists ONCE (r14 review)."""
    from .similarity import threshold_filter

    return threshold_filter(df, threshold, sim_col=sim_col)
