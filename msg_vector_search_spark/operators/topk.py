"""Sorts / limits / top-k beyond the flagship (SURVEY 2.F).

F1 lives in operators.similarity; these are the remaining order/limit
shapes.  The reference paginates with ``LIMIT ? OFFSET ?`` loops
(processor.py:423-437) — an anti-pattern Spark replaces with partition
parallelism; the row_number pagination here exists for API parity when
a caller genuinely demands a page.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def page_by_ts(df: DataFrame, ts_col: str, page: int, page_size: int,
               tiebreak: str) -> DataFrame:
    """F2 ``sort_ts_pagination``: deterministic page *page* (1-based) of
    the time-ordered scan (reference: processor.py:428-437).

    A naive global ``row_number`` moves the WHOLE table to one
    partition.  Instead: ordered ``limit(page*size)`` plans
    TakeOrderedAndProject (per-partition heaps, driver merge of
    page*size rows), and the global window then numbers only that
    bounded prefix.  Pagination stays an anti-pattern for deep pages —
    the ingest pipeline reads partition-parallel instead."""
    lo, hi = (page - 1) * page_size, page * page_size
    prefix = df.orderBy(F.col(ts_col), F.col(tiebreak)).limit(hi)
    w = Window.orderBy(F.col(ts_col), F.col(tiebreak))
    return (prefix.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") > lo))


def keyset_page(df: DataFrame, ts_col: str, after_ts, after_id,
                page_size: int, tiebreak: str) -> DataFrame:
    """Keyset (seek) pagination — the scale form of :func:`page_by_ts`:
    resume from the last row the client saw via a (ts, id) cursor
    predicate instead of counting OFFSET rows.

    The tuple-seek condition ``ts > cur_ts OR (ts = cur_ts AND id >
    cur_id)`` pushes to the parquet scan (the ``ts >= cur_ts``
    relaxation prunes row groups; the residual finishes the tuple
    compare), and the page itself is TakeOrderedAndProject — so page
    depth costs NOTHING: page 1 and page 10^6 read the same few row
    groups past the cursor.  page_by_ts's bounded-prefix row_number
    stays registered as the OFFSET-parity form; this is what a 100 TB
    deployment actually serves."""
    cur = (F.col(ts_col) > F.lit(after_ts)) | (
        (F.col(ts_col) == F.lit(after_ts))
        & (F.col(tiebreak) > F.lit(after_id)))
    return (df.filter((F.col(ts_col) >= F.lit(after_ts)) & cur)
            .orderBy(F.col(ts_col), F.col(tiebreak))
            .limit(page_size))


def kth_most_recent_ts(df: DataFrame, ts_col: str, k: int,
                       tiebreak: str) -> DataFrame:
    """F3 ``kth_ts_offset``: timestamp of the k-th most recent row — the
    reference's backfill cap probe (processor.py:386-401,
    ``ORDER BY _createAt DESC LIMIT 1 OFFSET k-1``).

    Ordered ``limit(k)`` (TakeOrderedAndProject heaps, no global window)
    then min(ts) of the k kept rows == the k-th most recent — guarded
    by the kept-row COUNT so a frame with fewer than k rows reports a
    NULL kth_ts, matching the reference's LIMIT 1 OFFSET k-1 returning
    no row (r14 review: the unguarded min() reported the table's
    oldest ts, and a backfill cap keyed on it would treat the whole
    table as in-window).  At 100 TB the exact k-th gives way to
    ``approx_percentile`` (see :func:`ts_quantile_cut`)."""
    return (df.orderBy(F.col(ts_col).desc(), F.col(tiebreak)).limit(k)
              .agg(F.when(F.count(F.lit(1)) >= k, F.min(ts_col))
                   .alias("kth_ts")))


def ts_quantile_cut(df: DataFrame, ts_col: str, fraction: float) -> DataFrame:
    """F3 scale variant: the timestamp splitting off the most recent
    *fraction* of rows, via a one-pass approximate quantile sketch."""
    return df.agg(F.expr(
        f"approx_percentile({ts_col}, {1.0 - fraction})").alias("cut_ts"))


def neighbor_limit1(df: DataFrame, ts_col: str, pivot_ts, direction: str,
                    tiebreak: str) -> DataFrame:
    """F4 ``neighbor_limit1``: nearest row strictly before/after a pivot
    time (reference: processor.py:286-313).  The per-row form is D3's
    lag/lead; this standalone form is a filtered top-1."""
    if direction == "before":
        filtered = df.filter(F.col(ts_col) < F.lit(pivot_ts))
        order = [F.col(ts_col).desc(), F.col(tiebreak)]
    else:
        filtered = df.filter(F.col(ts_col) > F.lit(pivot_ts))
        order = [F.col(ts_col).asc(), F.col(tiebreak)]
    return filtered.orderBy(*order).limit(1)


def limit_candidates(df: DataFrame, n: int, order_col: str,
                     tiebreak: str | None = None) -> DataFrame:
    """F5 ``limit_candidates``: bounded candidate set (reference:
    user_mapper.py:198 ``LIMIT 500``).  The cap is deterministic under
    parallel execution ONLY when the ordering is total: pass
    *tiebreak* (a unique column) whenever *order_col* can tie at the
    cut boundary — without it, per-partition heaps break boundary
    ties by partition arrival order (r14 review)."""
    order = ([F.col(order_col), F.col(tiebreak)] if tiebreak
             else [F.col(order_col)])
    return df.orderBy(*order).limit(n)


def topk_per_group(df: DataFrame, group_col: str, order_col: str, k: int,
                   tiebreak: str, ascending: bool = False) -> DataFrame:
    """Top-k per group — the windowed generalization of F1 (SURVEY 2.G
    table): per-group rank <= k."""
    order = [F.col(order_col).asc() if ascending else F.col(order_col).desc(),
             F.col(tiebreak)]
    w = Window.partitionBy(group_col).orderBy(*order)
    return (df.withColumn("rank", F.row_number().over(w))
              .filter(F.col("rank") <= k))
