"""As-of join — the canonical time-series operator Spark lacks as a
builtin (no analog in the reference either; part of the extension
surface this engine adds).

For each left row, attach the most recent right row with
``right.ts <= left.ts`` within the same key.  A correlated-subquery
formulation is quadratic; the Spark-first composition is the
union-and-window trick:

    tag left/right -> unionByName -> window last_value(right value)
    over (key ORDER BY ts, right-first) -> keep left rows

ONE shuffle on the key (the window partition), no join at all — the
same shape at 100 TB, and AQE handles key skew.  DuckDB's native
``ASOF JOIN`` is the oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(left: DataFrame, right: DataFrame, key: str, ts: str,
              value_cols: list[str], tiebreak: str) -> DataFrame:
    """Attach the latest right row (by *ts*, <=) per *key* to each left
    row.  *value_cols* are the right columns carried over; *tiebreak*
    is a unique column present on BOTH sides (ties on equal ts resolve
    right-row-first, then by tiebreak, so the result is deterministic).
    """
    lhs = left.withColumn("_side", F.lit(1))
    rhs = right.withColumn("_side", F.lit(0))
    for c in lhs.columns:
        if c not in rhs.columns:
            rhs = rhs.withColumn(c, F.lit(None).cast(lhs.schema[c].dataType))
    for c in rhs.columns:
        if c not in lhs.columns:
            lhs = lhs.withColumn(c, F.lit(None).cast(rhs.schema[c].dataType))
    unioned = lhs.unionByName(rhs)
    # right rows sort BEFORE left rows at equal ts (_side asc), so a
    # left row at exactly t sees a right row at t
    w = (Window.partitionBy(key)
         .orderBy(F.col(ts).asc(), F.col("_side").asc(),
                  F.col(tiebreak).asc())
         .rowsBetween(Window.unboundedPreceding, 0))
    # ONE last() over a struct of ALL value columns (r14 review): the
    # old per-column last(when(...), ignorenulls=True) skipped right
    # rows whose value was genuinely NULL — returning a STALE older
    # value, and with several value_cols MIXING fields from different
    # right rows into one that never existed.  The struct is non-null
    # exactly for right rows (whatever its fields hold), so
    # ignorenulls walks back to the latest right ROW atomically —
    # true ASOF semantics, matching DuckDB's ASOF JOIN oracle.
    row_struct = F.when(
        F.col("_side") == 0,
        F.struct(*[F.col(c).alias(c) for c in value_cols]))
    out = unioned.withColumn(
        "_asof_row", F.last(row_struct, ignorenulls=True).over(w))
    for c in value_cols:
        out = out.withColumn(f"asof_{c}", F.col(f"_asof_row.{c}"))
    return (out.filter(F.col("_side") == 1)
            .drop("_side", "_asof_row", *value_cols))
