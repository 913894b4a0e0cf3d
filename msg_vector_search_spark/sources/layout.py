"""Z-order clustered write layout — multi-column scan pruning.

A single-column sort gives parquet row groups tight min/max stats on
ONE column; filters on any other column prune nothing.  Interleaving
the bits of two (or more) bounded key columns into one Z-value and
range-sorting the write on it gives every keyed column locality at
once: a row group covers a small square of the key space instead of a
thin full-width stripe, so min/max row-group pruning fires for filters
on EITHER column (and their conjunction).

This is the layout trick behind Delta/Iceberg Z-ORDER table
maintenance, built here from primitives Spark already has:

* the Z-value is a pure Column expression (shift/mask/or — JVM
  codegen, no UDF);
* the clustered write is ``repartitionByRange(zkey)`` (range exchange
  with sampled bounds, so output files are balanced even when the key
  space is skewed) + ``sortWithinPartitions(zkey)``;
* pruning needs nothing at read time — parquet row-group min/max
  stats do the work for any engine reading the files.

The reference has no analog (single SQLite file, B-tree access,
reference: src/core/database/connection.py); at 100 TB the clustered
copy is what turns "scan everything" point/range queries into
row-group-pruned reads without a second index structure.
"""

from __future__ import annotations

import functools

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_key(cols: list[Column | str], bits: int = 16) -> Column:
    """Interleave the low *bits* bits of each column into one long.

    Columns must be non-negative ints already bounded to ``2**bits``
    (bucketize first: ``pmod(hash(c), 2**bits)`` for unbounded
    domains, or a plain cast for naturally small ones).  With two
    columns and the default 16 bits the Z-value fits in 32 bits; the
    expression is ``2 * bits`` shift/mask/or terms, all inside
    whole-stage codegen.
    """
    ncols = len(cols)
    if ncols * bits > 63:
        # bit 63 is the long's sign bit (sign-flipped Z-values would
        # range-partition before all positives) and Java shifts wrap
        # mod 64 (positions >= 64 silently collide) — either way the
        # interleaved-order contract breaks with no error; refuse with
        # guidance instead (r14 review)
        raise ValueError(
            f"zorder_key: {ncols} cols x {bits} bits = {ncols * bits} "
            "interleaved bits; the long Z-value holds at most 63 — "
            "reduce bits (e.g. bits=63//ncols)")
    terms = []
    for j, c in enumerate(cols):
        col = F.col(c) if isinstance(c, str) else c
        col = col.cast("long")
        for i in range(bits):
            # bit i of column j lands at interleaved position
            # i * ncols + j
            terms.append(
                F.shiftleft(F.shiftright(col, i).bitwiseAND(F.lit(1)),
                            i * ncols + j))
    return functools.reduce(lambda x, y: x.bitwiseOR(y),
                            terms).alias("_zkey")


def write_zordered(df: DataFrame, path: str, cols: list[Column | str],
                   bits: int = 16, target_partitions: int | None = None,
                   mode: str = "overwrite") -> None:
    """Write *df* as parquet clustered by the Z-order of *cols* (names
    or Column expressions — pass ``pmod(col, 2**bits)`` style bucket
    expressions for unbounded domains, per the zorder_key contract).

    ``repartitionByRange`` samples the Z-value distribution so every
    output file holds a contiguous, similarly-sized Z-range (skew in
    the raw keys becomes file-count, not file-size, variance); the
    within-partition sort makes row groups inside each file tight as
    well.  The Z-key is dropped before writing — the layout is carried
    by row order, not a stored column.
    """
    zkey = zorder_key(cols, bits)
    clustered = df.withColumn("_zkey", zkey)
    n = target_partitions or df.sparkSession.sparkContext.defaultParallelism
    (clustered.repartitionByRange(n, "_zkey")
     .sortWithinPartitions("_zkey")
     .drop("_zkey")
     .write.mode(mode).parquet(path))
