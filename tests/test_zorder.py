"""Z-order clustered layout: prove the multi-column locality property
on real parquet stats — row groups under a Z-order write are tight on
BOTH key columns, where a single-column sort is tight on one and
full-width on the other.  Pruning needs no reader cooperation: these
are the min/max stats every parquet reader (Spark, DuckDB, Arrow)
prunes row groups with."""

from __future__ import annotations

import glob
import os

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from msg_vector_search_spark.sources import layout, readers

SF = "/root/testdata/sf0.01"


def _spans(path: str, col: str) -> list[int]:
    """(max - min) of *col* per row group across all part files."""
    spans = []
    for f in glob.glob(os.path.join(path, "*.parquet")):
        md = pq.ParquetFile(f).metadata
        idx = {md.schema.column(i).name: i
               for i in range(len(md.schema))}[col]
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            spans.append(st.max - st.min)
    return spans


def _mean(xs) -> float:
    return sum(xs) / len(xs)


def test_zorder_tightens_both_columns(spark, tmp_path):
    ev = (readers.read_table(spark, SF, "events")
          .select("event_id", "user_id",
                  F.floor("value").cast("long").alias("val")))
    n = 8

    single = str(tmp_path / "single")   # classic sort: one column only
    (ev.repartitionByRange(n, "user_id")
     .sortWithinPartitions("user_id")
     .write.parquet(single))

    zpath = str(tmp_path / "zorder")
    layout.write_zordered(ev, zpath, ["user_id", "val"],
                          target_partitions=n)

    user_full = _mean(_spans(single, "user_id"))
    val_full = _mean(_spans(single, "val"))
    user_z = _mean(_spans(zpath, "user_id"))
    val_z = _mean(_spans(zpath, "val"))

    # single-column sort: tight on user_id but wide on val (mean span
    # is most of the ~490 full range)
    assert user_full < 150 * 0.25
    assert val_full > 250
    # z-order: BOTH columns substantially tighter than a full-width
    # stripe — val spans collapse >2x while user stays well under the
    # full range (the square-vs-stripe trade)
    assert user_z < 150 * 0.75
    assert val_z < val_full * 0.5


def test_zorder_key_is_exact_bit_interleave(spark):
    df = spark.createDataFrame(
        [(a, b) for a in (0, 1, 2, 3, 255) for b in (0, 1, 2, 3, 255)],
        ["a", "b"])
    got = {(r.a, r.b): r.z for r in df.select(
        "a", "b", layout.zorder_key(["a", "b"], bits=8).alias("z"))
        .collect()}

    def interleave(a: int, b: int) -> int:
        z = 0
        for i in range(8):
            z |= ((a >> i) & 1) << (2 * i)
            z |= ((b >> i) & 1) << (2 * i + 1)
        return z

    for (a, b), z in got.items():
        assert z == interleave(a, b)


def test_zorder_write_preserves_rows(spark, tmp_path):
    ev = (readers.read_table(spark, SF, "events")
          .select("event_id", "user_id",
                  F.floor("value").cast("long").alias("val")))
    zpath = str(tmp_path / "z")
    layout.write_zordered(ev, zpath, ["user_id", "val"])
    back = spark.read.parquet(zpath)
    assert back.count() == ev.count()
    assert sorted(back.columns) == sorted(ev.columns)
    assert (back.agg(F.sum("event_id")).head()[0]
            == ev.agg(F.sum("event_id")).head()[0])
