"""Local emulator of the driver's correctness gate: run every
``queries()`` entry on Spark and its ``oracle_sql()`` twin on DuckDB
over the same parquet, compare row count, column names, and the
order-insensitive multiset of values.

Usage:  python tests/oracle_check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys

import duckdb
import pandas as pd

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * "
                f"FROM read_parquet('{sf_dir}/{t}.parquet')")
    return con


def canon_cell(v):
    """Canonicalize one value for multiset comparison."""
    if v is None or (isinstance(v, float) and math.isnan(v)):
        return "NULL"
    if isinstance(v, float):
        if v == int(v) and abs(v) < 1e15:
            return f"{v:.6f}"
        return f"{v:.10g}"
    if isinstance(v, pd.Timestamp):
        return v.tz_localize(None).isoformat() if v.tzinfo else v.isoformat()
    if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
        return "[" + ",".join(canon_cell(x) for x in v) + "]"
    return repr(v)


def canon_df(df: pd.DataFrame) -> list[tuple]:
    cols = sorted(df.columns)
    rows = [tuple(canon_cell(v) for v in row)
            for row in df[cols].itertuples(index=False, name=None)]
    return sorted(rows)


def compare(name: str, spark_df: pd.DataFrame, duck_df: pd.DataFrame) -> list[str]:
    problems = []
    if len(spark_df) != len(duck_df):
        problems.append(f"row count {len(spark_df)} != {len(duck_df)}")
    sc, dc = sorted(spark_df.columns), sorted(duck_df.columns)
    if sc != dc:
        problems.append(f"columns {sc} != {dc}")
        return problems
    a, b = canon_df(spark_df), canon_df(duck_df)
    if a != b:
        diffs = [i for i, (x, y) in enumerate(zip(a, b)) if x != y]
        msg = f"value mismatch ({len(diffs)} of {len(a)} rows differ)"
        for i in diffs[:3]:
            msg += f"\n    spark {a[i]}\n    duck  {b[i]}"
        if len(a) != len(b):
            msg += f"\n    (row multiset sizes {len(a)} vs {len(b)})"
        problems.append(msg)
    return problems


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    sys.path.insert(0, REPO)
    import __spark_entry__ as entrymod
    from pyspark.sql import SparkSession

    # VANILLA session on purpose: the external driver does not apply our
    # engine confs, so contract queries must self-pin anything they need
    # (UTC timezone, nanos handling) — running the gate tuned would hide
    # that class of bug.  AQE (on by default in Spark 4) coalesces the
    # default 200 shuffle partitions at this scale.
    spark = (SparkSession.builder.master("local[8]")
             .appName("oracle_check").getOrCreate())
    con = duck_connection(sf_dir)
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()

    failed, passed, rows_only = [], [], []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            failed.append(name)
            print(f"FAIL  {name}: spark error: {e}")
            continue
        if name not in oracles:
            rows_only.append(name)
            print(f"rows  {name}: {len(sdf)} rows (no oracle)")
            continue
        try:
            ddf = con.sql(oracles[name]).df()
        except Exception as e:
            failed.append(name)
            print(f"FAIL  {name}: duckdb error: {e}")
            continue
        problems = compare(name, sdf, ddf)
        if problems:
            failed.append(name)
            print(f"FAIL  {name}: " + "; ".join(problems))
        else:
            passed.append(name)
            print(f"ok    {name} ({len(sdf)} rows)")

    print(f"\n{len(passed)} ok, {len(rows_only)} rows-only, {len(failed)} failed")
    if failed:
        print("failed:", " ".join(failed))
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
