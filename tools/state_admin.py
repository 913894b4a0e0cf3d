"""Watermark state maintenance CLI — the reference's initialize.py
verbs (--check-timestamps :51-80, --reset-timestamp :82-98, --force
:100-116) over the Parquet state table.

    python tools/state_admin.py STORE_DIR --check-timestamps [SF_DIR]
    python tools/state_admin.py STORE_DIR --reset-timestamp 2026-01-01T00:00:00
    python tools/state_admin.py STORE_DIR --force
"""

from __future__ import annotations

import argparse
import datetime as dt
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("store_dir", help="embedding store / state directory")
    p.add_argument("--check-timestamps", nargs="?", metavar="SF_DIR",
                   const="/root/testdata/sf0.001", default=None,
                   help="report source ts range vs watermark sanity")
    p.add_argument("--reset-timestamp", metavar="ISO_TS", default=None,
                   help="force the watermark to this ISO timestamp")
    p.add_argument("--force", action="store_true",
                   help="delete the watermark (full reprocess next run)")
    args = p.parse_args(argv)

    from msg_vector_search_spark.session import get_spark
    from msg_vector_search_spark.sources import readers, state
    from msg_vector_search_spark.plans import ingest as ingest_plan

    spark = get_spark("state_admin", cpus=4)
    if args.force:
        existed = state.delete_watermark(args.store_dir)
        print(f"watermark {'deleted' if existed else 'was absent'}; "
              "next ingest reprocesses from epoch")
    if args.reset_timestamp:
        ts = dt.datetime.fromisoformat(args.reset_timestamp)
        prev = state.reset_watermark(spark, args.store_dir, ts)
        print(f"watermark {prev.isoformat()} -> {ts.isoformat()}")
    if args.check_timestamps:
        msgs = ingest_plan.messages_from_events(
            readers.read_table(spark, args.check_timestamps, "events"))
        rep = state.check_timestamps(spark, msgs, args.store_dir)
        print(rep)
        return 0 if rep["watermark_in_range"] else 2
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
