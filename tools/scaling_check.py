"""Scaling probe: replicate the fixture corpus Nx in /tmp and measure
the heavy operators, verifying wall-time grows ~linearly (blocking
held, no quadratic blowup) and parallelism engages.  Run:
python tools/scaling_check.py [replication ...]"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

BASE = "/root/testdata/sf0.1"


def replicate(spark, mult: int, out_dir: str) -> None:
    from pyspark.sql import functions as F
    docs = spark.read.parquet(f"{BASE}/documents.parquet")
    copies = [docs.withColumn("doc_id", F.col("doc_id") + F.lit(i * 10_000_000))
              for i in range(mult)]
    out = copies[0]
    for c in copies[1:]:
        out = out.unionByName(c)
    out.repartition(32).write.mode("overwrite") \
       .parquet(f"{out_dir}/documents.parquet")


def main() -> None:
    from msg_vector_search_spark.operators import dedup
    from msg_vector_search_spark.session import get_spark

    mults = [int(a) for a in sys.argv[1:]] or [1, 4, 16]
    spark = get_spark("scaling_check")
    print(f"{'xN':>4} {'docs':>8} {'minhash_s':>10} {'simhash_s':>10} "
          f"{'exact_s':>8} {'pairs':>8}")
    for m in mults:
        d = tempfile.mkdtemp(prefix=f"scale_{m}x_")
        try:
            replicate(spark, m, d)
            docs = spark.read.parquet(f"{d}/documents.parquet")
            n = docs.count()
            t0 = time.perf_counter()
            pairs = dedup.dedup_minhash_lsh(docs).count()
            t_mh = time.perf_counter() - t0
            t0 = time.perf_counter()
            dedup.dedup_simhash(docs).count()
            t_sh = time.perf_counter() - t0
            t0 = time.perf_counter()
            dedup.dedup_exact(docs).count()
            t_ex = time.perf_counter() - t0
            print(f"{m:>4} {n:>8} {t_mh:>10.2f} {t_sh:>10.2f} "
                  f"{t_ex:>8.2f} {pairs:>8}", flush=True)
        finally:
            shutil.rmtree(d, ignore_errors=True)


if __name__ == "__main__":
    main()
