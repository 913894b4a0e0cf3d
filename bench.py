"""Benchmark harness: runs the engine's headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line.

Headline set = the reference's flagship paths (brute-force KNN search,
multi-query KNN join, ingest-shaped transform) plus the scale-surface
operators (MinHash LSH dedup, grouped aggregation, windowed context).
Baseline context (BASELINE.md): the reference does brute-force cosine
over ~70 k 384-dim rows "sub-second" and ingests 150-200 msg/s on its
best hardware.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def main() -> None:
    from pyspark.sql import functions as F

    from msg_vector_search_spark.session import get_spark
    from msg_vector_search_spark import contract
    from msg_vector_search_spark.embed import encoder_kind
    _encoder = encoder_kind()

    sf = float(SF_DIR.rstrip("/").rsplit("sf", 1)[-1])
    spark = get_spark("bench", cpus=CPUS)

    # JVM/codegen warmup so the first timed query isn't charged for
    # session spin-up (~3-5 s that no steady-state deployment pays)
    contract.REGISTRY["topk_by_similarity"](spark, SF_DIR).count()
    # Python-worker warmup: the first Arrow/pandas stage otherwise pays
    # one interpreter spawn + numpy/pandas import per core (~2-4 s wall)
    spark.range(CPUS * 4).repartition(CPUS).mapInPandas(
        lambda it: it, schema="id long").count()

    # headline queries: name -> callable(spark, sf_dir) -> DataFrame
    heads = [
        "topk_by_similarity",     # flagship brute-force KNN
        "knn_broadcast_join",     # multi-query KNN
        "cosine_similarity",      # full-corpus scoring throughput
        "sink_upsert_embeddings", # upsert/dedup write shape
        "scan_latest_file",
        "watermark_read",
    ]
    # include every registered query that exists; later rounds extend this
    names = [n for n in heads if n in contract.REGISTRY]
    extra = [n for n in sorted(contract.REGISTRY) if n not in heads]
    names += extra

    timings: dict[str, float] = {}
    total = 0.0
    for name in names:
        fn = contract.REGISTRY[name]
        t0 = time.perf_counter()
        try:
            df = fn(spark, SF_DIR)
            n = df.count()
        except Exception as e:  # a failing query must not kill the bench
            print(f"bench: {name} failed: {e}", file=sys.stderr)
            continue
        dt = time.perf_counter() - t0
        timings[name] = round(dt, 3)
        total += dt

    # headline metrics directly comparable to BASELINE.md:
    # - search latency: warm brute-force cosine top-k over the corpus
    #   (reference claims "sub-second" at 70k x 384-dim on a Mac)
    # - embedding throughput: pandas-UDF embed of the documents table
    #   (reference: 150-200 msg/s best-case on M3)
    t0 = time.perf_counter()
    contract.REGISTRY["topk_by_similarity"](spark, SF_DIR).count()
    search_latency = time.perf_counter() - t0

    n_docs = None
    embed_rate = None
    if "udf_embed_batch" in contract.REGISTRY:
        t0 = time.perf_counter()
        n_docs = contract.REGISTRY["udf_embed_batch"](spark, SF_DIR).count()
        embed_s = time.perf_counter() - t0
        embed_rate = round(n_docs / embed_s, 1) if embed_s > 0 else None

    # - ingest throughput: the FULL 3.2 write path (scan -> extract/clean
    #   -> lag/lead context -> dim join -> embed UDF -> dedup upsert ->
    #   watermark) in messages/second; the reference's headline number is
    #   150-200 msg/s (M3) for the same pipeline
    ingest_rate = None
    n_ingested = None
    try:
        import shutil
        import tempfile

        from msg_vector_search_spark.plans import ingest as ingest_plan
        store = tempfile.mkdtemp(prefix="bench_ingest_")
        t0 = time.perf_counter()
        n_scanned = ingest_plan.ingest_batch(spark, SF_DIR, store).count()
        ingest_s = time.perf_counter() - t0
        n_ingested = n_scanned
        ingest_rate = round(n_scanned / ingest_s, 1) if ingest_s > 0 else None
        shutil.rmtree(store, ignore_errors=True)
    except Exception as e:
        print(f"bench: ingest headline failed: {e}", file=sys.stderr)

    print(json.dumps({
        "metric": "headline_queries_total",
        "value": round(total, 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "headline": {
            # "fake" = deterministic md5-seeded encoder (sentence-
            # transformers absent): embed/ingest rates then measure
            # Spark plumbing, NOT model inference, and are not
            # comparable to the reference's 150-200 msg/s MiniLM number
            "encoder": _encoder,
            "search_latency_s": round(search_latency, 3),
            "embed_docs": n_docs,
            "embed_throughput_docs_per_s": embed_rate,
            "ingest_msgs": n_ingested,
            "ingest_throughput_msgs_per_s": ingest_rate,
        },
    }))


if __name__ == "__main__":
    main()
