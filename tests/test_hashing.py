"""Parity pins for the driver-side xxhash64 twin (functions.hashing).

The inverted-index build writes ``tb = pmod(xxhash64(term), n)`` with
the Catalyst expression; the serve (r17) computes the SAME mapping on
the driver to avoid a per-serve 1-row cluster job.  These pins hold the
two implementations bit-equal — a drift would misroute serves to the
wrong postings directories, so the parity test is deliberately broad:
every fixture-vocabulary shape, randomized lengths across the XXH64
block boundaries (0..100 bytes spans the <4, <8, <32 and stripe
paths), and multi-byte scripts.
"""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from msg_vector_search_spark.functions.hashing import (term_bucket,
                                                       xxhash64_str)

CORPUS = (
    ["", "a", "ab", "abc", "spark", "query", "dup", "the", "vector",
     "data", "join", "zstopz", "qrecycle",
     "x" * 31, "x" * 32, "x" * 33, "y" * 63, "y" * 64, "z" * 100,
     "naïve", "héllo wörld", "日本語のテキスト", "emoji 🙂🚀", "кириллица",
     "tab\tnew\nline", "trailing space ", " leading"]
    + ["".join(random.Random(i).choices(
        "abcdefghijklmnopqrstuvwxyz0123456789 _-", k=random.Random(i).randint(0, 100)))
       for i in range(64)]
)


def test_xxhash64_matches_catalyst(spark):
    got = [xxhash64_str(s) for s in CORPUS]
    row = (spark.range(1).select(*[
        F.xxhash64(F.lit(s)).alias(f"h{i}") for i, s in enumerate(CORPUS)])
        .collect()[0])
    want = [int(v) for v in row]
    assert got == want


def test_term_bucket_matches_catalyst_pmod(spark):
    for n in (1, 7, 64, 120, 499, 8192):
        got = [term_bucket(s, n) for s in CORPUS]
        row = (spark.range(1).select(*[
            F.pmod(F.xxhash64(F.lit(s)), F.lit(n)).alias(f"b{i}")
            for i, s in enumerate(CORPUS)]).collect()[0])
        want = [int(v) for v in row]
        assert got == want
