"""The embedding pandas UDF and the multimodal binary plumbing: shape,
determinism, idempotence (SURVEY 5.3 + extension surface)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from msg_vector_search_spark import embed, multimodal


def test_embed_deterministic_and_normalized(spark):
    df = spark.createDataFrame([("hello",), ("world",), ("hello",)], ["t"])
    out = df.select(embed.embed_text(F.col("t")).alias("v")).collect()
    v0, v1, v2 = [r["v"] for r in out]
    assert len(v0) == embed.EMBED_DIM
    assert v0 == v2            # same text -> identical vector
    assert v0 != v1
    assert sum(x * x for x in v0) == pytest.approx(1.0, abs=1e-4)


def test_embed_query_matches_udf(spark):
    df = spark.createDataFrame([("abc",)], ["t"])
    udf_vec = df.select(embed.embed_text(F.col("t")).alias("v")).head()["v"]
    drv_vec = embed.embed_query_vector("abc")
    assert udf_vec == pytest.approx(drv_vec, abs=1e-6)


def test_embed_null_text(spark):
    df = spark.createDataFrame([(None,)], "t string")
    out = df.select(embed.embed_text(F.col("t")).alias("v")).head()["v"]
    assert len(out) == embed.EMBED_DIM


def test_multimodal_features(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(20)
    media = multimodal.documents_as_media(docs)
    feats = multimodal.extract_features(media)
    rows = feats.collect()
    assert len(rows) == 20
    for r in rows:
        assert len(r["features"]) == multimodal.FEATURE_DIM
        assert r["n_bytes"] > 0
        # histogram sums to ~1
        assert sum(r["features"]) == pytest.approx(1.0, abs=1e-3)
    assert feats.schema == multimodal.FEATURES_SCHEMA


def test_decode_media_is_stubbed():
    with pytest.raises(NotImplementedError):
        multimodal.decode_media(b"bytes", "image")
