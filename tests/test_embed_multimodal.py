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


def test_resize_images_truncates_and_pads(spark):
    media = spark.createDataFrame(
        [(1, "image", b"abcdefgh", None, None, None),
         (2, "audio", b"xy", None, None, None),
         (3, "image", b"xy", None, None, None)],
        schema=multimodal.MEDIA_SCHEMA)
    out = {r["media_id"]: r
           for r in multimodal.resize_images(media, 2, 2).collect()}
    assert bytes(out[1]["payload"]) == b"abcd"          # truncated to 2*2
    assert bytes(out[3]["payload"]) == b"xy\x00\x00"    # zero-padded
    assert (out[1]["width"], out[1]["height"]) == (2, 2)
    assert bytes(out[2]["payload"]) == b"xy"            # non-image untouched
    assert out[2]["width"] is None


def test_sample_frames_fanout_and_last_partial_frame(spark):
    # 10 bytes / frame_size 4 -> frames of 4,4,2; stride 2 keeps idx 0,2
    media = spark.createDataFrame(
        [(7, "video", b"0123456789", None, None, None),
         (8, "video", b"", None, None, None)],
        schema=multimodal.MEDIA_SCHEMA)
    rows = multimodal.sample_frames(media, frame_size=4, stride=2).collect()
    by = {(r["media_id"], r["frame_idx"]): r for r in rows}
    assert set(by) == {(7, 0), (7, 2), (8, 0)}
    assert by[(7, 0)]["frame_bytes"] == 4 and bytes(by[(7, 0)]["frame_payload"]) == b"0123"
    assert by[(7, 2)]["frame_bytes"] == 2 and bytes(by[(7, 2)]["frame_payload"]) == b"89"
    assert by[(7, 0)]["n_frames"] == 3
    assert by[(8, 0)]["frame_bytes"] == 0 and by[(8, 0)]["n_frames"] == 1


@pytest.mark.skipif(not embed.encoder_kind().startswith("real"),
                    reason="sentence-transformers not installed in this "
                           "image; embed UDF runs the deterministic fake")
def test_real_sentence_transformers_path(spark):
    """Integration check for the real-model branch of _load_model: runs
    only where sentence-transformers is installed.  Verifies the UDF
    yields 384-dim unit-norm vectors and that identical texts embed
    identically across tasks (idempotent-sink requirement)."""
    df = spark.createDataFrame(
        [(1, "hello world"), (2, "hello world"), (3, "something else")],
        ["id", "message_text"]).repartition(3)
    out = {r["id"]: r["embedding"]
           for r in embed.with_embeddings(df).collect()}
    assert len(out[1]) == 384
    norm = sum(x * x for x in out[1]) ** 0.5
    assert abs(norm - 1.0) < 1e-3
    assert out[1] == out[2] != out[3]


def test_model_dir_env_resolution(monkeypatch, tmp_path):
    """The $SPARK_GRAFT_MODEL_DIR local-weights branch: encoder_kind
    reports 'real-local' only when sentence-transformers is importable
    AND the env var is set; without the package the fake stays in
    charge regardless of the env var (no crash on a dangling dir)."""
    monkeypatch.setenv(embed.MODEL_DIR_ENV, str(tmp_path))
    kind = embed.encoder_kind()
    try:
        import sentence_transformers  # noqa: F401
        assert kind == "real-local"
    except ImportError:
        assert kind == "fake"
        # _load_model must also fall back cleanly with the var set
        monkeypatch.setattr(embed, "_MODEL", None)
        model = embed._load_model()
        assert isinstance(model, embed._DeterministicFakeModel)
        monkeypatch.setattr(embed, "_MODEL", None)


def test_perceptual_simhash_near_dup_resilience(spark):
    """The perceptual fingerprint's contract: a truncated copy lands
    within a small hamming distance of its original; unrelated
    payloads sit near bits/2 apart; and the bit-slice-blocked pairing
    equals brute force (pigeonhole)."""
    import random

    from pyspark.sql import Row

    from msg_vector_search_spark.operators import dedup

    rng = random.Random(7)
    # structured payloads (a per-payload 32-byte motif repeated 12x —
    # the repetition real media bytes have): repeated windows give the
    # vote sums wide margins, so truncation cannot flip many bits.
    # (Uniform-random bytes are the adversarial case — margins ~sqrt(n)
    # — which is why the contract row reports measured recall instead
    # of asserting a universal bound.)
    payloads = [bytes(rng.randrange(256) for _ in range(32)) * 12
                for _ in range(20)]
    rows = [Row(media_id=i, payload=p) for i, p in enumerate(payloads)]
    # truncated copies of the first five payloads (80% of the bytes)
    rows += [Row(media_id=100 + i, payload=payloads[i][:307])
             for i in range(5)]
    media = spark.createDataFrame(rows)
    fps = {r["media_id"]: r["fp"]
           for r in multimodal.perceptual_simhash(
               media, bits=32, window=8, stride=4).collect()}

    def ham(a, b):
        return bin(a ^ b).count("1")

    for i in range(5):
        assert ham(fps[i], fps[100 + i]) <= 4  # copy stays close
    unrelated = [ham(fps[a], fps[b])
                 for a in range(20) for b in range(a + 1, 20)]
    assert min(unrelated) > 4          # distinct payloads separate
    assert sum(unrelated) / len(unrelated) > 10

    fpdf = multimodal.perceptual_simhash(media, bits=32, window=8,
                                         stride=4)
    blocked = {(r["id_a"], r["id_b"])
               for r in dedup.hamming_pairs(
                   fpdf, id_col="media_id", bits=32,
                   max_distance=4).collect()}
    brute = {(a, b)
             for a in sorted(fps) for b in sorted(fps) if a < b
             and ham(fps[a], fps[b]) <= 4}
    assert blocked == brute == {(i, 100 + i) for i in range(5)}


def test_perceptual_simhash_short_payloads_not_degenerate(spark):
    """Payloads shorter than the window get ONE whole-payload window,
    not zero — zero windows voted fp=0 for every short payload, which
    paired unrelated media at hamming distance 0."""
    from pyspark.sql import Row

    from msg_vector_search_spark import multimodal

    rows = [Row(media_id=1, payload=bytearray(b"cat")),
            Row(media_id=2, payload=bytearray(b"dog")),
            Row(media_id=3, payload=bytearray(b"")),
            Row(media_id=4, payload=bytearray(b"cat"))]
    fps = {r["media_id"]: r["fp"] for r in
           multimodal.perceptual_simhash(
               spark.createDataFrame(rows)).collect()}
    assert fps[1] != 0 and fps[2] != 0  # non-degenerate
    assert fps[1] != fps[2]             # unrelated shorts differ
    assert fps[1] == fps[4]             # identical shorts agree
    assert fps[3] == 0                  # only the EMPTY payload is 0


def test_load_model_dim_guard_both_branches(monkeypatch):
    """r15 review: the dim-mismatch refusal must cover BOTH encoder
    branches.  Exercised directly on the fake here; the real branch
    goes through the same post-load check (_model_dim reads
    get_sentence_embedding_dimension), which the pinned-vector
    integration test covers where the model exists."""
    import pytest as _pytest

    monkeypatch.setattr(embed, "_MODEL", None)
    m = embed._load_model(embed.EMBED_DIM)
    assert isinstance(m, embed._DeterministicFakeModel)
    # cached at EMBED_DIM: a different explicit width refuses loudly
    with _pytest.raises(ValueError, match="one model per process"):
        embed._load_model(embed.EMBED_DIM + 1)
    # dim=None accepts the cached encoder's width (bulk-embed path)
    assert embed._load_model(None) is m
    monkeypatch.setattr(embed, "_MODEL", None)


@pytest.mark.skipif(not embed.encoder_kind().startswith("real"),
                    reason="sentence-transformers not installed in this "
                           "image; run tools/pin_real_embeddings.py where "
                           "it exists to (re)generate the pin file")
def test_real_model_matches_pinned_vectors(spark):
    """Real-encoder value proof (VERDICT r14 item 3): where
    sentence-transformers exists, udf_embed_batch's output must match
    the pinned all-MiniLM-L6-v2 vectors generated once by
    tools/pin_real_embeddings.py — turning the two rows-only registry
    entries (udf_embed_batch / udf_embed_query) into value-checked
    ones in a capable environment (reference:
    embeddings/processor.py:286-303; setup.sh:126-132 dim check)."""
    import json
    import os as _os

    pin_path = _os.path.join(_os.path.dirname(__file__), "data",
                             "real_embed_pins.json")
    if not _os.path.exists(pin_path):
        pytest.skip("pin file absent — run tools/pin_real_embeddings.py "
                    "once in this environment to create it")
    pins = json.load(open(pin_path))
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(pins["sentences"])],
        ["id", "message_text"])
    out = {r["id"]: list(r["embedding"])
           for r in embed.with_embeddings(df).collect()}
    for i, pin in enumerate(pins["vectors"]):
        vec = out[i]
        assert len(vec) == pins["dim"]
        norm = sum(x * x for x in vec) ** 0.5
        assert abs(norm - pin["norm"]) < 1e-3
        for got, want in zip(vec[:len(pin["head"])], pin["head"]):
            assert abs(got - want) < 1e-4
    # the QUERY path (ADVICE r16: its dim default must accept the real
    # encoder's width — a 384-dim model must not refuse a query embed
    # while the corpus embedded fine) produces the same pinned vectors
    for sent, pin in zip(pins["sentences"], pins["vectors"]):
        qvec = embed.embed_query_vector(sent)
        assert len(qvec) == pins["dim"]
        for got, want in zip(qvec[:len(pin["head"])], pin["head"]):
            assert abs(got - want) < 1e-4
