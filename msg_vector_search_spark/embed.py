"""The embedding UDF (SURVEY 2.I I1/I2) — the engine's single pandas UDF.

The reference embeds with sentence-transformers all-MiniLM-L6-v2 in
hardware-tuned batches, hand-rolling thread parallelism with ordered
reassembly (reference: src/core/embeddings/processor.py:174-324;
batch sizing src/core/utils/hardware_optimizer.py:84-138).  In Spark the
thread pool IS task parallelism and the batch knob IS the Arrow batch
size, so the whole 150-line apparatus reduces to one iterator-of-series
pandas UDF with a lazily-initialized per-worker model.

sentence-transformers is not installed in this environment, so the
model loader falls back to a DETERMINISTIC FAKE encoder (md5-seeded,
L2-normalized) with the same signature and batch shape.  The Spark-side
plumbing — Arrow batching, lazy per-executor init, array<float> output —
is identical for fake and real models; swapping in the real model is a
one-line change in ``_load_model``.
"""

from __future__ import annotations

import hashlib
import os
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

EMBED_DIM = 64  # fixture dimension; the reference model uses 384

_MODEL = None  # per-worker lazy singleton (one load per executor process)


class _DeterministicFakeModel:
    """Stand-in for SentenceTransformer: md5-seeded Gaussian vectors,
    L2-normalized.  Deterministic in the text alone, so re-runs and
    retried tasks produce identical embeddings (idempotent sink safe)."""

    def __init__(self, dim: int = EMBED_DIM):
        self.dim = dim

    def encode(self, texts: list[str], batch_size: int = 64,
               **_kwargs) -> np.ndarray:
        out = np.empty((len(texts), self.dim), dtype=np.float32)
        for i, text in enumerate(texts):
            seed = int.from_bytes(
                hashlib.md5(text.encode("utf-8")).digest()[:8], "little")
            rng = np.random.default_rng(seed)
            v = rng.standard_normal(self.dim).astype(np.float32)
            n = float(np.linalg.norm(v))
            out[i] = v / n if n > 0 else v
        return out


#: Local-weights override: a directory containing a saved
#: sentence-transformers model (``SentenceTransformer.save`` layout).
#: Lets an air-gapped cluster run the REAL encoder from mounted
#: weights with no network/hub access — executors inherit the env var
#: from the session (spark.executorEnv) or the cluster runtime.
MODEL_DIR_ENV = "SPARK_GRAFT_MODEL_DIR"


def _model_dim(model) -> int | None:
    """Output width of a loaded encoder, fake or real; None when the
    real model can't report one (some custom ST modules return None)."""
    if isinstance(model, _DeterministicFakeModel):
        return model.dim
    try:  # pragma: no cover - real model path, not in this image
        d = model.get_sentence_embedding_dimension()
        return int(d) if d is not None else None
    except Exception:
        return None


def _load_model(dim: int | None = EMBED_DIM):
    """Lazy per-worker model load (reference loads per process at
    embeddings/processor.py:47-109 with device selection; device pick
    would live here for the real model).  Resolution order:
    $SPARK_GRAFT_MODEL_DIR (local weights, offline) -> hub model name
    (network) -> deterministic fake (sentence-transformers absent).

    ``dim`` is the width the CALLER requires (e.g. the width of the
    corpus vectors a query vector will be zipped against); pass None
    to accept whatever the process encoder produces (the bulk-embed
    path, where downstream width derives FROM the output).  The cache
    is one model per worker, so a width the cached encoder can't honor
    refuses loudly in BOTH branches (r14 review for the fake, r15 for
    the real model: a 384-dim SentenceTransformer silently serving a
    dim=64 request would null-pad in zip_with and cosine would quietly
    score garbage)."""
    global _MODEL
    if _MODEL is None:
        try:  # pragma: no cover - real model path, not in this image
            from sentence_transformers import SentenceTransformer
            model_dir = os.environ.get(MODEL_DIR_ENV)
            _MODEL = SentenceTransformer(
                model_dir if model_dir else "all-MiniLM-L6-v2")
        except ImportError:
            _MODEL = _DeterministicFakeModel(
                dim if dim is not None else EMBED_DIM)
    loaded = _model_dim(_MODEL)
    if dim is not None and loaded is not None and loaded != dim:
        raise ValueError(
            f"embedding model produces dim={loaded}; requested "
            f"dim={dim} (one model per process — set "
            f"{MODEL_DIR_ENV} to weights of the right width, or "
            f"pass dim=None to accept the encoder's width)")
    return _MODEL


def encoder_kind() -> str:
    """'real-local' when sentence-transformers is importable and
    $SPARK_GRAFT_MODEL_DIR points at mounted weights, 'real' when only
    the hub path is available, else 'fake' (driver-side probe;
    executors resolve the same way).  Bench output carries this so
    embed/ingest throughput numbers are never mistaken for model-bound
    numbers when the deterministic fake is in play."""
    try:  # pragma: no cover - real model path, not in this image
        import sentence_transformers  # noqa: F401
        if os.environ.get(MODEL_DIR_ENV):
            return "real-local"
        return "real"
    except ImportError:
        return "fake"


@F.pandas_udf(T.ArrayType(T.FloatType()))
def embed_text(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
    """I1 ``udf_embed_batch``: text -> float32[EMBED_DIM].

    Iterator form so the model loads once per task, not per Arrow batch;
    Arrow batch size (spark.sql.execution.arrow.maxRecordsPerBatch) is
    the moral equivalent of the reference's hardware-tuned batch size.
    """
    # dim=None: bulk embed accepts the process encoder's width —
    # downstream (sink schema, corpus vectors) derives from the output
    model = _load_model(None)
    for series in batches:
        texts = series.fillna("").astype(str).tolist()
        vecs = model.encode(texts, batch_size=64)
        yield pd.Series([np.asarray(v, dtype=np.float32) for v in vecs])


def embed_query_vector(query: str, dim: int | None = None) -> list[float]:
    """I2 ``udf_embed_query``: driver-side single-string embed; the
    result travels to executors as a literal array (no 1-row DataFrame
    round-trip).  Reference: embeddings/processor.py:467.

    ``dim`` defaults to None — accept the process encoder's width,
    exactly like the bulk path (ADVICE r15: the corpus is embedded at
    the encoder's width via dim=None, so a query-side EMBED_DIM
    default would refuse every search under a real 384-dim
    all-MiniLM-L6-v2 even though corpus and query widths agree by
    construction: one encoder per process serves both sides).  Pass a
    width only when the caller genuinely knows the required one (e.g.
    zipping against vectors from a DIFFERENT store) — then the
    _load_model guard refuses a mismatched encoder loudly."""
    vec = _load_model(dim).encode([query])[0]
    return [float(x) for x in vec]


def with_embeddings(df: DataFrame, text_col: str = "message_text",
                    out_col: str = "embedding") -> DataFrame:
    """Attach embeddings to a text DataFrame — the whole 'generate
    embeddings' stage of the reference ETL (embeddings/processor.py:
    174-241) as one column expression."""
    return df.withColumn(out_col, embed_text(F.col(text_col)))
