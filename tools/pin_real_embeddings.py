#!/usr/bin/env python3
"""Generate tests/data/real_embed_pins.json — the real-encoder value
pins (VERDICT r14 item 3).

Run ONCE in an environment where sentence-transformers is installed
(this image carries only the deterministic fake):

    python tools/pin_real_embeddings.py

It embeds three fixed sentences with the reference's model
(all-MiniLM-L6-v2, reference: src/core/embeddings/processor.py:174-324,
setup.sh:126-132) and pins each vector's dim, L2 norm, and first 8
components.  tests/test_embed_multimodal.py::
test_real_model_matches_pinned_vectors then value-checks the Spark
pandas-UDF path (embed.with_embeddings) against the pins wherever the
real model exists — turning the registry's two rows-only entries
(udf_embed_batch / udf_embed_query) into value-checked ones there.
The pin file is committed so any capable environment can verify
without network access at test time.
"""
from __future__ import annotations

import json
import os
import sys

SENTENCES = [
    "hello world",
    "The quick brown fox jumps over the lazy dog.",
    "vector search over chat messages",
]
HEAD = 8


def main() -> int:
    try:
        from sentence_transformers import SentenceTransformer
    except ImportError:
        print("sentence-transformers not installed — run this where the "
              "real model exists (see module docstring)", file=sys.stderr)
        return 1
    model_dir = os.environ.get("SPARK_GRAFT_MODEL_DIR")
    model = SentenceTransformer(model_dir if model_dir else "all-MiniLM-L6-v2")
    vecs = model.encode(SENTENCES)
    pins = {
        "model": "all-MiniLM-L6-v2",
        "dim": int(len(vecs[0])),
        "sentences": SENTENCES,
        "vectors": [
            {"norm": float(sum(float(x) * float(x) for x in v) ** 0.5),
             "head": [float(x) for x in v[:HEAD]]}
            for v in vecs
        ],
    }
    out = os.path.join(os.path.dirname(__file__), "..", "tests", "data",
                       "real_embed_pins.json")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "w") as f:
        json.dump(pins, f, indent=1)
    print(f"wrote {os.path.normpath(out)} (dim={pins['dim']})")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
