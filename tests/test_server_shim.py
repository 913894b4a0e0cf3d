"""Serving shim smoke: the reference's three MCP endpoints driven
end-to-end (ingest -> search envelope -> stats) through dict dispatch
and the stdio framing loop."""

from __future__ import annotations

import io
import json

from msg_vector_search_spark.engine import Engine
from msg_vector_search_spark.server import ServingShim

SF = "/root/testdata/sf0.001"


def test_shim_three_endpoints(spark, tmp_path):
    shim = ServingShim(Engine(spark, SF, str(tmp_path / "store")))

    up = shim.handle({"tool": "update_embeddings", "args": {}})
    assert up["status"] == "success" and up["new_messages"] > 0

    res = shim.handle({"tool": "search_messages",
                       "args": {"query": "test", "limit": 5,
                                "threshold": -1.0}})
    assert res["status"] == "success"
    assert 0 < len(res["results"]) <= 5
    assert res["metadata"]["total_results"] == len(res["results"])

    stats = shim.handle({"tool": "database_stats"})
    assert stats["embedded_messages"] > 0


def test_shim_error_envelopes(spark, tmp_path):
    shim = ServingShim(Engine(spark, SF, str(tmp_path / "store")))
    bad = shim.handle({"tool": "no_such_tool"})
    assert bad["status"] == "error" and "search_messages" in bad["tools"]
    bad2 = shim.handle({"tool": "database_stats", "args": {"bogus": 1}})
    assert bad2["status"] == "error" and bad2["tool"] == "database_stats"


def test_shim_stdio_loop(spark, tmp_path):
    shim = ServingShim(Engine(spark, SF, str(tmp_path / "store")))
    shim.handle({"tool": "update_embeddings"})
    reqs = "\n".join([
        json.dumps({"tool": "database_stats"}),
        "not json at all",
        json.dumps({"tool": "search_messages",
                    "args": {"query": "hi", "limit": 2,
                             "threshold": -1.0}}),
        json.dumps({"tool": "shutdown"}),
        json.dumps({"tool": "database_stats"}),  # after shutdown: unserved
    ]) + "\n"
    out = io.StringIO()
    served = shim.serve_stdio(io.StringIO(reqs), out)
    lines = [json.loads(l) for l in out.getvalue().splitlines()]
    assert served == 3 and len(lines) == 3
    assert lines[0]["embedded_messages"] > 0
    assert lines[1]["status"] == "error" and "bad json" in lines[1]["error"]
    assert lines[2]["status"] == "success" and len(lines[2]["results"]) == 2


def test_shim_batched_search_extension(spark, tmp_path):
    """The extension tool answers a batch through the same dispatch:
    per-query envelopes inside a status-carrying wrapper, each equal
    to a single search_messages call's envelope results."""
    from msg_vector_search_spark.engine import Engine
    from msg_vector_search_spark.server import ServingShim

    eng = Engine(spark, "/root/testdata/sf0.001",
                 str(tmp_path / "store"), update_threshold=10 ** 9)
    eng.update_embeddings()
    shim = ServingShim(eng)
    resp = shim.handle({"tool": "search_messages_many",
                        "args": {"queries": {"a": "test", "b": "hello"},
                                 "limit": 3, "threshold": -1.0}})
    assert resp["status"] == "success"
    assert set(resp["envelopes"]) == {"a", "b"}
    single = shim.handle({"tool": "search_messages",
                          "args": {"query": "test", "limit": 3,
                                   "threshold": -1.0}})
    assert resp["envelopes"]["a"]["results"] == single["results"]


def test_shim_deep_errors_become_envelopes(spark, tmp_path):
    """r14 review: only TypeError was caught, so malformed args that
    exploded DEEPER in the engine (KeyError from a spec missing
    'query', AttributeError from a list where a dict belongs) killed
    the serve loop.  Every exception now returns a typed error
    envelope."""
    shim = ServingShim(Engine(spark, SF, str(tmp_path / "store")))
    shim.handle({"tool": "update_embeddings", "args": {}})

    bad = shim.handle({"tool": "search_messages_many",
                       "args": {"queries": {"a": {}}}})
    assert bad["status"] == "error" and bad["tool"] == "search_messages_many"
    assert bad["error_type"] == "KeyError"

    bad2 = shim.handle({"tool": "search_messages_many",
                        "args": {"queries": ["not", "a", "dict"]}})
    assert bad2["status"] == "error"

    # and the stdio loop survives a poisoned line between good ones
    lines = [
        json.dumps({"tool": "search_messages_many",
                    "args": {"queries": {"a": {}}}}),
        json.dumps({"tool": "database_stats"}),
    ]
    out = io.StringIO()
    served = shim.serve_stdio(io.StringIO("\n".join(lines) + "\n"), out)
    assert served == 2
    replies = [json.loads(l) for l in out.getvalue().splitlines()]
    assert replies[0]["status"] == "error"
    assert replies[1]["embedded_messages"] > 0
