"""Serving shim — the reference's front door over the Spark engine.

The reference is consumed through a FastMCP stdio server registering
two tools and one resource (reference: src/server.py:140-258, run loop
:262): ``search_messages(query, limit, threshold, force_update)``,
``update_embeddings(batch_size, max_messages)`` and
``resource://database_stats``.  This module exposes the same three
entry points over :class:`~msg_vector_search_spark.engine.Engine`,
plus one clearly-marked extension tool (``search_messages_many`` —
batched search, Q queries per corpus scan; the reference has no
analog):

- :meth:`ServingShim.handle` — one request dict in, one response dict
  out; the transport-agnostic core.
- :meth:`ServingShim.serve_stdio` — line-delimited JSON over
  stdin/stdout, the same framing discipline as MCP's stdio transport,
  with zero dependencies (testable in this image).
- :func:`build_mcp` — registers the three endpoints on a FastMCP
  instance when the ``mcp`` package is installed (it is not in this
  image; the branch is import-gated exactly like the real embedding
  model in ``embed.py``).

Driver-side by design: serving is control plane.  Every data-plane
operation stays a Spark plan inside Engine/plans; the shim only
translates dicts.
"""

from __future__ import annotations

import json
import sys
from typing import Any, TextIO

from .engine import Engine


class ServingShim:
    """Dispatches the reference's three tool calls onto an Engine."""

    def __init__(self, engine: Engine):
        self.engine = engine

    # -- the three registered endpoints (reference: server.py:140-258) --
    def search_messages(self, query: str, limit: int = 30,
                        threshold: float = 0.3,
                        conversation_type: str | None = None,
                        session_id: str | None = None,
                        force_update: bool = False) -> dict:
        """Tool 1 (reference: server.py:202-258): semantic search,
        defaults limit=30 / threshold=0.3 per server.py:205-206."""
        return self.engine.search(
            query, limit=limit, threshold=threshold,
            conversation_type=conversation_type, session_id=session_id,
            force_update=force_update)

    def update_embeddings(self, max_messages: int | None = 10_000,
                          batch_size: int | None = None) -> dict:
        """Tool 2 (reference: server.py:162-200): manual refresh.
        batch_size = the reference's per-batch embed chunk, mapped to
        the Arrow record-batch size for this run (Engine docstring)."""
        return self.engine.update_embeddings(max_messages=max_messages,
                                             batch_size=batch_size)

    def database_stats(self) -> dict:
        """Resource (reference: server.py:140-160)."""
        return self.engine.get_database_stats()

    # -- EXTENSION endpoint (no reference analog) -----------------------
    def search_messages_many(self, queries: dict, limit: int = 30,
                             threshold: float = 0.3,
                             conversation_type: str | None = None,
                             session_id: str | None = None,
                             force_update: bool = False) -> dict:
        """Batched search — Q queries, one corpus scan, one freshness
        gate (Engine.search_many).  Marked extension: the reference
        serves one query per tool call; a high-QPS deployment batches.
        The optional filters are the single-search tool's
        (reference: server.py:202-258) and follow the same path: a
        pushed-down scan predicate on the brute engine, a recorded
        meta_cols PRE-filter on an index-backed engine — never a
        post-filter of results.  Returns ``{"status": "success",
        "envelopes": {key: envelope}}`` so the error envelope contract
        of :meth:`handle` still has a top-level status."""
        return {"status": "success",
                "envelopes": self.engine.search_many(
                    queries, limit=limit, threshold=threshold,
                    conversation_type=conversation_type,
                    session_id=session_id,
                    force_update=force_update)}

    TOOLS = {
        "search_messages": search_messages,
        "update_embeddings": update_embeddings,
        "database_stats": database_stats,
        "search_messages_many": search_messages_many,
    }

    # -- transport-agnostic dispatch ------------------------------------
    def handle(self, request: dict) -> dict:
        """``{"tool": name, "args": {...}}`` -> ``{"status": ...}``.

        Unknown tools and argument errors come back as error envelopes
        (the server must never die on a bad request — the reference
        relies on FastMCP's equivalent guard)."""
        tool = request.get("tool")
        fn = self.TOOLS.get(tool)
        if fn is None:
            return {"status": "error",
                    "error": f"unknown tool: {tool!r}",
                    "tools": sorted(self.TOOLS)}
        try:
            return fn(self, **(request.get("args") or {}))
        except Exception as e:  # noqa: BLE001 — the server must never
            # die on a bad request (r14 review: TypeError alone let a
            # malformed args payload kill the serve loop via
            # KeyError/AttributeError/ValueError deeper in the engine);
            # every failure comes back as an error envelope, typed so
            # the client can tell bad-arguments from engine faults
            return {"status": "error", "error": str(e),
                    "error_type": type(e).__name__, "tool": tool}

    def serve_stdio(self, stdin: TextIO | None = None,
                    stdout: TextIO | None = None) -> int:
        """Line-delimited JSON serve loop (MCP-stdio-shaped framing):
        one request object per line in, one response object per line
        out; EOF or a ``{"tool": "shutdown"}`` line ends the loop.
        Returns the number of requests served."""
        stdin = stdin if stdin is not None else sys.stdin
        stdout = stdout if stdout is not None else sys.stdout
        served = 0
        for line in stdin:
            line = line.strip()
            if not line:
                continue
            try:
                req: dict[str, Any] = json.loads(line)
            except json.JSONDecodeError as e:
                resp = {"status": "error", "error": f"bad json: {e}"}
            else:
                if req.get("tool") == "shutdown":
                    break
                resp = self.handle(req)
            stdout.write(json.dumps(resp, default=str) + "\n")
            stdout.flush()
            served += 1
        return served


def build_mcp(engine: Engine):
    """FastMCP registration mirroring reference src/server.py:140-258;
    returns the server object (caller runs ``server.run()``).  Raises
    ImportError where the ``mcp`` package is absent (this image)."""
    from mcp.server.fastmcp import FastMCP  # pragma: no cover

    shim = ServingShim(engine)  # pragma: no cover
    srv = FastMCP("msg-vector-search-spark")  # pragma: no cover

    @srv.tool()  # pragma: no cover
    def search_messages(query: str, limit: int = 30,
                        threshold: float = 0.3,
                        conversation_type: str | None = None,
                        session_id: str | None = None,
                        force_update: bool = False) -> dict:
        return shim.search_messages(query, limit=limit,
                                    threshold=threshold,
                                    conversation_type=conversation_type,
                                    session_id=session_id,
                                    force_update=force_update)

    @srv.tool()  # pragma: no cover
    def update_embeddings(max_messages: int | None = 10_000,
                          batch_size: int | None = None) -> dict:
        # None = uncapped (r14 review: the int-only annotation made
        # the shim's unlimited-refresh option inexpressible over MCP)
        return shim.update_embeddings(max_messages=max_messages,
                                      batch_size=batch_size)

    @srv.resource("resource://database_stats")  # pragma: no cover
    def database_stats() -> dict:
        return shim.database_stats()

    @srv.tool()  # pragma: no cover — extension, no reference analog
    def search_messages_many(queries: dict, limit: int = 30,
                             threshold: float = 0.3,
                             conversation_type: str | None = None,
                             session_id: str | None = None,
                             force_update: bool = False) -> dict:
        return shim.search_messages_many(queries, limit=limit,
                                         threshold=threshold,
                                         conversation_type=conversation_type,
                                         session_id=session_id,
                                         force_update=force_update)

    return srv  # pragma: no cover
