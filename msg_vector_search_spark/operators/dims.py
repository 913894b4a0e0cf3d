"""Dimension builds and set-membership joins (SURVEY 2.B/2.D: B2-B4,
C6/C7/C12 consumers, D2, D4, D5, E6).

The reference materializes its user dimension as an in-memory dict +
JSON cache file (src/core/database/user_mapper.py:22-64) and resolves
conversation names with per-row correlated ``LIMIT 1`` queries
(src/core/database/processor.py:192-264, re-implemented at search time
in src/core/embeddings/processor.py:548-617).  Here both dimensions are
built ONCE as DataFrames — the decorrelation is the design (SURVEY 4):
"first qualifying row per group" becomes ``row_number() = 1`` over a
priority+time ordering, and lookups become broadcast hash joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import textops
from .. import schemas


def users_from_group_info(messages: DataFrame, content_col: str = "c") -> DataFrame:
    """Explode group-info JSON into (uid, name) dimension rows.

    Reference: src/core/database/user_mapper.py:95-137 — LIKE pre-filter
    then per-row dict probing of ``{"u": [{"uid", "n"}]}``.  Spark: the
    contains-probe stays ahead of ``from_json`` (cheap conjunct first),
    then ``explode`` — the reference's one UDTF-shaped loop (SURVEY 2.I).
    """
    probed = messages.filter(
        F.col(content_col).contains('"uid":') & F.col(content_col).contains('"n":'))
    parsed = probed.select(
        F.explode(F.from_json(F.col(content_col), schemas.GROUP_INFO_JSON)["u"])
        .alias("member"))
    return (
        parsed.select(F.col("member.uid").alias("user_id"),
                      F.trim(F.col("member.n")).alias("user_name"))
        .filter(F.col("user_id").isNotNull() & (F.length("user_name") > 0))
        .filter(~textops.is_file_name(F.col("user_name")))
        # min(name), not dropDuplicates (r14 review): a uid appearing
        # with several names would otherwise keep whichever row the
        # partial aggregation saw first — nondeterministic across
        # runs/partitionings.  min() is an arbitrary-but-FIXED pick,
        # the determinism discipline this module demands of LIMIT
        .groupBy("user_id")
        .agg(F.min("user_name").alias("user_name"))
    )


def unnamed_users(all_users: DataFrame, named: DataFrame,
                  key: str = "user_id") -> DataFrame:
    """D4 ``anti_join_unnamed``: distinct users minus known-name keys —
    the reference's Python set difference (user_mapper.py:179-182) as a
    left-anti join."""
    return all_users.join(named, key, "left_anti")


def deep_search_candidates(messages: DataFrame, unnamed: DataFrame,
                           key: str = "user_id", cap: int = 500,
                           order_col: str = "event_id",
                           content_col: str | None = None,
                           probes: list[str] | None = None) -> DataFrame:
    """D5 ``semi_join_deep_search``: candidate messages for unnamed
    users, capped (reference: user_mapper.py:188-198 ``u IN (...) OR
    content LIKE '%User ID:%' AND content LIKE '%Email:%' ... LIMIT
    500``).  The OR arm means this is NOT a plain semi join: the id-set
    membership is marked via a broadcast left join and OR-ed with the
    content probes, preserving each row exactly once — a union of two
    arms would double-scan the corpus and double-count rows matching
    both.  *unnamed* must be distinct on *key* (it is, by construction,
    from :func:`unnamed_users`).  The cap is ordered by a key so the
    candidate set is deterministic — an unordered LIMIT is a correctness
    bug under Spark's parallel execution."""
    if not probes or content_col is None:
        return (messages.join(unnamed, key, "left_semi")
                .orderBy(order_col).limit(cap))
    marked = unnamed.select(key).withColumn("_hit", F.lit(True))
    probe_pred = F.col(content_col).contains(probes[0])
    for p in probes[1:]:
        probe_pred = probe_pred & F.col(content_col).contains(p)
    return (
        messages.join(F.broadcast(marked), key, "left")
        .filter(F.col("_hit").isNotNull() | probe_pred)
        .drop("_hit")
        .orderBy(order_col).limit(cap)
    )


def first_per_group(df: DataFrame, group_col: str, order_cols: list,
                    rn_col: str = "rn") -> DataFrame:
    """E6 ``agg_group_first``: first qualifying row per group — the
    window rewrite of the reference's correlated ``ORDER BY .. LIMIT 1``
    lookups (processor.py:211-216, :231-235)."""
    w = Window.partitionBy(group_col).orderBy(*order_cols)
    return (df.withColumn(rn_col, F.row_number().over(w))
              .filter(F.col(rn_col) == 1).drop(rn_col))


def conversation_dim(messages: DataFrame, sid_col: str, ts_col: str,
                     content_col: str, info_types: list,
                     creation_types: list, type_col: str,
                     tiebreak_col: str | None = None) -> DataFrame:
    """D2 ``join_conv_name``: one name per session, priority-ordered:
    (1) first group-info message carrying a valid name probe,
    (2) earliest creation message, else callers coalesce to the user dim
    / the sid itself.  Reference: processor.py:192-264.

    Built once over the corpus; search-time resolution becomes a
    broadcast join against this dim instead of the reference's per-result
    re-query (embeddings/processor.py:548-617).
    """
    name = textops.group_name_probe(F.col(content_col))
    candidates = (
        messages
        .filter(F.col(type_col).isin(list(info_types) + list(creation_types)))
        .withColumn("conv_name_candidate", name)
        .withColumn(
            "priority",
            F.when(F.col(type_col).isin(info_types)
                   & F.col("conv_name_candidate").isNotNull(), F.lit(0))
            .otherwise(F.lit(1)))
        .filter(F.col("conv_name_candidate").isNotNull())
    )
    # the name pick is row_number == 1, so the ordering MUST be total
    # (r14 review: the old optional default silently permitted the
    # nondeterminism this module's own docstrings classify as a
    # correctness bug) — fall back to the candidate name itself, which
    # completes the order deterministically even without a unique id
    order = ["priority", ts_col,
             tiebreak_col if tiebreak_col else "conv_name_candidate"]
    w = Window.partitionBy(sid_col).orderBy(*order)
    return (
        candidates.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(F.col(sid_col).alias("session_id"),
                F.col("conv_name_candidate").alias("conversation_name"))
    )
