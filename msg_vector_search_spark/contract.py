"""Driver-contract query registry.

Every implemented operator from SURVEY.md section 2 (plus the
training-data-pipeline extension surface) registers here as a
``(spark, sf_dir) -> DataFrame`` callable together with the ANSI-SQL
oracle DuckDB runs over the same parquet tables.  ``__spark_entry__.py``
re-exports the registry.

Determinism rules applied uniformly (SURVEY section 7 hard points):

* every computed column is aliased identically in Spark and SQL;
* every float that passes through non-deterministically-ordered
  aggregation is rounded onto a grid far coarser than the worst-case
  float error but finer than the data's true decimals;
* derived floats (avg, ratios) are computed FROM the already-rounded
  inputs so both engines divide identical doubles;
* every top-k / limit is ordered with an explicit unique tiebreak key.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window

from .functions import analysis, textops, vector as V
from .operators import aggregates as agg_ops
from .operators import dedup as dedup_ops
from .operators import dims as dims_ops
from .operators import enrich as enrich_ops
from .operators import filters as filter_ops
from .operators import ivf as ivf_ops
from .operators import similarity as sim_ops
from .operators import topk as topk_ops
from .sources import readers, state

QueryFn = Callable[[SparkSession, str], DataFrame]

REGISTRY: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def rnd(col, n: int):
    """Grid rounding with signed-zero normalization (+0.0 folds -0.0 to
    0.0 — DuckDB and Spark disagree on round()'s zero sign)."""
    return F.round(col, n) + F.lit(0.0)


def duck_rnd(expr: str, n: int) -> str:
    """DuckDB twin of :func:`rnd`."""
    return f"(round({expr}, {n}) + 0)"


def register(name: str, oracle: str | None = None):
    def deco(fn: QueryFn) -> QueryFn:
        REGISTRY[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn
    return deco


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    # The driver hands us its own session; pin the runtime confs the
    # oracle comparison depends on (UTC rendering matches DuckDB's
    # naive timestamps).
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return readers.read_table(spark, sf_dir, name)


# The fixed query vector for single-query similarity operators: the
# stored embedding of vec_id = 0 (deterministic, exists at every sf).
def _query_vec(spark: SparkSession, sf_dir: str) -> list[float]:
    row = (_t(spark, sf_dir, "embeddings")
           .filter(F.col("vec_id") == 0).select("embedding").head())
    return [float(x) for x in row[0]]


_DUCK_QVEC = "(SELECT embedding FROM embeddings WHERE vec_id = 0)"


# =========================================================================
# Similarity family (SURVEY 2.C C10/C8, 2.B B7, 2.D D6, 2.F F1)
# =========================================================================

@register("cosine_similarity", oracle=f"""
SELECT e.vec_id,
       (round({V.duck_cosine('e.embedding', 'q.qv')}, 6) + 0) AS sim
FROM embeddings e, (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0) q
""")
def cosine_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C10: cosine of every stored vector against the fixed query vector.
    Reference: src/core/embeddings/processor.py:413-434."""
    qv = _query_vec(spark, sf_dir)
    return (
        sim_ops.similarity_to_query(_t(spark, sf_dir, "embeddings"), qv)
        .select("vec_id", rnd(F.col("sim"), 6).alias("sim"))
    )


@register("round_sim", oracle=f"""
SELECT e.vec_id,
       (round((round({V.duck_cosine('e.embedding', 'q.qv')}, 6) + 0), 3) + 0)
         AS similarity_score
FROM embeddings e, (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0) q
""")
def round_sim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C8: presentation rounding (reference: engine.py:203)."""
    qv = _query_vec(spark, sf_dir)
    return (
        sim_ops.similarity_to_query(_t(spark, sf_dir, "embeddings"), qv)
        .select("vec_id",
                (textops.round_sim(rnd(F.col("sim"), 6)) + F.lit(0.0))
                .alias("similarity_score"))
    )


@register("filter_sim_threshold", oracle=f"""
SELECT vec_id, label, sim FROM (
  SELECT e.vec_id, e.label,
         (round({V.duck_cosine('e.embedding', 'q.qv')}, 6) + 0) AS sim
  FROM embeddings e,
       (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0) q
) WHERE sim >= 0.3
""")
def filter_sim_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B7: threshold post-filter, default 0.3 (reference:
    embeddings/processor.py:508, server.py:206)."""
    qv = _query_vec(spark, sf_dir)
    scored = (
        sim_ops.similarity_to_query(_t(spark, sf_dir, "embeddings"), qv)
        .withColumn("sim", rnd(F.col("sim"), 6))
    )
    return filter_ops.sim_threshold(scored, 0.3).select("vec_id", "label", "sim")


@register("topk_by_similarity", oracle=f"""
SELECT vec_id, label, sim FROM (
  SELECT e.vec_id, e.label,
         (round({V.duck_cosine('e.embedding', 'q.qv')}, 6) + 0) AS sim
  FROM embeddings e,
       (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0) q
) WHERE sim >= 0.0
ORDER BY sim DESC, vec_id ASC LIMIT 30
""")
def topk_by_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1 THE flagship: score -> threshold -> deterministic top-30
    (reference: embeddings/processor.py:528-529; defaults server.py:205).
    Plans TakeOrderedAndProject — per-partition heaps, no global sort."""
    qv = _query_vec(spark, sf_dir)
    return (
        sim_ops.knn_search(_t(spark, sf_dir, "embeddings"), qv, k=30,
                           threshold=0.0)
        .select("vec_id", "label", "sim")
    )


@register("knn_broadcast_join", oracle=f"""
WITH q AS (
  SELECT vec_id AS q_id, embedding AS qv FROM embeddings WHERE vec_id < 3
), scored AS (
  SELECT q.q_id, e.vec_id,
         (round({V.duck_cosine('e.embedding', 'q.qv')}, 6) + 0) AS sim
  FROM embeddings e CROSS JOIN q
), ranked AS (
  SELECT q_id, vec_id, sim,
         row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, vec_id ASC)
           AS rank
  FROM scored
)
SELECT q_id, vec_id, sim, CAST(rank AS INT) AS rank
FROM ranked WHERE rank <= 5
""")
def knn_broadcast_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D6: query-set vs corpus broadcast nested-loop KNN (reference
    generalization of embeddings/processor.py:489-525)."""
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_embedding"))
    out = sim_ops.knn_join(emb, queries, k=5)
    return out.withColumn("rank", F.col("rank").cast("int"))


# =========================================================================
# Scans / sinks / state (SURVEY 2.A)
# =========================================================================

@register("scan_messages", oracle="""
SELECT doc_id, text, lang, source, n_chars FROM documents
""")
def scan_messages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1: projected columnar scan (reference: processor.py:428-435)."""
    return readers.scan_messages(spark, sf_dir)


@register("scan_latest_file", oracle="""
SELECT event_id, ts, user_id, event_type, value
FROM events WHERE ts = (SELECT max(ts) FROM events)
""")
def scan_latest_file(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2: newest-snapshot-wins discovery, data-level analog
    (reference: connection.py:56-76)."""
    return readers.scan_latest_rows(spark, sf_dir)


@register("sink_upsert_embeddings", oracle="""
WITH batches AS (
  SELECT vec_id, label, 1 AS batch FROM embeddings
  UNION ALL
  SELECT vec_id, label + 100 AS label, 2 AS batch
  FROM embeddings WHERE vec_id % 5 = 0
), ranked AS (
  SELECT vec_id, label, batch,
         row_number() OVER (PARTITION BY vec_id
                            ORDER BY batch DESC, vec_id) AS rn
  FROM batches
)
SELECT vec_id, label, batch FROM ranked WHERE rn = 1
""")
def sink_upsert_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5: INSERT OR REPLACE as union + last-writer-wins dedup — batch 2
    re-writes every 5th vector; its rows must shadow batch 1's
    (reference: embeddings/processor.py:326-411)."""
    emb = _t(spark, sf_dir, "embeddings").select("vec_id", "label")
    b1 = emb.withColumn("batch", F.lit(1))
    b2 = (emb.filter(F.col("vec_id") % 5 == 0)
          .withColumn("label", F.col("label") + 100)
          .withColumn("batch", F.lit(2)))
    merged = b1.unionByName(b2)
    return dedup_ops.dedup_last_wins(merged, "vec_id", "batch") \
        .select("vec_id", "label", "batch")


@register("watermark_read", oracle=f"""
WITH bounds AS (SELECT min(ts) AS min_ts, max(ts) AS max_ts FROM events),
cands AS (
  SELECT 'normal' AS k, min_ts + INTERVAL 1 DAY AS wm, max_ts AS as_of FROM bounds
  UNION ALL
  SELECT 'future', max_ts + INTERVAL 365 DAYS, max_ts FROM bounds
  UNION ALL
  SELECT 'ancient', max_ts - INTERVAL 7300 DAYS, max_ts FROM bounds
)
SELECT k, {state.duck_clamp_watermark('wm', 'as_of')} AS watermark
FROM cands
""")
def watermark_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7+H2: the three clamp behaviors (normal passthrough, future ->
    epoch reset, ancient -> as_of - 30 d), deterministic via an explicit
    as-of instant (reference: processor.py:32-75, guards :62-69)."""
    events = _t(spark, sf_dir, "events")
    bounds = events.agg(F.min("ts").alias("min_ts"), F.max("ts").alias("max_ts"))
    cands = bounds.selectExpr(
        "'normal' AS k", "min_ts + INTERVAL 1 DAY AS wm", "max_ts AS as_of"
    ).unionByName(bounds.selectExpr(
        "'future' AS k", "max_ts + INTERVAL 365 DAYS AS wm", "max_ts AS as_of"
    )).unionByName(bounds.selectExpr(
        "'ancient' AS k", "max_ts - INTERVAL 7300 DAYS AS wm", "max_ts AS as_of"
    ))
    return cands.select(
        "k", state.clamp_watermark(F.col("wm"), F.col("as_of")).alias("watermark"))


# =========================================================================
# Filters / predicates (SURVEY 2.B)
# =========================================================================

@register("filter_since_ts", oracle="""
SELECT event_id, ts, user_id FROM events
WHERE ts > (SELECT min(ts) + INTERVAL 5 DAYS FROM events)
""")
def filter_since_ts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B1: the incremental watermark predicate (reference:
    processor.py:349-353) — pushed down to the parquet scan."""
    events = _t(spark, sf_dir, "events")
    wm = events.agg(F.expr("min(ts) + INTERVAL 5 DAYS")).head()[0]
    return (filter_ops.since_ts(events, wm)
            .select("event_id", "ts", "user_id"))


@register("filter_like_json_probe", oracle="""
SELECT event_id, props FROM events
WHERE contains(props, '"k":') AND contains(props, '9')
""")
def filter_like_json_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B2: cheap contains-probe ahead of JSON parsing (reference:
    user_mapper.py:95-100)."""
    return (filter_ops.json_probe(_t(spark, sf_dir, "events"), "props",
                                  '"k":', "9")
            .select("event_id", "props"))


@register("filter_in_list", oracle="""
SELECT event_id, event_type FROM events
WHERE event_type IN ('click', 'view')
""")
def filter_in_list(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B3: type-code membership (reference: user_mapper.py:99)."""
    return (filter_ops.in_list(_t(spark, sf_dir, "events"), "event_type",
                               ["click", "view"])
            .select("event_id", "event_type"))


@register("filter_not_null_distinct", oracle="""
SELECT DISTINCT user_id FROM events WHERE user_id IS NOT NULL
""")
def filter_not_null_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B4 (reference: user_mapper.py:180)."""
    return filter_ops.not_null_distinct(_t(spark, sf_dir, "events"), "user_id")


_DUCK_DIRTY = ("""(text || ' see https://ex.com/p?id=' || doc_id """
               """|| ' ok✨ end')""")

@register("filter_nonempty_text", oracle=f"""
SELECT doc_id, cleaned FROM (
  SELECT doc_id,
         {textops.duck_clean_text("CASE WHEN doc_id % 7 = 0 THEN '   ' ELSE text END")} AS cleaned
  FROM documents
) WHERE length(trim(cleaned)) > 0
""")
def filter_nonempty_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B5: drop rows whose cleaned text is empty (reference:
    processor.py:449-451); every 7th row is blanked to exercise it."""
    docs = _t(spark, sf_dir, "documents").withColumn(
        "cleaned",
        textops.clean_text(
            F.when(F.col("doc_id") % 7 == 0, F.lit("   "))
            .otherwise(F.col("text"))))
    return filter_ops.nonempty_text(docs, "cleaned").select("doc_id", "cleaned")


@register("filter_dynamic_conj", oracle="""
SELECT doc_id, text, lang, source, n_chars FROM documents
WHERE lang = 'en' AND source = 'src3'
""")
def filter_dynamic_conj(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B6: optional-parameter conjunctive predicate (reference:
    embeddings/processor.py:472-486); the None parameter is skipped."""
    return filter_ops.dynamic_conjunction(
        _t(spark, sf_dir, "documents"),
        lang="en", source="src3", n_chars=None)


# =========================================================================
# Scalar text / json / time functions (SURVEY 2.C)
# =========================================================================

@register("json_extract_text", oracle="""
WITH c AS (
  SELECT doc_id,
    CASE doc_id % 4
      WHEN 0 THEN '{"text": "' || substr(text, 1, 20) || '"}'
      WHEN 1 THEN '[{"text": "' || substr(text, 1, 8) || '"}, {"text": "'
                  || lang || '"}]'
      WHEN 2 THEN text
      ELSE '{"x": 1}'
    END AS content
  FROM documents
)
SELECT doc_id,
  CASE substr(ltrim(content), 1, 1)
    WHEN '{' THEN coalesce(json_extract_string(content, '$.text'), '')
    WHEN '[' THEN coalesce(json_extract_string(content, '$[0].text'), '')
                  || ' ' || coalesce(json_extract_string(content, '$[1].text'), '')
    ELSE content
  END AS extracted
FROM c
""")
def json_extract_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C1: object => .text, array => joined segment texts, non-JSON =>
    raw passthrough, dict-without-text => '' (reference:
    processor.py:117-151).  Inputs constructed per doc_id % 4."""
    docs = _t(spark, sf_dir, "documents")
    content = (
        F.when(F.col("doc_id") % 4 == 0,
               F.concat(F.lit('{"text": "'), F.substring("text", 1, 20),
                        F.lit('"}')))
        .when(F.col("doc_id") % 4 == 1,
              F.concat(F.lit('[{"text": "'), F.substring("text", 1, 8),
                       F.lit('"}, {"text": "'), F.col("lang"), F.lit('"}]')))
        .when(F.col("doc_id") % 4 == 2, F.col("text"))
        .otherwise(F.lit('{"x": 1}'))
    )
    return docs.select(
        "doc_id",
        textops.extract_text(content).alias("extracted"))


@register("clean_text", oracle=f"""
SELECT doc_id, {textops.duck_clean_text(_DUCK_DIRTY)} AS cleaned
FROM documents
""")
def clean_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C2: whitespace collapse -> URL strip -> emoji/non-text strip ->
    trim, reference regexes in reference order (processor.py:153-178);
    a URL and an emoji are appended to every row to exercise all three."""
    docs = _t(spark, sf_dir, "documents")
    dirty = F.concat(F.col("text"), F.lit(" see https://ex.com/p?id="),
                     F.col("doc_id").cast("string"), F.lit(" ok✨ end"))
    return docs.select("doc_id", textops.clean_text(dirty).alias("cleaned"))


@register("fmt_human_time", oracle="""
SELECT event_id, strftime(ts, '%b %d, %Y at %I:%M %p') AS message_time
FROM events
""")
def fmt_human_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C3: '%b %d, %Y at %I:%M %p' (reference: processor.py:463-464)."""
    return _t(spark, sf_dir, "events").select(
        "event_id", textops.fmt_human_time(F.col("ts")).alias("message_time"))


@register("conv_type_from_sid", oracle="""
WITH s AS (
  SELECT event_id,
         CASE WHEN user_id % 3 = 0 THEN 'group-' || CAST(user_id AS VARCHAR)
              ELSE 'buddy-' || CAST(user_id AS VARCHAR) END AS session_id
  FROM events
)
SELECT event_id, session_id,
       CASE WHEN starts_with(session_id, 'group-') THEN 'group'
            ELSE 'private' END AS conversation_type,
       regexp_replace(session_id, '^buddy-', '') AS peer_id
FROM s
""")
def conv_type_from_sid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4: group/private from the sid prefix + buddy-prefix strip
    (reference: processor.py:203, :250-252)."""
    events = _t(spark, sf_dir, "events")
    sid = (F.when(F.col("user_id") % 3 == 0,
                  F.concat(F.lit("group-"), F.col("user_id").cast("string")))
           .otherwise(F.concat(F.lit("buddy-"), F.col("user_id").cast("string"))))
    return (events.withColumn("session_id", sid)
            .select("event_id", "session_id",
                    textops.conv_type_from_sid(F.col("session_id"))
                    .alias("conversation_type"),
                    textops.buddy_user_id(F.col("session_id")).alias("peer_id")))


@register("truncate_ellipsis", oracle="""
SELECT doc_id,
       CASE WHEN length(text) > 100 THEN substr(text, 1, 100) || '...'
            ELSE text END AS snippet
FROM documents
""")
def truncate_ellipsis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C5: 100-char context snippet (reference: processor.py:298, :313)."""
    return _t(spark, sf_dir, "documents").select(
        "doc_id", textops.truncate_ellipsis(F.col("text")).alias("snippet"))


@register("regex_name_from_email", oracle="""
WITH c AS (
  SELECT doc_id,
         'User ID: ' || CAST(doc_id AS VARCHAR) || ' Email: ' || source
         || '.' || lang || '@shopee.com' AS content
  FROM documents
)
SELECT doc_id,
       upper(substr(regexp_extract(content, 'Email: (\\w+)\\.(\\w+)@shopee\\.com', 1), 1, 1))
       || lower(substr(regexp_extract(content, 'Email: (\\w+)\\.(\\w+)@shopee\\.com', 1), 2))
       || ' '
       || upper(substr(regexp_extract(content, 'Email: (\\w+)\\.(\\w+)@shopee\\.com', 2), 1, 1))
       || lower(substr(regexp_extract(content, 'Email: (\\w+)\\.(\\w+)@shopee\\.com', 2), 2))
         AS user_name,
       CAST(regexp_extract(content, 'User ID: (\\d+)', 1) AS BIGINT) AS user_id
FROM c
""")
def regex_name_from_email(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C6: capitalized display name + numeric user id from email-bearing
    content (reference: user_mapper.py:24-25, :157-175)."""
    docs = _t(spark, sf_dir, "documents")
    content = F.concat(
        F.lit("User ID: "), F.col("doc_id").cast("string"),
        F.lit(" Email: "), F.col("source"), F.lit("."), F.col("lang"),
        F.lit("@shopee.com"))
    return docs.select(
        "doc_id",
        textops.name_from_email(content).alias("user_name"),
        textops.user_id_from_content(content).alias("user_id"))


@register("is_file_name", oracle="""
WITH n AS (
  SELECT doc_id,
    CASE doc_id % 6
      WHEN 0 THEN source || '.pdf'
      WHEN 1 THEN 'Screenshot ' || CAST(doc_id AS VARCHAR)
      WHEN 2 THEN 'a/b/' || CAST(doc_id AS VARCHAR)
      WHEN 3 THEN 'http://' || source
      WHEN 4 THEN 'x'
      ELSE 'Jane ' || source
    END AS name
  FROM documents
)
SELECT doc_id, name,
       (length(name) < 2 OR length(name) > 100
        OR ends_with(lower(name), '.pdf') OR ends_with(lower(name), '.doc')
        OR ends_with(lower(name), '.docx') OR ends_with(lower(name), '.xls')
        OR ends_with(lower(name), '.xlsx') OR ends_with(lower(name), '.ppt')
        OR ends_with(lower(name), '.pptx') OR ends_with(lower(name), '.png')
        OR ends_with(lower(name), '.jpg') OR ends_with(lower(name), '.jpeg')
        OR ends_with(lower(name), '.gif') OR ends_with(lower(name), '.mp4')
        OR ends_with(lower(name), '.mov') OR ends_with(lower(name), '.zip')
        OR ends_with(lower(name), '.txt')
        OR contains(lower(name), 'screenshot') OR contains(lower(name), 'image')
        OR contains(lower(name), 'photo')
        OR contains(name, '/') OR contains(name, '\\')
        OR starts_with(lower(name), 'http') OR starts_with(lower(name), 'www.')
       ) AS is_file
FROM n
""")
def is_file_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C7: filename-vs-display-name heuristic (reference:
    user_mapper.py:235-250) over six constructed name shapes."""
    docs = _t(spark, sf_dir, "documents")
    name = (
        F.when(F.col("doc_id") % 6 == 0, F.concat(F.col("source"), F.lit(".pdf")))
        .when(F.col("doc_id") % 6 == 1,
              F.concat(F.lit("Screenshot "), F.col("doc_id").cast("string")))
        .when(F.col("doc_id") % 6 == 2,
              F.concat(F.lit("a/b/"), F.col("doc_id").cast("string")))
        .when(F.col("doc_id") % 6 == 3, F.concat(F.lit("http://"), F.col("source")))
        .when(F.col("doc_id") % 6 == 4, F.lit("x"))
        .otherwise(F.concat(F.lit("Jane "), F.col("source")))
    )
    return (docs.withColumn("name", name)
            .select("doc_id", "name",
                    textops.is_file_name(F.col("name")).alias("is_file")))


@register("derived_pct", oracle="""
SELECT (round(100.0 * (SELECT count(*) FROM embeddings)
              / (SELECT count(*) FROM documents), 1) + 0) AS coverage_pct
""")
def derived_pct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C11: coverage percentage (reference: engine.py:274)."""
    emb = _t(spark, sf_dir, "embeddings").agg(F.count("*").alias("e"))
    docs = _t(spark, sf_dir, "documents").agg(F.count("*").alias("d"))
    return emb.crossJoin(docs).select(
        (textops.coverage_pct(F.col("e"), F.col("d")) + F.lit(0.0))
        .alias("coverage_pct"))


@register("group_name_probe", oracle="""
WITH c AS (
  SELECT doc_id,
    CASE doc_id % 5
      WHEN 0 THEN '{"n": "' || source || '"}'
      WHEN 1 THEN '{"gn": "' || source || '"}'
      WHEN 2 THEN '{"group_name": "' || source || '"}'
      WHEN 3 THEN '{"n": ""}'
      ELSE 'not json'
    END AS content
  FROM documents
)
SELECT doc_id,
  CASE WHEN json_valid(content) THEN
    coalesce(
      CASE WHEN length(trim(json_extract_string(content, '$.n'))) > 0
            AND length(trim(json_extract_string(content, '$.n'))) < 100
           THEN trim(json_extract_string(content, '$.n')) END,
      CASE WHEN length(trim(json_extract_string(content, '$.gn'))) > 0
            AND length(trim(json_extract_string(content, '$.gn'))) < 100
           THEN trim(json_extract_string(content, '$.gn')) END,
      CASE WHEN length(trim(json_extract_string(content, '$.group_name'))) > 0
            AND length(trim(json_extract_string(content, '$.group_name'))) < 100
           THEN trim(json_extract_string(content, '$.group_name')) END
    ) END AS conv_name
FROM c
""")
def group_name_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C12: group display-name probe with fallback keys and the
    0 < len < 100 guard (reference: processor.py:218-247)."""
    docs = _t(spark, sf_dir, "documents")
    content = (
        F.when(F.col("doc_id") % 5 == 0,
               F.concat(F.lit('{"n": "'), F.col("source"), F.lit('"}')))
        .when(F.col("doc_id") % 5 == 1,
              F.concat(F.lit('{"gn": "'), F.col("source"), F.lit('"}')))
        .when(F.col("doc_id") % 5 == 2,
              F.concat(F.lit('{"group_name": "'), F.col("source"), F.lit('"}')))
        .when(F.col("doc_id") % 5 == 3, F.lit('{"n": ""}'))
        .otherwise(F.lit("not json"))
    )
    return docs.select(
        "doc_id", textops.group_name_probe(content).alias("conv_name"))
