"""Explicit StructType schemas for every fixture table (FIXTURES.md) and
the engine's derived tables.

The reference relies on SQLite dynamic typing and opportunistic dict
probing (reference: src/core/database/processor.py:133-148,
src/core/database/user_mapper.py:103-109).  This engine pins every table
to an explicit schema; JSON-in-string columns are parsed with
``from_json`` against the struct types declared here.
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# Fixture tables (ground truth: parquet footers under /root/testdata)
# ---------------------------------------------------------------------------

DOCUMENTS = T.StructType([
    T.StructField("doc_id", T.LongType(), False),
    T.StructField("text", T.StringType(), True),
    T.StructField("lang", T.StringType(), True),
    T.StructField("source", T.StringType(), True),
    T.StructField("n_chars", T.LongType(), True),
])

EMBEDDINGS = T.StructType([
    T.StructField("vec_id", T.LongType(), False),
    T.StructField("embedding", T.ArrayType(T.FloatType()), True),
    T.StructField("label", T.IntegerType(), True),
])

EVENTS = T.StructType([
    T.StructField("event_id", T.LongType(), False),
    T.StructField("ts", T.TimestampType(), True),
    T.StructField("user_id", T.LongType(), True),
    T.StructField("event_type", T.StringType(), True),
    T.StructField("value", T.DoubleType(), True),
    T.StructField("props", T.StringType(), True),
])

REGION = T.StructType([
    T.StructField("r_regionkey", T.IntegerType(), False),
    T.StructField("r_name", T.StringType(), True),
])

NATION = T.StructType([
    T.StructField("n_nationkey", T.IntegerType(), False),
    T.StructField("n_name", T.StringType(), True),
    T.StructField("n_regionkey", T.IntegerType(), True),
])

CUSTOMER = T.StructType([
    T.StructField("c_custkey", T.LongType(), False),
    T.StructField("c_name", T.StringType(), True),
    T.StructField("c_nationkey", T.IntegerType(), True),
    T.StructField("c_acctbal", T.DoubleType(), True),
    T.StructField("c_mktsegment", T.StringType(), True),
])

SUPPLIER = T.StructType([
    T.StructField("s_suppkey", T.LongType(), False),
    T.StructField("s_name", T.StringType(), True),
    T.StructField("s_nationkey", T.IntegerType(), True),
    T.StructField("s_acctbal", T.DoubleType(), True),
])

PART = T.StructType([
    T.StructField("p_partkey", T.LongType(), False),
    T.StructField("p_name", T.StringType(), True),
    T.StructField("p_brand", T.StringType(), True),
    T.StructField("p_type", T.StringType(), True),
    T.StructField("p_size", T.IntegerType(), True),
    T.StructField("p_retailprice", T.DoubleType(), True),
])

ORDERS = T.StructType([
    T.StructField("o_orderkey", T.LongType(), False),
    T.StructField("o_custkey", T.LongType(), True),
    T.StructField("o_orderstatus", T.StringType(), True),
    T.StructField("o_totalprice", T.DoubleType(), True),
    T.StructField("o_orderdate", T.TimestampType(), True),
    T.StructField("o_orderpriority", T.StringType(), True),
])

LINEITEM = T.StructType([
    T.StructField("l_orderkey", T.LongType(), False),
    T.StructField("l_partkey", T.LongType(), True),
    T.StructField("l_suppkey", T.LongType(), True),
    T.StructField("l_linenumber", T.IntegerType(), True),
    T.StructField("l_quantity", T.DoubleType(), True),
    T.StructField("l_extendedprice", T.DoubleType(), True),
    T.StructField("l_discount", T.DoubleType(), True),
    T.StructField("l_tax", T.DoubleType(), True),
    T.StructField("l_returnflag", T.StringType(), True),
    T.StructField("l_linestatus", T.StringType(), True),
    T.StructField("l_shipdate", T.TimestampType(), True),
])

TABLES: dict[str, T.StructType] = {
    "documents": DOCUMENTS,
    "embeddings": EMBEDDINGS,
    "events": EVENTS,
    "region": REGION,
    "nation": NATION,
    "customer": CUSTOMER,
    "supplier": SUPPLIER,
    "part": PART,
    "orders": ORDERS,
    "lineitem": LINEITEM,
}

# ---------------------------------------------------------------------------
# Derived / engine-internal tables
# ---------------------------------------------------------------------------

# The reference's vector store row (message_embeddings DDL,
# reference: src/core/embeddings/processor.py:135-150) — embedding kept as
# a native float array rather than JSON-encoded text.
MESSAGE_EMBEDDINGS = T.StructType([
    T.StructField("message_id", T.StringType(), False),
    T.StructField("session_id", T.StringType(), True),
    T.StructField("user_id", T.LongType(), True),
    T.StructField("user_name", T.StringType(), True),
    T.StructField("conversation_type", T.StringType(), True),
    T.StructField("conversation_name", T.StringType(), True),
    T.StructField("message_text", T.StringType(), True),
    T.StructField("message_time", T.StringType(), True),
    T.StructField("ts", T.TimestampType(), True),
    T.StructField("has_quote", T.BooleanType(), True),
    T.StructField("context_prev", T.StringType(), True),
    T.StructField("context_next", T.StringType(), True),
    T.StructField("embedding", T.ArrayType(T.FloatType()), True),
])

# Single-row watermark state (replaces the reference's vector_metadata KV
# table, reference: src/core/embeddings/processor.py:159-164).
WATERMARK_STATE = T.StructType([
    T.StructField("key", T.StringType(), False),
    T.StructField("ts", T.TimestampType(), True),
])

# Group-info message content (reference: src/core/database/user_mapper.py:
# 112-137 probes {"n": ..., "u": [{"uid":..,"n":..}]} dicts dynamically).
GROUP_INFO_JSON = T.StructType([
    T.StructField("n", T.StringType(), True),
    T.StructField("gn", T.StringType(), True),
    T.StructField("group_name", T.StringType(), True),
    T.StructField("u", T.ArrayType(T.StructType([
        T.StructField("uid", T.LongType(), True),
        T.StructField("n", T.StringType(), True),
    ])), True),
])

# Message content: either {"text": ...} or a list of segments
# (reference: src/core/database/processor.py:133-148).
MESSAGE_TEXT_OBJ = T.StructType([T.StructField("text", T.StringType(), True)])
MESSAGE_TEXT_ARR = T.ArrayType(MESSAGE_TEXT_OBJ)
