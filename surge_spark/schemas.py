"""Explicit schemas — testdata tables plus the event-sourcing fixtures.

Surge is schema-agnostic (state/events are ``Array[Byte]`` with a string key,
SerializedMessage.scala:6); user codecs give the real shape. Here every shape
is an explicit StructType so scans never pay inference and parquet readers
prune columns (ReadSchema pushdown).

Fixture shapes follow FIXTURES.md / the reference's canonical test domains:
CountAggregate (TestBoundedContext.scala:17-175) and BankAccount
(BankAccountCommandModel.scala:16-88).
"""

from __future__ import annotations

from pyspark.sql import types as T

# --- driver testdata tables (verified against /root/testdata/sf0.001) -------

REGION = T.StructType(
    [
        T.StructField("r_regionkey", T.IntegerType()),
        T.StructField("r_name", T.StringType()),
    ]
)

NATION = T.StructType(
    [
        T.StructField("n_nationkey", T.IntegerType()),
        T.StructField("n_name", T.StringType()),
        T.StructField("n_regionkey", T.IntegerType()),
    ]
)

CUSTOMER = T.StructType(
    [
        T.StructField("c_custkey", T.LongType()),
        T.StructField("c_name", T.StringType()),
        T.StructField("c_nationkey", T.IntegerType()),
        T.StructField("c_acctbal", T.DoubleType()),
        T.StructField("c_mktsegment", T.StringType()),
    ]
)

SUPPLIER = T.StructType(
    [
        T.StructField("s_suppkey", T.LongType()),
        T.StructField("s_name", T.StringType()),
        T.StructField("s_nationkey", T.IntegerType()),
        T.StructField("s_acctbal", T.DoubleType()),
    ]
)

PART = T.StructType(
    [
        T.StructField("p_partkey", T.LongType()),
        T.StructField("p_name", T.StringType()),
        T.StructField("p_brand", T.StringType()),
        T.StructField("p_type", T.StringType()),
        T.StructField("p_size", T.IntegerType()),
        T.StructField("p_retailprice", T.DoubleType()),
    ]
)

ORDERS = T.StructType(
    [
        T.StructField("o_orderkey", T.LongType()),
        T.StructField("o_custkey", T.LongType()),
        T.StructField("o_orderstatus", T.StringType()),
        T.StructField("o_totalprice", T.DoubleType()),
        T.StructField("o_orderdate", T.TimestampType()),
        T.StructField("o_orderpriority", T.StringType()),
    ]
)

LINEITEM = T.StructType(
    [
        T.StructField("l_orderkey", T.LongType()),
        T.StructField("l_partkey", T.LongType()),
        T.StructField("l_suppkey", T.LongType()),
        T.StructField("l_linenumber", T.IntegerType()),
        T.StructField("l_quantity", T.DoubleType()),
        T.StructField("l_extendedprice", T.DoubleType()),
        T.StructField("l_discount", T.DoubleType()),
        T.StructField("l_tax", T.DoubleType()),
        T.StructField("l_returnflag", T.StringType()),
        T.StructField("l_linestatus", T.StringType()),
        T.StructField("l_shipdate", T.TimestampType()),
    ]
)

EVENTS = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)

DOCUMENTS = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)

EMBEDDINGS = T.StructType(
    [
        T.StructField("vec_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.FloatType())),
        T.StructField("label", T.IntegerType()),
    ]
)

TABLE_SCHEMAS = {
    "region": REGION,
    "nation": NATION,
    "customer": CUSTOMER,
    "supplier": SUPPLIER,
    "part": PART,
    "orders": ORDERS,
    "lineitem": LINEITEM,
    "events": EVENTS,
    "documents": DOCUMENTS,
    "embeddings": EMBEDDINGS,
}

# --- event-sourcing fixture shapes (FIXTURES.md §1-§2) -----------------------

# CountAggregate: state {aggregate_id, count, version}
# (TestBoundedContext.scala:17-175; event key "aggId:seq" :159-161)
COUNT_STATE = T.StructType(
    [
        T.StructField("aggregate_id", T.StringType()),
        T.StructField("count", T.IntegerType()),
        T.StructField("version", T.IntegerType()),
    ]
)

COUNT_COMMAND = T.StructType(
    [
        T.StructField("command_id", T.StringType()),
        T.StructField("aggregate_id", T.StringType()),
        T.StructField("command_type", T.StringType()),
        T.StructField("ts", T.TimestampType()),
    ]
)

COUNT_EVENT = T.StructType(
    [
        T.StructField("event_key", T.StringType()),
        T.StructField("aggregate_id", T.StringType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("delta", T.IntegerType()),
        T.StructField("sequence_number", T.IntegerType()),
    ]
)

# BankAccount (BankAccountCommandModel.scala:16-88)
BANK_STATE = T.StructType(
    [
        T.StructField("account_number", T.StringType()),
        T.StructField("account_owner", T.StringType()),
        T.StructField("security_code", T.StringType()),
        T.StructField("balance", T.DoubleType()),
    ]
)

BANK_COMMAND = T.StructType(
    [
        T.StructField("command_id", T.StringType()),
        T.StructField("account_number", T.StringType()),
        T.StructField("command_type", T.StringType()),
        T.StructField("account_owner", T.StringType()),
        T.StructField("security_code", T.StringType()),
        T.StructField("amount", T.DoubleType()),
        T.StructField("ts", T.TimestampType()),
    ]
)

# Health-signal stream (SignalPatternMatcherDefinition.scala:37-58)
SIGNAL = T.StructType(
    [
        T.StructField("ts", T.TimestampType()),
        T.StructField("topic", T.StringType()),
        T.StructField("name", T.StringType()),
        T.StructField("signal_type", T.StringType()),  # ERROR | WARNING | TRACE
        T.StructField("description", T.StringType()),
        T.StructField("metadata", T.MapType(T.StringType(), T.StringType())),
    ]
)

# Metric readings (modules/metrics statistics inputs)
READING = T.StructType(
    [
        T.StructField("sensor", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("ts", T.TimestampType()),
    ]
)

# The engine-level record shape: surge moves opaque bytes + string key +
# string->string headers (SerializedMessage.scala:6). Kafka source columns
# map onto this 1:1.
SERIALIZED_MESSAGE = T.StructType(
    [
        T.StructField("key", T.StringType()),
        T.StructField("value", T.BinaryType()),
        T.StructField("headers", T.MapType(T.StringType(), T.StringType())),
    ]
)
