"""load_table schema-drift contract.

The driver regenerated testdata between rounds 3 and 4 and events.ts
silently changed physical encoding (int64 nanoseconds → timestamp[us],
which Spark 4 reads as TIMESTAMP_NTZ). Every events-based query errored
that round. These tests pin that load_table normalizes ALL ts encodings
that have shipped — ns-as-long, timestamp[us] (NTZ), and tz-adjusted
timestamp — to identical microsecond TimestampType instants, so the next
regeneration can't take the catalog down.
"""

from __future__ import annotations

import datetime

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import types as T

from surge_spark.io import load_table

_INSTANTS_US = [1_700_000_000_123_456, 1_700_000_003_654_321]


def _write_events(tmp_path, ts_array) -> str:
    table = pa.table(
        {
            "event_id": pa.array([1, 2], pa.int64()),
            "ts": ts_array,
            "user_id": pa.array([10, 20], pa.int64()),
            "event_type": pa.array(["click", "view"], pa.string()),
            "value": pa.array([1.5, 2.5], pa.float64()),
            "props": pa.array(["{}", "{}"], pa.string()),
        }
    )
    pq.write_table(table, str(tmp_path / "events.parquet"))
    return str(tmp_path)


@pytest.mark.parametrize(
    "ts_type",
    [
        pa.int64(),  # legacy ns-as-long generation
        pa.timestamp("ns"),  # ns logical type (Spark needs nanosAsLong)
        pa.timestamp("us"),  # round-4 generation (Spark reads TIMESTAMP_NTZ)
        pa.timestamp("us", tz="UTC"),  # tz-adjusted variant
    ],
    ids=["int64-ns", "timestamp-ns", "timestamp-us-ntz", "timestamp-us-utc"],
)
def test_load_table_normalizes_every_ts_encoding(spark, tmp_path, ts_type):
    if ts_type == pa.int64() or ts_type == pa.timestamp("ns"):
        values = [us * 1000 for us in _INSTANTS_US]  # nanoseconds
    else:
        values = list(_INSTANTS_US)  # microseconds
    arr = (
        pa.array(values, pa.int64())
        if ts_type == pa.int64()
        else pa.array(values, pa.int64()).cast(ts_type)
    )
    sf_dir = _write_events(tmp_path, arr)

    df = load_table(spark, sf_dir, "events")
    assert isinstance(df.schema["ts"].dataType, T.TimestampType)
    got = [r.ts for r in df.select("ts").orderBy("event_id").collect()]
    want = [
        datetime.datetime.fromtimestamp(us / 1_000_000, tz=datetime.timezone.utc).replace(
            tzinfo=None
        )
        for us in _INSTANTS_US
    ]
    assert got == want


_DATE_US = [852_076_800_000_000, 936_230_400_000_000]  # 1997-01-01, 1999-09-02


def _write_orders(tmp_path, date_array) -> str:
    table = pa.table(
        {
            "o_orderkey": pa.array([1, 2], pa.int64()),
            "o_custkey": pa.array([10, 20], pa.int64()),
            "o_orderstatus": pa.array(["O", "F"], pa.string()),
            "o_totalprice": pa.array([100.0, 200.0], pa.float64()),
            "o_orderdate": date_array,
            "o_orderpriority": pa.array(["1-URGENT", "3-MEDIUM"], pa.string()),
        }
    )
    pq.write_table(table, str(tmp_path / "orders.parquet"))
    return str(tmp_path)


@pytest.mark.parametrize(
    "enc",
    ["int64-ns", "timestamp-ns", "timestamp-us-ntz", "date32"],
)
def test_load_table_normalizes_order_date_encodings(spark, tmp_path, enc):
    """o_orderdate is consumed as TIMESTAMP_NTZ wall clock by every
    TPC-H-shaped query; a regeneration to int64-ns / ns-logical / date32
    must normalize at load_table, tz-independently — the same contract
    events.ts earned after the r3 drift took all 21 events queries down."""
    if enc == "int64-ns":
        arr = pa.array([us * 1000 for us in _DATE_US], pa.int64())
    elif enc == "timestamp-ns":
        arr = pa.array([us * 1000 for us in _DATE_US], pa.int64()).cast(
            pa.timestamp("ns")
        )
    elif enc == "date32":
        arr = pa.array(
            [datetime.date(1997, 1, 1), datetime.date(1999, 9, 2)], pa.date32()
        )
    else:
        arr = pa.array(list(_DATE_US), pa.int64()).cast(pa.timestamp("us"))
    sf_dir = _write_orders(tmp_path, arr)

    df = load_table(spark, sf_dir, "orders")
    t = df.schema["o_orderdate"].dataType
    assert isinstance(t, (T.TimestampNTZType, T.TimestampType)), t
    got = sorted(r.o_orderdate for r in df.select("o_orderdate").collect())
    assert got == [
        datetime.datetime(1997, 1, 1),
        datetime.datetime(1999, 9, 2),
    ]
    # the catalog's NTZ-literal comparison must keep working on every
    # encoding (this is what broke with events in round 3)
    from pyspark.sql import functions as F

    n = df.where(
        F.col("o_orderdate") >= F.lit("1998-01-01").cast("timestamp_ntz")
    ).count()
    assert n == 1


# Logical-type contract per table: what the CATALOG assumes after
# load_table normalization. Physical encodings may drift between testdata
# generations (events.ts already shipped 4 ways) — this canary fails the
# suite with a named column the moment a regeneration introduces a type
# the normalizer doesn't map, instead of erroring 20 queries deep.
_LOGICAL_CONTRACT = {
    "events": {"ts": (T.TimestampType, T.TimestampNTZType),
               "user_id": (T.LongType,), "value": (T.DoubleType,),
               "event_type": (T.StringType,), "props": (T.StringType,)},
    "orders": {"o_orderdate": (T.TimestampType, T.TimestampNTZType),
               "o_orderkey": (T.LongType,), "o_totalprice": (T.DoubleType,)},
    "lineitem": {"l_shipdate": (T.TimestampType, T.TimestampNTZType),
                 "l_orderkey": (T.LongType,), "l_quantity": (T.DoubleType,),
                 "l_extendedprice": (T.DoubleType,), "l_discount": (T.DoubleType,)},
    "customer": {"c_custkey": (T.LongType,), "c_acctbal": (T.DoubleType,)},
    "supplier": {"s_suppkey": (T.LongType,), "s_acctbal": (T.DoubleType,)},
    "part": {"p_partkey": (T.LongType,), "p_retailprice": (T.DoubleType,)},
    "documents": {"doc_id": (T.LongType,), "text": (T.StringType,),
                  "n_chars": (T.LongType,)},
    "embeddings": {"vec_id": (T.LongType,), "embedding": (T.ArrayType,)},
}


@pytest.mark.parametrize("sf", ["sf0.001", "sf0.01"])
def test_schema_drift_canary(spark, sf):
    """Every table at every gate scale must normalize to the catalog's
    logical contract — the fast-fail diagnostic for testdata regeneration
    (CLAUDE.md: on mass errors, diff parquet schemas FIRST; this test IS
    that diff, run automatically)."""
    sf_dir = f"/root/testdata/{sf}"
    problems = []
    for table, cols in _LOGICAL_CONTRACT.items():
        df = load_table(spark, sf_dir, table)
        for col, allowed in cols.items():
            if col not in df.columns:
                problems.append(f"{sf}/{table}.{col}: MISSING")
                continue
            t = df.schema[col].dataType
            if not isinstance(t, allowed):
                problems.append(f"{sf}/{table}.{col}: {t} not in {allowed}")
        if table == "embeddings":
            el = df.schema["embedding"].dataType.elementType
            if not isinstance(el, (T.FloatType, T.DoubleType)):
                problems.append(f"{sf}/embeddings.embedding element: {el}")
    assert not problems, "testdata schema drift detected:\n" + "\n".join(problems)
