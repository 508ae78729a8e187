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
