"""Table loaders and view registration.

Reads are always schema-explicit (no inference) so Catalyst can prune columns
and push predicates into the parquet scan. At 100 TB these tables would be
partitioned/bucketed; the loaders only declare the logical source — physical
layout concerns (partition columns, bucketing) live with the writer side in
``operators.snapshot``.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from . import TABLES

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


# Session-scoped table registry: a real engine registers a table once and
# every query references the same relation. Re-calling spark.read.parquet
# per query invocation re-builds the FileIndex and re-analyzes the base
# relation (~0.15 s per table per call, 2.5 s for the first); the catalog
# queries load up to 5 tables each, so the registry saves ~0.5 s of pure
# overhead per invocation. Values hold the owning session so a dead
# session's id() can't be reused by a new one while its entry is alive.
#
# Stopped sessions are evicted on every lookup so the cache can't pin dead
# SparkSessions (and their FileIndexes) for the process lifetime. NOTE:
# because the cached DataFrame holds a resolved file listing, regenerating
# parquet files in place while a session is alive serves stale data — start
# a new session or call clear_table_cache() after in-place regeneration.
_TABLE_CACHE: dict[tuple[int, str, str], tuple[SparkSession, DataFrame]] = {}


def clear_table_cache() -> None:
    """Drop every cached relation (use after in-place testdata rewrite)."""
    _TABLE_CACHE.clear()


def _evict_stopped_sessions() -> None:
    dead = []
    for key, (sess, _) in _TABLE_CACHE.items():
        try:
            stopped = sess._sc._jsc is None  # classic mode: stop() nulls the JVM ctx
        except Exception:
            stopped = True
        if stopped:
            dead.append(key)
    for key in dead:
        _TABLE_CACHE.pop(key, None)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one testdata table.

    Parquet footers are self-describing, so no schema inference cost; the
    declared StructTypes in ``schemas`` are the logical contract. The events
    table's ``ts`` column has shipped in two physical encodings across
    testdata generations — int64 nanoseconds (which Spark only reads as
    long) and native timestamp[us] (which Spark 4 reads as TIMESTAMP_NTZ) —
    so normalize whatever is on disk to microsecond TimestampType. DuckDB
    reads both encodings as TIMESTAMP natively (ns truncates to us), so the
    oracle side needs no branch."""
    key = (id(spark), os.path.abspath(sf_dir), name)
    cached = _TABLE_CACHE.get(key)
    if cached is not None and cached[0] is spark:
        if name == "events":
            # the NTZ→timestamp cast executes lazily: a later change to the
            # session tz would silently shift instants, so re-assert UTC on
            # the cache-hit path too (conf.set is a cheap local call)
            spark.conf.set("spark.sql.session.timeZone", "UTC")
        return cached[1]
    _evict_stopped_sessions()
    df = _load_table_uncached(spark, sf_dir, name)
    _TABLE_CACHE[key] = (spark, df)
    return df


# Tables with timestamp-carrying columns that have drifted (events.ts,
# r1-r3 int64-ns → r4 timestamp[us]) or could drift the same way in a
# future regeneration. orders/lineitem date columns are compared against
# TIMESTAMP_NTZ literals throughout the catalog, so a silent re-encoding
# to int64-ns or date32 would error or hash-mismatch every TPC-H-shaped
# query — normalize here, at the only read site, like events.ts.
_TS_COLUMNS: dict[str, list[str]] = {
    "events": ["ts"],
    "orders": ["o_orderdate"],
    "lineitem": ["l_shipdate"],
}

_NTZ_EPOCH = "TIMESTAMP_NTZ '1970-01-01 00:00:00'"


def _load_table_uncached(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    ts_cols = _TS_COLUMNS.get(name)
    if not ts_cols:
        return spark.read.parquet(table_path(sf_dir, name))
    # without this, a parquet TIMESTAMP(NANOS) column refuses to load at
    # all; with it, ns columns arrive as long and are converted below —
    # a no-op for every other encoding
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    if name == "events":
        # events.ts carries naive-UTC instants; pin the session tz so
        # bucketing (date_trunc/window) and toPandas rendering match the
        # DuckDB oracle's naive timestamps on any driver configuration
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    df = spark.read.parquet(table_path(sf_dir, name))
    for col in ts_cols:
        ts_type = df.schema[col].dataType
        if name == "events":
            if isinstance(ts_type, T.LongType):
                # legacy ns-as-long: truncate to us (DuckDB-identical)
                df = df.withColumn(
                    col, F.timestamp_micros(F.expr(f"{col} div 1000"))
                )
            elif not isinstance(ts_type, T.TimestampType):
                # TIMESTAMP_NTZ (or anything else): reinterpret the
                # wall-clock in the UTC session tz — identical instants,
                # stable window()/date_trunc()/unix_micros() semantics
                df = df.withColumn(col, F.col(col).cast("timestamp"))
        else:
            # orders/lineitem dates are consumed as TIMESTAMP_NTZ (queries
            # compare wall-clock literals); convert drifted encodings
            # tz-INDEPENDENTLY (no session-tz reinterpretation anywhere)
            if isinstance(ts_type, T.LongType):
                # int64-ns since epoch → NTZ wall clock, arithmetic only
                df = df.withColumn(
                    col,
                    F.expr(f"timestampadd(MICROSECOND, {col} div 1000, {_NTZ_EPOCH})"),
                )
            elif isinstance(ts_type, T.DateType):
                # date32 → NTZ midnight (pure widening, no tz involved)
                df = df.withColumn(col, F.col(col).cast("timestamp_ntz"))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register every testdata table as a temp view (for spark.sql paths)."""
    dfs = load_tables(spark, sf_dir)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs
