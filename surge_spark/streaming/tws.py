"""transformWithState-based stateful operators (Spark 4's successor to
applyInPandasWithState: typed per-key state handles, native state TTL,
timers). The reference's actor model keeps per-aggregate state in memory
with passivation after idle (R7, GenericAggregateActor passivation /
surge.state.passivate-timeout) — ``ttlDurationMs`` on a ValueState is the
engine-native expression of exactly that contract: state the stream hasn't
touched for the TTL disappears, and the next command for the key starts
from None (the reference re-hydrates from the KTable; here the snapshot
store plays that role, so TTL'd stream state is a cache, not the source of
truth).

The fold/window paths keep their applyInPandasWithState implementations
(windows.py, fold.py) — this module pins the NEW API surface so the engine
is demonstrably portable to it; running_counts_tws is the A3 counter on
transformWithState with optional R7-style TTL.

ENVIRONMENT GATE — PERMANENT in this container (same class as grpcio /
JPEG decode): executing a transformWithState query requires the
``google.protobuf`` runtime — the TWS driver worker speaks Spark's
StateMessage protocol over protobuf
(pyspark/sql/streaming/proto/StateMessage_pb2.py). Closure investigated
r7→r10: the container first shipped a broken protobuf ("cannot import
name 'descriptor'") and by r10 has NO ``google`` package at all
(``ModuleNotFoundError: No module named 'google'``; pip installs are
prohibited). A vendored shim is not viable: the generated _pb2 module
requires descriptor_pool.AddSerializedFile + the internal builder — i.e.
the entire pure-Python protobuf runtime, not a stub. The code below is
the real, correct usage of the API and runs unmodified on any standard
cluster (protobuf ships with every pyspark[connect]/Databricks/EMR
runtime); tests/test_streaming.py carries the end-to-end test behind a
skip on exactly this probe, and ``tws_available()`` lets callers check
before wiring a stream. This gate is expected to stay closed here and
open everywhere real.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)

from ..session import ensure_shipped


def tws_available() -> bool:
    """True iff transformWithState queries can execute here: the TWS
    driver worker imports google.protobuf.descriptor at startup, so its
    absence fails every query with a cryptic worker crash — probe first."""
    try:
        import google.protobuf.descriptor  # noqa: F401

        return True
    except ImportError:
        return False


class RunningCountProcessor(StatefulProcessor):
    """Per-key running event count in a ValueState; with ``ttl_ms`` the
    count passivates after idle (R7) — the next batch for the key restarts
    from zero, mirroring an actor that passivated and lost its in-memory
    state (durable truth stays in the snapshot store)."""

    def __init__(self, ttl_ms: int | None = None) -> None:
        self.ttl_ms = ttl_ms

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._count = handle.getValueState(
            "count", "n long", ttlDurationMs=self.ttl_ms
        )

    def handleInputRows(
        self, key: Any, rows: Iterator[pd.DataFrame], timerValues: Any
    ) -> Iterator[pd.DataFrame]:
        total = sum(len(pdf) for pdf in rows)
        prev = self._count.get()
        n = (prev[0] if prev is not None else 0) + total
        self._count.update((n,))
        yield pd.DataFrame({"key": [key[0]], "n": [n]})

    def close(self) -> None:
        pass


def running_counts_tws(
    stream: DataFrame, key_col: str, ttl_ms: int | None = None
) -> DataFrame:
    """A3 per-key running counts over transformWithStateInPandas (update
    mode, processing-time): emits (key, n) for every key a batch touches.
    State is one long per key — O(keys), partitioned by Spark's state
    store exactly like the applyInPandasWithState twin."""
    ensure_shipped(stream.sparkSession)
    return (
        stream.select(F.col(key_col).cast("string").alias("key"))
        .groupBy("key")
        .transformWithStateInPandas(
            statefulProcessor=RunningCountProcessor(ttl_ms=ttl_ms),
            outputStructType="key string, n long",
            outputMode="Update",
            timeMode="ProcessingTime",
        )
    )
