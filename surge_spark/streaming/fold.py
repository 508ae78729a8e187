"""Streaming per-key event fold — the SurgeEvent engine (§3.3), the purest
Structured Streaming shape of the reference: events stream → stateful fold →
state stream.

State lives in Spark's state store (RocksDB provider configured in
session.py — the direct analog of surge's RocksDB-backed KTable,
AggregateStateStoreKafkaStreams.scala:22-35) keyed by aggregate id, and
survives restarts via the checkpoint. Passivation (R7, 30 s idle stop,
reference.conf:155-160) maps to GroupStateTimeout: state for idle keys can
be expired instead of held forever.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator, Sequence
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import StructType

from ..operators.eventsourcing import _iter_rows
from ..session import ensure_shipped

EventHandler = Callable[[dict | None, dict[str, Any]], dict | None]


def stateful_fold_stream(
    events: DataFrame,
    key_col: str,
    order_cols: Sequence[str],
    handle_event: EventHandler,
    state_struct: StructType,
    output_struct: StructType | None = None,
    idle_timeout_ms: int | None = None,
    emit_tombstones: bool = False,
) -> DataFrame:
    """groupBy(key).applyInPandasWithState fold: within a micro-batch events
    fold in (order_cols) order; across batches state persists in the state
    store. Emits the updated state row per key per batch (state-only
    publish — and only when the fold actually changed the state, mirroring
    shouldPublish, PersistentActor.scala:245-264).

    ``idle_timeout_ms`` enables processing-time state expiry (R7
    passivation). Expired keys simply re-initialize from None on their next
    event — correct because the authoritative snapshot lives in the sink
    table, not executor memory (same split as surge: actor memory vs KTable).

    ``emit_tombstones``: the reference publishes whenever
    ``state.stateOpt != result.state`` INCLUDING transitions to None; with
    this flag the output gains a boolean ``__deleted`` column and a deletion
    yields one tombstone row carrying the LAST-KNOWN state values (so the
    sink has the key to delete by) with ``__deleted`` true, letting a
    downstream snapshot sink remove the key instead of serving the stale
    row forever. Off by default to keep the bare state-stream schema.
    """
    from pyspark.sql.types import BooleanType, StructField

    output_struct = output_struct or state_struct
    if emit_tombstones:
        output_struct = StructType(
            [*output_struct.fields, StructField("__deleted", BooleanType())]
        )
    field_names = [f.name for f in state_struct.fields]
    out_names = [f.name for f in output_struct.fields]
    order_cols = list(order_cols)
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if idle_timeout_ms
        else GroupStateTimeout.NoTimeout
    )

    def fold(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            # passivation: drop in-memory state; snapshot table is the truth
            state.remove()
            return
        prev = dict(zip(field_names, state.get)) if state.exists else None
        current = prev
        batch = pd.concat(list(pdfs), ignore_index=True)
        batch = batch.sort_values(order_cols, kind="mergesort")
        for event in _iter_rows(batch):
            current = handle_event(current, event)
        if current is None and prev is not None:
            # deletion: the handler folded the state away — remove it from
            # the state store (not just skip the update, which would leave
            # the stale state serving every later batch), and tombstone the
            # output so downstream snapshot sinks can delete the key too
            state.remove()
            if emit_tombstones:
                row = dict.fromkeys(out_names)
                row.update(prev)  # last-known state → sink can delete by key
                row["__deleted"] = True
                yield pd.DataFrame([row])
        elif current is not None and current != prev:
            state.update(tuple(current.get(f) for f in field_names))
            if idle_timeout_ms:
                state.setTimeoutDuration(idle_timeout_ms)
            out = dict(current)
            if emit_tombstones:
                out["__deleted"] = False
            yield pd.DataFrame([out])
        elif idle_timeout_ms and state.exists:
            state.setTimeoutDuration(idle_timeout_ms)

    ensure_shipped(events.sparkSession)
    return events.groupBy(key_col).applyInPandasWithState(
        fold,
        outputStructType=output_struct,
        stateStructType=state_struct,
        outputMode="update",
        timeoutConf=timeout,
    )
