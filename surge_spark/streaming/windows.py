"""Health-signal window analytics (SURVEY §2.5 W1-W8) on streams.

Signals are rows {ts, topic, name, signal_type, description, metadata}
(SignalPatternMatcherDefinition.scala:37-58). Time-based windows are stock
``window()`` aggregations with watermarks; the count-triggered slider (W1)
is a custom stateful operator because its slide condition is buffer
occupancy, not time (WindowSlider.scala:20-37).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from ..session import ensure_shipped


def tumbling_signal_counts(
    signals: DataFrame, size: str = "10 seconds", watermark: str = "30 seconds"
) -> DataFrame:
    """W2: tumble-on-expiry — watermark-driven window emission replaces the
    actor's 1 s Tick + expired() check (HealthSignalWindowActor.scala:315-323)."""
    return (
        signals.withWatermark("ts", watermark)
        .groupBy(F.window("ts", size), "name", "signal_type")
        .agg(F.count("*").alias("n"))
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "name",
            "signal_type",
            "n",
        )
    )


def sliding_signal_counts(
    signals: DataFrame,
    size: str = "10 seconds",
    slide: str = "1 second",
    watermark: str = "30 seconds",
) -> DataFrame:
    """W1 (time-sliding approximation of the count-triggered slider)."""
    return (
        signals.withWatermark("ts", watermark)
        .groupBy(F.window("ts", size, slide), "name")
        .agg(F.count("*").alias("n"))
        .select(F.col("window.start").alias("window_start"), "name", "n")
    )


def session_window_counts(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "1 hour",
    key: str = "user_id",
) -> DataFrame:
    """Native Structured Streaming SESSION windows per key — the streaming
    twin of the batch gap-sessionization entry (h_session_windows): events
    merge into one session while consecutive gaps stay under ``gap``;
    state for a session is dropped once the watermark passes its close.

    Boundary semantics, stated precisely (MEASURED r11, correcting the
    r10 note which claimed a divergence): session_window merges an event
    landing EXACTLY ``gap`` after its predecessor into the OLD session —
    Spark merges sessions that overlap OR are adjacent (merge iff
    ``next_start <= current_end``), which is the same rule as the batch
    entry's ``diff > gap`` split test. The two halves agree at, inside,
    and past the boundary (property-pinned across generated streams in
    tests/test_streaming.py::test_session_window_boundary_contract_property). Scale shape: state is per (key, open session), partitioned
    by key; the merge is Spark's native session-window state store, no
    custom applyInPandasWithState needed for time-gap semantics (the
    count-triggered slider below exists precisely because ITS slide
    condition is not expressible as a time window)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap), F.col(key))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            key,
            "n_events",
        )
    )


def repeating_signal_alerts(
    signals: DataFrame,
    pattern: str,
    times: int,
    size: str = "10 seconds",
    watermark: str = "30 seconds",
) -> DataFrame:
    """W5: RepeatingSignalMatcher (RepeatingSignalMatcher.scala:20-30) —
    alert rows when a name matching ``pattern`` occurs >= ``times`` in a
    window. W6's side-effect re-injection = writeStream of this frame to the
    control topic; a StreamingQueryListener acts on the alerts."""
    return (
        signals.where(F.col("name").rlike(pattern))
        .withWatermark("ts", watermark)
        .groupBy(F.window("ts", size))
        .agg(F.count("*").alias("n_matches"))
        .where(F.col("n_matches") >= times)
        .select(
            F.col("window.start").alias("window_start"),
            F.col("n_matches"),
            F.lit(pattern).alias("pattern"),
        )
    )


# --- W1/W3/W4/W8: count-triggered slider with full lifecycle events ---------

WINDOW_EVENT_SCHEMA = StructType(
    [
        StructField("scope", StringType()),
        # WindowOpened | AddedToWindow | WindowAdvanced | WindowPaused |
        # WindowResumed | WindowClosed | WindowStopped (WindowEvent.scala)
        StructField("event", StringType()),
        StructField("window_from", TimestampType()),
        StructField("buffered", IntegerType()),
        StructField("total_seen", LongType()),
        # per-scope emission sequence: strictly monotonic across batches AND
        # across stop→reopen epochs (total_seen resets on reopen; seq never
        # does) — the ordering column snapshot queries must use
        StructField("seq", LongType()),
    ]
)

_SLIDER_STATE = StructType(
    [
        StructField("buffer_ts", StringType()),  # csv of epoch-micros (bounded by buffer size)
        StructField("total_seen", LongType()),
        StructField("paused", IntegerType()),  # 0|1 (W8)
        StructField("stash_ts", StringType()),  # signals stashed while paused
        StructField("seq", LongType()),  # next emission sequence number
        # 1 after WindowStopped: the scope keeps a tombstone state row so seq
        # survives the stop — a plain state.remove() would restart seq at 0
        # and re-opened scopes would sort BEFORE their own stop events
        StructField("stopped", IntegerType()),
    ]
)

# control-row signal_type values (W8): the in-stream analog of the actor's
# Pause/Resume/Stop control messages (HealthSignalWindowActor.scala:211-256)
PAUSE, RESUME, STOP = "__pause__", "__resume__", "__stop__"


def count_triggered_slider(
    signals: DataFrame,
    scope_col: str = "name",
    buffer_size: int = 50,
    slide_amount: int = 10,
    max_stash: int = 1000,
) -> DataFrame:
    """W1 exact semantics: a window holds buffered signals; when the buffer
    reaches ``buffer_size`` (reference.conf:241-248 default 50), slide by
    dropping the ``slide_amount`` oldest and re-anchor
    (WindowSlider.scala:20-37).

    Emits the full W3 lifecycle event set (WindowEvent.scala): WindowOpened
    when a scope initializes, WindowAdvanced on slide, one coalesced
    AddedToWindow snapshot per batch (W4's open-window snapshot = the latest
    AddedToWindow row per scope), and — driven by control rows whose
    ``signal_type`` is ``__pause__`` / ``__resume__`` / ``__stop__`` — the
    W8 pause/resume protocol of HealthSignalWindowActor.scala:222-256:
    while paused, signals are STASHED (not windowed, not counted); Resume
    emits WindowResumed and replays the stash into the buffer in order;
    Stop emits WindowClosed + WindowStopped, clears state, and drops the
    rest of the batch (the actor's context.stop sends them to dead letters);
    the next signal re-opens the scope fresh.

    ``max_stash`` bounds the stash like the actor's capacity-bounded Akka
    stash: once a paused scope has stashed that many signals, the OLDEST are
    dropped — without a cap a long-paused hot scope would inflate its
    persisted state row (and the checkpoint) without limit."""

    if not (1 <= slide_amount < buffer_size):
        raise ValueError(
            f"need 1 <= slide_amount < buffer_size, got {slide_amount}/{buffer_size}"
        )

    def step(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        out = []
        seq = 0

        def evt(name, buffer, total):
            nonlocal seq
            out.append(
                {
                    "scope": key[0],
                    "event": name,
                    "window_from": pd.Timestamp(buffer[0] * 1000) if buffer else None,
                    "buffered": len(buffer),
                    "total_seen": total,
                    "seq": seq,
                }
            )
            seq += 1

        if state.exists:
            buf_csv, total, paused_flag, stash_csv, seq0, stopped_flag = state.get
            seq = int(seq0 or 0)
            if stopped_flag:
                # tombstoned scope: any new row re-opens it fresh (the
                # actor restarts), but seq continues from the stop epoch
                buffer, total, stash, paused = [], 0, [], False
                evt("WindowOpened", buffer, total)
            else:
                buffer = [int(x) for x in buf_csv.split(",")] if buf_csv else []
                stash = [int(x) for x in stash_csv.split(",")] if stash_csv else []
                paused = bool(paused_flag)
        else:
            buffer, total, stash, paused = [], 0, [], False
            evt("WindowOpened", buffer, total)
        # mergesort: stable, so a control row (__pause__/__stop__) sharing a
        # timestamp with data signals keeps its arrival order across runs —
        # quicksort would make stash-vs-ingest-vs-drop nondeterministic on
        # replay of the same checkpointed batch
        batch = pd.concat(list(pdfs), ignore_index=True).sort_values(
            "ts", kind="mergesort"
        )
        stopped = False

        def ingest(micros):
            nonlocal buffer, total
            buffer.append(micros)
            total += 1
            if len(buffer) >= buffer_size:
                buffer = buffer[slide_amount:]
                evt("WindowAdvanced", buffer, total)

        for t, styp in zip(batch["ts"], batch["signal_type"]):
            if styp == PAUSE:
                if not paused:
                    paused = True
                    evt("WindowPaused", buffer, total)
            elif styp == RESUME:
                if paused:
                    paused = False
                    evt("WindowResumed", buffer, total)
                    pending, stash = stash, []
                    for m in pending:  # unstashAll, original order
                        ingest(m)
            elif styp == STOP:
                evt("WindowClosed", buffer, total)
                evt("WindowStopped", buffer, total)
                stopped = True
                break
            else:
                micros = int(pd.Timestamp(t).value // 1000)
                if paused:
                    stash.append(micros)
                    if len(stash) > max_stash:
                        del stash[: len(stash) - max_stash]
                else:
                    ingest(micros)

        if stopped:
            # keep a tombstone carrying seq (see _SLIDER_STATE): the scope
            # re-opens fresh on its next row, with emission order preserved
            state.update(("", 0, 0, "", seq, 1))
        else:
            evt("AddedToWindow", buffer, total)
            state.update(
                (
                    ",".join(str(x) for x in buffer),
                    total,
                    int(paused),
                    ",".join(str(x) for x in stash),
                    seq,
                    0,
                )
            )
        yield pd.DataFrame(out)

    ensure_shipped(signals.sparkSession)
    return signals.groupBy(scope_col).applyInPandasWithState(
        step,
        outputStructType=WINDOW_EVENT_SCHEMA,
        stateStructType=_SLIDER_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def open_window_snapshot(window_events: DataFrame) -> DataFrame:
    """W4 — the open-window snapshot query (HealthSignalStreamProvider's
    windowSnapShot / actor replies to GetWindow): given the lifecycle-event
    output of ``count_triggered_slider`` (live stream sink table or batch
    frame), return ONE row per scope that currently has an open window —
    its latest buffer snapshot (AddedToWindow) — and exclude scopes whose
    most recent lifecycle event is WindowStopped (the actor is stopped; a
    GetWindow would find no actor until a new signal re-opens it).

    Pure declarative form: two max_by per scope (latest snapshot row, latest
    event name), one partial-aggregated shuffle — no state beyond the event
    table itself, so the snapshot can be served straight from the sink the
    stream already writes.

    Both max_by order by ``seq``, the slider's per-scope emission sequence —
    NOT by total_seen, which resets to 0 when a stopped scope re-opens and
    would keep reporting the old epoch's rows until the new epoch out-counts
    it."""
    ordered = F.struct(
        F.col("total_seen"), F.col("buffered"), F.col("window_from")
    )
    per_scope = window_events.groupBy("scope").agg(
        F.max_by(
            ordered, F.when(F.col("event") == "AddedToWindow", F.col("seq"))
        ).alias("snap"),
        F.max_by(F.col("event"), F.col("seq")).alias("last_event"),
    )
    return (
        per_scope.where(
            F.col("last_event") != F.lit("WindowStopped")
        )
        .where(F.col("snap").isNotNull())
        .select(
            "scope",
            F.col("snap.window_from").alias("window_from"),
            F.col("snap.buffered").alias("buffered"),
            F.col("snap.total_seen").alias("total_seen"),
        )
    )


def dedup_events_stream(
    events: DataFrame,
    keys: list[str] | None = None,
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming event dedup with BOUNDED state: duplicates of a key are
    dropped for as long as the key can still legally arrive —
    dropDuplicatesWithinWatermark expires a key's dedup state once the
    watermark passes its event time, unlike a plain stream
    dropDuplicates whose state grows forever (the at-scale killer). The
    event-stream twin of the engine's R4 batch-id dedup: R4 dedupes
    redelivered COMMAND BATCHES by id with a horizon; this dedupes
    redelivered EVENTS by key with the watermark as the horizon. Use it
    in front of window/metric aggregations fed by at-least-once sources
    (Kafka redeliveries, file-source re-lists). Duplicates arriving
    AFTER the horizon pass through — same contract as R4's aged-out
    dedup set, pinned in tests."""
    keys = keys or ["event_id"]
    return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        keys
    )
