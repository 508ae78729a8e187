"""Streaming metric sensors (SURVEY §2.4 A3-A7, modules/metrics).

Readings are rows {sensor, value, ts}. Counter/gauge/min/max are stock
streaming aggregations; EWMA is a custom stateful operator (the recurrence
needs ordered per-key state, ExponentiallyWeightedMovingAverage.scala:14-29);
rates are windowed counts normalized by window length
(TimeBucketHistogram.scala:15-50, 1m/5m/15m wiring Metrics.scala:152-172).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..session import ensure_shipped

EWMA_WEIGHT = 0.95  # Metrics.scala:146-150


def sensor_stats(readings: DataFrame) -> DataFrame:
    """A3-A5: count / min / max / most-recent-value per sensor. In streaming
    use outputMode('update'|'complete'); same frame works in batch."""
    return readings.groupBy("sensor").agg(
        F.count("*").alias("n"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
        F.max_by("value", "ts").alias("last_value"),
        F.avg("value").alias("avg_value"),
    )


_EWMA_STATE = StructType(
    [StructField("ewma", DoubleType()), StructField("n", LongType())]
)

EWMA_OUTPUT = StructType(
    [
        StructField("sensor", StringType()),
        StructField("ewma", DoubleType()),
        StructField("n", LongType()),
    ]
)


def ewma_stream(readings: DataFrame, weight: float = EWMA_WEIGHT) -> DataFrame:
    """A6: ewma' = weight*ewma + (1-weight)*value, seeded with the first
    reading; state carries (ewma, n) per sensor across micro-batches."""
    alpha = 1.0 - weight

    def step(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        ewma, n = state.get if state.exists else (None, 0)
        batch = pd.concat(list(pdfs), ignore_index=True).sort_values("ts")
        for v in batch["value"]:
            v = float(v)
            ewma = v if ewma is None else (1 - alpha) * ewma + alpha * v
            n += 1
        state.update((ewma, n))
        yield pd.DataFrame([{"sensor": key[0], "ewma": ewma, "n": n}])

    ensure_shipped(readings.sparkSession)
    return readings.groupBy("sensor").applyInPandasWithState(
        step,
        outputStructType=EWMA_OUTPUT,
        stateStructType=_EWMA_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def rate_per_second(
    readings: DataFrame, window_size: str = "60 seconds", watermark: str = "60 seconds"
) -> DataFrame:
    """A7: trailing-window rate = count(window)/window_seconds, the 1m/5m/15m
    RateHistogram. One frame per (sensor, window); expired buckets drop out
    via the watermark (TimeBucketHistogram.scala:38-44 expiry)."""
    qty, unit = window_size.split()
    unit_s = {"second": 1, "seconds": 1, "minute": 60, "minutes": 60,
              "hour": 3600, "hours": 3600}.get(unit)
    if unit_s is None:
        raise ValueError(f"unsupported window unit in {window_size!r}")
    seconds = float(qty) * unit_s
    return (
        readings.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window_size), "sensor")
        .agg(F.count("*").alias("n"))
        .select(
            F.col("window.start").alias("window_start"),
            "sensor",
            F.round(F.col("n") / seconds, 6).alias("rate_per_s"),
        )
    )


_CUSUM_STATE = StructType(
    [
        StructField("baseline", DoubleType()),
        StructField("s_pos", DoubleType()),
        StructField("s_neg", DoubleType()),
        StructField("n_alarms", LongType()),
        StructField("n", LongType()),
    ]
)

CUSUM_OUTPUT = StructType(
    [
        StructField("sensor", StringType()),
        StructField("baseline", DoubleType()),
        StructField("s_pos", DoubleType()),
        StructField("s_neg", DoubleType()),
        StructField("n_alarms", LongType()),
        StructField("n", LongType()),
    ]
)


def cusum_stream(
    readings: DataFrame, slack: float | None = None, threshold: float | None = None
) -> DataFrame:
    """Two-sided CUSUM drift detector as a streaming stateful operator —
    the live twin of the m_cusum_drift batch fold (operators/
    eventsourcing.cusum_handle_event): per-sensor state carries
    (baseline, s_pos, s_neg, n_alarms, n) across micro-batches, alarms
    fire and reset exactly as in batch (BOTH paths call the ONE
    cusum_step kernel in operators/eventsourcing.py, so the math cannot
    diverge), and for per-key-unique timestamps the final states agree
    bitwise — pinned cross-mode in tests/test_streaming.py. Equal-ts
    readings sort by (ts, value): equal (ts, value) steps commute, so
    the stream is run-deterministic, though an equal-ts batch twin
    ordered by event_id may fold those ties differently. The sort is
    WITHIN each micro-batch only — CUSUM state is order-dependent, so a
    reading that arrives in a LATER micro-batch with an EARLIER
    timestamp folds out of order relative to the batch twin (same
    caveat class as the equal-ts tiebreak above); the cross-mode pin
    assumes in-order arrival across batch boundaries, which the
    command-engine source provides (per-key ordered log). Baseline =
    first reading, so no pre-pass."""
    from ..operators.eventsourcing import (
        CUSUM_SLACK,
        CUSUM_THRESHOLD,
        cusum_step,
    )

    slack = CUSUM_SLACK if slack is None else slack
    threshold = CUSUM_THRESHOLD if threshold is None else threshold

    def step(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        if state.exists:
            baseline, s_pos, s_neg, n_alarms, n = state.get
        else:
            baseline, s_pos, s_neg, n_alarms, n = None, 0.0, 0.0, 0, 0
        batch = pd.concat(list(pdfs), ignore_index=True).sort_values(
            ["ts", "value"], kind="mergesort"
        )
        for v in batch["value"]:
            v = float(v)
            if baseline is None:
                baseline = v
                n = 1
                continue
            s_pos, s_neg, n_alarms = cusum_step(
                s_pos, s_neg, n_alarms, v - baseline, slack, threshold
            )
            n += 1
        state.update((baseline, s_pos, s_neg, n_alarms, n))
        yield pd.DataFrame(
            [
                {
                    "sensor": key[0],
                    "baseline": baseline,
                    "s_pos": s_pos,
                    "s_neg": s_neg,
                    "n_alarms": n_alarms,
                    "n": n,
                }
            ]
        )

    ensure_shipped(readings.sparkSession)
    return readings.groupBy("sensor").applyInPandasWithState(
        step,
        outputStructType=CUSUM_OUTPUT,
        stateStructType=_CUSUM_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


_TB_STATE = StructType(
    [
        StructField("tokens", LongType()),
        StructField("anchor_ms", LongType()),
        StructField("n_allowed", LongType()),
        StructField("n_throttled", LongType()),
        StructField("n", LongType()),
    ]
)

TOKEN_BUCKET_OUTPUT = StructType(
    [
        StructField("user_id", StringType()),
        StructField("tokens", LongType()),
        StructField("anchor_ms", LongType()),
        StructField("n_allowed", LongType()),
        StructField("n_throttled", LongType()),
        StructField("n", LongType()),
    ]
)


def token_bucket_stream(
    events: DataFrame,
    capacity: int | None = None,
    refill_ms: int | None = None,
    idle_timeout_ms: int | None = None,
) -> DataFrame:
    """Per-key token-bucket rate limiting as a LIVE streaming operator —
    the gateway-side twin of the es_token_bucket_fold batch entry (the
    admission decision belongs at ingest time, not in a nightly batch):
    per-user state (tokens, refill anchor, counters) carries across
    micro-batches and BOTH modes call the ONE all-integer
    token_bucket_step kernel (operators/eventsourcing.py), so the
    arithmetic cannot diverge and the cross-mode equality is EXACT, not
    float-tolerant (pinned in tests/test_streaming.py across a
    micro-batch boundary — the cusum_stream discipline). Input rows are
    {user_id, ms, event_id}; each batch sorts by (ms, event_id), the
    SAME total order the batch fold uses, so even equal-millisecond
    events agree. Like cusum_stream, the sort is within a micro-batch —
    cross-batch in-order arrival is assumed (the command-engine source's
    per-key ordered log provides it).

    State growth: with the default idle_timeout_ms=None, per-key state
    lives forever (the cusum_stream caveat — fine for bounded key
    spaces). A gateway rate limiter sees an OPEN-ENDED key space, so
    pass idle_timeout_ms to expire idle buckets via a processing-time
    timeout. The bound must be >= capacity*refill_ms (enforced): a key
    idle that long holds a provably FULL bucket, and token_bucket_init
    on its next event re-creates exactly that full bucket — admission
    decisions are unchanged. CAVEAT (review finding): the timeout is
    PROCESSING-time while refill is EVENT-time, so the fullness proof
    additionally assumes event time keeps pace with wall clock across
    the idle gap — the same live-source assumption as the cross-batch
    in-order-arrival caveat above (a replayed/lagging feed whose next
    event timestamp predates anchor + capacity*refill_ms would re-init
    a full bucket the batch twin still shows as drained). A gateway
    limiter admitting live traffic satisfies it by construction. The
    cumulative counters (n_allowed/n_throttled/n) DO restart after
    expiry; they are per-lifetime diagnostics, not the admission state
    (ADVICE r12)."""
    from ..operators.eventsourcing import (
        TB_CAPACITY,
        TB_REFILL_MS,
        token_bucket_init,
        token_bucket_step,
    )

    capacity = TB_CAPACITY if capacity is None else capacity
    refill_ms = TB_REFILL_MS if refill_ms is None else refill_ms
    if idle_timeout_ms is not None and idle_timeout_ms < capacity * refill_ms:
        raise ValueError(
            "idle_timeout_ms must be >= capacity*refill_ms "
            f"({capacity * refill_ms}) so an expired bucket is provably "
            "full and re-init is admission-equivalent"
        )

    def step(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        if state.exists:
            tokens, anchor, n_allowed, n_throttled, n = state.get
            fresh = False
        else:
            tokens, anchor, n_allowed, n_throttled, n = 0, 0, 0, 0, 0
            fresh = True
        batch = pd.concat(list(pdfs), ignore_index=True).sort_values(
            ["ms", "event_id"], kind="mergesort"
        )
        for t in batch["ms"]:
            t = int(t)
            if fresh:
                # shared first-event init THROUGH the step kernel — the
                # cusum kernel-duplication lesson (an inline init drifted
                # from the batch twin for capacity=0 until review caught it)
                tokens, anchor, allowed = token_bucket_init(
                    t, capacity, refill_ms
                )
                n_allowed += 1 if allowed else 0
                n_throttled += 0 if allowed else 1
                n += 1
                fresh = False
                continue
            tokens, anchor, allowed = token_bucket_step(
                tokens, anchor, t, capacity, refill_ms
            )
            n_allowed += 1 if allowed else 0
            n_throttled += 0 if allowed else 1
            n += 1
        state.update((tokens, anchor, n_allowed, n_throttled, n))
        if idle_timeout_ms is not None:
            state.setTimeoutDuration(idle_timeout_ms)
        yield pd.DataFrame(
            [
                {
                    # str(key[0]) like saga_stream and the batch twin —
                    # a non-string keyed stream must not feed a raw value
                    # into the StringType output column (ADVICE r12)
                    "user_id": str(key[0]),
                    "tokens": tokens,
                    "anchor_ms": anchor,
                    "n_allowed": n_allowed,
                    "n_throttled": n_throttled,
                    "n": n,
                }
            ]
        )

    ensure_shipped(events.sparkSession)
    return events.groupBy("user_id").applyInPandasWithState(
        step,
        outputStructType=TOKEN_BUCKET_OUTPUT,
        stateStructType=_TB_STATE,
        outputMode="update",
        timeoutConf=(
            GroupStateTimeout.NoTimeout
            if idle_timeout_ms is None
            else GroupStateTimeout.ProcessingTimeTimeout
        ),
    )


_SAGA_STATE = StructType(
    [
        StructField("st", LongType()),
        StructField("n_started", LongType()),
        StructField("n_completed", LongType()),
        StructField("n_compensated", LongType()),
        StructField("n_steps", LongType()),
        StructField("n_ignored", LongType()),
        StructField("n", LongType()),
    ]
)

SAGA_OUTPUT = StructType(
    [
        StructField("user_id", StringType()),
        StructField("st", LongType()),
        StructField("n_started", LongType()),
        StructField("n_completed", LongType()),
        StructField("n_compensated", LongType()),
        StructField("n_steps", LongType()),
        StructField("n_ignored", LongType()),
        StructField("n", LongType()),
    ]
)


def saga_stream(events: DataFrame) -> DataFrame:
    """Live saga/compensation tracking — the streaming twin of the
    es_saga_fold batch entry, and the shape surge's command engine
    actually runs (a saga coordinator is per-key serial state reacting
    to events as they arrive, not a nightly batch): per-user state via
    applyInPandasWithState, BOTH modes calling the ONE
    saga_handle_event kernel (operators/eventsourcing.py), so the
    cross-mode equality is exact integer equality — pinned across a
    micro-batch boundary with a saga deliberately split mid-flight
    (started in batch 1, compensated in batch 2). Input rows are
    {user_id, event_type, ms, event_id}; each batch sorts by
    (ms, event_id), the batch fold's total order; cross-batch in-order
    arrival is assumed (the cusum_stream caveat class). NULL user_ids
    are FILTERED here exactly as the batch twin filters them — without
    the filter, groupBy forms a null-key group whose str(key) collides
    with a real key spelled 'None' and the twin equality silently
    breaks (review-pass finding; the driver-fold NULL-key lesson)."""
    from ..operators.eventsourcing import saga_handle_event

    events = events.where(F.col("user_id").isNotNull())

    def step(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        if state.exists:
            st, n_started, n_completed, n_compensated, n_steps, n_ignored, n = (
                state.get
            )
            acc: dict | None = {
                "aggregate_id": str(key[0]),
                "st": st,
                "n_started": n_started,
                "n_completed": n_completed,
                "n_compensated": n_compensated,
                "n_steps": n_steps,
                "n_ignored": n_ignored,
                "n": n,
            }
        else:
            acc = None
        batch = pd.concat(list(pdfs), ignore_index=True).sort_values(
            ["ms", "event_id"], kind="mergesort"
        )
        for et in batch["event_type"]:
            acc = saga_handle_event(acc, {"user_id": key[0], "event_type": et})
        assert acc is not None
        state.update(
            (
                acc["st"],
                acc["n_started"],
                acc["n_completed"],
                acc["n_compensated"],
                acc["n_steps"],
                acc["n_ignored"],
                acc["n"],
            )
        )
        yield pd.DataFrame(
            [
                {
                    "user_id": str(key[0]),
                    "st": acc["st"],
                    "n_started": acc["n_started"],
                    "n_completed": acc["n_completed"],
                    "n_compensated": acc["n_compensated"],
                    "n_steps": acc["n_steps"],
                    "n_ignored": acc["n_ignored"],
                    "n": acc["n"],
                }
            ]
        )

    ensure_shipped(events.sparkSession)
    return events.groupBy("user_id").applyInPandasWithState(
        step,
        outputStructType=SAGA_OUTPUT,
        stateStructType=_SAGA_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


_HOLT_STATE = StructType(
    [
        StructField("level", DoubleType()),
        StructField("trend", DoubleType()),
        StructField("n", LongType()),
    ]
)

HOLT_OUTPUT = StructType(
    [
        StructField("user_id", StringType()),
        StructField("level", DoubleType()),
        StructField("trend", DoubleType()),
        StructField("forecast", DoubleType()),
        StructField("n", LongType()),
    ]
)


def holt_stream(events: DataFrame) -> DataFrame:
    """Holt level+trend smoothing as a LIVE streaming operator — the
    fourth cross-mode twin (after cusum, token bucket, saga), and the
    strongest pin of the family: the FLOAT recurrence has no order-free
    closed form (unlike EWMA), so bitwise cross-batch equality with the
    m_holt_smoothing batch fold proves the streaming path replays the
    exact ordered float64 op sequence, not a numerically-similar one.
    Per-user state (level, trend, n) carries across micro-batches; BOTH
    modes call the ONE holt_handle_event kernel
    (operators/eventsourcing.py), so the arithmetic cannot diverge —
    pinned in tests/test_streaming.py with the series split mid-stream
    across a micro-batch boundary and compared with == on raw doubles,
    no tolerance. Input rows are {user_id, value, ts, event_id}; each
    batch sorts by (ts, event_id), the batch fold's total order.
    Cross-batch in-order arrival is assumed (the cusum_stream caveat
    class); per-key state is unbounded like cusum_stream — a forecast
    state is live for as long as its key is."""
    from ..operators.eventsourcing import holt_handle_event

    events = events.where(
        F.col("value").isNotNull() & F.col("user_id").isNotNull()
    )

    def step(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        if state.exists:
            level, trend, n = state.get
            acc: dict | None = {
                "aggregate_id": str(key[0]),
                "level": level,
                "trend": trend,
                "n": n,
            }
        else:
            acc = None
        batch = pd.concat(list(pdfs), ignore_index=True).sort_values(
            ["ts", "event_id"], kind="mergesort"
        )
        for v in batch["value"]:
            acc = holt_handle_event(
                acc, {"user_id": key[0], "value": float(v)}
            )
        assert acc is not None
        state.update((acc["level"], acc["trend"], acc["n"]))
        yield pd.DataFrame(
            [
                {
                    "user_id": str(key[0]),
                    "level": acc["level"],
                    "trend": acc["trend"],
                    "forecast": acc["level"] + acc["trend"],
                    "n": acc["n"],
                }
            ]
        )

    ensure_shipped(events.sparkSession)
    return events.groupBy("user_id").applyInPandasWithState(
        step,
        outputStructType=HOLT_OUTPUT,
        stateStructType=_HOLT_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


_BURN_STATE = StructType(
    [
        StructField("bucket", LongType()),
        StructField("n_total", LongType()),
        StructField("n_err", LongType()),
        StructField("n_alarms", LongType()),
        StructField("n", LongType()),
    ]
)

BURN_OUTPUT = StructType(
    [
        StructField("user_id", StringType()),
        StructField("bucket", LongType()),
        StructField("n_total", LongType()),
        StructField("n_err", LongType()),
        StructField("n_alarms", LongType()),
        StructField("n", LongType()),
    ]
)


def burn_rate_stream(events: DataFrame) -> DataFrame:
    """Live SRE error-budget burn alerting — the FIFTH cross-mode twin
    (cusum, token bucket, saga, holt, burn; r14 VERDICT task 7) and the
    shape an on-call pipeline actually runs: per-key state (open bucket
    counters + alarm count) via applyInPandasWithState, BOTH modes
    calling the ONE all-integer burn_rate_step kernel
    (operators/eventsourcing.py) so the cross-mode equality with the
    es_burn_rate_fold batch entry is EXACT integer equality — pinned in
    tests/test_streaming.py across a micro-batch boundary that CLOSES a
    bucket mid-stream (the alarm decision itself straddles the split).
    Input rows are {user_id, event_type, ms, event_id}; each batch
    sorts by (ms, event_id), the batch fold's total order; cross-batch
    in-order arrival is assumed (the cusum_stream caveat class). NULL
    user_ids are FILTERED exactly as the batch twin filters them (the
    saga_stream str(key) 'None'-collision lesson). State is 5 longs per
    key — bounded regardless of event volume."""
    from ..operators.eventsourcing import burn_rate_init, burn_rate_step

    events = events.where(F.col("user_id").isNotNull())

    def step(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        if state.exists:
            bucket, n_total, n_err, n_alarms, n = state.get
            fresh = False
        else:
            bucket, n_total, n_err, n_alarms, n = 0, 0, 0, 0, 0
            fresh = True
        batch = pd.concat(list(pdfs), ignore_index=True).sort_values(
            ["ms", "event_id"], kind="mergesort"
        )
        for t, et in zip(batch["ms"], batch["event_type"]):
            is_err = 1 if et == "error" else 0
            if fresh:
                # first-event init THROUGH the step kernel (the cusum
                # kernel-duplication lesson)
                bucket, n_total, n_err, n_alarms = burn_rate_init(
                    int(t), is_err
                )
                fresh = False
            else:
                bucket, n_total, n_err, n_alarms = burn_rate_step(
                    bucket, n_total, n_err, n_alarms, int(t), is_err
                )
            n += 1
        state.update((bucket, n_total, n_err, n_alarms, n))
        yield pd.DataFrame(
            [
                {
                    "user_id": str(key[0]),
                    "bucket": bucket,
                    "n_total": n_total,
                    "n_err": n_err,
                    "n_alarms": n_alarms,
                    "n": n,
                }
            ]
        )

    ensure_shipped(events.sparkSession)
    return events.groupBy("user_id").applyInPandasWithState(
        step,
        outputStructType=BURN_OUTPUT,
        stateStructType=_BURN_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


_PH_STATE = StructType(
    [
        StructField("n", LongType()),
        StructField("s", DoubleType()),
        StructField("m", DoubleType()),
        StructField("m_min", DoubleType()),
        StructField("n_alarms", LongType()),
    ]
)

PH_OUTPUT = StructType(
    [
        StructField("user_id", StringType()),
        StructField("n", LongType()),
        StructField("s", DoubleType()),
        StructField("m", DoubleType()),
        StructField("m_min", DoubleType()),
        StructField("n_alarms", LongType()),
    ]
)


def page_hinkley_stream(readings: DataFrame) -> DataFrame:
    """Live Page-Hinkley drift detection — the SIXTH cross-mode twin
    (cusum, token bucket, saga, holt, burn, PH): per-user state
    (n, s, m, m_min, n_alarms) via applyInPandasWithState, BOTH modes
    calling the ONE page_hinkley_step kernel, so the float recurrence
    is bitwise-identical to the m_page_hinkley batch fold for in-order
    arrival (the cusum_stream caveat class) — pinned across a
    micro-batch boundary in tests/test_streaming.py. Input rows are
    {user_id, value, ts, event_id}; each batch sorts by (ts, event_id),
    the batch fold's total order. NULL user_ids and NULL values are
    filtered exactly as the batch twin filters them (the saga_stream
    'None'-collision lesson). State is 5 scalars per key."""
    from ..operators.eventsourcing import page_hinkley_step

    readings = readings.where(
        F.col("user_id").isNotNull() & F.col("value").isNotNull()
    )

    def step(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        if state.exists:
            n, s, m, m_min, n_alarms = state.get
        else:
            n, s, m, m_min, n_alarms = 0, 0.0, 0.0, 0.0, 0
        batch = pd.concat(list(pdfs), ignore_index=True).sort_values(
            ["ts", "event_id"], kind="mergesort"
        )
        for v in batch["value"]:
            n, s, m, m_min, n_alarms = page_hinkley_step(
                n, s, m, m_min, n_alarms, float(v)
            )
        state.update((n, s, m, m_min, n_alarms))
        yield pd.DataFrame(
            [
                {
                    "user_id": str(key[0]),
                    "n": n,
                    "s": s,
                    "m": m,
                    "m_min": m_min,
                    "n_alarms": n_alarms,
                }
            ]
        )

    ensure_shipped(readings.sparkSession)
    return readings.groupBy("user_id").applyInPandasWithState(
        step,
        outputStructType=PH_OUTPUT,
        stateStructType=_PH_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


_MW_BURN_STATE = StructType(
    [
        StructField("short_bucket", LongType()),
        StructField("s_total", LongType()),
        StructField("s_err", LongType()),
        StructField("long_bucket", LongType()),
        StructField("l_total", LongType()),
        StructField("l_err", LongType()),
        StructField("n_pages", LongType()),
        StructField("n", LongType()),
    ]
)

MW_BURN_OUTPUT = StructType(
    [
        StructField("user_id", StringType()),
        StructField("short_bucket", LongType()),
        StructField("s_total", LongType()),
        StructField("s_err", LongType()),
        StructField("long_bucket", LongType()),
        StructField("l_total", LongType()),
        StructField("l_err", LongType()),
        StructField("n_pages", LongType()),
        StructField("n", LongType()),
    ]
)


def multiwindow_burn_stream(events: DataFrame) -> DataFrame:
    """Live multi-window multi-burn-rate SLO paging — the SEVENTH
    cross-mode twin (cusum, token bucket, saga, holt, burn, PH, multi-
    window burn; r14 VERDICT task 6) and the alert rule SRE teams
    actually page on: a short (1 d) AND a long (7 d) window must BOTH
    burn > 2× budget for a page to fire, so blips and long-recovered
    incidents stay silent. Per-key state is two bucket counter sets +
    the page count via applyInPandasWithState; BOTH modes call the ONE
    all-integer multiwindow_burn_step kernel
    (operators/eventsourcing.py), so cross-mode equality with the
    es_multiwindow_burn_fold batch entry is EXACT integer equality —
    pinned in tests/test_streaming.py across a micro-batch boundary
    that closes a short bucket mid-stream (the page decision itself
    straddles the split, and its long-counter operand carries state
    from the earlier batch). Input rows are {user_id, event_type, ms,
    event_id}; each batch sorts by (ms, event_id), the batch fold's
    total order; cross-batch
    in-order arrival is assumed (the cusum_stream caveat class). NULL
    user_ids are filtered exactly like the batch twin. State is 8
    longs per key — bounded regardless of volume."""
    from ..operators.eventsourcing import (
        multiwindow_burn_init,
        multiwindow_burn_step,
    )

    events = events.where(F.col("user_id").isNotNull())

    def step(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        if state.exists:
            sb, s_total, s_err, lb, l_total, l_err, n_pages, n = state.get
            fresh = False
        else:
            sb = s_total = s_err = lb = l_total = l_err = n_pages = n = 0
            fresh = True
        batch = pd.concat(list(pdfs), ignore_index=True).sort_values(
            ["ms", "event_id"], kind="mergesort"
        )
        for t, et in zip(batch["ms"], batch["event_type"]):
            is_err = 1 if et == "error" else 0
            if fresh:
                # first-event init THROUGH the step kernel (the cusum
                # kernel-duplication lesson)
                (sb, s_total, s_err, lb, l_total, l_err, n_pages) = (
                    multiwindow_burn_init(int(t), is_err)
                )
                fresh = False
            else:
                (sb, s_total, s_err, lb, l_total, l_err, n_pages) = (
                    multiwindow_burn_step(
                        sb, s_total, s_err, lb, l_total, l_err, n_pages,
                        int(t), is_err,
                    )
                )
            n += 1
        state.update((sb, s_total, s_err, lb, l_total, l_err, n_pages, n))
        yield pd.DataFrame(
            [
                {
                    "user_id": str(key[0]),
                    "short_bucket": sb,
                    "s_total": s_total,
                    "s_err": s_err,
                    "long_bucket": lb,
                    "l_total": l_total,
                    "l_err": l_err,
                    "n_pages": n_pages,
                    "n": n,
                }
            ]
        )

    ensure_shipped(events.sparkSession)
    return events.groupBy("user_id").applyInPandasWithState(
        step,
        outputStructType=MW_BURN_OUTPUT,
        stateStructType=_MW_BURN_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


_SPRT_STATE = StructType(
    [
        StructField("llr", DoubleType()),
        StructField("n_detect", LongType()),
        StructField("n_clear", LongType()),
        StructField("n", LongType()),
    ]
)

SPRT_OUTPUT = StructType(
    [
        StructField("user_id", StringType()),
        StructField("llr", DoubleType()),
        StructField("n_detect", LongType()),
        StructField("n_clear", LongType()),
        StructField("n", LongType()),
    ]
)


def sprt_stream(events: DataFrame) -> DataFrame:
    """Live SPRT error-rate monitoring — the EIGHTH cross-mode twin
    (cusum, token bucket, saga, holt, burn, PH, multiwindow burn,
    SPRT): Wald's sequential test run per key via
    applyInPandasWithState, BOTH modes calling the ONE sprt_step
    kernel whose every constant is a precomputed Python float literal
    — so the float recurrence is BITWISE-identical to the es_sprt_fold
    batch entry for in-order arrival (the strongest pin class, like
    holt/PH), pinned across a micro-batch boundary where the llr
    carried from batch 1 decides a detection inside batch 2. Input
    rows are {user_id, event_type, ms, event_id}; each batch sorts by
    (ms, event_id); NULL user_ids filtered exactly like the batch
    twin. State is 4 scalars per key."""
    from ..operators.eventsourcing import sprt_step

    events = events.where(F.col("user_id").isNotNull())

    def step(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        if state.exists:
            llr, n_detect, n_clear, n = state.get
        else:
            llr, n_detect, n_clear, n = 0.0, 0, 0, 0
        batch = pd.concat(list(pdfs), ignore_index=True).sort_values(
            ["ms", "event_id"], kind="mergesort"
        )
        for t, et in zip(batch["ms"], batch["event_type"]):
            llr, n_detect, n_clear = sprt_step(
                llr, n_detect, n_clear, int(t), 1 if et == "error" else 0
            )
            n += 1
        state.update((llr, n_detect, n_clear, n))
        yield pd.DataFrame(
            [
                {
                    "user_id": str(key[0]),
                    "llr": llr,
                    "n_detect": n_detect,
                    "n_clear": n_clear,
                    "n": n,
                }
            ]
        )

    ensure_shipped(events.sparkSession)
    return events.groupBy("user_id").applyInPandasWithState(
        step,
        outputStructType=SPRT_OUTPUT,
        stateStructType=_SPRT_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


_DEBOUNCE_STATE = StructType(
    [
        StructField("last_ms", LongType()),
        StructField("n_accepted", LongType()),
        StructField("n_suppressed", LongType()),
        StructField("n", LongType()),
    ]
)

DEBOUNCE_OUTPUT = StructType(
    [
        StructField("user_id", StringType()),
        StructField("last_ms", LongType()),
        StructField("n_accepted", LongType()),
        StructField("n_suppressed", LongType()),
        StructField("n", LongType()),
    ]
)


def debounce_stream(events: DataFrame) -> DataFrame:
    """Live per-key debounce — the NINTH cross-mode twin (cusum, token
    bucket, saga, holt, burn, PH, multiwindow burn, SPRT, debounce):
    admit an event only when >= DEBOUNCE_GAP_MS has passed since the
    last ADMITTED event, via applyInPandasWithState with BOTH modes
    calling the ONE debounce_step kernel
    (operators/eventsourcing.py). All-integer state (one timestamp +
    two counters), so cross-mode equality with es_debounce_fold is
    EXACT — pinned in tests/test_streaming.py across a micro-batch
    boundary where the last-admitted timestamp carried from batch 1
    decides batch 2's first admission (and where gap-from-PREVIOUS-
    event semantics would decide differently — the pin distinguishes
    debounce from throttling). Input rows are {user_id, event_type,
    ms, event_id}; each batch sorts by (ms, event_id); NULL user_ids
    filtered exactly like the batch twin. State is 4 longs per key."""
    from ..operators.eventsourcing import debounce_step

    events = events.where(F.col("user_id").isNotNull())

    def step(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        if state.exists:
            last_ms, n_acc, n_sup, n = state.get
        else:
            last_ms, n_acc, n_sup, n = None, 0, 0, 0
        batch = pd.concat(list(pdfs), ignore_index=True).sort_values(
            ["ms", "event_id"], kind="mergesort"
        )
        for t in batch["ms"]:
            last_ms, n_acc, n_sup = debounce_step(last_ms, n_acc, n_sup,
                                                  int(t))
            n += 1
        state.update((last_ms, n_acc, n_sup, n))
        yield pd.DataFrame(
            [
                {
                    "user_id": str(key[0]),
                    "last_ms": last_ms,
                    "n_accepted": n_acc,
                    "n_suppressed": n_sup,
                    "n": n,
                }
            ]
        )

    ensure_shipped(events.sparkSession)
    return events.groupBy("user_id").applyInPandasWithState(
        step,
        outputStructType=DEBOUNCE_OUTPUT,
        stateStructType=_DEBOUNCE_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


_CROSTON_STATE = StructType(
    [
        StructField("z", DoubleType()),
        StructField("p", DoubleType()),
        StructField("last_ms", LongType()),
        StructField("n", LongType()),
    ]
)

CROSTON_OUTPUT = StructType(
    [
        StructField("user_id", StringType()),
        StructField("z", DoubleType()),
        StructField("p", DoubleType()),
        StructField("last_ms", LongType()),
        StructField("n", LongType()),
    ]
)


def croston_stream(events: DataFrame) -> DataFrame:
    """Live Croston intermittent-demand monitor — the TENTH cross-mode
    twin (cusum, token bucket, saga, holt, burn, PH, multiwindow burn,
    SPRT, debounce, croston): per-key demand-size + inter-demand-
    interval EWMAs via applyInPandasWithState, BOTH modes calling the ONE
    croston_step kernel (literal 0.2/0.8 coefficients — the HW_OM*
    invariant), so the float state is BITWISE-identical to the
    m_croston_forecast batch fold for in-order arrival (the holt pin
    class), pinned across a micro-batch boundary where the carried
    (z, p, last_ms) decide batch 2's first update. Input rows are
    {user_id, value, ms, event_id}; each batch sorts by
    (ms, event_id); NULL user_ids AND NULL values filtered exactly
    like the batch twin. State is 4 scalars per key."""
    from ..operators.eventsourcing import croston_step

    # NULL user_ids AND NULL values filtered exactly like the batch
    # twin (review finding: a NULL value arrives as pandas NaN and
    # would permanently NaN-poison the EWMA state the batch fold
    # never sees — the holt_stream filter pair)
    events = events.where(
        F.col("user_id").isNotNull() & F.col("value").isNotNull()
    )

    def step(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        if state.exists:
            z, p, last_ms, n = state.get
        else:
            z, p, last_ms, n = 0.0, 0.0, None, 0
        batch = pd.concat(list(pdfs), ignore_index=True).sort_values(
            ["ms", "event_id"], kind="mergesort"
        )
        for t, x in zip(batch["ms"], batch["value"]):
            z, p, last_ms = croston_step(z, p, last_ms, int(t), float(x))
            n += 1
        state.update((z, p, last_ms, n))
        yield pd.DataFrame(
            [
                {
                    "user_id": str(key[0]),
                    "z": z,
                    "p": p,
                    "last_ms": last_ms,
                    "n": n,
                }
            ]
        )

    ensure_shipped(events.sparkSession)
    return events.groupBy("user_id").applyInPandasWithState(
        step,
        outputStructType=CROSTON_OUTPUT,
        stateStructType=_CROSTON_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
