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


# --- W1/W3/W4: count-triggered slider with lifecycle events -----------------

WINDOW_EVENT_SCHEMA = StructType(
    [
        StructField("scope", StringType()),
        StructField("event", StringType()),  # WindowAdvanced | AddedToWindow
        StructField("window_from", TimestampType()),
        StructField("buffered", IntegerType()),
        StructField("total_seen", LongType()),
    ]
)

_SLIDER_STATE = StructType(
    [
        StructField("buffer_ts", StringType()),  # csv of epoch-micros (bounded by buffer size)
        StructField("total_seen", LongType()),
    ]
)


def count_triggered_slider(
    signals: DataFrame,
    scope_col: str = "name",
    buffer_size: int = 50,
    slide_amount: int = 10,
) -> DataFrame:
    """W1 exact semantics: a window holds buffered signals; when the buffer
    reaches ``buffer_size`` (reference.conf:241-248 default 50), slide by
    dropping the ``slide_amount`` oldest and re-anchor
    (WindowSlider.scala:20-37). Emits W3 lifecycle events (AddedToWindow /
    WindowAdvanced); W4's snapshot = the latest AddedToWindow row per scope."""

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
        if state.exists:
            buf_csv, total = state.get
            buffer = [int(x) for x in buf_csv.split(",")] if buf_csv else []
        else:
            buffer, total = [], 0
        batch = pd.concat(list(pdfs), ignore_index=True).sort_values("ts")
        out = []
        for t in batch["ts"]:
            micros = int(pd.Timestamp(t).value // 1000)
            buffer.append(micros)
            total += 1
            if len(buffer) >= buffer_size:
                buffer = buffer[slide_amount:]
                out.append(
                    {
                        "scope": key[0],
                        "event": "WindowAdvanced",
                        "window_from": pd.Timestamp(buffer[0] * 1000),
                        "buffered": len(buffer),
                        "total_seen": total,
                    }
                )
        out.append(
            {
                "scope": key[0],
                "event": "AddedToWindow",
                "window_from": pd.Timestamp(buffer[0] * 1000) if buffer else None,
                "buffered": len(buffer),
                "total_seen": total,
            }
        )
        state.update((",".join(str(x) for x in buffer), total))
        yield pd.DataFrame(out)

    ensure_shipped(signals.sparkSession)
    return signals.groupBy(scope_col).applyInPandasWithState(
        step,
        outputStructType=WINDOW_EVENT_SCHEMA,
        stateStructType=_SLIDER_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
