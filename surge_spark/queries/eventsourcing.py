"""Event-sourcing, metrics, and signal-window catalog entries (SURVEY §2.4
A1-A8, §2.5 W1-W5, §2.9). The `events` testdata table stands in for the
events topic: `user_id` is the aggregate id, (ts, event_id) is the
per-partition offset order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..io import load_table
from ..operators import eventsourcing as es
from . import query


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "events")


@query(
    "es_count_fold",
    oracle="""
    SELECT CAST(user_id AS VARCHAR) AS aggregate_id,
           CAST(sum(CASE event_type WHEN 'purchase' THEN 1 WHEN 'signup' THEN 1
                                    WHEN 'error' THEN -1 ELSE 0 END) AS INT) AS count,
           CAST(count(*) AS INT) AS version
    FROM events GROUP BY user_id
    """,
)
def es_count_fold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1: the CountAggregate ordered event fold
    (TestBoundedContext.scala:17-175) via the sorted-stream mapInPandas
    fold (one Python call per Arrow batch, not per key — measured 5×
    faster than per-group applyInPandas at sf0.1 with identical output;
    equality pinned in tests/test_eventsourcing.py). The oracle is the
    order-independent closed form; the Spark side genuinely folds in
    (ts, event_id) order, so per-key ordering (R1) is exercised."""
    return es.fold_events_sorted(
        # only the columns the kernel reads (guide §4: mapInPandas is
        # opaque — an unpruned frame ships value/props through the
        # repartition exchange and the Arrow boundary for nothing)
        _events(spark, sf_dir).select("user_id", "ts", "event_id", "event_type"),
        key_col="user_id",
        order_cols=["ts", "event_id"],
        handle_event=es.count_handle_event,
        state_schema=es.COUNT_STATE_SCHEMA,
    )


@query(
    "es_bank_fold",
    oracle="""
    WITH RECURSIVE ordered AS (
      SELECT user_id, event_type, value,
             row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
      FROM events
    ),
    lim AS (SELECT user_id, max(rn) AS mx FROM ordered GROUP BY user_id),
    fold(user_id, rn, created, balance, n_rejected, version) AS (
      SELECT user_id, 0, FALSE, CAST(0.0 AS DOUBLE), CAST(0 AS BIGINT),
             CAST(0 AS BIGINT)
      FROM lim
      UNION ALL
      SELECT f.user_id, f.rn + 1,
             f.created OR o.event_type = 'signup',
             CASE
               WHEN o.event_type = 'signup' AND NOT f.created
                 THEN CAST(0.0 AS DOUBLE)
               WHEN o.event_type = 'click' AND f.created
                 THEN round(f.balance + coalesce(o.value, 0.0), 10)
               WHEN o.event_type = 'purchase' AND f.created
                    AND coalesce(o.value, 0.0) <= f.balance
                 THEN round(f.balance - coalesce(o.value, 0.0), 10)
               ELSE f.balance END,
             f.n_rejected + CASE WHEN (o.event_type = 'click' AND NOT f.created)
                  OR (o.event_type = 'purchase'
                      AND (NOT f.created OR coalesce(o.value, 0.0) > f.balance))
               THEN 1 ELSE 0 END,
             f.version + CASE WHEN (o.event_type = 'signup' AND NOT f.created)
                  OR (o.event_type = 'click' AND f.created)
                  OR (o.event_type = 'purchase' AND f.created
                      AND coalesce(o.value, 0.0) <= f.balance)
               THEN 1 ELSE 0 END
      FROM fold f JOIN ordered o ON o.user_id = f.user_id AND o.rn = f.rn + 1
    )
    SELECT CAST(f.user_id AS VARCHAR) AS account_number,
           round(f.balance, 2) AS balance, f.n_rejected, f.version
    FROM fold f JOIN lim USING (user_id)
    WHERE f.rn = lim.mx AND f.created
    """,
)
def es_bank_fold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U1+U2 command replay with rejection paths (BankAccount,
    BankAccountCommandModel.scala:16-88): debit>balance and
    credit-before-create are rejected and write nothing. The fold is
    order-dependent (a rejection depends on the running balance), which SQL
    aggregates can't express — the DuckDB oracle is a recursive CTE that
    advances every account one command per recursion step (the same
    technique as the d_dedup_clusters transitive-closure oracle), an
    independent re-derivation of the fold rather than a mirror of it. The
    pandas reference oracle in tests/test_eventsourcing.py pins the handler
    semantics a third way; per-group/sorted-stream equality is pinned there
    too."""
    df = es.replay_commands_sorted(
        # column-pruned before the exchange + Arrow boundary (props unused)
        _events(spark, sf_dir).select(
            "user_id", "ts", "event_id", "event_type", "value"
        ),
        key_col="user_id",
        order_cols=["ts", "event_id"],
        process_command=es.bank_process_command,
        handle_event=es.bank_handle_event,
        state_schema=es.BANK_STATE_SCHEMA,
    )
    return df.select(
        "account_number",
        F.round("balance", 2).alias("balance"),
        "n_rejected",
        "version",
    )


@query(
    "es_event_keys",
    oracle="""
    SELECT concat(user_id, ':', rn) AS event_key, event_id, user_id
    FROM (
      SELECT event_id, user_id,
             row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
      FROM events
    )
    """,
)
def es_event_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event key synthesis '"aggId:seq"' (TestBoundedContext.scala:159-161):
    per-key monotonically increasing sequence numbers."""
    e = _events(spark, sf_dir)
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    return e.select(
        F.concat_ws(":", F.col("user_id"), F.row_number().over(w)).alias("event_key"),
        "event_id",
        "user_id",
    )


@query(
    "es_state_snapshot_latest",
    oracle="""
    SELECT CAST(user_id AS VARCHAR) AS aggregate_id, event_id AS last_offset,
           event_type AS last_event_type, ts AS last_ts
    FROM (
      SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    ) WHERE rn = 1
    """,
)
def es_state_snapshot_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S1/A2: KTable materialization — latest record per aggregate
    (SurgeStateStoreConsumer.scala:57-76) via the latest_per_key operator."""
    e = _events(spark, sf_dir).select("user_id", "event_id", "event_type", "ts")
    latest = es.latest_per_key(e, ["user_id"], ["ts", "event_id"])
    return latest.select(
        F.col("user_id").cast("string").alias("aggregate_id"),
        F.col("event_id").alias("last_offset"),
        F.col("event_type").alias("last_event_type"),
        F.col("ts").alias("last_ts"),
    )


# --------------------------------------------------------------------------
# Metrics statistics (A3-A7, modules/metrics)
# --------------------------------------------------------------------------


@query(
    "m_sensor_statistics",
    oracle="""
    SELECT event_type AS sensor,
           count(*) AS n,
           CAST(round(min(value), 4) AS DOUBLE) AS min_value,
           CAST(round(max(value), 4) AS DOUBLE) AS max_value,
           CAST(round(avg(value), 4) AS DOUBLE) AS avg_value,
           CAST(round(lv, 4) AS DOUBLE) AS last_value
    FROM events
    JOIN (
      SELECT event_type AS et2, value AS lv
      FROM (SELECT *, row_number() OVER (PARTITION BY event_type ORDER BY ts DESC, event_id DESC) rn
            FROM events) WHERE rn = 1
    ) ON event_type = et2
    GROUP BY event_type, lv
    """,
)
def m_sensor_statistics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3-A5: Count / Min / Max / MostRecentValue metric statistics
    (modules/metrics/src/main/scala/surge/metrics/statistics/*) as one
    partial+final aggregate per sensor; 'last' = max_by(value, offset)."""
    e = _events(spark, sf_dir)
    return e.groupBy(F.col("event_type").alias("sensor")).agg(
        F.count("*").alias("n"),
        F.round(F.min("value"), 4).alias("min_value"),
        F.round(F.max("value"), 4).alias("max_value"),
        F.round(F.avg("value"), 4).alias("avg_value"),
        F.round(F.max_by("value", F.struct("ts", "event_id")), 4).alias("last_value"),
    )


@query(
    "m_ewma",
    oracle="""
    SELECT CAST(user_id AS VARCHAR) AS sensor,
           CAST(round(sum(value * CASE WHEN rn = 1 THEN power(0.95, n - 1)
                                       ELSE 0.05 * power(0.95, n - rn) END), 6) AS DOUBLE) AS ewma
    FROM (
      SELECT user_id, value,
             row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn,
             count(*) OVER (PARTITION BY user_id) AS n
      FROM events
    ) GROUP BY user_id
    """,
)
def m_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6: ExponentiallyWeightedMovingAverage.scala:14-29 — ewma' = 0.95*ewma
    + 0.05*value, seeded with the first reading. Computed as the CLOSED-FORM
    weighted sum (the recurrence unrolled: weight 0.95^(n-1) on the seed,
    0.05·0.95^(n-i) on reading i), which is all-JVM declarative — two
    windows sharing one user_id exchange + one aggregate. The earlier
    pandas-ewm form computed the same numbers through an Arrow round trip
    at 6× the cost (3.15 → 0.5 s at sf0.1); the TRUE streaming recurrence
    (which a closed form cannot replace incrementally) lives in
    surge_spark/streaming/metrics.py."""
    e = _events(spark, sf_dir).select("user_id", "ts", "event_id", "value")
    w_ord = W.partitionBy("user_id").orderBy("ts", "event_id")
    w_all = W.partitionBy("user_id")
    weighted = e.select(
        "user_id",
        "value",
        F.row_number().over(w_ord).alias("rn"),
        F.count(F.lit(1)).over(w_all).alias("n"),
    ).select(
        "user_id",
        (
            F.col("value")
            * F.when(
                F.col("rn") == 1, F.pow(F.lit(0.95), F.col("n") - 1)
            ).otherwise(0.05 * F.pow(F.lit(0.95), F.col("n") - F.col("rn")))
        ).alias("wv"),
    )
    return (
        weighted.groupBy("user_id")
        .agg(F.round(F.sum("wv"), 6).alias("ewma"))
        .select(F.col("user_id").cast("string").alias("sensor"), "ewma")
    )


@query(
    "m_rate_per_minute",
    oracle="""
    SELECT event_type, date_trunc('minute', ts) AS bucket,
           count(*) AS n,
           CAST(round(count(*) / 60.0, 6) AS DOUBLE) AS rate_per_s
    FROM events GROUP BY event_type, date_trunc('minute', ts)
    """,
)
def m_rate_per_minute(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7: TimeBucketHistogram rate (TimeBucketHistogram.scala:15-50) —
    time-bucketed counts normalized to a per-second rate."""
    e = _events(spark, sf_dir)
    return (
        e.groupBy("event_type", F.date_trunc("minute", "ts").alias("bucket"))
        .agg(F.count("*").alias("n"))
        .withColumn("rate_per_s", F.round(F.col("n") / 60.0, 6))
    )


# --------------------------------------------------------------------------
# Health-signal windows, batch analogs (W2, W5; streaming forms in
# surge_spark.streaming.windows)
# --------------------------------------------------------------------------


@query(
    "h_tumbling_window_counts",
    oracle="""
    SELECT date_trunc('hour', ts) AS window_start, signal_type, count(*) AS n
    FROM (SELECT ts, event_type AS signal_type FROM events)
    GROUP BY date_trunc('hour', ts), signal_type
    """,
)
def h_tumbling_window_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W2: tumbling signal windows (HealthSignalWindowActor.scala:315-323) —
    batch form of groupBy(window(ts, d))."""
    e = _events(spark, sf_dir).select("ts", F.col("event_type").alias("signal_type"))
    return (
        e.groupBy(F.window("ts", "1 hour"), "signal_type")
        .agg(F.count("*").alias("n"))
        .select(F.col("window.start").alias("window_start"), "signal_type", "n")
    )


@query(
    "h_sliding_window_counts",
    oracle="""
    SELECT ws AS window_start, count(*) AS n FROM (
      SELECT date_trunc('hour', ts) AS ws FROM events WHERE event_type = 'error'
      UNION ALL
      SELECT date_trunc('hour', ts) - INTERVAL 1 HOUR AS ws
      FROM events WHERE event_type = 'error'
    ) GROUP BY ws
    """,
)
def h_sliding_window_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1 (time-based form): sliding window size 2h slide 1h over error
    signals — each signal lands in two windows. The count-triggered slide
    variant (WindowSlider.scala:20-37) is in streaming/windows.py."""
    e = _events(spark, sf_dir).where(F.col("event_type") == "error")
    return (
        e.groupBy(F.window("ts", "2 hours", "1 hour"))
        .agg(F.count("*").alias("n"))
        .select(F.col("window.start").alias("window_start"), "n")
    )


@query(
    "h_repeating_signal_match",
    oracle="""
    SELECT user_id, date_trunc('hour', ts) AS window_start, count(*) AS n_errors
    FROM events
    WHERE regexp_matches(event_type, '^err')
    GROUP BY user_id, date_trunc('hour', ts)
    HAVING count(*) >= 3
    """,
)
def h_repeating_signal_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W5: RepeatingSignalMatcher (RepeatingSignalMatcher.scala:20-30) —
    regex-filtered signals counted per window, alert when count >= times."""
    e = _events(spark, sf_dir)
    return (
        e.where(F.col("event_type").rlike("^err"))
        .groupBy("user_id", F.window("ts", "1 hour"))
        .agg(F.count("*").alias("n_errors"))
        .where(F.col("n_errors") >= 3)
        .select("user_id", F.col("window.start").alias("window_start"), "n_errors")
    )


@query(
    "h_session_windows",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts, event_id,
             CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS new_session
      FROM events
    ), sessions AS (
      SELECT user_id, ts,
             sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS UNBOUNDED PRECEDING) AS session_id
      FROM flagged
    )
    SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
           count(*) AS n_events, min(ts) AS session_start
    FROM sessions GROUP BY user_id, session_id
    """,
)
def h_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows (gap 30 min) per user — the batch analog of
    session_window(); formulated with lag + running sum so the oracle is
    exact (Spark's session_window struct bounds don't round-trip to SQL)."""
    e = _events(spark, sf_dir)
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    micros = F.unix_micros(F.col("ts"))
    flagged = e.withColumn(
        "new_session",
        F.when(
            micros - F.lag(micros).over(w) > 1800 * 1_000_000,
            1,
        ).otherwise(0),
    )
    sessions = flagged.withColumn(
        "session_id",
        F.sum("new_session").over(w.rowsBetween(W.unboundedPreceding, W.currentRow)),
    )
    return sessions.groupBy("user_id", "session_id").agg(
        F.count("*").alias("n_events"), F.min("ts").alias("session_start")
    )


@query(
    "es_count_fold_vectorized",
    oracle="""
    SELECT CAST(user_id AS VARCHAR) AS aggregate_id,
           CAST(sum(CASE event_type WHEN 'purchase' THEN 1 WHEN 'signup' THEN 1
                                    WHEN 'error' THEN -1 ELSE 0 END) AS INT) AS count,
           CAST(count(*) AS INT) AS version
    FROM events GROUP BY user_id
    """,
)
def es_count_fold_vectorized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The lowered form of es_count_fold: when handle_event is a *linear*
    fold (state' = state + f(event), no order-dependent branching), the
    per-key ordered fold is algebraically a grouped sum and lowers to
    whole-stage-codegen built-ins — ~10x the applyInPandas throughput.
    The engine keeps both: the generic handler path for arbitrary logic
    (BankAccount's balance-dependent rejections can't lower), this path for
    handlers declared reducible. Results are bit-identical (integer math)."""
    e = _events(spark, sf_dir)
    delta = (
        F.when(F.col("event_type").isin("purchase", "signup"), 1)
        .when(F.col("event_type") == "error", -1)
        .otherwise(0)
    )
    return e.groupBy(F.col("user_id").cast("string").alias("aggregate_id")).agg(
        F.sum(delta).cast("int").alias("count"),
        F.count("*").cast("int").alias("version"),
    )


@query(
    "m_rate_trailing_60s",
    oracle="""
    WITH sec AS (
      SELECT event_type, date_trunc('second', ts) AS s FROM events
    ), contrib AS (
      SELECT event_type, s - to_seconds(CAST(k.k AS BIGINT)) AS window_start
      FROM sec, LATERAL (SELECT unnest(range(0, 60)) AS k) k
    )
    SELECT event_type, window_start, count(*) AS n,
           CAST(round(count(*) / 60.0, 6) AS DOUBLE) AS rate_per_s
    FROM contrib GROUP BY event_type, window_start
    """,
)
def m_rate_trailing_60s(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7 exact form: the trailing-60s RateHistogram
    (RateHistogram.scala:10-12, buckets TimeBucketHistogram.scala:15-50) as
    a true sliding window — every 1 s slide that contains the event counts
    it. Spark's window(ts, 60s, 1s) replicates each row into its 60 member
    windows map-side, then one partial+final count — the same shape the
    streaming version uses with a watermark. On a DENSE stream (≫1 event
    per second per type) pre-aggregate per (type, second) BEFORE the ×60
    replication so the fan-out runs on second-counts, not raw events —
    measured break-even on this sparse testdata (~1 event/s: 4.9 s vs
    5.6 s at sf0.1), a strict win at density. RE-MEASURED r15
    (optimization round, interleaved): the two-level form (groupBy
    (type, second) → explode(sequence(0,59)) → second aggregate) is
    WORSE here — {6.9, 10.5} vs {5.5, 5.9} s — because the stream is
    sparse (distinct (type, second) ≈ n_events, so the pre-aggregate
    removes nothing) and the single-aggregate form's map-side partial
    aggregation already collapses the ×60 fan-out before its one
    exchange; the rewrite just adds a second shuffle. Keep the
    single-window form; the pre-agg remains the documented shape for
    dense streams."""
    e = _events(spark, sf_dir)
    return (
        e.groupBy(F.window("ts", "60 seconds", "1 second"), "event_type")
        .agg(F.count("*").alias("n"))
        .select(
            "event_type",
            F.col("window.start").alias("window_start"),
            "n",
            F.round(F.col("n") / 60.0, 6).alias("rate_per_s"),
        )
    )


@query(
    "m_anomaly_zscore",
    oracle="""
    WITH s AS (
      SELECT event_type, avg(value) AS m, stddev_pop(value) AS sd
      FROM events GROUP BY event_type
      HAVING stddev_pop(value) <> 0
    )
    SELECT e.event_id, e.event_type,
           CAST(round(e.value, 4) AS DOUBLE) AS value,
           CAST(round((e.value - s.m) / s.sd, 4) AS DOUBLE) AS zscore
    FROM events e JOIN s USING (event_type)
    WHERE abs((e.value - s.m) / s.sd) > 3.0
    """,
)
def m_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-sensor z-score outlier detection — the metric-anomaly read the
    reference's statistics surface (min/max/avg, surge.metrics.statistics)
    exists to support, as one pass: a sensor-sized stats aggregate
    broadcast back onto the stream, flagging |z| > 3. At 100 TB the stats
    table stays a few rows per sensor; the event stream never shuffles.

    Zero-variance sensors (one event, or constant values) are excluded on
    BOTH sides: under Spark 4 ANSI mode a stddev_pop of 0 would raise
    DIVIDE_BY_ZERO, while DuckDB would yield inf and drop the row — so the
    guard is part of the query's semantics, not an optimization."""
    e = _events(spark, sf_dir)
    stats = e.groupBy("event_type").agg(
        F.avg("value").alias("_m"), F.stddev_pop("value").alias("_sd")
    ).where(F.col("_sd") != 0)
    z = (F.col("value") - F.col("_m")) / F.col("_sd")
    return (
        e.join(F.broadcast(stats), "event_type")
        .withColumn("_z", z)
        .where(F.abs("_z") > 3.0)
        .select(
            "event_id",
            "event_type",
            F.round("value", 4).alias("value"),
            F.round("_z", 4).alias("zscore"),
        )
    )


@query(
    "es_read_path_snapshot_plus_tail",
    oracle="""
    WITH h AS (SELECT max(event_id) - 2000 AS h FROM events)
    SELECT user_id,
           max(event_id) FILTER (event_id <= h.h) AS snapshot_offset,
           CAST(round(arg_max(value, event_id) FILTER (event_id <= h.h), 4) AS DOUBLE)
             AS snapshot_value,
           count(*) FILTER (event_id > h.h) AS n_tail
    FROM events, h GROUP BY user_id
    """,
)
def es_read_path_snapshot_plus_tail(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The §3.2 read path (aggregateFor(id).getState,
    AggregateRef.scala:35-44) as one declarative pass: state = snapshot at
    the compaction horizon ⊕ replay of the tail past it. The horizon (max
    offset - 2000) stands in for the last committed snapshot offset; one
    conditional partial+final aggregate computes the snapshot offset/value
    and the tail length per key — the events stream shuffles once, on the
    aggregate key, exactly like the KTable build it complements."""
    e = _events(spark, sf_dir)
    horizon = e.agg((F.max("event_id") - F.lit(2000)).alias("_h"))
    j = e.crossJoin(F.broadcast(horizon))
    return j.groupBy("user_id").agg(
        F.max(F.when(F.col("event_id") <= F.col("_h"), F.col("event_id"))).alias(
            "snapshot_offset"
        ),
        F.round(
            F.expr("max_by(value, event_id) FILTER (WHERE event_id <= _h)"), 4
        ).alias("snapshot_value"),
        F.count(F.when(F.col("event_id") > F.col("_h"), 1)).alias("n_tail"),
    )


@query(
    "m_time_rollup",
    oracle="""
    SELECT CAST(year(ts) AS INT) AS yr, CAST(month(ts) AS INT) AS mo,
           count(*) AS n_events,
           CAST(round(sum(value), 2) AS DOUBLE) AS total_value
    FROM events
    GROUP BY ROLLUP (year(ts), month(ts))
    """,
)
def m_time_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style time-hierarchy rollup: event counts and value
    totals at (year, month), (year), and grand-total granularities in ONE
    pass — the continuous-aggregate shape a metrics store materializes
    over a time-partitioned fact table. Spark's ROLLUP expands to
    grouping sets inside a single partial+final aggregate (no re-scan per
    level); at 100 TB the same query prunes to the touched time
    partitions. Reference parity: the multi-resolution view over the A3-A7
    metrics family (surge.internal.health metrics aggregates)."""
    e = _events(spark, sf_dir)
    return e.rollup(
        F.year("ts").alias("yr"), F.month("ts").alias("mo")
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 2).alias("total_value"),
    )


@query(
    "m_funnel_conversion",
    oracle="""
    WITH s1 AS (
      SELECT user_id, min(ts) AS t1 FROM events
      WHERE event_type = 'view' GROUP BY user_id
    ),
    s2 AS (
      SELECT e.user_id, min(e.ts) AS t2
      FROM events e JOIN s1 ON e.user_id = s1.user_id
        AND e.ts > s1.t1 AND e.ts <= s1.t1 + INTERVAL 24 HOUR
      WHERE e.event_type = 'click' GROUP BY e.user_id
    ),
    s3 AS (
      SELECT e.user_id, min(e.ts) AS t3
      FROM events e JOIN s2 ON e.user_id = s2.user_id
        AND e.ts > s2.t2 AND e.ts <= s2.t2 + INTERVAL 24 HOUR
      WHERE e.event_type = 'purchase' GROUP BY e.user_id
    )
    SELECT (SELECT count(DISTINCT user_id) FROM events) AS n_users,
           (SELECT count(*) FROM s1) AS n_view,
           (SELECT count(*) FROM s2) AS n_click_after,
           (SELECT count(*) FROM s3) AS n_purchase_after,
           CAST(round((SELECT count(*) FROM s3)
                      / greatest((SELECT count(*) FROM s1), 1), 6) AS DOUBLE)
             AS full_funnel_rate
    """,
)
def m_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel analysis (view → click → purchase) with a 24-hour
    conversion window per step: users counted at each step only if the
    step's FIRST occurrence falls within 24 h AFTER the previous step's
    first occurrence — the product-analytics sequence query (per-type min
    alone is wrong: a click before the first view must not count, and an
    unbounded funnel saturates on any long-lived corpus). Each stage is a
    per-user min aggregate joined to the previous stage on user_id with a
    time residual, so all three stages shuffle on the SAME key and the
    exchanges line up; stage inputs prune by event_type at the scan. The
    funnel result is five scalars. NEGATIVE A/B (r15, sf0.1
    interleaved): materializing s1/s2 (each feeds the next stage's join
    AND its own scalar count — 7 events scans in the lazy plan, s1 3x,
    s2 2x) measured WORSE both ways: localCheckpoint 3.27 s (the
    ExistingRDD frames lose size stats, the stage joins lose
    auto-broadcast and shuffle the filtered events), persist() 1.10 s
    (cache fill + InMemoryRelation overhead beats the recompute — each
    re-derived stage is one filter-pruned scan + one keyed aggregate,
    ~0.2 s). Original lazy form: 0.765 s. Kept lazy; the stage scans
    prune by event_type so the amplification is bounded at scale."""
    e = _events(spark, sf_dir)
    s1 = (
        e.where(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    s2 = (
        e.where(F.col("event_type") == "click")
        .join(s1, "user_id")
        .where(
            (F.col("ts") > F.col("t1"))
            & (F.col("ts") <= F.col("t1") + F.expr("INTERVAL 24 HOURS"))
        )
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    s3 = (
        e.where(F.col("event_type") == "purchase")
        .join(s2, "user_id")
        .where(
            (F.col("ts") > F.col("t2"))
            & (F.col("ts") <= F.col("t2") + F.expr("INTERVAL 24 HOURS"))
        )
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    counts = (
        e.agg(F.countDistinct("user_id").alias("n_users"))
        .join(F.broadcast(s1.agg(F.count(F.lit(1)).alias("n_view"))))
        .join(F.broadcast(s2.agg(F.count(F.lit(1)).alias("n_click_after"))))
        .join(F.broadcast(s3.agg(F.count(F.lit(1)).alias("n_purchase_after"))))
    )
    return counts.select(
        "n_users",
        "n_view",
        "n_click_after",
        "n_purchase_after",
        F.round(
            F.col("n_purchase_after") / F.greatest(F.col("n_view"), F.lit(1)), 6
        ).alias("full_funnel_rate"),
    )


@query(
    "m_retention_cohorts",
    oracle="""
    WITH cohorts AS (
      SELECT user_id, date_trunc('day', min(ts)) AS cohort_day
      FROM events GROUP BY user_id
    ),
    activity AS (
      SELECT DISTINCT user_id, date_trunc('day', ts) AS activity_day
      FROM events
    )
    SELECT c.cohort_day,
           CAST(date_diff('day', c.cohort_day, a.activity_day) AS INT)
             AS day_offset,
           count(DISTINCT a.user_id) AS n_users
    FROM activity a JOIN cohorts c ON a.user_id = c.user_id
    WHERE date_diff('day', c.cohort_day, a.activity_day) BETWEEN 0 AND 7
    GROUP BY c.cohort_day, day_offset
    """,
)
def m_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retention cohort matrix: users grouped by first-seen day, counted on
    each of their first 8 active days — the product-analytics retention
    triangle. Per-user cohort assignment is one aggregate; the (user, day)
    activity set dedups map-side reduction before joining the cohort table
    on user_id (same key as the cohort aggregate's exchange); the matrix
    itself is bounded (cohorts × 8). At 100 TB the cohort table is the
    small side and broadcasts."""
    e = _events(spark, sf_dir)
    cohorts = e.groupBy("user_id").agg(
        F.date_trunc("day", F.min("ts")).alias("cohort_day")
    )
    activity = e.select(
        "user_id", F.date_trunc("day", "ts").alias("activity_day")
    ).distinct()
    off = F.datediff(F.col("activity_day"), F.col("cohort_day"))
    return (
        activity.join(cohorts, "user_id")
        .withColumn("day_offset", off)
        .where((F.col("day_offset") >= 0) & (F.col("day_offset") <= 7))
        .groupBy("cohort_day", "day_offset")
        .agg(F.countDistinct("user_id").alias("n_users"))
    )


@query(
    "m_event_transition_matrix",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
             lag(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
             ) AS prev
      FROM events
    ),
    trans AS (
      SELECT prev, event_type AS next, count(*) AS n
      FROM seq WHERE prev IS NOT NULL
      GROUP BY prev, next
    ),
    outdeg AS (SELECT prev, sum(n) AS total FROM trans GROUP BY prev)
    SELECT t.prev, t.next, CAST(t.n AS BIGINT) AS n,
           CAST(round(t.n / CAST(o.total AS DOUBLE), 6) AS DOUBLE) AS p
    FROM trans t JOIN outdeg o USING (prev)
    """,
)
def m_event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event sequences
    (prev → next counts and conditional probabilities) — the sequence-
    mining primitive under next-action prediction, funnel discovery, and
    anomalous-flow detection. One lag window per user (partitioned —
    parallel, state is one row), then two small aggregates; the
    event-type alphabet bounds the output at |types|², independent of
    corpus size. Ordering ties broken by event_id on both engines."""
    e = _events(spark, sf_dir)
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        "user_id", "event_type", F.lag("event_type").over(w).alias("prev")
    ).where(F.col("prev").isNotNull())
    trans = seq.groupBy(
        F.col("prev"), F.col("event_type").alias("next")
    ).agg(F.count(F.lit(1)).alias("n"))
    outdeg = trans.groupBy("prev").agg(F.sum("n").alias("total"))
    return trans.join(outdeg, "prev").select(
        "prev",
        "next",
        "n",
        F.round(F.col("n") / F.col("total").cast("double"), 6).alias("p"),
    )


@query(
    "m_markov_entropy_rate",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
             lag(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
             ) AS prev
      FROM events
    ),
    c2 AS (
      SELECT prev AS s, event_type AS t, CAST(count(*) AS BIGINT) AS c
      FROM seq WHERE prev IS NOT NULL GROUP BY 1, 2
    ),
    cs AS (SELECT s, CAST(sum(c) AS BIGINT) AS cs FROM c2 GROUP BY 1),
    tot AS (SELECT CAST(sum(c) AS BIGINT) AS n,
                   CAST(count(*) AS BIGINT) AS n_cells FROM c2)
    SELECT tot.n AS n_transitions, tot.n_cells,
           CAST(round(-sum(CAST(c2.c AS DOUBLE) / tot.n
                * ln(CAST(c2.c AS DOUBLE) / cs.cs)), 6) AS DOUBLE)
             AS entropy_rate_nats
    FROM c2 JOIN cs USING (s) CROSS JOIN tot
    GROUP BY tot.n, tot.n_cells
    """,
)
def m_markov_entropy_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Empirical entropy rate of the first-order event-type Markov chain
    — H = −Σ_{s,t} (c_st/C)·ln(c_st/c_s·), the single number that says
    how PREDICTABLE user behavior is given the previous action (the
    chain-level summary of m_event_transition_matrix: near 0 = flows
    are deterministic funnels, near ln|types| = memoryless noise; a
    drift in it is a product-change signal entropy-per-type misses).
    Same lag window + |types|²-bounded counts as the transition matrix
    (deliberately the IDENTICAL sequence convention, including the
    NULL-user partition and event_id tiebreak); every probability
    derives from exact integers and the ≤|types|²-term float sum
    rounds to 6 (25 terms — far inside the float-sum-order band).
    Output: one row (n_transitions, n_cells, entropy_rate_nats)."""
    e = _events(spark, sf_dir)
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        "user_id", "event_type", F.lag("event_type").over(w).alias("prev")
    ).where(F.col("prev").isNotNull())
    c2 = seq.groupBy(
        F.col("prev").alias("s"), F.col("event_type").alias("t")
    ).agg(F.count(F.lit(1)).alias("c"))
    cs = c2.groupBy("s").agg(F.sum("c").alias("cs"))
    tot = c2.groupBy().agg(
        F.sum("c").alias("n"), F.count(F.lit(1)).alias("n_cells")
    )
    return (
        c2.join(cs, "s")
        .crossJoin(F.broadcast(tot))
        .groupBy("n", "n_cells")
        .agg(
            F.expr(
                "CAST(round(-sum(CAST(c AS DOUBLE) / n"
                " * ln(CAST(c AS DOUBLE) / cs)), 6) AS DOUBLE)"
            ).alias("entropy_rate_nats")
        )
        .select(
            F.col("n").alias("n_transitions"), "n_cells", "entropy_rate_nats"
        )
    )


@query(
    "m_user_entropy_per_type",
    oracle="""
    WITH cnt AS (
      SELECT event_type, user_id, count(*) AS n
      FROM events GROUP BY event_type, user_id
    ),
    tot AS (SELECT event_type, sum(n) AS t, count(*) AS k FROM cnt GROUP BY event_type)
    SELECT c.event_type,
           CAST(t.k AS BIGINT) AS n_users,
           CAST(round(-sum((c.n / CAST(t.t AS DOUBLE))
                           * ln(c.n / CAST(t.t AS DOUBLE))), 6) AS DOUBLE)
             AS entropy_nats,
           CAST(round(CASE WHEN t.k > 1
                 THEN -sum((c.n / CAST(t.t AS DOUBLE))
                           * ln(c.n / CAST(t.t AS DOUBLE))) / ln(t.k)
                 ELSE 0.0 END, 6) AS DOUBLE) AS normalized
    FROM cnt c JOIN tot t USING (event_type)
    GROUP BY c.event_type, t.k, t.t
    """,
)
def m_user_entropy_per_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy of the per-event-type user distribution (nats, and
    normalized by ln(k) to [0,1]) — the concentration/drift monitor a
    pipeline runs to catch one user/tenant dominating a stream or a
    formerly-diverse source collapsing. Two partial+final aggregates; the
    probability terms are computed from grouped counts so no row-level
    log work."""
    e = _events(spark, sf_dir)
    cnt = e.groupBy("event_type", "user_id").agg(F.count(F.lit(1)).alias("n"))
    tot = cnt.groupBy("event_type").agg(
        F.sum("n").alias("t"), F.count(F.lit(1)).alias("k")
    )
    p = F.col("n") / F.col("t").cast("double")
    ent = -F.sum(p * F.log(p))
    return (
        cnt.join(tot, "event_type")
        .groupBy("event_type", "k", "t")
        .agg(ent.alias("_h"))
        .select(
            "event_type",
            F.col("k").alias("n_users"),
            F.round(F.col("_h"), 6).alias("entropy_nats"),
            F.round(
                F.when(F.col("k") > 1, F.col("_h") / F.log(F.col("k").cast("double")))
                .otherwise(F.lit(0.0)),
                6,
            ).alias("normalized"),
        )
    )


@query(
    "m_dau_wau_mau",
    oracle="""
    WITH du AS (
      SELECT DISTINCT date_trunc('day', ts) AS day, user_id
      FROM events WHERE user_id IS NOT NULL
    ),
    days AS (SELECT DISTINCT day FROM du),
    dau AS (
      SELECT day, CAST(count(DISTINCT user_id) AS BIGINT) AS dau
      FROM du GROUP BY day
    ),
    wau AS (
      SELECT t.day, CAST(count(DISTINCT u.user_id) AS BIGINT) AS wau
      FROM days t JOIN du u
        ON u.day BETWEEN t.day - INTERVAL 6 DAY AND t.day
      GROUP BY t.day
    ),
    mau AS (
      SELECT t.day, CAST(count(DISTINCT u.user_id) AS BIGINT) AS mau
      FROM days t JOIN du u
        ON u.day BETWEEN t.day - INTERVAL 27 DAY AND t.day
      GROUP BY t.day
    )
    SELECT d.day, d.dau, w.wau, m.mau
    FROM dau d JOIN wau w USING (day) JOIN mau m USING (day)
    """,
)
def m_dau_wau_mau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling distinct-user engagement (DAU / trailing-7-day WAU /
    trailing-28-day MAU per day) — THE product health metric triple. The
    oracle uses the textbook theta-join form; the Spark side uses the
    scale shape: each (day, user) activity row EXPLODES to the <= 28
    target days it covers (sequence + date_add — bounded fan-out, a
    map-side generate), then one partial+final distinct-count per target
    day. No theta join (a range join over 100 TB of activity re-shuffles
    the big side per day probed) and no unpartitioned window; the
    exploded stream is hash-partitioned by target day. Each distinct
    count is its OWN aggregate joined on day — the multi-distinct Expand
    measured 5x slower on o_table_stats (r10 A/B). NEGATIVE A/B (r15,
    sf0.1 interleaved): materializing du (read by dau + both trailing
    explodes + days — 5 events scans in the lazy plan) measured WORSE
    every way: localCheckpoint 1.19 s, persist 1.56 s, persist +
    explicit broadcast(days) 1.87 s vs 0.955 s lazy. The re-derived du
    is one column-pruned scan + map-side-partial distinct per consumer
    and fuses into each consumer's first shuffle; any barrier breaks
    that fusion for a frame too small to amortize it. Kept lazy."""
    e = _events(spark, sf_dir).where(F.col("user_id").isNotNull())
    du = e.select(F.date_trunc("day", "ts").alias("day"), "user_id").distinct()
    days = du.select("day").distinct()

    def trailing(n: int, name: str) -> DataFrame:
        tgt = du.select(
            F.expr(f"explode(sequence(0, {n - 1}))").alias("off"),
            "day",
            "user_id",
        ).select(F.expr("day + make_dt_interval(off)").alias("day"), "user_id")
        return (
            tgt.join(days, "day", "left_semi")
            .groupBy("day")
            .agg(F.countDistinct("user_id").alias(name))
        )

    dau = du.groupBy("day").agg(F.countDistinct("user_id").alias("dau"))
    return dau.join(trailing(7, "wau"), "day").join(trailing(28, "mau"), "day")


@query(
    "m_event_path_trigrams",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
             lag(event_type, 1) OVER w AS t1,
             lag(event_type, 2) OVER w AS t2
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT concat_ws('>', t2, t1, event_type) AS path,
           CAST(count(*) AS BIGINT) AS n
    FROM seq WHERE t2 IS NOT NULL
    GROUP BY path
    ORDER BY n DESC, path
    LIMIT 25
    """,
)
def m_event_path_trigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-25 event-type trigram paths across all per-user sequences —
    the order-3 extension of m_event_transition_matrix and the shape
    behind clickstream path mining / funnel discovery. Two lags over ONE
    per-user window (a single WindowExec pass — Spark evaluates both lag
    frames in the same partitioned sort), a partial+final count on the
    path string, and a TakeOrderedAndProject(25) global top-k (never a
    full sort). Ties broken by path text so the limit is deterministic
    on both engines."""
    e = _events(spark, sf_dir)
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        "event_type",
        F.lag("event_type", 1).over(w).alias("t1"),
        F.lag("event_type", 2).over(w).alias("t2"),
    ).where(F.col("t2").isNotNull())
    return (
        seq.select(
            F.concat_ws(">", "t2", "t1", "event_type").alias("path")
        )
        .groupBy("path")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), "path")
        .limit(25)
    )


@query(
    "w_activity_streaks",
    oracle="""
    WITH du AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS d
      FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
    ),
    isl AS (
      SELECT user_id, d,
             d - CAST(row_number() OVER (
                   PARTITION BY user_id ORDER BY d
                 ) AS INTEGER) AS anchor
      FROM du
    ),
    streaks AS (
      SELECT user_id, anchor, count(*) AS len
      FROM isl GROUP BY user_id, anchor
    )
    SELECT user_id,
           CAST(sum(len) AS BIGINT) AS active_days,
           CAST(count(*) AS BIGINT) AS n_streaks,
           CAST(max(len) AS BIGINT) AS longest_streak
    FROM streaks GROUP BY user_id
    """,
)
def w_activity_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: per-user consecutive-active-day streaks (total
    active days, number of islands, longest streak) — the classic
    date-minus-row_number anchor trick, the engagement-streak metric
    every product dashboard carries. The window is PARTITIONED by user
    over the per-user distinct-DAY stream (bounded at days-per-user
    rows, not events), so no unpartitioned WindowExec and no event-row
    sort; everything downstream is two partial+final aggregates on
    (user, anchor) then (user). row_number ties are impossible post-
    distinct, making the anchor — and the whole output — deterministic
    on both engines."""
    e = _events(spark, sf_dir).where(
        F.col("user_id").isNotNull() & F.col("ts").isNotNull()
    )
    du = e.select("user_id", F.col("ts").cast("date").alias("d")).distinct()
    w = W.partitionBy("user_id").orderBy("d")
    isl = du.select(
        "user_id", F.date_sub("d", F.row_number().over(w)).alias("anchor")
    )
    streaks = isl.groupBy("user_id", "anchor").agg(
        F.count(F.lit(1)).alias("len")
    )
    return streaks.groupBy("user_id").agg(
        F.sum("len").alias("active_days"),
        F.count(F.lit(1)).alias("n_streaks"),
        F.max("len").alias("longest_streak"),
    )


@query(
    "m_pareto_share",
    oracle="""
    WITH cnt AS (
      SELECT user_id, count(*) AS n FROM events
      WHERE user_id IS NOT NULL GROUP BY user_id
    ),
    t AS (SELECT CAST(count(*) AS BIGINT) AS nu,
                 CAST(sum(n) AS BIGINT) AS te FROM cnt),
    r AS (
      SELECT n,
             row_number() OVER w AS rk,
             sum(n) OVER w AS cum
      FROM cnt
      WINDOW w AS (ORDER BY n DESC, user_id)
    )
    SELECT CAST((rk - 1) * 10 // nu + 1 AS BIGINT) AS decile,
           CAST(count(*) AS BIGINT) AS n_users,
           CAST(sum(n) AS BIGINT) AS n_events,
           CAST(round(max(cum) / CAST(te AS DOUBLE), 6) AS DOUBLE)
             AS cum_share
    FROM r, t
    GROUP BY decile, te
    """,
)
def m_pareto_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lorenz-curve concentration by user decile ("do 10% of users
    produce 80% of events?") — the Pareto health check every platform
    dashboard runs. Users are ranked by activity DESC; each decile row
    carries its user/event counts and the CUMULATIVE event share at the
    decile's end. Both the rank and the running event total come from
    the exact two-pass distributed prefix sum (operators/text.py) over
    ONE shared approxQuantile bounds action — no unpartitioned WindowExec
    anywhere (a global ORDER BY window funnels every user through one
    task; at 100 TB the user table alone is billions of rows). The final
    share division happens once per decile on exact longs, so round(6)
    is engine-stable. Oracle uses the textbook single-window form."""
    from surge_spark.operators.text import distributed_prefix_sum

    e = _events(spark, sf_dir).where(F.col("user_id").isNotNull())
    cnt = (
        e.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("__one", F.lit(1))
        .persist()
    )
    tot = cnt.groupBy().agg(
        F.count(F.lit(1)).alias("nu"), F.sum("n").alias("te")
    )
    (nb,) = cnt.stat.approxQuantile(["n"], [i / 16 for i in range(1, 16)], 0.001)
    order = [F.col("n").desc(), F.col("user_id").asc()]
    r1 = distributed_prefix_sum(
        cnt, "__one", "n", order, descending=True, out_col="__rk", bounds=nb
    )
    r2 = distributed_prefix_sum(
        r1, "n", "n", order, descending=True, out_col="__cum", bounds=nb
    )
    return (
        r2.crossJoin(F.broadcast(tot))
        .select(
            F.expr("((__rk - 1) * 10) div nu + 1").alias("decile"),
            "n",
            "__cum",
            "te",
        )
        .groupBy("decile")
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.sum("n").alias("n_events"),
            F.round(
                F.max("__cum") / F.max("te").cast("double"), 6
            ).alias("cum_share"),
        )
    )


@query(
    "m_holt_smoothing",
    oracle="""
    WITH RECURSIVE ordered AS (
      SELECT user_id, value,
             row_number() OVER (
               PARTITION BY user_id ORDER BY ts, event_id
             ) AS rn
      FROM events WHERE value IS NOT NULL AND user_id IS NOT NULL
    ),
    lim AS (SELECT user_id, max(rn) AS mx FROM ordered GROUP BY user_id),
    fold(user_id, rn, level, trend) AS (
      SELECT user_id, 1, value, CAST(0.0 AS DOUBLE)
      FROM ordered WHERE rn = 1
      UNION ALL
      SELECT f.user_id, f.rn + 1,
             0.5 * o.value + 0.5 * (f.level + f.trend),
             0.5 * ((0.5 * o.value + 0.5 * (f.level + f.trend)) - f.level)
               + 0.5 * f.trend
      FROM fold f JOIN ordered o
        ON o.user_id = f.user_id AND o.rn = f.rn + 1
    )
    SELECT CAST(f.user_id AS VARCHAR) AS aggregate_id,
           CAST(l.mx AS INT) AS n,
           CAST(round(f.level, 6) AS DOUBLE) AS level,
           CAST(round(f.trend, 6) AS DOUBLE) AS trend,
           CAST(round(f.level + f.trend, 6) AS DOUBLE) AS forecast
    FROM fold f JOIN lim l USING (user_id) WHERE f.rn = l.mx
    """,
)
def m_holt_smoothing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt's linear (level+trend) smoothing per user over the ordered
    value stream, with the one-step-ahead forecast — the trend-aware
    upgrade of m_ewma, run as the SAME sorted-stream fold kernel the
    event-sourcing entries use (forecasting state is just fold state;
    one Python call per Arrow batch, not per key). The oracle advances
    every user one step per recursion round (the es_bank_fold
    recursive-CTE precedent) performing the identical float64 ops in
    the identical order, so the final states match to round(6) without
    any closed-form trick — unlike EWMA, Holt has no order-free sum
    form, which is exactly why it pins the ORDERED fold path."""
    e = (
        _events(spark, sf_dir)
        .where(F.col("value").isNotNull() & F.col("user_id").isNotNull())
        .select("user_id", "ts", "event_id", "value")
    )
    folded = es.fold_events_sorted(
        e,
        key_col="user_id",
        order_cols=["ts", "event_id"],
        handle_event=es.holt_handle_event,
        state_schema=es.HOLT_STATE_SCHEMA,
    )
    return folded.select(
        "aggregate_id",
        "n",
        F.round("level", 6).alias("level"),
        F.round("trend", 6).alias("trend"),
        F.round(F.col("level") + F.col("trend"), 6).alias("forecast"),
    )


@query(
    "m_holt_winters_weekly",
    oracle="""
    WITH RECURSIVE daily AS (
      SELECT event_type, epoch_ms(ts) // 86400000 AS d,
             CAST(count(*) AS BIGINT) AS cnt
      FROM events GROUP BY 1, 2
    ),
    ordered AS (
      SELECT event_type, cnt,
             row_number() OVER (PARTITION BY event_type ORDER BY d) AS rn
      FROM daily
    ),
    lim AS (SELECT event_type, max(rn) AS mx FROM ordered GROUP BY event_type),
    fold(event_type, rn, level, trend, s0, s1, s2, s3, s4, s5, s6) AS (
      SELECT event_type, 1, CAST(cnt AS DOUBLE), CAST(0.0 AS DOUBLE),
             CAST(0.0 AS DOUBLE), CAST(0.0 AS DOUBLE), CAST(0.0 AS DOUBLE), CAST(0.0 AS DOUBLE), CAST(0.0 AS DOUBLE), CAST(0.0 AS DOUBLE), CAST(0.0 AS DOUBLE)
      FROM ordered WHERE rn = 1
      UNION ALL
      SELECT f.event_type, f.rn + 1,
        (0.5 * (o.cnt - CASE f.rn % 7 WHEN 0 THEN f.s0 WHEN 1 THEN f.s1 WHEN 2 THEN f.s2 WHEN 3 THEN f.s3 WHEN 4 THEN f.s4 WHEN 5 THEN f.s5 WHEN 6 THEN f.s6 END) + 0.5 * (f.level + f.trend)),
        (0.3 * ((0.5 * (o.cnt - CASE f.rn % 7 WHEN 0 THEN f.s0 WHEN 1 THEN f.s1 WHEN 2 THEN f.s2 WHEN 3 THEN f.s3 WHEN 4 THEN f.s4 WHEN 5 THEN f.s5 WHEN 6 THEN f.s6 END) + 0.5 * (f.level + f.trend)) - f.level) + 0.7 * f.trend),
        CASE WHEN f.rn % 7 = 0 THEN 0.4 * (o.cnt - (0.5 * (o.cnt - CASE f.rn % 7 WHEN 0 THEN f.s0 WHEN 1 THEN f.s1 WHEN 2 THEN f.s2 WHEN 3 THEN f.s3 WHEN 4 THEN f.s4 WHEN 5 THEN f.s5 WHEN 6 THEN f.s6 END) + 0.5 * (f.level + f.trend))) + 0.6 * f.s0 ELSE f.s0 END,
        CASE WHEN f.rn % 7 = 1 THEN 0.4 * (o.cnt - (0.5 * (o.cnt - CASE f.rn % 7 WHEN 0 THEN f.s0 WHEN 1 THEN f.s1 WHEN 2 THEN f.s2 WHEN 3 THEN f.s3 WHEN 4 THEN f.s4 WHEN 5 THEN f.s5 WHEN 6 THEN f.s6 END) + 0.5 * (f.level + f.trend))) + 0.6 * f.s1 ELSE f.s1 END,
        CASE WHEN f.rn % 7 = 2 THEN 0.4 * (o.cnt - (0.5 * (o.cnt - CASE f.rn % 7 WHEN 0 THEN f.s0 WHEN 1 THEN f.s1 WHEN 2 THEN f.s2 WHEN 3 THEN f.s3 WHEN 4 THEN f.s4 WHEN 5 THEN f.s5 WHEN 6 THEN f.s6 END) + 0.5 * (f.level + f.trend))) + 0.6 * f.s2 ELSE f.s2 END,
        CASE WHEN f.rn % 7 = 3 THEN 0.4 * (o.cnt - (0.5 * (o.cnt - CASE f.rn % 7 WHEN 0 THEN f.s0 WHEN 1 THEN f.s1 WHEN 2 THEN f.s2 WHEN 3 THEN f.s3 WHEN 4 THEN f.s4 WHEN 5 THEN f.s5 WHEN 6 THEN f.s6 END) + 0.5 * (f.level + f.trend))) + 0.6 * f.s3 ELSE f.s3 END,
        CASE WHEN f.rn % 7 = 4 THEN 0.4 * (o.cnt - (0.5 * (o.cnt - CASE f.rn % 7 WHEN 0 THEN f.s0 WHEN 1 THEN f.s1 WHEN 2 THEN f.s2 WHEN 3 THEN f.s3 WHEN 4 THEN f.s4 WHEN 5 THEN f.s5 WHEN 6 THEN f.s6 END) + 0.5 * (f.level + f.trend))) + 0.6 * f.s4 ELSE f.s4 END,
        CASE WHEN f.rn % 7 = 5 THEN 0.4 * (o.cnt - (0.5 * (o.cnt - CASE f.rn % 7 WHEN 0 THEN f.s0 WHEN 1 THEN f.s1 WHEN 2 THEN f.s2 WHEN 3 THEN f.s3 WHEN 4 THEN f.s4 WHEN 5 THEN f.s5 WHEN 6 THEN f.s6 END) + 0.5 * (f.level + f.trend))) + 0.6 * f.s5 ELSE f.s5 END,
        CASE WHEN f.rn % 7 = 6 THEN 0.4 * (o.cnt - (0.5 * (o.cnt - CASE f.rn % 7 WHEN 0 THEN f.s0 WHEN 1 THEN f.s1 WHEN 2 THEN f.s2 WHEN 3 THEN f.s3 WHEN 4 THEN f.s4 WHEN 5 THEN f.s5 WHEN 6 THEN f.s6 END) + 0.5 * (f.level + f.trend))) + 0.6 * f.s6 ELSE f.s6 END
      FROM fold f JOIN ordered o
        ON o.event_type = f.event_type AND o.rn = f.rn + 1
    )
    SELECT CAST(f.event_type AS VARCHAR) AS aggregate_id,
           CAST(l.mx AS BIGINT) AS n,
           CAST(round(f.level, 6) AS DOUBLE) AS level,
           CAST(round(f.trend, 6) AS DOUBLE) AS trend,
           CAST(round(f.level + f.trend + CASE l.mx % 7 WHEN 0 THEN f.s0 WHEN 1 THEN f.s1 WHEN 2 THEN f.s2 WHEN 3 THEN f.s3 WHEN 4 THEN f.s4 WHEN 5 THEN f.s5 WHEN 6 THEN f.s6 END, 6) AS DOUBLE)
             AS forecast_next
    FROM fold f JOIN lim l USING (event_type) WHERE f.rn = l.mx
    """,
)
def m_holt_winters_weekly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Additive Holt-Winters (triple exponential, weekly period 7) over
    each type's daily-count series — the SEASONAL upgrade of
    m_holt_smoothing: level/trend/seven seasonal offsets, one-step
    forecast = L + B + s_(n mod 7). Runs on the SAME sorted-stream fold
    kernel (seasonal state is just seven more floats); the recursive
    CTE advances every type one day per round performing the identical
    float64 ops in the identical order — including the one-minus
    coefficients as LITERALS (0.7, 0.6), never computed 1-x: float
    1-0.3 is 0.70000000000000007 while both engines parse the literal
    0.7 identically, and DuckDB decimal (1 - 0.3) would convert to a
    THIRD value (the HW_OMB note in the kernel). Seeded level=x1,
    trend=0, seasonals=0 (learned in week one, mirrored). The series is
    calendar-bounded per type (the w_rolling_correlation class)."""
    e = _events(spark, sf_dir)
    daily = e.groupBy(
        "event_type", F.expr("unix_millis(ts) div 86400000").alias("d")
    ).agg(F.count(F.lit(1)).alias("cnt"))
    folded = es.fold_events_sorted(
        daily,
        key_col="event_type",
        order_cols=["d"],
        handle_event=es.holt_winters_handle_event,
        state_schema=es.HW_STATE_SCHEMA,
    )
    return folded.select(
        "aggregate_id",
        "n",
        F.round("level", 6).alias("level"),
        F.round("trend", 6).alias("trend"),
        F.expr(
            "CAST(round(level + trend + CASE CAST(n % 7 AS INT) WHEN 0 THEN s0 WHEN 1 THEN s1 WHEN 2 THEN s2 WHEN 3 THEN s3 WHEN 4 THEN s4 WHEN 5 THEN s5 WHEN 6 THEN s6 END, 6) AS DOUBLE)"
        ).alias("forecast_next"),
    )


@query(
    "m_seasonality_dow",
    oracle="""
    WITH base AS (
      SELECT event_type, dayofweek(ts) + 1 AS dow FROM events
    ),
    cnt AS (
      SELECT event_type, dow, count(*) AS n_events
      FROM base GROUP BY event_type, dow
    ),
    tot AS (SELECT event_type, count(*) AS total FROM base GROUP BY event_type)
    SELECT c.event_type, CAST(c.dow AS INT) AS dow,
           CAST(c.n_events AS BIGINT) AS n_events,
           CAST(round(c.n_events / (t.total / 7.0), 6) AS DOUBLE)
             AS seasonal_index
    FROM cnt c JOIN tot t ON t.event_type = c.event_type
    """,
)
def m_seasonality_dow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week seasonality index per event type — the cyclical twin of
    m_time_rollup / m_holt_smoothing: observed count over the uniform
    expectation (total/7), the load-shaping profile an ops dashboard and
    a forecaster's seasonal adjustment both read. Two partial+final
    aggregates (per-cell, per-type) joined on the tiny type dimension —
    no window, no fan-out. Engine note: Spark's dayofweek() is 1=Sunday;
    DuckDB's is 0=Sunday — the oracle adds 1."""
    e = _events(spark, sf_dir)
    base = e.select("event_type", F.dayofweek("ts").alias("dow"))
    cnt = base.groupBy("event_type", "dow").agg(
        F.count(F.lit(1)).alias("n_events")
    )
    tot = base.groupBy("event_type").agg(F.count(F.lit(1)).alias("total"))
    return cnt.join(F.broadcast(tot), "event_type").select(
        "event_type",
        F.col("dow").cast("int"),
        "n_events",
        F.round(F.col("n_events") / (F.col("total") / 7.0), 6).alias(
            "seasonal_index"
        ),
    )


@query(
    "m_gap_fill_forward",
    oracle="""
    WITH daily AS (
      SELECT user_id, day, round(value, 4) AS v FROM (
        SELECT user_id, CAST(ts AS DATE) AS day, value,
               row_number() OVER (
                 PARTITION BY user_id, CAST(ts AS DATE)
                 ORDER BY ts DESC, event_id DESC
               ) AS rn
        FROM events
      ) WHERE rn = 1
    ),
    span AS (
      SELECT user_id, CAST(d AS DATE) AS day FROM (
        SELECT user_id,
               unnest(generate_series(min(day), max(day), INTERVAL 1 DAY)) AS d
        FROM daily GROUP BY user_id
      )
    )
    SELECT s.user_id, strftime(s.day, '%Y-%m-%d') AS day,
           CAST(last_value(d.v IGNORE NULLS) OVER (
             PARTITION BY s.user_id ORDER BY s.day
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS value,
           (d.user_id IS NOT NULL) AS is_observed
    FROM span s LEFT JOIN daily d
      ON d.user_id = s.user_id AND d.day = s.day
    """,
)
def m_gap_fill_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar gap-filling with forward fill — the time-series
    regularization every dashboard/feature pipeline runs before joins or
    models that assume one row per (key, day): each user's daily series
    is completed over their own [first, last] day span (bounded fan-out:
    span days per user, generated map-side with sequence+explode, never
    a calendar cross join) and missing days carry the last observed
    value forward via last_value(IGNORE NULLS) over a PER-USER window
    (partitioned — joins the no-unpartitioned-window discipline). The
    per-day observation is the latest event's value that day
    (max_by over (ts, event_id), the deterministic last-write), rounded
    BEFORE the fill so both engines propagate identical doubles. A day
    whose only events carry NULL values forward-fills across, exactly
    like a missing day — pinned by the oracle's IGNORE NULLS twin."""
    e = _events(spark, sf_dir)
    daily = e.groupBy(
        "user_id", F.to_date("ts").alias("day")
    ).agg(
        F.round(
            F.max_by("value", F.struct(F.col("ts"), F.col("event_id"))), 4
        ).alias("v")
    )
    span = daily.groupBy("user_id").agg(
        F.min("day").alias("d0"), F.max("day").alias("d1")
    ).select(
        "user_id", F.explode(F.sequence("d0", "d1")).alias("day")
    )
    joined = span.join(
        daily.withColumnRenamed("user_id", "u2").withColumnRenamed("day", "day2"),
        (F.col("user_id") == F.col("u2")) & (F.col("day") == F.col("day2")),
        "left",
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return joined.select(
        "user_id",
        # ISO string, not DATE: the oracle comparator has no date-vs-
        # pandas-Timestamp normalization channel (DuckDB DATE arrives as
        # datetime64, Spark DATE as datetime.date objects)
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        F.last("v", ignorenulls=True).over(w).alias("value"),
        F.col("u2").isNotNull().alias("is_observed"),
    )


@query(
    "j_interval_overlap_join",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts, event_id,
             CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER (
                    PARTITION BY user_id ORDER BY ts, event_id
                  ) > 1800 * 1000000 THEN 1 ELSE 0 END AS new_session
      FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
    ),
    sess AS (
      SELECT user_id,
             sum(new_session) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS session_id,
             ts
      FROM flagged
    ),
    iv AS (
      SELECT user_id, session_id, min(ts) AS s0, max(ts) AS s1
      FROM sess GROUP BY user_id, session_id
    )
    SELECT a.user_id AS user_a, b.user_id AS user_b,
           CAST(count(*) AS BIGINT) AS n_concurrent
    FROM iv a JOIN iv b
      ON a.user_id < b.user_id AND a.s0 <= b.s1 AND b.s0 <= a.s1
    GROUP BY a.user_id, b.user_id
    """,
)
def j_interval_overlap_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERVAL-OVERLAP JOIN, bucket-decomposed: pairs of users with
    concurrent sessions (30-min-gap sessionization, the h_session logic)
    and how many session pairs overlap. The oracle states the textbook
    theta join (a.s0 <= b.s1 AND b.s0 <= a.s1); the Spark plan NEVER
    runs it — a theta-only join is a nested-loop over all session pairs
    at 100 TB. Instead each session explodes to its covered DAYS
    (bounded fan-out: span days per session), candidates equi-join on
    the day bucket, the exact overlap predicate filters, and a DISTINCT
    on the session-pair key collapses multi-day double-counting — the
    join-side sibling of m_dau_wau_mau's explode-not-range-join
    aggregation trick. Shuffles: sessionization windows are per-user;
    the candidate join keys on the day bucket (calendar-bounded key
    space — salt by hash(session) within a day if one day is hot)."""
    e = _events(spark, sf_dir).where(
        F.col("user_id").isNotNull() & F.col("ts").isNotNull()
    )
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    micros = F.unix_micros(F.col("ts"))
    flagged = e.withColumn(
        "new_session",
        F.when(micros - F.lag(micros).over(w) > 1800 * 1_000_000, 1).otherwise(0),
    )
    sess = flagged.withColumn(
        "session_id",
        F.sum("new_session").over(w.rowsBetween(W.unboundedPreceding, W.currentRow)),
    )
    iv = sess.groupBy("user_id", "session_id").agg(
        F.min("ts").alias("s0"), F.max("ts").alias("s1")
    )
    # materialize the narrow exploded frame ONCE: both self-join sides
    # otherwise re-run the whole sessionization pipeline (sort + two
    # windows + two aggregates + explode) — the g_adamic_adar
    # canonicalization lesson; the checkpoint is session-count-sized
    days = iv.select(
        "user_id", "session_id", "s0", "s1",
        F.explode(
            F.sequence(F.to_date("s0"), F.to_date("s1"))
        ).alias("bucket"),
    ).localCheckpoint(eager=False)
    a = days.select(
        F.col("user_id").alias("user_a"), F.col("session_id").alias("sid_a"),
        F.col("s0").alias("a0"), F.col("s1").alias("a1"), "bucket",
    )
    b = days.select(
        F.col("user_id").alias("user_b"), F.col("session_id").alias("sid_b"),
        F.col("s0").alias("b0"), F.col("s1").alias("b1"), "bucket",
    )
    pairs = (
        a.join(b, "bucket")
        .where(
            (F.col("user_a") < F.col("user_b"))
            & (F.col("a0") <= F.col("b1"))
            & (F.col("b0") <= F.col("a1"))
        )
        .select("user_a", "sid_a", "user_b", "sid_b")
        .distinct()
    )
    return pairs.groupBy("user_a", "user_b").agg(
        F.count(F.lit(1)).alias("n_concurrent")
    )


@query(
    "m_cohort_ltv",
    oracle="""
    WITH firsts AS (
      SELECT o_custkey, min(o_orderdate) AS first_dt
      FROM orders GROUP BY o_custkey
    ),
    j AS (
      SELECT o.o_custkey,
             CAST(round(o.o_totalprice * 100) AS BIGINT) AS cents,
             strftime(f.first_dt, '%Y-%m') AS cohort_month,
             CAST((year(o.o_orderdate) - year(f.first_dt)) * 12
                  + (month(o.o_orderdate) - month(f.first_dt)) AS INT)
               AS month_offset
      FROM orders o JOIN firsts f USING (o_custkey)
    ),
    per AS (
      SELECT cohort_month, month_offset, sum(cents) AS rev_cents,
             count(DISTINCT o_custkey) AS n_active
      FROM j GROUP BY cohort_month, month_offset
    ),
    sizes AS (
      SELECT strftime(first_dt, '%Y-%m') AS cohort_month,
             count(DISTINCT o_custkey) AS cohort_size
      FROM firsts GROUP BY 1
    )
    SELECT p.cohort_month, p.month_offset,
           CAST(p.n_active AS BIGINT) AS n_active,
           CAST(s.cohort_size AS BIGINT) AS cohort_size,
           CAST(sum(p.rev_cents) OVER (
                  PARTITION BY p.cohort_month ORDER BY p.month_offset
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                ) // s.cohort_size AS BIGINT) AS ltv_cents_per_user
    FROM per p JOIN sizes s USING (cohort_month)
    """,
)
def m_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort lifetime-value curves: customers grouped by first-order month,
    cumulative revenue per cohort member at each month offset — the
    revenue twin of m_retention_cohorts (which counts active users). Both
    heavy aggregates shuffle on o_custkey (first-order assignment, then
    the join back), the (cohort, offset) matrix is bounded by months², and
    the cumulative window runs over that bounded matrix partitioned by
    cohort — never over raw orders. Month offsets via truncated calendar
    arithmetic ((Δyear)*12 + Δmonth), identical on both engines; revenue
    converted to INTEGER CENTS per order before any aggregate — bigint
    sums are exact and order-independent, so the cumulative LTV is a pure
    function of the data on both engines (double revenue sums hit
    half-cent rounding boundaries at every tested scale; the per-row
    x*100 round is bitwise-identical IEEE math on both). The per-user
    LTV stays integer too — cents floor-divided by cohort size — because
    cum/size quotients land EXACTLY on half-cent boundaries whenever the
    divisor is small, where Spark's and DuckDB's round() disagree."""
    o = load_table(spark, sf_dir, "orders")
    firsts = o.groupBy("o_custkey").agg(F.min("o_orderdate").alias("first_dt"))
    j = o.join(firsts, "o_custkey").select(
        "o_custkey",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        F.date_format("first_dt", "yyyy-MM").alias("cohort_month"),
        (
            (F.year("o_orderdate") - F.year("first_dt")) * 12
            + (F.month("o_orderdate") - F.month("first_dt"))
        ).cast("int").alias("month_offset"),
    )
    per = j.groupBy("cohort_month", "month_offset").agg(
        F.sum("cents").alias("rev_cents"),
        F.countDistinct("o_custkey").alias("n_active"),
    )
    sizes = firsts.groupBy(
        F.date_format("first_dt", "yyyy-MM").alias("cohort_month")
    ).agg(F.count(F.lit(1)).alias("cohort_size"))  # firsts is unique per key
    w = (
        W.partitionBy("cohort_month")
        .orderBy("month_offset")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        per.join(sizes, "cohort_month")
        .withColumn("cum", F.sum("rev_cents").over(w))
        .select(
            "cohort_month",
            "month_offset",
            "n_active",
            "cohort_size",
            F.expr("CAST(cum div cohort_size AS BIGINT)").alias(
                "ltv_cents_per_user"
            ),
        )
    )


@query(
    "m_resurrection_stats",
    oracle="""
    WITH days AS (
      SELECT DISTINCT user_id, date_trunc('day', ts) AS d FROM events
    ),
    gaps AS (
      SELECT user_id, d,
             date_diff('day',
               lag(d) OVER (PARTITION BY user_id ORDER BY d), d) AS gap
      FROM days
    )
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_active_days,
           CAST(sum(CASE WHEN gap > 7 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_resurrections,
           CAST(max(coalesce(gap, 0)) AS INT) AS max_gap_days
    FROM gaps GROUP BY user_id
    """,
)
def m_resurrection_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Churn-and-reactivation per user: a RESURRECTION is a return after
    more than 7 idle days — the growth-accounting event (new / retained /
    resurrected / churned) product analytics decomposes DAU into. Distinct
    active days dedup map-side, one per-user ordered lag window (bounded
    by active days, not raw events), then a per-user aggregate on the
    same key — one shuffle end to end. Counts and day gaps only, no date
    columns in the output (the oracle comparator has no date channel)."""
    e = _events(spark, sf_dir)
    days = e.select(
        "user_id", F.date_trunc("day", "ts").alias("d")
    ).distinct()
    w = W.partitionBy("user_id").orderBy("d")
    gaps = days.select(
        "user_id", F.datediff(F.col("d"), F.lag("d").over(w)).alias("gap")
    )
    return gaps.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_active_days"),
        F.sum(F.when(F.col("gap") > 7, 1).otherwise(0)).alias(
            "n_resurrections"
        ),
        F.max(F.coalesce(F.col("gap"), F.lit(0)))
        .cast("int")
        .alias("max_gap_days"),
    )


@query(
    "m_anomaly_mad",
    oracle="""
    WITH med AS (
      SELECT event_type, quantile_cont(value, 0.5) AS med
      FROM events GROUP BY event_type
    ),
    dev AS (
      SELECT e.event_type, e.value, m.med, abs(e.value - m.med) AS adev
      FROM events e JOIN med m USING (event_type)
    ),
    mad AS (
      SELECT event_type, quantile_cont(adev, 0.5) AS mad
      FROM dev GROUP BY event_type
    )
    SELECT d.event_type,
           CAST(round(min(d.med), 6) AS DOUBLE) AS median_value,
           CAST(round(min(m.mad), 6) AS DOUBLE) AS mad,
           CAST(sum(CASE WHEN d.adev > 3 * 1.4826 * m.mad
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
           CAST(count(*) AS BIGINT) AS n_events
    FROM dev d JOIN mad m USING (event_type)
    GROUP BY d.event_type
    """,
)
def m_anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust anomaly detection via Median Absolute Deviation — the
    outlier monitor that survives the outliers it hunts (m_anomaly_zscore's
    mean/stddev both blow up under heavy tails; median/MAD have a 50%
    breakdown point). Two exact grouped medians (Spark percentile ≡
    DuckDB quantile_cont, the a_exact_percentiles equivalence) with a
    broadcast join-back between and after — the event stream shuffles on
    event_type once per pass; 1.4826·MAD is the Gaussian-consistent
    sigma estimate, so the 3-sigma rule carries over. At 100 TB both
    medians switch to approx_percentile under an error budget."""
    e = _events(spark, sf_dir)
    med = e.groupBy("event_type").agg(
        F.percentile("value", F.lit(0.5)).alias("med")
    )
    dev = e.join(F.broadcast(med), "event_type").select(
        "event_type",
        "value",
        "med",
        F.abs(F.col("value") - F.col("med")).alias("adev"),
    )
    mad = dev.groupBy("event_type").agg(
        F.percentile("adev", F.lit(0.5)).alias("mad")
    )
    return (
        dev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.round(F.min("med"), 6).alias("median_value"),
            F.round(F.min("mad"), 6).alias("mad"),
            F.sum(
                F.when(
                    F.col("adev") > 3 * 1.4826 * F.col("mad"), 1
                ).otherwise(0)
            ).alias("n_outliers"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


@query(
    "m_daily_backlog",
    oracle="""
    WITH daily AS (
      SELECT epoch_ms(ts) // 86400000 AS d,
             CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
                  AS BIGINT) AS arrivals,
             CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                  AS BIGINT) AS departures
      FROM events GROUP BY 1
    )
    SELECT CAST(d AS BIGINT) AS day, arrivals, departures,
           CAST(sum(arrivals - departures) OVER (
             ORDER BY d ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS backlog
    FROM daily
    """,
)
def m_daily_backlog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily queueing backlog — cumulative arrivals (views) minus
    departures (purchases): the Lindley-recurrence-shaped curve an
    operations dashboard reads to see demand outpacing fulfilment (the
    single-number siblings are m_error_budget_burn for errors and
    m_dau_wau_mau for engagement; backlog is the INTEGRAL view that
    catches slow leaks both miss). All-integer channels; the cumulative
    window runs over the CALENDAR-BOUNDED daily series (row count =
    number of days — the w_rolling_correlation class), so the
    single-series window cannot grow with data volume; the corpus-scale
    work is one conditional daily aggregate. Day ships as integer
    epoch-day (no date channel)."""
    e = _events(spark, sf_dir)
    daily = e.groupBy(
        F.expr("unix_millis(ts) div 86400000").alias("d")
    ).agg(
        F.sum(F.when(F.col("event_type") == "view", 1).otherwise(0)).alias(
            "arrivals"
        ),
        F.sum(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("departures"),
    )
    wf = W.orderBy("d").rowsBetween(W.unboundedPreceding, 0)
    return daily.select(
        F.col("d").cast("long").alias("day"),
        F.col("arrivals").cast("long").alias("arrivals"),
        F.col("departures").cast("long").alias("departures"),
        F.sum(F.col("arrivals") - F.col("departures")).over(wf).cast(
            "long"
        ).alias("backlog"),
    )


@query(
    "m_dow_seasonality_strength",
    oracle="""
    WITH daily AS (
      SELECT event_type, epoch_ms(ts) // 86400000 AS d,
             CAST(count(*) AS BIGINT) AS cnt
      FROM events GROUP BY 1, 2
    ),
    tt AS (
      SELECT event_type,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(cnt) AS BIGINT) AS s,
             CAST(sum(cnt * cnt) AS BIGINT) AS s2
      FROM daily GROUP BY 1
    ),
    dw AS (
      SELECT event_type, d % 7 AS dow,
             CAST(count(*) AS BIGINT) AS nd,
             CAST(sum(cnt) AS BIGINT) AS sd
      FROM daily GROUP BY 1, 2
    ),
    bw AS (
      SELECT event_type,
             sum(CAST(sd AS DOUBLE) * sd / nd) AS grp
      FROM dw GROUP BY 1
    )
    SELECT tt.event_type, tt.n AS n_days,
           CAST(CASE WHEN tt.s2 - CAST(tt.s AS DOUBLE) * tt.s / tt.n = 0
                THEN NULL
                ELSE round((bw.grp - CAST(tt.s AS DOUBLE) * tt.s / tt.n)
                     / (tt.s2 - CAST(tt.s AS DOUBLE) * tt.s / tt.n), 6)
                END AS DOUBLE) AS eta_sq
    FROM tt JOIN bw USING (event_type)
    """,
)
def m_dow_seasonality_strength(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week seasonality STRENGTH per event type — the correlation
    ratio η² = SS_between(dow) / SS_total over the daily-count series:
    the one number that says how much of daily variance the weekly
    cycle explains (m_seasonality_dow ships the per-dow means; this
    ships how much they MATTER — the go/no-go input for whether a
    forecast needs the t−7 seasonal-naive of m_forecast_backtest_mae).
    dow = epoch_day % 7 (never engine dow labels — the chi²/MI rule);
    every sum of squares derives from exact integers (Σc², Σc, per-dow
    Σ, n), the 7-cell between-group float sum is order-safe, one
    mirrored quotient round-6, zero-variance → NULL both sides."""
    e = _events(spark, sf_dir)
    daily = e.groupBy(
        "event_type", F.expr("unix_millis(ts) div 86400000").alias("d")
    ).agg(F.count(F.lit(1)).alias("cnt"))
    tt = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("cnt").alias("s"),
        F.sum(F.expr("cnt * cnt")).alias("s2"),
    )
    dw = daily.groupBy("event_type", F.expr("d % 7").alias("dow")).agg(
        F.count(F.lit(1)).alias("nd"), F.sum("cnt").alias("sd")
    )
    bw = dw.groupBy("event_type").agg(
        F.sum(F.expr("CAST(sd AS DOUBLE) * sd / nd")).alias("grp")
    )
    return tt.join(bw, "event_type").select(
        "event_type",
        F.col("n").alias("n_days"),
        F.expr(
            "CAST(CASE WHEN s2 - CAST(s AS DOUBLE) * s / n = 0 THEN NULL"
            " ELSE round((grp - CAST(s AS DOUBLE) * s / n)"
            " / (s2 - CAST(s AS DOUBLE) * s / n), 6) END AS DOUBLE)"
        ).alias("eta_sq"),
    )


@query(
    "m_permutation_entropy",
    oracle="""
    WITH daily AS (
      SELECT event_type, epoch_ms(ts) // 86400000 AS d,
             CAST(count(*) AS BIGINT) AS cnt
      FROM events GROUP BY 1, 2
    ),
    win AS (
      SELECT event_type, cnt AS x0,
             lead(cnt, 1) OVER w AS x1,
             lead(cnt, 2) OVER w AS x2
      FROM daily WINDOW w AS (PARTITION BY event_type ORDER BY d)
    ),
    pat AS (
      SELECT event_type,
             (CASE WHEN x0 <= x1 THEN 1 ELSE 0 END)
             + 2 * (CASE WHEN x1 <= x2 THEN 1 ELSE 0 END)
             + 4 * (CASE WHEN x0 <= x2 THEN 1 ELSE 0 END) AS code
      FROM win WHERE x1 IS NOT NULL AND x2 IS NOT NULL
    ),
    pc AS (SELECT event_type, code, CAST(count(*) AS BIGINT) AS c
           FROM pat GROUP BY 1, 2),
    tot AS (SELECT event_type, CAST(sum(c) AS BIGINT) AS n,
                   CAST(count(*) AS BIGINT) AS n_patterns
            FROM pc GROUP BY 1)
    SELECT pc.event_type, tot.n AS n_windows, tot.n_patterns,
           CAST(round(-sum(CAST(pc.c AS DOUBLE) / tot.n
                * ln(CAST(pc.c AS DOUBLE) / tot.n)), 6) AS DOUBLE)
             AS perm_entropy_nats
    FROM pc JOIN tot USING (event_type)
    GROUP BY pc.event_type, tot.n, tot.n_patterns
    """,
)
def m_permutation_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Permutation entropy (Bandt-Pompe 2002) of each type's daily-count
    series — time-series COMPLEXITY from order-3 ordinal patterns: a
    trending/periodic series concentrates on few up-down shapes (low
    PE), white noise spreads over all of them (high PE) — the
    model-free regularity monitor beside m_autocorr_daily's linear
    correlations (PE sees nonlinear structure autocorrelation misses).
    Each 3-window maps to an integer ordinal code from the three
    pairwise <= comparisons (a deterministic mirrored encoding; ties
    resolve by position, the standard Bandt-Pompe convention), counts
    are exact integers, and the ≤8-cell entropy sum rounds to 6. The
    window rides the CALENDAR-BOUNDED per-type daily series (the
    w_rolling_correlation class); consecutive ROWS of that series, so
    a data gap splices its neighbors — documented, mirrored on both
    sides."""
    e = _events(spark, sf_dir)
    daily = e.groupBy(
        "event_type", F.expr("unix_millis(ts) div 86400000").alias("d")
    ).agg(F.count(F.lit(1)).alias("cnt"))
    w = W.partitionBy("event_type").orderBy("d")
    win = daily.select(
        "event_type",
        F.col("cnt").alias("x0"),
        F.lead("cnt", 1).over(w).alias("x1"),
        F.lead("cnt", 2).over(w).alias("x2"),
    ).where(F.col("x1").isNotNull() & F.col("x2").isNotNull())
    pat = win.select(
        "event_type",
        F.expr(
            "(CASE WHEN x0 <= x1 THEN 1 ELSE 0 END)"
            " + 2 * (CASE WHEN x1 <= x2 THEN 1 ELSE 0 END)"
            " + 4 * (CASE WHEN x0 <= x2 THEN 1 ELSE 0 END)"
        ).alias("code"),
    )
    pc = pat.groupBy("event_type", "code").agg(F.count(F.lit(1)).alias("c"))
    tot = pc.groupBy("event_type").agg(
        F.sum("c").alias("n"), F.count(F.lit(1)).alias("n_patterns")
    )
    return (
        pc.join(tot, "event_type")
        .groupBy("event_type", "n", "n_patterns")
        .agg(
            F.expr(
                "CAST(round(-sum(CAST(c AS DOUBLE) / n"
                " * ln(CAST(c AS DOUBLE) / n)), 6) AS DOUBLE)"
            ).alias("perm_entropy_nats")
        )
        .select(
            "event_type",
            F.col("n").alias("n_windows"),
            "n_patterns",
            "perm_entropy_nats",
        )
    )


@query(
    "m_anomaly_iqr",
    oracle="""
    WITH q AS (
      SELECT event_type,
             quantile_cont(value, 0.25) AS q1,
             quantile_cont(value, 0.75) AS q3
      FROM events GROUP BY event_type
    )
    SELECT e.event_type,
           CAST(round(min(q.q1), 6) AS DOUBLE) AS q1,
           CAST(round(min(q.q3), 6) AS DOUBLE) AS q3,
           CAST(round(min(q.q3 - q.q1), 6) AS DOUBLE) AS iqr,
           CAST(sum(CASE WHEN e.value < q.q1 - 1.5 * (q.q3 - q.q1)
                           OR e.value > q.q3 + 1.5 * (q.q3 - q.q1)
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
           CAST(count(*) AS BIGINT) AS n_events
    FROM events e JOIN q USING (event_type)
    GROUP BY e.event_type
    """,
)
def m_anomaly_iqr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tukey-fence anomaly detection (1.5·IQR beyond the quartiles) —
    the third member of the robust-outlier family beside m_anomaly_mad
    (median/MAD) and m_anomaly_zscore (mean/σ): the box-plot rule every
    BI layer draws, with a 25% breakdown point and NO distributional
    consistency constant to pick. Same machinery as MAD: one exact
    grouped quantile pass (Spark percentile ≡ DuckDB quantile_cont, the
    a_exact_percentiles equivalence), broadcast join-back, one
    conditional count — the event stream shuffles once. Fence
    comparisons run on the identical unrounded quantile doubles both
    engines derive (the MAD precedent); shipped floats round-6. NULL
    values never count as outliers on either side (NULL comparison →
    CASE else). At 100 TB the quantiles switch to approx_percentile
    under an error budget — a_percentile_estimate_error_audit is the
    entry that grades that swap."""
    e = _events(spark, sf_dir)
    q = e.groupBy("event_type").agg(
        F.percentile("value", F.lit(0.25)).alias("q1"),
        F.percentile("value", F.lit(0.75)).alias("q3"),
    )
    iqr = F.col("q3") - F.col("q1")
    return (
        e.join(F.broadcast(q), "event_type")
        .groupBy("event_type")
        .agg(
            F.round(F.min("q1"), 6).alias("q1"),
            F.round(F.min("q3"), 6).alias("q3"),
            F.round(F.min(iqr), 6).alias("iqr"),
            F.sum(
                F.when(
                    (F.col("value") < F.col("q1") - 1.5 * iqr)
                    | (F.col("value") > F.col("q3") + 1.5 * iqr),
                    1,
                ).otherwise(0)
            ).alias("n_outliers"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


@query(
    "m_forecast_backtest_mae",
    oracle="""
    WITH daily AS (
      SELECT event_type, date_trunc('day', ts) AS d, count(*) AS cnt
      FROM events GROUP BY event_type, d
    )
    SELECT a.event_type,
           CAST(count(*) AS BIGINT) AS n_eval_days,
           CAST(round(avg(abs(CAST(a.cnt AS DOUBLE)
                              - CAST(b.cnt AS DOUBLE))), 6) AS DOUBLE)
             AS mae,
           CAST(round(avg(CAST(a.cnt AS DOUBLE)
                          - CAST(b.cnt AS DOUBLE)), 6) AS DOUBLE) AS bias
    FROM daily a
    JOIN daily b ON a.event_type = b.event_type
                AND a.d = b.d + INTERVAL 7 DAY
    GROUP BY a.event_type
    """,
)
def m_forecast_backtest_mae(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling-origin backtest of the seasonal-naive forecaster (predict
    today = same weekday last week): per event type, the MAE and signed
    bias of the t-7 prediction over every day that HAS a t-7 reference —
    the baseline every fancier forecaster (m_holt_smoothing,
    m_seasonality_dow) must beat, evaluated entirely in-engine. The
    daily-count aggregate is the only event-scale shuffle; the
    backtest itself is an equi-join on (type, day-7) over the bounded
    daily matrix — no window, no gap-filling needed because the join
    simply skips days without a reference. Integer counts make the
    averages exact-sum-over-count deterministic."""
    e = _events(spark, sf_dir)
    daily = (
        e.groupBy("event_type", F.date_trunc("day", "ts").alias("d"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        # both join sides derive from this aggregate with DIFFERENT key
        # exprs (d vs d+7) — the exchanges can never canonicalize to a
        # ReusedExchange, so without a barrier the event-scale aggregate
        # runs twice
        .localCheckpoint(eager=False)
    )
    a = daily.select(
        "event_type", "d", F.col("cnt").alias("cnt_a")
    )
    b = daily.select(
        "event_type",
        F.date_add(F.col("d"), 7).cast("timestamp").alias("d"),
        F.col("cnt").alias("cnt_b"),
    )
    diff = F.col("cnt_a").cast("double") - F.col("cnt_b").cast("double")
    return (
        a.join(b, ["event_type", "d"])
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_eval_days"),
            F.round(F.avg(F.abs(diff)), 6).alias("mae"),
            F.round(F.avg(diff), 6).alias("bias"),
        )
    )


# Page-Hinkley recursive-step expressions, expanded textually in the CTE
# (a CTE cannot bind local names; the cusum-oracle pattern)
_PH_M = "(f.m + ((o.value - (f.s + o.value) / (f.rn + 1)) - 0.005))"
_PH_MIN = f"least(f.m_min, {_PH_M})"
_PH_ALARM = f"({_PH_M} - {_PH_MIN}) > 50.0"


@query(
    "m_page_hinkley",
    oracle=f"""
    WITH RECURSIVE ordered AS (
      SELECT user_id, value,
             row_number() OVER (
               PARTITION BY user_id ORDER BY ts, event_id
             ) AS rn
      FROM events WHERE value IS NOT NULL AND user_id IS NOT NULL
    ),
    lim AS (SELECT user_id, max(rn) AS mx FROM ordered GROUP BY user_id),
    fold(user_id, rn, s, m, m_min, n_alarms) AS (
      SELECT user_id, 1, value,
             CAST(-0.005 AS DOUBLE), CAST(-0.005 AS DOUBLE), 0
      FROM ordered WHERE rn = 1
      UNION ALL
      SELECT f.user_id, f.rn + 1, f.s + o.value,
        CASE WHEN {_PH_ALARM} THEN 0.0 ELSE {_PH_M} END,
        CASE WHEN {_PH_ALARM} THEN 0.0 ELSE {_PH_MIN} END,
        f.n_alarms + CASE WHEN {_PH_ALARM} THEN 1 ELSE 0 END
      FROM fold f JOIN ordered o
        ON o.user_id = f.user_id AND o.rn = f.rn + 1
    )
    SELECT CAST(f.user_id AS VARCHAR) AS aggregate_id,
           CAST(l.mx AS BIGINT) AS n,
           CAST(round(f.m, 6) AS DOUBLE) AS m,
           CAST(round(f.m_min, 6) AS DOUBLE) AS m_min,
           CAST(f.n_alarms AS BIGINT) AS n_alarms
    FROM fold f JOIN lim l USING (user_id) WHERE f.rn = l.mx
    """,
)
def m_page_hinkley(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Page-Hinkley upward-drift detection per user — the
    running-mean-referenced sequential change detector beside
    m_cusum_drift's fixed-baseline CUSUM (PH absorbs slow level shifts
    because the reference x̄ tracks the data; CUSUM alarms on them):
    m_t = Σ(xᵢ − x̄ᵢ − δ) against its running minimum, alarm + restart
    when the gap exceeds λ (δ=0.005, λ=50). A float recurrence whose
    reference changes every step — no closed form, so like holt/cusum
    it runs on the sorted-stream fold kernel and the recursive-CTE
    oracle performs the IDENTICAL float64 ops in the identical order
    (operation order is pinned in the kernel docstring: s += x, mean =
    s/n, m += ((x − mean) − δ)). First step folds to m = −δ exactly
    (x − x̄₁ is IEEE-exact 0), which the oracle's init row states as a
    literal."""
    e = (
        _events(spark, sf_dir)
        .where(F.col("value").isNotNull() & F.col("user_id").isNotNull())
        .select("user_id", "ts", "event_id", "value")
    )
    folded = es.fold_events_sorted(
        e,
        key_col="user_id",
        order_cols=["ts", "event_id"],
        handle_event=es.page_hinkley_handle_event,
        state_schema=es.PAGE_HINKLEY_STATE_SCHEMA,
    )
    return folded.select(
        "aggregate_id",
        "n",
        F.round("m", 6).alias("m"),
        F.round("m_min", 6).alias("m_min"),
        "n_alarms",
    )


@query(
    "m_cusum_drift",
    oracle="""
    WITH RECURSIVE ordered AS (
      SELECT user_id, value,
             row_number() OVER (
               PARTITION BY user_id ORDER BY ts, event_id
             ) AS rn
      FROM events WHERE value IS NOT NULL AND user_id IS NOT NULL
    ),
    lim AS (SELECT user_id, max(rn) AS mx FROM ordered GROUP BY user_id),
    fold(user_id, rn, baseline, s_pos, s_neg, n_alarms) AS (
      SELECT user_id, 1, value, CAST(0.0 AS DOUBLE), CAST(0.0 AS DOUBLE), 0
      FROM ordered WHERE rn = 1
      UNION ALL
      SELECT f.user_id, f.rn + 1, f.baseline,
        CASE WHEN greatest(0.0, f.s_pos + (o.value - f.baseline) - 0.5) > 5.0
             THEN 0.0
             ELSE greatest(0.0, f.s_pos + (o.value - f.baseline) - 0.5) END,
        CASE WHEN greatest(0.0, f.s_neg - (o.value - f.baseline) - 0.5) > 5.0
             THEN 0.0
             ELSE greatest(0.0, f.s_neg - (o.value - f.baseline) - 0.5) END,
        f.n_alarms
          + CASE WHEN greatest(0.0, f.s_pos + (o.value - f.baseline) - 0.5)
                      > 5.0
                   OR greatest(0.0, f.s_neg - (o.value - f.baseline) - 0.5)
                      > 5.0
                 THEN 1 ELSE 0 END
      FROM fold f JOIN ordered o
        ON o.user_id = f.user_id AND o.rn = f.rn + 1
    )
    SELECT CAST(f.user_id AS VARCHAR) AS aggregate_id,
           CAST(l.mx AS INT) AS n,
           CAST(round(f.s_pos, 6) AS DOUBLE) AS s_pos,
           CAST(round(f.s_neg, 6) AS DOUBLE) AS s_neg,
           CAST(f.n_alarms AS INT) AS n_alarms
    FROM fold f JOIN lim l USING (user_id) WHERE f.rn = l.mx
    """,
)
def m_cusum_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sided CUSUM change-point detection per user (Page 1954):
    cumulative deviations from a first-value baseline, alarm + reset on
    threshold crossings — the sequential drift monitor under data-quality
    alerting, run as the SAME sorted-stream fold kernel as holt/bank
    (alarm state is fold state; inherently order-dependent, no closed
    form — which is why it pins the ordered path). The oracle advances
    every user one step per recursion round performing the identical
    float64 ops in the identical order, alarms and resets included."""
    e = (
        _events(spark, sf_dir)
        .where(F.col("value").isNotNull() & F.col("user_id").isNotNull())
        .select("user_id", "ts", "event_id", "value")
    )
    folded = es.fold_events_sorted(
        e,
        key_col="user_id",
        order_cols=["ts", "event_id"],
        handle_event=es.cusum_handle_event,
        state_schema=es.CUSUM_STATE_SCHEMA,
    )
    return folded.select(
        "aggregate_id",
        "n",
        F.round("s_pos", 6).alias("s_pos"),
        F.round("s_neg", 6).alias("s_neg"),
        "n_alarms",
    )


@query(
    "m_burstiness",
    oracle="""
    WITH g AS (
      SELECT user_id,
             epoch_ms(ts) - lag(epoch_ms(ts)) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
             ) AS gap_ms
      FROM events WHERE user_id IS NOT NULL
    ),
    stats AS (
      SELECT user_id, count(*) AS n_gaps,
             avg(CAST(gap_ms AS DOUBLE)) AS mu,
             stddev_pop(CAST(gap_ms AS DOUBLE)) AS sigma
      FROM g WHERE gap_ms IS NOT NULL
      GROUP BY user_id HAVING count(*) >= 2
    )
    SELECT user_id, CAST(n_gaps AS BIGINT) AS n_gaps,
           CAST(round(mu, 3) AS DOUBLE) AS mean_gap_ms,
           CAST(round((sigma - mu) / (sigma + mu), 6) AS DOUBLE)
             AS burstiness
    FROM stats
    WHERE sigma + mu > 0
    """,
)
def m_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-event burstiness per user (Goh & Barabási 2008): B =
    (σ−μ)/(σ+μ) over the inter-arrival-gap distribution — −1 for a
    metronome, 0 for Poisson, →1 for bursty — the traffic-shape signal
    behind rate limiting and bot detection. Gaps in exact integer epoch
    millis (Spark unix_millis ≡ DuckDB epoch_ms) from one per-user lag
    window; mean/stddev_pop are single-aggregate moments over those
    integers, and B is a scale-free ratio so the millis unit cancels.
    σ+μ > 0 whenever a user has ≥2 gaps with any spread; identical-gap
    users give σ=0 → B=−1, no divide-by-zero as long as μ>0. Nothing
    ENFORCES μ>0 though (a user whose every gap is exactly 0 ms gives
    σ=μ=0 and a 0/0 NaN whose comparison/rendering semantics differ
    between engines — ADVICE r11), so both sides filter σ+μ>0
    explicitly, the m_anomaly_zscore zero-variance-guard precedent.
    All-zero-gap users are burst SINGULARITIES (undefined B), dropped
    rather than pinned to a sentinel."""
    e = _events(spark, sf_dir).where(F.col("user_id").isNotNull())
    ms = F.unix_millis(F.col("ts").cast("timestamp"))
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    g = e.select(
        "user_id", (ms - F.lag(ms).over(w)).alias("gap_ms")
    ).where(F.col("gap_ms").isNotNull())
    stats = (
        g.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_gaps"),
            F.avg(F.col("gap_ms").cast("double")).alias("mu"),
            F.stddev_pop(F.col("gap_ms").cast("double")).alias("sigma"),
        )
        .where(F.col("n_gaps") >= 2)
        .where(F.col("sigma") + F.col("mu") > 0)
    )
    return stats.select(
        "user_id",
        "n_gaps",
        F.round("mu", 3).alias("mean_gap_ms"),
        F.round(
            (F.col("sigma") - F.col("mu")) / (F.col("sigma") + F.col("mu")), 6
        ).alias("burstiness"),
    )


@query(
    "m_peak_detection",
    oracle="""
    WITH daily AS (
      SELECT event_type, date_trunc('day', ts) AS d, count(*) AS cnt
      FROM events GROUP BY event_type, d
    ),
    ctx AS (
      SELECT event_type, d, cnt,
             lag(cnt) OVER w AS prev_cnt,
             lead(cnt) OVER w AS next_cnt
      FROM daily
      WINDOW w AS (PARTITION BY event_type ORDER BY d)
    )
    SELECT event_type, strftime(d, '%Y-%m-%d') AS day,
           CAST(cnt AS BIGINT) AS cnt,
           CAST(prev_cnt AS BIGINT) AS prev_cnt,
           CAST(next_cnt AS BIGINT) AS next_cnt
    FROM ctx
    WHERE prev_cnt IS NOT NULL AND next_cnt IS NOT NULL
      AND cnt > prev_cnt AND cnt > next_cnt
    """,
)
def m_peak_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local-maximum peak detection over the per-type daily series (a
    strict peak beats both neighbors) — the alert-shaping primitive
    under spike triage, one lag+lead pass over the bounded daily matrix
    partitioned by type; series endpoints can't be peaks (no neighbor).
    Day ships as an ISO STRING — the oracle comparator has no date
    channel (the m_gap_fill_forward lesson). Integer counts, no float
    channel anywhere."""
    e = _events(spark, sf_dir)
    daily = e.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("d")
    ).agg(F.count(F.lit(1)).alias("cnt"))
    w = W.partitionBy("event_type").orderBy("d")
    ctx = daily.select(
        "event_type",
        "d",
        "cnt",
        F.lag("cnt").over(w).alias("prev_cnt"),
        F.lead("cnt").over(w).alias("next_cnt"),
    )
    return ctx.where(
        F.col("prev_cnt").isNotNull()
        & F.col("next_cnt").isNotNull()
        & (F.col("cnt") > F.col("prev_cnt"))
        & (F.col("cnt") > F.col("next_cnt"))
    ).select(
        "event_type",
        F.date_format("d", "yyyy-MM-dd").alias("day"),
        "cnt",
        "prev_cnt",
        "next_cnt",
    )


@query(
    "m_error_budget_burn",
    oracle="""
    WITH daily AS (
      SELECT date_trunc('day', ts) AS d,
             count(*) AS n_events,
             sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS n_errors
      FROM events GROUP BY d
    )
    SELECT strftime(d, '%Y-%m-%d') AS day,
           CAST(n_events AS BIGINT) AS n_events,
           CAST(n_errors AS BIGINT) AS n_errors,
           CAST((n_errors * 100000) // n_events AS BIGINT) AS burn_x1000,
           CAST(CASE WHEN n_errors * 100 > n_events THEN 1 ELSE 0 END AS INT)
             AS breach
    FROM daily
    """,
)
def m_error_budget_burn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SLO error-budget burn rate per day against a 99% success objective
    (Google SRE workbook: burn = error_rate / (1 - SLO); burn > 1 means
    the day spends more than its share of the monthly budget) — the
    alerting metric layered over the raw m_rate_* sensors. One daily
    aggregate; burn ships as integer thousandths (x1000 = errors *
    100000 // total) and the breach flag as the exact integer comparison
    errors*100 > total — no float channel, no rounding divergence
    possible. Day as ISO string (no date channel in the comparator)."""
    e = _events(spark, sf_dir)
    daily = e.groupBy(F.date_trunc("day", "ts").alias("d")).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(
            F.when(F.col("event_type") == "error", 1).otherwise(0)
        ).alias("n_errors"),
    )
    return daily.select(
        F.date_format("d", "yyyy-MM-dd").alias("day"),
        "n_events",
        "n_errors",
        F.expr("CAST((n_errors * 100000) div n_events AS BIGINT)").alias(
            "burn_x1000"
        ),
        F.when(F.col("n_errors") * 100 > F.col("n_events"), 1)
        .otherwise(0)
        .cast("int")
        .alias("breach"),
    )


@query(
    "m_retention_decay_fit",
    oracle="""
    WITH cohorts AS (
      SELECT user_id, date_trunc('day', min(ts)) AS cohort_day
      FROM events GROUP BY user_id
    ),
    activity AS (
      SELECT DISTINCT user_id, date_trunc('day', ts) AS activity_day
      FROM events
    ),
    matrix AS (
      SELECT CAST(date_diff('day', c.cohort_day, a.activity_day) AS INT)
               AS day_offset,
             count(DISTINCT a.user_id) AS n_users
      FROM activity a JOIN cohorts c ON a.user_id = c.user_id
      WHERE date_diff('day', c.cohort_day, a.activity_day) BETWEEN 0 AND 7
      GROUP BY day_offset
    ),
    base AS (SELECT n_users AS n0 FROM matrix WHERE day_offset = 0),
    pts AS (
      SELECT day_offset, ln(n_users / CAST(n0 AS DOUBLE)) AS lr
      FROM matrix CROSS JOIN base WHERE day_offset >= 1
    )
    SELECT CAST(count(*) AS BIGINT) AS n_points,
           CAST(round(regr_slope(lr, CAST(day_offset AS DOUBLE)), 6)
                AS DOUBLE) AS decay_per_day,
           CAST(round(regr_intercept(lr, CAST(day_offset AS DOUBLE)), 6)
                AS DOUBLE) AS log_intercept,
           CAST(round(regr_r2(lr, CAST(day_offset AS DOUBLE)), 6) AS DOUBLE)
             AS r2
    FROM pts
    """,
)
def m_retention_decay_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponential-decay fit over the aggregate retention curve: pool the
    m_retention_cohorts matrix by offset, normalize by day-0, and fit
    ln(retention) ~ offset by least squares — retention r(k) = e^(b+ak)
    means a straight log-line, so `decay_per_day` is the churn constant
    a growth model quotes (half-life = ln2/-a). The event-scale work is
    the same two aggregates retention itself needs; the regression runs
    over ≤7 points. In-engine model fitting beside a_ols_two_feature /
    g_degree_powerlaw_slope — curve summarization, not just counts."""
    e = _events(spark, sf_dir)
    cohorts = e.groupBy("user_id").agg(
        F.date_trunc("day", F.min("ts")).alias("cohort_day")
    )
    activity = e.select(
        "user_id", F.date_trunc("day", "ts").alias("activity_day")
    ).distinct()
    off = F.datediff(F.col("activity_day"), F.col("cohort_day"))
    matrix = (
        activity.join(cohorts, "user_id")
        .withColumn("day_offset", off)
        .where((F.col("day_offset") >= 0) & (F.col("day_offset") <= 7))
        .groupBy("day_offset")
        # count == countDistinct here: activity is distinct per (user,
        # day) and offset is a bijection of activity_day per user, so a
        # user appears at most once per offset — the distinct aggregate
        # would shuffle |user x active-day| rows for nothing
        .agg(F.count(F.lit(1)).alias("n_users"))
        .localCheckpoint(eager=False)  # consumers: base row + the points
    )
    base = matrix.where(F.col("day_offset") == 0).select(
        F.col("n_users").alias("n0")
    )
    pts = (
        matrix.where(F.col("day_offset") >= 1)
        .crossJoin(F.broadcast(base))
        .select(
            F.col("day_offset").cast("double").alias("x"),
            F.log(F.col("n_users") / F.col("n0").cast("double")).alias("lr"),
        )
    )
    return pts.agg(
        F.count(F.lit(1)).alias("n_points"),
        F.round(F.regr_slope(F.col("lr"), F.col("x")), 6).alias(
            "decay_per_day"
        ),
        F.round(F.regr_intercept(F.col("lr"), F.col("x")), 6).alias(
            "log_intercept"
        ),
        F.round(F.regr_r2(F.col("lr"), F.col("x")), 6).alias("r2"),
    )


@query(
    "m_attribution_last_touch",
    oracle="""
    WITH purchases AS (
      SELECT user_id, ts, event_id,
             CAST(round(value * 100) AS BIGINT) AS cents
      FROM events WHERE event_type = 'purchase'
    ),
    touches AS (
      SELECT user_id, ts, event_id, event_type FROM events
      WHERE event_type <> 'purchase'
    ),
    ranked AS (
      SELECT p.event_id, t.event_type,
             row_number() OVER (
               PARTITION BY p.event_id ORDER BY t.ts DESC, t.event_id DESC
             ) AS rn
      FROM purchases p JOIN touches t
        ON t.user_id = p.user_id
       AND t.ts < p.ts AND t.ts >= p.ts - INTERVAL 24 HOUR
    )
    SELECT coalesce(r.event_type, 'direct') AS channel,
           CAST(count(*) AS BIGINT) AS n_purchases,
           CAST(sum(p.cents) AS BIGINT) AS revenue_cents
    FROM purchases p
    LEFT JOIN ranked r ON r.event_id = p.event_id AND r.rn = 1
    GROUP BY channel
    """,
)
def m_attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch marketing attribution: every purchase's revenue is
    credited to the user's most recent non-purchase event within 24 h
    ('direct' when none) — the as-of-with-tolerance kernel shape wearing
    its canonical business hat, reduced to a bounded channel×revenue
    table. Revenue in exact integer cents (the m_cohort_ltv discipline —
    no float summation channel); the 24 h band bounds join state at
    scale exactly like j_asof_tolerance_join; LEFT semantics keep
    unattributed purchases visible instead of silently dropping them."""
    e = _events(spark, sf_dir)
    purchases = e.where(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        "event_id",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    touches = e.where(F.col("event_type") != "purchase").select(
        F.col("user_id").alias("t_user_id"),
        F.col("ts").alias("t_ts"),
        F.col("event_id").alias("t_event_id"),
        F.col("event_type").alias("t_type"),
    )
    best = (
        purchases.join(
            touches,
            (purchases.user_id == touches.t_user_id)
            & (touches.t_ts < purchases.ts)
            & (touches.t_ts >= purchases.ts - F.expr("INTERVAL 24 HOURS")),
        )
        .groupBy(F.col("event_id").alias("m_event_id"))
        .agg(
            F.max_by(
                F.col("t_type"), F.struct(F.col("t_ts"), F.col("t_event_id"))
            ).alias("t_type")
        )
    )
    return (
        purchases.join(best, purchases.event_id == best.m_event_id, "left")
        .groupBy(F.coalesce(F.col("t_type"), F.lit("direct")).alias("channel"))
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            F.sum("cents").alias("revenue_cents"),
        )
    )


@query(
    "m_apdex_score",
    oracle="""
    WITH c AS (
      SELECT event_type,
             count(*) AS total,
             sum(CASE WHEN value <= 100 THEN 1 ELSE 0 END) AS satisfied,
             sum(CASE WHEN value > 100 AND value <= 400 THEN 1 ELSE 0 END)
               AS tolerating
      FROM events GROUP BY event_type
    )
    SELECT event_type,
           CAST(total AS BIGINT) AS total,
           CAST(satisfied AS BIGINT) AS satisfied,
           CAST(tolerating AS BIGINT) AS tolerating,
           CAST(((2 * satisfied + tolerating) * 1000) // (2 * total)
                AS BIGINT) AS apdex_x1000
    FROM c
    """,
)
def m_apdex_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apdex (Application Performance Index) per event type — the SRE
    satisfaction score beside m_error_budget_burn: value read as a
    latency, satisfied <= T (100), tolerating <= 4T, and apdex =
    (satisfied + tolerating/2) / total. Shipped as INTEGER permille via
    (2*satisfied + tolerating)*1000 div (2*total) — the half-weight
    never materializes as a float, so there is no rounding channel at
    all (the m_cohort_ltv integer-cents discipline). One partial+final
    aggregate over the scan; conditional sums, no join."""
    e = _events(spark, sf_dir)
    c = e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("total"),
        F.sum(F.when(F.col("value") <= 100, 1).otherwise(0)).alias(
            "satisfied"
        ),
        F.sum(
            F.when((F.col("value") > 100) & (F.col("value") <= 400), 1)
            .otherwise(0)
        ).alias("tolerating"),
    )
    return c.select(
        "event_type",
        "total",
        "satisfied",
        "tolerating",
        F.expr(
            "CAST(((2 * satisfied + tolerating) * 1000) div (2 * total)"
            " AS BIGINT)"
        ).alias("apdex_x1000"),
    )


@query(
    "m_markov_prediction_accuracy",
    oracle="""
    WITH seq AS (
      SELECT event_type AS nxt,
             lag(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
             ) AS prev
      FROM events WHERE user_id IS NOT NULL
    ),
    trans AS (
      SELECT prev, nxt, count(*) AS cnt FROM seq
      WHERE prev IS NOT NULL GROUP BY prev, nxt
    ),
    model AS (
      SELECT prev, nxt AS predicted FROM (
        SELECT prev, nxt, row_number() OVER (
          PARTITION BY prev ORDER BY cnt DESC, nxt ASC
        ) AS rn FROM trans
      ) WHERE rn = 1
    ),
    scored AS (
      SELECT s.prev, s.nxt, m.predicted FROM seq s JOIN model m
        ON s.prev = m.prev
    )
    SELECT prev AS from_type,
           CAST(count(*) AS BIGINT) AS n_transitions,
           min(predicted) AS predicted,
           CAST(sum(CASE WHEN nxt = predicted THEN 1 ELSE 0 END)
                AS BIGINT) AS n_correct,
           CAST((sum(CASE WHEN nxt = predicted THEN 1 ELSE 0 END) * 1000000)
                // count(*) AS BIGINT) AS accuracy_ppm
    FROM scored GROUP BY prev
    """,
)
def m_markov_prediction_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """In-sample next-event prediction accuracy of the first-order Markov
    model — the evaluation half of m_event_transition_matrix (fitting a
    transition matrix is pointless if nobody measures whether argmax over
    it beats chance): predicted(prev) = the modal next type (ties to the
    LEXICOGRAPHICALLY SMALLEST type via the deterministic
    max_by(struct(cnt, -first_codepoint)) trick — Spark's mode() has
    partial-order-dependent tie winners, the a_mode_per_group lesson;
    the 5 event types have distinct first letters so one codepoint IS
    the total order, asserted in tests), accuracy = fraction of observed
    transitions whose next type equals the prediction, as integer ppm.
    One lag window, one |types|^2 aggregate, a broadcast-size model join
    back onto the transition stream."""
    e = _events(spark, sf_dir).where(F.col("user_id").isNotNull())
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        F.col("event_type").alias("nxt"),
        F.lag("event_type").over(w).alias("prev"),
    ).where(F.col("prev").isNotNull())
    trans = seq.groupBy("prev", "nxt").agg(F.count(F.lit(1)).alias("cnt"))
    model = trans.groupBy("prev").agg(
        F.max_by(
            F.col("nxt"),
            F.struct(F.col("cnt"), -F.ascii(F.col("nxt"))),
        ).alias("predicted")
    )
    scored = seq.join(F.broadcast(model), "prev")
    return scored.groupBy(F.col("prev").alias("from_type")).agg(
        F.count(F.lit(1)).alias("n_transitions"),
        F.min("predicted").alias("predicted"),
        F.sum(
            F.when(F.col("nxt") == F.col("predicted"), 1).otherwise(0)
        ).alias("n_correct"),
        F.expr(
            "CAST((sum(CASE WHEN nxt = predicted THEN 1 ELSE 0 END)"
            " * 1000000) div count(*) AS BIGINT)"
        ).alias("accuracy_ppm"),
    )


@query(
    "es_token_bucket_fold",
    oracle="""
    WITH RECURSIVE ordered AS (
      SELECT user_id, epoch_ms(ts) AS ms,
             row_number() OVER (
               PARTITION BY user_id ORDER BY ts, event_id
             ) AS rn
      FROM events WHERE user_id IS NOT NULL
    ),
    lim AS (SELECT user_id, max(rn) AS mx FROM ordered GROUP BY user_id),
    fold(user_id, rn, tokens, anchor_ms, n_allowed, n_throttled) AS (
      SELECT user_id, 1, CAST(2 AS BIGINT), ms,
             CAST(1 AS BIGINT), CAST(0 AS BIGINT)
      FROM ordered WHERE rn = 1
      UNION ALL
      SELECT f.user_id, f.rn + 1,
        CASE WHEN least(f.tokens + (o.ms - f.anchor_ms) // 86400000,
                        CAST(3 AS BIGINT)) >= 1
             THEN least(f.tokens + (o.ms - f.anchor_ms) // 86400000,
                        CAST(3 AS BIGINT)) - 1
             ELSE least(f.tokens + (o.ms - f.anchor_ms) // 86400000,
                        CAST(3 AS BIGINT)) END,
        CASE WHEN f.tokens + (o.ms - f.anchor_ms) // 86400000 >= 3
             THEN o.ms
             ELSE f.anchor_ms
                  + ((o.ms - f.anchor_ms) // 86400000) * 86400000 END,
        f.n_allowed
          + CASE WHEN least(f.tokens + (o.ms - f.anchor_ms) // 86400000,
                            CAST(3 AS BIGINT)) >= 1 THEN 1 ELSE 0 END,
        f.n_throttled
          + CASE WHEN least(f.tokens + (o.ms - f.anchor_ms) // 86400000,
                            CAST(3 AS BIGINT)) >= 1 THEN 0 ELSE 1 END
      FROM fold f JOIN ordered o
        ON o.user_id = f.user_id AND o.rn = f.rn + 1
    )
    SELECT CAST(f.user_id AS VARCHAR) AS aggregate_id,
           CAST(l.mx AS BIGINT) AS n,
           CAST(f.n_allowed AS BIGINT) AS n_allowed,
           CAST(f.n_throttled AS BIGINT) AS n_throttled,
           CAST(f.tokens AS BIGINT) AS tokens
    FROM fold f JOIN lim l USING (user_id) WHERE f.rn = l.mx
    """,
)
def es_token_bucket_fold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user TOKEN-BUCKET rate limiting as an ordered event fold
    (capacity 3, one token per day, bucket starts full) — the admission
    decision of a command gateway, run on the SAME sorted-stream fold
    kernel as bank/holt/cusum (R1's per-key serial order is exactly what
    makes a bucket fold well-defined). ALL-INTEGER state (tokens, refill
    anchor in epoch millis, allowed/throttled counts): whole tokens
    accrue by integer division from the anchor, the anchor advances only
    by whole-token strides so fractional refill time is never lost, and
    a full bucket re-anchors at the event — so the recursive-CTE oracle
    advancing every user one event per round reproduces the fold EXACTLY
    (no float channel anywhere; epoch_ms ≡ unix_millis, the m_burstiness
    lesson). Output: final bucket + admission totals per user."""
    e = _events(spark, sf_dir).where(F.col("user_id").isNotNull())
    e = e.select(
        "user_id",
        "ts",
        "event_id",
        F.unix_millis(F.col("ts").cast("timestamp")).alias("ms"),
    )
    folded = es.fold_events_sorted(
        e,
        key_col="user_id",
        order_cols=["ts", "event_id"],
        handle_event=es.token_bucket_handle_event,
        state_schema=es.TOKEN_BUCKET_STATE_SCHEMA,
    )
    return folded.select(
        "aggregate_id", "n", "n_allowed", "n_throttled", "tokens"
    )


@query(
    "es_burn_rate_fold",
    oracle="""
    WITH ev AS (
      SELECT user_id, epoch_ms(ts) // 86400000 AS b,
             CASE WHEN event_type = 'error' THEN 1 ELSE 0 END AS is_err
      FROM events WHERE user_id IS NOT NULL
    ),
    buckets AS (
      SELECT user_id, b, CAST(count(*) AS BIGINT) AS nt,
             CAST(sum(is_err) AS BIGINT) AS ne
      FROM ev GROUP BY 1, 2
    ),
    w AS (
      SELECT user_id, b, nt, ne,
             max(b) OVER (PARTITION BY user_id) AS mb,
             sum(nt) OVER (PARTITION BY user_id) AS n_events
      FROM buckets
    )
    SELECT CAST(user_id AS VARCHAR) AS aggregate_id,
           CAST(max(mb) AS BIGINT) AS bucket,
           CAST(max(CASE WHEN b = mb THEN nt END) AS BIGINT) AS n_total,
           CAST(max(CASE WHEN b = mb THEN ne END) AS BIGINT) AS n_err,
           CAST(sum(CASE WHEN b < mb AND ne * 1000000 > 2 * 10000 * nt
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_alarms,
           CAST(max(n_events) AS BIGINT) AS n
    FROM w GROUP BY user_id
    """,
)
def es_burn_rate_fold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user SRE error-budget burn monitor as an ordered event fold
    (1-day buckets, 1% budget, alarm on every CLOSED bucket burning at
    >= 2x budget) — the live-alerting sibling of m_error_budget_burn's
    batch report and the batch twin of streaming/metrics'
    burn_rate_stream (BOTH call the ONE all-integer burn_rate_step
    kernel). The oracle is NOT a recursive CTE: because the kernel's
    state is per-bucket counters closed on transition, the fold's final
    state is declaratively reconstructible — alarms are exactly the
    per-(user, bucket) aggregates below the user's max bucket whose
    cross-multiplied rate n_err*1e6 > factor*budget_ppm*n_total, and
    the open counters are the max bucket's aggregates — which checks
    the kernel against an INDEPENDENT formulation rather than a
    transliteration (stronger than the token-bucket CTE mirror).
    All-integer channels throughout."""
    e = _events(spark, sf_dir).where(F.col("user_id").isNotNull())
    e = e.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.unix_millis(F.col("ts").cast("timestamp")).alias("ms"),
    )
    folded = es.fold_events_sorted(
        e,
        key_col="user_id",
        order_cols=["ts", "event_id"],
        handle_event=es.burn_rate_handle_event,
        state_schema=es.BURN_RATE_STATE_SCHEMA,
    )
    return folded.select(
        "aggregate_id", "bucket", "n_total", "n_err", "n_alarms", "n"
    )


@query(
    "es_multiwindow_burn_fold",
    oracle="""
    WITH ev AS (
      SELECT user_id, ts, event_id, epoch_ms(ts) AS ms,
             CASE WHEN event_type = 'error' THEN 1 ELSE 0 END AS is_err
      FROM events WHERE user_id IS NOT NULL
    ),
    r1 AS (
      SELECT user_id, ts, event_id, is_err,
             ms // 86400000 AS sb, ms // 604800000 AS lb,
             CAST(row_number() OVER (
               PARTITION BY user_id, ms // 86400000 ORDER BY ts, event_id
             ) AS BIGINT) AS rs,
             CAST(sum(is_err) OVER (
               PARTITION BY user_id, ms // 86400000 ORDER BY ts, event_id
               ROWS UNBOUNDED PRECEDING
             ) AS BIGINT) AS rse,
             CAST(row_number() OVER (
               PARTITION BY user_id, ms // 604800000 ORDER BY ts, event_id
             ) AS BIGINT) AS rl,
             CAST(sum(is_err) OVER (
               PARTITION BY user_id, ms // 604800000 ORDER BY ts, event_id
               ROWS UNBOUNDED PRECEDING
             ) AS BIGINT) AS rle
      FROM ev
    ),
    r2 AS (
      SELECT user_id, sb,
             lag(sb) OVER wk AS p_sb,
             lag(rs) OVER wk AS p_rs, lag(rse) OVER wk AS p_rse,
             lag(rl) OVER wk AS p_rl, lag(rle) OVER wk AS p_rle
      FROM r1 WINDOW wk AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    pages AS (
      SELECT user_id,
             CAST(sum(CASE WHEN p_sb IS NOT NULL AND sb <> p_sb
                            AND p_rse * 1000000 > 2 * 10000 * p_rs
                            AND p_rle * 1000000 > 2 * 10000 * p_rl
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_pages,
             CAST(count(*) AS BIGINT) AS n
      FROM r2 GROUP BY user_id
    ),
    fin AS (
      SELECT user_id, sb, rs, rse, lb, rl, rle,
             row_number() OVER (
               PARTITION BY user_id ORDER BY ts DESC, event_id DESC
             ) AS rr
      FROM r1
    )
    SELECT CAST(f.user_id AS VARCHAR) AS aggregate_id,
           CAST(f.sb AS BIGINT) AS short_bucket,
           f.rs AS s_total, f.rse AS s_err,
           CAST(f.lb AS BIGINT) AS long_bucket,
           f.rl AS l_total, f.rle AS l_err,
           p.n_pages, p.n
    FROM fin f JOIN pages p USING (user_id) WHERE f.rr = 1
    """,
)
def es_multiwindow_burn_fold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user MULTI-WINDOW burn-rate paging as an ordered event fold —
    the batch half of cross-mode streaming twin #7 (r14 VERDICT task 6;
    live half: streaming/metrics.multiwindow_burn_stream, BOTH calling
    the ONE all-integer multiwindow_burn_step kernel): 1-day short +
    7-day long bucket counters in one state; a PAGE fires only when a
    closing short bucket burned > 2× budget AND the long window's open
    counters at that instant also did (the SRE workbook both-hot AND
    rule — m_multiwindow_burn_alerts' corpus report run as a live
    fold). The oracle is DECLARATIVE, not a recursive CTE: bucket
    values are monotone in the (ts, event_id) order, so the kernel's
    state after any event is exactly the running per-(user, bucket)
    counters at that row, and the state the page decision reads is the
    LAG of those counters — an independent formulation, not a
    transliteration. All-integer channels; no division anywhere."""
    e = _events(spark, sf_dir).where(F.col("user_id").isNotNull())
    e = e.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.unix_millis(F.col("ts").cast("timestamp")).alias("ms"),
    )
    folded = es.fold_events_sorted(
        e,
        key_col="user_id",
        order_cols=["ts", "event_id"],
        handle_event=es.multiwindow_burn_handle_event,
        state_schema=es.MW_BURN_STATE_SCHEMA,
    )
    return folded.select(
        "aggregate_id", "short_bucket", "s_total", "s_err",
        "long_bucket", "l_total", "l_err", "n_pages", "n",
    )


@query(
    "m_mttr_recovery",
    oracle="""
    WITH ordered AS (
      SELECT user_id, ts, event_id, event_type,
             CASE WHEN lag(event_type) OVER w IS NULL
                    OR lag(event_type) OVER w <> event_type
                  THEN 1 ELSE 0 END AS chg
      FROM events WHERE user_id IS NOT NULL
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    runs0 AS (
      SELECT user_id, ts, event_type,
             sum(chg) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS UNBOUNDED PRECEDING
             ) AS run_id
      FROM ordered
    ),
    runs AS (
      SELECT user_id, run_id, min(event_type) AS run_type,
             min(ts) AS first_ts, count(*) AS run_len
      FROM runs0 GROUP BY user_id, run_id
    ),
    nxt AS (
      SELECT user_id, run_id, run_type, first_ts, run_len,
             lead(first_ts) OVER (
               PARTITION BY user_id ORDER BY run_id
             ) AS next_start
      FROM runs
    ),
    episodes AS (
      SELECT user_id, run_len,
             epoch_ms(next_start) - epoch_ms(first_ts) AS mttr_ms
      FROM nxt WHERE run_type = 'error' AND next_start IS NOT NULL
    )
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_episodes,
           CAST(sum(run_len) AS BIGINT) AS n_error_events,
           CAST(sum(mttr_ms) // count(*) AS BIGINT) AS mean_recovery_ms,
           CAST(max(mttr_ms) AS BIGINT) AS max_recovery_ms
    FROM episodes GROUP BY user_id
    """,
)
def m_mttr_recovery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MTTR (mean time to recovery) per user — the SRE incident metric
    beside m_error_budget_burn/m_apdex_score: an ERROR EPISODE is a
    maximal run of consecutive 'error' events (gaps-and-islands: a
    change flag per (ts, event_id)-ordered row, run ids by running sum),
    recovery is the first event of the NEXT run (runs are maximal, so
    the next run is non-error by construction), and recovery time =
    next run's start minus the episode's first error, in exact integer
    epoch millis. Trailing unrecovered episodes are excluded on both
    sides (no sentinel). mean is floor division — all-integer output,
    zero float channels. Two windows + two aggregates, everything
    partitioned by user."""
    e = _events(spark, sf_dir).where(F.col("user_id").isNotNull())
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    ordered = e.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.when(
            F.lag("event_type").over(w).isNull()
            | (F.lag("event_type").over(w) != F.col("event_type")),
            1,
        )
        .otherwise(0)
        .alias("chg"),
    )
    runs0 = ordered.select(
        "user_id",
        "ts",
        "event_type",
        F.sum("chg")
        .over(w.rowsBetween(W.unboundedPreceding, W.currentRow))
        .alias("run_id"),
    )
    runs = runs0.groupBy("user_id", "run_id").agg(
        F.min("event_type").alias("run_type"),
        F.min("ts").alias("first_ts"),
        F.count(F.lit(1)).alias("run_len"),
    )
    wr = W.partitionBy("user_id").orderBy("run_id")
    nxt = runs.select(
        "user_id",
        "run_type",
        "first_ts",
        "run_len",
        F.lead("first_ts").over(wr).alias("next_start"),
    )
    episodes = nxt.where(
        (F.col("run_type") == "error") & F.col("next_start").isNotNull()
    ).select(
        "user_id",
        "run_len",
        (
            F.unix_millis(F.col("next_start").cast("timestamp"))
            - F.unix_millis(F.col("first_ts").cast("timestamp"))
        ).alias("mttr_ms"),
    )
    return episodes.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_episodes"),
        F.sum("run_len").alias("n_error_events"),
        F.expr("CAST(sum(mttr_ms) div count(1) AS BIGINT)").alias(
            "mean_recovery_ms"
        ),
        F.max("mttr_ms").alias("max_recovery_ms"),
    )


@query(
    "m_gini_coefficient",
    oracle="""
    WITH cnt AS (
      SELECT user_id, count(*) AS n FROM events
      WHERE user_id IS NOT NULL GROUP BY user_id
    ),
    r AS (
      SELECT n, row_number() OVER (ORDER BY n, user_id) AS rk FROM cnt
    ),
    s AS (
      SELECT CAST(count(*) AS BIGINT) AS n_users,
             CAST(sum(n) AS BIGINT) AS total_events,
             CAST(sum(rk * n) AS BIGINT) AS rank_weighted
      FROM r
    )
    SELECT n_users, total_events,
           CAST(round(
             (2.0 * rank_weighted - (n_users + 1) * total_events)
               / (CAST(n_users AS DOUBLE) * total_events), 6) AS DOUBLE)
             AS gini
    FROM s
    """,
)
def m_gini_coefficient(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of per-user activity — the single-number twin of
    m_pareto_share's Lorenz deciles (dashboards want the scalar; the
    decile table is the drill-down). Exact rank form on SORTED ascending
    counts: G = (2*sum(i*x_i) - (n+1)*sum(x)) / (n*sum(x)), with the
    rank a TOTAL order (n asc, user_id asc) so ties are deterministic.
    The rank comes from the exact two-pass distributed prefix sum — no
    unpartitioned WindowExec (a global ORDER BY rank funnels every user
    through one task; at 100 TB the per-user count table alone is
    billions of rows). All three aggregates are exact BIGINTs; the
    rank_weighted sum is bounded by n_users*total_events, so the BIGINT
    channel is safe while that product stays under 2^63 (~3e9 users x
    3e9 events) — past that, widen rk*n to DECIMAL(38,0) on both
    engines (the a_basket_lift escape hatch; ANSI mode raises loudly,
    never silently wraps). The single division happens once on exact
    longs, so round(6) is engine-stable — the m_pareto_share
    discipline."""
    from surge_spark.operators.text import distributed_prefix_sum

    e = _events(spark, sf_dir).where(F.col("user_id").isNotNull())
    # persist: the count frame feeds the quantile action inside
    # distributed_prefix_sum AND the ranked aggregate's two window/totals
    # consumers — unpersisted it re-ran the events group-by 3x (3 scans,
    # 0 ReusedExchange; warm sf0.1 7.0 -> 1.1 s measured; the
    # m_pareto_share precedent)
    cnt = (
        e.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("__one", F.lit(1))
        .persist()
    )
    order = [F.col("n").asc(), F.col("user_id").asc()]
    ranked = distributed_prefix_sum(
        cnt, "__one", "n", order, descending=False, out_col="__rk"
    )
    s = ranked.groupBy().agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum("n").alias("total_events"),
        F.sum(F.col("__rk") * F.col("n")).alias("rank_weighted"),
    )
    return s.select(
        "n_users",
        "total_events",
        F.round(
            (
                2.0 * F.col("rank_weighted")
                - (F.col("n_users") + 1) * F.col("total_events")
            )
            / (F.col("n_users").cast("double") * F.col("total_events")),
            6,
        ).alias("gini"),
    )


# Benford expected ppm per leading digit: round(log10(1 + 1/d) * 1e6),
# computed once in Python and rendered as literals on BOTH sides (no
# engine log10 in the comparison path).
_BENFORD_PPM = {
    1: 301030, 2: 176091, 3: 124939, 4: 96910, 5: 79181,
    6: 66947, 7: 57992, 8: 51153, 9: 45757,
}
_BENFORD_CASE = (
    "CASE digit "
    + " ".join(f"WHEN {d} THEN {p}" for d, p in _BENFORD_PPM.items())
    + " END"
)


@query(
    "m_benford_first_digit",
    oracle=f"""
    WITH cents AS (
      SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS c FROM orders
      WHERE o_totalprice > 0
    ),
    d AS (
      SELECT CAST(substr(CAST(c AS VARCHAR), 1, 1) AS BIGINT) AS digit,
             count(*) AS n
      FROM cents GROUP BY 1
    ),
    t AS (SELECT CAST(sum(n) AS BIGINT) AS total FROM d)
    SELECT digit,
           CAST(n AS BIGINT) AS n,
           CAST(n * 1000000 // total AS BIGINT) AS observed_ppm,
           CAST({_BENFORD_CASE} AS BIGINT) AS expected_ppm,
           CAST(n * 1000000 // total - {_BENFORD_CASE} AS BIGINT)
             AS deviation_ppm
    FROM d, t
    """,
)
def m_benford_first_digit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit audit over order totals — the classic
    fraud / synthetic-data smell test (a generated price column rarely
    follows Benford; a real revenue ledger usually does, and the
    per-digit deviation column makes the answer visible either way).
    The leading digit comes from the INTEGER-CENTS string (cast
    round(price*100) to BIGINT, take char 1) — never from log10, whose
    boundary behavior (log10(1000) in floating point) differs across
    engines; bigint rendering is identical everywhere. Expected ppm are
    Python-computed literals on both sides. One aggregate over the scan
    + a 1-row total crossJoin (broadcast-exempt class 1); 9 output
    rows."""
    o = load_table(spark, sf_dir, "orders").where(F.col("o_totalprice") > 0)
    d = (
        o.select(
            F.substring(
                F.expr("CAST(CAST(round(o_totalprice * 100) AS BIGINT) AS STRING)"),
                1,
                1,
            )
            .cast("bigint")
            .alias("digit")
        )
        .groupBy("digit")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    t = d.groupBy().agg(F.sum("n").alias("total"))
    return d.crossJoin(F.broadcast(t)).select(
        "digit",
        "n",
        F.expr("CAST(n * 1000000 div total AS BIGINT)").alias("observed_ppm"),
        F.expr(f"CAST({_BENFORD_CASE} AS BIGINT)").alias("expected_ppm"),
        F.expr(
            f"CAST(n * 1000000 div total - {_BENFORD_CASE} AS BIGINT)"
        ).alias("deviation_ppm"),
    )


@query(
    "m_autocorr_daily",
    oracle="""
    WITH daily AS (
      SELECT epoch_ms(ts) // 86400000 AS d, count(*) AS n
      FROM events GROUP BY 1
    ),
    ks AS (SELECT unnest(range(1, 8)) AS k),
    j AS (
      SELECT ks.k, a.n AS x, b.n AS y
      FROM daily a CROSS JOIN ks JOIN daily b ON b.d = a.d - ks.k
    )
    SELECT k AS lag_days,
           CAST(count(*) AS BIGINT) AS n_pairs,
           CAST(round(corr(x, y), 6) AS DOUBLE) AS autocorr
    FROM j GROUP BY k
    """,
)
def m_autocorr_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-1..7 autocorrelation of the daily event-count series — the
    seasonality detector that tells a forecasting pass (m_holt_smoothing,
    m_forecast_backtest_mae) WHICH period to model: a weekly cycle shows
    as a lag-7 peak. Day ids are integer epoch-days (unix_millis div
    86400000 == DuckDB epoch_ms // — the m_burstiness-pinned
    equivalence; no date-typed channel, per the comparator rule). The
    7 lags come from ONE exploded literal array joined against the tiny
    daily frame (|days| rows — broadcast-exempt class 3 analog: the
    daily aggregate is bounded by the calendar, not the corpus), so the
    plan is one scan + one |days|x7 join however large events grows.
    corr is Pearson on both engines and scale-free (sample-vs-population
    cancels); round(6) per the a_corr_regression moment discipline."""
    e = _events(spark, sf_dir)
    daily = (
        e.select(
            F.expr("unix_millis(ts) div 86400000").alias("d")
        )
        .groupBy("d")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    ks = spark.range(1, 8).select(F.col("id").alias("k"))
    a = daily.select(F.col("d").alias("ad"), F.col("n").alias("x"))
    b = daily.select(F.col("d").alias("bd"), F.col("n").alias("y"))
    j = a.crossJoin(F.broadcast(ks)).join(
        F.broadcast(b), F.col("bd") == F.col("ad") - F.col("k")
    )
    return j.groupBy(F.col("k").alias("lag_days")).agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.round(F.corr("x", "y"), 6).alias("autocorr"),
    )


@query(
    "m_kaplan_meier",
    oracle="""
    WITH days AS (
      SELECT user_id, epoch_ms(ts) // 86400000 AS d FROM events
      WHERE user_id IS NOT NULL
    ),
    pu AS (SELECT user_id, min(d) AS f, max(d) AS l FROM days GROUP BY 1),
    t AS (SELECT max(d) AS tmax FROM days),
    dur AS (
      SELECT l - f + 1 AS duration,
             CASE WHEN l = tmax THEN 1 ELSE 0 END AS censored
      FROM pu, t
    ),
    byd AS (
      SELECT duration,
             CAST(count(*) AS BIGINT) AS n_total,
             CAST(sum(1 - censored) AS BIGINT) AS n_deaths
      FROM dur GROUP BY 1
    ),
    nu AS (SELECT CAST(count(*) AS BIGINT) AS n_users FROM dur),
    r AS (
      SELECT duration, n_deaths,
             n_users - coalesce(sum(n_total) OVER (
               ORDER BY duration
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ), 0) AS n_at_risk
      FROM byd, nu
    ),
    s AS (
      SELECT duration, n_deaths, n_at_risk,
             1.0 - CAST(n_deaths AS DOUBLE) / n_at_risk AS term
      FROM r
    ),
    acc AS (
      SELECT duration, n_deaths, n_at_risk,
             max(CASE WHEN term = 0 THEN 1 ELSE 0 END) OVER win AS hit_zero,
             sum(CASE WHEN term > 0 THEN ln(term) ELSE 0 END) OVER win
               AS sum_ln
      FROM s
      WINDOW win AS (ORDER BY duration
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    )
    SELECT CAST(duration AS BIGINT) AS duration_days,
           CAST(n_at_risk AS BIGINT) AS n_at_risk,
           n_deaths,
           CASE WHEN hit_zero = 1 THEN CAST(0.0 AS DOUBLE)
                ELSE CAST(round(exp(sum_ln), 6) AS DOUBLE) END AS survival
    FROM acc
    """,
)
def m_kaplan_meier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier survival curve of user lifetimes — the estimator every
    retention analysis should use instead of naive churn ratios, because
    it handles CENSORING: a user still active on the corpus's last day
    hasn't churned, they're right-censored and leave the risk set without
    counting as a death (naive ratios systematically overstate churn for
    recent cohorts — the bias m_retention_decay_fit's pooled curve
    dodges by construction). Lifetime = last-first+1 integer epoch-days;
    S(t) = prod over t_i<=t of (1 - d_i/n_i), computed as exp of a
    RUNNING SUM of logs so both engines evaluate the same doubles in the
    same order (round-6 on the single final exp; a zero term — everyone
    at risk dies — short-circuits to exact 0.0 via a running max flag,
    because Spark's ln(0) is NULL while DuckDB's is -inf: the one place
    the engines' ln disagree). The running windows are UNPARTITIONED but
    over the per-duration aggregate — calendar-bounded rows (<= |days|),
    never corpus-scale; the corpus-scale work is two partial+final
    aggregates (the m_dau discipline: bounded frames may window,
    billions-row frames never do)."""
    e = _events(spark, sf_dir).where(F.col("user_id").isNotNull())
    days = e.select(
        "user_id", F.expr("unix_millis(ts) div 86400000").alias("d")
    )
    pu = days.groupBy("user_id").agg(
        F.min("d").alias("f"), F.max("d").alias("l")
    )
    t = days.groupBy().agg(F.max("d").alias("tmax"))
    dur = pu.crossJoin(F.broadcast(t)).select(
        (F.col("l") - F.col("f") + 1).alias("duration"),
        F.when(F.col("l") == F.col("tmax"), 1).otherwise(0).alias("censored"),
    )
    # byd is the ONLY corpus-scale consumer of dur; n_users re-derives
    # from byd's bounded frame (sum of n_total), and byd itself is
    # checkpointed because two lazy consumers (nu and r) would re-run
    # the per-user aggregate — the Gini/assortativity scan-amplification
    # class, caught by the in-round review pass
    byd = dur.groupBy("duration").agg(
        F.count(F.lit(1)).alias("n_total"),
        F.sum(1 - F.col("censored")).alias("n_deaths"),
    ).localCheckpoint(eager=False)
    nu = byd.groupBy().agg(F.sum("n_total").alias("n_users"))
    prior = W.orderBy("duration").rowsBetween(W.unboundedPreceding, -1)
    win = W.orderBy("duration").rowsBetween(W.unboundedPreceding, W.currentRow)
    r = byd.crossJoin(F.broadcast(nu)).select(
        "duration",
        "n_deaths",
        (
            F.col("n_users")
            - F.coalesce(F.sum("n_total").over(prior), F.lit(0))
        ).alias("n_at_risk"),
    )
    s = r.withColumn(
        "term", F.lit(1.0) - F.col("n_deaths").cast("double") / F.col("n_at_risk")
    )
    acc = s.select(
        "duration",
        "n_deaths",
        "n_at_risk",
        F.max(F.when(F.col("term") == 0, 1).otherwise(0)).over(win).alias(
            "hit_zero"
        ),
        F.sum(
            F.when(F.col("term") > 0, F.log(F.col("term"))).otherwise(0.0)
        )
        .over(win)
        .alias("sum_ln"),
    )
    return acc.select(
        F.col("duration").alias("duration_days"),
        "n_at_risk",
        "n_deaths",
        F.when(F.col("hit_zero") == 1, F.lit(0.0))
        .otherwise(F.round(F.exp(F.col("sum_ln")), 6))
        .alias("survival"),
    )


@query(
    "es_upcast_fold",
    oracle="""
    WITH up AS (
      SELECT user_id,
             1 + event_id % 2 AS version,
             CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
      FROM events WHERE user_id IS NOT NULL
    )
    SELECT CAST(user_id AS VARCHAR) AS aggregate_id,
           CAST(sum(CASE WHEN version = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_v1,
           CAST(sum(CASE WHEN version = 2 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_v2,
           CAST(sum(CASE WHEN version = 1 THEN k ELSE k * 100 END)
                AS BIGINT) AS total_cents
    FROM up GROUP BY user_id
    """,
)
def es_upcast_fold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-schema UPCASTING on the fold path — the serde concern every
    long-lived event store hits (surge's user-side serdes evolve;
    modules/command-engine serde plumbing, SURVEY §2.10 U6): the log
    holds a MIX of payload versions and the fold must upcast each to the
    newest schema before applying it, never rewrite history. Versions
    are DERIVED here (event_id parity — the construct-in-query trick the
    WARC/robots entries use, since testdata ships one payload shape):
    v1 payloads carry integer cents in props.k, v2 carry whole currency
    units, and the upcaster multiplies v2 by 100 so one all-integer fold
    sums both. JSON extraction is the pinned get_json_object ==
    json_extract_string channel (f_json_functions); per-version counts
    make the mix visible in the output. One partial+final aggregate —
    upcasting is a map-side expression, exactly why it belongs in the
    fold and not in a log rewrite."""
    e = _events(spark, sf_dir).where(F.col("user_id").isNotNull())
    k = F.get_json_object("props", "$.k").cast("long")
    up = e.select(
        "user_id",
        (F.lit(1) + F.col("event_id") % 2).alias("version"),
        k.alias("k"),
    )
    return up.groupBy(
        F.col("user_id").cast("string").alias("aggregate_id")
    ).agg(
        F.sum(F.when(F.col("version") == 1, 1).otherwise(0)).alias("n_v1"),
        F.sum(F.when(F.col("version") == 2, 1).otherwise(0)).alias("n_v2"),
        F.sum(
            F.when(F.col("version") == 1, F.col("k")).otherwise(
                F.col("k") * 100
            )
        ).alias("total_cents"),
    )


@query(
    "m_winsorized_mean",
    oracle="""
    WITH v AS (
      SELECT event_type, value FROM events WHERE value IS NOT NULL
    ),
    q AS (
      SELECT event_type,
             quantile_cont(value, 0.05) AS p05,
             quantile_cont(value, 0.95) AS p95
      FROM v GROUP BY event_type
    ),
    c AS (
      SELECT v.event_type, v.value, q.p05, q.p95,
             CASE WHEN v.value < q.p05 THEN q.p05
                  WHEN v.value > q.p95 THEN q.p95
                  ELSE v.value END AS w
      FROM v JOIN q USING (event_type)
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CASE WHEN value < p05 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_clamped_low,
           CAST(sum(CASE WHEN value > p95 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_clamped_high,
           CAST(round(avg(w), 4) AS DOUBLE) AS winsorized_mean,
           CAST(round(avg(CASE WHEN value >= p05 AND value <= p95
                              THEN value END), 4) AS DOUBLE) AS trimmed_mean,
           CAST(round(avg(value), 4) AS DOUBLE) AS raw_mean
    FROM c GROUP BY event_type
    """,
)
def m_winsorized_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized and trimmed means per event type — the robust central
    tendencies a latency dashboard ships next to the raw mean (one
    timeout skews a raw mean; clamping at p5/p95 bounds any single
    observation's influence — the estimator cousin of m_anomaly_mad's
    breakdown-point argument, with all three means side by side so the
    tail's pull is visible). Percentiles ride the pinned Spark
    percentile ≡ DuckDB quantile_cont equivalence (a_exact_percentiles);
    the clamp comparisons use the UNROUNDED percentile doubles both
    engines compute identically (the MAD-threshold precedent). Means
    round to 4 — million-row float sums differ across partial-agg
    orders near the 6th decimal. Two grouped passes over the stream
    (percentile, then clamp+mean) with a |types|-row broadcast join-back
    between — the m_anomaly_mad shuffle shape."""
    e = _events(spark, sf_dir).where(F.col("value").isNotNull())
    q = e.groupBy("event_type").agg(
        F.expr("percentile(value, 0.05)").alias("p05"),
        F.expr("percentile(value, 0.95)").alias("p95"),
    )
    c = e.join(F.broadcast(q), "event_type").select(
        "event_type",
        "value",
        "p05",
        "p95",
        F.when(F.col("value") < F.col("p05"), F.col("p05"))
        .when(F.col("value") > F.col("p95"), F.col("p95"))
        .otherwise(F.col("value"))
        .alias("w"),
    )
    return c.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col("value") < F.col("p05"), 1).otherwise(0)).alias(
            "n_clamped_low"
        ),
        F.sum(F.when(F.col("value") > F.col("p95"), 1).otherwise(0)).alias(
            "n_clamped_high"
        ),
        F.round(F.avg("w"), 4).alias("winsorized_mean"),
        F.round(
            F.avg(
                F.when(
                    (F.col("value") >= F.col("p05"))
                    & (F.col("value") <= F.col("p95")),
                    F.col("value"),
                )
            ),
            4,
        ).alias("trimmed_mean"),
        F.round(F.avg("value"), 4).alias("raw_mean"),
    )


@query(
    "m_multiwindow_burn_alerts",
    oracle="""
    WITH t AS (SELECT max(epoch_ms(ts)) AS tmax FROM events),
    win AS (
      SELECT CASE WHEN epoch_ms(e.ts) > t.tmax - 86400000
                  THEN 1 ELSE 0 END AS in_short,
             CASE WHEN epoch_ms(e.ts) > t.tmax - 7 * 86400000
                  THEN 1 ELSE 0 END AS in_long,
             CASE WHEN e.event_type = 'error' THEN 1 ELSE 0 END AS is_err
      FROM events e, t
    ),
    agg AS (
      SELECT CAST(sum(in_short) AS BIGINT) AS n_short,
             CAST(sum(in_short * is_err) AS BIGINT) AS err_short,
             CAST(sum(in_long) AS BIGINT) AS n_long,
             CAST(sum(in_long * is_err) AS BIGINT) AS err_long
      FROM win
    )
    SELECT n_short, err_short, n_long, err_long,
           CAST(err_short * 100000 // n_short AS BIGINT) AS burn_short_x1000,
           CAST(err_long * 100000 // n_long AS BIGINT) AS burn_long_x1000,
           CAST(CASE WHEN err_short * 100 > 2 * n_short
                      AND err_long * 100 > 2 * n_long
                     THEN 1 ELSE 0 END AS INT) AS page_alert
    FROM agg
    """,
)
def m_multiwindow_burn_alerts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-window multi-burn-rate SLO alerting (Google SRE workbook ch.
    5) — the production refinement of m_error_budget_burn's per-day
    table: a page fires only when BOTH the short window (1 d here) and
    the long window (7 d) burn faster than 2x budget against the 99%
    SLO, so a brief blip (short hot, long cool) and a long-since-
    recovered incident (long hot, short cool) both stay silent. Windows
    anchor at the corpus max timestamp (integer epoch-ms channel); both
    window memberships and the alert predicate are ALL-INTEGER
    (err*100 > 2*n is burn > 2 with no division), burn ships as exact
    floor x1000. ONE scan computes both windows as conditional sums —
    the multi-window rule costs nothing extra at 100 TB because the
    windows nest inside the same aggregate."""
    e = _events(spark, sf_dir)
    t = e.groupBy().agg(F.max(F.expr("unix_millis(ts)")).alias("tmax"))
    win = e.crossJoin(F.broadcast(t)).select(
        F.when(
            F.expr("unix_millis(ts)") > F.col("tmax") - 86400000, 1
        )
        .otherwise(0)
        .alias("in_short"),
        F.when(
            F.expr("unix_millis(ts)") > F.col("tmax") - 7 * 86400000, 1
        )
        .otherwise(0)
        .alias("in_long"),
        F.when(F.col("event_type") == "error", 1).otherwise(0).alias(
            "is_err"
        ),
    )
    agg = win.groupBy().agg(
        F.sum("in_short").alias("n_short"),
        F.sum(F.col("in_short") * F.col("is_err")).alias("err_short"),
        F.sum("in_long").alias("n_long"),
        F.sum(F.col("in_long") * F.col("is_err")).alias("err_long"),
    )
    return agg.select(
        "n_short",
        "err_short",
        "n_long",
        "err_long",
        F.expr("CAST(err_short * 100000 div n_short AS BIGINT)").alias(
            "burn_short_x1000"
        ),
        F.expr("CAST(err_long * 100000 div n_long AS BIGINT)").alias(
            "burn_long_x1000"
        ),
        F.expr(
            "CAST(CASE WHEN err_short * 100 > 2 * n_short"
            " AND err_long * 100 > 2 * n_long THEN 1 ELSE 0 END AS INT)"
        ).alias("page_alert"),
    )


@query(
    "es_saga_fold",
    oracle="""
    WITH RECURSIVE ordered AS (
      SELECT user_id, event_type,
             row_number() OVER (
               PARTITION BY user_id ORDER BY ts, event_id
             ) AS rn
      FROM events WHERE user_id IS NOT NULL
    ),
    lim AS (SELECT user_id, max(rn) AS mx FROM ordered GROUP BY user_id),
    fold(user_id, rn, st, n_started, n_completed, n_compensated,
         n_steps, n_ignored) AS (
      SELECT user_id, 0, 0, CAST(0 AS BIGINT), CAST(0 AS BIGINT),
             CAST(0 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT)
      FROM lim
      UNION ALL
      SELECT f.user_id, f.rn + 1,
             CASE WHEN o.event_type = 'view' AND f.st = 0 THEN 1
                  WHEN o.event_type = 'purchase' AND f.st = 1 THEN 0
                  WHEN o.event_type = 'error' AND f.st = 1 THEN 0
                  ELSE f.st END,
             f.n_started + CASE WHEN o.event_type = 'view' AND f.st = 0
                                THEN 1 ELSE 0 END,
             f.n_completed + CASE WHEN o.event_type = 'purchase'
                                       AND f.st = 1
                                  THEN 1 ELSE 0 END,
             f.n_compensated + CASE WHEN o.event_type = 'error'
                                         AND f.st = 1
                                    THEN 1 ELSE 0 END,
             f.n_steps + CASE WHEN o.event_type = 'click' AND f.st = 1
                              THEN 1 ELSE 0 END,
             f.n_ignored + CASE
               WHEN (o.event_type = 'view' AND f.st = 0)
                 OR (o.event_type = 'click' AND f.st = 1)
                 OR (o.event_type = 'purchase' AND f.st = 1)
                 OR (o.event_type = 'error' AND f.st = 1)
               THEN 0 ELSE 1 END
      FROM fold f JOIN ordered o
        ON o.user_id = f.user_id AND o.rn = f.rn + 1
    )
    SELECT CAST(f.user_id AS VARCHAR) AS aggregate_id,
           CAST(f.st AS INT) AS final_state,
           f.n_started, f.n_completed, f.n_compensated,
           f.n_steps, f.n_ignored
    FROM fold f JOIN lim USING (user_id) WHERE f.rn = lim.mx
    """,
)
def es_saga_fold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Saga / compensation state machine per user on the shared
    sorted-stream fold kernel (bank/holt/cusum/token-bucket family) —
    see operators.eventsourcing.saga_handle_event for the machine:
    view starts, click steps, purchase completes, error COMPENSATES,
    out-of-state events are counted ignored and never applied. The
    order-dependent fold can't be a SQL aggregate; the oracle is a
    recursive CTE advancing every user one event per round (the
    es_bank_fold technique) — exact, because every channel is an
    integer. final_state = 1 means a saga was still in flight at the
    corpus edge (the dangling-reservation the compensation timeout
    would reap in production)."""
    e = _events(spark, sf_dir).where(F.col("user_id").isNotNull())
    folded = es.fold_events_sorted(
        e.select("user_id", "ts", "event_id", "event_type"),
        key_col="user_id",
        order_cols=["ts", "event_id"],
        handle_event=es.saga_handle_event,
        state_schema=es.SAGA_STATE_SCHEMA,
    )
    return folded.select(
        "aggregate_id",
        F.col("st").cast("int").alias("final_state"),
        "n_started",
        "n_completed",
        "n_compensated",
        "n_steps",
        "n_ignored",
    )


@query(
    "m_conversion_lag",
    oracle="""
    WITH fv AS (
      SELECT user_id, min(epoch_ms(ts)) AS first_view
      FROM events WHERE user_id IS NOT NULL AND event_type = 'view'
      GROUP BY user_id
    ),
    fp AS (
      SELECT e.user_id, min(epoch_ms(e.ts)) AS first_purchase
      FROM events e JOIN fv ON fv.user_id = e.user_id
      WHERE e.event_type = 'purchase' AND epoch_ms(e.ts) >= fv.first_view
      GROUP BY e.user_id
    ),
    lag AS (
      SELECT fp.first_purchase - fv.first_view AS lag_ms
      FROM fp JOIN fv USING (user_id)
    )
    SELECT CAST(count(*) AS BIGINT) AS n_converters,
           CAST(min(lag_ms) AS BIGINT) AS min_lag_ms,
           CAST(round(quantile_cont(lag_ms, 0.5), 4) AS DOUBLE)
             AS p50_lag_ms,
           CAST(round(quantile_cont(lag_ms, 0.9), 4) AS DOUBLE)
             AS p90_lag_ms,
           CAST(max(lag_ms) AS BIGINT) AS max_lag_ms
    FROM lag
    """,
)
def m_conversion_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-to-convert distribution — the latency view of the funnel
    (m_funnel_conversion counts WHO converts; this measures HOW LONG
    first view → first subsequent purchase takes, the number a growth
    team actually tunes against). Lags are exact integer epoch-millis
    differences (unix_millis ≡ epoch_ms); the only float channel is the
    interpolated percentile pair on the pinned Spark percentile ≡
    DuckDB quantile_cont equivalence, round-4 (one interpolation from
    exact integers — the m_winsorized_mean channel). The purchase must
    FOLLOW the first view (>= — a same-millisecond purchase converts;
    an earlier one does not count as caused by the view). Two grouped
    passes + one per-user join, all key-partitioned; the final
    aggregate is a single global row."""
    e = _events(spark, sf_dir).where(F.col("user_id").isNotNull())
    ms = F.expr("unix_millis(ts)")
    fv = (
        e.where(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min(ms).alias("first_view"))
    )
    fp = (
        e.where(F.col("event_type") == "purchase")
        .select("user_id", ms.alias("pm"))
        .join(fv, "user_id")
        .where(F.col("pm") >= F.col("first_view"))
        .groupBy("user_id")
        .agg(
            F.min("pm").alias("first_purchase"),
            F.min("first_view").alias("first_view"),
        )
    )
    lag = fp.select((F.col("first_purchase") - F.col("first_view")).alias("lag_ms"))
    return lag.groupBy().agg(
        F.count(F.lit(1)).alias("n_converters"),
        F.min("lag_ms").alias("min_lag_ms"),
        F.round(F.expr("percentile(lag_ms, 0.5)"), 4).alias("p50_lag_ms"),
        F.round(F.expr("percentile(lag_ms, 0.9)"), 4).alias("p90_lag_ms"),
        F.max("lag_ms").alias("max_lag_ms"),
    )


@query(
    "m_bollinger_bands",
    oracle="""
    WITH daily AS (
      SELECT event_type, date_trunc('day', ts) AS d,
             CAST(count(*) AS BIGINT) AS cnt
      FROM events GROUP BY event_type, d
    ),
    rolled AS (
      SELECT event_type, d, cnt,
             CAST(sum(cnt) OVER w AS BIGINT) AS s1,
             CAST(sum(cnt * cnt) OVER w AS BIGINT) AS s2,
             CAST(count(*) OVER w AS BIGINT) AS w_n
      FROM daily
      WINDOW w AS (PARTITION BY event_type ORDER BY d
                   ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
    )
    SELECT event_type, strftime(d, '%Y-%m-%d') AS day, cnt, w_n,
           CAST(round(CAST(s1 AS DOUBLE) / w_n, 4) AS DOUBLE) AS mean_7d,
           CAST(round(CAST(s1 AS DOUBLE) / w_n
             + 2.0 * sqrt(greatest(CAST(s2 AS DOUBLE) / w_n
               - (CAST(s1 AS DOUBLE) / w_n) * (CAST(s1 AS DOUBLE) / w_n),
               0.0)), 4) AS DOUBLE) AS upper_band,
           CAST(round(CAST(s1 AS DOUBLE) / w_n
             - 2.0 * sqrt(greatest(CAST(s2 AS DOUBLE) / w_n
               - (CAST(s1 AS DOUBLE) / w_n) * (CAST(s1 AS DOUBLE) / w_n),
               0.0)), 4) AS DOUBLE) AS lower_band,
           CAST(CASE WHEN cnt > round(CAST(s1 AS DOUBLE) / w_n
             + 2.0 * sqrt(greatest(CAST(s2 AS DOUBLE) / w_n
               - (CAST(s1 AS DOUBLE) / w_n) * (CAST(s1 AS DOUBLE) / w_n),
               0.0)), 4) THEN 1 ELSE 0 END AS INT) AS breakout
    FROM rolled
    """,
)
def m_bollinger_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bollinger bands over the per-type daily series — rolling 7-row
    mean ± 2σ with a breakout flag, the volatility-aware upgrade of
    m_peak_detection's local-maxima rule (a spike only alerts if it
    clears the band its own recent variance sets). The rolling frame is
    ROWS BETWEEN 6 PRECEDING AND CURRENT ROW over present days (both
    engines the identical frame; early days use their shorter frame —
    no warm-up NULLs to diverge on). The window carries only INTEGER
    sums (s1, s2 = Σcnt, Σcnt²); mean and population σ are derived from
    those exact integers by textually mirrored float64 formulas
    (greatest(var, 0) on both sides — float error can push a
    constant-series variance epsilon-negative and sqrt would NaN), and
    the breakout compares the integer count against the ROUNDED band
    (round-before-compare, the round-before-rank rule). Day ships as an
    ISO string (no date channel in the comparator). Windows are
    partitioned per type — parallel, never global."""
    e = _events(spark, sf_dir)
    daily = e.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("d")
    ).agg(F.count(F.lit(1)).alias("cnt"))
    w = (
        W.partitionBy("event_type")
        .orderBy("d")
        .rowsBetween(-6, 0)
    )
    rolled = daily.select(
        "event_type",
        "d",
        "cnt",
        F.sum("cnt").over(w).alias("s1"),
        F.sum(F.expr("cnt * cnt")).over(w).alias("s2"),
        F.count(F.lit(1)).over(w).alias("w_n"),
    )
    mean = "CAST(s1 AS DOUBLE) / w_n"
    sig = (
        f"sqrt(greatest(CAST(s2 AS DOUBLE) / w_n - ({mean}) * ({mean}), 0.0))"
    )
    return rolled.select(
        "event_type",
        F.date_format("d", "yyyy-MM-dd").alias("day"),
        "cnt",
        "w_n",
        F.expr(f"CAST(round({mean}, 4) AS DOUBLE)").alias("mean_7d"),
        F.expr(
            f"CAST(round({mean} + 2.0 * {sig}, 4) AS DOUBLE)"
        ).alias("upper_band"),
        F.expr(
            f"CAST(round({mean} - 2.0 * {sig}, 4) AS DOUBLE)"
        ).alias("lower_band"),
        F.expr(
            f"CAST(CASE WHEN cnt > round({mean} + 2.0 * {sig}, 4)"
            " THEN 1 ELSE 0 END AS INT)"
        ).alias("breakout"),
    )


@query(
    "m_interarrival_exponential_ks",
    oracle="""
    WITH gaps AS (
      SELECT CAST(epoch_ms(ts) - lag(epoch_ms(ts)) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
             ) AS BIGINT) AS gap_ms
      FROM events WHERE user_id IS NOT NULL
    ),
    pos AS (SELECT gap_ms FROM gaps WHERE gap_ms IS NOT NULL AND gap_ms > 0),
    by_g AS (
      SELECT gap_ms, CAST(count(*) AS BIGINT) AS cnt FROM pos GROUP BY gap_ms
    ),
    tot AS (
      SELECT CAST(sum(cnt) AS BIGINT) AS n,
             CAST(sum(cnt * gap_ms) AS BIGINT) AS sum_gap
      FROM by_g
    ),
    pre AS (
      SELECT gap_ms, cnt,
             CAST(sum(cnt) OVER (ORDER BY gap_ms
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS cum
      FROM by_g
    )
    SELECT tot.n AS n_gaps, tot.sum_gap AS sum_gap_ms,
           CAST(round(CAST(tot.sum_gap AS DOUBLE) / tot.n, 4) AS DOUBLE)
             AS mean_gap_ms,
           CAST(greatest(
             max(round(abs(CAST(pre.cum AS DOUBLE) / tot.n
               - (1.0 - exp(-(CAST(tot.n AS DOUBLE) / tot.sum_gap)
                            * pre.gap_ms))), 6)),
             max(round(abs((1.0 - exp(-(CAST(tot.n AS DOUBLE) / tot.sum_gap)
                                     * pre.gap_ms))
               - CAST(pre.cum - pre.cnt AS DOUBLE) / tot.n), 6))
           ) AS DOUBLE) AS d_stat
    FROM pre CROSS JOIN tot GROUP BY tot.n, tot.sum_gap
    """,
)
def m_interarrival_exponential_ks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Is traffic Poisson? — one-sample KS distance between the per-user
    interarrival-gap ECDF and the exponential distribution fit by its
    MLE rate (λ = n/Σgap): the goodness-of-fit capstone of the stats
    family (two-sample KS compares arms; this compares against a MODEL,
    the assumption every queueing/capacity calculation quietly makes).
    Gaps are exact integer millis; the ECDF rides per-value counts +
    one running sum, so the only float per candidate is the mirrored
    1−exp(−λg) — each |ECDF−CDF| candidate is rounded to 6 BEFORE the
    max (round-before-rank: cross-engine exp() ulp noise cannot flip
    the supremum). Spark side uses the exact distributed_prefix_sum —
    no unpartitioned window at any scale; the per-user lag window is
    partitioned."""
    from pyspark.sql import Window
    from surge_spark.operators.text import distributed_prefix_sum

    e = _events(spark, sf_dir).where(F.col("user_id").isNotNull())
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = e.select(
        (
            F.expr("unix_millis(ts)")
            - F.lag(F.expr("unix_millis(ts)")).over(w)
        ).alias("gap_ms")
    ).where(F.col("gap_ms").isNotNull() & (F.col("gap_ms") > 0))
    # persisted: the prefix sum's quantile ACTION plus the pre/tot
    # consumers would otherwise re-run the events scan and the per-user
    # lag window 3x (the m_gini scan-amplification class)
    by_g = gaps.groupBy("gap_ms").agg(F.count(F.lit(1)).alias("cnt")).persist()
    tot = by_g.groupBy().agg(
        F.sum("cnt").alias("n"),
        F.sum(F.expr("cnt * gap_ms")).alias("sum_gap"),
    )
    pre = distributed_prefix_sum(
        by_g, "cnt", "gap_ms", [F.col("gap_ms")], out_col="cum"
    )
    cdf = "(1.0 - exp(-(CAST(n AS DOUBLE) / sum_gap) * gap_ms))"
    # BOTH supremum sides (review finding — the one-sample KS statistic
    # is max over steps of the right-continuous ECDF excess AND the
    # left-limit deficit; checking only |F_n - F| at step points
    # understates D by up to cnt/n wherever the fitted CDF rises
    # between steps)
    cand_hi = f"round(abs(CAST(cum AS DOUBLE) / n - {cdf}), 6)"
    cand_lo = f"round(abs({cdf} - CAST(cum - cnt AS DOUBLE) / n), 6)"
    g = (
        pre.crossJoin(F.broadcast(tot))
        .groupBy("n", "sum_gap")
        .agg(
            F.expr(
                f"CAST(greatest(max({cand_hi}), max({cand_lo})) AS DOUBLE)"
            ).alias("d_stat")
        )
    )
    return g.select(
        F.col("n").alias("n_gaps"),
        F.col("sum_gap").alias("sum_gap_ms"),
        F.expr(
            "CAST(round(CAST(sum_gap AS DOUBLE) / n, 4) AS DOUBLE)"
        ).alias("mean_gap_ms"),
        "d_stat",
    )


@query(
    "m_hourly_profile_entropy",
    oracle="""
    WITH cells AS (
      SELECT event_type, (epoch_ms(ts) // 3600000) % 24 AS hod,
             CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2
    ),
    tot AS (
      SELECT event_type, CAST(sum(n) AS BIGINT) AS total FROM cells GROUP BY 1
    )
    SELECT c.event_type,
           CAST(count(*) AS BIGINT) AS n_active_hours,
           CAST(max(t.total) AS BIGINT) AS n_events,
           CAST(min(CASE WHEN c.n = mx.mx THEN c.hod END) AS BIGINT)
             AS peak_hour,
           CAST(round(-sum((CAST(c.n AS DOUBLE) / t.total)
             * ln(CAST(c.n AS DOUBLE) / t.total)), 6) AS DOUBLE)
             AS hourly_entropy
    FROM cells c
    JOIN tot t USING (event_type)
    JOIN (SELECT event_type, max(n) AS mx FROM cells GROUP BY 1) mx
      USING (event_type)
    GROUP BY c.event_type
    """,
)
def m_hourly_profile_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hour-of-day traffic profile per event type — Shannon entropy of
    the 24-cell distribution (low entropy = strongly diurnal, high =
    flat) plus the peak hour: the intraday sibling of m_seasonality_dow
    (capacity planning reads both). Hour is the pure-integer channel
    (epoch_ms div 3600000) % 24 — UTC hour with no engine time-zone or
    hour() convention involved (the dow-label lesson). Entropy terms
    derive from exact integer cell counts via one mirrored float
    formula (round-6; p>0 for every present cell so ln never sees 0);
    peak hour ties break to the earliest hour via min-over-argmax. One
    bounded aggregate over |types|x24 cells."""
    e = _events(spark, sf_dir)
    cells = e.groupBy(
        "event_type",
        (F.expr("unix_millis(ts) div 3600000") % 24).alias("hod"),
    ).agg(F.count(F.lit(1)).alias("n")).localCheckpoint(eager=False)
    tot = cells.groupBy("event_type").agg(F.sum("n").alias("total"))
    mx = cells.groupBy("event_type").agg(F.max("n").alias("mx"))
    return (
        cells.join(F.broadcast(tot), "event_type")
        .join(F.broadcast(mx), "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_active_hours"),
            F.max("total").alias("n_events"),
            F.min(F.when(F.col("n") == F.col("mx"), F.col("hod"))).cast(
                "bigint"
            ).alias("peak_hour"),
            F.round(
                -F.sum(
                    F.expr(
                        "(CAST(n AS DOUBLE) / total)"
                        " * ln(CAST(n AS DOUBLE) / total)"
                    )
                ),
                6,
            ).alias("hourly_entropy"),
        )
    )


@query(
    "m_seasonal_decompose_dow",
    oracle="""
    WITH daily AS (
      SELECT epoch_ms(ts) // 86400000 AS d,
             CAST(count(*) AS BIGINT) AS x
      FROM events GROUP BY 1
    ),
    tr AS (
      SELECT d, x,
             CAST(sum(x) OVER w AS BIGINT) AS trend7,
             CAST(count(*) OVER w AS BIGINT) AS frame_n
      FROM daily
      WINDOW w AS (ORDER BY d ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
    ),
    det AS (
      SELECT d % 7 AS dow, 7 * x - trend7 AS det_x7
      FROM tr WHERE frame_n = 7
    )
    SELECT CAST(dow AS BIGINT) AS dow,
           CAST(count(*) AS BIGINT) AS n_days,
           CAST(sum(det_x7) AS BIGINT) AS detrended_x7_sum,
           CAST(round(CAST(sum(det_x7) AS DOUBLE) / (7 * count(*)), 4)
                AS DOUBLE) AS seasonal
    FROM det GROUP BY 1
    """,
)
def m_seasonal_decompose_dow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Additive seasonal decomposition (STL-lite) of the daily event
    series: trend via the CENTERED 7-day moving sum, seasonal = the
    per-day-of-week mean of the detrended series — the classic
    trend/seasonal split m_dow_seasonality_strength's eta² summarizes
    but never exhibits. Integer-exact channels: detrended×7 =
    7·x_d − Σ_{d−3..d+3} x (no division until the final mirrored
    round-4 mean); only FULL 7-row frames enter (frame_n = 7 — edge
    days have no centered trend, both engines drop them identically);
    dow is the pure-integer epoch-day mod 7 (never engine dow labels —
    the documented divergence channel). The centered window runs over
    the CALENDAR-BOUNDED daily frame (the m_autocorr_daily class:
    row count = day count, cannot grow with volume); the corpus-scale
    work is one daily count aggregate. 7-row output at any scale."""
    e = _events(spark, sf_dir)
    daily = e.groupBy(
        F.expr("unix_millis(ts) div 86400000").alias("d")
    ).agg(F.count(F.lit(1)).alias("x"))
    w = W.orderBy("d").rowsBetween(-3, 3)
    tr = daily.select(
        "d",
        "x",
        F.sum("x").over(w).alias("trend7"),
        F.count(F.lit(1)).over(w).alias("frame_n"),
    )
    det = tr.where(F.col("frame_n") == 7).select(
        F.expr("d % 7").alias("dow"),
        F.expr("7 * x - trend7").alias("det_x7"),
    )
    return det.groupBy(F.col("dow").cast("bigint").alias("dow")).agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum("det_x7").alias("detrended_x7_sum"),
        F.expr(
            "CAST(round(CAST(sum(det_x7) AS DOUBLE) / (7 * count(1)), 4)"
            " AS DOUBLE)"
        ).alias("seasonal"),
    )


@query(
    "a_logrank_test",
    oracle="""
    WITH days AS (
      SELECT user_id, epoch_ms(ts) // 86400000 AS d FROM events
      WHERE user_id IS NOT NULL
    ),
    pu AS (
      SELECT user_id, user_id % 2 AS arm, min(d) AS f, max(d) AS l
      FROM days GROUP BY 1, 2
    ),
    t AS (SELECT max(d) AS tmax FROM days),
    dur AS (
      SELECT arm, l - f + 1 AS duration,
             CASE WHEN l = tmax THEN 0 ELSE 1 END AS died
      FROM pu, t
    ),
    byd AS (
      SELECT duration,
             CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS t_a,
             CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS t_b,
             CAST(sum(CASE WHEN arm = 0 THEN died ELSE 0 END) AS BIGINT)
               AS d_a,
             CAST(sum(CASE WHEN arm = 1 THEN died ELSE 0 END) AS BIGINT)
               AS d_b
      FROM dur GROUP BY 1
    ),
    nu AS (
      SELECT CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS na,
             CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS nb
      FROM dur
    ),
    r AS (
      SELECT duration, d_a, d_b,
             na - coalesce(sum(t_a) OVER (ORDER BY duration
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS r_a,
             nb - coalesce(sum(t_b) OVER (ORDER BY duration
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS r_b
      FROM byd, nu
    ),
    terms AS (
      SELECT duration, d_a,
             CASE WHEN d_a + d_b > 0
                  THEN CAST(d_a + d_b AS DOUBLE) * r_a / (r_a + r_b)
                  ELSE 0.0 END AS e_a_t,
             CASE WHEN d_a + d_b > 0 AND r_a + r_b > 1
                  THEN (CAST(d_a + d_b AS DOUBLE) * r_a / (r_a + r_b))
                       * (CAST(r_b AS DOUBLE) / (r_a + r_b))
                       * (r_a + r_b - (d_a + d_b))
                       / (r_a + r_b - 1)
                  ELSE 0.0 END AS v_t
      FROM r
    ),
    acc AS (
      SELECT duration,
             CAST(sum(d_a) OVER win AS BIGINT) AS o_a,
             sum(e_a_t) OVER win AS e_a,
             sum(v_t) OVER win AS v,
             row_number() OVER (ORDER BY duration DESC) AS rr
      FROM terms
      WINDOW win AS (ORDER BY duration
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    )
    SELECT nu.na AS n_arm_a, nu.nb AS n_arm_b, acc.o_a,
           CAST(round(acc.e_a, 6) AS DOUBLE) AS e_a,
           CAST(round(acc.v, 6) AS DOUBLE) AS v,
           CAST(CASE WHEN acc.v <= 0 THEN NULL
                ELSE round((acc.o_a - acc.e_a) / sqrt(acc.v), 6)
                END AS DOUBLE) AS z
    FROM acc, nu WHERE acc.rr = 1
    """,
)
def a_logrank_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Log-rank (Mantel-Cox) test between two survival curves — the
    hypothesis-test companion m_kaplan_meier's estimator lacks (the
    standard pair: KM draws the curves, log-rank decides whether they
    differ). Same duration/censoring construction as the KM entry
    (duration = active span in days; users active on the corpus' last
    day are censored), arms split by user parity (the
    a_two_proportion_ztest channel). Per death time t: E_a(t) =
    d_t·r_a/N_t and the hypergeometric variance — both RATIONAL, so
    the float sums ride ORDER-DETERMINISTIC cumulative windows over
    the sorted duration axis (the KM sum-of-ln trick: both engines
    accumulate ascending, no group-aggregate float-order channel),
    with each per-duration term computed in DOUBLE from exact integer
    at-risk/death counts via one mirrored formula — no data-scaled
    integer product ever forms (the wide-int audit class avoided by
    construction). z = (O_a − E_a)/√V round-6; V = 0 → NULL both
    sides. At-risk counts come from prefix sums over the
    duration-bounded frame (row count ≤ observation span in days)."""
    e = _events(spark, sf_dir).where(F.col("user_id").isNotNull())
    days = e.select(
        "user_id", F.expr("unix_millis(ts) div 86400000").alias("d")
    )
    # pu is checkpointed (the Kaplan-Meier scan-amplification fix, r13):
    # FIVE lazy consumers sit downstream (t, byd, nu, and nu's two
    # broadcast joins) — unmaterialized, each would re-run the events
    # group-by; tmax is derived from pu's own max(l) so the corpus is
    # scanned exactly once
    pu = (
        days.groupBy("user_id", F.expr("user_id % 2").alias("arm"))
        .agg(F.min("d").alias("f"), F.max("d").alias("l"))
        .localCheckpoint(eager=False)
    )
    t = pu.groupBy().agg(F.max("l").alias("tmax"))
    dur = pu.crossJoin(F.broadcast(t)).select(
        "arm",
        F.expr("l - f + 1").alias("duration"),
        F.expr("CASE WHEN l = tmax THEN 0 ELSE 1 END").alias("died"),
    )
    byd = dur.groupBy("duration").agg(
        F.expr("CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT)")
        .alias("t_a"),
        F.expr("CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT)")
        .alias("t_b"),
        F.expr("CAST(sum(CASE WHEN arm = 0 THEN died ELSE 0 END) AS BIGINT)")
        .alias("d_a"),
        F.expr("CAST(sum(CASE WHEN arm = 1 THEN died ELSE 0 END) AS BIGINT)")
        .alias("d_b"),
    )
    nu = dur.groupBy().agg(
        F.expr("CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT)")
        .alias("na"),
        F.expr("CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT)")
        .alias("nb"),
    )
    wprev = W.orderBy("duration").rowsBetween(W.unboundedPreceding, -1)
    r = byd.crossJoin(F.broadcast(nu)).select(
        "duration",
        "d_a",
        "d_b",
        (F.col("na") - F.coalesce(F.sum("t_a").over(wprev), F.lit(0))).alias(
            "r_a"
        ),
        (F.col("nb") - F.coalesce(F.sum("t_b").over(wprev), F.lit(0))).alias(
            "r_b"
        ),
    )
    terms = r.select(
        "duration",
        "d_a",
        F.expr(
            "CASE WHEN d_a + d_b > 0"
            " THEN CAST(d_a + d_b AS DOUBLE) * r_a / (r_a + r_b)"
            " ELSE 0.0D END"
        ).alias("e_a_t"),
        F.expr(
            "CASE WHEN d_a + d_b > 0 AND r_a + r_b > 1"
            " THEN (CAST(d_a + d_b AS DOUBLE) * r_a / (r_a + r_b))"
            " * (CAST(r_b AS DOUBLE) / (r_a + r_b))"
            " * (r_a + r_b - (d_a + d_b))"
            " / (r_a + r_b - 1)"
            " ELSE 0.0D END"
        ).alias("v_t"),
    )
    wcum = W.orderBy("duration").rowsBetween(W.unboundedPreceding, 0)
    acc = terms.select(
        F.sum("d_a").over(wcum).alias("o_a"),
        F.sum("e_a_t").over(wcum).alias("e_a"),
        F.sum("v_t").over(wcum).alias("v"),
        F.row_number()
        .over(W.orderBy(F.desc("duration")))
        .alias("rr"),
    ).where(F.col("rr") == 1)
    return acc.crossJoin(F.broadcast(nu)).select(
        F.col("na").alias("n_arm_a"),
        F.col("nb").alias("n_arm_b"),
        "o_a",
        F.expr("CAST(round(e_a, 6) AS DOUBLE)").alias("e_a"),
        F.expr("CAST(round(v, 6) AS DOUBLE)").alias("v"),
        F.expr(
            "CAST(CASE WHEN v <= 0 THEN NULL"
            " ELSE round((o_a - e_a) / sqrt(v), 6) END AS DOUBLE)"
        ).alias("z"),
    )


@query(
    "m_ma_crossover_signals",
    oracle="""
    WITH daily AS (
      SELECT epoch_ms(ts) // 86400000 AS d,
             CAST(count(*) AS BIGINT) AS x
      FROM events WHERE event_type = 'purchase' GROUP BY 1
    ),
    ma AS (
      SELECT d,
             CAST(sum(x) OVER w7 AS BIGINT) AS s7,
             CAST(count(*) OVER w7 AS BIGINT) AS n7,
             CAST(sum(x) OVER w28 AS BIGINT) AS s28,
             CAST(count(*) OVER w28 AS BIGINT) AS n28
      FROM daily
      WINDOW w7 AS (ORDER BY d ROWS BETWEEN 6 PRECEDING AND CURRENT ROW),
             w28 AS (ORDER BY d ROWS BETWEEN 27 PRECEDING AND CURRENT ROW)
    ),
    st AS (
      SELECT d, s7, s28,
             CASE WHEN 4 * s7 > s28 THEN 1 ELSE 0 END AS above,
             lag(CASE WHEN 4 * s7 > s28 THEN 1 ELSE 0 END)
               OVER (ORDER BY d) AS p_above
      FROM ma WHERE n7 = 7 AND n28 = 28
    )
    SELECT CAST(d AS BIGINT) AS day, s7, s28,
           CAST(CASE WHEN above = 1 THEN 1 ELSE -1 END AS INT) AS direction
    FROM st WHERE p_above IS NOT NULL AND above <> p_above
    """,
)
def m_ma_crossover_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Moving-average crossover signals on the daily purchase series —
    the golden-cross/death-cross detector (7-day vs 28-day MA): a
    signal fires on every day the short average crosses the long one.
    The comparison never divides: with FULL frames only (n7 = 7,
    n28 = 28), ma7 > ma28 ⟺ 4·s7 > s28 — the whole detector is
    exact integer arithmetic (sums, a 0/1 state bit, one lag), so the
    oracle mirrors it bit-for-bit with no float channel at all.
    Windows ride the CALENDAR-BOUNDED daily frame (the m_autocorr
    class); corpus-scale work is one daily count aggregate. direction
    +1 = golden cross (short rises above), −1 = death cross."""
    e = _events(spark, sf_dir).where(F.col("event_type") == "purchase")
    daily = e.groupBy(
        F.expr("unix_millis(ts) div 86400000").alias("d")
    ).agg(F.count(F.lit(1)).alias("x"))
    w7 = W.orderBy("d").rowsBetween(-6, 0)
    w28 = W.orderBy("d").rowsBetween(-27, 0)
    ma = daily.select(
        "d",
        F.sum("x").over(w7).alias("s7"),
        F.count(F.lit(1)).over(w7).alias("n7"),
        F.sum("x").over(w28).alias("s28"),
        F.count(F.lit(1)).over(w28).alias("n28"),
    )
    st = (
        ma.where((F.col("n7") == 7) & (F.col("n28") == 28))
        .select(
            "d",
            "s7",
            "s28",
            F.expr("CASE WHEN 4 * s7 > s28 THEN 1 ELSE 0 END").alias(
                "above"
            ),
        )
        .select(
            "d",
            "s7",
            "s28",
            "above",
            F.lag("above").over(W.orderBy("d")).alias("p_above"),
        )
    )
    return st.where(
        F.col("p_above").isNotNull() & (F.col("above") != F.col("p_above"))
    ).select(
        F.col("d").cast("bigint").alias("day"),
        "s7",
        "s28",
        F.expr(
            "CAST(CASE WHEN above = 1 THEN 1 ELSE -1 END AS INT)"
        ).alias("direction"),
    )


@query(
    "m_bounce_rate_sessions",
    oracle="""
    WITH ev AS (
      SELECT user_id, epoch_ms(ts) AS ms, ts, event_id FROM events
      WHERE user_id IS NOT NULL
    ),
    brk AS (
      SELECT user_id, ts, event_id,
             CASE WHEN lag(ms) OVER w IS NULL
                    OR ms - lag(ms) OVER w > 1800000
                  THEN 1 ELSE 0 END AS is_new
      FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sess AS (
      SELECT user_id,
             sum(is_new) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS UNBOUNDED PRECEDING
             ) AS sid
      FROM brk
    ),
    per_sess AS (
      SELECT user_id, sid, CAST(count(*) AS BIGINT) AS n_events
      FROM sess GROUP BY 1, 2
    )
    SELECT CAST(count(*) AS BIGINT) AS n_sessions,
           CAST(sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_bounces,
           CAST(sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) * 1000000
                // count(*) AS BIGINT) AS bounce_ppm,
           CAST(sum(n_events) * 1000 // count(*) AS BIGINT)
             AS events_per_session_x1000
    FROM per_sess
    """,
)
def m_bounce_rate_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session bounce rate — the engagement metric h_session_windows'
    raw sessionization never aggregates: sessions are gaps-and-islands
    over per-user event streams (a new session when the gap from the
    previous event exceeds 30 min; ids by running sum of break flags —
    the w_activity_streaks anchor trick), a BOUNCE is a single-event
    session, and the rate ships as exact integer ppm plus the mean
    session depth as a floor-divided x1000 integer (no float channel
    anywhere). One partitioned window + one aggregate; the per-user
    window partitions by the session key so no global sort exists at
    any scale. NOTE the oracle's inner running sum orders by the same
    (ts, event_id) per user — the partition-local order both engines
    share."""
    e = _events(spark, sf_dir).where(F.col("user_id").isNotNull())
    ev = e.select(
        "user_id", "ts", "event_id", F.expr("unix_millis(ts)").alias("ms")
    )
    wk = W.partitionBy("user_id").orderBy("ts", "event_id")
    brk = ev.select(
        "user_id",
        "ts",
        "event_id",
        F.expr(
            "CASE WHEN lag(ms) OVER (PARTITION BY user_id"
            " ORDER BY ts, event_id) IS NULL"
            " OR ms - lag(ms) OVER (PARTITION BY user_id"
            " ORDER BY ts, event_id) > 1800000 THEN 1 ELSE 0 END"
        ).alias("is_new"),
    )
    sess = brk.select(
        "user_id",
        F.sum("is_new").over(
            wk.rowsBetween(W.unboundedPreceding, 0)
        ).alias("sid"),
    )
    per_sess = sess.groupBy("user_id", "sid").agg(
        F.count(F.lit(1)).alias("n_events")
    )
    return per_sess.groupBy().agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.expr(
            "CAST(sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT)"
        ).alias("n_bounces"),
        F.expr(
            "CAST(sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) * 1000000"
            " div count(1) AS BIGINT)"
        ).alias("bounce_ppm"),
        F.expr(
            "CAST(sum(n_events) * 1000 div count(1) AS BIGINT)"
        ).alias("events_per_session_x1000"),
    )


# SPRT literal constants rendered ONCE from the kernel module (repr
# round-trips — the oracle, the kernel and the pin all share these exact
# doubles; no in-engine ln() anywhere)
_SPRT_LE = repr(es.SPRT_L_ERR)
_SPRT_LO = repr(es.SPRT_L_OK)
_SPRT_A = repr(es.SPRT_A)
_SPRT_B = repr(es.SPRT_B)
_SPRT_STEP = (
    f"f.llr + CASE WHEN o.event_type = 'error' THEN {_SPRT_LE}"
    f" ELSE {_SPRT_LO} END"
)


@query(
    "es_sprt_fold",
    oracle=f"""
    WITH RECURSIVE ordered AS (
      SELECT user_id, event_type,
             row_number() OVER (
               PARTITION BY user_id ORDER BY ts, event_id
             ) AS rn
      FROM events WHERE user_id IS NOT NULL
    ),
    lim AS (SELECT user_id, max(rn) AS mx FROM ordered GROUP BY user_id),
    fold(user_id, rn, llr, n_detect, n_clear) AS (
      SELECT user_id, 0, CAST(0.0 AS DOUBLE), CAST(0 AS BIGINT),
             CAST(0 AS BIGINT)
      FROM lim
      UNION ALL
      SELECT f.user_id, f.rn + 1,
             CASE WHEN ({_SPRT_STEP}) >= {_SPRT_A}
                    OR ({_SPRT_STEP}) <= {_SPRT_B}
                  THEN 0.0 ELSE ({_SPRT_STEP}) END,
             f.n_detect + CASE WHEN ({_SPRT_STEP}) >= {_SPRT_A}
                               THEN 1 ELSE 0 END,
             f.n_clear + CASE WHEN ({_SPRT_STEP}) < {_SPRT_A}
                              AND ({_SPRT_STEP}) <= {_SPRT_B}
                              THEN 1 ELSE 0 END
      FROM fold f JOIN ordered o
        ON o.user_id = f.user_id AND o.rn = f.rn + 1
    )
    SELECT CAST(f.user_id AS VARCHAR) AS aggregate_id,
           CAST(round(f.llr, 6) AS DOUBLE) AS llr,
           f.n_detect, f.n_clear,
           CAST(l.mx AS BIGINT) AS n
    FROM fold f JOIN lim l USING (user_id) WHERE f.rn = l.mx
    """,
)
def es_sprt_fold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user SPRT (Wald sequential probability ratio test) monitor as
    an ordered event fold — the batch half of cross-mode twin #8 (live
    half: streaming/metrics.sprt_stream, BOTH calling the ONE sprt_step
    kernel): H0 5% vs H1 15% Bernoulli error rate at α = β = 5%; every
    event adds its literal llr increment, crossing ln(19) DETECTS a
    regression, crossing −ln(19) CLEARS, and either decision resets the
    test (continuous monitoring — the cusum reset composition). ALL
    transcendentals are precomputed Python float literals shared
    verbatim by kernel, plan, and oracle (the one-minus-literal
    invariant generalized — no in-engine ln() ever runs), so the
    recursive-CTE oracle reproduces the float64 recurrence in identical
    order; the decision thresholds see the SAME double on both sides.
    llr rounds to 6 only at output."""
    e = _events(spark, sf_dir).where(F.col("user_id").isNotNull())
    e = e.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.unix_millis(F.col("ts").cast("timestamp")).alias("ms"),
    )
    folded = es.fold_events_sorted(
        e,
        key_col="user_id",
        order_cols=["ts", "event_id"],
        handle_event=es.sprt_handle_event,
        state_schema=es.SPRT_STATE_SCHEMA,
    )
    return folded.select(
        "aggregate_id",
        F.expr("CAST(round(llr, 6) AS DOUBLE)").alias("llr"),
        "n_detect",
        "n_clear",
        "n",
    )


@query(
    "m_xmr_control_chart",
    oracle="""
    WITH daily AS (
      SELECT epoch_ms(ts) // 86400000 AS d,
             CAST(count(*) AS BIGINT) AS x
      FROM events GROUP BY 1
    ),
    mr AS (
      SELECT d, x,
             abs(x - lag(x) OVER (ORDER BY d)) AS r
      FROM daily
    ),
    lim AS (
      SELECT CAST(count(*) AS BIGINT) AS n_days,
             CAST(sum(x) AS BIGINT) AS sx,
             CAST(sum(r) AS BIGINT) AS sr,
             CAST(count(r) AS BIGINT) AS nr
      FROM mr
    )
    SELECT m.d AS day, m.x,
           CAST(round(CAST(l.sx AS DOUBLE) / l.n_days
                + 2.66 * l.sr / l.nr, 4) AS DOUBLE) AS ucl,
           CAST(round(CAST(l.sx AS DOUBLE) / l.n_days
                - 2.66 * l.sr / l.nr, 4) AS DOUBLE) AS lcl,
           CAST(CASE WHEN CAST(m.x AS DOUBLE)
                     > CAST(l.sx AS DOUBLE) / l.n_days + 2.66 * l.sr / l.nr
                     THEN 1
                WHEN CAST(m.x AS DOUBLE)
                     < CAST(l.sx AS DOUBLE) / l.n_days - 2.66 * l.sr / l.nr
                     THEN -1
                ELSE 0 END AS INT) AS violation
    FROM mr m, lim l
    WHERE l.nr > 0
    """,
)
def m_xmr_control_chart(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XmR (individuals & moving range) control chart over the daily
    event series — the Shewhart process-behavior chart beside the
    sequential detectors (CUSUM reacts to accumulated drift, XmR flags
    single excursions past mean ± 2.66·mR̄): natural process limits
    from the MEAN MOVING RANGE (|x_d − x_{d−1}|, exact integers via
    one lag on the calendar-bounded daily frame), the full chart ships
    (every day with its violation flag — a violation-only output was
    VACUOUS on this stable series, the r10 lesson), limits round-4 (round-4
    from one mirrored float formula over exact integer sums — 2.66 is
    the standard d2-derived constant for n=2 subgroups, a shared
    literal). The violation PREDICATE compares unrounded doubles
    identically on both sides. Corpus-scale work is one daily count
    aggregate."""
    e = _events(spark, sf_dir)
    daily = e.groupBy(
        F.expr("unix_millis(ts) div 86400000").alias("d")
    ).agg(F.count(F.lit(1)).alias("x"))
    mr = daily.select(
        "d",
        "x",
        F.expr("abs(x - lag(x) OVER (ORDER BY d))").alias("r"),
    )
    lim = mr.groupBy().agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum("x").alias("sx"),
        F.sum("r").alias("sr"),
        F.count("r").alias("nr"),
    )
    j = mr.crossJoin(F.broadcast(lim)).where(F.col("nr") > 0)
    # 2.66D, not 2.66: a bare decimal literal in F.expr runs the whole
    # chain in scale-truncating DECIMAL arithmetic (the r13
    # t_log_odds_terms invariant) — the violation predicate compares
    # unrounded values, so the channel must be float64 end to end
    ucl = (
        "CAST(sx AS DOUBLE) / n_days + 2.66D * sr / nr"
    )
    lcl = (
        "CAST(sx AS DOUBLE) / n_days - 2.66D * sr / nr"
    )
    return j.select(
        F.col("d").alias("day"),
        "x",
        F.expr(f"CAST(round({ucl}, 4) AS DOUBLE)").alias("ucl"),
        F.expr(f"CAST(round({lcl}, 4) AS DOUBLE)").alias("lcl"),
        F.expr(
            f"CAST(CASE WHEN CAST(x AS DOUBLE) > {ucl} THEN 1"
            f" WHEN CAST(x AS DOUBLE) < {lcl} THEN -1 ELSE 0 END AS INT)"
        ).alias("violation"),
    )


# debounce gap literal rendered ONCE from the kernel module
_DEB_GAP = str(es.DEBOUNCE_GAP_MS)
_DEB_ADMIT = f"(f.last_ms IS NULL OR o.ms - f.last_ms >= {_DEB_GAP})"


@query(
    "es_debounce_fold",
    oracle=f"""
    WITH RECURSIVE ordered AS (
      SELECT user_id, epoch_ms(ts) AS ms,
             row_number() OVER (
               PARTITION BY user_id ORDER BY ts, event_id
             ) AS rn
      FROM events WHERE user_id IS NOT NULL
    ),
    lim AS (SELECT user_id, max(rn) AS mx FROM ordered GROUP BY user_id),
    fold(user_id, rn, last_ms, n_accepted, n_suppressed) AS (
      SELECT user_id, 0, CAST(NULL AS BIGINT), CAST(0 AS BIGINT),
             CAST(0 AS BIGINT)
      FROM lim
      UNION ALL
      SELECT f.user_id, f.rn + 1,
             CASE WHEN {_DEB_ADMIT} THEN o.ms ELSE f.last_ms END,
             f.n_accepted + CASE WHEN {_DEB_ADMIT} THEN 1 ELSE 0 END,
             f.n_suppressed + CASE WHEN {_DEB_ADMIT} THEN 0 ELSE 1 END
      FROM fold f JOIN ordered o
        ON o.user_id = f.user_id AND o.rn = f.rn + 1
    )
    SELECT CAST(f.user_id AS VARCHAR) AS aggregate_id,
           CAST(f.last_ms AS BIGINT) AS last_ms,
           f.n_accepted, f.n_suppressed,
           CAST(l.mx AS BIGINT) AS n
    FROM fold f JOIN lim l USING (user_id) WHERE f.rn = l.mx
    """,
)
def es_debounce_fold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user DEBOUNCE (trailing rate limit) as an ordered event fold —
    the batch half of cross-mode twin #9 (live half:
    streaming/metrics.debounce_stream, BOTH calling the ONE
    debounce_step kernel): an event is ADMITTED only when >= 60 s has
    passed since the last ADMITTED event; a suppressed burst never
    resets the clock, which is exactly what makes the fold recursive —
    admission depends on the last accepted timestamp, not the previous
    row, so no lag()/session-window rewrite expresses it (the
    token-bucket class, with a simpler state: one timestamp + two
    counters, all integers ⇒ the recursive-CTE oracle and the
    streaming twin pin EXACTLY, no float channel at all). The
    notification-dedup / alert-fatigue shape every event pipeline
    ships."""
    e = _events(spark, sf_dir).where(F.col("user_id").isNotNull())
    e = e.select(
        "user_id",
        "ts",
        "event_id",
        F.unix_millis(F.col("ts").cast("timestamp")).alias("ms"),
    )
    folded = es.fold_events_sorted(
        e,
        key_col="user_id",
        order_cols=["ts", "event_id"],
        handle_event=es.debounce_handle_event,
        state_schema=es.DEBOUNCE_STATE_SCHEMA,
    )
    return folded.select(
        "aggregate_id", "last_ms", "n_accepted", "n_suppressed", "n"
    )


@query(
    "m_mtbf_mttr",
    oracle="""
    WITH ev AS (
      SELECT user_id, epoch_ms(ts) AS ms, event_id,
             CASE WHEN event_type = 'error' THEN 1 ELSE 0 END AS is_err
      FROM events WHERE user_id IS NOT NULL
    ),
    marked AS (
      SELECT user_id, ms, event_id, is_err,
             CASE WHEN lag(is_err) OVER w IS NULL
                    OR lag(is_err) OVER w <> is_err THEN 1 ELSE 0 END
               AS chg,
             lead(ms) OVER w AS next_ms
      FROM ev
      WINDOW w AS (PARTITION BY user_id ORDER BY ms, event_id)
    ),
    grouped AS (
      SELECT user_id, ms, event_id, is_err, next_ms,
             sum(chg) OVER (PARTITION BY user_id ORDER BY ms, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS grp
      FROM marked
    ),
    runs AS (
      SELECT user_id, grp,
             CAST(min(ms) AS BIGINT) AS start_ms,
             CAST(count(*) AS BIGINT) AS n_err,
             max(CASE WHEN rn_desc = 1 THEN next_ms END) AS recovery_ms
      FROM (
        SELECT *, row_number() OVER (
          PARTITION BY user_id, grp ORDER BY ms DESC, event_id DESC
        ) AS rn_desc
        FROM grouped WHERE is_err = 1
      ) GROUP BY user_id, grp
    ),
    gaps AS (
      SELECT user_id, start_ms, n_err, recovery_ms,
             start_ms - lag(start_ms) OVER (
               PARTITION BY user_id ORDER BY grp
             ) AS gap_ms
      FROM runs
    )
    SELECT CAST(count(*) AS BIGINT) AS n_incidents,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users_affected,
           CAST(sum(n_err) AS BIGINT) AS n_error_events,
           CAST(count(recovery_ms) AS BIGINT) AS n_recovered,
           CAST(CASE WHEN count(recovery_ms) = 0 THEN NULL
                ELSE sum(recovery_ms - start_ms) // count(recovery_ms)
                END AS BIGINT) AS mttr_ms_floor,
           CAST(count(gap_ms) AS BIGINT) AS n_gaps,
           CAST(CASE WHEN count(gap_ms) = 0 THEN NULL
                ELSE sum(gap_ms) // count(gap_ms)
                END AS BIGINT) AS mtbf_ms_floor
    FROM gaps
    """,
)
def m_mtbf_mttr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MTBF / MTTR over per-user error streams — the two reliability
    numbers the SRE detectors (burn rate, SPRT, Page-Hinkley) monitor
    AROUND but never report: an INCIDENT is a maximal run of
    consecutive 'error' events (gaps-and-islands on the is_err change
    flag, the m_bounce_rate_sessions anchor), time-to-recovery is
    first-error → first subsequent non-error event (runs still open at
    stream end are counted but excluded from MTTR — never a fabricated
    recovery), and time-between-failures is the gap between successive
    incident STARTS per user (lag ordered by the monotonic run id, so
    duplicate-timestamp runs stay deterministic). All channels are
    exact integer milliseconds; the two means ship as floor divisions
    (positive operands: `div` ≡ `//`). Every window partitions by
    user — no global sort at any scale."""
    e = _events(spark, sf_dir).where(F.col("user_id").isNotNull())
    ev = e.select(
        "user_id",
        F.expr("unix_millis(ts)").alias("ms"),
        "event_id",
        F.expr(
            "CASE WHEN event_type = 'error' THEN 1 ELSE 0 END"
        ).alias("is_err"),
    )
    wk = "PARTITION BY user_id ORDER BY ms, event_id"
    marked = ev.select(
        "user_id", "ms", "event_id", "is_err",
        F.expr(
            f"CASE WHEN lag(is_err) OVER ({wk}) IS NULL"
            f" OR lag(is_err) OVER ({wk}) <> is_err THEN 1 ELSE 0 END"
        ).alias("chg"),
        F.expr(f"lead(ms) OVER ({wk})").alias("next_ms"),
    )
    grouped = marked.select(
        "user_id", "ms", "event_id", "is_err", "next_ms",
        F.expr(
            f"sum(chg) OVER ({wk}"
            " ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"
        ).alias("grp"),
    )
    err_rows = grouped.where(F.col("is_err") == 1).withColumn(
        "rn_desc",
        F.expr(
            "row_number() OVER (PARTITION BY user_id, grp"
            " ORDER BY ms DESC, event_id DESC)"
        ),
    )
    runs = err_rows.groupBy("user_id", "grp").agg(
        F.min("ms").alias("start_ms"),
        F.count(F.lit(1)).alias("n_err"),
        F.max(F.expr("CASE WHEN rn_desc = 1 THEN next_ms END")).alias(
            "recovery_ms"
        ),
    )
    gaps = runs.select(
        "user_id", "start_ms", "n_err", "recovery_ms",
        F.expr(
            "start_ms - lag(start_ms) OVER"
            " (PARTITION BY user_id ORDER BY grp)"
        ).alias("gap_ms"),
    )
    return gaps.groupBy().agg(
        F.count(F.lit(1)).alias("n_incidents"),
        F.countDistinct("user_id").alias("n_users_affected"),
        F.sum("n_err").alias("n_error_events"),
        F.count("recovery_ms").alias("n_recovered"),
        F.expr(
            "CAST(CASE WHEN count(recovery_ms) = 0 THEN NULL"
            " ELSE sum(recovery_ms - start_ms) div count(recovery_ms)"
            " END AS BIGINT)"
        ).alias("mttr_ms_floor"),
        F.count("gap_ms").alias("n_gaps"),
        F.expr(
            "CAST(CASE WHEN count(gap_ms) = 0 THEN NULL"
            " ELSE sum(gap_ms) div count(gap_ms)"
            " END AS BIGINT)"
        ).alias("mtbf_ms_floor"),
    )


@query(
    "m_croston_forecast",
    oracle="""
    WITH RECURSIVE ordered AS (
      SELECT user_id, value, epoch_ms(ts) AS ms,
             row_number() OVER (
               PARTITION BY user_id ORDER BY ts, event_id
             ) AS rn
      FROM events
      WHERE value IS NOT NULL AND user_id IS NOT NULL
        AND event_type = 'purchase'
    ),
    lim AS (SELECT user_id, max(rn) AS mx FROM ordered GROUP BY user_id),
    fold(user_id, rn, z, p, last_ms) AS (
      SELECT user_id, 1, value, CAST(0.0 AS DOUBLE), ms
      FROM ordered WHERE rn = 1
      UNION ALL
      SELECT f.user_id, f.rn + 1,
             0.2 * o.value + 0.8 * f.z,
             0.2 * CAST(o.ms - f.last_ms AS DOUBLE) + 0.8 * f.p,
             o.ms
      FROM fold f JOIN ordered o
        ON o.user_id = f.user_id AND o.rn = f.rn + 1
    )
    SELECT CAST(f.user_id AS VARCHAR) AS aggregate_id,
           CAST(l.mx AS BIGINT) AS n,
           CAST(round(f.z, 6) AS DOUBLE) AS demand_ewma,
           CAST(round(f.p, 6) AS DOUBLE) AS interval_ewma_ms,
           CAST(CASE WHEN f.p > 0
                THEN round(f.z / f.p * 86400000, 6) ELSE NULL END AS DOUBLE)
             AS rate_per_day
    FROM fold f JOIN lim l USING (user_id) WHERE f.rn = l.mx
    """,
)
def m_croston_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Croston's intermittent-demand forecast per user over the sparse
    purchase stream — the forecasting-family member Holt/Holt-Winters
    cannot cover (their dense recurrences smear zeros; Croston keeps
    TWO EWMAs, of the nonzero demand size and of the inter-demand
    interval, and forecasts their ratio (shipped per-DAY: the per-ms ratio is ~1e-7 and would vanish at round-6 — scale by the integer 86400000 literal BEFORE rounding) — the standard spare-parts /
    long-tail-SKU method): run as the SAME sorted-stream fold kernel
    (croston_handle_event), alpha = 0.2 with the one-minus
    coefficient a LITERAL 0.8 on every side (the HW_OM* invariant).
    The interval channel enters as the exact integer ms gap, cast to
    double before the EWMA in both engines; the recursive-CTE oracle
    performs the identical float64 ops in identical order (the holt
    pin class). p of a single-purchase user is the documented 0.0
    seed, so its rate is NULL (guarded both sides, unrounded p)."""
    e = _events(spark, sf_dir).where(
        F.col("value").isNotNull()
        & F.col("user_id").isNotNull()
        & (F.col("event_type") == "purchase")
    )
    e = e.select(
        "user_id",
        "ts",
        "event_id",
        "value",
        F.unix_millis(F.col("ts").cast("timestamp")).alias("ms"),
    )
    folded = es.fold_events_sorted(
        e,
        key_col="user_id",
        order_cols=["ts", "event_id"],
        handle_event=es.croston_handle_event,
        state_schema=es.CROSTON_STATE_SCHEMA,
    )
    return folded.select(
        "aggregate_id",
        "n",
        F.round("z", 6).alias("demand_ewma"),
        F.round("p", 6).alias("interval_ewma_ms"),
        F.expr(
            "CAST(CASE WHEN p > 0 THEN round(z / p * 86400000, 6)"
            " ELSE NULL END AS DOUBLE)"
        ).alias("rate_per_day"),
    )
