"""Event-sourcing semantics tests, mirroring the reference's tier-1 specs
(PersistentActorSpec.scala): deterministic fold, per-key serial order,
rejection-writes-nothing, no-change-no-write, and the BankAccount golden
scenario (BankAccountCommandEngineSpec.scala:34-79)."""

from __future__ import annotations

import datetime as dt

import pandas as pd

from surge_spark.operators import eventsourcing as es


def _events_df(spark, rows):
    return spark.createDataFrame(
        pd.DataFrame(
            rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
        )
    )


def _ts(i: int) -> dt.datetime:
    return dt.datetime(2024, 1, 1) + dt.timedelta(seconds=i)


def test_count_fold_deterministic(spark):
    """CountAggregate: count = #inc - #dec, version = #events applied
    (TestBoundedContext.scala:17-175)."""
    rows = [
        (1, _ts(1), 1, "purchase", 1.0, "{}"),
        (2, _ts(2), 1, "error", 1.0, "{}"),
        (3, _ts(3), 1, "purchase", 1.0, "{}"),
        (4, _ts(4), 1, "view", 1.0, "{}"),  # no-op event still bumps version
        (5, _ts(5), 2, "signup", 1.0, "{}"),
    ]
    out = es.fold_events(
        _events_df(spark, rows),
        "user_id",
        ["ts", "event_id"],
        es.count_handle_event,
        es.COUNT_STATE_SCHEMA,
    ).toPandas().set_index("aggregate_id")
    assert out.loc["1", "count"] == 1  # +1 -1 +1 +0
    assert out.loc["1", "version"] == 4
    assert out.loc["2", "count"] == 1
    assert out.loc["2", "version"] == 1


def test_fold_respects_event_order(spark):
    """Per-key serial processing (PersistentActorSpec.scala:466): the fold
    must apply events in (ts, event_id) order, not arrival order."""
    # debit-then-credit vs credit-then-debit give different rejection counts
    rows = [
        (2, _ts(2), 1, "click", 50.0, "{}"),      # credit 50
        (1, _ts(1), 1, "signup", 0.0, "{}"),      # create (earlier ts)
        (3, _ts(3), 1, "purchase", 40.0, "{}"),   # debit 40 -> ok (bal 10)
        (4, _ts(4), 1, "purchase", 40.0, "{}"),   # debit 40 -> rejected
    ]
    out = es.replay_commands(
        _events_df(spark, rows),
        "user_id",
        ["ts", "event_id"],
        es.bank_process_command,
        es.bank_handle_event,
        es.BANK_STATE_SCHEMA,
    ).toPandas()
    assert len(out) == 1
    assert out.loc[0, "balance"] == 10.0
    assert out.loc[0, "n_rejected"] == 1


def test_bank_rejections_write_nothing(spark):
    """Rejected commands produce no events and no state change
    (PersistentActor.scala:203-205): ops on a missing account leave no row."""
    rows = [
        (1, _ts(1), 9, "click", 10.0, "{}"),     # credit before create -> rejected
        (2, _ts(2), 9, "purchase", 5.0, "{}"),   # debit before create -> rejected
    ]
    out = es.replay_commands(
        _events_df(spark, rows),
        "user_id",
        ["ts", "event_id"],
        es.bank_process_command,
        es.bank_handle_event,
        es.BANK_STATE_SCHEMA,
    ).toPandas()
    assert len(out) == 0  # state never created


def test_bank_golden_scenario(spark):
    """BankAccount golden flow (BankAccountCommandEngineSpec): create,
    credit, debit, insufficient-funds rejection."""
    rows = [
        (1, _ts(1), 5, "signup", 0.0, "{}"),
        (2, _ts(2), 5, "click", 100.0, "{}"),
        (3, _ts(3), 5, "purchase", 30.0, "{}"),
        (4, _ts(4), 5, "purchase", 500.0, "{}"),  # insufficient funds
        (5, _ts(5), 5, "signup", 0.0, "{}"),      # create on existing: no-op, not rejected
    ]
    out = es.replay_commands(
        _events_df(spark, rows),
        "user_id",
        ["ts", "event_id"],
        es.bank_process_command,
        es.bank_handle_event,
        es.BANK_STATE_SCHEMA,
    ).toPandas()
    assert out.loc[0, "balance"] == 70.0
    assert out.loc[0, "n_rejected"] == 1
    assert out.loc[0, "version"] == 3  # created, credited, debited


def test_latest_per_key(spark):
    rows = [
        (1, _ts(1), 1, "a", 1.0, "{}"),
        (2, _ts(5), 1, "b", 2.0, "{}"),
        (3, _ts(3), 1, "c", 3.0, "{}"),
        (4, _ts(2), 2, "d", 4.0, "{}"),
    ]
    out = (
        es.latest_per_key(_events_df(spark, rows), ["user_id"], ["ts", "event_id"])
        .toPandas()
        .set_index("user_id")
    )
    assert out.loc[1, "event_type"] == "b"
    assert out.loc[2, "event_type"] == "d"


def test_pandas_reference_oracle_bank_fold(spark, sf_dir):
    """es_bank_fold has no SQL oracle (order-dependent); pin it against a
    pure-pandas replay of the same commands."""
    from surge_spark.io import load_table
    from surge_spark.queries import all_queries

    got = (
        all_queries()["es_bank_fold"](spark, sf_dir)
        .toPandas()
        .set_index("account_number")
        .sort_index()
    )

    pdf = load_table(spark, sf_dir, "events").toPandas()
    pdf = pdf.sort_values(["ts", "event_id"], kind="mergesort")
    states: dict[str, dict] = {}
    meta: dict[str, dict] = {}
    for rec in pdf.to_dict("records"):
        key = str(rec["user_id"])
        state = states.get(key)
        events, rejected = es.bank_process_command(state, rec)
        m = meta.setdefault(key, {"n_rejected": 0, "version": 0})
        if rejected:
            m["n_rejected"] += 1
            continue
        for ev in events:
            states[key] = es.bank_handle_event(states.get(key), ev)
            m["version"] += 1
    for key, state in states.items():
        assert round(state["balance"], 2) == got.loc[key, "balance"], key
        assert meta[key]["n_rejected"] == got.loc[key, "n_rejected"], key
        assert meta[key]["version"] == got.loc[key, "version"], key
    assert len(got) == len(states)


def test_sorted_fold_matches_grouped_fold(spark, sf_dir):
    """fold_events_sorted must produce byte-identical states to the
    per-group fold on the real events table — the 5x-faster sorted-stream
    form is a pure physical rewrite."""
    from surge_spark.io import load_table

    ev = load_table(spark, sf_dir, "events")
    args = ("user_id", ["ts", "event_id"], es.count_handle_event, es.COUNT_STATE_SCHEMA)
    a = (
        es.fold_events(ev, *args).toPandas()
        .sort_values("aggregate_id").reset_index(drop=True)
    )
    b = (
        es.fold_events_sorted(ev, *args).toPandas()
        .sort_values("aggregate_id").reset_index(drop=True)
    )
    assert a.equals(b)


def test_sorted_fold_carries_state_across_arrow_batches(spark):
    """A key whose rows span multiple Arrow batches must still fold as one
    group: force 1-row batches so every key crosses a batch boundary."""
    rows = [(k, i, float(i)) for k in (1, 2) for i in range(6)]
    df = spark.createDataFrame(rows, "user_id long, event_id long, value double")

    def handle(state, ev):
        s = state or {"aggregate_id": str(ev["user_id"]), "count": 0, "version": 0}
        return {
            "aggregate_id": s["aggregate_id"],
            "count": s["count"] + 1,
            "version": s["version"] + 1,
        }

    tiny = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", None)
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "1")
    try:
        out = es.fold_events_sorted(
            df, "user_id", ["event_id"], handle, es.COUNT_STATE_SCHEMA,
            flush_rows=1,
        ).toPandas().set_index("aggregate_id")
    finally:
        if tiny is not None:
            spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", tiny)
    assert out.loc["1", "count"] == 6 and out.loc["2", "count"] == 6
    assert len(out) == 2


def test_sorted_fold_drops_none_states(spark):
    """A handler folding to None (deleted aggregate) emits no row — same
    contract as fold_events."""
    df = spark.createDataFrame(
        [(1, 1, "keep"), (2, 1, "kill")], "user_id long, event_id long, event_type string"
    )

    def handle(state, ev):
        if ev["event_type"] == "kill":
            return None
        return {"aggregate_id": str(ev["user_id"]), "count": 1, "version": 1}

    out = es.fold_events_sorted(
        df, "user_id", ["event_id"], handle, es.COUNT_STATE_SCHEMA
    ).toPandas()
    assert list(out["aggregate_id"]) == ["1"]


def test_sorted_replay_matches_grouped_replay(spark, sf_dir):
    """replay_commands_sorted is a pure physical rewrite of
    replay_commands: identical bank states on the real events table."""
    from surge_spark.io import load_table

    ev = load_table(spark, sf_dir, "events")
    args = (
        "user_id", ["ts", "event_id"],
        es.bank_process_command, es.bank_handle_event, es.BANK_STATE_SCHEMA,
    )
    a = (
        es.replay_commands(ev, *args).toPandas()
        .sort_values("account_number").reset_index(drop=True)
    )
    b = (
        es.replay_commands_sorted(ev, *args).toPandas()
        .sort_values("account_number").reset_index(drop=True)
    )
    assert a.equals(b)


def test_anomaly_zscore_zero_variance_group_excluded(spark, tmp_path):
    """ADVICE r4: a constant-value event_type has stddev_pop=0 — under
    ANSI mode an unguarded divide throws DIVIDE_BY_ZERO. The guard must
    exclude the group (matching the oracle's HAVING sd <> 0), not crash."""
    import pandas as pd
    from surge_spark.queries.eventsourcing import m_anomaly_zscore

    df = pd.DataFrame(
        {
            "event_id": [1, 2, 3, 4, 5],
            "ts": pd.to_datetime(["2024-01-01"] * 5),
            "user_id": [1, 1, 2, 2, 3],
            "event_type": ["flat", "flat", "vary", "vary", "single"],
            "value": [7.0, 7.0, 0.0, 1000.0, 5.0],
            "props": ["{}"] * 5,
        }
    )
    sf = str(tmp_path)
    spark.createDataFrame(df).write.mode("overwrite").parquet(
        f"{sf}/events.parquet"
    )
    out = m_anomaly_zscore(spark, sf).toPandas()
    # zero-variance groups (flat, single) are excluded without error; the
    # varying group survives the stats join but |z|<=3 for a 2-point split
    assert set(out["event_type"]) <= {"vary"}


def test_holt_fold_constant_and_linear_series(spark):
    """Holt invariants on constructed series: a constant stream keeps
    level == x and trend == 0 at every step; a linear ramp's trend
    converges toward the slope (alpha=beta=0.5: within 2% by n=12)."""
    import datetime as dt

    import pandas as pd

    from surge_spark.operators import eventsourcing as es

    rows = []
    t0 = dt.datetime(2024, 1, 1)
    for i in range(12):
        rows.append((i, t0 + dt.timedelta(seconds=i), 1, "e", 7.0))     # constant
        rows.append((100 + i, t0 + dt.timedelta(seconds=i), 2, "e", float(3 * i)))  # ramp
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["event_id", "ts", "user_id", "event_type", "value"])
    )
    out = {
        r.aggregate_id: r
        for r in es.fold_events_sorted(
            df,
            key_col="user_id",
            order_cols=["ts", "event_id"],
            handle_event=es.holt_handle_event,
            state_schema=es.HOLT_STATE_SCHEMA,
        ).collect()
    }
    const = out["1"]
    assert const.level == 7.0 and const.trend == 0.0 and const.n == 12
    ramp = out["2"]
    assert abs(ramp.trend - 3.0) < 0.06  # slope 3, converged within 2%
    assert abs((ramp.level + ramp.trend) - 3 * 12) < 0.2  # forecast ~ next point


def test_token_bucket_kernel_properties():
    """Pure-kernel properties over random event-time streams: (a) the
    bucket never goes negative or over capacity, (b) total admissions are
    bounded by capacity + whole refills of the elapsed span (anchor time
    only ever moves forward, so credits can never exceed elapsed/refill),
    (c) the fold is deterministic."""
    import random

    from surge_spark.operators.eventsourcing import (
        TB_CAPACITY,
        token_bucket_step,
    )

    rng = random.Random(7)
    for _ in range(50):
        n = rng.randint(2, 80)
        times = sorted(rng.randrange(0, 10**10) for _ in range(n))
        refill = rng.choice([1000, 86_400_000, 3_600_000])

        def fold(ts):
            tokens, anchor = TB_CAPACITY - 1, ts[0]
            allowed = 1
            for t in ts[1:]:
                assert 0 <= tokens <= TB_CAPACITY
                tokens, anchor, ok = token_bucket_step(
                    tokens, anchor, t, refill_ms=refill
                )
                assert anchor <= t
                allowed += 1 if ok else 0
            return allowed, tokens, anchor

        a1 = fold(times)
        assert a1 == fold(times)  # deterministic
        span = times[-1] - times[0]
        assert a1[0] <= TB_CAPACITY + span // refill


def test_token_bucket_fold_totals(spark, sf_dir):
    """Catalog-entry invariants: admissions + throttles partition every
    event, final buckets stay in [0, capacity], and the 1/day refill is
    NON-VACUOUS on this corpus (some user actually throttles — a
    zero-throttle run would mean the entry tests nothing)."""
    from surge_spark.operators.eventsourcing import TB_CAPACITY
    from surge_spark.queries import all_queries

    rows = all_queries()["es_token_bucket_fold"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.n_allowed + r.n_throttled == r.n
        assert 0 <= r.tokens <= TB_CAPACITY
        assert r.n_allowed >= 1  # bucket starts full: first event admits
    assert any(r.n_throttled > 0 for r in rows)


def test_mttr_recovery_invariants(spark, sf_dir):
    """Every recovered episode has >= 1 error event, recovery times are
    non-negative with mean <= max (floor-division mean), and episode
    error events can never exceed the user's total error count."""
    from pyspark.sql import functions as F

    from surge_spark.io import load_table
    from surge_spark.queries import all_queries

    rows = all_queries()["m_mttr_recovery"](spark, sf_dir).collect()
    assert rows
    err_totals = {
        r.user_id: r.c
        for r in load_table(spark, sf_dir, "events")
        .where(F.col("event_type") == "error")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    }
    for r in rows:
        assert r.n_episodes >= 1
        assert r.n_error_events >= r.n_episodes
        assert 0 <= r.mean_recovery_ms <= r.max_recovery_ms
        assert r.n_error_events <= err_totals[r.user_id]


def test_token_bucket_init_through_kernel():
    """The shared first-event init must route THROUGH token_bucket_step:
    capacity >= 1 gives the familiar full-bucket-consumes (capacity-1,
    anchored at the event, allowed); capacity == 0 THROTTLES the first
    event instead of banking a negative token (the divergence the review
    pass caught in the streaming twin's inline init)."""
    from surge_spark.operators.eventsourcing import (
        token_bucket_handle_event,
        token_bucket_init,
    )

    tokens, anchor, allowed = token_bucket_init(5_000, capacity=3)
    assert (tokens, anchor, allowed) == (2, 5_000, True)
    tokens0, anchor0, allowed0 = token_bucket_init(5_000, capacity=0)
    assert (tokens0, allowed0) == (0, False)
    assert anchor0 == 5_000
    st = token_bucket_handle_event(None, {"user_id": "u", "ms": 5_000})
    assert (st["tokens"], st["anchor_ms"], st["n_allowed"], st["n"]) == (
        2,
        5_000,
        1,
        1,
    )


def test_saga_handler_state_machine():
    """The saga kernel against a hand-traced event sequence: start, step,
    complete, ignored out-of-state events, compensation, and the dangling
    in-flight final state."""
    from surge_spark.operators.eventsourcing import saga_handle_event

    seq = [
        "purchase",  # idle: ignored
        "view",      # start saga 1
        "click",     # step
        "click",     # step
        "purchase",  # complete saga 1
        "click",     # idle: ignored
        "view",      # start saga 2
        "error",     # compensate saga 2
        "view",      # start saga 3
        "view",      # in-flight: ignored
    ]
    st = None
    for et in seq:
        st = saga_handle_event(st, {"user_id": 7, "event_type": et})
    assert st["st"] == 1  # saga 3 dangling
    assert st["n_started"] == 3
    assert st["n_completed"] == 1
    assert st["n_compensated"] == 1
    assert st["n_steps"] == 2
    assert st["n_ignored"] == 3
    assert st["n"] == len(seq)


def test_saga_fold_totals(spark, sf_dir):
    """Catalog-level conservation: every event lands in exactly one
    bucket (start/step/complete/compensate/ignored), and completions +
    compensations + the dangling flag equal the starts."""
    from surge_spark.queries import all_queries

    rows = all_queries()["es_saga_fold"](spark, sf_dir).collect()
    assert rows
    from surge_spark.io import load_table
    import pyspark.sql.functions as F

    n_events = (
        load_table(spark, sf_dir, "events")
        .where(F.col("user_id").isNotNull())
        .count()
    )
    total = sum(
        r.n_started + r.n_steps + r.n_completed + r.n_compensated + r.n_ignored
        for r in rows
    )
    assert total == n_events
    for r in rows:
        assert r.n_started == r.n_completed + r.n_compensated + r.final_state
