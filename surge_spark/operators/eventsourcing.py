"""Event-sourcing operators (SURVEY §2.4 A1/A2, §2.10 U1-U5, §3).

The core surge semantic is the per-key ordered event fold
(CommandModels.scala:19-27): ``newState = events.foldLeft(state)(handleEvent)``
with exactly-one-writer-per-key ordering. In batch Spark that is
``groupBy(key).applyInPandas(ordered fold)`` — Spark guarantees one task owns
a key within a job, which is the batch analog of surge's single-writer actor
(overview.md:35-41). The streaming form lives in
``surge_spark.streaming.command_engine`` (applyInPandasWithState).

Handlers are plain Python callables, mirroring surge's user-supplied model
(U1 processCommand / U2 handleEvent, CommandModels.scala:12-14):

    handle_event(state: dict | None, event: dict) -> dict | None
    process_command(state: dict | None, cmd: dict) -> tuple[list[dict], bool]
        # (events, rejected) — rejected commands write nothing
        # (PersistentActor.scala:203-205)
"""

from __future__ import annotations

from collections.abc import Callable, Sequence
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..session import ensure_shipped

EventHandler = Callable[[dict | None, dict[str, Any]], dict | None]
CommandHandler = Callable[[dict | None, dict[str, Any]], tuple[list[dict], bool]]


def _iter_rows(pdf: pd.DataFrame):
    """Row dicts via zipped column lists — several times faster than
    DataFrame.to_dict('records') on wide Arrow-backed frames, and the fold
    loop is the hot path of every event-sourcing operator."""
    cols = list(pdf.columns)
    yield from (dict(zip(cols, vals)) for vals in zip(*(pdf[c].tolist() for c in cols)))


def fold_events(
    events: DataFrame,
    key_col: str,
    order_cols: Sequence[str],
    handle_event: EventHandler,
    state_schema: str,
    initial_state: Callable[[Any], dict | None] = lambda key: None,
) -> DataFrame:
    """A1: per-key ordered fold of events into one state row per key.

    One shuffle on ``key_col``; the fold runs inside an Arrow-batched
    ``applyInPandas`` because the recurrence is genuinely sequential per key.
    At 100 TB this scales with the number of keys: each group is independent,
    and skewed keys are bounded by events-per-key, not table size.
    """
    order_cols = list(order_cols)

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_cols, kind="mergesort")
        key = pdf[key_col].iloc[0]
        state = initial_state(key)
        for event in _iter_rows(pdf):
            state = handle_event(state, event)
        if state is None:
            return pd.DataFrame()
        return pd.DataFrame([state])

    ensure_shipped(events.sparkSession)
    return events.groupBy(key_col).applyInPandas(fold, schema=state_schema)


_NO_KEY = object()


def fold_events_sorted(
    events: DataFrame,
    key_col: str,
    order_cols: Sequence[str],
    handle_event: EventHandler,
    state_schema: str,
    initial_state: Callable[[Any], dict | None] = lambda key: None,
    flush_rows: int = 4096,
) -> DataFrame:
    """A1 fold with the same semantics as ``fold_events`` but ONE Python
    call per Arrow batch instead of one per key: repartition on the key,
    sortWithinPartitions(key, *order), then stream the sorted partition
    through ``mapInPandas`` carrying the running state across batch
    boundaries and emitting a state row on each key change.

    Why: ``applyInPandas`` pays per-GROUP overhead (a pandas frame build +
    Python call each); with many small aggregates (the event-sourcing
    shape — millions of keys, tens of events each) that overhead IS the
    runtime. The sorted-stream form amortizes it over whole Arrow batches:
    measured 3.7 s → ~1 s at sf0.1 (100k events / 1.5k keys) with
    identical output. The per-event ``handle_event`` calls — the genuinely
    sequential part — are unchanged.

    Correctness relies on repartition(key): a key's rows all land in one
    partition, and the within-partition sort makes them contiguous and
    ordered, so carrying state across Arrow batches reconstructs exactly
    the per-key fold. Skew bound is events-per-key, as before."""
    def step(acc: dict | None, event: dict) -> dict | None:
        return handle_event(acc, event)

    return _sorted_stream_fold(
        events, key_col, order_cols, initial_state, step,
        lambda acc: acc, state_schema, flush_rows,
    )


def _sorted_stream_fold(
    df: DataFrame,
    key_col: str,
    order_cols: Sequence[str],
    init: Callable[[Any], Any],
    step: Callable[[Any, dict], Any],
    finish: Callable[[Any], dict | None],
    schema: str,
    flush_rows: int = 4096,
) -> DataFrame:
    """Shared kernel for sorted-stream per-key folds: repartition(key) +
    sortWithinPartitions + one mapInPandas pass carrying the accumulator
    across Arrow batches; ``finish(acc)`` emits the key's output row (or
    None to emit nothing)."""
    order_cols = list(order_cols)

    def same_key(a: Any, b: Any) -> bool:
        if a is _NO_KEY or b is _NO_KEY:
            return False
        # null keys are one group (groupBy semantics); NaN != NaN otherwise
        if a is None or b is None:
            return a is None and b is None
        return a == b or (a != a and b != b)

    def fold_stream(batches):
        cur_key: Any = _NO_KEY
        acc: Any = None
        out: list[dict] = []
        for pdf in batches:
            for row in _iter_rows(pdf):
                k = row[key_col]
                if not same_key(k, cur_key):
                    if cur_key is not _NO_KEY:
                        done = finish(acc)
                        if done is not None:
                            out.append(done)
                            if len(out) >= flush_rows:
                                yield pd.DataFrame(out)
                                out = []
                    cur_key, acc = k, init(k)
                acc = step(acc, row)
        if cur_key is not _NO_KEY:
            done = finish(acc)
            if done is not None:
                out.append(done)
        if out:
            yield pd.DataFrame(out)

    ensure_shipped(df.sparkSession)
    # nulls LAST in the order columns: the per-group forms sort with pandas
    # sort_values, which places NaN/NaT last, while Spark's default is nulls
    # first — an order-dependent fold would diverge on null timestamps
    return (
        df.repartition(F.col(key_col))
        .sortWithinPartitions(
            F.col(key_col), *[F.col(c).asc_nulls_last() for c in order_cols]
        )
        .mapInPandas(fold_stream, schema=schema)
    )


def replay_commands(
    commands: DataFrame,
    key_col: str,
    order_cols: Sequence[str],
    process_command: CommandHandler,
    handle_event: EventHandler,
    state_schema: str,
) -> DataFrame:
    """U1+U2 batch replay: per key, feed commands through processCommand,
    apply emitted events via handleEvent. Rejected commands produce no events
    and no state change (PersistentActorSpec 'fail_processing' semantics).
    Emits one state row per key; the state dict may carry bookkeeping columns
    (e.g. n_rejected) as long as they appear in ``state_schema``."""
    order_cols = list(order_cols)

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_cols, kind="mergesort")
        state: dict | None = None
        n_rejected = 0
        n_events = 0
        for cmd in _iter_rows(pdf):
            events, rejected = process_command(state, cmd)
            if rejected:
                n_rejected += 1
                continue
            for event in events:
                state = handle_event(state, event)
                n_events += 1
        if state is None:
            return pd.DataFrame()
        out = dict(state)
        out.setdefault("n_rejected", n_rejected)
        out.setdefault("version", n_events)
        return pd.DataFrame([out])

    ensure_shipped(commands.sparkSession)
    return commands.groupBy(key_col).applyInPandas(fold, schema=state_schema)


def replay_commands_sorted(
    commands: DataFrame,
    key_col: str,
    order_cols: Sequence[str],
    process_command: CommandHandler,
    handle_event: EventHandler,
    state_schema: str,
) -> DataFrame:
    """``replay_commands`` on the sorted-stream kernel (one Python call per
    Arrow batch instead of per key — see ``fold_events_sorted`` for the
    measured rationale). Identical output, including the n_rejected /
    version bookkeeping defaults."""

    def init(key: Any):
        return (None, 0, 0)  # (state, n_rejected, n_events)

    def step(acc, cmd: dict):
        state, n_rejected, n_events = acc
        events, rejected = process_command(state, cmd)
        if rejected:
            return (state, n_rejected + 1, n_events)
        for event in events:
            state = handle_event(state, event)
            n_events += 1
        return (state, n_rejected, n_events)

    def finish(acc) -> dict | None:
        state, n_rejected, n_events = acc
        if state is None:
            return None
        out = dict(state)
        out.setdefault("n_rejected", n_rejected)
        out.setdefault("version", n_events)
        return out

    return _sorted_stream_fold(
        commands, key_col, order_cols, init, step, finish, state_schema
    )


def latest_per_key(df: DataFrame, key_cols: Sequence[str], order_cols: Sequence[str]) -> DataFrame:
    """A2: latest-record-per-key compaction (the KTable materialization,
    SurgeStateStoreConsumer.scala:57-76). max_by(struct) = one partial+final
    aggregate — no per-key sort, unlike the row_number formulation."""
    key_cols, order_cols = list(key_cols), list(order_cols)
    payload = [c for c in df.columns if c not in key_cols]
    agg = df.groupBy(*key_cols).agg(
        F.max_by(F.struct(*payload), F.struct(*order_cols)).alias("_latest")
    )
    return agg.select(*key_cols, *[F.col(f"_latest.{c}").alias(c) for c in payload])


# --------------------------------------------------------------------------
# Canonical fixture models (reference test domains, FIXTURES.md §1-§2)
# --------------------------------------------------------------------------

# CountAggregate (TestBoundedContext.scala:17-175) mapped onto the events
# table: purchase/signup increment, error decrements, click/view are no-ops
# that still bump the version (CreateNoOpEvent semantics).
COUNT_DELTAS = {"purchase": 1, "signup": 1, "error": -1, "click": 0, "view": 0}


def count_handle_event(state: dict | None, event: dict) -> dict:
    key = str(event["user_id"])
    if state is None:
        state = {"aggregate_id": key, "count": 0, "version": 0}
    delta = COUNT_DELTAS.get(event["event_type"], 0)
    return {
        "aggregate_id": state["aggregate_id"],
        "count": state["count"] + delta,
        "version": state["version"] + 1,
    }


COUNT_STATE_SCHEMA = "aggregate_id string, count int, version int"


# BankAccount (BankAccountCommandModel.scala:16-88) mapped onto events:
# signup = create_account, click = credit(value), purchase = debit(value).
# Debit > balance → InsufficientFunds rejection; credit/debit before create →
# AccountDoesNotExist rejection. Order-dependent → not SQL-expressible.
def bank_process_command(state: dict | None, cmd: dict) -> tuple[list[dict], bool]:
    kind = cmd["event_type"]
    amount = float(cmd["value"] or 0.0)
    if kind == "signup":
        if state is not None:  # create on existing account → no events, not rejected
            return [], False
        return [{"type": "created", "account": str(cmd["user_id"]), "amount": 0.0}], False
    if kind == "click":  # credit
        if state is None:
            return [], True  # AccountDoesNotExistException
        return [{"type": "updated", "amount": amount}], False
    if kind == "purchase":  # debit
        if state is None:
            return [], True
        if amount > state["balance"]:
            return [], True  # InsufficientFundsException
        return [{"type": "updated", "amount": -amount}], False
    return [], False  # view/error: no-op command


def bank_handle_event(state: dict | None, event: dict) -> dict:
    if event["type"] == "created":
        return {"account_number": event["account"], "balance": 0.0}
    assert state is not None
    return {
        "account_number": state["account_number"],
        "balance": round(state["balance"] + event["amount"], 10),
    }


BANK_STATE_SCHEMA = (
    "account_number string, balance double, n_rejected long, version long"
)


def holt_handle_event(state: dict | None, event: dict) -> dict:
    """Holt's linear (double exponential) smoothing, alpha=beta=0.5:
    level_t = a*x + (1-a)*(level+trend); trend_t = b*(level_t-level) +
    (1-b)*trend — the per-key ORDERED analytics fold (same kernel as the
    event-sourcing folds; forecasting is just a fold with float state).
    Seeded level=x_1, trend=0. Operation order matters: the DuckDB
    recursive-CTE oracle performs the identical float64 ops in the
    identical order, so the states agree bitwise until the final
    round(6)."""
    x = float(event["value"])
    if state is None:
        return {
            "aggregate_id": str(event["user_id"]),
            "level": x,
            "trend": 0.0,
            "n": 1,
        }
    level = 0.5 * x + 0.5 * (state["level"] + state["trend"])
    trend = 0.5 * (level - state["level"]) + 0.5 * state["trend"]
    return {
        "aggregate_id": state["aggregate_id"],
        "level": level,
        "trend": trend,
        "n": state["n"] + 1,
    }


HOLT_STATE_SCHEMA = "aggregate_id string, level double, trend double, n int"


HW_ALPHA, HW_BETA, HW_GAMMA, HW_PERIOD = 0.5, 0.3, 0.4, 7
# one-minus coefficients as LITERALS, never computed 1-x: float(1)-float(0.3)
# is 0.70000000000000007, NOT the double 0.7 that both engines parse from
# the literal — and DuckDB's decimal (1 - 0.3) converts to double(0.7),
# diverging from a Python kernel that computed 1-0.3 in float. Literal
# constants on BOTH sides are the only representation they agree on.
HW_OMA, HW_OMB, HW_OMG = 0.5, 0.7, 0.6


def holt_winters_handle_event(state: dict | None, event: dict) -> dict:
    """Additive Holt-Winters (triple exponential, weekly period 7) over a
    per-key ordered series — the seasonal upgrade of holt_handle_event:
    level tracks the deseasonalized signal, trend its slope, and seven
    seasonal offsets s0..s6 the weekly shape. Seeded level=x₁, trend=0,
    seasonals=0 (the fold LEARNS the shape in week one — any
    deterministic seed works because the oracle mirrors it exactly).
    Operation order is the contract (recursive-CTE oracle, bitwise
    until round-6): i = (n % 7) where n = observations so far;
    L' = α(x − sᵢ) + (1−α)(L + B); B' = β(L' − L) + (1−β)B;
    sᵢ' = γ(x − L') + (1−γ)sᵢ. The event dict carries the observation
    in ``cnt`` and the key in ``event_type``."""
    x = float(event["cnt"])
    if state is None:
        st = {
            "aggregate_id": str(event["event_type"]),
            "level": x,
            "trend": 0.0,
            "n": 1,
        }
        for k in range(HW_PERIOD):
            st[f"s{k}"] = 0.0
        return st
    i = state["n"] % HW_PERIOD
    si = state[f"s{i}"]
    level = HW_ALPHA * (x - si) + HW_OMA * (state["level"] + state["trend"])
    trend = HW_BETA * (level - state["level"]) + HW_OMB * state["trend"]
    out = dict(state)
    out["level"] = level
    out["trend"] = trend
    out[f"s{i}"] = HW_GAMMA * (x - level) + HW_OMG * si
    out["n"] = state["n"] + 1
    return out


HW_STATE_SCHEMA = (
    "aggregate_id string, level double, trend double, n long, "
    + ", ".join(f"s{k} double" for k in range(HW_PERIOD))
)


CUSUM_SLACK = 0.5
CUSUM_THRESHOLD = 5.0


def cusum_step(
    s_pos: float,
    s_neg: float,
    n_alarms: int,
    dev: float,
    slack: float = CUSUM_SLACK,
    threshold: float = CUSUM_THRESHOLD,
) -> tuple[float, float, int]:
    """One CUSUM update — THE shared kernel: the batch fold handler and
    streaming/metrics.cusum_stream both call this, so the pinned
    cross-mode bitwise equality cannot silently diverge."""
    s_pos = max(0.0, s_pos + dev - slack)
    s_neg = max(0.0, s_neg - dev - slack)
    if s_pos > threshold or s_neg > threshold:
        n_alarms += 1
        if s_pos > threshold:
            s_pos = 0.0
        if s_neg > threshold:
            s_neg = 0.0
    return s_pos, s_neg, n_alarms


def cusum_handle_event(state: dict | None, event: dict) -> dict:
    """Two-sided CUSUM drift detector (Page 1954) against a first-value
    baseline: s_pos accumulates upward deviations beyond the slack,
    s_neg downward; crossing h fires an alarm and resets that side —
    the sequential change-point fold (state is 4 floats, same ordered
    kernel as holt/bank). Baseline = the key's FIRST value so the fold
    needs no pre-pass; slack k=0.5, threshold h=5.0. The DuckDB
    recursive-CTE oracle performs the identical float64 ops in the
    identical order (greatest(0.0, ...) == max(0, ...))."""
    if state is None:
        return {
            "aggregate_id": str(event["user_id"]),
            "baseline": float(event["value"]),
            "s_pos": 0.0,
            "s_neg": 0.0,
            "n_alarms": 0,
            "n": 1,
        }
    x = float(event["value"])
    s_pos, s_neg, n_alarms = cusum_step(
        state["s_pos"], state["s_neg"], state["n_alarms"],
        x - state["baseline"],
    )
    return {
        "aggregate_id": state["aggregate_id"],
        "baseline": state["baseline"],
        "s_pos": s_pos,
        "s_neg": s_neg,
        "n_alarms": n_alarms,
        "n": state["n"] + 1,
    }


CUSUM_STATE_SCHEMA = (
    "aggregate_id string, baseline double, s_pos double, s_neg double,"
    " n_alarms int, n int"
)


# --- token-bucket rate limiter fold ---------------------------------------

TB_CAPACITY = 3
TB_REFILL_MS = 86_400_000  # one token per day


def token_bucket_step(
    tokens: int,
    anchor_ms: int,
    t_ms: int,
    capacity: int = TB_CAPACITY,
    refill_ms: int = TB_REFILL_MS,
) -> tuple[int, int, bool]:
    """One token-bucket update — ALL-INTEGER so a recursive-CTE oracle
    reproduces it exactly (the m_cohort_ltv integer-channel discipline):
    whole tokens accrued since the refill anchor are credited (the anchor
    advances only by whole-token strides, so fractional refill time is
    never lost to integer division); hitting capacity re-anchors at the
    event (a full bucket banks no time — the standard semantics); then
    the event consumes a token if one is available. Returns
    (tokens_after, anchor_after, allowed)."""
    add = (t_ms - anchor_ms) // refill_ms
    tokens = tokens + add
    if tokens >= capacity:
        tokens = capacity
        anchor_ms = t_ms
    else:
        anchor_ms = anchor_ms + add * refill_ms
    if tokens >= 1:
        return tokens - 1, anchor_ms, True
    return tokens, anchor_ms, False


def token_bucket_init(
    t_ms: int, capacity: int = TB_CAPACITY, refill_ms: int = TB_REFILL_MS
) -> tuple[int, int, bool]:
    """First-event initialization, expressed THROUGH the step kernel so
    batch and streaming cannot drift (the cusum kernel-duplication
    lesson): a fresh bucket is full and anchored at the event, then the
    event itself goes through token_bucket_step — for capacity >= 1 that
    is the familiar (capacity-1, t, allowed); for capacity == 0 the first
    event is correctly THROTTLED instead of banking a negative token.
    Returns (tokens_after, anchor_after, allowed)."""
    return token_bucket_step(capacity, t_ms, t_ms, capacity, refill_ms)


def token_bucket_handle_event(state: dict | None, event: dict) -> dict:
    """Per-key token-bucket rate limiting as an event fold (the admission
    decision every command gateway needs — R1's per-key serial order is
    exactly what makes a bucket fold correct): capacity TB_CAPACITY,
    one token per TB_REFILL_MS, bucket starts FULL and the first event
    consumes immediately. Event time arrives as the pre-projected
    integer ``ms`` column (unix_millis ≡ DuckDB epoch_ms — the
    m_burstiness channel), so no Timestamp conversion happens inside
    the handler."""
    t = int(event["ms"])
    if state is None:
        tokens, anchor, allowed = token_bucket_init(t)
        return {
            "aggregate_id": str(event["user_id"]),
            "tokens": tokens,
            "anchor_ms": anchor,
            "n_allowed": 1 if allowed else 0,
            "n_throttled": 0 if allowed else 1,
            "n": 1,
        }
    tokens, anchor, allowed = token_bucket_step(
        state["tokens"], state["anchor_ms"], t
    )
    return {
        "aggregate_id": state["aggregate_id"],
        "tokens": tokens,
        "anchor_ms": anchor,
        "n_allowed": state["n_allowed"] + (1 if allowed else 0),
        "n_throttled": state["n_throttled"] + (0 if allowed else 1),
        "n": state["n"] + 1,
    }


TOKEN_BUCKET_STATE_SCHEMA = (
    "aggregate_id string, tokens long, anchor_ms long, n_allowed long,"
    " n_throttled long, n long"
)


# --- Page-Hinkley drift fold ------------------------------------------------

PH_DELTA = 0.005
PH_LAMBDA = 50.0


def page_hinkley_step(
    n: int,
    s: float,
    m: float,
    m_min: float,
    n_alarms: int,
    x: float,
    delta: float = PH_DELTA,
    lam: float = PH_LAMBDA,
) -> tuple[int, float, float, float, int]:
    """One Page-Hinkley update (Page 1954's other test; Hinkley 1971):
    the upward-drift detector that tracks m_t = Σ(x_i − x̄_i − δ)
    against its running minimum and alarms when the gap exceeds λ —
    unlike CUSUM's fixed first-value baseline, the reference here is
    the RUNNING MEAN, so slow level changes are absorbed and only
    sustained drift beyond δ alarms. Float recurrence (the holt/cusum
    class): the batch oracle reproduces the identical float64 ops in
    the identical order via a recursive CTE. On alarm both m and its
    minimum reset to 0 (restart). Operation order is part of the
    contract: s += x first, mean = s/n, then m += ((x − mean) − δ)."""
    n += 1
    s = s + x
    mean = s / n
    m = m + ((x - mean) - delta)
    m_min = min(m_min, m)
    if m - m_min > lam:
        n_alarms += 1
        m = 0.0
        m_min = 0.0
    return n, s, m, m_min, n_alarms


def page_hinkley_handle_event(state: dict | None, event: dict) -> dict:
    """Per-key Page-Hinkley fold over the value channel — same sorted
    fold kernel as bank/holt/cusum/burn."""
    x = float(event["value"])
    if state is None:
        n, s, m, m_min, n_alarms = page_hinkley_step(0, 0.0, 0.0, 0.0, 0, x)
        return {
            "aggregate_id": str(event["user_id"]),
            "n": n,
            "s": s,
            "m": m,
            "m_min": m_min,
            "n_alarms": n_alarms,
        }
    n, s, m, m_min, n_alarms = page_hinkley_step(
        state["n"], state["s"], state["m"], state["m_min"],
        state["n_alarms"], x,
    )
    return {
        "aggregate_id": state["aggregate_id"],
        "n": n,
        "s": s,
        "m": m,
        "m_min": m_min,
        "n_alarms": n_alarms,
    }


PAGE_HINKLEY_STATE_SCHEMA = (
    "aggregate_id string, n long, s double, m double, m_min double,"
    " n_alarms long"
)


# --- error-budget burn-rate fold -------------------------------------------

BURN_WINDOW_MS = 86_400_000  # 1-day budget windows
BURN_BUDGET_PPM = 10_000  # 1% error budget (the m_error_budget_burn SLO)
BURN_FACTOR = 2  # alert when a closed window burned at >= 2x budget


def burn_rate_step(
    bucket: int,
    n_total: int,
    n_err: int,
    n_alarms: int,
    t_ms: int,
    is_err: int,
    window_ms: int = BURN_WINDOW_MS,
    budget_ppm: int = BURN_BUDGET_PPM,
    factor: int = BURN_FACTOR,
) -> tuple[int, int, int, int]:
    """One error-budget burn update — THE shared kernel (batch fold and
    streaming/metrics.burn_rate_stream both call it; the cusum
    kernel-duplication lesson). ALL-INTEGER: an event landing in a NEW
    time bucket first CLOSES the previous one — alarm iff its error rate
    exceeded ``factor`` times the budget, compared cross-multiplied as
    n_err * 1_000_000 > factor * budget_ppm * n_total so no float ever
    enters the channel — then counts itself into the fresh bucket. Only
    buckets that RECEIVED events are ever visited, and the key's last
    bucket stays open (never alarmed) until a later event closes it:
    both facts mirror declaratively in the batch oracle (closed == not
    the per-key max bucket). Returns (bucket, n_total, n_err,
    n_alarms)."""
    b = t_ms // window_ms
    if b != bucket:
        if n_err * 1_000_000 > factor * budget_ppm * n_total:
            n_alarms += 1
        bucket, n_total, n_err = b, 0, 0
    return bucket, n_total + 1, n_err + is_err, n_alarms


def burn_rate_init(
    t_ms: int,
    is_err: int,
    window_ms: int = BURN_WINDOW_MS,
    budget_ppm: int = BURN_BUDGET_PPM,
    factor: int = BURN_FACTOR,
) -> tuple[int, int, int, int]:
    """First-event initialization THROUGH the step kernel (the
    token_bucket_init discipline): the pre-state is an empty bucket
    already anchored at the event's own window, so no phantom close
    fires."""
    return burn_rate_step(
        t_ms // window_ms, 0, 0, 0, t_ms, is_err,
        window_ms, budget_ppm, factor,
    )


def burn_rate_handle_event(state: dict | None, event: dict) -> dict:
    """Per-key SRE error-budget burn monitor as an ordered event fold:
    1-day buckets, 1% budget, alarm on every CLOSED bucket that burned
    at >= 2x budget — the live-alerting shape of m_error_budget_burn's
    batch report, run on the SAME sorted-stream fold kernel as
    bank/holt/cusum/saga/token-bucket. Event time arrives as the
    pre-projected integer ``ms`` column (unix_millis ≡ epoch_ms)."""
    t = int(event["ms"])
    is_err = 1 if event["event_type"] == "error" else 0
    if state is None:
        bucket, n_total, n_err, n_alarms = burn_rate_init(t, is_err)
        n = 1
    else:
        bucket, n_total, n_err, n_alarms = burn_rate_step(
            state["bucket"], state["n_total"], state["n_err"],
            state["n_alarms"], t, is_err,
        )
        n = state["n"] + 1
    return {
        "aggregate_id": (
            str(event["user_id"]) if state is None else state["aggregate_id"]
        ),
        "bucket": bucket,
        "n_total": n_total,
        "n_err": n_err,
        "n_alarms": n_alarms,
        "n": n,
    }


BURN_RATE_STATE_SCHEMA = (
    "aggregate_id string, bucket long, n_total long, n_err long,"
    " n_alarms long, n long"
)


# --- multi-window multi-burn-rate page alerting (SRE workbook ch. 5) -------

MW_SHORT_MS = 86_400_000  # 1-day short window
MW_LONG_MS = 7 * 86_400_000  # 7-day long window


def multiwindow_burn_step(
    sb: int,
    s_total: int,
    s_err: int,
    lb: int,
    l_total: int,
    l_err: int,
    n_pages: int,
    t_ms: int,
    is_err: int,
    short_ms: int = MW_SHORT_MS,
    long_ms: int = MW_LONG_MS,
    budget_ppm: int = BURN_BUDGET_PPM,
    factor: int = BURN_FACTOR,
) -> tuple[int, int, int, int, int, int, int]:
    """One multi-window burn update — THE shared kernel for the seventh
    cross-mode twin (es_multiwindow_burn_fold / multiwindow_burn_stream,
    r14 VERDICT task 6): two bucket counters ride one state, and a PAGE
    fires only when a closing SHORT bucket burned > ``factor``× budget
    AND the long window's open counters at that same instant ALSO
    burned > ``factor``× — the both-hot AND rule of
    m_multiwindow_burn_alerts run live. Evaluation order is pinned and
    mirrored declaratively in the batch oracle: the short-close page
    decision reads the long counters BEFORE the long bucket rolls and
    before the triggering event is counted (oracle: lag of running
    per-bucket counters over the (ts, event_id) key order). ALL-INTEGER
    — cross-multiplied rates, no division. Returns (sb, s_total, s_err,
    lb, l_total, l_err, n_pages)."""
    bs = t_ms // short_ms
    bl = t_ms // long_ms
    if bs != sb:
        if (
            s_err * 1_000_000 > factor * budget_ppm * s_total
            and l_err * 1_000_000 > factor * budget_ppm * l_total
        ):
            n_pages += 1
        sb, s_total, s_err = bs, 0, 0
    if bl != lb:
        lb, l_total, l_err = bl, 0, 0
    return sb, s_total + 1, s_err + is_err, lb, l_total + 1, l_err + is_err, n_pages


def multiwindow_burn_init(
    t_ms: int,
    is_err: int,
    short_ms: int = MW_SHORT_MS,
    long_ms: int = MW_LONG_MS,
    budget_ppm: int = BURN_BUDGET_PPM,
    factor: int = BURN_FACTOR,
) -> tuple[int, int, int, int, int, int, int]:
    """First-event initialization THROUGH the step kernel (the
    token_bucket_init discipline): both pre-state buckets are empty and
    anchored at the event's own windows, so no phantom close or page."""
    return multiwindow_burn_step(
        t_ms // short_ms, 0, 0, t_ms // long_ms, 0, 0, 0, t_ms, is_err,
        short_ms, long_ms, budget_ppm, factor,
    )


def multiwindow_burn_handle_event(state: dict | None, event: dict) -> dict:
    """Per-key multi-window burn monitor as an ordered event fold — the
    batch half of cross-mode twin #7, on the same sorted-stream fold
    kernel as bank/holt/cusum/saga/token-bucket/burn/page-hinkley."""
    t = int(event["ms"])
    is_err = 1 if event["event_type"] == "error" else 0
    if state is None:
        st = multiwindow_burn_init(t, is_err)
        n = 1
        agg_id = str(event["user_id"])
    else:
        st = multiwindow_burn_step(
            state["short_bucket"], state["s_total"], state["s_err"],
            state["long_bucket"], state["l_total"], state["l_err"],
            state["n_pages"], t, is_err,
        )
        n = state["n"] + 1
        agg_id = state["aggregate_id"]
    sb, s_total, s_err, lb, l_total, l_err, n_pages = st
    return {
        "aggregate_id": agg_id,
        "short_bucket": sb,
        "s_total": s_total,
        "s_err": s_err,
        "long_bucket": lb,
        "l_total": l_total,
        "l_err": l_err,
        "n_pages": n_pages,
        "n": n,
    }


MW_BURN_STATE_SCHEMA = (
    "aggregate_id string, short_bucket long, s_total long, s_err long,"
    " long_bucket long, l_total long, l_err long, n_pages long, n long"
)


def saga_handle_event(state: dict | None, event: dict) -> dict:
    """Order-fulfillment SAGA fold with compensation — the long-running
    transaction pattern a CQRS command engine coordinates (surge's
    command model is the per-step executor; the saga is the cross-step
    state machine): ``view`` in idle STARTS a saga, ``click`` while
    in-flight is a progress step, ``purchase`` while in-flight COMPLETES
    it, ``error`` while in-flight COMPENSATES (rolls back to idle — the
    defining saga move: no global transaction, an explicit undo step
    instead), and any event that does not fit the current state is
    counted ignored, never applied (R1's per-key serial order is what
    makes the machine deterministic). ALL-INTEGER state, so the
    recursive-CTE oracle reproduces the fold exactly."""
    if state is None:
        state = {
            "aggregate_id": str(event["user_id"]),
            "st": 0,
            "n_started": 0,
            "n_completed": 0,
            "n_compensated": 0,
            "n_steps": 0,
            "n_ignored": 0,
            "n": 0,
        }
    else:
        state = dict(state)
    et = event["event_type"]
    st = state["st"]
    if et == "view" and st == 0:
        state["st"] = 1
        state["n_started"] += 1
    elif et == "click" and st == 1:
        state["n_steps"] += 1
    elif et == "purchase" and st == 1:
        state["st"] = 0
        state["n_completed"] += 1
    elif et == "error" and st == 1:
        state["st"] = 0
        state["n_compensated"] += 1
    else:
        state["n_ignored"] += 1
    state["n"] += 1
    return state


SAGA_STATE_SCHEMA = (
    "aggregate_id string, st int, n_started long, n_completed long,"
    " n_compensated long, n_steps long, n_ignored long, n long"
)


# --- SPRT sequential A/B decision fold (cross-mode twin #8) -----------------
# Wald's sequential probability ratio test for a Bernoulli error rate:
# H0 p0 = 5% vs H1 p1 = 15%, alpha = beta = 5%. Every constant is a
# PYTHON FLOAT LITERAL shared verbatim by the kernel, the Spark plan and
# the DuckDB oracle (repr round-trips; no in-engine ln() ever runs — the
# one-minus-literal invariant generalized: ALL transcendentals are
# precomputed literals).
import math as _math

SPRT_L_ERR = _math.log(0.15 / 0.05)  # llr increment on an error event
SPRT_L_OK = _math.log(0.85 / 0.95)  # llr increment on a clean event
SPRT_A = _math.log(19.0)  # accept-H1 (regression detected) threshold
SPRT_B = -_math.log(19.0)  # accept-H0 (healthy) threshold


def sprt_step(
    llr: float,
    n_detect: int,
    n_clear: int,
    t_ms: int,
    is_err: int,
) -> tuple[float, int, int]:
    """One SPRT update — THE shared kernel for cross-mode twin #8
    (es_sprt_fold / sprt_stream): add the event's literal llr
    increment, then decide — llr >= A accepts H1 (error-rate
    regression DETECTED, n_detect++), llr <= B accepts H0 (monitor
    CLEARS, n_clear++); either decision RESETS llr to 0.0 and the test
    restarts (the continuous-monitoring composition of Wald's test,
    the cusum reset shape). Float ops run in a fixed order so a
    recursive-CTE oracle and a streaming fold reproduce the double
    BITWISE. t_ms is unused by the math (kept for the fold-kernel
    signature discipline and future time-gated variants)."""
    llr = llr + (SPRT_L_ERR if is_err else SPRT_L_OK)
    if llr >= SPRT_A:
        return 0.0, n_detect + 1, n_clear
    if llr <= SPRT_B:
        return 0.0, n_detect, n_clear + 1
    return llr, n_detect, n_clear


def sprt_handle_event(state: dict | None, event: dict) -> dict:
    """Per-key SPRT monitor as an ordered event fold — the batch half
    of twin #8, on the same sorted-stream fold kernel as
    bank/holt/cusum/saga/token-bucket/burn/PH/multiwindow."""
    is_err = 1 if event["event_type"] == "error" else 0
    if state is None:
        llr, n_detect, n_clear = sprt_step(0.0, 0, 0, int(event["ms"]), is_err)
        n = 1
        agg_id = str(event["user_id"])
    else:
        llr, n_detect, n_clear = sprt_step(
            state["llr"], state["n_detect"], state["n_clear"],
            int(event["ms"]), is_err,
        )
        n = state["n"] + 1
        agg_id = state["aggregate_id"]
    return {
        "aggregate_id": agg_id,
        "llr": llr,
        "n_detect": n_detect,
        "n_clear": n_clear,
        "n": n,
    }


SPRT_STATE_SCHEMA = (
    "aggregate_id string, llr double, n_detect long, n_clear long, n long"
)


# --- Debounce / trailing rate-limit fold (cross-mode twin #9) ---------------
# Admit an event only when >= DEBOUNCE_GAP_MS has passed since the last
# ADMITTED event (not the last event — a suppressed burst never resets
# the clock, which is what distinguishes debounce from per-event
# throttling and makes the fold genuinely recursive). All-integer state,
# so the cross-mode pin is EXACT equality.

DEBOUNCE_GAP_MS = 60_000  # literal shared by kernel, Spark plan, oracle


def debounce_step(
    last_ms: int | None,
    n_accepted: int,
    n_suppressed: int,
    t_ms: int,
) -> tuple[int, int, int]:
    """One debounce update — THE shared kernel for cross-mode twin #9
    (es_debounce_fold / debounce_stream): the first event (last_ms is
    None) always admits; afterwards admit iff t_ms − last_ms >=
    DEBOUNCE_GAP_MS, and ONLY admissions advance last_ms. Integer
    arithmetic only."""
    if last_ms is None or t_ms - last_ms >= DEBOUNCE_GAP_MS:
        return t_ms, n_accepted + 1, n_suppressed
    return last_ms, n_accepted, n_suppressed + 1


def debounce_handle_event(state: dict | None, event: dict) -> dict:
    """Per-key debounce as an ordered event fold — the batch half of
    twin #9, on the same sorted-stream fold kernel as bank/holt/cusum/
    saga/token-bucket/burn/PH/multiwindow/SPRT."""
    t_ms = int(event["ms"])
    if state is None:
        last_ms, n_acc, n_sup = debounce_step(None, 0, 0, t_ms)
        n = 1
        agg_id = str(event["user_id"])
    else:
        last_ms, n_acc, n_sup = debounce_step(
            state["last_ms"], state["n_accepted"], state["n_suppressed"], t_ms
        )
        n = state["n"] + 1
        agg_id = state["aggregate_id"]
    return {
        "aggregate_id": agg_id,
        "last_ms": last_ms,
        "n_accepted": n_acc,
        "n_suppressed": n_sup,
        "n": n,
    }


DEBOUNCE_STATE_SCHEMA = (
    "aggregate_id string, last_ms long, n_accepted long,"
    " n_suppressed long, n long"
)


# --- Croston intermittent-demand fold ---------------------------------------
# Croston's method for sparse/intermittent series: separate EWMAs of the
# nonzero demand SIZE and of the inter-demand INTERVAL; forecast rate =
# size / interval. One-minus coefficient is a LITERAL (the HW_OM*
# invariant), never computed 1-x.
CROSTON_A = 0.2
CROSTON_OMA = 0.8


def croston_step(
    z: float, p: float, last_ms: int | None, t_ms: int, x: float
) -> tuple[float, float, int]:
    """One Croston update — THE shared kernel for cross-mode twin #10
    (m_croston_forecast / croston_stream): seeded z = x_1, p = 0.0 on
    the first point (last_ms None — no interval yet, the holt seed
    class); afterwards both EWMAs advance with literal 0.2/0.8
    coefficients in a fixed float-op order (bitwise-reproducible by
    the recursive-CTE oracle AND the streaming twin)."""
    if last_ms is None:
        return x, 0.0, t_ms
    i = float(t_ms - last_ms)
    z = CROSTON_A * x + CROSTON_OMA * z
    p = CROSTON_A * i + CROSTON_OMA * p
    return z, p, t_ms


def croston_handle_event(state: dict | None, event: dict) -> dict:
    """Per-key Croston fold over the ordered purchase stream (each
    purchase is a demand point; the interval channel is the exact
    integer ms gap, converted to float only at the EWMA) — the batch
    half of twin #10, routed THROUGH the one croston_step kernel (the
    cusum kernel-duplication lesson)."""
    x = float(event["value"])
    ms = int(event["ms"])
    if state is None:
        z, p, last_ms = croston_step(0.0, 0.0, None, ms, x)
        return {
            "aggregate_id": str(event["user_id"]),
            "z": z,
            "p": p,
            "last_ms": last_ms,
            "n": 1,
        }
    z, p, last_ms = croston_step(
        state["z"], state["p"], state["last_ms"], ms, x
    )
    return {
        "aggregate_id": state["aggregate_id"],
        "z": z,
        "p": p,
        "last_ms": last_ms,
        "n": state["n"] + 1,
    }


CROSTON_STATE_SCHEMA = (
    "aggregate_id string, z double, p double, last_ms long, n long"
)
