"""Facade API tests: the BankAccount golden scenario through the public
engine surface (send_command / get_state / apply_events), mirroring
BankAccountCommandEngineSpec.scala:34-79."""

from __future__ import annotations

import pytest

from surge_spark.engine import SurgeEngine, SurgeModel


def _bank_model() -> SurgeModel:
    def process(state, cmd):
        kind = cmd["command_type"]
        if kind == "create":
            if state is not None:
                return [], False
            return [{"etype": "created", "owner": cmd.get("owner", ""), "amount": 0.0}], False
        if state is None:
            return [], True
        if kind == "credit":
            return [{"etype": "updated", "owner": state["owner"], "amount": float(cmd["amount"])}], False
        if kind == "debit":
            if float(cmd["amount"]) > state["balance"]:
                return [], True
            return [{"etype": "updated", "owner": state["owner"], "amount": -float(cmd["amount"])}], False
        return [], False

    def handle(state, ev):
        if ev["etype"] == "created":
            return {"aggregate_id": ev["_key"], "owner": ev["owner"], "balance": 0.0}
        return {**state, "balance": state["balance"] + ev["amount"]}

    return SurgeModel(
        process_command=process,
        handle_event=handle,
        state_schema="aggregate_id string, owner string, balance double",
        event_schema="etype string, owner string, amount double, aggregate_id string",
        key_col="aggregate_id",
        order_cols=["command_id"],
    )


def test_bank_account_golden_flow(spark, tmp_path):
    model = _bank_model()

    # the handler needs the key at create time; the engine passes commands
    # through with the key column set — wire it via a wrapper
    inner = model.process_command

    def process_with_key(state, cmd):
        events, rejected = inner(state, cmd)
        for ev in events:
            ev["_key"] = cmd["aggregate_id"]
        return events, rejected

    model.process_command = process_with_key
    engine = SurgeEngine(spark, model, str(tmp_path / "bank_store"))
    acct = engine.aggregate_for("acct-1")

    assert acct.get_state() is None

    r = acct.send_command(command_type="create", owner="jo")
    assert r.is_success and r.state["balance"] == 0.0

    r = acct.send_command(command_type="credit", amount=100.0)
    assert r.is_success and r.state["balance"] == 100.0

    r = acct.send_command(command_type="debit", amount=500.0)
    assert r.status == "rejected"  # InsufficientFunds
    assert acct.get_state()["balance"] == 100.0  # rejection wrote nothing

    r = acct.send_command(command_type="debit", amount=30.0)
    assert r.is_success

    # read-your-writes through a fresh ref
    assert engine.aggregate_for("acct-1").get_state()["balance"] == 70.0

    # second aggregate is isolated
    assert engine.aggregate_for("acct-2").get_state() is None
    r = engine.aggregate_for("acct-2").send_command(command_type="credit", amount=5.0)
    assert r.status == "rejected"  # account does not exist


def test_submit_many_single_commit(spark, tmp_path):
    """submit_many folds a whole command list in ONE micro-batch / ONE
    store commit (the volume path send_command's docstring points to):
    results in submission order, per-aggregate ordering preserved (R1),
    rejection isolated per command."""
    model = _bank_model()
    inner = model.process_command

    def process_with_key(state, cmd):
        events, rejected = inner(state, cmd)
        for ev in events:
            ev["_key"] = cmd["aggregate_id"]
        return events, rejected

    model.process_command = process_with_key
    engine = SurgeEngine(spark, model, str(tmp_path / "many_store"))

    results = engine.submit_many(
        [
            ("m-1", {"command_type": "create", "owner": "jo", "amount": 0.0}),
            ("m-1", {"command_type": "credit", "owner": "", "amount": 100.0}),
            ("m-2", {"command_type": "create", "owner": "al", "amount": 0.0}),
            ("m-1", {"command_type": "debit", "owner": "", "amount": 500.0}),
            ("m-1", {"command_type": "debit", "owner": "", "amount": 30.0}),
            ("m-2", {"command_type": "credit", "owner": "", "amount": 7.0}),
        ]
    )
    assert [r.status for r in results] == [
        "success", "success", "success", "rejected", "success", "success",
    ]
    # exactly ONE commit for the whole batch
    assert engine._store.latest_version() == 0
    assert engine.aggregate_for("m-1").get_state()["balance"] == 70.0
    assert engine.aggregate_for("m-2").get_state()["balance"] == 7.0
    assert engine.submit_many([]) == []

    import pytest

    with pytest.raises(TypeError, match="field set"):
        engine.submit_many(
            [
                ("m-3", {"command_type": "create", "owner": "x", "amount": 0.0}),
                ("m-3", {"command_type": "credit", "amount": 1.0}),
            ]
        )


def test_apply_events_state_only_path(spark, tmp_path):
    model = _bank_model()
    engine = SurgeEngine(spark, model, str(tmp_path / "ev_store"))
    ref = engine.aggregate_for("acct-9")
    state = ref.apply_events(
        [
            {"etype": "created", "owner": "kim", "amount": 0.0, "_key": "acct-9"},
            {"etype": "updated", "owner": "kim", "amount": 42.0},
        ]
    )
    assert state["balance"] == 42.0
    assert ref.get_state()["balance"] == 42.0
    # applying an event that doesn't change state writes no new version
    v = engine._store.latest_version()
    ref.apply_events([])
    assert engine._store.latest_version() == v


def test_serde_roundtrip_json_and_custom(spark):
    """U6 pluggable serdes: JsonSerde lowers to all-JVM to_json/from_json;
    a custom binary codec round-trips via Arrow-batched mapInPandas. Both
    must reproduce the source frame exactly."""
    import pandas as pd

    from surge_spark.sources.serde import JsonSerde, Serde, decode_frame, encode_frame

    src = spark.createDataFrame(
        pd.DataFrame(
            {
                "aggregate_id": ["a1", "a2", "a3"],
                "balance": [10.5, 0.0, -3.25],
                "owner": ["x", "y", "z"],
            }
        )
    )
    schema = "aggregate_id string, balance double, owner string"

    def roundtrip(serde):
        enc = encode_frame(src, serde, "aggregate_id")
        assert enc.columns == ["key", "value"]
        out = decode_frame(enc, serde, schema).toPandas()
        return out.sort_values("aggregate_id").reset_index(drop=True)

    expect = src.toPandas().sort_values("aggregate_id").reset_index(drop=True)

    json_out = roundtrip(JsonSerde())
    pd.testing.assert_frame_equal(json_out[expect.columns], expect)

    # custom binary codec: reversed json bytes (stands in for protobuf/avro)
    import json as _json

    rev = Serde(
        encode=lambda d: _json.dumps(d, default=str).encode()[::-1],
        decode=lambda b: _json.loads(bytes(b)[::-1].decode()),
        name="reversed-json",
    )
    rev_out = roundtrip(rev)
    pd.testing.assert_frame_equal(rev_out[expect.columns], expect)

    # JVM fast path really is JVM-side: no Python eval nodes in the plan
    enc = encode_frame(src, JsonSerde(), "aggregate_id")
    plan = enc._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan


def test_multilanguage_gateway_bytes_roundtrip(spark, tmp_path):
    """U7 (§3.4): ForwardCommand/GetState over opaque-bytes payloads via an
    in-process BusinessLogicService — processCommand produces events, ONE
    handleEvents call computes the new state, rejection forwards the
    message, ids are validated (GenericAsyncAggregateCommandModel.scala)."""
    import json

    from surge_spark.streaming.multilanguage import (
        Event,
        HealthCheckReply,
        MultilanguageGateway,
        ProcessCommandReply,
        State,
    )
    from surge_spark.streaming.snapshot_store import SnapshotStore

    class CounterService:
        """Business app in 'another language': sees only bytes. he_calls in
        the state counts handle_events invocations — executor-side, so it
        must ride in the state to be observable from the test."""

        def process_command(self, aggregate_id, state, command):
            cmd = json.loads(command.payload)
            if cmd["op"] == "boom":
                return ProcessCommandReply(
                    aggregate_id, is_success=False, rejection_message="no way"
                )
            evs = tuple(
                Event(aggregate_id, json.dumps({"add": cmd["n"]}).encode())
                for _ in range(cmd.get("times", 1))
            )
            return ProcessCommandReply(aggregate_id, is_success=True, events=evs)

        async def handle_events(self, aggregate_id, state, events):
            prev = json.loads(state.payload) if state else {"total": 0, "he_calls": 0}
            total = prev["total"] + sum(json.loads(e.payload)["add"] for e in events)
            payload = {"total": total, "he_calls": prev["he_calls"] + 1}
            return State(aggregate_id, json.dumps(payload).encode())

        def health_check(self):
            return HealthCheckReply("counter-app", "UP")

    store = SnapshotStore(str(tmp_path / "ml_store"), key_col="aggregate_id")
    gw = MultilanguageGateway(store, CounterService())

    r = gw.forward_command(spark, "agg-1", json.dumps({"op": "add", "n": 5, "times": 2}).encode())
    assert r.is_success
    # he_calls == 1: BOTH events went through ONE handle_events call
    assert json.loads(r.new_state.payload) == {"total": 10, "he_calls": 1}
    assert [json.loads(e.payload) for e in r.logged_events] == [{"add": 5}, {"add": 5}]

    # second command folds on committed state (read-your-writes)
    r2 = gw.forward_command(spark, "agg-1", json.dumps({"op": "add", "n": 1}).encode())
    assert json.loads(r2.new_state.payload) == {"total": 11, "he_calls": 2}

    # rejection: nothing persists, message forwarded
    r3 = gw.forward_command(spark, "agg-1", json.dumps({"op": "boom"}).encode())
    assert not r3.is_success and r3.rejection_message == "no way"
    got = gw.get_state(spark, "agg-1")
    assert json.loads(got.state.payload) == {"total": 11, "he_calls": 2}

    # unknown aggregate: state is None
    assert gw.get_state(spark, "nobody").state is None
    assert gw.health_check().status == "UP"

    # event log stores the opaque payloads with their aggregate ids
    log = store.read_events(spark).collect()
    assert len(log) == 3
    assert {row.aggregate_id for row in log} == {"agg-1"}


def test_point_submit_collects_exactly_one_reply(spark, tmp_path):
    """VERDICT r4 #7: the interactive sendCommand path must materialize
    only the requesting command's reply on the driver, never sibling
    replies — asserted by counting rows through the filtered frame the
    facade collects (monkeypatched collect counter)."""
    from pyspark.sql.classic.dataframe import DataFrame

    model = SurgeModel(
        process_command=lambda s, c: ([{"aggregate_id": c["aggregate_id"]}], False),
        handle_event=lambda s, e: {
            "aggregate_id": e["aggregate_id"],
            "n": (s["n"] if s else 0) + 1,
        },
        state_schema="aggregate_id string, n long",
        event_schema="aggregate_id string",
    )
    engine = SurgeEngine(spark, model, str(tmp_path / "store"), fold_partitions=4)
    # several aggregates share the store; their replies live in the same
    # per-batch reply frame when batched — the point path must not sweep
    # them in
    engine.submit_many([(f"k{i}", {"kind": "seed"}) for i in range(8)])

    collected_sizes = []
    orig_collect = DataFrame.collect

    def counting_collect(self):
        rows = orig_collect(self)
        # reply rows only (command_id + status): the r10 driver-side fold
        # legitimately collects the batch's OWN command rows (one row on
        # this path) — the invariant under test is that sibling REPLIES
        # never materialize on the driver
        if rows and hasattr(rows[0], "command_id") and hasattr(rows[0], "status"):
            collected_sizes.append(len(rows))
        return rows

    DataFrame.collect = counting_collect
    try:
        r = engine.aggregate_for("k3").send_command(kind="bump")
    finally:
        DataFrame.collect = orig_collect
    assert r.is_success and r.state["n"] == 2
    # exactly one reply-frame collect, and it returned exactly one row
    assert collected_sizes == [1]


def test_submit_many_distributed_fold_at_scale(spark, tmp_path):
    """The salted-group distributed fold (r12 task 3) at a size that
    FORCES the distributed path (> driver_fold_max_rows): per-aggregate
    command order (R1) must hold inside one micro-batch even though one
    Arrow group now carries many key groups, the snapshot keys_hint
    filter must not lose any pre-existing state, and results come back
    in submission order. The order-sensitive handler makes any R1 break
    change final balances, not just counts."""
    model = _bank_model()
    inner = model.process_command

    def process_with_key(state, cmd):
        events, rejected = inner(state, cmd)
        for ev in events:
            ev["_key"] = cmd["aggregate_id"]
        return events, rejected

    model.process_command = process_with_key
    engine = SurgeEngine(spark, model, str(tmp_path / "scale_store"))

    # seed state for half the keys in a FIRST commit, so the second
    # batch's fold join must fetch them through the keys_hint-filtered
    # latest-wins read
    n_keys = 41
    seeded = engine.submit_many(
        [
            (f"k{i}", {"command_type": "create", "owner": "o", "amount": 0.0})
            for i in range(0, n_keys, 2)
        ]
    )
    assert all(r.is_success for r in seeded)

    cmds = []
    expected: dict[str, float] = {f"k{i}": 0.0 for i in range(0, n_keys, 2)}
    for j in range(600):
        k = f"k{j % n_keys}"
        if k not in expected:
            cmds.append((k, {"command_type": "create", "owner": "o", "amount": 0.0}))
            expected[k] = 0.0
        else:
            # alternate credit/debit so order matters: a debit before its
            # covering credit is rejected and changes the final balance
            if j % 2 == 0:
                cmds.append((k, {"command_type": "credit", "owner": "", "amount": 10.0}))
                expected[k] += 10.0
            else:
                amt = expected[k] + 5.0  # more than current => rejected
                cmds.append((k, {"command_type": "debit", "owner": "", "amount": amt}))
    assert len(cmds) > engine._engine.driver_fold_max_rows
    results = engine.submit_many(cmds)
    assert len(results) == len(cmds)
    statuses = {r.status for r in results}
    assert statuses <= {"success", "rejected"}
    assert any(r.status == "rejected" for r in results)
    for k, bal in expected.items():
        assert engine.aggregate_for(k).get_state()["balance"] == bal, k


@pytest.mark.slow  # r16 fast-tier split (>10 s; see pytest.ini)
def test_salted_fold_preserves_long_state_in_mixed_buckets(spark, tmp_path):
    """Review-finding regression: the salted fold's Arrow bucket mixes
    keys, so a stateless key's left-join NULLs promote a LONG state
    column to float64 for the WHOLE bucket — without the per-key dtype
    restore the stateful key's handler sees n=5.0, emits 6.0, and
    from_json('n long') parses the float token to NULL (silent state
    corruption). One seeded key among 200 stateless keys shares a salt
    bucket with a stateless key with overwhelming probability; the
    committed state must come back as the exact integer."""
    from surge_spark.engine import SurgeEngine, SurgeModel

    def process(state, cmd):
        return ([{"aggregate_id": cmd["aggregate_id"]}], False)

    def handle(state, ev):
        return {
            "aggregate_id": ev["aggregate_id"],
            "n": (state["n"] if state else 0) + 1,
        }

    engine = SurgeEngine(
        spark,
        SurgeModel(
            process_command=process,
            handle_event=handle,
            state_schema="aggregate_id string, n long",
            event_schema="aggregate_id string",
        ),
        str(tmp_path / "mixed_store"),
        fold_partitions=1,
    )
    # seed k0 with n=5 in its own commit
    for _ in range(5):
        assert engine.submit_many([("k0", {"kind": "bump"})])[0].is_success
    assert engine.aggregate_for("k0").get_state()["n"] == 5
    # force the DISTRIBUTED fold for the mixed batch
    engine._engine.driver_fold_max_rows = 0
    res = engine.submit_many(
        [("k0", {"kind": "bump"})]
        + [(f"fresh-{i}", {"kind": "bump"}) for i in range(200)]
    )
    assert all(r.is_success for r in res)
    got = engine.aggregate_for("k0").get_state()
    assert got is not None and got["n"] == 6, got
    assert engine.aggregate_for("fresh-7").get_state()["n"] == 1


@pytest.mark.slow  # r16 fast-tier split (>10 s; see pytest.ini)
def test_keys_hint_escapes_backslashes_and_quotes(spark, tmp_path):
    """Review-finding regression: keys_hint renders as a parsed IN string;
    an unescaped backslash in a key changes the literal under Spark's
    lexer and silently prunes the key's REAL state out of the fold join
    (state=None, overwritten). Keys with backslashes and quotes must
    fold against their existing state through the distributed path."""
    from surge_spark.engine import SurgeEngine, SurgeModel

    def process(state, cmd):
        return ([{"aggregate_id": cmd["aggregate_id"]}], False)

    def handle(state, ev):
        return {
            "aggregate_id": ev["aggregate_id"],
            "n": (state["n"] if state else 0) + 1,
        }

    engine = SurgeEngine(
        spark,
        SurgeModel(
            process_command=process,
            handle_event=handle,
            state_schema="aggregate_id string, n long",
            event_schema="aggregate_id string",
        ),
        str(tmp_path / "esc_store"),
        fold_partitions=1,
    )
    nasty = ["a\\b", "it's", "both\\'mixed", "plain"]
    for k in nasty:
        assert engine.submit_many([(k, {"kind": "bump"})])[0].is_success
    engine._engine.driver_fold_max_rows = 0  # force the distributed fold
    res = engine.submit_many([(k, {"kind": "bump"}) for k in nasty])
    assert all(r.is_success for r in res)
    for k in nasty:
        got = engine.aggregate_for(k).get_state()
        assert got is not None and got["n"] == 2, (k, got)
