"""Facade API tests: the BankAccount golden scenario through the public
engine surface (send_command / get_state / apply_events), mirroring
BankAccountCommandEngineSpec.scala:34-79."""

from __future__ import annotations

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
