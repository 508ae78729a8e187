"""U7 loopback wire: the proto-shaped protocol running CROSS-PROCESS over
the stdlib JSON-framed socket transport — the part of the reference's gRPC
multilanguage story this environment permits (no grpcio). The child process
hosts the business logic; the engine's distributed fold dials out to it per
command, exactly like the reference engine calling a business app
(multilanguage-protocol.proto:88-92)."""

from __future__ import annotations

import json
import subprocess
import sys
import threading
from pathlib import Path

import surge_spark
from surge_spark.streaming import multilanguage as ml
from surge_spark.streaming.snapshot_store import SnapshotStore

REPO = str(Path(surge_spark.__file__).resolve().parents[1])

CHILD_SRC = '''
import json, sys
sys.path.insert(0, {repo!r})
from surge_spark.streaming import multilanguage as ml


class CounterService:
    """Business logic living in ITS OWN process: counts via events."""

    def process_command(self, aggregate_id, state, command):
        cmd = json.loads(command.payload.decode())
        if cmd.get("op") == "bad":
            return ml.ProcessCommandReply(aggregate_id, False, "bad op")
        ev = ml.Event(aggregate_id, json.dumps({{"add": cmd["n"]}}).encode())
        return ml.ProcessCommandReply(aggregate_id, True, "", (ev,))

    def handle_events(self, aggregate_id, state, events):
        count = json.loads(state.payload.decode())["count"] if state else 0
        for e in events:
            count += json.loads(e.payload.decode())["add"]
        return ml.State(aggregate_id, json.dumps({{"count": count}}).encode())

    def health_check(self):
        return ml.HealthCheckReply("counter-svc", "UP")


srv = ml.serve_business_logic(CounterService())
print(srv.server_address[1], flush=True)
srv.serve_forever()
'''


def test_cross_process_business_logic_wire(spark, tmp_path):
    """A command forwarded through the gateway drives ProcessCommand and
    HandleEvents in a CHILD process and commits the resulting state/events;
    GetState reads it back; HealthCheck follows the child's liveness."""
    script = tmp_path / "svc.py"
    script.write_text(CHILD_SRC.format(repo=REPO))
    proc = subprocess.Popen(
        [sys.executable, str(script)], stdout=subprocess.PIPE, text=True
    )
    try:
        port = int(proc.stdout.readline())
        client = ml.RemoteBusinessLogicClient("127.0.0.1", port)
        store = SnapshotStore(str(tmp_path / "store"), key_col="aggregate_id")
        gw = ml.MultilanguageGateway(store, client)

        r1 = gw.forward_command(spark, "a-1", json.dumps({"op": "add", "n": 5}).encode())
        assert r1.is_success
        assert json.loads(r1.new_state.payload) == {"count": 5}

        r2 = gw.forward_command(spark, "a-1", json.dumps({"op": "add", "n": 3}).encode())
        assert r2.is_success
        assert json.loads(r2.new_state.payload) == {"count": 8}
        assert [json.loads(e.payload) for e in r2.logged_events] == [{"add": 3}]

        bad = gw.forward_command(spark, "a-1", json.dumps({"op": "bad"}).encode())
        assert not bad.is_success
        assert "bad op" in bad.rejection_message
        # rejection persisted nothing
        st = gw.get_state(spark, "a-1")
        assert json.loads(st.state.payload) == {"count": 8}

        assert gw.health_check().status == "UP"
    finally:
        proc.terminate()
        proc.wait(timeout=10)
    # child gone -> gateway reports DOWN (reference gateway health-checks
    # its business app the same way)
    assert gw.health_check().status == "DOWN"


class _AsyncEchoService:
    """In-process service used over the wire: async methods + failure."""

    async def process_command(self, aggregate_id, state, command):
        if command.payload == b"boom":
            raise RuntimeError("handler exploded")
        return ml.ProcessCommandReply(
            aggregate_id, True, "", (ml.Event(aggregate_id, command.payload),)
        )

    async def handle_events(self, aggregate_id, state, events):
        return ml.State(aggregate_id, b"|".join(e.payload for e in events))

    async def health_check(self):
        return ml.HealthCheckReply("echo", "UP")


def test_wire_supports_async_services_and_propagates_errors(tmp_path):
    """Direct client↔server parity: async service methods are awaited
    server-side, bytes round-trip exactly, and a handler exception becomes
    a client-side RuntimeError (failing the command, not the transport)."""
    import pytest

    srv = ml.serve_business_logic(_AsyncEchoService())
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        client = ml.RemoteBusinessLogicClient("127.0.0.1", srv.server_address[1])
        payload = bytes(range(256))  # every byte value survives b64 framing
        r = client.process_command("k", None, ml.Command("k", payload))
        assert r.is_success and r.events[0].payload == payload
        s = client.handle_events(
            "k", ml.State("k", b"old"), [ml.Event("k", b"a"), ml.Event("k", b"b")]
        )
        assert s.payload == b"a|b"
        assert client.health_check().status == "UP"
        with pytest.raises(RuntimeError, match="handler exploded"):
            client.process_command("k", None, ml.Command("k", b"boom"))
    finally:
        srv.shutdown()
        srv.server_close()
