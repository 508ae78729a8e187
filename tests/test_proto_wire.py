"""proto3 wire-format codec: golden bytes (hand-assembled from the proto3
spec against the reference's field numbers, multilanguage-protocol.proto:7-80)
and round-trips, including proto3 default-omission and unknown-field
tolerance."""

from __future__ import annotations

from surge_spark.streaming import proto_wire as pw


def test_varint_golden_and_roundtrip():
    assert pw.encode_varint(0) == b"\x00"
    assert pw.encode_varint(1) == b"\x01"
    assert pw.encode_varint(127) == b"\x7f"
    assert pw.encode_varint(128) == b"\x80\x01"
    assert pw.encode_varint(300) == b"\xac\x02"  # the spec's own example
    for n in (0, 1, 127, 128, 300, 2**32, 2**63 - 1):
        v, pos = pw.decode_varint(pw.encode_varint(n), 0)
        assert (v, pos) == (n, len(pw.encode_varint(n)))


def test_state_golden_bytes():
    # State{aggregateId: "a1", payload: 0x0102}
    # f1 string: tag 0x0A, len 2, "a1"; f2 bytes: tag 0x12, len 2, 01 02
    assert pw.encode_kv("a1", b"\x01\x02") == b"\x0a\x02a1\x12\x02\x01\x02"
    # proto3 default omission: empty payload/id not serialized
    assert pw.encode_kv("a1", b"") == b"\x0a\x02a1"
    assert pw.encode_kv("", b"") == b""
    assert pw.decode_kv(b"\x0a\x02a1\x12\x02\x01\x02") == ("a1", b"\x01\x02")


def test_process_command_request_golden_bytes():
    state = pw.encode_kv("a1", b"\x01\x02")  # 8 bytes
    command = pw.encode_kv("a1", b"c")  # 0a 02 61 31 12 01 63 = 7 bytes
    buf = pw.encode_process_command_request("a1", state, command)
    expected = (
        b"\x0a\x02a1"  # f1 aggregateId
        + b"\x12\x08" + state  # f2 State sub-message
        + b"\x1a\x07" + command  # f3 Command sub-message
    )
    assert buf == expected
    agg, st, cmd = pw.decode_process_command_request(buf)
    assert (agg, st, cmd) == ("a1", state, command)
    # optional state omitted entirely when None
    assert pw.decode_process_command_request(
        pw.encode_process_command_request("a1", None, command)
    ) == ("a1", None, command)


def test_process_command_reply_golden_bytes():
    ev = pw.encode_kv("a1", b"e")  # 7 bytes
    buf = pw.encode_process_command_reply("a1", True, "", [ev, ev])
    expected = (
        b"\x0a\x02a1"  # f1
        + b"\x10\x01"  # f2 isSuccess=true (varint)
        + b"\x22\x07" + ev  # f4 repeated Event
        + b"\x22\x07" + ev
    )
    assert buf == expected
    agg, ok, rej, events, ns = pw.decode_process_command_reply(buf)
    assert (agg, ok, rej, events, ns) == ("a1", True, "", [ev, ev], None)
    # rejection path: isSuccess=false omitted (proto3 default), message set
    buf2 = pw.encode_process_command_reply("a1", False, "no", [])
    assert buf2 == b"\x0a\x02a1" + b"\x1a\x02no"
    assert pw.decode_process_command_reply(buf2)[1:3] == (False, "no")


def test_handle_events_and_health_golden():
    ev = pw.encode_kv("k", b"\x05")
    buf = pw.encode_handle_events_request("k", None, [ev])
    assert buf == b"\x0a\x01k" + b"\x1a\x06" + ev
    assert pw.decode_handle_events_request(buf) == ("k", None, [ev])

    # HealthCheckReply{serviceName: "s", status: UP} — UP=0 omitted
    assert pw.encode_health_check_reply("s", pw.HEALTH_UP) == b"\x0a\x01s"
    assert pw.encode_health_check_reply("s", pw.HEALTH_DOWN) == b"\x0a\x01s\x10\x01"
    assert pw.decode_health_check_reply(b"\x0a\x01s\x10\x01") == ("s", 1)


def test_get_state_request_reply_golden():
    """The gateway-service GetState pair (proto:62-68) — in-process today
    (MultilanguageGateway), but the codec ships the full proto surface."""
    assert pw.encode_get_state_request("a1") == b"\x0a\x02a1"
    assert pw.decode_get_state_request(b"\x0a\x02a1") == "a1"
    state = pw.encode_kv("a1", b"\x07")
    buf = pw.encode_get_state_reply("a1", state)
    assert buf == b"\x0a\x02a1" + b"\x12\x07" + state
    assert pw.decode_get_state_reply(buf) == ("a1", state)
    # absent state (key never written): field 2 omitted entirely
    assert pw.decode_get_state_reply(pw.encode_get_state_reply("a1", None)) == (
        "a1",
        None,
    )


def test_unknown_fields_skipped():
    """A newer peer adding fields must not break this decoder (proto3
    forward compatibility): unknown varint and length-delimited fields are
    carried past."""
    base = pw.encode_kv("a1", b"\x01")
    # append unknown field 9 (varint) and field 10 (length-delimited)
    extra = b"\x48\x2a" + b"\x52\x03xyz"
    assert pw.decode_kv(base + extra) == ("a1", b"\x01")


def test_roundtrip_against_protobuf_if_available():
    """When the official protobuf runtime is importable, cross-check our
    bytes against a dynamically built descriptor of the reference's State
    message — a true independent implementation comparison."""
    try:
        from google.protobuf import descriptor_pb2, descriptor_pool, message_factory
    except Exception:  # pragma: no cover - env without protobuf
        import pytest

        pytest.skip("protobuf runtime not installed")
    fdp = descriptor_pb2.FileDescriptorProto()
    fdp.name = "t.proto"
    fdp.syntax = "proto3"
    m = fdp.message_type.add()
    m.name = "State"
    f1 = m.field.add()
    f1.name, f1.number, f1.type, f1.label = "aggregateId", 1, 9, 1  # string
    f2 = m.field.add()
    f2.name, f2.number, f2.type, f2.label = "payload", 2, 12, 1  # bytes
    pool = descriptor_pool.DescriptorPool()
    pool.Add(fdp)
    cls = message_factory.GetMessageClass(pool.FindMessageTypeByName("State"))
    msg = cls(aggregateId="a1", payload=b"\x01\x02")
    assert msg.SerializeToString() == pw.encode_kv("a1", b"\x01\x02")
    parsed = cls.FromString(pw.encode_kv("xyz", b"\x09"))
    assert (parsed.aggregateId, parsed.payload) == ("xyz", b"\x09")
