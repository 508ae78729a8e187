"""Executable Kafka-surface semantics on the file-backed topic log double:
offset-bounded reads (S5), key-routed produce with contiguous offsets (S6),
compacted state table with tombstones (S1), consumer lag (S9), and
throttled micro-batch planning (W7)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from surge_spark.sources import filelog


def _records(spark, pairs):
    return spark.createDataFrame(
        [(k.encode(), v.encode() if v is not None else None) for k, v in pairs],
        "key binary, value binary",
    )


@pytest.fixture()
def topic(tmp_path):
    return str(tmp_path / "topic-a")


def test_produce_assigns_contiguous_offsets_per_partition(spark, topic):
    filelog.produce(
        _records(spark, [(f"k{i}", f"v{i}") for i in range(40)]), topic, n_partitions=4
    )
    df = filelog.read(spark, topic).toPandas()
    assert len(df) == 40
    assert set(df["partition"].unique()) <= {0, 1, 2, 3}
    for p, grp in df.groupby("partition"):
        offs = sorted(grp["offset"])
        assert offs == list(range(len(offs)))  # contiguous from 0


def test_produce_continues_offsets_across_calls(spark, topic):
    filelog.produce(
        _records(spark, [(f"k{i}", "a") for i in range(20)]), topic, n_partitions=2
    )
    first_end = filelog.end_offsets(spark, topic)
    filelog.produce(
        _records(spark, [(f"k{i}", "b") for i in range(20)]), topic, n_partitions=2
    )
    df = filelog.read(spark, topic).toPandas()
    assert len(df) == 40
    for p, grp in df.groupby("partition"):
        offs = sorted(grp["offset"])
        assert offs == list(range(len(offs)))  # still contiguous after append
        assert len(offs) == 2 * first_end[p]  # same keys → same routing


def test_same_key_routes_to_same_partition(spark, topic):
    filelog.produce(
        _records(spark, [("user-1", "a"), ("user-1", "b"), ("user-1", "c")]),
        topic,
        n_partitions=8,
    )
    df = filelog.read(spark, topic).toPandas()
    assert df["partition"].nunique() == 1


def test_offset_bounded_read(spark, topic):
    filelog.produce(
        _records(spark, [(f"k{i}", f"v{i}") for i in range(30)]), topic, n_partitions=1
    )
    out = filelog.read(
        spark, topic, starting_offsets={0: 10}, ending_offsets={0: 20}
    ).toPandas()
    assert sorted(out["offset"]) == list(range(10, 20))


def test_state_table_tombstones_delete_keys(spark, topic):
    filelog.produce(_records(spark, [("a", "1"), ("b", "1")]), topic, n_partitions=2)
    filelog.produce(_records(spark, [("a", "2"), ("b", None)]), topic, n_partitions=2)
    state = filelog.state_table(spark, topic).toPandas()
    got = {bytes(r["key"]).decode(): bytes(r["value"]).decode() for _, r in state.iterrows()}
    assert got == {"a": "2"}  # b tombstoned, a compacted to latest


def test_lag_and_end_offsets(spark, topic):
    filelog.produce(
        _records(spark, [(f"k{i}", "x") for i in range(10)]), topic, n_partitions=2
    )
    ends = filelog.end_offsets(spark, topic)
    assert sum(ends.values()) == 10
    assert filelog.lag(spark, topic, committed=dict(ends)) == {p: 0 for p in ends}
    behind = filelog.lag(spark, topic, committed={p: 0 for p in ends})
    assert behind == ends


def test_batch_id_header_supports_replay_dedup(spark, topic):
    batch = _records(spark, [("a", "1"), ("b", "2")])
    filelog.produce(batch, topic, n_partitions=1, batch_id="batch-7")
    filelog.produce(batch, topic, n_partitions=1, batch_id="batch-7")  # replay
    df = filelog.read(spark, topic)
    deduped = df.withColumn(
        "bid", F.element_at("headers", "batch_id").cast("string")
    ).dropDuplicates(["key", "value", "bid"])
    assert df.count() == 4 and deduped.count() == 2


def test_offset_chunks_respect_throttle():
    chunks = filelog.offset_chunks({0: 0, 1: 0}, {0: 5, 1: 3}, max_offsets=4)
    assert chunks[0][0] == {0: 0, 1: 0}
    # every chunk moves at most 4 offsets in total and they compose to the end
    prev_end = None
    total = 0
    for start, end in chunks:
        if prev_end is not None:
            assert start == prev_end
        moved = sum(end[p] - start[p] for p in end)
        assert 0 < moved <= 4
        total += moved
        prev_end = end
    assert prev_end == {0: 5, 1: 3} and total == 8


def test_offset_chunks_reject_nonpositive_budget():
    """max_offsets < 1 would loop forever appending empty no-progress
    chunks — it must fail fast instead."""
    import pytest

    for bad in (0, -1):
        with pytest.raises(ValueError):
            filelog.offset_chunks({0: 0}, {0: 5}, max_offsets=bad)


def test_bounded_read_prunes_partitions(spark, topic):
    """Partition bounds must prune at the scan: reading partition 0's range
    only should not list partition 1's files (hive-partition pruning)."""
    filelog.produce(
        _records(spark, [(f"k{i}", "x") for i in range(40)]), topic, n_partitions=4
    )
    df = filelog.read(spark, topic, starting_offsets={0: 0}, ending_offsets={0: 100})
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "partition#" in plan
    assert df.count() == filelog.read(spark, topic).where("partition = 0").count()


def test_engine_events_egress_and_ktable_rebuild(spark, tmp_path):
    """The full surge loop on the topic double: commands → engine →
    events egressed to a key-partitioned topic (S6) → KTable-style rebuild
    from the log (S1) reproduces the snapshot store's state exactly — the
    event-sourcing invariant (state ≡ fold(event log)) across the engine
    AND the topic layer."""
    import json

    from surge_spark.operators import eventsourcing as es
    from surge_spark.streaming.command_engine import CommandEngine
    from surge_spark.streaming.snapshot_store import SnapshotStore

    store = SnapshotStore(str(tmp_path / "store"), key_col="account_number")

    def handle(state, ev):
        s = es.bank_handle_event(state, ev)
        return {"account_number": s["account_number"], "balance": s["balance"]}

    engine = CommandEngine(
        store,
        process_command=es.bank_process_command,
        handle_event=handle,
        state_schema="account_number string, balance double",
        event_schema="type string, account string, amount double, account_number string",
        key_col="user_id",
        order_cols=["ts", "event_id"],
    )
    import datetime

    def _ts(s):
        return datetime.datetime(2024, 1, 1, 0, 0, s)

    schema = (
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, command_id string"
    )
    topic = str(tmp_path / "events-topic")
    for bid, rows in (
        ("b1", [(1, _ts(1), 7, "signup", 0.0, "c1"), (2, _ts(2), 7, "click", 60.0, "c2")]),
        ("b2", [(3, _ts(3), 8, "signup", 0.0, "c3"), (4, _ts(4), 7, "purchase", 25.0, "c4")]),
    ):
        out = engine.process_batch(spark.createDataFrame(rows, schema), bid)
        assert out is not None
        _, events_df, _ = out
        # S6 egress: key = aggregate id, value = event JSON; send order =
        # creation before mutation (the producer's order, preserved per
        # partition as Kafka does)
        filelog.produce(
            events_df.select(
                F.col("account_number").cast("binary").alias("key"),
                F.to_json(F.struct(*events_df.columns)).cast("binary").alias("value"),
                F.when(F.col("type") == "created", 0).otherwise(1).alias("seq"),
            ),
            topic,
            n_partitions=4,
            batch_id=bid,
            order_by=[F.col("seq")],
        )

    # S1 rebuild: fold the event log per key in (partition, offset) order
    log = filelog.read(spark, topic).orderBy("partition", "offset").collect()
    rebuilt: dict[str, dict | None] = {}
    for r in log:
        ev = json.loads(bytes(r["value"]).decode())
        k = bytes(r["key"]).decode()
        rebuilt[k] = handle(rebuilt.get(k), ev)

    for k, want in rebuilt.items():
        got = store.get_state(spark, k)
        assert got is not None and abs(got["balance"] - want["balance"]) < 1e-9
    assert store.get_state(spark, "7")["balance"] == 35.0
    assert store.get_state(spark, "8")["balance"] == 0.0


def test_offset_chunks_cover_partitions_missing_from_start():
    """A partition present in end but absent from start begins at 0 —
    previously its early records were skipped by the first chunk."""
    chunks = filelog.offset_chunks({0: 0}, {0: 5, 1: 3}, max_offsets=4)
    assert chunks[0][0] == {0: 0, 1: 0}
    assert chunks[-1][1] == {0: 5, 1: 3}
    assert sum(e[p] - s[p] for s, e in chunks for p in e) == 8


def test_end_offsets_sidecar_fast_path_and_fallback(spark, topic):
    """produce() maintains the _end_offsets.json sidecar so log-end lookup
    is O(1) instead of a full log scan (broker-metadata style); deleting
    the sidecar (crash between invalidate and rewrite, or legacy layout)
    falls back to the scan with the same answer, and the next produce
    restores it."""
    import os

    filelog.produce(
        _records(spark, [(f"k{i}", "x") for i in range(10)]), topic, n_partitions=2
    )
    sidecar = os.path.join(topic, "_end_offsets.json")
    assert os.path.isfile(sidecar)
    fast = filelog.end_offsets(spark, topic)
    os.remove(sidecar)
    scanned = filelog.end_offsets(spark, topic)
    assert fast == scanned and sum(fast.values()) == 10
    filelog.produce(
        _records(spark, [(f"k{i}", "y") for i in range(10)]), topic, n_partitions=2
    )
    assert os.path.isfile(sidecar)  # restored
    assert sum(filelog.end_offsets(spark, topic).values()) == 20


def test_stream_consumes_produced_batches(spark, topic, tmp_path):
    """Streaming read of the topic log: records produced before the start
    arrive in the first batch; a produce during the run is picked up by a
    later trigger (file-source discovery)."""
    filelog.produce(_records(spark, [("a", "1"), ("b", "2")]), topic, n_partitions=2)
    seen: list[int] = []
    q = (
        filelog.stream(spark, topic, max_files_per_trigger=4)
        .writeStream.outputMode("append")
        .foreachBatch(lambda df, bid: seen.append(df.count()))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="1 seconds")
        .start()
    )
    try:
        import time

        deadline = time.time() + 30
        while sum(seen) < 2 and time.time() < deadline:
            time.sleep(0.5)
        assert sum(seen) == 2
        filelog.produce(_records(spark, [("c", "3")]), topic, n_partitions=2)
        deadline = time.time() + 30
        while sum(seen) < 3 and time.time() < deadline:
            time.sleep(0.5)
        assert sum(seen) == 3
    finally:
        q.stop()
