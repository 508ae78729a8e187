"""Skew helpers, snapshot vacuum, and the query supervisor control loop."""

from __future__ import annotations

import pandas as pd

from surge_spark.operators.skew import salted_count_per_key, salted_join
from surge_spark.streaming.listeners import QuerySupervisor
from surge_spark.streaming.snapshot_store import SnapshotStore


def test_salted_join_matches_plain_join(spark):
    """Salting must be invisible to results: same rows as the plain join,
    including a 90%-hot key."""
    large = spark.createDataFrame(
        pd.DataFrame({"k": [1] * 900 + list(range(2, 102)), "v": range(1000)})
    )
    small = spark.createDataFrame(
        pd.DataFrame({"k": list(range(1, 102)), "w": [f"w{i}" for i in range(1, 102)]})
    )
    plain = large.join(small, "k").toPandas()
    salted = salted_join(large, small, "k", salt_buckets=8).toPandas()
    key = lambda d: sorted(map(tuple, d[["k", "v", "w"]].values.tolist()))  # noqa: E731
    assert key(salted) == key(plain)
    assert len(salted) == 1000


def test_salted_count_per_key(spark):
    df = spark.createDataFrame(pd.DataFrame({"k": ["hot"] * 500 + ["cold"] * 7}))
    out = salted_count_per_key(df, "k", salt_buckets=4).toPandas().set_index("k")
    assert out.loc["hot", "n"] == 500
    assert out.loc["cold", "n"] == 7


def test_snapshot_vacuum_keeps_recent_and_events(spark, tmp_path):
    store = SnapshotStore(str(tmp_path / "s"), key_col="k")
    for i in range(5):
        updates = spark.createDataFrame([(f"key{i}", i)], "k string, v int")
        events = spark.createDataFrame([(f"key{i}", f"e{i}")], "k string, e string")
        store.commit(events, updates, f"b{i}")
    removed = store.vacuum(keep_last=2)
    assert removed == [0, 1, 2]
    # latest state + full event log still readable; batch-id dedup intact
    assert store.read_state(spark).count() == 5
    assert store.read_events(spark).count() == 5
    assert store.commit(None, spark.createDataFrame([("x", 9)], "k string, v int"), "b3") is False


def test_query_supervisor_restarts_and_gives_up(spark, tmp_path):
    """W6/§4 control loop: a dying query is restarted with backoff; after
    the budget it is reported as gave_up (surge: shutdown after max
    retries, AggregateStateStoreKafkaStreams.scala:98-101)."""
    calls = {"n": 0}

    def factory():
        calls["n"] += 1
        df = spark.readStream.format("rate").option("rowsPerSecond", "1").load()
        return (
            df.writeStream.format("memory")
            .queryName(f"sup_q_{calls['n']}")
            .option("checkpointLocation", str(tmp_path / f"ck{calls['n']}"))
            .start()
        )

    sup = QuerySupervisor()
    entry = sup.supervise("rate-q", factory, max_restarts=2, backoff_s=0.01)
    assert sup.poll()["rate-q"] == "active"

    entry.query.stop()
    assert sup.poll()["rate-q"] == "restarted"
    assert calls["n"] == 2

    entry.query.stop()
    assert sup.poll()["rate-q"] == "restarted"
    entry.query.stop()
    assert sup.poll()["rate-q"] == "gave_up"
    assert "gave_up" in entry.history[-1]
    sup.stop_all()


def test_snapshot_store_fencing(spark, tmp_path):
    """R5 zombie-writer fencing: two stores over the same path racing to
    commit the same version — the second manifest write must fail loudly
    (the ProducerFencedException analog), not silently overwrite."""
    import os

    import pytest as _pytest

    store_a = SnapshotStore(str(tmp_path / "f"), key_col="k")
    store_b = SnapshotStore(str(tmp_path / "f"), key_col="k")
    updates = spark.createDataFrame([("a", 1)], "k string, v int")
    assert store_a.commit(None, updates, "b1") is True

    # race: another writer lands the v1 manifest while b is mid-commit.
    # Freeze b's view at [v0] so it also targets version 1, and pre-place
    # the winner's manifest — b's exclusive link must fail.
    manifest_v1 = store_b._manifest_path(1)
    with open(manifest_v1 + ".race", "w") as f:
        f.write('{"version": 1, "batch_id": "other-writer", "events": null, "state": "x", "n_events": 0, "ts": 0}')
    os.rename(manifest_v1 + ".race", manifest_v1)
    store_b.committed_versions = lambda: [0]  # stale view mid-race

    with _pytest.raises(RuntimeError, match="fenced"):
        store_b.commit(None, spark.createDataFrame([("b", 2)], "k string, v int"), "b2")
