"""Profile the streaming micro-batch path (SURGE_PROFILE=1 phase lines +
trigger breakdown). Mirrors bench.py's bench_streaming scenario."""

import os
import sys
import time
import shutil
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
os.environ.setdefault("SURGE_PROFILE", "1")

from surge_spark.session import get_spark  # noqa: E402
from surge_spark.streaming.command_engine import CommandEngine  # noqa: E402
from surge_spark.streaming.snapshot_store import SnapshotStore  # noqa: E402

n_commands, n_batches, n_keys = 1024, 8, 128


def process(state, cmd):
    return ([{"aggregate_id": cmd["aggregate_id"]}], False)


def handle(state, ev):
    return {"aggregate_id": ev["aggregate_id"], "n": (state["n"] if state else 0) + 1}


def main():
    spark = get_spark("surge-prof", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "8")))
    root = tempfile.mkdtemp(prefix="surge-prof-")
    try:
        # warmup
        warm_store = SnapshotStore(f"{root}/warm", key_col="aggregate_id")
        warm = CommandEngine(
            warm_store, process, handle,
            "aggregate_id string, n long", "aggregate_id string",
            order_cols=["command_id"], fold_partitions=4,
        )
        wdf = spark.createDataFrame([("w", "c1")], "aggregate_id string, command_id string")
        for i in range(3):
            warm.process_batch(wdf, f"warm-{i}")
        print("=== warmup done ===", file=sys.stderr)

        cmd_dir, ckpt, replies = f"{root}/cmds", f"{root}/ckpt", f"{root}/replies"
        rows = [(str(i % n_keys), f"cmd-{i:012d}") for i in range(n_commands)]
        (
            spark.createDataFrame(rows, "aggregate_id string, command_id string")
            .repartition(n_batches)
            .write.parquet(cmd_dir)
        )
        store = SnapshotStore(
            f"{root}/store", key_col="aggregate_id", num_buckets=16, delta_commits=16
        )
        engine = CommandEngine(
            store, process, handle,
            "aggregate_id string, n long", "aggregate_id string",
            key_col="aggregate_id", order_cols=["command_id"], fold_partitions=4,
        )
        stream = (
            spark.readStream.schema("aggregate_id string, command_id string")
            .option("maxFilesPerTrigger", 1)
            .parquet(cmd_dir)
        )
        t0 = time.perf_counter()
        q = engine.run_stream(stream, ckpt, replies_path=replies)
        q.awaitTermination()
        wall = time.perf_counter() - t0
        print(f"wall={wall:.2f}s", file=sys.stderr)
        for p in q.recentProgress or []:
            if p.get("numInputRows", 0) > 0:
                d = p["durationMs"]
                print(
                    f"batch {p['batchId']}: trigger={d.get('triggerExecution')}ms "
                    f"addBatch={d.get('addBatch')}ms getBatch={d.get('getBatch')}ms "
                    f"latestOffset={d.get('latestOffset')}ms "
                    f"walCommit={d.get('walCommit')}ms commitOffsets={d.get('commitOffsets')}ms "
                    f"queryPlanning={d.get('queryPlanning')}ms rows={p['numInputRows']}",
                    file=sys.stderr,
                )
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
