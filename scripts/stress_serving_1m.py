"""Serving-path stress at ~1M keys (r14 VERDICT task 4): the bench's
high-cardinality block proves the bucket-pruned arrow point read and the
salted fold at 65 536 keys / num_buckets=64 (~1k rows/bucket). This
script scales the SNAPSHOT 16× — 1 048 576 keys — and measures the three
SLO paths at several ``num_buckets`` sizings, so a deployer gets the
rows-per-bucket → latency curve instead of a single point:

- ``get_state``: the driver-side pyarrow fetch scans ONE bucket's base
  file + flat deltas — its latency is linear in rows/bucket, and the
  curve answers "how big may a bucket grow before the <10 ms point-read
  envelope breaks?"
- ``batch ack``: run_stream micro-batches (the driver-fold's batched
  arrow read must prune to touched buckets, not scan 1M rows).
- ``submit_many`` over 2048 distinct keys: the distributed fold's
  latest-wins aggregate + co-partitioned join at real snapshot width.

Usage::

    python scripts/stress_serving_1m.py [--keys 1048576] [--buckets 64 256 512]

Prints one JSON line per num_buckets config plus a summary line.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import statistics as st
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--keys", type=int, default=1_048_576)
    p.add_argument("--buckets", type=int, nargs="*", default=[64, 256, 512])
    p.add_argument("--ack-buckets", type=int, default=512,
                   help="num_buckets config that also runs the streaming "
                   "batch-ack block (slowest part; one config suffices)")
    args = p.parse_args()
    if args.ack_buckets not in args.buckets:
        # review fix (r15): silently skipping the ack block produced a
        # result file that LOOKED complete — measure it, loudly
        print(
            f"note: --ack-buckets {args.ack_buckets} not in --buckets; "
            f"appending it so the batch-ack path is measured",
            file=sys.stderr,
        )
        args.buckets = list(args.buckets) + [args.ack_buckets]

    from surge_spark.engine import SurgeEngine, SurgeModel
    from surge_spark.session import get_spark

    spark = get_spark("serving-1m-stress")
    spark.sparkContext.setLogLevel("ERROR")

    def process(state, cmd):
        return ([{"aggregate_id": cmd["aggregate_id"]}], False)

    def handle(state, ev):
        return {
            "aggregate_id": ev["aggregate_id"],
            "n": (state["n"] if state else 0) + 1,
        }

    root = tempfile.mkdtemp(prefix="surge-1m-stress-")
    results = []
    try:
        for nb in args.buckets:
            eng = SurgeEngine(
                spark,
                SurgeModel(
                    process_command=process,
                    handle_event=handle,
                    state_schema="aggregate_id string, n long",
                    event_schema="aggregate_id string",
                ),
                f"{root}/store-{nb}",
                fold_partitions=4,
                num_buckets=nb,
            )
            seed = spark.range(args.keys).selectExpr(
                "CAST(id AS STRING) AS aggregate_id", "CAST(5 AS LONG) AS n"
            )
            t0 = time.perf_counter()
            eng._store.commit(None, seed, "seed-1m", updates_unique=True)
            seed_s = time.perf_counter() - t0

            # point reads: spread keys so every probe hits a different
            # bucket; first probe per fresh store pays the arrow dataset
            # memo — report warm (drop first) AND cold
            reads = []
            for i in range(15):
                k = str((i * 104729) % args.keys)
                s = time.perf_counter()
                got = eng._store.get_state(spark, k)
                reads.append(time.perf_counter() - s)
                assert got is not None and got["n"] == 5, (k, got)
            cold_read = reads[0]
            warm_reads = reads[1:]

            many_samples = []
            for rep in range(3):
                many = [
                    (str((rep * 2048 + i * 3571) % args.keys), {"kind": "b"})
                    for i in range(2048)
                ]
                # distinct keys within the rep (3571 coprime to 2^20)
                s = time.perf_counter()
                res = eng.submit_many(many)
                many_samples.append(time.perf_counter() - s)
                assert all(r.is_success for r in res)

            row = {
                "num_buckets": nb,
                "n_keys": args.keys,
                "rows_per_bucket": args.keys // nb,
                "seed_commit_s": round(seed_s, 2),
                "get_state_cold_s": round(cold_read, 4),
                "get_state_warm_s_median": round(st.median(warm_reads), 4),
                "get_state_warm_s_max": round(max(warm_reads), 4),
                "submit_many_cmds_per_s": round(
                    2048 / st.median(many_samples), 1
                ),
            }

            if nb == args.ack_buckets:
                cmds_dir = f"{root}/cmds-{nb}"
                rows = [
                    (str((i * 9973) % args.keys), f"cmd-{i:012d}")
                    for i in range(512)
                ]
                (
                    spark.createDataFrame(
                        rows, "aggregate_id string, command_id string"
                    )
                    .repartition(4)
                    .write.parquet(cmds_dir)
                )
                stream = (
                    spark.readStream.schema(
                        "aggregate_id string, command_id string"
                    )
                    .option("maxFilesPerTrigger", 1)
                    .parquet(cmds_dir)
                )
                q = eng._engine.run_stream(stream, f"{root}/ckpt-{nb}")
                q.awaitTermination()
                batch_s = [
                    pr["durationMs"]["triggerExecution"] / 1000.0
                    for pr in (q.recentProgress or [])
                    if pr.get("numInputRows", 0) > 0
                ]
                probe = str((3 * 9973) % args.keys)
                got = eng._store.get_state(spark, probe)
                assert got is not None and got["n"] == 6, got
                row["batch_ack_s_median"] = (
                    round(st.median(batch_s), 3) if batch_s else None
                )
            results.append(row)
            print(json.dumps(row), flush=True)
        print(json.dumps({"metric": "serving_1m_stress", "configs": results}))
        return 0
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    raise SystemExit(main())
