"""Profile the high-cardinality submit_many shape (VERDICT r12 task 3).

BENCH_r12: hc_submit_many 792.6 cmds/s at 65,536 keys / 64 buckets vs
1872 at 128 keys / 16 buckets. This reproduces the hc bench block
EXACTLY (same seed, same spread keys) with SURGE_PROFILE=1 phase timing
so the 2.4x degradation decomposes into named phases instead of being
argued about.

Usage:
    SURGE_PROFILE=1 python scripts/profile_hc_submit_many.py [--reps 4]
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=4)
    ap.add_argument("--keys", type=int, default=65536)
    ap.add_argument("--buckets", type=int, default=64)
    ap.add_argument("--driver-fold-max", type=int, default=512)
    ap.add_argument("--cmd-keys", type=int, default=None,
                    help="distinct command keys per batch (default 2048)")
    args = ap.parse_args()

    from surge_spark.engine import SurgeEngine, SurgeModel
    from surge_spark.session import get_spark

    spark = get_spark("hc-profile", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    spark.sparkContext.setLogLevel("ERROR")
    root = tempfile.mkdtemp(prefix="hc-profile-")

    def process(state, cmd):
        return ([{"aggregate_id": cmd["aggregate_id"]}], False)

    def handle(state, ev):
        return {
            "aggregate_id": ev["aggregate_id"],
            "n": (state["n"] if state else 0) + 1,
        }

    eng = SurgeEngine(
        spark,
        SurgeModel(
            process_command=process,
            handle_event=handle,
            state_schema="aggregate_id string, n long",
            event_schema="aggregate_id string",
        ),
        f"{root}/hc-store",
        fold_partitions=4,
        num_buckets=args.buckets,
    )
    eng._engine.driver_fold_max_rows = args.driver_fold_max
    hc_keys = args.keys
    seed = spark.range(hc_keys).selectExpr(
        "CAST(id AS STRING) AS aggregate_id", "CAST(5 AS LONG) AS n"
    )
    eng._store.commit(None, seed, "hc-seed", updates_unique=True)

    try:
        for rep in range(args.reps):
            ck = args.cmd_keys or 2048
            # batch size grows with --cmd-keys so every requested key is
            # actually distinct in the batch (a fixed 2048-command batch
            # would silently clamp ck > 2048 to at most 2048 keys)
            batch = max(2048, ck)
            hc_many = [
                (str((rep * batch + i % ck) % hc_keys), {"kind": "bump"})
                for i in range(batch)
            ]
            s = time.perf_counter()
            res = eng.submit_many(hc_many)
            dt = time.perf_counter() - s
            assert all(r.is_success for r in res)
            print(
                f"rep {rep}: {dt:.3f} s  ({batch / dt:.1f} cmds/s)",
                flush=True,
            )
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
