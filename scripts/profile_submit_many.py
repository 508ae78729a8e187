"""Profile submit_many under DRIVER-LIKE conditions (VERDICT r11 task 2).

The driver's submit_many declined three consecutive rounds
(1742 -> 1297 -> 984 cmds/s) while every warm interleaved tree-vs-tree
A/B showed no code regression. The unexplored variable is the DRIVER'S
CONDITIONS: bench.py measures submit_many LAST, after 46 headline
entries x 3 runs at sf0.1 plus two streaming blocks have aged the JVM
(hundreds of executed plans, codegen cache, GC pressure, retained
execution metadata), in a cold-started process that just imported the
full 240-entry catalog.

This script reproduces that shape in one process and prints submit_many
throughput at increasing session ages:

  stage 0: cold session, nothing run       (the warm-A/B shape)
  stage 1: after catalog import + entry()  (import cost isolated)
  stage 2: after N headline queries        (the driver shape)

plus a fresh-engine-per-stage control (bench.py builds ONE facade and
calls submit_many once; engine reuse vs fresh separates store-growth
cost — each submit_many commit grows the facade store's delta chain).

Usage:
    python scripts/profile_submit_many.py [--age 20] [--reps 3]
"""

from __future__ import annotations

import argparse
import os
import shutil
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_engine(spark, root: str, tag: str):
    from surge_spark.engine import SurgeEngine, SurgeModel

    # identical model shape to bench.py's streaming block
    def process(state, cmd):
        return ([{"aggregate_id": cmd["aggregate_id"]}], False)

    def handle(state, ev):
        return {
            "aggregate_id": ev["aggregate_id"],
            "n": (state["n"] if state else 0) + 1,
        }

    return SurgeEngine(
        spark,
        SurgeModel(
            process_command=process,
            handle_event=handle,
            state_schema="aggregate_id string, n long",
            event_schema="aggregate_id string",
        ),
        f"{root}/{tag}",
        fold_partitions=4,
    )


def time_submit(engine, n_cmds: int = 2048) -> float:
    many = [(str(i % 256), {"kind": "bump"}) for i in range(n_cmds)]
    t0 = time.perf_counter()
    results = engine.submit_many(many)
    dt = time.perf_counter() - t0
    assert all(r.is_success for r in results)
    return n_cmds / dt


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--age", type=int, default=20, help="headline queries to run as aging")
    p.add_argument("--reps", type=int, default=3)
    p.add_argument("--sf", default="/root/testdata/sf0.1")
    args = p.parse_args()

    from surge_spark.session import get_spark

    spark = get_spark("profile-submit-many")
    root = tempfile.mkdtemp(prefix="prof-submit-")
    out: dict[str, list[float]] = {}
    try:
        # ---- stage 0: cold session, fresh engine per rep + one reused ----
        eng = make_engine(spark, root, "s0-reused")
        out["s0_cold_fresh_engine"] = [
            time_submit(make_engine(spark, root, f"s0-fresh-{i}"))
            for i in range(args.reps)
        ]
        out["s0_cold_reused_engine"] = [time_submit(eng) for _ in range(args.reps)]

        # ---- stage 1: import the full catalog (what the driver does) ----
        t0 = time.perf_counter()
        from surge_spark.queries import all_queries

        queries = all_queries()
        import_s = time.perf_counter() - t0
        out["s1_post_import_fresh_engine"] = [
            time_submit(make_engine(spark, root, f"s1-fresh-{i}"))
            for i in range(args.reps)
        ]

        # ---- stage 2: age the session with headline queries at sf0.1 ----
        sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
        import bench

        names = bench.HEADLINE[: args.age]
        t0 = time.perf_counter()
        for name in names:
            queries[name](spark, args.sf).write.format("noop").mode(
                "overwrite"
            ).save()
        age_s = time.perf_counter() - t0
        out["s2_aged_fresh_engine"] = [
            time_submit(make_engine(spark, root, f"s2-fresh-{i}"))
            for i in range(args.reps)
        ]
        out["s2_aged_reused_engine"] = [time_submit(eng) for _ in range(args.reps)]

        print(f"catalog import: {import_s:.2f} s; aging ({len(names)} queries): {age_s:.1f} s")
        for k, v in out.items():
            print(
                f"{k}: median {statistics.median(v):7.0f} cmds/s  "
                f"runs {[round(x) for x in v]}"
            )
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
