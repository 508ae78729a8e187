"""Interleaved A/B for the streaming serial paths (r16 VERDICT item 3).

The r15 driver's c32 run printed two off-band serial samples —
send_command ack 1.589 s (SLO miss) and hc_submit_many 496.9 cmds/s
(band 930-1379) — with no streaming code changed that round except the
session-wide `preferSortMergeJoin=false`. This measures exactly those
two metrics in a FRESH subprocess per sample (the r11 recipe: never
read serial-path numbers out of one hot session), interleaved A/B/B/A
over the config axis:

  A = the shipped session (preferSortMergeJoin=false)
  B = preferSortMergeJoin=true (the r14 behavior) via
      SPARK_GRAFT_EXTRA_CONFS

If B is systematically faster, the r15 config change is implicated on
the serial paths; if the two spread alike, the driver samples were host
variance and the band is the answer.

    python scripts/ab_streaming_serial.py [--reps 4]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

WORKER = r"""
import json, os, shutil, sys, tempfile, time
import statistics as st
sys.path.insert(0, {repo!r})
from surge_spark.engine import SurgeEngine, SurgeModel
from surge_spark.session import get_spark

spark = get_spark("ab-serial", cpus=32)
spark.sparkContext.setLogLevel("ERROR")

def process(state, cmd):
    return ([{{"aggregate_id": cmd["aggregate_id"]}}], False)

def handle(state, ev):
    return {{"aggregate_id": ev["aggregate_id"], "n": (state["n"] if state else 0) + 1}}

root = tempfile.mkdtemp(prefix="ab-serial-")
try:
    # warmup engine, same as bench.py
    warm = SurgeEngine(
        spark,
        SurgeModel(process_command=process, handle_event=handle,
                   state_schema="aggregate_id string, n long",
                   event_schema="aggregate_id string"),
        f"{{root}}/warm-store",
    )
    for _ in range(3):
        warm.aggregate_for("w").send_command(kind="warm")

    # send_command block (bench-identical: 5 acks, median)
    facade = SurgeEngine(
        spark,
        SurgeModel(process_command=process, handle_event=handle,
                   state_schema="aggregate_id string, n long",
                   event_schema="aggregate_id string"),
        f"{{root}}/facade-store", fold_partitions=4,
    )
    ref = facade.aggregate_for("acct-1")
    acks = []
    for _ in range(5):
        s = time.perf_counter()
        r = ref.send_command(kind="bump")
        acks.append(time.perf_counter() - s)
        assert r.is_success

    # hc_submit_many block (bench-identical: 65536-key seed, 3 calls)
    hc_eng = SurgeEngine(
        spark,
        SurgeModel(process_command=process, handle_event=handle,
                   state_schema="aggregate_id string, n long",
                   event_schema="aggregate_id string"),
        f"{{root}}/hc-store", fold_partitions=4, num_buckets=64,
    )
    seed = spark.range(65536).selectExpr(
        "CAST(id AS STRING) AS aggregate_id", "CAST(5 AS LONG) AS n")
    hc_eng._store.commit(None, seed, "hc-seed", updates_unique=True)
    hc_samples = []
    for rep in range(3):
        many = [(str((rep * 2048 + i) % 65536), {{"kind": "bump"}}) for i in range(2048)]
        s = time.perf_counter()
        res = hc_eng.submit_many(many)
        hc_samples.append(time.perf_counter() - s)
        assert all(r.is_success for r in res)
    print("RESULT " + json.dumps({{
        "send_command_ack_s_median": round(st.median(acks), 3),
        "send_command_acks": [round(a, 3) for a in acks],
        "hc_submit_many_cmds_per_s": round(2048 / st.median(hc_samples), 1),
        "hc_samples_s": [round(x, 3) for x in hc_samples],
    }}))
finally:
    shutil.rmtree(root, ignore_errors=True)
"""


def run_one(label: str, extra_confs: str) -> dict:
    env = dict(os.environ)
    env["SPARK_GRAFT_CPUS"] = "32"
    if extra_confs:
        env["SPARK_GRAFT_EXTRA_CONFS"] = extra_confs
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = subprocess.run(
        [sys.executable, "-c", WORKER.format(repo=repo)],
        capture_output=True, text=True, env=env, timeout=900,
    )
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            d = json.loads(line[len("RESULT "):])
            d["label"] = label
            return d
    raise RuntimeError(f"{label}: no RESULT line\n{out.stderr[-2000:]}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=4)
    args = ap.parse_args()
    # A,B,B,A then B,A,A,B ... balanced order
    order = []
    for i in range(args.reps):
        order += ["AB"[i % 2], "BA"[i % 2]]
    results = []
    for i, side in enumerate(order):
        conf = "" if side == "A" else "spark.sql.join.preferSortMergeJoin=true"
        r = run_one(f"{side}{i}", conf)
        print(json.dumps(r), flush=True)
        results.append(r)
    for side in "AB":
        rs = [r for r in results if r["label"].startswith(side)]
        print(
            side,
            "send_command medians:", [r["send_command_ack_s_median"] for r in rs],
            "hc_submit_many:", [r["hc_submit_many_cmds_per_s"] for r in rs],
        )


if __name__ == "__main__":
    main()
