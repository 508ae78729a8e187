"""Interleaved sf0.5 A/B of `preferSortMergeJoin=false` on the join-heavy
TPC-H entries (r16 VERDICT item 7): the r15 session-wide SHJ enablement
was A/B'd only on the dedup family; this validates (or reverts) it on the
shapes where a skewed build side could hurt — q5/q8/q21 +
j_salted_skew_join — at the sf0.5 stress slice, fresh subprocess per
sample, orders A,B,B,A / B,A,A,B.

  A = shipped config (preferSortMergeJoin=false)
  B = preferSortMergeJoin=true via SPARK_GRAFT_EXTRA_CONFS

    python scripts/ab_shj_sf05.py [--reps 2] [--sf-dir /tmp/stressdata/sf0.5]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

NAMES = ["q5_local_supplier_volume", "q8_market_share", "q21_waiting_suppliers", "j_salted_skew_join"]

WORKER = r"""
import json, sys, time
import statistics as st
sys.path.insert(0, {repo!r})
from surge_spark.queries import all_queries
from surge_spark.session import get_spark
spark = get_spark("ab-shj", cpus=32)
spark.sparkContext.setLogLevel("ERROR")
qs = all_queries()
names = {names!r}
sf_dir = {sf_dir!r}
for n in names:
    qs[n](spark, "/root/testdata/sf0.001").write.format("noop").mode("overwrite").save()
out = {{}}
for n in names:
    samples = []
    for _ in range(3):
        t0 = time.perf_counter()
        qs[n](spark, sf_dir).write.format("noop").mode("overwrite").save()
        samples.append(time.perf_counter() - t0)
    out[n] = round(st.median(samples), 3)
print("RESULT " + json.dumps(out))
"""


def run_one(label: str, extra: str, sf_dir: str) -> dict:
    env = dict(os.environ)
    env["SPARK_GRAFT_CPUS"] = "32"
    if extra:
        env["SPARK_GRAFT_EXTRA_CONFS"] = extra
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = subprocess.run(
        [sys.executable, "-c", WORKER.format(repo=repo, names=NAMES, sf_dir=sf_dir)],
        capture_output=True, text=True, env=env, timeout=1800,
    )
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            d = json.loads(line[len("RESULT "):])
            return {"label": label, **d}
    raise RuntimeError(f"{label}: no RESULT\n{out.stderr[-1500:]}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--sf-dir", default="/tmp/stressdata/sf0.5")
    args = ap.parse_args()
    order = []
    for i in range(args.reps):
        order += list("ABBA" if i % 2 == 0 else "BAAB")
    for i, side in enumerate(order):
        extra = "" if side == "A" else "spark.sql.join.preferSortMergeJoin=true"
        print(json.dumps(run_one(f"{side}{i}", extra, args.sf_dir)), flush=True)


if __name__ == "__main__":
    main()
