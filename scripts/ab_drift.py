"""Back-to-back A/B bench of specific catalog entries across two git trees.

VERDICT r7 task 3: the shared-24 headline drifted +12% r6→r7 with no plan
change to any shared entry — driver-measured, so it needs attribution, not
a shrug. This harness times the named queries EXACTLY like bench.py
(warmup pass at sf0.001, then median of N noop-sink runs) but against an
arbitrary checked-out tree, so two trees can be measured minutes apart on
the same host:

    python scripts/ab_drift.py --tree /path/to/r6-worktree \
        --sf /root/testdata/sf0.1 --runs 3 q3_shipping_priority ...

Run the A and B invocations alternately (A,B,B,A) in one sitting; the
documented ±40% day-to-day host noise cancels, per-pair deltas remain.
Prints one JSON line per invocation.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--tree", required=True, help="repo tree to import surge_spark from")
    p.add_argument("--sf", default="/root/testdata/sf0.1")
    p.add_argument("--runs", type=int, default=3)
    p.add_argument("--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", 32)))
    p.add_argument("names", nargs="+")
    args = p.parse_args()

    sys.path.insert(0, args.tree)
    os.environ["SPARK_GRAFT_CPUS"] = str(args.cpus)
    from surge_spark.queries import all_queries  # noqa: E402
    from surge_spark.session import get_spark  # noqa: E402

    spark = get_spark("ab-drift")
    queries = all_queries()
    warm_dir = "/root/testdata/sf0.001"

    out: dict[str, float] = {}
    for name in args.names:
        queries[name](spark, warm_dir).write.format("noop").mode("overwrite").save()
    for name in args.names:
        samples = []
        for _ in range(args.runs):
            t0 = time.perf_counter()
            queries[name](spark, args.sf).write.format("noop").mode("overwrite").save()
            samples.append(time.perf_counter() - t0)
        out[name] = round(statistics.median(samples), 3)
    print(json.dumps({"tree": args.tree, "sf": args.sf, "queries": out}))


if __name__ == "__main__":
    main()
