"""Capture .explain('formatted') for named catalog entries (r15
optimization round: plans/r15/<query>_<tag>.txt) plus a quick plan-shape
summary line per entry (Exchange / ReusedExchange / scan / join-node
counts) so plan diffs are one grep.

    python scripts/capture_plans.py --tag before --sf /root/testdata/sf0.1 \
        g_triangle_count ...            # named entries
    python scripts/capture_plans.py --tag before --headline   # whole headline
"""

from __future__ import annotations

import argparse
import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from surge_spark.queries import all_queries  # noqa: E402
from surge_spark.session import get_spark  # noqa: E402


def plan_text(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


COUNTERS = [
    ("Exchange", r"\bExchange (?:hash|range|Single)"),
    ("ReusedExchange", r"\bReusedExchange\b"),
    ("Scan parquet", r"\bScan parquet\b"),
    ("ExistingRDD", r"\bScan ExistingRDD\b"),
    ("BroadcastHashJoin", r"\bBroadcastHashJoin\b"),
    ("SortMergeJoin", r"\bSortMergeJoin\b"),
    ("ShuffledHashJoin", r"\bShuffledHashJoin\b"),
    ("BroadcastNestedLoopJoin", r"\bBroadcastNestedLoopJoin\b"),
    ("Window", r"\bWindow\b"),
    ("BatchEvalPython", r"\bBatchEvalPython\b"),
    ("ArrowEvalPython", r"\bArrowEvalPython\b"),
    ("FlatMapGroupsInPandas", r"\bFlatMapGroupsInPandas\b"),
    ("MapInPandas", r"\bMapInPandas\b"),
]


def summarize(txt: str) -> str:
    parts = []
    for name, pat in COUNTERS:
        n = len(re.findall(pat, txt))
        if n:
            parts.append(f"{name}={n}")
    return " ".join(parts)


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--tag", required=True)
    p.add_argument("--sf", default="/root/testdata/sf0.1")
    p.add_argument("--out", default=None)
    p.add_argument("--headline", action="store_true")
    p.add_argument("names", nargs="*")
    args = p.parse_args()

    names = list(args.names)
    if args.headline:
        import bench  # noqa: E402

        names = bench.HEADLINE + [n for n in names if n not in bench.HEADLINE]

    out_dir = Path(args.out or Path(__file__).resolve().parent.parent / "plans" / "r15")
    out_dir.mkdir(parents=True, exist_ok=True)

    spark = get_spark("capture-plans")
    queries = all_queries()
    for name in names:
        try:
            df = queries[name](spark, args.sf)
            txt = plan_text(df)
        except Exception as exc:  # noqa: BLE001
            print(f"ERR {name}: {str(exc).splitlines()[0][:200]}")
            continue
        (out_dir / f"{name}_{args.tag}.txt").write_text(txt)
        print(f"PLAN {name}: {summarize(txt)}")


if __name__ == "__main__":
    main()
