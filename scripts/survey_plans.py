"""Catalog-wide physical-plan survey (r15 optimization round).

For EVERY catalog entry: build the DataFrame at the given SF, capture
explain('formatted'), and print one line per entry with plan-shape
counters (uncached parquet scans, exchanges, join strategies, Python
boundary nodes, unpartitioned windows) plus the builder wall time (plan
build only — iterative builders legitimately run driver actions here).

Counting note (r16 ADVICE fix): persisted subtrees re-print their
cached plan under every InMemoryRelation reference, so raw greps
over-count for persist-using entries. EVERY counter (not just scans —
exchanges, joins, windows, python nodes too) is therefore computed ONLY
in the tree section ABOVE the first InMemoryRelation line; a cached
subtree early in the main tree hides every later branch from every
counter. Entries with cached subtrees are flagged
`imr=N(counters-truncated)` so a human reads those plans individually —
the counters for such entries are lower bounds, not totals.

    python scripts/survey_plans.py --sf /root/testdata/sf0.01 [names...]
"""

from __future__ import annotations

import argparse
import re
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from surge_spark.queries import all_queries  # noqa: E402
from surge_spark.session import get_spark  # noqa: E402


def plan_text(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


COUNTERS = [
    ("scan", r"\bScan parquet\b"),
    ("xchg", r"\bExchange\b"),
    ("reused", r"\bReusedExchange\b"),
    ("rdd", r"\bScan ExistingRDD\b"),
    ("bhj", r"\bBroadcastHashJoin\b"),
    ("smj", r"\bSortMergeJoin\b"),
    ("shj", r"\bShuffledHashJoin\b"),
    ("bnlj", r"\bBroadcastNestedLoopJoin\b"),
    ("win", r"\bWindow\b"),
    ("pyrow", r"\bBatchEvalPython\b"),
    ("pyarrow", r"\bArrowEvalPython\b"),
    ("gpd", r"\bFlatMapGroupsInPandas\b"),
    ("mip", r"\bMapInPandas\b"),
    ("imr", r"\bInMemoryRelation\b"),
]


def summarize(txt: str) -> dict[str, int]:
    # only the tree section above the first InMemoryRelation re-print
    head = txt.split("InMemoryRelation", 1)[0]
    out = {}
    for name, pat in COUNTERS:
        src = txt if name == "imr" else head
        n = len(re.findall(pat, src))
        if n:
            out[name] = n
    return out


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--sf", default="/root/testdata/sf0.01")
    p.add_argument("names", nargs="*")
    args = p.parse_args()

    spark = get_spark("survey-plans")
    queries = all_queries()
    names = args.names or sorted(queries)
    rows = []
    for name in names:
        t0 = time.perf_counter()
        try:
            df = queries[name](spark, args.sf)
            txt = plan_text(df)
        except Exception as exc:  # noqa: BLE001
            print(f"ERR {name}: {str(exc).splitlines()[0][:160]}", flush=True)
            continue
        dt = time.perf_counter() - t0
        s = summarize(txt)
        rows.append((name, dt, s))
        flat = " ".join(
            (f"{k}={v}(counters-truncated)" if k == "imr" else f"{k}={v}")
            for k, v in s.items()
        )
        print(f"SURVEY {name} build_s={dt:.2f} {flat}", flush=True)

    print("\n== worst by uncached scans ==")
    for name, dt, s in sorted(rows, key=lambda r: -r[2].get("scan", 0))[:25]:
        print(f"{s.get('scan', 0):4d} scans  build={dt:5.2f}s  {name}")
    print("\n== worst by build time ==")
    for name, dt, s in sorted(rows, key=lambda r: -r[1])[:25]:
        print(f"build={dt:6.2f}s  scans={s.get('scan', 0):3d}  {name}")


if __name__ == "__main__":
    main()
