"""Warm plan-BUILD time measurement (r16, VERDICT item 2 groundwork).

The r15 survey's 'worst by build time' table ran each entry ONCE in a
fresh session in alphabetical order, so the first entries absorbed
session warm-up (first parquet read, py4j spin-up, analyzer JIT) into
their 'build' number. This script separates that: it warms the session
on a throwaway entry, then builds each named entry N times in a row and
prints every sample — the warm (2nd+) samples are the real driver-side
plan-construction cost; a large t1-t2 gap is session warm-up, not the
entry.

    python scripts/measure_build.py --sf /root/testdata/sf0.001 names...
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from surge_spark.queries import all_queries  # noqa: E402
from surge_spark.session import get_spark  # noqa: E402


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--sf", default="/root/testdata/sf0.001")
    p.add_argument("--reps", type=int, default=3)
    p.add_argument("names", nargs="+")
    args = p.parse_args()

    spark = get_spark("measure-build")
    queries = all_queries()
    # session warm-up: one cheap entry end to end (first parquet footer
    # read, analyzer classes, noop sink)
    queries["d_exact_dedup"](spark, args.sf).write.format("noop").mode(
        "overwrite"
    ).save()

    for name in args.names:
        ts = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            queries[name](spark, args.sf)
            ts.append(time.perf_counter() - t0)
        print(
            f"BUILD {name} "
            + " ".join(f"{t:.2f}" for t in ts)
            + f"  warm_min={min(ts[1:] or ts):.2f}",
            flush=True,
        )


if __name__ == "__main__":
    main()
