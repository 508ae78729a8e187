"""Isolate the tiny-write latency floor: source (local relation vs parquet)
x sink (noop vs parquet) x committer settings."""

import sys
import time
import shutil
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from surge_spark.session import get_spark  # noqa: E402


def t(label, fn, n=3):
    times = []
    for _ in range(n):
        s = time.perf_counter()
        fn()
        times.append(time.perf_counter() - s)
    print(f"{label}: {sorted(times)[n // 2]:.3f}s  {[round(x, 3) for x in times]}", flush=True)


def main():
    spark = get_spark("exp", cpus=8)
    root = tempfile.mkdtemp(prefix="exp-wf-")
    try:
        rows = [(str(k), k) for k in range(128)]
        local_df = spark.createDataFrame(rows, "aggregate_id string, n long")
        src = f"{root}/src"
        local_df.coalesce(1).write.parquet(src)
        pq_df = spark.read.parquet(src)

        t("local count", lambda: local_df.count())
        t("pq count", lambda: pq_df.count())
        t("local noop", lambda: local_df.write.format("noop").mode("overwrite").save())
        t("pq noop", lambda: pq_df.write.format("noop").mode("overwrite").save())
        out = f"{root}/o1"
        t("local parquet write c1", lambda: local_df.coalesce(1).write.mode("overwrite").parquet(out))
        t("pq parquet write c1", lambda: pq_df.coalesce(1).write.mode("overwrite").parquet(out))
        t("pq parquet write (8 part)", lambda: pq_df.repartition(8).write.mode("overwrite").parquet(out))
        t("pq csv write c1", lambda: pq_df.coalesce(1).write.mode("overwrite").csv(f"{root}/o2"))
        # fresh dir each time (no overwrite delete)
        i = [0]

        def fresh():
            i[0] += 1
            pq_df.coalesce(1).write.parquet(f"{root}/fresh{i[0]}")

        t("pq parquet write fresh dir", fresh)
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
