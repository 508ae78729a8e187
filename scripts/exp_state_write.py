"""Decompose the snapshot-store state-write cost: scan vs join vs
partitioned write vs file count."""

import sys
import time
import shutil
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402
from surge_spark.session import get_spark  # noqa: E402


def t(label, fn, n=3):
    times = []
    for _ in range(n):
        s = time.perf_counter()
        fn()
        times.append(time.perf_counter() - s)
    print(f"{label}: {sorted(times)[n // 2]:.3f}s  {[round(x, 3) for x in times]}")


def main():
    spark = get_spark("exp", cpus=8)
    root = tempfile.mkdtemp(prefix="exp-state-")
    nb = 64
    try:
        rows = [(str(k), k) for k in range(128)]
        df = spark.createDataFrame(rows, "aggregate_id string, n long")
        bucket = F.pmod(F.crc32(F.col("aggregate_id").cast("binary")), F.lit(nb)).cast("int")
        snap = f"{root}/snap"
        (
            df.withColumn("__bucket", bucket)
            .repartition(F.col("__bucket"))
            .write.partitionBy("__bucket")
            .mode("overwrite")
            .parquet(snap)
        )
        import os

        paths = [f"{snap}/{d}" for d in os.listdir(snap) if d.startswith("__bucket=")]
        nfiles = sum(len([f for f in os.listdir(p) if f.endswith(".parquet")]) for p in paths)
        print(f"buckets={len(paths)} files={nfiles}")
        schema = "aggregate_id string, n long"

        t("A. read+count 64 dirs", lambda: spark.read.schema(schema).parquet(*paths).count())
        t("A2. frame build only (listing)", lambda: spark.read.schema(schema).parquet(*paths))
        one = f"{root}/one"
        df.coalesce(1).write.mode("overwrite").parquet(one)
        t("A3. read+count 1 dir", lambda: spark.read.schema(schema).parquet(one).count())

        keys = df.select("aggregate_id")

        def antijoin_count():
            prev = spark.read.schema(schema).parquet(*paths)
            surv = prev.join(
                F.broadcast(keys.select(F.col("aggregate_id").alias("__t"))),
                prev["aggregate_id"] == F.col("__t"),
                "left_anti",
            )
            surv.unionByName(df).count()

        t("B. scan+antijoin+union count", antijoin_count)

        out = f"{root}/out"

        def full_write(repart):
            prev = spark.read.schema(schema).parquet(*paths)
            surv = prev.join(
                F.broadcast(keys.select(F.col("aggregate_id").alias("__t"))),
                prev["aggregate_id"] == F.col("__t"),
                "left_anti",
            )
            content = surv.unionByName(df).withColumn("__bucket", bucket)
            if repart:
                content = content.repartition(F.col("__bucket"))
            content.write.partitionBy("__bucket").mode("overwrite").parquet(out)

        t("C. merge+partitionBy write (repart)", lambda: full_write(True))
        t("C2. merge+partitionBy write (no repart)", lambda: full_write(False))

        def write_only(repart):
            content = df.withColumn("__bucket", bucket)
            if repart:
                content = content.repartition(F.col("__bucket"))
            content.write.partitionBy("__bucket").mode("overwrite").parquet(out)

        t("D. updates-only partitionBy write (repart)", lambda: write_only(True))
        t("D2. updates-only partitionBy write (no repart)", lambda: write_only(False))
        t("E. updates-only flat write coalesce(1)", lambda: df.coalesce(1).write.mode("overwrite").parquet(out))
        t(
            "F. updates-only flat write, 64 buckets as 1 task",
            lambda: df.withColumn("__bucket", bucket).coalesce(1).write.partitionBy("__bucket").mode("overwrite").parquet(out),
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
