"""File-backed partitioned topic log — an executable double for the Kafka
surface (SURVEY §2.1 S5/S6/S8, §2.2 P5, §2.9 W7/S9).

The test environment has no broker and no spark-sql-kafka JAR, so the
wrappers in sources/kafka.py are signature-only. This module implements the
SAME contract on parquet files so the semantics are real and tested:

- a topic is a directory of parquet files with the Kafka record schema
  (key/value binary, headers, partition, offset, timestamp)
- ``produce`` routes rows to partitions by murmur3(key) % n (the same
  placement family as KafkaPartitioner.scala:8 — stable co-partitioning,
  not byte-parity with Kafka's murmur2) and assigns contiguous
  per-partition offsets via a staged commit, atomic per partition (the
  non-transactional Kafka producer guarantee)
- ``read`` applies per-partition [start, end) offset bounds (S5); bounds
  prune at the scan because ``partition`` is a hive-partition column
- ``state_table`` materializes latest-per-key with null-value tombstone
  deletion — compacted-topic / KTable semantics (S1)
- ``end_offsets`` / ``lag`` give the consumer-lag surface (S9)
- ``offset_chunks`` plans bounded micro-batches (maxOffsetsPerTrigger / W7
  throttle analog)

Scale shape: the log is hive-partitioned by the routing partition, so a
bounded read touches only the named partitions' files; offset assignment
shuffles once on the routing key (the same movement a broker would do) and
reads prior log-end state from the O(1) ``_end_offsets.json`` sidecar
(broker-metadata style; scan fallback when absent).
"""

from __future__ import annotations

import json
import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

RECORD_SCHEMA = (
    "key binary, value binary, headers map<string,binary>, "
    "partition int, offset bigint, timestamp timestamp"
)


def _partition_col(key: F.Column, n_partitions: int) -> F.Column:
    return F.pmod(F.hash(key), F.lit(n_partitions))


_SIDECAR = "_end_offsets.json"


def end_offsets(spark: SparkSession, path: str) -> dict[int, int]:
    """Next offset to be written per partition (Kafka's log-end offset).

    Fast path: the ``_end_offsets.json`` sidecar ``produce`` maintains —
    O(1), the way a broker tracks log-end in metadata rather than scanning
    the log (without it every produce would re-scan the whole topic,
    O(n²) total I/O over its life). Fallback when the sidecar is absent
    (legacy layout, or a produce crashed between invalidating it and
    rewriting it): one max(offset)-per-partition scan, after which the
    next produce restores the sidecar."""
    if not os.path.isdir(path) or not any(
        e.startswith("partition=") for e in os.listdir(path)
    ):
        return {}
    sidecar = os.path.join(path, _SIDECAR)
    if os.path.isfile(sidecar):
        with open(sidecar) as fh:
            return {int(k): int(v) for k, v in json.load(fh).items()}
    rows = (
        spark.read.parquet(path)
        .groupBy("partition")
        .agg(F.max("offset").alias("mx"))
        .collect()
    )
    return {int(r["partition"]): int(r["mx"]) + 1 for r in rows}


def produce(
    df: DataFrame,
    path: str,
    n_partitions: int = 4,
    batch_id: str | None = None,
    order_by: list | None = None,
) -> None:
    """S6/S8 producer: route by murmur3(key) % n, assign contiguous
    per-partition offsets continuing from the current log end, append via
    a staged write (compute to a temp dir, then move files in — a crash
    during the compute publishes nothing). Atomicity is PER PARTITION, the
    same guarantee a non-transactional Kafka producer gives: a crash during
    the publish loop can leave some partitions' records visible and others'
    not (Kafka acks each partition's produce independently; cross-partition
    atomicity needs transactions — that path here is SnapshotStore, S7).
    The offset sidecar is invalidated first, so a torn publish never serves
    stale log-end metadata; a single writer is assumed, as with one
    producer per partition.

    Within-call ordering: Kafka preserves producer send order per
    partition, but a DataFrame has no inherent row order — callers whose
    consumers fold the log in offset order (event sourcing!) MUST pass
    ``order_by`` (columns/expressions defining send order, e.g. an event
    sequence). Without it, offsets within a call order by
    xxhash64(key, value): deterministic, but arbitrary.

    ``batch_id`` is stamped into headers for R4 replay dedup on read, same
    contract as kafka.write_topic."""
    spark = df.sparkSession
    starts = end_offsets(spark, path)
    start_expr = F.coalesce(
        *[
            F.when(F.col("partition") == p, F.lit(off))
            for p, off in sorted(starts.items())
        ],
        F.lit(0),
    ) if starts else F.lit(0)

    headers = F.create_map(
        F.lit("batch_id"), F.lit((batch_id or "").encode())
    ) if batch_id is not None else F.lit(None).cast("map<string,binary>")

    routed = df.select(
        F.col("key").cast("binary").alias("key"),
        F.col("value").cast("binary").alias("value"),
        headers.alias("headers"),
        _partition_col(F.col("key").cast("binary"), n_partitions).alias("partition"),
        F.current_timestamp().alias("timestamp"),
        *(
            [F.struct(*order_by).alias("_send_order")]
            if order_by
            else [F.xxhash64("key", "value").alias("_send_order")]
        ),
    )
    w = Window.partitionBy("partition").orderBy("_send_order")
    numbered = routed.withColumn(
        "offset", start_expr + F.row_number().over(w) - 1
    ).select(
        "key", "value", "headers", "partition", "offset", "timestamp"
    )

    stage = f"{path.rstrip('/')}.__stage__{uuid.uuid4().hex}"
    numbered.write.partitionBy("partition").parquet(stage, mode="overwrite")
    try:
        # new log-end per partition, from the (batch-sized) staged files —
        # this keeps the sidecar fast path exact without re-scanning the log
        batch_ends = {
            int(r["partition"]): int(r["mx"]) + 1
            for r in spark.read.parquet(stage)
            .groupBy("partition")
            .agg(F.max("offset").alias("mx"))
            .collect()
        }
        sidecar = os.path.join(path, _SIDECAR)
        # invalidate BEFORE moving files: a crash mid-publish leaves no
        # sidecar and end_offsets falls back to the scan (never stale)
        if os.path.isfile(sidecar):
            os.remove(sidecar)
        for part_dir in os.listdir(stage):
            if not part_dir.startswith("partition="):
                continue
            dest = os.path.join(path, part_dir)
            os.makedirs(dest, exist_ok=True)
            src = os.path.join(stage, part_dir)
            for f in os.listdir(src):
                if f.endswith(".parquet"):
                    shutil.move(
                        os.path.join(src, f),
                        os.path.join(dest, f"{uuid.uuid4().hex}-{f}"),
                    )
        ends = {**starts, **batch_ends}
        tmp = f"{sidecar}.{uuid.uuid4().hex}"
        with open(tmp, "w") as fh:
            json.dump({str(k): v for k, v in ends.items()}, fh)
        os.replace(tmp, sidecar)
    finally:
        shutil.rmtree(stage, ignore_errors=True)


def read(
    spark: SparkSession,
    path: str,
    starting_offsets: dict[int, int] | str = "earliest",
    ending_offsets: dict[int, int] | str = "latest",
) -> DataFrame:
    """S5 bounded consumer: per-partition [start, end) offset ranges, same
    contract as Kafka's startingOffsets/endingOffsets JSON. ``partition``
    is a hive-partition column, so partition bounds prune files at the
    scan; the offset predicate pushes down to parquet row groups."""
    df = spark.read.schema(RECORD_SCHEMA).parquet(path)
    if isinstance(starting_offsets, dict) and starting_offsets:
        cond = F.lit(False)
        for p, off in starting_offsets.items():
            cond = cond | (
                (F.col("partition") == p) & (F.col("offset") >= off)
            )
        df = df.where(cond)
    if isinstance(ending_offsets, dict) and ending_offsets:
        cond = F.lit(False)
        for p, off in ending_offsets.items():
            cond = cond | (
                (F.col("partition") == p) & (F.col("offset") < off)
            )
        df = df.where(cond)
    return df


def state_table(spark: SparkSession, path: str) -> DataFrame:
    """S1 compacted-topic materialization: latest record per key by
    (partition, offset), null-value tombstones delete the key — KTable
    semantics (SurgeStateStoreConsumer.scala:57-76). max_by aggregate, one
    shuffle, partial+final."""
    from ..operators.eventsourcing import latest_per_key

    latest = latest_per_key(
        read(spark, path).select("key", "value", "partition", "offset"),
        ["key"],
        ["partition", "offset"],
    )
    return latest.where(F.col("value").isNotNull())


def lag(
    spark: SparkSession, path: str, committed: dict[int, int]
) -> dict[int, int]:
    """S9 consumer lag: log-end minus committed offset per partition."""
    ends = end_offsets(spark, path)
    return {
        p: max(0, end - committed.get(p, 0)) for p, end in ends.items()
    }


def offset_chunks(
    start: dict[int, int], end: dict[int, int], max_offsets: int
) -> list[tuple[dict[int, int], dict[int, int]]]:
    """W7 throttle planning: split [start, end) into micro-batch bounds of
    at most ``max_offsets`` total records (maxOffsetsPerTrigger semantics —
    caps are apportioned across partitions proportionally to backlog).
    Pure planning on O(n_partitions) numbers; each returned (start, end)
    pair feeds ``read``."""
    if max_offsets < 1:
        # take would be 0 and the loop below would append empty no-progress
        # chunks forever
        raise ValueError(f"max_offsets must be >= 1, got {max_offsets}")
    chunks: list[tuple[dict[int, int], dict[int, int]]] = []
    cur = dict(start)
    for p in end:
        # a partition present in end but absent from start begins at 0 —
        # otherwise read()'s per-partition bounds would silently skip its
        # early records while the plan advanced past them
        cur.setdefault(p, 0)
    while True:
        backlog = {p: max(0, end.get(p, 0) - cur.get(p, 0)) for p in end}
        total = sum(backlog.values())
        if total == 0:
            return chunks
        take = min(total, max_offsets)
        nxt: dict[int, int] = {}
        remaining = take
        parts = [p for p in sorted(backlog) if backlog[p] > 0]
        for i, p in enumerate(parts):
            share = min(
                backlog[p],
                max(1, round(take * backlog[p] / total)) if i < len(parts) - 1 else remaining,
            )
            share = min(share, remaining)
            nxt[p] = cur.get(p, 0) + share
            remaining -= share
        for p in end:
            nxt.setdefault(p, cur.get(p, 0))
        chunks.append((dict(cur), dict(nxt)))
        cur = nxt


def stream(
    spark: SparkSession,
    path: str,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Streaming consumer of the topic log (the ``kafka.stream_topic``
    analog): Spark's file streaming source picks up newly produced files
    per micro-batch in discovery order. ``max_files_per_trigger`` is the
    W7 throttle lever here (each produce writes one file per touched
    partition, so it bounds records per trigger by the produce batch
    size); for exact offset budgeting use ``offset_chunks`` + ``read``
    micro-batches instead."""
    reader = spark.readStream.schema(RECORD_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.parquet(path)
