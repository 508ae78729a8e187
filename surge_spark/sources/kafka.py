"""Kafka source/sink wrappers (SURVEY §2.1 S1/S5/S6/S8).

Surge's Kafka usage maps 1:1 onto Spark's Kafka connector:

- raw consumer w/ offset bounds (S5, KafkaConsumer.scala:48-105)
  → ``read_topic`` (batch, startingOffsets/endingOffsets) and
    ``stream_topic`` (readStream)
- compacted state topic → KTable (S1, SurgeStateStoreConsumer.scala:57-76)
  → ``latest_per_key`` over the batch read, or the streaming fold
- partitioned producer (S6, KafkaProducer.scala:38-125)
  → ``write_topic``: the Kafka default partitioner routes by key, which is
    exactly surge's murmur3(key) % n placement (KafkaPartitioner.scala:8)
- single-record state publish (S8) → plain append write
- the transactional two-topic publish (S7) is NOT reproduced on Kafka —
  Spark's Kafka sink is at-least-once. The engine's source of truth is the
  SnapshotStore commit (streaming/snapshot_store.py); Kafka egress is an
  optional idempotent re-publish, deduplicated on read via batch_id (R4).

Neither a broker nor the spark-sql-kafka connector JAR exists in the test
environment (deploy with
``--packages org.apache.spark:spark-sql-kafka-0-10_2.13:<spark-version>``),
so these wrappers are import- and signature-tested only; the option surface
follows the spark-kafka integration docs. The SEMANTICS behind them
(offset-bounded reads, key-routed partition placement with contiguous
offsets, compacted state tables with tombstones, consumer lag, throttled
micro-batch bounds) are executable and pytest-verified against the
file-backed topic-log double in ``surge_spark.sources.filelog``.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.eventsourcing import latest_per_key

# producer perf defaults carried over from the reference's envelope
# (reference.conf:111-126: lz4, linger 5ms, batch 16384) — passed through as
# kafka.* producer options on the sink
PRODUCER_OPTIONS = {
    "kafka.compression.type": "lz4",
    "kafka.linger.ms": "5",
    "kafka.batch.size": "16384",
}


def read_topic(
    spark: SparkSession,
    bootstrap: str,
    topic: str,
    starting_offsets: str = "earliest",
    ending_offsets: str = "latest",
) -> DataFrame:
    """S5 batch read with offset bounds; columns follow SerializedMessage
    (key, value bytes, headers — SerializedMessage.scala:6) plus
    partition/offset/timestamp for ordering and watermark predicates (P5)."""
    return (
        spark.read.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        .option("endingOffsets", ending_offsets)
        .option("includeHeaders", "true")
        .load()
    )


def stream_topic(
    spark: SparkSession,
    bootstrap: str,
    topic: str,
    max_offsets_per_trigger: int | None = None,
) -> DataFrame:
    """Streaming consumer; maxOffsetsPerTrigger is the W7 throttle analog
    (Health.scala:291-315 / reference.conf:237-240)."""
    reader = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap)
        .option("subscribe", topic)
        .option("includeHeaders", "true")
    )
    if max_offsets_per_trigger:
        reader = reader.option("maxOffsetsPerTrigger", str(max_offsets_per_trigger))
    return reader.load()


def state_table(
    spark: SparkSession, bootstrap: str, state_topic: str
) -> DataFrame:
    """S1: materialize the compacted state topic as latest-value-per-key —
    the KTable build. Tombstones (null values) delete the key, matching
    log-compaction semantics."""
    raw = read_topic(spark, bootstrap, state_topic)
    latest = latest_per_key(
        raw.select("key", "value", "partition", "offset"),
        ["key"],
        ["partition", "offset"],
    )
    return latest.where(F.col("value").isNotNull())


def write_topic(
    df: DataFrame,
    bootstrap: str,
    topic: str,
    batch_id: str | None = None,
) -> None:
    """S6/S8 producer sink. Key-partitioned by Kafka's default partitioner
    (same placement family as KafkaPartitioner.scala:8). When ``batch_id``
    is given it is stamped into headers so downstream consumers can dedup
    replays (R4 idempotent publish) — Spark's Kafka sink alone is
    at-least-once."""
    cols = [F.col("key").cast("binary").alias("key"), F.col("value").cast("binary").alias("value")]
    if batch_id is not None:
        cols.append(
            F.array(
                F.struct(
                    F.lit("batch_id").alias("key"),
                    F.lit(batch_id.encode()).alias("value"),
                )
            ).alias("headers")
        )
    writer = (
        df.select(*cols)
        .write.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap)
        .option("topic", topic)
        .option("includeHeaders", "true")
    )
    for k, v in PRODUCER_OPTIONS.items():
        writer = writer.option(k, v)
    writer.save()


def consumer_lag(query_progress: dict) -> dict[str, int]:
    """S9: consumer-group lag from StreamingQuery.lastProgress (the
    KTableLagChecker analog, KafkaProducerActorImpl.scala:704-708)."""
    lags: dict[str, int] = {}
    for src in query_progress.get("sources", []):
        try:
            latest = json.loads(src.get("latestOffset") or "{}")
            end = json.loads(src.get("endOffset") or "{}")
        except (TypeError, ValueError):
            continue
        if not isinstance(latest, dict) or not isinstance(end, dict):
            continue  # scalar-offset sources (rate, file) carry no lag map
        for topic, parts in latest.items():
            if not isinstance(parts, dict):
                continue
            for p, off in parts.items():
                done = end.get(topic, {}).get(p, 0)
                lags[f"{topic}-{p}"] = max(0, int(off) - int(done))
    return lags
