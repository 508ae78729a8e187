"""Versioned atomic {events, state} store — the S7 replacement.

Surge publishes events + state snapshot in ONE Kafka transaction per 50 ms
flush (KafkaProducerActorImpl.scala:421-453). Spark's Kafka sink has no EOS
transactions, so the primary store here is a versioned table pair committed
under a single manifest: a commit is visible iff its manifest file exists,
and the manifest is written last via atomic rename. This is the same
commit-protocol shape Delta Lake uses (_delta_log JSON commits); on a real
deployment you'd swap this for two Delta tables written in one transaction
(or one table with a record_kind column). Kafka becomes ingress/egress, not
the transaction boundary.

Guarantees mapped from the reference:
- atomicity (S7): readers see either both the events and the state of a
  version, or neither — the manifest names both paths.
- idempotent publish (R4, PublishTracker KafkaProducerActorImpl.scala:249-275):
  commit() with an already-committed batch_id is a no-op.
- zombie fencing (R5): manifest writes are create-exclusive; a second writer
  for the same version loses.
- read-your-writes (R2): read_state() always reflects the latest committed
  version; within the engine, batch N+1 reads state committed by batch N.

State compaction: each commit folds the update set into the previous
snapshot with latest-per-key semantics (A2) and writes the full new snapshot.
At 100 TB the snapshot write becomes a Delta MERGE on a table partitioned by
key-hash bucket; the manifest protocol stays identical.
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.eventsourcing import latest_per_key


class SnapshotStore:
    def __init__(self, path: str, key_col: str = "aggregate_id") -> None:
        self.path = path
        self.key_col = key_col
        os.makedirs(os.path.join(path, "_manifests"), exist_ok=True)
        # manifests are immutable once linked, so cache parses; batch ids
        # accumulate incrementally — without this, every commit rescans all
        # manifests and the facade's one-commit-per-command usage is O(N^2)
        self._manifest_cache: dict[int, dict] = {}
        self._batch_id_cache: dict[int, str] = {}

    # -- commit protocol ----------------------------------------------------

    def _manifest_path(self, version: int) -> str:
        return os.path.join(self.path, "_manifests", f"v{version:012d}.json")

    def committed_versions(self) -> list[int]:
        d = os.path.join(self.path, "_manifests")
        return sorted(
            int(f[1:-5]) for f in os.listdir(d) if f.startswith("v") and f.endswith(".json")
        )

    def latest_version(self) -> int | None:
        versions = self.committed_versions()
        return versions[-1] if versions else None

    def _manifest(self, version: int) -> dict:
        cached = self._manifest_cache.get(version)
        if cached is None:
            with open(self._manifest_path(version)) as f:
                cached = json.load(f)
            self._manifest_cache[version] = cached
        return cached

    def committed_batch_ids(self) -> set[str]:
        for v in self.committed_versions():
            if v not in self._batch_id_cache:
                self._batch_id_cache[v] = str(self._manifest(v).get("batch_id"))
        return set(self._batch_id_cache.values())

    def commit(
        self,
        events: DataFrame | None,
        state_updates: DataFrame,
        batch_id: str,
        update_keys: list | None = None,
        replies: DataFrame | None = None,
    ) -> bool:
        """Atomically commit one micro-batch: append events, fold state
        updates into the snapshot, publish a manifest. Returns False (no-op)
        if batch_id was already committed (R4 dedup).

        ``update_keys``: the distinct keys in ``state_updates`` when the
        caller already knows them (the command engine does) — turns the
        snapshot merge into a narrow NOT-IN filter + union, i.e. zero extra
        Spark jobs. Without it, or beyond 10k keys, the merge falls back to
        a latest-per-key shuffle (the Delta-MERGE shape)."""
        if str(batch_id) in self.committed_batch_ids():
            return False
        prev = self.latest_version()
        version = (prev + 1) if prev is not None else 0
        # writer-unique staging dir: a concurrent committer targeting the
        # same version writes to its OWN directory, so losing the manifest
        # race (below) can never corrupt the winner's data — the loser's
        # directory is simply orphaned (vacuum reclaims it)
        token = uuid.uuid4().hex[:8]
        vdir = os.path.join(self.path, f"v{version:012d}-{token}")
        events_path = os.path.join(vdir, "events")
        state_path = os.path.join(vdir, "state")
        replies_path = os.path.join(vdir, "replies")

        n_events = 0
        if events is not None:
            events.write.mode("overwrite").parquet(events_path)
            n_events = -1  # counted lazily by readers; avoid an extra job
        if replies is not None:
            replies.write.mode("overwrite").parquet(replies_path)
        spark = state_updates.sparkSession
        if prev is not None:
            prev_state = spark.read.parquet(self._manifest(prev)["state"])
            if update_keys is not None and len(update_keys) <= 10_000:
                # driver-known keys: NOT-IN literal filter — narrow plan,
                # no dedup/broadcast jobs (latency path for command acks)
                new_state = prev_state.where(
                    ~F.col(self.key_col).isin(update_keys)
                ).unionByName(state_updates)
            else:
                # general path: one row per key wins, updates preferred —
                # the hand-rolled Delta MERGE whenMatched-update
                order_col = "_commit_seq"
                merged = prev_state.withColumn(order_col, F.lit(0)).unionByName(
                    state_updates.withColumn(order_col, F.lit(1))
                )
                new_state = latest_per_key(
                    merged, [self.key_col], [order_col]
                ).drop(order_col)
        else:
            new_state = state_updates
        new_state.write.mode("overwrite").parquet(state_path)

        manifest = {
            "version": version,
            "batch_id": str(batch_id),
            "events": events_path if events is not None else None,
            "state": state_path,
            "replies": replies_path if replies is not None else None,
            "n_events": n_events,
            "ts": time.time(),
        }
        tmp = self._manifest_path(version) + ".tmp"
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        try:
            # exclusive link = fencing: a concurrent writer of the same
            # version fails here (R5 analog of ProducerFencedException)
            os.link(tmp, self._manifest_path(version))
        except FileExistsError as e:
            os.unlink(tmp)
            raise RuntimeError(
                f"fenced: version {version} already committed by another writer"
            ) from e
        os.unlink(tmp)
        return True

    # -- read paths ----------------------------------------------------------

    def read_state(self, spark: SparkSession) -> DataFrame | None:
        """Latest committed snapshot (the KTable view, S1). Paths come from
        the manifest — only a committed writer's data is ever visible."""
        v = self.latest_version()
        if v is None:
            return None
        return spark.read.parquet(self._manifest(v)["state"])

    def get_state(self, spark: SparkSession, aggregate_id: str) -> dict | None:
        """Point read (S2 / §3.2 getState)."""
        state = self.read_state(spark)
        if state is None:
            return None
        rows = state.where(F.col(self.key_col) == aggregate_id).limit(1).collect()
        return rows[0].asDict() if rows else None

    def replies_for_batch(self, spark: SparkSession, batch_id: str) -> DataFrame | None:
        """ACK rows committed with ``batch_id`` — lets a replayed batch
        recover its replies instead of refolding commands (§3.1.9 under
        at-least-once foreachBatch delivery)."""
        for v in self.committed_versions():
            m = self._manifest(v)
            if str(m.get("batch_id")) == str(batch_id) and m.get("replies"):
                if os.path.exists(m["replies"]):
                    return spark.read.parquet(m["replies"])
                return None
        return None

    def read_events(self, spark: SparkSession) -> DataFrame | None:
        """Full append-only event log across all committed versions."""
        paths = [
            m["events"]
            for m in (self._manifest(v) for v in self.committed_versions())
            if m["events"]
        ]
        existing = [p for p in paths if os.path.exists(p)]
        if not existing:
            return None
        return spark.read.parquet(*existing)

    # -- maintenance ---------------------------------------------------------

    def vacuum(self, keep_last: int = 10) -> list[int]:
        """Drop snapshot data of versions older than the last ``keep_last``
        commits (the Delta VACUUM analog). Event files are never removed —
        the event log is the source of truth for replay; only superseded
        full-state snapshots are reclaimed. Manifests stay so the version
        history and batch-id dedup set remain intact."""
        import shutil

        versions = self.committed_versions()
        # the latest snapshot is never removable — keep_last=0 would
        # otherwise brick the store while manifests still advertise it
        keep = max(1, keep_last)
        removable = versions[:-keep]
        removed = []
        for v in removable:
            state_dir = self._manifest(v)["state"]
            if os.path.exists(state_dir):
                shutil.rmtree(state_dir)
                removed.append(v)
        return removed
