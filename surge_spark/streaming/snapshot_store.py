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

State layout — key-hash buckets (the Delta MERGE analog):
the snapshot is partitioned into ``num_buckets`` buckets by
``crc32(key) % num_buckets``. A commit reads ONLY the buckets touched by the
batch's update/delete keys, merges them (broadcast anti-join of previous
rows against the touched key set — null-safe by construction — union the
updates), and writes just those buckets; the manifest maps every bucket to
either the freshly written directory or the previous version's directory.
Commit cost is O(touched buckets), not O(snapshot): at a 100 TB snapshot a
small batch rewrites a few buckets while the rest are referenced by path,
byte-identical. crc32 is used (not Spark's murmur3 ``hash``) because the
driver can compute the same value with ``zlib.crc32``, so point lookups
(get_state) read exactly one bucket with zero extra Spark jobs.

Deletions: ``commit(delete_keys=...)`` removes those keys during the bucket
merge without inserting replacement rows — the tombstone path for state
transitions to None (reference publishes the state change whenever
``state.stateOpt != result.state``, including to None).
"""

from __future__ import annotations

import json
import os
import time
import uuid
import zlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

_BUCKET_COL = "__bucket"


class SnapshotStore:
    def __init__(
        self, path: str, key_col: str = "aggregate_id", num_buckets: int = 64
    ) -> None:
        self.path = path
        self.key_col = key_col
        # effective bucket count is pinned by the first commit's manifest so
        # every later reader/writer agrees even if constructed differently
        self.default_num_buckets = num_buckets
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

    # -- bucketing ----------------------------------------------------------

    def _num_buckets(self, prev_manifest: dict | None) -> int:
        if prev_manifest is not None:
            return int(prev_manifest.get("num_buckets", self.default_num_buckets))
        return self.default_num_buckets

    def _bucket_expr(self, nb: int) -> F.Column:
        """JVM-side bucket id; mirrored driver-side by _bucket_of."""
        return F.pmod(
            F.crc32(F.col(self.key_col).cast("string").cast("binary")), F.lit(nb)
        ).cast("int")

    @staticmethod
    def _bucket_of(key: str, nb: int) -> int:
        """Driver-side mirror of _bucket_expr (zlib.crc32 == Spark crc32)."""
        return zlib.crc32(str(key).encode("utf-8")) % nb

    def _keys_df(
        self, spark: SparkSession, keys: list | DataFrame | None
    ) -> DataFrame | None:
        if keys is None:
            return None
        if isinstance(keys, DataFrame):
            col = keys.columns[0] if self.key_col not in keys.columns else self.key_col
            return keys.select(F.col(col).cast("string").alias(self.key_col))
        if not len(keys):
            return None
        return spark.createDataFrame(
            [(str(k),) for k in keys], f"{self.key_col} string"
        )

    def commit(
        self,
        events: DataFrame | None,
        state_updates: DataFrame,
        batch_id: str,
        update_keys: list | None = None,
        replies: DataFrame | None = None,
        delete_keys: list | DataFrame | None = None,
        records: DataFrame | None = None,
        updates_unique: bool = False,
    ) -> bool:
        """Atomically commit one micro-batch: append events, merge state
        updates into their key-hash buckets, publish a manifest. Returns
        False (no-op) if batch_id was already committed (R4 dedup).

        ``update_keys``: the distinct keys in ``state_updates`` when the
        caller already knows them — skips one small distinct() job deriving
        them from ``state_updates``.
        ``delete_keys``: keys to REMOVE from the snapshot (state → None
        tombstones); list or single-column DataFrame. A key must not appear
        in both ``state_updates`` and ``delete_keys``.
        ``records``: raw outbound producer records (the persistRecord
        surface, Context.scala:13-14) — appended like events, readable via
        read_records.
        ``updates_unique``: set True when the caller guarantees at most one
        row per key in ``state_updates`` (the engine's fold does) — skips
        the per-key dedup that otherwise enforces the snapshot's
        one-row-per-key invariant. Without the guarantee, duplicate-key
        update frames are deduped (arbitrary survivor); callers needing
        ordered latest-per-key semantics should pre-fold with
        operators.eventsourcing.latest_per_key (A2).

        A store written by the pre-bucketing layout (manifest key ``state``
        instead of ``state_buckets``) is migrated on its first commit here:
        the full legacy snapshot is read, merged, and rewritten bucketed.
        """
        if str(batch_id) in self.committed_batch_ids():
            return False
        prev = self.latest_version()
        version = (prev + 1) if prev is not None else 0
        prev_manifest = self._manifest(prev) if prev is not None else None
        nb = self._num_buckets(prev_manifest)
        # writer-unique staging dir: a concurrent committer targeting the
        # same version writes to its OWN directory, so losing the manifest
        # race (below) can never corrupt the winner's data — the loser's
        # directory is simply orphaned (vacuum reclaims it)
        token = uuid.uuid4().hex[:8]
        vdir = os.path.join(self.path, f"v{version:012d}-{token}")
        events_path = os.path.join(vdir, "events")
        state_path = os.path.join(vdir, "state")
        replies_path = os.path.join(vdir, "replies")
        records_path = os.path.join(vdir, "records")

        n_events = 0
        if events is not None:
            events.write.mode("overwrite").parquet(events_path)
            n_events = -1  # counted lazily by readers; avoid an extra job
        if replies is not None:
            replies.write.mode("overwrite").parquet(replies_path)
        if records is not None:
            records.write.mode("overwrite").parquet(records_path)

        spark = state_updates.sparkSession
        if self.key_col in state_updates.columns:
            # a NULL-key row would be written to the __HIVE_DEFAULT_PARTITION__
            # bucket, which the driver-side crc32 bucket math can never
            # address: the row could never be read back (get_state), updated,
            # or tombstoned, and the next commit writing another null-key row
            # would replace the bucket map entry and silently drop it. The
            # merge anti-join already treats null keys as un-matchable, so
            # they are filtered at the gate (plan-side, no extra job).
            state_updates = state_updates.where(F.col(self.key_col).isNotNull())
        if not updates_unique and state_updates.schema.fields:
            # enforce the one-row-per-key snapshot invariant on the update
            # set itself (get_state/read_state assume it); arbitrary
            # survivor — pre-fold with latest_per_key (A2) for ordered picks
            state_updates = state_updates.dropDuplicates([self.key_col])
        state_schema_json = state_updates.schema.json()
        if not state_updates.schema.fields and prev_manifest is not None:
            state_schema_json = prev_manifest.get("state_schema", state_schema_json)

        prev_buckets: dict[str, str] = (
            dict(prev_manifest.get("state_buckets", {})) if prev_manifest else {}
        )
        # pre-bucketing layout: single unbucketed state path — migrate by
        # merging the WHOLE legacy snapshot into this commit's bucketed write
        legacy_state = (
            prev_manifest.get("state")
            if prev_manifest is not None and "state_buckets" not in prev_manifest
            else None
        )
        if prev_manifest is None:
            # first commit: everything is new; one partitioned write
            touched: set[str] = set()  # no previous buckets to merge
            content = state_updates
        else:
            upd = self._keys_df(spark, update_keys)
            if upd is None:
                upd = state_updates.select(
                    F.col(self.key_col).cast("string").alias(self.key_col)
                ).distinct()
            dele = self._keys_df(spark, delete_keys)
            touched_keys = upd if dele is None else upd.unionByName(dele).distinct()
            touched_keys = touched_keys.where(F.col(self.key_col).isNotNull())
            touched = {
                str(r[0])
                for r in touched_keys.select(
                    self._bucket_expr(nb).alias("b")
                )
                .distinct()
                .collect()
            }
            if legacy_state is not None:
                # legacy store: no bucket map — every key lives in the one
                # unbucketed path, so the full snapshot is the merge input
                prev_paths = [legacy_state] if os.path.exists(legacy_state) else []
            else:
                prev_paths = [prev_buckets[b] for b in touched if b in prev_buckets]
            if prev_paths:
                prev_schema = T.StructType.fromJson(
                    json.loads(prev_manifest.get("state_schema", state_schema_json))
                )
                prev_touched = spark.read.schema(prev_schema).parquet(*prev_paths)
                # broadcast anti-join: previous rows of touched buckets whose
                # key is NOT updated/deleted survive. Null-safe (a NULL key
                # never equals a touched key, so null-key rows survive) —
                # unlike the NOT-IN literal filter this replaces.
                survivors = prev_touched.join(
                    F.broadcast(
                        touched_keys.select(
                            F.col(self.key_col).alias("__touched_key")
                        )
                    ),
                    prev_touched[self.key_col].cast("string")
                    == F.col("__touched_key"),
                    "left_anti",
                )
                content = survivors.unionByName(state_updates)
            else:
                content = state_updates

        # one distributed job writes every touched bucket (and any brand-new
        # bucket an insert lands in); untouched buckets are never read
        content.withColumn(_BUCKET_COL, self._bucket_expr(nb)).write.partitionBy(
            _BUCKET_COL
        ).mode("overwrite").parquet(state_path)

        new_buckets = dict(prev_buckets)
        for b in touched:
            new_buckets.pop(b, None)  # emptied unless rewritten below
        if os.path.isdir(state_path):
            for d in os.listdir(state_path):
                if d.startswith(f"{_BUCKET_COL}="):
                    b = d.split("=", 1)[1]
                    new_buckets[b] = os.path.join(state_path, d)

        manifest = {
            "version": version,
            "batch_id": str(batch_id),
            "events": events_path if events is not None else None,
            "state_buckets": new_buckets,
            "state_schema": state_schema_json,
            "num_buckets": nb,
            "replies": replies_path if replies is not None else None,
            "records": records_path if records is not None else None,
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

    @staticmethod
    def _state_paths(m: dict) -> dict[str, str]:
        """Bucket→path map of a manifest; a legacy (pre-bucketing) manifest
        exposes its single unbucketed path under a sentinel key so every
        reader/vacuum works on both layouts."""
        if "state_buckets" in m:
            return m["state_buckets"]
        return {"__legacy__": m["state"]} if m.get("state") else {}

    def read_state(
        self, spark: SparkSession, version: int | None = None
    ) -> DataFrame | None:
        """Latest committed snapshot (the KTable view, S1): the union of
        every bucket directory the manifest references. Returns None if no
        version was ever committed; an empty (all keys deleted) snapshot
        reads as an empty DataFrame with the stored schema.

        ``version`` time-travels to an older committed snapshot (the Delta
        ``versionAsOf`` analog — manifests are immutable and buckets are
        shared across versions, so an old version reads at full speed as
        long as vacuum() hasn't reclaimed its unshared buckets)."""
        v = self.latest_version() if version is None else int(version)
        if v is None:
            return None
        if version is not None and v not in self.committed_versions():
            raise ValueError(f"version {v} was never committed")
        m = self._manifest(v)
        schema = T.StructType.fromJson(json.loads(m["state_schema"]))
        paths = list(self._state_paths(m).values())
        if not paths:
            return spark.createDataFrame([], schema)
        return spark.read.schema(schema).parquet(*paths)

    def get_state(
        self, spark: SparkSession, aggregate_id: str, version: int | None = None
    ) -> dict | None:
        """Point read (S2 / §3.2 getState): bucket-pruned — computes the
        key's bucket driver-side (zlib.crc32) and scans only that bucket's
        files, O(snapshot/num_buckets) instead of O(snapshot). ``version``
        time-travels like read_state."""
        v = self.latest_version() if version is None else int(version)
        if v is None:
            return None
        if version is not None and v not in self.committed_versions():
            raise ValueError(f"version {v} was never committed")
        m = self._manifest(v)
        if "state_buckets" in m:
            bucket = self._bucket_of(aggregate_id, int(m["num_buckets"]))
            path = m["state_buckets"].get(str(bucket))
        else:
            # legacy unbucketed layout: no pruning possible — full scan
            path = m.get("state")
        if path is None:
            return None
        schema = T.StructType.fromJson(json.loads(m["state_schema"]))
        rows = (
            spark.read.schema(schema)
            .parquet(path)
            .where(F.col(self.key_col).cast("string") == str(aggregate_id))
            .limit(1)
            .collect()
        )
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

    def read_records(self, spark: SparkSession) -> DataFrame | None:
        """Raw producer records (persistRecord surface) across all committed
        versions — the outbound side-channel a Kafka egress job would drain."""
        paths = [
            m.get("records")
            for m in (self._manifest(v) for v in self.committed_versions())
            if m.get("records")
        ]
        existing = [p for p in paths if os.path.exists(p)]
        if not existing:
            return None
        return spark.read.parquet(*existing)

    # -- maintenance ---------------------------------------------------------

    def vacuum(self, keep_last: int = 10) -> list[int]:
        """Reclaim bucket directories not referenced by the last
        ``keep_last`` commits (the Delta VACUUM analog). Because versions
        share untouched bucket directories, reclamation is reference-counted:
        a bucket dir written by an old version but still referenced by a
        kept manifest is NOT removed. Event files are never removed — the
        event log is the source of truth for replay; manifests stay so the
        version history and batch-id dedup set remain intact. Returns the
        versions whose state data was (partially or fully) reclaimed."""
        import shutil

        versions = self.committed_versions()
        # the latest snapshot is never removable — keep_last=0 would
        # otherwise brick the store while manifests still advertise it
        keep = max(1, keep_last)
        kept = versions[-keep:]
        referenced = {
            p for v in kept for p in self._state_paths(self._manifest(v)).values()
        }
        removed = []
        for v in versions[:-keep]:
            reclaimed = False
            for p in self._state_paths(self._manifest(v)).values():
                if p not in referenced and os.path.exists(p):
                    shutil.rmtree(p)
                    reclaimed = True
            if reclaimed:
                removed.append(v)
        return removed
