"""Self-healing control loop (SURVEY W6/§4): the Spark-side analog of
surge's HealthSupervisorActor — watch streaming queries, record progress,
restart terminated queries with backoff.

Surge reacts to matched signal patterns by restarting registered components
(HealthSignalWindowActor.scala:373-377, supervisor HealthSupervisorActor);
its Kafka Streams wrapper restarts the stream on any error
(AggregateStateStoreKafkaStreams.scala:97-121 "Restart the stream on any
errors"). Here the restart unit is the StreamingQuery: a supervisor holds a
factory per query name and relaunches from the checkpoint on failure —
exactly-once state recovery comes from the checkpoint, so a restart is
semantically a supervisor-driven resume.
"""

from __future__ import annotations

import logging
import time
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql.streaming import StreamingQuery

log = logging.getLogger(__name__)


@dataclass
class SupervisedQuery:
    name: str
    factory: Callable[[], StreamingQuery]
    max_restarts: int = 5
    backoff_s: float = 1.0
    query: StreamingQuery | None = None
    restarts: int = 0
    history: list[str] = field(default_factory=list)


class QuerySupervisor:
    """Backoff-supervised restart of streaming queries (the
    BackoffSupervisor analog, reference.conf restart-backoff settings).
    ``poll`` is driven by the caller (a scheduler thread in production);
    each call checks liveness and restarts dead queries until the restart
    budget is exhausted — after which the query is left down and reported,
    mirroring surge's shutdown-after-max-retries behavior."""

    def __init__(self) -> None:
        self._entries: dict[str, SupervisedQuery] = {}

    def supervise(
        self,
        name: str,
        factory: Callable[[], StreamingQuery],
        max_restarts: int = 5,
        backoff_s: float = 1.0,
    ) -> SupervisedQuery:
        entry = SupervisedQuery(name, factory, max_restarts, backoff_s)
        entry.query = factory()
        entry.history.append("started")
        self._entries[name] = entry
        return entry

    def poll(self) -> dict[str, str]:
        """Check every supervised query; restart terminated ones. Returns
        {name: status} where status in {active, restarted, gave_up}."""
        statuses: dict[str, str] = {}
        for name, entry in self._entries.items():
            q = entry.query
            if q is not None and q.isActive:
                statuses[name] = "active"
                continue
            err = None
            if q is not None:
                try:
                    err = q.exception()
                except Exception:  # noqa: BLE001
                    err = None
            if entry.restarts >= entry.max_restarts:
                entry.history.append(f"gave_up: {err}")
                statuses[name] = "gave_up"
                continue
            time.sleep(entry.backoff_s * (2**entry.restarts))
            entry.restarts += 1
            entry.query = entry.factory()
            entry.history.append(f"restarted ({entry.restarts}): {err}")
            log.warning("restarted streaming query %s (attempt %d)", name, entry.restarts)
            statuses[name] = "restarted"
        return statuses

    def stop_all(self) -> None:
        for entry in self._entries.values():
            if entry.query is not None and entry.query.isActive:
                entry.query.stop()


# --- R9: partition-assignment change hook -----------------------------------


class PartitionAssignmentTracker:
    """R9 analog of KafkaConsumerPartitionAssignmentTracker
    (KafkaPartitionShardRouterActor.scala:110-123): surfaces the set of
    topic-partitions a streaming query is consuming and fires registered
    callbacks when it changes.

    Spark owns partition→task placement (there is no user-visible rebalance
    like a Kafka consumer group), so the observable signal is the source
    offset ranges in each progress event: partitions appear/disappear there
    when the source's assignment changes. Feed ``observe`` from a
    StreamingQueryListener.onQueryProgress (or poll query.lastProgress);
    callbacks get (old_assignment, new_assignment) as
    {topic: sorted partition ids}. Non-partitioned sources (files, rate)
    never fire — matching the reference, where the hook is Kafka-specific.
    """

    def __init__(self) -> None:
        self._last: dict[str, list[int]] = {}
        self._callbacks: list[Callable[[dict, dict], None]] = []

    def on_change(self, callback: Callable[[dict, dict], None]) -> None:
        self._callbacks.append(callback)

    @staticmethod
    def _assignment(progress: dict) -> dict[str, list[int]]:
        """Extract {topic: [partition, ...]} from a progress dict's source
        endOffsets (Kafka sources report {"topic": {"partition": offset}})."""
        import json as _json

        out: dict[str, list[int]] = {}
        for src in progress.get("sources", []):
            end = src.get("endOffset")
            if isinstance(end, str):
                try:
                    end = _json.loads(end)
                except ValueError:
                    continue
            if not isinstance(end, dict):
                continue
            for topic, parts in end.items():
                if isinstance(parts, dict):
                    ids = sorted(int(p) for p in parts if str(p).lstrip("-").isdigit())
                    if ids:
                        out[topic] = sorted(set(out.get(topic, [])) | set(ids))
        return out

    def observe(self, progress: dict) -> bool:
        """Process one progress event; returns True (and fires callbacks)
        if the assignment changed — including a shrink to EMPTY (full
        revocation), which must both fire and reset the tracked state so a
        later re-assignment of the same partitions fires again."""
        new = self._assignment(progress)
        if new == self._last:
            return False
        if not new and not progress.get("sources"):
            # no source info at all (e.g. a synthetic/empty progress dict):
            # not evidence of revocation — keep the last known assignment
            return False
        old, self._last = self._last, new
        for cb in self._callbacks:
            cb(old, new)
        return True


# --- R10: DR standby mode ----------------------------------------------------


class StandbyEngine:
    """R10 DR standby (KafkaPartitionShardRouterActor.scala:87,147-151,
    302-311): in standby, the node follows state indexing but does NOT
    process commands ("don't automatically create new partition regions");
    on activation it transitions to active mode and starts processing.

    Spark mapping: the state index is the snapshot store (the KTable), which
    the primary's commits advance. A standby node constructs the engine but
    does not start the command stream; ``poll()`` follows the store's
    committed versions (read-only — serving stale reads is permitted, like
    the reference's standby KTable). ``activate()`` starts the command
    stream via the supplied factory (run_stream from the shared checkpoint)
    exactly once and flips the node to active.
    """

    def __init__(self, store, stream_factory: Callable[[], StreamingQuery]) -> None:
        self._store = store
        self._factory = stream_factory
        self._query: StreamingQuery | None = None
        self.followed_versions: list[int] = []

    @property
    def is_standby(self) -> bool:
        return self._query is None

    def poll(self) -> int | None:
        """Follow mode: observe the primary's latest committed version
        (advancing our manifest caches so activation starts warm)."""
        v = self._store.latest_version()
        if v is not None and (
            not self.followed_versions or v > self.followed_versions[-1]
        ):
            self.followed_versions.append(v)
            # warm the dedup set so the first active batch doesn't rescan
            self._store.committed_batch_ids()
        return v

    def activate(self) -> StreamingQuery:
        """Standby → active transition (":310 Shard router transitioning
        from standby mode to active mode")."""
        if self._query is None:
            log.info("standby engine transitioning to active mode")
            self._query = self._factory()
        return self._query

    def stop(self) -> None:
        if self._query is not None and self._query.isActive:
            self._query.stop()
