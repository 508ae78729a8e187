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
