"""SurgeContext — the context-aware handler surface (U4) and async models
(U3), mirroring the reference's scaladsl contracts:

- ``Context[State, Event]`` builder API: persistEvent(s), persistToTopic,
  persistRecord(s), updateState, reply, reject
  (modules/command-engine/scaladsl/common/Context.scala:9-21,
  core SurgeContextImpl: internal/domain/AggregateProcessingModel.scala:36-64)
- ``ContextAwareAggregateCommandModel.processCommand(ctx, state, cmd) -> ctx``
  (scaladsl/command/CommandModels.scala:59-62)
- ``AsyncAggregateCommandModel``: Future-returning handlers
  (CommandModels.scala:33-56) — Python coroutines here, awaited per key
  inside the distributed fold.

The context is immutable like the reference's (each call returns a new
context), so a handler can branch and return whichever chain it built.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence
from dataclasses import dataclass, field, replace
from typing import Any


@dataclass(frozen=True)
class ProducerRecord:
    """A raw outbound record (persistRecord surface) — topic/key/value like
    Kafka's ProducerRecord[String, Array[Byte]], with the value kept as an
    opaque string (pre-serialized by the caller, SerializedMessage.scala:6)."""

    topic: str
    key: str | None
    value: str


@dataclass(frozen=True)
class SurgeContext:
    """Accumulates a handler's decisions; the engine lowers it to state /
    event / record / reply rows after the handler returns.

    ``events`` holds (event, topic_or_None) pairs — None means the engine's
    default events output (persistEvent); a string routes the event to that
    topic (persistToTopic), carried through commit as the ``_topic`` column.
    ``side_effects`` are callables of the command's resulting state, run
    executor-side immediately after the command that registered them (the
    reference fires a context's sideEffects per handled message). Delivery
    is at-least-once: they run even if the batch's commit subsequently
    fails — the same caveat any foreachBatch sink has.
    """

    state: dict | None = None
    events: tuple[tuple[dict, str | None], ...] = ()
    records: tuple[ProducerRecord, ...] = ()
    side_effects: tuple[Callable[[dict | None], None], ...] = ()
    rejected: bool = False
    rejection: Any = None
    reply_fn: Callable[[dict | None], Any] | None = None

    # -- builder API (Context.scala:10-17) --------------------------------

    def persist_event(self, event: dict) -> "SurgeContext":
        return replace(self, events=self.events + ((event, None),))

    def persist_events(self, events: Sequence[dict]) -> "SurgeContext":
        return replace(self, events=self.events + tuple((e, None) for e in events))

    def persist_to_topic(self, event: dict, topic: str) -> "SurgeContext":
        return replace(self, events=self.events + ((event, topic),))

    def persist_to_topics(
        self, events_with_topics: Sequence[tuple[dict, str]]
    ) -> "SurgeContext":
        return replace(
            self, events=self.events + tuple((e, t) for e, t in events_with_topics)
        )

    def persist_record(self, record: ProducerRecord) -> "SurgeContext":
        return replace(self, records=self.records + (record,))

    def persist_records(self, records: Sequence[ProducerRecord]) -> "SurgeContext":
        return replace(self, records=self.records + tuple(records))

    def update_state(self, state: dict | None) -> "SurgeContext":
        return replace(self, state=state)

    def reply(self, reply_fn: Callable[[dict | None], Any]) -> "SurgeContext":
        """Customize the ACK payload: ``reply_fn(final_state)`` is serialized
        into the reply row's ``reply`` column (default ACK carries the new
        state either way)."""
        return replace(self, reply_fn=reply_fn)

    def reject(self, rejection: Any) -> "SurgeContext":
        """Mark the command rejected; nothing persists
        (PersistentActor.scala:203-205) and the ACK carries ``rejection``."""
        return replace(self, rejected=True, rejection=rejection)

    def side_effect(self, fn: Callable[[dict | None], None]) -> "SurgeContext":
        return replace(self, side_effects=self.side_effects + (fn,))


# handler signature of the context-aware model (CommandModels.scala:60):
#   (ctx, state | None, command) -> SurgeContext   (sync or async)
ContextCommandHandler = Callable[[SurgeContext, dict | None, dict], SurgeContext]
