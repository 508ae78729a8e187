"""Structured Streaming layer: the surge-semantics runtime.

- ``snapshot_store``: atomic {events, state} commit + latest-state table
  (replaces surge's Kafka-transaction two-topic publish, S7/R4/R5)
- ``command_engine``: per-key command processing with user handlers
  (PersistentActor pipeline, §3.1) over micro-batches
- ``context``: SurgeContext builder for context-aware/async handler models
  (U3/U4, scaladsl Context.scala / CommandModels.scala)
- ``fold``: stateful per-key event fold across batches
  (applyInPandasWithState; the SurgeEvent engine, §3.3)
- ``windows``: health-signal window analytics (W1-W8)
- ``metrics``: streaming sensor statistics (A3-A7)
- ``multilanguage``: proto-shaped gateway + business-logic bridge over
  opaque bytes payloads (U7, §3.4, multilanguage-protocol.proto)
"""
