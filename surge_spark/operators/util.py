"""Shared scale utilities used across operator families."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

def measured_broadcast(
    df: DataFrame,
    key_col: str,
    max_bytes: int = 64 << 20,
    row_overhead: int = 32,
) -> tuple[DataFrame, int]:
    """Byte-gated broadcast hint over an ALREADY-MATERIALIZED frame
    (localCheckpoint/persist — the measuring action would otherwise
    recompute the subtree once more for the join).

    Explicit ``F.broadcast`` hints are honored UNCONDITIONALLY — AQE's
    size-based demotion applies only to its own SMJ→BHJ conversions,
    never to user hints — so a hint must be gated on MEASURED size or it
    is a driver-OOM lever at scale. A row-count gate (r10's
    ``broadcast_keep_max=20M``) mis-sizes arbitrarily wide keys: 20M
    rows is 160 MB of longs but multiple GB of URL-length strings. This
    measures rows and key bytes in ONE aggregate action and estimates
    the broadcast relation as ``key_bytes + row_overhead·rows`` (the
    JVM hash-relation per-entry overhead dwarfs a narrow key).

    Returns ``(frame, n_rows)`` where the frame carries the hint iff the
    estimate fits ``max_bytes`` — callers that already need the row
    count (kcore's convergence probe) get it from the same action."""
    stats = df.agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum(F.octet_length(F.col(key_col).cast("string"))).alias("_w"),
    ).collect()[0]
    n = stats["_n"]
    est = (stats["_w"] or 0) + row_overhead * n
    return (F.broadcast(df) if est <= max_bytes else df), n


def fixpoint_loop(
    *,
    state: DataFrame,
    transition,
    initial_probe,
    max_rounds: int,
    op_name: str,
    exhausted_msg: str,
    probe=None,
    pre_probe=None,
    eager: bool = False,
):
    """The iterative-graph fixpoint discipline, factored once (r11 VERDICT
    task 7 — kcore/CC/LPA each hand-rolled it, so a scan-amplification fix
    like r11's LPA wedge-join checkpoint had to be found three times):

    - every round's new state frame is localCheckpoint-materialized before
      the next round references it (a lazy chain re-evaluates every prior
      round ~3x — the measured kcore A/B), and the PREVIOUS frame is
      unpersisted only after the checkpoint exists (checkpoint blocks
      survive unpersist, so later evaluation reads blocks, never recomputes);
    - ONE tiny driver action per round (a count or an xxhash64 checksum —
      never a collect of data), riding the new frame's materialization;
    - convergence = probe equality with the previous round; ``rounds``
      counts STATE-CHANGING rounds (a converged exit's final no-op round
      is not counted — the kcore/LPA convention the SQL oracles mirror);
    - ``max_rounds`` exhaustion WARNS and is machine-checkable as
      ``converged is False`` (equivalently rounds == max_rounds): the
      result is a truncated iteration, not a fixpoint.

    Two probe shapes, exactly one of which must be supplied:

    ``probe(next_state) -> value`` — probe AFTER the transition (CC / LPA:
    the label checksum). Per round: ``nxt = transition(state,
    None).localCheckpoint(eager)``, probe, swap, compare.

    ``pre_probe(state) -> (derived, value)`` — probe BEFORE paying the
    transition (kcore: the surviving-node count, whose aggregate the
    transition's semi-joins then REUSE via ``derived``). On probe equality
    the loop breaks with ``state`` untouched — the converged round's
    transition is never built, so the returned frame carries no dead
    final-round join. ``derived`` is passed to ``transition(state,
    derived)``.

    Returns ``(state, rounds, converged)``.
    """
    import warnings

    if (probe is None) == (pre_probe is None):
        raise ValueError("exactly one of probe / pre_probe is required")
    prev = initial_probe
    rounds = 0
    converged = False
    for _ in range(max_rounds):
        if pre_probe is not None:
            derived, cur = pre_probe(state)
            if cur == prev:
                converged = True
                break
            nxt = transition(state, derived).localCheckpoint(eager=eager)
            state.unpersist()
            state, prev = nxt, cur
            rounds += 1
        else:
            nxt = transition(state, None).localCheckpoint(eager=eager)
            cur = probe(nxt)
            state.unpersist()
            state = nxt
            if cur == prev:
                converged = True
                break
            prev = cur
            rounds += 1
    if not converged:
        warnings.warn(
            f"{op_name} stopped after max_rounds={max_rounds} without "
            f"reaching a fixpoint; {exhausted_msg}",
            RuntimeWarning,
            stacklevel=2,
        )
    return state, rounds, converged
