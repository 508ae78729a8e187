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
