"""Env-gated phase timing for the micro-batch commit path.

``SURGE_PROFILE=1`` prints one stderr line per phase of
CommandEngine.process_batch / SnapshotStore.commit — the diagnostic that
localizes per-trigger fixed cost when the batch-ack SLO drifts (BASELINE
§3 declares ack ≤ 1 s per micro-batch). Zero overhead when unset: the
context manager short-circuits before any clock read.
"""

from __future__ import annotations

import os
import sys
import time
from contextlib import contextmanager

_ENABLED = os.environ.get("SURGE_PROFILE", "") not in ("", "0")


@contextmanager
def phase(name: str):
    if not _ENABLED:
        yield
        return
    t = time.perf_counter()
    try:
        yield
    finally:
        print(
            f"[surge-prof] {name}: {time.perf_counter() - t:.3f}s",
            file=sys.stderr,
            flush=True,
        )
