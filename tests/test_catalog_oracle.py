"""Catalog-wide correctness: every declared query matches its DuckDB oracle
at sf0.001 (the driver's gate runs the same comparison at sf0.01).
Parametrized per query so a failure names the exact entry."""

from __future__ import annotations

import pytest

from surge_spark.oracle import compare
from surge_spark.queries import all_queries

# r16 fast-tier split (see pytest.ini): every-entry oracle mirror — the driver's own correctness gate re-runs this independently (CORRECTNESS_rN)
pytestmark = pytest.mark.slow

NAMES = sorted(all_queries())


@pytest.mark.parametrize("name", NAMES)
def test_query_matches_oracle(spark, sf_dir, name):
    ok, msg = compare(spark, name, sf_dir)
    assert ok, f"{name}: {msg}"
