"""Pins the driver contract in __spark_entry__.py: entry() produces rows
with a stable schema, every oracle key has a query, and every query is
callable with (spark, sf_dir). A break here fails the driver's t1 smoke
before it fails CORRECTNESS."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import __spark_entry__ as entry_mod  # noqa: E402


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert df.schema.simpleString() == (
        "struct<n_name:string,revenue:double,n_items:bigint>"
    )


def test_catalog_contract(spark, sf_dir):
    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    assert len(queries) >= 78
    # every oracle belongs to a declared query
    assert set(oracles) <= set(queries)
    # oracle-less entries are the documented hash/order-dependent set only
    rows_only = set(queries) - set(oracles)
    # es_bank_fold graduated to a recursive-CTE oracle in round 3; the
    # k-means sim entries graduated via injected fixed centroids in round 5;
    # sim_ann_lsh_topk graduated in round 6 (its LCG hyperplanes render as
    # literals into the SQL), d_simhash_fingerprints gained a
    # value-oracled md5 twin, and mm_feature_extract graduated in round 11
    # (constructed 3x2 BMP payloads route the REAL decoder under exact
    # integer channel sums) — what remains is unoracleable by construction
    # (xxhash64/HLL/env-gated, see the registry docstring in
    # surge_spark/queries/__init__.py)
    assert rows_only == {
        "a_approx_count_distinct",
        "d_minhash_lsh_neardup",
        "d_minhash_lsh_neardup_unpruned",
        "d_simhash_fingerprints",
        "f_partition_for_key",
    }
    # callables execute and yield DataFrames (smoke one cheap entry)
    assert queries["s2_point_lookup"](spark, sf_dir).count() >= 0


def test_oracle_shard_partition():
    """--shard i/n shards are disjoint, cover the full sorted name list,
    and are deterministic (VERDICT r12 task 7)."""
    import pytest

    from surge_spark.oracle import shard_names
    from surge_spark.queries import all_queries

    names = sorted(all_queries())
    for n in (2, 3, 7):
        shards = [shard_names(names, i, n) for i in range(1, n + 1)]
        combined = sorted(x for s in shards for x in s)
        assert combined == names
        assert shards == [shard_names(names, i, n) for i in range(1, n + 1)]
    with pytest.raises(ValueError):
        shard_names(names, 0, 2)
    with pytest.raises(ValueError):
        shard_names(names, 3, 2)
