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


def test_changed_aware_selection():
    """--changed selection (VERDICT r14 task 5): changed/new entries are
    always selected; unchanged entries contribute a deterministic
    rotating ~10% sample (epoch-seeded — different epochs sample
    different subsets, so the sample alone re-covers the catalog over
    time); selection ∪ unchanged-unsampled == the full list (nothing
    silently dropped)."""
    from surge_spark.oracle import select_changed

    names = sorted(f"e{i:03d}" for i in range(100))
    hashes = {n: f"h_{n}" for n in names}
    # all stored and identical -> only the sample runs
    stored = dict(hashes)
    sel = select_changed(names, stored, hashes, epoch=1)
    assert len(sel) == 10
    assert sel == select_changed(names, stored, hashes, epoch=1)  # det.
    sel2 = select_changed(names, stored, hashes, epoch=2)
    assert sel != sel2  # rotates
    # round-robin GUARANTEE (review fix r15): any ceil(100/10)=10
    # CONSECUTIVE epochs cover every entry — not just eventually w.h.p.
    for base in (0, 3, 17):
        covered: set = set()
        for ep in range(base, base + 10):
            covered |= set(select_changed(names, stored, hashes, epoch=ep))
        assert covered == set(names), base
    # wrap-around slice is still exactly k entries
    assert len(select_changed(names, stored, hashes, epoch=9)) == 10
    # changed + new entries are always in
    stored2 = dict(stored)
    stored2["e007"] = "stale"
    del stored2["e042"]
    sel3 = select_changed(names, stored2, hashes, epoch=5)
    assert "e007" in sel3 and "e042" in sel3
    # selection is a subset of names, and union with the unchanged rest
    # reconstructs the full list (cover property)
    assert set(sel3) <= set(names)
    unchanged = [n for n in names if stored2.get(n) == hashes[n]]
    assert set(sel3) | set(unchanged) == set(names)


def test_entry_hash_stable_and_distinct():
    """entry_hash is deterministic per entry, differs across entries
    (builder source differs), and differs when the oracle differs —
    the change signal --changed keys on."""
    from surge_spark.oracle import entry_hash

    h1 = entry_hash("s2_point_lookup")
    assert h1 == entry_hash("s2_point_lookup")
    assert h1 != entry_hash("s3_key_prefix_range_scan")
