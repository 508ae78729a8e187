"""Connected-components semantics: label = min reachable id, chains force
multiple propagation rounds, pointer jumping converges, and the
pairs→clusters composition elects canonical keepers with singletons kept."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from surge_spark.operators import dedup as dd
from surge_spark.operators.graph import connected_components


def _edges(spark, pairs):
    return spark.createDataFrame(
        pd.DataFrame(pairs, columns=["id_a", "id_b"])
    )


def test_connected_components_basic(spark):
    # two components: {1,2,3,7} via a chain, {10,11}
    out = (
        connected_components(_edges(spark, [(2, 1), (2, 3), (3, 7), (10, 11)]))
        .toPandas()
        .set_index("id")["component"]
        .to_dict()
    )
    assert out == {1: 1, 2: 1, 3: 1, 7: 1, 10: 10, 11: 10}


def test_connected_components_long_chain(spark):
    # a 40-node path: worst case for plain propagation (diameter 39);
    # pointer jumping must converge well inside max_iterations=25
    chain = [(i, i + 1) for i in range(40)]
    out = connected_components(_edges(spark, chain)).toPandas()
    assert set(out["component"]) == {0}
    assert len(out) == 41


def test_connected_components_self_loops_and_dups(spark):
    out = (
        connected_components(_edges(spark, [(5, 5), (1, 2), (2, 1), (1, 2)]))
        .toPandas()
        .set_index("id")["component"]
        .to_dict()
    )
    # self-loop-only vertex 5 is dropped as isolated (documented contract)
    assert out == {1: 1, 2: 1}


def test_dedup_clusters_composition(spark):
    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1, 2, 3, 4, 5], "text": ["x"] * 5})
    )
    pairs = _edges(spark, [(1, 2), (2, 3)])
    out = (
        dd.dedup_clusters(docs, "doc_id", pairs)
        .orderBy("id")
        .toPandas()
    )
    assert list(out["component"]) == [1, 1, 1, 4, 5]
    assert list(out["cluster_size"]) == [3, 3, 3, 1, 1]
    assert list(out["is_canonical"]) == [True, False, False, True, True]


def test_pagerank_fixed_mass_and_symmetry(spark):
    """PageRank sanity on a known graph: a 4-node path a-b-c-d. Rank mass
    sums to ~1 every iteration (symmetrized graph has no dangling nodes),
    ends are symmetric, and middles outrank ends."""
    from surge_spark.operators.graph import pagerank_fixed

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4)], "src long, dst long"
    )
    r = {
        row.node: row.rank
        for row in pagerank_fixed(edges, iters=5).collect()
    }
    assert abs(sum(r.values()) - 1.0) < 1e-9
    assert abs(r[1] - r[4]) < 1e-12 and abs(r[2] - r[3]) < 1e-12
    assert r[2] > r[1]


def test_kcore_converged_fixpoint_and_checkpointed_rounds(spark):
    """g_kcore_converged: (a) the result IS a fixpoint — peeling it once
    more changes nothing and every survivor's degree is ≥ k; (b) the
    returned plan reads the checkpointed final round (Scan ExistingRDD),
    never re-deriving the whole peel chain from the lineitem scan — the
    iterative-graph discipline that keeps round N's plan O(1) deep."""
    from surge_spark.queries import all_queries
    from pyspark.sql import functions as F

    sf = "/root/testdata/sf0.001"
    df = all_queries()["g_kcore_converged"](spark, sf)
    rows = df.collect()
    assert rows, "5-core empty at sf0.001 — pick a smaller k"
    rounds = {r.rounds for r in rows}
    assert len(rounds) == 1 and rounds.pop() >= 1
    assert min(r.degree for r in rows) >= 5  # fixpoint: all survivors ≥ k
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "ExistingRDD" in plan, plan  # checkpoint-backed final round
    assert "lineitem" not in plan, plan  # lineage cut — no re-derivation


def test_kcore_converged_zero_degree_straggler(spark):
    """The node-vs-edge fixpoint divergence, pinned on a constructed graph
    (r9 VERDICT item 1): o3 has exactly k=2 neighbors (p3, p4), each of
    degree 1. Peel 1 drops p3/p4 — o3 survives (its degree WAS >= k) but
    now has zero edges, so the EDGE set is already at its fixpoint while
    the NODE set still changes once more (o3 leaves in peel 2). An
    edge-count convergence probe reports rounds=1; the node-list oracle
    — and kcore_converged — report rounds=2. The DuckDB recursion below
    is the g_kcore_converged oracle re-parameterized to this graph."""
    import duckdb
    from surge_spark.operators.graph import kcore_converged

    pairs = [
        ("o1", "p1"), ("o1", "p2"), ("o2", "p1"), ("o2", "p2"),
        ("o3", "p3"), ("o3", "p4"),
    ]
    edges = spark.createDataFrame(pd.DataFrame(pairs, columns=["src", "dst"]))
    # both code paths — the per-side default and the one-aggregate
    # bipartite fast path (what the catalog entry runs) — must agree on
    # the straggler semantics AND the surviving edge set
    for bip in (False, True):
        final, rounds = kcore_converged(edges, 2, bipartite=bip)
        assert rounds == 2, f"bipartite={bip}"
        assert sorted(map(tuple, final.select("src", "dst").collect())) == [
            ("o1", "p1"), ("o1", "p2"), ("o2", "p1"), ("o2", "p2")
        ], f"bipartite={bip}"

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE e AS SELECT * FROM (VALUES %s) t(src, dst)"
        % ", ".join("('%s','%s')" % p for p in pairs)
    )
    oracle_it = con.execute(
        """
        WITH RECURSIVE
        sym AS (SELECT src, dst FROM e UNION ALL SELECT dst, src FROM e),
        core(it, nodes) AS (
          SELECT 0, (SELECT list(DISTINCT src ORDER BY src) FROM sym)
          UNION ALL
          SELECT core.it + 1, nxt.lst
          FROM core, LATERAL (
            SELECT list(node ORDER BY node) AS lst FROM (
              SELECT s.src AS node
              FROM sym s
              JOIN (SELECT unnest(core.nodes) AS n) a ON a.n = s.src
              JOIN (SELECT unnest(core.nodes) AS n) b ON b.n = s.dst
              GROUP BY s.src HAVING count(*) >= 2
            )
          ) nxt
          WHERE core.it < 30 AND nxt.lst IS DISTINCT FROM core.nodes
        )
        SELECT max(it) FROM core
        """
    ).fetchone()[0]
    assert oracle_it == rounds == 2


def test_cc_converged_constructed_components(spark):
    """g_cc_converged's operator contract on a constructed graph: a long
    chain (forces several propagate rounds), a triangle, and a 2-node
    island — labels are the component-min everywhere, and the co-purchase
    edge derivation (>= 2 shared orders) only keeps repeat pairs."""
    chain = [(i, i + 1) for i in range(10, 17)]  # component min 10
    tri = [(30, 31), (31, 32), (30, 32)]  # min 30
    island = [(50, 51)]  # min 50
    out = connected_components(_edges(spark, chain + tri + island)).collect()
    comp = {r.id: r.component for r in out}
    assert all(comp[i] == 10 for i in range(10, 18))
    assert all(comp[i] == 30 for i in (30, 31, 32))
    assert comp[50] == comp[51] == 50

    # edge derivation: pairs co-ordered once must NOT edge (threshold 2)
    li = spark.createDataFrame(
        pd.DataFrame(
            [
                (1, 101), (1, 102),  # once together
                (2, 103), (2, 104),
                (3, 103), (3, 104),  # 103-104 twice -> edge
            ],
            columns=["l_orderkey", "l_partkey"],
        )
    )
    d = li.distinct()
    a = d.withColumnsRenamed({"l_partkey": "pa"})
    b = d.withColumnsRenamed({"l_partkey": "pb"})
    edges = (
        a.join(b, "l_orderkey")
        .where(F.col("pa") < F.col("pb"))
        .groupBy("pa", "pb")
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") >= 2)
        .select("pa", "pb")
    )
    got = {(r.pa, r.pb) for r in edges.collect()}
    assert got == {(103, 104)}


def test_kcore_converged_warns_on_max_rounds_truncation(spark):
    """ADVICE r10: a max_rounds-exhausted exit is a TRUNCATED peel, not a
    k-core, and must be distinguishable — RuntimeWarning is raised and
    rounds == max_rounds is the machine-checkable sentinel (a converged
    exit always breaks with rounds < max_rounds)."""
    import warnings as _warnings
    from surge_spark.operators.graph import kcore_converged

    # a 3-link chain peels one leaf-edge per round under k=2: needs 3+
    # node-set-changing rounds, so max_rounds=1 must truncate loudly
    pairs = [("o1", "p1"), ("o2", "p1"), ("o2", "p2"), ("o3", "p2")]
    edges = spark.createDataFrame(pd.DataFrame(pairs, columns=["src", "dst"]))
    with _warnings.catch_warnings(record=True) as caught:
        _warnings.simplefilter("always")
        _, rounds = kcore_converged(edges, 2, max_rounds=1, bipartite=True)
    assert rounds == 1
    assert any(
        issubclass(w.category, RuntimeWarning) and "truncated peel" in str(w.message)
        for w in caught
    )
    # converged run on the same graph: no warning, sentinel clear
    with _warnings.catch_warnings(record=True) as caught2:
        _warnings.simplefilter("always")
        final, rounds2 = kcore_converged(edges, 2, max_rounds=30, bipartite=True)
    assert rounds2 < 30 and not any(
        issubclass(w.category, RuntimeWarning) for w in caught2
    )


def test_measured_broadcast_gates_on_bytes_not_rows(spark):
    """r10 VERDICT #4: explicit broadcast hints are honored
    unconditionally, so the gate must be measured BYTES — a row-count
    gate passes arbitrarily wide keys. Same row count, different key
    widths, same budget: narrow keeps the hint, wide drops it."""
    from surge_spark.operators.graph import measured_broadcast

    narrow = spark.createDataFrame(
        [(f"k{i}",) for i in range(100)], "n string"
    ).localCheckpoint()
    wide = spark.createDataFrame(
        [("x" * 2000 + str(i),) for i in range(100)], "n string"
    ).localCheckpoint()
    budget = 50_000  # narrow: ~300B keys + 3.2KB overhead; wide: ~200KB keys
    hinted, n1 = measured_broadcast(narrow, "n", max_bytes=budget)
    demoted, n2 = measured_broadcast(wide, "n", max_bytes=budget)
    assert n1 == n2 == 100
    assert "hint" in hinted._jdf.queryExecution().logical().toString().lower()
    assert "hint" not in demoted._jdf.queryExecution().logical().toString().lower()
    # and the hinted frame actually plans a broadcast join
    edges = spark.createDataFrame([("k1", "p1")], "src string, dst string")
    plan = (
        edges.join(hinted.select(F.col("n").alias("src")), "src", "left_semi")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Broadcast" in plan, plan


def test_lpa_converged_fixpoint_and_oscillation_guard(spark):
    """lpa_converged (r10 VERDICT #7): (a) two disjoint triangles collapse
    to one label each and the result IS a fixpoint — one more synchronous
    round changes nothing; (b) a single edge OSCILLATES under synchronous
    updates (the two endpoints swap labels forever) — the guard warns and
    rounds == max_rounds is the sentinel."""
    import warnings as _warnings
    from surge_spark.operators.graph import lpa_converged

    tri = [(1, 2), (2, 3), (1, 3), (10, 11), (11, 12), (10, 12)]
    e0 = spark.createDataFrame(pd.DataFrame(tri, columns=["src", "dst"]))
    sym = e0.unionByName(
        e0.selectExpr("dst as src", "src as dst")
    )
    with _warnings.catch_warnings(record=True) as caught:
        _warnings.simplefilter("always")
        labels, rounds = lpa_converged(sym, max_rounds=10)
    got = {r.node: r.label for r in labels.collect()}
    assert len({got[1], got[2], got[3]}) == 1
    assert len({got[10], got[11], got[12]}) == 1
    assert got[1] != got[10]
    assert rounds < 10 and not any(
        issubclass(w.category, RuntimeWarning) for w in caught
    )
    # fixpoint: one more deterministic-mode round is a no-op
    from pyspark.sql import functions as F
    nbr = sym.join(labels.withColumnsRenamed({"node": "dst"}), "dst").select(
        F.col("src").alias("v"), "label"
    )
    stepped = (
        nbr.groupBy("v", "label").agg(F.count(F.lit(1)).alias("cnt"))
        .groupBy("v")
        .agg(F.max_by("label", F.struct(F.col("cnt"), -F.col("label"))).alias("label"))
    )
    assert {(r.v, r.label) for r in stepped.collect()} == set(got.items())

    # single edge: synchronous swap 2-cycle, never stable
    edge = spark.createDataFrame(pd.DataFrame([(1, 2)], columns=["src", "dst"]))
    esym = edge.unionByName(edge.selectExpr("dst as src", "src as dst"))
    with _warnings.catch_warnings(record=True) as caught2:
        _warnings.simplefilter("always")
        _, r2 = lpa_converged(esym, max_rounds=4)
    assert r2 == 4
    assert any(
        issubclass(w.category, RuntimeWarning) and "label stability" in str(w.message)
        for w in caught2
    )
