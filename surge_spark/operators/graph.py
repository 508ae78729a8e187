"""Distributed graph primitives needed by the dedup pipeline.

Near-dup detection emits PAIRS; an actual dedup pass needs CLUSTERS (pick
one canonical doc per connected component of the similarity graph). This
module provides connected components as iterative DataFrame joins — the
alternating propagate / pointer-jump scheme (hash-to-min family, cf.
Kiveris et al., "Connected Components in MapReduce and Beyond", SoCC'14):

- propagate: every node adopts the minimum label among itself and its
  neighbors (one join + partial/final min aggregate);
- pointer-jump: every node re-reads the label OF its label (one join),
  which halves chain depth and gives O(log d) rounds instead of O(d).

Scale notes (100 TB): each round is two shuffles on the node id — no
collect, no driver state. The label frame is localCheckpoint()ed each
round: iterative self-joins otherwise double the logical plan per round
and Catalyst analysis cost explodes by round ~8 (on a cluster with an HDFS
checkpoint dir, swap in `df.checkpoint()` for executor-loss resilience).
Convergence is detected with a one-row checksum aggregate
(sum(xxhash64(id, label))) instead of a changed-rows join — one cheap
action per round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .util import fixpoint_loop, measured_broadcast  # noqa: F401 — measured_broadcast re-exported; kcore gates on it


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iterations: int = 25,
) -> DataFrame:
    """Label every vertex of the undirected graph `edges` with the minimum
    vertex id reachable from it. Returns (id, component).

    Vertices are whatever appears in either endpoint column; ids need a
    total order (numeric or string). Isolated vertices simply don't appear
    — union them back from the entity table if singleton components matter
    (dedup_clusters below does exactly that).
    """
    sym = edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    sym = (
        sym.unionByName(sym.select(F.col("v").alias("u"), F.col("u").alias("v")))
        .where(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    comp = sym.select(F.col("u").alias("id")).distinct().select(
        "id", F.col("id").alias("comp")
    ).localCheckpoint(eager=True)

    def checksum(c: DataFrame) -> int:
        # decimal(38,0) sum: a long sum of 2^63-range hashes overflows under
        # ANSI mode
        row = c.agg(
            F.sum(F.xxhash64("id", "comp").cast("decimal(38,0)")).alias("s")
        ).first()
        return int(row["s"] or 0)

    def transition(c: DataFrame, _derived) -> DataFrame:
        nbr = (
            sym.join(
                c.withColumnsRenamed({"id": "v", "comp": "vcomp"}), "v"
            )
            .groupBy("u")
            .agg(F.min("vcomp").alias("nmin"))
            .withColumnRenamed("u", "id")
        )
        stepped = c.join(nbr, "id", "left").select(
            "id", F.least("comp", F.coalesce("nmin", "comp")).alias("comp")
        )
        # pointer jump: comp := comp[comp] (labels are node ids, so the
        # label's own row exists whenever the label is a non-root node)
        return (
            stepped.alias("a")
            .join(
                stepped.select(
                    F.col("id").alias("comp"), F.col("comp").alias("cc")
                ).alias("b"),
                "comp",
                "left",
            )
            .select("id", F.coalesce("cc", "comp").alias("comp"))
        )

    comp, _, _ = fixpoint_loop(
        state=comp,
        transition=transition,
        probe=checksum,
        initial_probe=checksum(comp),
        max_rounds=max_iterations,
        op_name="connected_components",
        exhausted_msg=(
            "labels had not stabilized; components may still be merged by "
            "further iterations (raise max_iterations for graphs with "
            "diameter beyond ~2^iterations under pointer jumping)"
        ),
        eager=True,
    )
    return comp.select("id", F.col("comp").alias("component"))


def kcore_converged(
    edges: DataFrame,
    k: int,
    src: str = "src",
    dst: str = "dst",
    max_rounds: int = 30,
    bipartite: bool = False,
    broadcast_max_bytes: int = 64 << 20,
) -> tuple[DataFrame, int]:
    """Peel the graph to its k-core fixpoint; returns ``(final_edges,
    rounds)`` where ``rounds`` is the number of NODE-SET-changing peels —
    the same count a recursive-CTE oracle carrying the surviving node
    list per iteration produces (see g_kcore_converged's oracle).

    CONVERGES ON THE SURVIVING-NODE COUNT, NOT THE EDGE COUNT. The two
    fixpoints diverge by exactly one round whenever a survivor's last
    >= k neighbors all peel together: its edges vanish that round (edge
    set reaches its fixpoint) but the node itself — degree now 0 —
    leaves the node set one iteration later. An edge-count probe stops
    early and reports ``rounds`` one low; a node-list oracle does not.
    The node iteration is N_{t+1} = {v in N_t : deg_{G[N_t]}(v) >= k},
    N_0 = every node incident to an edge; since N_{t+1} is a subset of
    N_t by construction, an equal COUNT implies an equal SET, so the
    convergence probe is a single count() per round.

    ``edges`` is one row per undirected edge (bipartite order-part style:
    each node appears on exactly one side) or a pre-symmetrized list;
    degrees are counted per side and the survivor semi-joins apply to
    both, which matches symmetric degree in either representation. Each
    round's peel is localCheckpoint-materialized (a lazy chain
    re-evaluates every prior round ~3x — the measured 5.4 s vs 1.7-2.8 s
    A/B on the 2-round entry) so round N's plan never re-derives round 0.
    One driver action (the node count) per round; no collect of data.

    ``bipartite=True`` declares the two endpoint columns draw from
    DISJOINT key spaces (the order-part style — catalog entries prefix
    ids with "o"/"p" to guarantee it). That assumption buys a 2x-per-
    round plan: per-node degree is ONE union-all + groupBy aggregate
    (each node appears on exactly one side, so its appearance count IS
    its side degree), the surviving-node set is checkpointed once and
    reused by BOTH the convergence probe and the two semi-joins (the
    default path re-derives each keep aggregate in the probe AND again
    in the peel evaluation, plus pays a union-distinct shuffle for the
    probe), the probe count needs no distinct — groupBy output is
    already one row per node — and both semi-joins BROADCAST the keep
    set (gated on MEASURED BYTES, ``broadcast_max_bytes`` via
    ``measured_broadcast`` — rows AND key widths come out of the same
    single probe action; a row-count gate mis-sizes wide keys), so
    the edge frame never shuffles during the peel. Measured at
    sf0.1 (interleaved back-to-back, same session): old 7.8/6.1 s vs
    new 6.2/5.6/5.1 s on the 3-round loop — ~15-20% here, but the
    structural win is the shuffle count: per round the edge set is
    hashed once (degree aggregate) instead of three times (two keep
    aggregates + union-distinct probe) and exchanged zero times in the
    join. The default path stays for pre-symmetrized edge lists, where
    appearance count would be 2x the true degree.
    """
    cur = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    cur = cur.persist()
    n_nodes = (
        cur.select(F.col("src").alias("n"))
        .unionAll(cur.select(F.col("dst").alias("n")))
        .distinct()
        .count()
    )
    def pre_probe(cur: DataFrame):
        if bipartite:
            keep = (
                cur.select(F.col("src").alias("n"))
                .unionAll(cur.select(F.col("dst").alias("n")))
                .groupBy("n")
                .count()
                .where(F.col("count") >= k)
                .select("n")
                .localCheckpoint(eager=False)
            )
            # ONE action: the convergence probe count AND the byte-gated
            # broadcast decision (see measured_broadcast — explicit hints
            # are honored unconditionally, so the gate must be measured
            # bytes, not row count: wide keys OOM a row-gated driver)
            keep_h, n_keep = measured_broadcast(
                keep, "n", max_bytes=broadcast_max_bytes
            )
            keep_src = keep_h.select(F.col("n").alias("src"))
            keep_dst = keep_h.select(F.col("n").alias("dst"))
        else:
            keep_src = (
                cur.groupBy("src").count().where(F.col("count") >= k).select("src")
            )
            keep_dst = (
                cur.groupBy("dst").count().where(F.col("count") >= k).select("dst")
            )
            n_keep = (
                keep_src.select(F.col("src").alias("n"))
                .unionAll(keep_dst.select(F.col("dst").alias("n")))
                .distinct()
                .count()
            )
        return (keep_src, keep_dst), n_keep

    # lazy checkpoint + unpersist-before-materialize is SAFE here and
    # measured no slower than eager (r10 A/B at sf0.1, interleaved:
    # lazy 5.94/6.25 s vs eager 7.13/6.38): for rounds > 1 `cur` is
    # itself a materialized localCheckpoint whose blocks are separate
    # from the cache — unpersist() drops only the StorageLevel, so
    # nxt's later evaluation reads the checkpoint, no recompute. Only
    # round 1's plain-persisted edge frame re-derives (3 references,
    # small distinct subtree), and the lazy form fuses nxt's
    # materialization into the next round's first aggregate job —
    # one job fewer per round, which offsets that one recompute.
    def transition(cur: DataFrame, derived) -> DataFrame:
        keep_src, keep_dst = derived
        return cur.join(keep_src, "src", "left_semi").join(
            keep_dst, "dst", "left_semi"
        )

    cur, rounds, _ = fixpoint_loop(
        state=cur,
        transition=transition,
        pre_probe=pre_probe,
        initial_probe=n_nodes,
        max_rounds=max_rounds,
        op_name="kcore_converged",
        # rounds == max_rounds is the machine-checkable sentinel (a
        # converged exit always breaks with rounds < max_rounds)
        exhausted_msg=(
            "the node-set fixpoint was not reached; "
            "result is a truncated peel, not a k-core"
        ),
    )
    return cur, rounds


def pagerank_fixed(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iters: int = 3,
    damping: float = 0.85,
    edges_unique: bool = False,
) -> DataFrame:
    """Fixed-iteration PageRank over the undirected graph ``edges`` —
    returns (node, rank) after exactly ``iters`` power iterations from the
    uniform distribution. Fixing the iteration count (vs converging) is
    what makes the result deterministic and engine-portable: the catalog
    oracle unrolls the same iterations as SQL CTEs.

    Scale shape: the graph is symmetrized once; each iteration is one join
    of the rank frame against the (src-degree-annotated) edge list plus one
    partial+final aggregate on dst — two shuffles per iteration, no driver
    state (the node count enters as a one-row broadcast, never a collect).
    Because the symmetrized graph has no dangling nodes (every node has
    out-degree ≥ 1), the teleport term is the only rank source besides
    neighbors and mass is conserved up to fp. The iterated plan is shallow
    (iters is small and fixed); for convergence-style runs use
    localCheckpoint per round like connected_components.

    r15 optimization: `sym` / `nodes` / `edge_deg` are lazily
    localCheckpointed — every iteration references edge_deg and every
    rank update references the node count, so the un-materialized chain
    re-derived the edge build per reference (the final g_pagerank_parts
    plan held 44 parquet scans). Measured at sf0.1: lazy 21.5 s,
    localCheckpoint 11.5 s (median of 3, honest — checkpoints
    re-materialize per run), persist() 10.4 s fresh-process single run.
    persist was REJECTED despite the comparable per-run time: a
    persisted subtree registers in the session CacheManager keyed on
    the canonicalized plan, so re-invocations of the same query in one
    session (the bench's median-of-N) silently read the prior run's
    cache — the 3.15 s persist 'median' measured cache hits, not the
    query. Values unchanged — only evaluation count changes.

    r16 prep cuts (guide §2.4 — remove shuffles outright):
    ``edges_unique=True`` (caller-asserted: the edge list is already a
    DISTINCT canonical a<b set, so its two orientations are disjoint and
    individually unique) skips the symmetrize-distinct — one full
    |2E|-row exchange+aggregate gone; and ``nodes`` is derived from the
    degree aggregate instead of its own distinct over sym (the degree
    keys ARE the node set by construction) — a second |2E|-row exchange
    gone. The r16 negative that shaped this: repartition(key)-before-
    localCheckpoint does NOT preserve outputPartitioning (the
    checkpointed LogicalRDD reports UnknownPartitioning under this AQE
    session — verified empirically, plan shows `Scan ExistingRDD ...
    UnknownPartitioning(0)` + a fresh Exchange above it), so per-round
    exchange elision via pre-partitioned checkpoints is not available;
    cutting whole prep passes is."""
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    sym = e.unionByName(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    if not edges_unique:
        sym = sym.distinct()
    sym = sym.localCheckpoint(eager=False)
    deg = sym.groupBy("src").agg(F.count("*").alias("_deg")).localCheckpoint(
        eager=False
    )
    nodes = deg.select(F.col("src").alias("node"))
    edge_deg = sym.join(deg, "src").localCheckpoint(eager=False)
    n_row = F.broadcast(nodes.agg(F.count("*").alias("_n")))
    ranks = nodes.crossJoin(n_row).select(
        "node", (F.lit(1.0) / F.col("_n")).alias("rank")
    )
    for _ in range(max(0, iters)):
        contrib = (
            edge_deg.join(ranks, edge_deg.src == ranks.node)
            .select(F.col("dst").alias("node"), (F.col("rank") / F.col("_deg")).alias("_c"))
            .groupBy("node")
            .agg(F.sum("_c").alias("_in"))
        )
        ranks = contrib.crossJoin(n_row).select(
            "node",
            ((1.0 - damping) / F.col("_n") + damping * F.col("_in")).alias("rank"),
        )
    return ranks



def lpa_converged(
    sym: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_rounds: int = 30,
) -> tuple[DataFrame, int]:
    """Synchronous label propagation (Raghavan et al. 2007) iterated to
    LABEL STABILITY — the converged sibling of the 2-round
    g_label_propagation entry, completing the fixpoint-graph family
    (kcore_converged / cc_converged / here) under the shared probe
    discipline: per-round localCheckpoint (a lazy chain re-evaluates
    every prior round) and ONE tiny driver action per round — the
    xxhash64 label checksum cc_converged uses (one aggregate; no
    changed-rows join). Fully deterministic: every node adopts the MODE
    of its neighbors' labels via max_by(struct(cnt, -label)) — ties to
    the smallest label, never a window sort — so the whole trajectory is
    a pure function of the graph and a bounded-unroll SQL oracle can
    mirror it exactly (g_lpa_converged unrolls 10 rounds; the measured
    fixpoint is 4 at sf0.001 and 6 at sf0.01, and post-fixpoint rounds
    are no-ops so a generous unroll stays equal).

    ``sym`` must be the SYMMETRIZED edge list (each undirected edge in
    both orientations). Returns ``(labels, rounds)`` — labels (node,
    label) at the fixpoint, rounds = number of label-CHANGING rounds
    (the kcore_converged convention). Synchronous LPA can 2-cycle on
    bipartite-ish structures; like kcore, an exit without stability
    warns and rounds == max_rounds is the machine-checkable sentinel.

    Scale: per round one join on node + one partial+final mode aggregate
    (2 shuffles, a pagerank-step budget); the checksum rides the new
    label frame's materialization. No collects of data, driver state is
    one integer per round."""

    def checksum(lb: DataFrame) -> int:
        row = lb.agg(
            F.sum(F.xxhash64("node", "label").cast("decimal(38,0)")).alias("s")
        ).first()
        return int(row["s"] or 0)

    labels = (
        sym.select(F.col(src).alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint(eager=False)
    )

    def transition(lb: DataFrame, _derived) -> DataFrame:
        nbr = sym.join(
            lb.withColumnsRenamed({"node": dst}), dst
        ).select(F.col(src).alias("v"), "label")
        counts = nbr.groupBy("v", "label").agg(F.count(F.lit(1)).alias("cnt"))
        return (
            counts.groupBy("v")
            .agg(
                F.max_by(
                    F.col("label"), F.struct(F.col("cnt"), (-F.col("label")))
                ).alias("label")
            )
            .withColumnsRenamed({"v": "node"})
        )

    labels, rounds, _ = fixpoint_loop(
        state=labels,
        transition=transition,
        probe=checksum,
        initial_probe=checksum(labels),
        max_rounds=max_rounds,
        op_name="lpa_converged",
        exhausted_msg=(
            "label stability was not reached (synchronous LPA can "
            "oscillate); result is the last round's labeling"
        ),
    )
    return labels, rounds
