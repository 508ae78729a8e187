"""Similarity search over embedding columns (array<float>).

- Brute-force cosine top-k: exact baseline. The query side is tiny and
  broadcast; the corpus streams through one map-side stage, and top-k is a
  per-partition partial top-k + merge (window row_number with a small k).
- LSH (random hyperplane / sign-random-projection) bucketing: the scale
  path — hash both sides into sign-bit buckets, join on bucket, verify
  exact cosine only within buckets (multi-probe = several independent
  tables to recover recall).

All dot products run in the JVM via zip_with + aggregate (no Python UDF).
Float arrays are cast to double before arithmetic for stable results.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F


def _as_double(col: F.Column) -> F.Column:
    return F.transform(col, lambda x: x.cast("double"))


def dot(a: F.Column, b: F.Column) -> F.Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def norm(a: F.Column) -> F.Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def with_unit_vector(df: DataFrame, vec_col: str, out_col: str = "unit") -> DataFrame:
    """Pre-normalize embeddings so cosine becomes a plain dot product —
    normalize once, reuse across every query batch."""
    v = _as_double(F.col(vec_col))
    n = norm(v)
    return df.withColumn(out_col, F.transform(v, lambda x: x / n))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 10,
    query_id_col: str | None = None,
) -> DataFrame:
    """Exact brute-force top-k cosine neighbors for each query vector.

    queries is broadcast (small); the corpus never shuffles until the final
    per-query top-k, which is a partial top-k per partition thanks to
    WindowGroupLimit. Self-matches (same id) are excluded. Column-column
    scoring is deliberately the HOF dot: A/B-measured FASTER than a flat
    indexed chain here (0.49 vs 0.72 s at sf0.1 — the flat dot+norm form
    exceeds codegen's method budget and interpreted tree-walking loses to
    the aggregate loop; flat chains win only for literal-model dots, see
    _dot_lit_sql)."""
    query_id_col = query_id_col or id_col
    c = with_unit_vector(corpus, vec_col).select(
        F.col(id_col).alias("corpus_id"), F.col("unit").alias("c_unit")
    )
    q = with_unit_vector(queries, vec_col).select(
        F.col(query_id_col).alias("query_id"), F.col("unit").alias("q_unit")
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .where(F.col("corpus_id") != F.col("query_id"))
        .select(
            "query_id",
            "corpus_id",
            dot(F.col("c_unit"), F.col("q_unit")).alias("cosine"),
        )
    )
    w = W.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("corpus_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "corpus_id", F.round("cosine", 6).alias("cosine"), "rank")
    )


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic pseudo-random unit hyperplanes (pure-python LCG so the
    planes are stable across sessions without numpy RNG state)."""
    state = seed
    planes = []
    for _ in range(n_planes):
        v = []
        for _ in range(dim):
            state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 64)
            # map to (-1, 1)
            v.append(((state >> 11) / float(1 << 53)) * 2.0 - 1.0)
        s = math.sqrt(sum(x * x for x in v)) or 1.0
        planes.append([x / s for x in v])
    return planes


def lsh_bucket(
    df: DataFrame, vec_col: str, n_planes: int = 16, seed: int = 42, dim: int | None = None
) -> DataFrame:
    """Sign-random-projection bucket id: n_planes sign bits packed into a
    long. Cosine-similar vectors land in the same bucket with probability
    (1 - theta/pi)^n_planes. Pass ``dim`` when known (pipeline paths must:
    the fallback probe is a driver job before the plan builds)."""
    if dim is None:
        first = df.select(vec_col).first()
        if first is None:
            return df.withColumn("bucket", F.lit(None).cast("long"))
        dim = len(first[0])
    planes = _hyperplanes(dim, n_planes, seed)
    # NOTE measured, not assumed: the HOF dot loop BEATS a flat literal
    # CASE chain here (0.23 s vs 0.48 s for 32 plane dots/row at sf0.1) —
    # the flat form's ~4k-node expression exceeds codegen's method budget
    # and interpreted TREE-WALKING is slower per op than the aggregate
    # loop. Flat chains win only where they stay compilable or where
    # Catalyst would re-evaluate the expression at joins/filters (see
    # _assign_cell); a bucket column evaluated once per row per table is
    # neither.
    return df.withColumn("bucket", _srp_bucket_col(vec_col, planes))


def _srp_bucket_col(vec_col: str, planes: list[list[float]]) -> F.Column:
    """The sign-random-projection bucket expression of ``lsh_bucket`` as a
    reusable Column — ann_topk_lsh builds all tables' buckets in ONE
    corpus projection from it.

    Rendered as ONE parsed SQL string carrying the SAME HOF aggregate
    dots (values bitwise-identical to the old Column-API form — both are
    the 0.0-seeded left fold; integer bit packing is exact): building
    this tree through py4j cost ~1.4 s PER TABLE per call — n_tables
    plane sets x n_planes x dim F.lit() round trips — which made
    sim_ann_lsh_topk's PLAN BUILD 5.4-5.8 s of its ~6.8 s total at
    sf0.1. The HOF dot itself stays (the r5 note: a flat chain here
    measured slower — the bucket is evaluated once per row per table and
    the interpreted fold is cheap; it was the plan BUILD that hurt)."""
    vd = f"transform(`{vec_col}`, x -> CAST(x AS DOUBLE))"
    bits = []
    for i, p in enumerate(planes):
        arr = "array(" + ",".join(f"CAST('{x!r}' AS DOUBLE)" for x in p) + ")"
        d = (
            f"aggregate(zip_with({vd}, {arr}, (x, y) -> x * y), "
            f"CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)"
        )
        bits.append(
            f"(CASE WHEN {d} >= 0 THEN CAST({1 << i} AS BIGINT) "
            f"ELSE CAST(0 AS BIGINT) END)"
        )
    return F.expr("(" + " + ".join(bits) + ")")


def ann_topk_lsh(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 10,
    n_planes: int = 8,
    n_tables: int = 4,
    dim: int | None = None,
) -> DataFrame:
    """Approximate top-k: union of ``n_tables`` independent LSH tables;
    candidates = bucket collisions; exact cosine re-rank of candidates only.
    Recall/latency is tuned by (n_planes, n_tables).

    Pass ``dim`` (vector width) in pipeline paths: array columns carry no
    length in the schema, so deriving it costs one driver ``.first()`` probe
    job before the plan even builds — fine interactively, a per-call tax in
    a pipeline. With ``dim`` given, the whole query is one lazy plan."""
    if dim is None:
        first = corpus.select(vec_col).first()
        if first is None or first[0] is None:
            return corpus.sparkSession.createDataFrame(
                [], "query_id long, corpus_id long, cosine double, rank int"
            )
        dim = len(first[0])
    # ONE corpus projection computes every table's bucket, materialized as
    # the LSH index (r11): the old per-table lsh_bucket form scanned the
    # corpus n_tables times. Bucket values are the identical expressions,
    # just co-located in one select. Combined with the SQL-text bucket
    # rendering (_srp_bucket_col) this took the entry from 5.7-8.8 s
    # steady to 1.8-2.1 s at sf0.1 — the dominant cost was PLAN BUILD
    # (5.4-5.8 s of py4j literal round trips), not execution.
    plane_sets = [_hyperplanes(dim, n_planes, 42 + t) for t in range(n_tables)]
    c_idx = corpus.select(
        F.col(id_col).alias("corpus_id"),
        F.col(vec_col).alias("c_vec"),
        *[
            _srp_bucket_col(vec_col, ps).alias(f"_b{t}")
            for t, ps in enumerate(plane_sets)
        ],
    ).localCheckpoint(eager=False)
    parts = []
    for t, ps in enumerate(plane_sets):
        c = c_idx.select(
            "corpus_id", "c_vec", F.col(f"_b{t}").alias("bucket")
        )
        q = queries.select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).alias("q_vec"),
            _srp_bucket_col(vec_col, ps).alias("bucket"),
        )
        parts.append(c.join(F.broadcast(q), "bucket").drop("bucket"))
    cands = parts[0]
    for p in parts[1:]:
        cands = cands.unionByName(p)
    cands = cands.where(F.col("corpus_id") != F.col("query_id")).dropDuplicates(
        ["query_id", "corpus_id"]
    )
    # HOF scoring measured FASTER than flat indexed chains on this path
    # (0.73 s vs 1.43 s end-to-end at sf0.1): the candidate stream is
    # small and the flat dot+2-norm form (~12k expression nodes) blows the
    # codegen method budget — see lsh_bucket's note
    cv, qv = _as_double(F.col("c_vec")), _as_double(F.col("q_vec"))
    scored = cands.select(
        "query_id",
        "corpus_id",
        (dot(cv, qv) / (norm(cv) * norm(qv))).alias("cosine"),
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("corpus_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "corpus_id", F.round("cosine", 6).alias("cosine"), "rank")
    )


def _lit_vec(v: list[float]) -> F.Column:
    return F.array(*[F.lit(float(x)) for x in v])


def ivf_train(
    corpus: DataFrame,
    vec_col: str,
    n_cells: int = 16,
    iters: int = 2,
    seed: int = 42,
) -> list[list[float]]:
    """Train IVF coarse centroids: deterministic hash-ordered init plus
    ``iters`` distributed Lloyd refinements on unit vectors (spherical
    k-means). The model (n_cells × dim doubles) is the ONLY thing collected
    to the driver — assignments, partial sums, and means all stay
    distributed, so training scales with the corpus, not driver memory.
    ``seed`` perturbs the init ordering so independent indexes differ."""
    u = with_unit_vector(corpus, vec_col).select("unit").where(
        F.col("unit").isNotNull()
    )
    init = [
        list(r[0])
        for r in u.orderBy(F.xxhash64("unit", F.lit(seed)))
        .limit(n_cells)
        .collect()
    ]
    cents = init
    for _ in range(max(0, iters)):
        assigned = _assign_cell(u, "unit", cents)
        # centroid update: per-dimension mean, distributed (posexplode →
        # partial-agg avg → re-assembled in cell order), then re-normalized
        new_rows = (
            assigned.select("cell", F.posexplode("unit").alias("pos", "x"))
            .groupBy("cell", "pos")
            .agg(F.avg("x").alias("m"))
            .groupBy("cell")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "m"))),
                    lambda s: s["m"],
                ).alias("c")
            )
            .collect()
        )
        updated = {r["cell"]: list(r["c"]) for r in new_rows}
        next_cents = []
        for i, old in enumerate(cents):
            c = updated.get(i, old)  # empty cell keeps its old centroid
            n = math.sqrt(sum(x * x for x in c)) or 1.0
            next_cents.append([x / n for x in c])
        cents = next_cents
    return cents


def _dot_lit_sql(vec_sql: str, c: list[float]) -> str:
    """Literal-model dot product as a flat SQL string: an indexed
    multiply-add chain (``v[0]*c0 + v[1]*c1 + …``), left-associative so an
    oracle can mirror the summation order textually. Flat arithmetic stays
    inside whole-stage codegen; the equivalent aggregate/zip_with HOF runs
    INTERPRETED per element (measured 2-15× slower end-to-end at sf0.1,
    worse when Catalyst re-evaluates the expression at a filter/join above
    it). LITERAL-model dots only: the column-column flat form was
    A/B-measured SLOWER than the HOF dot (codegen method budget) and was
    deliberately removed — don't reintroduce it."""
    return "(" + "+".join(
        f"CAST({vec_sql}[{d}] AS DOUBLE)*{x!r}" for d, x in enumerate(c)
    ) + ")"


def _norm_sql(vec_sql: str, dim: int) -> str:
    """Euclidean norm as a flat indexed SQL chain."""
    sq = "+".join(
        f"CAST({vec_sql}[{d}] AS DOUBLE)*CAST({vec_sql}[{d}] AS DOUBLE)"
        for d in range(dim)
    )
    return f"sqrt({sq})"


def _best_cell_sql(vec_sql: str, cents: list[list[float]]) -> str:
    """SQL for the (sim, -cell) struct of the nearest centroid: array_max
    over one struct per centroid (struct ordering compares sim first; the
    negated index makes ties resolve to the LOWEST cell). Linear in
    n_cells; each sim is a flat _dot_lit_sql chain."""
    structs = ",".join(
        f"struct({_dot_lit_sql(vec_sql, c)} AS sim, {-i} AS neg_cell)"
        for i, c in enumerate(cents)
    )
    return f"array_max(array({structs}))"


def _assign_cell(
    df: DataFrame, vec_sql: str, cents: list[list[float]]
) -> DataFrame:
    """Nearest-centroid cell id as a pure map-side expression — no shuffle,
    no Python: ONE parsed F.expr over the (small) centroid list keeps
    assignment embarrassingly parallel at any corpus size and the
    expression tree shallow (plan-build cost is real — see the minhash
    precedent in CLAUDE.md).

    ``vec_sql`` names the vector column in SQL (raw or unit-normalized:
    argmax over unit centroids is scale-invariant, so callers that only
    need the cell id can pass the RAW embedding and skip normalization
    entirely).

    The model rides in the plan as literals, so it must stay coarse:
    n_cells × dim up to ~10^5 elements is fine (typical IVF coarse
    quantizers); beyond that, ship the centroids as a broadcast table and
    assign via crossJoin + max_by partial aggregation instead — same
    result, model bytes move via the broadcast machinery rather than the
    task binary.

    Scores reduce through array_max over (sim, -cell) structs (ties to
    the LOWEST cell). Each sim is a flat literal multiply-add chain that
    whole-stage codegen compiles; the previous aggregate/zip_with HOF
    form was interpreted per element AND got re-evaluated wholesale
    wherever a join/filter referenced the cell column — measured 11 s for
    a trivial 50k-row sizes join at sf0.1, 0.4 s flat."""
    return df.withColumn(
        "cell", F.expr(f"-({_best_cell_sql(vec_sql, cents)}.neg_cell)")
    )


def ivf_probe_cells(
    queries: DataFrame, unit_col: F.Column, cents: list[list[float]], nprobe: int
) -> DataFrame:
    """Top-``nprobe`` cells per query row: score every centroid, sort, slice.
    Runs on the (small, broadcastable) query side only."""
    scored = F.array(
        *[
            F.struct(dot(unit_col, _lit_vec(c)).alias("sim"), F.lit(i).alias("cell"))
            for i, c in enumerate(cents)
        ]
    )
    top = F.slice(F.reverse(F.array_sort(scored)), 1, nprobe)
    return queries.withColumn("cell", F.explode(F.transform(top, lambda s: s["cell"])))


def ann_topk_ivf(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 10,
    n_cells: int = 16,
    nprobe: int = 4,
    iters: int = 2,
    seed: int = 42,
    centroids: list[list[float]] | None = None,
    query_id_col: str | None = None,
    materialize_index: bool = True,
) -> DataFrame:
    """IVF (inverted-file) approximate top-k: the classic coarse-quantizer
    ANN (the second scale path next to ann_topk_lsh). Corpus vectors are
    binned to their nearest of ``n_cells`` centroids by a shuffle-free
    map-side fold; each query probes its ``nprobe`` nearest cells and
    exact-cosine re-ranks only those cells' vectors — candidate I/O is
    ~(nprobe/n_cells) of the corpus instead of all of it. Pass ``centroids``
    (from ivf_train) to reuse a trained index across query batches; at
    cluster scale, persist the assigned corpus partitioned BY cell so a
    probe prunes files, exactly like the snapshot store's key buckets.
    ``materialize_index`` localCheckpoints the assigned corpus — fusing
    the ~15 KB generated cell chain into the probe join blew the JVM's
    64 KB method limit (failed janino compile retried EVERY run — see
    ann_topk_ivfadc's root-cause note); measured 3.0-3.7 -> 2.4-2.9 s at
    sf0.1 (the remaining floor is the HOF re-rank + writing the unit
    vectors), and the assigned corpus IS the IVF index a deployment
    stores."""
    query_id_col = query_id_col or id_col
    cents = centroids if centroids is not None else ivf_train(
        corpus, vec_col, n_cells, iters, seed
    )
    # assignment runs on the RAW vector (argmax over unit centroids is
    # scale-invariant) so the deep unit-normalize transform never gets
    # inlined into the cell expression; unit vectors ride along for scoring
    c = _assign_cell(
        with_unit_vector(corpus, vec_col), f"`{vec_col}`", cents
    ).select(F.col(id_col).alias("corpus_id"), F.col("unit").alias("c_unit"), "cell")
    if materialize_index:
        c = c.localCheckpoint(eager=False)
    q = ivf_probe_cells(
        with_unit_vector(queries, vec_col), F.col("unit"), cents, nprobe
    ).select(F.col(query_id_col).alias("query_id"), F.col("unit").alias("q_unit"), "cell")
    cands = (
        c.join(F.broadcast(q), "cell")
        .where(F.col("corpus_id") != F.col("query_id"))
        .dropDuplicates(["query_id", "corpus_id"])
    )
    # column-column scoring stays HOF: measured 2.35 s vs 2.4-2.9 s for
    # the flat indexed form at sf0.1 (the ~4k-node chain exceeds codegen's
    # method budget; interpreted tree-walking loses to the aggregate loop)
    scored = cands.select(
        "query_id", "corpus_id", dot(F.col("c_unit"), F.col("q_unit")).alias("cosine")
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("corpus_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "corpus_id", F.round("cosine", 6).alias("cosine"), "rank")
    )


def embedding_neardup_pairs(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    block_col: str,
    threshold: float,
    max_block: int | None = None,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs within blocks (e.g. a coarse
    cluster/label or LSH bucket as the blocking key). Exact cosine inside
    each block; the block join bounds the pair space. Pair scoring stays
    the HOF dot — see cosine_topk's measured flat-vs-HOF note.

    ``max_block`` is the skew guard this generator was missing while its
    siblings had one (lsh_candidates' / jaccard_pairs' ``max_bucket``,
    operators/dedup.py): without it a block of size s yields s²/2 pairs
    with no ceiling, and k-means cells DO skew on real corpora (the dense
    background region of embedding space becomes one hot cell — the
    stop-shingle analog), so one cell can quietly become an m²/2
    single-key blowup at 100 TB. Blocks over the cap are deterministically
    SUB-BLOCKED into ceil(s/max_block) hash groups (md5-slice of the id — both
    engines can reproduce it), bounding every join key's pair count at
    ~max_block²/2 while oversized cells keep contributing pairs (dropping
    them outright, like max_bucket's stop-shingles, loses whole regions;
    a near-dup pair inside an oversized cell survives with probability
    ~1/splits — the documented recall trade for bounded worst-case work).
    The sub-block hash is the md5 channel (first 8 hex chars of
    md5(id-as-string) → bigint), NOT crc32/xxhash64, so DuckDB can
    reproduce the rule verbatim and a capped entry stays fully
    value-oracled (r14: the cap became the catalog default for the two
    super-linear headline entries, so the rule itself is now inside the
    oracle contract).
    The sizes aggregate is one partial+final agg whose output is
    n_blocks rows, broadcast back — no corpus shuffle. Uncapped output is
    IDENTICAL when no block exceeds the cap (pinned by test, and measured:
    the sf0.1 corpus's FIXED_CENTS cells are 187-366 rows, so
    max_block=1000 leaves all 267,523 blocked pairs — and the cosine
    values — unchanged; the non-binding overhead is the sizes agg +
    broadcast, ~+1 s at sf0.1. r14: the catalog entries now RUN capped
    (max_block=512 — non-binding at every oracle/bench scale, binding at
    the sf0.5 stress slice where the uncapped exponent measured 1.31),
    with the whole rule mirrored in their oracles — the cap is the
    measured default, not an option). Binding behavior — bounded
    pair count, sub-blocked (not dropped) hot block, ~1/splits survival —
    is pinned on constructed skew in tests/test_similarity.py."""
    u = with_unit_vector(df, vec_col)
    if max_block:
        sizes = df.groupBy(block_col).agg(F.count(F.lit(1)).alias("__bs"))
        splits = F.ceil(F.col("__bs") / F.lit(max_block)).cast("long")
        u = u.join(F.broadcast(sizes.select(block_col, splits.alias("__ns"))), block_col)
        sub = F.pmod(
            F.expr(
                f"conv(substr(md5(CAST(`{id_col}` AS STRING)), 1, 8), 16, 10)"
            ).cast("long"),
            F.col("__ns"),
        )
        # join key = (original block, sub-block); the ORIGINAL column rides
        # along untouched so the output keeps its exact value and dtype
        # (string-encoding the pair would corrupt keys containing the
        # separator and silently stringify integer blocks)
        join_keys = ["block", "__sub"]
        a = u.select(
            F.col(block_col).alias("block"),
            sub.alias("__sub"),
            F.col(id_col).alias("id_a"),
            F.col("unit").alias("ua"),
        )
        b = u.select(
            F.col(block_col).alias("block"),
            sub.alias("__sub"),
            F.col(id_col).alias("id_b"),
            F.col("unit").alias("ub"),
        )
    else:
        join_keys = ["block"]
        a = u.select(
            F.col(block_col).alias("block"),
            F.col(id_col).alias("id_a"),
            F.col("unit").alias("ua"),
        )
        b = u.select(
            F.col(block_col).alias("block"),
            F.col(id_col).alias("id_b"),
            F.col("unit").alias("ub"),
        )
    return (
        a.join(b, join_keys)
        .where(F.col("id_a") < F.col("id_b"))
        .select(
            "block",
            "id_a",
            "id_b",
            F.round(dot(F.col("ua"), F.col("ub")), 6).alias("cosine"),
        )
        .where(F.col("cosine") >= threshold)
    )


def semantic_clusters(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    n_cells: int = 16,
    iters: int = 4,
    seed: int = 42,
    centroids: list[list[float]] | None = None,
    sizes_exchange: bool = True,
) -> DataFrame:
    """Semantic clustering of an embedding column: spherical k-means
    (ivf_train's distributed Lloyd loop) then shuffle-free map-side
    assignment. Returns (id, cluster, cluster_size) — the blocking stage of
    embedding-space dedup and a corpus-composition diagnostic in its own
    right. Only the n_cells × dim centroid model ever reaches the driver.
    Pass ``centroids`` to skip training and assign against a fixed model
    (reusing an index across corpora; also makes the whole query
    declarative, which the catalog uses to give it a value-checked
    oracle).

    ``sizes_exchange`` picks how cluster_size attaches — both measured at
    sf0.1 (50k × 64):
    - True (default): count(*) over a cluster-partitioned window — ONE
      exchange materializes the assignment, so the cell expression
      evaluates once per row. 0.55 s. Parallelism of that exchange is
      bounded by n_cells, which is fine for a coarse model locally and on
      moderate clusters.
    - False: partial+final count + broadcast join-back — zero corpus
      shuffle, but every operator that references the cluster column
      (filter, join key, output) RE-EVALUATES the assignment expression
      (Catalyst inlines deterministic projections; ~5 evaluations
      measured, 4.1 s). The right trade at 100 TB with small n_cells,
      where re-computed map-side CPU is cheaper than shuffling the corpus
      into n_cells partitions."""
    assigned = _cluster_assignments(
        df, id_col, vec_col, n_cells, iters, seed, centroids
    )
    if sizes_exchange:
        return assigned.select(
            "id",
            "cluster",
            F.count(F.lit(1)).over(W.partitionBy("cluster")).alias("cluster_size"),
        )
    sizes = assigned.groupBy("cluster").agg(F.count("*").alias("cluster_size"))
    return assigned.join(F.broadcast(sizes), "cluster").select(
        "id", "cluster", "cluster_size"
    )


def _cluster_assignments(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    n_cells: int,
    iters: int,
    seed: int,
    centroids: list[list[float]] | None = None,
) -> DataFrame:
    """Train + map-side assign only — (id, cluster), no size aggregation.
    Shared by semantic_clusters (which attaches sizes) and
    semantic_neardup_pairs (which only needs the blocking key and would
    otherwise pay a full-corpus shuffle for a column it drops)."""
    cents = centroids if centroids is not None else ivf_train(
        df, vec_col, n_cells, iters, seed
    )
    # raw-vector assignment (scale-invariant argmax) — no unit normalize
    # pass at all on this path
    return _assign_cell(df, f"`{vec_col}`", cents).select(
        F.col(id_col).alias("id"), F.col("cell").alias("cluster")
    )


def semantic_neardup_pairs(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float = 0.9,
    n_cells: int = 16,
    iters: int = 4,
    seed: int = 42,
    centroids: list[list[float]] | None = None,
    max_block: int | None = None,
) -> DataFrame:
    """End-to-end semantic near-dedup: k-means cells as the blocking key,
    exact cosine only within a cell. Pair space is bounded by the largest
    cell (~corpus/n_cells on balanced data) instead of the corpus square —
    the embedding-space analog of MinHash-LSH's band buckets. A true near-dup
    pair is missed only when k-means splits it across cells; raise n_cells
    for speed, lower it (or multi-assign like ivf_probe_cells) for recall.
    ``centroids`` skips training, as in semantic_clusters. ``max_block``
    sub-blocks skewed cells (see embedding_neardup_pairs — k-means is
    balanced only on balanced data; production corpora concentrate in a
    few dense cells, and this is the knob that keeps the hot cell from
    going quadratic)."""
    clustered = _cluster_assignments(
        df, id_col, vec_col, n_cells, iters, seed, centroids
    # materialize the 2-column assignment (the blocking index) — fusing
    # the generated cell chain into the block self-join blew janino's
    # 64 KB method limit (failed compile retried every run, see
    # ann_topk_ivfadc's note); a (id, cluster) checkpoint is ~1 MB at
    # sf0.1 and the self-join then compiles. Measured 4.3-4.7 -> see
    # docstring of the catalog entry.
    ).localCheckpoint(eager=False)
    # materialize the blocked frame too (r15 optimization round):
    # embedding_neardup_pairs reads it from 2-3 lazy consumers (the sizes
    # aggregate when max_block is set, plus the pair self-join side whose
    # exchange ReusedExchange shares) — each re-evaluated the corpus scan
    # + assignment join. One narrow (id, vec, cluster) write, then block
    # reads.
    blocked = df.join(
        clustered.select(F.col("id").alias(id_col), "cluster"), id_col
    ).localCheckpoint(eager=False)
    return embedding_neardup_pairs(
        blocked, id_col, vec_col, "cluster", threshold, max_block=max_block
    ).withColumnRenamed("block", "cluster")


def _pq_sub_dot_sql(vec_sql: str, mi: int, dsub: int, c: list[float]) -> str:
    """Flat SQL for dot(subspace mi of vec, literal codeword c): an indexed
    left-associative multiply-add chain over vec[mi*dsub .. mi*dsub+dsub-1]
    (0-based SQL indexing). Bitwise-equal to the old aggregate/zip_with
    fold (0.0 + x is exact in IEEE) but codegen-compiled instead of
    interpreted, and ONE parsed expression instead of a ~250-node py4j
    Column tree per codeword — the r5 literal-model-dot rule applied to
    the PQ family (plan build measured 3.0 s of sim_ann_ivfadc_topk's
    5.7 s at sf0.01 before this)."""
    return "(" + "+".join(
        f"CAST({vec_sql}[{mi * dsub + i}] AS DOUBLE)*{x!r}"
        for i, x in enumerate(c)
    ) + ")"



def pq_encode(
    df: DataFrame, vec_col: str, codebooks: list[list[list[float]]]
) -> DataFrame:
    """Product-quantization encoder (Jegou et al. 2011): split each
    (unit-normalized) vector into m contiguous subspaces and replace each
    subvector with the id of its nearest codeword — L2 nearest, computed as
    argmax of (dot - ||c||²/2), which is exactly argmin ||x-c||² with the
    codeword half-norms folded in as plan literals. Adds ``code_0..code_{m-1}``
    int columns; everything is a shuffle-free map-side expression, same
    array_max(struct) linear-tree trick (ties to the LOWEST codeword) as
    _assign_cell.

    At 100 TB this is THE memory shape: a 64-dim float vector (512 B) becomes
    m small ints (m bytes as tinyint) — the corpus's search footprint drops
    ~100×, and the codes column is all a query-time scan ever reads."""
    dsub = len(codebooks[0][0])
    vsql = f"`{vec_col}`"
    cols = []
    for mi, cb in enumerate(codebooks):
        structs = ",".join(
            f"struct({_pq_sub_dot_sql(vsql, mi, dsub, c)} - "
            f"{sum(x * x for x in c) / 2.0!r} AS sim, {-j} AS neg_code)"
            for j, c in enumerate(cb)
        )
        cols.append(
            F.expr(f"-(array_max(array({structs})).neg_code)").alias(f"code_{mi}")
        )
    return df.select("*", *cols)


def _pq_lut_cols(
    vec_col: str, codebooks: list[list[list[float]]]
) -> list[F.Column]:
    """ADC lookup-table columns: lut_m[j] = dot(subspace m, codeword j)."""
    dsub = len(codebooks[0][0])
    vsql = f"`{vec_col}`"
    return [
        F.expr(
            "array(" + ",".join(
                _pq_sub_dot_sql(vsql, mi, dsub, c) for c in cb
            ) + ")"
        ).alias(f"lut_{mi}")
        for mi, cb in enumerate(codebooks)
    ]


def _pq_adc_score(m: int) -> F.Column:
    """Left-associated ADC sum: ((lut_0[c0]+lut_1[c1])+...)."""
    approx = F.element_at(F.col("lut_0"), F.col("code_0") + 1)
    for i in range(1, m):
        approx = approx + F.element_at(F.col(f"lut_{i}"), F.col(f"code_{i}") + 1)
    return approx


def pq_query_luts(
    queries: DataFrame,
    vec_col: str,
    codebooks: list[list[list[float]]],
    query_id_col: str,
) -> DataFrame:
    """Per-query ADC lookup tables: lut_m[j] = dot(query subspace m,
    codeword j). Computed once per query row (the small, broadcast side);
    corpus scoring then never touches a raw vector again."""
    return queries.select(
        F.col(query_id_col).alias("query_id"), *_pq_lut_cols(vec_col, codebooks)
    )


def ann_topk_pq(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    codebooks: list[list[list[float]]],
    k: int = 10,
    query_id_col: str | None = None,
    materialize_codes: bool = True,
) -> DataFrame:
    """Approximate top-k by product quantization with asymmetric distance
    computation (ADC): corpus vectors are reduced to m codebook ids
    (pq_encode), each query ships an m×ksub lookup table (pq_query_luts),
    and the approximate inner product is m array lookups + (m-1) adds per
    (query, corpus) pair — no per-pair vector math at all. The third ANN
    family beside LSH (ann_topk_lsh) and IVF (ann_topk_ivf); in a real
    index the two compose (IVF cells + PQ residuals = IVFADC).

    Both sides are unit-normalized first so the approximate IP estimates
    cosine. The LUT side broadcasts; the corpus side is map-side until the
    per-query top-k, which WindowGroupLimit keeps partial. The sum is
    left-associated ((l0+l1)+l2)+l3 — mirrored textually in the catalog
    oracle so both engines produce the identical double before rounding."""
    query_id_col = query_id_col or id_col
    m = len(codebooks)
    c = pq_encode(with_unit_vector(corpus, vec_col), "unit", codebooks).select(
        F.col(id_col).alias("corpus_id"), *[f"code_{i}" for i in range(m)]
    )
    if materialize_codes:
        c = c.localCheckpoint(eager=False)  # see ann_topk_ivfadc's note
    q = pq_query_luts(
        with_unit_vector(queries, vec_col), "unit", codebooks, query_id_col
    )
    approx = _pq_adc_score(m)
    scored = (
        c.crossJoin(F.broadcast(q))
        .where(F.col("corpus_id") != F.col("query_id"))
        .select("query_id", "corpus_id", F.round(approx, 6).alias("approx_ip"))
    )
    w = W.partitionBy("query_id").orderBy(F.desc("approx_ip"), F.asc("corpus_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "corpus_id", "approx_ip", "rank")
    )


def ann_topk_ivfadc(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    centroids: list[list[float]],
    codebooks: list[list[list[float]]],
    k: int = 10,
    nprobe: int = 4,
    query_id_col: str | None = None,
    materialize_codes: bool = True,
) -> DataFrame:
    """IVFADC: the coarse quantizer prunes I/O (only ``nprobe`` cells'
    codes are read per query) and PQ/ADC scoring bounds per-candidate
    math to m lookups + adds — the composition FAISS ships as its
    billion-scale default (IVF+PQ, Jegou et al. 2011). ann_topk_ivf
    re-ranks candidates with exact vectors (reads 512 B/candidate);
    this reads 4 B of codes per candidate instead, so the scan stays
    code-column-only at 100 TB, at the price of quantization error.

    A corpus row lives in exactly one cell, so a (query, candidate) pair
    can join at most once — no dedup pass needed. The probe side
    (cells × LUTs per query) broadcasts; everything corpus-side is
    map-side expressions until the per-query top-k WindowGroupLimit."""
    query_id_col = query_id_col or id_col
    m = len(codebooks)
    cu = _assign_cell(
        with_unit_vector(corpus, vec_col), f"`{vec_col}`", centroids
    )
    c = pq_encode(cu, "unit", codebooks).select(
        F.col(id_col).alias("corpus_id"), "cell", *[f"code_{i}" for i in range(m)]
    )
    # MATERIALIZE the encoded corpus (r11, root-caused with janino logs):
    # fusing the ~40 KB generated encode stage into the probe join pushes
    # one generated method past the JVM's 64 KB hard limit — the compile
    # FAILS, failures are never cached (successes are, keyed on source),
    # so every run paid a ~2 s failed-compile + interpreted fallback.
    # The checkpoint bounds each stage to code janino handles, and is the
    # semantically honest shape anyway: PQ codes are the INDEX — FAISS
    # stores them, nobody re-encodes the corpus per query (at 100 TB the
    # codes live in a table; SignatureStore is the storage pattern).
    # Measured sf0.1 interleaved: 4.4-5.2 s fused-fail vs 2.4-2.9 s
    # checkpointed; a repartition fusion-break measured 4.1-4.3 (the
    # encode stage then recompiles per run), explode barrier 3.0-3.3.
    if materialize_codes:
        c = c.localCheckpoint(eager=False)
    qu = ivf_probe_cells(
        with_unit_vector(queries, vec_col), F.col("unit"), centroids, nprobe
    )
    q = qu.select(
        F.col(query_id_col).alias("query_id"),
        "cell",
        *_pq_lut_cols("unit", codebooks),
    )
    scored = (
        c.join(F.broadcast(q), "cell")
        .where(F.col("corpus_id") != F.col("query_id"))
        .select(
            "query_id", "corpus_id", F.round(_pq_adc_score(m), 6).alias("approx_ip")
        )
    )
    w = W.partitionBy("query_id").orderBy(F.desc("approx_ip"), F.asc("corpus_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "corpus_id", "approx_ip", "rank")
    )


def cell_representatives(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    centroids: list[list[float]],
    per_cell: int = 1,
) -> DataFrame:
    """Diversity / coreset sampling: the ``per_cell`` most-central exemplars
    of each k-means cell — one spread-out representative subset of the
    embedding corpus (diverse fine-tuning subset selection, corpus
    summarization, eval-set seeding).

    Assignment AND the centrality score come from ONE map-side array_max
    over the centroid literals (the struct carries (sim, -cell), so the
    best cell and its cosine fall out of the same reduction); the
    per-cell top-k is a WindowGroupLimit partial top-k (never a global
    sort), and sizes are a partial+final aggregate joined back as a
    broadcast (n_cells rows). Both consumers read the CHECKPOINTED
    scored assignment (r11 — see the inline note below; the pre-r11
    design deliberately re-scanned the corpus for sizes to keep
    WindowGroupLimit alive, but the fused scoring chains blew janino's
    method limit, and the narrow checkpoint preserves the group limit
    while scanning and scoring the corpus exactly once). Folding the
    count into the rank's window is still wrong: it would need every row
    in the window, disabling WindowGroupLimit. Scores are rounded before
    ranking so float noise can't flip an exemplar between engines."""
    # ONE parsed expression: raw-vector argmax (scale-invariant) for the
    # cell, raw sim / norm for the cosine — no unit-normalize pass, flat
    # codegen arithmetic (see _assign_cell's interpreted-HOF rationale)
    dim = len(centroids[0])
    best_sql = _best_cell_sql(f"`{vec_col}`", centroids)
    # Zero-norm guard: an all-zero embedding must score NULL, not raise
    # ANSI DIVIDE_BY_ZERO (same treatment as m_anomaly_zscore — ADVICE r5).
    norm = F.expr(_norm_sql(f"`{vec_col}`", dim))
    best = df.withColumn("best", F.expr(best_sql)).select(
        F.col(id_col).alias("id"),
        (-F.col("best.neg_cell")).alias("cluster"),
        F.round(
            F.when(norm > F.lit(0.0), F.col("best.sim") / norm), 6
        ).alias("cosine"),
    # materialize the 3-narrow-column scored assignment: BOTH consumers
    # (sizes aggregate, ranking window) fused the ~20 KB generated
    # cell+score chain into their stages and each blew janino's 64 KB
    # method limit (TWO failed compiles retried every run — see
    # ann_topk_ivfadc's root-cause note). The checkpoint replaces the
    # old deliberate second corpus scan: cheaper here AND at scale
    # (O(corpus) narrow rows written once vs the corpus scanned+scored
    # twice); WindowGroupLimit still prunes the rank pass.
    ).localCheckpoint(eager=False)
    sizes = best.groupBy("cluster").agg(F.count(F.lit(1)).alias("cluster_size"))
    w = W.partitionBy("cluster").orderBy(F.desc("cosine"), F.asc("id"))
    return (
        best.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= per_cell)
        .join(F.broadcast(sizes), "cluster")
        .select(
            "cluster", F.col("id").alias("rep_id"), "cosine", "cluster_size"
        )
    )


def power_iteration_topdir(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    v0: list[float],
    steps: int = 2,
) -> DataFrame:
    """Dominant principal direction of the embedding matrix via ``steps``
    power-iteration rounds on the Gram matrix X'X — the distributed-PCA
    building block (PIC / randomized-SVD first stage). Entirely in ONE
    declarative plan, zero driver collects:

      step 1:  dp_i = e_i · v0 is a flat LITERAL dot (codegen, map-side)
               emitted in the same projection as posexplode(vec), so
               w[k] = Σ_i e_i[k]·dp_i is one partial+final aggregate over
               the exploded (pos, val, dp) stream — no join at all.
      step s>1: v_{s-1} is a dim-row frame → dp via explode ⋈ broadcast(v)
               grouped by id, then w via the exploded stream ⋈ dp (the
               classic two-MR-pass X'(Xv) shape; both aggregates partial).
      normalize: the dim-row w frame crossJoins its own 1-row norm
               (broadcast) — never a corpus-wide operation.

    At 100 TB: per step, one scan + one shuffle keyed by row id and one
    dim-sized aggregate; v is always dim doubles, never O(corpus). The
    result's sign is pinned by v0 (both engines compute the same sign).
    Returns (component int [0-based], loading double) = the unit top
    direction after ``steps`` rounds."""
    dim = len(v0)
    ex = df.select(
        F.col(id_col).alias("__id"),
        F.posexplode(F.col(vec_col)).alias("__pos", "__val"),
    ).withColumn("__val", F.col("__val").cast("double"))
    first = df.select(
        F.expr(_dot_lit_sql(vec_col, v0)).alias("__dp"),
        F.posexplode(F.col(vec_col)).alias("__pos", "__val"),
    )
    w = first.groupBy("__pos").agg(
        F.sum(F.col("__val").cast("double") * F.col("__dp")).alias("__w")
    )
    v = None
    for step in range(steps):
        if step > 0:
            dp = (
                ex.join(F.broadcast(v), "__pos")
                .groupBy("__id")
                .agg(F.sum(F.col("__val") * F.col("__v")).alias("__dp"))
            )
            w = (
                ex.join(dp, "__id")
                .groupBy("__pos")
                .agg(F.sum(F.col("__val") * F.col("__dp")).alias("__w"))
            )
        # materialize the dim-row aggregate (r15 optimization round): n and
        # v below each reference w, and v itself feeds the next step's dp
        # AND w joins — unmaterialized, the final 2-step plan evaluated the
        # full corpus-aggregate pipeline 8x (8 embeddings scans measured;
        # the norm/normalize double-reference doubles it per step). w is
        # <= dim rows, so the checkpoint is ~free and the plan drops to
        # one evaluation per corpus pass (3 scans). Values bit-identical —
        # same aggregates, same order.
        w = w.localCheckpoint(eager=False)
        n = w.agg(F.sqrt(F.sum(F.col("__w") * F.col("__w"))).alias("__n"))
        v = w.crossJoin(F.broadcast(n)).select(
            "__pos", (F.col("__w") / F.col("__n")).alias("__v")
        )
    assert v is not None and dim > 0
    return v.select(
        F.col("__pos").cast("int").alias("component"),
        F.col("__v").alias("loading"),
    )
