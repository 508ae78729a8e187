"""Similarity-search catalog entries over the `embeddings` table.

The brute-force entries carry full DuckDB oracles (explicit double-precision
list arithmetic on both sides, rounded before ranking so float noise cannot
flip an ordering). The LSH-bucketed ANN path is hyperplane-seed dependent →
rows-only here, recall-checked against brute force in tests/test_similarity.py.

The k-means-backed entries (clusters / neardup / IVF top-k) inject a FIXED
literal centroid model instead of training in the catalog path: assignment
becomes a pure expression both engines evaluate on the same double literals,
so these carry full value-checked oracles too. Distributed training itself
(ivf_train's Lloyd loop) stays covered by the planted-cluster recall tests in
tests/test_similarity.py — the catalog's job is checking the query plan, not
the trainer's seeds.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..io import load_table
from ..operators import similarity as sim
from . import query

# cosine(a, b) in DuckDB with explicit double math (mirrors operators.similarity.dot/norm)
_DUCK_COSINE = """
list_sum(list_transform(range(1, len({a}) + 1),
         i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)))
/ (sqrt(list_sum(list_transform({a}, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
 * sqrt(list_sum(list_transform({b}, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))))
"""


def _fixed_centroids(n_cells: int = 8, dim: int = 64) -> list[list[float]]:
    """Deterministic unit-norm centroid model shared verbatim by the Spark
    plan (literal arrays) and the DuckDB oracle (rendered literals): a
    sin-sequence pseudo-model, data-independent so testdata regeneration
    can't shift it. Python float repr round-trips, so both engines parse
    the exact same doubles."""
    cents = []
    for i in range(n_cells):
        raw = [math.sin(1.0 + i * dim + d) for d in range(dim)]
        n = math.sqrt(sum(x * x for x in raw))
        cents.append([x / n for x in raw])
    return cents


FIXED_CENTS = _fixed_centroids()

# DuckDB VALUES rows of the same literals: (cell, c)
_DUCK_CENTS = ",\n      ".join(
    "({}, [{}])".format(i, ", ".join(repr(x) for x in c))
    for i, c in enumerate(FIXED_CENTS)
)

# per-row argmax over cells is scale-invariant, so the oracle scores raw
# embeddings (no normalize) — same cell as Spark's unit-vector argmax;
# ties break to the LOWEST cell, mirroring _assign_cell's (sim, -cell) max
_DUCK_ASSIGN = f"""
    cents(cell, c) AS (VALUES
      {_DUCK_CENTS}
    ),
    scored_cells AS (
      SELECT e.vec_id, e.embedding, c.cell,
             list_sum(list_transform(range(1, len(e.embedding) + 1),
                      i -> CAST(e.embedding[i] AS DOUBLE) * c.c[i])) AS sim
      FROM embeddings e CROSS JOIN cents c
    ),
    assigned AS (
      SELECT vec_id, embedding, cell FROM (
        SELECT vec_id, embedding, cell,
               row_number() OVER (
                 PARTITION BY vec_id ORDER BY sim DESC, cell ASC
               ) AS rn
        FROM scored_cells
      ) WHERE rn = 1
    )
"""



# The probe-4-of-8 query/cell CTE pair shared by the two IVF audit
# oracles (recall + NDCG) — the DuckDB half of ivf_probe_cells'
# contract (probe count, DESC cell tiebreak); factored by r14 review
# pass 2. The topk entries keep their own variants (different query
# sets/aliases).
_DUCK_IVF_PROBE = """q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings
          WHERE vec_id < 5),
    q_probe AS (
      SELECT query_id, qe, cell FROM (
        SELECT q.query_id, q.qe, c.cell,
               row_number() OVER (
                 PARTITION BY q.query_id
                 ORDER BY list_sum(list_transform(range(1, len(q.qe) + 1),
                          i -> CAST(q.qe[i] AS DOUBLE) * c.c[i])) DESC,
                          c.cell DESC
               ) AS rn
        FROM q CROSS JOIN cents c
      ) WHERE rn <= 4
    ),"""



def _broadcast_cosine_topk(corpus, queries, k: int = 10):
    """Exact cosine top-k of broadcast ``queries`` against ``corpus``
    (vec_id/embedding frames) — ONE scoring/rank tail shared by
    sim_cosine_topk_bruteforce and sim_filtered_ann_topk (review-pass
    factoring: the cosine channel, the self-pair filter, and the
    (cosine desc, corpus_id) tie-break must evolve in lockstep). HOF
    dot/norm on purpose: A/B-measured faster than flat indexed chains
    for column-column scoring (codegen method budget — see
    operators.similarity.cosine_topk's note)."""
    scored = (
        corpus.select(
            F.col("vec_id").alias("corpus_id"), F.col("embedding").alias("ce")
        )
        .crossJoin(
            F.broadcast(
                queries.select(
                    F.col("vec_id").alias("query_id"),
                    F.col("embedding").alias("qe"),
                )
            )
        )
        .where(F.col("corpus_id") != F.col("query_id"))
        .select(
            "query_id",
            "corpus_id",
            F.round(
                sim.dot(sim._as_double(F.col("ce")), sim._as_double(F.col("qe")))
                / (
                    sim.norm(sim._as_double(F.col("ce")))
                    * sim.norm(sim._as_double(F.col("qe")))
                ),
                6,
            ).alias("cosine"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("corpus_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "corpus_id", "cosine", "rank")
    )


@query(
    "sim_cosine_topk_bruteforce",
    oracle=f"""
    WITH q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings WHERE vec_id < 5),
    scored AS (
      SELECT q.query_id, c.vec_id AS corpus_id,
             round({_DUCK_COSINE.format(a="c.embedding", b="q.qe")}, 6) AS cosine
      FROM embeddings c CROSS JOIN q
      WHERE c.vec_id <> q.query_id
    ),
    ranked AS (
      SELECT query_id, corpus_id, CAST(cosine AS DOUBLE) AS cosine,
             CAST(row_number() OVER (
               PARTITION BY query_id ORDER BY cosine DESC, corpus_id
             ) AS INT) AS rank
      FROM scored
    )
    SELECT query_id, corpus_id, cosine, rank FROM ranked WHERE rank <= 10
    """,
)
def sim_cosine_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-10 cosine neighbors for query vectors (vec_id < 5): the
    brute-force ANN baseline. Query side broadcast; corpus side never
    shuffles (map-side dot products + per-partition partial top-k)."""
    emb = load_table(spark, sf_dir, "embeddings")
    return _broadcast_cosine_topk(emb, emb.where(F.col("vec_id") < 5))


@query(
    "sim_embedding_neardup_pairs",
    oracle=f"""
    SELECT a.label AS block, a.vec_id AS id_a, b.vec_id AS id_b,
           CAST(round({_DUCK_COSINE.format(a="a.embedding", b="b.embedding")}, 6) AS DOUBLE) AS cosine
    FROM embeddings a JOIN embeddings b
      ON a.label = b.label AND a.vec_id < b.vec_id
    WHERE round({_DUCK_COSINE.format(a="a.embedding", b="b.embedding")}, 6) >= 0.9
    """,
)
def sim_embedding_neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs, blocked by `label` (coarse
    cluster id) so the pair space is per-block, not corpus². Threshold on the
    rounded cosine on both sides."""
    emb = load_table(spark, sf_dir, "embeddings")
    a = emb.select(
        F.col("label").alias("block"), F.col("vec_id").alias("id_a"), F.col("embedding").alias("ea")
    )
    b = emb.select(
        F.col("label").alias("block"), F.col("vec_id").alias("id_b"), F.col("embedding").alias("eb")
    )
    ea, eb = sim._as_double(F.col("ea")), sim._as_double(F.col("eb"))
    return (
        a.join(b, "block")
        .where(F.col("id_a") < F.col("id_b"))
        .select(
            "block",
            "id_a",
            "id_b",
            F.round(sim.dot(ea, eb) / (sim.norm(ea) * sim.norm(eb)), 6).alias(
                "cosine"
            ),
        )
        .where(F.col("cosine") >= 0.9)
    )


def _duck_lsh_bucket(e_expr: str, planes: list[list[float]]) -> str:
    """DuckDB mirror of operators.similarity.lsh_bucket for LITERAL planes:
    one sign-bit dot per plane, packed. The planes come from the same
    pure-python LCG (_hyperplanes) the Spark side uses, rendered as list
    literals — identical doubles on both engines."""
    bits = []
    for i, p in enumerate(planes):
        lst = "[" + ",".join(repr(x) for x in p) + "]"
        dotp = (
            f"list_sum(list_transform(range(1, 65), "
            f"i -> CAST({e_expr}[i] AS DOUBLE) * ({lst})[i]))"
        )
        bits.append(f"(CASE WHEN {dotp} >= 0 THEN {1 << i} ELSE 0 END)")
    return " + ".join(bits)


def _lsh_oracle() -> str:
    from ..operators.similarity import _hyperplanes

    buckets = ",\n           ".join(
        f"{_duck_lsh_bucket('embedding', _hyperplanes(64, 8, seed=42 + t))} AS b{t}"
        for t in range(4)
    )
    collide = " OR ".join(f"q.b{t} = c.b{t}" for t in range(4))
    cos = (
        "list_sum(list_transform(range(1, 65), i -> CAST(qe[i] AS DOUBLE) * ce[i]))"
        " / (sqrt(list_sum(list_transform(qe, x -> CAST(x AS DOUBLE) * x)))"
        " * sqrt(list_sum(list_transform(ce, x -> CAST(x AS DOUBLE) * x))))"
    )
    return f"""
    WITH c AS (
      SELECT vec_id, embedding,
           {buckets}
      FROM embeddings
    ),
    q AS (SELECT * FROM c WHERE vec_id < 5),
    cands AS (
      SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS corpus_id,
             q.embedding AS qe, c.embedding AS ce
      FROM q JOIN c ON ({collide}) AND q.vec_id <> c.vec_id
    ),
    scored AS (SELECT query_id, corpus_id, {cos} AS cosine FROM cands)
    SELECT query_id, corpus_id,
           CAST(round(cosine, 6) AS DOUBLE) AS cosine, rank
    FROM (
      SELECT query_id, corpus_id, cosine,
             CAST(row_number() OVER (
               PARTITION BY query_id ORDER BY cosine DESC, corpus_id
             ) AS INT) AS rank
      FROM scored
    ) WHERE rank <= 10
    """


@query("sim_ann_lsh_topk", oracle=_lsh_oracle())
def sim_ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-10 via sign-random-projection LSH (8 planes × 4
    tables), exact re-rank of bucket collisions only. FULL value oracle
    (graduated r6): the hyperplanes were always a deterministic pure-python
    LCG (_hyperplanes), so the identical plane doubles render into the
    DuckDB SQL as literals — the same fixed-model-injection trick as
    FIXED_CENTS/FIXED_CBS — and DuckDB recomputes buckets, collisions, and
    the re-rank end to end. Recall vs brute force additionally asserted in
    tests/test_similarity.py. ``dim`` is passed (testdata embeddings are
    64-wide) so no driver probe job runs before the plan builds — pinned in
    tests/test_plans.py."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 5)
    return sim.ann_topk_lsh(
        emb, queries, "vec_id", "embedding", k=10, n_planes=8, n_tables=4, dim=64
    )


@query(
    "sim_ann_ivf_topk",
    oracle=f"""
    WITH {_DUCK_ASSIGN},
    q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings WHERE vec_id < 5),
    q_probe AS (
      SELECT query_id, qe, cell FROM (
        SELECT q.query_id, q.qe, c.cell,
               row_number() OVER (
                 PARTITION BY q.query_id
                 ORDER BY list_sum(list_transform(range(1, len(q.qe) + 1),
                          i -> CAST(q.qe[i] AS DOUBLE) * c.c[i])) DESC, c.cell DESC
               ) AS rn
        FROM q CROSS JOIN cents c
      ) WHERE rn <= 4
    ),
    cands AS (
      SELECT DISTINCT p.query_id, p.qe, a.vec_id AS corpus_id, a.embedding AS ce
      FROM q_probe p JOIN assigned a ON p.cell = a.cell
      WHERE a.vec_id <> p.query_id
    ),
    ranked AS (
      SELECT query_id, corpus_id,
             {_DUCK_COSINE.format(a="ce", b="qe")} AS cosine,
             CAST(row_number() OVER (
               PARTITION BY query_id
               ORDER BY {_DUCK_COSINE.format(a="ce", b="qe")} DESC, corpus_id
             ) AS INT) AS rank
      FROM cands
    )
    SELECT query_id, corpus_id, CAST(round(cosine, 6) AS DOUBLE) AS cosine, rank
    FROM ranked WHERE rank <= 10
    """,
)
def sim_ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-10 via an IVF coarse quantizer (8 fixed cells, probe
    4): shuffle-free map-side cell assignment, exact re-rank inside probed
    cells only. The catalog entry injects the FIXED_CENTS literal model, so
    probe + assignment + re-rank are all declarative and fully oracled;
    trained-centroid recall is pinned in tests/test_similarity.py. Probe
    ties break to the HIGHER cell (reverse(array_sort)) while assignment
    ties break LOWER — both mirrored in the oracle's ORDER BY."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 5)
    return sim.ann_topk_ivf(
        emb, queries, "vec_id", "embedding", k=10, n_cells=8, nprobe=4,
        centroids=FIXED_CENTS,
    )


def _fixed_codebooks(
    m: int = 4, ksub: int = 8, dsub: int = 16
) -> list[list[list[float]]]:
    """Deterministic PQ codebooks (m subspaces × ksub codewords × dsub
    dims), norm 0.5 per codeword (the scale of a unit vector's quarter
    slice) — data-independent like FIXED_CENTS, so testdata regeneration
    can't shift them, and float repr round-trips into DuckDB."""
    cbs = []
    for mi in range(m):
        cb = []
        for j in range(ksub):
            raw = [math.sin(2.0 + (mi * ksub + j) * dsub + d) for d in range(dsub)]
            n = math.sqrt(sum(x * x for x in raw)) * 2.0
            cb.append([x / n for x in raw])
        cbs.append(cb)
    return cbs


FIXED_CBS = _fixed_codebooks()

# DuckDB VALUES rows (m, j, codeword, half-norm) of the same literals; the
# half-norm is computed by the same Python expression pq_encode folds into
# the Spark plan, so both engines subtract the identical double.
_DUCK_CBS = ",\n      ".join(
    "({}, {}, [{}], {!r})".format(
        mi, j, ", ".join(repr(x) for x in c), sum(x * x for x in c) / 2.0
    )
    for mi, cb in enumerate(FIXED_CBS)
    for j, c in enumerate(cb)
)

# exact mirror of operators.similarity.with_unit_vector
_DUCK_UNIT = """
    list_transform(embedding, x -> CAST(x AS DOUBLE)
      / sqrt(list_sum(list_transform(embedding,
               y -> CAST(y AS DOUBLE) * CAST(y AS DOUBLE)))))
"""


@query(
    "sim_ann_pq_topk",
    oracle=f"""
    WITH cb(m, j, c, halfn) AS (VALUES
      {_DUCK_CBS}
    ),
    u AS (SELECT vec_id, {_DUCK_UNIT} AS uv FROM embeddings),
    sc AS (
      SELECT u.vec_id, cb.m, cb.j,
             list_sum(list_transform(range(1, 17),
                      i -> u.uv[cb.m * 16 + i] * cb.c[i])) - cb.halfn AS s
      FROM u CROSS JOIN cb
    ),
    codes AS (
      SELECT vec_id, m, j AS code FROM (
        SELECT vec_id, m, j,
               row_number() OVER (
                 PARTITION BY vec_id, m ORDER BY s DESC, j ASC
               ) AS rn
        FROM sc
      ) WHERE rn = 1
    ),
    cp AS (
      SELECT vec_id,
             max(CASE WHEN m = 0 THEN code END) AS c0,
             max(CASE WHEN m = 1 THEN code END) AS c1,
             max(CASE WHEN m = 2 THEN code END) AS c2,
             max(CASE WHEN m = 3 THEN code END) AS c3
      FROM codes GROUP BY vec_id
    ),
    lut AS (
      SELECT q.vec_id AS query_id, cb.m, cb.j,
             list_sum(list_transform(range(1, 17),
                      i -> q.uv[cb.m * 16 + i] * cb.c[i])) AS v
      FROM (SELECT * FROM u WHERE vec_id < 5) q CROSS JOIN cb
    ),
    scored AS (
      SELECT l0.query_id, cp.vec_id AS corpus_id,
             round((((l0.v + l1.v) + l2.v) + l3.v), 6) AS approx_ip
      FROM cp
      JOIN lut l0 ON l0.m = 0 AND l0.j = cp.c0
      JOIN lut l1 ON l1.m = 1 AND l1.j = cp.c1 AND l1.query_id = l0.query_id
      JOIN lut l2 ON l2.m = 2 AND l2.j = cp.c2 AND l2.query_id = l0.query_id
      JOIN lut l3 ON l3.m = 3 AND l3.j = cp.c3 AND l3.query_id = l0.query_id
      WHERE cp.vec_id <> l0.query_id
    )
    SELECT query_id, corpus_id, CAST(approx_ip AS DOUBLE) AS approx_ip, rank
    FROM (
      SELECT query_id, corpus_id, approx_ip,
             CAST(row_number() OVER (
               PARTITION BY query_id ORDER BY approx_ip DESC, corpus_id
             ) AS INT) AS rank
      FROM scored
    ) WHERE rank <= 10
    """,
)
def sim_ann_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-10 via product quantization + asymmetric distance
    (the third ANN family beside LSH and IVF): corpus vectors collapse to
    4 codebook ids, queries ship a 4×8 LUT, and scoring is 4 array lookups
    + 3 adds per pair — the memory-bounded 100 TB shape (512 B vector →
    4 B of codes). Injects the FIXED_CBS literal codebooks so encode, LUT
    and ADC rank are all declarative with a full value oracle; encode ties
    break to the LOWEST codeword on both sides."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 5)
    return sim.ann_topk_pq(
        emb, queries, "vec_id", "embedding", codebooks=FIXED_CBS, k=10
    )


@query(
    "sim_ann_ivfadc_topk",
    oracle=f"""
    WITH {_DUCK_ASSIGN},
    cb(m, j, c, halfn) AS (VALUES
      {_DUCK_CBS}
    ),
    u AS (SELECT vec_id, {_DUCK_UNIT} AS uv FROM embeddings),
    sc AS (
      SELECT u.vec_id, cb.m, cb.j,
             list_sum(list_transform(range(1, 17),
                      i -> u.uv[cb.m * 16 + i] * cb.c[i])) - cb.halfn AS s
      FROM u CROSS JOIN cb
    ),
    codes AS (
      SELECT vec_id, m, j AS code FROM (
        SELECT vec_id, m, j,
               row_number() OVER (
                 PARTITION BY vec_id, m ORDER BY s DESC, j ASC
               ) AS rn
        FROM sc
      ) WHERE rn = 1
    ),
    cp AS (
      SELECT vec_id,
             max(CASE WHEN m = 0 THEN code END) AS c0,
             max(CASE WHEN m = 1 THEN code END) AS c1,
             max(CASE WHEN m = 2 THEN code END) AS c2,
             max(CASE WHEN m = 3 THEN code END) AS c3
      FROM codes GROUP BY vec_id
    ),
    q AS (SELECT vec_id AS query_id, embedding AS qe
          FROM embeddings WHERE vec_id < 5),
    q_probe AS (
      SELECT query_id, cell FROM (
        SELECT q.query_id, c.cell,
               row_number() OVER (
                 PARTITION BY q.query_id
                 ORDER BY list_sum(list_transform(range(1, len(q.qe) + 1),
                          i -> CAST(q.qe[i] AS DOUBLE) * c.c[i])) DESC,
                          c.cell DESC
               ) AS rn
        FROM q CROSS JOIN cents c
      ) WHERE rn <= 4
    ),
    lut AS (
      SELECT qq.vec_id AS query_id, cb.m, cb.j,
             list_sum(list_transform(range(1, 17),
                      i -> qq.uv[cb.m * 16 + i] * cb.c[i])) AS v
      FROM (SELECT * FROM u WHERE vec_id < 5) qq CROSS JOIN cb
    ),
    cands AS (
      SELECT p.query_id, a.vec_id AS corpus_id
      FROM q_probe p JOIN assigned a ON p.cell = a.cell
      WHERE a.vec_id <> p.query_id
    ),
    scored AS (
      SELECT cd.query_id, cd.corpus_id,
             round((((l0.v + l1.v) + l2.v) + l3.v), 6) AS approx_ip
      FROM cands cd
      JOIN cp ON cp.vec_id = cd.corpus_id
      JOIN lut l0 ON l0.query_id = cd.query_id AND l0.m = 0 AND l0.j = cp.c0
      JOIN lut l1 ON l1.query_id = cd.query_id AND l1.m = 1 AND l1.j = cp.c1
      JOIN lut l2 ON l2.query_id = cd.query_id AND l2.m = 2 AND l2.j = cp.c2
      JOIN lut l3 ON l3.query_id = cd.query_id AND l3.m = 3 AND l3.j = cp.c3
    )
    SELECT query_id, corpus_id, CAST(approx_ip AS DOUBLE) AS approx_ip, rank
    FROM (
      SELECT query_id, corpus_id, approx_ip,
             CAST(row_number() OVER (
               PARTITION BY query_id ORDER BY approx_ip DESC, corpus_id
             ) AS INT) AS rank
      FROM scored
    ) WHERE rank <= 10
    """,
)
def sim_ann_ivfadc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVFADC (FAISS's billion-scale default, Jegou et al. 2011): the IVF
    coarse quantizer prunes which cells a query reads (FIXED_CENTS, probe
    4 of 8) and PQ/ADC scores the surviving candidates from 4 B of codes
    instead of 512 B of floats (FIXED_CBS) — coarse pruning bounds I/O,
    quantized scoring bounds math, and together the per-query cost is
    independent of corpus size given balanced cells. Both models are
    injected literals so every stage is declarative with a full value
    oracle; probe ties break HIGH (like sim_ann_ivf_topk), encode ties
    break LOW (like sim_ann_pq_topk), both mirrored in the SQL."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 5)
    return sim.ann_topk_ivfadc(
        emb, queries, "vec_id", "embedding",
        centroids=FIXED_CENTS, codebooks=FIXED_CBS, k=10, nprobe=4,
    )


@query(
    "sim_semantic_clusters",
    oracle=f"""
    WITH {_DUCK_ASSIGN}
    SELECT vec_id AS id, CAST(cell AS INT) AS cluster,
           count(*) OVER (PARTITION BY cell) AS cluster_size
    FROM assigned
    """,
)
def sim_semantic_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic clustering of the embedding corpus against the FIXED_CENTS
    literal model: assignment is a pure map-side expression fold (no
    shuffle, no Python), sizes one partial+final aggregate — fully oracled.
    The distributed Lloyd trainer (ivf_train) stays exercised by the
    planted-cluster recovery tests in tests/test_similarity.py."""
    emb = load_table(spark, sf_dir, "embeddings")
    return sim.semantic_clusters(
        emb, "vec_id", "embedding", centroids=FIXED_CENTS
    )


# The in-cell pair-growth cap (r14, VERDICT task 2): blocks over
# NEARDUP_MAX_BLOCK rows sub-block into ceil(size/cap) md5-hash groups —
# bounds every join key's pair count at ~cap²/2 so the entry stays
# ~linear once cells outgrow the cap (the uncapped sf0.5 exponent was
# 1.31: in-cell pair growth, quadratic by semantics at fixed n_cells).
# 512 is NON-binding at every oracle/bench scale (sf0.1 cells are
# 187-366 rows → output identical to the uncapped r13 entry, pinned by
# the identity-when-unbinding test) and BINDING at the sf0.5 stress
# slice. The whole rule — sizes, split count, md5 sub-key — mirrors in
# the oracle below, so a binding cap is still fully value-checked; the
# recall cost of a binding cap is quantified by
# sim_blocked_pairs_recall_audit (a deliberately tiny cap).
NEARDUP_MAX_BLOCK = 512


def _duck_subblocked(max_block: int) -> str:
    """DuckDB mirror of embedding_neardup_pairs' max_block rule over the
    `assigned` CTE: split count per cell = ceil(size/cap), sub-key =
    md5-slice of the id (the portable hash channel) mod splits."""
    return f"""
    sizes AS (SELECT cell, count(*) AS bs FROM assigned GROUP BY cell),
    suba AS (
      SELECT a.vec_id, a.embedding, a.cell,
             CAST(('0x' || substr(md5(CAST(a.vec_id AS VARCHAR)), 1, 8))
                  AS BIGINT)
               % CAST(ceil(s.bs / {max_block}.0) AS BIGINT) AS sub
      FROM assigned a JOIN sizes s ON s.cell = a.cell
    )"""


@query(
    "sim_semantic_neardup_pairs",
    oracle=f"""
    WITH {_DUCK_ASSIGN},
    {_duck_subblocked(NEARDUP_MAX_BLOCK)}
    SELECT x.cell AS cluster, x.vec_id AS id_a, y.vec_id AS id_b,
           CAST(round({_DUCK_COSINE.format(a="x.embedding", b="y.embedding")}, 6) AS DOUBLE) AS cosine
    FROM suba x JOIN suba y
      ON x.cell = y.cell AND x.sub = y.sub AND x.vec_id < y.vec_id
    WHERE round({_DUCK_COSINE.format(a="x.embedding", b="y.embedding")}, 6) >= 0.3
    """,
)
def sim_semantic_neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic near-dedup without a precomputed blocking label: fixed
    k-means cells bound the pair space (corpus²/n_cells on balanced data),
    exact cosine within a cell. The learned-blocking twin of
    sim_embedding_neardup_pairs (which trusts the stored `label`).
    Threshold 0.3 because the synthetic embeddings are near-orthogonal (max
    pairwise cosine ~0.48) — production default stays 0.9 in the operator.
    Fully oracled via the injected FIXED_CENTS model; trained-blocking
    recall is pinned in tests/test_similarity.py. Runs CAPPED at
    max_block=NEARDUP_MAX_BLOCK (see the constant's note — the r13 sf0.5
    exponent was 1.31 uncapped; the cap is non-binding at oracle/bench
    scales so those outputs are unchanged, and the sub-block rule is
    mirrored verbatim in the oracle so a binding run stays checkable)."""
    emb = load_table(spark, sf_dir, "embeddings")
    return sim.semantic_neardup_pairs(
        emb,
        "vec_id",
        "embedding",
        threshold=0.3,
        centroids=FIXED_CENTS,
        max_block=NEARDUP_MAX_BLOCK,
    )


@query(
    "sim_blocked_pairs_recall_audit",
    oracle=f"""
    WITH {_DUCK_ASSIGN},
    {_duck_subblocked(64)},
    truth AS (
      SELECT x.vec_id AS id_a, y.vec_id AS id_b
      FROM assigned x JOIN assigned y
        ON x.cell = y.cell AND x.vec_id < y.vec_id
      WHERE round({_DUCK_COSINE.format(a="x.embedding", b="y.embedding")}, 6) >= 0.3
    ),
    found AS (
      SELECT x.vec_id AS id_a, y.vec_id AS id_b
      FROM suba x JOIN suba y
        ON x.cell = y.cell AND x.sub = y.sub AND x.vec_id < y.vec_id
      WHERE round({_DUCK_COSINE.format(a="x.embedding", b="y.embedding")}, 6) >= 0.3
    )
    SELECT CAST(count(*) AS BIGINT) AS n_true,
           CAST(coalesce(sum(CASE WHEN f.id_a IS NOT NULL THEN 1 END), 0)
                AS BIGINT) AS n_found,
           CAST(count(*) - coalesce(sum(CASE WHEN f.id_a IS NOT NULL
                                        THEN 1 END), 0)
                AS BIGINT) AS n_missed,
           CAST(CASE WHEN count(*) = 0 THEN 1000000
                ELSE (coalesce(sum(CASE WHEN f.id_a IS NOT NULL THEN 1 END),
                               0) * 1000000) // count(*) END
                AS BIGINT) AS recall_ppm
    FROM truth tr
    LEFT JOIN found f ON f.id_a = tr.id_a AND f.id_b = tr.id_b
    """,
)
def sim_blocked_pairs_recall_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The sketch-audit family member for the in-cell pair cap (r14,
    VERDICT task 2's 'recall delta shipped visibly'): uncapped
    within-cell cosine pairs are the ground truth; a DELIBERATELY tiny
    max_block=64 (binding at every scale — oracle-scale cells are 40-90
    rows) re-runs the same blocking with sub-blocking on, and the left
    join yields found/missed/recall_ppm in exact integers. A surviving
    pair needs both endpoints in the same md5 sub-block (~1/splits
    survival inside oversized cells), so recall_ppm here is the measured
    cost curve for the production cap — the catalog's real entries run
    max_block=NEARDUP_MAX_BLOCK=512, non-binding until cells outgrow it.
    Shares ONE checkpointed cell assignment across both pipelines (the
    lsh-recall-audit structure); found ⊆ truth by construction, so the
    join is the audit, not a correctness risk.

    r15 optimization: ``found`` is DERIVED from ``truth`` instead of
    re-running the whole capped pair pipeline. A capped pair survives
    iff both endpoints hash to the same md5 sub-block of their (shared)
    cell — embedding_neardup_pairs joins on (cell, sub) with the
    identical cosine filter, so found = {t in truth :
    sub(id_a) = sub(id_b)} exactly, where sub(id) =
    pmod(conv(md5-slice), ceil(cell_size / 64)) is the same expression
    the operator uses. That turns the second block self-join + per-pair
    cosine into one broadcast sizes join + a map over truth pairs; the
    blocked frame is localCheckpointed (truth's two self-join sides and
    the sizes aggregate re-evaluated the emb-cluster join 3x). The
    oracle keeps the declarative two-pipeline form as the spec."""
    emb = load_table(spark, sf_dir, "embeddings")
    clustered = sim._cluster_assignments(
        emb, "vec_id", "embedding", 8, 4, 42, FIXED_CENTS
    ).localCheckpoint(eager=False)
    blocked = emb.join(
        clustered.select(F.col("id").alias("vec_id"), "cluster"), "vec_id"
    ).localCheckpoint(eager=False)
    truth = sim.embedding_neardup_pairs(
        blocked, "vec_id", "embedding", "cluster", 0.3
    ).select("block", "id_a", "id_b")
    sizes = blocked.groupBy("cluster").agg(F.count(F.lit(1)).alias("__bs"))
    ns = F.ceil(F.col("__bs") / F.lit(64)).cast("long").alias("__ns")

    def _sub(id_col: str) -> F.Column:
        return F.pmod(
            F.expr(
                f"conv(substr(md5(CAST(`{id_col}` AS STRING)), 1, 8), 16, 10)"
            ).cast("long"),
            F.col("__ns"),
        )

    joined = truth.join(
        F.broadcast(sizes.select(F.col("cluster").alias("block"), ns)), "block"
    ).select(
        "id_a", "id_b", F.when(_sub("id_a") == _sub("id_b"), 1).alias("hit")
    )
    return joined.agg(
        F.count(F.lit(1)).alias("n_true"),
        F.coalesce(F.sum("hit"), F.lit(0)).cast("long").alias("n_found"),
        (F.count(F.lit(1)) - F.coalesce(F.sum("hit"), F.lit(0)))
        .cast("long")
        .alias("n_missed"),
        F.expr(
            "CAST(CASE WHEN count(1) = 0 THEN 1000000"
            " ELSE (coalesce(sum(hit), 0) * 1000000) div count(1) END"
            " AS BIGINT)"
        ).alias("recall_ppm"),
    )


@query(
    "sim_cluster_ari_audit",
    oracle=f"""
    WITH {_DUCK_ASSIGN},
    lab AS (
      SELECT d.lang AS la, a.cell AS lb
      FROM documents d JOIN assigned a ON a.vec_id = d.doc_id
    ),
    cells AS (SELECT la, lb, CAST(count(*) AS BIGINT) AS nij
              FROM lab GROUP BY 1, 2),
    ra AS (SELECT la, CAST(sum(nij) AS BIGINT) AS ai FROM cells GROUP BY 1),
    cb AS (SELECT lb, CAST(sum(nij) AS BIGINT) AS bj FROM cells GROUP BY 1),
    sums AS (
      SELECT CAST(sum(nij * (nij - 1) // 2) AS BIGINT) AS s_idx FROM cells
    ),
    sa AS (SELECT CAST(sum(ai * (ai - 1) // 2) AS BIGINT) AS s_a FROM ra),
    sb AS (SELECT CAST(sum(bj * (bj - 1) // 2) AS BIGINT) AS s_b FROM cb),
    nn AS (SELECT CAST(sum(nij) AS BIGINT) AS n FROM cells)
    SELECT nn.n, sums.s_idx, sa.s_a, sb.s_b,
           CAST(CASE WHEN (CAST(sa.s_a AS DOUBLE) + sb.s_b) / 2
                          - CAST(sa.s_a AS DOUBLE) * sb.s_b
                            / (nn.n * (nn.n - 1) // 2) = 0 THEN NULL
                ELSE round(
                  (sums.s_idx - CAST(sa.s_a AS DOUBLE) * sb.s_b
                   / (nn.n * (nn.n - 1) // 2))
                  / ((CAST(sa.s_a AS DOUBLE) + sb.s_b) / 2
                     - CAST(sa.s_a AS DOUBLE) * sb.s_b
                       / (nn.n * (nn.n - 1) // 2)), 6)
                END AS DOUBLE) AS ari
    FROM nn CROSS JOIN sums CROSS JOIN sa CROSS JOIN sb
    """,
)
def sim_cluster_ari_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adjusted Rand Index between the FIXED_CENTS semantic clustering
    and the documents' language partition — EXTERNAL validation of the
    clustering (silhouette/margin audits measure internal geometry;
    ARI answers 'does the clustering recover a labeling we trust?',
    chance-corrected so a random assignment scores ~0 — the standard
    sklearn.metrics surface re-expressed declaratively). Every pair
    count is the exact integer x(x−1)/2 over the |langs|×|cells|
    contingency (DuckDB `//` mirroring Spark `div`; x(x−1) is even so the floor
    is exact); one mirrored float formula, round-6, degenerate
    (max == expected) → NULL both sides. The doc→embedding join is the
    one corpus shuffle; overflow bound n²/2 → bigint to ~4e9 docs (the
    wide_int escape class past that)."""
    emb = load_table(spark, sf_dir, "embeddings")
    docs = load_table(spark, sf_dir, "documents")
    assigned = sim._cluster_assignments(
        emb, "vec_id", "embedding", 8, 4, 42, FIXED_CENTS
    )
    lab = docs.join(
        assigned.select(F.col("id").alias("doc_id"), "cluster"), "doc_id"
    ).select(F.col("lang").alias("la"), F.col("cluster").alias("lb"))
    cells = lab.groupBy("la", "lb").agg(F.count(F.lit(1)).alias("nij"))
    cells = cells.localCheckpoint(eager=False)  # 4 aggregate consumers
    ra = cells.groupBy("la").agg(F.sum("nij").alias("ai"))
    cb = cells.groupBy("lb").agg(F.sum("nij").alias("bj"))
    sums = cells.groupBy().agg(
        F.sum(F.expr("nij * (nij - 1) div 2")).alias("s_idx"),
        F.sum("nij").alias("n"),
    )
    sa = ra.groupBy().agg(F.sum(F.expr("ai * (ai - 1) div 2")).alias("s_a"))
    sb = cb.groupBy().agg(F.sum(F.expr("bj * (bj - 1) div 2")).alias("s_b"))
    exp_ = (
        "CAST(s_a AS DOUBLE) * s_b / (n * (n - 1) div 2)"
    )
    return (
        sums.crossJoin(F.broadcast(sa))
        .crossJoin(F.broadcast(sb))
        .select(
            "n",
            "s_idx",
            "s_a",
            "s_b",
            F.expr(
                f"CAST(CASE WHEN (CAST(s_a AS DOUBLE) + s_b) / 2"
                f" - {exp_} = 0 THEN NULL"
                f" ELSE round((s_idx - {exp_})"
                f" / ((CAST(s_a AS DOUBLE) + s_b) / 2 - {exp_}), 6)"
                " END AS DOUBLE)"
            ).alias("ari"),
        )
    )


@query(
    "sim_sq8_distortion_audit",
    oracle="""
    WITH x AS (
      SELECT vec_id, i.i AS dim, CAST(embedding[i.i + 1] AS DOUBLE) AS v
      FROM embeddings,
           LATERAL (SELECT unnest(range(0, len(embedding))) AS i) i
    ),
    stats AS (
      SELECT dim, min(v) AS lo, max(v) AS hi FROM x GROUP BY dim
    ),
    q AS (
      SELECT x.vec_id, x.v,
             CASE WHEN s.hi = s.lo THEN 0
                  ELSE CAST(round((x.v - s.lo) / (s.hi - s.lo) * 255)
                       AS BIGINT) END AS code,
             s.lo, s.hi
      FROM x JOIN stats s USING (dim)
    ),
    r AS (
      SELECT vec_id, v,
             CASE WHEN hi = lo THEN lo
                  ELSE lo + code * (hi - lo) / 255 END AS recon
      FROM q
    )
    SELECT vec_id,
           CAST(round(sum((v - recon) * (v - recon)), 8) AS DOUBLE)
             AS sq_err,
           CAST(round(max(abs(v - recon)), 8) AS DOUBLE) AS max_abs_err
    FROM r GROUP BY vec_id
    """,
)
def sim_sq8_distortion_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQ8 scalar-quantization distortion — the OTHER standard FAISS
    compression beside PQ (sim_pq_distortion_audit): each dimension
    min-max scales into one uint8 code (4x smaller than float32, 64x
    smaller than the float64 view), and the audit ships the per-vector
    reconstruction error (Σ(v−v̂)² and max |v−v̂|) — the number that
    says whether SQ8's ~(hi−lo)/255 per-dim resolution is acceptable
    before switching the 100 TB scan to codes. Per-dim min/max are one
    posexplode aggregate (the sim_lang_centroids shuffle shape — only
    (dim, partials) move); quantize/reconstruct are mirrored float
    expressions over those exact aggregates; constant dims (hi=lo)
    quantize to code 0 / reconstruct exactly, both sides. The 64-term
    per-vector float sums round to 8 (tiny magnitudes; order noise is
    ~1e-18 relative)."""
    emb = load_table(spark, sf_dir, "embeddings")
    x = emb.select(
        "vec_id",
        F.posexplode("embedding").alias("dim", "v0"),
    ).select(
        "vec_id", "dim", F.col("v0").cast("double").alias("v")
    )
    stats = x.groupBy("dim").agg(
        F.min("v").alias("lo"), F.max("v").alias("hi")
    )
    q = x.join(F.broadcast(stats), "dim").select(
        "vec_id",
        "v",
        "lo",
        "hi",
        F.expr(
            "CASE WHEN hi = lo THEN 0"
            " ELSE CAST(round((v - lo) / (hi - lo) * 255) AS BIGINT) END"
        ).alias("code"),
    )
    r = q.select(
        "vec_id",
        "v",
        F.expr(
            "CASE WHEN hi = lo THEN lo"
            " ELSE lo + code * (hi - lo) / 255 END"
        ).alias("recon"),
    )
    return r.groupBy("vec_id").agg(
        F.expr(
            "CAST(round(sum((v - recon) * (v - recon)), 8) AS DOUBLE)"
        ).alias("sq_err"),
        F.expr("CAST(round(max(abs(v - recon)), 8) AS DOUBLE)").alias(
            "max_abs_err"
        ),
    )


@query(
    "sim_lang_centroids",
    oracle="""
    WITH j AS (
      SELECT d.lang, e.embedding
      FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
    ),
    x AS (
      SELECT lang, i.i AS dim, embedding[i.i + 1] AS v
      FROM j, LATERAL (SELECT unnest(range(0, len(embedding))) AS i) i
    )
    SELECT lang, CAST(dim AS INT) AS dim,
           CAST(round(avg(v), 6) AS DOUBLE) AS centroid,
           count(*) AS n_vectors
    FROM x GROUP BY lang, dim
    """,
)
def sim_lang_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-modal join + per-group mean-pooled embedding centroid: the
    documents table keys into the embedding corpus (doc_id = vec_id) and
    each language gets its dimension-wise centroid. Map-side posexplode
    then ONE partial+final aggregate on (lang, dim) — the embedding rows
    never shuffle whole, only (lang, dim, partial-sum) triples do, so the
    plan holds at 100 TB corpus scale."""
    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    j = docs.join(emb, docs.doc_id == emb.vec_id).select("lang", "embedding")
    x = j.select("lang", F.posexplode("embedding").alias("dim", "v"))
    return x.groupBy("lang", "dim").agg(
        F.round(F.avg("v"), 6).alias("centroid"),
        F.count("*").alias("n_vectors"),
    )


@query(
    "sim_diverse_representatives",
    oracle=f"""
    WITH cents(cell, c) AS (VALUES
      {_DUCK_CENTS}
    ),
    scored_cells AS (
      SELECT e.vec_id, e.embedding, c.cell,
             list_sum(list_transform(range(1, len(e.embedding) + 1),
                      i -> CAST(e.embedding[i] AS DOUBLE) * c.c[i])) AS sim
      FROM embeddings e CROSS JOIN cents c
    ),
    assigned AS (
      SELECT vec_id, cell,
             CAST(round(sim / sqrt(list_sum(list_transform(embedding,
                    x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 6)
                  AS DOUBLE) AS cosine
      FROM (
        SELECT vec_id, embedding, cell, sim,
               row_number() OVER (
                 PARTITION BY vec_id ORDER BY sim DESC, cell ASC
               ) AS rn
        FROM scored_cells
      ) WHERE rn = 1
    ),
    sizes AS (SELECT cell, count(*) AS cluster_size FROM assigned GROUP BY cell)
    SELECT a.cell AS cluster, a.vec_id AS rep_id, a.cosine, s.cluster_size
    FROM (
      SELECT cell, vec_id, cosine,
             row_number() OVER (
               PARTITION BY cell ORDER BY cosine DESC, vec_id ASC
             ) AS rk
      FROM assigned
    ) a JOIN sizes s ON a.cell = s.cell
    WHERE a.rk <= 2
    """,
)
def sim_diverse_representatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Diversity sampling: the 2 most-central exemplars of each FIXED_CENTS
    cell — a spread-out subset covering every semantic region (diverse
    fine-tuning selection / corpus summarization). Assignment and
    centrality fall out of one map-side array_max; per-cell top-k is a
    WindowGroupLimit. The oracle scores raw embeddings and divides by the
    norm at the end (argmax is scale-invariant; the cosine value then
    matches Spark's unit-vector dot after rounding)."""
    emb = load_table(spark, sf_dir, "embeddings")
    return sim.cell_representatives(
        emb, "vec_id", "embedding", centroids=FIXED_CENTS, per_cell=2
    )


def _fixed_v0(dim: int = 64) -> list[float]:
    """Deterministic unit start vector for the power-iteration entry —
    data-independent (sin sequence) like FIXED_CENTS, so testdata
    regeneration cannot shift it and both engines parse identical
    doubles."""
    raw = [math.sin(0.5 + d) for d in range(dim)]
    n = math.sqrt(sum(x * x for x in raw))
    return [x / n for x in raw]


FIXED_V0 = _fixed_v0()

# DuckDB flat literal dot, 1-based indexing (Spark's [] is 0-based, DuckDB's
# 1-based — same element order, mirrored textually like _dot_lit_sql)
_DUCK_V0_DOT = "(" + "+".join(
    f"CAST(embedding[{d + 1}] AS DOUBLE)*{x!r}" for d, x in enumerate(FIXED_V0)
) + ")"


@query(
    "sim_power_iteration_topdir",
    oracle=f"""
    WITH ex AS (
      SELECT vec_id, gs.k AS k, CAST(embedding[gs.k] AS DOUBLE) AS val
      FROM embeddings, (SELECT unnest(range(1, 65)) AS k) gs
    ),
    d0 AS (SELECT vec_id, {_DUCK_V0_DOT} AS dp FROM embeddings),
    w1 AS (
      SELECT e.k, sum(e.val * d.dp) AS w
      FROM ex e JOIN d0 d USING (vec_id) GROUP BY e.k
    ),
    n1 AS (SELECT sqrt(sum(w * w)) AS n FROM w1),
    v1 AS (SELECT k, w / (SELECT n FROM n1) AS v FROM w1),
    d1 AS (
      SELECT e.vec_id, sum(e.val * v1.v) AS dp
      FROM ex e JOIN v1 ON e.k = v1.k GROUP BY e.vec_id
    ),
    w2 AS (
      SELECT e.k, sum(e.val * d.dp) AS w
      FROM ex e JOIN d1 d USING (vec_id) GROUP BY e.k
    ),
    n2 AS (SELECT sqrt(sum(w * w)) AS n FROM w2)
    SELECT CAST(k - 1 AS INT) AS component,
           CAST(round(w / (SELECT n FROM n2), 6) AS DOUBLE) AS loading
    FROM w2
    """,
)
def sim_power_iteration_topdir(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed PCA first stage: the dominant principal direction of
    the embedding corpus via TWO power-iteration rounds on X'X from the
    FIXED_V0 literal start vector (operators.similarity.
    power_iteration_topdir — one declarative plan, zero driver collects;
    per round one corpus scan + one id-keyed shuffle + a dim-sized
    aggregate, v never exceeds 64 doubles). Fixing the start vector and
    the round count makes the output a pure function of the data — the
    same unrolled-iteration trick as g_pagerank_parts — so DuckDB mirrors
    both rounds exactly; loadings rounded to 6 (partial-agg float order).
    A numpy twin of the identical algorithm pins the values in
    tests/test_similarity.py."""
    emb = load_table(spark, sf_dir, "embeddings")
    out = sim.power_iteration_topdir(emb, "vec_id", "embedding", FIXED_V0, steps=2)
    return out.select("component", F.round("loading", 6).alias("loading"))


@query(
    "sim_knn_graph_mutual",
    oracle=f"""
    WITH sub AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 256),
    scored AS (
      SELECT a.vec_id AS qid, b.vec_id AS cid,
             round({_DUCK_COSINE.format(a="a.embedding", b="b.embedding")}, 6)
               AS cosine
      FROM sub a JOIN sub b ON a.vec_id <> b.vec_id
    ),
    knn AS (
      SELECT qid, cid, CAST(cosine AS DOUBLE) AS cosine FROM (
        SELECT qid, cid, cosine,
               row_number() OVER (
                 PARTITION BY qid ORDER BY cosine DESC, cid
               ) AS rn
        FROM scored
      ) WHERE rn <= 3
    )
    SELECT x.qid AS a, x.cid AS b, x.cosine
    FROM knn x JOIN knn y ON x.qid = y.cid AND x.cid = y.qid
    WHERE x.qid < x.cid
    """,
)
def sim_knn_graph_mutual(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual k-NN graph construction (k=3, cosine): the graph-building
    step under spectral/agglomerative clustering and graph-based dedup —
    an edge survives only if each endpoint is in the OTHER's top-k
    (mutuality prunes hub artifacts). Exact on a bounded subset here
    (vec_id < 256 → 65k scored pairs; per-query top-k is
    WindowGroupLimit-pruned, mutuality is a self-join of the tiny edge
    list). At 100 TB the scored-pairs stage swaps for the banded
    candidate generators this catalog already ships (LSH buckets /
    IVF cells — sim_ann_*), same downstream top-k + mutual join; the
    all-pairs form exists to value-check that downstream exactly."""
    emb = load_table(spark, sf_dir, "embeddings").where(F.col("vec_id") < 256)
    # cast elements to DOUBLE before any arithmetic — the oracle multiplies
    # doubles, and float-precision products diverge at round-to-6 boundaries
    dbl = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    a = emb.select(F.col("vec_id").alias("qid"), dbl.alias("qe"))
    b = emb.select(F.col("vec_id").alias("cid"), dbl.alias("ce"))
    scored = (
        a.join(b, F.col("qid") != F.col("cid"))
        .select(
            "qid",
            "cid",
            F.round(
                sim.dot(F.col("qe"), F.col("ce"))
                / (sim.norm(F.col("qe")) * sim.norm(F.col("ce"))),
                6,
            ).alias("cosine"),
        )
    )
    w = W.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("cid"))
    knn = (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 3)
        .select("qid", "cid", "cosine")
    )
    other = knn.select(
        F.col("qid").alias("y_qid"), F.col("cid").alias("y_cid")
    )
    return (
        knn.join(
            other,
            (knn.qid == F.col("y_cid")) & (knn.cid == F.col("y_qid")),
        )
        .where(F.col("qid") < F.col("cid"))
        .select(F.col("qid").alias("a"), F.col("cid").alias("b"), "cosine")
    )


@query(
    "sim_label_centroid_accuracy",
    oracle="""
    WITH ex AS (
      SELECT vec_id, label, gs.k AS k, CAST(embedding[gs.k] AS DOUBLE) AS val
      FROM embeddings, (SELECT unnest(range(1, 65)) AS k) gs
    ),
    cents AS (
      SELECT label, k, round(avg(val), 6) AS cval
      FROM ex GROUP BY label, k
    ),
    cnorm AS (
      SELECT label, sqrt(sum(cval * cval)) AS cn FROM cents GROUP BY label
    ),
    vnorm AS (
      SELECT vec_id, sqrt(sum(val * val)) AS vn FROM ex GROUP BY vec_id
    ),
    scores AS (
      SELECT e.vec_id, c.label AS cand,
             round(sum(e.val * c.cval)
                   / (max(n.vn) * max(cn.cn)), 6) AS cosine
      FROM ex e
      JOIN cents c ON c.k = e.k
      JOIN vnorm n ON n.vec_id = e.vec_id
      JOIN cnorm cn ON cn.label = c.label
      GROUP BY e.vec_id, c.label
    ),
    best AS (
      SELECT vec_id, cand AS pred FROM (
        SELECT vec_id, cand,
               row_number() OVER (
                 PARTITION BY vec_id ORDER BY cosine DESC, cand ASC
               ) AS rn
        FROM scores
      ) WHERE rn = 1
    )
    SELECT e.label, CAST(count(*) AS BIGINT) AS n_vecs,
           CAST(sum(CASE WHEN b.pred = e.label THEN 1 ELSE 0 END) AS BIGINT)
             AS n_correct,
           CAST(round(sum(CASE WHEN b.pred = e.label THEN 1 ELSE 0 END)
                      / CAST(count(*) AS DOUBLE), 6) AS DOUBLE) AS accuracy
    FROM (SELECT DISTINCT vec_id, label FROM ex) e
    JOIN best b USING (vec_id)
    GROUP BY e.label
    """,
)
def sim_label_centroid_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-quality evaluation: per-label centroids (element-wise
    mean, rounded to 6 so both engines score IDENTICAL models), then
    nearest-centroid-by-cosine self-classification accuracy per label —
    the quick 'are these embeddings any good' probe an embedding pipeline
    runs after training/ingest. Fully relational on exploded
    (vec_id, pos, val) rows: centroid build and scoring are partial+final
    aggregates, argmax is a per-vec window (ties → lowest label, mirrored)
    — the 64×n_labels centroid table is broadcast-sized but the plan
    never collects it. On the synthetic near-isotropic corpus the
    accuracies are low — the ORACLE pins the computation, not a quality
    bar."""
    emb = load_table(spark, sf_dir, "embeddings")
    # NEGATIVE A/B (r15 optimization round): localCheckpointing ex (three
    # lazy consumers — centroids, vec norms, scoring join — each re-run
    # the corpus explode) measured WORSE interleaved at sf0.1: {1.30,
    # 1.52} vs {1.05, 1.13} s lazy. The explode is a map-side generator
    # over one narrow scan; materializing its 2M-row output costs more
    # than three parallel pipelined re-evaluations (the wave-1 class).
    ex = emb.select(
        "vec_id",
        "label",
        F.posexplode(F.col("embedding")).alias("p", "v"),
    ).select(
        "vec_id",
        "label",
        (F.col("p") + 1).alias("k"),
        F.col("v").cast("double").alias("val"),
    )
    cents = ex.groupBy("label", "k").agg(F.round(F.avg("val"), 6).alias("cval"))
    cnorm = cents.groupBy("label").agg(
        F.sqrt(F.sum(F.col("cval") * F.col("cval"))).alias("cn")
    )
    vnorm = ex.groupBy("vec_id").agg(
        F.sqrt(F.sum(F.col("val") * F.col("val"))).alias("vn")
    )
    scores = (
        ex.join(
            cents.withColumnsRenamed({"label": "cand"}), "k"
        )
        .join(vnorm, "vec_id")
        .join(cnorm.withColumnsRenamed({"label": "cand"}), "cand")
        .groupBy("vec_id", "cand")
        .agg(
            F.round(
                F.sum(F.col("val") * F.col("cval"))
                / (F.max("vn") * F.max("cn")),
                6,
            ).alias("cosine")
        )
    )
    w = W.partitionBy("vec_id").orderBy(F.desc("cosine"), F.asc("cand"))
    best = (
        scores.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("vec_id", F.col("cand").alias("pred"))
    )
    truth = emb.select("vec_id", "label")
    hit = F.when(F.col("pred") == F.col("label"), 1).otherwise(0)
    return (
        truth.join(best, "vec_id")
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.sum(hit).alias("n_correct"),
            F.round(F.sum(hit) / F.count(F.lit(1)).cast("double"), 6).alias(
                "accuracy"
            ),
        )
    )


@query(
    "sim_pca_residual_outliers",
    oracle=f"""
    WITH ex AS (
      SELECT vec_id, gs.k AS k, CAST(embedding[gs.k] AS DOUBLE) AS val
      FROM embeddings, (SELECT unnest(range(1, 65)) AS k) gs
    ),
    d0 AS (SELECT vec_id, {_DUCK_V0_DOT} AS dp FROM embeddings),
    w1 AS (
      SELECT e.k, sum(e.val * d.dp) AS w
      FROM ex e JOIN d0 d USING (vec_id) GROUP BY e.k
    ),
    n1 AS (SELECT sqrt(sum(w * w)) AS n FROM w1),
    v1 AS (SELECT k, w / (SELECT n FROM n1) AS v FROM w1),
    d1 AS (
      SELECT e.vec_id, sum(e.val * v1.v) AS dp
      FROM ex e JOIN v1 ON e.k = v1.k GROUP BY e.vec_id
    ),
    w2 AS (
      SELECT e.k, sum(e.val * d.dp) AS w
      FROM ex e JOIN d1 d USING (vec_id) GROUP BY e.k
    ),
    n2 AS (SELECT sqrt(sum(w * w)) AS n FROM w2),
    v2 AS (SELECT k, w / (SELECT n FROM n2) AS v FROM w2),
    proj AS (
      SELECT e.vec_id, sum(e.val * v2.v) AS p
      FROM ex e JOIN v2 ON e.k = v2.k GROUP BY e.vec_id
    ),
    norms AS (SELECT vec_id, sum(val * val) AS sq FROM ex GROUP BY vec_id),
    resid AS (
      SELECT n.vec_id,
             round(sqrt(greatest(n.sq - p.p * p.p, 0.0)), 6) AS residual
      FROM norms n JOIN proj p USING (vec_id)
    )
    SELECT vec_id, CAST(residual AS DOUBLE) AS residual,
           CAST(rnk AS INT) AS rnk
    FROM (
      SELECT vec_id, residual,
             row_number() OVER (ORDER BY residual DESC, vec_id) AS rnk
      FROM resid
    ) WHERE rnk <= 20
    """,
)
def sim_pca_residual_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space outlier detection: top-20 vectors by residual norm
    after projecting out the dominant principal direction (the 2-round
    power-iteration estimate from FIXED_V0 — same unrolled computation as
    sim_power_iteration_topdir, which the oracle repeats verbatim).
    residual² = ‖e‖² − (e·v)²: vectors the top component explains WORST —
    the cheap 'what doesn't belong in this corpus' probe before heavier
    density methods. All aggregates partial+final; the final top-20 is a
    TakeOrdered-sized ranking over one row per vector."""
    emb = load_table(spark, sf_dir, "embeddings")
    v = sim.power_iteration_topdir(emb, "vec_id", "embedding", FIXED_V0, steps=2)
    ex = emb.select(
        "vec_id", F.posexplode(F.col("embedding")).alias("__pos", "__val")
    ).withColumn("__val", F.col("__val").cast("double"))
    proj = (
        ex.join(
            F.broadcast(v.select(F.col("component").alias("__pos"), "loading")),
            "__pos",
        )
        .groupBy("vec_id")
        .agg(F.sum(F.col("__val") * F.col("loading")).alias("p"))
    )
    norms = ex.groupBy("vec_id").agg(
        F.sum(F.col("__val") * F.col("__val")).alias("sq")
    )
    resid = norms.join(proj, "vec_id").select(
        "vec_id",
        F.round(
            F.sqrt(
                F.greatest(F.col("sq") - F.col("p") * F.col("p"), F.lit(0.0))
            ),
            6,
        ).alias("residual"),
    )
    w = W.orderBy(F.desc("residual"), F.asc("vec_id"))
    return (
        resid.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= 20)
        .select("vec_id", "residual", F.col("rnk").cast("int").alias("rnk"))
    )


def _fixed_projections(n_proj: int = 16, dim: int = 64) -> list[list[float]]:
    """Deterministic Johnson–Lindenstrauss projection matrix shared
    verbatim by both engines (sin-sequence like FIXED_CENTS, different
    phase so the two models never coincide; data-independent so testdata
    regeneration can't shift it)."""
    return [
        [math.sin(2000.0 + j * dim + d) for d in range(dim)]
        for j in range(n_proj)
    ]


FIXED_PROJ = _fixed_projections()

# left-associative literal dot of the 1-BASED DuckDB list against row j —
# textual mirror of operators.similarity._dot_lit_sql's 0-based Spark form
def _duck_proj_sql(vec_sql: str, row: list[float]) -> str:
    return "(" + "+".join(
        f"CAST({vec_sql}[{d + 1}] AS DOUBLE)*{x!r}" for d, x in enumerate(row)
    ) + ")"


def _proj_cols_sql() -> tuple[str, str, str]:
    """(dot, norm_q, norm_c) over the q{j}/c{j} projected columns — same
    textual order on both engines so the doubles are bitwise equal."""
    dot = "(" + "+".join(f"q{j}*c{j}" for j in range(len(FIXED_PROJ))) + ")"
    nq = "SQRT(" + "+".join(f"q{j}*q{j}" for j in range(len(FIXED_PROJ))) + ")"
    nc = "SQRT(" + "+".join(f"c{j}*c{j}" for j in range(len(FIXED_PROJ))) + ")"
    return dot, nq, nc


def _rp_oracle() -> str:
    n = len(FIXED_PROJ)
    proj_cols = ",\n        ".join(
        f"{_duck_proj_sql('embedding', FIXED_PROJ[j])} AS p{j}" for j in range(n)
    )
    dot, nq, nc = _proj_cols_sql()
    qcols = ", ".join(f"p{j} AS q{j}" for j in range(n))
    ccols = ", ".join(f"p{j} AS c{j}" for j in range(n))
    return f"""
    WITH proj AS (
      SELECT vec_id,
        {proj_cols}
      FROM embeddings
    ),
    q AS (SELECT vec_id AS query_id, {qcols} FROM proj WHERE vec_id < 5),
    c AS (SELECT vec_id AS corpus_id, {ccols} FROM proj),
    scored AS (
      SELECT q.query_id, c.corpus_id,
             {dot} / ({nq} * {nc}) AS cos_raw
      FROM q CROSS JOIN c WHERE c.corpus_id <> q.query_id
    ),
    ranked AS (
      SELECT query_id, corpus_id, cos_raw,
             CAST(row_number() OVER (
               PARTITION BY query_id ORDER BY cos_raw DESC, corpus_id
             ) AS INT) AS rank
      FROM scored
    )
    SELECT query_id, corpus_id,
           CAST(round(cos_raw, 6) AS DOUBLE) AS cosine, rank
    FROM ranked WHERE rank <= 10
    """


@query("sim_random_projection_topk", oracle=_rp_oracle())
def sim_random_projection_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-10 neighbors in a Johnson–Lindenstrauss RANDOM
    PROJECTION space: 64-d embeddings reduced to 16-d through the
    FIXED_PROJ literal matrix, exact cosine + top-k in the reduced space
    — the dimensionality-reduction ANN family (alongside LSH buckets, IVF
    cells, and PQ codes), 4× less data per distance at rank time, which
    at 100 TB is the difference between a broadcastable projected corpus
    and not. FULL value oracle: the projection rows render into DuckDB as
    literals (the FIXED_CENTS trick) with textually identical
    left-associative summation, so projected coordinates — and therefore
    ranks — are bitwise reproducible across engines. Projection runs as
    16 HOF aggregate loops (zip_with + left-fold aggregate): 16 dots ×
    64 terms in ONE select is ~3k flat expr nodes, past the codegen
    method budget — the flat form compiled-FAILED into interpreted
    tree-walking and measured 3.6-9.7 s at sf0.1 vs the HOF's 1.1-1.5 s
    (the r5 column-column boundary, A/B r10). The left fold starts at
    0.0 so its summation order equals the oracle's textual
    left-associative chain term-for-term (IEEE 0.0+x == x): outputs
    bitwise match the flat form (verified) and the oracle. The 16-term
    projected-space cosine stays flat — far under the boundary. JL
    neighbor preservation asserted on PLANTED near-duplicates in
    tests/test_similarity.py (this corpus is near-isotropic, so recall
    against full-space brute force is ~chance by construction — not a
    meaningful pin)."""
    emb = load_table(spark, sf_dir, "embeddings")
    n = len(FIXED_PROJ)

    def hof_dot(row: list[float]) -> str:
        arr = "array(" + ",".join(repr(x) + "D" for x in row) + ")"
        return (
            f"aggregate(zip_with(embedding, {arr}, "
            "(a, b) -> CAST(a AS DOUBLE) * b), 0.0D, (acc, x) -> acc + x)"
        )

    proj = emb.select(
        "vec_id",
        *[F.expr(hof_dot(FIXED_PROJ[j])).alias(f"p{j}") for j in range(n)],
    )
    q = proj.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"),
        *[F.col(f"p{j}").alias(f"q{j}") for j in range(n)],
    )
    c = proj.select(
        F.col("vec_id").alias("corpus_id"),
        *[F.col(f"p{j}").alias(f"c{j}") for j in range(n)],
    )
    dot, nq, nc = _proj_cols_sql()
    scored = (
        F.broadcast(q)
        .crossJoin(c)
        .where(F.col("corpus_id") != F.col("query_id"))
        .withColumn("cos_raw", F.expr(f"{dot} / ({nq} * {nc})"))
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos_raw"), F.asc("corpus_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 10)
        .select(
            "query_id",
            "corpus_id",
            F.round("cos_raw", 6).alias("cosine"),
            F.col("rank").cast("int").alias("rank"),
        )
    )


@query(
    "sim_matryoshka_rerank_topk",
    oracle=f"""
    WITH q AS (SELECT vec_id AS query_id, embedding AS qe
               FROM embeddings WHERE vec_id < 5),
    coarse AS (
      SELECT q.query_id, c.vec_id AS corpus_id, c.embedding AS ce, q.qe,
             round({_DUCK_COSINE.format(a="c.embedding[1:16]", b="q.qe[1:16]")}, 6)
               AS csim
      FROM embeddings c CROSS JOIN q
      WHERE c.vec_id <> q.query_id
        AND list_sum(list_transform(c.embedding[1:16],
              x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) > 0
        AND list_sum(list_transform(q.qe[1:16],
              x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) > 0
    ),
    shortlist AS (
      SELECT query_id, corpus_id, ce, qe FROM (
        SELECT *, row_number() OVER (
          PARTITION BY query_id ORDER BY csim DESC, corpus_id
        ) AS crank FROM coarse
      ) WHERE crank <= 50
    ),
    exact AS (
      SELECT query_id, corpus_id,
             round({_DUCK_COSINE.format(a="ce", b="qe")}, 6) AS cosine
      FROM shortlist
    )
    SELECT query_id, corpus_id, CAST(cosine AS DOUBLE) AS cosine, rank FROM (
      SELECT query_id, corpus_id, cosine,
             CAST(row_number() OVER (
               PARTITION BY query_id ORDER BY cosine DESC, corpus_id
             ) AS INT) AS rank
      FROM exact
    ) WHERE rank <= 10
    """,
)
def sim_matryoshka_rerank_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka-style two-stage ANN (MRL embeddings, Kusupati et al.
    2022): the coarse pass scores only the FIRST 16 of 64 dimensions —
    with nested representations the prefix is itself a usable embedding,
    so the coarse scan reads a quarter of the vector bytes — keeps 50
    candidates per query, and the exact full-dimension cosine re-ranks
    just those to a top-10. Both stages round scores to 6 BEFORE ranking
    (cross-engine tie discipline) and break ties on corpus_id. Shapes:
    coarse is map-side vs the broadcast query set with a per-query
    WindowGroupLimit (the corpus never shuffles); re-rank touches <= 50
    rows per query. At 100 TB the prefix columns would be stored as
    their own column family so the coarse scan's I/O is actually 4x
    smaller — here both reads come from one array column."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 5)
    pre = lambda c: sim._as_double(F.slice(c, 1, 16))  # noqa: E731
    full = sim._as_double
    scored = (
        emb.select(F.col("vec_id").alias("corpus_id"), F.col("embedding").alias("ce"))
        .crossJoin(
            F.broadcast(
                queries.select(
                    F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe")
                )
            )
        )
        .where(F.col("corpus_id") != F.col("query_id"))
        # zero-norm guard (ANSI DIVIDE_BY_ZERO raises, the
        # cell_representatives/m_anomaly_zscore discipline): a vector
        # whose PREFIX is all zeros is excluded on both sides — and since
        # full_norm >= prefix_norm, the re-rank denominators are then
        # provably nonzero too, so one filter guards both stages
        .where(
            (sim.dot(pre(F.col("ce")), pre(F.col("ce"))) > 0)
            & (sim.dot(pre(F.col("qe")), pre(F.col("qe"))) > 0)
        )
        .select(
            "query_id", "corpus_id", "ce", "qe",
            F.round(
                sim.dot(pre(F.col("ce")), pre(F.col("qe")))
                / (sim.norm(pre(F.col("ce"))) * sim.norm(pre(F.col("qe")))),
                6,
            ).alias("csim"),
        )
    )
    wc = W.partitionBy("query_id").orderBy(F.desc("csim"), F.asc("corpus_id"))
    shortlist = (
        scored.withColumn("crank", F.row_number().over(wc))
        .where(F.col("crank") <= 50)
    )
    exact = shortlist.select(
        "query_id", "corpus_id",
        F.round(
            sim.dot(full(F.col("ce")), full(F.col("qe")))
            / (sim.norm(full(F.col("ce"))) * sim.norm(full(F.col("qe")))),
            6,
        ).alias("cosine"),
    )
    we = W.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("corpus_id"))
    return (
        exact.withColumn("rank", F.row_number().over(we))
        .where(F.col("rank") <= 10)
        .select("query_id", "corpus_id", "cosine", "rank")
    )


from .dedup import _DUCK_LP_ROUND as _LP  # noqa: E402  (shared propagation round)

_SEMDEDUP_ORACLE = f"""
    WITH {_DUCK_ASSIGN},
    {_duck_subblocked(NEARDUP_MAX_BLOCK)},
    prs AS (
      SELECT x.vec_id AS id_a, y.vec_id AS id_b
      FROM suba x JOIN suba y
        ON x.cell = y.cell AND x.sub = y.sub AND x.vec_id < y.vec_id
      WHERE round({_DUCK_COSINE.format(a="x.embedding", b="y.embedding")}, 6) >= 0.3
    ),
    symp AS (
      SELECT id_a AS a, id_b AS b FROM prs
      UNION ALL SELECT id_b, id_a FROM prs
    ),
    l0 AS (SELECT vec_id AS id, vec_id AS lbl FROM embeddings),
    l1 AS ({_LP.format(prev="l0")}),
    l2 AS ({_LP.format(prev="l1")}),
    l3 AS ({_LP.format(prev="l2")}),
    norms AS (
      SELECT vec_id,
             round(sqrt(list_sum(list_transform(embedding,
                   x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 6) AS nrm
      FROM embeddings
    ),
    ranked AS (
      SELECT l3.lbl, l3.id,
             row_number() OVER (
               PARTITION BY l3.lbl ORDER BY n.nrm DESC, l3.id ASC
             ) AS rn,
             count(*) OVER (PARTITION BY l3.lbl) AS cs
      FROM l3 JOIN norms n ON n.vec_id = l3.id
    )
    SELECT CAST(lbl AS BIGINT) AS cluster, CAST(cs AS BIGINT) AS cluster_size,
           CAST(id AS BIGINT) AS keeper_id
    FROM ranked WHERE rn = 1
"""


@query(
    "d_semdedup_keepers",
    oracle=_SEMDEDUP_ORACLE,
)
def d_semdedup_keepers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (Abbas et al. 2023): semantic deduplication keeps ONE
    representative per group of embedding-near-duplicates — here the
    connected components of sim_semantic_neardup_pairs' cell-blocked
    cosine graph (3 unrolled min-label rounds, the d_fuzzy_dedup_clusters
    discipline — near-dup components are clique-ish so diameter ≤ 3
    converges), keeper = the HIGHEST-NORM member (ties → lowest id): the
    magnitude-as-information heuristic, mirroring fuzzy dedup's
    longest-doc policy in embedding space. The pair table is the reused
    catalog entry localCheckpointed (three propagation rounds × two
    references would re-run the cell self-join multiplicatively); norms
    round to 6 before ranking so both engines rank identical doubles.
    Fully oracled: FIXED_CENTS blocking, cosine threshold, propagation,
    and the keeper argmax all mirror in DuckDB."""
    emb = load_table(spark, sf_dir, "embeddings")
    from . import QUERIES

    pairs = (
        QUERIES["sim_semantic_neardup_pairs"](spark, sf_dir)
        .select("id_a", "id_b")
        .localCheckpoint(eager=False)
    )
    sym = pairs.select(
        F.col("id_a").alias("a"), F.col("id_b").alias("b")
    ).unionAll(pairs.select(F.col("id_b").alias("a"), F.col("id_a").alias("b")))
    from .dedup import _min_label_rounds

    lbl = _min_label_rounds(
        sym,
        emb.select(F.col("vec_id").alias("id"), F.col("vec_id").alias("lbl")),
    )
    norms = emb.select(
        F.col("vec_id"),
        F.round(
            F.sqrt(
                F.expr(
                    "aggregate(embedding, 0.0D,"
                    " (acc, x) -> acc + CAST(x AS DOUBLE) * CAST(x AS DOUBLE))"
                )
            ),
            6,
        ).alias("nrm"),
    )
    return (
        lbl.join(norms, lbl.id == norms.vec_id)
        .groupBy(F.col("lbl").alias("cluster"))
        .agg(
            F.count(F.lit(1)).alias("cluster_size"),
            F.max_by(
                F.col("id"),
                F.struct(F.col("nrm"), (-F.col("id")).alias("tb")),
            ).alias("keeper_id"),
        )
        .select(
            F.col("cluster").cast("long").alias("cluster"),
            "cluster_size",
            F.col("keeper_id").cast("long").alias("keeper_id"),
        )
    )


_MMR_NZ = (
    "list_sum(list_transform({v}, x -> CAST(x AS DOUBLE)"
    " * CAST(x AS DOUBLE))) > 0"
)


@query(
    "sim_mmr_rerank",
    oracle=f"""
    WITH qs AS (
      SELECT vec_id AS query_id, embedding AS qe FROM embeddings
      WHERE vec_id < 5 AND {_MMR_NZ.format(v="embedding")}
    ),
    cs AS (
      SELECT vec_id AS corpus_id, embedding AS ce FROM embeddings
      WHERE {_MMR_NZ.format(v="embedding")}
    ),
    scored AS (
      SELECT q.query_id, c.corpus_id, c.ce,
             CAST(round({_DUCK_COSINE.format(a="c.ce", b="q.qe")}, 6)
                  AS DOUBLE) AS rel
      FROM cs c CROSS JOIN qs q WHERE c.corpus_id <> q.query_id
    ),
    sl AS (
      SELECT query_id, corpus_id, ce, rel FROM (
        SELECT *, row_number() OVER (
          PARTITION BY query_id ORDER BY rel DESC, corpus_id
        ) AS rk FROM scored
      ) WHERE rk <= 8
    ),
    sims AS (
      SELECT a.query_id, a.corpus_id AS ia, b.corpus_id AS ib,
             CAST(round({_DUCK_COSINE.format(a="a.ce", b="b.ce")}, 6)
                  AS DOUBLE) AS sim
      FROM sl a JOIN sl b
        ON a.query_id = b.query_id AND a.corpus_id <> b.corpus_id
    ),
    s1 AS (
      SELECT query_id, corpus_id AS s1_id, rel AS s1_score FROM (
        SELECT *, row_number() OVER (
          PARTITION BY query_id ORDER BY rel DESC, corpus_id
        ) AS rk FROM sl
      ) WHERE rk = 1
    ),
    c2 AS (
      SELECT sl.query_id, sl.corpus_id,
             CAST(round(0.7 * sl.rel - 0.3 * s.sim, 6) AS DOUBLE) AS score2
      FROM sl
      JOIN s1 ON s1.query_id = sl.query_id AND sl.corpus_id <> s1.s1_id
      JOIN sims s ON s.query_id = sl.query_id AND s.ia = sl.corpus_id
                 AND s.ib = s1.s1_id
    ),
    s2 AS (
      SELECT query_id, corpus_id AS s2_id, score2 AS s2_score FROM (
        SELECT *, row_number() OVER (
          PARTITION BY query_id ORDER BY score2 DESC, corpus_id
        ) AS r2 FROM c2
      ) WHERE r2 = 1
    ),
    c3 AS (
      SELECT sl.query_id, sl.corpus_id,
             CAST(round(0.7 * sl.rel
                  - 0.3 * greatest(sa.sim, sb.sim), 6) AS DOUBLE) AS score3
      FROM sl
      JOIN s1 ON s1.query_id = sl.query_id
      JOIN s2 ON s2.query_id = sl.query_id
      JOIN sims sa ON sa.query_id = sl.query_id AND sa.ia = sl.corpus_id
                  AND sa.ib = s1.s1_id
      JOIN sims sb ON sb.query_id = sl.query_id AND sb.ia = sl.corpus_id
                  AND sb.ib = s2.s2_id
      WHERE sl.corpus_id <> s1.s1_id AND sl.corpus_id <> s2.s2_id
    ),
    s3 AS (
      SELECT query_id, corpus_id AS s3_id, score3 AS s3_score FROM (
        SELECT *, row_number() OVER (
          PARTITION BY query_id ORDER BY score3 DESC, corpus_id
        ) AS r3 FROM c3
      ) WHERE r3 = 1
    )
    SELECT query_id, CAST(1 AS INT) AS pick, s1_id AS corpus_id,
           CAST(s1_score AS DOUBLE) AS score FROM s1
    UNION ALL SELECT query_id, CAST(2 AS INT), s2_id,
           CAST(s2_score AS DOUBLE) FROM s2
    UNION ALL SELECT query_id, CAST(3 AS INT), s3_id,
           CAST(s3_score AS DOUBLE) FROM s3
    """,
)
def sim_mmr_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal Marginal Relevance rerank (Carbonell-Goldstein 1998) —
    the diversity-aware retrieval shape RAG pipelines actually serve:
    from each query's top-8 cosine shortlist, pick 3 results where
    pick i maximizes λ·rel(d) − (1−λ)·maxⱼ<ᵢ sim(d, pickⱼ), λ=0.7 —
    near-duplicate hits are demoted in favor of coverage (the
    serving-time cousin of sim_diverse_representatives' corpus-side
    sampling). The greedy argmax chain is FIXED-DEPTH (3 unrolled
    steps, the g_bfs_layers discipline), so the whole thing is
    declarative and fully oracled: rel and every pairwise sim round-6,
    each step's combined score round-6 BEFORE its argmax with
    corpus_id as the total-order tiebreak (round-before-rank). Scale:
    the corpus pass is the shortlist build (broadcast queries, one
    scan); everything after is 8-per-query bounded — shortlist and the
    8×8 sim table are localCheckpointed (5 and 3 consumers). Zero-norm
    vectors excluded on both sides (the sim_range_search guard)."""
    emb = load_table(spark, sf_dir, "embeddings")

    def nz(c):
        return sim.dot(sim._as_double(c), sim._as_double(c)) > 0

    def cos(a, b):
        return F.round(
            sim.dot(sim._as_double(a), sim._as_double(b))
            / (sim.norm(sim._as_double(a)) * sim.norm(sim._as_double(b))),
            6,
        )

    q = (
        emb.where((F.col("vec_id") < 5) & nz(F.col("embedding")))
        .select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe"))
    )
    c = emb.where(nz(F.col("embedding"))).select(
        F.col("vec_id").alias("corpus_id"), F.col("embedding").alias("ce")
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .where(F.col("corpus_id") != F.col("query_id"))
        .select(
            "query_id", "corpus_id", "ce",
            cos(F.col("ce"), F.col("qe")).alias("rel"),
        )
    )
    wq = W.partitionBy("query_id").orderBy(F.desc("rel"), F.asc("corpus_id"))
    sl = (
        scored.withColumn("rk", F.row_number().over(wq))
        .where(F.col("rk") <= 8)
        .localCheckpoint(eager=False)  # s1/c2/c3 + both sims sides consume
    )
    a = sl.select("query_id", F.col("corpus_id").alias("ia"), F.col("ce").alias("ea"))
    b = sl.select("query_id", F.col("corpus_id").alias("ib"), F.col("ce").alias("eb"))
    sims = (
        a.join(b, "query_id")
        .where(F.col("ia") != F.col("ib"))
        .select(
            "query_id", "ia", "ib",
            cos(F.col("ea"), F.col("eb")).alias("sim"),
        )
        .localCheckpoint(eager=False)  # c2 + c3 (twice) consume
    )
    s1 = sl.where(F.col("rk") == 1).select(
        "query_id",
        F.col("corpus_id").alias("s1_id"),
        F.col("rel").alias("s1_score"),
    )
    c2 = (
        sl.join(s1, "query_id")
        .where(F.col("corpus_id") != F.col("s1_id"))
        .join(
            sims.select(
                "query_id",
                F.col("ia").alias("corpus_id"),
                F.col("ib").alias("s1_id"),
                "sim",
            ),
            ["query_id", "corpus_id", "s1_id"],
        )
        .select(
            "query_id", "corpus_id",
            F.expr("CAST(round(0.7D * rel - 0.3D * sim, 6) AS DOUBLE)").alias(
                "score2"
            ),
        )
    )
    w2 = W.partitionBy("query_id").orderBy(F.desc("score2"), F.asc("corpus_id"))
    s2 = (
        c2.withColumn("r2", F.row_number().over(w2))
        .where(F.col("r2") == 1)
        .select(
            "query_id",
            F.col("corpus_id").alias("s2_id"),
            F.col("score2").alias("s2_score"),
        )
    )
    c3 = (
        sl.join(s1, "query_id")
        .join(s2, "query_id")
        .where(
            (F.col("corpus_id") != F.col("s1_id"))
            & (F.col("corpus_id") != F.col("s2_id"))
        )
        .join(
            sims.select(
                "query_id",
                F.col("ia").alias("corpus_id"),
                F.col("ib").alias("s1_id"),
                F.col("sim").alias("sim1"),
            ),
            ["query_id", "corpus_id", "s1_id"],
        )
        .join(
            sims.select(
                "query_id",
                F.col("ia").alias("corpus_id"),
                F.col("ib").alias("s2_id"),
                F.col("sim").alias("sim2"),
            ),
            ["query_id", "corpus_id", "s2_id"],
        )
        .select(
            "query_id", "corpus_id",
            F.expr(
                "CAST(round(0.7D * rel - 0.3D * greatest(sim1, sim2), 6)"
                " AS DOUBLE)"
            ).alias("score3"),
        )
    )
    w3 = W.partitionBy("query_id").orderBy(F.desc("score3"), F.asc("corpus_id"))
    s3 = (
        c3.withColumn("r3", F.row_number().over(w3))
        .where(F.col("r3") == 1)
        .select(
            "query_id",
            F.col("corpus_id").alias("s3_id"),
            F.col("score3").alias("s3_score"),
        )
    )
    return (
        s1.select(
            "query_id",
            F.lit(1).cast("int").alias("pick"),
            F.col("s1_id").alias("corpus_id"),
            F.col("s1_score").cast("double").alias("score"),
        )
        .unionByName(
            s2.select(
                "query_id",
                F.lit(2).cast("int").alias("pick"),
                F.col("s2_id").alias("corpus_id"),
                F.col("s2_score").cast("double").alias("score"),
            )
        )
        .unionByName(
            s3.select(
                "query_id",
                F.lit(3).cast("int").alias("pick"),
                F.col("s3_id").alias("corpus_id"),
                F.col("s3_score").cast("double").alias("score"),
            )
        )
    )


@query(
    "sim_range_search",
    oracle=f"""
    WITH q AS (
      SELECT vec_id AS query_id, embedding AS qe FROM embeddings
      WHERE vec_id < 5
    )
    SELECT q.query_id, c.vec_id AS corpus_id,
           CAST(round({_DUCK_COSINE.format(a="c.embedding", b="q.qe")}, 6)
                AS DOUBLE) AS cosine
    FROM embeddings c CROSS JOIN q
    WHERE c.vec_id <> q.query_id
      AND list_sum(list_transform(c.embedding,
            x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) > 0
      AND list_sum(list_transform(q.qe,
            x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) > 0
      AND round({_DUCK_COSINE.format(a="c.embedding", b="q.qe")}, 6) >= 0.3
    """,
)
def sim_range_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE search — every corpus vector within cosine >= 0.3 of each
    query (FAISS range_search, the other standard ANN read API beside
    top-k: dedup and retrieval-with-confidence-floors want 'all matches
    above t', not a fixed k). Queries broadcast, ONE corpus pass, the
    threshold filter runs map-side — zero shuffles at any corpus size,
    which is exactly why range search scales better than global top-k
    (no per-query ordering state at all). Threshold 0.3 matches
    sim_semantic_neardup_pairs (the corpus is near-orthogonal; prod
    default stays higher). Round-before-threshold keeps both engines
    filtering identical doubles. Zero-norm vectors are filtered on BOTH
    sides (ADVICE r11): 0/0 cosine is NaN, and NaN >= t is false in
    Spark but true under DuckDB's NaN-sorts-greatest comparison — the
    same guard the matryoshka/margin-audit siblings carry."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 5)
    # norms hoisted BELOW the join: norm(ce) depends only on the corpus
    # row and norm(qe) only on the 5 broadcast queries, but written
    # inline Catalyst inlines the whole cosine into the join condition
    # and every pair pays dot + BOTH norm folds (then survivors pay all
    # three again in the output projection) — as pre-join columns the
    # condition can't reach past the join boundary, so each norm folds
    # once per row, not once per pair. Same doubles, same division.
    cos = F.round(
        sim.dot(sim._as_double(F.col("ce")), sim._as_double(F.col("qe")))
        / (F.col("cn") * F.col("qn")),
        6,
    )
    return (
        emb.select(
            F.col("vec_id").alias("corpus_id"),
            F.col("embedding").alias("ce"),
            sim.norm(sim._as_double(F.col("embedding"))).alias("cn"),
        )
        .where(F.col("cn") > 0)
        .crossJoin(
            F.broadcast(
                queries.select(
                    F.col("vec_id").alias("query_id"),
                    F.col("embedding").alias("qe"),
                    sim.norm(sim._as_double(F.col("embedding"))).alias("qn"),
                ).where(F.col("qn") > 0)
            )
        )
        .where(F.col("corpus_id") != F.col("query_id"))
        .select("query_id", "corpus_id", cos.alias("cosine"))
        .where(F.col("cosine") >= 0.3)
    )


@query(
    "sim_cluster_margin_audit",
    oracle=f"""
    WITH cents(cell, c) AS (VALUES
      {_DUCK_CENTS}
    ),
    scored_cells AS (
      SELECT e.vec_id, e.embedding, c.cell,
             list_sum(list_transform(range(1, len(e.embedding) + 1),
                      i -> CAST(e.embedding[i] AS DOUBLE) * c.c[i])) AS sim
      FROM embeddings e CROSS JOIN cents c
    ),
    ranked AS (
      SELECT vec_id, cell, sim,
             row_number() OVER (
               PARTITION BY vec_id ORDER BY sim DESC, cell ASC
             ) AS rn
      FROM scored_cells
    ),
    pick AS (
      SELECT r1.vec_id, r1.cell, r1.sim AS d1, r2.sim AS d2
      FROM ranked r1 JOIN ranked r2
        ON r1.vec_id = r2.vec_id AND r1.rn = 1 AND r2.rn = 2
    ),
    norms AS (
      SELECT vec_id,
             sqrt(list_sum(list_transform(embedding,
                  x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
      FROM embeddings
    ),
    per AS (
      SELECT p.cell, (p.d1 - p.d2) / n.nrm AS nmargin
      FROM pick p JOIN norms n ON n.vec_id = p.vec_id
      WHERE n.nrm > 0
    )
    SELECT CAST(cell AS INT) AS cluster,
           CAST(count(*) AS BIGINT) AS n_members,
           CAST(round(avg(nmargin), 6) AS DOUBLE) AS mean_margin
    FROM per GROUP BY cell
    """,
)
def sim_cluster_margin_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Clustering-quality MARGIN audit — per cell, the mean normalized gap
    between each member's best and second-best centroid similarity
    (cos₁ − cos₂; unit centroids make (d1−d2)/‖v‖ exactly that): the
    cheap silhouette stand-in that tells you which cells are confidently
    separated and which sit on a boundary (small margin ⇒ reassignment
    churn under retraining — the audit-family member for the IVF/cluster
    entries, like recall for LSH and overestimate for CMS). All 8
    literal-model dots are ONE flat parsed expression array (the r5
    rule: literal dots codegen, HOF interprets); best/second-best via
    sort_array on the 8-element array — no window over the corpus, one
    map-side pass + one bounded aggregate. Zero-norm vectors filtered on
    both sides (ANSI division guard)."""
    emb = load_table(spark, sf_dir, "embeddings")
    arr_sql = (
        "array("
        + ",".join(sim._dot_lit_sql("embedding", c) for c in FIXED_CENTS)
        + ")"
    )
    nrm_sql = (
        "sqrt(aggregate(embedding, 0.0D,"
        " (acc, x) -> acc + CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))"
    )
    per = (
        emb.select(
            F.expr(arr_sql).alias("sims"),
            F.expr(nrm_sql).alias("nrm"),
        )
        .where(F.col("nrm") > 0)
        .select(
            (
                F.array_position(
                    F.col("sims"), F.array_max(F.col("sims"))
                ).cast("int")
                - 1
            ).alias("cluster"),
            F.sort_array(F.col("sims"), asc=False).alias("ds"),
            "nrm",
        )
        .select(
            "cluster",
            ((F.col("ds")[0] - F.col("ds")[1]) / F.col("nrm")).alias(
                "nmargin"
            ),
        )
    )
    return per.groupBy("cluster").agg(
        F.count(F.lit(1)).alias("n_members"),
        F.round(F.avg("nmargin"), 6).alias("mean_margin"),
    )


@query(
    "sim_centroid_drift",
    oracle="""
    WITH pos AS (
      SELECT e.label, e.vec_id % 2 AS par, u.i AS pos,
             CAST(e.embedding[u.i] AS DOUBLE) AS val
      FROM embeddings e,
           LATERAL (SELECT unnest(range(1, len(e.embedding) + 1)) AS i) u
    ),
    cent AS (
      SELECT label, pos,
             round(avg(CASE WHEN par = 0 THEN val END), 6) AS a,
             round(avg(CASE WHEN par = 1 THEN val END), 6) AS b,
             sum(CASE WHEN par = 0 THEN 1 ELSE 0 END) AS na0,
             sum(CASE WHEN par = 1 THEN 1 ELSE 0 END) AS nb0
      FROM pos GROUP BY label, pos
    )
    SELECT label,
           CAST(min(na0) AS BIGINT) AS n_even,
           CAST(min(nb0) AS BIGINT) AS n_odd,
           CAST(round(sum(a * b)
                / (sqrt(sum(a * a)) * sqrt(sum(b * b))), 6) AS DOUBLE)
             AS centroid_cosine
    FROM cent
    GROUP BY label
    HAVING min(na0) > 0 AND min(nb0) > 0
       AND sum(a * a) > 0 AND sum(b * b) > 0
    """,
)
def sim_centroid_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-drift monitor: split the corpus into two halves by
    vec_id parity (a deterministic stand-in for 'last week vs this
    week'), compute each label's per-half centroid, and report the
    cosine between the halves' centroids — the production check that an
    embedding model update or a data shift hasn't rotated a class's
    region (cosine near 1 = stable; ANN recall and classifier
    thresholds survive). One posexplode pass + two stacked aggregates —
    centroids via conditional avg per (label, dim, parity), cosine from
    the per-label moment sums; no window, no join, no collect.
    Centroids are ROUNDED TO 6 before the cosine (the
    sim_label_centroid_accuracy precedent: per-dim avg is an
    order-dependent float sum, so both engines must score the identical
    rounded model). Labels missing a half or with a zero-norm centroid
    are dropped on both sides (the NaN-comparison guard)."""
    emb = load_table(spark, sf_dir, "embeddings")
    pos = emb.select(
        "label",
        (F.col("vec_id") % 2).alias("par"),
        F.posexplode(F.col("embedding")).alias("pos0", "val0"),
    ).select(
        "label",
        "par",
        (F.col("pos0") + 1).alias("pos"),
        F.col("val0").cast("double").alias("val"),
    )
    cent = pos.groupBy("label", "pos").agg(
        F.round(F.avg(F.when(F.col("par") == 0, F.col("val"))), 6).alias("a"),
        F.round(F.avg(F.when(F.col("par") == 1, F.col("val"))), 6).alias("b"),
        F.sum(F.when(F.col("par") == 0, 1).otherwise(0)).alias("na0"),
        F.sum(F.when(F.col("par") == 1, 1).otherwise(0)).alias("nb0"),
    )
    return (
        cent.groupBy("label")
        .agg(
            F.min("na0").alias("n_even"),
            F.min("nb0").alias("n_odd"),
            F.sum(F.col("a") * F.col("b")).alias("ab"),
            F.sum(F.col("a") * F.col("a")).alias("aa"),
            F.sum(F.col("b") * F.col("b")).alias("bb"),
        )
        .where(
            (F.col("n_even") > 0)
            & (F.col("n_odd") > 0)
            & (F.col("aa") > 0)
            & (F.col("bb") > 0)
        )
        .select(
            "label",
            "n_even",
            "n_odd",
            F.round(
                F.col("ab") / (F.sqrt(F.col("aa")) * F.sqrt(F.col("bb"))), 6
            ).alias("centroid_cosine"),
        )
    )


@query(
    "sim_ivf_recall_audit",
    oracle=f"""
    WITH {_DUCK_ASSIGN},
    {_DUCK_IVF_PROBE}
    ivf AS (
      SELECT query_id, corpus_id FROM (
        SELECT query_id, corpus_id,
               row_number() OVER (
                 PARTITION BY query_id ORDER BY cosine DESC, corpus_id
               ) AS rank
        FROM (
          SELECT DISTINCT p.query_id, a.vec_id AS corpus_id,
                 {_DUCK_COSINE.format(a="a.embedding", b="p.qe")} AS cosine
          FROM q_probe p JOIN assigned a ON p.cell = a.cell
          WHERE a.vec_id <> p.query_id
        )
      ) WHERE rank <= 10
    ),
    exact AS (
      SELECT query_id, corpus_id FROM (
        SELECT q.query_id, e.vec_id AS corpus_id,
               row_number() OVER (
                 PARTITION BY q.query_id
                 ORDER BY {_DUCK_COSINE.format(a="e.embedding", b="q.qe")}
                          DESC, e.vec_id
               ) AS rank
        FROM embeddings e CROSS JOIN q
        WHERE e.vec_id <> q.query_id
      ) WHERE rank <= 10
    )
    SELECT e.query_id,
           CAST(count(*) AS BIGINT) AS n_exact,
           CAST(count(i.corpus_id) AS BIGINT) AS n_found,
           CAST((count(i.corpus_id) * 1000000) // count(*) AS BIGINT)
             AS recall_ppm
    FROM exact e LEFT JOIN ivf i
      ON i.query_id = e.query_id AND i.corpus_id = e.corpus_id
    GROUP BY e.query_id
    """,
)
def sim_ivf_recall_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@10 of the IVF index against exact brute force — the ANN
    member of the sketch-audit family (d_lsh_recall_audit audits the
    dedup bands; this audits the retrieval index the similarity entries
    ship): per query, how many of the TRUE top-10 the probe-4-of-8-cells
    search returns. recall < 1 here is the honest cost of skipping 4
    cells — the number a deployment tunes nprobe against. Both sides
    rank by the identical left-fold cosine (ties to the lower corpus
    id); the IVF side is the sim_ann_ivf_topk pipeline verbatim (same
    FIXED_CENTS, probe ties to the HIGHER cell), the exact side one
    broadcast-queries corpus pass. Output is all-integer (counts + ppm
    floor division) — zero float channels."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 5)
    ivf = sim.ann_topk_ivf(
        emb, queries, "vec_id", "embedding", k=10, n_cells=8, nprobe=4,
        centroids=FIXED_CENTS,
    ).select("query_id", "corpus_id")
    # norms hoisted into the pre-join projections (the sim_range_search
    # review-pass-6 lesson: written inline they fold once PER PAIR —
    # norm(ce) 5x per corpus row, norm(qe) |corpus| times per query; as
    # pre-join columns each folds once per input row, identical doubles)
    qb = queries.select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qe"),
        sim.norm(sim._as_double(F.col("embedding"))).alias("qn"),
    )
    pairs = (
        emb.select(
            F.col("vec_id").alias("corpus_id"),
            F.col("embedding").alias("ce"),
            sim.norm(sim._as_double(F.col("embedding"))).alias("cn"),
        )
        .crossJoin(F.broadcast(qb))
        .where(F.col("corpus_id") != F.col("query_id"))
        .select(
            "query_id",
            "corpus_id",
            (
                sim.dot(sim._as_double(F.col("ce")), sim._as_double(F.col("qe")))
                / (F.col("cn") * F.col("qn"))
            ).alias("cosine"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("corpus_id"))
    exact = (
        pairs.select("query_id", "corpus_id", F.row_number().over(w).alias("rank"))
        .where(F.col("rank") <= 10)
        .select("query_id", "corpus_id")
    )
    return (
        exact.join(
            ivf.withColumn("found", F.lit(1)),
            ["query_id", "corpus_id"],
            "left",
        )
        .groupBy("query_id")
        .agg(
            F.count(F.lit(1)).alias("n_exact"),
            F.count("found").alias("n_found"),
            F.expr(
                "CAST((count(found) * 1000000) div count(1) AS BIGINT)"
            ).alias("recall_ppm"),
        )
    )


@query(
    "sim_ivf_ndcg_audit",
    oracle=f"""
    WITH {_DUCK_ASSIGN},
    {_DUCK_IVF_PROBE}
    ivf AS (
      SELECT query_id, corpus_id, rank FROM (
        SELECT query_id, corpus_id,
               row_number() OVER (
                 PARTITION BY query_id ORDER BY cosine DESC, corpus_id
               ) AS rank
        FROM (
          SELECT DISTINCT p.query_id, a.vec_id AS corpus_id,
                 {_DUCK_COSINE.format(a="a.embedding", b="p.qe")} AS cosine
          FROM q_probe p JOIN assigned a ON p.cell = a.cell
          WHERE a.vec_id <> p.query_id
        )
      ) WHERE rank <= 10
    ),
    exact AS (
      SELECT query_id, corpus_id, rank FROM (
        SELECT q.query_id, e.vec_id AS corpus_id,
               row_number() OVER (
                 PARTITION BY q.query_id
                 ORDER BY {_DUCK_COSINE.format(a="e.embedding", b="q.qe")}
                          DESC, e.vec_id
               ) AS rank
        FROM embeddings e CROSS JOIN q
        WHERE e.vec_id <> q.query_id
      ) WHERE rank <= 10
    ),
    rel AS (
      SELECT q.query_id, e.vec_id AS corpus_id,
             CAST(round({_DUCK_COSINE.format(a="e.embedding", b="q.qe")}, 6)
                  AS DOUBLE) AS rel
      FROM embeddings e CROSS JOIN q WHERE e.vec_id <> q.query_id
    ),
    dcg AS (
      SELECT i.query_id,
             CAST(round(sum(r.rel / log2(CAST(i.rank AS BIGINT) + 1)), 6)
                  AS DOUBLE) AS dcg
      FROM ivf i JOIN rel r USING (query_id, corpus_id) GROUP BY 1
    ),
    idcg AS (
      SELECT x.query_id,
             CAST(round(sum(r.rel / log2(CAST(x.rank AS BIGINT) + 1)), 6)
                  AS DOUBLE) AS idcg
      FROM exact x JOIN rel r USING (query_id, corpus_id) GROUP BY 1
    )
    SELECT d.query_id, d.dcg, x.idcg,
           CAST(CASE WHEN x.idcg = 0 THEN NULL
                ELSE round(d.dcg / x.idcg, 6) END AS DOUBLE) AS ndcg
    FROM dcg d JOIN idcg x USING (query_id)
    """,
)
def sim_ivf_ndcg_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NDCG@10 of the IVF index against the exact ideal ranking — the
    RANKING-QUALITY member of the sketch-audit family beside
    sim_ivf_recall_audit's set-overlap recall (two indexes with equal
    recall can order survivors very differently; NDCG is what a search
    deployment actually tunes): graded relevance = the exact round-6
    cosine, DCG = Σ rel/log₂(rank+1) over each list, ndcg = DCG/IDCG.
    The IVF list is the sim_ann_ivf_topk pipeline verbatim (FIXED_CENTS
    probe-4-of-8); relevance joins from ONE exact-pairs frame both
    lists share, so the audit compares orderings, never re-derived
    scores. rank+1 is cast BIGINT before the add (the int-arith
    allowlist has no 'rank' class — deliberate: window ranks feeding
    arithmetic should widen). 10-term float sums round-6; idcg=0 →
    NULL both sides."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 5)
    ivf = sim.ann_topk_ivf(
        emb, queries, "vec_id", "embedding", k=10, n_cells=8, nprobe=4,
        centroids=FIXED_CENTS,
    ).select("query_id", "corpus_id", "rank")
    qb = queries.select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qe"),
        sim.norm(sim._as_double(F.col("embedding"))).alias("qn"),
    )
    pairs = (
        emb.select(
            F.col("vec_id").alias("corpus_id"),
            F.col("embedding").alias("ce"),
            sim.norm(sim._as_double(F.col("embedding"))).alias("cn"),
        )
        .crossJoin(F.broadcast(qb))
        .where(F.col("corpus_id") != F.col("query_id"))
        .select(
            "query_id",
            "corpus_id",
            (
                sim.dot(sim._as_double(F.col("ce")), sim._as_double(F.col("qe")))
                / (F.col("cn") * F.col("qn"))
            ).alias("cosine"),
        )
        .localCheckpoint(eager=False)  # exact ranking + rel both consume
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("corpus_id"))
    exact = (
        pairs.select(
            "query_id", "corpus_id", F.row_number().over(w).alias("rank")
        )
        .where(F.col("rank") <= 10)
    )
    rel = pairs.select(
        "query_id", "corpus_id", F.round("cosine", 6).alias("rel")
    )
    term = "rel / log2(CAST(rank AS BIGINT) + 1)"
    dcg = (
        ivf.join(rel, ["query_id", "corpus_id"])
        .groupBy("query_id")
        .agg(F.expr(f"CAST(round(sum({term}), 6) AS DOUBLE)").alias("dcg"))
    )
    idcg = (
        exact.join(rel, ["query_id", "corpus_id"])
        .groupBy("query_id")
        .agg(F.expr(f"CAST(round(sum({term}), 6) AS DOUBLE)").alias("idcg"))
    )
    return dcg.join(idcg, "query_id").select(
        "query_id",
        "dcg",
        "idcg",
        F.expr(
            "CAST(CASE WHEN idcg = 0 THEN NULL"
            " ELSE round(dcg / idcg, 6) END AS DOUBLE)"
        ).alias("ndcg"),
    )


@query(
    "sim_hard_negative_mining",
    oracle=f"""
    WITH {_DUCK_ASSIGN.strip().rstrip()},
    norms AS (
      SELECT vec_id,
             sqrt(list_sum(list_transform(embedding,
                  x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
      FROM embeddings
    ),
    negs AS (
      SELECT s.cell, s.vec_id, a.cell AS assigned_cell,
             round(s.sim / n.nrm, 6) AS cosine
      FROM scored_cells s
      JOIN assigned a ON a.vec_id = s.vec_id AND a.cell <> s.cell
      JOIN norms n ON n.vec_id = s.vec_id
      WHERE n.nrm > 0
    ),
    ranked AS (
      SELECT cell, vec_id, assigned_cell, CAST(cosine AS DOUBLE) AS cosine,
             CAST(row_number() OVER (
               PARTITION BY cell ORDER BY cosine DESC, vec_id
             ) AS INT) AS rank
      FROM negs
    )
    SELECT CAST(cell AS INT) AS cell, vec_id,
           CAST(assigned_cell AS INT) AS assigned_cell, cosine, rank
    FROM ranked WHERE rank <= 5
    """,
)
def sim_hard_negative_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining for contrastive training — for each FIXED_CENTS
    centroid, the 5 corpus vectors MOST similar to it that are assigned to
    a DIFFERENT cell (the boundary cases a triplet/InfoNCE loss learns
    from; easy random negatives teach nothing). One map-side pass computes
    all 8 literal-model dots as ONE flat parsed expression array (the r5
    rule — literal dots codegen, HOF interprets), the argmax assignment
    rides the same array, and the 8-way candidate fan-out is a
    posexplode of that array — a structural ×8, independent of corpus
    size. Cosine is ROUNDED BEFORE RANKING (round-to-6 then vec_id
    tiebreak) so float noise can't flip an ordering across engines, the
    sim_matryoshka discipline; zero-norm vectors filtered both sides
    (ANSI 0/0 guard). Per-cell top-5 is a WindowGroupLimit — partial
    per-partition top-k, never a global sort."""
    emb = load_table(spark, sf_dir, "embeddings")
    arr_sql = (
        "array("
        + ",".join(sim._dot_lit_sql("embedding", c) for c in FIXED_CENTS)
        + ")"
    )
    nrm_sql = (
        "sqrt(aggregate(embedding, 0.0D,"
        " (acc, x) -> acc + CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))"
    )
    scored = emb.select(
        "vec_id",
        F.expr(arr_sql).alias("sims"),
        F.expr(nrm_sql).alias("nrm"),
    ).where(F.col("nrm") > 0)
    exploded = scored.select(
        "vec_id",
        (
            F.array_position(F.col("sims"), F.array_max(F.col("sims"))).cast(
                "int"
            )
            - 1
        ).alias("assigned_cell"),
        F.posexplode(F.col("sims")).alias("cell", "dot"),
        "nrm",
    ).where(F.col("cell") != F.col("assigned_cell"))
    negs = exploded.select(
        F.col("cell").cast("int").alias("cell"),
        "vec_id",
        "assigned_cell",
        F.round(F.col("dot") / F.col("nrm"), 6).alias("cosine"),
    )
    w = W.partitionBy("cell").orderBy(F.col("cosine").desc(), F.col("vec_id"))
    return (
        negs.withColumn("rank", F.row_number().over(w).cast("int"))
        .where(F.col("rank") <= 5)
    )


# (cell, pos, val) literal rows of FIXED_CENTS for per-dimension joins —
# 1-based pos to match both engines' list indexing conventions below
_CENT_DIM_ROWS = [
    (cell, pos + 1, val)
    for cell, cent in enumerate(FIXED_CENTS)
    for pos, val in enumerate(cent)
]


@query(
    "sim_kmeans_step_audit",
    oracle=f"""
    WITH {_DUCK_ASSIGN.strip().rstrip()},
    dims AS (
      SELECT a.cell, u.i AS pos,
             CAST(a.embedding[u.i] AS DOUBLE) AS val
      FROM assigned a,
           LATERAL (SELECT unnest(range(1, len(a.embedding) + 1)) AS i) u
    ),
    means AS (
      SELECT cell, pos, round(avg(val), 6) AS m,
             count(*) AS n
      FROM dims GROUP BY cell, pos
    ),
    cents_flat AS (
      SELECT c.cell, u.i AS pos, c.c[u.i] AS old_val
      FROM cents c,
           LATERAL (SELECT unnest(range(1, len(c.c) + 1)) AS i) u
    ),
    per_cell AS (
      SELECT m.cell,
             CAST(min(m.n) AS BIGINT) AS n_members,
             sqrt(sum(m.m * m.m)) AS new_norm,
             sum(m.m * f.old_val) AS dot_old
      FROM means m JOIN cents_flat f ON f.cell = m.cell AND f.pos = m.pos
      GROUP BY m.cell
    )
    SELECT CAST(cell AS INT) AS cell, n_members,
           CAST(round(new_norm, 6) AS DOUBLE) AS new_norm,
           CAST(round(dot_old / new_norm, 6) AS DOUBLE) AS drift_cosine
    FROM per_cell WHERE new_norm > 0
    """,
)
def sim_kmeans_step_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ONE Lloyd iteration, value-checked — the k-means trainer's update
    step under a full oracle (the catalog's other k-means entries inject
    FIXED_CENTS precisely because the trained model is seed-dependent;
    this entry pins the UPDATE MATH itself instead: assign to the fixed
    model, recompute per-cell means, report how far each centroid wants
    to move). drift_cosine near 1 = the model fits this corpus's cells;
    low drift_cosine = that cell would reshape under retraining — the
    trainer-side sibling of sim_cluster_margin_audit's assignment-side
    score. Per-dim means are ROUNDED to 6 before the cosine (the
    sim_centroid_drift rounded-before-cosine discipline, so both engines
    dot identical doubles); old centroids are unit-norm so the cosine
    divides by new_norm only. The per-dim aggregate is (8 cells x 64
    dims)-bounded — structural, not corpus-scale; the literal centroid
    join is a 512-row broadcast (hint-policy class 2)."""
    emb = load_table(spark, sf_dir, "embeddings")
    arr_sql = (
        "array("
        + ",".join(sim._dot_lit_sql("embedding", c) for c in FIXED_CENTS)
        + ")"
    )
    assigned = (
        emb.select("embedding", F.expr(arr_sql).alias("s"))
        .select(
            "embedding",
            (F.array_position(F.col("s"), F.array_max(F.col("s"))) - 1)
            .cast("int")
            .alias("cell"),
        )
        # janino 64KB rule (r11): the 512-node literal-dot array fused
        # into the explode+aggregate stage pushes the generated method
        # past the JVM limit — failed compiles RETRY EVERY RUN; the
        # materialize barrier keeps the encode stage separate
        .localCheckpoint(eager=False)
    )
    dims = assigned.select(
        "cell", F.posexplode("embedding").alias("pos0", "val")
    ).select(
        "cell",
        (F.col("pos0") + 1).alias("pos"),
        F.col("val").cast("double").alias("val"),
    )
    means = dims.groupBy("cell", "pos").agg(
        F.round(F.avg("val"), 6).alias("m"),
        F.count(F.lit(1)).alias("n"),
    )
    cents_flat = spark.createDataFrame(
        _CENT_DIM_ROWS, "cell int, pos int, old_val double"
    )
    per_cell = (
        means.join(F.broadcast(cents_flat), ["cell", "pos"])
        .groupBy("cell")
        .agg(
            F.min("n").alias("n_members"),
            F.sqrt(F.sum(F.col("m") * F.col("m"))).alias("new_norm"),
            F.sum(F.col("m") * F.col("old_val")).alias("dot_old"),
        )
    )
    return per_cell.where(F.col("new_norm") > 0).select(
        "cell",
        "n_members",
        F.round("new_norm", 6).alias("new_norm"),
        F.round(F.col("dot_old") / F.col("new_norm"), 6).alias(
            "drift_cosine"
        ),
    )


@query(
    "sim_pq_distortion_audit",
    oracle=f"""
    WITH cb(m, j, c, halfn) AS (VALUES
      {_DUCK_CBS}
    ),
    u AS (SELECT vec_id, {_DUCK_UNIT} AS uv FROM embeddings),
    sc AS (
      SELECT u.vec_id, cb.m, cb.j,
             list_sum(list_transform(range(1, 17),
                      i -> u.uv[cb.m * 16 + i] * cb.c[i])) - cb.halfn AS s
      FROM u CROSS JOIN cb
    ),
    codes AS (
      SELECT vec_id, m, j AS code FROM (
        SELECT vec_id, m, j,
               row_number() OVER (
                 PARTITION BY vec_id, m ORDER BY s DESC, j ASC
               ) AS rn
        FROM sc
      ) WHERE rn = 1
    ),
    cp AS (
      SELECT vec_id,
             max(CASE WHEN m = 0 THEN code END) AS c0,
             max(CASE WHEN m = 1 THEN code END) AS c1,
             max(CASE WHEN m = 2 THEN code END) AS c2,
             max(CASE WHEN m = 3 THEN code END) AS c3
      FROM codes GROUP BY vec_id
    ),
    lut AS (
      SELECT q.vec_id AS query_id, q.uv AS quv, cb.m, cb.j,
             list_sum(list_transform(range(1, 17),
                      i -> q.uv[cb.m * 16 + i] * cb.c[i])) AS v
      FROM (SELECT * FROM u WHERE vec_id < 5) q CROSS JOIN cb
    ),
    pairs AS (
      SELECT l0.query_id, cp.vec_id AS corpus_id,
             round((((l0.v + l1.v) + l2.v) + l3.v), 6) AS approx_ip,
             round(list_sum(list_transform(range(1, len(u.uv) + 1),
                   i -> u.uv[i] * l0.quv[i])), 6) AS exact_ip
      FROM cp
      JOIN u ON u.vec_id = cp.vec_id
      JOIN lut l0 ON l0.m = 0 AND l0.j = cp.c0
      JOIN lut l1 ON l1.m = 1 AND l1.j = cp.c1 AND l1.query_id = l0.query_id
      JOIN lut l2 ON l2.m = 2 AND l2.j = cp.c2 AND l2.query_id = l0.query_id
      JOIN lut l3 ON l3.m = 3 AND l3.j = cp.c3 AND l3.query_id = l0.query_id
      WHERE cp.vec_id <> l0.query_id
    )
    SELECT query_id,
           CAST(count(*) AS BIGINT) AS n_pairs,
           CAST(round(avg(abs(exact_ip - approx_ip)), 6) AS DOUBLE)
             AS mean_abs_err,
           CAST(round(max(abs(exact_ip - approx_ip)), 6) AS DOUBLE)
             AS max_abs_err
    FROM pairs GROUP BY query_id
    """,
)
def sim_pq_distortion_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ quantization-distortion audit — the product-quantization member
    of the sketch-audit family (recall for LSH banding, overestimate for
    CMS, recall@10 for IVF; this one measures HOW WRONG the 4-byte codes
    score each pair): per query, the mean and max absolute gap between
    the exact unit-vector inner product and the ADC approximation over
    the whole corpus. Shipping it beside sim_ann_pq_topk turns "PQ is
    lossy" into a number the operator can track round-over-round —
    codebook drift or an encode bug shows as a mean_abs_err jump. BOTH
    per-pair scores round to 6 BEFORE the difference (so the engines
    aggregate identical doubles; mean re-rounds, max is order-free);
    the corpus (unit, codes) frame is localCheckpointed — the literal
    encode chain fusing into the pair join is exactly the janino 64KB
    failure sim_ann_pq_topk's materialize_codes flag exists for. Exact
    dots run the HOF aggregate fold (column-column — the r5 boundary:
    flat chains only for literal models)."""
    emb = load_table(spark, sf_dir, "embeddings")
    m = len(FIXED_CBS)
    corpus = (
        sim.pq_encode(sim.with_unit_vector(emb, "embedding"), "unit", FIXED_CBS)
        .select(
            F.col("vec_id").alias("corpus_id"),
            F.col("unit").alias("cuv"),
            *[f"code_{i}" for i in range(m)],
        )
        .localCheckpoint(eager=False)
    )
    q = sim.pq_query_luts(
        sim.with_unit_vector(emb.where(F.col("vec_id") < 5), "embedding"),
        "unit",
        FIXED_CBS,
        "vec_id",
    ).join(
        sim.with_unit_vector(
            emb.where(F.col("vec_id") < 5), "embedding"
        ).select(F.col("vec_id").alias("query_id"), F.col("unit").alias("quv")),
        "query_id",
    )
    exact_sql = (
        "aggregate(zip_with(cuv, quv, (x, y) -> x * y),"
        " 0.0D, (acc, v) -> acc + v)"
    )
    pairs = (
        corpus.crossJoin(F.broadcast(q))
        .where(F.col("corpus_id") != F.col("query_id"))
        .select(
            "query_id",
            F.round(sim._pq_adc_score(m), 6).alias("approx_ip"),
            F.round(F.expr(exact_sql), 6).alias("exact_ip"),
        )
    )
    return pairs.groupBy("query_id").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.round(F.avg(F.abs(F.col("exact_ip") - F.col("approx_ip"))), 6).alias(
            "mean_abs_err"
        ),
        F.round(F.max(F.abs(F.col("exact_ip") - F.col("approx_ip"))), 6).alias(
            "max_abs_err"
        ),
    )


@query(
    "sim_silhouette_simplified",
    oracle=f"""
    WITH cents(cell, c) AS (VALUES
      {_DUCK_CENTS}
    ),
    scored_cells AS (
      SELECT e.vec_id, c.cell,
             list_sum(list_transform(range(1, len(e.embedding) + 1),
                      i -> CAST(e.embedding[i] AS DOUBLE) * c.c[i])) AS sim
      FROM embeddings e CROSS JOIN cents c
    ),
    ranked AS (
      SELECT vec_id, cell, sim,
             row_number() OVER (
               PARTITION BY vec_id ORDER BY sim DESC, cell ASC
             ) AS rn
      FROM scored_cells
    ),
    pick AS (
      SELECT r1.vec_id, r1.cell, r1.sim AS d1, r2.sim AS d2
      FROM ranked r1 JOIN ranked r2
        ON r1.vec_id = r2.vec_id AND r1.rn = 1 AND r2.rn = 2
    ),
    norms AS (
      SELECT vec_id,
             sqrt(list_sum(list_transform(embedding,
                  x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
      FROM embeddings
    ),
    per AS (
      SELECT p.cell,
             CASE WHEN greatest((1.0 - p.d1 / n.nrm), (1.0 - p.d2 / n.nrm)) = 0
                  THEN 0.0
                  ELSE round(((1.0 - p.d2 / n.nrm) - (1.0 - p.d1 / n.nrm))
                       / greatest((1.0 - p.d1 / n.nrm), (1.0 - p.d2 / n.nrm)),
                       6)
             END AS s
      FROM pick p JOIN norms n ON n.vec_id = p.vec_id
      WHERE n.nrm > 0
    )
    SELECT CAST(cell AS INT) AS cluster,
           CAST(count(*) AS BIGINT) AS n_members,
           CAST(round(avg(s), 4) AS DOUBLE) AS mean_silhouette
    FROM per GROUP BY cell
    """,
)
def sim_silhouette_simplified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simplified silhouette per cluster — the centroid-based silhouette
    (Hruschka et al.: a(i) = dissimilarity to OWN centroid, b(i) = to
    the nearest OTHER centroid, s = (b-a)/max(a,b)) over the FIXED_CENTS
    model: O(n·k) where the classic silhouette's pairwise form is O(n²),
    which is the 100 TB-relevant distinction — and the clustering-
    quality member of the audit family beside sim_cluster_margin_audit
    (margin measures the separation gap; silhouette normalizes it into
    the comparable [-1, 1] score dashboards track). Unit centroids make
    cosine dissimilarity 1 - dot/‖v‖; all 8 literal-model dots are ONE
    flat parsed expression array (the r5 rule) and best/second-best via
    sort_array on 8 elements — no corpus window, one map-side pass + one
    bounded aggregate. Per-vector s rounds to 6 BEFORE the mean (round-
    before-aggregate), the mean to 4 (the m_winsorized_mean lesson:
    corpus-scale float sums differ near the 6th decimal); a == b == 0
    (vector identical to two centroids) short-circuits to s = 0 on both
    sides — never an ANSI divide-by-zero. Zero-norm vectors filtered on
    both sides."""
    emb = load_table(spark, sf_dir, "embeddings")
    arr_sql = (
        "array("
        + ",".join(sim._dot_lit_sql("embedding", c) for c in FIXED_CENTS)
        + ")"
    )
    nrm_sql = (
        "sqrt(aggregate(embedding, 0.0D,"
        " (acc, x) -> acc + CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))"
    )
    a_d = "(1.0 - ds[0] / nrm)"
    b_d = "(1.0 - ds[1] / nrm)"
    per = (
        emb.select(
            F.expr(arr_sql).alias("sims"),
            F.expr(nrm_sql).alias("nrm"),
        )
        .where(F.col("nrm") > 0)
        .select(
            (
                F.array_position(
                    F.col("sims"), F.array_max(F.col("sims"))
                ).cast("int")
                - 1
            ).alias("cluster"),
            F.sort_array(F.col("sims"), asc=False).alias("ds"),
            "nrm",
        )
        .select(
            "cluster",
            F.expr(
                f"CASE WHEN greatest({a_d}, {b_d}) = 0 THEN 0.0"
                f" ELSE round(({b_d} - {a_d}) / greatest({a_d}, {b_d}), 6)"
                " END"
            ).alias("s"),
        )
    )
    return per.groupBy("cluster").agg(
        F.count(F.lit(1)).alias("n_members"),
        F.round(F.avg("s"), 4).alias("mean_silhouette"),
    )


@query(
    "sim_filtered_ann_topk",
    oracle=f"""
    WITH eligible AS (
      SELECT e.vec_id, e.embedding
      FROM embeddings e JOIN documents d ON d.doc_id = e.vec_id
      WHERE d.lang = 'en' AND d.n_chars >= 100
    ),
    q AS (SELECT vec_id AS query_id, embedding AS qe
          FROM embeddings WHERE vec_id < 5),
    scored AS (
      SELECT q.query_id, c.vec_id AS corpus_id,
             round({_DUCK_COSINE.format(a="c.embedding", b="q.qe")}, 6) AS cosine
      FROM eligible c CROSS JOIN q
      WHERE c.vec_id <> q.query_id
    ),
    ranked AS (
      SELECT query_id, corpus_id, CAST(cosine AS DOUBLE) AS cosine,
             CAST(row_number() OVER (
               PARTITION BY query_id ORDER BY cosine DESC, corpus_id
             ) AS INT) AS rank
      FROM scored
    )
    SELECT query_id, corpus_id, cosine, rank FROM ranked WHERE rank <= 10
    """,
)
def sim_filtered_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PRE-FILTERED vector search — top-10 cosine neighbors restricted
    to vectors whose joined document passes a metadata predicate
    (lang='en' AND n_chars>=100): the filtered-search shape every
    production vector store exposes (Milvus/Qdrant 'filtered ANN'), and
    the one the post-filter formulation gets WRONG at scale — filtering
    AFTER a fixed top-k can return fewer than k (or zero) eligible hits,
    so the filter must constrain the candidate set BEFORE ranking. The
    metadata join runs embedding-side (vec_id == doc_id, the corpus's
    cross-modal key); the document side prunes to two columns at the
    scan, the predicate semi-reduces the corpus before any scoring, and
    only survivors pay the broadcast-query dot products (HOF dot/norm
    per the column-column A/B). At 100 TB the filter is exactly the
    predicate-pushdown story: Catalyst pushes lang/n_chars into the
    documents scan and the join keeps the vector side shuffle-free
    against a broadcast query set."""
    emb = load_table(spark, sf_dir, "embeddings")
    docs = load_table(spark, sf_dir, "documents").where(
        (F.col("lang") == "en") & (F.col("n_chars") >= 100)
    )
    eligible = emb.join(
        docs.select(F.col("doc_id").alias("vec_id")), "vec_id"
    )
    return _broadcast_cosine_topk(eligible, emb.where(F.col("vec_id") < 5))


# --- residual quantization (RQ) audit fixtures ------------------------------
# second-stage codebook: code 0 is the ZERO vector (so stage 2 can only
# improve — the monotone-improvement invariant pinned in tests), codes
# 1..8 a deterministic cos-sequence at residual scale. Data-independent
# like FIXED_CENTS.


def _fixed_rq_codebook(n_codes: int = 8, dim: int = 64) -> list[list[float]]:
    cbs = [[0.0] * dim]
    for j in range(n_codes):
        cbs.append([0.25 * math.cos(2.0 + j * dim + d) for d in range(dim)])
    return cbs


FIXED_RQ_CB2 = _fixed_rq_codebook()

# literal cross-constants both engines share: k1[i][j] = c1_i · c2_j and
# h2[j] = 0.5·||c2_j||² (python floats repr-round-trip exactly)
_RQ_K1 = [
    [sum(a * b for a, b in zip(c1, c2)) for c2 in FIXED_RQ_CB2]
    for c1 in FIXED_CENTS
]
_RQ_H2 = [0.5 * sum(x * x for x in c2) for c2 in FIXED_RQ_CB2]


def _rq_dot_terms(idx_fmt: str, c: list[float]) -> str:
    """Flat left-assoc dot chain; idx_fmt formats one element access so
    the SAME term order renders for Spark (0-based) and DuckDB
    (1-based)."""
    return "(" + "+".join(
        idx_fmt.format(d=d) + f"*{x!r}" for d, x in enumerate(c) if x != 0.0
    ) + ")" if any(x != 0.0 for x in c) else "(0.0)"


def _rq_oracle() -> str:
    cents_rows = ",\n      ".join(
        "({}, {})".format(
            i,
            "round("
            + _rq_dot_terms("CAST(e.embedding[{d}+1] AS DOUBLE)", c)
            + ", 6)",
        )
        for i, c in enumerate(FIXED_CENTS)
    )
    # per-code stage-2 objective templates parameterized on code1 via a
    # CASE over the literal k1 table
    cb2_rows = []
    for j, c2 in enumerate(FIXED_RQ_CB2):
        d2 = _rq_dot_terms("CAST(e.embedding[{d}+1] AS DOUBLE)", c2)
        k1_case = (
            "CASE s.code1 "
            + " ".join(
                f"WHEN {i} THEN {_RQ_K1[i][j]!r}" for i in range(len(FIXED_CENTS))
            )
            + " END"
        )
        cb2_rows.append(
            f"SELECT s.vec_id, s.code1, s.obj1, s.nsq, {j} AS j,"
            f" round({d2} - {k1_case} - {_RQ_H2[j]!r}, 6) AS obj2,"
            " e.embedding"
            " FROM s JOIN embeddings e ON e.vec_id = s.vec_id"
        )
    union2 = "\n      UNION ALL ".join(cb2_rows)
    return f"""
    WITH o1 AS (
      SELECT e.vec_id,
             list_sum(list_transform(e.embedding,
                      x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) AS nsq,
             c.cell AS code1, c.obj AS obj1,
             row_number() OVER (PARTITION BY e.vec_id
                                ORDER BY c.obj DESC, c.cell ASC) AS rk
      FROM embeddings e, LATERAL (
        SELECT cell, obj FROM (VALUES
      {cents_rows}
        ) AS t(cell, obj)
      ) c
    ),
    s AS (SELECT vec_id, nsq, code1, obj1 FROM o1 WHERE rk = 1),
    o2 AS (
      SELECT vec_id, code1, obj1, nsq, j, obj2,
             row_number() OVER (PARTITION BY vec_id
                                ORDER BY obj2 DESC, j ASC) AS rk
      FROM ({union2})
    )
    SELECT vec_id, CAST(code1 AS BIGINT) AS code1,
           CAST(j AS BIGINT) AS code2,
           CAST(round(nsq - 2 * obj1 + 1.0, 6) AS DOUBLE) AS sq_err_stage1,
           CAST(round(nsq - 2 * obj1 + 1.0 - 2 * obj2, 6) AS DOUBLE)
             AS sq_err_rq
    FROM o2 WHERE rk = 1
    """


@query("sim_rq_distortion_audit", oracle=_rq_oracle())
def sim_rq_distortion_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Residual-quantization (RQ) distortion — the two-stage member of
    the sketch-audit family beside PQ and SQ8: stage 1 codes each
    vector to its nearest FIXED_CENTS centroid, stage 2 codes the
    RESIDUAL against a second fixed codebook whose code 0 is the zero
    vector (so the second stage can only improve — the monotone
    invariant sq_err_rq ≤ sq_err_stage1 is pinned in tests). The whole
    audit runs on DOT-PRODUCT IDENTITIES, never materializing a
    residual: r·c2_j = v·c2_j − (c1·c2_j) and ‖v−c1−c2‖² =
    ‖v‖² − 2·obj1 + 1 − 2·obj2 where the cross-constants c1·c2 and
    ½‖c2‖² are LITERALS both engines share — so the Spark plan is 17
    flat literal-dot chains + one norm per row (zero joins, zero
    explodes, whole-stage codegen) and the oracle mirrors each rounded
    objective before ranking (round-6 before argmax, ties to the
    lowest code — the round-before-rank discipline; errors round-6
    from the shared rounded operands)."""
    emb = load_table(spark, sf_dir, "embeddings")
    nsq_sql = "(" + "+".join(
        f"CAST(embedding[{d}] AS DOUBLE)*CAST(embedding[{d}] AS DOUBLE)"
        for d in range(64)
    ) + ")"
    obj1_structs = ", ".join(
        "struct(round("
        + _rq_dot_terms("CAST(embedding[{d}] AS DOUBLE)", c)
        + f", 6) AS o, {-i} AS nc)"
        for i, c in enumerate(FIXED_CENTS)
    )
    s1 = emb.select(
        "vec_id",
        "embedding",
        F.expr(f"{nsq_sql}").alias("nsq"),
        F.expr(
            f"array_max(array({obj1_structs}))"
        ).alias("b1"),
    ).select(
        "vec_id",
        "embedding",
        "nsq",
        F.expr("-b1.nc").alias("code1"),
        F.expr("b1.o").alias("obj1"),
    )
    obj2_structs = ", ".join(
        "struct(round("
        + _rq_dot_terms("CAST(embedding[{d}] AS DOUBLE)", c2)
        + " - "
        + (
            "CASE code1 "
            + " ".join(
                f"WHEN {i} THEN CAST({_RQ_K1[i][j]!r} AS DOUBLE)"
                for i in range(len(FIXED_CENTS))
            )
            + " END"
        )
        + f" - CAST({_RQ_H2[j]!r} AS DOUBLE), 6) AS o, {-j} AS nc)"
        for j, c2 in enumerate(FIXED_RQ_CB2)
    )
    s2 = s1.select(
        "vec_id",
        "nsq",
        "code1",
        "obj1",
        F.expr(f"array_max(array({obj2_structs}))").alias("b2"),
    )
    return s2.select(
        "vec_id",
        F.col("code1").cast("bigint").alias("code1"),
        F.expr("CAST(-b2.nc AS BIGINT)").alias("code2"),
        F.expr("CAST(round(nsq - 2 * obj1 + 1.0D, 6) AS DOUBLE)").alias(
            "sq_err_stage1"
        ),
        F.expr(
            "CAST(round(nsq - 2 * obj1 + 1.0D - 2 * b2.o, 6) AS DOUBLE)"
        ).alias("sq_err_rq"),
    )


@query(
    "sim_rrf_fusion_topk",
    oracle=f"""
    WITH q AS (SELECT vec_id AS query_id, embedding AS qe
               FROM embeddings WHERE vec_id < 5),
    scored AS (
      SELECT q.query_id, c.vec_id AS corpus_id,
             round({_DUCK_COSINE.format(a="c.embedding", b="q.qe")}, 6)
               AS fsim,
             round({_DUCK_COSINE.format(a="c.embedding[1:16]", b="q.qe[1:16]")}, 6)
               AS csim
      FROM embeddings c CROSS JOIN q
      WHERE c.vec_id <> q.query_id
        AND list_sum(list_transform(c.embedding[1:16],
              x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) > 0
        AND list_sum(list_transform(q.qe[1:16],
              x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) > 0
    ),
    ranked AS (
      SELECT query_id, corpus_id,
             CAST(row_number() OVER (
               PARTITION BY query_id ORDER BY fsim DESC, corpus_id
             ) AS INT) AS rank_full,
             CAST(row_number() OVER (
               PARTITION BY query_id ORDER BY csim DESC, corpus_id
             ) AS INT) AS rank_prefix
      FROM scored
    ),
    fused AS (
      SELECT query_id, corpus_id,
             CASE WHEN rank_full <= 20 THEN rank_full ELSE NULL END
               AS rank_full,
             CASE WHEN rank_prefix <= 20 THEN rank_prefix ELSE NULL END
               AS rank_prefix,
             round(CASE WHEN rank_full <= 20
                        THEN 1 / (60 + rank_full) ELSE 0 END
                 + CASE WHEN rank_prefix <= 20
                        THEN 1 / (60 + rank_prefix) ELSE 0 END, 6) AS rrf
      FROM ranked
      WHERE rank_full <= 20 OR rank_prefix <= 20
    )
    SELECT query_id, corpus_id, rank_full, rank_prefix,
           CAST(rrf AS DOUBLE) AS rrf,
           CAST(rank AS INT) AS rank
    FROM (
      SELECT *, row_number() OVER (
        PARTITION BY query_id ORDER BY rrf DESC, corpus_id
      ) AS rank FROM fused
    ) WHERE rank <= 10
    """,
)
def sim_rrf_fusion_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal-rank fusion (Cormack & Clarke's RRF, the standard
    hybrid-retrieval combiner): fuse TWO retrieval systems' top-20
    lists — full-dimension cosine and the matryoshka prefix-16 coarse
    cosine (two genuinely different scoring views of the same corpus)
    — by RRF(d) = Σ_systems 1/(60 + rank_s(d)), then re-rank to a
    top-10. Plan: ONE corpus pass scores BOTH similarities in the same
    projection against the broadcast query set, the two row_number
    windows share one (query_id) exchange, and no join exists anywhere
    — the fused score comes from CASE over the two rank columns.
    Cross-engine float discipline: both sims round-6 BEFORE ranking;
    ranks are exact ints; 1/(60+rank) uses INTEGER literals only (`/`
    is float division in both engines — no decimal-literal channel);
    the two-term sum is textually ordered; rrf rounds to 6 before the
    final rank with corpus_id tiebreak. Zero-PREFIX-norm rows are
    excluded on both sides (full_norm >= prefix_norm makes one filter
    guard both denominators — the matryoshka discipline)."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 5)
    pre = lambda c: sim._as_double(F.slice(c, 1, 16))  # noqa: E731
    full = sim._as_double
    # norms (and the zero-prefix-norm guard) hoisted into PRE-join
    # projections — the r11 sim_range_search lesson: a derived column
    # inlined past the join boundary re-evaluates its interpreted HOF
    # fold once per PAIR; hoisted, each row pays its norms once
    corpus = (
        emb.select(
            F.col("vec_id").alias("corpus_id"), F.col("embedding").alias("ce")
        )
        .where(sim.dot(pre(F.col("ce")), pre(F.col("ce"))) > 0)
        .select(
            "corpus_id",
            "ce",
            sim.norm(full(F.col("ce"))).alias("cnf"),
            sim.norm(pre(F.col("ce"))).alias("cnp"),
        )
    )
    qset = (
        queries.select(
            F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe")
        )
        .where(sim.dot(pre(F.col("qe")), pre(F.col("qe"))) > 0)
        .select(
            "query_id",
            "qe",
            sim.norm(full(F.col("qe"))).alias("qnf"),
            sim.norm(pre(F.col("qe"))).alias("qnp"),
        )
    )
    scored = (
        corpus.crossJoin(F.broadcast(qset))
        .where(F.col("corpus_id") != F.col("query_id"))
        .select(
            "query_id",
            "corpus_id",
            F.round(
                sim.dot(full(F.col("ce")), full(F.col("qe")))
                / (F.col("cnf") * F.col("qnf")),
                6,
            ).alias("fsim"),
            F.round(
                sim.dot(pre(F.col("ce")), pre(F.col("qe")))
                / (F.col("cnp") * F.col("qnp")),
                6,
            ).alias("csim"),
        )
    )
    wf = W.partitionBy("query_id").orderBy(F.desc("fsim"), F.asc("corpus_id"))
    wp = W.partitionBy("query_id").orderBy(F.desc("csim"), F.asc("corpus_id"))
    ranked = scored.select(
        "query_id",
        "corpus_id",
        # bigint rank channel: the 60+rank adds then live in LongType
        # (the int-arith audit would otherwise flag an Integer Add on a
        # data-scaled row_number); outputs re-cast to INT below
        F.row_number().over(wf).cast("bigint").alias("rf"),
        F.row_number().over(wp).cast("bigint").alias("rp"),
    )
    fused = ranked.where((F.col("rf") <= 20) | (F.col("rp") <= 20)).select(
        "query_id",
        "corpus_id",
        F.expr(
            "CASE WHEN rf <= 20 THEN CAST(rf AS INT) ELSE NULL END"
        ).alias("rank_full"),
        F.expr(
            "CASE WHEN rp <= 20 THEN CAST(rp AS INT) ELSE NULL END"
        ).alias("rank_prefix"),
        F.expr(
            "round(CASE WHEN rf <= 20 THEN 1 / (60 + rf) ELSE 0 END"
            " + CASE WHEN rp <= 20 THEN 1 / (60 + rp) ELSE 0 END, 6)"
        ).alias("rrf"),
    )
    wr = W.partitionBy("query_id").orderBy(F.desc("rrf"), F.asc("corpus_id"))
    return (
        fused.withColumn("rank", F.row_number().over(wr).cast("int"))
        .where(F.col("rank") <= 10)
        .select(
            "query_id", "corpus_id", "rank_full", "rank_prefix",
            F.col("rrf").cast("double").alias("rrf"), "rank",
        )
    )


def _duck_ivf_curve_block(p: int) -> str:
    """Per-nprobe IVF candidate/top-10/recall CTE chain for the tuning
    curve — the _DUCK_IVF_PROBE rules (probe tie to the HIGHER cell,
    rank tie to the lower corpus id) with rn <= p parameterized."""
    return f"""
    ivf{p} AS (
      SELECT query_id, corpus_id FROM (
        SELECT query_id, corpus_id,
               row_number() OVER (
                 PARTITION BY query_id ORDER BY cosine DESC, corpus_id
               ) AS rank
        FROM (
          SELECT DISTINCT pr.query_id, a.vec_id AS corpus_id,
                 {_DUCK_COSINE.format(a="a.embedding", b="pr.qe")} AS cosine
          FROM probe_ranked pr JOIN assigned a ON pr.cell = a.cell
          WHERE a.vec_id <> pr.query_id AND pr.crank <= {p}
        )
      ) WHERE rank <= 10
    ),
    rec{p} AS (
      SELECT CAST({p} AS BIGINT) AS nprobe, e.query_id,
             CAST(count(*) AS BIGINT) AS n_exact,
             CAST(count(i.corpus_id) AS BIGINT) AS n_found,
             CAST((count(i.corpus_id) * 1000000) // count(*) AS BIGINT)
               AS recall_ppm
      FROM exact e LEFT JOIN ivf{p} i
        ON i.query_id = e.query_id AND i.corpus_id = e.corpus_id
      GROUP BY e.query_id
    )"""


_IVF_CURVE_PROBES = [1, 2, 4, 8]


@query(
    "sim_ivf_nprobe_curve",
    oracle=f"""
    WITH {_DUCK_ASSIGN},
    q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings
          WHERE vec_id < 5),
    probe_ranked AS (
      SELECT q.query_id, q.qe, c.cell,
             row_number() OVER (
               PARTITION BY q.query_id
               ORDER BY list_sum(list_transform(range(1, len(q.qe) + 1),
                        i -> CAST(q.qe[i] AS DOUBLE) * c.c[i])) DESC,
                        c.cell DESC
             ) AS crank
      FROM q CROSS JOIN cents c
    ),
    exact AS (
      SELECT query_id, corpus_id FROM (
        SELECT q.query_id, e.vec_id AS corpus_id,
               row_number() OVER (
                 PARTITION BY q.query_id
                 ORDER BY {_DUCK_COSINE.format(a="e.embedding", b="q.qe")}
                          DESC, e.vec_id
               ) AS rank
        FROM embeddings e CROSS JOIN q
        WHERE e.vec_id <> q.query_id
      ) WHERE rank <= 10
    ),
    {",".join(_duck_ivf_curve_block(p) for p in _IVF_CURVE_PROBES)}
    SELECT * FROM rec1
    UNION ALL SELECT * FROM rec2
    UNION ALL SELECT * FROM rec4
    UNION ALL SELECT * FROM rec8
    """,
)
def sim_ivf_nprobe_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The IVF nprobe TUNING CURVE — recall@10 at nprobe ∈ {1, 2, 4, 8}
    against one exact ground truth: sim_ivf_recall_audit ships the
    single probe-4 point; this is the whole curve a deployer reads to
    pick the latency/recall trade-off (and the self-check is built in:
    nprobe = 8 probes EVERY cell, so its recall is exactly 1e6 ppm —
    pinned). The exact truth frame is computed ONCE and
    localCheckpointed (four per-probe joins consume it — the
    scan-amplification class); each probe level runs the
    sim_ann_ivf_topk pipeline with the same FIXED_CENTS and tie rules.
    Output all-integer (counts + ppm floor division).

    r16 (VERDICT item 2, plan-build offenders): the builder ran the FULL
    sim_ann_ivf_topk pipeline four times (one per probe level) — 5.4 s
    of WARM driver-side plan build per invocation (measure_build.py; the
    r15 survey's 7.3 s ranked it worst after cold-start correction) plus
    four corpus passes at exec. Rewritten ONE-PASS: the corpus is
    assigned once, every query ranks ALL 8 cells once (posexplode of the
    same reversed array_sort ivf_probe_cells slices — probe tie to the
    HIGHER cell, unchanged), and a single window pass computes four
    conditional running counts (rows with crank ≤ p up to the current
    row in the (cosine DESC, corpus_id) order — row_number restricted to
    the probe-p candidate subset, which is exactly ann_topk_ivf's rank
    because cells partition the corpus so no dedup ever fired). Four
    windows share ONE WindowExec (same spec); recall aggregates in ONE
    groupBy and the curve's four rows explode from it. Oracle unchanged
    (still the per-probe CTE chain); outputs proven identical both
    scales. Warm build 5.4 → 0.9 s, exec one corpus scan instead of
    four."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 5)
    qb = queries.select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qe"),
        sim.norm(sim._as_double(F.col("embedding"))).alias("qn"),
    )
    pairs = (
        emb.select(
            F.col("vec_id").alias("corpus_id"),
            F.col("embedding").alias("ce"),
            sim.norm(sim._as_double(F.col("embedding"))).alias("cn"),
        )
        .crossJoin(F.broadcast(qb))
        .where(F.col("corpus_id") != F.col("query_id"))
        .select(
            "query_id",
            "corpus_id",
            (
                sim.dot(
                    sim._as_double(F.col("ce")), sim._as_double(F.col("qe"))
                )
                / (F.col("cn") * F.col("qn"))
            ).alias("cosine"),
        )
    )
    w = W.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("corpus_id")
    )
    exact = (
        pairs.select(
            "query_id", "corpus_id", F.row_number().over(w).alias("rank")
        )
        .where(F.col("rank") <= 10)
        .select("query_id", "corpus_id")
        .localCheckpoint(eager=False)
    )
    c = sim._assign_cell(
        sim.with_unit_vector(emb, "embedding"), "`embedding`", FIXED_CENTS
    ).select(
        F.col("vec_id").alias("corpus_id"),
        F.col("unit").alias("c_unit"),
        "cell",
    ).localCheckpoint(eager=False)
    # the probe ranking rides in ONE parsed F.expr (the r11 plan-build
    # lesson: 8 × 64 literal nodes column-at-a-time cost ~0.7 s of py4j
    # round trips per invocation); flat _dot_lit_sql chains are the
    # literal-model dot discipline (r5) and bitwise-equal to the HOF
    # fold (left-assoc, 0.0+x exact — the PQ precedent)
    ranked_sql = (
        "reverse(array_sort(array("
        + ",".join(
            f"struct({sim._dot_lit_sql('unit', cv)} AS sim, {i} AS cell)"
            for i, cv in enumerate(FIXED_CENTS)
        )
        + ")))"
    )
    q8 = (
        sim.with_unit_vector(queries, "embedding")
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("unit").alias("q_unit"),
            # posexplode POSITION + 1 — named pos0 so the int-arith
            # audit's array-index bounded class covers it (≤ n_cells)
            F.posexplode(
                F.expr(f"transform({ranked_sql}, s -> s.cell)")
            ).alias("pos0", "cell"),
        )
        .select(
            "query_id", "q_unit", (F.col("pos0") + 1).alias("crank"), "cell"
        )
    )
    cands = c.join(F.broadcast(q8), "cell").where(
        F.col("corpus_id") != F.col("query_id")
    )
    scored = cands.select(
        "query_id",
        "corpus_id",
        "crank",
        sim.dot(F.col("c_unit"), F.col("q_unit")).alias("cosine"),
    )
    wcum = (
        W.partitionBy("query_id")
        .orderBy(F.desc("cosine"), F.asc("corpus_id"))
        .rowsBetween(W.unboundedPreceding, 0)
    )
    flags = scored.select(
        "query_id",
        "corpus_id",
        *[
            (
                (F.col("crank") <= p)
                & (
                    F.sum(
                        F.when(F.col("crank") <= p, 1).otherwise(0)
                    ).over(wcum)
                    <= 10
                )
            ).alias(f"in{p}")
            for p in _IVF_CURVE_PROBES
        ],
    )
    agg = (
        exact.join(flags, ["query_id", "corpus_id"], "left")
        .groupBy("query_id")
        .agg(
            F.count(F.lit(1)).alias("n_exact"),
            *[
                F.sum(F.when(F.col(f"in{p}"), 1).otherwise(0)).alias(
                    f"nf{p}"
                )
                for p in _IVF_CURVE_PROBES
            ],
        )
    )
    return agg.select(
        "query_id",
        "n_exact",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(p).cast("long").alias("nprobe"),
                        F.col(f"nf{p}").alias("n_found"),
                    )
                    for p in _IVF_CURVE_PROBES
                ]
            )
        ).alias("x"),
    ).select(
        F.col("x.nprobe").alias("nprobe"),
        "query_id",
        "n_exact",
        F.col("x.n_found").alias("n_found"),
        F.expr("CAST((x.n_found * 1000000) div n_exact AS BIGINT)").alias(
            "recall_ppm"
        ),
    )
