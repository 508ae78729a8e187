"""Similarity-search catalog entries over the `embeddings` table.

The brute-force entries carry full DuckDB oracles (explicit double-precision
list arithmetic on both sides, rounded before ranking so float noise cannot
flip an ordering). The LSH-bucketed ANN path is hyperplane-seed dependent →
rows-only here, recall-checked against brute force in tests/test_similarity.py.
"""

from __future__ import annotations

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
    queries = emb.where(F.col("vec_id") < 5)
    scored = (
        emb.select(F.col("vec_id").alias("corpus_id"), F.col("embedding").alias("ce"))
        .crossJoin(
            F.broadcast(
                queries.select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe"))
            )
        )
        .where(F.col("corpus_id") != F.col("query_id"))
        .select(
            "query_id",
            "corpus_id",
            F.round(
                sim.dot(sim._as_double(F.col("ce")), sim._as_double(F.col("qe")))
                / (sim.norm(sim._as_double(F.col("ce"))) * sim.norm(sim._as_double(F.col("qe")))),
                6,
            ).alias("cosine"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("corpus_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 10)
        .select("query_id", "corpus_id", "cosine", "rank")
    )


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
            F.round(sim.dot(ea, eb) / (sim.norm(ea) * sim.norm(eb)), 6).alias("cosine"),
        )
        .where(F.col("cosine") >= 0.9)
    )


@query("sim_ann_lsh_topk")
def sim_ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-10 via sign-random-projection LSH (8 planes × 4
    tables), exact re-rank of bucket collisions only. Hyperplane-seed
    dependent → rows-only check; recall vs brute force asserted in
    tests/test_similarity.py. ``dim`` is passed (testdata embeddings are
    64-wide) so no driver probe job runs before the plan builds — pinned in
    tests/test_plans.py."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 5)
    return sim.ann_topk_lsh(
        emb, queries, "vec_id", "embedding", k=10, n_planes=8, n_tables=4, dim=64
    )


@query("sim_ann_ivf_topk")
def sim_ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-10 via an IVF coarse quantizer (8 cells, probe 4):
    spherical-k-means centroids, shuffle-free map-side cell assignment,
    exact re-rank inside probed cells only. Centroid-init dependent →
    rows-only check; recall vs brute force asserted in
    tests/test_similarity.py."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 5)
    return sim.ann_topk_ivf(
        emb, queries, "vec_id", "embedding", k=10, n_cells=8, nprobe=4, iters=2
    )


@query("sim_semantic_clusters")
def sim_semantic_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spherical k-means semantic clustering of the embedding corpus
    (distributed Lloyd iterations — only the 16×64-double centroid model
    touches the driver). Iterative + FP-order dependent → rows-only check;
    cluster recovery on a planted-cluster corpus pinned in
    tests/test_similarity.py."""
    emb = load_table(spark, sf_dir, "embeddings")
    return sim.semantic_clusters(emb, "vec_id", "embedding", n_cells=16, iters=2)


@query("sim_semantic_neardup_pairs")
def sim_semantic_neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic near-dedup without a precomputed blocking label: k-means
    cells bound the pair space (corpus²/n_cells on balanced data), exact
    cosine within a cell. The learned-blocking twin of
    sim_embedding_neardup_pairs (which trusts the stored `label`).
    Threshold 0.3 because the synthetic embeddings are near-orthogonal (max
    pairwise cosine ~0.48) — production default stays 0.9 in the operator.
    Rows-only: clustering is iterative; recall vs brute-force exact pairs
    on a planted-cluster corpus pinned in tests/test_similarity.py."""
    emb = load_table(spark, sf_dir, "embeddings")
    return sim.semantic_neardup_pairs(
        emb, "vec_id", "embedding", threshold=0.3, n_cells=16, iters=2
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
