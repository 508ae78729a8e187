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
    WindowGroupLimit. Self-matches (same id) are excluded."""
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
    (1 - theta/pi)^n_planes. Pass ``dim`` when known — deriving it costs a
    driver action against the DataFrame."""
    if dim is None:
        first = df.select(vec_col).first()
        if first is None:
            return df.withColumn("bucket", F.lit(None).cast("long"))
        dim = len(first[0])
    planes = _hyperplanes(dim, n_planes, seed)
    v = _as_double(F.col(vec_col))
    bucket = F.lit(0).cast("long")
    for i, p in enumerate(planes):
        plane = F.array(*[F.lit(x) for x in p])
        bit = F.when(dot(v, plane) >= 0, F.lit(1).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        bucket = bucket + bit * F.lit(1 << i).cast("long")
    return df.withColumn("bucket", bucket)


def ann_topk_lsh(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 10,
    n_planes: int = 8,
    n_tables: int = 4,
) -> DataFrame:
    """Approximate top-k: union of ``n_tables`` independent LSH tables;
    candidates = bucket collisions; exact cosine re-rank of candidates only.
    Recall/latency is tuned by (n_planes, n_tables)."""
    first = corpus.select(vec_col).first()
    if first is None:
        return corpus.sparkSession.createDataFrame(
            [], "query_id long, corpus_id long, cosine double, rank int"
        )
    dim = len(first[0])
    parts = []
    for t in range(n_tables):
        c = lsh_bucket(corpus, vec_col, n_planes, seed=42 + t, dim=dim).select(
            F.col(id_col).alias("corpus_id"), F.col(vec_col).alias("c_vec"), "bucket"
        )
        q = lsh_bucket(queries, vec_col, n_planes, seed=42 + t, dim=dim).select(
            F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec"), "bucket"
        )
        parts.append(c.join(F.broadcast(q), "bucket").drop("bucket"))
    cands = parts[0]
    for p in parts[1:]:
        cands = cands.unionByName(p)
    cands = cands.where(F.col("corpus_id") != F.col("query_id")).dropDuplicates(
        ["query_id", "corpus_id"]
    )
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


def embedding_neardup_pairs(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    block_col: str,
    threshold: float,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs within blocks (e.g. a coarse
    cluster/label or LSH bucket as the blocking key). Exact cosine inside
    each block; the block join bounds the pair space."""
    u = with_unit_vector(df, vec_col)
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
        a.join(b, "block")
        .where(F.col("id_a") < F.col("id_b"))
        .select("block", "id_a", "id_b", F.round(dot(F.col("ua"), F.col("ub")), 6).alias("cosine"))
        .where(F.col("cosine") >= threshold)
    )
