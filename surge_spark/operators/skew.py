"""Skew-aware join helpers.

AQE's skew-join splitting (enabled in session.py) handles most skew at
runtime for sort-merge joins. ``salted_join`` is the explicit fallback for
the cases AQE can't fix — e.g. a shuffled-hash join against a hot-key
build side, or a groupBy where one key holds >10% of the table. The salt
fans one hot key out over N reducer partitions; the small side is replicated
N ways (explode over the salt range), so correctness is preserved for
equi-joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    large: DataFrame,
    small: DataFrame,
    key: str,
    salt_buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the large side salted and the small side replicated.

    large gains a random-ish salt derived from a stable row hash (so the
    plan stays deterministic for retries — Spark re-executes failed tasks
    and rand() would break exactly-once row accounting); small is exploded
    across all salt values. The join key becomes (key, salt), spreading a
    hot key over ``salt_buckets`` reducers.

    Only large-side-preserving join types are valid: with the small side
    replicated, right/full outer joins would emit one null-padded phantom
    row per unmatched salt copy."""
    allowed = {"inner", "left", "leftouter", "left_outer", "left_semi",
               "leftsemi", "left_anti", "leftanti"}
    if how.lower() not in allowed:
        raise ValueError(
            f"salted_join supports large-side-preserving joins only, got {how!r}"
        )
    salt = F.pmod(F.xxhash64(*large.columns), F.lit(salt_buckets)).alias("_salt")
    salted_large = large.withColumn("_salt", salt)
    replicated_small = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    ).withColumn("_salt", F.col("_salt").cast("long"))
    out = salted_large.join(replicated_small, [key, "_salt"], how)
    return out.drop("_salt")


def salted_count_per_key(df: DataFrame, key: str, salt_buckets: int = 16) -> DataFrame:
    """Two-phase aggregation for skewed groupBy keys: count per (key, salt)
    map-side, then combine per key. Spark's partial aggregation already does
    this for algebraic aggregates — this explicit form is the template for
    non-algebraic ones (e.g. collect-like or sketch merges)."""
    salt = F.pmod(F.xxhash64(F.col(key)), F.lit(salt_buckets))
    partial = (
        df.withColumn("_salt", salt)
        .groupBy(key, "_salt")
        .agg(F.count("*").alias("_partial"))
    )
    return partial.groupBy(key).agg(F.sum("_partial").alias("n"))
