"""Physical-layout scale features: partition pruning and bucketed
(exchange-free) joins.

At 100 TB the difference between scanning a partition and scanning the
table, or between a co-located join and a full shuffle, dwarfs every
expression-level optimization — pin that the engine's write/read paths
actually trigger them. Reference parity: the snapshot store's key-bucket
layout (surge_spark/streaming/snapshot_store.py) applies the same two
ideas to its own files; these tests pin the generic parquet/table forms a
user's pipelines rely on.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from surge_spark.io import load_table


def test_partitioned_write_prunes_partitions(spark, sf_dir, tmp_path):
    """Hive-style partitioned parquet: an equality filter on the partition
    column must become a PartitionFilter (directory pruning — zero I/O for
    other partitions), NOT a row-level PushedFilter over every file."""
    out = str(tmp_path / "events_by_type")
    load_table(spark, sf_dir, "events").write.partitionBy(
        "event_type"
    ).parquet(out)
    df = spark.read.parquet(out).where(F.col("event_type") == "error")
    plan = df._jdf.queryExecution().executedPlan().toString()
    flat = plan.replace(" ", "").replace("\n", "")
    assert "PartitionFilters:[isnotnull(event_type" in flat, plan
    # the predicate is satisfied by pruning alone — nothing pushes row-level
    assert "PushedFilters:[]" in flat, plan
    n_err = df.count()
    total = spark.read.parquet(out).count()
    assert 0 < n_err < total


def test_bucketed_tables_join_without_exchange(spark, sf_dir, tmp_path):
    """Bucketed saveAsTable on the join key: joining two tables bucketed the
    same way must produce a SortMergeJoin with NO Exchange on either side —
    the co-located-join contract that removes the dominant shuffle of a
    repeated big-big join (bucket once at ingest, join free forever)."""
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        orders = load_table(spark, sf_dir, "orders")
        lineitem = load_table(spark, sf_dir, "lineitem").select(
            "l_orderkey", "l_quantity"
        )
        orders.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey").mode(
            "overwrite"
        ).saveAsTable("t_orders_b")
        lineitem.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey").mode(
            "overwrite"
        ).saveAsTable("t_lineitem_b")
        a = spark.table("t_orders_b")
        b = spark.table("t_lineitem_b")
        joined = a.join(b, a.o_orderkey == b.l_orderkey).groupBy(
            "o_orderpriority"
        ).agg(F.sum("l_quantity").alias("qty"))
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # the ONLY exchange is the final aggregation's — the join itself
        # reads co-located buckets
        join_part = plan.split("HashAggregate")[-1]
        assert "SortMergeJoin" in plan, plan
        assert "Exchange hashpartitioning" not in join_part, plan
        assert "SelectedBucketsCount" in plan, plan
        assert joined.count() > 0
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS t_orders_b")
        spark.sql("DROP TABLE IF EXISTS t_lineitem_b")


def test_zorder_envelopes_tighter_than_linear_sort_on_second_dim(spark, sf_dir):
    """The point of z-ordering: bucket min/max envelopes stay tight on BOTH
    dimensions. Quantitatively — the average l_partkey envelope extent of
    the 64 z-range buckets must be well under the extent of buckets from a
    plain l_orderkey sort (whose every bucket spans ~the full partkey
    range, pruning nothing for partkey predicates)."""
    from surge_spark.queries.relational import o_zorder_layout

    li = load_table(spark, sf_dir, "lineitem")
    lo, hi = li.agg(F.min("l_partkey"), F.max("l_partkey")).collect()[0]
    full = float(hi - lo) or 1.0

    z = o_zorder_layout(spark, sf_dir).collect()
    z_extent = sum(r.max_pk - r.min_pk for r in z) / len(z) / full

    from pyspark.sql import Window as W

    linear = (
        li.select(
            "l_partkey",
            (F.ntile(64).over(
                W.orderBy("l_orderkey", "l_partkey", "l_linenumber")
            ) - 1).alias("bucket"),
        )
        .groupBy("bucket")
        .agg(F.min("l_partkey").alias("mn"), F.max("l_partkey").alias("mx"))
        .collect()
    )
    lin_extent = sum(r.mx - r.mn for r in linear) / len(linear) / full

    # linear sort leaves ~full-range partkey envelopes; z-order divides the
    # rank domain, so its envelopes must be at most half as wide on average
    assert lin_extent > 0.5, f"testdata not adversarial enough: {lin_extent}"
    assert z_extent < 0.5 * lin_extent, (z_extent, lin_extent)
