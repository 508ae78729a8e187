"""Physical-plan assertions: the catalog's scale properties (pushdown,
pruning, broadcast, partial top-k) are load-bearing — pin them so a
refactor that silently degrades a plan fails CI, not the 100 TB run."""

from __future__ import annotations

import pytest

from surge_spark.queries import all_queries


def _plan(spark, sf_dir, name: str) -> str:
    df = all_queries()[name](spark, sf_dir)
    return df._jdf.queryExecution().executedPlan().toString()


def test_filter_pushdown_reaches_scan(spark, sf_dir):
    plan = _plan(spark, sf_dir, "p2_filter_project")
    assert "PushedFilters" in plan
    assert "EqualTo(event_type,error)" in plan.replace(" ", "").replace("\n", "") or (
        "event_type" in plan and "PushedFilters: [" in plan
    )


def test_column_pruning_on_flagship(spark, sf_dir):
    """The 4-way join must read only 3 lineitem columns."""
    plan = _plan(spark, sf_dir, "j_revenue_per_nation")
    assert "ReadSchema: struct<l_orderkey:bigint,l_extendedprice:double,l_discount:double>" in plan


def test_dimension_joins_broadcast(spark, sf_dir):
    plan = _plan(spark, sf_dir, "j_broadcast_dim_join")
    assert plan.count("BroadcastHashJoin") >= 2
    assert "SortMergeJoin" not in plan


def test_q9_profit_dims_broadcast_no_fact_shuffle(spark, sf_dir):
    """j_profit_by_nation_year: all three dims (part/supplier/nation)
    broadcast — the lineitem fact must reach the partial agg without a
    join shuffle; the only hash exchange is the final (nation, year) agg."""
    plan = _plan(spark, sf_dir, "j_profit_by_nation_year")
    assert plan.count("BroadcastHashJoin") == 3
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan
    assert "partial_" in plan
    # p_type filter pushed to the part scan
    flat = plan.replace(" ", "").replace("\n", "")
    assert "StringStartsWith(p_type,STANDARD)" in flat


def test_global_topn_avoids_full_sort(spark, sf_dir):
    plan = _plan(spark, sf_dir, "o_orderby_limit")
    assert "TakeOrderedAndProject" in plan


def test_topk_per_key_uses_group_limit(spark, sf_dir):
    plan = _plan(spark, sf_dir, "w_topk_per_key")
    assert "WindowGroupLimit" in plan


def test_latest_per_key_is_aggregate_not_window(spark, sf_dir):
    """A2 must stay a partial+final aggregate (max_by), not a sort+window."""
    plan = _plan(spark, sf_dir, "a2_latest_per_key")
    assert "HashAggregate" in plan or "SortAggregate" in plan or "ObjectHashAggregate" in plan
    assert "Window" not in plan


@pytest.mark.parametrize(
    "name",
    ["a_groupby_pricing_summary", "j_revenue_per_nation", "m_sensor_statistics"],
)
def test_aggregations_have_partial_stage(spark, sf_dir, name):
    """Partial (map-side) aggregation before the exchange — the difference
    between shuffling raw rows and shuffling one row per group per task."""
    plan = _plan(spark, sf_dir, name)
    # partial_<fn> markers prove map-side combine before the exchange,
    # regardless of exec strategy (Hash/Sort/ObjectHash aggregate)
    assert "partial_" in plan, plan
    assert "Exchange hashpartitioning" in plan, plan


def test_whole_stage_codegen_covers_relational_path(spark, sf_dir):
    """AdaptiveSparkPlan only materializes codegen stages after execution —
    run the query, then inspect the finalized plan."""
    df = all_queries()["a_groupby_pricing_summary"](spark, sf_dir)
    df.collect()  # a write triggers a separate QueryExecution; collect finalizes df's own
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in plan
    # '*(N)' prefixes mark operators inside a WholeStageCodegen stage
    assert "*(" in plan
    assert any("*(" in l and "partial_sum" in l for l in plan.splitlines())


def test_ivf_corpus_assignment_is_map_side(spark, sf_dir):
    """IVF ANN: corpus→cell assignment must be a pure map-side expression —
    no exchange may appear below the cell join's corpus side. The only
    shuffles in the whole query are the candidate dedup and the final
    per-query top-k window."""
    plan = _plan(spark, sf_dir, "sim_ann_ivf_topk")
    # probe join broadcasts the (tiny) query side
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    # whole plan has exactly the two post-join exchanges (dedup + window);
    # assignment contributes none
    assert plan.count("Exchange hashpartitioning") <= 2, plan


def test_open_window_snapshot_partial_aggregates(spark, tmp_path):
    """W4 snapshot: one partial+final aggregation over the event table."""
    from pyspark.sql import types as T

    from surge_spark.streaming import windows as sw

    df = spark.createDataFrame([], sw.WINDOW_EVENT_SCHEMA)
    plan = (
        sw.open_window_snapshot(df)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "partial_max_by" in plan
    assert "Exchange hashpartitioning" in plan


def test_minhash_band_join_reuses_signature_exchange(spark, sf_dir):
    """The band self-join's two sides are the same signature subtree; AQE
    must compute it once (ReusedExchange in the finalized plan) — losing the
    reuse doubles the most expensive stage of the dedup pipeline."""
    df = all_queries()["d_minhash_lsh_neardup"](spark, sf_dir)
    df.collect()  # reuse appears in the finalized adaptive plan
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in plan
    assert "ReusedExchange" in plan, plan


def test_pruned_lsh_one_scan_verification(spark, sf_dir):
    """d_minhash_lsh_neardup (the production entry, pruned by default
    since r10): verification must be the ONE-SCAN
    O(candidates) shape — role-exploded pairs joined once against a single
    shingle stream (broadcast map-side when pairs ≪ corpus: the corpus
    never shuffles in verification), reduced by a two-level aggregate.
    Pinned structurally: NO full-corpus per-doc sizes aggregate anywhere
    (`n_shingles` is unpruned-only — the one-scan form derives n_union
    directly, so the whole sizes subtree is gone), the role join
    broadcasts, no semi-join prune passes, no persist barrier, and the
    band self-join still reuses its signature exchange. (Scan counting is
    NOT a usable pin here: the AQE executed-plan string re-prints query-
    stage subtrees, so FileScan occurrences overcount non-deterministically.)"""
    df = all_queries()["d_minhash_lsh_neardup"](spark, sf_dir)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "n_shingles" not in plan, plan
    assert "BroadcastHashJoin" in plan, plan
    assert "LeftSemi" not in plan, plan
    assert "InMemoryTableScan" not in plan, plan
    assert "ReusedExchange" in plan, plan


def test_ann_lsh_builds_plan_without_driver_probe(spark):
    """With dim passed, ann_topk_lsh builds a fully lazy plan: no Spark job
    may run during construction (the old .first() dim probe was one driver
    action per call before the plan even existed). The parquet-side catalog
    entry passes dim=64 for the same reason."""
    from surge_spark.operators import similarity as sim

    vecs = spark.createDataFrame(
        [(i, [float(i), 1.0, 0.0, 0.5]) for i in range(20)],
        "vec_id long, embedding array<double>",
    )
    tracker = spark.sparkContext.statusTracker()
    before = set(tracker.getJobIdsForGroup(None) or [])
    out = sim.ann_topk_lsh(
        vecs, vecs.limit(2), "vec_id", "embedding", k=3, dim=4
    )  # build only, no action
    after = set(tracker.getJobIdsForGroup(None) or [])
    assert after == before, f"plan build ran Spark jobs: {sorted(after - before)}"
    assert out.count() >= 0  # the plan is executable


def test_decontaminate_benchmark_side_broadcast(spark, sf_dir):
    """d_decontaminate: the benchmark shingle set must broadcast — the
    training shingle stream joins it map-side, never shuffling on the
    shingle key (the scale contract: eval suites are MBs, the corpus TBs)."""
    plan = _plan(spark, sf_dir, "d_decontaminate")
    assert "BroadcastHashJoin" in plan


def test_tfidf_topk_uses_group_limit_and_broadcast_count(spark, sf_dir):
    """t_tfidf_top_terms: per-doc top-3 must be a WindowGroupLimit partial
    top-k, and the corpus-count single row must ride as a broadcast (no
    shuffle for the cross join)."""
    plan = _plan(spark, sf_dir, "t_tfidf_top_terms")
    assert "WindowGroupLimit" in plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


def test_vocab_topk_avoids_full_sort(spark, sf_dir):
    plan = _plan(spark, sf_dir, "t_vocab_top_terms")
    assert "TakeOrderedAndProject" in plan


def test_boilerplate_ngrams_topk_avoids_full_sort(spark, sf_dir):
    plan = _plan(spark, sf_dir, "t_boilerplate_ngrams")
    assert "TakeOrderedAndProject" in plan


def test_boilerplate_fraction_hot_set_broadcasts(spark, sf_dir):
    """t_boilerplate_fraction: the hot-shingle set must broadcast so the
    shingle stream's hit count never shuffles on the shingle key (the
    decontaminate contract — hot set is MBs, the corpus TBs)."""
    plan = _plan(spark, sf_dir, "t_boilerplate_fraction")
    assert "BroadcastHashJoin" in plan


def test_shuffle_shards_is_map_side(spark, sf_dir):
    """t_shuffle_shards: a keyed global permutation with zero shuffles —
    pure scan + projection."""
    plan = _plan(spark, sf_dir, "t_shuffle_shards")
    assert "Exchange" not in plan


def test_stratified_sample_is_map_side(spark, sf_dir):
    """No shuffle: the stratified sample is a pure scan+filter."""
    plan = _plan(spark, sf_dir, "t_stratified_sample")
    assert "Exchange" not in plan


def test_corpus_mix_total_is_broadcast(spark, sf_dir):
    """The token-share denominator must ride as a broadcast of the tiny
    grouped result, never a second documents scan joined by shuffle."""
    plan = _plan(spark, sf_dir, "t_corpus_mix")
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


def test_clean_corpus_uses_semi_join(spark, sf_dir):
    plan = _plan(spark, sf_dir, "t_clean_corpus")
    assert "LeftSemi" in plan


def test_duplicate_spans_semi_join_and_partial_agg(spark, sf_dir):
    """d_duplicate_spans: the gram-frequency table must partial-aggregate
    (map-side combine before its shuffle) and duplicated positions must
    come back via a semi join — not a full join that widens the stream."""
    df = all_queries()["d_duplicate_spans"](spark, sf_dir)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "LeftSemi" in plan, plan
    assert "partial_count" in plan, plan


def test_lang_centroids_broadcast_and_partial_avg(spark, sf_dir):
    """sim_lang_centroids: the documents⋈embeddings key join broadcasts and
    the centroid mean is partial+final on (lang, dim) — embedding rows
    never shuffle whole."""
    df = all_queries()["sim_lang_centroids"](spark, sf_dir)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan
    assert "partial_avg" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_unigram_logprob_no_smj_no_cartesian(spark, sf_dir):
    """t_unigram_logprob: vocab joins broadcast at this scale, the corpus
    total enters as a broadcast one-row join (BroadcastNestedLoopJoin),
    and nothing falls back to CartesianProduct or a sort-merge join."""
    df = all_queries()["t_unigram_logprob"](spark, sf_dir)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "partial_count" in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_q3_broadcasts_dim_and_takeordered(spark, sf_dir):
    """q3_shipping_priority: customer broadcasts (never a shuffle join for
    the dim) and the top-10 is TakeOrdered, not a global sort; both date
    filters reach their scans."""
    plan = _plan(spark, sf_dir, "q3_shipping_priority")
    assert "BroadcastHashJoin" in plan
    assert "TakeOrderedAndProject" in plan
    flat = plan.replace(" ", "").replace("\n", "")
    assert "PushedFilters" in plan and "LessThan(o_orderdate" in flat
    assert "GreaterThan(l_shipdate" in flat


def test_q18_aggregates_lineitem_before_join(spark, sf_dir):
    """q18_large_orders: the quantity rollup must run partial+final on
    lineitem BEFORE any join (the semi-join-sized reduction), and customer
    broadcasts."""
    plan = _plan(spark, sf_dir, "q18_large_orders")
    assert "partial_sum" in plan
    assert "BroadcastHashJoin" in plan
    # the lineitem aggregate's exchange appears BELOW the first join in the
    # tree: the aggregate's final HashAggregate must occur before (deeper
    # than) any join operator when reading the plan bottom-up — cheap proxy:
    # no SortMergeJoin anywhere (a join-first plan on unreduced lineitem
    # would exceed the broadcast threshold and sort-merge)
    assert "SortMergeJoin" not in plan


def test_q6_all_predicates_pushed_schema_pruned(spark, sf_dir):
    """q6_forecast_revenue: the no-join scan-agg — all three predicates
    reach the parquet scan and ReadSchema carries only the 4 referenced
    lineitem columns; the single-row answer is one partial+final agg."""
    plan = _plan(spark, sf_dir, "q6_forecast_revenue")
    flat = plan.replace(" ", "").replace("\n", "")
    # toString() truncates the PushedFilters list — assert the visible
    # prefix proves all three columns entered the pushdown set
    assert (
        "PushedFilters:[IsNotNull(l_shipdate),IsNotNull(l_discount),"
        "IsNotNull(l_quantity),GreaterThanOrEqual" in flat
    ), plan
    assert (
        "ReadSchema:struct<l_quantity:double,l_extendedprice:double,"
        "l_discount:double,l_shipdate:" in flat
    ), plan
    assert "partial_sum" in plan


def test_q10_filters_before_join_and_takeordered(spark, sf_dir):
    """q10_returned_items: the quarter filter prunes orders and the
    returnflag filter prunes lineitem at their scans (before the fact
    join); customer and nation broadcast; top-20 is TakeOrdered."""
    plan = _plan(spark, sf_dir, "q10_returned_items")
    flat = plan.replace(" ", "").replace("\n", "")
    assert "EqualTo(l_returnflag,R)" in flat
    assert "GreaterThanOrEqual(o_orderdate" in flat
    assert "TakeOrderedAndProject" in plan
    assert plan.count("BroadcastHashJoin") >= 2
    assert "SortMergeJoin" not in plan


def test_q14_single_pass_conditional_agg(spark, sf_dir):
    """q14_promo_revenue: both sums (promo and total) fold in ONE
    partial+final aggregate pass — no self-join, no second scan; part
    broadcasts; the month filter reaches the lineitem scan."""
    plan = _plan(spark, sf_dir, "q14_promo_revenue")
    flat = plan.replace(" ", "").replace("\n", "")
    assert "GreaterThanOrEqual(l_shipdate" in flat
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert plan.count("Scan parquet") == 2, plan  # lineitem once, part once
    assert "partial_sum" in plan


def test_triangle_count_no_cartesian_takeordered(spark, sf_dir):
    """g_triangle_count: wedge closure is equi-joins only (never a
    cartesian), per-corner credit is one explode + partial+final count,
    and the top-20 avoids a global sort."""
    plan = _plan(spark, sf_dir, "g_triangle_count")
    assert "CartesianProduct" not in plan
    assert "partial_count" in plan
    assert "Generate explode" in plan
    assert "TakeOrderedAndProject" in plan


def test_word_pmi_broadcasts_counts_takeordered(spark, sf_dir):
    """t_word_pmi_top_pairs: bigrams are map-side (explode of an
    array-zip, no per-doc window), vocab joins broadcast, corpus totals
    enter as broadcast one-row joins, top-k is TakeOrdered."""
    plan = _plan(spark, sf_dir, "t_word_pmi_top_pairs")
    assert plan.count("BroadcastHashJoin") >= 2
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "partial_sum" in plan
    assert "TakeOrderedAndProject" in plan


def test_global_sort_uses_range_partitioning(spark, sf_dir):
    """o_global_sort: a full ordered output must exchange on
    rangepartitioning (sampled boundaries, parallel disjoint ranges) —
    never a single-partition sort."""
    plan = _plan(spark, sf_dir, "o_global_sort")
    assert "rangepartitioning" in plan, plan
    assert "Sort [" in plan
    assert "SinglePartition" not in plan.split("rangepartitioning")[0], plan


def test_kmv_merge_truncates_per_type_before_union(spark, sf_dir):
    """a_kmv_merged_union: the per-type sketches must be WindowGroupLimit-
    truncated (≤64 rows per type survive) before the merge, so the merge
    input is n_types×64 regardless of corpus size."""
    plan = _plan(spark, sf_dir, "a_kmv_merged_union")
    assert "WindowGroupLimit" in plan
    assert "partial_count(distinct" in plan or "count(user_id" in plan, plan


def test_pq_topk_broadcast_lut_no_shuffle_join(spark, sf_dir):
    """sim_ann_pq_topk: the query LUT side broadcasts (BNLJ cross join —
    never a shuffle join), corpus encode is map-side expressions, and the
    per-query top-k stays a partial WindowGroupLimit."""
    plan = _plan(spark, sf_dir, "sim_ann_pq_topk")
    assert "BroadcastNestedLoopJoin" in plan
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan
    assert "WindowGroupLimit" in plan
    assert "CartesianProduct" not in plan


def test_ivfadc_broadcast_probe_no_shuffle_join(spark, sf_dir):
    """sim_ann_ivfadc_topk: the probe side (cells × LUTs) broadcasts into
    a hash join on cell; corpus assignment+encode are map-side; the
    per-query top-k stays a partial WindowGroupLimit."""
    plan = _plan(spark, sf_dir, "sim_ann_ivfadc_topk")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan
    assert "WindowGroupLimit" in plan
    assert "CartesianProduct" not in plan


def test_bm25_filters_terms_before_aggregation(spark, sf_dir):
    """t_bm25_search: the query-term filter is map-side (same stage as the
    token explode, before any exchange) so only matching rows aggregate;
    corpus stats enter as a broadcast, not a collect."""
    plan = _plan(spark, sf_dir, "t_bm25_search")
    flat = plan.replace(" ", "").replace("\n", "")
    # the literal IN-list filter on the token column must exist in the plan
    # (Spark renders it as `token#N IN (...)` or an InSet for longer lists)
    assert "token#" in flat
    assert "IN(window,merge,customer)" in flat or "INSET" in flat.upper(), plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


def test_q4_semi_join_both_filters_pushed(spark, sf_dir):
    """q4_priority_check: EXISTS lowers to a LeftSemi join (no distinct, no
    row multiplication) with the quarter filter pushed to the orders scan
    and the returnflag filter to the lineitem scan."""
    plan = _plan(spark, sf_dir, "q4_priority_check")
    flat = plan.replace(" ", "").replace("\n", "")
    assert "LeftSemi" in plan
    assert "GreaterThanOrEqual(o_orderdate" in flat
    assert "EqualTo(l_returnflag,R)" in flat
    assert "SortMergeJoin" not in plan


def test_q13_join_side_filter_pushed_double_agg(spark, sf_dir):
    """q13_customer_distribution: the priority filter lives in the JOIN
    condition yet still pushes into the orders scan (it only references
    the preserved-side's opposite table); both aggregation levels run
    partial+final."""
    plan = _plan(spark, sf_dir, "q13_customer_distribution")
    flat = plan.replace(" ", "").replace("\n", "")
    assert "LeftOuter" in plan
    assert "Not(EqualTo(o_orderpriority,1-URGENT))" in flat
    assert plan.count("partial_count") == 2
    assert "SortMergeJoin" not in plan


def test_q15_single_lineitem_scan(spark, sf_dir):
    """q15_top_supplier: the max-of-aggregate must NOT re-evaluate the
    revenue view — exactly one lineitem scan, with the global max taken
    by a window over the already-aggregated per-supplier rows."""
    plan = _plan(spark, sf_dir, "q15_top_supplier")
    assert plan.count("lineitem.parquet") == 1, plan
    assert "Window" in plan
    assert "partial_sum" in plan


def test_q16_anti_join_and_countdistinct_expansion(spark, sf_dir):
    """q16_supplier_part_count: the supplier exclusion is a broadcast
    left-anti join, the size IN-list pushes to the part scan, and
    count(distinct) expands to the two-level aggregate."""
    plan = _plan(spark, sf_dir, "q16_supplier_part_count")
    flat = plan.replace(" ", "").replace("\n", "")
    assert "LeftAnti" in plan
    assert "In(p_size" in flat
    assert "count(distinct" in plan
    assert "SortMergeJoin" not in plan


def test_q17_avg_joinback_partial_and_residual(spark, sf_dir):
    """q17_small_quantity_revenue: the per-part threshold is a partial+final
    avg joined back with the quantity comparison as a non-equi residual on
    the broadcast join; the brand filter reaches the part scan."""
    plan = _plan(spark, sf_dir, "q17_small_quantity_revenue")
    flat = plan.replace(" ", "").replace("\n", "")
    assert "partial_avg" in plan
    assert plan.count("BroadcastHashJoin") >= 2
    assert "EqualTo(p_brand,Brand#12)" in flat
    assert "SortMergeJoin" not in plan


def test_q19_disjunction_bounds_pushed_to_both_scans(spark, sf_dir):
    """q19_disjunctive_revenue: Catalyst must factor scan-local bounds out
    of the OR-of-ANDs — the quantity-band disjunction reaches the lineitem
    scan and the brand/size disjunction the part scan, while the full
    cross-table predicate evaluates above the broadcast join."""
    plan = _plan(spark, sf_dir, "q19_disjunctive_revenue")
    flat = plan.replace(" ", "").replace("\n", "")
    assert "Or(Or(And(GreaterThanOrEqual(l_quantity,1.0)" in flat, plan
    # toString() truncates the part scan's filter list — the visible prefix
    # proves the brand/size disjunction entered the pushdown set
    assert "Or(Or(And(EqualTo(p_brand" in flat, plan
    assert "BroadcastHashJoin" in plan


def test_q21_semi_anti_stack_takeordered(spark, sf_dir):
    """q21_waiting_suppliers: the EXISTS/NOT-EXISTS pair lowers to one
    LeftSemi and one LeftAnti with non-equi residuals over the same
    l_orderkey key (plus the orders-status LeftSemi); top-20 is
    TakeOrdered, never a global sort."""
    plan = _plan(spark, sf_dir, "q21_waiting_suppliers")
    assert plan.count("LeftSemi") == 2
    assert "LeftAnti" in plan
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan


def test_q22_anti_join_date_pushed(spark, sf_dir):
    """q22_prospect_customers: the recent-orders anti join prunes orders at
    the scan by date BEFORE building the anti side; the scalar threshold
    is a one-row broadcast."""
    plan = _plan(spark, sf_dir, "q22_prospect_customers")
    flat = plan.replace(" ", "").replace("\n", "")
    assert "LeftAnti" in plan
    assert "GreaterThanOrEqual(o_orderdate,1999-01-01" in flat
    assert "SortMergeJoin" not in plan


def test_q7_all_dims_broadcast_nation_inlist_pushed(spark, sf_dir):
    """q7_volume_shipping: supplier, customer and both nation legs
    broadcast (lineitem is the only shuffling input) and the inferred
    single-nation IN-list membership pushes below the cross-table
    disjunction into the nation scans."""
    plan = _plan(spark, sf_dir, "q7_volume_shipping")
    flat = plan.replace(" ", "").replace("\n", "")
    assert plan.count("BroadcastHashJoin") >= 4
    assert "In(n_name" in flat
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_weighted_sample_map_side_topk(spark, sf_dir):
    """t_weighted_sample: the A-ES score is a map-side expression and the
    selection is TakeOrdered — zero hash-partition exchanges, one scan,
    never a global sort."""
    plan = _plan(spark, sf_dir, "t_weighted_sample")
    assert "TakeOrderedAndProject" in plan
    assert "Exchange hashpartitioning" not in plan
    assert plan.count("Scan parquet") == 1


def test_inverted_index_dedups_before_explode_single_shuffle(spark, sf_dir):
    """t_inverted_index: per-doc term dedup happens via array_distinct
    BEFORE the explode (the shuffle carries one row per distinct term per
    doc); the df band is decided on a counts-only aggregate and filters
    the pair stream ahead of the collect_list (banned lists never build);
    the corpus count joins as a broadcast single row."""
    plan = _plan(spark, sf_dir, "t_inverted_index")
    assert "array_distinct" in plan
    assert plan.count("Exchange hashpartitioning") == 1
    assert "BroadcastNestedLoopJoin" in plan


def test_histogram_percentiles_partial_agg_bounded_window(spark, sf_dir):
    """a_histogram_percentiles: the bin histogram runs partial+final (the
    sketch merge), lineitem is scanned once, and the cumulative window
    runs over the bounded bin table — its input exchange is the
    SinglePartition of ~100 rows, not of the fact table."""
    plan = _plan(spark, sf_dir, "a_histogram_percentiles")
    assert "partial_count" in plan
    assert plan.count("Scan parquet") == 1
    assert "Window" in plan
    assert plan.count("Exchange hashpartitioning") == 1  # only the bin agg


def test_time_rollup_single_pass_expand(spark, sf_dir):
    """m_time_rollup: ROLLUP expands to grouping sets inside ONE
    partial+final aggregate over ONE events scan — no per-level re-scan."""
    plan = _plan(spark, sf_dir, "m_time_rollup")
    assert "Expand" in plan
    assert "partial_count" in plan
    assert plan.count("Scan parquet") == 1


def test_funnel_stage_filters_pushed_no_cartesian(spark, sf_dir):
    """m_funnel_conversion: each funnel stage's event_type filter reaches
    the events scan; stage joins are keyed (never cartesian) and the five
    scalar counts combine via one-row broadcasts."""
    plan = _plan(spark, sf_dir, "m_funnel_conversion")
    flat = plan.replace(" ", "").replace("\n", "")
    assert "EqualTo(event_type,view)" in flat
    assert "EqualTo(event_type,click)" in flat
    assert "EqualTo(event_type,purchase)" in flat
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan


def test_retention_dedups_with_partial_agg(spark, sf_dir):
    """m_retention_cohorts: the (user, day) dedup and the cohort min both
    run partial+final before the user_id join; no cartesian, no
    sort-merge."""
    plan = _plan(spark, sf_dir, "m_retention_cohorts")
    assert "partial_" in plan
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan


def test_diverse_representatives_single_scan_group_limit(spark, sf_dir):
    """sim_diverse_representatives: the scored assignment materializes
    ONCE (r11 janino fix — the cell+score chain fused into both the sizes
    aggregate and the rank window blew the 64 KB generated-method limit,
    a failed compile retried every run; the old plan's deliberate second
    pruned scan is superseded): both consumers read the checkpoint (Scan
    ExistingRDD), the corpus parquet is scanned zero times in THIS plan
    (the checkpoint's own build scans it), the exemplar pick stays a
    WindowGroupLimit partial top-k, sizes stay a partial agg joined back
    broadcast."""
    plan = _plan(spark, sf_dir, "sim_diverse_representatives")
    assert plan.count("Scan parquet") == 0
    assert "ExistingRDD" in plan
    assert "partial_count" in plan
    assert "WindowGroupLimit" in plan
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_semantic_clusters_flat_assignment_single_exchange(spark, sf_dir):
    """sim_semantic_clusters: the cell assignment is a FLAT literal
    multiply-add expression (no interpreted aggregate/zip_with HOF — that
    form measured 19× slower end-to-end at sf0.1) evaluated once per row:
    one scan, one exchange, sizes from the cluster-partitioned window."""
    plan = _plan(spark, sf_dir, "sim_semantic_clusters")
    assert "zip_with" not in plan
    assert "transform(" not in plan
    assert plan.count("Scan parquet") == 1
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Window" in plan


def test_bruteforce_topk_group_limit(spark, sf_dir):
    """sim_cosine_topk_bruteforce: top-k stays a WindowGroupLimit partial
    top-k (pair SCORING deliberately remains the HOF dot — A/B-measured
    faster than flat indexed chains for column-column arithmetic; the
    flat form wins only for literal-model dots, pinned on
    sim_semantic_clusters instead)."""
    plan = _plan(spark, sf_dir, "sim_cosine_topk_bruteforce")
    assert "WindowGroupLimit" in plan


def test_corr_regression_single_partial_pass(spark, sf_dir):
    """a_corr_regression: all three bivariate statistics fold in ONE
    partial+final aggregate pass over one scan (per-partition moment
    sketches merged — never a re-scan per statistic)."""
    plan = _plan(spark, sf_dir, "a_corr_regression")
    assert "partial_" in plan
    assert plan.count("Scan parquet") == 1
    assert "Exchange hashpartitioning" in plan


def test_moving_median_single_user_shuffle(spark, sf_dir):
    """w_moving_median: one shuffle on user_id feeds the frame window; the
    median is frame-local arithmetic (no second aggregate, no join)."""
    plan = _plan(spark, sf_dir, "w_moving_median")
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Window" in plan
    assert "Join" not in plan


def test_q8_all_dims_broadcast_single_share_pass(spark, sf_dir):
    """q8_market_share: every dimension (part, supplier, customer, both
    nation roles, region) broadcasts — lineitem is the only shuffling
    input — and numerator + denominator fold in ONE partial+final
    aggregate (no self-join, no second scan of the fact)."""
    plan = _plan(spark, sf_dir, "q8_market_share")
    flat = plan.replace(" ", "").replace("\n", "")
    assert plan.count("BroadcastHashJoin") >= 6
    assert "SortMergeJoin" not in plan
    assert plan.count("lineitem.parquet") == 1
    assert "partial_sum" in plan
    assert "EqualTo(p_type,STANDARD)" in flat
    assert "EqualTo(r_name,EUROPE)" in flat


def test_q12_dual_conditional_counts_one_pass(spark, sf_dir):
    """q12_shipping_modes: both complementary priority counts fold in ONE
    partial+final aggregate over one join — no branch re-scan; the year
    filter reaches the lineitem scan."""
    plan = _plan(spark, sf_dir, "q12_shipping_modes")
    flat = plan.replace(" ", "").replace("\n", "")
    assert "partial_sum" in plan
    assert plan.count("lineitem.parquet") == 1
    assert plan.count("orders.parquet") == 1
    assert "GreaterThanOrEqual(l_shipdate" in flat


def test_q5_broadcast_chain_and_colocation_condition(spark, sf_dir):
    """q5_local_supplier_volume: every dimension (region→nation→supplier,
    customer) broadcasts — the fact table shuffles at most for its own
    aggregate — and the customer-supplier nation co-location equality
    rides a join condition, not a post-join filter. Date bounds reach the
    orders scan."""
    plan = _plan(spark, sf_dir, "q5_local_supplier_volume")
    assert plan.count("BroadcastHashJoin") >= 3
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
    flat = plan.replace(" ", "").replace("\n", "")
    assert "GreaterThanOrEqual(o_orderdate" in flat
    assert "LessThan(o_orderdate" in flat
    # the co-location predicate is part of a join (appears in a join's key
    # list), not a separate Filter above it
    assert "c_nationkey" in plan


def test_doulion_runs_zero_driver_jobs_at_plan_build(spark, sf_dir):
    """g_triangle_count_sampled: building the plan must schedule no Spark
    job (the sampling is an expression, not a collected model)."""
    from surge_spark.queries import all_queries

    tracker = spark.sparkContext.statusTracker()
    before = len(tracker.getJobIdsForGroup(None) or [])
    all_queries()["g_triangle_count_sampled"](spark, sf_dir)
    after = len(tracker.getJobIdsForGroup(None) or [])
    assert after == before


def test_prefix_sum_entries_have_no_unpartitioned_window(spark, sf_dir):
    """t_pack_sequences / t_token_budget_selection run the exact two-pass
    distributed prefix sum (r7): every Window in the plan is partitioned
    by the quantile shard id — no single-partition WindowExec anywhere,
    not even over the shard totals (those cumulate via a broadcast theta
    self-join). Regressing to the global ORDER BY window funnels the
    whole corpus through one task."""
    for name in (
        "t_pack_sequences",
        "t_token_budget_selection",
        "m_rfm_segmentation",
        "m_pareto_share",
    ):
        plan = _plan(spark, sf_dir, name)
        n_windows = plan.count("Window [")
        assert n_windows >= 1, name
        assert n_windows == plan.count("windowspecdefinition(__shard"), (
            name,
            plan,
        )
        # shard offsets come back via broadcast, totals ride the windowed
        # subtree's exchange (no second corpus scan)
        assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan, name


def test_pca_outliers_rank_filter_becomes_take_ordered(spark, sf_dir):
    """sim_pca_residual_outliers' global rank-filter is rewritten by
    Catalyst into TakeOrderedAndProject(limit=20) BELOW the window — the
    'single-partition' window therefore ranks 20 rows, not the corpus.
    Regressing this (e.g. by materializing the rank before filtering)
    would sort every vector's residual through one task."""
    plan = _plan(spark, sf_dir, "sim_pca_residual_outliers")
    assert "TakeOrderedAndProject(limit=20" in plan, plan


def test_table_stats_no_expand_anywhere(spark, sf_dir):
    """o_table_stats: each exact NDV is its own single-distinct aggregate —
    packing them into one agg planned an Expand that multiplied the scan
    5x (6.6-8.0 s vs 1.0-1.7 s at sf0.1, r10 A/B). Pin Expand out of the
    physical plan entirely."""
    plan = _plan(spark, sf_dir, "o_table_stats")
    assert "Expand" not in plan, plan


def test_dau_wau_mau_no_theta_join_no_global_window(spark, sf_dir):
    """m_dau_wau_mau: the trailing-window distinct counts come from a
    bounded explode (sequence 0..27) + hash aggregates — never a range
    theta join (nested-loop at scale) and never an unpartitioned window.
    Expand is fine here (it's sequence+explode's generator, per-row
    bounded); the join shapes are not."""
    plan = _plan(spark, sf_dir, "m_dau_wau_mau")
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "Window" not in plan, plan


def test_path_trigrams_one_window_pass_takeordered(spark, sf_dir):
    """m_event_path_trigrams: both lag frames evaluate in ONE partitioned
    WindowExec pass (two Window operators would sort every user's events
    twice), and the global top-25 is TakeOrderedAndProject, never a full
    sort."""
    plan = _plan(spark, sf_dir, "m_event_path_trigrams")
    assert plan.count("Window [") == 1, plan
    assert "windowspecdefinition(user_id" in plan, plan
    assert "TakeOrderedAndProject(limit=25" in plan, plan
    assert "partial_count" in plan or "partial count" in plan, plan


def test_activity_streaks_windows_partitioned_no_joins(spark, sf_dir):
    """w_activity_streaks: the gaps-and-islands row_number runs over the
    per-user distinct-day stream — every WindowExec partitioned by
    user_id, and the whole plan is scan + aggregates (no join of any
    kind). Regressing to a global ORDER BY window funnels all users
    through one task."""
    plan = _plan(spark, sf_dir, "w_activity_streaks")
    n_windows = plan.count("Window [")
    assert n_windows >= 1, plan
    assert n_windows == plan.count("windowspecdefinition(user_id"), plan
    for bad in ("Join", "CartesianProduct"):
        assert bad not in plan, plan


def test_adamic_adar_takeordered_no_cartesian(spark, sf_dir):
    """g_adamic_adar_topk: the pair build is an equi-join co-partitioned
    on the order key (never a cartesian), the weight sum has a partial
    stage, the global top-25 is TakeOrderedAndProject — and the two
    self-join sides share the weight subtree's exchanges (ReusedExchange
    in the final adaptive plan; projecting one side before the join
    canonicalized the subtrees apart and doubled the build, the r10
    review finding)."""
    from surge_spark.queries import all_queries

    df = all_queries()["g_adamic_adar_topk"](spark, sf_dir)
    df.collect()  # AQE applies exchange reuse at runtime
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject(limit=25" in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "partial_count" in plan or "partial count" in plan, plan
    assert "ReusedExchange" in plan, plan


def test_incremental_neardup_reuses_signature_exchange(spark, sf_dir):
    """d_incremental_neardup_md5: the side-membership predicates apply to
    the PAIR, keeping both band-join sides the identical signature
    subtree — AQE computes it once (ReusedExchange in the finalized
    plan). Filtering the join inputs instead would split the subtrees
    and double the signature build."""
    from surge_spark.queries import all_queries

    df = all_queries()["d_incremental_neardup_md5"](spark, sf_dir)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in plan
    assert "ReusedExchange" in plan, plan


def test_bloom_prefilter_fact_side_never_shuffles(spark, sf_dir):
    """j_bloom_prefilter_join: the whole point is that the fact scan tests
    bloom membership via stacked BROADCAST joins — the plan must read
    lineitem exactly once and carry it through four BroadcastHashJoins
    (3 bloom words + the exact left join) with ZERO hash-partitioning
    exchange on the fact side; the only exchanges are the tiny bloom
    build and the final single-row aggregate."""
    from surge_spark.queries import all_queries

    df = all_queries()["j_bloom_prefilter_join"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("BroadcastHashJoin") >= 4, plan
    assert plan.lower().count("lineitem.parquet") == 1, plan
    assert "SortMergeJoin" not in plan, plan


def test_cooccurrence_entries_materialize_pair_build(spark, sf_dir):
    """The r12 scan-amplification fixes, pinned: every consumer of the
    shared _part_cooccurrence kernel must read the pair set from the
    checkpoint (ExistingRDD), never re-derive it — the lazy form ran the
    wedge join + distinct once per consumer (16 parquet scans, 0
    ReusedExchange measured on assortativity before the fix). Parquet
    scans of lineitem in the final plan therefore stay at zero (the scan
    happened at checkpoint time), and the kmeans audit's janino
    materialize barrier is pinned the same way."""
    for name in (
        "g_degree_assortativity",
        "g_katz_unrolled",
        "g_local_clustering_topk",
        "sim_kmeans_step_audit",
    ):
        plan = _plan(spark, sf_dir, name)
        assert "ExistingRDD" in plan, name
        # every source scan happens at checkpoint time; any parquet scan
        # in the FINAL plan means a consumer re-derived the frame
        assert plan.count("Scan parquet") == 0, (
            name,
            plan.count("Scan parquet"),
        )


def test_hard_negative_mining_uses_window_group_limit(spark, sf_dir):
    """Per-cell top-5 must stay a WindowGroupLimit (partial per-partition
    top-k) — a global sort of the 8x corpus fan-out is the regression."""
    plan = _plan(spark, sf_dir, "sim_hard_negative_mining")
    assert "WindowGroupLimit" in plan


def test_gini_persists_count_frame(spark, sf_dir):
    """m_gini_coefficient's per-user count frame must stay persisted
    (InMemoryTableScan in the ranked aggregate's plan): unpersisted, the
    quantile action plus two prefix-sum consumers re-ran the events
    group-by 3x (warm sf0.1 7.0 -> 1.1 s measured)."""
    plan = _plan(spark, sf_dir, "m_gini_coefficient")
    assert "InMemoryTableScan" in plan or "InMemoryRelation" in plan


def test_phash_neardup_band_sides_share_fingerprint_checkpoint(spark, sf_dir):
    """mm_phash_neardup: the fingerprint frame is localCheckpointed, so
    the two slotted band-join sides and both verify sides read the
    checkpoint (ExistingRDD — the decode mapInPandas never re-runs: a
    lazy fingerprint frame would pay the image decode once per
    consumer), and the identical slotted subtrees share one exchange
    (ReusedExchange in the finalized plan). Documents parquet scans in
    the FINAL plan stay at zero — the scan happened at checkpoint
    time."""
    from surge_spark.queries import all_queries

    df = all_queries()["mm_phash_neardup"](spark, sf_dir)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in plan
    assert "ReusedExchange" in plan, plan
    assert "ExistingRDD" in plan, plan
    assert plan.lower().count("documents.parquet") == 0, plan


def test_ktruss_single_triangle_enumeration(spark, sf_dir):
    """g_ktruss_one_peel (r15 rewrite): ONE wedge-join triangle
    enumeration total — the survivor-support pass filters the
    checkpointed first-pass triangle frame with semi-joins instead of
    re-running _min_oriented_tris on the survivor graph (the old
    double enumeration was the catalog's slowest plan: 15.3 s sf0.1 /
    exponent 1.06; post-fix 9.4 s / 0.77). Both tris and surv are
    checkpointed, so the FINAL plan reads only ExistingRDDs (zero
    lineitem scans) and carries the three survivor semi-joins."""
    from surge_spark.queries import all_queries

    df = all_queries()["g_ktruss_one_peel"](spark, sf_dir)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in plan
    assert plan.lower().count("lineitem.parquet") == 0, plan
    assert plan.count("LeftSemi") >= 3, plan


def test_rrf_fusion_two_windows_one_exchange(spark, sf_dir):
    """sim_rrf_fusion_topk: the two per-query row_number windows (full
    and prefix ranks) plus the final rrf rank all partition by
    query_id, so the executed plan carries exactly ONE
    hashpartitioning(query_id) exchange — the ranks and the fusion
    re-sort in place, never re-shuffle. The query set broadcasts; the
    corpus side reaches the join without an exchange."""
    from surge_spark.queries import all_queries

    df = all_queries()["sim_rrf_fusion_topk"](spark, sf_dir)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in plan
    # the executed-plan string renders the tree twice (final + initial)
    # — count UNIQUE exchange plan_ids, not string occurrences
    import re

    ex_ids = set(
        re.findall(r"Exchange hashpartitioning\(query_id[^\[]*\[plan_id=(\d+)\]", plan)
    )
    assert len(ex_ids) <= 2, plan  # one per rendering at most
    # and no OTHER hash exchange key exists anywhere in the plan
    other = re.findall(r"Exchange hashpartitioning\((\w+)", plan)
    assert set(other) <= {"query_id"}, other
    assert "BroadcastNestedLoopJoin" in plan


def test_price_band_join_fact_never_shuffles(spark, sf_dir):
    """j_price_band_join: the 5-row literal band table broadcasts and
    the fact (events) side reaches the non-equi join scan-direct — no
    hashpartitioning exchange below the join; the only shuffle is the
    5-group final aggregate."""
    from surge_spark.queries import all_queries

    df = all_queries()["j_price_band_join"](spark, sf_dir)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in plan
    assert "BroadcastNestedLoopJoin" in plan, plan
    assert "hashpartitioning(cents" not in plan, plan


def test_keyset_pagination_takeordered_pushed_filter(spark, sf_dir):
    """w_keyset_pagination: the cursor predicate reaches the parquet
    scan (PushedFilters carries the o_custkey bound) and the page
    materializes via TakeOrderedAndProject — no global Sort exchange."""
    from surge_spark.queries import all_queries

    df = all_queries()["w_keyset_pagination"](spark, sf_dir)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan, plan
    assert "rangepartitioning" not in plan, plan
    assert "PushedFilters: [" in plan and "o_custkey" in plan.split(
        "PushedFilters: ["
    )[1][:200], plan
