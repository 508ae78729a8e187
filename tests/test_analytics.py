"""Invariant tests for the round-5 analytics/pipeline entries — properties
the value-hash oracle can't state (monotonicity, subset-ness, internal
consistency), plus hypothesis coverage for the weighted sampler."""

from __future__ import annotations

import pytest

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from surge_spark.operators import text as tx
from surge_spark.queries import all_queries

SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

weight_rows = st.lists(
    st.tuples(st.integers(0, 10_000), st.integers(-5, 500)),
    min_size=1,
    max_size=30,
    unique_by=lambda t: t[0],
)


@given(rows=weight_rows)
@settings(**SETTINGS)
@pytest.mark.slow  # r16 fast-tier split (>10 s; see pytest.ini)
def test_weighted_sample_properties(spark, rows):
    """A-ES sampling: output is a subset of the positive-weight rows, sized
    min(k, #positive), and invariant under input row order (the score is
    keyed, not positional)."""
    k = 5
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["id", "w"]).astype("int64")
    )
    out = tx.weighted_sample(df, "id", "w", k=k).collect()
    positive = {i for i, w in rows if w > 0}
    assert {r.id for r in out} <= positive
    assert len(out) == min(k, len(positive))
    rev = spark.createDataFrame(
        pd.DataFrame(list(reversed(rows)), columns=["id", "w"]).astype("int64")
    )
    out2 = tx.weighted_sample(rev, "id", "w", k=k).collect()
    assert {r.id for r in out} == {r.id for r in out2}


def test_histogram_percentiles_monotone_within_bins(spark, sf_dir):
    """p50 ≤ p90 ≤ p99, and each estimate lies inside its covering bin."""
    rows = {r.p: r for r in all_queries()["a_histogram_percentiles"](spark, sf_dir).collect()}
    assert set(rows) == {0.5, 0.9, 0.99}
    assert rows[0.5].estimate <= rows[0.9].estimate <= rows[0.99].estimate
    for r in rows.values():
        assert r.bin * 1000 <= r.estimate <= (r.bin + 1) * 1000


def test_funnel_counts_monotone(spark, sf_dir):
    """Each funnel stage can only lose users: n_users ≥ n_view ≥
    n_click_after ≥ n_purchase_after, and the rate is consistent."""
    r = all_queries()["m_funnel_conversion"](spark, sf_dir).collect()[0]
    assert r.n_users >= r.n_view >= r.n_click_after >= r.n_purchase_after >= 0
    if r.n_view:
        assert abs(r.full_funnel_rate - round(r.n_purchase_after / r.n_view, 6)) < 1e-9


def test_inverted_index_postings_consistent(spark, sf_dir):
    """df_docs equals the posting-list length, postings are sorted unique,
    and every df honors the band."""
    rows = all_queries()["t_inverted_index"](spark, sf_dir).collect()
    assert rows, "band emptied the index"
    from surge_spark.io import load_table

    n_docs = load_table(spark, sf_dir, "documents").count()
    for r in rows:
        assert r.df_docs == len(r.postings)
        assert r.postings == sorted(set(r.postings))
        assert 2 <= r.df_docs <= 0.8 * n_docs


def test_retention_day0_equals_cohort_size(spark, sf_dir):
    """Offset-0 count per cohort equals the cohort's member count (everyone
    is active on their own first day)."""
    from pyspark.sql import functions as F

    from surge_spark.io import load_table

    rows = all_queries()["m_retention_cohorts"](spark, sf_dir).collect()
    day0 = {r.cohort_day: r.n_users for r in rows if r.day_offset == 0}
    e = load_table(spark, sf_dir, "events")
    cohorts = (
        e.groupBy("user_id")
        .agg(F.date_trunc("day", F.min("ts")).alias("cohort_day"))
        .groupBy("cohort_day")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    )
    for c in cohorts:
        assert day0.get(c.cohort_day) == c.n, c


def test_doulion_estimate_within_5pct_of_exact(spark, sf_dir):
    """DOULION's 1/p^3-scaled estimate tracks the exact global triangle
    count (dense co-occurrence graphs concentrate tightly; measured
    0.03-0.1% here — 5% is the safety margin, not the observed error)."""
    from pyspark.sql import functions as F

    from surge_spark.io import load_table

    est = all_queries()["g_triangle_count_sampled"](spark, sf_dir).collect()[0]
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    a = li.withColumnsRenamed({"l_partkey": "src"})
    b = li.withColumnsRenamed({"l_partkey": "dst"})
    edges = (
        a.join(b, "l_orderkey")
        .where(F.col("src") < F.col("dst"))
        .select("src", "dst")
        .distinct()
    )
    ab = edges
    bc = edges.withColumnsRenamed({"src": "bsrc", "dst": "bdst"})
    ac = edges.withColumnsRenamed({"src": "asrc", "dst": "adst"})
    exact = (
        ab.join(bc, F.col("dst") == F.col("bsrc"))
        .join(ac, (F.col("asrc") == F.col("src")) & (F.col("adst") == F.col("bdst")))
        .count()
    )
    assert exact > 0
    assert abs(est.est_triangles - exact) / exact <= 0.05
    assert est.sampled_edges > 0 and est.sampled_triangles > 0


def test_distributed_prefix_sum_exact_vs_driver(spark):
    """distributed_prefix_sum == a driver-side running sum in the same
    order, regardless of boundary placement: heavy ties (few distinct
    shard-key values, so quantile boundaries ARE tie values), ascending
    and descending, and a shard count larger than the distinct-key count
    (empty shards)."""
    import random

    from pyspark.sql import functions as F

    from surge_spark.operators.text import distributed_prefix_sum

    rng = random.Random(7)
    rows = [
        (i, rng.choice([1.0, 2.0, 2.0, 3.0, 5.0]), rng.randint(0, 9))
        for i in range(500)
    ]
    df = spark.createDataFrame(rows, "id long, key double, v long")

    for descending in (False, True):
        got = {
            r.id: r.cum
            for r in distributed_prefix_sum(
                df,
                "v",
                "key",
                [F.col("key").desc() if descending else F.col("key"), F.col("id")],
                descending=descending,
                n_shards=16,
            ).collect()
        }
        ordered = sorted(rows, key=lambda t: (-t[1] if descending else t[1], t[0]))
        run, want = 0, {}
        for i, _, v in ordered:
            run += v
            want[i] = run
        assert got == want, descending


def test_bloom_prefilter_no_false_negatives(spark, sf_dir):
    """The bloom pre-filter may pass non-qualifying rows (false positives,
    reported) but must NEVER drop a qualifying one: n_true from the
    bloom-survivor join equals the exact semi-join count, and the revenue
    matches the plain filtered join to the cent."""
    from pyspark.sql import functions as F

    from surge_spark.io import load_table

    row = all_queries()["j_bloom_prefilter_join"](spark, sf_dir).collect()[0]
    part = load_table(spark, sf_dir, "part")
    li = load_table(spark, sf_dir, "lineitem")
    promo = part.where(F.col("p_type") == "PROMO").select("p_partkey")
    exact = (
        li.join(promo, li.l_partkey == promo.p_partkey)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("rev"),
        )
        .collect()[0]
    )
    assert row.n_true == exact.n
    # the two sums aggregate identical doubles in different partial
    # orders; exact equality after round(.,2) is latently half-cent flaky
    assert abs(row.promo_revenue - exact.rev) <= 0.011
    assert row.n_bloom_pass == row.n_true + row.n_false_pos
    assert row.n_false_pos >= 0


def test_cusum_fold_invariants():
    """CUSUM handler: a constant stream never alarms (dev=0 stays under
    slack); a sustained +10 step from the baseline alarms within two
    steps and resets the positive side."""
    from surge_spark.operators.eventsourcing import cusum_handle_event

    st = None
    for _ in range(10):
        st = cusum_handle_event(st, {"user_id": 1, "value": 3.0})
    assert st["n_alarms"] == 0 and st["s_pos"] == 0.0 and st["s_neg"] == 0.0

    st = cusum_handle_event(None, {"user_id": 1, "value": 0.0})
    st = cusum_handle_event(st, {"user_id": 1, "value": 10.0})  # s_pos 9.5 > 5
    assert st["n_alarms"] == 1 and st["s_pos"] == 0.0


def test_hits_scores_normalized(spark, sf_dir):
    """HITS: both sides max-normalize, so each kind's rank-1 score is
    exactly 1.0 and every score sits in (0, 1]."""
    rows = all_queries()["g_hits_unrolled"](spark, sf_dir).collect()
    kinds = {r.kind for r in rows}
    assert kinds == {"hub", "auth"}
    for kind in kinds:
        ks = [r for r in rows if r.kind == kind]
        assert max(r.score for r in ks) == 1.0
        assert all(0 < r.score <= 1.0 for r in ks)
        assert sorted(r.rank for r in ks) == list(range(1, len(ks) + 1))


def test_burstiness_bounded(spark, sf_dir):
    """Goh-Barabási burstiness is bounded in [-1, 1) for positive gaps."""
    rows = all_queries()["m_burstiness"](spark, sf_dir).collect()
    assert rows
    assert all(-1.0 <= r.burstiness < 1.0 for r in rows)


def test_cms_never_underestimates(spark, sf_dir):
    """Count-Min's one-sided error guarantee: estimate >= exact count for
    every audited term (min over rows can only overcount on collisions)."""
    rows = all_queries()["a_cms_heavy_hitters"](spark, sf_dir).collect()
    assert rows
    assert all(r.overestimate >= 0 for r in rows)
    assert all(r.cms_estimate == r.exact_cnt + r.overestimate for r in rows)


def test_lsh_recall_found_is_subset(spark, sf_dir):
    """The recall audit's detections are a subset of ground truth by
    construction (identical exact-Jaccard verification on both paths)."""
    row = all_queries()["d_lsh_recall_audit"](spark, sf_dir).collect()[0]
    assert row.n_found <= row.n_true
    assert row.n_missed == row.n_true - row.n_found
    assert 0 <= row.recall_ppm <= 1_000_000


@given(
    edges=st.lists(
        st.tuples(st.integers(0, 12), st.integers(0, 12)).filter(
            lambda t: t[0] != t[1]
        ),
        max_size=25,
    ),
)
@settings(**SETTINGS)
@pytest.mark.slow  # r16 fast-tier split (>10 s; see pytest.ini)
def test_min_label_rounds_is_min_within_3_hops(spark, edges):
    """_min_label_rounds(3): every node's label equals the minimum node id
    reachable within <= 3 hops on the symmetric graph — checked against a
    pure-Python BFS on random graphs (the helper is now shared by
    d_fuzzy_dedup_clusters and d_semdedup_keepers; this pins its
    semantics independently of either entry's pipeline)."""
    from pyspark.sql import functions as F

    from surge_spark.queries.dedup import _min_label_rounds

    nodes = sorted({n for e in edges for n in e} | {0})
    adj = {n: set() for n in nodes}
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    expected = {}
    for n in nodes:
        frontier, seen = {n}, {n}
        for _ in range(3):
            frontier = {m for f in frontier for m in adj[f]} - seen
            seen |= frontier
        expected[n] = min(seen)

    sym = spark.createDataFrame(
        [(a, b) for a, b in edges] + [(b, a) for a, b in edges] or [(0, 0)],
        "a long, b long",
    )
    seed = spark.createDataFrame(
        [(n, n) for n in nodes], "id long, lbl long"
    )
    got = {
        r.id: r.lbl for r in _min_label_rounds(sym, seed, rounds=3).collect()
    }
    assert got == expected


@given(
    devs=st.lists(
        st.floats(-20, 20, allow_nan=False, allow_infinity=False), max_size=40
    )
)
@settings(max_examples=50, deadline=None)
def test_cusum_step_state_invariants(devs):
    """cusum_step: both sides stay in [0, threshold] AFTER each step
    (crossers reset to 0), alarms only ever increase, and a huge
    deviation always alarms immediately."""
    from surge_spark.operators.eventsourcing import cusum_step

    s_pos = s_neg = 0.0
    alarms = 0
    for d in devs:
        prev = alarms
        s_pos, s_neg, alarms = cusum_step(s_pos, s_neg, alarms, d)
        assert 0.0 <= s_pos <= 5.0 and 0.0 <= s_neg <= 5.0
        assert alarms >= prev
    _, _, a2 = cusum_step(0.0, 0.0, 0, 100.0)
    assert a2 == 1


def test_apdex_score_bounds_and_identity(spark, sf_dir):
    """Apdex invariants the hash oracle can't state: satisfied + tolerating
    <= total per type, and the integer-permille score equals the textbook
    (sat + tol/2)/total formula within one permille unit (floor division
    never rounds up)."""
    rows = all_queries()["m_apdex_score"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r.satisfied + r.tolerating <= r.total
        assert 0 <= r.apdex_x1000 <= 1000
        exact = (r.satisfied + r.tolerating / 2.0) / r.total * 1000
        assert exact - 1 < r.apdex_x1000 <= exact


def test_markov_prediction_accuracy_invariants(spark, sf_dir):
    """(a) the five event types have DISTINCT FIRST LETTERS — the Spark
    side's max_by(struct(cnt, -ascii)) tiebreak equals the oracle's full
    lexicographic ORDER BY only under that premise, so it must be pinned,
    not assumed; (b) accuracy beats uniform chance being impossible is not
    guaranteed, but n_correct <= n_transitions and ppm is exact floor."""
    from surge_spark.io import load_table

    types = [
        r.event_type
        for r in load_table(spark, sf_dir, "events")
        .select("event_type")
        .distinct()
        .collect()
    ]
    firsts = [t[0] for t in types]
    assert len(set(firsts)) == len(firsts), types
    rows = all_queries()["m_markov_prediction_accuracy"](spark, sf_dir).collect()
    assert rows and {r.from_type for r in rows} <= set(types)
    for r in rows:
        assert 0 <= r.n_correct <= r.n_transitions
        assert r.accuracy_ppm == r.n_correct * 1_000_000 // r.n_transitions
        assert r.predicted in types


def test_zipf_slope_is_negative(spark, sf_dir):
    """Frequency is non-increasing in rank BY CONSTRUCTION (rank orders by
    count desc), so the log-log least-squares slope over >= 2 distinct
    frequencies must be <= 0; r2 lives in [0, 1]."""
    r = all_queries()["t_zipf_slope"](spark, sf_dir).collect()[0]
    assert r.n_terms >= 2
    assert r.zipf_slope <= 0
    assert 0.0 <= r.zipf_r2 <= 1.0


def test_centroid_drift_cosine_bounds(spark, sf_dir):
    """Cauchy-Schwarz: the centroid cosine is in [-1, 1] (a hair of
    round-6 slack), and both halves are populated wherever a row ships."""
    rows = all_queries()["sim_centroid_drift"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert -1.000001 <= r.centroid_cosine <= 1.000001
        assert r.n_even > 0 and r.n_odd > 0


def test_minhash_estimate_error_audit_consistency(spark, sf_dir):
    """The audit's pairs are exactly the md5-LSH candidate pairs that the
    verified md5 entry draws from: every pair the production md5 entry
    ships (jaccard >= 0.5) must appear in the audit with the SAME exact
    jaccard; estimates and truths live in [0, 1]; abs_err is their
    rounded gap."""
    q = all_queries()
    audit = {
        (r.id_a, r.id_b): r
        for r in q["d_minhash_estimate_error_audit"](spark, sf_dir).collect()
    }
    assert audit
    for r in audit.values():
        assert 0.0 <= r.est_jaccard <= 1.0
        assert 0.0 < r.true_jaccard <= 1.0
        assert abs(r.abs_err - round(abs(r.est_jaccard - r.true_jaccard), 6)) < 1e-9
        assert r.n_match == round(r.est_jaccard * 64)
    shipped = q["d_minhash_lsh_neardup_md5"](spark, sf_dir).collect()
    assert shipped
    for s in shipped:
        a = audit.get((s.id_a, s.id_b))
        assert a is not None and abs(a.true_jaccard - s.jaccard) < 1e-9


def test_dup_cluster_histogram_mass_conservation(spark, sf_dir):
    """sum(cluster_size * n_clusters) must equal the corpus size — the
    histogram partitions every document exactly once."""
    from surge_spark.io import load_table

    rows = all_queries()["d_dup_cluster_size_histogram"](spark, sf_dir).collect()
    n_docs = load_table(spark, sf_dir, "documents").count()
    assert sum(r.n_docs for r in rows) == n_docs
    assert all(r.n_docs == r.cluster_size * r.n_clusters for r in rows)
    assert any(r.cluster_size > 1 for r in rows)  # the prefix-60 channel


def test_bm25_prf_expansion_properties(spark, sf_dir):
    """PRF invariants: stage-2 hits between 1 and 6 terms (3 query + 3
    expansion), positive scores, ranks contiguous from 1, and the result
    differs from the base search in scores (the expansion terms add
    weight — equal score vectors would mean the feedback stage matched
    nothing, impossible on this corpus where every token is shared)."""
    q = all_queries()
    prf = q["t_bm25_prf_search"](spark, sf_dir).collect()
    base = {r.id: r.score for r in q["t_bm25_search"](spark, sf_dir).collect()}
    assert [r.rank for r in sorted(prf, key=lambda r: r.rank)] == list(
        range(1, len(prf) + 1)
    )
    for r in prf:
        assert 1 <= r.n_hit_terms <= 6
        assert r.score > 0
    assert any(
        r.id not in base or abs(r.score - base[r.id]) > 1e-9 for r in prf
    )


def test_gini_matches_exact_python_recompute(spark, sf_dir):
    """The distributed-prefix-sum rank path must equal the textbook exact
    formula computed in plain Python over the same per-user counts — this
    pins the sharded rank against a single-process ground truth (the
    value-hash oracle already pins DuckDB; this pins the formula)."""
    from surge_spark.io import load_table
    import pyspark.sql.functions as F

    cnt = (
        load_table(spark, sf_dir, "events")
        .where(F.col("user_id").isNotNull())
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    xs = sorted((r.n, r.user_id) for r in cnt)
    n = len(xs)
    tot = sum(x for x, _ in xs)
    rank_weighted = sum(i * x for i, (x, _) in enumerate(xs, start=1))
    expected = round((2.0 * rank_weighted - (n + 1) * tot) / (float(n) * tot), 6)
    r = all_queries()["m_gini_coefficient"](spark, sf_dir).collect()[0]
    assert r.n_users == n and r.total_events == tot
    assert r.gini == expected
    assert 0.0 <= r.gini < 1.0


def test_benford_mass_conservation(spark, sf_dir):
    """Digits cover 1..9 only, counts sum to the positive-price order
    count, observed_ppm is the exact floor share, and the literal expected
    table itself sums to exactly 1e6 (so deviation_ppm is a true residual,
    not an artifact of a mis-transcribed constant)."""
    from surge_spark.queries.eventsourcing import _BENFORD_PPM

    assert sum(_BENFORD_PPM.values()) == 1_000_000
    rows = all_queries()["m_benford_first_digit"](spark, sf_dir).collect()
    assert {r.digit for r in rows} <= set(range(1, 10))
    total = sum(r.n for r in rows)
    for r in rows:
        assert r.observed_ppm == r.n * 1_000_000 // total
        assert r.expected_ppm == _BENFORD_PPM[r.digit]
        assert r.deviation_ppm == r.observed_ppm - r.expected_ppm


def test_autocorr_daily_bounds(spark, sf_dir):
    """All 7 lags present; Pearson r in [-1, 1]; every lag has fewer pairs
    than there are days (a lag consumes at least k days of the series).
    n_days comes from the daily aggregate ITSELF — inferring it from pair
    counts assumes a gap-free series, which regenerated testdata need not
    provide (review-pass finding)."""
    import pyspark.sql.functions as F

    from surge_spark.io import load_table

    n_days = (
        load_table(spark, sf_dir, "events")
        .select(F.expr("unix_millis(ts) div 86400000").alias("d"))
        .distinct()
        .count()
    )
    rows = {r.lag_days: r for r in all_queries()["m_autocorr_daily"](spark, sf_dir).collect()}
    assert rows and set(rows) <= set(range(1, 8))
    for k, r in rows.items():
        if r.autocorr is not None:  # constant series -> NULL corr
            assert -1.0 <= r.autocorr <= 1.0
        # each pair is keyed by a distinct later day, so pairs < days
        # regardless of gaps (the only density-free bound)
        assert 0 < r.n_pairs < n_days


def test_basket_lift_identities(spark, sf_dir):
    """Pair canonicalization (type_a < type_b), co-occurrence bounded by
    both margins, and every shipped ppm channel re-derivable from the
    integer counts on the same row (floor division, exact)."""
    rows = all_queries()["a_basket_lift"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.type_a < r.type_b
        assert 0 < r.n_both <= min(r.n_a, r.n_b)
        assert r.confidence_ab_ppm == r.n_both * 1_000_000 // r.n_a
        assert r.confidence_ba_ppm == r.n_both * 1_000_000 // r.n_b


def test_basket_lift_decimal_equals_bigint(spark, sf_dir):
    """The DECIMAL(38,0) escape hatch ships byte-identical rows wherever
    the bigint channel is defined (r12 task 5) — same schema, same
    values, only the intermediate width differs."""
    q = all_queries()
    big = q["a_basket_lift"](spark, sf_dir)
    dec = q["a_basket_lift_decimal"](spark, sf_dir)
    assert big.schema == dec.schema
    key = lambda r: (r.type_a, r.type_b)  # noqa: E731
    assert sorted(map(tuple, big.collect())) == sorted(
        map(tuple, dec.collect())
    )


def test_basket_lift_overflow_bound(spark):
    """The documented ~3e6-user bound, constructed: drive the SHARED
    channel constants (the exact production expressions) at n_users just
    past 2^63/(n_both*1e6). The bigint lift channel RAISES under ANSI
    (never silently wrong); the decimal channel returns the exact
    Python-int value."""
    import pytest

    from surge_spark.queries.relational import (
        _BASKET_CHANNELS_BIGINT,
        _BASKET_CHANNELS_DECIMAL,
    )
    from pyspark.sql import functions as F

    n_both, n_a, n_b = 1_000_000, 2_000_000, 2_000_000
    n_users = 2**63 // (n_both * 1_000_000) + 1  # first overflowing count
    row = spark.createDataFrame(
        [(n_both, n_a, n_b, n_users)],
        "n_both long, n_a long, n_b long, n_users long",
    )
    with pytest.raises(Exception, match="(?i)overflow|arithmetic"):
        row.select(F.expr(_BASKET_CHANNELS_BIGINT[2]).alias("lift")).collect()
    got = row.select(
        F.expr(_BASKET_CHANNELS_DECIMAL[2]).alias("lift")
    ).collect()[0].lift
    assert got == n_both * n_users * 1_000_000 // (n_a * n_b)
    # and below the bound the two channels agree exactly
    row2 = spark.createDataFrame(
        [(n_both, n_a, n_b, n_users - 1)],
        "n_both long, n_a long, n_b long, n_users long",
    )
    vals = row2.select(
        F.expr(_BASKET_CHANNELS_BIGINT[2]).alias("b"),
        F.expr(_BASKET_CHANNELS_DECIMAL[2]).alias("d"),
    ).collect()[0]
    assert vals.b == vals.d


def test_wide_int_helper_renderings():
    """The shared wide-integer channel helper (r14 task 4) renders all
    four (engine × channel) variants; every decimal twin builds its
    widened operands through it."""
    from surge_spark.queries.relational import wide_int

    assert wide_int("x") == "CAST(x AS DECIMAL(38,0))"
    assert wide_int("x", duck=True) == "CAST(x AS HUGEINT)"
    assert wide_int("x", wide=False) == "x"
    assert wide_int("x", duck=True, wide=False) == "x"


@pytest.mark.slow  # r16 fast-tier split (>10 s; see pytest.ini)
def test_rank_stats_decimal_twins_equal_bigint(spark, sf_dir):
    """The three n³-channel stats entries' wide_int twins (r14 task 4)
    ship values identical to their bigint originals wherever the bigint
    channel is defined — the decimal channel only changes intermediate
    width, never the shipped floats/counts."""
    q = all_queries()

    big = q["a_spearman_rho"](spark, sf_dir).collect()[0]
    dec = q["a_spearman_rho_decimal"](spark, sf_dir).collect()[0]
    assert (big.n, big.spearman_rho) == (dec.n, dec.spearman_rho)

    big = q["a_mann_whitney_u"](spark, sf_dir).collect()[0]
    dec = q["a_mann_whitney_u_decimal"](spark, sf_dir).collect()[0]
    assert (big.n_a, big.n_b, big.z_score) == (dec.n_a, dec.n_b, dec.z_score)

    big = {r.n_name: r for r in q["a_gini_by_group"](spark, sf_dir).collect()}
    dec = {
        r.n_name: r
        for r in q["a_gini_by_group_decimal"](spark, sf_dir).collect()
    }
    assert set(big) == set(dec) and big
    for name, b in big.items():
        d = dec[name]
        assert (b.n, b.s_x, b.gini) == (d.n, d.s_x, d.gini)


def test_theil_decomposition_additivity(spark, sf_dir):
    """Theil's defining property: total = between + within (exact in
    math; float tolerance here because the three sums are computed
    independently and each rounds to 4). Also the non-negativity every
    Theil component satisfies."""
    r = all_queries()["a_theil_decomposition"](spark, sf_dir).collect()[0]
    assert r.n > 0 and r.total_cents > 0
    for v in (r.theil_total, r.theil_between, r.theil_within):
        assert v is not None and v >= -1e-4
    assert abs(r.theil_total - (r.theil_between + r.theil_within)) < 5e-4, r


def test_weighted_median_contract(spark, sf_dir):
    """The weighted median must be an actual data value whose cumulative
    weight reaches half the total — re-derived per group from raw rows
    in pandas (an independent formulation of the same rule)."""
    rows = all_queries()["a_weighted_median"](spark, sf_dir).collect()
    assert rows
    import duckdb

    con = duckdb.connect()
    li = con.read_parquet(f"{sf_dir}/lineitem.parquet")  # noqa: F841
    for r in rows:
        got = con.execute(
            """
            WITH w AS (
              SELECT CAST(round(l_extendedprice * 100) AS BIGINT) AS cents,
                     CAST(round(l_quantity) AS BIGINT) AS wt
              FROM li WHERE l_returnflag = ?
            )
            SELECT min(cents) FROM (
              SELECT cents, sum(wt) OVER (ORDER BY cents
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cw,
                sum(wt) OVER () AS tw
              FROM w
            ) WHERE 2 * cw >= tw
            """,
            [r.l_returnflag],
        ).fetchone()[0]
        assert r.weighted_median_cents == got, (r.l_returnflag, got, r)


def test_hard_negative_mining_contract(spark, sf_dir):
    """Per centroid: at most 5 rows with contiguous ranks, cosine
    non-increasing in rank, and no row mines a vector from the centroid's
    own cell (that would be a positive, not a negative)."""
    rows = all_queries()["sim_hard_negative_mining"](spark, sf_dir).collect()
    assert rows
    by_cell: dict[int, list] = {}
    for r in rows:
        assert r.cell != r.assigned_cell
        assert -1.000001 <= r.cosine <= 1.000001
        by_cell.setdefault(r.cell, []).append(r)
    for cell, rs in by_cell.items():
        rs.sort(key=lambda r: r.rank)
        assert [r.rank for r in rs] == list(range(1, len(rs) + 1))
        assert len(rs) <= 5
        for x, y in zip(rs, rs[1:]):
            assert x.cosine >= y.cosine


def test_readability_matches_python_re(spark, sf_dir):
    """The regexp word/syllable counters must agree with Python's re over
    the same corpus — pins Java-regex/RE2 parity on the two character
    classes against a third engine (the value oracle already pins DuckDB)."""
    import re

    from surge_spark.io import load_table

    docs = load_table(spark, sf_dir, "documents").select("source", "text").collect()
    agg: dict[str, list[int]] = {}
    for r in docs:
        wd = len(re.findall(r"[a-z]+", r.text))
        sy = len(re.findall(r"[aeiouy]+", r.text))
        if wd > 0:
            a = agg.setdefault(r.source, [0, 0, 0])
            a[0] += 1
            a[1] += wd
            a[2] += sy
    rows = all_queries()["t_readability_flesch"](spark, sf_dir).collect()
    assert {r.source for r in rows} == set(agg)
    for r in rows:
        n, wd, sy = agg[r.source]
        assert (r.n_docs, r.total_words, r.total_syllables) == (n, wd, sy)


def test_rake_keyword_identities(spark, sf_dir):
    """degree >= freq (each phrase containing a word has length >= 1, so
    the degree sum dominates the count), score is the exact floor ratio,
    and no stopword can ever be a keyword (stopwords delimit phrases)."""
    from surge_spark.queries.text import _RAKE_STOPWORDS

    rows = all_queries()["t_rake_keywords"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.word not in _RAKE_STOPWORDS
        assert r.degree >= r.freq > 0
        assert r.rake_score_x1000 == r.degree * 1000 // r.freq
        assert r.rake_score_x1000 >= 1000


def test_part_jaccard_identities(spark, sf_dir):
    """Set-algebra bounds the hash oracle can't state: intersection within
    both margins, ppm the exact floor of common/union, and the canonical
    pa < pb pair order."""
    rows = all_queries()["g_part_jaccard_topk"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.pa < r.pb
        assert 0 < r.n_common <= min(r.n_a, r.n_b)
        union = r.n_a + r.n_b - r.n_common
        assert r.jaccard_ppm == r.n_common * 1_000_000 // union
        assert r.jaccard_ppm <= 1_000_000


def test_bfs_layers_match_python_bfs(spark, sf_dir):
    """The unrolled frontier must equal a plain-Python BFS over the same
    edge set (layer = min hop distance, seeds = parts % 97 == 0) — pins
    the anti-join frontier algebra against an imperative ground truth."""
    from collections import deque

    from surge_spark.io import load_table

    edges = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
        .collect()
    )
    by_part: dict[int, set[int]] = {}
    by_order: dict[int, set[int]] = {}
    for r in edges:
        by_part.setdefault(r.l_partkey, set()).add(r.l_orderkey)
        by_order.setdefault(r.l_orderkey, set()).add(r.l_partkey)
    dist: dict[tuple[str, int], int] = {}
    q = deque()
    for p in by_part:
        if p % 97 == 0:
            dist[("part", p)] = 0
            q.append(("part", p))
    while q:
        kind, node = q.popleft()
        d = dist[(kind, node)]
        if d >= 4:
            continue
        nbrs = (
            [("order", o) for o in by_part[node]]
            if kind == "part"
            else [("part", p) for p in by_order[node]]
        )
        for nb in nbrs:
            if nb not in dist:
                dist[nb] = d + 1
                q.append(nb)
    expected: dict[tuple[str, int], int] = {}
    for (kind, _), d in dist.items():
        expected[(kind, d)] = expected.get((kind, d), 0) + 1
    rows = all_queries()["g_bfs_layers"](spark, sf_dir).collect()
    got = {(r.kind, r.distance): r.n_nodes for r in rows}
    assert got == {k: v for k, v in expected.items() if v > 0}


def test_first_last_value_consistency(spark, sf_dir):
    """first/last must equal the min_by/max_by over the same total order
    (two independent Spark paths — window frame vs aggregate), and
    second_type is NULL exactly for single-event users."""
    import pyspark.sql.functions as F

    from surge_spark.io import load_table

    e = load_table(spark, sf_dir, "events").where(F.col("user_id").isNotNull())
    agg = {
        r.user_id: r
        for r in e.groupBy("user_id")
        .agg(
            F.min_by("event_type", F.struct("ts", "event_id")).alias("f"),
            F.max_by("event_type", F.struct("ts", "event_id")).alias("l"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()
    }
    rows = all_queries()["w_first_last_value"](spark, sf_dir).collect()
    assert {r.user_id for r in rows} == set(agg)
    for r in rows:
        a = agg[r.user_id]
        assert (r.first_type, r.last_type, r.n_events) == (a.f, a.l, a.n)
        assert (r.second_type is None) == (a.n == 1)


def test_stats_merge_equals_direct(spark, sf_dir):
    """The shipped merge property: the two-level rollup row must be
    IDENTICAL to the single-pass row, and the bucket rows must sum to it."""
    rows = all_queries()["o_incremental_stats_merge"](spark, sf_dir).collect()
    merged = next(r for r in rows if r.level == "merged")
    direct = next(r for r in rows if r.level == "direct")
    buckets = [r for r in rows if r.level == "bucket"]
    assert (merged.n, merged.sum_cents, merged.min_cents, merged.max_cents) == (
        direct.n,
        direct.sum_cents,
        direct.min_cents,
        direct.max_cents,
    )
    assert sum(b.n for b in buckets) == merged.n
    assert sum(b.sum_cents for b in buckets) == merged.sum_cents
    assert min(b.min_cents for b in buckets) == merged.min_cents
    assert max(b.max_cents for b in buckets) == merged.max_cents


def test_kaplan_meier_matches_python_product(spark, sf_dir):
    """The exp-sum-of-logs path must equal the direct Python product of
    (1 - d_i/n_i) over the same per-user durations (within the round-6
    unit), and the curve must be monotone: survival non-increasing,
    n_at_risk strictly decreasing in duration."""
    import pyspark.sql.functions as F

    from surge_spark.io import load_table

    days = (
        load_table(spark, sf_dir, "events")
        .where(F.col("user_id").isNotNull())
        .select("user_id", F.expr("unix_millis(ts) div 86400000").alias("d"))
    )
    pu = days.groupBy("user_id").agg(F.min("d").alias("f"), F.max("d").alias("l")).collect()
    tmax = max(r.l for r in pu)
    durs = sorted((r.l - r.f + 1, r.l == tmax) for r in pu)
    from collections import Counter

    deaths = Counter(d for d, cens in durs if not cens)
    totals = Counter(d for d, _ in durs)
    n_at_risk = len(durs)
    surv = 1.0
    expected = {}
    for d in sorted(totals):
        term = 1.0 - deaths.get(d, 0) / n_at_risk
        surv *= term
        expected[d] = (n_at_risk, deaths.get(d, 0), surv)
        n_at_risk -= totals[d]
    rows = sorted(
        all_queries()["m_kaplan_meier"](spark, sf_dir).collect(),
        key=lambda r: r.duration_days,
    )
    assert {r.duration_days for r in rows} == set(expected)
    for r in rows:
        nar, dth, s = expected[r.duration_days]
        assert (r.n_at_risk, r.n_deaths) == (nar, dth)
        assert abs(r.survival - s) < 2e-6
    for x, y in zip(rows, rows[1:]):
        assert x.survival >= y.survival
        assert x.n_at_risk > y.n_at_risk


def test_chi_square_cell_identities(spark, sf_dir):
    """The margins are re-derivable from the shipped cells themselves, and
    every expected/contrib value is the exact one-division recompute from
    those integer margins (rounded the same way)."""
    rows = all_queries()["a_chi_square_independence"](spark, sf_dir).collect()
    assert rows
    r_tot: dict[str, int] = {}
    c_tot: dict[int, int] = {}
    for r in rows:
        r_tot[r.event_type] = r_tot.get(r.event_type, 0) + r.observed
        c_tot[r.dow] = c_tot.get(r.dow, 0) + r.observed
    total = sum(r.observed for r in rows)
    for r in rows:
        e = r_tot[r.event_type] * c_tot[r.dow] / total
        assert r.expected == round(e, 4)
        assert abs(r.chi2_contrib - (r.observed - e) ** 2 / e) < 2e-6


def test_assortativity_matches_python_corr(spark, sf_dir):
    """Newman's r recomputed imperatively over the collected pair set
    (directed both ways, Pearson over endpoint degrees) must agree with
    the distributed corr within round-6 noise; r lives in [-1, 1]."""
    import statistics

    import pyspark.sql.functions as F

    from surge_spark.io import load_table

    d = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
        .collect()
    )
    by_order: dict[int, list[int]] = {}
    for r in d:
        by_order.setdefault(r.l_orderkey, []).append(r.l_partkey)
    pairs = set()
    for parts in by_order.values():
        ps = sorted(set(parts))
        for i, pa in enumerate(ps):
            for pb in ps[i + 1 :]:
                pairs.add((pa, pb))
    from collections import Counter

    deg = Counter()
    for pa, pb in pairs:
        deg[pa] += 1
        deg[pb] += 1
    xs, ys = [], []
    for pa, pb in pairs:
        xs += [deg[pa], deg[pb]]
        ys += [deg[pb], deg[pa]]
    expected = statistics.correlation(xs, ys)
    row = all_queries()["g_degree_assortativity"](spark, sf_dir).collect()[0]
    assert row.n_edges == len(pairs)
    assert row.n_nodes == len(deg)
    assert -1.0 <= row.assortativity <= 1.0
    assert abs(row.assortativity - expected) < 2e-6


def test_upcast_fold_identities(spark, sf_dir):
    """Version counts partition each user's events exactly, and the
    upcast total equals the two-branch recompute through an independent
    Spark path (raw parity split, no JSON)."""
    import pyspark.sql.functions as F

    from surge_spark.io import load_table

    e = load_table(spark, sf_dir, "events").where(F.col("user_id").isNotNull())
    k = F.get_json_object("props", "$.k").cast("long")
    chk = {
        r.user_id: r
        for r in e.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.when(F.col("event_id") % 2 == 0, k).otherwise(k * 100)).alias(
                "cents"
            ),
        )
        .collect()
    }
    rows = all_queries()["es_upcast_fold"](spark, sf_dir).collect()
    assert {int(r.aggregate_id) for r in rows} == set(chk)
    for r in rows:
        c = chk[int(r.aggregate_id)]
        assert r.n_v1 + r.n_v2 == c.n
        assert r.total_cents == c.cents


def test_kmeans_step_audit_bounds(spark, sf_dir):
    """All populated cells appear with membership summing to the corpus
    size; drift cosine is a valid cosine; new_norm positive."""
    from surge_spark.io import load_table

    n_vecs = load_table(spark, sf_dir, "embeddings").count()
    rows = all_queries()["sim_kmeans_step_audit"](spark, sf_dir).collect()
    assert rows
    assert sum(r.n_members for r in rows) == n_vecs
    for r in rows:
        assert 0 <= r.cell <= 7
        assert r.new_norm > 0
        assert -1.000001 <= r.drift_cosine <= 1.000001


def test_katz_identities(spark, sf_dir):
    """katz_x4 is the exact integer 2*deg + paths2 on every shipped row,
    paths2 >= degree (each neighbor contributes at least its edge back),
    and the top-20 is sorted by the (katz desc, node) total order."""
    rows = all_queries()["g_katz_unrolled"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.katz_x4 == 2 * r.degree + r.paths2
        assert r.paths2 >= r.degree > 0
    keys = [(-r.katz_x4, r.node) for r in rows]
    assert keys == sorted(keys)


def test_winsorized_mean_ordering(spark, sf_dir):
    """Robust-estimator sanity: clamp counts stay within the 5% tails
    (plus interpolation slack), and the winsorized mean lies between the
    trimmed mean's window bounds — all three means finite."""
    rows = all_queries()["m_winsorized_mean"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r.n_clamped_low <= r.n * 0.05 + 1
        assert 0 <= r.n_clamped_high <= r.n * 0.05 + 1
        for m in (r.winsorized_mean, r.trimmed_mean, r.raw_mean):
            assert m == m  # not NaN
        # clamping both tails can never consume the whole sample
        assert r.n_clamped_low + r.n_clamped_high < r.n


def test_mutual_information_identities(spark, sf_dir):
    """Information-theoretic bounds: every entropy nonnegative, joint
    entropy between max(H_X, H_Y) and H_X + H_Y, MI nonnegative (within
    rounding) and bounded by min(H_X, H_Y); MI consistent with the
    shipped entropies."""
    r = all_queries()["a_mutual_information"](spark, sf_dir).collect()[0]
    assert r.h_type >= 0 and r.h_dow >= 0 and r.h_joint >= 0
    assert max(r.h_type, r.h_dow) - 2e-6 <= r.h_joint <= r.h_type + r.h_dow + 2e-6
    assert -2e-6 <= r.mutual_info <= min(r.h_type, r.h_dow) + 2e-6
    assert abs(r.mutual_info - round(r.h_type + r.h_dow - r.h_joint, 6)) <= 2e-6


def test_local_clustering_matches_python(spark, sf_dir):
    """Per-node triangle counts and coefficients recomputed imperatively
    over the collected pair set must match every shipped row."""
    from surge_spark.io import load_table

    d = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
        .collect()
    )
    by_order: dict[int, set[int]] = {}
    for r in d:
        by_order.setdefault(r.l_orderkey, set()).add(r.l_partkey)
    adj: dict[int, set[int]] = {}
    for parts in by_order.values():
        ps = sorted(parts)
        for i, pa in enumerate(ps):
            for pb in ps[i + 1 :]:
                adj.setdefault(pa, set()).add(pb)
                adj.setdefault(pb, set()).add(pa)
    rows = all_queries()["g_local_clustering_topk"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        nbrs = adj[r.node]
        assert r.degree == len(nbrs)
        tri = sum(
            1
            for a in nbrs
            for b in nbrs
            if a < b and b in adj.get(a, ())
        )
        assert r.triangles == tri
        assert r.clustering_ppm == tri * 2_000_000 // (r.degree * (r.degree - 1))
        assert 0 <= r.clustering_ppm <= 1_000_000


def test_multiwindow_burn_consistency(spark, sf_dir):
    """Window nesting and the alert rule are re-derivable from the shipped
    integers: short ⊆ long, burn is the exact floor, and the page fires
    iff BOTH all-integer predicates hold."""
    r = all_queries()["m_multiwindow_burn_alerts"](spark, sf_dir).collect()[0]
    assert 0 <= r.err_short <= r.n_short <= r.n_long
    assert r.err_short <= r.err_long <= r.n_long
    assert r.burn_short_x1000 == r.err_short * 100000 // r.n_short
    assert r.burn_long_x1000 == r.err_long * 100000 // r.n_long
    want = int(r.err_short * 100 > 2 * r.n_short and r.err_long * 100 > 2 * r.n_long)
    assert r.page_alert == want


def test_top_decile_share_identities(spark, sf_dir):
    """The decile cut selects 10% + boundary of each nation's orders, the
    share is the exact floor ppm, and a top decile by value can never
    hold less than 10% of revenue (within the pr >= 0.9 boundary count)."""
    rows = all_queries()["a_top_decile_revenue_share"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        # a single-order nation has pr = 0 everywhere -> n_top = 0 (both
        # engines, verified) — require a nonempty decile only for n >= 2
        assert 0 <= r.n_top <= r.n_orders
        if r.n_orders >= 2:
            assert r.n_top >= 1
        # pr >= 0.9 keeps ceil(0.1 * (n-1)) + 1 rows at most +1 boundary
        assert r.n_top <= r.n_orders * 0.1 + 2
        assert r.top_cents <= r.total_cents
        assert r.top_share_ppm == r.top_cents * 1_000_000 // r.total_cents
        # ranked BY price, so the top decile's mean >= overall mean
        assert r.top_cents * r.n_orders >= r.total_cents * r.n_top


def test_modularity_identities(spark, sf_dir):
    """Q is bounded in [-0.5, 1]; intra-edge mass can't exceed the edge
    count; the partition must cover every node (community count bounded
    by nodes); Q recomputed imperatively over the collected labels and
    edges equals the shipped value."""
    import pyspark.sql.functions as F

    from surge_spark.queries.relational import _lpa2_labels

    e0, _, labels_df = _lpa2_labels(spark, sf_dir)
    edges = [(r.src, r.dst) for r in e0.collect()]
    labels = {r.node: r.label for r in labels_df.collect()}
    m = len(edges)
    from collections import Counter

    deg = Counter()
    for a, b in edges:
        deg[a] += 1
        deg[b] += 1
    d_c = Counter()
    for v, k in deg.items():
        d_c[labels[v]] += k
    e_c = Counter()
    for a, b in edges:
        if labels[a] == labels[b]:
            e_c[labels[a]] += 1
    q = sum(e_c[c] / m - (d_c[c] / (2 * m)) ** 2 for c in d_c)
    row = all_queries()["g_modularity"](spark, sf_dir).collect()[0]
    assert row.n_edges == m
    assert row.n_communities == len(d_c)
    assert row.intra_edges == sum(e_c.values()) <= m
    assert -0.5 <= row.modularity <= 1.0
    assert abs(row.modularity - q) < 2e-6


@pytest.mark.slow  # r16 fast-tier split (>10 s; see pytest.ini)
def test_modularity_converged_contract(spark, sf_dir):
    """Q of the CONVERGED partition: same conservation bounds as the
    2-round entry (intra_edges <= n_edges, Q in [-0.5, 1]), identical
    n_edges (the graph is the same), and rounds agrees with
    g_lpa_converged's probe count — the two entries must not disagree
    about when the fixpoint landed."""
    q = all_queries()
    conv = q["g_modularity_converged"](spark, sf_dir).collect()[0]
    two = q["g_modularity"](spark, sf_dir).collect()[0]
    assert conv.n_edges == two.n_edges
    assert 0 <= conv.intra_edges <= conv.n_edges
    assert -0.5 <= conv.modularity <= 1.0
    lpa = q["g_lpa_converged"](spark, sf_dir).collect()[0]
    assert conv.rounds == lpa.rounds


def test_conversion_lag_identities(spark, sf_dir):
    """Ordering identities: min <= p50 <= p90 <= max; converters are a
    subset of viewers AND of funnel-eligible purchasers; all lags
    nonnegative by the >= first_view predicate."""
    import pyspark.sql.functions as F

    from surge_spark.io import load_table

    r = all_queries()["m_conversion_lag"](spark, sf_dir).collect()[0]
    assert 0 <= r.min_lag_ms <= r.p50_lag_ms <= r.p90_lag_ms <= r.max_lag_ms
    e = load_table(spark, sf_dir, "events").where(F.col("user_id").isNotNull())
    n_viewers = (
        e.where(F.col("event_type") == "view").select("user_id").distinct().count()
    )
    assert 0 < r.n_converters <= n_viewers


def test_two_proportion_ztest_identities(spark, sf_dir):
    """Integer channels re-derivable; z sign agrees with the rate
    comparison; arm sizes partition the user set."""
    import pyspark.sql.functions as F

    from surge_spark.io import load_table

    r = all_queries()["a_two_proportion_ztest"](spark, sf_dir).collect()[0]
    assert 0 <= r.k_a <= r.n_a and 0 <= r.k_b <= r.n_b
    assert r.rate_a_ppm == r.k_a * 1_000_000 // r.n_a
    assert r.rate_b_ppm == r.k_b * 1_000_000 // r.n_b
    n_users = (
        load_table(spark, sf_dir, "events")
        .where(F.col("user_id").isNotNull())
        .select("user_id")
        .distinct()
        .count()
    )
    assert r.n_a + r.n_b == n_users
    if r.z_score is not None:
        # strict rate ordering must drive the z sign
        if r.k_a * r.n_b > r.k_b * r.n_a:
            assert r.z_score > 0
        elif r.k_a * r.n_b < r.k_b * r.n_a:
            assert r.z_score < 0


def test_mann_whitney_identities(spark, sf_dir):
    """U identities: u2_a + u2_b == 2*n_a*n_b, both in [0, 2*n_a*n_b];
    r2_a is the doubled rank sum so it is bounded by the extremes of
    rank placement; tie_sum nonnegative."""
    r = all_queries()["a_mann_whitney_u"](spark, sf_dir).collect()[0]
    assert r.n_a > 0 and r.n_b > 0
    assert r.u2_a + r.u2_b == 2 * r.n_a * r.n_b
    assert 0 <= r.u2_a <= 2 * r.n_a * r.n_b
    n = r.n_a + r.n_b
    # doubled rank sum of arm A between placing all A lowest and highest
    assert r.n_a * (r.n_a + 1) <= r.r2_a <= r.n_a * (2 * n - r.n_a + 1)
    assert r.tie_sum >= 0
    assert r.z_score is not None  # real data: both arms populated, not all tied


def test_bollinger_bands_contract(spark, sf_dir):
    """Band ordering (lower <= mean <= upper), frame width <= 7, and the
    breakout flag exactly reproduces cnt > upper on every row."""
    rows = all_queries()["m_bollinger_bands"](spark, sf_dir).collect()
    assert rows
    breakouts = 0
    for r in rows:
        assert 1 <= r.w_n <= 7
        assert r.lower_band <= r.mean_7d <= r.upper_band
        assert r.breakout == (1 if r.cnt > r.upper_band else 0)
        breakouts += r.breakout
    # a 30-day series with real variance must flag at least one breakout
    # OR none — both legal; the flag path itself is pinned above


def test_silhouette_simplified_contract(spark, sf_dir):
    """Silhouette scores live in [-1, 1]; simplified-silhouette a<=b
    construction makes every per-vector s >= 0, so cluster means are
    too; members partition the nonzero-norm corpus; clusters are the
    model's cells."""
    from surge_spark.io import load_table

    from pyspark.sql import functions as F

    rows = all_queries()["sim_silhouette_simplified"](spark, sf_dir).collect()
    assert rows
    total = 0
    for r in rows:
        assert 0 <= r.cluster <= 7
        assert 0.0 <= r.mean_silhouette <= 1.0
        total += r.n_members
    # members partition the NONZERO-NORM corpus (the entry's own filter —
    # asserting the full count would fail on a correct implementation the
    # moment regenerated testdata ships one zero vector; review finding)
    nonzero = (
        load_table(spark, sf_dir, "embeddings")
        .where(
            F.expr(
                "aggregate(embedding, 0.0D,"
                " (acc, x) -> acc + CAST(x AS DOUBLE) * CAST(x AS DOUBLE))"
            )
            > 0
        )
        .count()
    )
    assert total == nonzero


def test_ks_test_identities(spark, sf_dir):
    """D in [0,1]; the integer supremum re-derives D exactly; KS relates
    to the Mann-Whitney data (same arms, so same n_a/n_b)."""
    q = all_queries()
    r = q["a_ks_test"](spark, sf_dir).collect()[0]
    assert r.n_a > 0 and r.n_b > 0
    assert 0 <= r.max_diff_num <= r.n_a * r.n_b
    assert abs(r.d_stat - round(r.max_diff_num / (r.n_a * r.n_b), 6)) < 1e-12
    assert 0.0 <= r.d_stat <= 1.0
    mw = q["a_mann_whitney_u"](spark, sf_dir).collect()[0]
    assert (r.n_a, r.n_b) == (mw.n_a, mw.n_b)


def test_rich_club_contract(spark, sf_dir):
    """N_k and E_k are non-increasing in k (rich sets nest); phi is a
    valid density (0..1e6 ppm) and re-derivable from the integers;
    N_k < 2 ships NULL phi."""
    rows = sorted(
        all_queries()["g_rich_club"](spark, sf_dir).collect(),
        key=lambda r: r.k,
    )
    assert rows
    for a, b in zip(rows, rows[1:]):
        assert a.n_k >= b.n_k and a.e_k >= b.e_k
    for r in rows:
        assert r.e_k <= r.n_k * (r.n_k - 1) // 2
        if r.n_k >= 2:
            assert r.phi_ppm == r.e_k * 2_000_000 // (r.n_k * (r.n_k - 1))
            assert 0 <= r.phi_ppm <= 1_000_000
        else:
            assert r.phi_ppm is None


def test_local_bridges_contract(spark, sf_dir):
    """Bridges are a subset of edges; the ppm channel re-derives; and the
    bridge count is consistent with the triangle count's support: a graph
    with triangles has at least one supported (non-bridge) edge."""
    r = all_queries()["g_local_bridges"](spark, sf_dir).collect()[0]
    assert 0 <= r.n_local_bridges <= r.n_edges
    assert r.bridge_ppm == r.n_local_bridges * 1_000_000 // r.n_edges
    # g_triangle_count ships per-part top-k rows; any row with triangles
    # proves at least one supported (non-bridge) edge exists
    tri = all_queries()["g_triangle_count"](spark, sf_dir).collect()
    if any(row.triangles > 0 for row in tri):
        assert r.n_local_bridges < r.n_edges


def test_welch_t_test_identities(spark, sf_dir):
    """Welch t agrees in SIGN with the mean comparison from its own
    integer moments; df lies in [min(n_a,n_b)-1, n_a+n_b-2] (the
    Welch-Satterthwaite bracket); arms match the shared kernel's."""
    q = all_queries()
    r = q["a_welch_t_test"](spark, sf_dir).collect()[0]
    assert r.n_a >= 2 and r.n_b >= 2
    mean_a, mean_b = r.s1_a / r.n_a, r.s1_b / r.n_b
    assert r.t_stat is not None
    if mean_a > mean_b:
        assert r.t_stat > 0
    elif mean_a < mean_b:
        assert r.t_stat < 0
    assert min(r.n_a, r.n_b) - 1 <= r.welch_df <= r.n_a + r.n_b - 2
    mw = q["a_mann_whitney_u"](spark, sf_dir).collect()[0]
    assert (r.n_a, r.n_b) == (mw.n_a, mw.n_b)


def test_filtered_ann_subset_of_unfiltered(spark, sf_dir):
    """Every filtered hit passes the metadata predicate; per query,
    ranks are contiguous from 1; and the filtered top-k's best cosine
    never beats the unfiltered brute-force best (the eligible set is a
    subset of the corpus)."""
    from pyspark.sql import functions as F

    from surge_spark.io import load_table

    q = all_queries()
    rows = q["sim_filtered_ann_topk"](spark, sf_dir).collect()
    assert rows
    eligible = {
        r.doc_id
        for r in load_table(spark, sf_dir, "documents")
        .where((F.col("lang") == "en") & (F.col("n_chars") >= 100))
        .select("doc_id")
        .collect()
    }
    by_q: dict[int, list] = {}
    for r in rows:
        assert r.corpus_id in eligible
        by_q.setdefault(r.query_id, []).append(r)
    full = {}
    for r in q["sim_cosine_topk_bruteforce"](spark, sf_dir).collect():
        if r.rank == 1:
            full[r.query_id] = r.cosine
    for qid, rs in by_q.items():
        rs.sort(key=lambda r: r.rank)
        assert [r.rank for r in rs] == list(range(1, len(rs) + 1))
        for a, b in zip(rs, rs[1:]):
            assert a.cosine >= b.cosine
        if qid in full:
            assert rs[0].cosine <= full[qid] + 1e-9


@pytest.mark.slow  # r16 fast-tier split (>10 s; see pytest.ini)
def test_data_quality_checks_contract(spark, sf_dir):
    """The suite covers the fixed check list exactly once each;
    violations never exceed the checked count; and the synthetic
    warehouse's known-clean invariants hold (no orphans, no dup pks)."""
    rows = {r.check_name: r for r in all_queries()["o_data_quality_checks"](spark, sf_dir).collect()}
    assert set(rows) == {
        "orders_orphan_custkey",
        "lineitem_orphan_orderkey",
        "lineitem_orphan_partkey",
        "events_null_user_id",
        "events_duplicate_event_id",
        "documents_empty_text",
        "orders_nonpositive_total",
    }
    for r in rows.values():
        assert 0 <= r.n_violations <= r.n_checked
    # referential integrity and pk uniqueness are clean by construction
    assert rows["orders_orphan_custkey"].n_violations == 0
    assert rows["lineitem_orphan_orderkey"].n_violations == 0
    assert rows["events_duplicate_event_id"].n_violations == 0


def test_cramers_v_contract(spark, sf_dir):
    """V in [0,1]; chi2 equals the sum of a_chi_square_independence's
    per-cell contributions (the shared-kernel pin); dims match the
    actual distinct type/dow counts."""
    q = all_queries()
    r = q["a_cramers_v"](spark, sf_dir).collect()[0]
    assert r.cramers_v is not None and 0.0 <= r.cramers_v <= 1.0
    cells = q["a_chi_square_independence"](spark, sf_dir).collect()
    assert abs(r.chi2 - round(sum(c.chi2_contrib for c in cells), 6)) < 1e-4
    assert r.n_rows == len({c.event_type for c in cells})
    assert r.n_cols == len({c.dow for c in cells})
    assert r.n == sum(c.observed for c in cells)


def test_degree_centralization_contract(spark, sf_dir):
    """Freeman ppm in [0, 1e6]; the numerator re-derives from the
    shipped integer channels; a real co-occurrence graph is neither a
    perfect star (1e6) nor perfectly regular (0)."""
    r = all_queries()["g_degree_centralization"](spark, sf_dir).collect()[0]
    assert r.centralization_num == r.max_k * r.n - r.sum_k
    assert r.freeman_ppm is not None
    assert 0 < r.freeman_ppm < 1_000_000


def test_asof_forward_contract(spark, sf_dir):
    """Forward labels point strictly AFTER the click and within 24 h;
    every labeled click exists; and the forward pick is the MINIMUM
    qualifying purchase ts (verified per-row against a recompute)."""
    from pyspark.sql import functions as F

    from surge_spark.io import load_table

    rows = all_queries()["j_asof_forward_join"](spark, sf_dir).collect()
    assert rows
    e = load_table(spark, sf_dir, "events")
    clicks = {r.event_id: r for r in e.where(F.col("event_type") == "click").collect()}
    purchases = {}
    for r in e.where(F.col("event_type") == "purchase").collect():
        purchases.setdefault(r.user_id, []).append(r)
    import datetime as dt

    for out in rows[:200]:
        c = clicks[out.event_id]
        cand = [
            p
            for p in purchases.get(c.user_id, [])
            if c.ts < p.ts <= c.ts + dt.timedelta(days=1)
        ]
        assert cand, out
        best = min(cand, key=lambda p: (p.ts, p.event_id))
        assert out.purchase_event_id == best.event_id


def test_changepoint_single_contract(spark, sf_dir):
    """Per type: exactly one split; gain is nonnegative (splitting can
    never fit worse than the pooled mean); segment sizes partition the
    day count; and the split day is one of the type's observed days."""
    from pyspark.sql import functions as F

    from surge_spark.io import load_table

    rows = all_queries()["m_changepoint_single"](spark, sf_dir).collect()
    types = {r.event_type for r in rows}
    assert len(rows) == len(types)
    e = load_table(spark, sf_dir, "events")
    days = (
        e.groupBy("event_type", F.expr("unix_millis(ts) div 86400000").alias("d"))
        .count()
        .collect()
    )
    by_type: dict[str, set] = {}
    for r in days:
        by_type.setdefault(r.event_type, set()).add(r.d)
    for r in rows:
        assert r.gain >= -1e-9
        assert r.split_day in by_type[r.event_type]
        assert r.n_left + r.n_right == len(by_type[r.event_type])
        assert r.n_left >= 1 and r.n_right >= 1


def test_spearman_rho_contract(spark, sf_dir):
    """rho in [-1, 1]; rank-sum identity: Σ2r over users == n(n+1) per
    metric (tie-averaged ranks preserve the total); activity-vs-spend on
    this corpus is strongly positive (more events ⇒ more summed cents)."""
    r = all_queries()["a_spearman_rho"](spark, sf_dir).collect()[0]
    assert r.spearman_rho is not None
    assert -1.0 <= r.spearman_rho <= 1.0
    assert r.s1x == r.n * (r.n + 1)
    assert r.s1y == r.n * (r.n + 1)
    assert r.spearman_rho > 0.5


def test_edge_support_cross_pins_local_bridges(spark, sf_dir):
    """The histogram's zero-support bucket IS the local-bridge count, and
    total edge mass matches the bridge entry's n_edges — two entries,
    one triangle enumeration, pinned against each other."""
    q = all_queries()
    hist = {r.support_bucket: r.n_edges for r in q["g_edge_support_histogram"](spark, sf_dir).collect()}
    br = q["g_local_bridges"](spark, sf_dir).collect()[0]
    assert hist.get(0, 0) == br.n_local_bridges
    assert sum(hist.values()) == br.n_edges
    assert all(0 <= b <= 20 for b in hist)


def test_interarrival_ks_contract(spark, sf_dir):
    """D in [0,1]; mean re-derives from the integer channels; the
    synthetic uniform-arrival corpus is NOT exponential at corpus scale
    so D must be comfortably nonzero (vacuity guard on the fit)."""
    r = all_queries()["m_interarrival_exponential_ks"](spark, sf_dir).collect()[0]
    assert r.n_gaps > 0 and r.sum_gap_ms > 0
    assert abs(r.mean_gap_ms - round(r.sum_gap_ms / r.n_gaps, 4)) < 1e-9
    assert 0.0 <= r.d_stat <= 1.0
    assert r.d_stat > 0.001


def test_vocab_growth_heaps_contract(spark, sf_dir):
    """Heaps beta in [0, 1]: the synthetic 31-word vocab saturates in
    decile 0, so the growth curve is FLAT and beta is exactly 0 — the
    saturation signal the entry exists to surface (an open-vocabulary
    corpus would read near 1). Totals match the corpus's true vocab and
    token mass."""
    from pyspark.sql import functions as F

    from surge_spark.io import load_table
    from surge_spark.operators.dedup import tokens as _tok

    r = all_queries()["t_vocab_growth_heaps"](spark, sf_dir).collect()[0]
    assert 1 <= r.n_points <= 10
    assert r.heaps_beta is not None and 0.0 <= r.heaps_beta <= 1.0
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(F.explode(_tok("text")).alias("tok")).where(F.col("tok") != "")
    assert r.total_vocab == toks.select("tok").distinct().count()
    assert r.total_tokens == toks.count()


def test_point_in_time_join_no_leakage(spark, sf_dir):
    """Label-leakage pin: every purchase's attribute version was born AT
    OR BEFORE the purchase (age >= 0); every purchase gets exactly one
    row; and a purchase that itself opened a version reads its OWN
    value with age 0 (verified against the SCD2 entry's intervals)."""
    q = all_queries()
    rows = q["j_point_in_time_join"](spark, sf_dir).collect()
    assert rows
    ids = [r.event_id for r in rows]
    assert len(ids) == len(set(ids))
    for r in rows:
        assert r.feature_age_ms >= 0
    from pyspark.sql import functions as F

    from surge_spark.io import load_table

    scd = q["o_scd2_intervals"](spark, sf_dir).collect()
    intervals = {}
    for s in scd:
        intervals.setdefault(s.user_id, []).append(s)
    purchases = {
        r.event_id: r
        for r in load_table(spark, sf_dir, "events")
        .where(F.col("event_type") == "purchase")
        .collect()
    }
    for r in rows[:200]:
        ts = purchases[r.event_id].ts
        # the valid-at version: latest valid_from <= purchase ts — the
        # exact SCD2 containment, recomputed from the sibling entry
        best = max(
            (s for s in intervals[r.user_id] if s.valid_from <= ts),
            key=lambda s: s.valid_from,
        )
        assert r.attr_value == best.attr_value, r
        # mirror unix_millis exactly: each timestamp floors to millis
        # BEFORE the subtraction (a raw timedelta keeps the micros and
        # disagrees by 1 ms on ~half the rows)
        import datetime as _dt

        def _ms(t):
            td = t - _dt.datetime(1970, 1, 1)
            us = (td.days * 86400 + td.seconds) * 1_000_000 + td.microseconds
            return us // 1000  # exact ints end to end, no float epoch

        assert r.feature_age_ms == _ms(ts) - _ms(best.valid_from)


def test_hourly_entropy_contract(spark, sf_dir):
    """Entropy in [0, ln(24)]; peak hour in [0, 24); active hours <= 24;
    and the uniform-arrival synthetic corpus reads near-flat (entropy
    close to the max — a vacuity guard on the channel)."""
    import math

    rows = all_queries()["m_hourly_profile_entropy"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 1 <= r.n_active_hours <= 24
        assert 0 <= r.peak_hour < 24
        assert -1e-9 <= r.hourly_entropy <= math.log(24) + 1e-9
        assert r.hourly_entropy > 0.9 * math.log(r.n_active_hours or 1)


def test_gini_by_group_contract(spark, sf_dir):
    """Per-group Gini in [0, 1); every nation with >= 2 orders ships a
    value; and the formula re-derives exactly from the shipped integer
    channels."""
    rows = all_queries()["a_gini_by_group"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        if r.n >= 2 and r.s_x > 0:
            assert r.gini is not None
            assert -1e-9 <= r.gini < 1.0
            expect = round(2.0 * r.s_ix / (r.n * r.s_x) - (r.n + 1) / r.n, 6)
            assert abs(r.gini - expect) < 1e-12


def test_rolling_correlation_contract(spark, sf_dir):
    """r in [-1, 1] on every full-variance frame; one row per observed
    day; frame widths ramp 1..7 then hold at 7."""
    rows = sorted(
        all_queries()["w_rolling_correlation"](spark, sf_dir).collect(),
        key=lambda r: r.day,
    )
    assert rows
    for i, r in enumerate(rows):
        assert r.n == min(i + 1, 7)
        if r.rolling_corr is not None:
            assert -1.0 - 1e-9 <= r.rolling_corr <= 1.0 + 1e-9
    days = [r.day for r in rows]
    assert len(days) == len(set(days))


def test_js_divergence_contract(spark, sf_dir):
    """JSD is symmetric by construction (pairs canonicalized a<b),
    bounded by ln 2, nonnegative; every source pair appears exactly
    once."""
    import math

    from pyspark.sql import functions as F

    from surge_spark.io import load_table

    rows = all_queries()["t_js_divergence_sources"](spark, sf_dir).collect()
    assert rows
    seen = set()
    for r in rows:
        assert r.src_a < r.src_b
        assert (r.src_a, r.src_b) not in seen
        seen.add((r.src_a, r.src_b))
        assert -1e-9 <= r.js_divergence <= math.log(2) + 1e-9
    n_src = (
        load_table(spark, sf_dir, "documents").select("source").distinct().count()
    )
    assert len(rows) == n_src * (n_src - 1) // 2


def test_idf_outlier_docs_contract(spark, sf_dir):
    """Top-20 with contiguous ranks, scores non-increasing, every score
    positive (IDF of a token present in at least its own doc is
    ln(N/df) >= 0 with df <= N), and doc ids exist."""
    rows = sorted(
        all_queries()["t_idf_outlier_docs"](spark, sf_dir).collect(),
        key=lambda r: r.rank,
    )
    assert 1 <= len(rows) <= 20
    assert [r.rank for r in rows] == list(range(1, len(rows) + 1))
    for a, b in zip(rows, rows[1:]):
        assert a.mean_idf >= b.mean_idf
    for r in rows:
        assert r.mean_idf >= 0 and r.n_distinct_tokens >= 1


def test_log_odds_terms_contract(spark, sf_dir):
    """Top-20 by z with contiguous ranks and non-increasing scores;
    every term present in at least one arm; counts re-derivable
    from the source tf channel for the top term."""
    from pyspark.sql import functions as F

    from surge_spark.io import load_table
    from surge_spark.operators.dedup import tokens as _tok

    rows = sorted(
        all_queries()["t_log_odds_terms"](spark, sf_dir).collect(),
        key=lambda r: r.rank,
    )
    assert 1 <= len(rows) <= 20
    assert [r.rank for r in rows] == list(range(1, len(rows) + 1))
    for a, b in zip(rows, rows[1:]):
        assert a.log_odds_z >= b.log_odds_z
    top = rows[0]
    assert top.count_a + top.count_b > 0
    d = load_table(spark, sf_dir, "documents")
    tfq = (
        d.select("source", F.explode(_tok("text")).alias("w"))
        .where(F.col("w") == top.term)
        .groupBy("source")
        .count()
        .collect()
    )
    by_src = {r.source: r["count"] for r in tfq}
    srcs = sorted({r.source for r in d.select("source").distinct().collect()})[:2]
    assert top.count_a == by_src.get(srcs[0], 0)
    assert top.count_b == by_src.get(srcs[1], 0)


def test_kruskal_wallis_contract(spark, sf_dir):
    """KW doubled-rank identity: Σ r2_j = total doubled rank sum =
    n(n+1) + ... — actually Σ_j r2_j = Σ_v cnt(2·less+cnt+1) = n(n+1)
    (doubled sum of average ranks 1..n); H ≥ 0 when defined (tie-
    corrected H is nonnegative up to float eps)."""
    r = all_queries()["a_kruskal_wallis"](spark, sf_dir).collect()[0]
    assert r.n == r.n_p + r.n_c + r.n_v
    assert r.r2_p + r.r2_c + r.r2_v == r.n * (r.n + 1)
    if r.h_stat is not None:
        assert r.h_stat >= -1e-9


def test_one_way_anova_contract(spark, sf_dir):
    """ANOVA partition: η² ∈ [0, 1]; F ≥ 0 when defined; the moment
    identities (n, s1) match the KW arm totals on the same slice."""
    r = all_queries()["a_one_way_anova"](spark, sf_dir).collect()[0]
    kw = all_queries()["a_kruskal_wallis"](spark, sf_dir).collect()[0]
    assert (r.n, r.n_p, r.n_c, r.n_v) == (kw.n, kw.n_p, kw.n_c, kw.n_v)
    if r.f_stat is not None:
        assert r.f_stat >= 0.0
    if r.eta_squared is not None:
        assert -1e-9 <= r.eta_squared <= 1.0 + 1e-9


def test_yule_k_contract(spark, sf_dir):
    """Yule K: per-source vocab/token totals agree with t_hapax_ratio
    (same tf frame); K ≥ 0 (Σc² ≥ N always); Σc² ≥ N with equality iff
    every word is hapax."""
    yk = {r.source: r for r in all_queries()["t_yule_k"](spark, sf_dir).collect()}
    hp = {
        r.source: r
        for r in all_queries()["t_hapax_ratio"](spark, sf_dir).collect()
    }
    assert set(yk) == set(hp)
    for s, r in yk.items():
        assert r.vocab == hp[s].vocab
        assert r.sum_c_sq >= r.n_tokens
        if r.yule_k is not None:
            assert r.yule_k >= -1e-9
        if r.sum_c_sq == r.n_tokens:
            assert hp[s].n_hapax == hp[s].vocab


def test_ulcer_index_contract(spark, sf_dir):
    """Ulcer ≤ max drawdown in bp (RMS ≤ max); n_days matches
    w_max_drawdown's frame; ulcer re-derives from the shipped integer
    channels."""
    import math

    u = all_queries()["w_ulcer_index"](spark, sf_dir).collect()[0]
    m = all_queries()["w_max_drawdown"](spark, sf_dir).collect()[0]
    assert u.n_days == m.n_days
    assert u.ulcer_bp <= u.max_dd_bp + 1e-9
    assert abs(u.ulcer_bp - round(math.sqrt(u.sum_sq_bp / u.n_days), 6)) < 1e-12


def test_ipv4_cidr_class_contract(spark, sf_dir):
    """CIDR classes partition the corpus (Σ n_docs == |documents|);
    every class's min/max ip sits inside its literal range."""
    from surge_spark.io import load_table

    rows = all_queries()["f_ipv4_cidr_class"](spark, sf_dir).collect()
    n_docs = load_table(spark, sf_dir, "documents").count()
    assert sum(r.n_docs for r in rows) == n_docs
    bounds = {
        "private-10/8": (167772160, 184549375),
        "private-172.16/12": (2886729728, 2887778303),
        "private-192.168/16": (3232235520, 3232301055),
    }
    for r in rows:
        assert 0 <= r.min_ip_num <= r.max_ip_num <= 4294967295
        if r.cidr_class in bounds:
            lo, hi = bounds[r.cidr_class]
            assert lo <= r.min_ip_num and r.max_ip_num <= hi
        assert r.n_distinct_ips <= r.n_docs


def test_diff_in_diff_contract(spark, sf_dir):
    """DiD identity: estimate == treat_delta − control_delta (up to the
    two round-6 boundaries); cells partition the purchase slice."""
    r = all_queries()["a_diff_in_diff"](spark, sf_dir).collect()[0]
    assert r.n_tp + r.n_t0 + r.n_cp + r.n_c0 > 0
    if r.did_estimate is not None:
        assert abs(r.did_estimate - (r.treat_delta - r.control_delta)) < 2e-6


def test_mtbf_mttr_contract(spark, sf_dir):
    """Incident accounting: recovered <= incidents; error events >=
    incidents (each run holds >= 1 error); gaps = incidents − affected
    users (one lag-NULL per user); means nonnegative."""
    r = all_queries()["m_mtbf_mttr"](spark, sf_dir).collect()[0]
    assert r.n_recovered <= r.n_incidents
    assert r.n_error_events >= r.n_incidents
    assert r.n_gaps == r.n_incidents - r.n_users_affected
    if r.mttr_ms_floor is not None:
        assert r.mttr_ms_floor >= 0
    if r.mtbf_ms_floor is not None:
        assert r.mtbf_ms_floor >= 0


def test_croston_contract(spark, sf_dir):
    """Croston: demand EWMA is a convex combination of observed demands
    (min <= z <= max per user on positive values); interval EWMA
    nonnegative; single-purchase users ship NULL rate (the 0.0 seed)."""
    rows = all_queries()["m_croston_forecast"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.interval_ewma_ms >= 0
        if r.n == 1:
            assert r.interval_ewma_ms == 0.0 and r.rate_per_day is None
        if r.rate_per_day is not None:
            assert r.rate_per_day > 0


def test_mde_power_contract(spark, sf_dir):
    """MDE: positive when defined; scales like 1/sqrt(n) sanity — the
    pooled rate sits inside [min(p1,p2), max(p1,p2)]."""
    r = all_queries()["a_mde_power"](spark, sf_dir).collect()[0]
    zt = all_queries()["a_two_proportion_ztest"](spark, sf_dir).collect()[0]
    # shared-kernel pin: the MDE budgets exactly the z-test's cells
    assert (r.n_a, r.n_b, r.k_a, r.k_b) == (zt.n_a, zt.n_b, zt.k_a, zt.k_b)
    if r.mde is not None:
        # mde == 0 exactly when the pooled rate is degenerate (p in
        # {0,1} — zero variance; true at tiny SF where every user buys)
        assert r.mde >= 0
        if 0 < r.p_pool < 1:
            assert r.mde > 0
        p1, p2 = r.k_a / r.n_a, r.k_b / r.n_b
        assert min(p1, p2) - 1e-9 <= r.p_pool <= max(p1, p2) + 1e-9
        assert r.detectable == (1 if abs(p2 - p1) >= r.mde - 1e-12 else 0) or \
            abs(abs(p2 - p1) - r.mde) < 2e-6


def test_benjamini_hochberg_contract(spark, sf_dir):
    """BH step-up shape: rejects form a PREFIX of the rank order;
    critical values strictly decrease with rank; every rejected rank's
    suffix-max witness exists (some rank >= it has |z| >= crit)."""
    rows = sorted(
        all_queries()["a_benjamini_hochberg"](spark, sf_dir).collect(),
        key=lambda r: r.rank,
    )
    assert rows
    rejected = [r.bh_reject for r in rows]
    # prefix property: once 0, never 1 again
    assert all(a >= b for a, b in zip(rejected, rejected[1:]))
    crits = [r.bh_crit for r in rows]
    assert all(a > b for a, b in zip(crits, crits[1:]))
    assert [r.rank for r in rows] == list(range(1, len(rows) + 1))


def test_srm_contract(spark, sf_dir):
    """SRM rides the shared parity cells (n matches the z-test); chi2
    re-derives from the shipped integers; critical value is the stdlib
    normal quantile squared."""
    from statistics import NormalDist

    r = all_queries()["a_sample_ratio_mismatch"](spark, sf_dir).collect()[0]
    zt = all_queries()["a_two_proportion_ztest"](spark, sf_dir).collect()[0]
    assert (r.n_a, r.n_b) == (zt.n_a, zt.n_b)
    expect = round((r.n_a - r.n_b) ** 2 / (r.n_a + r.n_b), 6)
    assert abs(r.srm_chi2 - expect) < 1e-12
    crit = NormalDist().inv_cdf(0.975) ** 2
    assert abs(crit - 3.841458820694124) < 1e-12


def test_backfill_plan_contract(spark, sf_dir):
    """Backfill plan covers the FULL min..max day calendar gaplessly;
    flags exactly the below-half-median days; totals conserve."""
    rows = sorted(
        all_queries()["o_partition_backfill_plan"](spark, sf_dir).collect(),
        key=lambda r: r.day,
    )
    days = [r.day for r in rows]
    assert days == list(range(days[0], days[-1] + 1))
    for r in rows:
        assert r.backfill == (1 if r.n_events < r.median_daily / 2 else 0) or \
            abs(r.n_events - r.median_daily / 2) < 1e-4


def test_price_band_join_contract(spark, sf_dir):
    """Bands partition the purchase stream: Σ n_events equals the
    purchase count; all five bands present even if empty; totals sit
    inside band bounds when singleton."""
    from surge_spark.io import load_table
    from pyspark.sql import functions as F

    rows = all_queries()["j_price_band_join"](spark, sf_dir).collect()
    assert len(rows) == 5
    e = load_table(spark, sf_dir, "events")
    n_purch = e.where(
        F.col("value").isNotNull() & (F.col("event_type") == "purchase")
    ).count()
    assert sum(r.n_events for r in rows) == n_purch


def test_code_fraction_contract(spark, sf_dir):
    """Exactly the injected fifth of each source's docs flags as code
    (the synthetic corpus itself carries zero code symbols); ppm
    channels bounded."""
    rows = all_queries()["t_code_fraction"](spark, sf_dir).collect()
    assert rows
    total = sum(r.n_docs for r in rows)
    flagged = sum(r.n_code_docs for r in rows)
    assert flagged * 5 == total  # doc_id % 5 == 0 slice, all flagged
    for r in rows:
        assert 0 <= r.sym_ppm <= 1_000_000
        assert 0 <= r.indent_ppm <= 1_000_000


def test_base64_roundtrip_contract(spark, sf_dir):
    """Every row roundtrips (flag all-1); b64 length is the RFC 4648
    ceil(24/3)*4 = 32 for the fixed 24-byte input."""
    rows = all_queries()["f_base64_roundtrip"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.roundtrip_ok == 1
        assert r.b64_len == 32


def test_tost_contract(spark, sf_dir):
    """TOST: z_lower + z_upper == 2δ/se (the two one-sided tests share
    one se); equivalence implies |mean_diff| < δ = 500 cents."""
    r = all_queries()["a_tost_equivalence"](spark, sf_dir).collect()[0]
    if r.se is not None:
        assert abs((r.z_lower + r.z_upper) - 2 * 500 / r.se) < 2e-5
        if r.equivalent == 1:
            assert abs(r.mean_diff) < 500


def test_best_split_gini_contract(spark, sf_dir):
    """Split cells conserve (nl+nr constant across thresholds, kl+kr
    too); exactly one best; impurity in [0, 0.5] for binary labels;
    impurity re-derives from the shipped cells."""
    rows = sorted(
        all_queries()["a_best_split_gini"](spark, sf_dir).collect(),
        key=lambda r: r.threshold,
    )
    assert len(rows) == 5
    totals = {(r.nl + r.nr, r.kl + r.kr) for r in rows}
    assert len(totals) == 1
    assert sum(r.is_best for r in rows) == 1
    for r in rows:
        if r.impurity is not None:
            assert -1e-9 <= r.impurity <= 0.5 + 1e-9
            gl = 1 - (r.kl / r.nl) ** 2 - ((r.nl - r.kl) / r.nl) ** 2
            gr = 1 - (r.kr / r.nr) ** 2 - ((r.nr - r.kr) / r.nr) ** 2
            expect = round((r.nl * gl + r.nr * gr) / (r.nl + r.nr), 6)
            assert abs(r.impurity - expect) < 1e-9


def test_ohlc_contract(spark, sf_dir):
    """OHLC invariants: low <= open, close <= high; volume >= high;
    n_trades >= 1 on every shipped day."""
    rows = all_queries()["w_ohlc_bars"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.low_cents <= r.open_cents <= r.high_cents
        assert r.low_cents <= r.close_cents <= r.high_cents
        assert r.volume_cents >= r.high_cents
        assert r.n_trades >= 1


def test_deterministic_uuid_contract(spark, sf_dir):
    """Name-based ids: every doc mints one, all distinct, all
    well-formed; first_uid recomputes from the md5 in Python."""
    import hashlib

    r = all_queries()["f_deterministic_uuid"](spark, sf_dir).collect()[0]
    assert r.n == r.n_distinct == r.n_wellformed

    def mint(i):
        hx = hashlib.md5(f"surge:{i}".encode()).hexdigest()
        return (
            f"{hx[0:8]}-{hx[8:12]}-8{hx[13:16]}-a{hx[17:20]}-{hx[20:32]}"
        )

    assert r.first_uid == min(mint(i) for i in range(r.n))


def test_triad_census_contract(spark, sf_dir):
    """The census is self-checking: the four bins sum to C(n,3)
    exactly; every bin nonnegative; W and T agree with
    g_global_transitivity's channels."""
    r = all_queries()["g_triad_census"](spark, sf_dir).collect()[0]
    total = r.triad_0 + r.triad_1 + r.triad_2 + r.triad_3
    assert total == r.n * (r.n - 1) * (r.n - 2) // 6
    for b in (r.triad_0, r.triad_1, r.triad_2, r.triad_3):
        assert b >= 0
    gt = all_queries()["g_global_transitivity"](spark, sf_dir).collect()[0]
    assert gt.n_wedges == r.w and gt.n_triangles == r.triad_3


def test_dedup_threshold_sweep_contract(spark, sf_dir):
    """The sweep is monotone: n_pairs nonincreasing and mean jaccard
    nondecreasing in the threshold; every retained pair's mean is >=
    its threshold."""
    rows = sorted(
        all_queries()["d_dedup_threshold_sweep"](spark, sf_dir).collect(),
        key=lambda r: r.threshold_ppm,
    )
    assert len(rows) == 6
    n = [r.n_pairs for r in rows]
    assert all(a >= b for a, b in zip(n, n[1:]))
    means = [r.mean_jaccard_ppm for r in rows if r.mean_jaccard_ppm is not None]
    assert all(a <= b for a, b in zip(means, means[1:]))
    for r in rows:
        if r.mean_jaccard_ppm is not None:
            assert r.mean_jaccard_ppm >= r.threshold_ppm
