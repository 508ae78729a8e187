"""Relational operator catalog — scans/filters, joins, aggregations, window
functions, sorts, set ops, scalar functions.

Maps SURVEY.md §2.1-§2.8 onto declarative DataFrame plans. Everything here is
stock Catalyst: filters/projections push into the parquet scan, dimension
joins broadcast, aggregates run partial+final. Float aggregates are rounded
identically on both sides so order of partial aggregation never changes the
hash.

Reference parity notes (cites into /root/reference):
- point/range/prefix scans: SurgeAggregateStore.scala:13-39,
  KafkaStreamsKeyValueStore.scala:28-68 (S2-S4)
- key prefix up to ':': KafkaPartitioner.scala:34-42 (F2/P6)
- latest-per-key compaction: SurgeStateStoreConsumer.scala:57-76 (A2)
- grouped key->records: KafkaProducerActorImpl.scala:604-606 (A8)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..io import load_table
from ..operators.util import measured_broadcast
from . import query


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# --------------------------------------------------------------------------
# Scans / filters / projections (S2-S4, P1-P6)
# --------------------------------------------------------------------------


@query(
    "s2_point_lookup",
    oracle="""
    SELECT c_custkey, c_name, c_acctbal, c_mktsegment
    FROM customer WHERE c_custkey = 71
    """,
)
def s2_point_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyed point read (S2): the batch analog of getAggregateBytes(id)."""
    return (
        _t(spark, sf_dir, "customer")
        .where(F.col("c_custkey") == 71)
        .select("c_custkey", "c_name", "c_acctbal", "c_mktsegment")
    )


@query(
    "s3_key_prefix_range_scan",
    oracle="""
    SELECT key, event_id, value FROM (
      SELECT concat(user_id, ':', event_type) AS key, event_id, value
      FROM events
    ) WHERE split_part(key, ':', 1) = '7'
    """,
)
def s3_key_prefix_range_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Substate range scan (S3/P6): key 'agg:sub' co-grouped by prefix
    (PartitionStringUpToColon, KafkaPartitioner.scala:34-42)."""
    events = _t(spark, sf_dir, "events")
    keyed = events.select(
        F.concat_ws(":", F.col("user_id"), F.col("event_type")).alias("key"),
        "event_id",
        "value",
    )
    return keyed.where(F.substring_index("key", ":", 1) == "7")


@query(
    "s4_full_scan_counts",
    oracle="""
    SELECT count(*) AS n_rows,
           count(DISTINCT l_orderkey) AS n_orders,
           CAST(round(sum(l_quantity), 2) AS DOUBLE) AS sum_qty
    FROM lineitem
    """,
)
def s4_full_scan_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full scan / count / approx count surface (S4)."""
    return _t(spark, sf_dir, "lineitem").agg(
        F.count("*").alias("n_rows"),
        F.count_distinct("l_orderkey").alias("n_orders"),
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
    )


@query(
    "p2_filter_project",
    oracle="""
    SELECT event_id, user_id, CAST(round(value, 2) AS DOUBLE) AS value
    FROM events WHERE event_type = 'error'
    """,
)
def p2_filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Topic-equality filter + projection (P2/P3): pushed to the scan."""
    return (
        _t(spark, sf_dir, "events")
        .where(F.col("event_type") == "error")
        .select("event_id", "user_id", F.round("value", 2).alias("value"))
    )


@query(
    "p4_regex_filter",
    oracle="""
    SELECT event_type, count(*) AS n
    FROM events WHERE regexp_matches(event_type, '^(click|view)$')
    GROUP BY event_type
    """,
)
def p4_regex_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex predicate (P4/F6): SignalNamePatternMatcher analog."""
    return (
        _t(spark, sf_dir, "events")
        .where(F.col("event_type").rlike("^(click|view)$"))
        .groupBy("event_type")
        .agg(F.count("*").alias("n"))
    )


@query(
    "p5_offset_watermark_filter",
    oracle="""
    SELECT count(*) AS n, CAST(max(event_id) AS BIGINT) AS max_offset
    FROM events WHERE event_id <= 500
    """,
)
def p5_offset_watermark_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Offset <= watermark predicate (P5): KafkaProducerActorImpl.scala:684-698."""
    return (
        _t(spark, sf_dir, "events")
        .where(F.col("event_id") <= 500)
        .agg(F.count("*").alias("n"), F.max("event_id").alias("max_offset"))
    )


# --------------------------------------------------------------------------
# Joins (§2.3 declared surface)
# --------------------------------------------------------------------------


@query(
    "j_revenue_per_nation",
    oracle="""
    SELECT n_name,
           CAST(round(sum(l_extendedprice * (1 - l_discount)), 2) AS DOUBLE) AS revenue,
           count(*) AS n_items
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    GROUP BY n_name
    """,
)
def j_revenue_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: 4-way join + group-agg. Dimensions broadcast; only the
    fact-fact join (lineitem ⋈ orders) shuffles on the key."""
    lineitem = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    customer = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    return (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            ),
            F.count("*").alias("n_items"),
        )
    )


@query(
    "j_profit_by_nation_year",
    oracle="""
    SELECT n_name,
           CAST(year(l_shipdate) AS INT) AS o_year,
           CAST(round(sum(l_extendedprice * (1 - l_discount)), 2) AS DOUBLE) AS profit,
           count(*) AS n_items
    FROM lineitem
    JOIN part     ON l_partkey = p_partkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    WHERE p_type LIKE 'STANDARD%'
    GROUP BY n_name, year(l_shipdate)
    """,
)
def j_profit_by_nation_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9-shaped profit rollup exercising the supplier and part
    dimensions: lineitem ⋈ part(filtered) ⋈ supplier ⋈ nation, grouped by
    nation and ship year. All three dims broadcast — the fact table never
    shuffles before the partial aggregation, so the only wide exchange is
    the final (nation, year) agg (~#nations × #years rows)."""
    lineitem = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").where(F.col("p_type").startswith("STANDARD"))
    supplier = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    return (
        lineitem.join(F.broadcast(part), lineitem.l_partkey == part.p_partkey)
        .join(F.broadcast(supplier), lineitem.l_suppkey == supplier.s_suppkey)
        .join(F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey)
        .groupBy("n_name", F.year("l_shipdate").alias("o_year"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("profit"),
            F.count("*").alias("n_items"),
        )
    )


@query(
    "j_left_join_orders_per_customer",
    oracle="""
    SELECT c_custkey, count(o_orderkey) AS n_orders,
           CAST(round(coalesce(sum(o_totalprice), 0), 2) AS DOUBLE) AS total_spend
    FROM customer LEFT JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey
    """,
)
def j_left_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    return (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.round(F.coalesce(F.sum("o_totalprice"), F.lit(0.0)), 2).alias("total_spend"),
        )
    )


@query(
    "j_right_join",
    oracle="""
    SELECT c_custkey, c_mktsegment, o_orderkey
    FROM orders RIGHT JOIN customer ON o_custkey = c_custkey
    WHERE c_acctbal > 9000
    """,
)
def j_right_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.join(customer, orders.o_custkey == customer.c_custkey, "right")
        .where(F.col("c_acctbal") > 9000)
        .select("c_custkey", "c_mktsegment", "o_orderkey")
    )


@query(
    "j_full_outer_join",
    oracle="""
    WITH building AS (
      SELECT c_custkey AS k FROM customer WHERE c_mktsegment = 'BUILDING'
    ), big_spenders AS (
      SELECT DISTINCT o_custkey AS k FROM orders WHERE o_totalprice > 100000
    )
    SELECT coalesce(b.k, s.k) AS custkey,
           (b.k IS NOT NULL) AS is_building,
           (s.k IS NOT NULL) AS is_big_spender
    FROM building b FULL OUTER JOIN big_spenders s ON b.k = s.k
    """,
)
def j_full_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    building = customer.where(F.col("c_mktsegment") == "BUILDING").select(
        F.col("c_custkey").alias("bk")
    )
    spenders = (
        orders.where(F.col("o_totalprice") > 100000).select(F.col("o_custkey").alias("sk")).distinct()
    )
    return building.join(spenders, building.bk == spenders.sk, "full_outer").select(
        F.coalesce("bk", "sk").alias("custkey"),
        F.col("bk").isNotNull().alias("is_building"),
        F.col("sk").isNotNull().alias("is_big_spender"),
    )


@query(
    "j_semi_join",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'O')
    """,
)
def j_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "O")
    return customer.join(
        orders, customer.c_custkey == orders.o_custkey, "left_semi"
    ).select("c_custkey", "c_name")


@query(
    "j_anti_join",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
)
def j_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    return customer.join(
        orders, customer.c_custkey == orders.o_custkey, "left_anti"
    ).select("c_custkey", "c_name")


@query(
    "j_broadcast_dim_join",
    oracle="""
    SELECT r_name, count(*) AS n_customers,
           CAST(round(avg(c_acctbal), 4) AS DOUBLE) AS avg_bal
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name
    """,
)
def j_broadcast_dim_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit broadcast-hash join (J1 analog: partition→host map lookup).
    The dimension side ships to every task; no shuffle of the fact side."""
    customer = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    return (
        customer.join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.count("*").alias("n_customers"),
            F.round(F.avg("c_acctbal"), 4).alias("avg_bal"),
        )
    )


@query(
    "j_theta_range_join",
    oracle="""
    SELECT o_orderpriority, count(*) AS n_late
    FROM lineitem JOIN orders
      ON l_orderkey = o_orderkey
     AND l_shipdate > o_orderdate + INTERVAL 90 DAY
    GROUP BY o_orderpriority
    """,
)
def j_theta_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-join with an extra range/theta predicate (declared §2.3 surface)."""
    lineitem = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cond = (lineitem.l_orderkey == orders.o_orderkey) & (
        # timestamp + interval (not date_add, which truncates to DATE and
        # would diverge from the oracle on non-midnight timestamps)
        lineitem.l_shipdate
        > orders.o_orderdate + F.expr("INTERVAL 90 DAYS")
    )
    return (
        lineitem.join(orders, cond)
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n_late"))
    )


@query(
    "j_cross_join",
    oracle="""
    SELECT r_name, status, count(*) AS n
    FROM region CROSS JOIN (SELECT DISTINCT o_orderstatus AS status FROM orders)
    GROUP BY r_name, status
    """,
)
def j_cross_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = _t(spark, sf_dir, "region")
    status = _t(spark, sf_dir, "orders").select(
        F.col("o_orderstatus").alias("status")
    ).distinct()
    return region.crossJoin(status).groupBy("r_name", "status").agg(F.count("*").alias("n"))


def _asof_click_purchase(
    events, tolerance_expr: str | None = None, direction: str = "backward"
):
    """THE as-of kernel shared by j_asof_join / j_asof_tolerance_join /
    j_asof_forward_join (the _min_label_rounds precedent: one copy of
    the contract — the tie-break and the round-2 value channel — so a
    fix can never silently miss one entry). Returns (clicks, best):
    best is keyed on m_event_id with a struct of the most recent
    (``direction="backward"``, max_by on (p_ts, p_event_id)) or next
    upcoming (``"forward"``, min_by, p_ts > ts) qualifying purchase, or
    the closest in EITHER direction (``"nearest"``, min over exact
    integer |Δms| with (p_ts, p_event_id) tiebreak; tolerance
    mandatory); ``tolerance_expr`` (an INTERVAL SQL string) bounds
    staleness/wait — and join state at scale."""
    clicks = events.where(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    purchases = events.where(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user_id"),
        F.col("ts").alias("p_ts"),
        F.col("event_id").alias("p_event_id"),
        F.col("value").alias("p_value"),
    )
    if direction == "backward":
        cond = (clicks.user_id == purchases.p_user_id) & (
            purchases.p_ts < clicks.ts
        )
        if tolerance_expr is not None:
            cond = cond & (
                purchases.p_ts >= clicks.ts - F.expr(tolerance_expr)
            )
        pick = F.max_by
    elif direction == "forward":
        cond = (clicks.user_id == purchases.p_user_id) & (
            purchases.p_ts > clicks.ts
        )
        if tolerance_expr is not None:
            cond = cond & (
                purchases.p_ts <= clicks.ts + F.expr(tolerance_expr)
            )
        pick = F.min_by
    elif direction == "nearest":
        # nearest-in-time on EITHER side; tolerance is mandatory — an
        # unbounded nearest join holds unbounded range-join state
        if tolerance_expr is None:  # pragma: no cover - contract guard
            raise ValueError("nearest as-of requires tolerance_expr")
        cond = (
            (clicks.user_id == purchases.p_user_id)
            & (purchases.p_ts >= clicks.ts - F.expr(tolerance_expr))
            & (purchases.p_ts <= clicks.ts + F.expr(tolerance_expr))
        )
        # min over (|Δms| exact integer, p_ts, p_event_id) — the total
        # order that makes an equidistant before/after pair deterministic
        # (earlier purchase wins, then id)
        best = (
            clicks.join(purchases, cond)
            .groupBy(F.col("event_id").alias("m_event_id"))
            .agg(
                F.min_by(
                    F.struct(
                        "p_event_id",
                        "p_value",
                        F.expr(
                            "abs(unix_millis(p_ts) - unix_millis(ts))"
                        ).alias("d_ms"),
                    ),
                    F.struct(
                        F.expr(
                            "abs(unix_millis(p_ts) - unix_millis(ts))"
                        ).alias("d"),
                        F.col("p_ts").alias("o1"),
                        F.col("p_event_id").alias("o2"),
                    ),
                ).alias("best")
            )
        )
        return clicks, best
    else:  # pragma: no cover - contract guard
        raise ValueError(f"unknown as-of direction {direction!r}")
    best = (
        clicks.join(purchases, cond)
        .groupBy(F.col("event_id").alias("m_event_id"))
        .agg(
            pick(
                F.struct("p_event_id", "p_value"),
                F.struct("p_ts", "p_event_id"),
            ).alias("best")
        )
    )
    return clicks, best


@query(
    "j_asof_join",
    oracle="""
    WITH purchases AS (
      SELECT user_id, ts, event_id, value FROM events WHERE event_type = 'purchase'
    ), ranked AS (
      SELECT e.event_id,
             p.event_id AS purchase_event_id,
             CAST(round(p.value, 2) AS DOUBLE) AS purchase_value,
             row_number() OVER (
               PARTITION BY e.event_id ORDER BY p.ts DESC, p.event_id DESC
             ) AS rn
      FROM events e JOIN purchases p
        ON e.user_id = p.user_id AND p.ts < e.ts
      WHERE e.event_type = 'click'
    )
    SELECT event_id, purchase_event_id, purchase_value FROM ranked WHERE rn = 1
    """,
)
def j_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (custom operator the reference lacks; SURVEY custom-op
    guidance): attribute each click to the user's most recent prior purchase.
    Expressed as range join + max_by — at scale the range join is bounded by
    pre-bucketing both sides on (user_id, time bucket)."""
    events = _t(spark, sf_dir, "events")
    _, best = _asof_click_purchase(events)
    return best.select(
        F.col("m_event_id").alias("event_id"),
        F.col("best.p_event_id").alias("purchase_event_id"),
        F.round(F.col("best.p_value"), 2).alias("purchase_value"),
    )


@query(
    "j_asof_nearest_join",
    oracle="""
    WITH purchases AS (
      SELECT user_id, ts, event_id, value FROM events
      WHERE event_type = 'purchase'
    ), ranked AS (
      SELECT e.event_id,
             p.event_id AS purchase_event_id,
             CAST(round(p.value, 2) AS DOUBLE) AS purchase_value,
             CAST(abs(epoch_ms(p.ts) - epoch_ms(e.ts)) AS BIGINT) AS d_ms,
             row_number() OVER (
               PARTITION BY e.event_id
               ORDER BY abs(epoch_ms(p.ts) - epoch_ms(e.ts)), p.ts,
                        p.event_id
             ) AS rn
      FROM events e JOIN purchases p
        ON e.user_id = p.user_id
       AND p.ts >= e.ts - INTERVAL 1 DAY
       AND p.ts <= e.ts + INTERVAL 1 DAY
      WHERE e.event_type = 'click'
    )
    SELECT event_id, purchase_event_id, purchase_value, d_ms
    FROM ranked WHERE rn = 1
    """,
)
def j_asof_nearest_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-in-time as-of join — each click matched to the CLOSEST
    purchase on EITHER side within ±1 day, completing the as-of family
    (backward = most recent, forward = next upcoming, tolerance =
    bounded-staleness backward, point-in-time = versioned; nearest is
    the sensor-alignment/pandas merge_asof(direction='nearest') shape).
    Distance is the EXACT integer |Δms| (unix_millis ≡ epoch_ms), so
    the pick needs no rounding channel; an equidistant before/after
    pair resolves deterministically by (p_ts, p_event_id) — earlier
    purchase wins. The mandatory tolerance is also what bounds range-
    join state at 100 TB (the j_asof_tolerance_join argument). Shares
    THE _asof_click_purchase kernel."""
    events = _t(spark, sf_dir, "events")
    _, best = _asof_click_purchase(
        events, "INTERVAL 1 DAY", direction="nearest"
    )
    return best.select(
        F.col("m_event_id").alias("event_id"),
        F.col("best.p_event_id").alias("purchase_event_id"),
        F.round(F.col("best.p_value"), 2).alias("purchase_value"),
        F.col("best.d_ms").cast("long").alias("d_ms"),
    )


# --------------------------------------------------------------------------
# Aggregations (§2.4)
# --------------------------------------------------------------------------


@query(
    "a_groupby_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(round(sum(l_quantity), 2) AS DOUBLE) AS sum_qty,
           CAST(round(sum(l_extendedprice), 2) AS DOUBLE) AS sum_base_price,
           CAST(round(sum(l_extendedprice * (1 - l_discount)), 2) AS DOUBLE) AS sum_disc_price,
           CAST(round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS DOUBLE) AS sum_charge,
           CAST(round(avg(l_quantity), 4) AS DOUBLE) AS avg_qty,
           CAST(round(avg(l_extendedprice), 4) AS DOUBLE) AS avg_price,
           CAST(round(avg(l_discount), 4) AS DOUBLE) AS avg_disc,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def a_groupby_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shaped pricing summary: partial+final hash agg, all JVM-side."""
    li = _t(spark, sf_dir, "lineitem").where(F.col("l_shipdate") <= "1998-09-02")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
        F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
        F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
        F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
        F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
        F.round(F.avg("l_discount"), 4).alias("avg_disc"),
        F.count("*").alias("count_order"),
    )


@query(
    "a_count_distinct",
    oracle="""
    SELECT o_orderstatus,
           count(DISTINCT o_custkey) AS n_customers,
           count(*) AS n_orders
    FROM orders GROUP BY o_orderstatus
    """,
)
def a_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .agg(
            F.count_distinct("o_custkey").alias("n_customers"),
            F.count("*").alias("n_orders"),
        )
    )


@query("a_approx_count_distinct")
def a_approx_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL++ sketch counting (S4 approximateNumEntries analog). No oracle —
    sketch estimates are implementation-specific (rows-only check); exactness
    is covered by a_count_distinct."""
    return (
        _t(spark, sf_dir, "lineitem")
        .agg(
            F.approx_count_distinct("l_orderkey").alias("approx_orders"),
            F.approx_count_distinct("l_partkey").alias("approx_parts"),
        )
    )


@query(
    "a_rollup",
    oracle="""
    SELECT r_name, n_name, count(*) AS n_customers,
           CAST(round(sum(c_acctbal), 2) AS DOUBLE) AS total_bal
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY ROLLUP (r_name, n_name)
    """,
)
def a_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    return (
        customer.join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .rollup("r_name", "n_name")
        .agg(
            F.count("*").alias("n_customers"),
            F.round(F.sum("c_acctbal"), 2).alias("total_bal"),
        )
    )


@query(
    "a_cube",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(round(sum(l_quantity), 2) AS DOUBLE) AS sum_qty,
           count(*) AS n
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def a_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "lineitem")
        .cube("l_returnflag", "l_linestatus")
        .agg(F.round(F.sum("l_quantity"), 2).alias("sum_qty"), F.count("*").alias("n"))
    )


@query(
    "a_grouping_sets",
    oracle="""
    SELECT o_orderstatus, o_orderpriority, count(*) AS n
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
    """,
)
def a_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    orders.createOrReplaceTempView("_gs_orders")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority, count(*) AS n
        FROM _gs_orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
        """
    )


@query(
    "a2_latest_per_key",
    oracle="""
    SELECT user_id, event_id AS last_event_id, event_type AS last_event_type,
           CAST(round(value, 2) AS DOUBLE) AS last_value
    FROM (
      SELECT *, row_number() OVER (
        PARTITION BY user_id ORDER BY ts DESC, event_id DESC
      ) AS rn FROM events
    ) WHERE rn = 1
    """,
)
def a2_latest_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest-per-key compaction (A2/S1): the KTable materialization analog
    (SurgeStateStoreConsumer.scala:57-76). max_by(struct) does one shuffle +
    partial/final agg — cheaper than the window-function formulation because
    it avoids a total sort per key."""
    events = _t(spark, sf_dir, "events")
    return (
        events.groupBy("user_id")
        .agg(
            F.max_by(
                F.struct("event_id", "event_type", "value"), F.struct("ts", "event_id")
            ).alias("last")
        )
        .select(
            "user_id",
            F.col("last.event_id").alias("last_event_id"),
            F.col("last.event_type").alias("last_event_type"),
            F.round(F.col("last.value"), 2).alias("last_value"),
        )
    )


@query(
    "a8_grouped_collect",
    oracle="""
    SELECT user_id,
           string_agg(CAST(event_id AS VARCHAR), ',' ORDER BY event_id) AS event_ids,
           count(*) AS n
    FROM events WHERE event_type = 'purchase'
    GROUP BY user_id
    """,
)
def a8_grouped_collect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped key→records map (A8): inFlight.groupBy(key),
    KafkaProducerActorImpl.scala:604-606. The grouped list is emitted as a
    sorted comma-joined string (not array<string>) so correctness harnesses
    that hash column values can canonicalize it."""
    return (
        _t(spark, sf_dir, "events")
        .where(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(
            F.array_join(F.sort_array(F.collect_list("event_id")), ",").alias(
                "event_ids"
            ),
            F.count("*").alias("n"),
        )
    )


# --------------------------------------------------------------------------
# Window functions (§2.5 declared surface, §2.6 top-k)
# --------------------------------------------------------------------------


@query(
    "w_topk_per_key",
    oracle="""
    SELECT c_custkey, o_orderkey, CAST(rn AS INT) AS rn
    FROM (
      SELECT o_custkey AS c_custkey, o_orderkey,
             row_number() OVER (
               PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey
             ) AS rn
      FROM orders
    ) WHERE rn <= 3
    """,
)
def w_topk_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k per key (§2.6): row_number + filter; Spark pushes a per-partition
    top-k (WindowGroupLimit) before the shuffle, so this scales."""
    orders = _t(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 3)
        .select(F.col("o_custkey").alias("c_custkey"), "o_orderkey", "rn")
    )


@query(
    "w_rank_dense_rank",
    oracle="""
    SELECT o_orderkey,
           CAST(rank() OVER (PARTITION BY o_orderstatus ORDER BY o_totalprice DESC) AS INT) AS price_rank,
           CAST(dense_rank() OVER (PARTITION BY o_orderstatus ORDER BY o_totalprice DESC) AS INT) AS price_dense_rank
    FROM orders WHERE o_totalprice > 400000
    """,
)
def w_rank_dense_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders").where(F.col("o_totalprice") > 400000)
    w = W.partitionBy("o_orderstatus").orderBy(F.desc("o_totalprice"))
    return orders.select(
        "o_orderkey",
        F.rank().over(w).alias("price_rank"),
        F.dense_rank().over(w).alias("price_dense_rank"),
    )


@query(
    "w_lag_lead",
    oracle="""
    SELECT event_id, user_id,
           CAST(round(value - lag(value) OVER w, 4) AS DOUBLE) AS delta_prev,
           CAST(round(lead(value) OVER w - value, 4) AS DOUBLE) AS delta_next
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def w_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = _t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    return events.select(
        "event_id",
        "user_id",
        F.round(F.col("value") - F.lag("value").over(w), 4).alias("delta_prev"),
        F.round(F.lead("value").over(w) - F.col("value"), 4).alias("delta_next"),
    )


@query(
    "w_running_sum_frame",
    oracle="""
    SELECT o_orderkey, o_custkey,
           CAST(round(sum(o_totalprice) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ), 2) AS DOUBLE) AS running_spend
    FROM orders
    """,
)
def w_running_sum_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return orders.select(
        "o_orderkey",
        "o_custkey",
        F.round(F.sum("o_totalprice").over(w), 2).alias("running_spend"),
    )


@query(
    "w_range_frame",
    oracle="""
    SELECT o_orderkey, o_custkey,
           count(*) OVER (
             PARTITION BY o_custkey ORDER BY epoch(o_orderdate)
             RANGE BETWEEN 7776000 PRECEDING AND CURRENT ROW
           ) AS orders_last_90d
    FROM orders
    """,
)
def w_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rangeBetween frame: trailing-90-day order count per customer."""
    orders = _t(spark, sf_dir, "orders").withColumn(
        "epoch_s", F.unix_timestamp("o_orderdate")
    )
    w = (
        W.partitionBy("o_custkey")
        .orderBy("epoch_s")
        .rangeBetween(-90 * 86400, W.currentRow)
    )
    return orders.select(
        "o_orderkey", "o_custkey", F.count("*").over(w).alias("orders_last_90d")
    )


# --------------------------------------------------------------------------
# Sorts / limits (§2.6)
# --------------------------------------------------------------------------


@query(
    "o_orderby_limit",
    oracle="""
    SELECT o_orderkey, CAST(round(o_totalprice, 2) AS DOUBLE) AS o_totalprice
    FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 20
    """,
)
def o_orderby_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-N: Spark plans TakeOrderedAndProject (per-partition top-N +
    merge), never a full sort — the shape that survives 100 TB."""
    return (
        _t(spark, sf_dir, "orders")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(20)
        .select("o_orderkey", F.round("o_totalprice", 2).alias("o_totalprice"))
    )


@query(
    "o_global_sort",
    oracle="""
    SELECT o_orderkey, o_orderdate,
           CAST(round(o_totalprice, 2) AS DOUBLE) AS o_totalprice
    FROM orders ORDER BY o_orderdate, o_orderkey
    """,
)
def o_global_sort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full globally-ordered output (no LIMIT) — the one sort shape
    TakeOrdered can't cover. Spark samples the sort key to build range
    boundaries (Exchange rangepartitioning) so every partition sorts an
    even, disjoint key range in parallel and the output is globally
    ordered by concatenation — the distributed external-sort shape that
    holds at 100 TB (each range sorts/spills independently; no single-node
    merge). Tie-broken by key so the order is total. Pinned in
    tests/test_plans.py: the exchange must be rangepartitioning, not a
    single-partition sort."""
    return (
        _t(spark, sf_dir, "orders")
        .orderBy(F.asc("o_orderdate"), F.asc("o_orderkey"))
        .select(
            "o_orderkey",
            "o_orderdate",
            F.round("o_totalprice", 2).alias("o_totalprice"),
        )
    )


def _zspread_sql(col: str) -> str:
    """Morton bit-spread of a 16-bit value into even bit positions — the
    classic magic-number cascade, pure integer arithmetic identical in
    Spark SQL and DuckDB (both BIGINT ops)."""
    x = f"({col} & 65535)"
    x = f"(({x} | ({x} << 8)) & 16711935)"  # 0x00FF00FF
    x = f"(({x} | ({x} << 4)) & 252645135)"  # 0x0F0F0F0F
    x = f"(({x} | ({x} << 2)) & 858993459)"  # 0x33333333
    x = f"(({x} | ({x} << 1)) & 1431655765)"  # 0x55555555
    return x


@query(
    "o_zorder_layout",
    oracle=f"""
    WITH s AS (
      SELECT min(l_orderkey) AS ok_lo, max(l_orderkey) AS ok_hi,
             min(l_partkey) AS pk_lo, max(l_partkey) AS pk_hi
      FROM lineitem
    ),
    r AS (
      SELECT l_orderkey, l_partkey,
             (l_orderkey - s.ok_lo) * 256 // (s.ok_hi - s.ok_lo + 1) AS rx,
             (l_partkey - s.pk_lo) * 256 // (s.pk_hi - s.pk_lo + 1) AS ry
      FROM lineitem, s
    ),
    z AS (
      SELECT l_orderkey, l_partkey,
             ({_zspread_sql('rx')} | ({_zspread_sql('ry')} << 1)) AS zval
      FROM r
    ),
    b AS (SELECT *, zval >> 10 AS zbucket FROM z)
    SELECT CAST(zbucket AS INT) AS zbucket, count(*) AS n,
           min(l_orderkey) AS min_ok, max(l_orderkey) AS max_ok,
           min(l_partkey) AS min_pk, max(l_partkey) AS max_pk
    FROM b GROUP BY zbucket ORDER BY zbucket
    """,
)
def o_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) clustering over two scan dimensions — the
    data-layout primitive behind multi-dimensional file skipping (Delta
    OPTIMIZE ZORDER BY): each column maps to an 8-bit equi-width domain
    coordinate from its global min/max (ONE partial+final agg broadcast
    back — integer math, deterministic, engine-portable; Delta itself
    uses sampling-based range ids, which are rank-robust under skew but
    nondeterministic — the trade is documented, and a global-ntile rank
    form was REJECTED because a total-order window is a single-partition
    pass at 100 TB), the two coordinates bit-interleave via the
    magic-number spread cascade (pure BIGINT arithmetic, mirrored
    textually in DuckDB — full value oracle), and rows group into 64
    z-ranges. Every z-range has a TIGHT min/max envelope on BOTH columns
    at once — a plain sort clusters only its leading column, so a
    predicate on the other dimension prunes nothing. Output: per-z-range
    populations and their two-dimensional envelopes — the skipping
    statistics a lakehouse writer persists per file (envelope tightness
    vs a linear sort pinned quantitatively in tests/test_layout.py).
    Everything after the stats agg is map-side until the 64-key rollup."""
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    stats = li.agg(
        F.min("l_orderkey").alias("ok_lo"),
        F.max("l_orderkey").alias("ok_hi"),
        F.min("l_partkey").alias("pk_lo"),
        F.max("l_partkey").alias("pk_hi"),
    )
    # integer `div`, not double `/`+cast: double rounding at an integer
    # boundary could disagree with DuckDB's exact BIGINT `//`
    r = li.crossJoin(F.broadcast(stats)).select(
        "l_orderkey",
        "l_partkey",
        F.expr("(l_orderkey - ok_lo) * 256 div (ok_hi - ok_lo + 1)").alias("rx"),
        F.expr("(l_partkey - pk_lo) * 256 div (pk_hi - pk_lo + 1)").alias("ry"),
    )
    z = r.select(
        "l_orderkey",
        "l_partkey",
        F.expr(f"{_zspread_sql('rx')} | ({_zspread_sql('ry')} << 1)").alias(
            "zval"
        ),
    )
    return (
        z.withColumn("zbucket", F.shiftright("zval", 10).cast("int"))
        .groupBy("zbucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("l_orderkey").alias("min_ok"),
            F.max("l_orderkey").alias("max_ok"),
            F.min("l_partkey").alias("min_pk"),
            F.max("l_partkey").alias("max_pk"),
        )
        .orderBy("zbucket")
    )


# --------------------------------------------------------------------------
# Set operations (§2.7)
# --------------------------------------------------------------------------


@query(
    "set_union",
    oracle="""
    SELECT k, count(*) AS n FROM (
      SELECT c_custkey AS k FROM customer WHERE c_mktsegment = 'BUILDING'
      UNION ALL
      SELECT c_custkey AS k FROM customer WHERE c_acctbal > 5000
    ) GROUP BY k
    """,
)
def set_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = _t(spark, sf_dir, "customer")
    a = customer.where(F.col("c_mktsegment") == "BUILDING").select(
        F.col("c_custkey").alias("k")
    )
    b = customer.where(F.col("c_acctbal") > 5000).select(F.col("c_custkey").alias("k"))
    return a.unionByName(b).groupBy("k").agg(F.count("*").alias("n"))


@query(
    "set_intersect",
    oracle="""
    SELECT c_custkey AS k FROM customer WHERE c_mktsegment = 'BUILDING'
    INTERSECT
    SELECT c_custkey AS k FROM customer WHERE c_acctbal > 2000
    """,
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = _t(spark, sf_dir, "customer")
    a = customer.where(F.col("c_mktsegment") == "BUILDING").select(
        F.col("c_custkey").alias("k")
    )
    b = customer.where(F.col("c_acctbal") > 2000).select(F.col("c_custkey").alias("k"))
    return a.intersect(b)


@query(
    "set_except",
    oracle="""
    SELECT c_custkey AS k FROM customer WHERE c_acctbal > 0
    EXCEPT
    SELECT o_custkey AS k FROM orders
    """,
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    a = customer.where(F.col("c_acctbal") > 0).select(F.col("c_custkey").alias("k"))
    b = orders.select(F.col("o_custkey").alias("k"))
    return a.subtract(b)  # EXCEPT DISTINCT, one operator


# --------------------------------------------------------------------------
# Scalar functions (§2.8 / F1-F6)
# --------------------------------------------------------------------------


@query(
    "f_string_functions",
    oracle="""
    SELECT c_custkey,
           upper(c_name) AS name_upper,
           substr(c_name, 1, 8) AS name_prefix,
           concat(c_mktsegment, '#', CAST(c_custkey AS VARCHAR)) AS seg_key,
           CAST(length(c_name) AS INT) AS name_len,
           CAST(len(string_split(c_name, '#')) AS INT) AS n_parts,
           trim(c_mktsegment) AS seg_trim
    FROM customer
    """,
)
def f_string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.upper("c_name").alias("name_upper"),
        F.substring("c_name", 1, 8).alias("name_prefix"),
        F.concat(F.col("c_mktsegment"), F.lit("#"), F.col("c_custkey").cast("string")).alias(
            "seg_key"
        ),
        F.length("c_name").alias("name_len"),
        F.size(F.split("c_name", "#")).alias("n_parts"),
        F.trim(F.col("c_mktsegment")).alias("seg_trim"),
    )


@query(
    "f_datetime_functions",
    oracle="""
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS INT) AS order_year,
           CAST(month(o_orderdate) AS INT) AS order_month,
           CAST(quarter(o_orderdate) AS INT) AS order_quarter,
           date_trunc('month', o_orderdate) AS order_month_start,
           CAST(epoch_ms(o_orderdate) AS BIGINT) AS order_epoch_ms,
           CAST(datediff('day', TIMESTAMP '1995-01-01', o_orderdate) AS INT) AS days_since_95
    FROM orders WHERE o_orderkey <= 200
    """,
)
def f_datetime_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time surface incl. epoch-millis window-bound arithmetic (F5,
    Window.scala:16-28)."""
    o = _t(spark, sf_dir, "orders").where(F.col("o_orderkey") <= 200)
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month"),
        F.quarter("o_orderdate").alias("order_quarter"),
        F.date_trunc("month", "o_orderdate").alias("order_month_start"),
        F.unix_millis(F.col("o_orderdate").cast("timestamp")).alias("order_epoch_ms"),
        F.datediff(F.col("o_orderdate"), F.lit("1995-01-01").cast("date")).alias(
            "days_since_95"
        ),
    )


@query(
    "f_math_functions",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CAST(round(l_extendedprice, 1) AS DOUBLE) AS price_r1,
           CAST(abs(l_discount - 0.05) AS DOUBLE) AS disc_dev,
           CAST(floor(l_quantity) AS BIGINT) AS qty_floor,
           CAST(ceil(l_quantity / 10) AS BIGINT) AS qty_bucket,
           CAST(round(power(1 + l_tax, 2), 6) AS DOUBLE) AS tax_sq,
           CAST(round(sqrt(l_extendedprice), 6) AS DOUBLE) AS price_sqrt
    FROM lineitem WHERE l_orderkey <= 100
    """,
)
def f_math_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").where(F.col("l_orderkey") <= 100)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round("l_extendedprice", 1).alias("price_r1"),
        F.abs(F.col("l_discount") - 0.05).alias("disc_dev"),
        F.floor("l_quantity").alias("qty_floor"),
        F.ceil(F.col("l_quantity") / 10).alias("qty_bucket"),
        F.round(F.pow(1 + F.col("l_tax"), 2), 6).alias("tax_sq"),
        F.round(F.sqrt("l_extendedprice"), 6).alias("price_sqrt"),
    )


@query(
    "f_array_functions",
    oracle="""
    SELECT doc_id,
           CAST(len(string_split(text, ' ')) AS INT) AS n_tokens,
           list_contains(string_split(text, ' '), 'spark') AS has_spark,
           array_to_string(list_sort(list_distinct(string_split(substr(text, 1, 40), ' '))), ',') AS head_vocab
    FROM documents WHERE doc_id < 100
    """,
)
def f_array_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents").where(F.col("doc_id") < 100)
    toks = F.split("text", " ")
    return d.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.array_contains(toks, "spark").alias("has_spark"),
        F.array_join(
            F.sort_array(F.array_distinct(F.split(F.substring("text", 1, 40), " "))), ","
        ).alias("head_vocab"),
    )


@query(
    "f_json_functions",
    oracle="""
    SELECT event_type,
           CAST(round(avg(CAST(json_extract_string(props, '$.k') AS DOUBLE)), 4) AS DOUBLE) AS avg_k,
           CAST(max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k
    FROM events GROUP BY event_type
    """,
)
def f_json_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON codec surface (F4): get_json_object over the props payload —
    the from_json/to_json analog of surge's user-side Play-JSON serdes."""
    e = _t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k")
    return e.groupBy("event_type").agg(
        F.round(F.avg(k.cast("double")), 4).alias("avg_k"),
        F.max(k.cast("long")).alias("max_k"),
    )


@query(
    "f_map_functions",
    oracle="""
    SELECT event_id,
           CAST(element_at(m, 'k')[1] AS INT) AS k_val,
           element_at(m, 'et')[1] AS et_val,
           CAST(len(map_keys(m)) AS INT) AS n_keys,
           array_to_string(list_sort(map_keys(m)), ',') AS keys_csv
    FROM (
      SELECT event_id,
             map(['k', 'et'], [json_extract_string(props, '$.k'), event_type]) AS m
      FROM events WHERE event_id < 500
    )
    """,
)
def f_map_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-type scalar surface (§2.8: map_keys / map_values / element_at) —
    the functions a MapType column like Kafka record headers needs. The map
    is built per-row from the props JSON + event_type, then inspected; the
    emitted columns are scalars so value-hashing harnesses can compare."""
    e = _t(spark, sf_dir, "events").where(F.col("event_id") < 500)
    m = F.map_concat(
        F.from_json("props", "map<string,string>"),
        F.create_map(F.lit("et"), F.col("event_type")),
    )
    return e.select(
        "event_id",
        F.element_at(m, "k").cast("int").alias("k_val"),
        F.element_at(m, "et").alias("et_val"),
        F.size(F.map_keys(m)).alias("n_keys"),
        F.array_join(F.sort_array(F.map_keys(m)), ",").alias("keys_csv"),
    )


@query(
    "f_json_struct_roundtrip",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS INT) AS k_parsed,
           to_json(struct_pack(
             k := CAST(json_extract_string(props, '$.k') AS INT) + 1,
             et := event_type
           )) AS enriched_json,
           CAST(json_extract_string(
             to_json(struct_pack(k := CAST(json_extract_string(props, '$.k') AS INT) + 1, et := event_type)),
             '$.k') AS INT) AS k_roundtrip
    FROM events WHERE event_id < 500
    """,
)
def f_json_struct_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F4 full JSON codec: from_json → typed struct → transform → to_json →
    parse back (the Play-JSON serde round-trip surge user code does,
    SurgeModel serdes). Byte-exact JSON output is part of the contract —
    both engines emit compact {"k":N,"et":"..."}."""
    e = _t(spark, sf_dir, "events").where(F.col("event_id") < 500)
    parsed = F.from_json("props", "k INT")
    enriched = F.struct(
        (parsed["k"] + 1).alias("k"), F.col("event_type").alias("et")
    )
    enriched_json = F.to_json(enriched)
    return e.select(
        "event_id",
        parsed["k"].alias("k_parsed"),
        enriched_json.alias("enriched_json"),
        F.get_json_object(enriched_json, "$.k").cast("int").alias("k_roundtrip"),
    )


@query(
    "f_conditional_functions",
    oracle="""
    SELECT c_custkey,
           CASE WHEN c_acctbal < 0 THEN 'overdrawn'
                WHEN c_acctbal < 1000 THEN 'low'
                WHEN c_acctbal < 5000 THEN 'mid'
                ELSE 'high' END AS bal_band,
           coalesce(nullif(c_mktsegment, 'BUILDING'), 'OTHER') AS seg_or_other
    FROM customer
    """,
)
def f_conditional_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.when(F.col("c_acctbal") < 0, "overdrawn")
        .when(F.col("c_acctbal") < 1000, "low")
        .when(F.col("c_acctbal") < 5000, "mid")
        .otherwise("high")
        .alias("bal_band"),
        F.coalesce(F.nullif("c_mktsegment", F.lit("BUILDING")), F.lit("OTHER")).alias(
            "seg_or_other"
        ),
    )


@query(
    "f_url_encode_actor",
    oracle="""
    SELECT event_id,
           replace(replace(replace(replace(
             event_type || ' actor/' || CAST(user_id AS VARCHAR) || '&v=1',
             '&', '%26'), '/', '%2F'), '=', '%3D'), ' ', '+') AS actor_path_encoded
    FROM events WHERE event_id < 200
    """,
)
def f_url_encode_actor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL-encode actor name (F3: KafkaProducerActor actor-path encoding).
    The oracle mirrors the encoding with a replace chain over the known
    charset (space, slash, ampersand) since DuckDB lacks url_encode."""
    e = _t(spark, sf_dir, "events").where(F.col("event_id") < 200)
    actor = F.concat(
        F.col("event_type"), F.lit(" actor/"), F.col("user_id"), F.lit("&v=1")
    )
    return e.select("event_id", F.url_encode(actor).alias("actor_path_encoded"))


@query("f_partition_for_key")
def f_partition_for_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Key→partition routing (F1: murmur3(key) % n, KafkaPartitioner.scala:8).
    Spark's hash() is murmur3-based but placement parity with Kafka's
    partitioner is not required (SURVEY §1.3) — only stable co-partitioning.
    No oracle: hash values are engine-specific (rows-only check)."""
    e = _t(spark, sf_dir, "events")
    key = F.concat_ws(":", F.col("user_id"), F.col("event_type"))
    part = F.pmod(F.hash(F.substring_index(key, ":", 1)), F.lit(32))
    return (
        e.select(part.alias("partition"))
        .groupBy("partition")
        .agg(F.count("*").alias("n"))
    )


# --------------------------------------------------------------------------
# SQL-level surface: subqueries, pivot, having, distinct
# --------------------------------------------------------------------------


def _view(spark: SparkSession, sf_dir: str, name: str, alias: str) -> None:
    load_table(spark, sf_dir, name).createOrReplaceTempView(alias)


@query(
    "q_exists_subquery",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE EXISTS (
      SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000
    )
    """,
)
def q_exists_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS — Catalyst rewrites it to a left-semi join."""
    _view(spark, sf_dir, "customer", "_sq_customer")
    _view(spark, sf_dir, "orders", "_sq_orders")
    return spark.sql(
        """
        SELECT c_custkey, c_name FROM _sq_customer c
        WHERE EXISTS (
          SELECT 1 FROM _sq_orders o
          WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000
        )
        """
    )


@query(
    "q_in_subquery",
    oracle="""
    SELECT o_orderkey, o_totalprice FROM orders
    WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'MACHINERY')
      AND o_orderstatus = 'F'
    """,
)
def q_in_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN-subquery predicate — Catalyst rewrites it to a left-semi join on
    the subquery keys (same physical shape as j_semi_join)."""
    _view(spark, sf_dir, "customer", "_in_customer")
    _view(spark, sf_dir, "orders", "_in_orders")
    return spark.sql(
        """
        SELECT o_orderkey, o_totalprice FROM _in_orders
        WHERE o_custkey IN (
          SELECT c_custkey FROM _in_customer WHERE c_mktsegment = 'MACHINERY'
        ) AND o_orderstatus = 'F'
        """
    )


@query(
    "q_scalar_subquery",
    oracle="""
    SELECT c_custkey,
           CAST(round(c_acctbal - (SELECT avg(c_acctbal) FROM customer), 4) AS DOUBLE)
             AS bal_vs_avg
    FROM customer WHERE c_acctbal > 5000
    """,
)
def q_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uncorrelated scalar subquery — one extra tiny job, broadcast as a
    literal into the main scan."""
    _view(spark, sf_dir, "customer", "_ss_customer")
    return spark.sql(
        """
        SELECT c_custkey,
               round(c_acctbal - (SELECT avg(c_acctbal) FROM _ss_customer), 4)
                 AS bal_vs_avg
        FROM _ss_customer WHERE c_acctbal > 5000
        """
    )


@query(
    "a_pivot",
    oracle="""
    SELECT l_returnflag,
           CAST(round(sum(CASE WHEN l_linestatus = 'O' THEN l_quantity END), 2) AS DOUBLE) AS O,
           CAST(round(sum(CASE WHEN l_linestatus = 'F' THEN l_quantity END), 2) AS DOUBLE) AS F
    FROM lineitem GROUP BY l_returnflag
    """,
)
def a_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot = group + conditional aggregation; explicit value list keeps it
    one pass (no values-discovery job)."""
    li = _t(spark, sf_dir, "lineitem")
    piv = (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(F.round(F.sum("l_quantity"), 2))
    )
    return piv.select("l_returnflag", F.col("O"), F.col("F"))


@query(
    "a_having",
    oracle="""
    SELECT o_custkey, count(*) AS n_orders,
           CAST(round(sum(o_totalprice), 2) AS DOUBLE) AS spend
    FROM orders GROUP BY o_custkey
    HAVING count(*) >= 12 AND sum(o_totalprice) > 1000000
    """,
)
def a_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("spend"),
            F.sum("o_totalprice").alias("_raw_spend"),
        )
        .where((F.col("n_orders") >= 12) & (F.col("_raw_spend") > 1000000))
        .drop("_raw_spend")
    )


@query(
    "o_distinct",
    oracle="""
    SELECT DISTINCT c_mktsegment, c_nationkey FROM customer
    """,
)
def o_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _t(spark, sf_dir, "customer").select("c_mktsegment", "c_nationkey").distinct()


from ..operators.dedup import DUCK_TOKENS_SQL as _DUCK_TOKENS_SQL


@query(
    "q_explode_tokens",
    oracle=f"""
    SELECT tok, count(*) AS n, count(DISTINCT doc_id) AS n_docs
    FROM (
      SELECT doc_id, unnest({_DUCK_TOKENS_SQL}) AS tok
      FROM documents
    ) WHERE tok <> ''
    GROUP BY tok
    """,
)
def q_explode_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Generator/UDTF surface (§2.10): explode a token array into rows —
    the lateral-view shape every inverted-index build uses. Map-side
    explode, one aggregation shuffle."""
    from ..operators.dedup import tokens

    docs = _t(spark, sf_dir, "documents")
    return (
        docs.select("doc_id", F.explode(tokens("text")).alias("tok"))
        .where(F.col("tok") != "")
        .groupBy("tok")
        .agg(F.count("*").alias("n"), F.count_distinct("doc_id").alias("n_docs"))
    )


@query(
    "a_exact_percentiles",
    oracle="""
    SELECT l_returnflag,
           CAST(round(quantile_cont(l_extendedprice, 0.25), 4) AS DOUBLE) AS p25,
           CAST(round(quantile_cont(l_extendedprice, 0.50), 4) AS DOUBLE) AS p50,
           CAST(round(quantile_cont(l_extendedprice, 0.75), 4) AS DOUBLE) AS p75,
           CAST(round(quantile_cont(l_extendedprice, 0.95), 4) AS DOUBLE) AS p95
    FROM lineitem GROUP BY l_returnflag
    """,
)
def a_exact_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact linear-interpolated percentiles per group (Spark `percentile`
    ≡ DuckDB `quantile_cont`, rank = p·(n-1)) — the fully-checkable
    counterpart of a_approx_count_distinct's sketch surface. Exact
    percentile holds the group's values; at 100 TB switch to
    approx_percentile with a bounded error budget — this entry pins the
    exact semantics the sketch is graded against."""
    li = _t(spark, sf_dir, "lineitem")
    pcts = F.percentile(
        "l_extendedprice", F.array(*[F.lit(p) for p in (0.25, 0.50, 0.75, 0.95)])
    )
    agg = li.groupBy("l_returnflag").agg(pcts.alias("_p"))
    return agg.select(
        "l_returnflag",
        *[
            F.round(F.col("_p")[i], 4).alias(name)
            for i, name in enumerate(["p25", "p50", "p75", "p95"])
        ],
    )


@query(
    "w_ntile_cume_dist",
    oracle="""
    SELECT c_custkey, c_mktsegment,
           CAST(ntile(4) OVER w AS INT) AS quartile,
           CAST(round(percent_rank() OVER w, 6) AS DOUBLE) AS pct_rank,
           CAST(round(cume_dist() OVER w, 6) AS DOUBLE) AS cume
    FROM customer
    WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
    """,
)
def w_ntile_cume_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-rank window functions (ntile / percent_rank /
    cume_dist) — the §2.5 analytic surface beyond rank/dense_rank. Ordering
    includes the key so ties can't make the frame nondeterministic."""
    from pyspark.sql import Window

    w = Window.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    return _t(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_mktsegment",
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
    )


@query(
    "set_intersect_all",
    oracle="""
    SELECT o_custkey AS k FROM orders WHERE o_orderstatus = 'F'
    INTERSECT ALL
    SELECT o_custkey AS k FROM orders WHERE o_totalprice > 100000
    """,
)
def set_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL — multiset semantics (min of per-side multiplicities),
    one shuffle on the full row as key."""
    orders = _t(spark, sf_dir, "orders")
    a = orders.where(F.col("o_orderstatus") == "F").select(F.col("o_custkey").alias("k"))
    b = orders.where(F.col("o_totalprice") > 100000).select(F.col("o_custkey").alias("k"))
    return a.intersectAll(b)


@query(
    "set_except_all",
    oracle="""
    SELECT o_custkey AS k FROM orders WHERE o_orderstatus = 'F'
    EXCEPT ALL
    SELECT o_custkey AS k FROM orders WHERE o_totalprice > 100000
    """,
)
def set_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL — multiset difference (per-key multiplicity subtraction)."""
    orders = _t(spark, sf_dir, "orders")
    a = orders.where(F.col("o_orderstatus") == "F").select(F.col("o_custkey").alias("k"))
    b = orders.where(F.col("o_totalprice") > 100000).select(F.col("o_custkey").alias("k"))
    return a.exceptAll(b)


@query(
    "j_salted_skew_join",
    oracle="""
    SELECT o.o_orderkey, o.o_custkey AS k, c.c_mktsegment,
           CAST(round(o.o_totalprice, 2) AS DOUBLE) AS o_totalprice
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    """,
)
def j_salted_skew_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit hot-key salting: the fact side gains a stable row-hash salt,
    the dim side replicates across the salt range, and the join key becomes
    (key, salt) — spreading any hot customer over salt_buckets reducers.
    The oracle is the PLAIN join: salting must be invisible in the result,
    which is exactly the property that makes it safe to deploy at 100 TB
    (AQE skew-split covers sort-merge joins; this is the fallback for
    shuffled-hash builds and beyond)."""
    from ..operators.skew import salted_join

    orders = (
        _t(spark, sf_dir, "orders")
        .select("o_orderkey", F.col("o_custkey").alias("k"), "o_totalprice")
    )
    customer = _t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("k"), "c_mktsegment"
    )
    out = salted_join(orders, customer, "k", salt_buckets=8)
    return out.select(
        "o_orderkey", "k", "c_mktsegment",
        F.round("o_totalprice", 2).alias("o_totalprice"),
    )


# Haversine pieces, textually identical on both engines (every input is
# forced DOUBLE first, so no bare-decimal-literal channel exists)
_HAV_LAT = "CAST(c_custkey * 7 % 17000 AS DOUBLE) / 100.0 - 85.0"
_HAV_LON = "CAST(c_custkey * 13 % 36000 AS DOUBLE) / 100.0 - 180.0"
_HAV_KM = (
    "2 * 6371.0088 * asin(sqrt("
    "sin(radians(lat - 48.8566) / 2) * sin(radians(lat - 48.8566) / 2)"
    " + cos(radians(lat)) * cos(radians(48.8566))"
    " * sin(radians(lon - 2.3522) / 2) * sin(radians(lon - 2.3522) / 2)))"
)


@query(
    "f_geo_haversine",
    oracle=f"""
    WITH pts AS (
      SELECT c_custkey, {_HAV_LAT} AS lat, {_HAV_LON} AS lon
      FROM customer
    )
    SELECT c_custkey,
           CAST(round(lat, 2) AS DOUBLE) AS lat,
           CAST(round(lon, 2) AS DOUBLE) AS lon,
           CAST(round({_HAV_KM}, 3) AS DOUBLE) AS km_to_paris
    FROM pts
    """,
)
def f_geo_haversine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Great-circle distance (haversine) — the geo primitive every
    location-aware pipeline needs and the one math-function surface the
    f_ family lacked (radians/sin/cos/asin compose here; f_math covers
    the scalar basics): each customer gets a deterministic synthetic
    lat/lon from its key (exact integer modulus scaled through an
    EXPLICIT double cast — forcing DOUBLE first removes the
    decimal-literal channel on both engines), and the distance to a
    fixed point runs the textbook formula textually mirrored, round-3
    km. Pure map-side, no shuffle at any scale. Same doubles in → same
    doubles out (IEEE determinism), so the oracle value-checks every
    row."""
    c = _t(spark, sf_dir, "customer")
    pts = c.select(
        "c_custkey",
        F.expr(_HAV_LAT).alias("lat"),
        F.expr(_HAV_LON).alias("lon"),
    )
    return pts.select(
        "c_custkey",
        F.round("lat", 2).alias("lat"),
        F.round("lon", 2).alias("lon"),
        F.expr(f"CAST(round({_HAV_KM}, 3) AS DOUBLE)").alias("km_to_paris"),
    )


@query(
    "f_unpivot_stack",
    oracle="""
    WITH wide AS (
      SELECT l_returnflag,
             CAST(round(sum(l_quantity), 2) AS DOUBLE) AS sum_qty,
             CAST(round(sum(l_extendedprice), 2) AS DOUBLE) AS sum_price,
             CAST(count(*) AS DOUBLE) AS n_items
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag, 'sum_qty' AS metric, sum_qty AS value FROM wide
    UNION ALL
    SELECT l_returnflag, 'sum_price', sum_price FROM wide
    UNION ALL
    SELECT l_returnflag, 'n_items', n_items FROM wide
    """,
)
def f_unpivot_stack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT / melt — wide metric columns into (metric, value) rows via
    Spark's stack() generator: the reshape every metrics exporter and
    long-format BI feed needs, and the one relational surface the
    catalog lacked (PIVOT's inverse; grouping-sets/Expand cover the
    other direction). One aggregate builds the wide frame; stack() is a
    pure generator over it (no shuffle, no join — the inverse operation
    costs nothing at any scale). The oracle states the same reshape as
    UNION ALL — deliberately engine-neutral SQL rather than DuckDB's
    UNPIVOT syntax, so the mirrored text is the semantics, not a
    dialect feature. Values unified to DOUBLE (a stacked column has ONE
    type; the count casts on both sides)."""
    li = _t(spark, sf_dir, "lineitem")
    wide = li.groupBy("l_returnflag").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.round(F.sum("l_extendedprice"), 2).alias("sum_price"),
        F.count(F.lit(1)).cast("double").alias("n_items"),
    )
    return wide.selectExpr(
        "l_returnflag",
        "stack(3, 'sum_qty', sum_qty, 'sum_price', sum_price,"
        " 'n_items', n_items) AS (metric, value)",
    )


@query(
    "f_bitwise_functions",
    oracle="""
    SELECT o_orderkey,
           o_orderkey & 255 AS low_byte,
           o_orderkey | 4096 AS with_flag,
           xor(o_orderkey, 21845) AS xored,
           CAST(o_orderkey * 16 AS BIGINT) AS shifted,
           CAST(bit_count(o_orderkey) AS INT) AS popcount
    FROM orders WHERE o_orderkey <= 64
    """,
)
def f_bitwise_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise scalar surface (§2.8): and/or/xor/shift/popcount — the ops
    key-partitioners and bitmap filters are built from. shiftleft is
    mirrored as *16 in the oracle (DuckDB's << is INT128-typed; the
    multiply keeps both sides BIGINT)."""
    o = _t(spark, sf_dir, "orders").where(F.col("o_orderkey") <= 64)
    return o.select(
        "o_orderkey",
        F.col("o_orderkey").bitwiseAND(F.lit(255)).alias("low_byte"),
        F.col("o_orderkey").bitwiseOR(F.lit(4096)).alias("with_flag"),
        F.col("o_orderkey").bitwiseXOR(F.lit(21845)).alias("xored"),
        F.shiftleft("o_orderkey", 4).cast("bigint").alias("shifted"),
        F.bit_count("o_orderkey").alias("popcount"),
    )


@query(
    "q3_shipping_priority",
    oracle="""
    SELECT l.l_orderkey,
           CAST(round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS DOUBLE)
             AS revenue,
           o.o_orderdate, o.o_orderpriority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-07-01'
      AND l.l_shipdate > TIMESTAMP '1998-07-01'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, o.o_orderdate, l.l_orderkey
    LIMIT 10
    """,
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape (shipping priority): segment-filtered customers →
    date-split orders/lineitems → revenue per urgent order, top 10. The
    customer dimension broadcasts; lineitem (the fact) shuffles once, on
    the aggregate key; the top-10 is TakeOrdered (no global sort). The
    testdata has no o_shippriority column — o_orderpriority stands in.
    Rounded before ordering; full (revenue, date, key) tie-break so LIMIT
    is deterministic across engines."""
    # o_orderdate/l_shipdate read as TIMESTAMP_NTZ (parquet timestamp[us],
    # not UTC-adjusted): compare against an NTZ literal so the predicate is
    # wall-clock on ANY driver session timezone (pinned under Asia/Tokyo)
    cutoff = F.lit("1998-07-01").cast("timestamp_ntz")
    c = _t(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders").where(F.col("o_orderdate") < cutoff)
    li = _t(spark, sf_dir, "lineitem").where(F.col("l_shipdate") > cutoff)
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), F.asc("o_orderdate"), F.asc("l_orderkey"))
        .limit(10)
    )


@query(
    "q5_local_supplier_volume",
    oracle="""
    SELECT n.n_name AS nation,
           CAST(round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS DOUBLE)
             AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
                   AND c.c_nationkey = s.s_nationkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate < TIMESTAMP '1997-01-01'
    GROUP BY n.n_name
    ORDER BY revenue DESC, nation
    """,
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape (local supplier volume): revenue per nation where the
    ordering customer and the line's supplier share a nation, restricted
    to one region and one order year. The distinguishing feature is the
    NON-KEY equality ``c_nationkey = s_nationkey`` riding on the supplier
    join — the co-location predicate that makes Q5 the classic
    join-ordering benchmark. Plan shape: region→nation→supplier chain is
    all broadcast (dims); lineitem joins orders on the fact key, then the
    supplier broadcast carries both the key equality and the nation
    equality as one join condition (no separate filter stage); one
    partial+final aggregate on the five-nation key. Date bounds as NTZ
    literals (q3's timezone note)."""
    cut_lo = F.lit("1996-01-01").cast("timestamp_ntz")
    cut_hi = F.lit("1997-01-01").cast("timestamp_ntz")
    r = _t(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    n = _t(spark, sf_dir, "nation").join(
        F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey")
    )
    s = _t(spark, sf_dir, "supplier").join(
        F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey")
    )
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= cut_lo) & (F.col("o_orderdate") < cut_hi)
    )
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(
            F.broadcast(s),
            (li.l_suppkey == s.s_suppkey)
            & (c.c_nationkey == s.s_nationkey),
        )
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), F.asc("nation"))
    )


@query(
    "q18_large_orders",
    oracle="""
    SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_orderdate,
           CAST(round(o.o_totalprice, 2) AS DOUBLE) AS o_totalprice,
           CAST(round(sum(l.l_quantity), 2) AS DOUBLE) AS total_qty
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    GROUP BY c.c_custkey, c.c_name, o.o_orderkey, o.o_orderdate, o.o_totalprice
    HAVING round(sum(l.l_quantity), 2) > 250
    """,
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape (large-volume orders): orders whose line quantities
    sum past a threshold, with their customer. The right plan aggregates
    lineitem FIRST (partial+final on l_orderkey — the semi-join-sized
    reduction) and only then joins orders and the broadcast customer dim,
    so order rows never multiply through the line join."""
    li = _t(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.round(F.sum("l_quantity"), 2).alias("total_qty"))
        .where(F.col("total_qty") > 250)
    )
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    return (
        big.join(o, big.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            "o_orderdate",
            F.round("o_totalprice", 2).alias("o_totalprice"),
            "total_qty",
        )
    )


@query(
    "q6_forecast_revenue",
    oracle="""
    SELECT CAST(round(sum(l_extendedprice * l_discount), 2) AS DOUBLE)
             AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate < TIMESTAMP '1998-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape (forecast revenue change): a pure scan-filter-agg with
    no join — the pushdown showcase. All three predicates reach the parquet
    scan (PushedFilters), ReadSchema carries only the 4 referenced columns,
    and the aggregate is one partial+final pair producing a single row.
    Reference parity: the full-scan/aggregate path of S4
    (KafkaStreamsKeyValueStore.scala:28-68) with predicate fusion."""
    lo = F.lit("1997-01-01").cast("timestamp_ntz")
    hi = F.lit("1998-01-01").cast("timestamp_ntz")
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= lo)
        & (F.col("l_shipdate") < hi)
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    )
    return li.agg(
        F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias(
            "revenue"
        )
    )


@query(
    "q10_returned_items",
    oracle="""
    SELECT c.c_custkey, c.c_name,
           CAST(round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS DOUBLE)
             AS revenue,
           CAST(round(c.c_acctbal, 2) AS DOUBLE) AS c_acctbal,
           n.n_name
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE o.o_orderdate >= TIMESTAMP '1997-01-01'
      AND o.o_orderdate < TIMESTAMP '1997-04-01'
      AND l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
    ORDER BY revenue DESC, c.c_custkey
    LIMIT 20
    """,
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape (returned-item reporting): customers ranked by revenue
    lost to returns in one quarter. The quarter filter pushes into the
    orders scan and the returnflag filter into the lineitem scan BEFORE the
    fact join; customer and nation broadcast; the top-20 is TakeOrdered.
    c_custkey added to ORDER BY so LIMIT is deterministic across engines."""
    lo = F.lit("1997-01-01").cast("timestamp_ntz")
    hi = F.lit("1997-04-01").cast("timestamp_ntz")
    o = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= lo) & (F.col("o_orderdate") < hi)
    )
    li = _t(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .select(
            "c_custkey",
            "c_name",
            "revenue",
            F.round("c_acctbal", 2).alias("c_acctbal"),
            "n_name",
        )
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


@query(
    "q14_promo_revenue",
    oracle="""
    SELECT CAST(round(
             100.0 * sum(CASE WHEN p.p_type = 'PROMO'
                              THEN l.l_extendedprice * (1 - l.l_discount)
                              ELSE 0 END)
             / sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS DOUBLE)
             AS promo_pct
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-09-01'
      AND l.l_shipdate < TIMESTAMP '1997-10-01'
    """,
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape (promotion effect): share of one month's revenue from
    promo parts — the conditional-aggregation pattern (one pass, two sums,
    no self-join). The month filter prunes lineitem at the scan; part
    broadcasts keyed on p_partkey; both sums fold in the same partial+final
    aggregate. Testdata p_type is a flat enum, so equality stands in for
    TPC-H's 'PROMO%%' prefix."""
    lo = F.lit("1997-09-01").cast("timestamp_ntz")
    hi = F.lit("1997-10-01").cast("timestamp_ntz")
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= lo) & (F.col("l_shipdate") < hi)
    )
    p = _t(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .agg(
            F.round(
                100.0
                * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(0.0))
                / F.sum(rev),
                4,
            ).alias("promo_pct")
        )
    )


_PR_ITER = """
  SELECT s.dst AS node,
         (1 - 0.85) / (SELECT n FROM n) + 0.85 * sum(r.rank / d.deg) AS rank
  FROM sym s JOIN {prev} r ON s.src = r.node JOIN deg d ON s.src = d.src
  GROUP BY s.dst
"""


@query(
    "g_pagerank_parts",
    oracle=f"""
    WITH e0 AS (
      SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
      FROM lineitem a JOIN lineitem b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    ),
    sym AS (SELECT src, dst FROM e0 UNION SELECT dst AS src, src AS dst FROM e0),
    nodes AS (SELECT DISTINCT src AS node FROM sym),
    n AS (SELECT count(*) AS n FROM nodes),
    deg AS (SELECT src, count(*) AS deg FROM sym GROUP BY src),
    r0 AS (SELECT node, 1.0 / (SELECT n FROM n) AS rank FROM nodes),
    r1 AS ({_PR_ITER.format(prev="r0")}),
    r2 AS ({_PR_ITER.format(prev="r1")}),
    r3 AS ({_PR_ITER.format(prev="r2")}),
    ranked AS (
      SELECT node AS part, CAST(round(rank, 9) AS DOUBLE) AS rank,
             CAST(row_number() OVER (
               ORDER BY round(rank, 9) DESC, node
             ) AS INT) AS pos
      FROM r3
    )
    SELECT part, rank, pos FROM ranked WHERE pos <= 20
    """,
)
def g_pagerank_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-iteration PageRank (3 power iterations, d=0.85) over the
    part-co-occurrence graph — parts are linked when they appear in the
    same order, the market-basket graph a recommender builds from the same
    fact table. Iterative DataFrame algorithm with a FULL value oracle:
    fixing the iteration count makes both engines compute the identical
    (rounded) ranks, the same trick the fixed-centroid similarity entries
    use. Top-20 by rounded rank, node tie-break."""
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    a = li.withColumnsRenamed({"l_partkey": "src"})
    b = li.withColumnsRenamed({"l_partkey": "dst"})
    edges = (
        a.join(b, "l_orderkey")
        .where(F.col("src") < F.col("dst"))
        .select("src", "dst")
        .distinct()
    )
    from ..operators.graph import pagerank_fixed

    # edges is a DISTINCT canonical src<dst set by construction, so the
    # operator can skip its symmetrize-distinct pass (r16, guide §2.4)
    ranks = pagerank_fixed(edges, iters=3, damping=0.85, edges_unique=True)
    return (
        ranks.select(F.col("node").alias("part"), F.round("rank", 9).alias("rank"))
        .withColumn("pos", F.row_number().over(W.orderBy(F.desc("rank"), F.asc("part"))))
        .where(F.col("pos") <= 20)
    )


@query(
    "g_triangle_count",
    oracle="""
    WITH e0 AS (
      SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
      FROM lineitem a JOIN lineitem b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    ),
    tri AS (
      SELECT ab.src AS a, ab.dst AS b, bc.dst AS c
      FROM e0 ab
      JOIN e0 bc ON ab.dst = bc.src
      JOIN e0 ac ON ac.src = ab.src AND ac.dst = bc.dst
    ),
    nodes AS (
      SELECT a AS part FROM tri
      UNION ALL SELECT b FROM tri
      UNION ALL SELECT c FROM tri
    ),
    cnt AS (SELECT part, count(*) AS triangles FROM nodes GROUP BY part)
    SELECT part, triangles, pos FROM (
      SELECT part, triangles,
             CAST(row_number() OVER (ORDER BY triangles DESC, part) AS INT)
               AS pos
      FROM cnt
    ) WHERE pos <= 20
    """,
)
def g_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node triangle counting over the part-co-occurrence graph (same
    market-basket edges as g_pagerank_parts) — the clustering-coefficient
    numerator, the second classic graph-analytic beside PageRank.

    Degree-ordered node-iterator (Cohen 2009 / Suri-Vassilvitskii 2011):
    every undirected edge is directed from its lower-(degree, id) endpoint
    to the higher, wedges are pairs of out-edges of a shared source, and a
    wedge is a triangle iff the directed edge closing it exists. Under
    this orientation every out-degree is O(√m) regardless of hub size, so
    the wedge join is bounded even on power-law graphs. Measured at sf0.1:
    13.5 s id-oriented → 9.4 s degree-oriented (1.4×) — the co-occurrence
    graph is dense (20k nodes, 1.2M edges, mean degree ~120), so the
    irreducible m²/n wedge floor (~72M wedges) dominates and orientation
    trims only the skew tail; on a power-law corpus graph the same switch
    is the difference between finishing and not. Each triangle is found
    exactly once and credits its three corners via explode. The oracle
    keeps the simple a<b<c id-oriented form: orientation changes the
    plan, not the result.

    Scale shape: oriented-distinct edge reduction and the degree count
    are partial+final; the degree attach is a node-table join (broadcast
    at test scale, shuffle at 100 TB); wedges fan out MAP-SIDE from each
    tail's collected out-adjacency (orientation-bounded at O(√m) per
    row) and are probed against the byte-gated closing-edge broadcast in
    the same stage — the wedge stream itself is never exchanged. No
    driver state."""
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    a = li.withColumnsRenamed({"l_partkey": "src"})
    b = li.withColumnsRenamed({"l_partkey": "dst"})
    # r15 optimization: the edge/degree pipeline used to be RE-DERIVED by
    # every consumer (w1/w2/closing/deg unions renamed the frame BEFORE
    # their joins — the adamic-adar canonicalization trap), measured as
    # 30 lineitem scans / 32 exchanges in one plan. Checkpoint the edge
    # set and the oriented frame once; the wedge self-join uses the
    # ALIASED form so its two exchanges share one subtree.
    edges = (
        a.join(b, "l_orderkey")
        .where(F.col("src") < F.col("dst"))
        .select("src", "dst")
        .distinct()
        .localCheckpoint(eager=False)
    )
    deg = (
        edges.select(F.col("src").alias("v"))
        .unionAll(edges.select(F.col("dst").alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("deg"))
        .localCheckpoint(eager=False)
    )
    # byte-gated broadcasts (measured_broadcast — never an unconditional
    # hint on data-scaled frames): deg is |V| rows, closing |E| rows;
    # both fit far under 64 MB at bench scales and degrade to shuffle
    # joins at 100 TB, which is the correct scale behavior.
    deg_h, _ = measured_broadcast(deg, "v")
    with_deg = edges.join(
        deg_h.withColumnsRenamed({"v": "src", "deg": "dsrc"}), "src"
    ).join(deg_h.withColumnsRenamed({"v": "dst", "deg": "ddst"}), "dst")
    fwd = (F.col("dsrc") < F.col("ddst")) | (
        (F.col("dsrc") == F.col("ddst")) & (F.col("src") < F.col("dst"))
    )
    # directed edge tail -> head, head carrying its (deg, id) rank so the
    # wedge join can order its two heads without another deg lookup
    d = with_deg.select(
        F.when(fwd, F.col("src")).otherwise(F.col("dst")).alias("tail"),
        F.when(fwd, F.col("dst")).otherwise(F.col("src")).alias("head"),
        F.when(fwd, F.col("ddst")).otherwise(F.col("dsrc")).alias("dhead"),
    ).localCheckpoint(eager=False)
    closing = d.select(F.col("tail").alias("b"), F.col("head").alias("c"))
    # broadcasting the closing edge set means the ~m²/n wedge stream is
    # probed map-side and NEVER exchanged (the single biggest frame in
    # this plan — 72M rows at sf0.1 vs 1.2M edges)
    closing_h, _ = measured_broadcast(closing, "b")
    # r16 (VERDICT item 5): wedges are generated MAP-SIDE from each tail's
    # sorted out-adjacency (collect_list of (dhead, head) structs — the
    # struct sort IS the (dhead, head) wedge order the old self-join
    # predicate enforced, and structs stay overflow-free at any partkey
    # width, unlike a packed-long key) instead of the aliased self-join:
    # one groupBy(tail) exchange of |E| rows replaces the join's two
    # exchanges + SMJ machinery, and the 72M-wedge stream is emitted by a
    # codegen'd generate→probe→partial-agg stage with no join-row copies.
    # The _part_cooccurrence r15 precedent at wedge scale; out-adjacency
    # is orientation-bounded (O(√m) per tail) so the collected row stays
    # small at any SF. Interleaved A/B at sf0.1 (same d, fresh process,
    # both orders): self-join {7.43, 5.74, 7.85, 6.79} vs map-side struct
    # form {4.92, 4.46, 3.43} + packed probe {5.65, 5.34, 5.29, 6.28} —
    # map-side wins every paired rep; output proven identical (sorted
    # top-20 rows compared) before the switch.
    adj = d.groupBy("tail").agg(
        F.sort_array(F.collect_list(F.struct("dhead", "head"))).alias("A")
    )
    # the slice start is a posexplode POSITION + literal — named pos0 so
    # the int-arith audit's array-index bounded class covers it (it is
    # bounded by the adjacency array length, O(√m) under orientation)
    wedges = (
        adj.select("tail", "A", F.posexplode("A").alias("pos0", "h1"))
        .select(
            "tail",
            "h1",
            F.explode(F.expr("slice(A, pos0 + 2, size(A))")).alias("h2"),
        )
        .select(
            F.col("tail").alias("corner_a"),
            F.col("h1.head").alias("b"),
            F.col("h2.head").alias("c"),
        )
    )
    tri = wedges.join(closing_h, ["b", "c"])
    counts = (
        tri.select(F.explode(F.array("corner_a", "b", "c")).alias("part"))
        .groupBy("part")
        .agg(F.count(F.lit(1)).alias("triangles"))
    )
    return counts.withColumn(
        "pos", F.row_number().over(W.orderBy(F.desc("triangles"), F.asc("part")))
    ).where(F.col("pos") <= 20)


_LPA_ITER = """
      SELECT v AS node, label FROM (
        SELECT c.v, c.label,
               row_number() OVER (
                 PARTITION BY c.v ORDER BY c.cnt DESC, c.label
               ) AS rn
        FROM (
          SELECT s.src AS v, p.label, count(*) AS cnt
          FROM sym s JOIN {prev} p ON s.dst = p.node
          GROUP BY s.src, p.label
        ) c
      ) WHERE rn = 1
"""

# the 2-round LPA build (edges + symmetric closure + labels after two
# deterministic mode-of-neighbors rounds), shared by g_label_propagation
# and g_modularity — review-discipline factoring: the label rule and its
# tiebreak must evolve in lockstep across consumers
_LPA2_SQL = f"""e0 AS (
      SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
      FROM lineitem a JOIN lineitem b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    ),
    sym AS (SELECT src, dst FROM e0 UNION SELECT dst AS src, src AS dst FROM e0),
    l0 AS (SELECT DISTINCT src AS node, src AS label FROM sym),
    l1 AS ({_LPA_ITER.format(prev="l0")}),
    l2 AS ({_LPA_ITER.format(prev="l1")})"""


def _lpa2_labels(spark: SparkSession, sf_dir: str, checkpoint: bool = False):
    """(e0, sym, labels-after-2-rounds) over the part co-occurrence
    graph. ``checkpoint=True`` materializes e0 and the final labels for
    callers with multiple lazy consumers (modularity joins labels twice
    and reads e0 twice — unmaterialized, the 2-round build would re-run
    per consumer, the scan-amplification class)."""
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    a = li.withColumnsRenamed({"l_partkey": "src"})
    b = li.withColumnsRenamed({"l_partkey": "dst"})
    e0 = (
        a.join(b, "l_orderkey")
        .where(F.col("src") < F.col("dst"))
        .select("src", "dst")
        .distinct()
    )
    if checkpoint:
        e0 = e0.localCheckpoint(eager=False)
    sym = e0.unionByName(
        e0.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    labels = sym.select(F.col("src").alias("node")).distinct().withColumn(
        "label", F.col("node")
    )
    for _ in range(2):
        nbr = sym.join(labels, sym.dst == labels.node).select(
            F.col("src").alias("v"), "label"
        )
        counts = nbr.groupBy("v", "label").agg(F.count(F.lit(1)).alias("cnt"))
        labels = counts.groupBy("v").agg(
            F.max_by(
                F.col("label"), F.struct(F.col("cnt"), (-F.col("label")))
            ).alias("label")
        ).withColumnsRenamed({"v": "node"})
    if checkpoint:
        labels = labels.localCheckpoint(eager=False)
    return e0, sym, labels


@query(
    "g_label_propagation",
    oracle=f"""
    WITH {_LPA2_SQL},
    sizes AS (SELECT label AS community, count(*) AS n_members FROM l2 GROUP BY label)
    SELECT community, n_members, pos FROM (
      SELECT community, n_members,
             CAST(row_number() OVER (
               ORDER BY n_members DESC, community
             ) AS INT) AS pos
      FROM sizes
    ) WHERE pos <= 20
    """,
)
def g_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synchronous label propagation (Raghavan et al. 2007) over the part
    co-occurrence graph — community detection beside PageRank/triangles/
    connected components, 2 unrolled iterations with a FULL oracle (the
    g_pagerank_parts UNROLLED-CTE trick — fixed iteration count makes the
    iterative algorithm declarative). Labels start as node ids; each step
    every node adopts the MODE of its neighbors' labels, ties broken by
    the smallest label — fully deterministic, so both engines converge
    identically (async/randomized LPA variants are not portable). The
    argmax is one max_by(struct(cnt, -label)) aggregate per iteration —
    never a window sort over the neighbor stream. Per iteration: one join
    on node + one partial+final aggregate — 2 shuffles, the same budget
    as a pagerank step; label skew (a community going viral) is
    AQE-skew-split like any hot aggregate key. Output: top-20 communities
    by size. checkpoint=True materializes e0 + labels — unmaterialized,
    the three sym references in the 2-round chain re-derived the
    self-join pair build per reference (12 parquet scans in the final
    plan). Measured at sf0.1 (r15): lazy 10.6 s vs localCheckpoint
    10.4 s median-of-3 — a local tie, kept for the scan-count win at
    scale (the r11 LPA-converged precedent). A persist() variant's
    2.17 s 'median' was rejected as CacheManager cross-run reuse (see
    pagerank_fixed); its honest fresh-run time was 11.0 s."""
    _, _, labels = _lpa2_labels(spark, sf_dir, checkpoint=True)
    sizes = labels.groupBy(F.col("label").alias("community")).agg(
        F.count(F.lit(1)).alias("n_members")
    )
    return sizes.withColumn(
        "pos",
        F.row_number().over(W.orderBy(F.desc("n_members"), F.asc("community"))),
    ).where(F.col("pos") <= 20)


# converged-LPA oracle: the bounded-unroll trick — 10 synchronous rounds
# (measured fixpoint: 4 at sf0.001, 6 at sf0.01; post-fixpoint rounds are
# no-ops so a generous unroll stays equal), with the round count derived
# as the number of label-CHANGING rounds, matching lpa_converged's probe.
_LPA_CONV_UNROLL = 10
# rounds = count of label-CHANGING rounds (the Spark probe's convention),
# generated for rounds 1..N so the chain and the change count can't drift
_LPA_CONV_CHG_SQL = " + ".join(
    f"(CASE WHEN EXISTS (SELECT 1 FROM l{r} a JOIN l{r-1} b"
    " ON a.node = b.node AND a.label <> b.label) THEN 1 ELSE 0 END)"
    for r in range(1, _LPA_CONV_UNROLL + 1)
)
# the converged-LPA CTE chain (e0/sym/l0..lN/chg) WITHOUT a final select —
# shared by g_lpa_converged and g_modularity_converged
_LPA_CONV_CHAIN_SQL = (
    """e0 AS (
      SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
      FROM lineitem a JOIN lineitem b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    ),
    sym AS (SELECT src, dst FROM e0 UNION SELECT dst AS src, src AS dst FROM e0),
    l0 AS (SELECT DISTINCT src AS node, src AS label FROM sym),
"""
    + "".join(
        f"    l{r} AS ({_LPA_ITER.format(prev=f'l{r-1}')}),\n"
        for r in range(1, _LPA_CONV_UNROLL + 1)
    )
    + f"    chg AS (SELECT CAST({_LPA_CONV_CHG_SQL} AS INT) AS rounds)"
)
_LPA_CONV_ORACLE = f"""
    WITH {_LPA_CONV_CHAIN_SQL},
    sizes AS (
      SELECT label AS community, count(*) AS n_members
      FROM l{_LPA_CONV_UNROLL} GROUP BY label
    )
    SELECT community, n_members, pos, rounds FROM (
      SELECT community, n_members,
             CAST(row_number() OVER (
               ORDER BY n_members DESC, community
             ) AS INT) AS pos
      FROM sizes
    ) CROSS JOIN chg WHERE pos <= 20
    """


@query("g_lpa_converged", oracle=_LPA_CONV_ORACLE)
def g_lpa_converged(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Label propagation iterated to LABEL STABILITY (r10 VERDICT #7) —
    completes the fixpoint-graph family (kcore_converged, cc_converged)
    under the shared probe discipline: per-round localCheckpoint + one
    xxhash64-checksum aggregate action per round (operators.graph.
    lpa_converged). Deterministic mode (max_by(struct(cnt, -label)) — the
    a_mode_per_group trick, never a window) makes the entire trajectory a
    pure function of the graph, so the oracle can mirror CONVERGENCE with
    a bounded unroll: 10 SQL rounds cover the measured fixpoint (4 at
    sf0.001, 6 at sf0.01) and post-fixpoint rounds are no-ops; the
    oracle's rounds = count of label-changing rounds, exactly the Spark
    probe's convention. Output: top-20 communities + the rounds column
    (schedule-independent under synchronous updates, unlike cc's
    pointer-jump schedule — that entry must omit it)."""
    from surge_spark.operators.graph import lpa_converged

    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    a = li.withColumnsRenamed({"l_partkey": "src"})
    b = li.withColumnsRenamed({"l_partkey": "dst"})
    e0 = (
        a.join(b, "l_orderkey")
        .where(F.col("src") < F.col("dst"))
        .select("src", "dst")
        .distinct()
    )
    sym = e0.unionByName(
        e0.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).localCheckpoint(eager=False)
    # ^ the edge list is the CO-OCCURRENCE WEDGE JOIN — without the
    # barrier every LPA round re-evaluates it (plus distinct+union).
    # Honest A/B at sf0.1: NO local win (22-24 s both ways warm; the
    # per-round count+argmax mode aggregates over the dense ~|edges|
    # neighbor stream dominate, and the wedge join is one co-partitioned
    # pass beside them). Kept anyway: at 100 TB re-deriving the graph
    # ~10x is a scan-amplification bug regardless of what this host
    # measures — the entry's floor is the per-round aggregate budget,
    # documented as ~2.3 s/round x ~9 rounds here.
    labels, rounds = lpa_converged(sym, max_rounds=_LPA_CONV_UNROLL)
    sizes = labels.groupBy(F.col("label").alias("community")).agg(
        F.count(F.lit(1)).alias("n_members")
    )
    return (
        sizes.withColumn(
            "pos",
            F.row_number().over(W.orderBy(F.desc("n_members"), F.asc("community"))),
        )
        .where(F.col("pos") <= 20)
        .withColumn("rounds", F.lit(rounds).cast("int"))
    )


_WALK_STEP_SQL = """
      SELECT start, dst AS cur FROM (
        SELECT w.start, e.dst,
               row_number() OVER (
                 PARTITION BY w.start
                 ORDER BY md5('{step}:' || w.cur || ':' || e.dst), e.dst
               ) AS rn
        FROM {prev} w JOIN sym e ON e.src = w.cur
      ) WHERE rn = 1
"""


@query(
    "g_random_walks",
    oracle=f"""
    WITH e0 AS (
      SELECT DISTINCT 'o' || l_orderkey AS src, 'p' || l_partkey AS dst
      FROM lineitem
    ),
    sym AS (SELECT src, dst FROM e0 UNION ALL SELECT dst, src FROM e0),
    w0 AS (
      SELECT DISTINCT 'o' || o_orderkey AS start, 'o' || o_orderkey AS cur
      FROM orders WHERE o_orderkey % 97 = 0
    ),
    w1 AS ({_WALK_STEP_SQL.format(step=1, prev="w0")}),
    w2 AS ({_WALK_STEP_SQL.format(step=2, prev="w1")}),
    w3 AS ({_WALK_STEP_SQL.format(step=3, prev="w2")})
    SELECT w0.start, w1.cur AS n1, w2.cur AS n2, w3.cur AS n3
    FROM (SELECT DISTINCT start FROM w0) w0
    JOIN w1 ON w1.start = w0.start
    JOIN w2 ON w2.start = w0.start
    JOIN w3 ON w3.start = w0.start
    """,
)
def g_random_walks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic random walks on the order-part bipartite graph — the
    sampling primitive of node2vec/DeepWalk-style graph-embedding
    pipelines, made engine-portable: step t from node v goes to the
    neighbor minimizing md5('t:v:neighbor') (a hash IS the random number,
    the t_shuffle_shards trick), so both engines walk the identical
    paths and the entry carries a FULL oracle. Three unrolled steps from
    a scale-free seed set (every 97th order); per step one join on the
    current node + one per-walk argmin — the same 2-shuffle budget as a
    pagerank/LPA round, and walks stay one row each (no path blow-up).
    argmin = min(struct(hash, dst)) — a total order, never min_by on a
    possibly-tied key.

    NEGATIVE A/B (r15): the final three-way join references every
    hop's whole chain (step 3's plan nests steps 1-2, and each step
    re-reads sym = 2x e0) — 16 parquet scans in the final plan.
    Materializing e0/seeds/hops still measured WORSE at sf0.1: lazy
    4.37 s vs localCheckpoint 5.89 (stats lost) vs persist 8.04
    fresh-run (its 0.72 s 'median' was CacheManager cross-run reuse —
    see pagerank_fixed). The re-derived subtrees are column-pruned
    scans + keyed aggregates that pipeline; kept lazy."""
    li = _t(spark, sf_dir, "lineitem")
    e0 = li.select(
        F.concat(F.lit("o"), F.col("l_orderkey")).alias("src"),
        F.concat(F.lit("p"), F.col("l_partkey")).alias("dst"),
    ).distinct()
    sym = e0.unionAll(
        e0.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    o = _t(spark, sf_dir, "orders")
    seeds = (
        o.where(F.col("o_orderkey") % 97 == 0)
        .select(F.concat(F.lit("o"), F.col("o_orderkey")).alias("start"))
        .distinct()
    )
    cur = seeds.select("start", F.col("start").alias("cur"))
    hops = []
    for step in (1, 2, 3):
        h = F.md5(F.concat(F.lit(f"{step}:"), F.col("cur"), F.lit(":"), F.col("dst")))
        nxt = (
            cur.join(sym, cur.cur == sym.src)
            .groupBy("start")
            .agg(F.min(F.struct(h.alias("h"), F.col("dst").alias("d"))).alias("m"))
            .select("start", F.col("m.d").alias("cur"))
        )
        hops.append(nxt.withColumnRenamed("cur", f"n{step}"))
        cur = nxt
    out = seeds
    for hdf in hops:
        out = out.join(hdf, "start")
    return out.select("start", "n1", "n2", "n3")


@query(
    "g_negative_sampling",
    oracle="""
    WITH inter AS (
      SELECT DISTINCT o.o_custkey AS user_id, l.l_partkey AS item_id
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    ),
    np AS (SELECT count(*) AS n FROM part),
    cand AS (
      SELECT u.user_id, t.slot,
             CAST(('0x' || substring(md5(u.user_id || ':' || t.slot), 1, 15))
                  AS BIGINT) % np.n AS item_id
      FROM (SELECT DISTINCT user_id FROM inter) u
      CROSS JOIN (SELECT unnest(range(0, 12)) AS slot) t
      CROSS JOIN np
    ),
    negraw AS (
      SELECT c.user_id, c.item_id, c.slot
      FROM cand c ANTI JOIN inter i
        ON i.user_id = c.user_id AND i.item_id = c.item_id
    ),
    neg AS (
      SELECT user_id, item_id, min(slot) AS slot
      FROM negraw GROUP BY user_id, item_id
    )
    SELECT user_id, item_id, CAST(slot AS INT) AS slot, rank FROM (
      SELECT user_id, item_id, slot,
             CAST(row_number() OVER (
               PARTITION BY user_id ORDER BY slot
             ) AS INT) AS rank
      FROM neg
    ) WHERE rank <= 5
    """,
)
def g_negative_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic negative sampling for recsys training: 5 items per
    user the user did NOT interact with, drawn by hashing (user, slot)
    into the item-id space — the standard implicit-feedback negatives
    step, engine-portable because the hash IS the sampler. Shape at
    100 TB: candidates are |users| x 12 generated rows (never |users| x
    |items|), the interaction check is ONE anti join hash-partitioned on
    (user, item), and the keep-5 is a per-user WindowGroupLimit over 12
    rows. Over-provisioning 12 slots for k=5 makes a user losing all 5
    to collisions with their own interactions astronomically unlikely
    while keeping the fan-out constant; item ids are 0-based contiguous
    in this schema (part.p_partkey 0..N-1) so the modulo is the id map.
    Negatives are WITHOUT replacement per user: two slots hashing to the
    same item (28% of users at sf0.001's 200-item space) collapse to the
    earliest slot before the keep-5 rank, so the output is 5 DISTINCT
    non-interacted items. The md5-to-int uses 15 hex chars (< 2^60,
    overflow-safe) — the t_weighted_sample/t_shuffle_shards portability
    trick."""
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    inter = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .select(F.col("o_custkey").alias("user_id"), F.col("l_partkey").alias("item_id"))
        .distinct()
        # r15 optimization round: referenced by the user derive AND the
        # anti join — unmaterialized, the orders⋈lineitem + distinct ran
        # twice per run (5 scans -> 1 in the final plan)
        .localCheckpoint(eager=False)
    )
    n_parts = _t(spark, sf_dir, "part").agg(F.count(F.lit(1)).alias("n"))
    users = inter.select("user_id").distinct()
    cand = (
        users.crossJoin(F.broadcast(n_parts))
        .select(
            "user_id",
            F.explode(F.sequence(F.lit(0), F.lit(11))).alias("slot"),
            F.col("n"),
        )
        .select(
            "user_id",
            "slot",
            F.pmod(
                F.conv(
                    F.substring(
                        F.md5(F.concat(F.col("user_id"), F.lit(":"), F.col("slot"))),
                        1,
                        15,
                    ),
                    16,
                    10,
                ).cast("long"),
                F.col("n"),
            ).alias("item_id"),
        )
    )
    neg = (
        cand.join(inter, ["user_id", "item_id"], "left_anti")
        .groupBy("user_id", "item_id")
        .agg(F.min("slot").alias("slot"))
    )
    w = W.partitionBy("user_id").orderBy("slot")
    return (
        neg.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 5)
        .select("user_id", "item_id", F.col("slot").cast("int"), "rank")
    )


# DOULION sampling probability p=1/2 as an integer threshold on the first
# 8 md5 hex chars (uint32 space): keep iff value < p·2^32. Integer compare,
# no float rounding to drift between engines; estimate scale = 1/p³ = 8.
_DOULION_THRESH = 2_147_483_648
_DOULION_SCALE = 8


@query(
    "g_triangle_count_sampled",
    oracle=f"""
    WITH e0 AS (
      SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
      FROM lineitem a JOIN lineitem b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    ),
    s AS (
      SELECT * FROM e0
      WHERE CAST(('0x' || substr(md5('42:' || src || ':' || dst), 1, 8))
                 AS BIGINT) < {_DOULION_THRESH}
    ),
    tri AS (
      SELECT count(*) AS c FROM s ab
      JOIN s bc ON ab.dst = bc.src
      JOIN s ac ON ac.src = ab.src AND ac.dst = bc.dst
    )
    SELECT (SELECT count(*) FROM s) AS sampled_edges,
           (SELECT c FROM tri) AS sampled_triangles,
           (SELECT c FROM tri) * {_DOULION_SCALE} AS est_triangles
    """,
)
def g_triangle_count_sampled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DOULION (Tsourakakis et al., KDD'09) edge-sampled global triangle
    count beside the exact entry: keep each distinct co-occurrence edge
    with probability p=1/2 — decided by an md5 of (seed, src, dst), so the
    'coin flips' are a pure function of the edge and BOTH engines sample
    the identical subgraph (the t_weighted_sample / t_shuffle_shards
    md5-portability trick; DuckDB reads the hex via its '0x…'-cast) —
    count triangles on the sample, scale by 1/p³ (an unbiased estimator:
    a triangle survives iff its 3 edges all survive). Sampling at p cuts
    edges ~2× and wedge work ~p², so the simple id-oriented 3-join that
    OOMs a 1 GiB driver on the full sf0.1 graph (the exact entry needs a
    16 g driver there) runs comfortably — the memory-constrained and
    trillion-edge shape, where exact counting is off the table entirely.
    Dense graphs concentrate hard: measured error vs the exact count is
    0.03% at sf0.001 and 0.10% at sf0.01 (pinned ≤5% in
    tests/test_analytics.py). One row out: sampled edge count, sampled
    triangle count, and the 1/p³ estimate (integer scale — no float
    drift)."""
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    a = li.withColumnsRenamed({"l_partkey": "src"})
    b = li.withColumnsRenamed({"l_partkey": "dst"})
    key = F.md5(
        F.concat_ws(":", F.lit("42"), F.col("src").cast("string"), F.col("dst"))
    )
    sampled = (
        a.join(b, "l_orderkey")
        .where(F.col("src") < F.col("dst"))
        .select("src", "dst")
        .distinct()
        .where(
            F.conv(F.substring(key, 1, 8), 16, 10).cast("long")
            < F.lit(_DOULION_THRESH)
        )
        # NOTE (r15): a localCheckpoint(eager=False) here would dedupe the
        # four consumers' re-derivation BUT breaks the pinned
        # zero-jobs-at-plan-build contract — Dataset.checkpoint calls
        # queryExecution.toRdd, whose prepare() phase SUBMITS the
        # broadcast-exchange futures inside this subtree (measured: 2
        # withThreadLocalCaptured jobs at build). Left un-checkpointed.
    )
    # id-oriented 3-join, NOT the exact entry's degree orientation —
    # measured back-to-back at sf0.1 on the p=1/2 sample: id-oriented
    # 5.3-6.2 s vs degree-oriented 7.1-8.3 s. The co-occurrence graph is
    # near-regular (order sizes are uniform), so degree ordering cannot
    # trim wedges beyond the /2 both orientations get, and its degree
    # aggregate + two attach joins are pure overhead; on a power-law
    # graph the exact entry's orientation applies to the sample too.
    ab = sampled
    bc = sampled.withColumnsRenamed({"src": "bsrc", "dst": "bdst"})
    ac = sampled.withColumnsRenamed({"src": "asrc", "dst": "adst"})
    tri = (
        ab.join(bc, F.col("dst") == F.col("bsrc"))
        .join(
            ac,
            (F.col("asrc") == F.col("src")) & (F.col("adst") == F.col("bdst")),
        )
        .agg(F.count(F.lit(1)).alias("sampled_triangles"))
    )
    n_edges = sampled.agg(F.count(F.lit(1)).alias("sampled_edges"))
    return n_edges.crossJoin(tri).select(
        "sampled_edges",
        "sampled_triangles",
        (F.col("sampled_triangles") * F.lit(_DOULION_SCALE)).alias(
            "est_triangles"
        ),
    )


@query(
    "g_kcore_bipartite",
    oracle="""
    WITH e AS (
      SELECT DISTINCT 'o' || l_orderkey AS src, 'p' || l_partkey AS dst
      FROM lineitem
    ),
    sym AS (SELECT src, dst FROM e UNION ALL SELECT dst, src FROM e),
    deg0 AS (SELECT src AS node, count(*) AS d FROM sym GROUP BY src),
    keep0 AS (SELECT node FROM deg0 WHERE d >= 5),
    e1 AS (
      SELECT s.src, s.dst FROM sym s
      WHERE s.src IN (SELECT node FROM keep0)
        AND s.dst IN (SELECT node FROM keep0)
    ),
    deg1 AS (SELECT src AS node, count(*) AS d FROM e1 GROUP BY src),
    keep1 AS (SELECT node FROM deg1 WHERE d >= 5),
    e2 AS (
      SELECT s.src, s.dst FROM e1 s
      WHERE s.src IN (SELECT node FROM keep1)
        AND s.dst IN (SELECT node FROM keep1)
    )
    SELECT src AS node, CAST(count(*) AS BIGINT) AS degree
    FROM e2 GROUP BY src
    """,
)
def g_kcore_bipartite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-core peeling (k=5, two unrolled rounds) on the bipartite
    order–part graph — the standard k-core FILTERING step recommender
    pipelines run on user–item interactions before training (drop cold
    users/items, re-check, repeat). Same fixed-iteration-count trick as
    g_pagerank_parts / g_label_propagation: unrolling two peel rounds
    makes the surviving node set and degrees a pure function of the data,
    so the DuckDB oracle mirrors them exactly (full convergence is a
    driver loop over the same step; each round is one degree aggregate +
    one two-sided semi-join = 2 shuffles, and the bipartite edge list is
    O(lineitem), not the dense co-occurrence join the triangle entries
    pay). At sf0.01 round one peels ~20%% of nodes (16743 → 13485 at
    k=5); output = survivors after round two with their induced-subgraph
    degree."""
    li = _t(spark, sf_dir, "lineitem")
    e = (
        li.select(
            F.concat(F.lit("o"), F.col("l_orderkey")).alias("src"),
            F.concat(F.lit("p"), F.col("l_partkey")).alias("dst"),
        ).distinct()
    )

    # Two load-bearing shape choices, both A/B-measured at sf0.1:
    # (1) peel the DIRECTED bipartite list, not its symmetrized double —
    #     an order-node's degree is its count as src, a part-node's its
    #     count as dst; the symmetrized view exists only in the final
    #     projection, where the oracle's sym formulation provably agrees.
    # (2) MATERIALIZE between rounds: each peel references its input ~3×
    #     (two degree aggregates + the join), so a lazy chain re-evaluates
    #     the previous round's whole subtree multiplicatively — 5.4 s
    #     median lazy vs 1.7-2.8 s with e.persist() + a localCheckpoint
    #     after round one. This is the standard iterative-graph discipline
    #     (GraphX/driver fixpoint loops checkpoint every round for the
    #     same reason); a production iterate-until-fixpoint loop would
    #     materialize per round regardless. The persisted edge list is
    #     ~20 MB at sf0.1 and LRU-evicts; checkpoint blocks are reclaimed
    #     by the ContextCleaner.
    # A third shape was measured and REJECTED (r10): kcore_converged's
    # bipartite single-aggregate peel (one union-all degree aggregate,
    # keep set checkpointed + broadcast into both semi-joins) LOSES here
    # — 4.2 s vs 3.3-3.8 interleaved at sf0.1 — because this entry has no
    # per-round probe action: the keep checkpoint and broadcast builds
    # add driver round-trips per peel, while the two-aggregate form
    # pipelines into the semi-join shuffles inside the single final job.
    # The converged loop pays a count() per round anyway, which is what
    # makes the materialized keep set free there.
    def peel(edges: DataFrame, k: int) -> DataFrame:
        keep_src = (
            edges.groupBy("src").count().where(F.col("count") >= k).select("src")
        )
        keep_dst = (
            edges.groupBy("dst").count().where(F.col("count") >= k).select("dst")
        )
        return edges.join(keep_src, "src", "left_semi").join(
            keep_dst, "dst", "left_semi"
        )

    e = e.persist()
    e1 = peel(e, 5).localCheckpoint(eager=False)
    e2 = peel(e1, 5)
    deg_src = e2.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).alias("degree")
    )
    deg_dst = e2.groupBy(F.col("dst").alias("node")).agg(
        F.count(F.lit(1)).alias("degree")
    )
    return deg_src.unionAll(deg_dst)


@query(
    "g_kcore_converged",
    oracle="""
    WITH RECURSIVE e AS (
      SELECT DISTINCT 'o' || l_orderkey AS src, 'p' || l_partkey AS dst
      FROM lineitem
    ),
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
          GROUP BY s.src HAVING count(*) >= 5
        )
      ) nxt
      WHERE core.it < 30 AND nxt.lst IS DISTINCT FROM core.nodes
    ),
    final AS (SELECT it, nodes FROM core ORDER BY it DESC LIMIT 1),
    keep AS (SELECT unnest(nodes) AS node FROM final),
    e_final AS (
      SELECT s.src, s.dst FROM sym s
      JOIN keep a ON a.node = s.src JOIN keep b ON b.node = s.dst
    )
    SELECT src AS node, CAST(count(*) AS BIGINT) AS degree,
           CAST((SELECT it FROM final) AS BIGINT) AS rounds
    FROM e_final GROUP BY src
    """,
)
def g_kcore_converged(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRUE-CONVERGENCE k-core (k=5) on the bipartite order–part graph —
    g_kcore_bipartite's two unrolled rounds taken to the fixpoint with a
    driver loop, and STILL fully value-oracled: DuckDB's WITH RECURSIVE
    carries the surviving node set per iteration (the es_bank_fold
    recursive-CTE precedent), peeling until the set stops changing, so
    survivors, induced degrees AND the convergence round count are all
    checked. The ``rounds`` column (= number of set-changing peels) makes
    convergence itself part of the oracle contract.

    Spark side delegates to operators.graph.kcore_converged, which
    CONVERGES ON THE SURVIVING-NODE COUNT — not the edge count. The two
    fixpoints diverge by one round whenever a survivor's last ≥ k
    neighbors all peel together (its edges vanish that round, the node
    leaves the node set one iteration later with zero edges); an
    edge-count probe would stop early and report ``rounds`` one low on
    exactly such graphs, hash-mismatching every output row against this
    node-list oracle. The zero-degree-straggler case is pinned by a
    constructed-graph test in tests/test_graph.py. Per-round
    materialization discipline (persist + localCheckpoint, one count()
    action per round) lives in the operator."""
    from surge_spark.operators.graph import kcore_converged

    li = _t(spark, sf_dir, "lineitem")
    e = (
        li.select(
            F.concat(F.lit("o"), F.col("l_orderkey")).alias("src"),
            F.concat(F.lit("p"), F.col("l_partkey")).alias("dst"),
        ).distinct()
    )
    cur, rounds = kcore_converged(e, 5, bipartite=True)
    deg_src = cur.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).alias("degree")
    )
    deg_dst = cur.groupBy(F.col("dst").alias("node")).agg(
        F.count(F.lit(1)).alias("degree")
    )
    return deg_src.unionAll(deg_dst).withColumn(
        "rounds", F.lit(rounds).cast("long")
    )


@query(
    "g_cc_converged",
    oracle="""
    WITH RECURSIVE d AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    e AS (
      SELECT a.l_partkey AS pa, b.l_partkey AS pb
      FROM d a JOIN d b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY pa, pb HAVING count(*) >= 2
    ),
    sym AS (SELECT pa AS u, pb AS v FROM e UNION ALL SELECT pb, pa FROM e),
    lab(it, ls) AS (
      SELECT 0, (SELECT list(struct_pack(n := u, c := u) ORDER BY u)
                 FROM (SELECT DISTINCT u FROM sym))
      UNION ALL
      SELECT lab.it + 1, nxt.ls2
      FROM lab, LATERAL (
        SELECT list(struct_pack(
                 n := cur.n, c := least(cur.c, coalesce(nb.mc, cur.c))
               ) ORDER BY cur.n) AS ls2
        FROM (SELECT s.n AS n, s.c AS c FROM (SELECT unnest(lab.ls) AS s)) cur
        LEFT JOIN (
          SELECT s.u AS n, min(c2.c) AS mc
          FROM sym s
          JOIN (SELECT s2.n AS n, s2.c AS c
                FROM (SELECT unnest(lab.ls) AS s2)) c2 ON c2.n = s.v
          GROUP BY s.u
        ) nb ON nb.n = cur.n
      ) nxt
      WHERE lab.it < 500 AND nxt.ls2 IS DISTINCT FROM lab.ls
    ),
    final AS (SELECT ls FROM lab ORDER BY it DESC LIMIT 1)
    -- loud non-convergence guard: one-hop propagation needs <= diameter
    -- steps; if a regenerated corpus ever produced a >500-hop chain the
    -- cap would otherwise TRUNCATE silently and emit non-fixpoint labels.
    -- Hitting the cap instead returns ZERO rows -> an unmistakable
    -- row-count mismatch pointing here, not a value mismatch blamed on
    -- the Spark builder.
    SELECT s.n AS id, s.c AS component
    FROM (SELECT unnest(ls) AS s FROM final)
    WHERE (SELECT max(it) FROM lab) < 500
    """,
)
def g_cc_converged(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRUE-CONVERGENCE connected components on the part co-purchase graph
    (parts sharing >= 2 orders), fully value-oracled: every node labeled
    with the MIN reachable node id. The DuckDB oracle is a recursive-CTE
    min-label PROPAGATE loop to fixpoint (the g_kcore_converged / es_bank
    precedent, carrying a list<struct(n,c)> per iteration); Spark runs
    operators.graph.connected_components — the alternating propagate +
    POINTER-JUMP schedule (O(log d) rounds, checksum convergence probe,
    per-round localCheckpoint against plan blowup). The two schedules
    reach the identical fixpoint labels (min reachable id is schedule-
    independent), so the oracle checks the converged ANSWER while the
    Spark side keeps the scale-right O(log d) iteration — unlike
    g_kcore_converged, no rounds column is emitted, because the round
    counts legitimately differ between schedules. Components here = the
    product-affinity clusters a recsys prep pipeline partitions by.
    Reference anchor: surge has no graph ops; this extends the dedup
    cluster machinery (operators/graph.py) to a catalog-visible fixpoint."""
    from surge_spark.operators.graph import connected_components

    li = _t(spark, sf_dir, "lineitem")
    d = li.select("l_orderkey", "l_partkey").distinct()
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
    # operator already returns (id, component)
    return connected_components(edges, "pa", "pb")


@query(
    "a_kmv_distinct_estimate",
    oracle="""
    WITH h AS (
      SELECT DISTINCT event_type,
             CAST(CAST(('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 15))
                  AS BIGINT) AS DOUBLE) / 1152921504606846976.0 AS h
      FROM events WHERE user_id IS NOT NULL
    ),
    kth AS (
      SELECT event_type, h AS hk FROM (
        SELECT event_type, h,
               row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn
        FROM h
      ) WHERE rn = 64
    ),
    exact AS (
      SELECT event_type, count(DISTINCT user_id) AS n_exact FROM events
      GROUP BY event_type
    )
    SELECT e.event_type, e.n_exact,
           CAST(round(coalesce(63.0 / k.hk, e.n_exact), 4) AS DOUBLE)
             AS kmv_estimate
    FROM exact e LEFT JOIN kth k USING (event_type)
    """,
)
def a_kmv_distinct_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV (k-minimum-values, k=64) distinct-count sketch beside the exact
    count — the mergeable distinct estimator (Bar-Yossef et al. 2002)
    built on the ENGINE-PORTABLE md5, so unlike the HyperLogLog entry
    (a_approx_count_distinct, Spark-internal sketch → rows-only) this
    approximate algorithm carries a full value oracle: estimate =
    (k-1)/h_k where h_k is the k-th smallest normalized hash of the
    distinct keys; groups with fewer than k distinct keys fall back to
    their exact count (the sketch is exact below k by construction).

    Scale shape: the distinct-hash reduction is partial+final on
    (group, hash); the k-th-order-statistic is WindowGroupLimit-prunable
    (rank ≤ k); only k values per group survive to the estimator. At
    100 TB the same sketch is mergeable across partitions/days by keeping
    the k smallest of unioned hash sets. 15 hex chars = 60 bits, exact in
    a double's 53-bit mantissa? No — but IDENTICALLY rounded on both
    engines (same division of the same integer), which is what the oracle
    needs; 2^60 = 1152921504606846976."""
    e = _t(spark, sf_dir, "events")
    h = (
        F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 15), 16, 10)
        .cast("double")
        / F.lit(float(1 << 60))
    )
    # null keys are excluded on BOTH sides, matching count(DISTINCT)'s
    # null-ignoring semantics — and because Spark's window orders nulls
    # FIRST while DuckDB orders them LAST, an unfiltered null hash would
    # shift the k-th-smallest selection by one between the engines
    d = (
        e.where(F.col("user_id").isNotNull())
        .select("event_type", h.alias("h"))
        .distinct()
    )
    w = W.partitionBy("event_type").orderBy("h")
    kth = (
        d.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 64)
        .select("event_type", F.col("h").alias("hk"))
    )
    exact = e.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_exact")
    )
    return exact.join(kth, "event_type", "left").select(
        "event_type",
        "n_exact",
        F.round(
            F.coalesce(F.lit(63.0) / F.col("hk"), F.col("n_exact").cast("double")),
            4,
        ).alias("kmv_estimate"),
    )


@query(
    "a_kmv_merged_union",
    oracle="""
    WITH h AS (
      SELECT DISTINCT
             CAST(CAST(('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 15))
                  AS BIGINT) AS DOUBLE) / 1152921504606846976.0 AS h
      FROM events WHERE user_id IS NOT NULL
    ),
    kth AS (
      SELECT h AS hk FROM (
        SELECT h, row_number() OVER (ORDER BY h) AS rn FROM h
      ) WHERE rn = 64
    ),
    exact AS (SELECT count(DISTINCT user_id) AS n_exact FROM events)
    SELECT e.n_exact,
           CAST(round(coalesce(63.0 / k.hk, e.n_exact), 4) AS DOUBLE)
             AS kmv_estimate
    FROM exact e LEFT JOIN kth k ON TRUE
    """,
)
def a_kmv_merged_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV sketch MERGE — the property that makes the sketch usable at
    100 TB: per-event_type partial sketches (each the type's 64 smallest
    distinct key hashes, exactly what a day/partition would persist) are
    unioned and re-truncated to the 64 smallest, and the merged estimate
    equals the estimate built from the raw union in one pass. That
    equality is exact, not approximate — a global 64-smallest hash is a
    fortiori among its own type's 64 smallest — so the oracle computes
    the single-pass global form and must match the Spark side's actual
    two-level merge bit-for-bit. The merge path is how sketches compose
    across partitions, days, or engines without ever re-reading raw data.

    Scale shape: per-type truncation is a WindowGroupLimit (only 64 rows
    per type survive the partial stage); the merge input is n_types×64
    rows regardless of corpus size; exact count runs beside it for the
    error audit."""
    e = _t(spark, sf_dir, "events")
    h = (
        F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 15), 16, 10)
        .cast("double")
        / F.lit(float(1 << 60))
    )
    d = (
        e.where(F.col("user_id").isNotNull())
        .select("event_type", h.alias("h"))
        .distinct()
    )
    # stage 1: per-type partial sketches (64 smallest distinct hashes each)
    per_type = W.partitionBy("event_type").orderBy("h")
    sketches = (
        d.withColumn("rn", F.row_number().over(per_type))
        .where(F.col("rn") <= 64)
        .select("h")
    )
    # stage 2: merge = dedup the union, keep the 64 smallest, take the kth
    merged_kth = (
        sketches.distinct()
        .withColumn("rn", F.row_number().over(W.orderBy("h")))
        .where(F.col("rn") == 64)
        .select(F.col("h").alias("hk"), F.lit(1).alias("one"))
    )
    exact = e.agg(F.countDistinct("user_id").alias("n_exact")).withColumn(
        "one", F.lit(1)
    )
    return exact.join(merged_kth, "one", "left").select(
        "n_exact",
        F.round(
            F.coalesce(F.lit(63.0) / F.col("hk"), F.col("n_exact").cast("double")),
            4,
        ).alias("kmv_estimate"),
    )


# --------------------------------------------------------------------------
# TPC-H decision-support shapes, second batch (§2.4/§2.5 composite plans)
#
# Each entry pins a distinct classic plan shape the first batch (Q1/Q3/Q5/
# Q6/Q9/Q10/Q14/Q18) doesn't cover: EXISTS-semi (Q4), bidirectional
# nation-pair volume (Q7), outer-join double aggregation (Q13), max-of-agg
# scalar join-back (Q15), anti-join + count-distinct (Q16), correlated-avg
# join-back (Q17), OR-of-ANDs disjunctive pushdown (Q19), double-correlated
# EXISTS/NOT-EXISTS (Q21), scalar-subquery threshold + anti-join (Q22).
# The testdata lacks partsupp / l_commitdate / l_shipmode / p_container, so
# predicates are adapted to available columns; the plan shapes — what the
# entries exist to pin — are the canonical ones.
# --------------------------------------------------------------------------


@query(
    "q4_priority_check",
    oracle="""
    SELECT o.o_orderpriority, count(*) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1997-01-01'
      AND o.o_orderdate < TIMESTAMP '1997-04-01'
      AND EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R'
      )
    GROUP BY o.o_orderpriority
    """,
)
def q4_priority_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape (order priority checking): one quarter's orders that
    have at least one returned line, counted by priority — the EXISTS
    semi-join pattern. The quarter predicate pushes into the orders scan,
    the returnflag predicate into the lineitem scan, and the semi join
    deduplicates order keys WITHOUT multiplying order rows (no distinct
    needed — LeftSemi's contract). Testdata has no l_commitdate/
    l_receiptdate, so 'line was returned' stands in for 'line was late'."""
    lo = F.lit("1997-01-01").cast("timestamp_ntz")
    hi = F.lit("1997-04-01").cast("timestamp_ntz")
    o = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= lo) & (F.col("o_orderdate") < hi)
    )
    li = _t(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    return (
        o.join(li, o.o_orderkey == li.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


@query(
    "q7_volume_shipping",
    oracle="""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(year(l.l_shipdate) AS INT) AS l_year,
           CAST(round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS DOUBLE)
             AS revenue
    FROM supplier s
    JOIN lineitem l ON s.s_suppkey = l.l_suppkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
    JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
    WHERE (n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_14')
       OR (n1.n_name = 'NATION_14' AND n2.n_name = 'NATION_3')
    GROUP BY n1.n_name, n2.n_name, year(l.l_shipdate)
    """,
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape (volume shipping): trade volume between two nations in
    both directions, by ship year. Both nation dims and supplier broadcast;
    the disjunctive nation-pair predicate sits above the joins (it needs
    both sides), but each single-nation membership n_name IN (a, b) is
    inferred and pushed below — the classic partially-pushable disjunction.
    lineitem shuffles once on l_orderkey to meet orders; the aggregate key
    space is 2×years."""
    s = _t(spark, sf_dir, "supplier")
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation").where(
        F.col("n_name").isin("NATION_3", "NATION_14")
    )
    n1 = n.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = n.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    return (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .where(
            ((F.col("supp_nation") == "NATION_3") & (F.col("cust_nation") == "NATION_14"))
            | ((F.col("supp_nation") == "NATION_14") & (F.col("cust_nation") == "NATION_3"))
        )
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )


@query(
    "q13_customer_distribution",
    oracle="""
    SELECT c_count, count(*) AS custdist
    FROM (
      SELECT c.c_custkey, count(o.o_orderkey) AS c_count
      FROM customer c
      LEFT JOIN orders o ON c.c_custkey = o.o_custkey
        AND o.o_orderpriority <> '1-URGENT'
      GROUP BY c.c_custkey
    )
    GROUP BY c_count
    """,
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape (customer distribution): how many customers placed
    how many (non-urgent) orders — the outer-join + double-aggregation
    pattern. The join-side filter lives in the JOIN condition (not WHERE),
    so customers with zero qualifying orders survive with count 0; the
    first aggregate reduces on c_custkey, the second on the tiny c_count
    domain. count(o_orderkey) counts only matched rows — the outer-join
    NULL-skipping contract both engines share."""
    c = _t(spark, sf_dir, "customer").select("c_custkey")
    o = (
        _t(spark, sf_dir, "orders")
        .where(F.col("o_orderpriority") != "1-URGENT")
        .select("o_custkey", "o_orderkey")
    )
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@query(
    "q15_top_supplier",
    oracle="""
    WITH rev AS (
      SELECT l_suppkey AS supplier_no,
             CAST(round(sum(l_extendedprice * (1 - l_discount)), 2) AS DOUBLE)
               AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate < TIMESTAMP '1997-04-01'
      GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, r.total_revenue
    FROM supplier s
    JOIN rev r ON s.s_suppkey = r.supplier_no
    WHERE r.total_revenue = (SELECT max(total_revenue) FROM rev)
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape (top supplier): the supplier(s) with maximum quarter
    revenue — the max-of-aggregate scalar join-back. Revenue-per-supplier
    aggregates once; the global max is a window aggregate OVER that same
    per-supplier result (n_suppliers rows in one bounded partition), so
    lineitem is scanned exactly ONCE — the naive scalar-subquery form
    re-evaluates the whole revenue view (Catalyst plans two lineitem
    scans; ReusedExchange doesn't fire because the join side carries an
    extra isnotnull and the subtrees canonicalize apart — measured, not
    guessed). Revenue is rounded BEFORE the max on both sides so
    partial-sum order can't flip the winner."""
    lo = F.lit("1997-01-01").cast("timestamp_ntz")
    hi = F.lit("1997-04-01").cast("timestamp_ntz")
    rev = (
        _t(spark, sf_dir, "lineitem")
        .where((F.col("l_shipdate") >= lo) & (F.col("l_shipdate") < hi))
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("total_revenue")
        )
    )
    s = _t(spark, sf_dir, "supplier")
    return (
        rev.withColumn(
            "max_revenue",
            F.max("total_revenue").over(W.partitionBy(F.lit(1))),
        )
        .where(F.col("total_revenue") == F.col("max_revenue"))
        .join(F.broadcast(s), F.col("supplier_no") == s.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
    )


@query(
    "q16_supplier_part_count",
    oracle="""
    SELECT p.p_brand, p.p_type, p.p_size,
           count(DISTINCT l.l_suppkey) AS supplier_cnt
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_size IN (5, 10, 15, 20)
      AND l.l_suppkey NOT IN (
        SELECT s_suppkey FROM supplier WHERE s_acctbal < 2000
      )
    GROUP BY p.p_brand, p.p_type, p.p_size
    """,
)
def q16_supplier_part_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape (parts/supplier relationship): how many qualifying
    suppliers ship parts of each brand/type/size — anti-join exclusion +
    count-distinct. The size IN-list pushes into the part scan; the
    excluded-supplier set (a filtered dim) broadcasts as a left-anti join
    (s_suppkey is non-null, so NOT IN ≡ anti-join); the count-distinct
    expands to a two-level aggregate. Testdata has no partsupp — lineitem
    is the part↔supplier bridge; low-balance stands in for the comment-
    pattern exclusion."""
    li = _t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    p = _t(spark, sf_dir, "part").where(F.col("p_size").isin(5, 10, 15, 20))
    excl = (
        _t(spark, sf_dir, "supplier")
        .where(F.col("s_acctbal") < 2000)
        .select("s_suppkey")
    )
    return (
        li.join(F.broadcast(excl), li.l_suppkey == excl.s_suppkey, "left_anti")
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@query(
    "q17_small_quantity_revenue",
    oracle="""
    SELECT CAST(round(sum(l.l_extendedprice) / 7.0, 2) AS DOUBLE) AS avg_yearly
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN (
      SELECT l_partkey, round(0.2 * avg(l_quantity), 4) AS qty_limit
      FROM lineitem GROUP BY l_partkey
    ) t ON t.l_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#12' AND l.l_quantity < t.qty_limit
    """,
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape (small-quantity-order revenue): revenue from lines
    well below their part's average order quantity — the correlated-
    aggregate join-back. The per-part average is a partial+final aggregate
    of lineitem joined back on l_partkey (Catalyst's decorrelation of the
    scalar subquery, written explicitly); the brand filter broadcasts from
    part and prunes both the probe side and (via the join) the threshold
    side. qty_limit is rounded on both sides so partial-avg order can't
    flip a boundary comparison."""
    li = _t(spark, sf_dir, "lineitem")
    limits = li.groupBy(F.col("l_partkey").alias("t_partkey")).agg(
        F.round(0.2 * F.avg("l_quantity"), 4).alias("qty_limit")
    )
    p = _t(spark, sf_dir, "part").where(F.col("p_brand") == "Brand#12")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(limits, li.l_partkey == limits.t_partkey)
        .where(F.col("l_quantity") < F.col("qty_limit"))
        .agg(F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"))
    )


@query(
    "q19_disjunctive_revenue",
    oracle="""
    SELECT CAST(round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS DOUBLE)
             AS revenue
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 5
           AND l.l_quantity BETWEEN 1 AND 11)
       OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 10
           AND l.l_quantity BETWEEN 10 AND 20)
       OR (p.p_brand = 'Brand#34' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 20 AND 30)
    """,
)
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape (discounted revenue): an OR-of-ANDs predicate
    spanning both join sides — the disjunctive-pushdown test. Catalyst
    factors the common bounds out of the disjunction (l_quantity ∈ [1,30]
    pushes into the lineitem scan, brand ∈ {12,23,34} and size ≤ 15 into
    the part scan) while the full disjunction evaluates above the
    broadcast join; the naive plan filters nothing until after the join.
    Testdata has no p_container/l_shipmode, so size/quantity bands carry
    the disjunction."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    q, b, sz = F.col("l_quantity"), F.col("p_brand"), F.col("p_size")
    cond = (
        ((b == "Brand#12") & sz.between(1, 5) & q.between(1, 11))
        | ((b == "Brand#23") & sz.between(1, 10) & q.between(10, 20))
        | ((b == "Brand#34") & sz.between(1, 15) & q.between(20, 30))
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .where(cond)
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )


@query(
    "q21_waiting_suppliers",
    oracle="""
    SELECT s.s_name, count(*) AS numwait
    FROM supplier s
    JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
    JOIN orders o ON o.o_orderkey = l1.l_orderkey
    WHERE o.o_orderstatus = 'F' AND l1.l_returnflag = 'R'
      AND EXISTS (
        SELECT 1 FROM lineitem l2
        WHERE l2.l_orderkey = l1.l_orderkey
          AND l2.l_suppkey <> l1.l_suppkey
      )
      AND NOT EXISTS (
        SELECT 1 FROM lineitem l3
        WHERE l3.l_orderkey = l1.l_orderkey
          AND l3.l_suppkey <> l1.l_suppkey
          AND l3.l_returnflag = 'R'
      )
    GROUP BY s.s_name
    ORDER BY numwait DESC, s.s_name
    LIMIT 20
    """,
)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (suppliers who kept orders waiting): suppliers whose
    line was the ONLY returned line on a multi-supplier finalized order —
    the double-correlated EXISTS + NOT-EXISTS pattern, expressed as a
    left-semi then left-anti join with a non-equi residual (other-supplier
    inequality) on top of the l_orderkey equi key. All three lineitem
    legs shuffle on the SAME key, so the exchanges line up; supplier
    broadcasts; 'returned' stands in for 'received late' (no
    l_commitdate/l_receiptdate in testdata)."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_returnflag"
    )
    l1 = li.where(F.col("l_returnflag") == "R").alias("l1")
    o = (
        _t(spark, sf_dir, "orders")
        .where(F.col("o_orderstatus") == "F")
        .select("o_orderkey")
    )
    l2 = li.select("l_orderkey", "l_suppkey").alias("l2")
    l3 = l1.select("l_orderkey", "l_suppkey").alias("l3")
    s = _t(spark, sf_dir, "supplier")
    waiting = (
        l1.join(o, F.col("l1.l_orderkey") == o.o_orderkey, "left_semi")
        .join(
            l2,
            (F.col("l1.l_orderkey") == F.col("l2.l_orderkey"))
            & (F.col("l1.l_suppkey") != F.col("l2.l_suppkey")),
            "left_semi",
        )
        .join(
            l3,
            (F.col("l1.l_orderkey") == F.col("l3.l_orderkey"))
            & (F.col("l1.l_suppkey") != F.col("l3.l_suppkey")),
            "left_anti",
        )
    )
    return (
        waiting.join(F.broadcast(s), F.col("l1.l_suppkey") == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(20)
    )


@query(
    "q22_prospect_customers",
    oracle="""
    WITH threshold AS (
      SELECT round(avg(c_acctbal), 4) AS ab
      FROM customer WHERE c_acctbal > 0.0
    )
    SELECT c.c_nationkey, count(*) AS numcust,
           CAST(round(sum(c.c_acctbal), 2) AS DOUBLE) AS totacctbal
    FROM customer c
    WHERE c.c_acctbal > (SELECT ab FROM threshold)
      AND NOT EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey
          AND o.o_orderdate >= TIMESTAMP '1999-01-01'
      )
    GROUP BY c.c_nationkey
    """,
)
def q22_prospect_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape (global sales opportunity): well-funded customers
    with no RECENT order, grouped by geography — the scalar-subquery
    threshold + anti-join pattern. The positive-balance average is a
    one-row aggregate broadcast as a cross-join filter (Catalyst's
    scalar-subquery lowering, written explicitly); the lapsed test is a
    left-anti join against recent orders, whose date predicate pushes
    into the orders scan BEFORE the anti join (every customer in this
    testdata has ordered at some point, so the literal never-ordered form
    is vacuous). The threshold is rounded on both sides so partial-avg
    order can't flip a boundary customer. c_nationkey stands in for the
    phone-prefix country code (no c_phone in testdata)."""
    c = _t(spark, sf_dir, "customer")
    thr = c.where(F.col("c_acctbal") > 0.0).agg(
        F.round(F.avg("c_acctbal"), 4).alias("ab")
    )
    o = (
        _t(spark, sf_dir, "orders")
        .where(F.col("o_orderdate") >= F.lit("1999-01-01").cast("timestamp_ntz"))
        .select("o_custkey")
    )
    return (
        c.join(F.broadcast(thr))
        .where(F.col("c_acctbal") > F.col("ab"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
    )


@query(
    "a_histogram_percentiles",
    oracle="""
    WITH hist AS (
      SELECT CAST(floor(l_extendedprice / 1000) AS BIGINT) AS bin,
             count(*) AS cnt
      FROM lineitem GROUP BY 1
    ),
    cum AS (
      SELECT bin, cnt,
             CAST(sum(cnt) OVER (ORDER BY bin
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS cum,
             CAST(sum(cnt) OVER () AS BIGINT) AS total
      FROM hist
    ),
    ps AS (SELECT unnest([CAST(0.5 AS DOUBLE), CAST(0.9 AS DOUBLE),
                          CAST(0.99 AS DOUBLE)]) AS p)
    SELECT p, bin,
           CAST(round(bin * 1000 + 1000.0 * (p * total - (cum - cnt)) / cnt, 6)
                AS DOUBLE) AS estimate
    FROM cum, ps
    WHERE cum >= p * total AND cum - cnt < p * total
    """,
)
def a_histogram_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable fixed-bin histogram percentiles (p50/p90/p99 of
    l_extendedprice, bin width 1000): the sketch-shaped percentile path
    that actually composes at 100 TB — per-partition bin counts are a
    partial+final aggregate (the histogram IS its own merge, unlike a
    sort-based exact percentile), the bounded bin table (~price_range/
    width rows) flows through one cumulative window, and each percentile
    interpolates linearly inside its covering bin. Deterministic and
    engine-portable because bins are integer floors and counts are exact
    — the oracleable counterpart to approx_percentile's opaque sketch,
    beside a_exact_percentiles (exact, sort-based) and the KMV/HLL
    distinct sketches."""
    li = _t(spark, sf_dir, "lineitem")
    hist = li.groupBy(
        F.floor(F.col("l_extendedprice") / 1000).alias("bin")
    ).agg(F.count(F.lit(1)).alias("cnt"))
    one = W.partitionBy(F.lit(1))
    cum = hist.withColumn(
        "cum", F.sum("cnt").over(one.orderBy("bin").rowsBetween(W.unboundedPreceding, 0))
    ).withColumn("total", F.sum("cnt").over(one))
    # p must be DOUBLE on BOTH sides: DuckDB's bare 0.9 is DECIMAL and
    # evaluates p*total exactly, while Spark's double(0.9)*total rounds a
    # hair high — a cum landing exactly on the target would then pick
    # different bins per engine
    ps = spark.createDataFrame([(0.5,), (0.9,), (0.99,)], "p double")
    target = F.col("p") * F.col("total")
    return (
        cum.join(F.broadcast(ps))
        .where((F.col("cum") >= target) & (F.col("cum") - F.col("cnt") < target))
        .select(
            "p",
            "bin",
            F.round(
                F.col("bin") * 1000
                + 1000.0 * (target - (F.col("cum") - F.col("cnt"))) / F.col("cnt"),
                6,
            ).alias("estimate"),
        )
    )


@query(
    "a_percentile_estimate_error_audit",
    oracle="""
    WITH hist AS (
      SELECT CAST(floor(l_extendedprice / 1000) AS BIGINT) AS bin,
             count(*) AS cnt
      FROM lineitem GROUP BY 1
    ),
    cum AS (
      SELECT bin, cnt,
             CAST(sum(cnt) OVER (ORDER BY bin
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS cum,
             CAST(sum(cnt) OVER () AS BIGINT) AS total
      FROM hist
    ),
    ps AS (SELECT unnest([CAST(0.5 AS DOUBLE), CAST(0.9 AS DOUBLE),
                          CAST(0.99 AS DOUBLE)]) AS p),
    est AS (
      SELECT p,
             CAST(round(bin * 1000
                  + 1000.0 * (p * total - (cum - cnt)) / cnt, 4)
                  AS DOUBLE) AS estimate
      FROM cum, ps
      WHERE cum >= p * total AND cum - cnt < p * total
    ),
    ex AS (
      SELECT unnest([CAST(0.5 AS DOUBLE), CAST(0.9 AS DOUBLE),
                     CAST(0.99 AS DOUBLE)]) AS p,
             unnest([
               CAST(round(quantile_cont(l_extendedprice, 0.5), 4) AS DOUBLE),
               CAST(round(quantile_cont(l_extendedprice, 0.9), 4) AS DOUBLE),
               CAST(round(quantile_cont(l_extendedprice, 0.99), 4) AS DOUBLE)
             ]) AS exact
      FROM lineitem
    )
    SELECT est.p, ex.exact, est.estimate,
           CAST(round(est.estimate - ex.exact, 4) AS DOUBLE) AS err,
           CAST(CASE WHEN ex.exact <> 0
                THEN round((est.estimate - ex.exact) / ex.exact, 6)
                END AS DOUBLE) AS err_rel
    FROM est JOIN ex USING (p)
    """,
)
def a_percentile_estimate_error_audit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The sketch-audit family member for percentile ESTIMATION (r14
    VERDICT task 6 — the one approximation family that had no
    estimate-vs-exact entry): the mergeable fixed-bin histogram
    percentile (the 100 TB path — partial+final bin counts, the
    histogram IS its own merge) graded against the exact
    linear-interpolated percentile (Spark `percentile` ≡ DuckDB
    `quantile_cont`) at p50/p90/p99, with the error shipped VISIBLY
    (absolute + relative). The histogram estimator is audited rather
    than approx_percentile because it is engine-portable and therefore
    fully value-oracleable (the HLL precedent says an opaque sketch
    would be rows-only — strictly weaker); both per-p scores round-4
    BEFORE the difference (the pq-distortion-audit discipline). One
    corpus pass per side; everything after is bin-table / 3-row
    bounded."""
    li = _t(spark, sf_dir, "lineitem")
    hist = li.groupBy(
        F.floor(F.col("l_extendedprice") / 1000).alias("bin")
    ).agg(F.count(F.lit(1)).alias("cnt"))
    one = W.partitionBy(F.lit(1))
    cum = hist.withColumn(
        "cum",
        F.sum("cnt").over(one.orderBy("bin").rowsBetween(W.unboundedPreceding, 0)),
    ).withColumn("total", F.sum("cnt").over(one))
    # p DOUBLE on both sides — the a_histogram_percentiles bin-pick trap
    ps = spark.createDataFrame([(0.5,), (0.9,), (0.99,)], "p double")
    target = F.col("p") * F.col("total")
    est = (
        cum.join(F.broadcast(ps))
        .where((F.col("cum") >= target) & (F.col("cum") - F.col("cnt") < target))
        .select(
            "p",
            F.round(
                F.col("bin") * 1000
                + 1000.0 * (target - (F.col("cum") - F.col("cnt"))) / F.col("cnt"),
                4,
            ).alias("estimate"),
        )
    )
    pvals = (0.5, 0.9, 0.99)
    ex = (
        li.agg(
            F.percentile(
                "l_extendedprice", F.array(*[F.lit(p) for p in pvals])
            ).alias("_e")
        )
        .select(F.posexplode("_e").alias("pos0", "exact"))
        .select(
            F.element_at(
                F.array(*[F.lit(p) for p in pvals]), F.col("pos0") + 1
            ).alias("p"),
            F.round("exact", 4).alias("exact"),
        )
    )
    return est.join(F.broadcast(ex), "p").select(
        "p",
        "exact",
        "estimate",
        F.expr("CAST(round(estimate - exact, 4) AS DOUBLE)").alias("err"),
        F.expr(
            "CAST(CASE WHEN exact <> 0"
            " THEN round((estimate - exact) / exact, 6) END AS DOUBLE)"
        ).alias("err_rel"),
    )


@query(
    "a_weighted_median",
    oracle="""
    WITH w AS (
      SELECT l_returnflag,
             CAST(round(l_extendedprice * 100) AS BIGINT) AS cents,
             CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS wt
      FROM lineitem GROUP BY 1, 2
    ),
    cum AS (
      SELECT l_returnflag, cents, wt,
             CAST(sum(wt) OVER (
               PARTITION BY l_returnflag ORDER BY cents
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS BIGINT) AS cw,
             CAST(sum(wt) OVER (PARTITION BY l_returnflag) AS BIGINT)
               AS total_w
      FROM w
    )
    SELECT l_returnflag, CAST(min(total_w) AS BIGINT) AS total_weight,
           CAST(min(CASE WHEN 2 * cw >= total_w THEN cents END) AS BIGINT)
             AS weighted_median_cents
    FROM cum GROUP BY l_returnflag
    """,
)
def a_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantity-weighted median price per return flag — the percentile
    family member neither engine has built in (Spark percentile takes
    no weights; a_exact_percentiles is row-weighted): lower weighted
    median = the smallest value whose cumulative weight reaches half
    the total, i.e. min{v : 2·cumw(v) ≥ W} — an ALL-INTEGER rule (no
    interpolation, so no float channel at all; 2·cw ≤ 2W clears bigint
    to ~4.6e18 total units). Per-value weight sums first (the
    Mann-Whitney per-value-counts discipline), then a cumulative window
    PARTITIONED by flag — the window's row count is the number of
    DISTINCT prices, bounded by the price domain, not data volume (the
    w_rolling_correlation calendar-bounded class), so the plan is
    scale-safe without prefix-sum machinery."""
    li = _t(spark, sf_dir, "lineitem")
    w = li.groupBy(
        "l_returnflag",
        F.expr("CAST(round(l_extendedprice * 100) AS BIGINT)").alias("cents"),
    ).agg(
        F.sum(F.expr("CAST(round(l_quantity) AS BIGINT)")).alias("wt")
    )
    wf = W.partitionBy("l_returnflag").orderBy("cents").rowsBetween(
        W.unboundedPreceding, 0
    )
    cum = w.select(
        "l_returnflag",
        "cents",
        F.sum("wt").over(wf).alias("cw"),
        F.sum("wt").over(W.partitionBy("l_returnflag")).alias("total_w"),
    )
    return cum.groupBy("l_returnflag").agg(
        F.min("total_w").cast("long").alias("total_weight"),
        F.min(
            F.when(2 * F.col("cw") >= F.col("total_w"), F.col("cents"))
        ).cast("long").alias("weighted_median_cents"),
    )


@query(
    "a_corr_regression",
    oracle="""
    SELECT l_returnflag,
           CAST(round(corr(l_quantity, l_extendedprice), 6) AS DOUBLE)
             AS qty_price_corr,
           CAST(round(covar_pop(l_quantity, l_extendedprice), 3) AS DOUBLE)
             AS qty_price_covar,
           CAST(round(regr_slope(l_extendedprice, l_quantity), 5) AS DOUBLE)
             AS price_per_qty_slope,
           count(*) AS n
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def a_corr_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregate family (corr / covar_pop / regr_slope): the
    built-in bivariate statistics a feature-engineering or drift-detection
    pass leans on — one partial+final aggregate pass computes all three
    (Spark merges per-partition moment sketches, the classic numerically
    parallel form). Rounded on both sides: moment merges are
    order-sensitive in the last bits."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias(
            "qty_price_corr"
        ),
        F.round(F.covar_pop("l_quantity", "l_extendedprice"), 3).alias(
            "qty_price_covar"
        ),
        F.round(F.regr_slope("l_extendedprice", "l_quantity"), 5).alias(
            "price_per_qty_slope"
        ),
        F.count(F.lit(1)).alias("n"),
    )


@query(
    "w_moving_median",
    oracle="""
    SELECT event_id, user_id,
           CAST(round(median(value) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN 3 PRECEDING AND CURRENT ROW
           ), 6) AS DOUBLE) AS moving_median
    FROM events
    """,
)
def w_moving_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Moving median over a 4-row trailing frame per user — the robust
    rolling statistic an anomaly detector prefers over EWMA when spikes
    must not drag the baseline (complements m_ewma / m_anomaly_zscore).
    Exact within the frame (tiny constant size); the frame ordering ties
    on event_id so both engines see identical windows. One shuffle on
    user_id. Spark disallows median() over an ordered frame
    (INVALID_WINDOW_SPEC_FOR_AGGREGATION_FUNC), so the median is computed
    from the frame's collect_list — sort the ≤4 values, take the middle
    (odd) or the mean of the middle two (even), exactly DuckDB's median
    semantics."""
    e = _t(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-3, 0)
    )
    arr = F.sort_array(F.collect_list("value").over(w))
    n = F.size(arr)
    mid_hi = F.element_at(arr, (n / 2 + 1).cast("int"))
    mid_lo = F.element_at(arr, (n / 2).cast("int"))
    # collect_list drops NULLs: an all-NULL frame yields an empty array,
    # and element_at(arr, 0) would throw under ANSI — guard first so the
    # empty frame produces NULL exactly like DuckDB's median (ADVICE r5).
    med = (
        F.when(n == 0, F.lit(None).cast("double"))
        .when(n % 2 == 1, F.element_at(arr, ((n + 1) / 2).cast("int")))
        .otherwise((mid_lo + mid_hi) / 2.0)
    )
    return e.select(
        "event_id",
        "user_id",
        F.round(med, 6).alias("moving_median"),
    )


@query(
    "f_fuzzy_match_levenshtein",
    oracle="""
    SELECT a.n_name AS name_a, b.n_name AS name_b,
           CAST(levenshtein(a.n_name, b.n_name) AS INT) AS edit_distance
    FROM nation a JOIN nation b ON a.n_name < b.n_name
    WHERE levenshtein(a.n_name, b.n_name) <= 2
    """,
)
def f_fuzzy_match_levenshtein(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance fuzzy matching (F-family string function coverage):
    near-identical name pairs within a dimension — the entity-resolution
    primitive for dirty dimension data, exact integer results on both
    engines. The pair space here is a dim self-join (bounded); at corpus
    scale the same scorer runs AFTER a blocking stage (LSH buckets or
    q-gram keys), never all-pairs."""
    n = _t(spark, sf_dir, "nation")
    a = n.select(F.col("n_name").alias("name_a"))
    b = n.select(F.col("n_name").alias("name_b"))
    return (
        a.join(F.broadcast(b), F.col("name_a") < F.col("name_b"))
        .withColumn(
            "edit_distance", F.levenshtein(F.col("name_a"), F.col("name_b"))
        )
        .where(F.col("edit_distance") <= 2)
    )


@query(
    "q8_market_share",
    oracle="""
    WITH v AS (
      SELECT CAST(year(o.o_orderdate) AS INT) AS o_year,
             l.l_extendedprice * (1 - l.l_discount) AS volume,
             n2.n_name AS supp_nation
      FROM lineitem l
      JOIN part p ON p.p_partkey = l.l_partkey AND p.p_type = 'STANDARD'
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n1 ON c.c_nationkey = n1.n_nationkey
      JOIN region r ON n1.n_regionkey = r.r_regionkey AND r.r_name = 'EUROPE'
      JOIN nation n2 ON s.s_nationkey = n2.n_nationkey
      WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
        AND o.o_orderdate < TIMESTAMP '1998-01-01'
    )
    SELECT o_year,
           CAST(round(sum(CASE WHEN supp_nation = 'NATION_3' THEN volume
                               ELSE 0 END) / sum(volume), 6) AS DOUBLE)
             AS mkt_share
    FROM v GROUP BY o_year
    """,
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape (national market share): one nation's share of a
    region's STANDARD-part import market, by order year — the
    conditional-share pattern (numerator and denominator fold in the SAME
    partial+final aggregate; no self-join, no second scan) with nation
    playing two roles (customer geography filters the market, supplier
    geography tags the share). Part/supplier/customer and both nation
    legs broadcast; the two-year predicate pushes into the orders scan;
    lineitem shuffles once, on the final (year) aggregate key. The share
    denominator is strictly positive (groups only form from revenue
    rows), so ANSI division is safe."""
    lo = F.lit("1996-01-01").cast("timestamp_ntz")
    hi = F.lit("1998-01-01").cast("timestamp_ntz")
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").where(F.col("p_type") == "STANDARD")
    s = _t(spark, sf_dir, "supplier")
    o = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= lo) & (F.col("o_orderdate") < hi)
    )
    c = _t(spark, sf_dir, "customer")
    n1 = (
        _t(spark, sf_dir, "nation")
        .withColumnsRenamed({"n_nationkey": "n1_key", "n_regionkey": "n1_region"})
        .select("n1_key", "n1_region")
    )
    n2 = (
        _t(spark, sf_dir, "nation")
        .withColumnsRenamed({"n_nationkey": "n2_key", "n_name": "supp_nation"})
        .select("n2_key", "supp_nation")
    )
    r = _t(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")
    volume = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("n1_key"))
        .join(F.broadcast(r), F.col("n1_region") == r.r_regionkey)
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2_key"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.round(
                F.sum(
                    F.when(F.col("supp_nation") == "NATION_3", volume).otherwise(
                        0.0
                    )
                )
                / F.sum(volume),
                6,
            ).alias("mkt_share")
        )
    )


@query(
    "q12_shipping_modes",
    oracle="""
    SELECT l.l_linestatus,
           sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS high_priority_count,
           sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS low_priority_count
    FROM orders o
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-01-01'
      AND l.l_shipdate < TIMESTAMP '1998-01-01'
    GROUP BY l.l_linestatus
    """,
)
def q12_shipping_modes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (shipping modes / order priority): per line-status,
    how many of one year's shipped lines belonged to high- vs low-priority
    orders — the dual complementary conditional count (both counts fold in
    one partial+final aggregate; the priority predicate lives in the
    aggregate, not a filter, so neither branch re-scans). The year filter
    pushes into the lineitem scan; orders joins on l_orderkey.
    l_linestatus stands in for l_shipmode (not in testdata)."""
    lo = F.lit("1997-01-01").cast("timestamp_ntz")
    hi = F.lit("1998-01-01").cast("timestamp_ntz")
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= lo) & (F.col("l_shipdate") < hi)
    )
    o = _t(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_priority_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_priority_count"),
        )
    )


@query(
    "o_skipping_index",
    oracle="""
    SELECT CAST(floor(o_orderkey / 1024) AS BIGINT) AS zone,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(min(o_orderkey) AS BIGINT) AS min_key,
           CAST(max(o_orderkey) AS BIGINT) AS max_key,
           CAST(round(min(o_totalprice), 2) AS DOUBLE) AS min_price,
           CAST(round(max(o_totalprice), 2) AS DOUBLE) AS max_price,
           min(o_orderdate) AS min_date,
           max(o_orderdate) AS max_date,
           CAST(count(DISTINCT o_custkey) AS BIGINT) AS ndv_custkey
    FROM orders GROUP BY zone
    """,
)
def o_skipping_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zone-map / data-skipping index build (the Delta `dataSkippingNumIndexedCols`
    stats, Snowflake micro-partition metadata, ORC stripe-stats analog):
    per 1024-key zone, row count, min/max of the key, price, and date
    columns, plus exact key NDV. ONE pass, all partial+final aggregates —
    at 100 TB this is the maintenance job that makes every later
    range-predicate scan prune zones instead of reading them; pairs with
    o_zorder_layout, which REORDERS rows so these envelopes tighten. The
    engine already consumes file-level stats via parquet pushdown
    (tests/test_plans.py PushedFilters pins); this entry materializes the
    same statistics as a queryable table-level index."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.groupBy(
            F.floor(F.col("o_orderkey") / 1024).cast("long").alias("zone")
        ).agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("o_orderkey").alias("min_key"),
            F.max("o_orderkey").alias("max_key"),
            F.round(F.min("o_totalprice"), 2).alias("min_price"),
            F.round(F.max("o_totalprice"), 2).alias("max_price"),
            F.min("o_orderdate").alias("min_date"),
            F.max("o_orderdate").alias("max_date"),
            F.count_distinct("o_custkey").alias("ndv_custkey"),
        )
    )


@query(
    "a_kmv_jaccard_intersect",
    oracle="""
    WITH hc AS (
      SELECT DISTINCT
             CAST(CAST(('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 15))
                  AS BIGINT) AS DOUBLE) / 1152921504606846976.0 AS h
      FROM events WHERE user_id IS NOT NULL AND event_type = 'click'
    ),
    hp AS (
      SELECT DISTINCT
             CAST(CAST(('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 15))
                  AS BIGINT) AS DOUBLE) / 1152921504606846976.0 AS h
      FROM events WHERE user_id IS NOT NULL AND event_type = 'purchase'
    ),
    ka AS (SELECT h FROM hc ORDER BY h LIMIT 32),
    kb AS (SELECT h FROM hp ORDER BY h LIMIT 32),
    merged AS (
      SELECT h FROM (SELECT h FROM ka UNION SELECT h FROM kb) ORDER BY h LIMIT 32
    ),
    rho AS (
      SELECT count(*) AS c FROM merged
      WHERE h IN (SELECT h FROM ka) AND h IN (SELECT h FROM kb)
    ),
    hk AS (SELECT max(h) AS hk, count(*) AS km FROM merged),
    ex AS (
      SELECT
        (SELECT count(DISTINCT a.user_id) FROM events a
         WHERE a.event_type = 'click' AND a.user_id IN (
           SELECT b.user_id FROM events b WHERE b.event_type = 'purchase'
         )) AS inter_exact,
        (SELECT count(DISTINCT user_id) FROM events
         WHERE event_type IN ('click', 'purchase') AND user_id IS NOT NULL)
          AS union_exact
    )
    SELECT CAST(32 AS INT) AS k,
           CAST(round((SELECT c FROM rho) / 32.0, 4) AS DOUBLE) AS jaccard_kmv,
           CAST(round(((SELECT km FROM hk) - 1) / (SELECT hk FROM hk), 4)
                AS DOUBLE) AS union_kmv,
           CAST(round((SELECT c FROM rho) / 32.0
                      * ((SELECT km FROM hk) - 1) / (SELECT hk FROM hk), 4)
                AS DOUBLE) AS inter_kmv,
           CAST(round(CAST((SELECT inter_exact FROM ex) AS DOUBLE)
                      / (SELECT union_exact FROM ex), 4) AS DOUBLE)
             AS jaccard_exact
    """,
)
def a_kmv_jaccard_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV set-intersection / Jaccard estimation between the click-user
    and purchase-user sets (Beyer et al., SIGMOD'07): keep each set's
    k=32 smallest md5 hashes, merge-sketch M = k smallest of their union,
    ρ = |M ∩ S_A ∩ S_B|/k estimates Jaccard, ρ·(k-1)/h_k the
    intersection size. Engine-portable md5 (the a_kmv_distinct_estimate
    trick) → FULL value oracle for an approximate set-operation sketch.
    Scale shape: per-set sketches are TakeOrdered(k) over distinct-hash
    reductions (k values ever cross the wire — sketches of two 100 TB
    sets meet in kilobytes); membership tests are broadcast semi-joins
    of 32-row frames. Exact intersection/union computed beside it for
    the error check (estimator error is data-dependent; the oracle pins
    the VALUES, the docstring not an error bound — at sf0.01 the user
    sets overlap almost completely, so ρ≈1)."""
    e = _t(spark, sf_dir, "events").where(F.col("user_id").isNotNull())
    h = (
        F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 15), 16, 10)
        .cast("double")
        / F.lit(float(1 << 60))
    )

    # r15 optimization round: each <=32-row sketch frame is
    # localCheckpointed — lazily, ka/kb are referenced by merged AND by
    # their broadcast membership probes and merged by rho + hk, so the
    # events scan + distinct + TakeOrdered re-ran up to 4x per run
    # (9 scans in the final plan; 5 after — the two exact channels keep
    # their own passes by construction). Materializing 32 rows is free;
    # this is exactly the "sketches of two 100 TB sets meet in
    # kilobytes" shape the docstring promises.
    def sketch(tag: str) -> DataFrame:
        return (
            e.where(F.col("event_type") == tag)
            .select(h.alias("h"))
            .distinct()
            .orderBy("h")
            .limit(32)
            .localCheckpoint(eager=False)
        )

    ka, kb = sketch("click"), sketch("purchase")
    merged = (
        ka.unionAll(kb).distinct().orderBy("h").limit(32)
        .localCheckpoint(eager=False)
    )
    rho_c = (
        merged.join(F.broadcast(ka), "h", "left_semi")
        .join(F.broadcast(kb), "h", "left_semi")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    hk = merged.agg(F.max("h").alias("hk"), F.count(F.lit(1)).alias("km"))
    inter_exact = (
        e.where(F.col("event_type") == "click")
        .select("user_id")
        .join(
            e.where(F.col("event_type") == "purchase").select("user_id").distinct(),
            "user_id",
            "left_semi",
        )
        .agg(F.count_distinct("user_id").alias("inter_exact"))
    )
    union_exact = (
        e.where(F.col("event_type").isin("click", "purchase"))
        .agg(F.count_distinct("user_id").alias("union_exact"))
    )
    one = (
        rho_c.crossJoin(hk).crossJoin(inter_exact).crossJoin(union_exact)
    )
    return one.select(
        F.lit(32).cast("int").alias("k"),
        F.round(F.col("c") / 32.0, 4).alias("jaccard_kmv"),
        F.round((F.col("km") - 1) / F.col("hk"), 4).alias("union_kmv"),
        F.round(F.col("c") / 32.0 * (F.col("km") - 1) / F.col("hk"), 4).alias(
            "inter_kmv"
        ),
        F.round(
            F.col("inter_exact").cast("double") / F.col("union_exact"), 4
        ).alias("jaccard_exact"),
    )


@query(
    "w_period_over_period",
    oracle="""
    WITH monthly AS (
      SELECT o_orderstatus AS status, date_trunc('month', o_orderdate) AS month,
             round(sum(o_totalprice), 2) AS revenue
      FROM orders GROUP BY status, month
    )
    SELECT status, month, CAST(revenue AS DOUBLE) AS revenue,
           CAST(round(revenue - lag(revenue) OVER w, 2) AS DOUBLE) AS mom_delta,
           CAST(round(100.0 * (revenue - lag(revenue) OVER w)
                      / lag(revenue) OVER w, 4) AS DOUBLE) AS mom_pct
    FROM monthly
    WINDOW w AS (PARTITION BY status ORDER BY month)
    """,
)
def w_period_over_period(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-over-month revenue delta and growth %% per order status —
    the period-over-period reporting shape (lag over an AGGREGATED
    frame). Scale note: the window runs over the monthly aggregate (tens
    of rows per status), never the fact table — the partial+final revenue
    aggregate is the only corpus-wide pass, so the 'sort' the window
    needs is a per-status handful of months. First month's deltas are
    NULL on both engines (lag has no default)."""
    o = _t(spark, sf_dir, "orders")
    monthly = o.groupBy(
        F.col("o_orderstatus").alias("status"),
        F.date_trunc("month", F.col("o_orderdate")).alias("month"),
    ).agg(F.round(F.sum("o_totalprice"), 2).alias("revenue"))
    w = W.partitionBy("status").orderBy("month")
    prev = F.lag("revenue").over(w)
    return monthly.select(
        "status",
        "month",
        "revenue",
        F.round(F.col("revenue") - prev, 2).alias("mom_delta"),
        F.round(100.0 * (F.col("revenue") - prev) / prev, 4).alias("mom_pct"),
    )


@query(
    "f_url_canonicalize",
    oracle="""
    WITH u AS (
      SELECT doc_id,
             'HTTPS://WWW.Site' || (doc_id % 7) || '.COM:443/p/' || doc_id
               || '?b=' || (doc_id % 3) || '&a=' || (doc_id % 5)
               || '#frag' AS url
      FROM documents WHERE doc_id < 300
    ),
    steps AS (
      SELECT doc_id, url,
             regexp_replace(
               regexp_replace(
                 regexp_replace(lower(url), '#.*$', ''),
                 '^(https?://)www\\.', '\\1'
               ),
               ':443/', '/'
             ) AS nofrag
      FROM u
    ),
    parts AS (
      SELECT doc_id, url,
             string_split(nofrag, '?')[1] AS base,
             string_split(nofrag, '?')[2] AS qs
      FROM steps
    )
    SELECT doc_id, url,
           CASE WHEN qs IS NULL OR qs = '' THEN base
                ELSE base || '?' ||
                     array_to_string(list_sort(string_split(qs, '&')), '&')
           END AS canonical_url
    FROM parts
    """,
)
def f_url_canonicalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL canonicalization — the normalization pass URL-level crawl
    dedup runs before hashing (case-fold scheme+host via full lowercase
    on these synthetic all-lowercase-path URLs, strip fragment, drop the
    default :443 port, strip leading www., SORT query parameters so
    ?b=&a= == ?a=&b=). Both engines execute the IDENTICAL regexp/split/
    sort steps (no parse_url — DuckDB lacks it), so the oracle is exact.
    Map-side only."""
    d = _t(spark, sf_dir, "documents").where(F.col("doc_id") < 300)
    url = F.concat(
        F.lit("HTTPS://WWW.Site"), (F.col("doc_id") % 7).cast("string"),
        F.lit(".COM:443/p/"), F.col("doc_id").cast("string"),
        F.lit("?b="), (F.col("doc_id") % 3).cast("string"),
        F.lit("&a="), (F.col("doc_id") % 5).cast("string"),
        F.lit("#frag"),
    )
    u = d.select("doc_id", url.alias("url"))
    nofrag = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.lower("url"), "#.*$", ""),
            r"^(https?://)www\.", "$1"
        ),
        ":443/", "/",
    )
    parts = u.select(
        "doc_id", "url",
        # F.get, not getItem: under ANSI an out-of-range getItem RAISES,
        # so a URL without '?' would crash before the null guard below
        # ever ran (DuckDB's [2] returns NULL gracefully) — F.get is the
        # NULL-returning access that keeps the guard live
        F.get(F.split(nofrag, r"\?"), 0).alias("base"),
        F.get(F.split(nofrag, r"\?"), 1).alias("qs"),
    )
    canon = F.when(
        F.col("qs").isNull() | (F.col("qs") == ""), F.col("base")
    ).otherwise(
        F.concat(
            F.col("base"), F.lit("?"),
            F.array_join(F.array_sort(F.split("qs", "&")), "&"),
        )
    )
    return parts.select("doc_id", "url", canon.alias("canonical_url"))


@query(
    "f_parse_url",
    oracle="""
    WITH u AS (
      SELECT doc_id,
             'https://' || source || '.example.com/docs/' || doc_id
               || '?lang=' || lang || '#top' AS url,
             source, lang
      FROM documents WHERE doc_id < 200
    )
    SELECT doc_id, url,
           'https' AS protocol,
           source || '.example.com' AS host,
           '/docs/' || doc_id AS path,
           'lang=' || lang AS query,
           lang AS lang_param
    FROM u
    """,
)
def f_parse_url(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL decomposition with Spark's parse_url (PROTOCOL/HOST/PATH/QUERY
    + keyed query parameter) — the log-sessionization preprocessing
    function family. URLs are constructed deterministically from document
    columns, and the oracle rebuilds each component from the same inputs,
    so the check pins parse_url's semantics (DuckDB has no parse_url).
    Map-side only; the filter prunes at the scan."""
    d = _t(spark, sf_dir, "documents").where(F.col("doc_id") < 200)
    url = F.concat(
        F.lit("https://"), F.col("source"), F.lit(".example.com/docs/"),
        F.col("doc_id"), F.lit("?lang="), F.col("lang"), F.lit("#top"),
    )
    u = d.select("doc_id", url.alias("url"))
    return u.select(
        "doc_id",
        "url",
        F.parse_url("url", F.lit("PROTOCOL")).alias("protocol"),
        F.parse_url("url", F.lit("HOST")).alias("host"),
        F.parse_url("url", F.lit("PATH")).alias("path"),
        F.parse_url("url", F.lit("QUERY")).alias("query"),
        F.parse_url("url", F.lit("QUERY"), F.lit("lang")).alias("lang_param"),
    )


@query(
    "o_compaction_plan",
    oracle="""
    WITH zones AS (
      SELECT CAST(floor(o_orderkey / 256) AS BIGINT) AS zone,
             CAST(count(*) AS BIGINT) AS n_rows
      FROM orders GROUP BY zone
    ),
    cum AS (
      SELECT zone, n_rows,
             sum(n_rows) OVER (ORDER BY zone
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS cum_rows
      FROM zones
    )
    SELECT zone, CAST(n_rows AS INT) AS n_rows,
           CAST(floor((cum_rows - n_rows) / 2000) AS BIGINT) AS target_file
    FROM cum
    """,
)
def o_compaction_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction planning (the Delta OPTIMIZE bin-packing
    step): zones (stand-ins for small files, with row counts as sizes)
    are packed zone-order into ~2000-row target files by cutting the
    running size total — the same head-to-tail packing as
    t_pack_sequences, so it REUSES distributed_prefix_sum: exact global
    assignment with no unpartitioned window (quantile-sharded running
    sum + broadcast shard offsets). A maintenance job then rewrites each
    target_file group in one task. The oracle computes the same plan
    with a plain global window — tractable for DuckDB, impossible shape
    at 100 TB."""
    from ..operators.text import distributed_prefix_sum

    o = _t(spark, sf_dir, "orders")
    # r15: checkpoint the zone stats so the quantile pre-pass and the
    # windowed subtree aggregate the file metadata once, not twice
    zones = o.groupBy(
        F.floor(F.col("o_orderkey") / 256).cast("long").alias("zone")
    ).agg(F.count(F.lit(1)).alias("n_rows")).localCheckpoint(eager=False)
    cum = distributed_prefix_sum(
        zones, "n_rows", "zone", [F.col("zone")], n_shards=8, out_col="cum_rows"
    )
    return cum.select(
        "zone",
        F.col("n_rows").cast("int").alias("n_rows"),
        F.floor((F.col("cum_rows") - F.col("n_rows")) / 2000)
        .cast("long")
        .alias("target_file"),
    )


@query(
    "g_degree_distribution",
    oracle="""
    WITH e AS (
      SELECT DISTINCT 'o' || l_orderkey AS src, 'p' || l_partkey AS dst
      FROM lineitem
    ),
    deg AS (
      SELECT node, sum(d) AS degree FROM (
        SELECT src AS node, count(*) AS d FROM e GROUP BY src
        UNION ALL
        SELECT dst AS node, count(*) AS d FROM e GROUP BY dst
      ) GROUP BY node
    )
    SELECT CAST(degree AS BIGINT) AS degree,
           CAST(count(*) AS BIGINT) AS n_nodes,
           CAST(substr(min(node), 1, 1) AS VARCHAR) AS min_kind,
           CAST(substr(max(node), 1, 1) AS VARCHAR) AS max_kind
    FROM deg GROUP BY degree
    """,
)
def g_degree_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree distribution of the bipartite order-part graph — the first
    thing a graph pipeline inspects (power-law vs uniform decides the
    triangle/k-core strategy; the docstring A/Bs in g_triangle_count and
    g_kcore_bipartite both hinge on it). Two per-side degree aggregates
    summed per node, then a bounded histogram — no joins at all, output
    is O(max degree). min/max node-kind per bucket shows which side of
    the bipartition populates each degree band."""
    li = _t(spark, sf_dir, "lineitem")
    e = li.select(
        F.concat(F.lit("o"), F.col("l_orderkey")).alias("src"),
        F.concat(F.lit("p"), F.col("l_partkey")).alias("dst"),
    ).distinct()
    # ONE scan: explode both endpoints of each distinct edge and count
    # incidences per node. The per-side groupBy+union form canonicalizes
    # the distinct subtree apart (the adamic-adar trap) — two lineitem
    # scans, two distinct exchanges, 0 ReusedExchange; warm interleaved
    # sf0.1 medians 1.78 s (union) vs 1.42 s (explode), equal output.
    deg = (
        e.select(F.explode(F.array("src", "dst")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("degree"))
    )
    return deg.groupBy("degree").agg(
        F.count(F.lit(1)).alias("n_nodes"),
        F.substring(F.min("node"), 1, 1).alias("min_kind"),
        F.substring(F.max("node"), 1, 1).alias("max_kind"),
    )


@query(
    "a_mode_per_group",
    oracle="""
    WITH cnt AS (
      SELECT event_type, user_id, count(*) AS n
      FROM events WHERE user_id IS NOT NULL
      GROUP BY event_type, user_id
    )
    SELECT event_type,
           CAST(user_id AS BIGINT) AS mode_user,
           CAST(n AS BIGINT) AS n_events
    FROM (
      SELECT event_type, user_id, n,
             row_number() OVER (
               PARTITION BY event_type ORDER BY n DESC, user_id ASC
             ) AS rn
      FROM cnt
    ) WHERE rn = 1
    """,
)
def a_mode_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical MODE per group (most frequent user per event type) with
    a DETERMINISTIC tie-break (count desc, lowest id) — built as
    count-then-argmax instead of Spark's `mode()` aggregate, whose tie
    winner is partial-aggregation-order dependent and therefore
    unoracleable. Two partial+final aggregates; the argmax is max_by over
    a (n, -user) struct — no window over the fact table."""
    e = _t(spark, sf_dir, "events").where(F.col("user_id").isNotNull())
    cnt = e.groupBy("event_type", "user_id").agg(F.count(F.lit(1)).alias("n"))
    best = cnt.groupBy("event_type").agg(
        F.max_by(
            F.struct(F.col("user_id").alias("u"), F.col("n").alias("c")),
            F.struct(F.col("n"), (-F.col("user_id")).alias("tb")),
        ).alias("b")
    )
    return best.select(
        "event_type",
        F.col("b.u").alias("mode_user"),
        F.col("b.c").alias("n_events"),
    )


@query(
    "m_rfm_segmentation",
    oracle="""
    WITH mx AS (SELECT max(o_orderdate) AS latest FROM orders),
    rfm AS (
      SELECT o_custkey AS c_custkey,
             date_diff('day', max(o_orderdate), (SELECT latest FROM mx))
               AS recency_days,
             count(*) AS frequency,
             round(sum(o_totalprice), 2) AS monetary
      FROM orders GROUP BY o_custkey
    )
    SELECT c_custkey, CAST(recency_days AS BIGINT) AS recency_days,
           CAST(frequency AS BIGINT) AS frequency,
           CAST(monetary AS DOUBLE) AS monetary,
           CAST(r_q * 100 + f_q * 10 + m_q AS INT) AS rfm_code
    FROM (
      SELECT c_custkey, recency_days, frequency, monetary,
             ntile(4) OVER (ORDER BY recency_days ASC, c_custkey) AS r_q,
             ntile(4) OVER (ORDER BY frequency DESC, c_custkey) AS f_q,
             ntile(4) OVER (ORDER BY monetary DESC, c_custkey) AS m_q
      FROM rfm
    )
    """,
)
def m_rfm_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer segmentation (recency / frequency / monetary
    quartiles → 3-digit segment code) — the classic CRM analytic. The
    base pass is one partial+final aggregate over orders. The quartiles
    are EXACT ntile(4) splits but computed WITHOUT an unpartitioned
    window (the r7 scale-killer): three chained distributed_prefix_sum
    passes (quantile range-sharding, within-shard windows, broadcast
    offsets — operators/text.py) yield exact global ranks in each of the
    three orders, and ntile's defined split is a pure function of
    (rank, n): with q = n div 4 and r0 = n mod 4, the first r0 buckets
    take q+1 rows — bucket(r) = (r-1) div (q+1) + 1 while r ≤ r0*(q+1),
    else r0 + (r - r0*(q+1) - 1) div q + 1. The DuckDB oracle keeps the
    literal ntile(4) form; agreement is exact because both sides rank
    the same total order (custkey tiebreak). Intermediates persist so
    each pass's approxQuantile pre-pass materializes its input once
    instead of re-evaluating the upstream windows multiplicatively (the
    g_kcore iterative discipline); CaseWhen evaluates lazily, so the
    q=0 (n<4) division in the unreachable ELSE branch never fires under
    ANSI."""
    from ..operators.text import distributed_prefix_sum

    o = _t(spark, sf_dir, "orders")
    mx = o.agg(F.max("o_orderdate").alias("latest"))
    rfm = (
        o.groupBy(F.col("o_custkey").alias("c_custkey"))
        .agg(
            F.max("o_orderdate").alias("last_order"),
            F.count(F.lit(1)).alias("frequency"),
            F.round(F.sum("o_totalprice"), 2).alias("monetary"),
        )
        .crossJoin(F.broadcast(mx))
        .select(
            "c_custkey",
            F.datediff(F.col("latest"), F.col("last_order")).cast("long").alias(
                "recency_days"
            ),
            "frequency",
            "monetary",
        )
        .withColumn("__one", F.lit(1))
        .persist()
    )
    n = rfm.groupBy().agg(F.count(F.lit(1)).alias("__n"))
    # ONE multi-column approxQuantile action covers all three rank passes'
    # shard boundaries (the three serial per-pass quantile jobs were the
    # dominant fixed cost at small batch sizes; boundary values only shape
    # shard sizes, never correctness — operators/text.py)
    rb, fb, mb = rfm.stat.approxQuantile(
        ["recency_days", "frequency", "monetary"],
        [i / 16 for i in range(1, 16)],
        0.001,
    )
    r1 = distributed_prefix_sum(
        rfm,
        "__one",
        "recency_days",
        [F.col("recency_days").asc(), F.col("c_custkey").asc()],
        out_col="__r_rank",
        bounds=rb,
    ).persist()
    r2 = distributed_prefix_sum(
        r1,
        "__one",
        "frequency",
        [F.col("frequency").desc(), F.col("c_custkey").asc()],
        descending=True,
        out_col="__f_rank",
        bounds=fb,
    ).persist()
    r3 = distributed_prefix_sum(
        r2,
        "__one",
        "monetary",
        [F.col("monetary").desc(), F.col("c_custkey").asc()],
        descending=True,
        out_col="__m_rank",
        bounds=mb,
    )

    def quart(rank_col: str):
        return F.expr(
            f"CASE WHEN {rank_col} <= (__n % 4) * ((__n DIV 4) + 1) "
            f"THEN (({rank_col} - 1) DIV ((__n DIV 4) + 1)) + 1 "
            f"ELSE (__n % 4) + (({rank_col} - (__n % 4) * ((__n DIV 4) + 1) - 1)"
            f" DIV (__n DIV 4)) + 1 END"
        )

    return r3.crossJoin(F.broadcast(n)).select(
        "c_custkey",
        "recency_days",
        "frequency",
        "monetary",
        (quart("__r_rank") * 100 + quart("__f_rank") * 10 + quart("__m_rank"))
        .cast("int")
        .alias("rfm_code"),
    )


@query(
    "w_running_distinct",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts, event_id, event_type,
             CASE WHEN row_number() OVER (
               PARTITION BY user_id, event_type ORDER BY ts, event_id
             ) = 1 THEN 1 ELSE 0 END AS first_seen
      FROM events WHERE user_id <= 20
    )
    SELECT user_id, ts, CAST(event_id AS BIGINT) AS event_id,
           CAST(sum(first_seen) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS distinct_types_so_far
    FROM flagged
    """,
)
def w_running_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running DISTINCT count per key over event time — a window frame
    Spark (and SQL generally) cannot express directly (COUNT(DISTINCT)
    OVER a running frame is unsupported): the first-occurrence-flag
    idiom instead — rank each (user, type) by time, flag rank 1, running
    SUM of flags is exactly the distinct-types-seen-so-far curve. Two
    partitioned windows, both parallel per user; the engagement-breadth
    trajectory a product-analytics funnel reads."""
    e = _t(spark, sf_dir, "events").where(F.col("user_id") <= 20)
    w_first = W.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    flagged = e.select(
        "user_id",
        "ts",
        "event_id",
        F.when(F.row_number().over(w_first) == 1, 1).otherwise(0).alias(
            "first_seen"
        ),
    )
    w_run = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    return flagged.select(
        "user_id",
        "ts",
        "event_id",
        F.sum("first_seen").over(w_run).alias("distinct_types_so_far"),
    )


@query(
    "o_scd2_intervals",
    oracle="""
    WITH ordered AS (
      SELECT user_id, event_type, ts, event_id,
             lag(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
             ) AS prev
      FROM events
    ),
    changes AS (
      SELECT user_id, event_type, ts, event_id FROM ordered
      WHERE prev IS NULL OR prev <> event_type
    )
    SELECT user_id, event_type AS attr_value, ts AS valid_from,
           lead(ts) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
           ) AS valid_to,
           (lead(ts) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
           ) IS NULL) AS is_current
    FROM changes
    """,
)
def o_scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension Type 2 build: collapse each user's event
    stream into validity intervals of its tracked attribute (event_type
    standing in for the dimension attribute) — consecutive duplicates
    merge, each change opens a new version with valid_from/valid_to and
    the open interval flagged is_current. The standard lakehouse dimension
    shape (Kimball SCD2; Delta MERGE pipelines build exactly this table).
    Two windows, both partitioned by user_id — no unpartitioned window,
    scale-safe; ties broken on event_id so both engines pick identical
    interval boundaries."""
    e = _t(spark, sf_dir, "events")
    # ONE window spec for both passes — a divergent tiebreaker between the
    # change-detect lag and the interval lead would misalign boundaries
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    changes = (
        e.withColumn("prev", F.lag("event_type").over(w))
        .where(F.col("prev").isNull() | (F.col("prev") != F.col("event_type")))
        .select("user_id", "event_type", "ts", "event_id")
    )
    return changes.select(
        "user_id",
        F.col("event_type").alias("attr_value"),
        F.col("ts").alias("valid_from"),
        F.lead("ts").over(w).alias("valid_to"),
        F.lead("ts").over(w).isNull().alias("is_current"),
    )


@query(
    "o_table_stats",
    oracle="""
    WITH s AS (SELECT * FROM lineitem)
    SELECT * FROM (
      SELECT 'l_orderkey' AS col_name,
             CAST(count(*) - count(l_orderkey) AS BIGINT) AS n_nulls,
             CAST(count(DISTINCT l_orderkey) AS BIGINT) AS ndv,
             CAST(min(l_orderkey) AS DOUBLE) AS min_num,
             CAST(max(l_orderkey) AS DOUBLE) AS max_num,
             CAST(NULL AS VARCHAR) AS min_str, CAST(NULL AS VARCHAR) AS max_str
      FROM s
      UNION ALL
      SELECT 'l_quantity', CAST(count(*) - count(l_quantity) AS BIGINT),
             CAST(count(DISTINCT l_quantity) AS BIGINT),
             CAST(min(l_quantity) AS DOUBLE), CAST(max(l_quantity) AS DOUBLE),
             NULL, NULL
      FROM s
      UNION ALL
      SELECT 'l_extendedprice', CAST(count(*) - count(l_extendedprice) AS BIGINT),
             CAST(count(DISTINCT l_extendedprice) AS BIGINT),
             CAST(min(l_extendedprice) AS DOUBLE), CAST(max(l_extendedprice) AS DOUBLE),
             NULL, NULL
      FROM s
      UNION ALL
      SELECT 'l_returnflag', CAST(count(*) - count(l_returnflag) AS BIGINT),
             CAST(count(DISTINCT l_returnflag) AS BIGINT),
             CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
             min(l_returnflag), max(l_returnflag)
      FROM s
      UNION ALL
      SELECT 'l_shipdate', CAST(count(*) - count(l_shipdate) AS BIGINT),
             CAST(count(DISTINCT l_shipdate) AS BIGINT),
             CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
             CAST(min(l_shipdate) AS VARCHAR), CAST(max(l_shipdate) AS VARCHAR)
      FROM s
    )
    """,
)
def o_table_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANALYZE-style column statistics collection over lineitem (nulls,
    exact NDV, min/max) — the CBO/stats-catalog maintenance shape (Spark's
    ANALYZE TABLE ... COMPUTE STATISTICS FOR COLUMNS; Delta collects the
    same per-file). Nulls/min/max ride one partial+final aggregate pass;
    each exact NDV is its OWN single-distinct aggregate cross-joined in
    (one-row frames) — packing 5 count-distincts into one agg planned an
    Expand that multiplied the scan 5x and measured 6.6-8.0 s at sf0.1
    vs 1.0-1.4 s for the per-column composition (A/B r10; the per-column
    form partial-distincts map-side, no Expand anywhere). Numeric min/max
    emitted as DOUBLE and string/date as VARCHAR in separate columns —
    cross-engine string rendering of doubles diverges
    (scientific-notation thresholds), typed channels don't. At 100 TB the
    same plans run partial+final; for per-file granularity see
    o_skipping_index."""
    li = _t(spark, sf_dir, "lineitem")
    num_cols = ["l_orderkey", "l_quantity", "l_extendedprice"]
    str_cols = ["l_returnflag", "l_shipdate"]
    aggs = []
    for c in num_cols + str_cols:
        aggs.append((F.count(F.lit(1)) - F.count(c)).alias(f"{c}__nulls"))
    for c in num_cols:
        aggs += [
            F.min(c).cast("double").alias(f"{c}__min"),
            F.max(c).cast("double").alias(f"{c}__max"),
        ]
    for c in str_cols:
        aggs += [
            F.min(c).cast("string").alias(f"{c}__min"),
            F.max(c).cast("string").alias(f"{c}__max"),
        ]
    one = li.agg(*aggs)
    for c in num_cols + str_cols:
        one = one.crossJoin(li.agg(F.countDistinct(c).alias(f"{c}__ndv")))
    rows = []
    for c in num_cols:
        rows.append(
            F.struct(
                F.lit(c).alias("col_name"),
                F.col(f"{c}__nulls").alias("n_nulls"),
                F.col(f"{c}__ndv").alias("ndv"),
                F.col(f"{c}__min").alias("min_num"),
                F.col(f"{c}__max").alias("max_num"),
                F.lit(None).cast("string").alias("min_str"),
                F.lit(None).cast("string").alias("max_str"),
            )
        )
    for c in str_cols:
        rows.append(
            F.struct(
                F.lit(c).alias("col_name"),
                F.col(f"{c}__nulls").alias("n_nulls"),
                F.col(f"{c}__ndv").alias("ndv"),
                F.lit(None).cast("double").alias("min_num"),
                F.lit(None).cast("double").alias("max_num"),
                F.col(f"{c}__min").alias("min_str"),
                F.col(f"{c}__max").alias("max_str"),
            )
        )
    return one.select(F.explode(F.array(*rows)).alias("r")).select("r.*")


@query(
    "g_adamic_adar_topk",
    oracle="""
    WITH d AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    deg AS (
      SELECT l_orderkey, count(*) AS n FROM d GROUP BY l_orderkey
    ),
    w AS (
      SELECT d.l_orderkey, d.l_partkey, 1.0 / ln(g.n) AS wt
      FROM d JOIN deg g USING (l_orderkey) WHERE g.n >= 2
    )
    SELECT a.l_partkey AS pa, b.l_partkey AS pb,
           CAST(count(*) AS BIGINT) AS n_common,
           CAST(round(sum(a.wt), 6) AS DOUBLE) AS aa_score
    FROM w a JOIN w b
      ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    GROUP BY pa, pb
    ORDER BY aa_score DESC, pa, pb
    LIMIT 25
    """,
)
def g_adamic_adar_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adamic-Adar link prediction over the bipartite order-part graph:
    parts sharing orders score sum(1/ln(order_size)) — big shared baskets
    contribute less, the classic common-neighbor weighting recsys
    candidate generation runs before any learned model. The pair build is
    ONE self-join co-partitioned on the order key (each order fans out to
    its own C(n,2) pairs — the same bounded blow-up the co-occurrence
    graph builders pay), the per-pair weight sum is a partial+final
    aggregate, and the global top-25 is TakeOrderedAndProject. Scores
    rounded to 6 on both engines (float-sum order differs across
    engines); ties broken by (pa, pb) so the limit is deterministic.
    Orders of size 1 contribute no pairs and are filtered BEFORE the
    self-join (n >= 2 also keeps ln(n) > 0). Both self-join sides are
    the IDENTICAL subtree with columns renamed only AFTER the join —
    projecting one side first canonicalizes the plans apart and Spark
    builds the distinct+degree pipeline twice (4 lineitem scans, no
    ReusedExchange — the r10 review caught exactly that); the aliased
    same-frame form shares one build (2 scans, ReusedExchange
    plan-pinned)."""
    li = _t(spark, sf_dir, "lineitem")
    d = li.select("l_orderkey", "l_partkey").distinct()
    deg = d.groupBy("l_orderkey").agg(F.count(F.lit(1)).alias("n"))
    w = (
        d.join(deg, "l_orderkey")
        .where(F.col("n") >= 2)
        .select(
            "l_orderkey",
            "l_partkey",
            (F.lit(1.0) / F.log(F.col("n").cast("double"))).alias("wt"),
        )
    )
    a, b = w.alias("a"), w.alias("b")
    pairs = a.join(
        b,
        (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
        & (F.col("a.l_partkey") < F.col("b.l_partkey")),
    )
    return (
        pairs.groupBy(
            F.col("a.l_partkey").alias("pa"),
            F.col("b.l_partkey").alias("pb"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_common"),
            F.round(F.sum("a.wt"), 6).alias("aa_score"),
        )
        .orderBy(F.col("aa_score").desc(), "pa", "pb")
        .limit(25)
    )


@query(
    "j_bloom_prefilter_join",
    oracle="""
    WITH promo AS (
      SELECT p_partkey FROM part WHERE p_type = 'PROMO'
    ),
    probes AS (
      SELECT p_partkey, i.i,
             CAST(concat('0x', substr(md5(concat('bloom:',
                  CAST(p_partkey AS VARCHAR))), 1 + i.i * 8, 8)) AS BIGINT)
               % 1024 AS pos
      FROM promo, LATERAL (SELECT unnest(range(0, 3)) AS i) i
    ),
    bloom AS (
      SELECT pos // 32 AS word,
             bit_or(CAST(1 AS BIGINT) << CAST(pos % 32 AS INT)) AS bits
      FROM probes GROUP BY pos // 32
    ),
    lp AS (
      SELECT l_partkey, l_extendedprice, l_discount,
             CAST(concat('0x', substr(h, 1, 8)) AS BIGINT) % 1024 AS pos0,
             CAST(concat('0x', substr(h, 9, 8)) AS BIGINT) % 1024 AS pos1,
             CAST(concat('0x', substr(h, 17, 8)) AS BIGINT) % 1024 AS pos2
      FROM (
        SELECT l.l_partkey, l.l_extendedprice, l.l_discount,
               md5(concat('bloom:', CAST(l.l_partkey AS VARCHAR))) AS h
        FROM lineitem l
      )
    ),
    cands AS (
      SELECT lp.l_partkey, lp.l_extendedprice, lp.l_discount
      FROM lp
      JOIN bloom b0 ON b0.word = lp.pos0 // 32
        AND (b0.bits & (CAST(1 AS BIGINT) << CAST(lp.pos0 % 32 AS INT))) <> 0
      JOIN bloom b1 ON b1.word = lp.pos1 // 32
        AND (b1.bits & (CAST(1 AS BIGINT) << CAST(lp.pos1 % 32 AS INT))) <> 0
      JOIN bloom b2 ON b2.word = lp.pos2 // 32
        AND (b2.bits & (CAST(1 AS BIGINT) << CAST(lp.pos2 % 32 AS INT))) <> 0
    )
    SELECT count(*) AS n_bloom_pass,
           count(p.p_partkey) AS n_true,
           CAST(count(*) - count(p.p_partkey) AS BIGINT) AS n_false_pos,
           CAST(round(sum(CASE WHEN p.p_partkey IS NOT NULL
                 THEN c.l_extendedprice * (1 - c.l_discount) END), 2)
             AS DOUBLE) AS promo_revenue
    FROM cands c LEFT JOIN promo p ON p.p_partkey = c.l_partkey
    """,
)
def j_bloom_prefilter_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter join pre-filter — the 100 TB technique for a selective
    fact-to-dim join: the qualifying dim keys (PROMO parts) collapse into
    a 1024-bit / k=3 bloom (32 words as one ~32-row table), the fact scan
    tests membership via three BROADCAST joins on the word index — the
    big side never shuffles to discover it doesn't qualify, which is the
    point: at scale the bloom is a few KB regardless of dim cardinality,
    while a semi-join shuffles every fact row. The exact join then runs
    only over the bloom survivors; the output is the filter's measured
    quality (pass / true / false-positive counts) plus the exact revenue.
    All hash math is md5-derived and mirrored digit-for-digit in the
    oracle, so even the false-positive count is deterministic.
    Spark runs AQE-off-equivalent literal math: conv(hex,16,10) == the
    DuckDB '0x..' BIGINT cast (the t_shuffle_shards precedent). No false
    negatives by construction — pinned in tests/test_analytics.py."""
    part = _t(spark, sf_dir, "part")
    li = _t(spark, sf_dir, "lineitem")
    promo = part.where(F.col("p_type") == "PROMO").select("p_partkey")

    def _hash(col: F.Column) -> F.Column:
        return F.md5(F.concat(F.lit("bloom:"), col.cast("string")))

    def _pos(h: F.Column, i: int) -> F.Column:
        # three 32-bit probe hashes sliced from ONE md5 digest per key —
        # the hash math is the measured floor of this entry (1.4-2.2 s for
        # 3 independent md5s over sf0.1 lineitem vs ~0.5 s for one)
        return F.conv(F.substring(h, 1 + i * 8, 8), 16, 10).cast("long") % 1024

    # r15 optimization: ONE part scan emits all three probe positions
    # (explode of a 3-element array — the union-of-three-selects form
    # scanned part once per probe), and the <=32-row word table is
    # localCheckpointed so the three broadcast builds below read the
    # materialized rows instead of each re-deriving the whole bloom
    # subtree (measured 11 parquet scans in one plan before).
    ph = promo.select(_hash(F.col("p_partkey")).alias("h"))
    probes = ph.select(
        F.explode(
            F.array(*[_pos(F.col("h"), i) for i in range(3)])
        ).alias("pos")
    )
    bloom = (
        probes.groupBy(F.expr("pos div 32").alias("word"))
        .agg(
            F.expr(
                "bit_or(shiftleft(CAST(1 AS BIGINT), CAST(pos % 32 AS INT)))"
            ).alias("bits")
        )
        .localCheckpoint(eager=False)
    )
    lp = li.select(
        "l_partkey",
        "l_extendedprice",
        "l_discount",
        _hash(F.col("l_partkey")).alias("h"),
    ).select(
        "l_partkey",
        "l_extendedprice",
        "l_discount",
        *[_pos(F.col("h"), i).alias(f"pos{i}") for i in range(3)],
    )
    cands = lp
    for i in range(3):
        b = bloom.select(
            F.col("word").alias(f"w{i}"), F.col("bits").alias(f"bits{i}")
        )
        cands = cands.join(
            F.broadcast(b), F.expr(f"pos{i} div 32") == F.col(f"w{i}")
        ).where(
            F.expr(
                f"(bits{i} & shiftleft(CAST(1 AS BIGINT),"
                f" CAST(pos{i} % 32 AS INT))) <> 0"
            )
        )
    # The exact-join dim side carries NO explicit broadcast hint (r11
    # VERDICT audit): promo's cardinality is data-dependent, and explicit
    # hints are honored unconditionally (AQE never demotes them) — an
    # ungated hint here is a driver-OOM lever at scale. The planner's own
    # size-estimate gate picks BroadcastHashJoin whenever promo fits
    # spark.sql.autoBroadcastJoinThreshold (it does at every test scale —
    # plan-pinned) and degrades to a shuffle join when it doesn't, which
    # is the correct 100 TB behavior. The three bloom-word joins above
    # keep their hints: the word table is <= 32 rows BY CONSTRUCTION
    # (1024 bits / 32 per word) at any dim cardinality.
    return (
        cands.join(
            promo,
            cands.l_partkey == promo.p_partkey,
            "left",
        )
        .agg(
            F.count(F.lit(1)).alias("n_bloom_pass"),
            F.count("p_partkey").alias("n_true"),
            (F.count(F.lit(1)) - F.count("p_partkey"))
            .cast("long")
            .alias("n_false_pos"),
            F.round(
                F.sum(
                    F.when(
                        F.col("p_partkey").isNotNull(),
                        F.col("l_extendedprice") * (1 - F.col("l_discount")),
                    )
                ),
                2,
            ).alias("promo_revenue"),
        )
    )


@query(
    "g_degree_powerlaw_slope",
    oracle="""
    WITH e AS (
      SELECT DISTINCT 'o' || l_orderkey AS src, 'p' || l_partkey AS dst
      FROM lineitem
    ),
    deg AS (
      SELECT node, sum(d) AS degree FROM (
        SELECT src AS node, count(*) AS d FROM e GROUP BY src
        UNION ALL
        SELECT dst AS node, count(*) AS d FROM e GROUP BY dst
      ) GROUP BY node
    ),
    hist AS (SELECT degree, count(*) AS n_nodes FROM deg GROUP BY degree)
    SELECT CAST(count(*) AS BIGINT) AS n_degree_buckets,
           CAST(round(regr_slope(ln(CAST(n_nodes AS DOUBLE)),
                                 ln(CAST(degree AS DOUBLE))), 6) AS DOUBLE)
             AS loglog_slope,
           CAST(round(regr_intercept(ln(CAST(n_nodes AS DOUBLE)),
                                     ln(CAST(degree AS DOUBLE))), 6) AS DOUBLE)
             AS loglog_intercept,
           CAST(round(regr_r2(ln(CAST(n_nodes AS DOUBLE)),
                              ln(CAST(degree AS DOUBLE))), 6) AS DOUBLE)
             AS loglog_r2
    FROM hist
    """,
)
def g_degree_powerlaw_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Power-law exponent fit over the bipartite degree histogram: the
    log-log least-squares slope (a power law y = C·x^-a is a line of
    slope -a in log-log space, Clauset et al.'s quick diagnostic) plus
    intercept and R² — the one-row answer to 'is this graph skewed
    enough to need degree-aware join strategies?' that the triangle /
    k-core docstring A/Bs reference. The histogram is g_degree_
    distribution's (bounded, O(max degree)); the regression runs as one
    moment-based aggregate over it — no collect, no iteration."""
    li = _t(spark, sf_dir, "lineitem")
    e = li.select(
        F.concat(F.lit("o"), F.col("l_orderkey")).alias("src"),
        F.concat(F.lit("p"), F.col("l_partkey")).alias("dst"),
    ).distinct()
    # single-scan explode form — see g_degree_distribution's A/B note
    deg = (
        e.select(F.explode(F.array("src", "dst")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("degree"))
    )
    hist = deg.groupBy("degree").agg(F.count(F.lit(1)).alias("n_nodes"))
    ly = F.log(F.col("n_nodes").cast("double"))
    lx = F.log(F.col("degree").cast("double"))
    return hist.agg(
        F.count(F.lit(1)).alias("n_degree_buckets"),
        F.round(F.regr_slope(ly, lx), 6).alias("loglog_slope"),
        F.round(F.regr_intercept(ly, lx), 6).alias("loglog_intercept"),
        F.round(F.regr_r2(ly, lx), 6).alias("loglog_r2"),
    )


@query(
    "o_partition_skew_stats",
    oracle="""
    WITH b AS (
      SELECT CAST(concat('0x', substr(md5(CAST(o_custkey AS VARCHAR)), 1, 8))
                  AS BIGINT) % 64 AS bucket,
             o_custkey
      FROM orders
    ),
    counts AS (
      SELECT bucket, count(*) AS n_rows,
             count(DISTINCT o_custkey) AS n_keys
      FROM b GROUP BY bucket
    ),
    tot AS (SELECT sum(n_rows) AS total FROM counts)
    SELECT bucket, CAST(n_rows AS BIGINT) AS n_rows,
           CAST(n_keys AS BIGINT) AS n_keys,
           CAST((n_rows * 64000) // total AS BIGINT) AS load_permille_x64
    FROM counts CROSS JOIN tot
    """,
)
def o_partition_skew_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-partition skew audit — the pre-flight check before choosing a
    shuffle key at 100 TB: bucket orders by a 64-way md5 hash of the
    candidate key and report per-bucket row/key loads plus the load
    factor ×64 in permille (1000 = perfectly uniform; integer math, no
    float rounding channel). One aggregate over the fact table; the
    64-row result is localCheckpointed so the total (its second
    consumer) doesn't rescan the fact table. The md5 bucket mirrors
    digit-for-digit in DuckDB — same trick as t_shuffle_shards; the
    production engine buckets with crc32 (streaming/snapshot_store's
    _bucket_expr), which this audits a portable stand-in for."""
    o = _t(spark, sf_dir, "orders")
    bucket = (
        F.conv(
            F.substring(F.md5(F.col("o_custkey").cast("string")), 1, 8), 16, 10
        ).cast("long")
        % 64
    )
    counts = (
        o.groupBy(bucket.alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.countDistinct("o_custkey").alias("n_keys"),
        )
        .localCheckpoint(eager=False)
    )
    tot = counts.agg(F.sum("n_rows").alias("total"))
    return counts.crossJoin(F.broadcast(tot)).select(
        "bucket",
        "n_rows",
        "n_keys",
        F.expr("CAST((n_rows * 64000) div total AS BIGINT)").alias(
            "load_permille_x64"
        ),
    )


@query(
    "g_hits_unrolled",
    oracle="""
    WITH e AS (
      SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
    ),
    h1 AS (SELECT o, count(*) AS s FROM e GROUP BY o),
    a1 AS (SELECT e.p, sum(h1.s) AS s FROM e JOIN h1 USING (o) GROUP BY e.p),
    h2 AS (SELECT e.o, sum(a1.s) AS s FROM e JOIN a1 USING (p) GROUP BY e.o),
    a2 AS (SELECT e.p, sum(h2.s) AS s FROM e JOIN h2 USING (o) GROUP BY e.p),
    scored AS (
      SELECT 'hub' AS kind, o AS id,
             round(s / CAST((SELECT max(s) FROM h2) AS DOUBLE), 6) AS score
      FROM h2
      UNION ALL
      SELECT 'auth', p,
             round(s / CAST((SELECT max(s) FROM a2) AS DOUBLE), 6)
      FROM a2
    )
    SELECT kind, CAST(id AS BIGINT) AS id, CAST(score AS DOUBLE) AS score,
           CAST(rank AS INT) AS rank
    FROM (
      SELECT kind, id, score,
             row_number() OVER (
               PARTITION BY kind ORDER BY score DESC, id
             ) AS rank
      FROM scored
    ) WHERE rank <= 20
    """,
)
def g_hits_unrolled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HITS hubs-and-authorities (Kleinberg 1999), two unrolled mutual-
    reinforcement iterations on the bipartite order-part graph — the
    pagerank/LPA unrolled-CTE trick: fixed rounds make the scores a pure
    function of the data, and because hub/authority mass starts at 1 the
    ENTIRE iteration stays in exact integer arithmetic (sums of counts) —
    the only floats are the final max-normalizations, so the oracle is
    exact. Each half-step is one edge join + aggregate alternating keys
    o/p (the at-scale shuffle shape); the edge list is localCheckpointed
    against multiplicative re-evaluation across its four consumers
    (iterative-graph discipline); top-20 per side rides ONE window
    partitioned by kind (WindowGroupLimit, never a global sort).
    Round-before-rank keeps both engines ranking identical doubles."""
    li = _t(spark, sf_dir, "lineitem")
    e = (
        li.select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    h1 = e.groupBy("o").agg(F.count(F.lit(1)).alias("s"))
    a1 = e.join(h1, "o").groupBy("p").agg(F.sum("s").alias("s"))
    h2 = (
        e.join(a1, "p").groupBy("o").agg(F.sum("s").alias("s"))
        .localCheckpoint(eager=False)  # consumers: a2 join, max, output
    )
    a2 = (
        e.join(h2, "o").groupBy("p").agg(F.sum("s").alias("s"))
        .localCheckpoint(eager=False)  # consumers: max + output
    )
    hm = h2.agg(F.max("s").alias("m"))
    am = a2.agg(F.max("s").alias("m"))
    hubs = h2.crossJoin(F.broadcast(hm)).select(
        F.lit("hub").alias("kind"),
        F.col("o").alias("id"),
        F.round(F.col("s") / F.col("m").cast("double"), 6).alias("score"),
    )
    auths = a2.crossJoin(F.broadcast(am)).select(
        F.lit("auth").alias("kind"),
        F.col("p").alias("id"),
        F.round(F.col("s") / F.col("m").cast("double"), 6).alias("score"),
    )
    w = W.partitionBy("kind").orderBy(F.col("score").desc(), F.col("id"))
    return (
        hubs.unionAll(auths)
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 20)
        .select("kind", "id", "score", F.col("rank").cast("int").alias("rank"))
    )


@query(
    "j_asof_tolerance_join",
    oracle="""
    WITH purchases AS (
      SELECT user_id, ts, event_id, value FROM events
      WHERE event_type = 'purchase'
    ),
    clicks AS (
      SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
    ),
    ranked AS (
      SELECT c.event_id,
             p.event_id AS purchase_event_id,
             CAST(round(p.value, 2) AS DOUBLE) AS purchase_value,
             row_number() OVER (
               PARTITION BY c.event_id ORDER BY p.ts DESC, p.event_id DESC
             ) AS rn
      FROM clicks c JOIN purchases p
        ON c.user_id = p.user_id
       AND p.ts < c.ts AND p.ts >= c.ts - INTERVAL 1 HOUR
    )
    SELECT c.event_id, r.purchase_event_id, r.purchase_value
    FROM clicks c
    LEFT JOIN ranked r ON r.event_id = c.event_id AND r.rn = 1
    """,
)
def j_asof_tolerance_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join with a STALENESS TOLERANCE — the feature-store /
    point-in-time-correctness contract: each click gets the most recent
    prior purchase ONLY if it is at most 1 hour old; staler history
    yields NULLs rather than silently ancient features (training-serving
    skew's classic cause). The tolerance is also the scale fix the
    unbounded j_asof_join lacks: `p_ts < ts` alone makes join state grow
    with all history, while the band turns it into a bounded interval
    join — pre-bucketable on (user, hour) exactly like
    j_interval_overlap_join, and the streaming twin is a watermarked
    stream-stream join whose state expires at the tolerance. LEFT
    semantics keep every click (probe-side preserving)."""
    events = _t(spark, sf_dir, "events")
    clicks, best = _asof_click_purchase(events, "INTERVAL 1 HOUR")
    return clicks.join(
        best, clicks.event_id == best.m_event_id, "left"
    ).select(
        "event_id",
        F.col("best.p_event_id").alias("purchase_event_id"),
        F.round(F.col("best.p_value"), 2).alias("purchase_value"),
    )


@query(
    "a_ols_two_feature",
    oracle="""
    WITH m AS (
      SELECT count(*) AS n,
             sum(l_quantity) AS sx1, sum(l_discount) AS sx2,
             sum(l_extendedprice) AS sy,
             sum(l_quantity * l_quantity) AS sx1x1,
             sum(l_discount * l_discount) AS sx2x2,
             sum(l_quantity * l_discount) AS sx1x2,
             sum(l_quantity * l_extendedprice) AS sx1y,
             sum(l_discount * l_extendedprice) AS sx2y
      FROM lineitem
    ),
    c AS (
      SELECT n,
             sx1x1 - sx1 * sx1 / n AS a11,
             sx1x2 - sx1 * sx2 / n AS a12,
             sx2x2 - sx2 * sx2 / n AS a22,
             sx1y - sx1 * sy / n AS b1,
             sx2y - sx2 * sy / n AS b2,
             sx1 / n AS mx1, sx2 / n AS mx2, sy / n AS my
      FROM m
    )
    SELECT CAST(n AS BIGINT) AS n,
           CAST(round((b1 * a22 - b2 * a12) / (a11 * a22 - a12 * a12), 6)
                AS DOUBLE) AS beta_quantity,
           CAST(round((b2 * a11 - b1 * a12) / (a11 * a22 - a12 * a12), 6)
                AS DOUBLE) AS beta_discount,
           CAST(round(my - (b1 * a22 - b2 * a12) / (a11 * a22 - a12 * a12) * mx1
                         - (b2 * a11 - b1 * a12) / (a11 * a22 - a12 * a12) * mx2,
                6) AS DOUBLE) AS intercept
    FROM c
    """,
)
def a_ols_two_feature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-feature ordinary least squares IN-ENGINE — price ~ quantity +
    discount via the closed-form normal equations: one moment-aggregate
    pass collects the 9 sufficient statistics, the centered 2x2 system
    solves by Cramer's rule in plain arithmetic — the multi-feature
    upgrade of regr_slope (a_corr_regression / g_degree_powerlaw_slope)
    and the pattern that scales to any feature count that fits a
    driver-side solve: the DATA pass is one map-side aggregate
    regardless of rows, the solve is O(k³) on k sufficient statistics.
    Both engines compute identical moment sums up to float association
    (round 6 on O(1)-conditioned outputs)."""
    li = _t(spark, sf_dir, "lineitem")
    x1, x2, y = F.col("l_quantity"), F.col("l_discount"), F.col("l_extendedprice")
    m = li.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x1).alias("sx1"), F.sum(x2).alias("sx2"), F.sum(y).alias("sy"),
        F.sum(x1 * x1).alias("sx1x1"), F.sum(x2 * x2).alias("sx2x2"),
        F.sum(x1 * x2).alias("sx1x2"),
        F.sum(x1 * y).alias("sx1y"), F.sum(x2 * y).alias("sx2y"),
    )
    c = m.select(
        "n",
        (F.col("sx1x1") - F.col("sx1") * F.col("sx1") / F.col("n")).alias("a11"),
        (F.col("sx1x2") - F.col("sx1") * F.col("sx2") / F.col("n")).alias("a12"),
        (F.col("sx2x2") - F.col("sx2") * F.col("sx2") / F.col("n")).alias("a22"),
        (F.col("sx1y") - F.col("sx1") * F.col("sy") / F.col("n")).alias("b1"),
        (F.col("sx2y") - F.col("sx2") * F.col("sy") / F.col("n")).alias("b2"),
        (F.col("sx1") / F.col("n")).alias("mx1"),
        (F.col("sx2") / F.col("n")).alias("mx2"),
        (F.col("sy") / F.col("n")).alias("my"),
    )
    det = F.col("a11") * F.col("a22") - F.col("a12") * F.col("a12")
    bq = (F.col("b1") * F.col("a22") - F.col("b2") * F.col("a12")) / det
    bd = (F.col("b2") * F.col("a11") - F.col("b1") * F.col("a12")) / det
    return c.select(
        F.col("n").cast("long").alias("n"),
        F.round(bq, 6).alias("beta_quantity"),
        F.round(bd, 6).alias("beta_discount"),
        F.round(F.col("my") - bq * F.col("mx1") - bd * F.col("mx2"), 6).alias(
            "intercept"
        ),
    )


@query(
    "a_distribution_moments",
    oracle="""
    WITH m AS (
      SELECT l_returnflag,
             count(*) AS n,
             sum(l_extendedprice) AS s1,
             sum(l_extendedprice * l_extendedprice) AS s2,
             sum(l_extendedprice * l_extendedprice * l_extendedprice) AS s3,
             sum(l_extendedprice * l_extendedprice * l_extendedprice
                 * l_extendedprice) AS s4
      FROM lineitem GROUP BY l_returnflag
    ),
    c AS (
      SELECT l_returnflag, n, s1 / n AS mu,
             s2 / n - (s1 / n) * (s1 / n) AS var_pop,
             s3 / n - 3 * (s1 / n) * (s2 / n) + 2 * (s1 / n) * (s1 / n)
               * (s1 / n) AS mu3,
             s4 / n - 4 * (s1 / n) * (s3 / n)
               + 6 * (s1 / n) * (s1 / n) * (s2 / n)
               - 3 * (s1 / n) * (s1 / n) * (s1 / n) * (s1 / n) AS mu4
      FROM m
    )
    SELECT l_returnflag, CAST(n AS BIGINT) AS n,
           CAST(round(mu, 4) AS DOUBLE) AS mean,
           CAST(round(sqrt(var_pop), 4) AS DOUBLE) AS stddev_pop,
           CAST(round(mu3 / pow(var_pop, 1.5), 6) AS DOUBLE) AS skewness,
           CAST(round(mu4 / (var_pop * var_pop) - 3, 6) AS DOUBLE)
             AS excess_kurtosis
    FROM c
    """,
)
def a_distribution_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher distribution moments per group — population skewness and
    excess kurtosis derived from RAW POWER SUMS (Σx..Σx⁴) in identical
    arithmetic on both engines, deliberately NOT the built-in
    skewness()/kurtosis() whose sample-vs-population corrections differ
    across engines. One partial+final aggregate collects four sums; the
    central-moment algebra is plain per-row math over |groups| rows.
    The mergeable-sufficient-statistics pattern (same as
    a_ols_two_feature): shards combine by adding sums — the 100 TB
    shape for any moment-based monitor."""
    li = _t(spark, sf_dir, "lineitem")
    x = F.col("l_extendedprice")
    m = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).alias("s1"),
        F.sum(x * x).alias("s2"),
        F.sum(x * x * x).alias("s3"),
        F.sum(x * x * x * x).alias("s4"),
    )
    mu = F.col("s1") / F.col("n")
    var = F.col("s2") / F.col("n") - mu * mu
    mu3 = F.col("s3") / F.col("n") - 3 * mu * (F.col("s2") / F.col("n")) + 2 * mu * mu * mu
    mu4 = (
        F.col("s4") / F.col("n")
        - 4 * mu * (F.col("s3") / F.col("n"))
        + 6 * mu * mu * (F.col("s2") / F.col("n"))
        - 3 * mu * mu * mu * mu
    )
    c = m.select(
        "l_returnflag", "n",
        mu.alias("mu"), var.alias("var_pop"),
        mu3.alias("mu3"), mu4.alias("mu4"),
    )
    return c.select(
        "l_returnflag",
        F.col("n").cast("long").alias("n"),
        F.round(F.col("mu"), 4).alias("mean"),
        F.round(F.sqrt(F.col("var_pop")), 4).alias("stddev_pop"),
        F.round(F.col("mu3") / F.pow(F.col("var_pop"), 1.5), 6).alias(
            "skewness"
        ),
        F.round(
            F.col("mu4") / (F.col("var_pop") * F.col("var_pop")) - 3, 6
        ).alias("excess_kurtosis"),
    )


def wide_int(expr: str, *, duck: bool = False, wide: bool = True) -> str:
    """Render ``expr`` in the exact wide-integer channel: DECIMAL(38,0)
    on the Spark side, HUGEINT (int128) on the DuckDB side — both exact
    integer arithmetic to ~1e38, so widening the FIRST operand of a
    product chain lifts the whole chain out of bigint. With wide=False
    the expression is returned unchanged (the bigint channel), so one
    formula template renders all four (engine × channel) variants. This
    is the a_basket_lift_decimal pattern factored into ONE helper (r14
    VERDICT task 4) and applied to every n³-channel stats entry
    (a_spearman_rho / a_mann_whitney_u / a_gini_by_group `_decimal`
    twins below). Under ANSI the un-widened channel RAISES loudly past
    its bound — never silently wrong — and the twin is the escape."""
    if not wide:
        return expr
    return f"CAST({expr} AS {'HUGEINT' if duck else 'DECIMAL(38,0)'})"


# The two basket-lift channel variants (VERDICT r12 task 5). Shared as
# module constants so the overflow-bound test drives the EXACT production
# expressions: the bigint channel is exact while n_both*n_users*1e6 fits
# int64 (n_users < ~3e6 at typical basket shapes) and RAISES under ANSI
# past that; the DECIMAL(38,0) channel widens every product operand so
# the intermediates are exact integers up to 1e38 — the final quotients
# always fit BIGINT (confidence <= 1e6; lift <= n_users*1e6), so both
# channels ship identical BIGINT columns and are value-equal wherever
# the bigint one is defined. Spark's `div` on DECIMAL operands is
# IntegralDivide -> BIGINT, same truncation as the integral form.
_BASKET_CHANNELS_BIGINT = (
    "CAST(n_both * 1000000 div n_a AS BIGINT)",
    "CAST(n_both * 1000000 div n_b AS BIGINT)",
    "CAST(n_both * n_users * 1000000 div (n_a * n_b) AS BIGINT)",
)
_BASKET_CHANNELS_DECIMAL = (
    f"CAST({wide_int('n_both')} * 1000000 div n_a AS BIGINT)",
    f"CAST({wide_int('n_both')} * 1000000 div n_b AS BIGINT)",
    f"CAST({wide_int('n_both')} * n_users * 1000000"
    f" div ({wide_int('n_a')} * n_b) AS BIGINT)",
)
# DuckDB mirror of the decimal channel: HUGEINT (int128) is DuckDB's
# exact wide-integer arithmetic; all operands are positive so its
# flooring // equals Spark's truncating div.
_BASKET_ORACLE_BIGINT = """
    SELECT p.type_a, p.type_b, ca.n AS n_a, cb.n AS n_b, p.n_both,
           CAST(p.n_both * 1000000 // ca.n AS BIGINT) AS confidence_ab_ppm,
           CAST(p.n_both * 1000000 // cb.n AS BIGINT) AS confidence_ba_ppm,
           CAST(p.n_both * nu.n_users * 1000000 // (ca.n * cb.n) AS BIGINT)
             AS lift_ppm
"""
_BASKET_ORACLE_DECIMAL = """
    SELECT p.type_a, p.type_b, ca.n AS n_a, cb.n AS n_b, p.n_both,
           CAST(CAST(p.n_both AS HUGEINT) * 1000000 // ca.n AS BIGINT)
             AS confidence_ab_ppm,
           CAST(CAST(p.n_both AS HUGEINT) * 1000000 // cb.n AS BIGINT)
             AS confidence_ba_ppm,
           CAST(CAST(p.n_both AS HUGEINT) * nu.n_users * 1000000
                // (CAST(ca.n AS HUGEINT) * cb.n) AS BIGINT) AS lift_ppm
"""
_BASKET_ORACLE_BODY = """
    WITH ut AS (
      SELECT DISTINCT user_id, event_type FROM events
      WHERE user_id IS NOT NULL
    ),
    nu AS (SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS n_users FROM ut),
    tc AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n FROM ut GROUP BY 1),
    pairs AS (
      SELECT a.event_type AS type_a, b.event_type AS type_b,
             CAST(count(*) AS BIGINT) AS n_both
      FROM ut a JOIN ut b
        ON a.user_id = b.user_id AND a.event_type < b.event_type
      GROUP BY 1, 2
    )
    {channels}
    FROM pairs p
    JOIN tc ca ON ca.event_type = p.type_a
    JOIN tc cb ON cb.event_type = p.type_b
    CROSS JOIN nu
"""


def _basket_lift(spark: SparkSession, sf_dir: str, decimal: bool) -> DataFrame:
    e = _t(spark, sf_dir, "events").where(F.col("user_id").isNotNull())
    # r16 (VERDICT item 8, the survey's scan tail): ut has FOUR lazy
    # consumers (nu, tc, both self-join sides) — unmaterialized, each
    # re-ran the events scan + distinct (10 parquet scans in one plan;
    # 2 after). The checkpointed frame is |users|x|types| rows, a few MB
    # at any realistic type cardinality.
    ut = (
        e.select("user_id", "event_type")
        .distinct()
        .localCheckpoint(eager=False)
    )
    nu = ut.groupBy().agg(F.countDistinct("user_id").alias("n_users"))
    tc = ut.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    a = ut.select(F.col("user_id").alias("ua"), F.col("event_type").alias("type_a"))
    b = ut.select(F.col("user_id").alias("ub"), F.col("event_type").alias("type_b"))
    pairs = (
        a.join(b, (F.col("ua") == F.col("ub")) & (F.col("type_a") < F.col("type_b")))
        .groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).alias("n_both"))
    )
    ca = tc.select(F.col("event_type").alias("type_a"), F.col("n").alias("n_a"))
    cb = tc.select(F.col("event_type").alias("type_b"), F.col("n").alias("n_b"))
    conf_ab, conf_ba, lift = (
        _BASKET_CHANNELS_DECIMAL if decimal else _BASKET_CHANNELS_BIGINT
    )
    return (
        pairs.join(F.broadcast(ca), "type_a")
        .join(F.broadcast(cb), "type_b")
        .crossJoin(F.broadcast(nu))
        .select(
            "type_a",
            "type_b",
            "n_a",
            "n_b",
            "n_both",
            F.expr(conf_ab).alias("confidence_ab_ppm"),
            F.expr(conf_ba).alias("confidence_ba_ppm"),
            F.expr(lift).alias("lift_ppm"),
        )
    )


@query(
    "a_basket_lift",
    oracle=_BASKET_ORACLE_BODY.format(channels=_BASKET_ORACLE_BIGINT),
)
def a_basket_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket association (support / confidence / lift) between
    event-type pairs at user granularity — the co-occurrence analysis a
    recommendation or anomaly pass runs ("users who error also churn?").
    The basket frame is the DISTINCT (user, type) projection, so pair
    counts come from a self-join keyed on user_id with type_a < type_b
    canonicalizing each unordered pair once; per-type user counts and
    the global user count are broadcast back (|types|-row and 1-row
    frames — broadcast-exempt classes 3 and 1). All-integer channels:
    confidence and lift ship as ppm via bigint div. Overflow bound:
    n_both * n_users * 1e6 stays under 2^63 while n_users < ~3e6; past
    that, ANSI mode raises loudly — use a_basket_lift_decimal, the
    DECIMAL(38,0) escape hatch (r12 task 5, no longer just documented).
    At 100 TB the only corpus-scale shuffle is the distinct; everything
    after is |types|-bounded."""
    return _basket_lift(spark, sf_dir, decimal=False)


@query(
    "a_basket_lift_decimal",
    oracle=_BASKET_ORACLE_BODY.format(channels=_BASKET_ORACLE_DECIMAL),
)
def a_basket_lift_decimal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """a_basket_lift's DECIMAL(38,0) escape hatch as a first-class entry
    (VERDICT r12 task 5): identical plan and identical BIGINT output
    columns, but every product operand widened to DECIMAL(38,0) before
    the multiply, so the lift intermediate (n_both * n_users * 1e6,
    bigint-overflowing past ~3e6 users) is exact to 1e38 — the 100×
    design point runs THIS entry. The oracle widens via HUGEINT (int128,
    DuckDB's exact wide-integer channel; all operands positive so
    flooring // == truncating div). bigint-vs-decimal equality is pinned
    in tests/test_analytics.py, and the overflow bound itself is pinned
    by driving the shared channel constants at n_users past 2^63/(n_both
    *1e6): bigint raises under ANSI, decimal returns the exact value."""
    return _basket_lift(spark, sf_dir, decimal=True)


@query(
    "g_part_jaccard_topk",
    oracle="""
    WITH d AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    deg AS (SELECT l_partkey, CAST(count(*) AS BIGINT) AS n FROM d GROUP BY 1),
    pairs AS (
      SELECT a.l_partkey AS pa, b.l_partkey AS pb,
             CAST(count(*) AS BIGINT) AS n_common
      FROM d a JOIN d b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2
    ),
    scored AS (
      SELECT p.pa, p.pb, p.n_common, da.n AS n_a, db.n AS n_b,
             CAST(p.n_common * 1000000
                  // (da.n + db.n - p.n_common) AS BIGINT) AS jaccard_ppm
      FROM pairs p
      JOIN deg da ON da.l_partkey = p.pa
      JOIN deg db ON db.l_partkey = p.pb
    )
    SELECT pa, pb, n_common, n_a, n_b, jaccard_ppm
    FROM scored ORDER BY jaccard_ppm DESC, pa, pb LIMIT 25
    """,
)
def g_part_jaccard_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Neighborhood-Jaccard link prediction over the order-part bipartite
    graph — the set-overlap sibling of g_adamic_adar_topk (AA weights
    common neighbors by rarity; Jaccard normalizes by the UNION, so a
    part in every order can't dominate). |N(a)∩N(b)| comes from the same
    one-self-join pair build (both sides the IDENTICAL aliased frame,
    renamed only after the join — the adamic-adar ReusedExchange lesson);
    degrees count ALL orders per part (singleton orders belong in the
    union even though they can never be common), joined back WITHOUT a
    broadcast hint — |parts| grows with SF (hint-policy class 4: let the
    planner's size estimate decide). jaccard = common/(da+db-common) as
    exact integer ppm; top-25 is TakeOrderedAndProject on the
    (jaccard desc, pa, pb) total order."""
    li = _t(spark, sf_dir, "lineitem")
    d = li.select("l_orderkey", "l_partkey").distinct()
    deg = d.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("n"))
    a, b = d.alias("a"), d.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("pa"),
            F.col("b.l_partkey").alias("pb"),
        )
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    da = deg.select(F.col("l_partkey").alias("pa"), F.col("n").alias("n_a"))
    db = deg.select(F.col("l_partkey").alias("pb"), F.col("n").alias("n_b"))
    return (
        pairs.join(da, "pa")
        .join(db, "pb")
        .select(
            "pa",
            "pb",
            "n_common",
            "n_a",
            "n_b",
            F.expr(
                "CAST(n_common * 1000000 div (n_a + n_b - n_common)"
                " AS BIGINT)"
            ).alias("jaccard_ppm"),
        )
        .orderBy(F.col("jaccard_ppm").desc(), "pa", "pb")
        .limit(25)
    )


@query(
    "g_bfs_layers",
    oracle="""
    WITH e AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
    p0 AS (SELECT DISTINCT p FROM e WHERE p % 97 = 0),
    o1 AS (SELECT DISTINCT o FROM e JOIN p0 USING (p)),
    p2 AS (
      SELECT DISTINCT p FROM e JOIN o1 USING (o)
      WHERE p NOT IN (SELECT p FROM p0)
    ),
    o3 AS (
      SELECT DISTINCT o FROM e JOIN p2 USING (p)
      WHERE o NOT IN (SELECT o FROM o1)
    ),
    p4 AS (
      SELECT DISTINCT p FROM e JOIN o3 USING (o)
      WHERE p NOT IN (SELECT p FROM p0)
        AND p NOT IN (SELECT p FROM p2)
    )
    SELECT * FROM (
      SELECT 'part' AS kind, 0 AS distance, CAST(count(*) AS BIGINT) AS n_nodes FROM p0
      UNION ALL
      SELECT 'order', 1, CAST(count(*) AS BIGINT) FROM o1
      UNION ALL
      SELECT 'part', 2, CAST(count(*) AS BIGINT) FROM p2
      UNION ALL
      SELECT 'order', 3, CAST(count(*) AS BIGINT) FROM o3
      UNION ALL
      SELECT 'part', 4, CAST(count(*) AS BIGINT) FROM p4
    ) WHERE n_nodes > 0
    """,
)
def g_bfs_layers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frontier BFS over the order-part bipartite graph, 4 unrolled
    hops from a deterministic seed set (parts ≡ 0 mod 97): layer k+1 =
    neighbors of frontier k MINUS everything already visited (the
    textbook frontier anti-join — a node's distance is its MIN hop count
    because earlier layers are subtracted). FIXED unroll depth makes the
    whole reachability profile a pure function → full oracle, the
    g_label_propagation bounded-unroll trick; the converged twin lives in
    the fixpoint_loop family (kcore/CC/LPA) where per-round probes apply.
    Each hop is one join + one distinct + one anti-join, all
    key-partitioned; at 100 TB frontiers stay bounded by the visited-set
    anti-joins (never re-expanding), the same discipline as
    g_cc_converged's pointer jumps. Output is the per-layer census —
    |layers| rows. NEGATIVE A/B (r15): each hop references e plus ALL
    earlier layers, so the lazy chain re-derives layer k's whole build
    per reference — 27 parquet scans in the final plan (p4 alone nests
    13). Materializing e + every frontier still measured WORSE at
    sf0.1: lazy 3.62 s vs localCheckpoint 5.23 (frontier frames lose
    size stats, the hop joins lose auto-broadcast) vs persist 6.40
    fresh-run (cache-fill cost; its 1.81 s 'median' was CacheManager
    cross-run reuse — see pagerank_fixed). Each re-derived layer is a
    column-pruned scan + keyed distinct that pipelines in parallel
    stages, cheaper here than any barrier. Kept lazy."""
    li = _t(spark, sf_dir, "lineitem")
    e = li.select(
        F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p")
    ).distinct()
    p0 = e.where(F.col("p") % 97 == 0).select("p").distinct()
    o1 = e.join(p0, "p").select("o").distinct()
    p2 = e.join(o1, "o").select("p").distinct().join(p0, "p", "left_anti")
    o3 = e.join(p2, "p").select("o").distinct().join(o1, "o", "left_anti")
    p4 = (
        e.join(o3, "o")
        .select("p")
        .distinct()
        .join(p0, "p", "left_anti")
        .join(p2, "p", "left_anti")
    )

    def census(df: DataFrame, kind: str, dist: int) -> DataFrame:
        return df.groupBy().agg(
            F.lit(kind).alias("kind"),
            F.lit(dist).alias("distance"),
            F.count(F.lit(1)).alias("n_nodes"),
        ).select("kind", "distance", "n_nodes")

    out = (
        census(p0, "part", 0)
        .unionAll(census(o1, "order", 1))
        .unionAll(census(p2, "part", 2))
        .unionAll(census(o3, "order", 3))
        .unionAll(census(p4, "part", 4))
    )
    return out.where(F.col("n_nodes") > 0)


@query(
    "w_first_last_value",
    oracle="""
    WITH w AS (
      SELECT user_id,
             first_value(event_type) OVER win AS first_type,
             last_value(event_type) OVER win AS last_type,
             nth_value(event_type, 2) OVER win AS second_type,
             count(*) OVER win AS n_events,
             row_number() OVER (
               PARTITION BY user_id ORDER BY ts, event_id
             ) AS rn
      FROM events WHERE user_id IS NOT NULL
      WINDOW win AS (
        PARTITION BY user_id ORDER BY ts, event_id
        ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
      )
    )
    SELECT user_id, first_type, last_type, second_type,
           CAST(n_events AS BIGINT) AS n_events
    FROM w WHERE rn = 1
    """,
)
def w_first_last_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first_value / last_value / nth_value over an explicit
    unbounded-both-ends frame — the remaining window-function surface
    after rank/lag/ntile/cume_dist/median (SURVEY §2.5 W-decl): per-user
    journey endpoints ("entered via signup, left via error") with the
    (ts, event_id) total order making every picked value deterministic.
    last_value is the classic frame trap — the DEFAULT frame stops at
    CURRENT ROW and silently returns the current row's value; the
    explicit UNBOUNDED FOLLOWING frame is the whole point of the entry.
    One partitioned WindowExec (all four functions share the frame), one
    rn=1 filter to collapse to per-user rows."""
    e = _t(spark, sf_dir, "events").where(F.col("user_id").isNotNull())
    base = W.partitionBy("user_id").orderBy("ts", "event_id")
    win = base.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    out = e.select(
        "user_id",
        F.first("event_type").over(win).alias("first_type"),
        F.last("event_type").over(win).alias("last_type"),
        F.nth_value("event_type", 2).over(win).alias("second_type"),
        F.count(F.lit(1)).over(win).alias("n_events"),
        F.row_number().over(base).alias("rn"),
    )
    return out.where(F.col("rn") == 1).drop("rn")


@query(
    "o_incremental_stats_merge",
    oracle="""
    WITH c AS (
      SELECT o_orderkey % 16 AS bucket,
             CAST(round(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders
    ),
    per AS (
      SELECT bucket,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(cents) AS BIGINT) AS sum_cents,
             CAST(min(cents) AS BIGINT) AS min_cents,
             CAST(max(cents) AS BIGINT) AS max_cents
      FROM c GROUP BY bucket
    )
    SELECT 'bucket' AS level, CAST(bucket AS BIGINT) AS key,
           n, sum_cents, min_cents, max_cents
    FROM per
    UNION ALL
    SELECT 'merged', CAST(-1 AS BIGINT),
           CAST(sum(n) AS BIGINT), CAST(sum(sum_cents) AS BIGINT),
           CAST(min(min_cents) AS BIGINT), CAST(max(max_cents) AS BIGINT)
    FROM per
    UNION ALL
    SELECT 'direct', CAST(-1 AS BIGINT),
           CAST(count(*) AS BIGINT), CAST(sum(cents) AS BIGINT),
           CAST(min(cents) AS BIGINT), CAST(max(cents) AS BIGINT)
    FROM c
    """,
)
def o_incremental_stats_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable column statistics — the incremental-ANALYZE contract
    every table-stats store (o_table_stats' maintenance path) relies on:
    per-bucket (count, sum, min, max) sketches merge associatively, and
    the output carries BOTH the two-level merge and the direct single
    pass so their equality is VISIBLE in the result (the
    a_kmv_merged_union precedent: the merge property is the thing being
    shipped, so it must be value-checked, not assumed). All-integer
    cents channels — a double sum would disagree between partial-agg
    orders, the m_cohort_ltv discipline. At 100 TB only per-bucket
    aggregates ever recompute; 'merged' reads |buckets| rows."""
    o = _t(spark, sf_dir, "orders")
    c = o.select(
        (F.col("o_orderkey") % 16).alias("bucket"),
        F.expr("CAST(round(o_totalprice * 100) AS BIGINT)").alias("cents"),
    )
    per = c.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("cents").alias("sum_cents"),
        F.min("cents").alias("min_cents"),
        F.max("cents").alias("max_cents"),
    )
    bucket_rows = per.select(
        F.lit("bucket").alias("level"),
        F.col("bucket").cast("bigint").alias("key"),
        "n",
        "sum_cents",
        "min_cents",
        "max_cents",
    )
    merged = per.groupBy().agg(
        F.lit("merged").alias("level"),
        F.lit(-1).cast("bigint").alias("key"),
        F.sum("n").alias("n"),
        F.sum("sum_cents").alias("sum_cents"),
        F.min("min_cents").alias("min_cents"),
        F.max("max_cents").alias("max_cents"),
    ).select("level", "key", "n", "sum_cents", "min_cents", "max_cents")
    direct = c.groupBy().agg(
        F.lit("direct").alias("level"),
        F.lit(-1).cast("bigint").alias("key"),
        F.count(F.lit(1)).alias("n"),
        F.sum("cents").alias("sum_cents"),
        F.min("cents").alias("min_cents"),
        F.max("cents").alias("max_cents"),
    ).select("level", "key", "n", "sum_cents", "min_cents", "max_cents")
    return bucket_rows.unionAll(merged).unionAll(direct)


# ONE event_type x integer-epoch-dow contingency kernel shared by the
# chi-square and mutual-information twins (the review-pass factoring
# rule — the dow channel must evolve in lockstep across both). Columns
# (event_type, dow, observed); dow = epoch_day % 7, never an engine dow
# label (Spark dayofweek 1=Sun vs DuckDB 0=Sun — the m_seasonality_dow
# lesson).
_TYPE_DOW_CELLS_SQL = """cells AS (
      SELECT event_type, (epoch_ms(ts) // 86400000) % 7 AS dow,
             CAST(count(*) AS BIGINT) AS observed
      FROM events GROUP BY 1, 2
    )"""


def _type_dow_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    # r16: the ≤|types|×7-row cells aggregate is localCheckpointed — its
    # consumers (chi2: rt/ct/t margins + the output join; MI likewise)
    # each re-ran the full events scan + aggregate unmaterialized
    # (8 parquet scans in the chi2 plan; 0 after — the one corpus pass
    # the docstrings promise).
    e = _t(spark, sf_dir, "events")
    return (
        e.groupBy(
            "event_type",
            (F.expr("unix_millis(ts) div 86400000") % 7).alias("dow"),
        )
        .agg(F.count(F.lit(1)).alias("observed"))
        .localCheckpoint(eager=False)
    )


@query(
    "a_chi_square_independence",
    oracle=f"""
    WITH {_TYPE_DOW_CELLS_SQL},
    rt AS (SELECT event_type, CAST(sum(observed) AS BIGINT) AS r FROM cells GROUP BY 1),
    ct AS (SELECT dow, CAST(sum(observed) AS BIGINT) AS c FROM cells GROUP BY 1),
    t AS (SELECT CAST(sum(observed) AS BIGINT) AS total FROM cells)
    SELECT cells.event_type, CAST(cells.dow AS BIGINT) AS dow,
           cells.observed,
           CAST(round(CAST(rt.r * ct.c AS DOUBLE) / t.total, 4) AS DOUBLE)
             AS expected,
           CAST(round(
             (cells.observed - CAST(rt.r * ct.c AS DOUBLE) / t.total)
             * (cells.observed - CAST(rt.r * ct.c AS DOUBLE) / t.total)
             / (CAST(rt.r * ct.c AS DOUBLE) / t.total), 6) AS DOUBLE)
             AS chi2_contrib
    FROM cells
    JOIN rt USING (event_type) JOIN ct USING (dow) CROSS JOIN t
    """,
)
def a_chi_square_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square independence table between event type and day-of-week —
    the categorical drift test behind "did the traffic mix change on
    weekends?" (the bivariate sibling of m_seasonality_dow). Day-of-week
    is integer (epoch_day % 7) — a pure-integer channel with no
    engine-specific week-start convention (Spark's dayofweek is 1=Sunday,
    DuckDB's 0=Sunday; the m_seasonality_dow lesson is to never compare
    engine dow labels). Expected counts r*c/total are ONE division from
    exact bigints (round-4 stable); per-cell chi2 contributions round-6.
    The margins are |types|- and 7-row broadcast frames (hint-policy
    class 3); the only corpus-scale work is the first aggregate. The
    total chi2 statistic is the sum of the contrib column — shipped
    per-cell so the oracle checks every term, not one lump."""
    cells = _type_dow_cells(spark, sf_dir)
    rt = cells.groupBy("event_type").agg(F.sum("observed").alias("r"))
    ct = cells.groupBy("dow").agg(F.sum("observed").alias("c"))
    t = cells.groupBy().agg(F.sum("observed").alias("total"))
    exp_sql = "CAST(r * c AS DOUBLE) / total"
    return (
        cells.join(F.broadcast(rt), "event_type")
        .join(F.broadcast(ct), "dow")
        .crossJoin(F.broadcast(t))
        .select(
            "event_type",
            F.col("dow").cast("bigint").alias("dow"),
            "observed",
            F.expr(f"CAST(round({exp_sql}, 4) AS DOUBLE)").alias("expected"),
            F.expr(
                f"CAST(round((observed - {exp_sql}) * (observed - {exp_sql})"
                f" / ({exp_sql}), 6) AS DOUBLE)"
            ).alias("chi2_contrib"),
        )
    )


# ONE canonical part-co-occurrence build shared by the centrality entries
# (assortativity, Katz) — the review-pass factoring rule (_min_label_rounds,
# cusum_step precedents): the pair build and its checkpoint barrier must
# evolve in lockstep across every consumer. SQL half for the oracles:
_PART_COOCCUR_SQL = """d AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    pairs AS (
      SELECT DISTINCT a.l_partkey AS pa, b.l_partkey AS pb
      FROM d a JOIN d b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    ),
    directed AS (
      SELECT pa AS x, pb AS y FROM pairs
      UNION ALL
      SELECT pb AS x, pa AS y FROM pairs
    ),
    deg AS (SELECT x AS node, CAST(count(*) AS BIGINT) AS k FROM directed GROUP BY 1)"""


def _part_cooccurrence(spark: SparkSession, sf_dir: str):
    """(pairs, directed, deg) over the part co-occurrence graph: canonical pa<pb
    pair set, localCheckpointed — multiple lazy consumers otherwise re-ran
    the pair build (16 scans, 0 ReusedExchange; sf0.1 7.8 -> 3.9-5.0 s
    measured on assortativity); directed = both orientations; deg =
    per-node neighbor count.

    r15 optimization round: the pair set is generated MAP-SIDE from each
    order's collect_set instead of the former aliased self-join on
    l_orderkey — one exchange on l_orderkey (with partial collect_set
    combining map-side) + the pair distinct, vs the join form's
    distinct(ok, pk) exchange + join exchange + pair distinct: one fewer
    lineitem-scale shuffle and map-side combine on the first (guide
    §2.3/§2.4). Order item-sets are small (TPC-H orders hold ≤7 parts)
    so the per-row HOF pair fan-out is ~21 structs max. Output set
    proven identical (exceptAll both directions, 1,196,000 pairs at
    sf0.1); interleaved medians tie locally {1.37-1.40 vs 1.14-1.41 s
    isolated} — kept for the removed shuffle at scale."""
    li = _t(spark, sf_dir, "lineitem")
    # l_partkey is cast to bigint BEFORE the collect_set (r16 ADVICE): the
    # HOF below hardcodes CAST(NULL AS struct<pa:bigint,pb:bigint>), and a
    # future testdata regeneration shipping l_partkey as int32 (the
    # documented drift class) would otherwise silently coerce pa/pb through
    # the IF branches — the explicit cast fixes the element type by
    # construction (a no-op on today's bigint encoding).
    od = li.groupBy("l_orderkey").agg(
        F.collect_set(F.col("l_partkey").cast("bigint")).alias("ps")
    )
    pairs = (
        od.select(
            F.explode(
                F.expr(
                    "flatten(transform(ps, x -> filter(transform(ps,"
                    " y -> IF(x < y, struct(x AS pa, y AS pb),"
                    " CAST(NULL AS struct<pa:bigint,pb:bigint>))),"
                    " s -> s IS NOT NULL)))"
                )
            ).alias("pr")
        )
        .select("pr.pa", "pr.pb")
        .distinct()
        .localCheckpoint(eager=False)
    )
    directed = pairs.select(
        F.col("pa").alias("x"), F.col("pb").alias("y")
    ).unionAll(pairs.select(F.col("pb").alias("x"), F.col("pa").alias("y")))
    deg = directed.groupBy(F.col("x").alias("node")).agg(
        F.count(F.lit(1)).alias("k")
    )
    return pairs, directed, deg


# ONE min-oriented triangle enumeration over the canonical pa<pb pair set
# (each triangle once at a<b<c) — shared by g_local_clustering_topk,
# g_local_bridges, and g_edge_support_histogram (review-pass factoring:
# the orientation and the closing-join shape must evolve in lockstep; the
# 38.9 s all-wedges lesson lives here once, not three times). SQL half for
# the oracles:
_TRIS_SQL = """tris AS (
      SELECT e1.pa AS a, e1.pb AS b, e2.pb AS c
      FROM pairs e1
      JOIN pairs e2 ON e2.pa = e1.pa AND e1.pb < e2.pb
      JOIN pairs e3 ON e3.pa = e1.pb AND e3.pb = e2.pb
    )"""


def _min_oriented_tris(pairs: DataFrame) -> DataFrame:
    """(a, b, c) with a < b < c for every triangle, enumerated once.

    NEGATIVE A/B (r15 optimization round): a byte-gated broadcast hint
    (measured_broadcast) on the closing-edge side — probing the ~m²/n
    wedge stream map-side instead of exchanging it on (b, c) — measured
    WORSE on the kernel's consumers: g_triad_census isolated interleaved
    at sf0.1, hinted {13.9, 9.9} vs shuffle join {7.9, 8.7} s. The
    measuring action costs a pass over the checkpointed pair set per
    consumer, the ~1M-row broadcast build is its own job, and the hint
    breaks the (b, c) exchange that downstream consumers reuse. Keep the
    plain shuffle join.

    NEGATIVE A/B #2 (r16): map-side wedge fan-out (groupBy(pa) +
    sort_array(collect_list(pb)) + slice/posexplode — the form that won
    on g_triangle_count, where the closing set is broadcast) measured a
    kernel-level ~8% win with overlapping spreads (isolated tris-count
    {5.7, 7.0, 8.1, 6.2} vs {7.6, 7.4, 7.0, 6.7} s) but a TIE-to-slight-
    LOSS at the consumer (g_triad_census interleaved warm: map-side
    {8.3, 9.3, 10.0, 9.8} vs committed {8.7, 9.6, 9.2}) — here the wedge
    stream must still be EXCHANGED on (b, c) for the closing shuffle
    join, so removing the self-join machinery buys nothing the exchange
    doesn't take back. Output proven set-identical (exceptAll both
    directions, 0 rows at sf0.01) before rejecting. Keep the self-join
    form."""
    e1 = pairs.select(F.col("pa").alias("a"), F.col("pb").alias("b"))
    e2 = pairs.select(F.col("pa").alias("a"), F.col("pb").alias("c"))
    wedges = e1.join(e2, "a").where(F.col("b") < F.col("c"))
    closing = pairs.select(F.col("pa").alias("b"), F.col("pb").alias("c"))
    return wedges.join(closing, ["b", "c"])


@query(
    "g_ktruss_one_peel",
    oracle=f"""
    WITH {_PART_COOCCUR_SQL},
    {_TRIS_SQL},
    corners AS (
      SELECT a AS pa, b AS pb FROM tris
      UNION ALL SELECT a, c FROM tris
      UNION ALL SELECT b, c FROM tris
    ),
    sup0 AS (SELECT pa, pb, CAST(count(*) AS BIGINT) AS s
             FROM corners GROUP BY 1, 2),
    surv AS (
      SELECT p.pa, p.pb
      FROM pairs p JOIN sup0 s ON s.pa = p.pa AND s.pb = p.pb
      WHERE s.s >= 2
    ),
    tris1 AS (
      SELECT e1.pa AS a, e1.pb AS b, e2.pb AS c
      FROM surv e1
      JOIN surv e2 ON e2.pa = e1.pa AND e1.pb < e2.pb
      JOIN surv e3 ON e3.pa = e1.pb AND e3.pb = e2.pb
    ),
    corners1 AS (
      SELECT a AS pa, b AS pb FROM tris1
      UNION ALL SELECT a, c FROM tris1
      UNION ALL SELECT b, c FROM tris1
    ),
    sup1 AS (SELECT pa, pb, CAST(count(*) AS BIGINT) AS s
             FROM corners1 GROUP BY 1, 2)
    SELECT CAST(least(coalesce(s1.s, 0), 20) AS BIGINT) AS support_bucket,
           CAST(count(*) AS BIGINT) AS n_edges
    FROM surv LEFT JOIN sup1 s1 ON s1.pa = surv.pa AND s1.pb = surv.pb
    GROUP BY 1
    UNION ALL
    SELECT CAST(-1 AS BIGINT),
           CAST((SELECT count(*) FROM pairs) - (SELECT count(*) FROM surv)
                AS BIGINT)
    """,
)
def g_ktruss_one_peel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One peel round of the 4-truss (keep edges in >= k-2 = 2
    triangles) over the part co-occurrence graph — the cohesion filter
    g_edge_support_histogram's docstring names as its motivation, now
    executed one round: drop under-supported edges, RECOMPUTE support
    on the survivor subgraph (peeling cascades — a surviving edge can
    lose triangles whose third edge was peeled, which is exactly what
    the before/after histogram exposes), ship the after-support
    histogram (capped 20+) plus the removed-edge count as the
    bucket=-1 row (mass conservation: Σ n_edges + removed = |pairs|).
    ONE triangle enumeration total (r14 VERDICT task 1): triangles of
    the survivor subgraph are exactly the FIRST pass's triangles whose
    three edges all survive (surv ⊆ pairs, so no new triangle can
    appear) — the first _min_oriented_tris frame is localCheckpointed
    and filtered with three semi-joins against surv instead of
    re-running the wedge join on the survivor graph, which was the
    catalog's slowest plan (15.3 s sf0.1 / 83.4 s sf0.5, exponent
    1.06; post-fix MEASURED 9.4 s sf0.1 / 32.4 s sf0.5, exponent
    0.77 — the wedge join runs once, the semi-joins are linear in
    |tris|).
    Output provably identical; the oracle keeps the declarative
    re-enumeration form as the spec. The enumeration rides the shared
    _min_oriented_tris kernel (each triangle once at a<b<c, 3 exploded
    corners — the 38.9 s all-wedges lesson). All-integer output at any
    scale."""
    pairs, _, _ = _part_cooccurrence(spark, sf_dir)
    # two consumers: sup0's corner explode AND the survivor filter below
    tris = _min_oriented_tris(pairs).localCheckpoint(eager=False)

    def corners(t: DataFrame) -> DataFrame:
        return t.select(
            F.explode(
                F.array(
                    F.struct(F.col("a").alias("pa"), F.col("b").alias("pb")),
                    F.struct(F.col("a").alias("pa"), F.col("c").alias("pb")),
                    F.struct(F.col("b").alias("pa"), F.col("c").alias("pb")),
                )
            ).alias("e")
        ).select("e.pa", "e.pb")

    sup0 = corners(tris).groupBy("pa", "pb").agg(
        F.count(F.lit(1)).alias("s")
    )
    surv = (
        pairs.join(sup0, ["pa", "pb"])
        .where(F.col("s") >= 2)
        .select("pa", "pb")
        .localCheckpoint(eager=False)  # 3 semi-join sides + hist + count
    )
    tris1 = (
        tris.join(
            surv.select(F.col("pa").alias("a"), F.col("pb").alias("b")),
            ["a", "b"],
            "left_semi",
        )
        .join(
            surv.select(F.col("pa").alias("a"), F.col("pb").alias("c")),
            ["a", "c"],
            "left_semi",
        )
        .join(
            surv.select(F.col("pa").alias("b"), F.col("pb").alias("c")),
            ["b", "c"],
            "left_semi",
        )
    )
    sup1 = corners(tris1).groupBy("pa", "pb").agg(
        F.count(F.lit(1)).alias("s1")
    )
    hist = (
        surv.join(sup1, ["pa", "pb"], "left")
        .groupBy(
            F.expr("CAST(least(coalesce(s1, 0), 20) AS BIGINT)").alias(
                "support_bucket"
            )
        )
        .agg(F.count(F.lit(1)).alias("n_edges"))
    )
    np_ = pairs.groupBy().agg(F.count(F.lit(1)).alias("np"))
    ns_ = surv.groupBy().agg(F.count(F.lit(1)).alias("ns"))
    removed = np_.crossJoin(ns_).select(
        F.lit(-1).cast("long").alias("support_bucket"),
        F.expr("CAST(np - ns AS BIGINT)").alias("n_edges"),
    )
    return hist.unionByName(removed)


@query(
    "g_degree_gini",
    oracle=f"""
    WITH {_PART_COOCCUR_SQL},
    r AS (
      SELECT k, row_number() OVER (ORDER BY k, node) AS rk FROM deg
    ),
    s AS (
      SELECT CAST(count(*) AS BIGINT) AS n_nodes,
             CAST(sum(k) AS BIGINT) AS total_degree,
             CAST(sum(rk * k) AS BIGINT) AS rank_weighted
      FROM r
    )
    SELECT n_nodes, total_degree,
           CAST(round(
             (2.0 * rank_weighted - (n_nodes + 1) * total_degree)
               / (CAST(n_nodes AS DOUBLE) * total_degree), 6) AS DOUBLE)
             AS gini
    FROM s
    """,
)
def g_degree_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of the degree distribution — hub concentration
    as ONE number beside g_degree_powerlaw_slope's fitted exponent (the
    slope says whether the tail is power-law-SHAPED; the Gini says how
    much of the wiring the hubs actually own — the skew-salting go/no-go
    for graph joins). Same exact rank formula as m_gini_coefficient on
    the same distributed prefix sum (total order (k, node), no
    unpartitioned window), over the shared checkpointed
    _part_cooccurrence degree frame. All-integer channels until one
    mirrored round-6 quotient; rank_weighted ≤ n·Σk — the bigint bound
    and wide_int escape documented at m_gini_coefficient."""
    from surge_spark.operators.text import distributed_prefix_sum

    _, _, deg = _part_cooccurrence(spark, sf_dir)
    cnt = deg.withColumn("__one", F.lit(1)).persist()
    order = [F.col("k").asc(), F.col("node").asc()]
    ranked = distributed_prefix_sum(
        cnt, "__one", "k", order, descending=False, out_col="__rk"
    )
    s = ranked.groupBy().agg(
        F.count(F.lit(1)).alias("n_nodes"),
        F.sum("k").alias("total_degree"),
        F.sum(F.col("__rk") * F.col("k")).alias("rank_weighted"),
    )
    return s.select(
        "n_nodes",
        "total_degree",
        F.round(
            (
                2.0 * F.col("rank_weighted")
                - (F.col("n_nodes") + 1) * F.col("total_degree")
            )
            / (F.col("n_nodes").cast("double") * F.col("total_degree")),
            6,
        ).alias("gini"),
    )


@query(
    "g_degree_assortativity",
    oracle=f"""
    WITH {_PART_COOCCUR_SQL}
    SELECT CAST(count(*) / 2 AS BIGINT) AS n_edges,
           (SELECT CAST(count(*) AS BIGINT) FROM deg) AS n_nodes,
           CAST(round(corr(dx.k, dy.k), 6) AS DOUBLE) AS assortativity
    FROM directed e
    JOIN deg dx ON dx.node = e.x
    JOIN deg dy ON dy.node = e.y
    """,
)
def g_degree_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree assortativity of the part co-occurrence graph — Newman's r:
    the Pearson correlation of endpoint degrees over DIRECTED edge
    occurrences (each undirected edge counted both ways — that IS the
    standard definition; a one-way sample biases r). Tells a sampler or
    partitioner whether hubs attach to hubs (r>0, supply-chain-like) or
    to leaves (r<0, star-like — the shape that makes skew salting
    necessary). Degree = distinct co-occurring parts, derived by
    exploding the canonical pa<pb pair set both ways, so the degree
    frame and the edge frame share one pair build (the adamic-adar
    identical-subtree rule). corr is scale-free (sample-vs-population
    cancels) and round-6 per the moment discipline; the pair distinct
    is the only super-linear term — the same m²/n wedge floor
    g_triangle_count documents, with the sampled twin as the 100 TB
    escape hatch."""
    _, directed, deg = _part_cooccurrence(spark, sf_dir)
    dx = deg.select(F.col("node").alias("x"), F.col("k").alias("kx"))
    dy = deg.select(F.col("node").alias("y"), F.col("k").alias("ky"))
    joined = directed.join(dx, "x").join(dy, "y")
    n_nodes = deg.groupBy().agg(F.count(F.lit(1)).alias("n_nodes"))
    return (
        joined.groupBy()
        .agg(
            (F.count(F.lit(1)) / 2).cast("bigint").alias("n_edges"),
            F.round(F.corr("kx", "ky"), 6).alias("assortativity"),
        )
        .crossJoin(F.broadcast(n_nodes))
        .select("n_edges", "n_nodes", "assortativity")
    )


@query(
    "g_katz_unrolled",
    oracle=f"""
    WITH {_PART_COOCCUR_SQL},
    p2 AS (
      SELECT e.x AS node, CAST(sum(dy.k) AS BIGINT) AS paths2
      FROM directed e JOIN deg dy ON dy.node = e.y
      GROUP BY e.x
    )
    SELECT deg.node, deg.k AS degree, p2.paths2,
           CAST(2 * deg.k + p2.paths2 AS BIGINT) AS katz_x4
    FROM deg JOIN p2 USING (node)
    ORDER BY katz_x4 DESC, node LIMIT 20
    """,
)
def g_katz_unrolled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Katz centrality, 2 hops unrolled with attenuation beta = 1/2 —
    the walk-counting centrality between degree (1 hop) and pagerank
    (converged): katz = beta*deg + beta^2*paths2, shipped as the EXACT
    INTEGER katz_x4 = 2*deg + paths2 (the g_hits_unrolled lesson: a
    fixed unroll in integer arithmetic needs no rounding channel at
    all — walks, not paths, so returning 2-walks count, the standard
    A^2 semantics). paths2(v) = sum of neighbor degrees — ONE join of
    the directed edge list against the degree frame it was aggregated
    from; the canonical pair set is localCheckpointed (three lazy
    consumers would re-run the wedge join — the assortativity fix).
    Top-20 is TakeOrderedAndProject on the (katz desc, node) total
    order."""
    _, directed, deg = _part_cooccurrence(spark, sf_dir)
    dy = deg.select(F.col("node").alias("y"), F.col("k").alias("ky"))
    p2 = (
        directed.join(dy, "y")
        .groupBy(F.col("x").alias("node"))
        .agg(F.sum("ky").alias("paths2"))
    )
    return (
        deg.join(p2, "node")
        .select(
            "node",
            F.col("k").alias("degree"),
            "paths2",
            (2 * F.col("k") + F.col("paths2")).alias("katz_x4"),
        )
        .orderBy(F.col("katz_x4").desc(), "node")
        .limit(20)
    )


@query(
    "a_mutual_information",
    oracle=f"""
    WITH {_TYPE_DOW_CELLS_SQL},
    t AS (SELECT CAST(sum(observed) AS BIGINT) AS total FROM cells),
    px AS (SELECT event_type, CAST(sum(observed) AS BIGINT) AS nx FROM cells GROUP BY 1),
    py AS (SELECT dow, CAST(sum(observed) AS BIGINT) AS ny FROM cells GROUP BY 1),
    hx AS (
      SELECT -sum((CAST(nx AS DOUBLE) / total)
                  * ln(CAST(nx AS DOUBLE) / total)) AS h
      FROM px, t
    ),
    hy AS (
      SELECT -sum((CAST(ny AS DOUBLE) / total)
                  * ln(CAST(ny AS DOUBLE) / total)) AS h
      FROM py, t
    ),
    hxy AS (
      SELECT -sum((CAST(observed AS DOUBLE) / total)
                  * ln(CAST(observed AS DOUBLE) / total)) AS h
      FROM cells, t
    )
    SELECT (SELECT total FROM t) AS n_events,
           CAST(round(hx.h, 6) AS DOUBLE) AS h_type,
           CAST(round(hy.h, 6) AS DOUBLE) AS h_dow,
           CAST(round(hxy.h, 6) AS DOUBLE) AS h_joint,
           CAST(round(hx.h + hy.h - hxy.h, 6) AS DOUBLE) AS mutual_info
    FROM hx, hy, hxy
    """,
)
def a_mutual_information(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual information between event type and day-of-week — the
    information-theoretic twin of a_chi_square_independence (chi2 tests
    WHETHER the mix shifts; MI measures HOW MANY NATS knowing the dow
    buys, the quantity a feature-selection pass ranks candidate features
    by). All probabilities come from exact bigint counts with ONE
    division each; the entropy sums run over the bounded |types| x 7
    margin/cell frames (structural, not corpus-scale), so round-6 totals
    are stable. Same integer epoch-dow channel as chi2 (never engine dow
    labels). MI is assembled from the three entropies rather than the
    per-cell log-ratio sum — identical mathematically, but H terms are
    independently reusable and each is visible in the output (a negative
    rounding artifact in MI would be diagnosable)."""
    # the kernel checkpoints its cells aggregate since r16 — no second
    # barrier needed here (the old per-caller checkpoint moved into
    # _type_dow_cells so chi2 gets it too)
    cells = _type_dow_cells(spark, sf_dir)
    t = cells.groupBy().agg(F.sum("observed").alias("total"))
    px = cells.groupBy("event_type").agg(F.sum("observed").alias("nx"))
    py = cells.groupBy("dow").agg(F.sum("observed").alias("ny"))

    def entropy(df: DataFrame, cnt: str) -> DataFrame:
        p = F.col(cnt).cast("double") / F.col("total")
        return (
            df.crossJoin(F.broadcast(t))
            .groupBy()
            .agg((-F.sum(p * F.log(p))).alias("h"))
        )

    hx = entropy(px, "nx").select(F.col("h").alias("h_type"))
    hy = entropy(py, "ny").select(F.col("h").alias("h_dow"))
    hxy = entropy(cells, "observed").select(F.col("h").alias("h_joint"))
    return (
        t.crossJoin(F.broadcast(hx))
        .crossJoin(F.broadcast(hy))
        .crossJoin(F.broadcast(hxy))
        .select(
            F.col("total").alias("n_events"),
            F.round("h_type", 6).alias("h_type"),
            F.round("h_dow", 6).alias("h_dow"),
            F.round("h_joint", 6).alias("h_joint"),
            F.round(
                F.col("h_type") + F.col("h_dow") - F.col("h_joint"), 6
            ).alias("mutual_info"),
        )
    )


@query(
    "g_local_clustering_topk",
    oracle=f"""
    WITH {_PART_COOCCUR_SQL},
    {_TRIS_SQL},
    tri AS (
      SELECT node, CAST(count(*) AS BIGINT) AS triangles FROM (
        SELECT a AS node FROM tris
        UNION ALL SELECT b FROM tris
        UNION ALL SELECT c FROM tris
      ) GROUP BY node
    )
    SELECT deg.node AS node, deg.k AS degree,
           coalesce(tri.triangles, 0) AS triangles,
           CAST(coalesce(tri.triangles, 0) * 2000000
                // (deg.k * (deg.k - 1)) AS BIGINT) AS clustering_ppm
    FROM deg LEFT JOIN tri ON tri.node = deg.node
    WHERE deg.k >= 2
    ORDER BY clustering_ppm DESC, node LIMIT 20
    """,
)
def g_local_clustering_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node local clustering coefficient, top-20 — the node-level
    refinement of g_triangle_count's global number: C(v) = triangles(v)
    / C(deg(v), 2), as exact integer ppm (2*tri*1e6 div (k*(k-1)) — no
    float channel at all). Triangles are ENUMERATED ONCE each with the
    min node as wedge center (a < b < c via the canonical pa<pb pair
    set), then exploded to their 3 corners — the center-at-every-node
    form was measured 19-30 s at sf0.1 because Σ C(deg,2) wedges close
    against the pair set, vs ~Σ C(deg_>,2) ≈ 1/4 the wedges here —
    warm 5.2-6.7 s measured after the rewrite (the
    g_triangle_count orientation argument applied to per-node counts;
    the explode is |triangles|x3, cheap). Everything derives from the
    ONE checkpointed _part_cooccurrence build; the DOULION sampled twin
    is the 100 TB escape hatch. Degree-2+ filter keeps the denominator
    positive; nodes with no closed wedge ship 0 via the LEFT join, not
    silence."""
    pairs, _, deg = _part_cooccurrence(spark, sf_dir)
    tris = _min_oriented_tris(pairs)
    tri = (
        tris.select(
            F.explode(F.array("a", "b", "c")).alias("node")
        )
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("triangles"))
    )
    return (
        deg.where(F.col("k") >= 2)
        .join(tri, "node", "left")
        .select(
            "node",
            F.col("k").alias("degree"),
            F.coalesce(F.col("triangles"), F.lit(0)).alias("triangles"),
            F.expr(
                "CAST(coalesce(triangles, 0) * 2000000"
                " div (k * (k - 1)) AS BIGINT)"
            ).alias("clustering_ppm"),
        )
        .orderBy(F.col("clustering_ppm").desc(), "node")
        .limit(20)
    )


@query(
    "a_top_decile_revenue_share",
    oracle="""
    WITH o AS (
      SELECT n.n_name,
             CAST(round(o.o_totalprice * 100) AS BIGINT) AS cents,
             percent_rank() OVER (
               PARTITION BY n.n_name ORDER BY o.o_totalprice, o.o_orderkey
             ) AS pr
      FROM orders o
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n ON n.n_nationkey = c.c_nationkey
    )
    SELECT n_name,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(CASE WHEN pr >= 0.9 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_top,
           CAST(sum(cents) AS BIGINT) AS total_cents,
           CAST(sum(CASE WHEN pr >= 0.9 THEN cents ELSE 0 END) AS BIGINT)
             AS top_cents,
           CAST(sum(CASE WHEN pr >= 0.9 THEN cents ELSE 0 END) * 1000000
                // sum(cents) AS BIGINT) AS top_share_ppm
    FROM o GROUP BY n_name
    """,
)
def a_top_decile_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue concentration in each nation's top order decile — the
    per-group percent_rank() shape (the one ranking function the window
    family didn't cover: rank/dense_rank/ntile/cume_dist exist; pr =
    (rank-1)/(n-1) is the exact rational both engines compute
    identically, so the pr >= 0.9 cut is deterministic under the
    (price, orderkey) total order). Money stays integer cents end to
    end (the m_cohort_ltv discipline); the share is one bigint-ppm
    floor division per nation. Star joins ride the TPC-H dim-broadcast
    contract (hint-policy class 4); the window is partitioned by
    nation — parallel, never global."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    joined = o.join(
        F.broadcast(c.select("c_custkey", "c_nationkey")),
        o.o_custkey == F.col("c_custkey"),
    ).join(
        F.broadcast(n.select("n_nationkey", "n_name")),
        F.col("c_nationkey") == F.col("n_nationkey"),
    )
    w = W.partitionBy("n_name").orderBy("o_totalprice", "o_orderkey")
    ranked = joined.select(
        "n_name",
        F.expr("CAST(round(o_totalprice * 100) AS BIGINT)").alias("cents"),
        F.percent_rank().over(w).alias("pr"),
    )
    top = F.when(F.col("pr") >= 0.9, 1).otherwise(0)
    return ranked.groupBy("n_name").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(top).alias("n_top"),
        F.sum("cents").alias("total_cents"),
        F.sum(F.when(F.col("pr") >= 0.9, F.col("cents")).otherwise(0)).alias(
            "top_cents"
        ),
        F.expr(
            "CAST(sum(CASE WHEN pr >= 0.9 THEN cents ELSE 0 END) * 1000000"
            " div sum(cents) AS BIGINT)"
        ).alias("top_share_ppm"),
    )


# Newman-Q oracle tail over any labels CTE — shared by g_modularity (l2,
# the 2-round partition) and g_modularity_converged (lN + rounds channel);
# the review-discipline factoring: the Q formula and its integer channels
# must evolve in lockstep across both consumers.
_MODULARITY_TAIL_SQL = """
    deg AS (SELECT src AS v, CAST(count(*) AS BIGINT) AS k FROM sym GROUP BY 1),
    m AS (SELECT CAST(count(*) AS BIGINT) AS m FROM e0),
    dc AS (
      SELECT l.label AS community, CAST(sum(d.k) AS BIGINT) AS d_c
      FROM {labels} l JOIN deg d ON d.v = l.node GROUP BY 1
    ),
    ec AS (
      SELECT la.label AS community, CAST(count(*) AS BIGINT) AS e_c
      FROM e0
      JOIN {labels} la ON la.node = e0.src
      JOIN {labels} lb ON lb.node = e0.dst AND lb.label = la.label
      GROUP BY 1
    ),
    per AS (
      SELECT dc.community, coalesce(ec.e_c, 0) AS e_c, dc.d_c
      FROM dc LEFT JOIN ec USING (community)
    )
    SELECT m.m AS n_edges,
           CAST(count(*) AS BIGINT) AS n_communities,
           CAST(sum(e_c) AS BIGINT) AS intra_edges,
           CAST(round(sum(
             CAST(e_c AS DOUBLE) / m.m
             - (CAST(d_c AS DOUBLE) / (2 * m.m))
               * (CAST(d_c AS DOUBLE) / (2 * m.m))
           ), 6) AS DOUBLE) AS modularity{extra_select}
    FROM per, m{extra_from} GROUP BY m.m{extra_group}
"""


def _modularity_frame(e0, sym, labels) -> DataFrame:
    """Newman Q of ``labels`` over the (e0, sym) edge frames — the one
    Spark-side Q computation both modularity entries call. Callers must
    pass MATERIALIZED frames: labels is read twice (each edge endpoint)
    and e0 twice (m and the intra-edge join)."""
    deg = sym.groupBy(F.col("src").alias("v")).agg(
        F.count(F.lit(1)).alias("k")
    )
    m = e0.groupBy().agg(F.count(F.lit(1)).alias("m"))
    dc = (
        labels.join(deg, labels.node == deg.v)
        .groupBy(F.col("label").alias("community"))
        .agg(F.sum("k").alias("d_c"))
    )
    la = labels.select(F.col("node").alias("src"), F.col("label").alias("cla"))
    lb = labels.select(F.col("node").alias("dst"), F.col("label").alias("clb"))
    ec = (
        e0.join(la, "src")
        .join(lb, "dst")
        .where(F.col("cla") == F.col("clb"))
        .groupBy(F.col("cla").alias("community"))
        .agg(F.count(F.lit(1)).alias("e_c"))
    )
    per = dc.join(ec, "community", "left").select(
        "community",
        F.coalesce(F.col("e_c"), F.lit(0)).alias("e_c"),
        "d_c",
    )
    term = (
        F.col("e_c").cast("double") / F.col("m")
        - (F.col("d_c").cast("double") / (2 * F.col("m")))
        * (F.col("d_c").cast("double") / (2 * F.col("m")))
    )
    return (
        per.crossJoin(F.broadcast(m))
        .groupBy(F.col("m").alias("n_edges"))
        .agg(
            F.count(F.lit(1)).alias("n_communities"),
            F.sum("e_c").alias("intra_edges"),
            F.round(F.sum(term), 6).alias("modularity"),
        )
        .select("n_edges", "n_communities", "intra_edges", "modularity")
    )


@query(
    "g_modularity",
    oracle=f"""
    WITH {_LPA2_SQL},
    {_MODULARITY_TAIL_SQL.format(
        labels="l2", extra_select="", extra_from="", extra_group=""
    )}
    """,
)
def g_modularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Newman modularity Q of the 2-round LPA partition — the quality
    number that tells you whether the communities g_label_propagation
    found are real structure or noise (Q = sum over communities of
    e_c/m - (d_c/2m)^2; Q near 0 = no better than random wiring given
    the degree sequence). Labels come from the SAME _lpa2_labels kernel
    as the LPA entry (bounded unroll = pure function = full oracle) with
    checkpoint=True: modularity reads the labels TWICE (each edge
    endpoint) and the edge set twice (m and the intra-edge join), so
    unmaterialized the 2-round build would re-run per consumer — the
    scan-amplification class. e_c, d_c, m are exact integers; each
    community's term is computed from them and the per-community sum
    rounds to 6 (bounded noise: |communities| terms). intra_edges is
    shipped so the Q decomposition is auditable."""
    e0, sym, labels = _lpa2_labels(spark, sf_dir, checkpoint=True)
    return _modularity_frame(e0, sym, labels)


@query(
    "g_modularity_converged",
    oracle=f"""
    WITH {_LPA_CONV_CHAIN_SQL},
    {_MODULARITY_TAIL_SQL.format(
        labels=f"l{_LPA_CONV_UNROLL}",
        extra_select=", chg.rounds AS rounds",
        extra_from=", chg",
        extra_group=", chg.rounds",
    )}
    """,
)
def g_modularity_converged(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Newman Q of the CONVERGED LPA partition (VERDICT r12 task 6) —
    the fixpoint labels are strictly better input than g_modularity's
    2-round ones, and the score tells you whether iterating further
    actually bought structure. Labels come from the fixpoint_loop
    harness (operators.graph.lpa_converged — per-round localCheckpoint,
    one checksum action per round), whose deterministic schedule makes
    the trajectory a pure function of the graph, so the oracle mirrors
    convergence with the SAME bounded 10-round unroll chain as
    g_lpa_converged (fixpoint 4/6 rounds at oracle scales;
    post-fixpoint rounds are no-ops) feeding the SAME Q tail as
    g_modularity — both shared templates, nothing re-derived. e0 and
    sym are localCheckpointed: Q reads the edge set twice and the
    degree frame once more, and re-deriving the co-occurrence wedge
    join per consumer is the scan-amplification class. rounds rides
    along so a convergence change is visible in the same row as its
    quality effect."""
    from surge_spark.operators.graph import lpa_converged

    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    a = li.withColumnsRenamed({"l_partkey": "src"})
    b = li.withColumnsRenamed({"l_partkey": "dst"})
    e0 = (
        a.join(b, "l_orderkey")
        .where(F.col("src") < F.col("dst"))
        .select("src", "dst")
        .distinct()
        .localCheckpoint(eager=False)
    )
    sym = e0.unionByName(
        e0.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).localCheckpoint(eager=False)
    labels, rounds = lpa_converged(sym, max_rounds=_LPA_CONV_UNROLL)
    return _modularity_frame(e0, sym, labels).withColumn(
        "rounds", F.lit(rounds).cast("int")
    )


# ONE canonical parity-split conversion 2x2 cell build shared by the
# A/B entries (a_two_proportion_ztest, a_mde_power) — the
# review-discipline factoring: the conversion definition and the arm
# split must evolve in lockstep or the MDE plans for a different
# population than the z-test it budgets (its docstring's companion
# claim would silently become prose-only).
_PARITY_CONV_CELLS_SQL = """per_user AS (
      SELECT user_id, CAST(user_id % 2 AS BIGINT) AS grp,
             CAST(max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                  AS BIGINT) AS converted
      FROM events WHERE user_id IS NOT NULL GROUP BY user_id
    ),
    g AS (
      SELECT CAST(sum(CASE WHEN grp = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
             CAST(sum(CASE WHEN grp = 0 THEN converted ELSE 0 END) AS BIGINT) AS k_a,
             CAST(sum(CASE WHEN grp = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
             CAST(sum(CASE WHEN grp = 1 THEN converted ELSE 0 END) AS BIGINT) AS k_b
      FROM per_user
    )"""


def _parity_conversion_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(n_a, k_a, n_b, k_b) one-row frame mirroring
    _PARITY_CONV_CELLS_SQL: per-user purchase conversion split by
    user_id parity."""
    e = _t(spark, sf_dir, "events").where(F.col("user_id").isNotNull())
    per_user = e.groupBy("user_id").agg(
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("converted")
    ).select(
        (F.col("user_id") % 2).alias("grp"),
        F.col("converted").cast("long").alias("converted"),
    )
    return per_user.groupBy().agg(
        F.sum(F.when(F.col("grp") == 0, 1).otherwise(0)).alias("n_a"),
        F.sum(
            F.when(F.col("grp") == 0, F.col("converted")).otherwise(0)
        ).alias("k_a"),
        F.sum(F.when(F.col("grp") == 1, 1).otherwise(0)).alias("n_b"),
        F.sum(
            F.when(F.col("grp") == 1, F.col("converted")).otherwise(0)
        ).alias("k_b"),
    )


@query(
    "a_two_proportion_ztest",
    oracle=f"""
    WITH {_PARITY_CONV_CELLS_SQL}
    SELECT n_a, k_a, n_b, k_b,
           CAST(CASE WHEN n_a = 0 THEN NULL
                     ELSE k_a * 1000000 // n_a END AS BIGINT) AS rate_a_ppm,
           CAST(CASE WHEN n_b = 0 THEN NULL
                     ELSE k_b * 1000000 // n_b END AS BIGINT) AS rate_b_ppm,
           CAST(CASE WHEN n_a = 0 OR n_b = 0
                       OR (CAST(k_a + k_b AS DOUBLE) / (n_a + n_b))
                          * (1.0 - CAST(k_a + k_b AS DOUBLE) / (n_a + n_b)) = 0
                     THEN NULL
                     ELSE round(
                       (CAST(k_a AS DOUBLE) / n_a - CAST(k_b AS DOUBLE) / n_b)
                       / sqrt((CAST(k_a + k_b AS DOUBLE) / (n_a + n_b))
                              * (1.0 - CAST(k_a + k_b AS DOUBLE) / (n_a + n_b))
                              * (1.0 / n_a + 1.0 / n_b)), 6)
                END AS DOUBLE) AS z_score
    FROM g
    """,
)
def a_two_proportion_ztest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion z-test on purchase conversion between a
    deterministic A/B split (user_id parity — the hash-as-assignment
    trick, engine-portable unlike any sampled split): the significance
    arithmetic every experimentation pipeline runs on exactly this
    engine's aggregates. Counts are one per-user flag aggregate + one
    4-way conditional sum (all-integer channels shipped: n/k per arm,
    ppm rates via bigint div); z is computed from those exact integers
    by a formula whose float64 op order is textually mirrored in the
    oracle, rounded to 6. Pooled-variance zero guard on BOTH sides
    (all-converted or none-converted arms → NULL z, never an ANSI
    divide-by-zero — the m_burstiness guard class). Cell build =
    the _parity_conversion_cells kernel shared with a_mde_power."""
    g = _parity_conversion_cells(spark, sf_dir)
    pp = "(CAST(k_a + k_b AS DOUBLE) / (n_a + n_b))"
    return g.select(
        "n_a",
        "k_a",
        "n_b",
        "k_b",
        F.expr(
            "CAST(CASE WHEN n_a = 0 THEN NULL"
            " ELSE k_a * 1000000 div n_a END AS BIGINT)"
        ).alias("rate_a_ppm"),
        F.expr(
            "CAST(CASE WHEN n_b = 0 THEN NULL"
            " ELSE k_b * 1000000 div n_b END AS BIGINT)"
        ).alias("rate_b_ppm"),
        F.expr(
            f"CAST(CASE WHEN n_a = 0 OR n_b = 0 OR {pp} * (1.0 - {pp}) = 0 THEN NULL"
            f" ELSE round((CAST(k_a AS DOUBLE) / n_a - CAST(k_b AS DOUBLE) / n_b)"
            f" / sqrt({pp} * (1.0 - {pp}) * (1.0 / n_a + 1.0 / n_b)), 6)"
            " END AS DOUBLE)"
        ).alias("z_score"),
    )

# ONE canonical per-value arm-count build shared by the two-sample tests
# (a_mann_whitney_u, a_ks_test) — the review-discipline factoring
# (_TYPE_DOW_CELLS_SQL, _part_cooccurrence precedents): the arm
# definition and the cents rounding must evolve in lockstep or the
# cross-entry n_a/n_b pin in tests/test_analytics.py silently breaks.
_VALUE_ARM_COUNTS_SQL = """ev AS (
      SELECT CAST(round(value * 100) AS BIGINT) AS cents,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS is_a
      FROM events
      WHERE value IS NOT NULL AND event_type IN ('purchase', 'click')
    ),
    by_v AS (
      SELECT cents,
             CAST(sum(is_a) AS BIGINT) AS cnt_a,
             CAST(sum(1 - is_a) AS BIGINT) AS cnt_b,
             CAST(count(*) AS BIGINT) AS cnt
      FROM ev GROUP BY cents
    )"""


def _value_arm_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-cents (purchase, click) counts over events — the pooled-value
    frame both two-sample tests rank/cumulate over."""
    e = _t(spark, sf_dir, "events").where(
        F.col("value").isNotNull()
        & F.col("event_type").isin("purchase", "click")
    )
    return e.select(
        F.expr("CAST(round(value * 100) AS BIGINT)").alias("cents"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("is_a"),
    ).groupBy("cents").agg(
        F.sum("is_a").alias("cnt_a"),
        F.sum(F.expr("1 - is_a")).alias("cnt_b"),
        F.count(F.lit(1)).alias("cnt"),
    )


def _value_arm_prefix(
    spark: SparkSession,
    sf_dir: str,
    sums: list[tuple[str, str]],
    by_v: DataFrame | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Shared prelude of the per-value rank/ECDF statistics (KS / AD /
    MW / KW): persist the per-value arm counts (the quantile-bounds
    action, every prefix chain, and the totals aggregate are separate
    consumers — the a_spearman_rho scan-amplification class), run ONE
    15-point bounds action, and thread it through every requested
    prefix column (the m_rfm batched-bounds lesson). ``sums`` is
    [(src_col, out_col), ...]. ``by_v`` lets a k-arm entry
    (a_kruskal_wallis) supply its OWN counts frame while reusing the
    persist/bounds/prefix machinery — the default is the two-arm
    _value_arm_counts. Factored by review pass: KS and AD carried
    verbatim copies of this recipe. Returns (by_v, pre): totals
    aggregate from the persisted by_v directly (no window subtree in
    their plan), prefix consumers read pre."""
    from surge_spark.operators.text import distributed_prefix_sum

    if by_v is None:
        by_v = _value_arm_counts(spark, sf_dir)
    by_v = by_v.persist()
    bounds = by_v.stat.approxQuantile(
        "cents", [i / 16 for i in range(1, 16)], 0.001
    )
    pre = by_v
    for src, out in sums:
        pre = distributed_prefix_sum(
            pre, src, "cents", [F.col("cents")], out_col=out, bounds=bounds
        )
    return by_v, pre


@query(
    "a_mann_whitney_u",
    oracle=f"""
    WITH {_VALUE_ARM_COUNTS_SQL},
    pre AS (
      SELECT cents, cnt_a, cnt_b, cnt,
             CAST(sum(cnt) OVER (ORDER BY cents
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - cnt
               AS BIGINT) AS less
      FROM by_v
    ),
    g AS (
      SELECT CAST(sum(cnt_a) AS BIGINT) AS n_a,
             CAST(sum(cnt_b) AS BIGINT) AS n_b,
             CAST(sum(cnt_a * (2 * less + cnt + 1)) AS BIGINT) AS r2_a,
             CAST(sum(cnt * cnt * cnt - cnt) AS BIGINT) AS tie_sum
      FROM pre
    )
    SELECT n_a, n_b, r2_a,
           CAST(r2_a - n_a * (n_a + 1) AS BIGINT) AS u2_a,
           CAST(2 * n_a * n_b - (r2_a - n_a * (n_a + 1)) AS BIGINT) AS u2_b,
           tie_sum,
           CAST(CASE WHEN n_a = 0 OR n_b = 0
                       OR CAST(n_a AS DOUBLE) * n_b / 12.0
                          * ((n_a + n_b + 1)
                             - CAST(tie_sum AS DOUBLE)
                               / ((n_a + n_b) * (n_a + n_b - 1.0))) = 0
                     THEN NULL
                     ELSE round(
                       (CAST(r2_a - n_a * (n_a + 1) AS DOUBLE) / 2.0
                        - CAST(n_a AS DOUBLE) * n_b / 2.0)
                       / sqrt(CAST(n_a AS DOUBLE) * n_b / 12.0
                              * ((n_a + n_b + 1)
                                 - CAST(tie_sum AS DOUBLE)
                                   / ((n_a + n_b) * (n_a + n_b - 1.0)))), 6)
                END AS DOUBLE) AS z_score
    FROM g
    """,
)
def a_mann_whitney_u(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U rank-sum test: do purchase and click events draw
    their ``value`` from the same distribution? — the nonparametric
    sibling of a_two_proportion_ztest (medians, not means; no normality
    assumption), computed WITHOUT ranking individual rows: pooled values
    collapse to integer cents (exact at the data's 2-decimal precision),
    per-value counts feed an EXACT distributed prefix sum
    (operators.text.distributed_prefix_sum — no unpartitioned window
    anywhere, the pinned discipline), and the doubled average rank
    2*r(v) = 2*less(v) + cnt(v) + 1 keeps the whole rank-sum channel in
    integers: r2_a = Σ cnt_a·(2·less+cnt+1), U identities u2_a + u2_b =
    2·n_a·n_b. The tie-corrected normal-approximation z comes from those
    exact integers by a formula textually mirrored in the oracle
    (round-6), with a zero-variance guard on BOTH sides (one arm empty
    or every value tied). Overflow bounds (review-corrected): the
    BINDING channel is the cubic tie_sum = Σ(cnt³−cnt) — bigint-safe
    while the heaviest single value's count stays under ~2.1e6 (2^21,
    since cnt³ < 2^63); the quadratic r2 ~ 2n² channel holds to
    n < ~2.1e9. Past either, a_mann_whitney_u_decimal (the wide_int
    channel twin, r14 — no longer just documented; ANSI raises loudly
    here, never silently wrong)."""
    g = _mann_whitney_g(spark, sf_dir, wide=False)
    return g.select(
        "n_a",
        "n_b",
        "r2_a",
        F.expr("CAST(r2_a - n_a * (n_a + 1) AS BIGINT)").alias("u2_a"),
        F.expr(
            "CAST(2 * n_a * n_b - (r2_a - n_a * (n_a + 1)) AS BIGINT)"
        ).alias("u2_b"),
        "tie_sum",
        F.expr(_mw_z_expr(wide=False)).alias("z_score"),
    )


_MW_VAR_EXPR = (
    "CAST(n_a AS DOUBLE) * n_b / 12.0 * ((n_a + n_b + 1)"
    " - CAST(tie_sum AS DOUBLE) / ((n_a + n_b) * (n_a + n_b - 1.0)))"
)


def _mw_z_expr(wide: bool) -> str:
    """The tie-corrected z formula shared by the Mann-Whitney channel
    twins — identical float math; in the wide channel n_a*(n_a+1) is
    widened too (it computes BEFORE the subtraction promotes, so left
    in bigint it would overflow at n_a > ~3e9 even though r2_a is
    already decimal)."""
    wna = wide_int("n_a", wide=wide)
    return (
        f"CAST(CASE WHEN n_a = 0 OR n_b = 0 OR {_MW_VAR_EXPR} = 0 THEN NULL"
        f" ELSE round((CAST(r2_a - {wna} * (n_a + 1) AS DOUBLE) / 2.0"
        f" - CAST(n_a AS DOUBLE) * n_b / 2.0) / sqrt({_MW_VAR_EXPR}), 6)"
        " END AS DOUBLE)"
    )


def _mann_whitney_g(spark: SparkSession, sf_dir: str, wide: bool) -> DataFrame:
    """The shared Mann-Whitney moments frame; wide=True runs the rank-sum
    and tie channels in DECIMAL(38,0) via wide_int (tie_sum = Σ(cnt³−cnt)
    overflows bigint once one value's count passes ~2.1e6)."""

    def w(x: str) -> str:
        return wide_int(x, wide=wide)

    _, pre = _value_arm_prefix(spark, sf_dir, [("cnt", "cum")])
    pre = pre.withColumn("less", F.col("cum") - F.col("cnt"))
    return pre.groupBy().agg(
        F.sum("cnt_a").alias("n_a"),
        F.sum("cnt_b").alias("n_b"),
        F.sum(F.expr(f"{w('cnt_a')} * (2 * less + cnt + 1)")).alias("r2_a"),
        F.sum(F.expr(f"{w('cnt')} * cnt * cnt - cnt")).alias("tie_sum"),
    )


@query(
    "a_mann_whitney_u_decimal",
    oracle=f"""
    WITH {_VALUE_ARM_COUNTS_SQL},
    pre AS (
      SELECT cents, cnt_a, cnt_b, cnt,
             CAST(sum(cnt) OVER (ORDER BY cents
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - cnt
               AS BIGINT) AS less
      FROM by_v
    ),
    g AS (
      SELECT CAST(sum(cnt_a) AS BIGINT) AS n_a,
             CAST(sum(cnt_b) AS BIGINT) AS n_b,
             sum({wide_int('cnt_a', duck=True)} * (2 * less + cnt + 1))
               AS r2_a,
             sum({wide_int('cnt', duck=True)} * cnt * cnt - cnt) AS tie_sum
      FROM pre
    )
    SELECT n_a, n_b,
           CAST(CASE WHEN n_a = 0 OR n_b = 0 OR {_MW_VAR_EXPR} = 0 THEN NULL
            ELSE round((CAST(r2_a - {wide_int('n_a', duck=True)} * (n_a + 1)
                        AS DOUBLE) / 2.0
             - CAST(n_a AS DOUBLE) * n_b / 2.0) / sqrt({_MW_VAR_EXPR}), 6)
            END AS DOUBLE) AS z_score
    FROM g
    """,
)
def a_mann_whitney_u_decimal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """a_mann_whitney_u's wide-integer escape hatch (r14 VERDICT task 4,
    the a_basket_lift_decimal pattern via the shared wide_int helper):
    identical plan, but the rank-sum channel r2_a and the cubic tie
    channel Σ(cnt³−cnt) run in DECIMAL(38,0) / HUGEINT — exact past the
    bigint twin's ~2.1e6-per-value-count bound, to ~1e38. Ships n_a,
    n_b, z only (the wide intermediates don't fit the BIGINT output
    contract at the scales that need this twin); z is the same mirrored
    tie-corrected formula with n_a·(n_a+1) also widened (that product
    computes before promotion). bigint-vs-decimal equality is pinned in
    tests/test_analytics.py."""
    g = _mann_whitney_g(spark, sf_dir, wide=True)
    return g.select("n_a", "n_b", F.expr(_mw_z_expr(wide=True)).alias("z_score"))


@query(
    "a_ks_test",
    oracle=f"""
    WITH {_VALUE_ARM_COUNTS_SQL},
    pre AS (
      SELECT cents,
             CAST(sum(cnt_a) OVER (ORDER BY cents
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS cum_a,
             CAST(sum(cnt_b) OVER (ORDER BY cents
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS cum_b
      FROM by_v
    ),
    n AS (
      SELECT CAST(sum(cnt_a) AS BIGINT) AS n_a,
             CAST(sum(cnt_b) AS BIGINT) AS n_b
      FROM by_v
    )
    SELECT n.n_a, n.n_b,
           CAST(max(abs(pre.cum_a * n.n_b - pre.cum_b * n.n_a)) AS BIGINT)
             AS max_diff_num,
           CAST(round(CAST(max(abs(pre.cum_a * n.n_b - pre.cum_b * n.n_a))
                  AS DOUBLE) / (CAST(n.n_a AS DOUBLE) * n.n_b), 6)
             AS DOUBLE) AS d_stat,
           CAST(round(sqrt(CAST(n.n_a AS DOUBLE) * n.n_b / (n.n_a + n.n_b))
                  * (CAST(max(abs(pre.cum_a * n.n_b - pre.cum_b * n.n_a))
                     AS DOUBLE) / (CAST(n.n_a AS DOUBLE) * n.n_b)), 4)
             AS DOUBLE) AS ks_scaled
    FROM pre CROSS JOIN n GROUP BY n.n_a, n.n_b
    """,
)
def a_ks_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov statistic between purchase and click
    values — the distribution-shape sibling of a_mann_whitney_u (U
    detects location shift; D = max |F_a - F_b| detects ANY shape
    difference), on the SAME per-value-counts + exact-prefix-sum
    machinery: both ECDFs ride ONE distributed_prefix_sum call (two
    value columns share one shard pass — the m_rfm batched-bounds
    lesson, no second quantile action), and the supremum stays in exact
    integers as max |cum_a*n_b - cum_b*n_a| (cross-multiplied — no float
    ECDF anywhere until the final division, round-6). ks_scaled =
    sqrt(n_a*n_b/n)*D is the asymptotic Kolmogorov statistic (compare to
    1.36 for alpha=0.05), round-4. Overflow bound: cum*n <= n_a*n_b
    stays in bigint while each arm < ~3e9 rows — the
    a_basket_lift_decimal escape class, documented."""
    by_v, pre = _value_arm_prefix(
        spark, sf_dir, [("cnt_a", "cum_a"), ("cnt_b", "cum_b")]
    )
    n = by_v.groupBy().agg(
        F.sum("cnt_a").alias("n_a"), F.sum("cnt_b").alias("n_b")
    )
    num = "abs(cum_a * n_b - cum_b * n_a)"
    d = f"CAST(max({num}) AS DOUBLE) / (CAST(n_a AS DOUBLE) * n_b)"
    return (
        pre.crossJoin(F.broadcast(n))
        .groupBy("n_a", "n_b")
        .agg(
            F.expr(f"CAST(max({num}) AS BIGINT)").alias("max_diff_num"),
            F.expr(f"CAST(round({d}, 6) AS DOUBLE)").alias("d_stat"),
            F.expr(
                f"CAST(round(sqrt(CAST(n_a AS DOUBLE) * n_b / (n_a + n_b))"
                f" * ({d}), 4) AS DOUBLE)"
            ).alias("ks_scaled"),
        )
    )


# The Scholz-Stephens per-cell AD term, shared textually by the Spark
# expr and the oracle (da/db are the cross-multiplied ECDF deviations;
# everything stays in exact integers until the explicit DOUBLE casts, so
# both engines evaluate identical float64 per-cell terms — only the SUM
# order differs cross-engine, hence round-4, the m_winsorized_mean
# float-sum lesson).
_AD_DA = (
    "(CAST(n_a + n_b AS DOUBLE) * cum_a - CAST(n_a AS DOUBLE) * cum_n)"
)
_AD_DB = (
    "(CAST(n_a + n_b AS DOUBLE) * (cum_n - cum_a)"
    " - CAST(n_b AS DOUBLE) * cum_n)"
)
_AD_TERM = (
    f"CAST(cnt AS DOUBLE) / (n_a + n_b)"
    f" * ({_AD_DA} * {_AD_DA} / n_a + {_AD_DB} * {_AD_DB} / n_b)"
    f" / (CAST(cum_n AS DOUBLE) * (n_a + n_b - cum_n))"
)


@query(
    "a_anderson_darling",
    oracle=f"""
    WITH {_VALUE_ARM_COUNTS_SQL},
    pre AS (
      SELECT cents, cnt, cnt_a,
             CAST(sum(cnt) OVER (ORDER BY cents
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS cum_n,
             CAST(sum(cnt_a) OVER (ORDER BY cents
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS cum_a
      FROM by_v
    ),
    n AS (
      SELECT CAST(sum(cnt_a) AS BIGINT) AS n_a,
             CAST(sum(cnt_b) AS BIGINT) AS n_b,
             CAST(count(*) AS BIGINT) AS n_cells
      FROM by_v
    )
    SELECT n.n_a, n.n_b, n.n_cells,
           CAST(CASE WHEN n.n_a = 0 OR n.n_b = 0 THEN NULL
                ELSE round(sum(CASE WHEN pre.cum_n < n.n_a + n.n_b
                               THEN {_AD_TERM}
                               ELSE 0.0 END), 4)
                END AS DOUBLE) AS a2
    FROM pre CROSS JOIN n GROUP BY n.n_a, n.n_b, n.n_cells
    """,
)
def a_anderson_darling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Anderson-Darling statistic between purchase and click
    values — completing the two-sample quartet on the ONE shared
    _value_arm_counts kernel (Welch t: means; Mann-Whitney U: location;
    KS: max ECDF gap; AD: the INTEGRATED, tail-weighted ECDF gap — the
    test that catches tail divergence KS's single supremum misses).
    Scholz-Stephens (1987) discrete form over distinct pooled values:
    A² = Σⱼ (lⱼ/N)·(daⱼ²/n_a + dbⱼ²/n_b)/(Bⱼ(N−Bⱼ)) for Bⱼ < N, with
    da = N·M_aj − n_a·Bⱼ. Both cumulative channels ride ONE
    distributed_prefix_sum pass (M_b = B − M_a, so the second arm costs
    nothing — one fewer pass than a_ks_test needs); every per-cell term
    is a float64 expression over exact integers, textually mirrored, so
    only the cross-engine SUM order differs → round-4 (the
    m_winsorized_mean lesson). Empty arm → NULL both sides. Products
    N·M stay exactly representable in double to N ~ 6e7; past that the
    terms round identically anyway (IEEE ops on identical inputs)."""
    by_v, pre = _value_arm_prefix(
        spark, sf_dir, [("cnt", "cum_n"), ("cnt_a", "cum_a")]
    )
    n = by_v.groupBy().agg(
        F.sum("cnt_a").alias("n_a"),
        F.sum("cnt_b").alias("n_b"),
        F.count(F.lit(1)).alias("n_cells"),
    )
    return (
        pre.crossJoin(F.broadcast(n))
        .groupBy("n_a", "n_b", "n_cells")
        .agg(
            F.expr(
                f"CAST(CASE WHEN n_a = 0 OR n_b = 0 THEN NULL"
                f" ELSE round(sum(CASE WHEN cum_n < n_a + n_b"
                f" THEN {_AD_TERM}"
                f" ELSE 0.0D END), 4) END AS DOUBLE)"
            ).alias("a2"),
        )
    )


@query(
    "g_rich_club",
    oracle=f"""
    WITH {_PART_COOCCUR_SQL},
    ks(k) AS (VALUES (60), (100), (150), (200)),
    rich AS (
      SELECT ks.k, deg.node FROM ks JOIN deg ON deg.k > ks.k
    ),
    nk AS (SELECT k, CAST(count(*) AS BIGINT) AS n_k FROM rich GROUP BY k),
    ek AS (
      SELECT r1.k, CAST(count(*) AS BIGINT) AS e_k
      FROM pairs p
      JOIN rich r1 ON r1.node = p.pa
      JOIN rich r2 ON r2.node = p.pb AND r2.k = r1.k
      GROUP BY r1.k
    )
    SELECT CAST(nk.k AS BIGINT) AS k, nk.n_k,
           CAST(coalesce(ek.e_k, 0) AS BIGINT) AS e_k,
           CAST(CASE WHEN nk.n_k >= 2
                     THEN coalesce(ek.e_k, 0) * 2000000
                          // (nk.n_k * (nk.n_k - 1))
                END AS BIGINT) AS phi_ppm
    FROM nk LEFT JOIN ek ON ek.k = nk.k
    """,
)
def g_rich_club(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rich-club coefficient phi(k) = 2*E_k / (N_k*(N_k-1)) at a ladder
    of degree thresholds — do the highest-degree parts preferentially
    co-occur with EACH OTHER? (Colizza et al. 2006; the hub-structure
    audit beside assortativity's global correlation — assortativity
    summarizes one number, the rich-club curve shows WHERE mixing
    concentrates). Rides the ONE checkpointed _part_cooccurrence kernel
    (pairs + deg shared with assortativity/Katz/local-clustering — the
    scan-amplification discipline); the threshold ladder is a 4-row
    literal broadcast, so the only corpus-scale work is two broadcast
    semi-shaped joins of the pair set against the rich node sets.
    phi ships as exact integer ppm (bigint div); N_k < 2 yields NULL
    (no pairs to norm by — never a divide-by-zero)."""
    pairs, _, deg = _part_cooccurrence(spark, sf_dir)
    ks = spark.range(1).selectExpr(
        "explode(array(60, 100, 150, 200)) AS k"
    )
    rich = F.broadcast(ks).join(deg, deg.k > ks.k).select(
        ks.k.alias("kt"), "node"
    )
    nk = rich.groupBy(F.col("kt")).agg(F.count(F.lit(1)).alias("n_k"))
    r1 = rich.select(F.col("kt").alias("k1"), F.col("node").alias("pa"))
    r2 = rich.select(F.col("kt").alias("k2"), F.col("node").alias("pb2"))
    ek = (
        pairs.join(r1, "pa")
        .join(r2, (F.col("pb") == F.col("pb2")) & (F.col("k1") == F.col("k2")))
        .groupBy(F.col("k1"))
        .agg(F.count(F.lit(1)).alias("e_k"))
    )
    return (
        nk.join(ek, nk.kt == ek.k1, "left")
        .select(
            F.col("kt").cast("bigint").alias("k"),
            "n_k",
            F.coalesce(F.col("e_k"), F.lit(0)).alias("e_k"),
            F.expr(
                "CAST(CASE WHEN n_k >= 2 THEN coalesce(e_k, 0) * 2000000"
                " div (n_k * (n_k - 1)) END AS BIGINT)"
            ).alias("phi_ppm"),
        )
    )


@query(
    "g_local_bridges",
    oracle=f"""
    WITH {_PART_COOCCUR_SQL},
    {_TRIS_SQL},
    supported AS (
      SELECT a AS pa, b AS pb FROM tris
      UNION ALL SELECT a, c FROM tris
      UNION ALL SELECT b, c FROM tris
    ),
    bridges AS (
      SELECT p.pa, p.pb FROM pairs p
      WHERE NOT EXISTS (
        SELECT 1 FROM supported s WHERE s.pa = p.pa AND s.pb = p.pb
      )
    )
    SELECT (SELECT CAST(count(*) AS BIGINT) FROM pairs) AS n_edges,
           CAST(count(*) AS BIGINT) AS n_local_bridges,
           CAST(count(*) * 1000000
                // (SELECT count(*) FROM pairs) AS BIGINT) AS bridge_ppm
    FROM bridges
    """,
)
def g_local_bridges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local bridges — edges whose endpoints share NO common neighbor
    (span > 2, Granovetter's weak-tie structure; deleting one lengthens
    its endpoints' shortest path): exactly the edges no triangle
    supports, so on a dense co-occurrence graph the count measures how
    much of the edge set lives OUTSIDE the clustered core that
    g_triangle_count / g_local_clustering_topk measure. Supported edges
    come from the MIN-ORIENTED triangle enumeration (each triangle once
    at a<b<c, the g_local_clustering_topk rewrite — the naive
    all-wedges distinct measured 38.9 s at sf0.1 against ~Σ C(deg_>,2)
    ≈ 1/4 the wedges here, warm ~7 s after), exploded to the 3 corner
    edges (each already in canonical pa<pb order), distinct-ed, and
    anti-joined against the ONE checkpointed _part_cooccurrence pair
    set. Integer channels only."""
    pairs, _, _ = _part_cooccurrence(spark, sf_dir)
    tris = _min_oriented_tris(pairs)
    supported = (
        tris.select(
            F.explode(
                F.array(
                    F.struct(F.col("a").alias("pa"), F.col("b").alias("pb")),
                    F.struct(F.col("a").alias("pa"), F.col("c").alias("pb")),
                    F.struct(F.col("b").alias("pa"), F.col("c").alias("pb")),
                )
            ).alias("e")
        )
        .select("e.pa", "e.pb")
        # no distinct: the anti join needs no deduped right side, and the
        # dedup is a full extra shuffle of 3x|triangles| rows (A/B at
        # sf0.1: same band locally — 6.9-8.0 s both ways — kept simpler
        # for the one-less-exchange plan at scale)
    )
    bridges = pairs.join(supported, ["pa", "pb"], "left_anti")
    n_edges = pairs.groupBy().agg(F.count(F.lit(1)).alias("n_edges"))
    return (
        bridges.groupBy()
        .agg(F.count(F.lit(1)).alias("n_local_bridges"))
        .crossJoin(F.broadcast(n_edges))
        .select(
            "n_edges",
            "n_local_bridges",
            F.expr(
                "CAST(n_local_bridges * 1000000 div n_edges AS BIGINT)"
            ).alias("bridge_ppm"),
        )
    )


@query(
    "a_welch_t_test",
    oracle=f"""
    WITH {_VALUE_ARM_COUNTS_SQL},
    g AS (
      SELECT CAST(sum(cnt_a) AS BIGINT) AS n_a,
             CAST(sum(cnt_b) AS BIGINT) AS n_b,
             CAST(sum(cnt_a * cents) AS BIGINT) AS s1_a,
             CAST(sum(cnt_b * cents) AS BIGINT) AS s1_b,
             CAST(sum(cnt_a * cents * cents) AS BIGINT) AS s2_a,
             CAST(sum(cnt_b * cents * cents) AS BIGINT) AS s2_b
      FROM by_v
    )
    SELECT n_a, n_b, s1_a, s1_b,
           CAST(CASE WHEN n_a < 2 OR n_b < 2
                  OR ((CAST(s2_a AS DOUBLE) - CAST(s1_a AS DOUBLE) * s1_a / n_a)
                      / (n_a - 1) / n_a
                      + (CAST(s2_b AS DOUBLE) - CAST(s1_b AS DOUBLE) * s1_b / n_b)
                        / (n_b - 1) / n_b) = 0
                THEN NULL
                ELSE round(
                  (CAST(s1_a AS DOUBLE) / n_a - CAST(s1_b AS DOUBLE) / n_b)
                  / sqrt((CAST(s2_a AS DOUBLE) - CAST(s1_a AS DOUBLE) * s1_a / n_a)
                         / (n_a - 1) / n_a
                         + (CAST(s2_b AS DOUBLE) - CAST(s1_b AS DOUBLE) * s1_b / n_b)
                           / (n_b - 1) / n_b), 6)
                END AS DOUBLE) AS t_stat,
           CAST(CASE WHEN n_a < 2 OR n_b < 2
                  OR ((CAST(s2_a AS DOUBLE) - CAST(s1_a AS DOUBLE) * s1_a / n_a)
                      / (n_a - 1) / n_a) = 0
                     AND ((CAST(s2_b AS DOUBLE) - CAST(s1_b AS DOUBLE) * s1_b / n_b)
                          / (n_b - 1) / n_b) = 0
                THEN NULL
                ELSE round(
                  ((CAST(s2_a AS DOUBLE) - CAST(s1_a AS DOUBLE) * s1_a / n_a)
                   / (n_a - 1) / n_a
                   + (CAST(s2_b AS DOUBLE) - CAST(s1_b AS DOUBLE) * s1_b / n_b)
                     / (n_b - 1) / n_b)
                  * ((CAST(s2_a AS DOUBLE) - CAST(s1_a AS DOUBLE) * s1_a / n_a)
                     / (n_a - 1) / n_a
                     + (CAST(s2_b AS DOUBLE) - CAST(s1_b AS DOUBLE) * s1_b / n_b)
                       / (n_b - 1) / n_b)
                  / (((CAST(s2_a AS DOUBLE) - CAST(s1_a AS DOUBLE) * s1_a / n_a)
                      / (n_a - 1) / n_a)
                     * ((CAST(s2_a AS DOUBLE) - CAST(s1_a AS DOUBLE) * s1_a / n_a)
                        / (n_a - 1) / n_a) / (n_a - 1)
                     + ((CAST(s2_b AS DOUBLE) - CAST(s1_b AS DOUBLE) * s1_b / n_b)
                        / (n_b - 1) / n_b)
                       * ((CAST(s2_b AS DOUBLE) - CAST(s1_b AS DOUBLE) * s1_b / n_b)
                          / (n_b - 1) / n_b) / (n_b - 1)), 4)
                END AS DOUBLE) AS welch_df
    FROM g
    """,
)
def a_welch_t_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's unequal-variance t-test on purchase-vs-click values —
    completes the two-sample trio on the ONE shared _value_arm_counts
    kernel (parametric mean test here; rank test a_mann_whitney_u;
    distribution test a_ks_test — one pooled-cents frame, three
    statistics). Every moment is an EXACT integer: Σcents and Σcents²
    per arm ride the per-value counts (cnt·c, cnt·c²), so both engines
    derive t and the Welch-Satterthwaite df from identical bigints via
    textually mirrored float64 formulas (t round-6, df round-4). Guards
    on BOTH sides: arm smaller than 2 or zero pooled standard error →
    NULL (the m_burstiness class). Overflow bound: Σcnt·c² <
    max_cents²·n — bigint-safe to ~2e10 rows at this data's ~2e4-cent
    values; past that, the a_basket_lift_decimal escape (documented)."""
    by_v = _value_arm_counts(spark, sf_dir)
    g = by_v.groupBy().agg(
        F.sum("cnt_a").alias("n_a"),
        F.sum("cnt_b").alias("n_b"),
        F.sum(F.expr("cnt_a * cents")).alias("s1_a"),
        F.sum(F.expr("cnt_b * cents")).alias("s1_b"),
        F.sum(F.expr("cnt_a * cents * cents")).alias("s2_a"),
        F.sum(F.expr("cnt_b * cents * cents")).alias("s2_b"),
    )
    va = (
        "(CAST(s2_a AS DOUBLE) - CAST(s1_a AS DOUBLE) * s1_a / n_a)"
        " / (n_a - 1) / n_a"
    )
    vb = (
        "(CAST(s2_b AS DOUBLE) - CAST(s1_b AS DOUBLE) * s1_b / n_b)"
        " / (n_b - 1) / n_b"
    )
    return g.select(
        "n_a",
        "n_b",
        "s1_a",
        "s1_b",
        F.expr(
            f"CAST(CASE WHEN n_a < 2 OR n_b < 2 OR ({va} + {vb}) = 0"
            " THEN NULL"
            f" ELSE round((CAST(s1_a AS DOUBLE) / n_a"
            f" - CAST(s1_b AS DOUBLE) / n_b) / sqrt({va} + {vb}), 6)"
            " END AS DOUBLE)"
        ).alias("t_stat"),
        F.expr(
            f"CAST(CASE WHEN n_a < 2 OR n_b < 2"
            f" OR ({va}) = 0 AND ({vb}) = 0 THEN NULL"
            f" ELSE round(({va} + {vb}) * ({va} + {vb})"
            f" / (({va}) * ({va}) / (n_a - 1)"
            f" + ({vb}) * ({vb}) / (n_b - 1)), 4)"
            " END AS DOUBLE)"
        ).alias("welch_df"),
    )


@query(
    "o_data_quality_checks",
    oracle="""
    SELECT 'orders_orphan_custkey' AS check_name,
           CAST((SELECT count(*) FROM orders o
                 WHERE NOT EXISTS (SELECT 1 FROM customer c
                                   WHERE c.c_custkey = o.o_custkey))
                AS BIGINT) AS n_violations,
           CAST((SELECT count(*) FROM orders) AS BIGINT) AS n_checked
    UNION ALL
    SELECT 'lineitem_orphan_orderkey',
           CAST((SELECT count(*) FROM lineitem l
                 WHERE NOT EXISTS (SELECT 1 FROM orders o
                                   WHERE o.o_orderkey = l.l_orderkey))
                AS BIGINT),
           CAST((SELECT count(*) FROM lineitem) AS BIGINT)
    UNION ALL
    SELECT 'lineitem_orphan_partkey',
           CAST((SELECT count(*) FROM lineitem l
                 WHERE NOT EXISTS (SELECT 1 FROM part p
                                   WHERE p.p_partkey = l.l_partkey))
                AS BIGINT),
           CAST((SELECT count(*) FROM lineitem) AS BIGINT)
    UNION ALL
    SELECT 'events_null_user_id',
           CAST((SELECT count(*) FROM events WHERE user_id IS NULL) AS BIGINT),
           CAST((SELECT count(*) FROM events) AS BIGINT)
    UNION ALL
    SELECT 'events_duplicate_event_id',
           CAST((SELECT count(*) - count(DISTINCT event_id) FROM events)
                AS BIGINT),
           CAST((SELECT count(*) FROM events) AS BIGINT)
    UNION ALL
    SELECT 'documents_empty_text',
           CAST((SELECT count(*) FROM documents
                 WHERE text IS NULL OR length(trim(text)) = 0) AS BIGINT),
           CAST((SELECT count(*) FROM documents) AS BIGINT)
    UNION ALL
    SELECT 'orders_nonpositive_total',
           CAST((SELECT count(*) FROM orders WHERE o_totalprice <= 0)
                AS BIGINT),
           CAST((SELECT count(*) FROM orders) AS BIGINT)
    """,
)
def o_data_quality_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality check suite over the warehouse — the dbt-test /
    Great-Expectations shape run as ONE catalog entry: referential
    integrity (orphan foreign keys via anti joins — never NOT IN, whose
    NULL semantics silently lie), null-key rates, duplicate primary
    keys (count minus distinct), emptiness and range checks; one row
    per check with (violations, checked) so a pipeline gate can assert
    n_violations == 0 per check and a drift monitor can track rates.
    Every check is a count — all-integer output, trivially exact
    cross-engine. At 100 TB each anti join is a shuffle on its own key;
    the dim key projections carry NO broadcast hints (customer/part
    grow with SF and explicit hints are honored unconditionally — the
    r11 hint-audit class; the planner still auto-broadcasts them at
    test scale and degrades to SMJ at scale instead of OOMing the
    driver). Each check is an independent aggregate subtree — Catalyst
    does NOT reuse scans across union branches, so orders is scanned 3x
    and lineitem/events 2x each; that's accepted here because every
    branch is a column-pruned count over one or two key columns (the
    scans are cheap relative to the anti-join shuffles, and collapsing
    the join checks into conditional aggregates would force outer joins
    that shuffle the fact tables anyway). Nothing here collects."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    e = _t(spark, sf_dir, "events")
    d = _t(spark, sf_dir, "documents")

    def check(name: str, viol: DataFrame, total: DataFrame) -> DataFrame:
        v = viol.groupBy().agg(F.count(F.lit(1)).alias("n_violations"))
        t = total.groupBy().agg(F.count(F.lit(1)).alias("n_checked"))
        return (
            v.crossJoin(t)
            .select(
                F.lit(name).alias("check_name"),
                F.col("n_violations").cast("bigint").alias("n_violations"),
                F.col("n_checked").cast("bigint").alias("n_checked"),
            )
        )

    checks = [
        check(
            "orders_orphan_custkey",
            # no broadcast hint: customer grows with SF and explicit
            # hints are honored unconditionally (the r11 audit's exact
            # removal class) — the planner auto-broadcasts at test scale
            o.join(
                c.select("c_custkey"),
                o.o_custkey == F.col("c_custkey"),
                "left_anti",
            ),
            o,
        ),
        check(
            "lineitem_orphan_orderkey",
            li.join(
                o.select("o_orderkey"),
                li.l_orderkey == F.col("o_orderkey"),
                "left_anti",
            ),
            li,
        ),
        check(
            "lineitem_orphan_partkey",
            li.join(
                p.select("p_partkey"),
                li.l_partkey == F.col("p_partkey"),
                "left_anti",
            ),
            li,
        ),
        check("events_null_user_id", e.where(F.col("user_id").isNull()), e),
        check("documents_empty_text", d.where(
            F.col("text").isNull() | (F.length(F.trim(F.col("text"))) == 0)
        ), d),
        check(
            "orders_nonpositive_total", o.where(F.col("o_totalprice") <= 0), o
        ),
    ]
    dup = (
        e.groupBy()
        .agg(
            (F.count(F.lit(1)) - F.countDistinct("event_id")).alias(
                "n_violations"
            ),
            F.count(F.lit(1)).alias("n_checked"),
        )
        .select(
            F.lit("events_duplicate_event_id").alias("check_name"),
            F.col("n_violations").cast("bigint").alias("n_violations"),
            F.col("n_checked").cast("bigint").alias("n_checked"),
        )
    )
    out = checks[0]
    for frame in checks[1:] + [dup]:
        out = out.unionByName(frame)
    return out


@query(
    "a_cramers_v",
    oracle=f"""
    WITH {_TYPE_DOW_CELLS_SQL},
    rt AS (SELECT event_type, CAST(sum(observed) AS BIGINT) AS r FROM cells GROUP BY 1),
    ct AS (SELECT dow, CAST(sum(observed) AS BIGINT) AS c FROM cells GROUP BY 1),
    t AS (SELECT CAST(sum(observed) AS BIGINT) AS total FROM cells),
    dims AS (
      SELECT CAST((SELECT count(*) FROM rt) AS BIGINT) AS n_rows,
             CAST((SELECT count(*) FROM ct) AS BIGINT) AS n_cols
    ),
    chi AS (
      SELECT sum(
        (cells.observed - CAST(rt.r * ct.c AS DOUBLE) / t.total)
        * (cells.observed - CAST(rt.r * ct.c AS DOUBLE) / t.total)
        / (CAST(rt.r * ct.c AS DOUBLE) / t.total)
      ) AS chi2, max(t.total) AS total
      FROM cells JOIN rt USING (event_type) JOIN ct USING (dow) CROSS JOIN t
    )
    SELECT dims.n_rows, dims.n_cols, chi.total AS n,
           CAST(round(chi.chi2, 6) AS DOUBLE) AS chi2,
           CAST(CASE WHEN least(dims.n_rows, dims.n_cols) < 2 THEN NULL
                ELSE round(sqrt(chi.chi2 / (chi.total
                     * (least(dims.n_rows, dims.n_cols) - 1))), 6)
                END AS DOUBLE) AS cramers_v
    FROM chi CROSS JOIN dims
    """,
)
def a_cramers_v(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cramér's V effect size for the type×dow contingency table — the
    missing half of a_chi_square_independence: chi² says WHETHER the
    association is significant (it always is at corpus scale), V =
    sqrt(chi²/(n·(min(r,c)−1))) says whether it's LARGE, normalized to
    [0,1] so dashboards can threshold it. Same shared _type_dow_cells
    kernel and the same exact-bigint margins; the per-cell chi²
    contributions sum in float64 via a textually mirrored formula
    (round-6). Degenerate 1×k tables (a single event type or one active
    day) yield NULL V, never an ANSI divide-by-zero — both sides."""
    cells = _type_dow_cells(spark, sf_dir).localCheckpoint(
        eager=False
    )  # 4 lazy consumers (rt/ct/t/chi join) — the MI entry's same barrier
    rt = cells.groupBy("event_type").agg(F.sum("observed").alias("r"))
    ct = cells.groupBy("dow").agg(F.sum("observed").alias("c"))
    t = cells.groupBy().agg(F.sum("observed").alias("total"))
    dims = (
        rt.groupBy()
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .crossJoin(ct.groupBy().agg(F.count(F.lit(1)).alias("n_cols")))
    )
    exp_sql = "CAST(r * c AS DOUBLE) / total"
    chi = (
        cells.join(F.broadcast(rt), "event_type")
        .join(F.broadcast(ct), "dow")
        .crossJoin(F.broadcast(t))
        .groupBy()
        .agg(
            F.sum(
                F.expr(
                    f"(observed - {exp_sql}) * (observed - {exp_sql})"
                    f" / ({exp_sql})"
                )
            ).alias("chi2"),
            F.max("total").alias("n"),
        )
    )
    return (
        chi.crossJoin(F.broadcast(dims))
        .select(
            "n_rows",
            "n_cols",
            "n",
            F.expr("CAST(round(chi2, 6) AS DOUBLE)").alias("chi2"),
            F.expr(
                "CAST(CASE WHEN least(n_rows, n_cols) < 2 THEN NULL"
                " ELSE round(sqrt(chi2 / (n * (least(n_rows, n_cols) - 1))), 6)"
                " END AS DOUBLE)"
            ).alias("cramers_v"),
        )
    )


@query(
    "g_degree_centralization",
    oracle=f"""
    WITH {_PART_COOCCUR_SQL},
    mx AS (SELECT CAST(max(k) AS BIGINT) AS max_k,
                  CAST(count(*) AS BIGINT) AS n,
                  CAST(sum(k) AS BIGINT) AS sum_k
           FROM deg)
    SELECT n, max_k, sum_k,
           CAST(max_k * n - sum_k AS BIGINT) AS centralization_num,
           CAST(CASE WHEN n >= 3
                THEN (max_k * n - sum_k) * 1000000 // ((n - 1) * (n - 2))
                END AS BIGINT) AS freeman_ppm
    FROM mx
    """,
)
def g_degree_centralization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Freeman degree centralization of the part co-occurrence graph —
    how star-like is it? Σ(k_max − k_i) over the maximum possible
    (n−1)(n−2) (the star's value), shipped as exact integer ppm: a
    one-aggregate summary that complements the rich-club curve (which
    asks whether hubs interconnect) and assortativity (how degrees
    correlate across edges) with the single most-cited centralization
    number. Rides the ONE checkpointed _part_cooccurrence kernel —
    max/count/sum in a single pass over the degree frame; n<3 yields
    NULL (the formula's denominator degenerates), never a
    divide-by-zero."""
    _, _, deg = _part_cooccurrence(spark, sf_dir)
    mx = deg.groupBy().agg(
        F.max("k").alias("max_k"),
        F.count(F.lit(1)).alias("n"),
        F.sum("k").alias("sum_k"),
    )
    return mx.select(
        "n",
        "max_k",
        "sum_k",
        F.expr("CAST(max_k * n - sum_k AS BIGINT)").alias(
            "centralization_num"
        ),
        F.expr(
            "CAST(CASE WHEN n >= 3 THEN (max_k * n - sum_k) * 1000000"
            " div ((n - 1) * (n - 2)) END AS BIGINT)"
        ).alias("freeman_ppm"),
    )


@query(
    "j_asof_forward_join",
    oracle="""
    WITH purchases AS (
      SELECT user_id, ts, event_id, value FROM events
      WHERE event_type = 'purchase'
    ), ranked AS (
      SELECT e.event_id,
             p.event_id AS purchase_event_id,
             CAST(round(p.value, 2) AS DOUBLE) AS purchase_value,
             row_number() OVER (
               PARTITION BY e.event_id ORDER BY p.ts ASC, p.event_id ASC
             ) AS rn
      FROM events e JOIN purchases p
        ON e.user_id = p.user_id
       AND p.ts > e.ts AND p.ts <= e.ts + INTERVAL 1 DAY
      WHERE e.event_type = 'click'
    )
    SELECT event_id, purchase_event_id, purchase_value
    FROM ranked WHERE rn = 1
    """,
)
def j_asof_forward_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FORWARD as-of join — each click attributed to the user's NEXT
    purchase within 24 h (time-to-outcome labeling: 'did this click
    convert, and to what?'), the mirror image of j_asof_join's
    most-recent-prior lookup and the labeling shape training pipelines
    run when the supervision signal arrives AFTER the feature row. Same
    ONE _asof_click_purchase kernel (direction='forward' flips the
    range predicate and max_by→min_by — the tie-break and round-2 value
    channel stay in one place), and the 24 h bound is what keeps the
    range-join state bounded at scale, exactly like the tolerance
    entry's staleness bound. INNER semantics here: an unconverted click
    has no label row (the tolerance entry demonstrates the LEFT
    variant)."""
    events = _t(spark, sf_dir, "events")
    _, best = _asof_click_purchase(
        events, tolerance_expr="INTERVAL 1 DAY", direction="forward"
    )
    return best.select(
        F.col("m_event_id").alias("event_id"),
        F.col("best.p_event_id").alias("purchase_event_id"),
        F.round(F.col("best.p_value"), 2).alias("purchase_value"),
    )


@query(
    "m_changepoint_single",
    oracle="""
    WITH daily AS (
      SELECT event_type, epoch_ms(ts) // 86400000 AS d,
             CAST(count(*) AS BIGINT) AS cnt
      FROM events GROUP BY 1, 2
    ),
    pre AS (
      SELECT event_type, d, cnt,
             CAST(sum(cnt) OVER w AS BIGINT) AS s1,
             CAST(row_number() OVER w AS BIGINT) AS i,
             CAST(sum(cnt) OVER p AS BIGINT) AS t1,
             CAST(count(*) OVER p AS BIGINT) AS n
      FROM daily
      WINDOW w AS (PARTITION BY event_type ORDER BY d
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
             p AS (PARTITION BY event_type)
    ),
    scored AS (
      SELECT event_type, d, i, n,
             round(
               (CAST(s1 AS DOUBLE) * s1 / i
                + (CAST(t1 AS DOUBLE) - s1) * (CAST(t1 AS DOUBLE) - s1)
                  / (n - i))
               - CAST(t1 AS DOUBLE) * t1 / n, 6) AS gain
      FROM pre WHERE i < n
    ),
    best AS (
      SELECT event_type, d, i, n, gain,
             row_number() OVER (
               PARTITION BY event_type ORDER BY gain DESC, d ASC
             ) AS rn
      FROM scored
    )
    SELECT event_type, CAST(d AS BIGINT) AS split_day,
           CAST(i AS BIGINT) AS n_left, CAST(n - i AS BIGINT) AS n_right,
           CAST(gain AS DOUBLE) AS gain
    FROM best WHERE rn = 1
    """,
)
def m_changepoint_single(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single change-point detection per event type — binary
    segmentation's FIRST split over the daily-count series: the split
    day maximizing the between-segment sum-of-squares gain
    (Σleft²/n_left + Σright²/n_right − Σtotal²/n, the variance-
    reduction form whose inputs are ALL exact integer prefix sums s1,
    s2, t1 — no float accumulates across rows, so both engines score
    every candidate identically before the round-6). The series is the
    bounded per-type daily matrix (~30 rows), so the candidate scan is
    a partitioned running-sum window + one argmax — never a corpus-
    scale window; day ships as the integer epoch-day (no date channel).
    Ties break to the earliest day. The CUSUM entry detects drift
    ONLINE; this is the offline retrospective cut a backfill pipeline
    uses to decide where a regime changed."""
    e = _t(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type",
        F.expr("unix_millis(ts) div 86400000").alias("d"),
    ).agg(F.count(F.lit(1)).alias("cnt"))
    w = (
        W.partitionBy("event_type")
        .orderBy("d")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    p = W.partitionBy("event_type")
    pre = daily.select(
        "event_type",
        "d",
        F.sum("cnt").over(w).alias("s1"),
        F.row_number().over(W.partitionBy("event_type").orderBy("d")).alias("i"),
        F.sum("cnt").over(p).alias("t1"),
        F.count(F.lit(1)).over(p).alias("n"),
    )
    gain = (
        "(CAST(s1 AS DOUBLE) * s1 / i"
        " + (CAST(t1 AS DOUBLE) - s1) * (CAST(t1 AS DOUBLE) - s1) / (n - i))"
        " - CAST(t1 AS DOUBLE) * t1 / n"
    )
    scored = pre.where(F.col("i") < F.col("n")).select(
        "event_type",
        "d",
        "i",
        "n",
        F.expr(f"round({gain}, 6)").alias("gain"),
    )
    wb = W.partitionBy("event_type").orderBy(F.desc("gain"), F.asc("d"))
    return (
        scored.withColumn("rn", F.row_number().over(wb))
        .where(F.col("rn") == 1)
        .select(
            "event_type",
            F.col("d").cast("bigint").alias("split_day"),
            F.col("i").cast("bigint").alias("n_left"),
            (F.col("n") - F.col("i")).cast("bigint").alias("n_right"),
            F.col("gain").cast("double").alias("gain"),
        )
    )


# CTE prefix shared by a_spearman_rho's two channel twins (per-user
# metrics + doubled tie-averaged ranks from per-value counts)
_SPEARMAN_CTES = """
    WITH u AS (
      SELECT user_id,
             CAST(count(*) AS BIGINT) AS x,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS y
      FROM events WHERE user_id IS NOT NULL AND value IS NOT NULL
      GROUP BY user_id
    ),
    rx AS (
      SELECT x, CAST(2 * (sum(cnt) OVER (ORDER BY x
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - cnt)
               + cnt + 1 AS BIGINT) AS r2
      FROM (SELECT x, CAST(count(*) AS BIGINT) AS cnt FROM u GROUP BY x)
    ),
    ry AS (
      SELECT y, CAST(2 * (sum(cnt) OVER (ORDER BY y
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - cnt)
               + cnt + 1 AS BIGINT) AS r2
      FROM (SELECT y, CAST(count(*) AS BIGINT) AS cnt FROM u GROUP BY y)
    )
"""

# the mirrored float formula — identical text on both engines and in
# both channel twins (decimal operands promote through the DOUBLE casts
# the same way bigints do)
_SPEARMAN_RHO_EXPR = """CAST(CASE WHEN ndx < 2 OR ndy < 2 THEN NULL
                ELSE round((CAST(n AS DOUBLE) * sxy
                            - CAST(s1x AS DOUBLE) * s1y)
                     / sqrt((CAST(n AS DOUBLE) * s2x
                             - CAST(s1x AS DOUBLE) * s1x)
                            * (CAST(n AS DOUBLE) * s2y
                               - CAST(s1y AS DOUBLE) * s1y)), 6)
                END AS DOUBLE)"""


def _spearman_g(spark: SparkSession, sf_dir: str, wide: bool) -> DataFrame:
    """The shared Spearman moments frame; wide=True runs every moment in
    the DECIMAL(38,0) channel via wide_int (Σ(2r)² ≤ 4n³ overflows
    bigint past ~1.3e6 users — the twin is exact to ~1e12)."""
    from surge_spark.operators.text import distributed_prefix_sum

    def w(x: str) -> str:
        return wide_int(x, wide=wide)

    e = _t(spark, sf_dir, "events").where(
        F.col("user_id").isNotNull() & F.col("value").isNotNull()
    )
    u = e.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("x"),
        F.sum(F.expr("CAST(round(value * 100) AS BIGINT)")).alias("y"),
    ).persist()

    def ranks(col: str) -> DataFrame:
        by_v = u.groupBy(col).agg(F.count(F.lit(1)).alias("cnt"))
        pre = distributed_prefix_sum(
            by_v, "cnt", col, [F.col(col)], out_col="cum"
        )
        return pre.select(
            col,
            F.expr("CAST(2 * (cum - cnt) + cnt + 1 AS BIGINT)").alias(
                f"r2{col}"
            ),
        )

    joined = u.join(ranks("x"), "x").join(ranks("y"), "y")
    return joined.groupBy().agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.expr(w("r2x"))).alias("s1x"),
        F.sum(F.expr(w("r2y"))).alias("s1y"),
        F.sum(F.expr(f"{w('r2x')} * r2x")).alias("s2x"),
        F.sum(F.expr(f"{w('r2y')} * r2y")).alias("s2y"),
        F.sum(F.expr(f"{w('r2x')} * r2y")).alias("sxy"),
        F.countDistinct("r2x").alias("ndx"),
        F.countDistinct("r2y").alias("ndy"),
    )


@query(
    "a_spearman_rho",
    oracle=f"""
    {_SPEARMAN_CTES},
    g AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(rx.r2) AS BIGINT) AS s1x,
             CAST(sum(ry.r2) AS BIGINT) AS s1y,
             CAST(sum(rx.r2 * rx.r2) AS BIGINT) AS s2x,
             CAST(sum(ry.r2 * ry.r2) AS BIGINT) AS s2y,
             CAST(sum(rx.r2 * ry.r2) AS BIGINT) AS sxy,
             CAST(count(DISTINCT rx.r2) AS BIGINT) AS ndx,
             CAST(count(DISTINCT ry.r2) AS BIGINT) AS ndy
      FROM u JOIN rx USING (x) JOIN ry USING (y)
    )
    SELECT n, s1x, s1y, sxy,
           {_SPEARMAN_RHO_EXPR} AS spearman_rho
    FROM g
    """,
)
def a_spearman_rho(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation between per-user activity (event count)
    and per-user spend (integer-cents sum) — the monotone-association
    sibling of a_corr_regression's Pearson (outlier-robust: a whale
    user bends Pearson, not ranks). NO row-level ranking: each metric's
    tie-averaged rank comes from per-VALUE counts + the exact
    distributed prefix sum (doubled: 2r(v) = 2·less + cnt + 1, the
    a_mann_whitney_u channel), users join back to their value's rank,
    and rho is Pearson over the doubled ranks (scale-invariance makes
    the doubling free) — so every moment (Σ2r, Σ(2r)², Σ2rx·2ry, n) is
    an EXACT bigint and the single float formula mirrors textually
    (round-6). Zero-variance guard both sides via the DISTINCT-rank
    counts (all users tied on a metric → NULL) — never via
    n·s2 − s1² in bigint, which is ~n⁴ and would overflow 25x below
    the channel bound. Overflow bound: Σ(2r)² ≤ 4n³ — bigint-safe to
    ~1.3e6 users; past that, a_spearman_rho_decimal (the wide_int
    channel twin, r14 — no longer just documented). The per-user frame
    is persisted: two rank passes (each running a quantile action) plus
    the final join are five lazy consumers of the events aggregate (the
    m_gini scan-amplification class)."""
    # zero-variance guard on the DISTINCT-rank counts, never on
    # n*s2x - s1x^2 in bigint: that product is ~n^4 and ANSI-overflows
    # at ~51k users, 25x below the channel's own n^3 bound (review
    # finding) — a metric with a single distinct value is exactly the
    # zero-variance case
    g = _spearman_g(spark, sf_dir, wide=False)
    return g.select(
        "n",
        "s1x",
        "s1y",
        "sxy",
        F.expr(_SPEARMAN_RHO_EXPR).alias("spearman_rho"),
    )


@query(
    "a_spearman_rho_decimal",
    oracle=f"""
    {_SPEARMAN_CTES},
    g AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             sum({wide_int('rx.r2', duck=True)}) AS s1x,
             sum({wide_int('ry.r2', duck=True)}) AS s1y,
             sum({wide_int('rx.r2', duck=True)} * rx.r2) AS s2x,
             sum({wide_int('ry.r2', duck=True)} * ry.r2) AS s2y,
             sum({wide_int('rx.r2', duck=True)} * ry.r2) AS sxy,
             CAST(count(DISTINCT rx.r2) AS BIGINT) AS ndx,
             CAST(count(DISTINCT ry.r2) AS BIGINT) AS ndy
      FROM u JOIN rx USING (x) JOIN ry USING (y)
    )
    SELECT n, {_SPEARMAN_RHO_EXPR} AS spearman_rho
    FROM g
    """,
)
def a_spearman_rho_decimal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """a_spearman_rho's wide-integer escape hatch (r14 VERDICT task 4,
    the a_basket_lift_decimal pattern via the shared wide_int helper):
    identical plan, but every rank moment (Σ2r, Σ(2r)², Σ2rx·2ry) runs
    in DECIMAL(38,0) / HUGEINT — exact past the bigint channel's ~1.3e6
    -user Σ(2r)² ≤ 4n³ bound, to ~1e12 users. Ships n + rho only (the
    wide moments themselves don't fit the BIGINT output contract at the
    scales that need this twin); rho is the SAME mirrored float formula,
    so bigint-vs-decimal equality at test scales is pinned in
    tests/test_analytics.py."""
    g = _spearman_g(spark, sf_dir, wide=True)
    return g.select("n", F.expr(_SPEARMAN_RHO_EXPR).alias("spearman_rho"))


@query(
    "g_harmonic_centrality_2hop",
    oracle=f"""
    WITH {_PART_COOCCUR_SQL},
    seeds AS (
      SELECT node FROM (
        SELECT node, row_number() OVER (ORDER BY k DESC, node) AS rk
        FROM deg
      ) WHERE rk <= 50
    ),
    sdir AS (
      SELECT d.x AS node, d.y FROM directed d JOIN seeds s ON s.node = d.x
    ),
    two0 AS (
      SELECT DISTINCT s1.node, s2.y AS w
      FROM sdir s1 JOIN directed s2 ON s2.x = s1.y
      WHERE s2.y <> s1.node
    ),
    two AS (
      SELECT t.node, CAST(count(*) AS BIGINT) AS n2
      FROM two0 t
      WHERE NOT EXISTS (SELECT 1 FROM sdir d2
                        WHERE d2.node = t.node AND d2.y = t.w)
      GROUP BY t.node
    ),
    scored AS (
      SELECT deg.node AS part, deg.k AS n1,
             CAST(coalesce(two.n2, 0) AS BIGINT) AS n2,
             CAST(deg.k + coalesce(two.n2, 0) / 2.0 AS DOUBLE) AS harmonic2
      FROM deg JOIN seeds s ON s.node = deg.node
      LEFT JOIN two ON two.node = deg.node
    )
    SELECT part, n1, n2, harmonic2,
           CAST(row_number() OVER (ORDER BY harmonic2 DESC, part) AS INT)
             AS rank
    FROM scored ORDER BY harmonic2 DESC, part LIMIT 20
    """,
)
def g_harmonic_centrality_2hop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-hop-truncated harmonic centrality H₂(v) = |N₁(v)| + |N₂(v)|/2
    for the 50 highest-degree hubs of the part co-occurrence graph —
    the reach-weighted influence rank (Boldi-Vigna cut at distance 2),
    SEED-RESTRICTED BY DESIGN: computing exact distance-2 sets for
    EVERY node of a dense graph (m/n≈120) is a ~n² distinct — measured
    93.8 s at sf0.1 before this rewrite vs 5.1 s seeded — so the entry
    answers the question actually asked of harmonic centrality ('rank
    my hubs by reach') the way g_bfs_layers answers seeded
    reachability. Seeds = top-50 by (degree DESC, node) — a
    deterministic in-plan pick; exact-distance-2 per seed = wedge
    endpoints minus self minus the seed's direct neighbors (anti-join).
    All channels integer; harmonic2 is an exact multiple of 0.5 so the
    (harmonic2 DESC, part) rank needs no rounding channel; top-20 is
    TakeOrdered. Rides the ONE checkpointed _part_cooccurrence kernel."""
    pairs, directed, deg = _part_cooccurrence(spark, sf_dir)
    wk = W.orderBy(F.desc("k"), F.asc("node"))
    seeds = (
        deg.withColumn("rk", F.row_number().over(wk))
        .where(F.col("rk") <= 50)
        .select("node")
    )
    sdir = directed.join(
        seeds, directed.x == seeds.node
    ).select("node", F.col("y").alias("mid"))
    s2 = directed.select(F.col("x").alias("mid"), F.col("y").alias("w"))
    two0 = (
        sdir.join(s2, "mid")
        .where(F.col("w") != F.col("node"))
        .select("node", "w")
        .distinct()
    )
    nbr = sdir.select("node", F.col("mid").alias("w"))
    two = (
        two0.join(nbr, ["node", "w"], "left_anti")
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("n2"))
    )
    scored = (
        deg.join(seeds, "node")
        .join(two, "node", "left")
        .select(
            F.col("node").alias("part"),
            F.col("k").alias("n1"),
            F.coalesce(F.col("n2"), F.lit(0)).cast("long").alias("n2"),
        )
        .withColumn(
            "harmonic2",
            (F.col("n1") + F.col("n2") / F.lit(2.0)).cast("double"),
        )
    )
    return (
        scored.orderBy(F.desc("harmonic2"), F.asc("part"))
        .limit(20)
        .withColumn(
            "rank",
            F.row_number().over(W.orderBy(F.desc("harmonic2"), F.asc("part"))),
        )
    )


@query(
    "g_edge_support_histogram",
    oracle=f"""
    WITH {_PART_COOCCUR_SQL},
    {_TRIS_SQL},
    corners AS (
      SELECT a AS pa, b AS pb FROM tris
      UNION ALL SELECT a, c FROM tris
      UNION ALL SELECT b, c FROM tris
    ),
    support AS (
      SELECT p.pa, p.pb, CAST(coalesce(s.cnt, 0) AS BIGINT) AS sup
      FROM pairs p
      LEFT JOIN (SELECT pa, pb, count(*) AS cnt FROM corners GROUP BY 1, 2) s
        ON s.pa = p.pa AND s.pb = p.pb
    )
    SELECT CAST(least(sup, 20) AS BIGINT) AS support_bucket,
           CAST(count(*) AS BIGINT) AS n_edges
    FROM support GROUP BY 1
    """,
)
def g_edge_support_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-edge triangle-support histogram (support = how many triangles
    contain the edge, capped at 20+) — the k-truss readiness audit: the
    k-truss keeps edges with support ≥ k−2, so this histogram is
    exactly the curve that says which k is non-trivial before paying an
    iterative peel, the same role the degree histogram plays for
    k-core. Support counts ride the SAME min-oriented triangle
    enumeration as g_local_bridges (each triangle once at a<b<c,
    explode to 3 corner edges, count per edge — the 38.9 s all-wedges
    lesson); zero-support edges enter the histogram via the LEFT join
    (they ARE the local bridges, cross-pinned in tests). Integer
    channels only; the 20+ cap bounds the output at any scale."""
    pairs, _, _ = _part_cooccurrence(spark, sf_dir)
    tris = _min_oriented_tris(pairs)
    corners = tris.select(
        F.explode(
            F.array(
                F.struct(F.col("a").alias("pa"), F.col("b").alias("pb")),
                F.struct(F.col("a").alias("pa"), F.col("c").alias("pb")),
                F.struct(F.col("b").alias("pa"), F.col("c").alias("pb")),
            )
        ).alias("e")
    ).select("e.pa", "e.pb")
    sup = corners.groupBy("pa", "pb").agg(F.count(F.lit(1)).alias("cnt"))
    support = pairs.join(sup, ["pa", "pb"], "left").select(
        F.coalesce(F.col("cnt"), F.lit(0)).alias("sup")
    )
    return (
        support.groupBy(
            F.expr("CAST(least(sup, 20) AS BIGINT)").alias("support_bucket")
        )
        .agg(F.count(F.lit(1)).alias("n_edges"))
    )


@query(
    "j_point_in_time_join",
    oracle="""
    WITH ordered AS (
      SELECT user_id, event_type, ts, event_id,
             lag(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
             ) AS prev
      FROM events
    ),
    changes AS (
      SELECT user_id, event_type, ts, event_id FROM ordered
      WHERE prev IS NULL OR prev <> event_type
    ),
    dim AS (
      SELECT user_id, event_type AS attr_value, ts AS valid_from,
             event_id AS version_event_id
      FROM changes
    ),
    ranked AS (
      SELECT p.event_id, p.user_id, d.attr_value,
             CAST(epoch_ms(p.ts) - epoch_ms(d.valid_from) AS BIGINT)
               AS feature_age_ms,
             row_number() OVER (
               PARTITION BY p.event_id
               ORDER BY d.valid_from DESC, d.version_event_id DESC
             ) AS rn
      FROM events p JOIN dim d
        ON d.user_id = p.user_id AND d.valid_from <= p.ts
      WHERE p.event_type = 'purchase'
    )
    SELECT event_id, user_id, attr_value, feature_age_ms
    FROM ranked WHERE rn = 1
    """,
)
def j_point_in_time_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time join — each purchase (the label row) joined to the
    dimension version VALID AT its own timestamp (the SCD2 intervals
    o_scd2_intervals builds, rebuilt here from the same change
    detection): the feature-store time-travel lookup that prevents
    label leakage — a training row must see the feature as it was THEN,
    never the current one (a plain dim join silently leaks the future).
    Expressed as the as-of kernel shape: valid_from <= ts range join +
    max_by on (valid_from, version_event_id) — equivalent to the
    interval containment since versions partition each user's timeline,
    but robust to overlaps and needing only the OPEN side of each
    interval. feature_age_ms (label ts − version birth) ships as exact
    integer millis — the staleness profile feature auditors track. At
    scale the range join pre-buckets on (user, time) exactly like
    j_asof_join."""
    e = _t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    dim = (
        e.withColumn("prev", F.lag("event_type").over(w))
        .where(F.col("prev").isNull() | (F.col("prev") != F.col("event_type")))
        .select(
            F.col("user_id").alias("d_user_id"),
            F.col("event_type").alias("attr_value"),
            F.col("ts").alias("valid_from"),
            F.col("event_id").alias("version_event_id"),
        )
    )
    purchases = e.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    joined = purchases.join(
        dim,
        (purchases.user_id == dim.d_user_id)
        & (dim.valid_from <= purchases.ts),
    )
    return (
        joined.groupBy("event_id")
        .agg(
            F.first("user_id").alias("user_id"),
            F.max_by(
                F.struct("attr_value", "valid_from"),
                F.struct("valid_from", "version_event_id"),
            ).alias("best"),
            F.max(F.col("ts")).alias("p_ts"),
        )
        .select(
            "event_id",
            "user_id",
            F.col("best.attr_value").alias("attr_value"),
            F.expr(
                "CAST(unix_millis(p_ts) - unix_millis(best.valid_from)"
                " AS BIGINT)"
            ).alias("feature_age_ms"),
        )
    )


# CTE prefix shared by a_gini_by_group's two channel twins
_GINI_GROUP_CTES = """
    WITH o AS (
      SELECT n.n_name,
             CAST(round(o.o_totalprice * 100) AS BIGINT) AS cents
      FROM orders o
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n ON n.n_nationkey = c.c_nationkey
    ),
    ranked AS (
      SELECT n_name, cents,
             CAST(row_number() OVER (
               PARTITION BY n_name ORDER BY cents
             ) AS BIGINT) AS i
      FROM o
    )
"""


@query(
    "a_gini_by_group",
    oracle=f"""
    {_GINI_GROUP_CTES},
    g AS (
      SELECT n_name, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(cents) AS BIGINT) AS s_x,
             CAST(sum(i * cents) AS BIGINT) AS s_ix
      FROM ranked GROUP BY n_name
    )
    SELECT n_name, n, s_x, s_ix,
           CAST(CASE WHEN n < 2 OR s_x = 0 THEN NULL
                ELSE round(2.0 * s_ix / (CAST(n AS DOUBLE) * s_x)
                     - (CAST(n AS DOUBLE) + 1) / n, 6)
                END AS DOUBLE) AS gini
    FROM g
    """,
)
def a_gini_by_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation Gini coefficient of order values — revenue inequality
    WITHIN each market, the grouped sibling of m_gini_coefficient's
    corpus-wide number (a flat global Gini can hide one winner-take-all
    market): the exact rank formula G = 2·Σ(i·xᵢ)/(n·Σx) − (n+1)/n over
    ascending integer cents, where the rank window is PARTITIONED by
    nation — parallel at any scale, no global window and no prefix-sum
    machinery needed (the partition IS the bound). Ties in cents
    commute in Σi·xᵢ, so row_number's arbitrary tie order cannot change
    G — the channel is still exact. Integer channels shipped (n, Σx,
    Σi·x); the single float formula mirrors textually (round-6), with
    n<2 / zero-mass guards both sides. Overflow bound: Σi·cents ~
    n²·avg_cents/2 — bigint-safe to ~3e6 orders per group at this
    data's price scale; past that, a_gini_by_group_decimal (the
    wide_int channel twin, r14 — no longer just documented)."""
    g = _gini_by_group_g(spark, sf_dir, wide=False)
    return g.select(
        "n_name",
        "n",
        "s_x",
        "s_ix",
        F.expr(
            "CAST(CASE WHEN n < 2 OR s_x = 0 THEN NULL"
            " ELSE round(2.0 * s_ix / (CAST(n AS DOUBLE) * s_x)"
            " - (CAST(n AS DOUBLE) + 1) / n, 6) END AS DOUBLE)"
        ).alias("gini"),
    )


def _gini_by_group_g(spark: SparkSession, sf_dir: str, wide: bool) -> DataFrame:
    """The shared per-nation Gini moments frame; wide=True runs the rank
    channel Σi·cents in DECIMAL(38,0) via wide_int (bigint-safe only to
    ~3e6 orders/group)."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    joined = o.join(
        # no hint on customer (grows with SF — the r13 review's hint
        # class; the planner auto-broadcasts at test scale); nation's
        # 25 rows keep theirs
        c.select("c_custkey", "c_nationkey"),
        o.o_custkey == F.col("c_custkey"),
    ).join(
        F.broadcast(n.select("n_nationkey", "n_name")),
        F.col("c_nationkey") == F.col("n_nationkey"),
    ).select(
        "n_name",
        F.expr("CAST(round(o_totalprice * 100) AS BIGINT)").alias("cents"),
    )
    w = W.partitionBy("n_name").orderBy("cents")
    ranked = joined.select(
        "n_name", "cents", F.row_number().over(w).cast("bigint").alias("i")
    )
    wi = wide_int("i", wide=wide)
    return ranked.groupBy("n_name").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("cents").alias("s_x"),
        F.sum(F.expr(f"{wi} * cents")).alias("s_ix"),
    )


@query(
    "a_gini_by_group_decimal",
    oracle=f"""
    {_GINI_GROUP_CTES},
    g AS (
      SELECT n_name, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(cents) AS BIGINT) AS s_x,
             sum({wide_int('i', duck=True)} * cents) AS s_ix
      FROM ranked GROUP BY n_name
    )
    SELECT n_name, n, s_x,
           CAST(CASE WHEN n < 2 OR s_x = 0 THEN NULL
                ELSE round(2.0 * CAST(s_ix AS DOUBLE)
                           / (CAST(n AS DOUBLE) * s_x)
                     - (CAST(n AS DOUBLE) + 1) / n, 6)
                END AS DOUBLE) AS gini
    FROM g
    """,
)
def a_gini_by_group_decimal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """a_gini_by_group's wide-integer escape hatch (r14 VERDICT task 4,
    the a_basket_lift_decimal pattern via the shared wide_int helper):
    identical plan, but the rank channel Σi·cents runs in DECIMAL(38,0)
    / HUGEINT — exact past the bigint twin's ~3e6-orders-per-group
    bound. Ships n_name, n, s_x, gini (the wide Σi·x doesn't fit the
    BIGINT output contract at the scales that need this twin); the gini
    formula routes the wide sum through CAST(AS DOUBLE) explicitly —
    2.0 · toDouble(s_ix) equals toDouble(2.0 · s_ix) exactly (×2 is an
    exponent bump), so bigint-vs-decimal equality holds and is pinned
    in tests/test_analytics.py."""
    g = _gini_by_group_g(spark, sf_dir, wide=True)
    return g.select(
        "n_name",
        "n",
        "s_x",
        F.expr(
            "CAST(CASE WHEN n < 2 OR s_x = 0 THEN NULL"
            " ELSE round(2.0 * CAST(s_ix AS DOUBLE)"
            " / (CAST(n AS DOUBLE) * s_x)"
            " - (CAST(n AS DOUBLE) + 1) / n, 6) END AS DOUBLE)"
        ).alias("gini"),
    )


@query(
    "w_range_frame_sum",
    oracle="""
    WITH o AS (
      SELECT o_custkey, epoch_ms(o_orderdate) // 86400000 AS d,
             CAST(round(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders
    )
    SELECT o_custkey, CAST(d AS BIGINT) AS day, cents,
           CAST(count(*) OVER w AS BIGINT) AS n_orders_30d,
           CAST(sum(cents) OVER w AS BIGINT) AS cents_30d
    FROM o
    WINDOW w AS (
      PARTITION BY o_custkey ORDER BY d
      RANGE BETWEEN 29 PRECEDING AND CURRENT ROW
    )
    """,
)
def w_range_frame_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VALUE-range window frames — RANGE BETWEEN 29 PRECEDING over
    integer epoch-days: the trailing-30-day spend/count per order, the
    one window-frame surface the w_* family didn't cover (every other
    frame entry is ROWS-based; RANGE frames bound by the ORDER VALUE,
    so gaps in activity shrink the frame and same-day orders share one
    frame — semantics ROWS cannot express). Day as integer epoch-day
    (no date channel, the m_gap_fill rule; also what makes the range
    arithmetic engine-portable). Partitioned per customer — parallel
    at any scale; all-integer channels. Same-day tie rows share
    identical frames on both engines BY CONSTRUCTION of RANGE
    semantics, so no tiebreak channel is needed."""
    o = _t(spark, sf_dir, "orders").select(
        "o_custkey",
        F.expr("unix_millis(CAST(o_orderdate AS TIMESTAMP)) div 86400000")
        .alias("d"),
        F.expr("CAST(round(o_totalprice * 100) AS BIGINT)").alias("cents"),
    )
    wf = (
        W.partitionBy("o_custkey")
        .orderBy("d")
        .rangeBetween(-29, 0)
    )
    return o.select(
        "o_custkey",
        F.col("d").cast("long").alias("day"),
        "cents",
        F.count(F.lit(1)).over(wf).cast("long").alias("n_orders_30d"),
        F.sum("cents").over(wf).cast("long").alias("cents_30d"),
    )


# Theil per-row terms (textually mirrored; every input an exact integer)
_THEIL_TOT = "CAST(cents AS DOUBLE) / tx * ln(CAST(cents AS DOUBLE) * n / tx)"
_THEIL_WIT = (
    "CAST(cents AS DOUBLE) / tx * ln(CAST(cents AS DOUBLE) * ng / txg)"
)
_THEIL_BET = (
    "CAST(txg AS DOUBLE) / tx * ln(CAST(txg AS DOUBLE) / tx"
    " * (CAST(n AS DOUBLE) / ng))"
)


@query(
    "a_theil_decomposition",
    oracle=f"""
    WITH r AS (
      SELECT n.n_name, o.o_custkey,
             CAST(sum(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS cents
      FROM orders o
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n ON n.n_nationkey = c.c_nationkey
      GROUP BY 1, 2
      HAVING sum(CAST(round(o.o_totalprice * 100) AS BIGINT)) > 0
    ),
    g AS (
      SELECT n_name, CAST(count(*) AS BIGINT) AS ng,
             CAST(sum(cents) AS BIGINT) AS txg
      FROM r GROUP BY 1
    ),
    t AS (SELECT CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(cents) AS BIGINT) AS tx FROM r),
    rows_ AS (
      SELECT r.cents, g.ng, g.txg, t.n, t.tx
      FROM r JOIN g USING (n_name) CROSS JOIN t
    ),
    sums AS (
      SELECT CAST(max(n) AS BIGINT) AS n,
             CAST(max(tx) AS BIGINT) AS total_cents,
             CAST(round(sum({_THEIL_TOT}), 4) AS DOUBLE) AS theil_total,
             CAST(round(sum({_THEIL_WIT}), 4) AS DOUBLE) AS theil_within
      FROM rows_
    ),
    bet AS (
      SELECT CAST(round(sum({_THEIL_BET}), 4) AS DOUBLE) AS theil_between
      FROM g CROSS JOIN t
    )
    SELECT sums.n, sums.total_cents, sums.theil_total,
           bet.theil_between, sums.theil_within
    FROM sums CROSS JOIN bet
    """,
)
def a_theil_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-T inequality of customer revenue, DECOMPOSED into
    between-nation and within-nation parts — the property that makes
    Theil the inequality measure analysts reach for past Gini/HHI
    (neither decomposes additively; T_total = T_between + T_within
    exactly, so a drift monitor can say WHERE inequality moved).
    T = Σᵢ (xᵢ/X)·ln(xᵢ·n/X); within uses each nation's (N_g, X_g);
    between runs over the |nations| group frame. Every ln argument is a
    quotient of exact integers rendered identically on both engines;
    the per-customer float sums round to 4 (the m_winsorized_mean
    float-sum-order lesson). Zero-revenue customers are excluded BOTH
    sides (Theil needs x>0 — 0·ln0 is NaN in float); additivity is
    pinned in tests with float tolerance, not in the oracle. One
    corpus shuffle (per-customer aggregate); group/global frames
    broadcast back."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    nn = _t(spark, sf_dir, "nation")
    r = (
        o.join(c.select("c_custkey", "c_nationkey"),
               o.o_custkey == F.col("c_custkey"))
        .join(
            F.broadcast(nn.select("n_nationkey", "n_name")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .groupBy("n_name", "o_custkey")
        .agg(
            F.sum(F.expr("CAST(round(o_totalprice * 100) AS BIGINT)")).alias(
                "cents"
            )
        )
        .where(F.col("cents") > 0)
        .localCheckpoint(eager=False)  # g / t / rows_ all consume
    )
    g = r.groupBy("n_name").agg(
        F.count(F.lit(1)).alias("ng"), F.sum("cents").alias("txg")
    )
    t = r.groupBy().agg(
        F.count(F.lit(1)).alias("n"), F.sum("cents").alias("tx")
    )
    rows_ = r.join(F.broadcast(g), "n_name").crossJoin(F.broadcast(t))
    sums = rows_.groupBy().agg(
        F.max("n").cast("long").alias("n"),
        F.max("tx").cast("long").alias("total_cents"),
        F.expr(f"CAST(round(sum({_THEIL_TOT}), 4) AS DOUBLE)").alias(
            "theil_total"
        ),
        F.expr(f"CAST(round(sum({_THEIL_WIT}), 4) AS DOUBLE)").alias(
            "theil_within"
        ),
    )
    bet = g.crossJoin(F.broadcast(t)).groupBy().agg(
        F.expr(f"CAST(round(sum({_THEIL_BET}), 4) AS DOUBLE)").alias(
            "theil_between"
        )
    )
    return sums.crossJoin(F.broadcast(bet)).select(
        "n", "total_cents", "theil_total", "theil_between", "theil_within"
    )


@query(
    "a_capture_recapture",
    oracle="""
    WITH ev AS (
      SELECT user_id, epoch_ms(ts) // 86400000 AS d FROM events
      WHERE user_id IS NOT NULL
    ),
    bounds AS (
      SELECT min(d) AS d0, max(d) AS d1 FROM ev
    ),
    marks AS (
      SELECT DISTINCT ev.user_id,
             ev.d <= (b.d0 + (b.d1 - b.d0) // 2) AS first_half
      FROM ev CROSS JOIN bounds b
    ),
    caps AS (
      SELECT user_id,
             CAST(max(CASE WHEN first_half THEN 1 ELSE 0 END) AS BIGINT)
               AS in_a,
             CAST(max(CASE WHEN first_half THEN 0 ELSE 1 END) AS BIGINT)
               AS in_b
      FROM marks GROUP BY user_id
    )
    SELECT CAST(sum(in_a) AS BIGINT) AS n_first,
           CAST(sum(in_b) AS BIGINT) AS n_second,
           CAST(sum(in_a * in_b) AS BIGINT) AS n_both,
           CAST(count(*) AS BIGINT) AS n_observed,
           CAST((sum(in_a) + 1) * (sum(in_b) + 1) // (sum(in_a * in_b) + 1)
                - 1 AS BIGINT) AS chapman_estimate,
           CAST(CASE WHEN sum(in_a * in_b) = 0 THEN NULL
                ELSE round(CAST(sum(in_a) AS DOUBLE) * sum(in_b)
                     / sum(in_a * in_b), 4) END AS DOUBLE)
             AS lincoln_petersen
    FROM caps
    """,
)
def a_capture_recapture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Capture-recapture population estimation: treat the first and
    second halves of the observation window as two independent
    'captures' of the user population and estimate the TRUE population
    from the overlap — the coverage estimator a data platform runs to
    answer 'how many users exist that we have NOT yet observed?' (the
    same estimator dedup pipelines use to estimate residual duplicates
    from two independent detector passes). Ships BOTH classical forms:
    the bias-corrected Chapman estimator
    N̂ = (n₁+1)(n₂+1)//(m+1) − 1 (exact integer floor-div, defined even
    at zero overlap) and the raw Lincoln-Petersen N̂ = n₁·n₂/m (round-4
    float; NULL at m=0). The halves split at the integer midpoint of
    the epoch-day span (exact integer arithmetic — `(d1-d0)/2` is
    DuckDB `//` on bigints mirrored by Spark `div`); capture flags are
    0/1 indicators, every count exact. One distinct shuffle; everything
    after is one conditional aggregate."""
    e = _t(spark, sf_dir, "events").where(F.col("user_id").isNotNull())
    ev = e.select(
        "user_id", F.expr("unix_millis(ts) div 86400000").alias("d")
    )
    b = ev.groupBy().agg(F.min("d").alias("d0"), F.max("d").alias("d1"))
    marks = (
        ev.crossJoin(F.broadcast(b))
        .select(
            "user_id",
            F.expr("d <= (d0 + (d1 - d0) div 2)").alias("first_half"),
        )
        .distinct()
    )
    caps = marks.groupBy("user_id").agg(
        F.max(F.when(F.col("first_half"), 1).otherwise(0)).cast("long").alias(
            "in_a"
        ),
        F.max(F.when(F.col("first_half"), 0).otherwise(1)).cast("long").alias(
            "in_b"
        ),
    )
    return caps.groupBy().agg(
        F.sum("in_a").alias("n_first"),
        F.sum("in_b").alias("n_second"),
        F.sum(F.expr("in_a * in_b")).alias("n_both"),
        F.count(F.lit(1)).alias("n_observed"),
        F.expr(
            "CAST((sum(in_a) + 1) * (sum(in_b) + 1) div (sum(in_a * in_b) + 1)"
            " - 1 AS BIGINT)"
        ).alias("chapman_estimate"),
        F.expr(
            "CAST(CASE WHEN sum(in_a * in_b) = 0 THEN NULL"
            " ELSE round(CAST(sum(in_a) AS DOUBLE) * sum(in_b)"
            " / sum(in_a * in_b), 4) END AS DOUBLE)"
        ).alias("lincoln_petersen"),
    )


# Shared equity/running-peak drawdown kernel (w_max_drawdown +
# w_ulcer_index — one CTE text and one builder so the two risk entries
# cannot drift): daily purchase cents -> running equity -> running peak,
# all EXACT integers over the calendar-bounded daily series.
_EQUITY_DD_SQL = """daily AS (
      SELECT epoch_ms(ts) // 86400000 AS d,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
      FROM events WHERE event_type = 'purchase' AND value IS NOT NULL
      GROUP BY 1
    ),
    cum AS (
      SELECT d,
             CAST(sum(cents) OVER (ORDER BY d
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS equity
      FROM daily
    ),
    dd AS (
      SELECT d, equity,
             CAST(max(equity) OVER (ORDER BY d
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS peak
      FROM cum
    )"""


def _equity_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(d, equity, peak) frame mirroring _EQUITY_DD_SQL — the daily
    cumulative-revenue curve with its running maximum. The window is over
    the calendar-bounded daily series (row count = day count, the
    m_daily_backlog class), so the unpartitioned frame is safe at any SF."""
    e = _t(spark, sf_dir, "events").where(
        (F.col("event_type") == "purchase") & F.col("value").isNotNull()
    )
    daily = e.groupBy(
        F.expr("unix_millis(ts) div 86400000").alias("d")
    ).agg(
        F.sum(F.expr("CAST(round(value * 100) AS BIGINT)")).alias("cents")
    )
    wf = W.orderBy("d").rowsBetween(W.unboundedPreceding, 0)
    return daily.select(
        "d", F.sum("cents").over(wf).alias("equity")
    ).withColumn("peak", F.expr("max(equity)").over(wf))


@query(
    "w_max_drawdown",
    oracle=f"""
    WITH {_EQUITY_DD_SQL}
    SELECT CAST(count(*) AS BIGINT) AS n_days,
           CAST(max(peak - equity) AS BIGINT) AS max_drawdown_cents,
           CAST(CASE WHEN max(peak) = 0 THEN NULL
                ELSE round(max(CAST(peak - equity AS DOUBLE) / peak), 6) END
                AS DOUBLE) AS max_drawdown_frac
    FROM dd WHERE peak > 0
    """,
)
def w_max_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximum drawdown of the cumulative daily purchase-revenue curve —
    the running-peak-to-trough statistic (finance's risk number; in a
    data platform it is the 'largest sustained dip' monitor for any
    cumulative KPI): equity = running Σcents, peak = running max,
    drawdown = peak − equity, all EXACT integers over the
    calendar-bounded daily series (the m_daily_backlog window class);
    the fractional form divides per-row before the max (mirrored,
    round-6, peak=0 rows excluded both sides — with non-negative
    revenue the equity curve never dips below a positive peak to zero,
    so the filter only trims a leading zero-revenue prefix). NOTE
    max((peak-equity)/peak) ≠ max(peak-equity)/max(peak) — the
    fractional and absolute maxima can sit on different days; both
    ship. Equity/peak kernel shared with w_ulcer_index
    (_equity_drawdown / _EQUITY_DD_SQL)."""
    dd = _equity_drawdown(spark, sf_dir)
    return (
        dd.where(F.col("peak") > 0)
        .groupBy()
        .agg(
            F.count(F.lit(1)).alias("n_days"),
            F.max(F.expr("peak - equity")).cast("long").alias(
                "max_drawdown_cents"
            ),
            F.expr(
                "CAST(CASE WHEN max(peak) = 0 THEN NULL"
                " ELSE round(max(CAST(peak - equity AS DOUBLE) / peak), 6)"
                " END AS DOUBLE)"
            ).alias("max_drawdown_frac"),
        )
    )


@query(
    "w_ulcer_index",
    oracle=f"""
    WITH {_EQUITY_DD_SQL},
    bp AS (
      SELECT d, CAST((peak - equity) * 10000 // peak AS BIGINT) AS dd_bp
      FROM dd WHERE peak > 0
    )
    SELECT CAST(count(*) AS BIGINT) AS n_days,
           CAST(max(dd_bp) AS BIGINT) AS max_dd_bp,
           CAST(sum(dd_bp * dd_bp) AS BIGINT) AS sum_sq_bp,
           CAST(round(sqrt(CAST(sum(dd_bp * dd_bp) AS DOUBLE) / count(*)),
                6) AS DOUBLE) AS ulcer_bp
    FROM bp
    """,
)
def w_ulcer_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ulcer index of the cumulative daily purchase-revenue curve — the
    root-mean-square drawdown (Martin's 'pain index': unlike
    w_max_drawdown's single worst dip, it charges for DEPTH × DURATION
    of every underwater stretch, which is the risk number a retention
    or revenue KPI actually needs). Rides the SAME _equity_drawdown /
    _EQUITY_DD_SQL kernel as w_max_drawdown. The per-day drawdown is
    kept integral as basis points: dd_bp = (peak−equity)·10000 div peak
    (positive operands, so Spark's truncating `div` ≡ DuckDB's flooring
    `//` — the t_readability_flesch rule), dd_bp ≤ 10000 so
    Σdd_bp² ≤ 1e8 · days is bigint-trivial on the calendar-bounded
    daily frame, and ONE mirrored sqrt(mean) at the end (round-6) is
    the only float op — order-free both sides because the sum is an
    exact integer."""
    dd = _equity_drawdown(spark, sf_dir)
    bp = dd.where(F.col("peak") > 0).select(
        F.expr("CAST((peak - equity) * 10000 div peak AS BIGINT)").alias(
            "dd_bp"
        )
    )
    return bp.groupBy().agg(
        F.count(F.lit(1)).alias("n_days"),
        F.max("dd_bp").alias("max_dd_bp"),
        F.sum(F.expr("dd_bp * dd_bp")).alias("sum_sq_bp"),
        F.expr(
            "CAST(round(sqrt(CAST(sum(dd_bp * dd_bp) AS DOUBLE)"
            " / count(1)), 6) AS DOUBLE)"
        ).alias("ulcer_bp"),
    )


@query(
    "a_hhi_concentration",
    oracle=f"""
    WITH r AS (
      SELECT n.n_name, o.o_custkey,
             CAST(sum(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS cents
      FROM orders o
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n ON n.n_nationkey = c.c_nationkey
      GROUP BY 1, 2
    ),
    g AS (
      SELECT n_name, CAST(count(*) AS BIGINT) AS n_customers,
             CAST(sum(cents) AS BIGINT) AS total_cents,
             sum({wide_int('cents', duck=True)} * cents) AS s2
      FROM r GROUP BY 1
    )
    SELECT n_name, n_customers, total_cents,
           CAST(CASE WHEN total_cents = 0 THEN NULL
                ELSE round(CAST(s2 AS DOUBLE)
                     / (CAST(total_cents AS DOUBLE) * total_cents), 6)
                END AS DOUBLE) AS hhi
    FROM g
    """,
)
def a_hhi_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Herfindahl-Hirschman concentration of customer revenue WITHIN each
    nation market — HHI = Σ shareᵢ² = Σ centsᵢ² / (Σcents)², the
    antitrust/marketplace-health number beside a_gini_by_group's
    inequality curve (HHI weights the HEAD: one dominant buyer moves it
    where Gini barely notices). Integer channels: per-customer
    lifetime cents, Σcents, and Σcents² — the square runs in the
    wide_int channel FROM THE START (cents ~1e8 per whale customer →
    cents² ~1e16 × 1e5 customers clears bigint well inside realistic
    scale, so there is no bigint twin to outgrow); ONE mirrored float
    quotient, round-6, zero-mass guard both sides. Plan: per-(nation,
    customer) aggregate (the one corpus shuffle) then a |nations|-row
    rollup."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = (
        o.join(c.select("c_custkey", "c_nationkey"),
               o.o_custkey == F.col("c_custkey"))
        .join(
            F.broadcast(n.select("n_nationkey", "n_name")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .groupBy("n_name", "o_custkey")
        .agg(
            F.sum(F.expr("CAST(round(o_totalprice * 100) AS BIGINT)")).alias(
                "cents"
            )
        )
    )
    g = r.groupBy("n_name").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.sum("cents").alias("total_cents"),
        F.sum(F.expr(f"{wide_int('cents')} * cents")).alias("s2"),
    )
    return g.select(
        "n_name",
        "n_customers",
        "total_cents",
        F.expr(
            "CAST(CASE WHEN total_cents = 0 THEN NULL"
            " ELSE round(CAST(s2 AS DOUBLE)"
            " / (CAST(total_cents AS DOUBLE) * total_cents), 6)"
            " END AS DOUBLE)"
        ).alias("hhi"),
    )


@query(
    "w_rolling_correlation",
    oracle="""
    WITH daily AS (
      SELECT epoch_ms(ts) // 86400000 AS d,
             CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
                  AS BIGINT) AS x,
             CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                  AS BIGINT) AS y
      FROM events GROUP BY 1
    ),
    rolled AS (
      SELECT d,
             CAST(count(*) OVER w AS BIGINT) AS n,
             CAST(sum(x) OVER w AS BIGINT) AS sx,
             CAST(sum(y) OVER w AS BIGINT) AS sy,
             CAST(sum(x * y) OVER w AS BIGINT) AS sxy,
             CAST(sum(x * x) OVER w AS BIGINT) AS sxx,
             CAST(sum(y * y) OVER w AS BIGINT) AS syy
      FROM daily
      WINDOW w AS (ORDER BY d ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
    )
    SELECT CAST(d AS BIGINT) AS day, n,
           CAST(CASE WHEN n < 2
                  OR (n * sxx - sx * sx) = 0 OR (n * syy - sy * sy) = 0
                THEN NULL
                ELSE round((CAST(n AS DOUBLE) * sxy
                            - CAST(sx AS DOUBLE) * sy)
                     / sqrt((CAST(n AS DOUBLE) * sxx
                             - CAST(sx AS DOUBLE) * sx)
                            * (CAST(n AS DOUBLE) * syy
                               - CAST(sy AS DOUBLE) * sy)), 6)
                END AS DOUBLE) AS rolling_corr
    FROM rolled
    """,
)
def w_rolling_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-day Pearson correlation between the daily view and
    purchase series — the co-movement monitor ('did purchases stop
    tracking traffic this week?') that a static a_corr_regression can't
    express: correlation as a WINDOWED statistic, every frame moment
    (n, Σx, Σy, Σxy, Σx², Σy²) an exact integer so both engines derive
    each day's r from identical bigints via one mirrored float formula
    (round-6), with zero-variance frames NULL on both sides. The window
    is ordered over the CALENDAR-BOUNDED daily series — its row count
    is the number of days, which cannot grow with data volume (the
    m_autocorr_daily class), so the single-series frame is scale-safe
    by construction; the corpus-scale work is one conditional daily
    aggregate. Day ships as integer epoch-day (no date channel).
    Overflow: frame sums of 7 day-counts squared — bigint-safe to ~1e9
    events/day."""
    e = _t(spark, sf_dir, "events")
    daily = e.groupBy(
        F.expr("unix_millis(ts) div 86400000").alias("d")
    ).agg(
        F.sum(F.when(F.col("event_type") == "view", 1).otherwise(0)).alias("x"),
        F.sum(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("y"),
    )
    w = W.orderBy("d").rowsBetween(-6, 0)
    rolled = daily.select(
        "d",
        F.count(F.lit(1)).over(w).alias("n"),
        F.sum("x").over(w).alias("sx"),
        F.sum("y").over(w).alias("sy"),
        F.sum(F.expr("x * y")).over(w).alias("sxy"),
        F.sum(F.expr("x * x")).over(w).alias("sxx"),
        F.sum(F.expr("y * y")).over(w).alias("syy"),
    )
    return rolled.select(
        F.col("d").cast("bigint").alias("day"),
        "n",
        F.expr(
            "CAST(CASE WHEN n < 2"
            " OR (n * sxx - sx * sx) = 0 OR (n * syy - sy * sy) = 0 THEN NULL"
            " ELSE round((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)"
            " / sqrt((CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)"
            " * (CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy)), 6)"
            " END AS DOUBLE)"
        ).alias("rolling_corr"),
    )


@query(
    "a_kendall_tau_daily",
    oracle="""
    WITH daily AS (
      SELECT epoch_ms(ts) // 86400000 AS d,
             CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
                  AS BIGINT) AS x,
             CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                  AS BIGINT) AS y
      FROM events GROUP BY 1
    ),
    pairs AS (
      SELECT CASE WHEN sign(a.x - b.x) * sign(a.y - b.y) > 0
                  THEN 1 ELSE 0 END AS conc,
             CASE WHEN sign(a.x - b.x) * sign(a.y - b.y) < 0
                  THEN 1 ELSE 0 END AS disc,
             CASE WHEN a.x = b.x THEN 1 ELSE 0 END AS tx,
             CASE WHEN a.y = b.y THEN 1 ELSE 0 END AS ty
      FROM daily a JOIN daily b ON a.d < b.d
    ),
    agg AS (
      SELECT CAST(count(*) AS BIGINT) AS n0,
             CAST(sum(conc) AS BIGINT) AS concordant,
             CAST(sum(disc) AS BIGINT) AS discordant,
             CAST(sum(tx) AS BIGINT) AS ties_x,
             CAST(sum(ty) AS BIGINT) AS ties_y
      FROM pairs
    ),
    nd AS (SELECT CAST(count(*) AS BIGINT) AS n_days FROM daily)
    SELECT n_days, n0, concordant, discordant, ties_x, ties_y,
           CAST(CASE WHEN (n0 - ties_x) = 0 OR (n0 - ties_y) = 0 THEN NULL
                ELSE round((CAST(concordant AS DOUBLE) - discordant)
                     / sqrt(CAST(n0 - ties_x AS DOUBLE)
                            * CAST(n0 - ties_y AS DOUBLE)), 6)
                END AS DOUBLE) AS tau_b
    FROM agg, nd
    """,
)
def a_kendall_tau_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kendall's tau-b between the daily view and purchase series — the
    RANK-correlation companion to w_rolling_correlation's Pearson (tau
    is what a monitoring pipeline wants when the co-movement is
    monotone but not linear, and it is exact on ties): every pair of
    days is classified concordant / discordant / tied via
    sign(Δx)·sign(Δy) — signs are −1/0/1, so NO data-scaled product
    ever forms (the wide-int audit class is avoided by construction,
    not by a documented bound) — and tau_b =
    (C−D)/√((n0−tx)(n0−ty)) is one mirrored float formula over exact
    integers (round-6; all-tied axes → NULL both sides). The pair
    theta-join is over the CALENDAR-BOUNDED daily frame (n0 = C(days,2)
    — row count cannot grow with data volume, the m_autocorr_daily
    class), so the quadratic stays bounded by the calendar; the
    corpus-scale work is one conditional daily aggregate."""
    e = _t(spark, sf_dir, "events")
    daily = e.groupBy(
        F.expr("unix_millis(ts) div 86400000").alias("d")
    ).agg(
        F.sum(F.when(F.col("event_type") == "view", 1).otherwise(0)).alias(
            "x"
        ),
        F.sum(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("y"),
    )
    a, b = daily.alias("a"), daily.alias("b")
    pairs = a.join(b, F.col("a.d") < F.col("b.d")).select(
        F.expr(
            "CASE WHEN sign(a.x - b.x) * sign(a.y - b.y) > 0"
            " THEN 1 ELSE 0 END"
        ).alias("conc"),
        F.expr(
            "CASE WHEN sign(a.x - b.x) * sign(a.y - b.y) < 0"
            " THEN 1 ELSE 0 END"
        ).alias("disc"),
        F.expr("CASE WHEN a.x = b.x THEN 1 ELSE 0 END").alias("tx"),
        F.expr("CASE WHEN a.y = b.y THEN 1 ELSE 0 END").alias("ty"),
    )
    agg = pairs.groupBy().agg(
        F.count(F.lit(1)).alias("n0"),
        F.sum("conc").alias("concordant"),
        F.sum("disc").alias("discordant"),
        F.sum("tx").alias("ties_x"),
        F.sum("ty").alias("ties_y"),
    )
    nd = daily.groupBy().agg(F.count(F.lit(1)).alias("n_days"))
    return agg.crossJoin(F.broadcast(nd)).select(
        "n_days",
        "n0",
        "concordant",
        "discordant",
        "ties_x",
        "ties_y",
        F.expr(
            "CAST(CASE WHEN (n0 - ties_x) = 0 OR (n0 - ties_y) = 0 THEN NULL"
            " ELSE round((CAST(concordant AS DOUBLE) - discordant)"
            " / sqrt(CAST(n0 - ties_x AS DOUBLE)"
            " * CAST(n0 - ties_y AS DOUBLE)), 6) END AS DOUBLE)"
        ).alias("tau_b"),
    )


@query(
    "a_subsample_ci",
    oracle="""
    WITH ev AS (
      SELECT CAST(round(value * 100) AS BIGINT) AS cents,
             CAST(('0x' || substring(md5(CAST(event_id AS VARCHAR)), 1, 8))
                  AS BIGINT) AS h
      FROM events WHERE event_type = 'purchase' AND value IS NOT NULL
    ),
    reps AS (
      SELECT b.b AS b,
             CAST(sum(cents) AS BIGINT) AS s,
             CAST(count(*) AS BIGINT) AS c
      FROM ev, LATERAL (SELECT unnest(range(0, 32)) AS b) b
      WHERE (h >> b.b) & 1 = 1
      GROUP BY 1
    ),
    means AS (
      SELECT round(CAST(s AS DOUBLE) / c, 4) AS m,
             row_number() OVER (ORDER BY round(CAST(s AS DOUBLE) / c, 4))
               AS rk,
             count(*) OVER () AS nr
      FROM reps
    ),
    full_m AS (
      SELECT CAST(count(*) AS BIGINT) AS n_events,
             CAST(round(CAST(sum(cents) AS DOUBLE) / count(*), 4) AS DOUBLE)
               AS mean_cents
      FROM ev
    )
    SELECT f.n_events, f.mean_cents,
           CAST(max(nr) AS BIGINT) AS n_replicas,
           CAST(max(CASE WHEN rk = 2 THEN m END) AS DOUBLE) AS ci_lo,
           CAST(max(CASE WHEN rk = nr - 1 THEN m END) AS DOUBLE) AS ci_hi
    FROM means, full_m f
    GROUP BY f.n_events, f.mean_cents
    """,
)
def a_subsample_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-deterministic subsampling confidence interval for the mean
    purchase (the bootstrap's distributed cousin: B half-subsamples via
    hash bits instead of random resampling, so the whole procedure is
    a pure function both engines compute): ONE md5 per event yields 32
    replica memberships — bit b of the first 32 hash bits says whether
    the event joins replica b (no 32× explode, no per-replica hash) —
    each replica's mean is an exact integer-cents sum/count (mirrored
    round-4), and the CI is the 2nd/31st order statistic of the sorted
    replica means (≈94% coverage at B=32). Spark computes all 64
    replica aggregates as TWO array-valued aggregate expressions (one
    parsed F.expr each — the minhash plan-build lesson) and ranks
    in-plan via sort_array; empty replicas are dropped identically on
    both sides (rank positions are relative to the non-empty count).
    One scan, one 1-row aggregate; scale cost is 32 conditional sums
    inside the map-side partial aggregate."""
    e = _t(spark, sf_dir, "events").where(
        (F.col("event_type") == "purchase") & F.col("value").isNotNull()
    )
    ev = e.select(
        F.expr("CAST(round(value * 100) AS BIGINT)").alias("cents"),
        F.expr(
            "CAST(conv(substring(md5(CAST(event_id AS STRING)), 1, 8),"
            " 16, 10) AS BIGINT)"
        ).alias("h"),
    )
    sums_sql = "array(" + ", ".join(
        f"sum(CASE WHEN shiftright(h, {b}) & 1 = 1 THEN cents ELSE 0 END)"
        for b in range(32)
    ) + ")"
    cnts_sql = "array(" + ", ".join(
        f"sum(CASE WHEN shiftright(h, {b}) & 1 = 1 THEN 1 ELSE 0 END)"
        for b in range(32)
    ) + ")"
    agg = ev.groupBy().agg(
        F.expr(sums_sql).alias("ss"),
        F.expr(cnts_sql).alias("cc"),
        F.count(F.lit(1)).alias("n_events"),
        F.expr(
            "CAST(round(CAST(sum(cents) AS DOUBLE) / count(1), 4) AS DOUBLE)"
        ).alias("mean_cents"),
    )
    # review fix (r15 pass 1): element_at RAISES under ANSI when fewer
    # than 2 replicas are non-empty (and the zero-purchase global agg
    # still emits one row where the oracle emits none) — guard the order
    # statistics on nr >= 2 exactly like the oracle's rk-match NULLs,
    # and drop the empty-input row to mirror the oracle's zero rows
    means_sql = (
        "sort_array(filter(transform(sequence(0, 31),"
        " i -> CASE WHEN element_at(cc, i + 1) > 0 THEN"
        " round(CAST(element_at(ss, i + 1) AS DOUBLE)"
        " / element_at(cc, i + 1), 4) END), x -> x IS NOT NULL))"
    )
    return (
        agg.where(F.col("n_events") > 0)
        .select(
            "n_events",
            "mean_cents",
            F.expr(
                "CAST(size(filter(cc, c -> c > 0)) AS BIGINT)"
            ).alias("n_replicas"),
            F.expr(
                "CAST(CASE WHEN size(filter(cc, c -> c > 0)) >= 2"
                f" THEN element_at({means_sql}, 2) END AS DOUBLE)"
            ).alias("ci_lo"),
            F.expr(
                "CAST(CASE WHEN size(filter(cc, c -> c > 0)) >= 2"
                f" THEN element_at({means_sql},"
                " size(filter(cc, c -> c > 0)) - 1) END AS DOUBLE)"
            ).alias("ci_hi"),
        )
    )


@query(
    "a_permutation_test",
    oracle="""
    WITH ev AS (
      SELECT CAST(round(value * 100) AS BIGINT) AS cents,
             user_id % 2 AS arm,
             CAST(('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 8))
                  AS BIGINT) AS h
      FROM events
      WHERE event_type = 'purchase' AND value IS NOT NULL
        AND user_id IS NOT NULL
    ),
    tot AS (
      SELECT CAST(count(*) AS BIGINT) AS n_events,
             CAST(sum(cents) AS BIGINT) AS s,
             CAST(sum(CASE WHEN arm = 1 THEN cents ELSE 0 END) AS BIGINT)
               AS s1o,
             CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS c1o
      FROM ev
    ),
    obs AS (
      SELECT n_events,
             CASE WHEN c1o > 0 AND n_events - c1o > 0
                  THEN round(CAST(s1o AS DOUBLE) / c1o
                       - CAST(s - s1o AS DOUBLE) / (n_events - c1o), 4)
                  END AS obs_diff
      FROM tot
    ),
    reps AS (
      SELECT b.b AS b,
             CAST(sum(CASE WHEN (h >> b.b) & 1 = 1 THEN cents ELSE 0 END)
                  AS BIGINT) AS s1,
             CAST(sum(CASE WHEN (h >> b.b) & 1 = 1 THEN 1 ELSE 0 END)
                  AS BIGINT) AS c1
      FROM ev, LATERAL (SELECT unnest(range(0, 32)) AS b) b
      GROUP BY 1
    ),
    diffs AS (
      SELECT round(CAST(r.s1 AS DOUBLE) / r.c1
             - CAST(t.s - r.s1 AS DOUBLE) / (t.n_events - r.c1), 4) AS d
      FROM reps r, tot t
      WHERE r.c1 > 0 AND t.n_events - r.c1 > 0
    ),
    pv AS (
      SELECT CAST(count(*) AS BIGINT) AS n_replicas,
             CAST(coalesce(sum(CASE WHEN abs(d) >= abs(o.obs_diff)
                      THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_extreme
      FROM diffs, obs o
    )
    SELECT o.n_events, o.obs_diff, p.n_replicas, p.n_extreme,
           CAST(CASE WHEN o.obs_diff IS NULL OR p.n_replicas = 0 THEN NULL
                ELSE p.n_extreme * 1000000 // p.n_replicas END AS BIGINT)
             AS p_value_ppm
    FROM obs o, pv p
    WHERE o.n_events > 0
    """,
)
def a_permutation_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Randomization (permutation) test for the between-arm difference
    in mean purchase — the nonparametric companion to
    a_two_proportion_ztest / a_welch_t_test, with the label
    reassignment HASH-DETERMINIZED so both engines compute the
    identical 'random' relabelings (the a_subsample_ci channel): the
    observed arms are user parity; each of B=32 replicas relabels
    USERS by bit b of one md5 per user (labels permute at the unit of
    inference, never per event), and p = ppm of replicas whose
    |mean₁−mean₀| is at least the observed |difference|. Replica and
    observed diffs are round-4 ratios of exact integer-cents sums; the
    p-value is an exact integer ppm over valid replicas (degenerate
    one-arm replicas are dropped identically on both sides; a
    degenerate OBSERVED split → NULL everything). One scan; the 64
    replica aggregates ride two array-valued expressions inside the
    map-side partial aggregate — no explode, no second pass."""
    e = _t(spark, sf_dir, "events").where(
        (F.col("event_type") == "purchase")
        & F.col("value").isNotNull()
        & F.col("user_id").isNotNull()
    )
    ev = e.select(
        F.expr("CAST(round(value * 100) AS BIGINT)").alias("cents"),
        F.expr("user_id % 2").alias("arm"),
        F.expr(
            "CAST(conv(substring(md5(CAST(user_id AS STRING)), 1, 8),"
            " 16, 10) AS BIGINT)"
        ).alias("h"),
    )
    ss_sql = "array(" + ", ".join(
        f"sum(CASE WHEN shiftright(h, {b}) & 1 = 1 THEN cents ELSE 0 END)"
        for b in range(32)
    ) + ")"
    cc_sql = "array(" + ", ".join(
        f"sum(CASE WHEN shiftright(h, {b}) & 1 = 1 THEN 1 ELSE 0 END)"
        for b in range(32)
    ) + ")"
    agg = ev.groupBy().agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("cents").alias("s"),
        F.expr(
            "CAST(sum(CASE WHEN arm = 1 THEN cents ELSE 0 END) AS BIGINT)"
        ).alias("s1o"),
        F.expr(
            "CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT)"
        ).alias("c1o"),
        F.expr(ss_sql).alias("ss"),
        F.expr(cc_sql).alias("cc"),
    )
    diffs_sql = (
        "filter(transform(sequence(0, 31),"
        " i -> CASE WHEN element_at(cc, i + 1) > 0"
        " AND n_events - element_at(cc, i + 1) > 0"
        " THEN round(CAST(element_at(ss, i + 1) AS DOUBLE)"
        " / element_at(cc, i + 1)"
        " - CAST(s - element_at(ss, i + 1) AS DOUBLE)"
        " / (n_events - element_at(cc, i + 1)), 4) END),"
        " x -> x IS NOT NULL)"
    )
    return (
        agg.where(F.col("n_events") > 0)
        .select(
            "n_events",
            F.expr(
                "CAST(CASE WHEN c1o > 0 AND n_events - c1o > 0"
                " THEN round(CAST(s1o AS DOUBLE) / c1o"
                " - CAST(s - s1o AS DOUBLE) / (n_events - c1o), 4)"
                " END AS DOUBLE)"
            ).alias("obs_diff"),
            F.expr(f"CAST(size({diffs_sql}) AS BIGINT)").alias("n_replicas"),
            "s",
            "s1o",
            "c1o",
            "ss",
            "cc",
        )
        .select(
            "n_events",
            "obs_diff",
            "n_replicas",
            # NULL obs_diff drops every element through the NULL
            # predicate -> 0, exactly the oracle's sum-of-CASE 0
            F.expr(
                f"CAST(size(filter({diffs_sql},"
                " x -> abs(x) >= abs(obs_diff))) AS BIGINT)"
            ).alias("n_extreme"),
        )
        .select(
            "n_events",
            "obs_diff",
            "n_replicas",
            "n_extreme",
            F.expr(
                "CAST(CASE WHEN obs_diff IS NULL OR n_replicas = 0"
                " THEN NULL ELSE n_extreme * 1000000 div n_replicas END"
                " AS BIGINT)"
            ).alias("p_value_ppm"),
        )
    )


@query(
    "w_skyline_orders",
    oracle="""
    WITH o AS (
      SELECT o_orderkey,
             epoch_ms(CAST(o_orderdate AS TIMESTAMP)) // 86400000 AS d,
             CAST(round(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders
    )
    SELECT a.o_orderkey, CAST(a.d AS BIGINT) AS day, a.cents
    FROM o a
    WHERE NOT EXISTS (
      SELECT 1 FROM o b
      WHERE b.d <= a.d AND b.cents >= a.cents
        AND (b.d < a.d OR b.cents > a.cents)
    )
    """,
)
def w_skyline_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skyline (Pareto frontier) over orders — minimize order day,
    maximize price: an order survives iff nothing else is at least as
    early AND at least as pricey with one strict. The classic skyline
    operator expressed scale-safe via the 2-D sweep along the
    CALENDAR-BOUNDED day axis: group to per-day max price (one
    aggregate — the only corpus-scale work), prefix-max over strictly
    earlier days on the bounded day frame (the m_autocorr window
    class, row count = day count), and an order survives iff its price
    equals its day's max AND strictly exceeds every earlier day's max.
    Equal-(day, price) duplicates all survive (neither dominates — no
    strict coordinate), which the join-back preserves. The oracle is
    the textbook NOT-EXISTS dominance formulation — an INDEPENDENT
    quadratic spec checking the linear sweep, not a transliteration.
    All-integer channels (epoch day, price cents)."""
    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.expr(
            "unix_millis(CAST(o_orderdate AS TIMESTAMP)) div 86400000"
        ).alias("d"),
        F.expr("CAST(round(o_totalprice * 100) AS BIGINT)").alias("cents"),
    )
    byday = o.groupBy("d").agg(F.max("cents").alias("day_max"))
    wprev = W.orderBy("d").rowsBetween(W.unboundedPreceding, -1)
    sky_days = byday.select(
        "d",
        "day_max",
        F.max("day_max").over(wprev).alias("prev_max"),
    ).where(
        F.col("prev_max").isNull() | (F.col("day_max") > F.col("prev_max"))
    )
    return o.join(
        F.broadcast(sky_days.select("d", "day_max")), "d"
    ).where(F.col("cents") == F.col("day_max")).select(
        "o_orderkey", F.col("d").cast("bigint").alias("day"), "cents"
    )


@query(
    "a_cuped_adjustment",
    oracle="""
    WITH ev AS (
      SELECT user_id, epoch_ms(ts) AS ms,
             CAST(round(value * 100) AS BIGINT) AS cents
      FROM events
      WHERE event_type = 'purchase' AND value IS NOT NULL
        AND user_id IS NOT NULL
    ),
    b AS (SELECT min(ms) AS m0, max(ms) AS m1 FROM ev),
    u AS (
      SELECT user_id, user_id % 2 AS arm,
             CAST(sum(CASE WHEN ms <= (b.m0 + (b.m1 - b.m0) // 2)
                      THEN cents ELSE 0 END) AS BIGINT) AS x,
             CAST(sum(CASE WHEN ms > (b.m0 + (b.m1 - b.m0) // 2)
                      THEN cents ELSE 0 END) AS BIGINT) AS y
      FROM ev, b GROUP BY 1, 2
    ),
    m AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             sum(CAST(x AS DOUBLE)) AS sx, sum(CAST(y AS DOUBLE)) AS sy,
             sum(CAST(x AS DOUBLE) * x) AS sxx,
             sum(CAST(x AS DOUBLE) * y) AS sxy,
             sum(CAST(y AS DOUBLE) * y) AS syy,
             CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n1,
             sum(CASE WHEN arm = 1 THEN CAST(x AS DOUBLE) ELSE 0.0 END)
               AS sx1,
             sum(CASE WHEN arm = 1 THEN CAST(y AS DOUBLE) ELSE 0.0 END)
               AS sy1
      FROM u
    )
    SELECT n, n1,
           CAST(CASE WHEN n * sxx - sx * sx = 0 THEN NULL
                ELSE round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6)
                END AS DOUBLE) AS theta,
           CAST(CASE WHEN n * syy - sy * sy = 0 OR n * sxx - sx * sx = 0
                THEN NULL
                ELSE round(((n * sxy - sx * sy) / (n * sxx - sx * sx))
                     * ((n * sxy - sx * sy) / (n * sxx - sx * sx))
                     * (n * sxx - sx * sx) / (n * syy - sy * sy), 6)
                END AS DOUBLE) AS var_reduction,
           CAST(CASE WHEN n1 = 0 OR n - n1 = 0 THEN NULL
                ELSE round(sy1 / n1 - (sy - sy1) / (n - n1), 4)
                END AS DOUBLE) AS raw_diff,
           CAST(CASE WHEN n1 = 0 OR n - n1 = 0 OR n * sxx - sx * sx = 0
                THEN NULL
                ELSE round((sy1 / n1 - (sy - sy1) / (n - n1))
                     - ((n * sxy - sx * sy) / (n * sxx - sx * sx))
                     * (sx1 / n1 - (sx - sx1) / (n - n1)), 4)
                END AS DOUBLE) AS adj_diff
    FROM m WHERE n > 0
    """,
)
def a_cuped_adjustment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED variance reduction (Deng et al., the A/B-platform
    workhorse): pre-period user revenue (first half of the observation
    window, the capture-recapture integer-midpoint split) as the
    covariate for post-period revenue — θ = cov(X,Y)/var(X), the
    achievable variance reduction is exactly ρ² (shipped as the
    mirrored var_reduction = θ²·var(X)/var(Y)), and the adjusted
    between-arm difference is raw_diff − θ·(X̄₁−X̄₀) (user-parity
    arms). Per-user x/y are exact integer cents; the moment sums are
    computed in DOUBLE from the start (Σx² over user-level cents is
    the n·cents² class that saturates int64 — the Welch lesson applied
    by construction, not by a documented bound), every ratio one
    mirrored formula (θ round-6, reduction round-6, diffs round-4),
    zero-variance → NULL both sides. One user aggregate + one global
    conditional aggregate."""
    e = _t(spark, sf_dir, "events").where(
        (F.col("event_type") == "purchase")
        & F.col("value").isNotNull()
        & F.col("user_id").isNotNull()
    )
    ev = e.select(
        "user_id",
        F.expr("unix_millis(ts)").alias("ms"),
        F.expr("CAST(round(value * 100) AS BIGINT)").alias("cents"),
    )
    b = ev.groupBy().agg(F.min("ms").alias("m0"), F.max("ms").alias("m1"))
    u = ev.crossJoin(F.broadcast(b)).groupBy(
        "user_id", F.expr("user_id % 2").alias("arm")
    ).agg(
        F.expr(
            "CAST(sum(CASE WHEN ms <= (m0 + (m1 - m0) div 2)"
            " THEN cents ELSE 0 END) AS BIGINT)"
        ).alias("x"),
        F.expr(
            "CAST(sum(CASE WHEN ms > (m0 + (m1 - m0) div 2)"
            " THEN cents ELSE 0 END) AS BIGINT)"
        ).alias("y"),
    )
    m = u.groupBy().agg(
        F.count(F.lit(1)).alias("n"),
        F.expr("sum(CAST(x AS DOUBLE))").alias("sx"),
        F.expr("sum(CAST(y AS DOUBLE))").alias("sy"),
        F.expr("sum(CAST(x AS DOUBLE) * x)").alias("sxx"),
        F.expr("sum(CAST(x AS DOUBLE) * y)").alias("sxy"),
        F.expr("sum(CAST(y AS DOUBLE) * y)").alias("syy"),
        F.expr(
            "CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT)"
        ).alias("n1"),
        F.expr(
            "sum(CASE WHEN arm = 1 THEN CAST(x AS DOUBLE) ELSE 0.0D END)"
        ).alias("sx1"),
        F.expr(
            "sum(CASE WHEN arm = 1 THEN CAST(y AS DOUBLE) ELSE 0.0D END)"
        ).alias("sy1"),
    )
    return m.where(F.col("n") > 0).select(
        "n",
        "n1",
        F.expr(
            "CAST(CASE WHEN n * sxx - sx * sx = 0 THEN NULL"
            " ELSE round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6)"
            " END AS DOUBLE)"
        ).alias("theta"),
        F.expr(
            "CAST(CASE WHEN n * syy - sy * sy = 0 OR n * sxx - sx * sx = 0"
            " THEN NULL"
            " ELSE round(((n * sxy - sx * sy) / (n * sxx - sx * sx))"
            " * ((n * sxy - sx * sy) / (n * sxx - sx * sx))"
            " * (n * sxx - sx * sx) / (n * syy - sy * sy), 6)"
            " END AS DOUBLE)"
        ).alias("var_reduction"),
        F.expr(
            "CAST(CASE WHEN n1 = 0 OR n - n1 = 0 THEN NULL"
            " ELSE round(sy1 / n1 - (sy - sy1) / (n - n1), 4)"
            " END AS DOUBLE)"
        ).alias("raw_diff"),
        F.expr(
            "CAST(CASE WHEN n1 = 0 OR n - n1 = 0 OR n * sxx - sx * sx = 0"
            " THEN NULL"
            " ELSE round((sy1 / n1 - (sy - sy1) / (n - n1))"
            " - ((n * sxy - sx * sy) / (n * sxx - sx * sx))"
            " * (sx1 / n1 - (sx - sx1) / (n - n1)), 4)"
            " END AS DOUBLE)"
        ).alias("adj_diff"),
    )


@query(
    "g_global_transitivity",
    oracle=f"""
    WITH {_PART_COOCCUR_SQL},
    {_TRIS_SQL},
    t AS (SELECT CAST(count(*) AS BIGINT) AS n_triangles FROM tris),
    w AS (
      SELECT CAST(sum(k * (k - 1) // 2) AS BIGINT) AS n_wedges,
             CAST(count(*) AS BIGINT) AS n_nodes
      FROM deg
    ),
    e AS (SELECT CAST(count(*) AS BIGINT) AS n_edges FROM pairs)
    SELECT w.n_nodes, e.n_edges, w.n_wedges, t.n_triangles,
           CAST(CASE WHEN w.n_wedges = 0 THEN NULL
                ELSE 3 * t.n_triangles * 1000000 // w.n_wedges END
                AS BIGINT) AS transitivity_ppm
    FROM t, w, e
    """,
)
def g_global_transitivity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global transitivity (the graph-level clustering coefficient
    C = 3·triangles / wedges) of the part co-occurrence graph — the
    one-number capstone over the shared kernels: triangles from the
    checkpointed _min_oriented_tris enumeration (each triangle once at
    a<b<c), wedges = Σ k(k−1)/2 over the shared degree frame (the
    pair-count integer class — int64 to ~3e9 degree), ratio as exact
    integer ppm (zero wedges → NULL both sides; the 3·T·1e6 numerator
    saturates int64 at ~3e12 triangles — past that, drop to the
    wide_int() DECIMAL channel). Complements
    g_local_clustering_topk's per-node C(v): the global form weighs
    hubs by their wedge count, so the two diverge exactly when
    clustering concentrates in low-degree nodes. Node/edge/wedge/
    triangle counts ship for auditability."""
    pairs, _, deg = _part_cooccurrence(spark, sf_dir)
    tris = _min_oriented_tris(pairs)
    t = tris.groupBy().agg(F.count(F.lit(1)).alias("n_triangles"))
    w = deg.groupBy().agg(
        F.expr("CAST(sum(k * (k - 1) div 2) AS BIGINT)").alias("n_wedges"),
        F.count(F.lit(1)).alias("n_nodes"),
    )
    e_ = pairs.groupBy().agg(F.count(F.lit(1)).alias("n_edges"))
    return (
        t.crossJoin(F.broadcast(w))
        .crossJoin(F.broadcast(e_))
        .select(
            "n_nodes",
            "n_edges",
            "n_wedges",
            "n_triangles",
            F.expr(
                "CAST(CASE WHEN n_wedges = 0 THEN NULL"
                " ELSE 3 * n_triangles * 1000000 div n_wedges END AS BIGINT)"
            ).alias("transitivity_ppm"),
        )
    )


@query(
    "a_jackknife_variance",
    oracle="""
    WITH ev AS (
      SELECT CAST(round(value * 100) AS BIGINT) AS cents,
             CAST(('0x' || substring(md5(CAST(event_id AS VARCHAR)), 1, 8))
                  AS BIGINT) % 32 AS g
      FROM events WHERE event_type = 'purchase' AND value IS NOT NULL
    ),
    grp AS (
      SELECT g, CAST(sum(cents) AS BIGINT) AS s,
             CAST(count(*) AS BIGINT) AS c
      FROM ev GROUP BY 1
    ),
    tot AS (
      SELECT CAST(sum(s) AS BIGINT) AS st, CAST(sum(c) AS BIGINT) AS ct,
             CAST(count(*) AS BIGINT) AS ng
      FROM grp
    ),
    loo AS (
      SELECT round(CAST(t.st - g.s AS DOUBLE) / (t.ct - g.c), 6) AS theta
      FROM grp g, tot t WHERE t.ct - g.c > 0
    ),
    jk AS (
      SELECT CAST(count(*) AS BIGINT) AS g_used,
             avg(theta) AS tbar,
             sum(theta * theta) AS t2
      FROM loo
    )
    SELECT t.ng AS n_groups, jk.g_used, t.ct AS n_events,
           CAST(round(CAST(t.st AS DOUBLE) / t.ct, 4) AS DOUBLE)
             AS mean_cents,
           CAST(CASE WHEN jk.g_used < 2 THEN NULL
                ELSE round(sqrt((CAST(jk.g_used AS DOUBLE) - 1) / jk.g_used
                     * (jk.t2 - jk.g_used * jk.tbar * jk.tbar)), 4)
                END AS DOUBLE) AS jackknife_se
    FROM jk, tot t WHERE t.ct > 0
    """,
)
def a_jackknife_variance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delete-a-GROUP jackknife standard error for the mean purchase —
    the third member of the hash-deterministic resampling trio
    (a_subsample_ci, a_permutation_test): 32 hash groups from one md5,
    leave-one-group-out means θ_g = (S−s_g)/(C−c_g) as round-6 ratios
    of exact integer-cents sums, and SE = √((G−1)/G · Σ(θ_g − θ̄)²)
    from one mirrored float formula over the 32 rounded θ values (the
    power-sum form t2 − G·θ̄² — aggregate over a 32-row frame, so
    float-sum order noise is bounded by 32 terms of ~equal magnitude,
    far inside round-4). Empty-complement groups dropped identically
    both sides; <2 usable groups → NULL. One scan + one 32-row
    aggregate; the grouped partial runs map-side."""
    e = _t(spark, sf_dir, "events").where(
        (F.col("event_type") == "purchase") & F.col("value").isNotNull()
    )
    ev = e.select(
        F.expr("CAST(round(value * 100) AS BIGINT)").alias("cents"),
        F.expr(
            "pmod(CAST(conv(substring(md5(CAST(event_id AS STRING)), 1, 8),"
            " 16, 10) AS BIGINT), 32)"
        ).alias("g"),
    )
    grp = ev.groupBy("g").agg(
        F.sum("cents").alias("s"), F.count(F.lit(1)).alias("c")
    )
    tot = grp.groupBy().agg(
        F.sum("s").alias("st"),
        F.sum("c").alias("ct"),
        F.count(F.lit(1)).alias("ng"),
    )
    loo = grp.crossJoin(F.broadcast(tot)).where(
        F.expr("ct - c > 0")
    ).select(
        F.expr("round(CAST(st - s AS DOUBLE) / (ct - c), 6)").alias("theta")
    )
    jk = loo.groupBy().agg(
        F.count(F.lit(1)).alias("g_used"),
        F.avg("theta").alias("tbar"),
        F.expr("sum(theta * theta)").alias("t2"),
    )
    return jk.crossJoin(F.broadcast(tot)).where(F.col("ct") > 0).select(
        F.col("ng").alias("n_groups"),
        "g_used",
        F.col("ct").alias("n_events"),
        F.expr(
            "CAST(round(CAST(st AS DOUBLE) / ct, 4) AS DOUBLE)"
        ).alias("mean_cents"),
        F.expr(
            "CAST(CASE WHEN g_used < 2 THEN NULL"
            " ELSE round(sqrt((CAST(g_used AS DOUBLE) - 1) / g_used"
            " * (t2 - g_used * tbar * tbar)), 4) END AS DOUBLE)"
        ).alias("jackknife_se"),
    )


@query(
    "g_brand_assortativity",
    oracle=f"""
    WITH {_PART_COOCCUR_SQL},
    lbl AS (SELECT p_partkey, p_brand FROM part),
    e2 AS (
      SELECT la.p_brand AS ba, lb.p_brand AS bb
      FROM pairs
      JOIN lbl la ON la.p_partkey = pairs.pa
      JOIN lbl lb ON lb.p_partkey = pairs.pb
    ),
    mix AS (
      SELECT CAST(count(*) AS BIGINT) AS m,
             CAST(sum(CASE WHEN ba = bb THEN 1 ELSE 0 END) AS BIGINT)
               AS same
      FROM e2
    ),
    ends_ AS (
      SELECT b, CAST(count(*) AS BIGINT) AS k FROM (
        SELECT ba AS b FROM e2 UNION ALL SELECT bb FROM e2
      ) GROUP BY 1
    ),
    ab AS (
      SELECT sum(CAST(k AS DOUBLE) * k) AS skk,
             CAST(sum(k) AS BIGINT) AS tot
      FROM ends_
    )
    SELECT mix.m AS n_edges, mix.same AS n_same_brand,
           CAST(mix.same * 1000000 // mix.m AS BIGINT) AS same_ppm,
           CAST(CASE WHEN ab.skk / (ab.tot * CAST(ab.tot AS DOUBLE)) = 1.0
                THEN NULL
                ELSE round((CAST(mix.same AS DOUBLE) / mix.m
                     - ab.skk / (ab.tot * CAST(ab.tot AS DOUBLE)))
                     / (1.0 - ab.skk / (ab.tot * CAST(ab.tot AS DOUBLE))),
                     6) END AS DOUBLE) AS assortativity
    FROM mix, ab
    """,
)
def g_brand_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ATTRIBUTE (categorical) assortativity of the part co-occurrence
    graph by brand — Newman's discrete assortativity coefficient
    r = (Σe_ii − Σa_i²)/(1 − Σa_i²), the companion to
    g_degree_assortativity's numeric form ('do parts of the same brand
    co-occur in orders more than chance?'): Σe_ii is the same-brand
    edge fraction (exact integers, ppm shipped), Σa_i² is the squared
    end-fraction mass computed from integer endpoint counts via one
    mirrored float formula (Σk²/(2m)² — k per brand is bounded by 2m,
    and the k product runs in DOUBLE so no data-scaled bigint product
    forms), degenerate single-brand graphs → NULL both sides. Riding
    the shared _part_cooccurrence kernel + two broadcast label joins;
    one aggregate each side."""
    pairs, _, _ = _part_cooccurrence(spark, sf_dir)
    lbl = _t(spark, sf_dir, "part").select("p_partkey", "p_brand")
    la = lbl.select(
        F.col("p_partkey").alias("pa"), F.col("p_brand").alias("ba")
    )
    lb = lbl.select(
        F.col("p_partkey").alias("pb"), F.col("p_brand").alias("bb")
    )
    e2 = pairs.join(F.broadcast(la), "pa").join(F.broadcast(lb), "pb")
    # r15 optimization round: ONE pass over the labeled edge stream
    # instead of three (the global mix aggregate + both endpoint-union
    # branches each re-read the checkpointed pairs and re-ran the two
    # broadcast label joins). Each edge explodes into its two endpoint
    # rows, the same-brand indicator riding the FIRST (counted once per
    # edge); per-brand k/same reduce in one partial+final aggregate and
    # the global moments follow from the <=|brands|-row frame:
    # tot = sum(k) = 2m exactly, so m = tot div 2 — integers unchanged.
    # Degenerate EMPTY-edge caveat (r16 ADVICE, documented as unreachable):
    # with zero edges the per-brand groupBy yields zero rows, so the global
    # aggregate returns one all-NULL row (m=NULL, same_ppm=NULL) where the
    # oracle's mix CTE would produce m=0 and then error on the ppm integer
    # division — the two engines diverge ONLY on an empty lineitem, which
    # no SF of this testdata can produce (every scale ships lineitem rows
    # and every order holds ≥1 part). Not coalesced to 0 on purpose: that
    # would trade the NULL row for a div-by-zero error on BOTH sides, no
    # closer to agreement and strictly harder to debug.
    stream = e2.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("ba").alias("b"),
                    F.when(F.col("ba") == F.col("bb"), 1)
                    .otherwise(0)
                    .alias("s"),
                ),
                F.struct(F.col("bb").alias("b"), F.lit(0).alias("s")),
            )
        ).alias("x")
    ).select("x.b", "x.s")
    per_brand = stream.groupBy("b").agg(
        F.count(F.lit(1)).alias("k"),
        F.sum("s").alias("sameb"),
    )
    ab = per_brand.groupBy().agg(
        F.expr("sum(CAST(k AS DOUBLE) * k)").alias("skk"),
        F.sum("k").alias("tot"),
        F.expr("CAST(sum(k) div 2 AS BIGINT)").alias("m"),
        F.expr("CAST(sum(sameb) AS BIGINT)").alias("same"),
    )
    return ab.select(
        F.col("m").alias("n_edges"),
        F.col("same").alias("n_same_brand"),
        F.expr("CAST(same * 1000000 div m AS BIGINT)").alias("same_ppm"),
        F.expr(
            "CAST(CASE WHEN skk / (tot * CAST(tot AS DOUBLE)) = 1.0D"
            " THEN NULL"
            " ELSE round((CAST(same AS DOUBLE) / m"
            " - skk / (tot * CAST(tot AS DOUBLE)))"
            " / (1.0D - skk / (tot * CAST(tot AS DOUBLE))), 6)"
            " END AS DOUBLE)"
        ).alias("assortativity"),
    )


# --------------------------------------------------------------------------
# k-sample tests: Kruskal-Wallis + one-way ANOVA (r15 continuation)
# --------------------------------------------------------------------------

# Pooled per-cents counts over THREE arms (purchase/click/view) — the
# k-sample extension of _VALUE_ARM_COUNTS_SQL. Kept separate from the
# two-arm kernel on purpose: the passing two-sample entries' oracles
# must not drift when the arm set changes.
_KW_COUNTS_SQL = """ev AS (
      SELECT CAST(round(value * 100) AS BIGINT) AS cents, event_type AS et
      FROM events
      WHERE value IS NOT NULL
        AND event_type IN ('purchase', 'click', 'view')
    ),
    by_v AS (
      SELECT cents,
             CAST(sum(CASE WHEN et = 'purchase' THEN 1 ELSE 0 END)
                  AS BIGINT) AS cnt_p,
             CAST(sum(CASE WHEN et = 'click' THEN 1 ELSE 0 END)
                  AS BIGINT) AS cnt_c,
             CAST(sum(CASE WHEN et = 'view' THEN 1 ELSE 0 END)
                  AS BIGINT) AS cnt_v,
             CAST(count(*) AS BIGINT) AS cnt
      FROM ev GROUP BY cents
    )"""


def _kw_h_expr() -> str:
    """The tie-corrected Kruskal-Wallis H — ONE formula text evaluated by
    both engines over the exact integer channels (n_j, r2_j = doubled
    rank sums, tie_sum). Every literal is an INTEGER (4·n_p, 12, 3,
    1 − …) so the bare-decimal-literal trap cannot apply at all: integer
    constants multiply/subtract exactly in bigint and only promote to
    double when they meet an operand already CAST to DOUBLE, and `/` is
    float division in BOTH engines regardless of operand type. The
    Σ R_j²/n_j sum is written in FIXED literal arm order (p, c, v) so
    the float accumulation order is textually pinned, never
    aggregate-order."""
    rsq = (
        "(CAST(r2_p AS DOUBLE) * r2_p / (4 * n_p)"
        " + CAST(r2_c AS DOUBLE) * r2_c / (4 * n_c)"
        " + CAST(r2_v AS DOUBLE) * r2_v / (4 * n_v))"
    )
    h_unc = f"(12 / (CAST(n AS DOUBLE) * (n + 1)) * {rsq} - 3 * (n + 1))"
    ct = "(1 - CAST(tie_sum AS DOUBLE) / (CAST(n AS DOUBLE) * n * n - n))"
    return (
        "CAST(CASE WHEN n_p = 0 OR n_c = 0 OR n_v = 0 OR n < 2"
        f" OR {ct} = 0 THEN NULL"
        f" ELSE round({h_unc} / {ct}, 6) END AS DOUBLE)"
    )


@query(
    "a_kruskal_wallis",
    oracle=f"""
    WITH {_KW_COUNTS_SQL},
    pre AS (
      SELECT cents, cnt_p, cnt_c, cnt_v, cnt,
             CAST(sum(cnt) OVER (ORDER BY cents
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - cnt
               AS BIGINT) AS less
      FROM by_v
    ),
    g AS (
      SELECT CAST(sum(cnt_p) AS BIGINT) AS n_p,
             CAST(sum(cnt_c) AS BIGINT) AS n_c,
             CAST(sum(cnt_v) AS BIGINT) AS n_v,
             CAST(sum(cnt) AS BIGINT) AS n,
             CAST(sum(cnt_p * (2 * less + cnt + 1)) AS BIGINT) AS r2_p,
             CAST(sum(cnt_c * (2 * less + cnt + 1)) AS BIGINT) AS r2_c,
             CAST(sum(cnt_v * (2 * less + cnt + 1)) AS BIGINT) AS r2_v,
             CAST(sum(cnt * cnt * cnt - cnt) AS BIGINT) AS tie_sum
      FROM pre
    )
    SELECT n_p, n_c, n_v, n, r2_p, r2_c, r2_v, tie_sum,
           {_kw_h_expr()} AS h_stat
    FROM g
    """,
)
def a_kruskal_wallis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kruskal-Wallis H: do purchase, click and view draw ``value`` from
    the same distribution? — the k-SAMPLE extension of a_mann_whitney_u
    (k=3 here), closing the rank-test ladder (2-sample MW/KS/AD →
    k-sample KW → the parametric twin a_one_way_anova). Same machinery,
    generalized: pooled values collapse to integer cents, per-value
    3-arm counts feed ONE exact distributed prefix sum (no
    unpartitioned window), the doubled average rank 2r(v) =
    2·less(v)+cnt(v)+1 keeps every rank-sum channel r2_j =
    Σ cnt_j·(2·less+cnt+1) in exact bigints, and tie_sum = Σ(cnt³−cnt)
    is the shared cubic tie channel. H (tie-corrected) comes from those
    integers through _kw_h_expr — one formula text both engines parse,
    with the Σ R_j²/n_j accumulation order pinned by literal arm order
    (the squares run in DOUBLE because R_j² ~ 4n⁴ outgrows bigint at
    ~55k pooled rows — exact integers END at the g frame by design).
    Overflow bounds = the a_mann_whitney_u class: r2_j ≤ 2n² holds
    bigint to n ~ 2.1e9 pooled rows; the cubic tie channel to ~2.1e6
    rows on ONE cents value; past either, the wide_int escape twin
    pattern applies (documented, not shipped — the MW decimal twin
    demonstrates the mechanics)."""
    e = _t(spark, sf_dir, "events").where(
        F.col("value").isNotNull()
        & F.col("event_type").isin("purchase", "click", "view")
    )
    by_v = (
        e.select(
            F.expr("CAST(round(value * 100) AS BIGINT)").alias("cents"),
            F.col("event_type").alias("et"),
        )
        .groupBy("cents")
        .agg(
            F.sum(F.expr("CASE WHEN et = 'purchase' THEN 1 ELSE 0 END")).alias(
                "cnt_p"
            ),
            F.sum(F.expr("CASE WHEN et = 'click' THEN 1 ELSE 0 END")).alias(
                "cnt_c"
            ),
            F.sum(F.expr("CASE WHEN et = 'view' THEN 1 ELSE 0 END")).alias(
                "cnt_v"
            ),
            F.count(F.lit(1)).alias("cnt"),
        )
    )
    _, pre = _value_arm_prefix(spark, sf_dir, [("cnt", "cum")], by_v=by_v)
    pre = pre.withColumn("less", F.col("cum") - F.col("cnt"))
    g = pre.groupBy().agg(
        F.sum("cnt_p").alias("n_p"),
        F.sum("cnt_c").alias("n_c"),
        F.sum("cnt_v").alias("n_v"),
        F.sum("cnt").alias("n"),
        F.sum(F.expr("cnt_p * (2 * less + cnt + 1)")).alias("r2_p"),
        F.sum(F.expr("cnt_c * (2 * less + cnt + 1)")).alias("r2_c"),
        F.sum(F.expr("cnt_v * (2 * less + cnt + 1)")).alias("r2_v"),
        F.sum(F.expr("cnt * cnt * cnt - cnt")).alias("tie_sum"),
    )
    return g.select(
        "n_p", "n_c", "n_v", "n", "r2_p", "r2_c", "r2_v", "tie_sum",
        F.expr(_kw_h_expr()).alias("h_stat"),
    )


# One-way ANOVA shared formula texts — computed over the exact integer
# moment frame (n, n_j, s1_j, s1, s2). The Σ s1_j²/n_j term and the two
# sums of squares become NAMED columns so each float expression is
# written (and therefore evaluated) exactly once per engine.
_ANOVA_RSQ = (
    "CASE WHEN n_p = 0 OR n_c = 0 OR n_v = 0 THEN NULL"
    " ELSE CAST(s1_p AS DOUBLE) * s1_p / n_p"
    " + CAST(s1_c AS DOUBLE) * s1_c / n_c"
    " + CAST(s1_v AS DOUBLE) * s1_v / n_v END"
)
_ANOVA_SSB = "rsq - CAST(s1 AS DOUBLE) * s1 / n"
_ANOVA_SSW = "CAST(s2 AS DOUBLE) - rsq"
_ANOVA_F = (
    "CAST(CASE WHEN rsq IS NULL OR n <= 3 OR ssw <= 0 THEN NULL"
    " ELSE round((ssb / 2) / (ssw / (n - 3)), 6) END AS DOUBLE)"
)
_ANOVA_ETA2 = (
    "CAST(CASE WHEN rsq IS NULL OR ssb + ssw <= 0 THEN NULL"
    " ELSE round(ssb / (ssb + ssw), 6) END AS DOUBLE)"
)


@query(
    "a_one_way_anova",
    oracle=f"""
    WITH ev AS (
      SELECT CAST(round(value * 100) AS BIGINT) AS cents, event_type AS et
      FROM events
      WHERE value IS NOT NULL
        AND event_type IN ('purchase', 'click', 'view')
    ),
    g AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CASE WHEN et = 'purchase' THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_p,
             CAST(sum(CASE WHEN et = 'click' THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_c,
             CAST(sum(CASE WHEN et = 'view' THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_v,
             CAST(sum(CASE WHEN et = 'purchase' THEN cents ELSE 0 END)
                  AS BIGINT) AS s1_p,
             CAST(sum(CASE WHEN et = 'click' THEN cents ELSE 0 END)
                  AS BIGINT) AS s1_c,
             CAST(sum(CASE WHEN et = 'view' THEN cents ELSE 0 END)
                  AS BIGINT) AS s1_v,
             CAST(sum(cents) AS BIGINT) AS s1,
             CAST(sum(cents * cents) AS BIGINT) AS s2
      FROM ev
    ),
    r AS (SELECT *, {_ANOVA_RSQ} AS rsq FROM g),
    s AS (SELECT *, {_ANOVA_SSB} AS ssb, {_ANOVA_SSW} AS ssw FROM r)
    SELECT n, n_p, n_c, n_v, s1, s2,
           {_ANOVA_F} AS f_stat,
           {_ANOVA_ETA2} AS eta_squared
    FROM s
    """,
)
def a_one_way_anova(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way ANOVA F over value-cents by event type (purchase / click /
    view) — the parametric twin of a_kruskal_wallis (means, not ranks;
    the pair is the standard robustness cross-check: KW significant but
    F not ⇒ tails/outliers, not location). ONE conditional-aggregate
    pass yields every moment as an exact integer (n_j, Σcents_j, global
    Σcents, Σcents² — the a_cuped_adjustment discipline: no engine
    variance functions whose sample/population corrections differ);
    SSB = Σ s1_j²/n_j − s1²/N and SSW = Σcents² − Σ s1_j²/n_j are float
    expressions over that single row, with the shared Σ s1_j²/n_j term
    a NAMED column (computed once, fixed literal arm order) on both
    engines; F = (SSB/2)/(SSW/(N−3)) and η² round-6, empty-arm and
    zero-SSW guards both sides. Overflow bound (the a_welch_t_test
    class, stated for the audit gate): Σcents² at the ~1e5-cent price
    domain holds bigint to ~9e8 events; past that the wide_int
    DECIMAL(38) channel is the documented escape."""
    e = _t(spark, sf_dir, "events").where(
        F.col("value").isNotNull()
        & F.col("event_type").isin("purchase", "click", "view")
    )
    ev = e.select(
        F.expr("CAST(round(value * 100) AS BIGINT)").alias("cents"),
        F.col("event_type").alias("et"),
    )
    g = ev.groupBy().agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.expr("CASE WHEN et = 'purchase' THEN 1 ELSE 0 END")).alias(
            "n_p"
        ),
        F.sum(F.expr("CASE WHEN et = 'click' THEN 1 ELSE 0 END")).alias(
            "n_c"
        ),
        F.sum(F.expr("CASE WHEN et = 'view' THEN 1 ELSE 0 END")).alias(
            "n_v"
        ),
        F.sum(F.expr("CASE WHEN et = 'purchase' THEN cents ELSE 0 END")).alias(
            "s1_p"
        ),
        F.sum(F.expr("CASE WHEN et = 'click' THEN cents ELSE 0 END")).alias(
            "s1_c"
        ),
        F.sum(F.expr("CASE WHEN et = 'view' THEN cents ELSE 0 END")).alias(
            "s1_v"
        ),
        F.sum("cents").alias("s1"),
        F.sum(F.expr("cents * cents")).alias("s2"),
    )
    s = (
        g.withColumn("rsq", F.expr(_ANOVA_RSQ))
        .withColumn("ssb", F.expr(_ANOVA_SSB))
        .withColumn("ssw", F.expr(_ANOVA_SSW))
    )
    return s.select(
        "n", "n_p", "n_c", "n_v", "s1", "s2",
        F.expr(_ANOVA_F).alias("f_stat"),
        F.expr(_ANOVA_ETA2).alias("eta_squared"),
    )


@query(
    "f_ipv4_cidr_class",
    oracle="""
    WITH ips AS (
      SELECT doc_id,
             CAST((doc_id * 7 + 1) % 256 AS VARCHAR) || '.' ||
             CAST((doc_id * 13 + 2) % 256 AS VARCHAR) || '.' ||
             CAST((doc_id * 17 + 3) % 256 AS VARCHAR) || '.' ||
             CAST((doc_id * 19 + 4) % 256 AS VARCHAR) AS ip
      FROM documents
    ),
    parsed AS (
      SELECT doc_id, ip,
             CAST(string_split(ip, '.')[1] AS BIGINT) * 16777216
           + CAST(string_split(ip, '.')[2] AS BIGINT) * 65536
           + CAST(string_split(ip, '.')[3] AS BIGINT) * 256
           + CAST(string_split(ip, '.')[4] AS BIGINT) AS ip_num
      FROM ips
    ),
    classed AS (
      SELECT doc_id, ip, ip_num,
             CASE
               WHEN ip_num BETWEEN 167772160 AND 184549375
                 THEN 'private-10/8'
               WHEN ip_num BETWEEN 2886729728 AND 2887778303
                 THEN 'private-172.16/12'
               WHEN ip_num BETWEEN 3232235520 AND 3232301055
                 THEN 'private-192.168/16'
               ELSE 'public'
             END AS cidr_class
      FROM parsed
    )
    SELECT cidr_class,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(DISTINCT ip_num) AS BIGINT) AS n_distinct_ips,
           CAST(min(ip_num) AS BIGINT) AS min_ip_num,
           CAST(max(ip_num) AS BIGINT) AS max_ip_num
    FROM classed GROUP BY cidr_class
    """,
)
def f_ipv4_cidr_class(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IPv4 parse + CIDR-range classification — the network-log
    enrichment member of the f_* function family (access-log pipelines
    bucket client IPs into RFC 1918 private ranges vs public before
    any geo/abuse join): a synthetic dotted-quad per doc
    (construct-in-query, the t_pii_redact precedent — the corpus has
    no IP column, and a fabricated string exercises the REAL parse
    path), split on '.', recomposed into the 32-bit integer, then
    classified by literal CIDR bounds (a /n prefix IS an integer
    range, so BETWEEN with precomputed literals replaces bit-shifts —
    also sidesteps the '>>'-in-array F.expr parser trap). All-integer
    channels; modulo on nonnegative operands is engine-identical.
    Spark side uses F.get (NULL-returning) per the ANSI
    split-indexing rule even though 4 parts are structural."""
    d = _t(spark, sf_dir, "documents")
    ips = d.select(
        "doc_id",
        F.expr(
            "concat(CAST((doc_id * 7 + 1) % 256 AS STRING), '.',"
            " CAST((doc_id * 13 + 2) % 256 AS STRING), '.',"
            " CAST((doc_id * 17 + 3) % 256 AS STRING), '.',"
            " CAST((doc_id * 19 + 4) % 256 AS STRING))"
        ).alias("ip"),
    )
    parts = F.split(F.col("ip"), "\\.")
    parsed = ips.select(
        "doc_id",
        "ip",
        (
            F.get(parts, 0).cast("bigint") * 16777216
            + F.get(parts, 1).cast("bigint") * 65536
            + F.get(parts, 2).cast("bigint") * 256
            + F.get(parts, 3).cast("bigint")
        ).alias("ip_num"),
    )
    classed = parsed.select(
        "doc_id",
        "ip",
        "ip_num",
        F.expr(
            "CASE"
            " WHEN ip_num BETWEEN 167772160 AND 184549375"
            " THEN 'private-10/8'"
            " WHEN ip_num BETWEEN 2886729728 AND 2887778303"
            " THEN 'private-172.16/12'"
            " WHEN ip_num BETWEEN 3232235520 AND 3232301055"
            " THEN 'private-192.168/16'"
            " ELSE 'public' END"
        ).alias("cidr_class"),
    )
    return classed.groupBy("cidr_class").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("ip_num").alias("n_distinct_ips"),
        F.min("ip_num").alias("min_ip_num"),
        F.max("ip_num").alias("max_ip_num"),
    )


# Difference-in-differences shared formula: four cell means in FIXED
# textual order from exact integer sums; the estimator and each arm's
# delta are float expressions over one aggregated row.
_DID_CELLS = """
      SELECT CAST(sum(CASE WHEN tr = 1 AND po = 1 THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_tp,
             CAST(sum(CASE WHEN tr = 1 AND po = 0 THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_t0,
             CAST(sum(CASE WHEN tr = 0 AND po = 1 THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_cp,
             CAST(sum(CASE WHEN tr = 0 AND po = 0 THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_c0,
             CAST(sum(CASE WHEN tr = 1 AND po = 1 THEN cents ELSE 0 END)
                  AS BIGINT) AS s_tp,
             CAST(sum(CASE WHEN tr = 1 AND po = 0 THEN cents ELSE 0 END)
                  AS BIGINT) AS s_t0,
             CAST(sum(CASE WHEN tr = 0 AND po = 1 THEN cents ELSE 0 END)
                  AS BIGINT) AS s_cp,
             CAST(sum(CASE WHEN tr = 0 AND po = 0 THEN cents ELSE 0 END)
                  AS BIGINT) AS s_c0"""
_DID_TREND_T = "(CAST(s_tp AS DOUBLE) / n_tp - CAST(s_t0 AS DOUBLE) / n_t0)"
_DID_TREND_C = "(CAST(s_cp AS DOUBLE) / n_cp - CAST(s_c0 AS DOUBLE) / n_c0)"
_DID_GUARD = "n_tp = 0 OR n_t0 = 0 OR n_cp = 0 OR n_c0 = 0"
_DID_DELTA_T = (
    f"CAST(CASE WHEN {_DID_GUARD} THEN NULL"
    f" ELSE round({_DID_TREND_T}, 6) END AS DOUBLE)"
)
_DID_DELTA_C = (
    f"CAST(CASE WHEN {_DID_GUARD} THEN NULL"
    f" ELSE round({_DID_TREND_C}, 6) END AS DOUBLE)"
)
_DID_EST = (
    f"CAST(CASE WHEN {_DID_GUARD} THEN NULL"
    f" ELSE round({_DID_TREND_T} - {_DID_TREND_C}, 6) END AS DOUBLE)"
)


@query(
    "a_diff_in_diff",
    oracle=f"""
    WITH ev AS (
      SELECT CAST(round(value * 100) AS BIGINT) AS cents,
             CAST(user_id % 2 AS BIGINT) AS tr,
             CASE WHEN epoch_ms(ts) // 86400000 >= 19738 THEN 1 ELSE 0 END
               AS po
      FROM events
      WHERE value IS NOT NULL AND user_id IS NOT NULL
        AND event_type = 'purchase'
    ),
    g AS ({_DID_CELLS} FROM ev)
    SELECT n_tp, n_t0, n_cp, n_c0, s_tp, s_t0, s_cp, s_c0,
           {_DID_DELTA_T} AS treat_delta,
           {_DID_DELTA_C} AS control_delta,
           {_DID_EST} AS did_estimate
    FROM g
    """,
)
def a_diff_in_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Difference-in-differences estimator on purchase value — the
    causal-inference workhorse beside a_cuped_adjustment (CUPED reduces
    variance with a pre-period covariate; DiD removes the COMMON TREND:
    effect = (treat post − treat pre) − (control post − control pre)):
    treatment arm by user parity (the a_two_proportion_ztest split),
    period by an integer epoch-day literal (day >= 19738 = 2024-01-16,
    mid-corpus — never engine date functions), outcome in exact integer
    cents. ONE conditional-aggregate pass yields all eight 2×2 cell
    moments as bigints; the four means, both arm deltas and the DiD
    estimate are mirrored fixed-order float expressions (round-6,
    empty-cell guard both sides). Every channel before the final
    quotients is exact — the CUPED moments-in-integers discipline."""
    e = _t(spark, sf_dir, "events").where(
        F.col("value").isNotNull()
        & F.col("user_id").isNotNull()
        & (F.col("event_type") == "purchase")
    )
    ev = e.select(
        F.expr("CAST(round(value * 100) AS BIGINT)").alias("cents"),
        F.expr("CAST(user_id % 2 AS BIGINT)").alias("tr"),
        F.expr(
            "CASE WHEN unix_millis(ts) div 86400000 >= 19738"
            " THEN 1 ELSE 0 END"
        ).alias("po"),
    )
    agg_exprs = []
    for alias, expr in [
        ("n_tp", "CASE WHEN tr = 1 AND po = 1 THEN 1 ELSE 0 END"),
        ("n_t0", "CASE WHEN tr = 1 AND po = 0 THEN 1 ELSE 0 END"),
        ("n_cp", "CASE WHEN tr = 0 AND po = 1 THEN 1 ELSE 0 END"),
        ("n_c0", "CASE WHEN tr = 0 AND po = 0 THEN 1 ELSE 0 END"),
        ("s_tp", "CASE WHEN tr = 1 AND po = 1 THEN cents ELSE 0 END"),
        ("s_t0", "CASE WHEN tr = 1 AND po = 0 THEN cents ELSE 0 END"),
        ("s_cp", "CASE WHEN tr = 0 AND po = 1 THEN cents ELSE 0 END"),
        ("s_c0", "CASE WHEN tr = 0 AND po = 0 THEN cents ELSE 0 END"),
    ]:
        agg_exprs.append(F.sum(F.expr(expr)).alias(alias))
    g = ev.groupBy().agg(*agg_exprs)
    return g.select(
        "n_tp", "n_t0", "n_cp", "n_c0", "s_tp", "s_t0", "s_cp", "s_c0",
        F.expr(_DID_DELTA_T).alias("treat_delta"),
        F.expr(_DID_DELTA_C).alias("control_delta"),
        F.expr(_DID_EST).alias("did_estimate"),
    )


# Normal quantiles for the MDE calculator, precomputed from the stdlib
# (statistics.NormalDist) and rendered as repr literals into BOTH
# engines — the SPRT transcendental-literal discipline: no in-engine
# quantile function ever runs.
from statistics import NormalDist as _ND  # noqa: E402

MDE_Z_ALPHA = _ND().inv_cdf(0.975)  # two-sided alpha = 5%
MDE_Z_BETA = _ND().inv_cdf(0.8)  # power = 80%
_MDE_ZSUM = repr(MDE_Z_ALPHA + MDE_Z_BETA)
_MDE_P = "(CAST(k_a + k_b AS DOUBLE) / (n_a + n_b))"
_MDE_EXPR = (
    f"({_MDE_ZSUM} * sqrt({_MDE_P} * (1 - {_MDE_P}) * (1 / n_a + 1 / n_b)))"
)
_MDE_DIFF = "(CAST(k_b AS DOUBLE) / n_b - CAST(k_a AS DOUBLE) / n_a)"
_MDE_GUARD = "n_a = 0 OR n_b = 0"


@query(
    "a_mde_power",
    oracle=f"""
    WITH {_PARITY_CONV_CELLS_SQL}
    SELECT n_a, n_b, k_a, k_b,
           CAST(CASE WHEN {_MDE_GUARD} THEN NULL
                ELSE round({_MDE_P}, 6) END AS DOUBLE) AS p_pool,
           CAST(CASE WHEN {_MDE_GUARD} THEN NULL
                ELSE round({_MDE_DIFF}, 6) END AS DOUBLE) AS observed_diff,
           CAST(CASE WHEN {_MDE_GUARD} THEN NULL
                ELSE round({_MDE_EXPR}, 6) END AS DOUBLE) AS mde,
           CAST(CASE WHEN {_MDE_GUARD} THEN NULL
                WHEN abs({_MDE_DIFF}) >= {_MDE_EXPR} THEN 1 ELSE 0
                END AS INT) AS detectable
    FROM g
    """,
)
def a_mde_power(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Minimum detectable effect at 80% power for the parity-split
    conversion A/B test — the PLANNING companion of
    a_two_proportion_ztest (the z-test answers 'is the observed split
    significant?'; the MDE answers 'how small an effect could this
    sample even see?', which is the question an experimenter asks
    BEFORE reading the z): per-user conversion (>=1 purchase) by the
    same parity arms, exact integer cell counts from one aggregate,
    then MDE = (z_{α/2} + z_β)·sqrt(p̂(1−p̂)(1/n_a + 1/n_b)) with both
    normal quantiles precomputed from stdlib statistics.NormalDist and
    rendered as repr literals into BOTH engines (the SPRT
    transcendental-literal discipline — no in-engine quantile/erf ever
    runs). Integer-only literals elsewhere (1/n is float division in
    both engines); round-6; the detectable flag compares UNROUNDED
    doubles identically on both sides. Cell build = the
    _parity_conversion_cells kernel shared with a_two_proportion_ztest
    — the MDE budgets exactly the population the z-test reads."""
    g = _parity_conversion_cells(spark, sf_dir)
    return g.select(
        "n_a", "n_b", "k_a", "k_b",
        F.expr(
            f"CAST(CASE WHEN {_MDE_GUARD} THEN NULL"
            f" ELSE round({_MDE_P}, 6) END AS DOUBLE)"
        ).alias("p_pool"),
        F.expr(
            f"CAST(CASE WHEN {_MDE_GUARD} THEN NULL"
            f" ELSE round({_MDE_DIFF}, 6) END AS DOUBLE)"
        ).alias("observed_diff"),
        F.expr(
            f"CAST(CASE WHEN {_MDE_GUARD} THEN NULL"
            f" ELSE round({_MDE_EXPR}, 6) END AS DOUBLE)"
        ).alias("mde"),
        F.expr(
            f"CAST(CASE WHEN {_MDE_GUARD} THEN NULL"
            f" WHEN abs({_MDE_DIFF}) >= {_MDE_EXPR} THEN 1 ELSE 0"
            " END AS INT)"
        ).alias("detectable"),
    )


# Benjamini-Hochberg critical values for the FIXED m = 25 nation domain
# (TPC-H spec cardinality — a structural constant, not a data count):
# the i-th largest |z| is compared against z_{1 - (i*alpha/m)/2},
# precomputed via stdlib NormalDist and rendered as repr literals into
# a VALUES table on BOTH engines (the MDE/SPRT literal discipline).
_BH_M = 25
_BH_CRITS = [
    (i, _ND().inv_cdf(1 - (i * 0.05 / _BH_M) / 2))
    for i in range(1, _BH_M + 1)
]
_BH_VALUES = ", ".join(f"({i}, {repr(c)})" for i, c in _BH_CRITS)
_BH_Z_P = "(CAST(c1 + c2 AS DOUBLE) / (n1 + n2))"
_BH_Z_VAR = f"({_BH_Z_P} * (1 - {_BH_Z_P}) * (1 / n1 + 1 / n2))"
_BH_Z = (
    f"CASE WHEN n1 = 0 OR n2 = 0 OR {_BH_Z_VAR} = 0 THEN NULL"
    f" ELSE (CAST(c2 AS DOUBLE) / n2 - CAST(c1 AS DOUBLE) / n1)"
    f" / sqrt({_BH_Z_VAR}) END"
)


@query(
    "a_benjamini_hochberg",
    oracle=f"""
    WITH ocnt AS (
      SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_orders
      FROM orders GROUP BY o_custkey
    ),
    cust AS (
      SELECT n.n_name, c.c_custkey % 2 AS arm,
             CASE WHEN coalesce(oc.n_orders, 0) >= 10 THEN 1 ELSE 0 END
               AS converted
      FROM customer c
      JOIN nation n ON n.n_nationkey = c.c_nationkey
      LEFT JOIN ocnt oc ON oc.o_custkey = c.c_custkey
    ),
    g AS (
      SELECT n_name,
             CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
             CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n2,
             CAST(sum(CASE WHEN arm = 0 THEN converted ELSE 0 END)
                  AS BIGINT) AS c1,
             CAST(sum(CASE WHEN arm = 1 THEN converted ELSE 0 END)
                  AS BIGINT) AS c2
      FROM cust GROUP BY n_name
    ),
    z AS (SELECT *, {_BH_Z} AS zval FROM g),
    ranked AS (
      SELECT *, CAST(row_number() OVER (
               ORDER BY abs(zval) DESC, n_name
             ) AS BIGINT) AS rnk
      FROM z WHERE zval IS NOT NULL
    ),
    crits(rnk, crit) AS (VALUES {_BH_VALUES}),
    hits AS (
      SELECT r.*, c.crit,
             CASE WHEN abs(r.zval) >= c.crit THEN 1 ELSE 0 END AS hit
      FROM ranked r JOIN crits c USING (rnk)
    )
    SELECT n_name, n1, n2, c1, c2,
           CAST(round(zval, 6) AS DOUBLE) AS z_score,
           CAST(rnk AS INT) AS rank,
           CAST(round(crit, 6) AS DOUBLE) AS bh_crit,
           CAST(max(hit) OVER (ORDER BY rnk
             ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
             AS INT) AS bh_reject
    FROM hits
    """,
)
def a_benjamini_hochberg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benjamini-Hochberg FDR control over 25 simultaneous per-nation
    A/B tests — the MULTIPLE-testing surface the single-test entries
    (z, Welch, MW, KS …) deliberately lack, and the first thing a
    metrics platform running one test per segment actually needs:
    per-nation parity-split 'heavy buyer' z (>= 10 lifetime orders —
    'any order' is degenerate in this corpus where every customer has
    one; exact integer cells, the a_mde_power machinery), nations ranked by |z| desc (unrounded z,
    deterministic name tiebreak), each rank compared against its
    precomputed literal critical value z_{1−(i·α/m)/2} with m = 25
    FIXED BY THE TPC-H SPEC (a structural constant like the fixed
    centroids — nations missing at tiny SF make the procedure strictly
    conservative, documented), and the BH step-up rule 'reject every
    rank ≤ the largest hit' as a suffix max over the ≤25-row ranked
    frame (bounded by the constant domain — the one unpartitioned
    window is 25 rows at ANY scale). All quantiles are stdlib-
    precomputed repr literals; no in-engine erf/quantile runs."""
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    o = _t(spark, sf_dir, "orders")
    ocnt = o.groupBy("o_custkey").agg(F.count(F.lit(1)).alias("n_orders"))
    conv = (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(ocnt, c.c_custkey == F.col("o_custkey"), "left")
        .select(
            "n_name",
            F.expr("c_custkey % 2").alias("arm"),
            F.expr(
                "CASE WHEN coalesce(n_orders, 0) >= 10 THEN 1 ELSE 0 END"
            ).alias("converted"),
        )
    )
    g = conv.groupBy("n_name").agg(
        F.sum(F.expr("CASE WHEN arm = 0 THEN 1 ELSE 0 END")).alias("n1"),
        F.sum(F.expr("CASE WHEN arm = 1 THEN 1 ELSE 0 END")).alias("n2"),
        F.sum(F.expr("CASE WHEN arm = 0 THEN converted ELSE 0 END")).alias(
            "c1"
        ),
        F.sum(F.expr("CASE WHEN arm = 1 THEN converted ELSE 0 END")).alias(
            "c2"
        ),
    )
    z = g.withColumn("zval", F.expr(_BH_Z)).where(F.col("zval").isNotNull())
    ranked = z.withColumn(
        "rnk",
        F.expr(
            "CAST(row_number() OVER (ORDER BY abs(zval) DESC, n_name)"
            " AS BIGINT)"
        ),
    )
    crits = spark.createDataFrame(_BH_CRITS, "rnk long, crit double")
    hits = ranked.join(F.broadcast(crits), "rnk").withColumn(
        "hit", F.expr("CASE WHEN abs(zval) >= crit THEN 1 ELSE 0 END")
    )
    return hits.select(
        "n_name", "n1", "n2", "c1", "c2",
        F.expr("CAST(round(zval, 6) AS DOUBLE)").alias("z_score"),
        F.col("rnk").cast("int").alias("rank"),
        F.expr("CAST(round(crit, 6) AS DOUBLE)").alias("bh_crit"),
        F.expr(
            "CAST(max(hit) OVER (ORDER BY rnk"
            " ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS INT)"
        ).alias("bh_reject"),
    )


@query(
    "a_sample_ratio_mismatch",
    oracle=f"""
    WITH {_PARITY_CONV_CELLS_SQL}
    SELECT n_a, n_b,
           CAST(CASE WHEN n_a + n_b = 0 THEN NULL
                ELSE round(CAST((n_a - n_b) AS DOUBLE) * (n_a - n_b)
                     / (n_a + n_b), 6) END AS DOUBLE) AS srm_chi2,
           CAST(CASE WHEN n_a + n_b = 0 THEN NULL
                WHEN CAST((n_a - n_b) AS DOUBLE) * (n_a - n_b)
                     / (n_a + n_b) > 3.841458820694124 THEN 1 ELSE 0
                END AS INT) AS srm_flag
    FROM g
    """,
)
def a_sample_ratio_mismatch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample-ratio-mismatch check on the parity A/B split — the
    guardrail every experimentation platform runs BEFORE reading any
    test (a split that isn't the designed 50/50 invalidates the z-test
    and the MDE no matter how significant they look): χ² =
    (n_a − n_b)²/(n_a + n_b) against the 1-df 5% critical value
    3.841458820694124 (a precomputed literal — chi2.ppf(0.95, 1) =
    inv_cdf(0.975)², stdlib-derived, the BH/MDE literal discipline).
    Rides the SAME _parity_conversion_cells kernel as the z-test and
    the MDE, so all three guardrails read one population by
    construction. The flag compares UNROUNDED doubles identically on
    both sides."""
    g = _parity_conversion_cells(spark, sf_dir)
    return g.select(
        "n_a", "n_b",
        F.expr(
            "CAST(CASE WHEN n_a + n_b = 0 THEN NULL"
            " ELSE round(CAST((n_a - n_b) AS DOUBLE) * (n_a - n_b)"
            " / (n_a + n_b), 6) END AS DOUBLE)"
        ).alias("srm_chi2"),
        F.expr(
            "CAST(CASE WHEN n_a + n_b = 0 THEN NULL"
            " WHEN CAST((n_a - n_b) AS DOUBLE) * (n_a - n_b)"
            " / (n_a + n_b) > 3.841458820694124 THEN 1 ELSE 0"
            " END AS INT)"
        ).alias("srm_flag"),
    )


@query(
    "o_partition_backfill_plan",
    oracle="""
    WITH daily AS (
      SELECT epoch_ms(ts) // 86400000 AS d,
             CAST(count(*) AS BIGINT) AS n_events
      FROM events GROUP BY 1
    ),
    bounds AS (
      SELECT min(d) AS lo, max(d) AS hi,
             quantile_cont(CAST(n_events AS DOUBLE), 0.5) AS med
      FROM daily
    ),
    cal AS (
      SELECT CAST(t.day AS BIGINT) AS day, b.med
      FROM bounds b, LATERAL (
        SELECT unnest(range(b.lo, b.hi + 1)) AS day
      ) t
    )
    SELECT c.day,
           CAST(coalesce(dd.n_events, 0) AS BIGINT) AS n_events,
           CAST(round(c.med, 4) AS DOUBLE) AS median_daily,
           CAST(CASE WHEN coalesce(dd.n_events, 0) < c.med / 2
                THEN 1 ELSE 0 END AS INT) AS backfill
    FROM cal c LEFT JOIN daily dd ON dd.d = c.day
    """,
)
def o_partition_backfill_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition-completeness audit + backfill plan — the orchestration
    question behind every daily-partitioned table ('which partition
    dates are MISSING or suspiciously thin and need a re-run?'): the
    observed min..max epoch-day range expands to a full calendar
    (sequence + explode — the m_gap_fill_forward machinery; absent
    days appear with 0, never silently skipped), each day's count is
    compared against HALF the median observed daily count (median via
    the exact percentile ≡ quantile_cont channel; the threshold is
    med/2 — an integer-literal divisor, no decimal channel), and the
    flag compares unrounded doubles identically on both sides. Day
    ships as the integer epoch-day (the no-date-channel rule). The
    calendar frame is span-bounded — it cannot grow with data volume,
    only with elapsed time."""
    e = _t(spark, sf_dir, "events")
    daily = e.groupBy(
        F.expr("unix_millis(ts) div 86400000").alias("d")
    ).agg(F.count(F.lit(1)).alias("n_events"))
    bounds = daily.groupBy().agg(
        F.min("d").alias("lo"),
        F.max("d").alias("hi"),
        F.expr("percentile(CAST(n_events AS DOUBLE), 0.5)").alias("med"),
    )
    cal = bounds.select(
        F.explode(F.expr("sequence(lo, hi)")).alias("day"), "med"
    )
    return (
        cal.join(daily, cal.day == daily.d, "left")
        .select(
            "day",
            F.expr("CAST(coalesce(n_events, 0) AS BIGINT)").alias(
                "n_events"
            ),
            F.expr("CAST(round(med, 4) AS DOUBLE)").alias("median_daily"),
            F.expr(
                "CAST(CASE WHEN coalesce(n_events, 0) < med / 2"
                " THEN 1 ELSE 0 END AS INT)"
            ).alias("backfill"),
        )
    )


# literal price bands (cents): the banded-dimension shape — a tiny
# range dimension joined non-equi against the fact stream
_PRICE_BANDS = [
    ("b0_under_50", 0, 5000),
    ("b1_50_100", 5000, 10000),
    ("b2_100_200", 10000, 20000),
    ("b3_200_500", 20000, 50000),
    ("b4_500_plus", 50000, None),
]
_PRICE_BANDS_VALUES = ", ".join(
    f"('{n}', {lo}, {'NULL' if hi is None else hi})"
    for n, lo, hi in _PRICE_BANDS
)


@query(
    "j_price_band_join",
    oracle=f"""
    WITH bands(band, lo, hi) AS (VALUES {_PRICE_BANDS_VALUES}),
    ev AS (
      SELECT CAST(round(value * 100) AS BIGINT) AS cents
      FROM events WHERE value IS NOT NULL AND event_type = 'purchase'
    )
    SELECT b.band,
           CAST(b.lo AS BIGINT) AS lo_cents,
           CAST(count(e.cents) AS BIGINT) AS n_events,
           CAST(coalesce(sum(e.cents), 0) AS BIGINT) AS total_cents
    FROM bands b LEFT JOIN ev e
      ON e.cents >= b.lo AND (b.hi IS NULL OR e.cents < b.hi)
    GROUP BY b.band, b.lo
    """,
)
def j_price_band_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banded-dimension theta join — the 'bucket by a tiny range
    dimension' join shape (rate cards, tax brackets, pricing tiers)
    the equi/as-of/interval joins don't cover: a 5-row LITERAL band
    table (structural constant → broadcast class 2) joined non-equi
    (lo <= cents < hi, open-ended top band via NULL hi) against the
    purchase stream; LEFT from the bands so an EMPTY band still ships
    its row with zeros (never silently absent — the backfill-plan
    discipline). Plan: BroadcastNestedLoopJoin with the fact side
    never shuffling; the aggregate is partial+final over 5 groups.
    All-integer channels. At 100 TB the same plan holds — the band
    side is constant-size by construction."""
    bands = spark.createDataFrame(
        _PRICE_BANDS, "band string, lo long, hi long"
    )
    ev = _t(spark, sf_dir, "events").where(
        F.col("value").isNotNull() & (F.col("event_type") == "purchase")
    ).select(F.expr("CAST(round(value * 100) AS BIGINT)").alias("cents"))
    j = F.broadcast(bands).join(
        ev,
        (F.col("cents") >= F.col("lo"))
        & (F.col("hi").isNull() | (F.col("cents") < F.col("hi"))),
        "left",
    )
    return j.groupBy("band", "lo").agg(
        F.count("cents").alias("n_events"),
        F.expr("CAST(coalesce(sum(cents), 0) AS BIGINT)").alias(
            "total_cents"
        ),
    ).select(
        "band",
        F.col("lo").cast("long").alias("lo_cents"),
        "n_events",
        "total_cents",
    )


# literal keyset cursor for the pagination entry — "the page after
# (custkey 50, orderkey 100)", page size 20 (custkey 50 exists at
# every testdata scale — 150 customers at sf0.001)
_KEYSET_C, _KEYSET_O, _KEYSET_N = 50, 100, 20


@query(
    "w_keyset_pagination",
    oracle=f"""
    SELECT o_custkey, o_orderkey,
           CAST(round(o_totalprice, 2) AS DOUBLE) AS total_price
    FROM orders
    WHERE o_custkey > {_KEYSET_C}
       OR (o_custkey = {_KEYSET_C} AND o_orderkey > {_KEYSET_O})
    ORDER BY o_custkey, o_orderkey
    LIMIT {_KEYSET_N}
    """,
)
def w_keyset_pagination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyset (cursor) pagination — the serving-path scan shape every
    API backed by this engine actually runs (OFFSET pagination re-reads
    and re-sorts the whole prefix; a keyset cursor turns page N+1 into
    a range predicate + top-k): rows strictly after the literal cursor
    (custkey, orderkey) in the composite order, expressed as the
    row-value comparison's disjunctive normal form (pushable —
    `(a,b) > (x,y)` as a struct comparison does NOT reach parquet
    filters), then ORDER BY + LIMIT which Catalyst plans as
    TakeOrderedAndProject — no global sort materializes at any scale
    and the predicate prunes at the scan. The S3 key-range scan's
    composite-key sibling."""
    o = _t(spark, sf_dir, "orders")
    page = (
        o.where(
            (F.col("o_custkey") > _KEYSET_C)
            | (
                (F.col("o_custkey") == _KEYSET_C)
                & (F.col("o_orderkey") > _KEYSET_O)
            )
        )
        .select(
            "o_custkey",
            "o_orderkey",
            F.round("o_totalprice", 2).cast("double").alias("total_price"),
        )
        .orderBy("o_custkey", "o_orderkey")
        .limit(_KEYSET_N)
    )
    return page


@query(
    "f_base64_roundtrip",
    oracle="""
    WITH base AS (
      SELECT doc_id, substring(text, 1, 24) AS s
      FROM documents
      WHERE doc_id < 200 AND regexp_matches(text, '^[ -~]{24}')
    )
    SELECT doc_id,
           to_base64(encode(s)) AS b64,
           CAST(length(to_base64(encode(s))) AS BIGINT) AS b64_len,
           CAST(CASE WHEN decode(from_base64(to_base64(encode(s)))) = s
                THEN 1 ELSE 0 END AS INT) AS roundtrip_ok
    FROM base
    """,
)
def f_base64_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Base64 encode/decode — the binary-codec member of the f_*
    function family (payload transport for the engine's opaque
    Array[Byte] values — SURVEY §1.2's SerializedMessage is exactly a
    bytes+headers record, and base64 is how those bytes cross JSON/
    text boundaries): each doc's first 24 printable-ASCII chars
    (chars == bytes, the mm_* filter discipline) encode UTF-8 →
    base64 → decode back, with the roundtrip equality shipped as a
    flag BOTH engines compute (RFC 4648 standard alphabet + '='
    padding in both — the b64 string itself is value-compared too,
    so an alphabet/padding divergence would hash-mismatch, not just
    flip the flag). Pure string channels, map-side only."""
    docs = (
        _t(spark, sf_dir, "documents")
        .where(F.col("doc_id") < 200)
        .where(F.col("text").rlike("^[ -~]{24}"))
        .select("doc_id", F.substring("text", 1, 24).alias("s"))
    )
    return docs.select(
        "doc_id",
        F.base64(F.encode("s", "utf-8")).alias("b64"),
        F.length(F.base64(F.encode("s", "utf-8"))).cast("long").alias(
            "b64_len"
        ),
        F.expr(
            "CAST(CASE WHEN decode(unbase64(base64(encode(s, 'utf-8'))),"
            " 'utf-8') = s THEN 1 ELSE 0 END AS INT)"
        ).alias("roundtrip_ok"),
    )


# TOST equivalence margin (cents) and the one-sided 5% normal quantile
# (stdlib literal, the MDE/BH discipline)
_TOST_DELTA = 500
_TOST_Z = repr(_ND().inv_cdf(0.95))
_TOST_MEAN_A = "(CAST(s1_a AS DOUBLE) / n_a)"
_TOST_MEAN_B = "(CAST(s1_b AS DOUBLE) / n_b)"
# greatest(var, 0) BOTH sides (the m_bollinger_bands clamp class): a
# near-constant arm's s2/n - mean^2 can underflow to a tiny negative
# double — DuckDB sqrt then RAISES while Spark ships NaN the se=0
# guard never catches
_TOST_VAR_A = (
    f"(greatest(CAST(s2_a AS DOUBLE) / n_a"
    f" - {_TOST_MEAN_A} * {_TOST_MEAN_A}, 0) / n_a)"
)
_TOST_VAR_B = (
    f"(greatest(CAST(s2_b AS DOUBLE) / n_b"
    f" - {_TOST_MEAN_B} * {_TOST_MEAN_B}, 0) / n_b)"
)
_TOST_SE = f"sqrt({_TOST_VAR_A} + {_TOST_VAR_B})"
_TOST_DIFF = f"({_TOST_MEAN_B} - {_TOST_MEAN_A})"
_TOST_GUARD = f"n_a < 2 OR n_b < 2 OR {_TOST_SE} = 0"
_TOST_ZL = f"(({_TOST_DIFF} + {_TOST_DELTA}) / {_TOST_SE})"
_TOST_ZU = f"(({_TOST_DELTA} - {_TOST_DIFF}) / {_TOST_SE})"


@query(
    "a_tost_equivalence",
    oracle=f"""
    WITH ev AS (
      SELECT CAST(round(value * 100) AS BIGINT) AS cents,
             CAST(user_id % 2 AS BIGINT) AS arm
      FROM events
      WHERE value IS NOT NULL AND user_id IS NOT NULL
        AND event_type = 'purchase'
    ),
    g AS (
      SELECT CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_a,
             CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_b,
             CAST(sum(CASE WHEN arm = 0 THEN cents ELSE 0 END) AS BIGINT)
               AS s1_a,
             CAST(sum(CASE WHEN arm = 1 THEN cents ELSE 0 END) AS BIGINT)
               AS s1_b,
             CAST(sum(CASE WHEN arm = 0 THEN cents * cents ELSE 0 END)
               AS BIGINT) AS s2_a,
             CAST(sum(CASE WHEN arm = 1 THEN cents * cents ELSE 0 END)
               AS BIGINT) AS s2_b
      FROM ev
    )
    SELECT n_a, n_b, s1_a, s1_b,
           CAST(CASE WHEN {_TOST_GUARD} THEN NULL
                ELSE round({_TOST_DIFF}, 6) END AS DOUBLE) AS mean_diff,
           CAST(CASE WHEN {_TOST_GUARD} THEN NULL
                ELSE round({_TOST_SE}, 6) END AS DOUBLE) AS se,
           CAST(CASE WHEN {_TOST_GUARD} THEN NULL
                ELSE round({_TOST_ZL}, 6) END AS DOUBLE) AS z_lower,
           CAST(CASE WHEN {_TOST_GUARD} THEN NULL
                ELSE round({_TOST_ZU}, 6) END AS DOUBLE) AS z_upper,
           CAST(CASE WHEN {_TOST_GUARD} THEN NULL
                WHEN {_TOST_ZL} >= {_TOST_Z} AND {_TOST_ZU} >= {_TOST_Z}
                THEN 1 ELSE 0 END AS INT) AS equivalent
    FROM g
    """,
)
def a_tost_equivalence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TOST equivalence test (two one-sided tests) on purchase value by
    the parity split — the experimentation suite's missing direction
    (the z-test can only REJECT equality; TOST is how you POSITIVELY
    conclude 'the arms are the same to within ±$5', the do-no-harm
    launch criterion): both one-sided z's against the literal ±500-
    cent margin must clear the one-sided 5% normal quantile (stdlib
    repr literal, the MDE/BH discipline). Moments are exact integer
    (Σcents, Σcents² — the a_one_way_anova bigint bound class,
    documented in the audit gate); mean/variance/se are mirrored
    fixed-order float expressions; the equivalence flag compares
    UNROUNDED doubles identically on both sides; n<2 or zero-se
    guards both sides. Population-variance form (the
    a_distribution_moments convention — no engine variance functions
    whose corrections differ)."""
    e = _t(spark, sf_dir, "events").where(
        F.col("value").isNotNull()
        & F.col("user_id").isNotNull()
        & (F.col("event_type") == "purchase")
    )
    ev = e.select(
        F.expr("CAST(round(value * 100) AS BIGINT)").alias("cents"),
        F.expr("CAST(user_id % 2 AS BIGINT)").alias("arm"),
    )
    g = ev.groupBy().agg(
        F.sum(F.expr("CASE WHEN arm = 0 THEN 1 ELSE 0 END")).alias("n_a"),
        F.sum(F.expr("CASE WHEN arm = 1 THEN 1 ELSE 0 END")).alias("n_b"),
        F.sum(F.expr("CASE WHEN arm = 0 THEN cents ELSE 0 END")).alias(
            "s1_a"
        ),
        F.sum(F.expr("CASE WHEN arm = 1 THEN cents ELSE 0 END")).alias(
            "s1_b"
        ),
        F.sum(
            F.expr("CASE WHEN arm = 0 THEN cents * cents ELSE 0 END")
        ).alias("s2_a"),
        F.sum(
            F.expr("CASE WHEN arm = 1 THEN cents * cents ELSE 0 END")
        ).alias("s2_b"),
    )
    return g.select(
        "n_a", "n_b", "s1_a", "s1_b",
        F.expr(
            f"CAST(CASE WHEN {_TOST_GUARD} THEN NULL"
            f" ELSE round({_TOST_DIFF}, 6) END AS DOUBLE)"
        ).alias("mean_diff"),
        F.expr(
            f"CAST(CASE WHEN {_TOST_GUARD} THEN NULL"
            f" ELSE round({_TOST_SE}, 6) END AS DOUBLE)"
        ).alias("se"),
        F.expr(
            f"CAST(CASE WHEN {_TOST_GUARD} THEN NULL"
            f" ELSE round({_TOST_ZL}, 6) END AS DOUBLE)"
        ).alias("z_lower"),
        F.expr(
            f"CAST(CASE WHEN {_TOST_GUARD} THEN NULL"
            f" ELSE round({_TOST_ZU}, 6) END AS DOUBLE)"
        ).alias("z_upper"),
        F.expr(
            f"CAST(CASE WHEN {_TOST_GUARD} THEN NULL"
            f" WHEN {_TOST_ZL} >= {_TOST_Z} AND {_TOST_ZU} >= {_TOST_Z}"
            " THEN 1 ELSE 0 END AS INT)"
        ).alias("equivalent"),
    )


# literal candidate split thresholds (cents) for the decision-stump
# entry — structural constants spanning the price domain
_SPLIT_THRESHOLDS = [2000, 5000, 10000, 20000, 50000]
_SPLIT_THR_VALUES = ", ".join(f"({t})" for t in _SPLIT_THRESHOLDS)
_GINI_L = "(1 - (CAST(kl AS DOUBLE) / nl) * (CAST(kl AS DOUBLE) / nl)"\
    " - (CAST(nl - kl AS DOUBLE) / nl) * (CAST(nl - kl AS DOUBLE) / nl))"
_GINI_R = "(1 - (CAST(kr AS DOUBLE) / nr) * (CAST(kr AS DOUBLE) / nr)"\
    " - (CAST(nr - kr AS DOUBLE) / nr) * (CAST(nr - kr AS DOUBLE) / nr))"
_GINI_W = f"((nl * {_GINI_L} + nr * {_GINI_R}) / (nl + nr))"


@query(
    "a_best_split_gini",
    oracle=f"""
    WITH ev AS (
      SELECT CAST(round(value * 100) AS BIGINT) AS cents,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
      FROM events
      WHERE value IS NOT NULL AND event_type IN ('purchase', 'click')
    ),
    thr(t) AS (VALUES {_SPLIT_THR_VALUES}),
    cells AS (
      -- LEFT JOIN (not CROSS): an empty events slice must still yield
      -- all 5 threshold rows with zero cells, matching the Spark
      -- global-agg + inline_outer shape (review finding — the
      -- a_subsample_ci empty-input class)
      SELECT t.t AS threshold,
             CAST(sum(CASE WHEN e.cents < t.t THEN 1 ELSE 0 END)
                  AS BIGINT) AS nl,
             CAST(sum(CASE WHEN e.cents < t.t THEN e.y ELSE 0 END)
                  AS BIGINT) AS kl,
             CAST(sum(CASE WHEN e.cents >= t.t THEN 1 ELSE 0 END)
                  AS BIGINT) AS nr,
             CAST(sum(CASE WHEN e.cents >= t.t THEN e.y ELSE 0 END)
                  AS BIGINT) AS kr
      FROM thr t LEFT JOIN ev e ON true GROUP BY t.t
    ),
    scored AS (
      SELECT threshold, nl, kl, nr, kr,
             CASE WHEN nl = 0 OR nr = 0 THEN NULL
                  ELSE round({_GINI_W}, 6) END AS impurity
      FROM cells
    )
    SELECT CAST(threshold AS BIGINT) AS threshold, nl, kl, nr, kr,
           CAST(impurity AS DOUBLE) AS impurity,
           CAST(CASE WHEN impurity IS NULL THEN 0
                WHEN row_number() OVER (
                  ORDER BY (impurity IS NULL), impurity, threshold) = 1
                THEN 1 ELSE 0 END AS INT) AS is_best
    FROM scored
    """,
)
def a_best_split_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decision-stump split search — the feature-engineering primitive
    behind every tree learner ('which price threshold best separates
    purchases from clicks?'): 5 LITERAL candidate thresholds
    (structural constants spanning the price domain), per-threshold
    2×2 cells, weighted Gini impurity, and the argmin flagged. The
    Spark plan computes ALL 20 cell sums in ONE pass over the events
    slice (conditional aggregates) and fans the single row out to 5
    threshold rows with inline_outer over a literal struct array —
    the oracle instead aggregates per threshold over a 5× cross join
    (different plan, identical integers — the value check is on the
    CELLS, not the plan). Impurity is a mirrored fixed-order float
    formula (round-6, empty-side guard both sides); the best flag
    ranks rounded impurity with threshold tiebreak over the 5-row
    frame."""
    e = _t(spark, sf_dir, "events").where(
        F.col("value").isNotNull()
        & F.col("event_type").isin("purchase", "click")
    )
    ev = e.select(
        F.expr("CAST(round(value * 100) AS BIGINT)").alias("cents"),
        F.expr(
            "CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END"
        ).alias("y"),
    )
    aggs = []
    # sums coalesced to 0: an empty slice makes the global aggregate's
    # one row all-NULL, but the oracle's LEFT-JOIN cells are zeros —
    # the shipped integers must match (review finding)
    for i, t in enumerate(_SPLIT_THRESHOLDS):
        for alias, expr in [
            (f"nl{i}", f"CASE WHEN cents < {t} THEN 1 ELSE 0 END"),
            (f"kl{i}", f"CASE WHEN cents < {t} THEN y ELSE 0 END"),
            (f"nr{i}", f"CASE WHEN cents >= {t} THEN 1 ELSE 0 END"),
            (f"kr{i}", f"CASE WHEN cents >= {t} THEN y ELSE 0 END"),
        ]:
            aggs.append(
                F.coalesce(F.sum(F.expr(expr)), F.lit(0))
                .cast("long")
                .alias(alias)
            )
    g = ev.groupBy().agg(*aggs)
    structs = ", ".join(
        f"struct(CAST({t} AS BIGINT) AS threshold, nl{i} AS nl,"
        f" kl{i} AS kl, nr{i} AS nr, kr{i} AS kr)"
        for i, t in enumerate(_SPLIT_THRESHOLDS)
    )
    cells = g.select(
        F.expr(f"inline_outer(array({structs}))")
    )
    scored = cells.withColumn(
        "impurity",
        F.expr(
            "CASE WHEN nl = 0 OR nr = 0 THEN NULL"
            f" ELSE round({_GINI_W}, 6) END"
        ),
    )
    return scored.select(
        "threshold", "nl", "kl", "nr", "kr",
        F.col("impurity").cast("double").alias("impurity"),
        F.expr(
            "CAST(CASE WHEN impurity IS NULL THEN 0"
            " WHEN row_number() OVER ("
            " ORDER BY (impurity IS NULL), impurity, threshold) = 1"
            " THEN 1 ELSE 0 END AS INT)"
        ).alias("is_best"),
    )


@query(
    "w_ohlc_bars",
    oracle="""
    WITH ev AS (
      SELECT epoch_ms(ts) // 86400000 AS d, epoch_ms(ts) AS ms, event_id,
             CAST(round(value * 100) AS BIGINT) AS cents
      FROM events WHERE value IS NOT NULL AND event_type = 'purchase'
    ),
    rn AS (
      SELECT *,
             row_number() OVER (PARTITION BY d ORDER BY ms, event_id)
               AS r_open,
             row_number() OVER (PARTITION BY d ORDER BY ms DESC,
               event_id DESC) AS r_close
      FROM ev
    )
    SELECT d AS day,
           CAST(count(*) AS BIGINT) AS n_trades,
           CAST(max(CASE WHEN r_open = 1 THEN cents END) AS BIGINT)
             AS open_cents,
           CAST(max(cents) AS BIGINT) AS high_cents,
           CAST(min(cents) AS BIGINT) AS low_cents,
           CAST(max(CASE WHEN r_close = 1 THEN cents END) AS BIGINT)
             AS close_cents,
           CAST(sum(cents) AS BIGINT) AS volume_cents
    FROM rn GROUP BY d
    """,
)
def w_ohlc_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily OHLC(V) bars over the purchase stream — the candlestick
    rollup every financial/metrics downsampler ships (and the batch
    form of a downsampling stream): open/close are the FIRST/LAST
    values in the (ms, event_id) total order — selected via
    row_number-equals-1 conditional aggregates on BOTH engines (never
    min_by/arg_min: DuckDB's arg_min rejects struct keys and
    bare-value min_by has tie-order hazards — the r11 rule), high/low/
    volume are plain min/max/sum. All-integer cents; the windows
    partition by day so no global sort exists; day ships as the
    integer epoch-day (the no-date-channel rule)."""
    e = _t(spark, sf_dir, "events").where(
        F.col("value").isNotNull() & (F.col("event_type") == "purchase")
    )
    ev = e.select(
        F.expr("unix_millis(ts) div 86400000").alias("d"),
        F.expr("unix_millis(ts)").alias("ms"),
        "event_id",
        F.expr("CAST(round(value * 100) AS BIGINT)").alias("cents"),
    )
    rn = ev.select(
        "*",
        F.expr(
            "row_number() OVER (PARTITION BY d ORDER BY ms, event_id)"
        ).alias("r_open"),
        F.expr(
            "row_number() OVER (PARTITION BY d ORDER BY ms DESC,"
            " event_id DESC)"
        ).alias("r_close"),
    )
    return rn.groupBy(F.col("d").alias("day")).agg(
        F.count(F.lit(1)).alias("n_trades"),
        F.max(F.expr("CASE WHEN r_open = 1 THEN cents END")).alias(
            "open_cents"
        ),
        F.max("cents").alias("high_cents"),
        F.min("cents").alias("low_cents"),
        F.max(F.expr("CASE WHEN r_close = 1 THEN cents END")).alias(
            "close_cents"
        ),
        F.sum("cents").alias("volume_cents"),
    )


@query(
    "f_deterministic_uuid",
    oracle="""
    WITH h AS (
      SELECT doc_id, md5(concat('surge:', CAST(doc_id AS VARCHAR))) AS hx
      FROM documents
    ),
    u AS (
      SELECT doc_id,
             substring(hx, 1, 8) || '-' || substring(hx, 9, 4) || '-8' ||
             substring(hx, 14, 3) || '-a' || substring(hx, 18, 3) || '-' ||
             substring(hx, 21, 12) AS uid
      FROM h
    )
    SELECT CAST(count(*) AS BIGINT) AS n,
           CAST(count(DISTINCT uid) AS BIGINT) AS n_distinct,
           CAST(sum(CASE WHEN regexp_matches(uid,
                '^[0-9a-f]{8}-[0-9a-f]{4}-8[0-9a-f]{3}-a[0-9a-f]{3}-[0-9a-f]{12}$')
                THEN 1 ELSE 0 END) AS BIGINT) AS n_wellformed,
           min(uid) AS first_uid
    FROM u
    """,
)
def f_deterministic_uuid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic UUID minting — the id-assignment primitive a
    re-runnable pipeline needs (random UUIDs break idempotent replay;
    a name-based id is stable across retries, the UUIDv5 idea): md5
    of a namespace-prefixed key, formatted 8-4-4-4-12 with fixed
    version/variant nibbles (8/a — RFC 9562 v8 'vendor-defined', so
    the claim is honest: this is md5-derived, not SHA-1 v5). The md5
    hex channel is the established engine-portable hash
    (d_*_md5 precedent); outputs are distinct-count + well-formedness
    (anchored regex in the Java∩RE2 subset) + the min uid so the
    VALUE of the formatting, not just its shape, is hash-compared."""
    d = _t(spark, sf_dir, "documents")
    h = d.select(
        "doc_id",
        F.md5(F.expr("concat('surge:', CAST(doc_id AS STRING))")).alias(
            "hx"
        ),
    )
    u = h.select(
        "doc_id",
        F.expr(
            "concat(substring(hx, 1, 8), '-', substring(hx, 9, 4), '-8',"
            " substring(hx, 14, 3), '-a', substring(hx, 18, 3), '-',"
            " substring(hx, 21, 12))"
        ).alias("uid"),
    )
    return u.groupBy().agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("uid").alias("n_distinct"),
        F.sum(
            F.expr(
                "CASE WHEN uid RLIKE"
                " '^[0-9a-f]{8}-[0-9a-f]{4}-8[0-9a-f]{3}-a[0-9a-f]{3}"
                "-[0-9a-f]{12}$' THEN 1 ELSE 0 END"
            )
        ).alias("n_wellformed"),
        F.min("uid").alias("first_uid"),
    )


@query(
    "g_triad_census",
    oracle=f"""
    WITH {_PART_COOCCUR_SQL},
    {_TRIS_SQL},
    sc AS (
      SELECT CAST(count(*) AS BIGINT) AS n FROM deg
    ),
    sm AS (
      SELECT CAST(count(*) AS BIGINT) AS m FROM pairs
    ),
    sw AS (
      SELECT CAST(sum(k * (k - 1)) // 2 AS BIGINT) AS w FROM deg
    ),
    st AS (
      SELECT CAST(count(*) AS BIGINT) AS t FROM tris
    )
    SELECT sc.n, sm.m, sw.w, st.t AS triad_3,
           CAST(sw.w - 3 * st.t AS BIGINT) AS triad_2,
           CAST(sm.m * (sc.n - 2) - 2 * (sw.w - 3 * st.t) - 3 * st.t
                AS BIGINT) AS triad_1,
           CAST(sc.n * (sc.n - 1) * (sc.n - 2) // 6
                - (sm.m * (sc.n - 2) - 2 * (sw.w - 3 * st.t) - 3 * st.t)
                - (sw.w - 3 * st.t) - st.t AS BIGINT) AS triad_0
    FROM sc, sm, sw, st
    """,
)
def g_triad_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Undirected triad census over the part co-occurrence graph — the
    4-bin decomposition of ALL C(n,3) node triples (empty / one-edge /
    open-wedge / triangle) that summarizes a graph's local texture in
    one row (the global sibling of g_local_clustering_topk; the
    transitivity entry's W and T reappear here inside an exact
    combinatorial identity): t3 = triangles, t2 = W − 3T (every
    triangle owns 3 of the Σ k(k−1)/2 wedges), t1 = m(n−2) − 2·t2 −
    3·t3 (each edge lies in n−2 triples), t0 = C(n,3) − rest. ALL
    exact bigint arithmetic — the census is self-checking because the
    four bins must sum to n(n−1)(n−2)/6 (pinned). Rides the
    checkpointed _part_cooccurrence + _min_oriented_tris shared
    kernels (one pair build + one triangle enumeration per
    invocation — the documented dense-graph wedge floor class, same
    family as g_triangle_count: measured 9.0 s at sf0.1 / exponent
    0.94 on the stress slice; n = nodes WITH an edge — isolated
    parts are not graph nodes, documented). Overflow: the n³ triple
    count holds int64 to ~3e6 graph nodes (audit-gate bound; wide_int
    is the escape)."""
    pairs, _directed, deg = _part_cooccurrence(spark, sf_dir)
    sc = deg.groupBy().agg(F.count(F.lit(1)).alias("n"))
    sm = pairs.groupBy().agg(F.count(F.lit(1)).alias("m"))
    sw = deg.groupBy().agg(
        F.expr("CAST(sum(k * (k - 1)) div 2 AS BIGINT)").alias("w")
    )
    st = _min_oriented_tris(pairs).groupBy().agg(
        F.count(F.lit(1)).alias("t")
    )
    one = (
        sc.crossJoin(F.broadcast(sm))
        .crossJoin(F.broadcast(sw))
        .crossJoin(F.broadcast(st))
    )
    return one.select(
        "n", "m", "w",
        F.col("t").alias("triad_3"),
        F.expr("CAST(w - 3 * t AS BIGINT)").alias("triad_2"),
        F.expr(
            "CAST(m * (n - 2) - 2 * (w - 3 * t) - 3 * t AS BIGINT)"
        ).alias("triad_1"),
        F.expr(
            "CAST(n * (n - 1) * (n - 2) div 6"
            " - (m * (n - 2) - 2 * (w - 3 * t) - 3 * t)"
            " - (w - 3 * t) - t AS BIGINT)"
        ).alias("triad_0"),
    )
