"""Generic relational operator coverage (SURVEY.md §2.2–§2.7) over the
TPC-H-ish testdata — exercises every operator class the threat queries
don't: multi-way joins, semi/anti joins, windows, rollup, pivot-style
conditional aggregation, decorrelated scalar subqueries, set ops.

Scale notes: dimension joins (region/nation/customer/supplier/part) are
broadcast-eligible — Catalyst picks BroadcastHashJoin under the 64 MB
threshold set in session.py; fact-fact joins (orders⋈lineitem) shuffle on
the join key once and AQE coalesces post-shuffle partitions. Double
aggregates are rounded so the DuckDB oracle hash is summation-order
independent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from threat_detection_nosql_spark.sources.readers import load_table


# -- R1: TPC-H Q1-style pricing summary (A2/A9-class multi-agg) --------------

def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
            .groupBy("l_returnflag", "l_linestatus")
            .agg(F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
                 F.round(F.sum("l_extendedprice"), 4).alias("sum_base_price"),
                 F.round(F.sum(F.col("l_extendedprice")
                               * (1 - F.col("l_discount"))), 4)
                  .alias("sum_disc_price"),
                 F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
                 F.round(F.avg("l_discount"), 4).alias("avg_disc"),
                 F.count("*").alias("count_order")))


_PRICING_SQL = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 4) AS sum_qty,
       round(sum(l_extendedprice), 4) AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 4) AS sum_disc_price,
       round(avg(l_quantity), 4) AS avg_qty,
       round(avg(l_discount), 4) AS avg_disc,
       CAST(count(*) AS BIGINT) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


# -- R2: 3-way join + top-10 revenue (J1-class, T1) --------------------------

def top_revenue_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """customer ⋈ orders ⋈ lineitem with segment/date filters. customer
    is broadcast; orders⋈lineitem shuffles on orderkey (the natural key
    both sides would be bucketed on at 100 TB)."""
    cust = load_table(spark, sf_dir, "customer") \
        .filter(F.col("c_mktsegment") == "BUILDING")
    orders = load_table(spark, sf_dir, "orders") \
        .filter(F.col("o_orderdate") < F.lit("1998-01-01"))
    li = load_table(spark, sf_dir, "lineitem")
    return (li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
            .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
            .groupBy("l_orderkey", "o_orderdate")
            .agg(F.round(F.sum(F.col("l_extendedprice")
                               * (1 - F.col("l_discount"))), 4)
                  .alias("revenue"))
            .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
            .limit(10))


_TOP_REVENUE_SQL = """
SELECT l_orderkey, o_orderdate,
       round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
GROUP BY l_orderkey, o_orderdate
ORDER BY revenue DESC, l_orderkey ASC
LIMIT 10
"""


# -- R3: 5-way snowflake join, revenue per nation (J1 chain) -----------------

def nation_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q5-shaped rollup. Lineitem is pre-aggregated to
    (l_orderkey, order_rev) BEFORE the fact-fact join: the map-side
    partial sum means the only lineitem-sized shuffle carries
    |orders| rows, the orderkey join input shrinks ~4×, and the
    countDistinct Expand downstream runs over order-grain rows
    instead of line-grain — the dominant term at 100 TB. Revenue is
    unchanged (sum is associative; rounding happens once at the
    end)."""
    region = load_table(spark, sf_dir, "region")
    nation = load_table(spark, sf_dir, "nation")
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    dims = (cust
            .join(F.broadcast(nation),
                  F.col("c_nationkey") == F.col("n_nationkey"))
            .join(F.broadcast(region),
                  F.col("n_regionkey") == F.col("r_regionkey")))
    order_rev = (li.groupBy("l_orderkey")
                 .agg(F.sum(F.col("l_extendedprice")
                            * (1 - F.col("l_discount")))
                       .alias("order_rev")))
    return (order_rev
            .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
            .join(F.broadcast(dims), F.col("o_custkey") == F.col("c_custkey"))
            .groupBy("r_name", "n_name")
            .agg(F.round(F.sum("order_rev"), 4).alias("revenue"),
                 F.countDistinct("o_custkey").alias("n_customers")))


_NATION_REVENUE_SQL = """
SELECT r_name, n_name,
       round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue,
       CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_customers
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name, n_name
"""


# -- R4: anti join — customers with no orders (`left_anti`) ------------------

def customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return (cust.join(orders, F.col("c_custkey") == F.col("o_custkey"),
                      "left_anti")
            .select("c_custkey", "c_name", "c_nationkey"))


_NO_ORDERS_SQL = """
SELECT c_custkey, c_name, c_nationkey
FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
"""


# -- R5: semi join — parts that appear in any lineitem -----------------------

def parts_with_sales(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    li = load_table(spark, sf_dir, "lineitem")
    return (part.join(li, F.col("p_partkey") == F.col("l_partkey"),
                      "left_semi")
            .groupBy("p_brand")
            .agg(F.count("*").alias("n_parts"),
                 F.round(F.avg("p_retailprice"), 4).alias("avg_price")))


_PARTS_WITH_SALES_SQL = """
SELECT p_brand, CAST(count(*) AS BIGINT) AS n_parts,
       round(avg(p_retailprice), 4) AS avg_price
FROM part
WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_partkey = p_partkey)
GROUP BY p_brand
"""


# -- R6: window function — top-2 orders per customer (Top-K per group) -------

def top_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = (Window.partitionBy("o_custkey")
         .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey")))
    return (orders
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= 2)
            .select("o_custkey", "o_orderkey", "o_totalprice", "rn"))


_TOP_ORDERS_PER_CUST_SQL = """
SELECT o_custkey, o_orderkey, o_totalprice, rn
FROM (SELECT o_custkey, o_orderkey, o_totalprice,
             CAST(row_number() OVER (PARTITION BY o_custkey
                  ORDER BY o_totalprice DESC, o_orderkey ASC) AS INT) AS rn
      FROM orders) t
WHERE rn <= 2
"""


# -- R7: rolling window agg — running revenue per supplier -------------------

def supplier_running_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    daily = (li.groupBy("l_suppkey", "l_shipdate")
             .agg(F.sum(F.col("l_extendedprice")).alias("day_rev")))
    w = (Window.partitionBy("l_suppkey").orderBy("l_shipdate")
         .rowsBetween(Window.unboundedPreceding, 0))
    return (daily
            .withColumn("running_rev", F.round(F.sum("day_rev").over(w), 2))
            .select("l_suppkey", "l_shipdate", "running_rev"))


_RUNNING_REV_SQL = """
SELECT l_suppkey, l_shipdate,
       round(sum(day_rev) OVER (PARTITION BY l_suppkey ORDER BY l_shipdate
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
         AS running_rev
FROM (SELECT l_suppkey, l_shipdate, sum(l_extendedprice) AS day_rev
      FROM lineitem GROUP BY l_suppkey, l_shipdate) daily
"""


# -- R8: rollup (grouping-sets class) ----------------------------------------

def returnflag_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (li.rollup("l_returnflag", "l_linestatus")
            .agg(F.count("*").alias("n"),
                 F.round(F.sum("l_quantity"), 4).alias("sum_qty")))


_ROLLUP_SQL = """
SELECT l_returnflag, l_linestatus, CAST(count(*) AS BIGINT) AS n,
       round(sum(l_quantity), 4) AS sum_qty
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""


def order_cube_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (status, priority): all 4 grouping-set combinations in
    one pass — Spark expands the input once per set (Expand node) and
    hash-aggregates; same shuffle bound as a single groupBy ×4."""
    orders = load_table(spark, sf_dir, "orders")
    return (orders.cube("o_orderstatus", "o_orderpriority")
            .agg(F.count("*").alias("n"),
                 F.round(F.sum("o_totalprice"), 4).alias("sum_price")))


_CUBE_SQL = """
SELECT o_orderstatus, o_orderpriority, CAST(count(*) AS BIGINT) AS n,
       round(sum(o_totalprice), 4) AS sum_price
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
"""


# -- R9: pivot-style conditional aggregation (A10 class) ---------------------

def status_by_priority_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    aggs = [
        F.count(F.when(F.col("o_orderpriority") == p, True))
         .alias(f"n_{p[0]}")
        for p in ["1-URGENT", "2-HIGH", "3-MEDIUM",
                  "4-NOT SPECIFIED", "5-LOW"]
    ]
    return orders.groupBy("o_orderstatus").agg(*aggs)


_PIVOT_SQL = """
SELECT o_orderstatus,
       CAST(count(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 END) AS BIGINT) AS n_1,
       CAST(count(CASE WHEN o_orderpriority = '2-HIGH' THEN 1 END) AS BIGINT) AS n_2,
       CAST(count(CASE WHEN o_orderpriority = '3-MEDIUM' THEN 1 END) AS BIGINT) AS n_3,
       CAST(count(CASE WHEN o_orderpriority = '4-NOT SPECIFIED' THEN 1 END) AS BIGINT) AS n_4,
       CAST(count(CASE WHEN o_orderpriority = '5-LOW' THEN 1 END) AS BIGINT) AS n_5
FROM orders
GROUP BY o_orderstatus
"""


# -- R10: decorrelated scalar subquery (J5 class) ----------------------------

def above_nation_avg_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference pattern: correlated per-entity scalar subqueries
    (`neo4j_analysis.py:134-175`). Spark side is written decorrelated —
    one agg + broadcast join; the oracle keeps the correlated form to
    prove equivalence."""
    cust = load_table(spark, sf_dir, "customer")
    nation_avg = (cust.groupBy("c_nationkey")
                  .agg(F.avg("c_acctbal").alias("nation_avg")))
    return (cust.join(F.broadcast(nation_avg), "c_nationkey")
            .filter(F.col("c_acctbal") > F.col("nation_avg"))
            .select("c_custkey", "c_name",
                    F.round("c_acctbal", 4).alias("acctbal")))


_ABOVE_AVG_SQL = """
SELECT c_custkey, c_name, round(c_acctbal, 4) AS acctbal
FROM customer c1
WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer c2
                   WHERE c2.c_nationkey = c1.c_nationkey)
"""


# -- R11: set ops — nations present among customers but not suppliers --------

def customer_only_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    return (cust.select(F.col("c_nationkey").alias("nationkey")).distinct()
            .exceptAll(supp.select(F.col("s_nationkey").alias("nationkey"))
                       .distinct()))


_CUSTOMER_ONLY_NATIONS_SQL = """
SELECT DISTINCT c_nationkey AS nationkey FROM customer
EXCEPT
SELECT DISTINCT s_nationkey AS nationkey FROM supplier
"""


# -- R12: distinct-union (U1 class) ------------------------------------------

def all_active_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    return (cust.select(F.col("c_nationkey").alias("nationkey"))
            .unionByName(supp.select(F.col("s_nationkey").alias("nationkey")))
            .distinct())


_ALL_NATIONS_SQL = """
SELECT DISTINCT nationkey FROM (
  SELECT c_nationkey AS nationkey FROM customer
  UNION ALL
  SELECT s_nationkey AS nationkey FROM supplier
) t
"""


# -- R13: percentile threshold (A16) + filter --------------------------------

def high_value_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A16: percentile cutoff then flag — the reference's
    `np.percentile(mse, 90)` anomaly threshold (`Comparaison_ML.py:281`).
    Exact percentile here (sf-scale); percentile_approx is the
    documented 100 TB swap."""
    orders = load_table(spark, sf_dir, "orders")
    p90 = orders.agg(F.percentile("o_totalprice", F.lit(0.9))
                     .alias("p90"))
    return (orders.join(F.broadcast(p90))
            .filter(F.col("o_totalprice") > F.col("p90"))
            .select("o_orderkey",
                    F.round("o_totalprice", 4).alias("totalprice")))


_HIGH_VALUE_SQL = """
SELECT o_orderkey, round(o_totalprice, 4) AS totalprice
FROM orders
WHERE o_totalprice > (SELECT quantile_cont(o_totalprice, 0.9) FROM orders)
"""


# -- R14: min-max normalization (A17) ----------------------------------------

def normalized_acctbal(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    stats = cust.agg(F.min("c_acctbal").alias("mn"),
                     F.max("c_acctbal").alias("mx"))
    return (cust.join(F.broadcast(stats))
            .select("c_custkey",
                    F.round((F.col("c_acctbal") - F.col("mn"))
                            / (F.col("mx") - F.col("mn")), 6)
                    .alias("acctbal_norm")))


_NORM_ACCTBAL_SQL = """
SELECT c_custkey,
       round((c_acctbal - mn) / (mx - mn), 6) AS acctbal_norm
FROM customer
CROSS JOIN (SELECT min(c_acctbal) AS mn, max(c_acctbal) AS mx FROM customer) s
"""


def props_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-path surface: events.props is a JSON string; parse it three
    ways (typed from_json, path get_json_object, schema discovery via
    json_object_keys) — all JVM expressions, pushdown-friendly."""
    from pyspark.sql import types as T

    from threat_detection_nosql_spark.sources.readers import load_table
    ev = load_table(spark, sf_dir, "events")
    schema = T.StructType([T.StructField("k", T.LongType())])
    # keys joined to a flat string: the driver's canonicalizer hashes
    # atomic columns only (list-typed cells are unhashable in pandas)
    return ev.select(
        "event_id",
        F.from_json("props", schema)["k"].alias("k_typed"),
        F.get_json_object("props", "$.k").cast("long").alias("k_path"),
        F.array_join(F.json_object_keys("props"), ",").alias("keys"))


_PROPS_JSON_SQL = """
SELECT event_id,
       TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_typed,
       TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_path,
       array_to_string(json_keys(props), ',') AS keys
FROM events
"""


def customer_value_ntiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank-family window suite (ntile / percent_rank / cume_dist) over
    customers within their nation — partitioned windows, so the sort is
    per-nation and the plan scales horizontally (a single global window
    would serialize into one partition; for global quantiles at scale
    use value_quantiles' percentile sketch instead)."""
    cust = load_table(spark, sf_dir, "customer")
    w = (Window.partitionBy("c_nationkey")
         .orderBy(F.desc("c_acctbal"), F.asc("c_custkey")))
    return cust.select(
        "c_custkey", "c_nationkey",
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        # floor-based half-away rounding, NOT F.round: cume_dist is an
        # exact rational k/n that can land exactly on a .5 boundary of
        # the 6th digit (e.g. 41/640 = 0.0640625), where Spark's
        # decimal HALF_UP and DuckDB's float floor(x*1e6+0.5) disagree;
        # the explicit floor form is bit-identical in both engines
        (F.floor(F.cume_dist().over(w) * 1e6 + 0.5) / 1e6)
        .alias("cume"))


_NTILES_SQL = """
SELECT c_custkey, c_nationkey,
       CAST(ntile(4) OVER w AS INT) AS quartile,
       round(percent_rank() OVER w, 6) AS pct_rank,
       floor(cume_dist() OVER w * 1e6 + 0.5) / 1e6 AS cume
FROM customer
WINDOW w AS (PARTITION BY c_nationkey
             ORDER BY c_acctbal DESC, c_custkey ASC)
"""


def user_event_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lead/lag window surface: per-user inter-event gaps (lag over
    event time), aggregated to mean/max gap — a burstiness profile.
    One shuffle on user, sort within partition, no self-join."""
    from threat_detection_nosql_spark.operators.etl import activity_log
    log = activity_log(spark, sf_dir)
    w = Window.partitionBy("user").orderBy(F.asc("ts"), F.asc("event_id"))
    gaps = (log.select(
        "user",
        (F.unix_micros("ts")
         - F.lag(F.unix_micros("ts")).over(w)).alias("gap_us")))
    return (gaps.filter(F.col("gap_us").isNotNull())
            .groupBy("user")
            .agg(F.count("*").alias("n_gaps"),
                 F.round(F.avg("gap_us") / 1e6, 4).alias("mean_gap_s"),
                 F.round(F.max("gap_us") / 1e6, 4).alias("max_gap_s")))


_EVENT_GAPS_SQL = """
WITH log AS (SELECT event_id, user_id AS user, ts FROM events),
gaps AS (
  SELECT user,
         epoch_us(ts) - lag(epoch_us(ts)) OVER (
             PARTITION BY user ORDER BY ts ASC, event_id ASC) AS gap_us
  FROM log)
SELECT user, CAST(count(*) AS BIGINT) AS n_gaps,
       round(avg(gap_us) / 1e6, 4) AS mean_gap_s,
       round(max(gap_us) / 1e6, 4) AS max_gap_s
FROM gaps WHERE gap_us IS NOT NULL
GROUP BY user
"""


def user_modal_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group mode with a total tie-break (count DESC, activity
    ASC): each user's most frequent activity. Compiles to count-agg →
    WindowGroupLimit(top-1) — the exchange after the agg carries one
    candidate row per (user, task), not the full (user, activity)
    matrix."""
    from threat_detection_nosql_spark.operators.etl import activity_log
    log = activity_log(spark, sf_dir)
    counts = log.groupBy("user", "activity").agg(
        F.count("*").alias("n"))
    w = Window.partitionBy("user").orderBy(F.desc("n"), F.asc("activity"))
    return (counts.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .select("user", F.col("activity").alias("modal_activity"),
                    F.col("n").alias("n_events")))


_MODAL_SQL = """
WITH counts AS (
  SELECT user_id AS user, event_type AS activity,
         CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY user_id, event_type)
SELECT user, activity AS modal_activity, n AS n_events
FROM (SELECT *, row_number() OVER (PARTITION BY user
                ORDER BY n DESC, activity ASC) AS rn
      FROM counts) t
WHERE rn = 1
"""


def rolling_week_order_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-RANGE window frame (vs the ROWS frame of
    supplier_running_revenue): per customer, each order's trailing
    7-day spend. The frame bound is event-time, not row-count — Spark
    expresses it as rangeBetween over epoch seconds, engines with
    interval frames (the oracle) as RANGE INTERVAL PRECEDING; both are
    the same closed interval [t − 7d, t]. One shuffle on custkey."""
    orders = load_table(spark, sf_dir, "orders")
    # o_orderdate arrives as TIMESTAMP_NTZ (parquet micros, no UTC
    # adjustment) — epoch micros via the session-zoned cast
    w = (Window.partitionBy("o_custkey")
         .orderBy(F.unix_micros(F.col("o_orderdate").cast("timestamp")))
         .rangeBetween(-7 * 86400 * 1_000_000, 0))
    return (orders.select(
        "o_orderkey", "o_custkey", "o_orderdate",
        F.round(F.sum("o_totalprice").over(w), 4).alias("week_value"),
        F.count("*").over(w).alias("week_orders")))


_ROLLING_WEEK_SQL = """
SELECT o_orderkey, o_custkey, o_orderdate,
       round(sum(o_totalprice) OVER w, 4) AS week_value,
       CAST(count(*) OVER w AS BIGINT) AS week_orders
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate
             RANGE BETWEEN INTERVAL 7 DAYS PRECEDING AND CURRENT ROW)
"""


def customer_scd2_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch MERGE / SCD-type-2 upsert: a deterministic updates slice
    (every 7th custkey gets a +100 balance restatement) merged into the
    customer dimension keeping history — updated keys contribute a
    closed version-1 row plus a current version-2 row; untouched keys
    stay current at version 1.

    Expressed as filter-derived branches unioned back — each branch is
    a scan-level predicate on the same dimension, no join at all (the
    general MERGE with an external updates table is the same plan with
    the branches as semi/anti joins, which customers_without_orders /
    parts_with_sales already pin). At 100 TB this is the idiomatic
    copy-on-write table rewrite: one scan in, partitioned write out.
    """
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_acctbal", "c_mktsegment")
    is_upd = F.col("c_custkey") % 7 == 0
    unchanged = (cust.filter(~is_upd)
                 .select("c_custkey", "c_acctbal", "c_mktsegment",
                         F.lit(1).alias("version"),
                         F.lit(1).alias("is_current")))
    closed = (cust.filter(is_upd)
              .select("c_custkey", "c_acctbal", "c_mktsegment",
                      F.lit(1).alias("version"),
                      F.lit(0).alias("is_current")))
    updated = (cust.filter(is_upd)
               .select("c_custkey",
                       F.round(F.col("c_acctbal") + 100.0, 2)
                       .alias("c_acctbal"),
                       "c_mktsegment",
                       F.lit(2).alias("version"),
                       F.lit(1).alias("is_current")))
    return unchanged.unionByName(closed).unionByName(updated)


_SCD2_SQL = """
SELECT c_custkey, c_acctbal, c_mktsegment,
       1 AS version, 1 AS is_current
FROM customer WHERE c_custkey % 7 <> 0
UNION ALL
SELECT c_custkey, c_acctbal, c_mktsegment, 1, 0
FROM customer WHERE c_custkey % 7 = 0
UNION ALL
SELECT c_custkey, round(c_acctbal + 100.0, 2), c_mktsegment, 2, 1
FROM customer WHERE c_custkey % 7 = 0
"""


def error_without_purchase_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set-operation family (EXCEPT/INTERSECT): heavy-error users who
    are not heavy purchasers — both compile to hash-based
    left-anti/semi joins under Catalyst, not sort-based set ops.
    (Thresholded at >=13 events so the sets differ at every SF.)"""
    err, buy = _heavy_user_sets(spark, sf_dir)
    return err.exceptAll(buy).orderBy("user")


def _heavy_user_sets(spark: SparkSession, sf_dir: str):
    from threat_detection_nosql_spark.operators.etl import activity_log
    log = activity_log(spark, sf_dir)

    def heavy(act):
        return (log.filter(F.col("activity") == act)
                .groupBy("user").agg(F.count("*").alias("n"))
                .filter(F.col("n") >= 13).select("user"))
    return heavy("error"), heavy("purchase")


_HEAVY_CTE = """
WITH log AS (SELECT user_id AS user, event_type AS activity FROM events),
err AS (SELECT user FROM log WHERE activity = 'error'
        GROUP BY user HAVING count(*) >= 13),
buy AS (SELECT user FROM log WHERE activity = 'purchase'
        GROUP BY user HAVING count(*) >= 13)
"""

_EXCEPT_SQL = _HEAVY_CTE + """
SELECT user FROM err EXCEPT SELECT user FROM buy ORDER BY user
"""


def error_and_purchase_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    err, buy = _heavy_user_sets(spark, sf_dir)
    return err.intersect(buy).orderBy("user")


_INTERSECT_SQL = _HEAVY_CTE + """
SELECT user FROM err INTERSECT SELECT user FROM buy ORDER BY user
"""


def value_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated quantiles of events.value in one pass
    (percentile with an array argument = single sort-based agg).
    The 100 TB mode is approx_percentile (GK sketch, bounded state);
    tests assert the sketch lands within 1% rank error of these."""
    from threat_detection_nosql_spark.sources.readers import load_table
    ev = load_table(spark, sf_dir, "events")
    qs = [0.25, 0.5, 0.75, 0.95, 0.99]
    pct = F.percentile("value", F.array(*[F.lit(q) for q in qs]))
    return ev.agg(*[
        F.round(F.element_at(pct, i + 1), 6).alias(f"p{int(q * 100)}")
        for i, q in enumerate(qs)])


_VALUE_QUANTILES_SQL = """
SELECT round(quantile_cont(value, 0.25), 6) AS p25,
       round(quantile_cont(value, 0.50), 6) AS p50,
       round(quantile_cont(value, 0.75), 6) AS p75,
       round(quantile_cont(value, 0.95), 6) AS p95,
       round(quantile_cont(value, 0.99), 6) AS p99
FROM events
"""


QUERIES = {
    "pricing_summary": pricing_summary,
    "top_revenue_orders": top_revenue_orders,
    "nation_revenue": nation_revenue,
    "customers_without_orders": customers_without_orders,
    "parts_with_sales": parts_with_sales,
    "top_orders_per_customer": top_orders_per_customer,
    "supplier_running_revenue": supplier_running_revenue,
    "returnflag_rollup": returnflag_rollup,
    "order_cube_counts": order_cube_counts,
    "status_by_priority_pivot": status_by_priority_pivot,
    "above_nation_avg_customers": above_nation_avg_customers,
    "customer_only_nations": customer_only_nations,
    "all_active_nations": all_active_nations,
    "high_value_orders": high_value_orders,
    "normalized_acctbal": normalized_acctbal,
    "value_quantiles": value_quantiles,
    "props_json_extract": props_json_extract,
    "customer_value_ntiles": customer_value_ntiles,
    "user_event_gaps": user_event_gaps,
    "error_without_purchase_users": error_without_purchase_users,
    "error_and_purchase_users": error_and_purchase_users,
    "user_modal_activity": user_modal_activity,
    "rolling_week_order_value": rolling_week_order_value,
    "customer_scd2_merge": customer_scd2_merge,
}

ORACLES = {
    "pricing_summary": _PRICING_SQL,
    "top_revenue_orders": _TOP_REVENUE_SQL,
    "nation_revenue": _NATION_REVENUE_SQL,
    "customers_without_orders": _NO_ORDERS_SQL,
    "parts_with_sales": _PARTS_WITH_SALES_SQL,
    "top_orders_per_customer": _TOP_ORDERS_PER_CUST_SQL,
    "supplier_running_revenue": _RUNNING_REV_SQL,
    "returnflag_rollup": _ROLLUP_SQL,
    "order_cube_counts": _CUBE_SQL,
    "value_quantiles": _VALUE_QUANTILES_SQL,
    "props_json_extract": _PROPS_JSON_SQL,
    "customer_value_ntiles": _NTILES_SQL,
    "user_event_gaps": _EVENT_GAPS_SQL,
    "error_without_purchase_users": _EXCEPT_SQL,
    "error_and_purchase_users": _INTERSECT_SQL,
    "status_by_priority_pivot": _PIVOT_SQL,
    "above_nation_avg_customers": _ABOVE_AVG_SQL,
    "customer_only_nations": _CUSTOMER_ONLY_NATIONS_SQL,
    "all_active_nations": _ALL_NATIONS_SQL,
    "high_value_orders": _HIGH_VALUE_SQL,
    "normalized_acctbal": _NORM_ACCTBAL_SQL,
    "user_modal_activity": _MODAL_SQL,
    "rolling_week_order_value": _ROLLING_WEEK_SQL,
    "customer_scd2_merge": _SCD2_SQL,
}


# -- R-SQL: the same engine through the SQL front door -----------------------

_SEGMENT_SUMMARY_SQL = """
WITH rev AS (
  SELECT o_custkey,
         round(sum(o_totalprice), 4) AS cust_rev,
         CAST(count(*) AS BIGINT) AS n_orders
  FROM orders GROUP BY o_custkey
)
SELECT c_mktsegment,
       CAST(count(*) AS BIGINT) AS n_customers,
       round(sum(cust_rev), 4) AS segment_rev,
       round(avg(n_orders), 6) AS avg_orders
FROM customer JOIN rev ON c_custkey = o_custkey
GROUP BY c_mktsegment
"""


def sql_segment_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-API parity probe: ONE ANSI statement is both the Spark
    query (``spark.sql`` over registered temp views) and the DuckDB
    oracle — by construction the two front doors can never drift.
    Catalyst plans it identically to the DataFrame build (same
    broadcast dim join, same partial/final aggs)."""
    from threat_detection_nosql_spark.sources.readers import register_views
    register_views(spark, sf_dir)
    return spark.sql(_SEGMENT_SUMMARY_SQL)


QUERIES["sql_segment_summary"] = sql_segment_summary
ORACLES["sql_segment_summary"] = _SEGMENT_SUMMARY_SQL


# -- R-hist: equi-width + equi-depth value histograms ------------------------

_HIST_BUCKETS = 10
_HIST_LO, _HIST_HI = 0.0, 60000.0


def order_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Both histogram families over o_totalprice: the equi-width bucket
    is a pure `width_bucket` expression (scan-side, map-combined
    counts); the equi-depth bucket is a DISTRIBUTED exact ``ntile`` —
    range-partition the sort key so every task sorts only its slice,
    compute per-partition ``row_number``, rebase onto global ranks via
    a broadcast k-row cumulative-offset table, then apply the ntile
    quota formula (first ``N mod B`` buckets take ``ceil(N/B)`` rows).
    Replaces the former single-partition global-sort window (the one
    plan that funnelled the whole fact table through one task); the
    oracle still uses plain ``ntile`` so the hash-compare proves the
    rebased ranking identical. Output: one row per (kind, bucket) with
    count + value span."""
    orders = load_table(spark, sf_dir, "orders")
    ew = (orders
          .select(F.width_bucket("o_totalprice", F.lit(_HIST_LO),
                                 F.lit(_HIST_HI), F.lit(_HIST_BUCKETS))
                  .cast("int").alias("bucket"),
                  "o_totalprice")
          .groupBy("bucket")
          .agg(F.count("*").alias("n"),
               F.round(F.min("o_totalprice"), 4).alias("lo"),
               F.round(F.max("o_totalprice"), 4).alias("hi"))
          .withColumn("kind", F.lit("equi_width")))
    from threat_detection_nosql_spark.operators.ranking import \
        with_global_ntile
    ed = (with_global_ntile(orders.select("o_totalprice", "o_orderkey"),
                            ["o_totalprice", "o_orderkey"], _HIST_BUCKETS)
          .groupBy("bucket")
          .agg(F.count("*").alias("n"),
               F.round(F.min("o_totalprice"), 4).alias("lo"),
               F.round(F.max("o_totalprice"), 4).alias("hi"))
          .withColumn("kind", F.lit("equi_depth")))
    return ew.unionByName(ed).select("kind", "bucket", "n", "lo", "hi")


_HISTOGRAM_SQL = f"""
SELECT 'equi_width' AS kind,
       CAST(CASE WHEN o_totalprice < {_HIST_LO} THEN 0
                 WHEN o_totalprice >= {_HIST_HI} THEN {_HIST_BUCKETS} + 1
                 ELSE 1 + floor((o_totalprice - {_HIST_LO})
                           / (({_HIST_HI} - {_HIST_LO})
                              / {_HIST_BUCKETS}))
            END AS INT) AS bucket,
       CAST(count(*) AS BIGINT) AS n,
       round(min(o_totalprice), 4) AS lo,
       round(max(o_totalprice), 4) AS hi
FROM orders GROUP BY 2
UNION ALL
SELECT 'equi_depth', bucket, CAST(count(*) AS BIGINT),
       round(min(o_totalprice), 4), round(max(o_totalprice), 4)
FROM (SELECT CAST(ntile({_HIST_BUCKETS}) OVER (
               ORDER BY o_totalprice ASC, o_orderkey ASC) AS INT)
               AS bucket,
             o_totalprice
      FROM orders) t
GROUP BY bucket
"""


QUERIES["order_value_histogram"] = order_value_histogram
ORACLES["order_value_histogram"] = _HISTOGRAM_SQL


# -- R-page: keyset-stable pagination (LIMIT/OFFSET) -------------------------

def top_orders_second_page(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pagination: rows 11-20 of the revenue ranking via
    ``offset(10).limit(10)`` — a distinct operator from plain top-k
    (the driver-side skip must still see a TOTAL order, so the
    tie-break matters doubly here: an unstable sort would shuffle rows
    BETWEEN pages). At scale the plan is still a per-partition top-20
    heap; only 20 rows reach the driver before the skip."""
    orders = load_table(spark, sf_dir, "orders")
    return (orders
            .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
            .offset(10).limit(10)
            .select("o_orderkey", "o_custkey", "o_totalprice"))


_PAGE2_SQL = """
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders
ORDER BY o_totalprice DESC, o_orderkey ASC
LIMIT 10 OFFSET 10
"""


def part_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS — the general form rollup/cube only
    special-case: per-brand totals, per-type totals, and the grand
    total, WITHOUT the (brand, type) cross cells a cube would add.
    grouping_id() disambiguates the null-as-aggregate rows from real
    nulls. One Expand + hash agg."""
    from threat_detection_nosql_spark.sources.readers import register_views
    register_views(spark, sf_dir)
    return spark.sql(_GROUPING_SETS_SQL)


_GROUPING_SETS_SQL = """
SELECT p_brand, p_type,
       CAST(grouping_id(p_brand, p_type) AS BIGINT) AS gid,
       CAST(count(*) AS BIGINT) AS n_parts,
       round(avg(p_retailprice), 4) AS avg_price
FROM part
GROUP BY GROUPING SETS ((p_brand), (p_type), ())
"""


QUERIES["top_orders_second_page"] = top_orders_second_page
QUERIES["part_grouping_sets"] = part_grouping_sets
ORACLES["top_orders_second_page"] = _PAGE2_SQL
ORACLES["part_grouping_sets"] = _GROUPING_SETS_SQL


# -- R-diff: snapshot reconciliation (full-outer diff report) ----------------

def customer_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Table-diff report between the customer dimension and its
    SCD2-current slice (which restates every 7th key): per-status
    counts of only_left / only_right / changed / equal rows via one
    full-outer join on the key — the reconciliation primitive behind
    migration sign-offs and replication checks. The classification is
    a pure projection; the summary is a 4-row aggregate."""
    left = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("k"),
        F.col("c_acctbal").alias("bal_l"),
        F.col("c_mktsegment").alias("seg_l"))
    right = (customer_scd2_merge(spark, sf_dir)
             .filter(F.col("is_current") == 1)
             .select(F.col("c_custkey").alias("k2"),
                     F.col("c_acctbal").alias("bal_r"),
                     F.col("c_mktsegment").alias("seg_r")))
    joined = left.join(right, F.col("k") == F.col("k2"), "full_outer")
    status = (F.when(F.col("k2").isNull(), "only_left")
              .when(F.col("k").isNull(), "only_right")
              .when((F.col("bal_l") == F.col("bal_r"))
                    & (F.col("seg_l") == F.col("seg_r")), "equal")
              .otherwise("changed"))
    return (joined.groupBy(status.alias("status"))
            .agg(F.count("*").alias("n")))


_SNAPSHOT_DIFF_SQL = """
WITH cur AS (
  SELECT c_custkey, c_acctbal, c_mktsegment FROM customer
  WHERE c_custkey % 7 <> 0
  UNION ALL
  SELECT c_custkey, round(c_acctbal + 100.0, 2), c_mktsegment
  FROM customer WHERE c_custkey % 7 = 0)
SELECT CASE WHEN r.c_custkey IS NULL THEN 'only_left'
            WHEN l.c_custkey IS NULL THEN 'only_right'
            WHEN l.c_acctbal = r.c_acctbal
                 AND l.c_mktsegment = r.c_mktsegment THEN 'equal'
            ELSE 'changed' END AS status,
       CAST(count(*) AS BIGINT) AS n
FROM customer l FULL OUTER JOIN cur r ON l.c_custkey = r.c_custkey
GROUP BY 1
"""


QUERIES["customer_snapshot_diff"] = customer_snapshot_diff
ORACLES["customer_snapshot_diff"] = _SNAPSHOT_DIFF_SQL


# -- winsorized robust mean ---------------------------------------------------

def winsorized_order_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-priority order-value summary with a WINSORIZED mean: values
    clamp to the observed [P5, P95] (percentile_disc — data elements,
    identical in both engines) before averaging, so a handful of
    extreme orders can't swing the per-segment average the way they
    swing the raw mean — the robust-location companion to the
    median+MAD screen (``value_robust_stats``) when a mean-like
    statistic is still required downstream.

    Shape: one 5-row discrete-percentile aggregate per priority
    (WITHIN GROUP sort), broadcast back, one clamped-average scan.
    Raw and winsorized means ship side by side so the outlier pull is
    visible; both round at 6."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderpriority", "o_totalprice")
    bounds = (orders.groupBy("o_orderpriority")
              .agg(F.expr("percentile_disc(0.05) WITHIN GROUP "
                          "(ORDER BY o_totalprice)").alias("p05"),
                   F.expr("percentile_disc(0.95) WITHIN GROUP "
                          "(ORDER BY o_totalprice)").alias("p95"),
                   F.count("*").alias("n")))
    clamped = F.least(F.greatest(F.col("o_totalprice"), F.col("p05")),
                      F.col("p95"))
    return (orders.join(F.broadcast(bounds), "o_orderpriority")
            .groupBy("o_orderpriority", "n", "p05", "p95")
            .agg(F.round(F.avg("o_totalprice"), 6).alias("raw_mean"),
                 F.round(F.avg(clamped), 6).alias("winsorized_mean"))
            .select("o_orderpriority", "n", "p05", "p95",
                    "raw_mean", "winsorized_mean"))


_WINSORIZED_SQL = """
WITH bounds AS (
  SELECT o_orderpriority,
         quantile_disc(o_totalprice, 0.05) AS p05,
         quantile_disc(o_totalprice, 0.95) AS p95,
         CAST(count(*) AS BIGINT) AS n
  FROM orders GROUP BY 1)
SELECT o.o_orderpriority, n, p05, p95,
       round(avg(o_totalprice), 6) AS raw_mean,
       round(avg(least(greatest(o_totalprice, p05), p95)), 6)
         AS winsorized_mean
FROM orders o JOIN bounds b ON b.o_orderpriority = o.o_orderpriority
GROUP BY o.o_orderpriority, n, p05, p95
"""

QUERIES_TAIL = {**globals().get("QUERIES_TAIL", {}),
                "winsorized_order_values": winsorized_order_values}
ORACLES_TAIL = {**globals().get("ORACLES_TAIL", {}),
                "winsorized_order_values": _WINSORIZED_SQL}


def revenue_pareto(spark: SparkSession, sf_dir: str,
                   approx: bool = False) -> DataFrame:
    """The 80/20 check: customers ranked by lifetime order revenue in
    CENTS (exact BIGINT — o_totalprice has 2 decimals, so ×100 rounds
    to an integer), cut into revenue deciles, with each decile's
    customer count and CUMULATIVE share of total revenue — the
    concentration curve behind every "top decile drives X%" claim.

    Shape: one customer-revenue agg, one ntile over the (revenue desc,
    custkey) total order, one decile re-agg, one running-sum window
    over 10 rows. All arithmetic integer until the one share division.

    Scale note (round 10): the exact path now uses the DISTRIBUTED
    ntile (operators/ranking.py — range partition + per-slice
    row_number + broadcast offsets), so no single-partition sort
    remains even over a billion-customer dimension, and the unchanged
    plain-ntile oracle hash-proves the rebased bucketing identical.
    ``approx=True`` still offers the sketch swap: one
    `approx_percentile(cents, array(0.9..0.1))` boundary agg (GK
    sketch, bounded state), the 9 cut points broadcast via a 1-row
    cross join, deciles assigned by a searchsorted array comparison
    (pinned in tests/test_plans.py); decile edges become
    sketch-approximate, shares stay exact integer sums."""
    from pyspark.sql.window import Window as W
    orders = load_table(spark, sf_dir, "orders")
    rev = (orders.groupBy("o_custkey")
           .agg(F.sum(F.round(F.col("o_totalprice") * 100, 0)
                      .cast("long")).alias("cents")))
    if approx:
        bounds = rev.agg(F.percentile_approx(
            "cents", [i / 10.0 for i in range(9, 0, -1)],
            10000).alias("bs"))
        ranked = (rev.crossJoin(F.broadcast(bounds))
                  .withColumn(
                      "decile",
                      (F.lit(1) + F.size(F.filter(
                          "bs", lambda b: F.col("cents") < b)))
                      .cast("int")))
    else:
        from threat_detection_nosql_spark.operators.ranking import \
            with_global_ntile
        ranked = with_global_ntile(
            rev, [F.desc("cents"), F.asc("o_custkey")], 10,
            bucket_col="decile")
    dec = (ranked.groupBy("decile")
           .agg(F.count("*").alias("n_customers"),
                F.sum("cents").alias("decile_cents")))
    w = W.orderBy("decile").rowsBetween(W.unboundedPreceding, W.currentRow)
    total = dec.agg(F.sum("decile_cents").alias("tot"))
    return (dec.crossJoin(F.broadcast(total))
            .withColumn("cum_cents", F.sum("decile_cents").over(w))
            .select("decile", "n_customers",
                    F.round(F.col("decile_cents") * 1.0 / F.col("tot"), 6)
                    .alias("revenue_share"),
                    F.round(F.col("cum_cents") * 1.0 / F.col("tot"), 6)
                    .alias("cum_revenue_share"))
            .orderBy("decile"))


_PARETO_SQL = """
WITH rev AS (SELECT o_custkey,
                    CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT))
                         AS BIGINT) AS cents
             FROM orders GROUP BY 1),
ranked AS (SELECT o_custkey, cents,
                  CAST(ntile(10) OVER (ORDER BY cents DESC, o_custkey ASC)
                       AS INT) AS decile
           FROM rev),
dec AS (SELECT decile, CAST(count(*) AS BIGINT) AS n_customers,
               CAST(sum(cents) AS BIGINT) AS decile_cents
        FROM ranked GROUP BY 1),
tot AS (SELECT CAST(sum(decile_cents) AS BIGINT) AS tot FROM dec)
SELECT decile, n_customers,
       round(decile_cents * 1.0 / tot, 6) AS revenue_share,
       round(sum(decile_cents) OVER (ORDER BY decile
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             * 1.0 / tot, 6) AS cum_revenue_share
FROM dec CROSS JOIN tot
ORDER BY decile
"""

QUERIES_TAIL["revenue_pareto"] = revenue_pareto
ORACLES_TAIL["revenue_pareto"] = _PARETO_SQL


def repurchase_interval_histogram(spark: SparkSession,
                                  sf_dir: str) -> DataFrame:
    """Distribution of customer repurchase cadence: each repeat
    customer's MEDIAN gap between consecutive orders (whole days,
    percentile_disc — an observed element), bucketed into a weekly
    histogram — the retention-planning view ("most repeat customers
    come back within N weeks") that a global average gap hides.

    Shape: one lag window over each customer's (date, orderkey) total
    order, one discrete-median agg per customer, one integer bucket
    agg. Every quantity is an integer day or count; no float leaves
    the plan."""
    from pyspark.sql.window import Window as W
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderdate", "o_orderkey")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    gaps = (orders.select(
                "o_custkey",
                F.datediff("o_orderdate",
                           F.lag("o_orderdate").over(w)).alias("gap_d"))
            .filter(F.col("gap_d").isNotNull()))
    med = (gaps.groupBy("o_custkey")
           .agg(F.expr("percentile_disc(0.5) WITHIN GROUP "
                       "(ORDER BY gap_d)").cast("long").alias("med_d")))
    bucket = (F.col("med_d") - F.col("med_d") % 7).cast("long")
    return (med.groupBy(bucket.alias("week_bucket_start_d"))
            .agg(F.count("*").alias("n_customers"))
            .orderBy("week_bucket_start_d"))


_REPURCHASE_SQL = """
WITH gaps AS (
  SELECT o_custkey,
         date_diff('day',
                   lag(o_orderdate) OVER (PARTITION BY o_custkey
                        ORDER BY o_orderdate, o_orderkey),
                   o_orderdate) AS gap_d
  FROM orders),
med AS (SELECT o_custkey,
               CAST(quantile_disc(gap_d, 0.5) AS BIGINT) AS med_d
        FROM gaps WHERE gap_d IS NOT NULL GROUP BY 1)
SELECT CAST(med_d - med_d % 7 AS BIGINT) AS week_bucket_start_d,
       CAST(count(*) AS BIGINT) AS n_customers
FROM med
GROUP BY 1
ORDER BY 1
"""

QUERIES_TAIL["repurchase_interval_histogram"] = repurchase_interval_histogram
ORACLES_TAIL["repurchase_interval_histogram"] = _REPURCHASE_SQL


def open_order_aging(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backlog aging report: non-finished orders ('O'pen / 'P'ending)
    bucketed by age in 30-day bands as of the dataset's LAST order
    date (data-derived anchor — wall-clock now() would make the result
    irreproducible), with order counts and exact value in integer
    cents per (status, band) — the operational backlog view every
    fulfillment dashboard leads with.

    One 1-row max-date aggregate broadcast back (the crossJoin-of-
    scalar pattern), then a single bucket agg; ages are integer days,
    values integer cents — nothing floats."""
    orders = load_table(spark, sf_dir, "orders")
    anchor = orders.agg(F.max("o_orderdate").alias("anchor"))
    open_ = (orders.filter(F.col("o_orderstatus") != "F")
             .crossJoin(F.broadcast(anchor)))
    age = F.datediff(F.col("anchor"), F.col("o_orderdate"))
    band = (age - age % 30).cast("long")
    return (open_.groupBy("o_orderstatus", band.alias("age_band_start_d"))
            .agg(F.count("*").alias("n_orders"),
                 F.sum(F.round(F.col("o_totalprice") * 100, 0)
                       .cast("long")).alias("value_cents"))
            .orderBy("o_orderstatus", "age_band_start_d"))


_AGING_SQL = """
WITH anchor AS (SELECT max(o_orderdate) AS anchor FROM orders)
SELECT o_orderstatus,
       CAST(date_diff('day', o_orderdate, anchor)
            - date_diff('day', o_orderdate, anchor) % 30 AS BIGINT)
         AS age_band_start_d,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
         AS value_cents
FROM orders CROSS JOIN anchor
WHERE o_orderstatus <> 'F'
GROUP BY 1, 2
ORDER BY 1, 2
"""

QUERIES_TAIL["open_order_aging"] = open_order_aging
ORACLES_TAIL["open_order_aging"] = _AGING_SQL


def part_supplier_hhi_top20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supply-concentration risk: the 20 most supplier-concentrated
    parts by Herfindahl-Hirschman index over line-count shares
    (HHI = Σ shareᵢ², 1.0 = single-supplier part), minimum 20 lines —
    the procurement-risk screen behind single-source alerts. Two
    roll-ups of one (part, supplier) hash agg; the HHI sum divides
    exact integers once per cell (c²/t²) and rounds the final sum; cut
    on the rounded index, then supplier count, then part id."""
    li = load_table(spark, sf_dir, "lineitem")
    cell = (li.groupBy("l_partkey", "l_suppkey")
            .agg(F.count("*").alias("c")))
    tot = (cell.groupBy("l_partkey")
           .agg(F.sum("c").alias("t"),
                F.count("*").alias("n_suppliers")))
    j = cell.join(tot, "l_partkey")
    hhi = F.sum(F.col("c") * F.col("c") * 1.0
                / (F.col("t") * F.col("t")))
    return (j.groupBy("l_partkey", "t", "n_suppliers")
            .agg(F.round(hhi, 6).alias("hhi"))
            .filter(F.col("t") >= 20)
            .select(F.col("l_partkey").alias("partkey"),
                    F.col("t").alias("n_lines"), "n_suppliers", "hhi")
            .orderBy(F.desc("hhi"), F.asc("n_suppliers"), F.asc("partkey"))
            .limit(20))


_HHI_SQL = """
WITH cell AS (SELECT l_partkey, l_suppkey, CAST(count(*) AS BIGINT) AS c
              FROM lineitem GROUP BY 1, 2),
tot AS (SELECT l_partkey, CAST(sum(c) AS BIGINT) AS t,
               CAST(count(*) AS BIGINT) AS n_suppliers
        FROM cell GROUP BY 1)
SELECT cell.l_partkey AS partkey, t AS n_lines, n_suppliers,
       round(sum(c * c * 1.0 / (t * t)), 6) AS hhi
FROM cell JOIN tot USING (l_partkey)
GROUP BY cell.l_partkey, t, n_suppliers
HAVING t >= 20
ORDER BY hhi DESC, n_suppliers ASC, partkey ASC
LIMIT 20
"""

QUERIES_TAIL["part_supplier_hhi_top20"] = part_supplier_hhi_top20
ORACLES_TAIL["part_supplier_hhi_top20"] = _HHI_SQL


def weighted_median_acctbal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation ORDER-WEIGHTED median customer balance: each
    customer's acctbal counts once per order they placed, so the
    median reflects the balance of the customers the business
    actually transacts with, not the dormant long tail — the weighted-
    quantile pattern (plain percentile treats a 1-order and a
    40-order customer identically).

    Weighted median = the least value whose running weight reaches
    half the total: one cumulative-sum window over each nation's
    (acctbal, custkey) total order, one threshold filter, one min —
    weights are integer order counts and acctbal is a 2-decimal
    exact double, so the selected element is bit-identical across
    engines. Customers with zero orders contribute zero weight (inner
    join) by construction."""
    from pyspark.sql.window import Window as W
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    nation = load_table(spark, sf_dir, "nation")
    wts = orders.groupBy("o_custkey").agg(F.count("*").alias("wt"))
    base = (cust.join(wts, cust["c_custkey"] == wts["o_custkey"])
            .join(F.broadcast(nation),
                  cust["c_nationkey"] == nation["n_nationkey"])
            .select(F.col("n_name").alias("nation"),
                    "c_acctbal", "c_custkey", "wt"))
    w = W.partitionBy("nation").orderBy("c_acctbal", "c_custkey") \
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    tot = W.partitionBy("nation")
    cum = (base
           .withColumn("cum_wt", F.sum("wt").over(w))
           .withColumn("tot_wt", F.sum("wt").over(tot)))
    return (cum.filter(F.col("cum_wt") * 2 >= F.col("tot_wt"))
            .groupBy("nation")
            .agg(F.min("c_acctbal").alias("weighted_median_acctbal"),
                 F.min("tot_wt").alias("total_orders"))
            .orderBy("nation"))


_WEIGHTED_MEDIAN_SQL = """
WITH wts AS (SELECT o_custkey, CAST(count(*) AS BIGINT) AS wt
             FROM orders GROUP BY 1),
base AS (SELECT n_name AS nation, c_acctbal, c_custkey, wt
         FROM customer
         JOIN wts ON o_custkey = c_custkey
         JOIN nation ON c_nationkey = n_nationkey),
cum AS (SELECT nation, c_acctbal,
               sum(wt) OVER (PARTITION BY nation
                             ORDER BY c_acctbal, c_custkey
                             ROWS BETWEEN UNBOUNDED PRECEDING
                             AND CURRENT ROW) AS cum_wt,
               sum(wt) OVER (PARTITION BY nation) AS tot_wt
        FROM base)
SELECT nation,
       min(c_acctbal) AS weighted_median_acctbal,
       CAST(min(tot_wt) AS BIGINT) AS total_orders
FROM cum
WHERE cum_wt * 2 >= tot_wt
GROUP BY nation
ORDER BY nation
"""

QUERIES_TAIL["weighted_median_acctbal"] = weighted_median_acctbal
ORACLES_TAIL["weighted_median_acctbal"] = _WEIGHTED_MEDIAN_SQL


def customer_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classic RFM segmentation: every ordering customer scored 1-3 on
    Recency (days since last order, from the data-derived anchor date),
    Frequency (order count) and Monetary (lifetime revenue in exact
    cents), each by ntile terciles over a total order — then rolled up
    to the 27 possible cells with counts and per-cell averages. The
    marketing-ops workhorse; '333' is the best-customer cell.

    All three axes are integers; terciles are ntile windows with id
    tie-breaks (engine-identical); the only division is the two
    rounded per-cell means.

    Scale note (round 10): each tercile now rides the DISTRIBUTED
    ntile (operators/ranking.py) — three parallel range-partitioned
    rankings instead of three single-partition sorts of the customer
    dimension; the unchanged plain-ntile oracle hash-proves the
    rebased terciles identical. The sketch alternative
    (`approx_percentile` cut points broadcast as CASE thresholds)
    remains the cheaper-still swap where approximate tercile edges
    are acceptable."""
    from threat_detection_nosql_spark.operators.ranking import \
        with_global_ntile
    orders = load_table(spark, sf_dir, "orders")
    anchor = orders.agg(F.max("o_orderdate").alias("anchor"))
    per_cust = (orders.crossJoin(F.broadcast(anchor))
                .groupBy("o_custkey")
                .agg(F.min(F.datediff("anchor", "o_orderdate"))
                     .alias("recency_d"),
                     F.count("*").alias("frequency"),
                     F.sum(F.round(F.col("o_totalprice") * 100, 0)
                           .cast("long")).alias("monetary_cents")))
    scored = per_cust
    for col, keys in (("r", [F.desc("recency_d"), F.asc("o_custkey")]),
                      ("f", [F.asc("frequency"), F.asc("o_custkey")]),
                      ("m", [F.asc("monetary_cents"),
                             F.asc("o_custkey")])):
        scored = with_global_ntile(scored, keys, 3, bucket_col=col)
    return (scored.groupBy(
                F.concat(F.col("r"), F.col("f"), F.col("m"))
                .alias("segment"))
            .agg(F.count("*").alias("n_customers"),
                 F.round(F.sum("recency_d").cast("double")
                         / F.count("*"), 6).alias("avg_recency_d"),
                 F.sum("monetary_cents").alias("_sum_cents"))
            # whole-cent integer mean: at ~1e9-cent magnitudes the 6th
            # decimal sits BELOW the double ULP, so engine round()
            # implementations disagree (10x soak); BIGINT div is exact
            # at any scale
            .withColumn("avg_monetary_cents",
                        F.expr("_sum_cents div n_customers"))
            .drop("_sum_cents")
            .orderBy("segment"))


_RFM_SQL = """
WITH anchor AS (SELECT max(o_orderdate) AS anchor FROM orders),
per_cust AS (
  SELECT o_custkey,
         CAST(min(date_diff('day', o_orderdate, anchor)) AS BIGINT)
           AS recency_d,
         CAST(count(*) AS BIGINT) AS frequency,
         CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
           AS monetary_cents
  FROM orders CROSS JOIN anchor GROUP BY 1),
scored AS (
  SELECT *,
         CAST(ntile(3) OVER (ORDER BY recency_d DESC, o_custkey ASC)
              AS INT) AS r,
         CAST(ntile(3) OVER (ORDER BY frequency ASC, o_custkey ASC)
              AS INT) AS f,
         CAST(ntile(3) OVER (ORDER BY monetary_cents ASC, o_custkey ASC)
              AS INT) AS m
  FROM per_cust)
SELECT (r::VARCHAR || f::VARCHAR || m::VARCHAR) AS segment,
       CAST(count(*) AS BIGINT) AS n_customers,
       round(CAST(sum(recency_d) AS DOUBLE) / count(*), 6)
         AS avg_recency_d,
       CAST(sum(monetary_cents) // count(*) AS BIGINT)
         AS avg_monetary_cents
FROM scored
GROUP BY 1
ORDER BY 1
"""

QUERIES_TAIL["customer_rfm_segments"] = customer_rfm_segments
ORACLES_TAIL["customer_rfm_segments"] = _RFM_SQL


def discount_band_elasticity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pricing analytics: per 1%-discount band, line count, mean
    quantity (does a deeper discount actually move more units?),
    exact revenue in integer cents, and each band's revenue share —
    the elasticity table behind markdown planning. Bands are integer
    percent points (round(l_discount·100) — exact, discounts are
    2-decimal), all sums exact BIGINT, the two ratios divide once."""
    li = load_table(spark, sf_dir, "lineitem")
    band = F.round(F.col("l_discount") * 100, 0).cast("long")
    rev_cents = F.round(F.col("l_extendedprice")
                        * (1 - F.col("l_discount")) * 100, 0).cast("long")
    per_band = (li.groupBy(band.alias("discount_pct"))
                .agg(F.count("*").alias("n_lines"),
                     F.sum("l_quantity").alias("qty"),
                     F.sum(rev_cents).alias("rev_cents")))
    total = per_band.agg(F.sum("rev_cents").alias("tot"))
    return (per_band.crossJoin(F.broadcast(total))
            .select("discount_pct", "n_lines",
                    F.round(F.col("qty") * 1.0 / F.col("n_lines"), 6)
                    .alias("mean_qty"),
                    "rev_cents",
                    F.round(F.col("rev_cents") * 1.0 / F.col("tot"), 6)
                    .alias("revenue_share"))
            .orderBy("discount_pct"))


_ELASTICITY_SQL = """
WITH per_band AS (
  SELECT CAST(round(l_discount * 100, 0) AS BIGINT) AS discount_pct,
         CAST(count(*) AS BIGINT) AS n_lines,
         CAST(sum(l_quantity) AS BIGINT) AS qty,
         CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100, 0)
                       AS BIGINT)) AS BIGINT) AS rev_cents
  FROM lineitem GROUP BY 1),
tot AS (SELECT CAST(sum(rev_cents) AS BIGINT) AS tot FROM per_band)
SELECT discount_pct, n_lines,
       round(qty * 1.0 / n_lines, 6) AS mean_qty,
       rev_cents,
       round(rev_cents * 1.0 / tot, 6) AS revenue_share
FROM per_band CROSS JOIN tot
ORDER BY discount_pct
"""

QUERIES_TAIL["discount_band_elasticity"] = discount_band_elasticity
ORACLES_TAIL["discount_band_elasticity"] = _ELASTICITY_SQL


# -- R41: within-nation revenue inequality (exact Gini) ----------------------

def nation_revenue_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation Gini coefficient of customer lifetime order revenue —
    the inequality audit behind "is our revenue concentration a
    property of the market or of one geography?". Covers the
    reference's concentration analytics (revenue_pareto is the global
    curve; this is the grouped scalar) with the classical rank formula
    G = 2·Σ i·x_i / (n·Σx) − (n+1)/n over revenue sorted ascending.

    Exactness: revenue is CENTS (BIGINT); the rank-weighted sum runs in
    DECIMAL(38,0) (Spark) / HUGEINT (DuckDB) so no precision is lost
    before the single final division. Ties in revenue contribute
    x·Σi over any permutation of their consecutive ranks, so the sum —
    and the Gini — is deterministic under any tie order.

    Scale shape: one fact agg (orders → per-customer cents), one
    broadcast dim join (customer→nation), then a row_number window
    PARTITIONED BY nation — the sort is per-nation, never global, so
    adding nations adds partitions, not depth. Only ordering customers
    count (zero-order customers have no revenue rank to assign;
    documented grain)."""
    from pyspark.sql.window import Window as W
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    rev = (orders.groupBy("o_custkey")
           .agg(F.sum(F.round(F.col("o_totalprice") * 100, 0)
                      .cast("long")).alias("cents")))
    tagged = (rev.join(F.broadcast(customer.select("c_custkey",
                                                   "c_nationkey")),
                       rev.o_custkey == F.col("c_custkey"))
              .join(F.broadcast(nation.select("n_nationkey", "n_name")),
                    F.col("c_nationkey") == F.col("n_nationkey")))
    w = W.partitionBy("n_name").orderBy(F.asc("cents"), F.asc("o_custkey"))
    ranked = tagged.select(
        "n_name", "cents",
        F.row_number().over(w).cast("decimal(38,0)").alias("i"))
    per = (ranked.groupBy("n_name")
           .agg(F.count("*").alias("n_customers"),
                F.sum("cents").alias("rev_cents"),
                F.sum(F.col("i")
                      * F.col("cents").cast("decimal(38,0)")).alias("t")))
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    return (per.select(
        F.col("n_name").alias("nation"), "n_customers",
        F.col("rev_cents").cast("long").alias("rev_cents"),
        F.round(2.0 * d("t") / (d("n_customers") * d("rev_cents"))
                - (d("n_customers") + 1.0) / d("n_customers"), 6)
        .alias("gini"))
        .orderBy("nation"))


_GINI_SQL = """
WITH rev AS (
  SELECT o_custkey,
         CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT))
              AS BIGINT) AS cents
  FROM orders GROUP BY o_custkey),
ranked AS (
  SELECT n.n_name, r.cents,
         CAST(row_number() OVER (PARTITION BY n.n_name
              ORDER BY r.cents ASC, r.o_custkey ASC) AS HUGEINT) AS i
  FROM rev r
  JOIN customer c ON r.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey),
per AS (
  SELECT n_name, CAST(count(*) AS BIGINT) AS n_customers,
         CAST(sum(cents) AS BIGINT) AS rev_cents,
         sum(i * CAST(cents AS HUGEINT)) AS t
  FROM ranked GROUP BY n_name)
SELECT n_name AS nation, n_customers, rev_cents,
       round(2.0 * CAST(t AS DOUBLE)
             / (CAST(n_customers AS DOUBLE) * CAST(rev_cents AS DOUBLE))
             - (CAST(n_customers AS DOUBLE) + 1.0)
               / CAST(n_customers AS DOUBLE), 6) AS gini
FROM per
ORDER BY nation
"""

QUERIES_TAIL["nation_revenue_gini"] = nation_revenue_gini
ORACLES_TAIL["nation_revenue_gini"] = _GINI_SQL


# -- R42: market-basket association rules over order baskets -----------------

def brand_assoc_rules_top20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A-priori association rules over order baskets at BRAND grain:
    for every directional rule a→b with pair support ≥ 0.5% of orders,
    emit support counts, confidence and lift; top 20 by lift. The
    classic market-basket analytic (copurchase_triangles counts motifs;
    this ranks *rules*).

    Exactness: supports are BIGINT counts; the top-20 cut orders by
    lift_ppm = pair_n·n_orders·1,000,000 DIV (supp_a·supp_b) — an
    exact integer, so engines can never disagree on the cut under
    float ties (display confidence/lift are rounded doubles derived
    from the same integers). Tie-break (lift_ppm, antecedent,
    consequent) is total.

    Scale shape: baskets are DISTINCT (order, brand) — bounded fan-out
    since an order has ≤7 lines, so the within-order pair self-join on
    l_orderkey emits ≤C(7,2) rows per order (linear in lineitem, never
    all-pairs); brand supports are a 25-row broadcast; the numerator
    products stay < 2^60 at petabyte row counts with the ppm scale."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    baskets = (li.join(F.broadcast(part.select("p_partkey", "p_brand")),
                       li.l_partkey == F.col("p_partkey"))
               .select("l_orderkey", F.col("p_brand").alias("brand"))
               .distinct())
    # 1-row total broadcast (house pattern) — no driver-side count job
    tot = baskets.agg(
        F.countDistinct("l_orderkey").alias("n_orders"))
    supp = baskets.groupBy("brand").agg(F.count("*").alias("s"))
    a = baskets.select("l_orderkey", F.col("brand").alias("ba"))
    b = baskets.select("l_orderkey", F.col("brand").alias("bb"))
    pairs = (a.join(b, "l_orderkey")
             .filter(F.col("ba") < F.col("bb"))
             .groupBy("ba", "bb").agg(F.count("*").alias("pair_n"))
             .crossJoin(F.broadcast(tot))
             .filter(F.col("pair_n") * 200 >= F.col("n_orders")))
    both = (pairs.select(F.col("ba").alias("ante"),
                         F.col("bb").alias("cons"), "pair_n", "n_orders")
            .unionByName(pairs.select(F.col("bb").alias("ante"),
                                      F.col("ba").alias("cons"),
                                      "pair_n", "n_orders")))
    sa = F.broadcast(supp.select(F.col("brand").alias("ante"),
                                 F.col("s").alias("supp_ante")))
    sb = F.broadcast(supp.select(F.col("brand").alias("cons"),
                                 F.col("s").alias("supp_cons")))
    scored = (both.join(sa, "ante").join(sb, "cons")
              .withColumn("lift_ppm",
                          F.expr("CAST(pair_n * n_orders * 1000000 "
                                 "AS BIGINT) div (supp_ante * supp_cons)")))
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    return (scored.select(
        "ante", "cons", "pair_n", "supp_ante", "supp_cons", "lift_ppm",
        F.round(d("pair_n") / d("supp_ante"), 6).alias("confidence"),
        F.round(F.col("lift_ppm").cast("double") / 1e6, 6).alias("lift"))
        .orderBy(F.desc("lift_ppm"), "ante", "cons")
        .limit(20))


_ASSOC_SQL = """
WITH baskets AS (
  SELECT DISTINCT l.l_orderkey, p.p_brand AS brand
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey),
n AS (SELECT CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_orders
      FROM baskets),
supp AS (SELECT brand, CAST(count(*) AS BIGINT) AS s
         FROM baskets GROUP BY brand),
pairs AS (
  SELECT a.brand AS ba, b.brand AS bb,
         CAST(count(*) AS BIGINT) AS pair_n
  FROM baskets a JOIN baskets b ON a.l_orderkey = b.l_orderkey
                               AND a.brand < b.brand
  GROUP BY a.brand, b.brand
  HAVING CAST(count(*) AS BIGINT) * 200 >= (SELECT n_orders FROM n)),
both_dir AS (
  SELECT ba AS ante, bb AS cons, pair_n FROM pairs
  UNION ALL
  SELECT bb AS ante, ba AS cons, pair_n FROM pairs),
scored AS (
  SELECT r.ante, r.cons, r.pair_n,
         sa.s AS supp_ante, sb.s AS supp_cons,
         CAST(r.pair_n * n.n_orders * 1000000 AS BIGINT)
           // (sa.s * sb.s) AS lift_ppm
  FROM both_dir r
  JOIN supp sa ON r.ante = sa.brand
  JOIN supp sb ON r.cons = sb.brand
  CROSS JOIN n)
SELECT ante, cons, pair_n, supp_ante, supp_cons, lift_ppm,
       round(CAST(pair_n AS DOUBLE) / supp_ante, 6) AS confidence,
       round(CAST(lift_ppm AS DOUBLE) / 1e6, 6) AS lift
FROM scored
ORDER BY lift_ppm DESC, ante, cons
LIMIT 20
"""

QUERIES_TAIL["brand_assoc_rules_top20"] = brand_assoc_rules_top20
ORACLES_TAIL["brand_assoc_rules_top20"] = _ASSOC_SQL


# -- R43: cohort lifetime-value curve ----------------------------------------

def cohort_ltv_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer lifetime-value curve by acquisition cohort: customers
    are grouped by the month of their FIRST order; each cohort's
    cumulative revenue is tracked across order-month age, per capita.
    The growth analytic behind "does a newer cohort monetize faster?"
    — the revenue twin of cohort_retention (which counts activity).

    Exactness: revenue is CENTS (BIGINT); age = exact
    (year·12+month) arithmetic; the cumulative sum is an ordered
    window over the tiny (cohort × age) grid, not over rows; the one
    division (per-capita LTV) is final and rounded.

    Scale shape: one orders scan feeds both the first-order agg and
    the monthly revenue agg (same groupBy key prefix); the cumsum
    window is partitioned by cohort over ≤ months² grid rows. Cohort
    sizes are a broadcast 1-column frame.

    Precision note: cum_rev_cents is the EXACT value;
    ltv_per_customer is derived display (6-decimal double — verified
    through the 30× soak; past ~10¹⁰ cents per capita the 6 decimals
    would exceed double's digits, the revenue_bridge_wow lesson —
    consumers at that scale should read the cents column)."""
    from pyspark.sql.window import Window as W
    orders = load_table(spark, sf_dir, "orders")
    base = orders.select(
        "o_custkey",
        (F.year("o_orderdate") * 12 + F.month("o_orderdate") - 1)
        .alias("m"),
        F.round(F.col("o_totalprice") * 100, 0).cast("long")
        .alias("cents"))
    first = (base.groupBy("o_custkey")
             .agg(F.min("m").alias("cohort_m")))
    sizes = (first.groupBy("cohort_m")
             .agg(F.countDistinct("o_custkey").alias("n_customers")))
    monthly = (base.join(first, "o_custkey")
               .groupBy("cohort_m",
                        (F.col("m") - F.col("cohort_m")).alias("age"))
               .agg(F.sum("cents").alias("rev_cents")))
    w = (W.partitionBy("cohort_m").orderBy("age")
         .rowsBetween(W.unboundedPreceding, W.currentRow))
    cum = monthly.withColumn("cum_rev_cents", F.sum("rev_cents").over(w))
    out = cum.join(F.broadcast(sizes), "cohort_m")
    cohort_str = F.concat(
        F.lpad((F.col("cohort_m") / 12).cast("long").cast("string"),
               4, "0"),
        F.lit("-"),
        F.lpad((F.col("cohort_m") % 12 + 1).cast("string"), 2, "0"))
    return (out.select(
        cohort_str.alias("cohort"), "age", "n_customers",
        F.col("cum_rev_cents").cast("long").alias("cum_rev_cents"),
        F.round(F.col("cum_rev_cents").cast("double")
                / F.col("n_customers") / 100.0, 6)
        .alias("ltv_per_customer"))
        .orderBy("cohort", "age"))


_LTV_SQL = """
WITH base AS (
  SELECT o_custkey,
         year(o_orderdate) * 12 + month(o_orderdate) - 1 AS m,
         CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents
  FROM orders),
first_m AS (
  SELECT o_custkey, min(m) AS cohort_m FROM base GROUP BY o_custkey),
sizes AS (
  SELECT cohort_m, CAST(count(DISTINCT o_custkey) AS BIGINT)
           AS n_customers
  FROM first_m GROUP BY cohort_m),
monthly AS (
  SELECT f.cohort_m, b.m - f.cohort_m AS age,
         CAST(sum(b.cents) AS BIGINT) AS rev_cents
  FROM base b JOIN first_m f USING (o_custkey)
  GROUP BY f.cohort_m, b.m - f.cohort_m),
cum AS (
  SELECT cohort_m, age,
         CAST(sum(rev_cents) OVER (PARTITION BY cohort_m ORDER BY age
              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_rev_cents
  FROM monthly)
SELECT lpad(CAST(cohort_m // 12 AS VARCHAR), 4, '0') || '-'
         || lpad(CAST(cohort_m % 12 + 1 AS VARCHAR), 2, '0') AS cohort,
       age, s.n_customers, cum_rev_cents,
       round(CAST(cum_rev_cents AS DOUBLE) / s.n_customers / 100.0, 6)
         AS ltv_per_customer
FROM cum JOIN sizes s USING (cohort_m)
ORDER BY cohort, age
"""

QUERIES_TAIL["cohort_ltv_curve"] = cohort_ltv_curve
ORACLES_TAIL["cohort_ltv_curve"] = _LTV_SQL


# -- R44: CDC apply (last-writer-wins upsert/delete) -------------------------

def cdc_last_writer_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC MERGE semantics over an op-coded changelog: the event log
    is read as a change stream on a per-user state row — ``error``
    events are DELETEs, every other event UPSERTs the user's current
    value — and the materialized table is last-writer-wins by the
    total (ts, event_id) order. The op-coded apply complements
    customer_scd2_merge (which keeps history; this keeps the live
    snapshot the way a MERGE INTO target would).

    Exactness: the winner is row_number()=1 over the unique
    (ts DESC, event_id DESC) per-key order; value is exact cents;
    deleted keys are dropped by a filter on the winning op — every
    step replays in SQL.

    Scale shape: one per-key window (hash-partitioned by user, the
    CDC key — the same shuffle a MERGE needs) with WindowGroupLimit
    pruning map-side to 1 row per (key, task); counts ride the same
    pass as a conditional agg. No joins."""
    from pyspark.sql.window import Window as W
    ev = load_table(spark, sf_dir, "events")
    log = ev.select(
        F.col("user_id").alias("k"), "ts", "event_id",
        F.when(F.col("event_type") == "error", F.lit("D"))
        .otherwise(F.lit("U")).alias("op"),
        F.round(F.col("value") * 100, 0).cast("long").alias("cents"))
    w = W.partitionBy("k").orderBy(F.desc("ts"), F.desc("event_id"))
    ranked = log.select(
        "k", "op", "cents",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(W.partitionBy("k")).alias("n_changes"),
        F.sum(F.when(F.col("op") == "D", 1).otherwise(0))
        .over(W.partitionBy("k")).alias("n_deletes"))
    return (ranked.filter((F.col("rn") == 1) & (F.col("op") == "U"))
            .select(F.col("k").alias("user_id"),
                    F.col("cents").alias("live_value_cents"),
                    F.col("n_changes").cast("long").alias("n_changes"),
                    F.col("n_deletes").cast("long").alias("n_deletes"))
            .orderBy("user_id"))


_CDC_SQL = """
WITH log AS (
  SELECT user_id AS k, ts, event_id,
         CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op,
         CAST(round(value * 100, 0) AS BIGINT) AS cents
  FROM events),
ranked AS (
  SELECT k, op, cents,
         row_number() OVER (PARTITION BY k
                            ORDER BY ts DESC, event_id DESC) AS rn,
         CAST(count(*) OVER (PARTITION BY k) AS BIGINT) AS n_changes,
         CAST(sum(CASE WHEN op = 'D' THEN 1 ELSE 0 END)
              OVER (PARTITION BY k) AS BIGINT) AS n_deletes
  FROM log)
SELECT k AS user_id, cents AS live_value_cents, n_changes, n_deletes
FROM ranked
WHERE rn = 1 AND op = 'U'
ORDER BY user_id
"""

QUERIES_TAIL["cdc_last_writer_state"] = cdc_last_writer_state
ORACLES_TAIL["cdc_last_writer_state"] = _CDC_SQL


# -- pivot: segment x order-year revenue matrix -------------------------------

_PIVOT_YEARS = list(range(1995, 2002))  # orders span 1995-2001 (TESTDATA.md)


def segment_year_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-segment × order-year revenue matrix via the native
    ``groupBy().pivot()`` operator — the BI crosstab shape (one row
    per segment, one column per year).

    The pivot VALUES are an explicit literal list: without it Spark
    runs an extra distinct-scan job just to discover the column set,
    and the output schema becomes data-dependent — both wrong at
    100 TB (and the year domain is closed by the data's calendar
    span, TESTDATA.md). Revenue is exact BIGINT cents; empty
    (segment, year) cells are NULL in both engines (pivot-sum and
    FILTER-sum agree on empty input).

    Scale shape: orders joins the customer dim on the grouped key's
    side (shuffle equi-join on custkey — both sides partition on it),
    then ONE hash agg produces all 7 year columns (pivot compiles to
    conditional aggregates, not 7 scans)."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    base = (orders
            .join(cust, orders.o_custkey == cust.c_custkey)
            .select("c_mktsegment",
                    F.concat(F.lit("y"), F.year("o_orderdate")).alias("yr"),
                    F.round(F.col("o_totalprice") * 100, 0)
                    .cast("long").alias("cents")))
    return (base.groupBy("c_mktsegment")
            .pivot("yr", [f"y{y}" for y in _PIVOT_YEARS])
            .agg(F.sum("cents"))
            .orderBy("c_mktsegment"))


_PIVOT_COLS = ",\n       ".join(
    f"CAST(sum(cents) FILTER (WHERE yr = {y}) AS BIGINT) AS y{y}"
    for y in _PIVOT_YEARS)

_SEGMENT_PIVOT_SQL = f"""
WITH base AS (SELECT c_mktsegment, year(o_orderdate) AS yr,
                     CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents
              FROM orders JOIN customer ON o_custkey = c_custkey)
SELECT c_mktsegment,
       {_PIVOT_COLS}
FROM base GROUP BY c_mktsegment
ORDER BY c_mktsegment
"""

QUERIES_TAIL["segment_year_pivot"] = segment_year_pivot
ORACLES_TAIL["segment_year_pivot"] = _SEGMENT_PIVOT_SQL


# -- referential-integrity audit ----------------------------------------------

def referential_integrity_audit(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    """Foreign-key health audit across the warehouse: count of
    dangling/unreferenced keys on every FK edge — orphan lineitems
    (order gone), childless orders (no lineitems), customers who never
    ordered, parts and suppliers never shipped. The first query a data
    platform runs after every load; one non-zero orphan row means an
    upstream CDC feed dropped parents.

    All five checks are LEFT ANTI equi-joins (Spark's dedicated
    anti-join operator — no NOT IN null-trap, which the oracle also
    avoids via NOT EXISTS) emitting exact BIGINT counts as
    (audit_check, n) rows.

    Scale shape: each anti-join shuffles both sides on the key being
    audited (or broadcasts when the parent side is a dim); counts are
    map-combinable. The five checks are independent branches — on a
    cluster they run concurrently; none shares a scan, by design, so
    each prunes to exactly its two key columns."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    part = load_table(spark, sf_dir, "part")
    supp = load_table(spark, sf_dir, "supplier")

    def anti(name, child, ckey, parent, pkey):
        return (child.select(F.col(ckey).alias("k"))
                .join(parent.select(F.col(pkey).alias("k")), "k",
                      "left_anti")
                .agg(F.count("*").alias("n"))
                .select(F.lit(name).alias("audit_check"), "n"))

    return (anti("orphan_lineitems", li, "l_orderkey",
                 orders, "o_orderkey")
            .unionAll(anti("childless_orders", orders, "o_orderkey",
                           li, "l_orderkey"))
            .unionAll(anti("orderless_customers", cust, "c_custkey",
                           orders, "o_custkey"))
            .unionAll(anti("unshipped_parts", part, "p_partkey",
                           li, "l_partkey"))
            .unionAll(anti("unshipped_suppliers", supp, "s_suppkey",
                           li, "l_suppkey")))


_RI_AUDIT_SQL = """
SELECT 'orphan_lineitems' AS audit_check, CAST(count(*) AS BIGINT) AS n
FROM lineitem l
WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
UNION ALL
SELECT 'childless_orders', CAST(count(*) AS BIGINT)
FROM orders o
WHERE NOT EXISTS (SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey)
UNION ALL
SELECT 'orderless_customers', CAST(count(*) AS BIGINT)
FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
UNION ALL
SELECT 'unshipped_parts', CAST(count(*) AS BIGINT)
FROM part p
WHERE NOT EXISTS (SELECT 1 FROM lineitem l WHERE l.l_partkey = p.p_partkey)
UNION ALL
SELECT 'unshipped_suppliers', CAST(count(*) AS BIGINT)
FROM supplier s
WHERE NOT EXISTS (SELECT 1 FROM lineitem l WHERE l.l_suppkey = s.s_suppkey)
"""

QUERIES_TAIL["referential_integrity_audit"] = referential_integrity_audit
ORACLES_TAIL["referential_integrity_audit"] = _RI_AUDIT_SQL


# -- VARIANT semi-structured stats ---------------------------------------------

def props_variant_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured aggregation through Spark 4's VARIANT type:
    ``parse_json`` once into the binary variant encoding, then typed
    ``try_variant_get`` extraction — the modern engine path for JSON
    columns (shredded, no per-row string re-parse per field, unlike
    the get_json_object calls in props_json_extract, which this
    complements). Per event_type: row count, rows with a numeric
    ``$.k``, and exact min/max/sum of k.

    Exactness: k is a BIGINT extraction (try_variant_get returns NULL
    on missing/ill-typed, same as the oracle's TRY_CAST of
    json_extract_string); every output is an exact integer.

    Scale shape: one scan → parse_json map-side → 5-key hash agg; the
    variant parse is a JVM expression inside whole-stage codegen, no
    Python anywhere."""
    from threat_detection_nosql_spark.sources.readers import load_table
    ev = load_table(spark, sf_dir, "events")
    k = F.try_variant_get(F.parse_json("props"), "$.k", "bigint")
    return (ev.select("event_type", k.alias("k"))
            .groupBy("event_type")
            .agg(F.count("*").alias("n"),
                 F.count("k").alias("n_with_k"),
                 F.min("k").alias("k_min"),
                 F.max("k").alias("k_max"),
                 F.sum("k").alias("k_sum"))
            .orderBy("event_type"))


_PROPS_VARIANT_SQL = """
SELECT event_type, CAST(count(*) AS BIGINT) AS n,
       CAST(count(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT))
            AS BIGINT) AS n_with_k,
       CAST(min(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT))
            AS BIGINT) AS k_min,
       CAST(max(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT))
            AS BIGINT) AS k_max,
       CAST(sum(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT))
            AS BIGINT) AS k_sum
FROM events
GROUP BY event_type
ORDER BY event_type
"""

QUERIES_TAIL["props_variant_stats"] = props_variant_stats
ORACLES_TAIL["props_variant_stats"] = _PROPS_VARIANT_SQL


# -- fulfillment cycle-time percentiles -----------------------------------------

def fulfillment_cycle_percentiles(spark: SparkSession,
                                  sf_dir: str) -> DataFrame:
    """Order-fulfillment cycle-time panel per order priority: p50/p90
    of order→ship days (percentile_disc on exact integer day diffs —
    an observed element, same in both engines), plus the late rate in
    truncating integer ppm (shipped more than 90 days after the order
    — the same lateness proxy as late_shipment_priority_counts; the
    synthetic lineitem carries no commit/receipt dates) — the ops
    dashboard next to the Q12 counts.

    Scale shape: lineitem joins the orders dim on orderkey (both
    partition on it), one hash agg on the ≤5-key priority domain; the
    disc percentiles aggregate per group. At corpus scale the exact
    disc quantiles swap for approx_percentile or a day-grain count
    grid exactly as documented on variant_quantile_effects (day diffs
    are a small integer domain)."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    j = (li.join(orders, li.l_orderkey == orders.o_orderkey)
         .select("o_orderpriority",
                 F.datediff("l_shipdate", "o_orderdate").cast("long")
                 .alias("ship_days"))
         .withColumn("late", (F.col("ship_days") > 90).cast("long")))
    return (j.groupBy("o_orderpriority")
            .agg(F.count("*").alias("n"),
                 F.expr("percentile_disc(0.5) WITHIN GROUP "
                        "(ORDER BY ship_days)").cast("long")
                 .alias("p50_ship_days"),
                 F.expr("percentile_disc(0.9) WITHIN GROUP "
                        "(ORDER BY ship_days)").cast("long")
                 .alias("p90_ship_days"),
                 F.sum("late").alias("n_late"))
            .withColumn("late_ppm",
                        F.expr("1000000 * n_late DIV n"))
            .orderBy("o_orderpriority"))


_FULFILL_SQL = """
WITH j AS (
  SELECT o_orderpriority,
         CAST(date_diff('day', o_orderdate, l_shipdate) AS BIGINT)
           AS ship_days,
         CASE WHEN date_diff('day', o_orderdate, l_shipdate) > 90
              THEN 1 ELSE 0 END AS late
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey)
SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n,
       CAST(quantile_disc(ship_days, 0.5) AS BIGINT) AS p50_ship_days,
       CAST(quantile_disc(ship_days, 0.9) AS BIGINT) AS p90_ship_days,
       CAST(sum(late) AS BIGINT) AS n_late,
       CAST((1000000 * CAST(sum(late) AS BIGINT)) // count(*) AS BIGINT)
         AS late_ppm
FROM j GROUP BY o_orderpriority ORDER BY o_orderpriority
"""

QUERIES_TAIL["fulfillment_cycle_percentiles"] = fulfillment_cycle_percentiles
ORACLES_TAIL["fulfillment_cycle_percentiles"] = _FULFILL_SQL
