"""TPC-H-classic query shapes over the driver testdata.

The reference's query surface is covered elsewhere (queries/threat.py);
these exercise the same operator classes (SURVEY.md §2.3-2.5: multi-way
joins, selective date predicates, semi-joins, conditional aggregation)
in their canonical TPC-H form so the engine's relational completeness
is visible line-by-line. Scale notes per query: predicates are applied
before joins (Catalyst pushes them into the parquet scan), small/
filtered sides are broadcast, and aggregations are map-combinable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from threat_detection_nosql_spark.sources.readers import load_table

_CUTOFF = "1998-06-01"


def shipping_priority_top10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q3 shape: unshipped-revenue top-10 for one market segment.

    The segment filter keeps ~1/5 of customers; that filtered dim is
    broadcast so the orders scan never shuffles on custkey. Lineitem is
    date-filtered at the scan (PushedFilters on l_shipdate), and the
    revenue agg groups on the already-joined order grain.
    """
    cust = (load_table(spark, sf_dir, "customer")
            .filter(F.col("c_mktsegment") == "BUILDING")
            .select("c_custkey"))
    orders = (load_table(spark, sf_dir, "orders")
              .filter(F.col("o_orderdate") < _CUTOFF)
              .select("o_orderkey", "o_custkey", "o_orderdate",
                      "o_orderpriority"))
    li = (load_table(spark, sf_dir, "lineitem")
          .filter(F.col("l_shipdate") > _CUTOFF)
          .select("l_orderkey", "l_extendedprice", "l_discount"))
    return (li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
            .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
            .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
            .agg(F.round(F.sum(F.col("l_extendedprice")
                               * (1 - F.col("l_discount"))), 4)
                 .alias("revenue"))
            .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
            .limit(10))


_Q3_SQL = f"""
SELECT l_orderkey, o_orderdate, o_orderpriority,
       round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '{_CUTOFF}'
  AND l_shipdate > TIMESTAMP '{_CUTOFF}'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey ASC
LIMIT 10
"""


def order_priority_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q4 shape: orders with at least one line shipped after the order
    date (a lateness proxy — the testdata has no commit/receipt dates),
    counted by priority. The EXISTS is a left-semi join: lineitem never
    leaves the join as payload, so the shuffle carries keys only."""
    orders = (load_table(spark, sf_dir, "orders")
              .filter((F.col("o_orderdate") >= "1997-01-01")
                      & (F.col("o_orderdate") < "1998-01-01")))
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey",
                                                      "l_shipdate")
    late = orders.join(
        li, (F.col("l_orderkey") == F.col("o_orderkey"))
        & (F.col("l_shipdate") > F.col("o_orderdate")), "left_semi")
    return (late.groupBy("o_orderpriority")
            .agg(F.count("*").alias("order_count")))


_Q4_SQL = """
SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1997-01-01'
  AND o_orderdate < TIMESTAMP '1998-01-01'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
GROUP BY o_orderpriority
"""


def promo_revenue_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q14 shape: PROMO revenue share for one ship month. Part is
    joined on partkey; the one-month lineitem filter is pushed to the
    scan, and the ratio is a single conditional aggregate (no second
    pass). At 100 TB part is too large to broadcast blindly — the join
    keys are both bucketable on partkey; here the month filter already
    shrinks the probe side to ~1/36 of lineitem."""
    li = (load_table(spark, sf_dir, "lineitem")
          .filter((F.col("l_shipdate") >= "1998-03-01")
                  & (F.col("l_shipdate") < "1998-04-01"))
          .select("l_partkey", "l_extendedprice", "l_discount"))
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (li.join(part, F.col("l_partkey") == F.col("p_partkey"))
            .agg(F.round(
                100.0 * F.sum(F.when(F.col("p_type") == "PROMO", rev)
                              .otherwise(0.0)) / F.sum(rev), 6)
                 .alias("promo_revenue_pct")))


_Q14_SQL = """
SELECT round(100.0 * sum(CASE WHEN p_type = 'PROMO'
                              THEN l_extendedprice * (1 - l_discount)
                              ELSE 0.0 END)
             / sum(l_extendedprice * (1 - l_discount)), 6)
       AS promo_revenue_pct
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1998-03-01'
  AND l_shipdate < TIMESTAMP '1998-04-01'
"""


def top_supplier_by_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q15 shape: suppliers achieving the maximum quarterly revenue.
    The max is a scalar subquery over the same pre-agg — Catalyst reuses
    the exchange, so lineitem is scanned once."""
    li = (load_table(spark, sf_dir, "lineitem")
          .filter((F.col("l_shipdate") >= "1997-01-01")
                  & (F.col("l_shipdate") < "1997-04-01")))
    rev = (li.groupBy("l_suppkey")
           .agg(F.round(F.sum(F.col("l_extendedprice")
                              * (1 - F.col("l_discount"))), 4)
                .alias("total_rev")))
    mx = rev.agg(F.max("total_rev").alias("mx"))
    sup = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (rev.join(F.broadcast(mx), F.col("total_rev") == F.col("mx"))
            .join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
            .select("s_suppkey", "s_name", "total_rev"))


_Q15_SQL = """
WITH rev AS (
  SELECT l_suppkey,
         round(sum(l_extendedprice * (1 - l_discount)), 4) AS total_rev
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
    AND l_shipdate < TIMESTAMP '1997-04-01'
  GROUP BY l_suppkey)
SELECT s_suppkey, s_name, total_rev
FROM rev JOIN supplier ON l_suppkey = s_suppkey
WHERE total_rev = (SELECT max(total_rev) FROM rev)
"""


QUERIES = {
    "shipping_priority_top10": shipping_priority_top10,
    "order_priority_counts": order_priority_counts,
    "promo_revenue_ratio": promo_revenue_ratio,
    "top_supplier_by_revenue": top_supplier_by_revenue,
}

ORACLES = {
    "shipping_priority_top10": _Q3_SQL,
    "order_priority_counts": _Q4_SQL,
    "promo_revenue_ratio": _Q14_SQL,
    "top_supplier_by_revenue": _Q15_SQL,
}
