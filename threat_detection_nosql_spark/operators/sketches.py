"""Mergeable-sketch rollups (Apache DataSketches, built into Spark
4.x SQL: ``hll_sketch_agg`` / ``hll_union_agg`` / ``kll_sketch_*`` /
``theta_sketch_agg``).

This is THE 100 TB pattern for distinct counts and quantiles:
materialize one KB-sized sketch per (partition-key, group) once — an
algebraic aggregation, map-side combinable, fixed-size state — then
answer any coarser rollup by *merging sketches* instead of rescanning
the fact table. A year of daily sketches merges in milliseconds;
exact countDistinct over the same year rescans 100 TB.

Estimates are engine-specific (no DuckDB value oracle) — accuracy is
pinned by tolerance tests against exact counts
(tests/test_sketches.py), the same gate approx_count_distinct gets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def daily_user_sketches(events: DataFrame,
                        lg_k: int = 12) -> DataFrame:
    """Per (day, event_type) HLL sketch of user_id — the materialized
    base table a production pipeline writes daily. Sketch size is
    2^lg_k bytes regardless of cardinality."""
    return (events
            .groupBy(F.to_date("ts").alias("day"),
                     F.col("event_type"))
            .agg(F.hll_sketch_agg("user_id", F.lit(lg_k)).alias("sk"),
                 F.count("*").alias("n_events")))


def rollup_distinct_users(daily: DataFrame) -> DataFrame:
    """Distinct users per event_type across all days = union of the
    daily sketches. Merging touches |days|×|types| KB-sized rows —
    never the events table."""
    return (daily
            .groupBy("event_type")
            .agg(F.hll_sketch_estimate(F.hll_union_agg("sk"))
                  .alias("est_distinct_users"),
                 F.sum("n_events").alias("n_events")))


def daily_value_sketches(events: DataFrame,
                         k: int = 200) -> DataFrame:
    """Per (day, event_type) KLL quantile sketch of `value` — same
    materialize-once pattern for percentiles."""
    return (events
            .groupBy(F.to_date("ts").alias("day"),
                     F.col("event_type"))
            .agg(F.kll_sketch_agg_double("value", F.lit(k)).alias("sk")))


def rollup_value_quantiles(daily: DataFrame,
                           quantiles: tuple[float, ...] = (0.5, 0.99),
                           ) -> DataFrame:
    """Merged per-type quantiles from the daily KLL sketches.
    ``kll_sketch_merge_double`` is a binary scalar (no agg form), so
    the per-group sketch list (|days| KB-sized blobs — driver never
    sees them) folds with an ``aggregate`` expression."""
    merged = (daily.groupBy("event_type")
              .agg(F.collect_list("sk").alias("sks"))
              .withColumn("sk", F.expr(
                  "aggregate(slice(sks, 2, size(sks) - 1), sks[0], "
                  "(acc, x) -> kll_sketch_merge_double(acc, x))")))
    cols = [F.kll_sketch_get_quantile_double("sk", F.lit(q))
             .alias(f"p{int(q * 100)}")
            for q in quantiles]
    return merged.select("event_type", *cols)
