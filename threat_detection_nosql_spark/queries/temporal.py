"""Temporal-join queries (as-of / range) over the activity log, with
DuckDB oracles (ASOF JOIN / inequality join are native there, which
makes these the strongest cross-engine checks of the custom
operators)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from threat_detection_nosql_spark.operators.etl import (
    ACTIVITY_LOG_ORACLE_SQL,
    activity_log,
)
from threat_detection_nosql_spark.operators.temporal_joins import (
    asof_backward_join,
    range_pair_counts,
)

_LOG_CTE = f"WITH log AS ({ACTIVITY_LOG_ORACLE_SQL})"


def time_since_last_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Threat feature via as-of join: for every event, microseconds
    since the user's most recent 'error' event (NULL before the first
    error). Right side deduped to (user, ts) so ties are impossible."""
    log = activity_log(spark, sf_dir)
    errors = (log.filter(F.col("activity") == "error")
              .select("user", "ts").distinct()
              .withColumn("err_ts", F.col("ts")))
    left = log.select("event_id", "user", "ts")
    out = asof_backward_join(left, errors, key="user", ts="ts",
                             payload="err_ts")
    return out.select(
        "event_id", "user", "ts",
        F.col("asof_err_ts").alias("last_error_ts"),
        (F.unix_micros("ts") - F.unix_micros("asof_err_ts"))
        .alias("us_since_error"))


_ASOF_SQL = f"""
{_LOG_CTE},
errors AS (SELECT DISTINCT user, ts FROM log WHERE activity = 'error')
SELECT e.event_id, e.user, e.ts, er.ts AS last_error_ts,
       epoch_us(e.ts) - epoch_us(er.ts) AS us_since_error
FROM log e ASOF LEFT JOIN errors er
  ON e.user = er.user AND e.ts >= er.ts
"""


def burst_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join: per user, ordered event pairs within a 5-minute
    band — a burstiness signal. The bucketed candidate join keeps the
    pair generation bounded by events-per-bucket."""
    log = activity_log(spark, sf_dir)
    return range_pair_counts(log, key="user", ts="ts", band_seconds=300)


_RANGE_SQL = f"""
{_LOG_CTE}
SELECT a.user, CAST(count(*) AS BIGINT) AS n_pairs
FROM log a JOIN log b
  ON a.user = b.user
 AND epoch_us(b.ts) > epoch_us(a.ts)
 AND epoch_us(b.ts) <= epoch_us(a.ts) + 300000000
GROUP BY a.user
"""


def hourly_event_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-time histogram: events + distinct users per wall-clock
    hour bucket (`date_trunc`) — the time-series the reference's
    temporal plots consume, as one map-combinable aggregation. The
    bucket count is bounded by the time span, so the shuffle is tiny
    regardless of corpus size."""
    log = activity_log(spark, sf_dir)
    return (log.groupBy(F.date_trunc("hour", "ts").alias("hour_bucket"))
            .agg(F.count("*").alias("n_events"),
                 F.countDistinct("user").alias("n_users")))


_HISTOGRAM_SQL = f"""
{_LOG_CTE}
SELECT date_trunc('hour', ts) AS hour_bucket,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(count(DISTINCT user) AS BIGINT) AS n_users
FROM log
GROUP BY date_trunc('hour', ts)
"""


QUERIES = {
    "time_since_last_error": time_since_last_error,
    "burst_pair_counts": burst_pair_counts,
    "hourly_event_histogram": hourly_event_histogram,
}

ORACLES = {
    "time_since_last_error": _ASOF_SQL,
    "burst_pair_counts": _RANGE_SQL,
    "hourly_event_histogram": _HISTOGRAM_SQL,
}
