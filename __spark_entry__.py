"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``threat_detection_nosql_spark``; this module
only adapts it to the contract.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (SURVEY.md §7 minimum slice): top-10 users by
    after-hours activity over /root/testdata/sf0.001."""
    from threat_detection_nosql_spark.queries.threat import after_hours_top10
    return after_hours_top10(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from threat_detection_nosql_spark.queries import all_queries
    return all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query; keys missing here (non-SQL ops:
    ML detectors, streaming state, LSH dedup) get rows-only checks."""
    from threat_detection_nosql_spark.queries import all_oracles
    return all_oracles()
