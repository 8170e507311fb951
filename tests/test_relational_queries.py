"""Relational operator-coverage queries vs DuckDB oracle at sf0.01."""

from __future__ import annotations

import pytest

from tests.conftest import compare_query_to_oracle
from threat_detection_nosql_spark.queries import relational


@pytest.mark.parametrize(
    "name", sorted({**relational.QUERIES, **getattr(relational, "QUERIES_TAIL", {})}))
def test_relational_query_matches_oracle(spark, ddb, name):
    queries = {**relational.QUERIES,
               **getattr(relational, "QUERIES_TAIL", {})}
    oracles = {**relational.ORACLES,
               **getattr(relational, "ORACLES_TAIL", {})}
    compare_query_to_oracle(spark, ddb, queries[name], oracles[name])


def test_approx_percentile_within_rank_error(spark):
    """The 100 TB sketch path: GK approx_percentile must land within
    1% rank error of the exact interpolated quantiles."""
    from pyspark.sql import functions as F

    from tests.conftest import SF_DIR
    from threat_detection_nosql_spark.sources.readers import load_table
    ev = load_table(spark, SF_DIR, "events").select("value")
    exact = ev.agg(
        F.percentile("value", F.array(F.lit(0.5), F.lit(0.95)))
        .alias("e")).first()["e"]
    approx = ev.agg(
        F.percentile_approx("value", F.array(F.lit(0.5), F.lit(0.95)),
                            10000).alias("a")).first()["a"]
    n = ev.count()
    vals = sorted(r["value"] for r in ev.collect())
    for e, a in zip(exact, approx):
        # rank distance between exact and approx answers <= 1% of n
        import bisect
        assert abs(bisect.bisect_left(vals, a)
                   - bisect.bisect_left(vals, e)) <= 0.01 * n
