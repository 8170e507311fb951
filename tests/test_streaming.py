"""Streaming queries vs batch oracle at sf0.01 + stateful profile checks."""

from __future__ import annotations

import pytest

from tests.conftest import compare_query_to_oracle
from threat_detection_nosql_spark.queries import streaming_queries as SQ

ORACLE_BACKED = sorted(SQ.ORACLES)


@pytest.mark.parametrize("name", ORACLE_BACKED)
def test_streaming_query_matches_batch_oracle(spark, ddb, name):
    compare_query_to_oracle(spark, ddb, SQ.QUERIES[name], SQ.ORACLES[name])


def test_stateful_profiles_match_batch_counts(spark):
    from tests.conftest import SF_SMALL
    out = SQ.stream_stateful_profiles(spark, SF_SMALL)
    rows = {r.user: r for r in out.collect()}
    from threat_detection_nosql_spark.queries.threat import user_features
    batch = {r.user: r for r in user_features(spark, SF_SMALL).collect()}
    assert set(rows) == set(batch)
    for u, r in rows.items():
        assert r.total_activities == batch[u].total_activities
        assert r.after_hours_activities == batch[u].after_hours_activities
