"""Every threat query hash-matches its DuckDB oracle at sf0.01 —
the same gate the driver applies (CORRECTNESS_r{N}.json)."""

from __future__ import annotations

import pytest

from tests.conftest import compare_query_to_oracle
from threat_detection_nosql_spark.queries import threat


@pytest.mark.parametrize(
    "name", sorted({**threat.QUERIES, **getattr(threat, "QUERIES_TAIL", {})}))
def test_threat_query_matches_oracle(spark, ddb, name):
    queries = {**threat.QUERIES, **getattr(threat, "QUERIES_TAIL", {})}
    oracles = {**threat.ORACLES, **getattr(threat, "ORACLES_TAIL", {})}
    compare_query_to_oracle(spark, ddb, queries[name], oracles[name])
