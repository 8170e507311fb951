"""Every threat query hash-matches its DuckDB oracle at sf0.01 —
the same gate the driver applies (CORRECTNESS_r{N}.json)."""

from __future__ import annotations

import pytest

from tests.conftest import compare_query_to_oracle
from threat_detection_nosql_spark.queries import threat


@pytest.mark.parametrize("name", sorted(threat.QUERIES))
def test_threat_query_matches_oracle(spark, ddb, name):
    compare_query_to_oracle(spark, ddb, threat.QUERIES[name],
                            threat.ORACLES[name])
