"""Portable-hash dedup queries (md5-based SimHash / winnowing /
signature MinHash) vs their generated DuckDB oracles."""

from __future__ import annotations

import pytest

from tests.conftest import compare_query_to_oracle
from threat_detection_nosql_spark.queries import advanced


@pytest.mark.parametrize("name", sorted(advanced.ORACLES))
def test_advanced_query_matches_oracle(spark, ddb, name):
    compare_query_to_oracle(spark, ddb, advanced.QUERIES[name],
                            advanced.ORACLES[name])
