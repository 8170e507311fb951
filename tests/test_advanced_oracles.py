"""Portable-hash dedup queries (md5-based SimHash / winnowing /
signature MinHash) vs their generated DuckDB oracles."""

from __future__ import annotations

import pytest

from tests.conftest import compare_query_to_oracle
from threat_detection_nosql_spark.queries import advanced


_QUERIES = {**advanced.QUERIES, **advanced.QUERIES_TAIL}
_ORACLES = {**advanced.ORACLES, **advanced.ORACLES_TAIL}


@pytest.mark.parametrize("name", sorted(_ORACLES))
def test_advanced_query_matches_oracle(spark, ddb, name):
    compare_query_to_oracle(spark, ddb, _QUERIES[name],
                            _ORACLES[name])
