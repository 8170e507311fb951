"""TPC-H classic queries (queries/tpch.py) vs DuckDB oracle —
the same order-insensitive value-hash comparison the driver runs."""

from __future__ import annotations

import pytest

from tests.conftest import compare_query_to_oracle
from threat_detection_nosql_spark.queries import tpch


@pytest.mark.parametrize(
    "name", sorted({**tpch.QUERIES, **tpch.QUERIES_TAIL}))
def test_tpch_query_matches_oracle(spark, ddb, name):
    queries = {**tpch.QUERIES, **tpch.QUERIES_TAIL}
    oracles = {**tpch.ORACLES, **tpch.ORACLES_TAIL}
    if name not in oracles:
        pytest.skip(f"{name} has no SQL oracle")
    compare_query_to_oracle(spark, ddb, queries[name], oracles[name])
