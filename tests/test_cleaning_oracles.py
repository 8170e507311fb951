"""Cleaning queries (queries/cleaning.py) vs DuckDB oracle —
the same order-insensitive value-hash comparison the driver runs."""

from __future__ import annotations

import pytest

from tests.conftest import compare_query_to_oracle
from threat_detection_nosql_spark.queries import cleaning


@pytest.mark.parametrize("name", sorted(cleaning.QUERIES))
def test_cleaning_query_matches_oracle(spark, ddb, name):
    if name not in cleaning.ORACLES:
        pytest.skip(f"{name} has no SQL oracle")
    compare_query_to_oracle(spark, ddb, cleaning.QUERIES[name],
                            cleaning.ORACLES[name])
