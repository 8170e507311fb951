"""Relational operator-coverage queries vs DuckDB oracle at sf0.01."""

from __future__ import annotations

import pytest

from tests.conftest import compare_query_to_oracle
from threat_detection_nosql_spark.queries import relational


@pytest.mark.parametrize("name", sorted(relational.QUERIES))
def test_relational_query_matches_oracle(spark, ddb, name):
    compare_query_to_oracle(spark, ddb, relational.QUERIES[name],
                            relational.ORACLES[name])
