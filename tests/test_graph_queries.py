"""Property-graph surface queries vs DuckDB oracle."""

from __future__ import annotations

import pytest

from tests.conftest import SF_DIR, compare_query_to_oracle
from threat_detection_nosql_spark.queries import graph_queries


@pytest.mark.parametrize("name", sorted(graph_queries.QUERIES))
def test_graph_query_matches_oracle(spark, ddb, name):
    compare_query_to_oracle(spark, ddb, graph_queries.QUERIES[name],
                            graph_queries.ORACLES[name])


def test_edge_multiplicity_equals_fact_rows(spark):
    """Multigraph invariant: every edge type has exactly one edge per
    log row (SURVEY.md §1.2)."""
    rows = {(r["kind"], r["name"]): r["n"]
            for r in graph_queries.graph_summary(spark, SF_DIR).collect()}
    edge_counts = {v for (k, _), v in rows.items() if k == "edge"}
    assert len(edge_counts) == 1  # all four edge tables same cardinality
    assert rows[("node", "User")] <= next(iter(edge_counts))
