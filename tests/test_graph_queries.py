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


def test_pagerank_fixed_star_graph_hub_dominates(spark):
    from threat_detection_nosql_spark.operators.graph import pagerank_fixed
    from pyspark.sql import functions as F
    spokes = [(f"s{i}", "hub") for i in range(10)]
    edges = spark.createDataFrame(
        spokes + [(b, a) for a, b in spokes], "src string, dst string")
    ranks = {r.node: r["rank"]
             for r in pagerank_fixed(edges, n_iters=3).collect()}
    assert max(ranks, key=ranks.get) == "hub"
    # no dangling nodes → total rank mass is conserved at 1
    assert abs(sum(ranks.values()) - 1.0) < 1e-9
    assert len({v for k, v in ranks.items() if k != "hub"}) == 1
