"""Cleaning queries (queries/cleaning.py) vs DuckDB oracle —
the same order-insensitive value-hash comparison the driver runs."""

from __future__ import annotations

import pytest

from tests.conftest import compare_query_to_oracle
from threat_detection_nosql_spark.queries import cleaning


@pytest.mark.parametrize(
    "name", sorted({**cleaning.QUERIES, **cleaning.QUERIES_TAIL}))
def test_cleaning_query_matches_oracle(spark, ddb, name):
    queries = {**cleaning.QUERIES, **cleaning.QUERIES_TAIL}
    oracles = {**cleaning.ORACLES, **cleaning.ORACLES_TAIL}
    if name not in oracles:
        pytest.skip(f"{name} has no SQL oracle")
    compare_query_to_oracle(spark, ddb, queries[name], oracles[name])


def test_psi_flags_planted_shift(spark):
    """PSI semantics on a planted distribution shift: identical slices
    give PSI ~0; a shifted current slice pushes the summed psi_term
    over the standard 0.2 'significant drift' threshold."""
    import pyspark.sql.functions as F

    from threat_detection_nosql_spark.queries.cleaning import (
        feature_drift_psi)

    def run(tmpdir, cur_offset):
        import pyarrow as pa
        import pyarrow.parquet as pq
        n = 2000
        prices = ([1000.0 + (i % 97) * 10 for i in range(n)]
                  + [1000.0 + cur_offset + (i % 97) * 10
                     for i in range(n)])
        from datetime import datetime
        dates = ([datetime(1995, 6, 1)] * n
                 + [datetime(1996, 6, 1)] * n)
        table = pa.table({
            "o_orderkey": pa.array(range(2 * n), pa.int64()),
            "o_custkey": pa.array([1] * 2 * n, pa.int64()),
            "o_orderstatus": pa.array(["F"] * 2 * n),
            "o_totalprice": pa.array(prices, pa.float64()),
            "o_orderdate": pa.array(dates, pa.timestamp("us")),
            "o_orderpriority": pa.array(["1-URGENT"] * 2 * n),
        })
        pq.write_table(table, f"{tmpdir}/orders.parquet")
        rows = feature_drift_psi(spark, tmpdir).agg(
            F.sum("psi_term").alias("psi")).collect()
        return rows[0]["psi"]

    import tempfile
    with tempfile.TemporaryDirectory() as d1:
        assert abs(run(d1, 0.0)) < 1e-6          # no drift
    with tempfile.TemporaryDirectory() as d2:
        assert run(d2, 5000.0) > 0.2             # planted shift
