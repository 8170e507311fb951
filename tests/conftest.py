from __future__ import annotations

import duckdb
import pytest

from threat_detection_nosql_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.01"
SF_SMALL = "/root/testdata/sf0.001"

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests")
    yield s


@pytest.fixture(scope="session")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    yield con
    con.close()


def normalize(rows, columns, float_round=6):
    """Driver-style normalization: columns sorted by name, rows sorted,
    floats rounded — order-insensitive value comparison."""
    idx = sorted(range(len(columns)), key=lambda i: columns[i])

    def norm_val(v):
        if isinstance(v, float):
            return round(v, float_round)
        return v

    out = []
    for r in rows:
        out.append(tuple(norm_val(r[i]) for i in idx))
    return sorted(out, key=repr)


def compare_query_to_oracle(spark, ddb, fn, sql, sf_dir=SF_DIR):
    sdf = fn(spark, sf_dir)
    spark_cols = sdf.columns
    spark_rows = [tuple(r) for r in sdf.collect()]
    rel = ddb.sql(sql)
    ddb_cols = list(rel.columns)
    ddb_rows = rel.fetchall()
    assert sorted(spark_cols) == sorted(ddb_cols), \
        f"schema mismatch: {spark_cols} vs {ddb_cols}"
    a = normalize(spark_rows, spark_cols)
    b = normalize(ddb_rows, ddb_cols)
    assert len(a) == len(b), f"row count {len(a)} vs {len(b)}"
    mismatches = [(x, y) for x, y in zip(a, b) if x != y]
    assert not mismatches, f"value mismatch (first 3): {mismatches[:3]}"


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: long-running parity gates (full grid CV); included in "
        "the default run, deselect with -m 'not slow' for quick loops")
