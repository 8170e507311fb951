"""As-of / range join operators: oracle comparison + planted-scenario
semantics (tie handling, null before first match, band boundaries)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import compare_query_to_oracle
from threat_detection_nosql_spark.operators.temporal_joins import (
    asof_backward_join,
    range_pair_counts,
)
from threat_detection_nosql_spark.queries import temporal


@pytest.mark.parametrize(
    "name", sorted({**temporal.QUERIES, **temporal.QUERIES_TAIL}))
def test_temporal_query_matches_oracle(spark, ddb, name):
    queries = {**temporal.QUERIES, **temporal.QUERIES_TAIL}
    oracles = {**temporal.ORACLES, **temporal.ORACLES_TAIL}
    compare_query_to_oracle(spark, ddb, queries[name], oracles[name])


def _ts(s):
    return F.to_timestamp(F.lit(s))


def test_asof_planted(spark):
    left = spark.createDataFrame(
        [("u1", "2024-01-01 10:00:00", 1),
         ("u1", "2024-01-01 11:00:00", 2),
         ("u1", "2024-01-01 09:00:00", 3),   # before any right row
         ("u2", "2024-01-01 10:30:00", 4)],  # key with no right rows
        "user string, ts_s string, id int"
    ).select("user", F.to_timestamp("ts_s").alias("ts"), "id")
    right = spark.createDataFrame(
        [("u1", "2024-01-01 10:00:00", "a"),   # exact tie with id=1
         ("u1", "2024-01-01 10:30:00", "b")],
        "user string, ts_s string, tag string"
    ).select("user", F.to_timestamp("ts_s").alias("ts"), "tag")
    out = {r["id"]: r["asof_tag"]
           for r in asof_backward_join(left, right, "user", "ts",
                                       "tag").collect()}
    assert out[1] == "a"      # tie: same-ts right row IS visible (>=)
    assert out[2] == "b"      # latest prior, not first
    assert out[3] is None     # before any right row -> null
    assert out[4] is None     # key absent from right -> null


def test_range_pairs_band_boundaries(spark):
    df = spark.createDataFrame(
        [("u1", "2024-01-01 10:00:00"),
         ("u1", "2024-01-01 10:04:59"),   # in band of row 1
         ("u1", "2024-01-01 10:05:00"),   # exactly +300s of row 1: in
         ("u1", "2024-01-01 10:10:01")],  # out of band of rows 1-3
        "user string, ts_s string"
    ).select("user", F.to_timestamp("ts_s").alias("ts"))
    out = {r["user"]: r["n_pairs"]
           for r in range_pair_counts(df, "user", "ts", 300).collect()}
    # pairs: (1,2) 299s, (1,3) exactly 300s (<= keeps it), (2,3) 1s;
    # (2,4) 302s and (3,4) 301s are out of band
    assert out["u1"] == 3
