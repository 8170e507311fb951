"""Salted join must be result-identical to the plain join."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_DIR
from threat_detection_nosql_spark.operators.skew import salted_join
from threat_detection_nosql_spark.sources.readers import load_table


def test_salted_join_matches_plain(spark):
    orders = (load_table(spark, SF_DIR, "orders")
              .select(F.col("o_custkey").alias("custkey"),
                      "o_orderkey", "o_totalprice"))
    cust = (load_table(spark, SF_DIR, "customer")
            .select(F.col("c_custkey").alias("custkey"), "c_name"))
    plain = (orders.join(cust, "custkey")
             .groupBy("custkey")
             .agg(F.count("*").alias("n"),
                  F.round(F.sum("o_totalprice"), 4).alias("s")))
    salted = (salted_join(orders, cust, "custkey", n_salts=8)
              .groupBy("custkey")
              .agg(F.count("*").alias("n"),
                   F.round(F.sum("o_totalprice"), 4).alias("s")))
    a = {r["custkey"]: (r["n"], r["s"]) for r in plain.collect()}
    b = {r["custkey"]: (r["n"], r["s"]) for r in salted.collect()}
    assert a == b


def test_salted_left_join_keeps_unmatched(spark):
    left = spark.createDataFrame(
        [(1, "a"), (2, "b"), (99, "no-dim")], "k int, v string")
    dim = spark.createDataFrame([(1, "x"), (2, "y")], "k int, d string")
    out = {r["k"]: r["d"]
           for r in salted_join(left, dim, "k", n_salts=4,
                                how="left").collect()}
    assert out == {1: "x", 2: "y", 99: None}
