"""Bucketed co-located join (the 100 TB fact-fact join layout): both
sides bucketed+sorted on the join key join with ZERO exchanges — the
shuffle is paid once at write time and amortized over every query."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMALL
from threat_detection_nosql_spark.sources.readers import load_table


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    for t in ("orders_bkt", "lineitem_bkt"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    (load_table(spark, SF_SMALL, "orders")
     .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
     .mode("overwrite").saveAsTable("orders_bkt"))
    (load_table(spark, SF_SMALL, "lineitem")
     .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
     .mode("overwrite").saveAsTable("lineitem_bkt"))
    yield
    for t in ("orders_bkt", "lineitem_bkt"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = (spark.table("lineitem_bkt")
             .join(spark.table("orders_bkt"),
                   F.col("l_orderkey") == F.col("o_orderkey"))
             .groupBy("o_orderstatus")
             .agg(F.count("*").alias("n")))
        j.collect()
        plan = j._jdf.queryExecution().executedPlan().toString()
        final = plan.split("== Initial Plan ==")[0]
        # bucketing makes both sides pre-partitioned on the key: the
        # join itself requires no shuffle (only the final tiny agg may)
        assert "Exchange hashpartitioning(l_orderkey" not in final
        assert "Exchange hashpartitioning(o_orderkey" not in final
        assert "SortMergeJoin" in final
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_join_matches_plain(spark, bucketed_tables):
    plain = (load_table(spark, SF_SMALL, "lineitem")
             .join(load_table(spark, SF_SMALL, "orders"),
                   F.col("l_orderkey") == F.col("o_orderkey"))
             .groupBy("o_orderstatus").agg(F.count("*").alias("n")))
    bucketed = (spark.table("lineitem_bkt")
                .join(spark.table("orders_bkt"),
                      F.col("l_orderkey") == F.col("o_orderkey"))
                .groupBy("o_orderstatus").agg(F.count("*").alias("n")))
    a = {r["o_orderstatus"]: r["n"] for r in plain.collect()}
    b = {r["o_orderstatus"]: r["n"] for r in bucketed.collect()}
    assert a == b
