"""Reference-shaped CSV ETL path (S1/S2/F1-F5, P2):
`data_preprocessing.py:5-31` semantics — explicit-schema CSV scan,
null-on-invalid timestamp parse (errors='coerce'), Monday=0 dayofweek,
key-column null drop."""

from __future__ import annotations

import textwrap

from threat_detection_nosql_spark.operators.etl import (
    preprocess_activity_log,
)
from threat_detection_nosql_spark.sources.readers import read_activity_csv

CSV = textwrap.dedent("""\
    timestamp,user,pc,activity,resource
    2024-01-05 07:30:00,USR1,PC1,login,fileA
    2024-01-06 12:00:00,USR1,PC1,email,fileB
    2024-01-08 19:30:00,USR2,PC2,usb,fileC
    not-a-timestamp,USR3,PC3,login,fileD
    2024-01-09 09:00:00,,PC4,login,fileE
    """)


def _load(spark, tmp_path):
    p = tmp_path / "log.csv"
    p.write_text(CSV)
    return preprocess_activity_log(read_activity_csv(spark, str(p)))


def test_invalid_timestamp_coerces_to_null_not_error(spark, tmp_path):
    rows = {r["user"]: r for r in _load(spark, tmp_path).collect()}
    # USR3's bad timestamp must coerce to null (pandas errors='coerce'),
    # and its derived features are null too — the row itself survives
    # (only user/pc/activity/resource nulls are dropped, P2)
    assert rows["USR3"]["timestamp"] is None
    assert rows["USR3"]["hour_of_day"] is None


def test_null_key_rows_dropped(spark, tmp_path):
    users = [r["user"] for r in _load(spark, tmp_path).collect()]
    assert None not in users  # the empty-user row is gone
    assert len(users) == 4


def test_temporal_features_monday_zero(spark, tmp_path):
    rows = {r["resource"]: r for r in _load(spark, tmp_path).collect()}
    # 2024-01-05 is a Friday -> dow 4, not weekend, 07:30 after-hours
    assert rows["fileA"]["day_of_week"] == 4
    assert rows["fileA"]["is_weekend"] == 0
    assert rows["fileA"]["is_after_hours"] == 1
    # 2024-01-06 is a Saturday -> dow 5, weekend, noon in-hours
    assert rows["fileB"]["day_of_week"] == 5
    assert rows["fileB"]["is_weekend"] == 1
    assert rows["fileB"]["is_after_hours"] == 0
    # 2024-01-08 is a Monday -> dow 0, 19:30 after-hours
    assert rows["fileC"]["day_of_week"] == 0
    assert rows["fileC"]["is_after_hours"] == 1


def test_schema_evolution_merge_read(spark, tmp_path):
    """Schema evolution across parquet batches: a later batch adds a
    column; mergeSchema unifies the footers and back-fills nulls —
    the ingest contract for long-lived datasets whose producers
    evolve (100 TB datasets are never rewritten for a new column)."""
    base = str(tmp_path / "evolving")
    spark.range(10).selectExpr("id", "id * 2 AS v") \
        .write.parquet(f"{base}/batch=1")
    spark.range(10, 20).selectExpr(
        "id", "id * 2 AS v", "cast(id as string) AS source") \
        .write.parquet(f"{base}/batch=2")
    merged = spark.read.option("mergeSchema", True).parquet(base)
    assert set(merged.columns) == {"id", "v", "source", "batch"}
    assert merged.count() == 20
    old = merged.filter("batch = 1")
    assert old.filter("source IS NULL").count() == 10


def test_observe_metrics_ride_the_query(spark):
    """df.observe(): pipeline observability without a second scan —
    row counts and null counts accumulate ON the query's own pass and
    surface via the Observation handle after the action."""
    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    from tests.conftest import SF_SMALL
    from threat_detection_nosql_spark.sources.readers import load_table

    # isolated session state: a registered Observation lingers in the
    # session's ObservationManager and breaks task serialization for
    # LATER ML-training jobs on the same session (Spark 4.1) — scope
    # it to a newSession() (same JVM, separate session state)
    spark = spark.newSession()
    obs = Observation("scan_stats")
    ev = load_table(spark, SF_SMALL, "events").observe(
        obs,
        F.count(F.lit(1)).alias("rows_scanned"),
        F.sum(F.col("value").isNull().cast("long")).alias("null_values"))
    n = ev.filter(F.col("event_type") == "purchase").count()
    got = obs.get
    assert got["rows_scanned"] == load_table(
        spark, SF_SMALL, "events").count()
    assert got["null_values"] >= 0
    assert n <= got["rows_scanned"]
