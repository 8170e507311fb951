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
