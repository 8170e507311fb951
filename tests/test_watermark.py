"""Watermark semantics: late events beyond the watermark must be
dropped from append-mode windowed aggregation (SURVEY.md §7 step 7 —
late-data handling). Two micro-batches via maxFilesPerTrigger=1: batch
one advances the watermark past an old window; batch two delivers a
late event into that window, which must not resurface."""

from __future__ import annotations

import os
import time

from pyspark.sql import functions as F


def _write_batch(spark, path, rows, mtime):
    df = (spark.createDataFrame(rows, "ts string, user string")
          .select(F.to_timestamp("ts").alias("ts"), "user"))
    df.coalesce(1).write.mode("overwrite").parquet(path)
    for f in os.listdir(path):
        os.utime(os.path.join(path, f), (mtime, mtime))
    os.utime(path, (mtime, mtime))


def test_late_event_beyond_watermark_is_dropped(spark, tmp_path):
    base = str(tmp_path / "stream_in")
    now = time.time()
    # batch 1: one event at 01:00 (window [01:00,02:00)), one at 12:00
    # -> watermark after batch 1 = 12:00 - 10min = 11:50
    _write_batch(spark, f"{base}/b1", [
        ("2024-01-01 01:00:00", "u1"),
        ("2024-01-01 12:00:00", "u1"),
    ], now - 100)

    stream = (spark.readStream
              .schema("ts timestamp, user string")
              .parquet(f"{base}/b*"))
    agg = (stream.withWatermark("ts", "10 minutes")
           .groupBy(F.window("ts", "1 hour"), "user")
           .agg(F.count("*").alias("n")))

    q = (agg.writeStream.outputMode("append")
         .format("memory").queryName("wm_test").start())
    try:
        # drain batch 1 fully before the late file exists: batch
        # boundaries are then deterministic regardless of file mtimes
        q.processAllAvailable()
        # batch 2: late event at 01:30 — before the 11:50 watermark,
        # its window [01:00,02:00) is finalized -> must be dropped
        _write_batch(spark, f"{base}/b2", [
            ("2024-01-01 01:30:00", "u1"),
        ], now)
        q.processAllAvailable()
    finally:
        q.stop()
    got = {(r["window"]["start"].isoformat(), r["n"])
           for r in spark.table("wm_test").collect()}
    # the 01:00 window closed with exactly 1 event; the late 01:30
    # arrival did not reopen it or emit a correction row
    assert ("2024-01-01T01:00:00", 1) in got
    assert ("2024-01-01T01:00:00", 2) not in got
