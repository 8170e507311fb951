"""Durable streaming sink path: parquet file sink + checkpoint.
Restarting the query against the same checkpoint must not re-emit
already-committed micro-batches (file-sink exactly-once)."""

from __future__ import annotations

from pyspark.sql import functions as F


def _write_src(spark, path, ids):
    (spark.createDataFrame([(i,) for i in ids], "id long")
     .coalesce(1).write.mode("overwrite").parquet(path))


def _run_once(spark, src_glob, out, ckpt):
    q = (spark.readStream.schema("id long").parquet(src_glob)
         .withColumn("doubled", F.col("id") * 2)
         .writeStream.format("parquet")
         .option("path", out)
         .option("checkpointLocation", ckpt)
         .outputMode("append")
         .start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()


def test_stream_parquet_sink_exactly_once(spark, tmp_path):
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    _write_src(spark, f"{src}/b1", range(0, 100))
    _run_once(spark, f"{src}/b*", out, ckpt)
    assert spark.read.parquet(out).count() == 100

    # second source batch + a fresh query on the SAME checkpoint:
    # batch 1 must not be reprocessed or re-emitted
    _write_src(spark, f"{src}/b2", range(100, 150))
    _run_once(spark, f"{src}/b*", out, ckpt)
    result = spark.read.parquet(out)
    assert result.count() == 150
    assert result.select(F.sum("doubled")).first()[0] == sum(
        2 * i for i in range(150))
