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


def test_foreach_batch_upsert_is_exactly_once(spark, tmp_path):
    """foreachBatch MERGE-into-parquet: additive per-key totals stay
    correct across a second run on the same checkpoint (committed
    batches must not re-apply)."""
    from threat_detection_nosql_spark.streaming.stream_queries import (
        run_foreach_batch_upsert,
    )
    src = str(tmp_path / "src")
    target = str(tmp_path / "target")
    ckpt = str(tmp_path 
               / "ckpt")

    def stream():
        return (spark.readStream.schema("user long, v long")
                .parquet(f"{src}/b*"))

    rows1 = [(u, 1) for u in range(10) for _ in range(3)]
    (spark.createDataFrame(rows1, "user long, v long")
     .coalesce(1).write.mode("overwrite").parquet(f"{src}/b1"))
    run_foreach_batch_upsert(stream(), ["user"], ["v"], target, ckpt)
    got = {r["user"]: r["v"] for r in spark.read.parquet(target).collect()}
    assert got == {u: 3 for u in range(10)}

    # second batch touches half the keys; a fresh query on the SAME
    # checkpoint must apply it once and never re-apply batch 1
    rows2 = [(u, 5) for u in range(5)]
    (spark.createDataFrame(rows2, "user long, v long")
     .coalesce(1).write.mode("overwrite").parquet(f"{src}/b2"))
    run_foreach_batch_upsert(stream(), ["user"], ["v"], target, ckpt)
    got = {r["user"]: r["v"] for r in spark.read.parquet(target).collect()}
    assert got == {**{u: 8 for u in range(5)}, **{u: 3 for u in range(5, 10)}}

    # idempotent no-op drain: nothing new, totals unchanged
    run_foreach_batch_upsert(stream(), ["user"], ["v"], target, ckpt)
    got = {r["user"]: r["v"] for r in spark.read.parquet(target).collect()}
    assert got == {**{u: 8 for u in range(5)}, **{u: 3 for u in range(5, 10)}}


def test_foreach_batch_upsert_replay_is_idempotent(spark, tmp_path):
    """At-least-once replay: if the checkpoint commit is lost AFTER the
    target swap (crash window), the replayed batch must be skipped via
    the _applied_batch_id sidecar, not double-added."""
    import shutil

    from threat_detection_nosql_spark.streaming.stream_queries import (
        run_foreach_batch_upsert,
    )
    src = str(tmp_path / "src")
    target = str(tmp_path / "target")
    ckpt = str(tmp_path / "ckpt")

    def stream():
        return (spark.readStream.schema("user long, v long")
                .parquet(f"{src}/b*"))

    rows = [(u, 2) for u in range(8)]
    (spark.createDataFrame(rows, "user long, v long")
     .coalesce(1).write.mode("overwrite").parquet(f"{src}/b1"))
    run_foreach_batch_upsert(stream(), ["user"], ["v"], target, ckpt)
    got = {r["user"]: r["v"] for r in spark.read.parquet(target).collect()}
    assert got == {u: 2 for u in range(8)}

    # simulate the crash: target was swapped in but the checkpoint
    # commit never landed -> the whole batch replays with the same id
    shutil.rmtree(ckpt)
    run_foreach_batch_upsert(stream(), ["user"], ["v"], target, ckpt)
    got = {r["user"]: r["v"] for r in spark.read.parquet(target).collect()}
    assert got == {u: 2 for u in range(8)}, "replayed batch double-added"


def test_foreach_batch_upsert_recovers_from_backup(spark, tmp_path):
    """Crash between rename(target, backup) and rename(staged, target):
    the next batch must restore the target from the backup first."""
    import os

    from threat_detection_nosql_spark.streaming.stream_queries import (
        run_foreach_batch_upsert,
    )
    src = str(tmp_path / "src")
    target = str(tmp_path / "target")
    ckpt = str(tmp_path / "ckpt")

    def stream():
        return (spark.readStream.schema("user long, v long")
                .parquet(f"{src}/b*"))

    (spark.createDataFrame([(u, 1) for u in range(5)], "user long, v long")
     .coalesce(1).write.mode("overwrite").parquet(f"{src}/b1"))
    run_foreach_batch_upsert(stream(), ["user"], ["v"], target, ckpt)

    # simulate the torn swap: target vanished mid-rename, backup holds it
    os.rename(target, f"{target}__backup")

    (spark.createDataFrame([(u, 4) for u in range(5)], "user long, v long")
     .coalesce(1).write.mode("overwrite").parquet(f"{src}/b2"))
    run_foreach_batch_upsert(stream(), ["user"], ["v"], target, ckpt)
    got = {r["user"]: r["v"] for r in spark.read.parquet(target).collect()}
    assert got == {u: 5 for u in range(5)}
    assert not os.path.exists(f"{target}__backup")
