"""Sinks (SURVEY.md §2.1 S5–S7): parquet/CSV round trips, overwrite
semantics, partitioned layout, ML model persistence."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMALL
from threat_detection_nosql_spark.sources.readers import load_table
from threat_detection_nosql_spark.sources.writers import write_results


def test_parquet_round_trip(spark, tmp_path):
    df = load_table(spark, SF_SMALL, "nation")
    out = str(tmp_path / "nation_pq")
    write_results(df, out)
    back = spark.read.parquet(out)
    assert back.count() == df.count()
    assert set(back.columns) == set(df.columns)


def test_csv_round_trip(spark, tmp_path):
    df = load_table(spark, SF_SMALL, "region").select("r_regionkey", "r_name")
    out = str(tmp_path / "region_csv")
    write_results(df, out, fmt="csv")
    back = spark.read.option("header", True).csv(out)
    assert back.count() == df.count()
    assert back.columns == ["r_regionkey", "r_name"]


def test_overwrite_replaces_previous_content(spark, tmp_path):
    """S5: the reference's MATCH (n) DETACH DELETE n reload analog."""
    out = str(tmp_path / "ow")
    write_results(load_table(spark, SF_SMALL, "nation"), out)
    one_row = load_table(spark, SF_SMALL, "nation").limit(1)
    write_results(one_row, out)
    assert spark.read.parquet(out).count() == 1


def test_partitioned_layout_prunes(spark, tmp_path):
    df = load_table(spark, SF_SMALL, "nation")
    out = str(tmp_path / "by_region")
    write_results(df, out, partition_by=["n_regionkey"])
    pruned = (spark.read.parquet(out)
              .filter(F.col("n_regionkey") == 0))
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    # partition filter must reach the scan, not a post-scan Filter
    assert pruned.count() == df.filter(F.col("n_regionkey") == 0).count()
    assert "PartitionFilters: [" in plan


def test_model_save_load(spark, tmp_path):
    """S7: the joblib-artifact analog — Spark ML native persistence."""
    from pyspark.ml.clustering import KMeans, KMeansModel

    from threat_detection_nosql_spark.ml.features import (
        assemble_features,
        scale_features,
        synthetic_anomaly_fixture,
    )
    scaled = scale_features(assemble_features(
        synthetic_anomaly_fixture(spark, n=50, n_anomalies=5),
        cols=[f"f{i}" for i in range(8)]))
    model = KMeans(k=2, seed=42, featuresCol="scaled").fit(scaled)
    path = str(tmp_path / "kmeans_model")
    model.write().overwrite().save(path)
    back = KMeansModel.load(path)
    assert [list(c) for c in back.clusterCenters()] == \
        [list(c) for c in model.clusterCenters()]


def test_json_round_trip(spark, tmp_path):
    from threat_detection_nosql_spark.sources.writers import write_results
    df = spark.range(50).selectExpr("id", "id * 2 AS v")
    path = str(tmp_path / "out_json")
    write_results(df, path, fmt="json")
    back = spark.read.json(path)
    assert back.count() == 50
    assert {r.id for r in back.collect()} == set(range(50))


def test_orc_round_trip(spark, tmp_path):
    from threat_detection_nosql_spark.sources.writers import write_results
    df = spark.range(50).selectExpr("id", "cast(id AS double) AS v")
    path = str(tmp_path / "out_orc")
    write_results(df, path, fmt="orc")
    back = spark.read.orc(path)
    assert back.count() == 50
    assert dict(back.dtypes) == {"id": "bigint", "v": "double"}


def test_ivf_index_partition_pruning(spark, tmp_path):
    """The cell-partitioned IVF layout must prune: probing 2 of the
    cells reads ONLY those two directories (inputFiles ⊆ cell=K dirs,
    PartitionFilters in the scan) and returns exactly their vectors."""
    from pyspark.sql import functions as F

    from threat_detection_nosql_spark.operators.clustering import (
        kmeans_fixed)
    from threat_detection_nosql_spark.sources.writers import (
        read_ivf_cells, write_ivf_index)

    emb = spark.createDataFrame(
        [(i, [float(i % 4), float((i * 7) % 5)]) for i in range(64)],
        "vec_id long, v array<double>")
    assigned, _ = kmeans_fixed(emb, k=4, n_iters=1)
    path = str(tmp_path / "ivf_index")
    write_ivf_index(assigned, path)

    probe = read_ivf_cells(spark, path, [0, 2])
    got = {(r["vec_id"], r["cell"]) for r in probe.collect()}
    want = {(r["vec_id"], r["cell"])
            for r in assigned.collect() if r["cell"] in (0, 2)}
    assert got == want and got

    # inputFiles() lists the unpruned relation, so the pruning proof is
    # the scan's PartitionFilters: the IN-list must ride the partition
    # column (directory pruning), not the data filters
    plan = probe._jdf.queryExecution().executedPlan().toString()
    pf = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert pf, plan
    squeezed = pf[0].replace(" ", "")
    assert "cell" in squeezed and "IN(0,2)" in squeezed, pf
    # rows materialized = rows of the two probed directories only
    assert probe.count() == len(want)


def test_compaction_reduces_files_preserving_rows(spark, tmp_path):
    """50 tiny fragments compact to the byte-derived file count with
    identical contents; a second compaction is a no-op-sized rewrite."""
    from threat_detection_nosql_spark.sources.writers import (
        compact_dataset)

    path = str(tmp_path / "frag")
    spark.range(5000).selectExpr(
        "id", "cast(id % 7 as string) AS grp").repartition(50) \
        .write.parquet(path)

    def parquet_files():
        import os
        return [f for r, _, fs in os.walk(path)
                for f in fs if f.endswith(".parquet")]

    assert len(parquet_files()) == 50
    before = {(r["id"], r["grp"])
              for r in spark.read.parquet(path).collect()}
    n = compact_dataset(spark, path, target_file_bytes=1 << 30)
    assert n == 1 and len(parquet_files()) == 1
    after = {(r["id"], r["grp"])
             for r in spark.read.parquet(path).collect()}
    assert after == before


def test_synthetic_datasource_deterministic_and_partitioned(spark):
    """The custom Python data source must (a) produce bit-identical
    rows across reads (seeded hash — replayable load generation),
    (b) scale rows with partitions without touching the driver, and
    (c) compose with ordinary aggregation on top."""
    from threat_detection_nosql_spark.sources.synthetic import (
        SyntheticEventsDataSource)

    spark.dataSource.register(SyntheticEventsDataSource)
    df = (spark.read.format("synthetic_events")
          .option("numPartitions", 4)
          .option("rowsPerPartition", 500).load())
    assert df.count() == 2000
    assert df.rdd.getNumPartitions() == 4

    a = sorted((r["event_id"], r["user_id"], r["event_type"], r["value"])
               for r in df.collect())
    b = sorted((r["event_id"], r["user_id"], r["event_type"], r["value"])
               for r in spark.read.format("synthetic_events")
               .option("numPartitions", 4)
               .option("rowsPerPartition", 500).load().collect())
    assert a == b
    assert len({r[0] for r in a}) == 2000  # event_id is unique

    agg = (df.groupBy("event_type").count().collect())
    assert sum(r["count"] for r in agg) == 2000
    assert {r["event_type"] for r in agg} <= {
        "login", "read", "write", "purchase", "error"}


def test_synthetic_stream_equals_batch(spark):
    """The streaming face of the generator drains to exactly the batch
    read of the same row range — offsets are row counters, each
    micro-batch regenerates its slice from the seeded hash."""
    import uuid

    from threat_detection_nosql_spark.sources.synthetic import (
        SyntheticEventsDataSource)

    spark.dataSource.register(SyntheticEventsDataSource)
    stream = (spark.readStream.format("synthetic_events")
              .option("rowsPerBatch", 300)
              .option("maxRows", 1000).load())
    name = f"syn_{uuid.uuid4().hex[:8]}"
    q = (stream.writeStream.outputMode("append")
         .format("memory").queryName(name)
         .option("checkpointLocation",
                 f"/tmp/syn_ckpt_{name}").start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    drained = {(r["event_id"], r["user_id"], r["value"])
               for r in spark.table(name).collect()}
    batch = {(r["event_id"], r["user_id"], r["value"])
             for r in spark.read.format("synthetic_events")
             .option("numPartitions", 2)
             .option("rowsPerPartition", 500).load().collect()}
    assert drained == batch and len(drained) == 1000


def test_compaction_recovers_from_torn_swap(spark, tmp_path):
    """Crash between the two renames leaves only the backup; the next
    compaction must restore it and still rewrite correctly."""
    import os

    from threat_detection_nosql_spark.sources.writers import (
        compact_dataset)

    path = str(tmp_path / "torn")
    spark.range(100).repartition(10).write.parquet(path)
    before = {r["id"] for r in spark.read.parquet(path).collect()}
    os.rename(path, f"{path}__backup")  # simulate the torn swap
    n = compact_dataset(spark, path, target_file_bytes=1 << 30)
    assert n == 1
    assert not os.path.exists(f"{path}__backup")
    assert {r["id"] for r in spark.read.parquet(path).collect()} == before


def test_compaction_clears_stale_backup_from_completed_swap(spark,
                                                            tmp_path):
    """Crash AFTER the swap completed but before backup cleanup leaves
    both path and a stale backup; the next compaction must drop the
    backup (the swap already committed) instead of dying ENOTEMPTY on
    its own os.rename(path, backup)."""
    import os
    import shutil

    from threat_detection_nosql_spark.sources.writers import (
        compact_dataset)

    path = str(tmp_path / "staleback")
    spark.range(100).repartition(10).write.parquet(path)
    before = {r["id"] for r in spark.read.parquet(path).collect()}
    # simulate: prior run committed `path`, crashed before rmtree(backup)
    shutil.copytree(path, f"{path}__backup")
    n = compact_dataset(spark, path, target_file_bytes=1 << 30)
    assert n == 1
    assert not os.path.exists(f"{path}__backup")
    assert {r["id"] for r in spark.read.parquet(path).collect()} == before


def test_publish_gated_rejects_and_preserves_live(spark, tmp_path):
    """A failing audit must leave the live dataset untouched and the
    staging directory cleaned; a passing audit swaps atomically."""
    import os

    import pytest as _pytest

    from threat_detection_nosql_spark.sources.writers import (
        PublishRejected, publish_gated)

    path = str(tmp_path / "table")
    v1 = spark.range(10).withColumnRenamed("id", "k")
    assert publish_gated(v1, path, [("nonempty",
                                     lambda d: d.count() > 0)])["published"]
    assert spark.read.parquet(path).count() == 10

    bad = spark.range(0).withColumnRenamed("id", "k")  # empty batch
    with _pytest.raises(PublishRejected, match="nonempty"):
        publish_gated(bad, path, [("nonempty", lambda d: d.count() > 0)])
    # live version still v1, no staging junk left behind
    assert spark.read.parquet(path).count() == 10
    assert not os.path.exists(path + "__staged")

    v2 = spark.range(25).withColumnRenamed("id", "k")
    out = publish_gated(v2, path, [("nonempty", lambda d: d.count() > 0),
                                   ("cap", lambda d: d.count() < 100)])
    assert out["audits"] == {"nonempty": True, "cap": True}
    assert spark.read.parquet(path).count() == 25


def test_schema_drift_detects_all_three_changes(spark, tmp_path):
    from threat_detection_nosql_spark.sources.writers import schema_drift

    old_p, new_p = str(tmp_path / "old"), str(tmp_path / "new")
    spark.sql("SELECT 1 AS a, CAST(2 AS INT) AS b, 'x' AS c") \
        .write.parquet(old_p)
    spark.sql("SELECT 1 AS a, CAST(2 AS BIGINT) AS b, 1.5 AS d") \
        .write.parquet(new_p)
    drift = {d["column"]: d for d in schema_drift(spark, old_p, new_p)}
    assert drift["c"]["change"] == "removed"
    assert drift["d"]["change"] == "added"
    assert drift["b"]["change"] == "type_changed"
    assert drift["b"]["old_type"] == "int"
    assert drift["b"]["new_type"] == "bigint"
    assert "a" not in drift
