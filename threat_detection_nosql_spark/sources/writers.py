"""Sinks (SURVEY.md §2.1 S5–S7).

The reference writes driver-side CSVs (`Comparaison_ML.py:1166-1168`);
here the default sink is partition-parallel parquet with overwrite mode
standing in for the reference's full-delete-then-reload (S5,
`neo4j_setup.py:23`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_results(df: DataFrame, path: str, fmt: str = "parquet",
                  mode: str = "overwrite",
                  partition_by: list[str] | None = None) -> None:
    """fmt ∈ {parquet, csv, json, orc}: the columnar pair for
    analytics storage, line-delimited JSON for interchange."""
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if fmt == "csv":
        writer.option("header", True).csv(path)
    elif fmt == "json":
        writer.json(path)
    elif fmt == "orc":
        writer.orc(path)
    else:
        writer.parquet(path)


def write_ivf_index(assigned: DataFrame, path: str) -> None:
    """Materialize an IVF ANN index as a cell-partitioned parquet
    layout (``path/cell=<k>/``) — the physical form the probe path
    assumes at scale (operators/similarity.ivf_fixed_neighbors): a
    query probing ``n_probe`` cells scans exactly those directories
    and nothing else, so search cost is decoupled from corpus size.
    One shuffle on ``cell`` keeps one file per cell instead of
    |tasks|×|cells| fragments."""
    (assigned.repartition("cell")
     .write.mode("overwrite").partitionBy("cell").parquet(path))


def read_ivf_cells(spark, path: str, cells: list[int]) -> DataFrame:
    """Probe read over a :func:`write_ivf_index` layout. The
    ``cell IN (...)`` predicate is a partition filter — the scan lists
    only the probed directories (PartitionFilters in the plan,
    verified by tests/test_sinks.py)."""
    from pyspark.sql import functions as F
    return spark.read.parquet(path).filter(F.col("cell").isin(cells))


def compact_dataset(spark, path: str,
                    target_file_bytes: int = 128 * 1024 * 1024) -> int:
    """Small-file compaction — the standing maintenance task of any
    long-running parquet sink (streaming upserts, per-batch appends,
    over-parallel writers all fragment the layout, and at scale the
    file count, not the byte count, dominates scan planning time).
    Rewrites the dataset into ``ceil(bytes / target_file_bytes)``
    files via a round-robin repartition, committed with the same
    staged-write → backup-rename swap as the streaming upsert sink
    (crash mid-swap recovers from the backup). Returns the new file
    count.

    Flat layouts only: a hive-partitioned dataset should be compacted
    per partition directory (each directory IS a flat layout), which
    also bounds the rewrite to touched partitions at scale."""
    import math
    import os
    import shutil

    backup = f"{path}__backup"
    if not os.path.exists(path) and os.path.exists(backup):
        os.rename(backup, path)  # recover a torn previous swap
    elif os.path.exists(path) and os.path.exists(backup):
        # prior swap completed but crashed before cleanup: drop the
        # stale backup or this run's os.rename(path, backup) ENOTEMPTYs
        shutil.rmtree(backup)
    df = spark.read.parquet(path)
    total = sum(os.path.getsize(os.path.join(r, f))
                for r, _, fs in os.walk(path)
                for f in fs if f.endswith(".parquet"))
    n_files = max(1, math.ceil(total / target_file_bytes))
    staged = f"{path}__staged"
    df.repartition(n_files).write.mode("overwrite").parquet(staged)
    os.rename(path, backup)
    os.rename(staged, path)
    shutil.rmtree(backup)
    return n_files


class PublishRejected(RuntimeError):
    """Raised when a write-audit-publish gate fails its audit."""


def publish_gated(df: DataFrame, path: str, audits) -> dict:
    """Write-audit-publish: stage the dataset, run every audit against
    the STAGED files (not the in-memory frame — what you audit must be
    what readers will scan), and atomically swap it live only if all
    audits pass. The pattern every production table promotion uses —
    a bad batch never becomes visible, and the previous version stays
    live untouched on rejection.

    ``audits`` is a list of (name, fn) where fn(staged_df) -> bool
    (True = pass). On failure the staged directory is removed,
    :class:`PublishRejected` lists the failing audits, and ``path`` is
    untouched. On success the swap is the same staged → backup-rename
    commit as :func:`compact_dataset` (crash-recoverable). Returns
    {"published": True, "audits": {name: True, ...}} for monitoring."""
    import os
    import shutil

    spark = df.sparkSession
    staged = f"{path}__staged"
    backup = f"{path}__backup"
    if os.path.exists(path) and os.path.exists(backup):
        shutil.rmtree(backup)  # stale prior-swap leftover
    df.write.mode("overwrite").parquet(staged)
    staged_df = spark.read.parquet(staged)
    results = {name: bool(fn(staged_df)) for name, fn in audits}
    if not all(results.values()):
        shutil.rmtree(staged)
        failed = sorted(n for n, ok in results.items() if not ok)
        raise PublishRejected(f"audit(s) failed: {failed}")
    if os.path.exists(path):
        os.rename(path, backup)
        os.rename(staged, path)
        shutil.rmtree(backup)
    else:
        os.rename(staged, path)
    return {"published": True, "audits": results}


def schema_drift(spark, old_path: str, new_path: str) -> list[dict]:
    """Schema drift between two parquet datasets: added, removed, and
    type-changed columns — the pre-ingest check that catches an
    upstream producer silently widening an int or dropping a field
    before a 100 TB backfill bakes the damage in. Metadata-only (two
    footer reads, no data scan). Returns a list of
    {"column", "change", "old_type", "new_type"} dicts, empty when the
    schemas agree."""
    old = {f.name: f.dataType.simpleString()
           for f in spark.read.parquet(old_path).schema.fields}
    new = {f.name: f.dataType.simpleString()
           for f in spark.read.parquet(new_path).schema.fields}
    drift: list[dict] = []
    for c in sorted(set(old) - set(new)):
        drift.append({"column": c, "change": "removed",
                      "old_type": old[c], "new_type": None})
    for c in sorted(set(new) - set(old)):
        drift.append({"column": c, "change": "added",
                      "old_type": None, "new_type": new[c]})
    for c in sorted(set(old) & set(new)):
        if old[c] != new[c]:
            drift.append({"column": c, "change": "type_changed",
                          "old_type": old[c], "new_type": new[c]})
    return drift


def write_bucketed(df: DataFrame, table: str, key: str,
                   buckets: int = 32,
                   sort_within: bool = True) -> None:
    """Materialize a catalog table bucketed (and optionally sorted)
    on ``key`` — the co-located-join layout for fact-fact joins that
    repeat across a pipeline. Two tables bucketed the same way join
    with ZERO exchange (and zero sort when sort_within): at 100 TB
    the shuffle this removes is usually the single largest cost of
    the join, and bucket pruning serves point lookups on the key.
    The 100-TB caveats, stated: bucket count is fixed at write time
    (size it for the TARGET scale, not the test scale) and both sides
    must agree on (key, buckets) — a mismatch silently falls back to
    a shuffled join, which the plan test pins against."""
    w = df.write.mode("overwrite").format("parquet")
    w = w.bucketBy(buckets, key)
    if sort_within:
        w = w.sortBy(key)
    w.saveAsTable(table)
