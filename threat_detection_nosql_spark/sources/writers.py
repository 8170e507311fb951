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
