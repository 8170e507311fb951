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
