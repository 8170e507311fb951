"""Data-layout operators: Z-order (Morton) clustering for multi-column
data skipping.

At 100 TB the scan is the dominant cost, and parquet row-group pruning
only helps when file-level min/max ranges are tight on the *queried*
columns. Range-partitioning on one column gives perfect pruning on that
column and none on any other; interleaving the bits of two columns into
a Z-value and range-partitioning on it gives good (bounded-overlap)
pruning on both. This is the same layout trick Delta/Iceberg expose as
`OPTIMIZE ... ZORDER BY` — here as a plain column expression + a
repartitionByRange, so it works on stock Spark.

The Z-value itself is a pure bit-interleave (JVM integer ops inside
codegen, no UDF), so it is also exposed as an oracle-checked query
(queries/corpus.event_zorder).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_value(a: Column, b: Column, bits: int = 16) -> Column:
    """Morton-interleave the low ``bits`` bits of two non-negative
    integral columns: result bit 2i is bit i of ``a``, bit 2i+1 is bit
    i of ``b``. The OR-chain of shifted masks stays a single codegen'd
    expression tree (2·bits terms)."""
    a = a.cast("long")
    b = b.cast("long")
    out: Column = F.lit(0).cast("long")
    for i in range(bits):
        out = out.bitwiseOR(
            F.shiftleft(F.shiftright(a, i).bitwiseAND(F.lit(1)), 2 * i))
        out = out.bitwiseOR(
            F.shiftleft(F.shiftright(b, i).bitwiseAND(F.lit(1)), 2 * i + 1))
    return out


def zorder_sql(a: str, b: str, bits: int = 16) -> str:
    """DuckDB spelling of :func:`zorder_value` (generated OR-chain), for
    oracle checks."""
    terms = []
    for i in range(bits):
        terms.append(f"((({a} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({b} >> {i}) & 1) << {2 * i + 1})")
    return "(" + " | ".join(terms) + ")"


def zorder_layout(df: DataFrame, col_a: str, col_b: str,
                  n_files: int = 32, bits: int = 16) -> DataFrame:
    """Cluster ``df`` into ``n_files`` range-buckets of the Z-value of
    (col_a, col_b) — the write-side layout step. Rows inside a bucket
    are sorted by the Z-value so parquet page-level stats are tight
    too. The Z column is dropped on output; layout is carried by the
    partitioning."""
    z = zorder_value(F.col(col_a), F.col(col_b), bits)
    return (df.withColumn("_z", z)
            .repartitionByRange(n_files, "_z")
            .sortWithinPartitions("_z")
            .drop("_z"))
