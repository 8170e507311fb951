"""Z-order layout operator: value correctness + span-tightening.

The point of Z-ordering is file-skipping on BOTH clustering columns:
after range-partitioning on the interleaved value, every partition's
min/max box must be tight in each dimension — unlike a single-column
sort, which leaves the second dimension's span at full width.
"""

from pyspark.sql import functions as F

from threat_detection_nosql_spark.operators.layout import (
    zorder_layout,
    zorder_value,
)


def _py_morton(a: int, b: int, bits: int = 16) -> int:
    out = 0
    for i in range(bits):
        out |= ((a >> i) & 1) << (2 * i)
        out |= ((b >> i) & 1) << (2 * i + 1)
    return out


def test_zorder_value_matches_reference_bit_interleave(spark):
    rows = [(a, b) for a in (0, 1, 5, 63, 1000) for b in (0, 2, 7, 63)]
    df = spark.createDataFrame(rows, "a long, b long")
    got = {(r.a, r.b): r.z for r in
           df.select("a", "b", zorder_value(F.col("a"), F.col("b"))
                     .alias("z")).collect()}
    for (a, b), z in got.items():
        assert z == _py_morton(a, b), (a, b)


def test_zorder_layout_tightens_both_dimension_spans(spark):
    # 64×64 uniform grid → 16 range-buckets of the Z-value. Each bucket
    # must stay a compact box: span ≤ 32 per dimension (naive layouts
    # leave one dimension at the full 0..63 width).
    grid = (spark.range(64).select(F.col("id").alias("a"))
            .crossJoin(spark.range(64).select(F.col("id").alias("b"))))
    laid = zorder_layout(grid, "a", "b", n_files=16, bits=6)
    spans = (laid.withColumn("pid", F.spark_partition_id())
             .groupBy("pid")
             .agg((F.max("a") - F.min("a")).alias("span_a"),
                  (F.max("b") - F.min("b")).alias("span_b"),
                  F.count("*").alias("n"))
             .collect())
    assert sum(r.n for r in spans) == 64 * 64
    nonempty = [r for r in spans if r.n > 0]
    assert len(nonempty) >= 8
    assert max(r.span_a for r in nonempty) <= 32
    assert max(r.span_b for r in nonempty) <= 32
    # contrast: sorting by `a` alone leaves span_b at full width
    by_a = (grid.repartitionByRange(16, "a")
            .withColumn("pid", F.spark_partition_id())
            .groupBy("pid")
            .agg((F.max("b") - F.min("b")).alias("span_b"),
                 F.count("*").alias("n"))
            .collect())
    assert max(r.span_b for r in by_a if r.n > 0) == 63


def test_zorder_layout_preserves_rows(spark):
    df = spark.range(100).select(
        (F.col("id") % 10).alias("a"), (F.col("id") % 7).alias("b"),
        F.col("id").alias("payload"))
    out = zorder_layout(df, "a", "b", n_files=4)
    assert out.columns == ["a", "b", "payload"]
    assert sorted(r.payload for r in out.collect()) == list(range(100))
