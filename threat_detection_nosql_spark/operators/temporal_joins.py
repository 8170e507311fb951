"""Temporal join operators Spark lacks natively (north-star custom
operators): backward as-of join and bounded range join, both expressed
as compositions of built-in ops — no UDFs, no point lookups.

- **As-of join** (merge_asof / ASOF JOIN semantics): each left row
  gets the latest right row with ``right.ts <= left.ts`` per key.
  Implemented as union → per-key window `last(ignorenulls)` — ONE
  shuffle+sort per key, streaming through both sides in time order.
  This is the sort-based formulation that scales: no per-row probe, no
  broadcast requirement, skew bounded by per-key event volume.

- **Range join** (pairs within a time band): equi-join on
  (key, time-bucket) with the left side probing its own and the next
  bucket, then an exact band filter. Candidate fan-out is bounded by
  events-per-bucket, never |rows|² — the binning trick Spark's
  optimizer doesn't apply automatically to inequality joins (a naive
  `a.ts < b.ts <= a.ts+Δ` condition becomes a nested-loop join).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_backward_join(left: DataFrame, right: DataFrame, key: str,
                       ts: str, payload: str) -> DataFrame:
    """Attach ``payload`` of the latest ``right`` row with
    ``right[ts] <= left[ts]`` (ties: the right row is visible to
    same-timestamp left rows, matching ASOF's >= semantics). ``right``
    must be unique per (key, ts) — pre-aggregate it otherwise."""
    lcols = left.columns
    pt = dict(right.dtypes)[payload]
    l = (left
         .withColumn("_p", F.lit(None).cast(pt))
         .withColumn("_side", F.lit(1)))
    r = right.select(
        *[F.col(key) if c == key
          else F.col(ts) if c == ts
          else F.lit(None).cast(dict(left.dtypes)[c]).alias(c)
          for c in lcols],
        F.col(payload).alias("_p"),
        F.lit(0).alias("_side"))
    w = (Window.partitionBy(key).orderBy(F.asc(ts), F.asc("_side"))
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (l.unionByName(r)
            .withColumn("_asof", F.last("_p", ignorenulls=True).over(w))
            .filter(F.col("_side") == 1)
            .select(*lcols, F.col("_asof").alias(f"asof_{payload}")))


def asof_forward_join(left: DataFrame, right: DataFrame, key: str,
                      ts: str, payload: str) -> DataFrame:
    """Attach ``payload`` of the EARLIEST ``right`` row with
    ``right[ts] >= left[ts]`` per key — time-to-next-event semantics
    (the mirror of :func:`asof_backward_join`; same one-shuffle
    union+window formulation, with the frame looking FORWARD). Ties:
    a right row at the same timestamp is visible (>= semantics), so
    the sort places right rows after left rows at equal ``ts`` and the
    frame starts at the current row. ``right`` must be unique per
    (key, ts)."""
    lcols = left.columns
    pt = dict(right.dtypes)[payload]
    l = (left
         .withColumn("_p", F.lit(None).cast(pt))
         .withColumn("_side", F.lit(1)))
    r = right.select(
        *[F.col(key) if c == key
          else F.col(ts) if c == ts
          else F.lit(None).cast(dict(left.dtypes)[c]).alias(c)
          for c in lcols],
        F.col(payload).alias("_p"),
        F.lit(0).alias("_side"))
    w = (Window.partitionBy(key).orderBy(F.asc(ts), F.desc("_side"))
         .rowsBetween(Window.currentRow, Window.unboundedFollowing))
    return (l.unionByName(r)
            .withColumn("_asof", F.first("_p", ignorenulls=True).over(w))
            .filter(F.col("_side") == 1)
            .select(*lcols, F.col("_asof").alias(f"asof_{payload}")))


def range_pair_counts(df: DataFrame, key: str, ts: str,
                      band_seconds: int) -> DataFrame:
    """Per-key count of ordered event pairs (a, b) with
    ``a.ts < b.ts <= a.ts + band``. Bucketed candidate join: a probes
    bucket and bucket+1 (any in-band successor lands in one of them),
    then the exact band filter keeps true pairs."""
    band_us = band_seconds * 1_000_000
    e = df.select(F.col(key), F.unix_micros(F.col(ts)).alias("_tus")) \
          .withColumn("_bkt", F.floor(F.col("_tus") / band_us))
    probes = e.select(
        key, "_tus",
        F.explode(F.array(F.col("_bkt"),
                          F.col("_bkt") + 1)).alias("_pbkt"))
    b = e.select(F.col(key), F.col("_tus").alias("_btus"),
                 F.col("_bkt").alias("_pbkt"))
    return (probes.join(b, [key, "_pbkt"])
            .filter((F.col("_btus") > F.col("_tus"))
                    & (F.col("_btus") <= F.col("_tus") + band_us))
            .groupBy(key)
            .agg(F.count("*").alias("n_pairs")))
