"""Distributed exact ranking — global ``row_number`` / ``ntile``
without a single-partition sort.

Spark's unpartitioned window (``Window.orderBy(...)`` with no
``partitionBy``) moves the ENTIRE input through one task: the one plan
shape that cannot survive a 100× scale-up, and the only scale-killer
the round-9 audit found in this repo.  These helpers produce the exact
same ranking with every stage parallel:

1. ``repartitionByRange`` on the sort key — Spark samples the key
   distribution and assigns contiguous, balanced value ranges to
   partitions, so partition id order IS global sort order.
2. A per-partition ``row_number`` (window partitioned by
   ``spark_partition_id()`` — each task sorts only its own slice).
3. A k-row per-partition count table (k = shuffle partitions), turned
   into cumulative offsets by a window over k rows, broadcast back, and
   added to the local rank: ``global_rank = offset + local_rank``.

``ntile`` then follows from the global rank by its quota formula: with
``N`` rows and ``B`` buckets, the first ``N mod B`` buckets take
``ceil(N/B)`` rows and the rest ``floor(N/B)`` — pure arithmetic on the
rank, no further shuffle.  Both helpers are deterministic for a total
order key (callers must include a tie-break column, same as any
rank-consuming query).

The range-partitioned frame is referenced twice (ranks + offsets) and
MUST be pinned once (``localCheckpoint``) before both consumers read
it: ``repartitionByRange`` picks boundaries by reservoir-sampling its
input, which is sensitive to shuffle-reader arrival ORDER — two
separate materializations of the "same" exchange can choose different
boundaries, making the broadcast offsets disagree with the window's
partition ids (observed as impossible bucket ids at the 10x soak when
helper calls were chained: AQE's ReusedExchange dedupes the simple
case, but a subtree containing ``spark_partition_id()`` from a
previous helper level does not canonicalize equal, so reuse silently
stops applying).  The checkpoint makes partition identity a fact
about materialized data rather than a property of plan-level reuse.
At 100 TB this is one projection-narrow materialization — the same
order of cost as the range shuffle itself, and the price of exact
distributed ranking.

Correctness is pinned the strongest way available: the registry queries
built on these helpers (``order_value_histogram``,
``source_quantile_normalized``) keep plain ``ntile`` DuckDB oracles, so
every driver round hash-proves the rebased ranking identical to the
single-sort semantics.

Reference parity note: the reference's pandas scripts rank in-memory
(e.g. Comparaison_ML.py score sorts); this is the cluster-scale
re-expression.
"""
from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.window import Window

_PID = "__rank_pid"
_LRK = "__rank_local"
_OFF = "__rank_offset"
_TOT = "__rank_total"


def _keys(order_cols) -> list[Column]:
    """Plain strings sort ascending; pass ``F.desc(...)`` Columns for
    descending axes — both repartitionByRange and Window.orderBy honor
    the direction, so the rebased rank follows it too."""
    return [F.asc(c) if isinstance(c, str) else c for c in order_cols]


def with_global_rank(df: DataFrame, order_cols, *,
                     num_partitions: int | None = None,
                     rank_col: str = "rk",
                     total_col: str | None = None) -> DataFrame:
    """Append a 1-based dense global rank over ``order_cols`` (caller
    supplies a tie-break so the order is total).  Every stage is
    parallel; the only global structure is a broadcast k-row offset
    table.  When ``total_col`` is given, the total row count is also
    appended (free — it is the last cumulative offset), letting callers
    express rank-relative logic (ntile, percentile) without a separate
    ``count()`` job."""
    keys = _keys(order_cols)
    n_parts = num_partitions or int(
        df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32"))
    # pinned once: both consumers below must see the SAME boundaries
    # (module docstring — reservoir sampling is arrival-order
    # sensitive, exchange reuse is not guaranteed across levels)
    keyed = (df.repartitionByRange(n_parts, *keys)
             .withColumn(_PID, F.spark_partition_id())
             .localCheckpoint())
    local = keyed.withColumn(
        _LRK, F.row_number().over(Window.partitionBy(_PID).orderBy(*keys)))
    k_rows = Window.orderBy(_PID)  # k = shuffle partitions, bounded
    offsets = (keyed.groupBy(_PID).agg(F.count("*").alias("cnt"))
               .select(
                   _PID,
                   F.coalesce(
                       F.sum("cnt").over(
                           k_rows.rowsBetween(Window.unboundedPreceding,
                                              -1)),
                       F.lit(0)).alias(_OFF),
                   F.sum("cnt").over(
                       k_rows.rowsBetween(Window.unboundedPreceding,
                                          Window.unboundedFollowing))
                   .alias(_TOT)))
    out = (local.join(F.broadcast(offsets), _PID)
           .withColumn(rank_col, F.col(_OFF) + F.col(_LRK)))
    if total_col is not None:
        out = out.withColumn(total_col, F.col(_TOT))
    return out.drop(_PID, _LRK, _OFF, _TOT)


def ntile_from_rank(rank: Column, total: Column, n_buckets: int) -> Column:
    """SQL ``ntile(B)`` as arithmetic on a 1-based global rank: with
    ``q = total div B`` and ``r = total mod B``, the first ``r``
    buckets hold ``q+1`` rows (ranks 1..(q+1)*r) and the rest hold
    ``q``.  The quotient uses floor over a double division — exact
    while ranks stay below 2^53 (~9e15 rows, far past any real
    table); when ``total < B`` (q = 0) the bucket is the rank itself,
    matching SQL semantics."""
    b = F.lit(n_buckets)
    q = F.floor(total.cast("long") / b).cast("long")
    r = (total.cast("long") % b).cast("long")
    pivot = (q + 1) * r
    rk = rank.cast("long")
    return (F.when(q == 0, rk)
            .when(rk <= pivot, F.floor((rk - 1) / (q + 1)) + 1)
            .otherwise(r + F.floor((rk - pivot - 1) / q) + 1)
            .cast("int"))


def with_global_ntile(df: DataFrame, order_cols,
                      n_buckets: int, *,
                      bucket_col: str = "bucket",
                      num_partitions: int | None = None) -> DataFrame:
    """Append an exact equal-count bucket id (1..``n_buckets``) over a
    total order — the distributed replacement for
    ``ntile(B).over(Window.orderBy(...))``."""
    ranked = with_global_rank(df, order_cols,
                              num_partitions=num_partitions,
                              rank_col="__rank_g", total_col="__rank_n")
    return (ranked
            .withColumn(bucket_col,
                        ntile_from_rank(F.col("__rank_g"),
                                        F.col("__rank_n"), n_buckets))
            .drop("__rank_g", "__rank_n"))


def with_global_cumsum(df: DataFrame, order_cols, val_cols, *,
                       cumsum_cols=None,
                       num_partitions: int | None = None) -> DataFrame:
    """Append the running sum of each of ``val_cols`` in
    ``order_cols`` order — the distributed replacement for
    ``sum(v).over(Window.orderBy(...).rowsBetween(unboundedPreceding,
    currentRow))``.  Same shape as :func:`with_global_rank`, but the
    broadcast k-row offset table carries each range partition's
    preceding VALUE totals instead of its preceding row count:
    cumsum = value offset + local running sum (all columns share one
    range exchange and one offset table).  Exact for integer/decimal
    values (the repo's digest convention); for doubles the summation
    order differs from the single-sort form by float associativity,
    so callers should sum scaled integers."""
    if isinstance(val_cols, str):
        val_cols = [val_cols]
    cumsum_cols = cumsum_cols or [f"{c}_cumsum" for c in val_cols]
    keys = _keys(order_cols)
    n_parts = num_partitions or int(
        df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32"))
    # pinned once — same boundary-consistency requirement as
    # with_global_rank (module docstring)
    keyed = (df.repartitionByRange(n_parts, *keys)
             .withColumn(_PID, F.spark_partition_id())
             .localCheckpoint())
    run = (Window.partitionBy(_PID).orderBy(*keys)
           .rowsBetween(Window.unboundedPreceding, 0))
    local = keyed.select(
        "*", *[F.sum(v).over(run).alias(f"__cs_{i}")
               for i, v in enumerate(val_cols)])
    k_rows = Window.orderBy(_PID)
    offsets = (keyed.groupBy(_PID)
               .agg(*[F.sum(v).alias(f"__t_{i}")
                      for i, v in enumerate(val_cols)])
               .select(
                   _PID,
                   *[F.coalesce(
                       F.sum(f"__t_{i}").over(
                           k_rows.rowsBetween(Window.unboundedPreceding,
                                              -1)),
                       F.lit(0)).alias(f"__o_{i}")
                     for i in range(len(val_cols))]))
    out = local.join(F.broadcast(offsets), _PID)
    for i, cc in enumerate(cumsum_cols):
        out = out.withColumn(cc, F.col(f"__o_{i}") + F.col(f"__cs_{i}"))
    return out.drop(_PID, *[f"__cs_{i}" for i in range(len(val_cols))],
                    *[f"__o_{i}" for i in range(len(val_cols))])
