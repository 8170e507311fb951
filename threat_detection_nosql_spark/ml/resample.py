"""Distributed SMOTE-style oversampling (SURVEY.md M10,
`Comparaison_ML.py:568-582`: SMOTE(0.7) + RandomUnderSampler(0.8)).

The reference calls imbalanced-learn on a driver matrix. Here SMOTE's
actual algorithm — synthesize minority rows as convex combinations
x + u·(neighbor − x) of a row and one of its k nearest minority
neighbors — runs as DataFrame ops:

1. minority side extracted and kNN'd against itself. Below
   ``exact_cap`` rows that is the exact broadcast self-join; above it
   the candidate space is GRID-BUCKETED (the tsne-substitute pattern):
   rows land in 2-D cells of two fixed hash-derived projections, each
   anchor meets only its 3×3 neighborhood, and each cell contributes
   at most ``_CELL_CAP`` candidates — O(n·k) pairs, never O(n²);
2. top-k neighbors per row via a window PARTITIONED by anchor id;
3. each synthetic row picks its neighbor and interpolation factor from
   seeded `rand()` — deterministic, executor-side, no driver loop; the
   per-anchor replica count is pure arithmetic on the contiguous
   anchor id (no global row_number cap — the old single-partition
   window over the synthetic frame is gone);
4. undersampling = seeded `sampleBy` on the majority class.

No vector UDF anywhere: distances and interpolation are array
expressions over the raw feature columns.
"""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

_SMOTE_EXACT_CAP = 8192  # minority rows; above → grid-bucketed kNN
_CELL_TARGET = 64        # aimed rows per grid cell (bucketed path)
_CELL_CAP = 256          # max candidates a cell contributes (skew guard)


def _proj(tag: str, dims: int) -> list[float]:
    """Fixed pseudo-random projection weights in [-1, 1), derived from
    md5 — portable, seed-free, identical across sessions (the KMV /
    portable-plane derivation pattern)."""
    return [int(hashlib.md5(f"smote:{tag}:{d}".encode())
                .hexdigest()[:8], 16) / 2.0 ** 31 - 1.0
            for d in range(dims)]


def _grid_candidates(mino: DataFrame, dims: int) -> DataFrame:
    """Bounded kNN candidate pairs: bucket rows into a 2-D grid over
    two fixed projections sized for ~``_CELL_TARGET`` rows/cell, join
    each anchor to its 3×3 cell neighborhood, cap each cell's
    contribution at ``_CELL_CAP`` (degenerate all-one-cell data stays
    bounded). Returns (_id, _x, _nid, _nx) candidate rows."""
    w1, w2 = _proj("p1", dims), _proj("p2", dims)

    def dot(ws):
        out = F.lit(0.0)
        for i, w in enumerate(ws):
            out = out + F.element_at("_x", i + 1) * F.lit(w)
        return out

    pts = mino.withColumn("_p1", dot(w1)).withColumn("_p2", dot(w2))
    # robust grid range: 1%/99% quantiles, not min/max — a handful of
    # outliers would otherwise stretch the grid until the bulk of the
    # data lands in a few cells and every one of them hits _CELL_CAP.
    # Outliers beyond the quantile range clamp into the edge cells
    # (still capped). approx_percentile is a single map-combinable agg.
    st = pts.agg(
        F.percentile_approx("_p1", [0.01, 0.99], 10000).alias("q1"),
        F.percentile_approx("_p2", [0.01, 0.99], 10000).alias("q2"),
        F.count("*").alias("n")).first()  # 1-row scalar fetch
    (a1, b1), (a2, b2) = st["q1"], st["q2"]
    g = max(1, math.ceil(math.sqrt(st["n"] / _CELL_TARGET)))
    cw1 = ((b1 - a1) / g) or 1.0
    cw2 = ((b2 - a2) / g) or 1.0

    def cell(p, lo, cw):
        raw = F.floor((F.col(p) - F.lit(lo)) / F.lit(cw)).cast("int")
        return F.least(F.lit(g - 1), F.greatest(F.lit(0), raw))

    cells = (pts.withColumn("_cx", cell("_p1", a1, cw1))
             .withColumn("_cy", cell("_p2", a2, cw2))
             .drop("_p1", "_p2"))
    wcell = Window.partitionBy("_cx", "_cy").orderBy("_id")
    nb = (cells.withColumn("_cn", F.row_number().over(wcell))
          .filter(F.col("_cn") <= _CELL_CAP)
          .select(F.col("_id").alias("_nid"), F.col("_x").alias("_nx"),
                  F.col("_cx").alias("_ncx"), F.col("_cy").alias("_ncy")))
    offs = F.explode(F.array(*[
        F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
        for dx in (-1, 0, 1) for dy in (-1, 0, 1)])).alias("_o")
    anchors = (cells.select("_id", "_x", "_cx", "_cy", offs)
               .select("_id", "_x",
                       (F.col("_cx") + F.col("_o.dx")).alias("_acx"),
                       (F.col("_cy") + F.col("_o.dy")).alias("_acy")))
    return (anchors.join(nb, (F.col("_acx") == F.col("_ncx"))
                         & (F.col("_acy") == F.col("_ncy"))
                         & (F.col("_id") != F.col("_nid")))
            .select("_id", "_x", "_nid", "_nx"))


def smote_oversample(df: DataFrame, feature_cols: list[str],
                     label: str = "is_anomaly", minority: int = 1,
                     ratio: float = 0.7, k: int = 5,
                     seed: int = 42,
                     exact_cap: int = _SMOTE_EXACT_CAP) -> DataFrame:
    """Return ``df`` plus synthetic minority rows so that
    |minority| ≈ ratio·|majority| (imblearn ``sampling_strategy``
    semantics). Synthetic rows carry the minority label and NULL in any
    non-feature column except ``label``. The synthetic row COUNT is
    exact arithmetic (max(0, floor(ratio·n_maj) − n_min)) on both
    paths; above ``exact_cap`` minority rows the neighbors are
    grid-bucketed approximate kNN (an anchor isolated in its 3×3
    neighborhood degenerates to self-duplication, imblearn-style).
    """
    n_by_class = {r[label]: r["n"] for r in
                  df.groupBy(label).agg(F.count("*").alias("n")).collect()}
    n_min = n_by_class.get(minority, 0)
    majorities = [n for c, n in n_by_class.items() if c != minority]
    if not majorities:  # input holds only the minority class
        return df
    n_maj = max(majorities)
    target = int(ratio * n_maj)
    n_new = max(0, target - n_min)
    if n_new == 0 or n_min < 2:
        return df

    feats = F.array(*[F.col(c).cast("double") for c in feature_cols])
    base = df.filter(F.col(label) == minority).select(feats.alias("_x"))
    # deterministic contiguous _id (row_number over the feature
    # vector): recomputed identically on every derivation of this
    # plan, unlike monotonically_increasing_id which depends on the
    # physical partitioning. Ties are exact-duplicate vectors —
    # interchangeable as kNN anchors/neighbors, so row_number among
    # them is harmless. Small side: plain window (one task over
    # ≤ exact_cap rows); big side: the distributed exact ranker.
    if n_min <= exact_cap:
        mino = base.withColumn("_id", F.row_number().over(
            Window.orderBy(F.asc("_x"))))
        b = mino.select(F.col("_id").alias("_nid"),
                        F.col("_x").alias("_nx"))
        cand = mino.join(F.broadcast(b), F.col("_id") != F.col("_nid"))
    else:
        from threat_detection_nosql_spark.operators.ranking import (
            with_global_rank)
        mino = with_global_rank(base, ["_x"], rank_col="_id")
        cand = _grid_candidates(mino, len(feature_cols))

    dist = F.aggregate(F.zip_with("_x", "_nx", lambda a, c: (a - c) * (a - c)),
                       F.lit(0.0), lambda acc, v: acc + v)
    w = Window.partitionBy("_id").orderBy(F.asc("_d"), F.asc("_nid"))
    knn = (cand
           .withColumn("_d", dist)
           .withColumn("_rk", F.row_number().over(w))
           .filter(F.col("_rk") <= k)
           .select("_id", "_x", "_nx", "_rk"))
    # grid path can leave an anchor with zero candidates (alone in its
    # 3×3 neighborhood): degrade to self-interpolation (a duplicate —
    # u·(x−x)=0) so every anchor id 1..n_min exists and the replica
    # arithmetic below stays exact. Never fires on the exact path.
    lonely = (mino.join(knn.select("_id"), "_id", "left_anti")
              .select("_id", "_x", F.col("_x").alias("_nx"),
                      F.lit(1).alias("_rk")))
    knn = (knn.unionByName(lonely)
           .withColumn("_m", F.max("_rk").over(Window.partitionBy("_id"))))

    # exact replica allocation on the contiguous anchor id: n_new =
    # base·n_min + extra, anchors 1..extra take one more — arithmetic,
    # not a global row_number cap over the synthetic frame
    base_r, extra = divmod(n_new, n_min)
    cnt = (F.lit(base_r)
           + F.when(F.col("_id") <= extra, F.lit(1)).otherwise(F.lit(0)))
    rep = (mino.select("_id").withColumn("_cnt", cnt)
           .filter(F.col("_cnt") >= 1)
           .select("_id", F.explode(F.sequence(F.lit(1), F.col("_cnt")))
                   .alias("_rep")))
    pick = (rep
            .withColumn("_pick", F.floor(F.rand(seed) * k).cast("int"))
            .withColumn("_u", F.rand(seed + 1)))
    # each (anchor, rep) matches exactly one knn row: rk ids are
    # contiguous 1.._m per anchor and pmod lands the pick in range
    # even when the anchor has fewer than k neighbors
    syn = (pick.join(knn, (pick["_id"] == knn["_id"])
                     & (F.pmod(pick["_pick"], knn["_m"]) + 1 == knn["_rk"]))
           .select(pick["_id"], "_rep", "_u", "_x", "_nx"))
    interp = F.zip_with("_x", "_nx", lambda a, c: a + F.col("_u") * (c - a))
    syn_rows = syn.select(interp.alias("_s"))
    out_cols = []
    fmap = {c: i for i, c in enumerate(feature_cols)}
    for c in df.columns:
        if c in fmap:
            out_cols.append(F.element_at("_s", fmap[c] + 1)
                            .cast(dict(df.dtypes)[c]).alias(c))
        elif c == label:
            out_cols.append(F.lit(minority).cast(dict(df.dtypes)[c])
                            .alias(c))
        else:
            out_cols.append(F.lit(None).cast(dict(df.dtypes)[c]).alias(c))
    return df.unionByName(syn_rows.select(*out_cols))


_HASH_BITS = 40  # top-40 md5 bits: frac·2^40 thresholds fit a long


def hash_keep_threshold(n_min: int, n: int, ratio: float) -> int:
    """Keep threshold for the portable hash sampler: a majority row
    survives iff its top-40 md5 bits are below
    floor(min(1, n_min/(ratio·n)) · 2^40). Shared by the operator and
    the DuckDB oracle builder (queries/ml_queries.py) so both sides
    run the SAME float-then-floor arithmetic."""
    frac = min(1.0, n_min / (ratio * n)) if n else 1.0
    return int(frac * (1 << _HASH_BITS))


def undersample_majority(df: DataFrame, label: str = "is_anomaly",
                         minority: int = 1, ratio: float = 0.8,
                         seed: int = 42,
                         hash_col: str | None = None) -> DataFrame:
    """RandomUnderSampler analog: keep the minority class whole, sample
    the majority down so |minority| ≈ ratio·|majority|.

    Default: seeded `sampleBy` — executor-side Bernoulli, no driver
    materialization, the closest analog to the reference's RNG.

    ``hash_col``: PORTABLE deterministic sampling instead — keep a
    majority row iff the top-40 bits of md5(hash_col) fall below the
    class's keep fraction (``hash_keep_threshold``). Same Bernoulli
    marginals, but the decision is a pure function of the row key, so
    any SQL engine replays the exact kept set (the KMV/minhash
    md5-derivation pattern). Rows with NULL ``hash_col`` (e.g. SMOTE
    synthetics, which carry NULL non-feature columns) are kept iff
    they are minority-labeled."""
    n_by_class = {r[label]: r["n"] for r in
                  df.groupBy(label).agg(F.count("*").alias("n")).collect()}
    n_min = n_by_class.get(minority, 0)
    if hash_col is not None:
        h40 = F.conv(F.substring(
            F.md5(F.col(hash_col).cast("string")), 1, 10), 16, 10
        ).cast("long")
        cond = F.col(label) == minority
        for c, n in n_by_class.items():
            if c == minority:
                continue
            # NULL-labeled rows (possible in dirty/outer-join inputs)
            # form their own class in n_by_class and must be sampled
            # like the sampleBy path samples them, not silently
            # dropped by a `label = NULL` predicate
            is_c = (F.col(label).isNull() if c is None
                    else F.col(label) == c)
            t = hash_keep_threshold(n_min, n, ratio)
            cond = cond | (is_c & (h40 < F.lit(t)))
        return df.filter(cond)
    fracs = {}
    for c, n in n_by_class.items():
        if c == minority:
            fracs[c] = 1.0
        else:
            fracs[c] = min(1.0, n_min / (ratio * n)) if n else 1.0
    return df.sampleBy(label, fracs, seed)
