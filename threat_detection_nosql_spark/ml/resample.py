"""Distributed SMOTE-style oversampling (SURVEY.md M10,
`Comparaison_ML.py:568-582`: SMOTE(0.7) + RandomUnderSampler(0.8)).

The reference calls imbalanced-learn on a driver matrix. Here SMOTE's
actual algorithm — synthesize minority rows as convex combinations
x + u·(neighbor − x) of a row and one of its k nearest minority
neighbors — runs as DataFrame ops:

1. minority side extracted and self-joined for exact kNN
   (the minority class is the *small* side by definition; the join is
   broadcast. If minority ever outgrew broadcast, the LSH candidate
   join from operators/similarity.py swaps in — same downstream plan);
2. top-k neighbors per row via a window;
3. each synthetic row picks its neighbor and interpolation factor from
   seeded `rand()` — deterministic, executor-side, no driver loop;
4. undersampling = seeded `sampleBy` on the majority class.

No vector UDF anywhere: distances and interpolation are array
expressions over the raw feature columns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def smote_oversample(df: DataFrame, feature_cols: list[str],
                     label: str = "is_anomaly", minority: int = 1,
                     ratio: float = 0.7, k: int = 5,
                     seed: int = 42) -> DataFrame:
    """Return ``df`` plus synthetic minority rows so that
    |minority| ≈ ratio·|majority| (imblearn ``sampling_strategy``
    semantics). Synthetic rows carry the minority label and NULL in any
    non-feature column except ``label``.
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
    # deterministic _id (dense rank over the feature vector): recomputed
    # identically on every derivation of this plan, unlike
    # monotonically_increasing_id which depends on the physical
    # partitioning. Ties are exact-duplicate vectors — interchangeable
    # as kNN anchors/neighbors, so row_number among them is harmless.
    mino = (df.filter(F.col(label) == minority)
            .select(feats.alias("_x"))
            .withColumn("_id", F.row_number().over(
                Window.orderBy(F.asc("_x")))))

    b = mino.select(F.col("_id").alias("_nid"), F.col("_x").alias("_nx"))
    dist = F.aggregate(F.zip_with("_x", "_nx", lambda a, c: (a - c) * (a - c)),
                       F.lit(0.0), lambda acc, v: acc + v)
    w = Window.partitionBy("_id").orderBy(F.asc("_d"), F.asc("_nid"))
    knn = (mino.join(F.broadcast(b), F.col("_id") != F.col("_nid"))
           .withColumn("_d", dist)
           .withColumn("_rk", F.row_number().over(w))
           .filter(F.col("_rk") <= k)
           .select("_id", "_x", "_nid", "_nx", "_rk"))

    # replicate each minority row ceil(n_new/n_min) times, then keep
    # exactly n_new synthetics via a global row_number cap
    reps = -(-n_new // n_min)
    rep = (knn.select("_id").distinct()
           .select("_id", F.explode(F.sequence(F.lit(1), F.lit(reps)))
                   .alias("_rep")))
    pick = (rep
            .withColumn("_pick", (F.floor(F.rand(seed) * k) + 1).cast("int"))
            .withColumn("_u", F.rand(seed + 1)))
    syn = (pick.join(knn, (pick["_id"] == knn["_id"])
                     & (pick["_pick"] == knn["_rk"]))
           .select(pick["_id"], "_rep", "_u", "_x", "_nx"))
    wcap = Window.orderBy("_id", "_rep")
    syn = (syn.withColumn("_rn", F.row_number().over(wcap))
           .filter(F.col("_rn") <= n_new))
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
