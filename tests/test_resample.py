"""SMOTE-style oversampling + undersampling (M10) semantics."""

from __future__ import annotations

from pyspark.sql import functions as F

from threat_detection_nosql_spark.ml.features import (
    synthetic_anomaly_fixture,
)
from threat_detection_nosql_spark.ml.resample import (
    smote_oversample,
    undersample_majority,
)

FEATS = [f"f{i}" for i in range(8)]


def test_smote_reaches_target_ratio(spark):
    fix = synthetic_anomaly_fixture(spark)  # 180 normal / 20 anomalies
    out = smote_oversample(fix, FEATS, ratio=0.7, seed=42)
    n = {r["is_anomaly"]: r["n"] for r in
         out.groupBy("is_anomaly").agg(F.count("*").alias("n")).collect()}
    assert n[0] == 180                      # majority untouched
    assert n[1] == int(0.7 * 180)           # minority lifted to ratio

def test_smote_synthetics_are_convex_combinations(spark):
    fix = synthetic_anomaly_fixture(spark)
    out = smote_oversample(fix, FEATS, ratio=0.7, seed=42)
    # synthetic rows have NULL user (non-feature column)
    syn = out.filter(F.col("user").isNull())
    assert syn.count() == int(0.7 * 180) - 20
    # convexity: every synthetic feature value lies inside the minority
    # class's min/max envelope (interpolation cannot extrapolate)
    real = fix.filter(F.col("is_anomaly") == 1)
    bounds = real.agg(*[F.min(c).alias(f"mn_{c}") for c in FEATS],
                      *[F.max(c).alias(f"mx_{c}") for c in FEATS]).first()
    checks = syn.agg(*[
        F.sum(((F.col(c) < bounds[f"mn_{c}"] - 1e-9)
               | (F.col(c) > bounds[f"mx_{c}"] + 1e-9)).cast("int"))
        .alias(c) for c in FEATS]).first()
    assert all(checks[c] == 0 for c in FEATS)


def test_smote_deterministic(spark):
    fix = synthetic_anomaly_fixture(spark)
    a = smote_oversample(fix, FEATS, seed=7).count()
    b = smote_oversample(fix, FEATS, seed=7).count()
    assert a == b


def test_smote_bucketed_path_counts_and_convexity(spark):
    """exact_cap=0 forces the grid-bucketed kNN on the fixture: the
    synthetic count must be IDENTICAL to the exact path (replica
    allocation is arithmetic on the anchor id, independent of which
    neighbors the grid finds) and convexity must still hold (grid
    neighbors are minority rows, and the isolated-anchor fallback
    interpolates a row with itself)."""
    fix = synthetic_anomaly_fixture(spark)
    out = smote_oversample(fix, FEATS, ratio=0.7, seed=42, exact_cap=0)
    n = {r["is_anomaly"]: r["n"] for r in
         out.groupBy("is_anomaly").agg(F.count("*").alias("n")).collect()}
    assert n[0] == 180
    assert n[1] == int(0.7 * 180)
    syn = out.filter(F.col("user").isNull())
    real = fix.filter(F.col("is_anomaly") == 1)
    bounds = real.agg(*[F.min(c).alias(f"mn_{c}") for c in FEATS],
                      *[F.max(c).alias(f"mx_{c}") for c in FEATS]).first()
    checks = syn.agg(*[
        F.sum(((F.col(c) < bounds[f"mn_{c}"] - 1e-9)
               | (F.col(c) > bounds[f"mx_{c}"] + 1e-9)).cast("int"))
        .alias(c) for c in FEATS]).first()
    assert all(checks[c] == 0 for c in FEATS)


def test_smote_tiny_minority_count_exact(spark):
    """n_min ≤ k used to silently under-produce (picks pointing past
    the last neighbor matched nothing); the pmod pick keeps the count
    exact: 3 anomalies, k=5 → target floor(0.7·197)=137, 134 new."""
    fix = synthetic_anomaly_fixture(spark, n=200, n_anomalies=3)
    out = smote_oversample(fix, FEATS, ratio=0.7, seed=42)
    n = {r["is_anomaly"]: r["n"] for r in
         out.groupBy("is_anomaly").agg(F.count("*").alias("n")).collect()}
    assert n[1] == int(0.7 * 197)


def test_undersample_majority(spark):
    fix = synthetic_anomaly_fixture(spark)
    out = undersample_majority(fix, ratio=0.8, seed=42)
    n = {r["is_anomaly"]: r["n"] for r in
         out.groupBy("is_anomaly").agg(F.count("*").alias("n")).collect()}
    assert n[1] == 20                       # minority kept whole
    # majority sampled toward n_min/ratio = 25 (Bernoulli, so approx)
    assert n[0] < 60


def test_undersample_hash_mode_portable_and_deterministic(spark):
    """hash_col mode: the kept majority set is a pure function of
    md5(user) — identical across runs, NULL-keyed synthetics kept iff
    minority, and the kept count matches a driver-side replay of the
    same top-40-bit threshold."""
    import hashlib

    from threat_detection_nosql_spark.ml.resample import (
        hash_keep_threshold)

    fix = synthetic_anomaly_fixture(spark)
    a = undersample_majority(fix, ratio=0.8, hash_col="user")
    b = undersample_majority(fix, ratio=0.8, hash_col="user")
    users_a = sorted(r.user for r in a.collect())
    assert users_a == sorted(r.user for r in b.collect())

    t = hash_keep_threshold(20, 180, 0.8)
    want = [u for u in range(180)
            if int(hashlib.md5(str(u).encode()).hexdigest()[:10], 16) < t]
    got_major = sorted(r.user for r in
                       a.filter(F.col("is_anomaly") == 0).collect())
    assert got_major == want
    assert a.filter(F.col("is_anomaly") == 1).count() == 20
