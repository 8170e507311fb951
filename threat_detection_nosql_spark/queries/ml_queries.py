"""ML queries (rows-only: RNG/algorithm-specific values — the
correctness gate is detection quality on the planted-anomaly fixture,
per BASELINE.md; see tests/test_ml.py).

Detector outputs are memoized per (session, sf_dir) and persisted:
the registry runs the five individual detector queries and then the
ensemble, which would otherwise re-fit all five — with the memo the
ensemble is a 5-way join of cached 150-row frames. Outputs are tiny
(one row per user), so the cache cost is negligible.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from threat_detection_nosql_spark.ml import unsupervised as U
from threat_detection_nosql_spark.ml.features import (
    assemble_features,
    scale_features,
    scaled_user_features,
    synthetic_anomaly_fixture,
)
from threat_detection_nosql_spark.ml.supervised import supervised_report

_DETECTORS = {
    "kmeans": lambda scaled: U.kmeans_detector(scaled),
    "iforest": lambda scaled: U.iforest_detector(scaled),
    "pca": lambda scaled: U.pca_reconstruction_detector(scaled),
    "maha": lambda scaled: U.mahalanobis_detector(scaled),
    "dbscan": lambda scaled: U.dbscan_noise_detector(scaled),
}

_memo: dict[tuple, DataFrame] = {}


def _detector(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    key = (id(spark), sf_dir, name)
    if key not in _memo:
        scaled = scaled_user_features(spark, sf_dir)
        _memo[key] = _DETECTORS[name](scaled).cache()
    return _memo[key]


def kmeans_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _detector(spark, sf_dir, "kmeans")


def iforest_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _detector(spark, sf_dir, "iforest")


def pca_reconstruction_anomalies(spark: SparkSession,
                                 sf_dir: str) -> DataFrame:
    return _detector(spark, sf_dir, "pca")


def mahalanobis_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _detector(spark, sf_dir, "maha")


def dbscan_noise_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _detector(spark, sf_dir, "dbscan")


def ensemble_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    parts = {name: _detector(spark, sf_dir, name) for name in _DETECTORS}
    return U.ensemble_detector(scaled_user_features(spark, sf_dir),
                               parts=parts)


def smote_resampled_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M10 as a queryable op: SMOTE(0.7) + undersample(0.8) on the
    planted-anomaly fixture (`Comparaison_ML.py:568-582` pipeline),
    returning per-class counts before/after. Deterministic given the
    fixed seeds; rows-only (interpolated values are RNG-stream
    specific)."""
    from pyspark.sql import functions as F

    from threat_detection_nosql_spark.ml.resample import (
        smote_oversample,
        undersample_majority,
    )
    fix = synthetic_anomaly_fixture(spark)
    res = undersample_majority(
        smote_oversample(fix, [f"f{i}" for i in range(8)], ratio=0.7),
        ratio=0.8)
    before = fix.groupBy("is_anomaly").agg(F.count("*").alias("n_before"))
    after = res.groupBy("is_anomaly").agg(F.count("*").alias("n_after"))
    return before.join(after, "is_anomaly")


def supervised_model_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trains on the reference's planted-anomaly fixture (M16) — the
    `rapport_performances.csv` analog, independent of sf_dir."""
    fix = synthetic_anomaly_fixture(spark)
    scaled = scale_features(assemble_features(
        fix, cols=[f"f{i}" for i in range(8)]))
    return supervised_report(scaled)


QUERIES = {
    "kmeans_anomalies": kmeans_anomalies,
    "iforest_anomalies": iforest_anomalies,
    "pca_reconstruction_anomalies": pca_reconstruction_anomalies,
    "mahalanobis_anomalies": mahalanobis_anomalies,
    "dbscan_noise_anomalies": dbscan_noise_anomalies,
    "ensemble_anomalies": ensemble_anomalies,
    "smote_resampled_counts": smote_resampled_counts,
    "supervised_model_report": supervised_model_report,
}

ORACLES: dict[str, str] = {}  # rows-only by construction
