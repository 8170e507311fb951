"""ML queries (rows-only: RNG/algorithm-specific values — the
correctness gate is detection quality on the planted-anomaly fixture,
per BASELINE.md; see tests/test_ml.py)."""

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


def kmeans_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    return U.kmeans_detector(scaled_user_features(spark, sf_dir))


def iforest_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    return U.iforest_detector(scaled_user_features(spark, sf_dir),
                              n_trees=100)


def pca_reconstruction_anomalies(spark: SparkSession,
                                 sf_dir: str) -> DataFrame:
    return U.pca_reconstruction_detector(scaled_user_features(spark, sf_dir))


def mahalanobis_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    return U.mahalanobis_detector(scaled_user_features(spark, sf_dir))


def dbscan_noise_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    return U.dbscan_noise_detector(scaled_user_features(spark, sf_dir))


def ensemble_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    return U.ensemble_detector(scaled_user_features(spark, sf_dir))


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
