from threat_detection_nosql_spark.ml.features import (
    FEATURE_COLS,
    assemble_features,
    scaled_user_features,
    synthetic_anomaly_fixture,
)

__all__ = [
    "FEATURE_COLS",
    "assemble_features",
    "scaled_user_features",
    "synthetic_anomaly_fixture",
]
