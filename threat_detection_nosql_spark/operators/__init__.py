from threat_detection_nosql_spark.operators.etl import (
    activity_log,
    derive_temporal_features,
    null_audit,
    preprocess_activity_log,
)
from threat_detection_nosql_spark.operators.entropy import add_shannon_entropy
from threat_detection_nosql_spark.operators.graph import (
    edge_view,
    node_view,
    user_degree,
)

__all__ = [
    "activity_log",
    "derive_temporal_features",
    "null_audit",
    "preprocess_activity_log",
    "add_shannon_entropy",
    "edge_view",
    "node_view",
    "user_degree",
]
