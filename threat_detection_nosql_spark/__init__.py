"""threat_detection_nosql_spark — a PySpark-native analytics engine.

Re-implements the query and data-processing capabilities of the reference
insider-threat-detection pipeline (houda-aitmouch/Threat-Detection-NoSQL)
Spark-first: the property graph collapses to a single fact table
(SURVEY.md §1.2), every Cypher query becomes one Catalyst-optimized
DataFrame plan, and the client-side Python post-processing (entropy,
votes, thresholds) becomes built-in SQL expressions.

Layout:
    session     — tuned SparkSession builder
    schemas     — explicit StructTypes for every table
    sources     — parquet/csv/json readers + writers
    operators   — ETL, entropy, graph-view operators
    queries     — named analytic queries (threat + relational + pipeline)
    ml          — feature matrix, unsupervised & supervised detectors
    streaming   — Structured Streaming variants of the per-user profiles
"""

from threat_detection_nosql_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
