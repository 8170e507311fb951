"""Named query registry.

Each module exposes ``QUERIES: dict[str, (spark, sf_dir) -> DataFrame]``
and ``ORACLES: dict[str, str]`` (DuckDB ANSI SQL). ``all_queries()`` /
``all_oracles()`` merge them for the driver contract
(``__spark_entry__.py``).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


def all_queries() -> dict[str, QueryFn]:
    from threat_detection_nosql_spark.queries import (
        advanced,
        cleaning,
        corpus,
        graph_queries,
        metrics,
        ml_queries,
        pipeline,
        relational,
        streaming_queries,
        temporal,
        threat,
        tpch,
    )
    out: dict[str, QueryFn] = {}
    for mod in (threat, relational, pipeline, corpus, advanced,
                graph_queries, metrics, ml_queries, streaming_queries,
                temporal, tpch, cleaning):
        out.update(mod.QUERIES)
    return out


def all_oracles() -> dict[str, str]:
    from threat_detection_nosql_spark.queries import (
        advanced,
        cleaning,
        corpus,
        graph_queries,
        metrics,
        ml_queries,
        pipeline,
        relational,
        streaming_queries,
        temporal,
        threat,
        tpch,
    )
    out: dict[str, str] = {}
    for mod in (threat, relational, pipeline, corpus, advanced,
                graph_queries, metrics, ml_queries, streaming_queries,
                temporal, tpch, cleaning):
        out.update(mod.ORACLES)
    return out
