"""Named query registry.

Each module exposes ``QUERIES: dict[str, (spark, sf_dir) -> DataFrame]``
and ``ORACLES: dict[str, str]`` (DuckDB ANSI SQL). ``all_queries()`` /
``all_oracles()`` merge them for the driver contract
(``__spark_entry__.py``).

Ordering IS the driver's sampling policy: the correctness gate hashes
the FIRST 50 queries in merge order each round.  Rounds 1-4 proved the
threat/relational/pipeline/advanced/graph/metrics families (94 of 150
oracle queries driver-green); round 5 cleared its pinned 50 (144/218
cumulative).  Round 6 rotates the EXPLICIT name window onto 50 of the
74 remaining never-driver-green oracle queries (6 corpus carry-overs,
the round-5 behavioral/graph/text waves, and the 5 round-5 stream
oracles) — then every other oracle-backed query, and parks the
rows-only (engine-RNG / model / media) queries at the registry end
so no window slot is ever burned on a ``no_oracle`` row again.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

# Round-6 driver window (scripts/rotate_window.py output): 50 of the 74
# oracle-backed queries with no driver-green row in CORRECTNESS_r01-r05.
# The remaining 24 lead the round-7 rotation.  NEVER reorder mid-round:
# the driver hashes this exact prefix.
_WINDOW_R6: tuple[str, ...] = (
    "orders_profile",
    "user_features_unpivot",
    "event_zorder",
    "temperature_mixture_plan",
    "temperature_mixture_sample",
    "length_bucket_batches",
    "rare_resource_access_top10",
    "similar_user_pairs_top10",
    "user_behavior_quadrants",
    "user_triage_report",
    "resource_acquisition_weekly",
    "resource_affinity_top20",
    "winsorized_order_values",
    "revenue_pareto",
    "repurchase_interval_histogram",
    "open_order_aging",
    "part_supplier_hhi_top20",
    "weighted_median_acctbal",
    "customer_rfm_segments",
    "discount_band_elasticity",
    "embedding_ann_near_dups",
    "dup_span_stats",
    "bm25_top_terms",
    "hashed_feature_counts",
    "doc_novelty_scores",
    "embedding_norm_audit",
    "doc_char_entropy",
    "token_pmi_top20",
    "stopword_density_scores",
    "nb_lang_predictions",
    "source_lang_chi2",
    "vocab_growth_curve",
    "zipf_fit",
    "near_dup_groups",
    "near_dup_keep_best",
    "link_prediction_top20",
    "copurchase_communities",
    "kcore_parts",
    "risk_propagation_top20",
    "bloom_customer_probe",
    "user_js_divergence",
    "activity_value_quartiles",
    "activity_hour_mutual_info",
    "logreg_gd_report",
    "kmeans_silhouette",
    "stream_unmatched_purchases",
    "stream_bloom_user_words",
    "stream_topk_users",
    "stream_markov_transitions",
    "stream_hll_user_registers",
)


def _modules():
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
    return (threat, relational, pipeline, corpus, advanced, graph_queries,
            metrics, ml_queries, streaming_queries, temporal, tpch,
            cleaning, tokenizer)


def _merged(attr: str, tail_attr: str) -> dict:
    mods = _modules()
    out: dict = {}
    for mod in mods:
        out.update(getattr(mod, attr))
    # *_TAIL: entries added mid-round land AFTER every module so the
    # driver's window stays byte-stable within a round; the next rotation
    # moves them forward
    for mod in mods:
        out.update(getattr(mod, tail_attr, {}))
    return out


def all_queries() -> dict[str, QueryFn]:
    queries = _merged("QUERIES", "QUERIES_TAIL")
    oracles = _merged("ORACLES", "ORACLES_TAIL")
    out: dict[str, QueryFn] = {}
    for name in _WINDOW_R6:  # pinned driver window, positions 1-50
        out[name] = queries[name]
    for name, fn in queries.items():  # oracle-backed middle, module order
        if name not in out and name in oracles:
            out[name] = fn
    for name, fn in queries.items():  # rows-only park, after position 150
        if name not in out:
            out[name] = fn
    return out


def all_oracles() -> dict[str, str]:
    return _merged("ORACLES", "ORACLES_TAIL")
