"""Named query registry.

Each module exposes ``QUERIES: dict[str, (spark, sf_dir) -> DataFrame]``
and ``ORACLES: dict[str, str]`` (DuckDB ANSI SQL). ``all_queries()`` /
``all_oracles()`` merge them for the driver contract
(``__spark_entry__.py``).

Ordering IS the driver's sampling policy: the correctness gate hashes
the FIRST 50 queries in merge order each round.  Rounds 1-4 proved the
threat/relational/pipeline/advanced/graph/metrics families (94 of 150
oracle queries driver-green); rounds 5-6 cleared their pinned 50s
(194/218 cumulative).  Round 7 rotates the EXPLICIT name window onto
the 24 pre-round-7 never-driver-green oracle queries (the behavioral
gap-fill/EWMA/CUSUM/Markov wave, the four partsupp TPC-H shapes,
product_type_profit_full, source_quantile_normalized) plus 26 of
round 7's own additions — then every other oracle-backed query,
and parks the rows-only (engine-RNG / model / media) queries at the
registry end so no window slot is ever burned on a ``no_oracle`` row.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

# Round-7 driver window: the 24 oracle-backed queries with no
# driver-green row in CORRECTNESS_r01-r06 (the pre-round-7 backlog),
# then 26 of this round's own additions in registry order — every slot
# is a never-driver-green query, so green here maximizes ledger
# coverage (218 -> 244 of 266).  The 22 remaining round-7 additions
# (isotonic_calibration .. tokenizer_fertility) rotate in next round.
# NEVER reorder once verified: the driver hashes this exact prefix.
_WINDOW_R7: tuple[str, ...] = (
    "user_daily_gap_filled",
    "user_daily_ewma",
    "seasonal_zscore_anomalies",
    "user_activity_trend",
    "activity_transition_matrix",
    "sequence_surprise_top10",
    "longest_after_hours_streak",
    "arrival_burstiness_top10",
    "activity_trigram_top10",
    "conversion_latency_quartiles",
    "dau_wau_stickiness",
    "worst_error_windows_top10",
    "new_vs_returning_users",
    "session_activity_lift",
    "user_cusum_alerts",
    "user_daily_autocorr",
    "daily_mix_drift",
    "error_recovery_stats",
    "min_cost_regional_supplier",
    "important_stock_parts",
    "supplier_count_by_part_attrs",
    "excess_stock_suppliers",
    "product_type_profit_full",
    "source_quantile_normalized",
    "doc_perplexity_filter",
    "dsir_importance_weights",
    "hard_negative_mining",
    "nation_revenue_gini",
    "brand_assoc_rules_top20",
    "cohort_ltv_curve",
    "cdc_last_writer_state",
    "inverted_postings",
    "phrase_search_hits",
    "embedding_sq8_audit",
    "rrf_hybrid_search",
    "containment_near_dups",
    "readability_report",
    "template_prefix_dups",
    "vocab_richness_report",
    "group_kfold_assignment",
    "neyman_allocation_plan",
    "neyman_quota_sample",
    "ann_recall_report",
    "split_leakage_repair",
    "incremental_corpus_dedup",
    "minhash_calibration_report",
    "local_clustering_coefficient",
    "key_skew_audit",
    "hll_set_expressions",
    "rule_pr_auc",
)


def _modules():
    from threat_detection_nosql_spark.queries import (
        advanced,
        cleaning,
        corpus,
        curation,
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
            cleaning, tokenizer, curation)


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
    for name in _WINDOW_R7:  # pinned driver window, positions 1-50
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
