"""Named query registry.

Each module exposes ``QUERIES: dict[str, (spark, sf_dir) -> DataFrame]``
and ``ORACLES: dict[str, str]`` (DuckDB ANSI SQL). ``all_queries()`` /
``all_oracles()`` merge them for the driver contract
(``__spark_entry__.py``).

Ordering IS the driver's sampling policy: the correctness gate hashes
the FIRST 50 queries in merge order each round.  Rounds 1-4 proved the
threat/relational/pipeline/advanced/graph/metrics families; rounds
5-12 cleared their pinned 50s (cumulatively, every oracle-backed
query has at least one driver-green record and every rows-only query
at least one executed-clean record).  Round 13 rotates the window
onto the queries round 12 REWROTE (user_features, PQ/kmeans family,
iterative graph family, media decode, near_dup_keep_best,
stream_incremental_dedup) so the driver oracle-verifies the rewritten
internals, then never-driver-green oracle queries, then
least-recently-verified refills, with the remaining rows-only
(engine-RNG / model state) queries parked at the registry end.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

# Round-13 driver window (r12 verdict ask #1): every query whose
# internals round 12 rewrote sits FIRST so the driver oracle-verifies
# the rewrites (user_features Expand entropies, fused-group Lloyd /
# shared SRP+quantizer PQ family, pinned iterative graph family,
# media-decode spread, near_dup_keep_best pin, stream dedup spread),
# then the never-driver-green oracle queries, then the
# least-recently-verified refills (rotate_window.py ordering).
# NEVER reorder once verified: the driver hashes this exact prefix.
_WINDOW_R13: tuple[str, ...] = (
    "user_features",
    "pq_adc_topk",
    "pq_quantization_report",
    "kmeans_silhouette",
    "kmeans_fixed_anomalies",
    "ivfpq_adc_topk",
    "ivf_fixed_ann_topk",
    "ann_recall_report",
    "pagerank_top20",
    "hyperball_reach_report",
    "kcore_parts",
    "copurchase_communities",
    "risk_propagation_top20",
    "near_dup_keep_best",
    "avi_mjpeg_decode_stats",
    "jpeg_progressive_decode_stats",
    "jpeg_progressive_420_decode_stats",
    "jpeg_progressive_color_decode_stats",
    "stream_incremental_dedup",
    "link_prediction_top20",
    "jpeg_restart_decode_stats",
    "tiff_decode_stats",
    "jpeg_color_sampled_digest",
    "jpeg420_sampled_digest",
    "png_decode_stats",
    "gif_decode_stats",
    "autoencoder_fixed_anomalies",
    "ocsvm_fixed_anomalies",
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
)


def _modules():
    from threat_detection_nosql_spark.queries import (
        advanced,
        cleaning,
        corpus,
        curation,
        formats,
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
            cleaning, tokenizer, curation, formats)


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
    for name in _WINDOW_R13:  # pinned driver window, positions 1-50
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
