"""Named query registry.

Each module exposes ``QUERIES: dict[str, (spark, sf_dir) -> DataFrame]``
and ``ORACLES: dict[str, str]`` (DuckDB ANSI SQL). ``all_queries()`` /
``all_oracles()`` merge them for the driver contract
(``__spark_entry__.py``).

Ordering IS the driver's sampling policy: the correctness gate hashes
the FIRST 50 queries in merge order each round.  Rounds 1-4 proved the
threat/relational/pipeline/advanced/graph/metrics families; rounds
5-11 cleared their pinned 50s (cumulatively, every oracle-backed
query has at least one driver-green record and every rows-only query
at least one executed-clean record).  Round 12 rotates the window
onto the seven round-11 additions the driver has never recorded
(jpeg family, theta pair, repeated_substring_spans, lsh_ann_topk),
then least-recently-verified refills, then every other oracle-backed
query, with the remaining rows-only (engine-RNG / model state)
queries parked at the registry end.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

# Round-12 driver window (r11 verdict ask #1): the 7 round-11
# additions the driver has never seen (jpeg family, theta pair,
# repeated_substring_spans, lsh_ann_topk — builder-verified green but
# absent from the driver ledger), topped up with the 43
# least-recently-verified oracle greens (rotate_window.py ordering).
# NEVER reorder once verified: the driver hashes this exact prefix.
_WINDOW_R12: tuple[str, ...] = (
    "lsh_ann_topk",
    "jpeg_decode_stats",
    "repeated_substring_spans",
    "jpeg_color_decode_stats",
    "jpeg420_decode_stats",
    "theta_user_overlap",
    "stream_theta_overlap",
    "stream_purchase_error_pairs",
    "stream_after_hours_top10",
    "order_priority_counts",
    "promo_revenue_ratio",
    "top_supplier_by_revenue",
    "local_supplier_volume",
    "revenue_change_forecast",
    "nation_volume_shipping",
    "nation_market_share",
    "product_type_profit",
    "returned_items_top20",
    "customer_order_distribution",
    "small_quantity_revenue",
    "large_volume_customers",
    "discounted_revenue",
    "monthly_return_rate",
    "bpe_merges",
    "bpe_top_segments",
    "bpe_subword_freqs",
    "bpe_encode_part_names",
    "bigram_logprob_scores",
    "weighted_doc_sample",
    "countmin_token_estimates",
    "hll_portable_distinct_users",
    "rule_calibration_table",
    "rule_lift_table",
    "stream_countmin_user_cells",
    "stream_drift_psi",
    "time_to_next_purchase",
    "activity_heatmap",
    "late_shipment_priority_counts",
    "waiting_supplier_top10",
    "dormant_customer_balance_groups",
    "feature_drift_psi",
    "pseudonymized_activity",
    "orders_profile",
    "user_features_unpivot",
    "event_zorder",
    "temperature_mixture_plan",
    "temperature_mixture_sample",
    "length_bucket_batches",
    "rare_resource_access_top10",
    "similar_user_pairs_top10",
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
    for name in _WINDOW_R12:  # pinned driver window, positions 1-50
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
