"""Named query registry.

Each module exposes ``QUERIES: dict[str, (spark, sf_dir) -> DataFrame]``
and ``ORACLES: dict[str, str]`` (DuckDB ANSI SQL). ``all_queries()`` /
``all_oracles()`` merge them for the driver contract
(``__spark_entry__.py``).

Ordering IS the driver's sampling policy: the correctness gate hashes
the FIRST 50 queries in merge order each round.  Rounds 1-4 proved the
threat/relational/pipeline/advanced/graph/metrics families (94 of 150
oracle queries driver-green); rounds 5-8 cleared their pinned 50s
(287/287 cumulative).  Round 9 rotates the EXPLICIT name window onto
all 12 never-driver-seen round-8 additions — 9 oracle-backed (the
media / chunking / KMV / PCA / MMR wave and its streaming twins) plus
the 3 rows-only ones the r8 verdict asked to window for executed-clean
records — then 38 least-recently-verified refills, then every other
oracle-backed query, with the remaining rows-only (engine-RNG / model
state) queries parked at the registry end.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

# Round-10 driver window: ALL 22 never-driver-seen round-9 additions
# (the format matrix, PQ/IVF-PQ ANN, HyperBall, truncation audit,
# GIF/PNG decode, media conversions, heavy hitters, SMOTE counts) PLUS
# 6 rows-only queries the r9 verdict asked to window for executed-clean
# records (tsne substitute, ivf/lsh ANN, minhash dedup pair, distinct
# sketch — the rest of ask #7 rotates in at R11) — topped up with the
# 22 least-recently-verified greens (rotate_window.py TAIL discipline).
# Green here closes the driver ledger at ~318/318 oracle-backed ever
# windowed.
# NEVER reorder once verified: the driver hashes this exact prefix.
_WINDOW_R10: tuple[str, ...] = (
    "media_features",
    "media_frame_sample",
    "heavy_hitter_tokens",
    "smote_resampled_counts",
    "media_resize_stats",
    "gif_decode_stats",
    "png_decode_stats",
    "pq_quantization_report",
    "pq_adc_topk",
    "truncated_embedding_recall",
    "ivfpq_adc_topk",
    "hyperball_reach_report",
    "events_jsonl_roundtrip",
    "orders_orc_roundtrip",
    "documents_csv_gauntlet",
    "events_partitioned_prune",
    "schema_evolution_union",
    "compression_codec_report",
    "stream_jsonl_ingest",
    "compacted_scan_digest",
    "schema_drift_report",
    "documents_text_roundtrip",
    "tsne_substitute_projection",
    "ivf_ann_topk",
    "lsh_ann_topk",
    "minhash_dedup",
    "minhash_near_dups",
    "sketch_distinct_users",
    "error_and_purchase_users",
    "user_modal_activity",
    "rolling_week_order_value",
    "customer_scd2_merge",
    "sql_segment_summary",
    "order_value_histogram",
    "top_orders_second_page",
    "part_grouping_sets",
    "customer_snapshot_diff",
    "exact_dedup_groups",
    "unigram_logprob_scores",
    "ngram_jaccard_top_pairs",
    "doc_quality_stats",
    "lang_id_heuristic",
    "cosine_topk",
    "token_counts",
    "minhash_sig_near_dups",
    "simhash_fingerprints",
    "simhash_near_dups",
    "winnowing_fingerprints",
    "fingerprint_overlap",
    "srp_ann_topk",
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
    for name in _WINDOW_R10:  # pinned driver window, positions 1-50
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
