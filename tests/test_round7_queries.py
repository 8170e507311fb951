"""Round-7 retrieval/audit wave: positional inverted index, phrase
search, SQ8 quantization audit, key-skew audit, leakage-aware split
repair — oracle parity (where not already parametrized) plus the
semantic invariants an oracle hash can't express."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_DIR, compare_query_to_oracle
from threat_detection_nosql_spark.queries.advanced import (
    ORACLES_TAIL as ADV_ORACLES,
    QUERIES_TAIL as ADV_QUERIES,
)
from threat_detection_nosql_spark.queries.metrics import key_skew_audit
from threat_detection_nosql_spark.queries.pipeline import (
    _POSTINGS_CAP,
    _POSTINGS_TOPN,
    embedding_sq8_audit,
    inverted_postings,
    phrase_search_hits,
)


def test_split_leakage_repair_matches_oracle(spark, ddb):
    # advanced.py TAIL entries are not in the parametrized oracle sweep
    compare_query_to_oracle(spark, ddb,
                            ADV_QUERIES["split_leakage_repair"],
                            ADV_ORACLES["split_leakage_repair"])


def test_split_leakage_repair_invariants(spark):
    rows = ADV_QUERIES["split_leakage_repair"](spark, SF_DIR).collect()
    assert rows, "sf0.01 has near-dup components"
    by_comp: dict = {}
    for r in rows:
        by_comp.setdefault(r.component, []).append(r)
    for comp, members in by_comp.items():
        assert len(members) >= 2  # singletons are excluded
        canon = [m for m in members if m.doc_id == comp]
        assert len(canon) == 1, "canonical member present exactly once"
        # the canonical never moves; everyone adopts ITS split
        assert canon[0].moved == 0
        assert canon[0].orig_split == canon[0].new_split
        for m in members:
            assert m.new_split == canon[0].orig_split
            assert m.moved == (1 if m.orig_split != m.new_split else 0)


def test_inverted_postings_shape(spark):
    rows = inverted_postings(spark, SF_DIR).collect()
    assert 0 < len(rows) <= _POSTINGS_TOPN
    n_docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").count()
    dfs = [r.df for r in rows]
    assert dfs == sorted(dfs, reverse=True)  # df-descending index order
    for r in rows:
        assert 1 <= r.df <= n_docs
        assert r.cf >= r.df  # collection freq dominates doc freq
        head = r.posting_head.split(",")
        assert 1 <= len(head) <= _POSTINGS_CAP
        assert head == sorted(head, key=int)  # doc_id-ordered segment


def test_phrase_search_hits_are_real_occurrences(spark):
    rows = phrase_search_hits(spark, SF_DIR).collect()
    assert rows
    w1, w2 = rows[0].w1, rows[0].w2
    phrase = f"{w1} {w2}"
    docs = {r.doc_id: r.text for r in
            spark.read.parquet(f"{SF_DIR}/documents.parquet")
            .filter(F.col("doc_id").isin([r.doc_id for r in rows]))
            .collect()}
    for r in rows:
        assert (r.w1, r.w2) == (w1, w2)  # one phrase per report
        assert r.hits >= 1
        assert phrase in docs[r.doc_id]


def test_embedding_sq8_error_bounded_by_half_step(spark):
    rows = embedding_sq8_audit(spark, SF_DIR).collect()
    assert len(rows) == 64  # one row per dimension
    assert [r.dim for r in rows] == list(range(64))
    for r in rows:
        assert 1 <= r.codes_used <= 256
        step = (r.dmax_q - r.dmin_q) / 255.0
        # rounding to the nearest code can never err more than step/2
        # (dmin/dmax rounded to 6dp for display -> small slack)
        assert r.max_abs_err <= step / 2 + 1e-6


def test_key_skew_audit_sanity(spark):
    r = key_skew_audit(spark, SF_DIR).collect()[0]
    n_events = spark.read.parquet(f"{SF_DIR}/events.parquet").count()
    assert r.n_rows == n_events
    assert r.max_key_rows >= r.p99_key_rows >= r.p50_key_rows >= 1
    assert r.top_key_rows == r.max_key_rows
    assert r.skew_ratio >= 1.0  # max >= mean, always
    assert r.partition_skew >= 1.0
    assert r.max_partition_rows >= r.max_key_rows  # a key can't split


def test_stream_token_df_merges_across_batches(spark, tmp_path):
    """The df-as-sum trick must hold under ANY batching: drive the
    same corpus as TWO micro-batches (maxFilesPerTrigger=1) and
    assert the drained state equals the one-shot batch aggregate."""
    from threat_detection_nosql_spark.streaming.stream_queries import (
        run_stream_to_table,
        token_df_agg,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    src = str(tmp_path / "docs_feed")
    docs.repartition(2).write.parquet(src)
    stream = (spark.readStream.schema(docs.schema)
              .option("maxFilesPerTrigger", "1").parquet(src))
    drained = {r.token: (r.df, r.cf) for r in
               run_stream_to_table(token_df_agg(stream),
                                   mode="complete").collect()}
    batch = {r.token: (r.df, r.cf) for r in
             token_df_agg(docs).collect()}
    assert drained == batch


def test_rule_pr_auc_matches_python_rederivation(spark):
    """AP re-derived row-by-row in pure Python (sklearn's step-wise
    definition over descending distinct scores) must match the
    distributed closed form to the rounding digit."""
    from threat_detection_nosql_spark.queries.metrics import (
        _labeled,
        rule_pr_auc,
    )

    rows = (_labeled(spark, SF_DIR)
            .select(F.col("weekend_ratio").alias("score"), "label")
            .collect())
    per = {}
    for r in rows:
        n, p = per.get(r.score, (0, 0))
        per[r.score] = (n + 1, p + (1 if r.label == 1 else 0))
    tp = pred = 0
    npos = sum(p for _, p in per.values())
    ap = 0.0
    for s in sorted(per, reverse=True):
        n, p = per[s]
        tp += p
        pred += n
        ap += (p / npos) * (tp / pred)
    out = rule_pr_auc(spark, SF_DIR).collect()[0]
    assert out.npos == npos
    assert out.npos + out.nneg == len(rows)
    assert abs(out.average_precision - ap) < 2e-6
    assert 0.0 <= out.average_precision <= 1.0


def test_stream_markov_ordered_resequences_across_batches(spark, tmp_path):
    """The event-time-timer claim: batch 2 delivers events that belong
    BETWEEN batch 1's buffered events (bounded disorder, inside the
    1-hour watermark delay) plus a far-future sentinel that advances
    the final watermark. The drained counts must equal the batch
    lag() pairing of the fully time-sorted union below the final
    watermark — i.e. cross-batch arrival order is invisible. The
    sentinel itself sits above max(ts) − 1h and must never emit."""
    import os
    import time

    from threat_detection_nosql_spark.streaming.stream_queries import (
        markov_ordered_agg,
        run_stream_to_table,
    )

    base = 1_700_000_000  # seconds; any fixed epoch anchor
    acts = ["a", "b", "c"]

    def ev(eid, minute):
        return (eid, base + minute * 60, 7, acts[eid % 3])

    # file 1: minutes 0..100 (evens); file 2: interleaving odd minutes
    # 41..95 (later than batch-1's watermark 100-60=40 -> not late)
    # plus the sentinel at minute 200.
    f1 = [ev(i, m) for i, m in enumerate(range(0, 101, 2))]
    f2 = [ev(100 + i, m) for i, m in enumerate(range(41, 96, 2))]
    sentinel = (999, base + 200 * 60, 7, "a")
    f2.append(sentinel)
    src = tmp_path / "feed"
    os.makedirs(src)
    schema = "event_id long, sec long, user long, activity string"
    for name, rows in [("f1.parquet", f1), ("f2.parquet", f2)]:
        (spark.createDataFrame(rows, schema)
         .coalesce(1).write.parquet(str(src / name)))
        time.sleep(1.1)  # file-source processes in mtime order

    stream = (spark.readStream
              .schema("event_id long, sec long, user long, "
                      "activity string")
              .option("maxFilesPerTrigger", "1")
              .parquet(str(src / "*.parquet"))
              .withColumn("ts", F.timestamp_seconds(F.col("sec")))
              .withWatermark("ts", "1 hour")
              .select("user", "ts", "event_id", "activity"))
    table = run_stream_to_table(markov_ordered_agg(stream),
                                mode="update")
    drained = {(r.prev_activity, r.activity): r.n for r in
               (table.groupBy("user", "prev_activity", "activity")
                .agg(F.max("n").alias("n")).collect())}

    allrows = sorted(f1 + f2[:-1], key=lambda r: (r[1], r[0]))
    cutoff = sentinel[1] - 3600  # final watermark: max(ts) - 1h
    seq = [r[3] for r in allrows if r[1] <= cutoff]
    expected: dict = {}
    for p, a in zip(seq, seq[1:]):
        expected[(p, a)] = expected.get((p, a), 0) + 1
    assert drained == expected
    assert sum(expected.values()) == len(seq) - 1 > 50


def test_isotonic_calibration_pav_invariants(spark):
    """PAV's two defining properties, which the oracle hash can't
    express on its own: the fitted rate is monotone nondecreasing in
    the score bin, and pooling preserves the weighted sum
    (sum n*fit == sum npos, to the 1e-6 emission rounding)."""
    from threat_detection_nosql_spark.queries.metrics import (
        isotonic_calibration,
    )

    rows = isotonic_calibration(spark, SF_DIR).collect()
    assert len(rows) >= 2
    assert [r.bin for r in rows] == sorted(r.bin for r in rows)
    fits = [r.iso_rate for r in rows]
    assert all(a <= b for a, b in zip(fits, fits[1:])), fits
    assert all(0.0 <= f <= 1.0 for f in fits)
    total_n = sum(r.n for r in rows)
    total_pos = sum(r.npos for r in rows)
    weighted = sum(r.n * r.iso_rate for r in rows)
    assert abs(weighted - total_pos) <= total_n * 5e-7 + 1e-9
    # raw rates are NOT monotone at this SF — the fit does real pooling
    raws = [r.raw_rate for r in rows]
    assert any(a > b for a, b in zip(raws, raws[1:])), \
        "fixture too easy: raw rates already monotone"
