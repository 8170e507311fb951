"""Round-8 additions: scale caps and planted-fixture semantics."""
from __future__ import annotations

import datetime as dt

import pyarrow as pa
import pyarrow.parquet as pq


def _write_events(tmp_path, rows):
    """rows: (event_id, ts, user_id, event_type, value)."""
    table = pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
        "user_id": pa.array([r[2] for r in rows], pa.int64()),
        "event_type": pa.array([r[3] for r in rows]),
        "value": pa.array([r[4] for r in rows], pa.float64()),
        "props": pa.array(['{"k": 1}'] * len(rows)),
    })
    pq.write_table(table, str(tmp_path / "events.parquet"))


def test_similar_user_pairs_cap_semantics(spark, tmp_path, monkeypatch):
    """The 100-TB contributor bound, on a planted dense key: with the
    cap at 3, the "login" activity keeps its three strongest users
    (count DESC, user ASC breaks the 3-vs-3 tie toward user 3), so
    pairs only ever form among {1, 2, 3} — the dropped {4, 5} appear
    in NO pair, and per-key join output is O(CAP²) no matter how many
    users share the activity."""
    import itertools

    from threat_detection_nosql_spark.queries import threat as T

    rows = []
    eid = 0
    base = dt.datetime(2024, 1, 1, 9, 0, 0)
    for user, n_logins in [(1, 5), (2, 4), (3, 3), (4, 3), (5, 1)]:
        for _ in range(n_logins):
            rows.append((eid, base + dt.timedelta(minutes=eid),
                         user, "login", 1.0))
            eid += 1
    _write_events(tmp_path, rows)

    monkeypatch.setattr(T, "_SIM_USER_CAP", 3)
    out = T.similar_user_pairs_top10(spark, str(tmp_path)).collect()
    got = {(r.u1, r.u2) for r in out}
    assert got == set(itertools.combinations([1, 2, 3], 2))
    assert all(4 not in p and 5 not in p for p in got)
    # 1-D vectors on the shared key: every surviving cosine is exactly 1
    assert all(r.cosine == 1.0 for r in out)


def test_similar_user_pairs_unchanged_below_cap(spark, tmp_path):
    """Below the cap the query is the exact uncapped cosine: two users
    with identical activity mixes score 1.0 ahead of a mixed pair."""
    from threat_detection_nosql_spark.queries.threat import (
        similar_user_pairs_top10)

    rows = []
    eid = 0
    base = dt.datetime(2024, 1, 1, 9, 0, 0)
    mixes = {1: [("login", 4), ("error", 2)],
             2: [("login", 2), ("error", 1)],   # same direction as 1
             3: [("purchase", 5)]}               # orthogonal
    for user, mix in mixes.items():
        for act, n in mix:
            for _ in range(n):
                rows.append((eid, base + dt.timedelta(minutes=eid),
                             user, act, 1.0))
                eid += 1
    _write_events(tmp_path, rows)

    out = similar_user_pairs_top10(spark, str(tmp_path)).collect()
    assert (out[0].u1, out[0].u2, out[0].cosine) == (1, 2, 1.0)
    # user 3 shares no activity with anyone: no pair row at all
    assert {(r.u1, r.u2) for r in out} == {(1, 2)}


# -- lib-free media codecs ----------------------------------------------------

def test_bmp_roundtrip_and_layout():
    """BMP encode→decode round-trips pixel-exactly, and the encoded
    bytes obey the on-disk layout: 54-byte header, bottom-up rows, BGR
    order, rows padded to 4 bytes (w=5 → 15 data bytes + 1 pad)."""
    import numpy as np

    from threat_detection_nosql_spark.operators.multimodal import (
        decode_bmp, encode_bmp)

    rng = np.arange(5 * 3 * 3, dtype=np.uint8).reshape(3, 5, 3)
    blob = encode_bmp(rng)
    assert blob[:2] == b"BM"
    row_size = (5 * 3 + 3) // 4 * 4
    assert row_size == 16 and len(blob) == 54 + 16 * 3
    # first stored row is the LAST image row, first pixel stored B,G,R
    assert blob[54] == rng[2, 0, 2] and blob[56] == rng[2, 0, 0]
    assert (decode_bmp(blob) == rng).all()


def test_ppm_roundtrip_with_comment_header():
    import numpy as np

    from threat_detection_nosql_spark.operators.multimodal import (
        decode_ppm, encode_ppm)

    img = (np.arange(4 * 2 * 3, dtype=np.uint8) * 7 % 251).reshape(2, 4, 3)
    blob = encode_ppm(img)
    assert (decode_ppm(blob) == img).all()
    # spec allows comments anywhere in the header
    commented = b"P6\n# a comment\n4 2\n# more\n255\n" + img.tobytes()
    assert (decode_ppm(commented) == img).all()


def test_wav_roundtrip_and_chunk_walk():
    import numpy as np

    from threat_detection_nosql_spark.operators.multimodal import (
        decode_wav, encode_wav)

    s = (np.arange(100) * 31 - 1500).astype(np.int16)
    blob = encode_wav(s, 16000)
    out, rate = decode_wav(blob)
    assert rate == 16000 and (out == s).all()
    # decoder must walk past an extra LIST chunk before data
    import struct as st
    extra = b"LIST" + st.pack("<I", 4) + b"INFO"
    patched = blob[:12] + extra + blob[12:]
    patched = b"RIFF" + st.pack("<I", len(patched) - 8) + patched[8:]
    out2, rate2 = decode_wav(patched)
    assert rate2 == 16000 and (out2 == s).all()


def test_decode_media_rejects_codec_formats():
    import pytest as pt

    from threat_detection_nosql_spark.operators.multimodal import (
        decode_bmp, decode_media)

    # round 11: jpeg DECODES now (tests/test_jpeg.py) — garbage after
    # SOI fails structurally, not as a capability refusal
    with pt.raises(ValueError):
        decode_media(b"\xff\xd8\xff....", "jpeg")
    with pt.raises(ValueError, match="no lib-free decoder"):
        decode_media(b"\x00\x00\x00\x18ftyp", "mp4")
    with pt.raises(ValueError, match="bad signature"):
        decode_media(b"\x89PNG....", "png")  # truncated: not a real PNG
    with pt.raises(ValueError, match="bad magic"):
        decode_bmp(b"XXnotabmp")


# -- portable KMV quantile sketch ---------------------------------------------

def test_kmv_sample_accuracy_and_mergeability(spark):
    """KMV quantiles land within sampling tolerance of the exact
    percentiles, and the daily-merge path returns EXACTLY the global
    bottom-k sample (mergeability is structural, not approximate)."""
    from pyspark.sql import functions as F

    from threat_detection_nosql_spark.operators import sketches
    from threat_detection_nosql_spark.sources.readers import load_table

    ev = load_table(spark, "/root/testdata/sf0.01", "events")
    daily = sketches.kmv_daily_value_samples(ev, k=256)
    got = {r["event_type"]: r
           for r in sketches.kmv_merge_quantiles(daily, k=256).collect()}
    exact = {r["event_type"]: r for r in (
        ev.groupBy("event_type")
        .agg(F.expr("percentile(value, 0.5)").alias("p50"),
             F.expr("percentile(value, 0.9)").alias("p90")).collect())}
    for et, r in got.items():
        assert r["n_sampled"] == 256
        # k=256 uniform sample: rank error ~ 1/sqrt(k) ≈ 6% of the
        # value RANGE at the median; compare on quantile RANK instead
        # of value to stay distribution-free
        below = ev.filter((F.col("event_type") == et)
                          & (F.col("value") <= r["p50"])).count()
        n = ev.filter(F.col("event_type") == et).count()
        assert abs(below / n - 0.5) < 0.15, (et, below / n)
    assert exact  # sanity: exact side computed

    # mergeability: bottom-k of the daily bottom-k's == global bottom-k
    h = F.md5(F.col("event_id").cast("string"))
    from pyspark.sql.window import Window
    direct = (ev.select("event_type", "event_id", h.alias("h"))
              .withColumn("rk", F.row_number().over(
                  Window.partitionBy("event_type")
                  .orderBy(F.col("h").asc(), F.col("event_id").asc())))
              .filter(F.col("rk") <= 256)
              .groupBy("event_type")
              .agg(F.sort_array(F.collect_list("event_id")).alias("ids")))
    merged = (daily
              .withColumn("rk", F.row_number().over(
                  Window.partitionBy("event_type")
                  .orderBy(F.col("h").asc(), F.col("event_id").asc())))
              .filter(F.col("rk") <= 256)
              .groupBy("event_type")
              .agg(F.sort_array(F.collect_list("event_id")).alias("ids")))
    d = {r["event_type"]: r["ids"] for r in direct.collect()}
    m = {r["event_type"]: r["ids"] for r in merged.collect()}
    assert d == m


# -- power-method PCA ----------------------------------------------------------

def test_power_components_match_numpy_eig():
    """_power_components recovers the top-2 eigenvectors of a planted
    symmetric matrix (|cosine| ≈ 1 vs numpy's eigh) with the pinned
    sign, and they are orthogonal."""
    import numpy as np

    from threat_detection_nosql_spark.queries.ml_queries import (
        _power_components)

    rng = np.random.default_rng(7)
    A = rng.normal(size=(6, 6))
    R = (A @ A.T)  # SPD, distinct eigenvalues almost surely
    v1, v2 = _power_components([list(map(float, row)) for row in R])
    w, V = np.linalg.eigh(R)
    top1, top2 = V[:, -1], V[:, -2]
    assert abs(float(np.dot(v1, top1))) > 1 - 1e-9
    assert abs(float(np.dot(v2, top2))) > 1 - 1e-6
    assert abs(float(np.dot(v1, v2))) < 1e-6
    # sign pin: largest-|component| coordinate is positive
    for v in (v1, v2):
        a = [abs(x) for x in v]
        assert v[a.index(max(a))] > 0


def test_user_pca_projection_variance_order(spark):
    """PC1 captures at least as much variance as PC2 on real data, and
    the projection is centered (means ~0)."""
    from pyspark.sql import functions as F

    from threat_detection_nosql_spark.queries.ml_queries import (
        user_pca_projection)

    out = user_pca_projection(spark, "/root/testdata/sf0.001")
    r = out.agg(F.var_pop("pc1").alias("v1"),
                F.var_pop("pc2").alias("v2"),
                F.avg("pc1").alias("m1"),
                F.avg("pc2").alias("m2")).collect()[0]
    assert r["v1"] >= r["v2"] - 1e-9
    assert abs(r["m1"]) < 1e-3 and abs(r["m2"]) < 1e-3


# -- attribution interval-join state eviction -----------------------------------

def test_attribution_join_state_evicts_past_watermark(spark, tmp_path):
    """linear_attribution_pairs' state-budget claim, pinned on a
    planted two-batch stream (same join shape: watermarked self
    interval join, 7-day touch horizon): after the watermark advances
    a month, (1) the old touches are EVICTED — final state holds only
    the recent rows, not everything ever fed — and (2) a purchase
    arriving behind the watermark is dropped as late instead of
    resurrecting evicted touch state."""
    import os
    import time

    from pyspark.sql import functions as F

    base = str(tmp_path / "in")
    schema = "ts timestamp, user long, activity string, event_id long"

    def write_batch(sub, rows, mtime):
        df = (spark.createDataFrame(
                  [(t, u, a, e) for t, u, a, e in rows],
                  "ts string, user long, activity string, event_id long")
              .select(F.to_timestamp("ts").alias("ts"), "user",
                      "activity", "event_id"))
        path = f"{base}/{sub}"
        df.coalesce(1).write.mode("overwrite").parquet(path)
        for f in os.listdir(path):
            os.utime(os.path.join(path, f), (mtime, mtime))
        os.utime(path, (mtime, mtime))

    now = time.time()
    # the GLOBAL watermark is the MIN across both sides' watermarks,
    # so batch 1 must advance BOTH: a far-future view (touch side) AND
    # a far-future purchase (purchase side)
    write_batch("b1", [
        ("2024-01-01 00:00:00", 1, "view", 1),      # pairs with 3
        ("2024-01-01 01:00:00", 1, "click", 2),     # pairs with 3
        ("2024-01-05 00:00:00", 1, "purchase", 3),
        ("2024-02-10 00:00:00", 2, "view", 4),      # advances tch wm
        ("2024-02-10 00:30:00", 2, "purchase", 7),  # advances pur wm
    ], now - 100)

    src = spark.readStream.schema(schema).parquet(f"{base}/b*")
    pur = (src.where(F.col("activity") == "purchase")
           .select(F.col("event_id").alias("p_id"),
                   F.col("user").alias("p_user"),
                   F.col("ts").alias("p_ts"))
           .withWatermark("p_ts", "1 hour"))
    tch = (src.where(F.col("activity").isin("view", "click"))
           .select(F.col("user").alias("t_user"),
                   F.col("event_id").alias("t_id"),
                   F.col("ts").alias("t_ts"))
           .withWatermark("t_ts", "1 hour"))
    joined = pur.join(tch, F.expr(
        "p_user = t_user AND t_ts < p_ts "
        "AND t_ts >= p_ts - INTERVAL 7 DAYS"))

    q = (joined.select("p_id", "t_id").writeStream.outputMode("append")
         .format("memory").queryName("attr_evict").start())
    try:
        q.processAllAvailable()   # batch 1: wm -> 2024-02-09 23:00
        write_batch("b2", [
            ("2024-02-10 01:00:00", 2, "purchase", 5),  # pairs with 4
            ("2024-01-06 00:00:00", 1, "purchase", 6),  # LATE: dropped
        ], now)
        q.processAllAvailable()
        state_rows = None
        for prog in reversed(q.recentProgress):
            ops = prog.get("stateOperators") or []
            if ops:
                state_rows = ops[0]["numRowsTotal"]
                break
    finally:
        q.stop()

    got = {(r.p_id, r.t_id) for r in spark.table("attr_evict").collect()}
    # late purchase 6 produced NO pairs (its touches 1/2 are in-window
    # by time arithmetic — only eviction/late-drop explains absence)
    assert got == {(3, 1), (3, 2), (7, 4), (5, 4)}
    # state kept only the post-watermark rows, not all 7 fed
    assert state_rows is not None and state_rows <= 4, state_rows


# -- round-8 plan pins ----------------------------------------------------------

def test_round8_plans_scan_once_and_prune(spark):
    """Scale-critical plan properties of the round-8 wave:
    similar_user_pairs reads the fact table ONCE (ua/capped are
    localCheckpointed — the norms agg and both self-join sides reuse
    the materialized RDD, no per-subtree rescan and no downstream
    window nodes); the KMV sketch scan prunes to exactly the four
    consumed columns; media synthesis ships only doc_id into Python."""
    from tests.conftest import SF_DIR
    from tests.test_plans import formatted_plan
    from threat_detection_nosql_spark.queries.metrics import (
        kmv_value_quantiles)
    from threat_detection_nosql_spark.queries.pipeline import (
        media_decode_stats)
    from threat_detection_nosql_spark.queries.threat import (
        similar_user_pairs_top10)

    plan = formatted_plan(similar_user_pairs_top10(spark, SF_DIR))
    assert "Scan parquet" not in plan and "ExistingRDD" in plan
    assert "Window" not in plan  # cap windows paid at checkpoint time

    plan = formatted_plan(kmv_value_quantiles(spark, SF_DIR))
    scans = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert scans
    for ln in scans:
        assert "event_id" in ln and "value" in ln
        assert "props" not in ln and "user_id" not in ln

    plan = formatted_plan(media_decode_stats(spark, SF_DIR))
    scans = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert scans and all("doc_id" in ln and "text" not in ln
                         for ln in scans)


# -- streaming KMV sketch -------------------------------------------------------

def test_stream_kmv_drained_equals_batch_under_any_batching(spark, tmp_path):
    """Bottom-k mergeability must hold under ANY batching: drive the
    same events as TWO micro-batches (maxFilesPerTrigger=1), take each
    type's LAST emission, and assert it equals the batch KMV rollup —
    sample size AND every quantile value."""
    from pyspark.sql import functions as F

    from threat_detection_nosql_spark.operators import sketches
    from threat_detection_nosql_spark.sources.readers import load_table
    from threat_detection_nosql_spark.streaming.stream_queries import (
        kmv_quantile_agg,
        run_stream_to_table,
    )

    ev = load_table(spark, "/root/testdata/sf0.01", "events").select(
        "event_type", "event_id", "value")
    src = str(tmp_path / "ev_feed")
    ev.repartition(2).write.parquet(src)
    stream = (spark.readStream.schema(ev.schema)
              .option("maxFilesPerTrigger", "1").parquet(src))
    table = run_stream_to_table(kmv_quantile_agg(stream, k=64),
                                mode="update")
    last = (table.groupBy("event_type")
            .agg(F.max(F.struct("seq", "n_sampled",
                                "p50", "p90", "p99")).alias("s")))
    drained = {r["event_type"]: (r["s"]["n_sampled"], r["s"]["p50"],
                                 r["s"]["p90"], r["s"]["p99"])
               for r in last.collect()}
    # at least two emissions for some group proves multi-batch ran
    assert table.groupBy("event_type").count().agg(
        F.max("count")).collect()[0][0] >= 2

    batch = {r["event_type"]: (r["n_sampled"], r["p50"], r["p90"],
                               r["p99"])
             for r in sketches.kmv_merge_quantiles(
                 sketches.kmv_daily_value_samples(ev.withColumn(
                     "ts", F.timestamp_micros(F.col("event_id"))), k=64),
                 k=64).collect()}
    assert drained == batch


# -- bucketed co-located join ----------------------------------------------------

def test_bucketed_join_has_no_exchange(spark):
    """Two tables bucketed on the same (key, bucket-count) must join
    with NO Exchange on either side (and no Sort when written
    sortBy) — the co-located fact-fact join layout. A plain parquet
    write of the same data shuffles both sides; bucketing is what
    removes it."""
    from pyspark.sql import functions as F

    from tests.test_plans import formatted_plan
    from threat_detection_nosql_spark.sources.readers import load_table
    from threat_detection_nosql_spark.sources.writers import write_bucketed

    ev = load_table(spark, "/root/testdata/sf0.01", "events")
    facts = ev.select("user_id", "event_id", "value")
    dims = (ev.groupBy("user_id")
            .agg(F.count("*").alias("n_events")))
    try:
        write_bucketed(facts, "r8_facts_b", "user_id", buckets=8)
        write_bucketed(dims, "r8_dims_b", "user_id", buckets=8)
        j = (spark.table("r8_facts_b")
             .join(spark.table("r8_dims_b"), "user_id")
             .groupBy("user_id").agg(F.sum("value").alias("v"),
                                     F.max("n_events").alias("n")))
        # disable broadcast so the join strategy itself is under test
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            plan = formatted_plan(j)
        finally:
            spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        tree = plan.split("\n\n")[0]  # root-first tree section
        assert "SortMergeJoin" in tree
        # no shuffle FEEDS the join: root-first printing puts the
        # join's inputs after its line, so nothing below it may be an
        # Exchange (one above it — e.g. the final agg — is fine)
        below_join = tree.split("SortMergeJoin", 1)[1]
        assert "Exchange" not in below_join, below_join
        # correctness unchanged vs the plain join
        plain = (facts.join(dims, "user_id")
                 .groupBy("user_id").agg(F.sum("value").alias("v"),
                                         F.max("n_events").alias("n")))
        assert sorted(map(tuple, j.collect())) == \
            sorted(map(tuple, plain.collect()))
    finally:
        spark.sql("DROP TABLE IF EXISTS r8_facts_b")
        spark.sql("DROP TABLE IF EXISTS r8_dims_b")


# -- property-based codec round-trips -------------------------------------------

def test_codec_roundtrips_property():
    """Property test: ANY uint8 image round-trips BMP and PPM
    byte-exactly (odd widths exercise BMP's row padding), and ANY
    int16 signal round-trips WAV — driven by hypothesis so the codecs
    are pinned on shapes the planted fixtures never hit."""
    import numpy as np
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from threat_detection_nosql_spark.operators.multimodal import (
        decode_bmp, decode_ppm, decode_wav, encode_bmp, encode_ppm,
        encode_wav)

    @settings(max_examples=40, deadline=None)
    @given(st.integers(1, 9), st.integers(1, 9), st.integers(0, 2**32 - 1))
    def roundtrip_images(w, h, seed):
        rng = np.random.default_rng(seed)
        img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        assert (decode_bmp(encode_bmp(img)) == img).all()
        assert (decode_ppm(encode_ppm(img)) == img).all()

    @settings(max_examples=40, deadline=None)
    @given(st.integers(1, 500), st.integers(0, 2**32 - 1),
           st.sampled_from([8000, 16000, 44100]))
    def roundtrip_audio(n, seed, rate):
        rng = np.random.default_rng(seed)
        s = rng.integers(-32768, 32768, size=n, dtype=np.int16)
        out, r = decode_wav(encode_wav(s, rate))
        assert r == rate and (out == s).all()

    roundtrip_images()
    roundtrip_audio()


# -- RAG chunking ----------------------------------------------------------------

def test_chunked_documents_boundaries(spark, tmp_path):
    """Chunk boundary semantics on planted docs: a 100-token doc gets
    chunks starting at 0/48 — the start sequence stops at
    n_tok - (W-S) - 1 (ADVICE r8), so the would-be chunk at 96 (a
    strict suffix-subset of the chunk at 48, which already covers
    tokens 48-99) is NOT emitted; a 1-token doc yields exactly one
    1-token chunk; chunk_md5 matches the md5 of the joined slice."""
    import hashlib

    import pyarrow as pa
    import pyarrow.parquet as pq

    from threat_detection_nosql_spark.queries.pipeline import (
        chunked_documents)

    toks_a = [f"t{i}" for i in range(100)]
    table = pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "text": pa.array([" ".join(toks_a), "solo"]),
        "lang": pa.array(["en", "en"]),
        "source": pa.array(["s", "s"]),
        "n_chars": pa.array([len(" ".join(toks_a)), 4], pa.int64()),
    })
    pq.write_table(table, str(tmp_path / "documents.parquet"))

    rows = {(r.doc_id, r.chunk_idx): r
            for r in chunked_documents(spark, str(tmp_path)).collect()}
    assert sorted(rows) == [(1, 0), (1, 1), (2, 0)]
    assert (rows[(1, 0)].start_tok, rows[(1, 0)].chunk_tokens) == (0, 64)
    assert (rows[(1, 1)].start_tok, rows[(1, 1)].chunk_tokens) == (48, 52)
    assert (rows[(2, 0)].start_tok, rows[(2, 0)].chunk_tokens) == (0, 1)
    want = hashlib.md5(" ".join(toks_a[48:100]).encode()).hexdigest()
    assert rows[(1, 1)].chunk_md5 == want
    # 16-token overlap: chunk 1 starts 16 tokens before chunk 0 ends
    assert 64 - 48 == 16
