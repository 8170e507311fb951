"""Sketch rollups (operators/sketches.py): merged-estimate accuracy
vs exact, and the mergeability property itself (union of daily
sketches == sketch of the union)."""

import pyspark.sql.functions as F

from threat_detection_nosql_spark.operators import sketches
from threat_detection_nosql_spark.sources.readers import load_table

SF = "/root/testdata/sf0.001"


def test_hll_rollup_close_to_exact(spark):
    ev = load_table(spark, SF, "events")
    daily = sketches.daily_user_sketches(ev)
    est = {r.event_type: r.est_distinct_users
           for r in sketches.rollup_distinct_users(daily).collect()}
    exact = {r.event_type: r.n
             for r in ev.groupBy("event_type")
             .agg(F.countDistinct("user_id").alias("n")).collect()}
    for t, n in exact.items():
        assert abs(est[t] - n) / n < 0.05, (t, est[t], n)


def test_hll_merge_equals_direct_sketch(spark):
    ev = load_table(spark, SF, "events")
    daily = sketches.daily_user_sketches(ev)
    merged = {r.event_type: r.est_distinct_users
              for r in sketches.rollup_distinct_users(daily).collect()}
    direct = {r.event_type: r.est
              for r in ev.groupBy("event_type")
              .agg(F.hll_sketch_estimate(
                  F.hll_sketch_agg("user_id", F.lit(12))).alias("est"))
              .collect()}
    assert merged == direct  # lossless mergeability, not approximation


def test_kll_quantiles_close_to_exact(spark):
    ev = load_table(spark, SF, "events")
    daily = sketches.daily_value_sketches(ev)
    out = {r.event_type: (r.p50, r.p99)
           for r in sketches.rollup_value_quantiles(daily).collect()}
    # KLL guarantees RANK accuracy (~1.65% at k=200), not value
    # accuracy — in a long tail a tiny rank error is a big value gap.
    # Assert: the exact rank of each estimated quantile is within 3%
    # of the requested rank.
    for t, (p50, p99) in out.items():
        sub = ev.filter(F.col("event_type") == t)
        n = sub.count()
        for q, est in ((0.5, p50), (0.99, p99)):
            rank = sub.filter(F.col("value") <= est).count() / n
            assert abs(rank - q) < 0.03, (t, q, est, rank)


def test_misra_gries_recovers_planted_heavy_hitter(spark):
    # 1000 distinct light keys + one key at 30% frequency; k=16
    # counters (far below cardinality) must still surface it with a
    # certified bound: est <= true <= est + err_bound
    light = spark.range(7000).select(
        (F.col("id") % 1000).cast("string").alias("v"))
    heavy = spark.range(3000).select(F.lit("HOT").alias("v"))
    df = light.unionByName(heavy).repartition(8)
    out = sketches.misra_gries_heavy_hitters(df, "v", k=16).collect()
    top = out[0]
    assert top.v == "HOT"
    assert top.est_count <= 3000 <= top.est_count + top.err_bound


def test_misra_gries_error_bound_certified_for_all_survivors(spark):
    df = spark.range(20000).select(
        (F.floor(F.pow(F.rand(7) , 3) * 50)).cast("string").alias("v"))
    exact = {r.v: r.cnt for r in
             df.groupBy("v").agg(F.count("*").alias("cnt")).collect()}
    out = sketches.misra_gries_heavy_hitters(df, "v", k=8).collect()
    for r in out:
        assert r.est_count <= exact[r.v] <= r.est_count + r.err_bound, r


def test_misra_gries_bounded_output(spark):
    # summaries carry at most k counters per partition
    df = spark.range(50000).select(
        (F.col("id") % 5000).cast("string").alias("v")).repartition(4)
    out = sketches.misra_gries_heavy_hitters(df, "v", k=10).collect()
    assert len(out) <= 4 * 10


def test_countmin_never_underestimates(spark):
    """CM's one-sided guarantee: est ≥ exact for EVERY key (collisions
    only add), and min-over-depth keeps the planted heavy key's
    overcount within a loose 8·N/width band on a skewed fixture."""
    rows = [("hot",)] * 500 + [(f"k{i % 200}",) for i in range(1500)]
    df = spark.createDataFrame(rows, "tok string")
    ex = df.groupBy("tok").agg(F.count("*").alias("cnt"))
    sketch = sketches.countmin_cells(ex, depth=4, width=256)
    est = {r["tok"]: r["cm_est"]
           for r in sketches.countmin_estimates(
               sketch, ex, depth=4, width=256).collect()}
    exact = {r["tok"]: r["cnt"] for r in ex.collect()}
    n_total = sum(exact.values())
    for tok, cnt in exact.items():
        assert est[tok] >= cnt, tok
    assert est["hot"] - exact["hot"] <= 8 * n_total // 256


def test_countmin_cells_bounded_and_mass_preserving(spark):
    """Each depth row's counters sum to exactly N (the sketch is a
    partition of the weighted keys), and the table never exceeds
    depth×width rows — the fixed-state contract that makes the rollup
    shuffle-bounded at any corpus size."""
    df = spark.createDataFrame(
        [(f"t{i % 97}",) for i in range(3000)], "tok string")
    ex = df.groupBy("tok").agg(F.count("*").alias("cnt"))
    cells = sketches.countmin_cells(ex, depth=4, width=64).collect()
    assert len(cells) <= 4 * 64
    per_row = {}
    for r in cells:
        per_row[r["r"]] = per_row.get(r["r"], 0) + r["cell_cnt"]
    assert per_row == {r: 3000 for r in range(4)}


def test_countmin_query_matches_oracle(spark, ddb):
    from tests.conftest import compare_query_to_oracle
    from threat_detection_nosql_spark.queries import metrics
    compare_query_to_oracle(
        spark, ddb, metrics.QUERIES_TAIL["countmin_token_estimates"],
        metrics.ORACLES_TAIL["countmin_token_estimates"])


def test_portable_hll_accuracy_band(spark):
    """Portable HLL at p=10 has rsd ≈ 1.04/√1024 ≈ 3.3%; assert the
    estimate lands within 4σ on a 20k-distinct fixture (register build
    is exact integer arithmetic, so this is deterministic — one fixed
    outcome, not a flaky statistical test)."""
    df = spark.range(20_000).selectExpr("cast(id as string) AS k")
    est = sketches.hll_portable_estimate(
        sketches.hll_portable_registers(df, "k")).collect()[0]
    assert abs(est["hll_estimate"] / 20_000 - 1) < 4 * 0.033


def test_portable_hll_query_matches_oracle(spark, ddb):
    from tests.conftest import compare_query_to_oracle
    from threat_detection_nosql_spark.queries import metrics
    compare_query_to_oracle(
        spark, ddb, metrics.QUERIES_TAIL["hll_portable_distinct_users"],
        metrics.ORACLES_TAIL["hll_portable_distinct_users"])


def test_portable_hll_registers_merge(spark):
    """Mergeability — the property that makes it a sketch: registers
    of A∪B equal the per-index max of registers(A) and registers(B),
    so daily register tables roll up without rescanning facts."""
    import pyspark.sql.functions as F
    a = spark.range(0, 3000).selectExpr("cast(id as string) AS k")
    b = spark.range(2000, 6000).selectExpr("cast(id as string) AS k")
    direct = {(r["idx"], r["r"])
              for r in sketches.hll_portable_registers(
                  a.union(b), "k").collect()}
    merged = {(r["idx"], r["r"])
              for r in sketches.hll_portable_registers(a, "k")
              .unionByName(sketches.hll_portable_registers(b, "k"))
              .groupBy("idx").agg(F.max("r").alias("r")).collect()}
    assert direct == merged


# ---------------------------------------------------------------------------
# Portable Bloom filter (round-5)
# ---------------------------------------------------------------------------

def test_bloom_no_false_negatives_and_bounded_fp(spark):
    """Every built key must probe positive (Bloom guarantees no false
    negatives); with a deliberately tiny filter, probes outside the
    build set must show SOME false positives (saturation behaves as
    the math says) but never break the no-FN guarantee."""
    from threat_detection_nosql_spark.operators import sketches as S

    build = spark.range(0, 50).select(F.col("id").alias("k"))
    probe = spark.range(0, 200).select(F.col("id").alias("k"))
    m, h = 240, 4  # 4 words, ~57% bit load — forces collisions
    words = S.bloom_words(build, "k", n_hashes=h, m_bits=m)
    got = {r.k: r.in_filter
           for r in S.bloom_probe(words, probe, "k",
                                  n_hashes=h, m_bits=m).collect()}
    for k in range(50):
        assert got[k] == 1, f"false negative for built key {k}"
    fps = sum(got[k] for k in range(50, 200))
    assert 0 < fps < 150  # collisions happen, but not everything


def test_bloom_words_or_merge_equals_single_build(spark):
    """Two partial filters built on disjoint key halves OR-merge into
    exactly the single-build word table — the property that makes the
    sketch per-partition/streaming-safe."""
    from threat_detection_nosql_spark.operators import sketches as S

    all_keys = spark.range(0, 80).select(F.col("id").alias("k"))
    h1 = all_keys.filter("k < 40")
    h2 = all_keys.filter("k >= 40")
    single = {(r.word, r.word_bits)
              for r in S.bloom_words(all_keys, "k").collect()}
    merged = (S.bloom_words(h1, "k")
              .unionByName(S.bloom_words(h2, "k"))
              .groupBy("word").agg(F.bit_or("word_bits")
                                   .alias("word_bits")))
    assert {(r.word, r.word_bits) for r in merged.collect()} == single


def test_theta_overlap_exact_mode_and_estimator(spark):
    """Theta intersection (round 11): sets below k decode EXACTLY
    (theta = hash-space max -> estimate == intersection); sets above
    k estimate within the KMV error envelope."""
    from threat_detection_nosql_spark.operators.sketches import (
        THETA_K, theta_overlap_estimates, theta_user_sketches)

    # exact mode: 30 shared users across two types (30 < k)
    rows = ([("a", u) for u in range(40)]
            + [("b", u) for u in range(10, 50)])
    ev = spark.createDataFrame(rows, "event_type string, user_id long")
    out = {(r.type_a, r.type_b): r for r in theta_overlap_estimates(
        theta_user_sketches(ev)).collect()}
    r = out[("a", "b")]
    assert r.est_overlap == r.n_common == 30

    # estimator mode: 4k users per side, 2k shared (>> k)
    big = ([("a", u) for u in range(4000)]
           + [("b", u) for u in range(2000, 6000)])
    ev2 = spark.createDataFrame(big, "event_type string, user_id long")
    r2 = {(r.type_a, r.type_b): r for r in theta_overlap_estimates(
        theta_user_sketches(ev2)).collect()}[("a", "b")]
    # rel err ~ few/sqrt(k): generous 4-sigma band
    assert abs(r2.est_overlap - 2000) / 2000 < 4 / THETA_K ** 0.5
    assert r2.n_common < THETA_K  # genuinely sketch-sized evidence
