"""Round-7 analytics wave: independent Python rederivations of the
Gini / association-rule / Kendall / sweep-line / readability /
prefix-dup kernels (oracle parity itself rides the parametrized module
sweeps in test_relational_queries / test_metrics_queries /
test_temporal_joins / test_pipeline_queries)."""

from __future__ import annotations

import re
from collections import Counter, defaultdict
from datetime import timedelta

import duckdb

from tests.conftest import SF_SMALL
from threat_detection_nosql_spark.queries.metrics import (
    _TAU_X_CUTS,
    _TAU_Y_CUTS,
    kendall_tau_binned,
)
from threat_detection_nosql_spark.queries.pipeline import (
    readability_report,
    template_prefix_dups,
)
from threat_detection_nosql_spark.queries.relational import (
    brand_assoc_rules_top20,
    nation_revenue_gini,
)
from threat_detection_nosql_spark.queries.temporal import (
    peak_concurrency_by_type,
)


def _ddb(sf):
    con = duckdb.connect()
    for t in ("customer", "orders", "nation", "lineitem", "part",
              "events", "documents"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    return con


def test_gini_python_rederivation(spark):
    """Exact Gini per nation recomputed with the mean-difference
    definition G = Σ_i Σ_j |x_i − x_j| / (2 n² μ) — an algebraically
    different formula than the rank form the query uses."""
    con = _ddb(SF_SMALL)
    rows = con.sql("""
        SELECT n.n_name, CAST(sum(CAST(round(o.o_totalprice*100,0)
                         AS BIGINT)) AS BIGINT) AS cents
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        GROUP BY n.n_name, o.o_custkey""").fetchall()
    con.close()
    by_nation = defaultdict(list)
    for name, cents in rows:
        by_nation[name].append(cents)
    got = {r.nation: r for r in
           nation_revenue_gini(spark, SF_SMALL).collect()}
    assert set(got) == set(by_nation)
    for name, xs in by_nation.items():
        n, s = len(xs), sum(xs)
        mean_abs_diff = sum(abs(a - b) for a in xs for b in xs)
        expect = mean_abs_diff / (2.0 * n * n * (s / n))
        assert abs(got[name].gini - expect) < 1e-6, name
        assert got[name].n_customers == n
        assert got[name].rev_cents == s


def test_assoc_rules_support_and_lift(spark):
    """Pair supports recomputed from raw baskets; confidence/lift are
    exactly the ratios of the emitted integer supports; the top-20 cut
    is by the exact integer lift_ppm."""
    con = _ddb(SF_SMALL)
    baskets = con.sql("""
        SELECT DISTINCT l.l_orderkey, p.p_brand
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        """).fetchall()
    con.close()
    per_order = defaultdict(set)
    for ok, b in baskets:
        per_order[ok].add(b)
    n_orders = len(per_order)
    supp: Counter = Counter()
    pair: Counter = Counter()
    for items in per_order.values():
        for b in items:
            supp[b] += 1
        items = sorted(items)
        for i, x in enumerate(items):
            for y in items[i + 1:]:
                pair[(x, y)] += 1
    rows = brand_assoc_rules_top20(spark, SF_SMALL).collect()
    assert len(rows) == 20
    for r in rows:
        key = tuple(sorted((r.ante, r.cons)))
        assert pair[key] == r.pair_n
        assert supp[r.ante] == r.supp_ante
        assert supp[r.cons] == r.supp_cons
        assert r.pair_n * 200 >= n_orders          # min-support gate
        assert r.lift_ppm == (r.pair_n * n_orders * 1_000_000
                              ) // (r.supp_ante * r.supp_cons)
        assert abs(r.confidence - r.pair_n / r.supp_ante) < 1e-6
        assert abs(r.lift - r.lift_ppm / 1e6) < 1e-6
    ppms = [r.lift_ppm for r in rows]
    assert ppms == sorted(ppms, reverse=True)


def test_kendall_brute_force_pairs(spark):
    """Concordant/discordant/tie counts recomputed by the O(n²)
    definition over the binned sample — the query's O(bins²)
    contingency cross must agree exactly."""
    con = _ddb(SF_SMALL)
    rows = con.sql("""
        SELECT CAST(round(c.c_acctbal*100,0) AS BIGINT),
               CAST(sum(CAST(round(o.o_totalprice*100,0) AS BIGINT))
                    AS BIGINT)
        FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
        GROUP BY c.c_custkey, c.c_acctbal""").fetchall()
    con.close()

    def bin_of(v, cuts):
        return sum(v >= c for c in cuts)

    pts = [(bin_of(x, _TAU_X_CUTS), bin_of(y, _TAU_Y_CUTS))
           for x, y in rows]
    conc = disc = tx = ty = 0
    for i in range(len(pts)):
        for j in range(i + 1, len(pts)):
            dx = pts[i][0] - pts[j][0]
            dy = pts[i][1] - pts[j][1]
            if dx == 0:
                tx += 1
            if dy == 0:
                ty += 1
            if dx * dy > 0:
                conc += 1
            elif dx * dy < 0:
                disc += 1
    r = kendall_tau_binned(spark, SF_SMALL).collect()[0]
    assert r.n_customers == len(pts)
    assert (r.concordant, r.discordant) == (conc, disc)
    assert (r.ties_x, r.ties_y) == (tx, ty)
    n0 = len(pts) * (len(pts) - 1) // 2
    expect = (conc - disc) / ((n0 - tx) ** 0.5 * (n0 - ty) ** 0.5)
    assert abs(r.tau_b - expect) < 1e-6
    assert -1.0 <= r.tau_b <= 1.0


def test_peak_concurrency_brute_sweep(spark):
    """Python event-boundary sweep (close-before-open at equal
    instants) reproduces every per-type peak and its earliest time."""
    con = _ddb(SF_SMALL)
    rows = con.sql("SELECT event_type, ts FROM events").fetchall()
    con.close()
    bounds = defaultdict(list)
    for et, ts in rows:
        bounds[et].append((ts, 1))
        bounds[et].append((ts + timedelta(minutes=30), -1))
    got = {r.event_type: r
           for r in peak_concurrency_by_type(spark, SF_SMALL).collect()}
    assert set(got) == set(bounds)
    for et, bs in bounds.items():
        bs.sort(key=lambda p: (p[0], p[1]))   # -1 before +1: half-open
        run = peak = 0
        peak_at = None
        for t, d in bs:
            run += d
            if run > peak:
                peak, peak_at = run, t
        r = got[et]
        assert r.peak_concurrency == peak
        assert r.n_intervals == len(bs) // 2
        assert r.peak_at == peak_at.strftime("%Y-%m-%d %H:%M:%S")


def test_readability_python_rederivation(spark):
    con = _ddb(SF_SMALL)
    rows = con.sql("SELECT source, text FROM documents").fetchall()
    con.close()
    agg = defaultdict(lambda: [0, 0, 0, 0])   # docs, words, sents, syl
    for src, text in rows:
        a = agg[src]
        a[0] += 1
        a[1] += len(re.findall(r"[a-z]+", text))
        a[2] += max(1, len(re.findall(r"[.!?]+", text)))
        a[3] += len(re.findall(r"[aeiouy]+", text))
    got = {r.source: r for r in
           readability_report(spark, SF_SMALL).collect()}
    assert set(got) == set(agg)
    for src, (nd, w, s, y) in agg.items():
        r = got[src]
        assert (r.n_docs, r.words, r.sentences, r.syllables) == (nd, w,
                                                                 s, y)
        assert abs(r.fk_grade
                   - (0.39 * w / s + 11.8 * y / w - 15.59)) < 1e-6
        assert abs(r.flesch_ease
                   - (206.835 - 1.015 * w / s - 84.6 * y / w)) < 1e-6


def test_template_prefix_python_rederivation(spark):
    con = _ddb(SF_SMALL)
    rows = con.sql("SELECT doc_id, text FROM documents").fetchall()
    con.close()
    groups = defaultdict(list)
    for doc_id, text in rows:
        prefix = " ".join(text.split(" ")[:8])
        groups[prefix].append((doc_id, text))
    expect = {p: g for p, g in groups.items() if len(g) >= 2}
    got = {r.prefix: r for r in
           template_prefix_dups(spark, SF_SMALL).collect()}
    assert set(got) == set(expect)
    for p, g in expect.items():
        r = got[p]
        assert r.n_docs == len(g)
        assert r.rep_doc == min(d for d, _ in g)
        assert r.n_distinct_texts == len({t for _, t in g})


def test_stream_peak_concurrency_resequences_across_batches(spark,
                                                            tmp_path):
    """The event-time-timer claim for the concurrency sweep: batch 2
    delivers events that belong BETWEEN batch 1's buffered events
    (bounded disorder, inside the 1-hour watermark delay) plus a
    far-future sentinel that advances the final watermark. The drained
    per-type peak/peak_at/n_opens must equal the batch +1/−1 sweep of
    the fully time-sorted union at or below the final watermark —
    cross-batch arrival order is invisible, and the sentinel (above
    max(ts) − 1h) never emits a boundary."""
    import os
    import time

    from pyspark.sql import functions as F

    from threat_detection_nosql_spark.streaming.stream_queries import (
        peak_concurrency_agg,
        run_stream_to_table,
    )

    base = 1_700_000_000
    f1 = [(i, base + m * 60, "x") for i, m in
          enumerate(range(0, 61, 2))]
    f1 += [(200 + i, base + m * 60, "y") for i, m in
           enumerate((0, 5, 90))]
    f2 = [(100 + i, base + m * 60, "x") for i, m in
          enumerate(range(31, 60, 2))]
    sentinel = (999, base + 300 * 60, "x")
    f2.append(sentinel)
    src = tmp_path / "feed"
    os.makedirs(src)
    schema = "event_id long, sec long, event_type string"
    for name, rows in [("f1.parquet", f1), ("f2.parquet", f2)]:
        (spark.createDataFrame(rows, schema)
         .coalesce(1).write.parquet(str(src / name)))
        time.sleep(1.1)          # file-source processes in mtime order

    stream = (spark.readStream
              .schema(schema)
              .option("maxFilesPerTrigger", "1")
              .parquet(str(src / "*.parquet"))
              .withColumn("ts", F.timestamp_seconds(F.col("sec")))
              .withWatermark("ts", "1 hour")
              .select("event_type", "ts"))
    table = run_stream_to_table(peak_concurrency_agg(stream),
                                mode="update")
    got = {r.event_type: r for r in
           (table.groupBy("event_type")
            .agg(F.max(F.struct("n_drained", "n_opens", "peak",
                                "peak_at_us")).alias("s"))
            .select("event_type", "s.n_opens", "s.peak",
                    "s.peak_at_us").collect())}

    cutoff = (sentinel[1] - 3600) * 1_000_000      # us, max(ts) − 1h
    bounds = defaultdict(list)
    for _, sec, et in f1 + f2:
        us = sec * 1_000_000
        for t, d in ((us, 1), (us + 30 * 60 * 1_000_000, -1)):
            if t // 1_000 <= cutoff // 1_000:
                bounds[et].append((t, d))
    for et, bs in bounds.items():
        bs.sort()
        run = peak = n_opens = 0
        peak_at = None
        for t, d in bs:
            run += d
            if d == 1:
                n_opens += 1
                if run > peak:
                    peak, peak_at = run, t
        r = got[et]
        assert (r.n_opens, r.peak, r.peak_at_us) == (n_opens, peak,
                                                     peak_at), et
    # the disorder was real: batch 2 interleaves inside batch 1's span
    assert got["x"].peak > max(
        _peak_of(sorted(t for i, t, e in f1 if e == "x")),
        _peak_of(sorted(t for i, t, e in f2[:-1] if e == "x")))


def _peak_of(secs):
    bs = []
    for s in secs:
        bs.append((s, 1))
        bs.append((s + 1800, -1))
    bs.sort()
    run = peak = 0
    for _, d in bs:
        run += d
        peak = max(peak, run)
    return peak


def test_twap_python_rederivation(spark):
    """TWAP recomputed in Python with exact integer arithmetic,
    including the cents-exactness precondition the query relies on."""
    con = _ddb(SF_SMALL)
    rows = con.sql("""SELECT user_id, CAST(ts AS DATE), epoch_us(ts),
                             event_id, value FROM events""").fetchall()
    con.close()
    by_ud = defaultdict(list)
    for u, d, us, eid, v in rows:
        cents = round(v * 100)
        assert abs(v * 100 - cents) < 1e-6     # cents-exact corpus
        by_ud[(u, d)].append((us, eid, cents))
    num = defaultdict(int)
    den = defaultdict(int)
    nev = defaultdict(int)
    days = defaultdict(set)
    for (u, d), evs in by_ud.items():
        evs.sort()
        for (us, _, cents), (nus, _, _) in zip(evs, evs[1:]):
            num[u] += cents * (nus - us)
            den[u] += nus - us
            nev[u] += 1
            days[u].add(d)
    from threat_detection_nosql_spark.queries.temporal import (
        user_twap_value)
    got = {r.user: r for r in user_twap_value(spark, SF_SMALL).collect()}
    assert set(got) == {u for u in den if den[u] > 0}
    for u, r in got.items():
        assert r.n_weighted_events == nev[u]
        assert r.n_active_days == len(days[u])
        assert r.active_us == den[u]
        assert abs(r.twap_value - num[u] / den[u] / 100.0) < 1e-6


def test_ohlc_python_rederivation(spark):
    con = _ddb(SF_SMALL)
    rows = con.sql("""SELECT event_type,
                             strftime(date_trunc('hour', ts),
                                      '%Y-%m-%d %H:00'),
                             epoch_us(ts), event_id,
                             CAST(round(value*100,0) AS BIGINT)
                      FROM events""").fetchall()
    con.close()
    bars = defaultdict(list)
    for et, bar, us, eid, cents in rows:
        bars[(et, bar)].append((us, eid, cents))
    from threat_detection_nosql_spark.queries.temporal import (
        ohlc_hourly_bars)
    got = {(r.event_type, r.bar): r
           for r in ohlc_hourly_bars(spark, SF_SMALL).collect()}
    assert set(got) == set(bars)
    for key, evs in bars.items():
        evs.sort()
        r = got[key]
        cs = [c for _, _, c in evs]
        assert (r.open_cents, r.close_cents) == (evs[0][2], evs[-1][2])
        assert (r.high_cents, r.low_cents) == (max(cs), min(cs))
        assert r.volume == len(evs)
        assert r.low_cents <= r.open_cents <= r.high_cents
        assert r.low_cents <= r.close_cents <= r.high_cents


def test_cohort_ltv_python_rederivation(spark):
    con = _ddb(SF_SMALL)
    rows = con.sql("""SELECT o_custkey,
                             year(o_orderdate)*12 + month(o_orderdate)
                               - 1,
                             CAST(round(o_totalprice*100,0) AS BIGINT)
                      FROM orders""").fetchall()
    con.close()
    first: dict = {}
    for c, m, _ in rows:
        first[c] = min(first.get(c, m), m)
    sizes = Counter(first.values())
    monthly = defaultdict(int)
    for c, m, cents in rows:
        monthly[(first[c], m - first[c])] += cents
    from threat_detection_nosql_spark.queries.relational import (
        cohort_ltv_curve)
    got = cohort_ltv_curve(spark, SF_SMALL).collect()
    seen = set()
    for r in got:
        y, mm = map(int, r.cohort.split("-"))
        cm = y * 12 + mm - 1
        seen.add((cm, r.age))
        cum = sum(v for (c0, a), v in monthly.items()
                  if c0 == cm and a <= r.age)
        assert r.cum_rev_cents == cum, (r.cohort, r.age)
        assert r.n_customers == sizes[cm]
        assert abs(r.ltv_per_customer
                   - cum / sizes[cm] / 100.0) < 1e-6
    assert seen == set(monthly)
    # per-cohort LTV is monotone nondecreasing in age by construction
    by_cohort = defaultdict(list)
    for r in got:
        by_cohort[r.cohort].append((r.age, r.ltv_per_customer))
    for cohort, pts in by_cohort.items():
        pts.sort()
        vals = [v for _, v in pts]
        assert all(a <= b for a, b in zip(vals, vals[1:])), cohort


def test_session_path_python_rederivation(spark):
    """Sessionize + path-prefix recomputed in Python (30-min gap,
    (ts, event_id) order) — top-10 with the exact tie-break."""
    con = _ddb(SF_SMALL)
    rows = con.sql("""SELECT user_id, epoch_us(ts), event_id,
                             event_type FROM events""").fetchall()
    con.close()
    by_user = defaultdict(list)
    for u, us, eid, et in rows:
        by_user[u].append((us, eid, et))
    paths: Counter = Counter()
    for u, evs in by_user.items():
        evs.sort()
        cur: list = []
        prev_us = None
        for us, eid, et in evs:
            if prev_us is None or us - prev_us > 30 * 60 * 1_000_000:
                if cur:
                    paths[">".join(cur[:3])] += 1
                cur = []
            cur.append(et)
            prev_us = us
        if cur:
            paths[">".join(cur[:3])] += 1
    expect = sorted(paths.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    from threat_detection_nosql_spark.queries.temporal import (
        session_path_top10)
    got = [(r.path, r.n_sessions)
           for r in session_path_top10(spark, SF_SMALL).collect()]
    assert got == expect


def test_minhash_calibration_exactness_and_scurve(spark):
    """The calibration table's defining invariants: exact Jaccard per
    agreement bucket recomputed from raw shingle sets on the candidate
    pairs, and the estimate is unbiased enough that the bucket means
    are monotone-ish (the S-curve: higher agreement → higher exact
    similarity at the extremes)."""
    from threat_detection_nosql_spark.operators.dedup import (
        minhash_shingles, minhash_signature_near_dups)
    from threat_detection_nosql_spark.queries.advanced import (
        minhash_calibration_report)
    from threat_detection_nosql_spark.sources.readers import load_table

    docs = load_table(spark, SF_SMALL, "documents")
    sh = defaultdict(set)
    for r in minhash_shingles(docs).collect():
        sh[r.doc_id].add(r.shingle)
    buckets = defaultdict(list)
    for r in minhash_signature_near_dups(docs).collect():
        k = round(r.est_jaccard * 16)
        a, b = sh[r.doc_a], sh[r.doc_b]
        inter = len(a & b)
        buckets[k].append(inter * 1_000_000 // (len(a) + len(b)
                                                - inter))
    got = {r.k: r for r in
           minhash_calibration_report(spark, SF_SMALL).collect()}
    assert set(got) == set(buckets)
    for k, ppms in buckets.items():
        r = got[k]
        assert r.n_pairs == len(ppms)
        assert abs(r.est_jaccard - k / 16.0) < 1e-6
        assert abs(r.mean_exact_jaccard
                   - sum(ppms) / len(ppms) / 1e6) < 1e-6
        assert abs(r.min_exact_jaccard - min(ppms) / 1e6) < 1e-6
        assert abs(r.max_exact_jaccard - max(ppms) / 1e6) < 1e-6
    ks = sorted(got)
    # S-curve sanity: the top bucket's exact similarity dominates the
    # bottom bucket's
    assert got[ks[-1]].mean_exact_jaccard > got[ks[0]].mean_exact_jaccard


def test_revenue_pareto_approx_matches_exact_within_band(spark):
    """The executed ntile scale swap: the approx (GK-boundary,
    no-global-sort) path must reproduce the exact decile curve within
    sketch tolerance — shares per decile within 2 points, cumulative
    within 2 points, and identical totals."""
    from threat_detection_nosql_spark.queries.relational import (
        revenue_pareto)

    exact = {r.decile: r for r in
             revenue_pareto(spark, SF_SMALL).collect()}
    approx = {r.decile: r for r in
              revenue_pareto(spark, SF_SMALL, approx=True).collect()}
    assert set(approx) == set(exact) == set(range(1, 11))
    assert (sum(r.n_customers for r in approx.values())
            == sum(r.n_customers for r in exact.values()))
    for d in exact:
        assert abs(approx[d].revenue_share
                   - exact[d].revenue_share) < 0.02, d
        assert abs(approx[d].cum_revenue_share
                   - exact[d].cum_revenue_share) < 0.02, d
    # the curve keeps its defining monotone concavity
    cums = [approx[d].cum_revenue_share for d in range(1, 11)]
    assert all(a <= b + 1e-9 for a, b in zip(cums, cums[1:]))
    assert abs(cums[-1] - 1.0) < 1e-6


def test_cdc_python_rederivation(spark):
    con = _ddb(SF_SMALL)
    rows = con.sql("""SELECT user_id, epoch_us(ts), event_id,
                             event_type,
                             CAST(round(value*100,0) AS BIGINT)
                      FROM events""").fetchall()
    con.close()
    by_k = defaultdict(list)
    for u, us, eid, et, cents in rows:
        by_k[u].append((us, eid, et, cents))
    from threat_detection_nosql_spark.queries.relational import (
        cdc_last_writer_state)
    got = {r.user_id: r for r in
           cdc_last_writer_state(spark, SF_SMALL).collect()}
    for u, evs in by_k.items():
        evs.sort()
        last = evs[-1]
        if last[2] == "error":           # final DELETE: key absent
            assert u not in got
        else:
            r = got[u]
            assert r.live_value_cents == last[3]
            assert r.n_changes == len(evs)
            assert r.n_deletes == sum(1 for e in evs
                                      if e[2] == "error")
    assert set(got) <= set(by_k)


def test_stream_cdc_state_invariant_to_batching(spark, tmp_path):
    """Struct-max associativity: the streamed live table equals the
    batch last-writer-wins whatever the file batching — driven as two
    out-of-order files with interleaved updates and a final delete
    for one key."""
    import os
    import time

    from pyspark.sql import functions as F

    from threat_detection_nosql_spark.streaming.stream_queries import (
        run_stream_to_table,
    )

    base = 1_700_000_000
    # key 1: updates across both files, latest (minute 50, f1) wins
    # key 2: final op is a delete (minute 60, f2) -> absent
    # key 3: single update in f2
    f1 = [(10, base + 50 * 60, 1, "purchase", 5.00),
          (11, base + 10 * 60, 2, "view", 1.00),
          (12, base + 20 * 60, 1, "view", 2.00)]
    f2 = [(20, base + 30 * 60, 1, "click", 3.00),
          (21, base + 60 * 60, 2, "error", 0.00),
          (22, base + 5 * 60, 3, "signup", 9.99)]
    src = tmp_path / "cdc"
    os.makedirs(src)
    schema = ("event_id long, sec long, user long, activity string, "
              "value double")
    for name, rows in [("f1.parquet", f1), ("f2.parquet", f2)]:
        (spark.createDataFrame(rows, schema)
         .coalesce(1).write.parquet(str(src / name)))
        time.sleep(1.1)

    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", "1")
              .parquet(str(src / "*.parquet"))
              .withColumn("ts", F.timestamp_seconds(F.col("sec"))))
    log = stream.select(
        F.col("user").alias("k"), "ts", "event_id",
        F.when(F.col("activity") == "error", F.lit("D"))
        .otherwise(F.lit("U")).alias("op"),
        F.round(F.col("value") * 100, 0).cast("long").alias("cents"))
    agg = (log.groupBy("k")
           .agg(F.max(F.struct("ts", "event_id", "op", "cents"))
                .alias("w")))
    table = run_stream_to_table(agg, mode="complete")
    live = {r.k: r["w"]["cents"] for r in table.collect()
            if r["w"]["op"] == "U"}
    assert live == {1: 500, 3: 999}


def _write_events(spark, path, rows):
    """rows: (event_id, sec, user_id, event_type, value)."""
    import os

    from pyspark.sql import functions as F
    os.makedirs(path, exist_ok=True)
    (spark.createDataFrame(
        rows, "event_id long, sec long, user_id long, "
              "event_type string, value double")
     .withColumn("ts", F.timestamp_seconds(F.col("sec")))
     .withColumn("props", F.lit("{}"))
     .select("event_id", "ts", "user_id", "event_type", "value",
             "props")
     .coalesce(1).write.mode("overwrite")
     .parquet(str(path) + "/events.parquet"))


def test_peak_concurrency_halfopen_boundary_fixture(spark, tmp_path):
    """The subtlest semantics, pinned on a planted log: an interval
    closing exactly when another opens must NOT overlap it
    (half-open), and simultaneous opens stack."""
    from threat_detection_nosql_spark.queries.temporal import (
        peak_concurrency_by_type)

    base = 1_700_000_000
    rows = [
        # type "x": e0 opens at t=0; e1 opens exactly at t+30min —
        # e0 closed first, so concurrency never exceeds 1
        (0, base, 1, "x", 1.0),
        (1, base + 1800, 2, "x", 1.0),
        # type "y": three simultaneous opens -> peak 3 at that instant
        (2, base + 60, 1, "y", 1.0),
        (3, base + 60, 2, "y", 1.0),
        (4, base + 60, 3, "y", 1.0),
    ]
    _write_events(spark, tmp_path, rows)
    got = {r.event_type: r for r in
           peak_concurrency_by_type(spark, str(tmp_path)).collect()}
    assert got["x"].peak_concurrency == 1          # half-open: no touch
    assert got["x"].n_intervals == 2
    assert got["y"].peak_concurrency == 3
    import datetime
    assert got["y"].peak_at == datetime.datetime.utcfromtimestamp(
        base + 60).strftime("%Y-%m-%d %H:%M:%S")


def test_ohlc_cdc_twap_same_instant_ties_fixture(spark, tmp_path):
    """Same-timestamp rows: event_id is the deterministic tie-break
    for OHLC open/close and the CDC winner; zero-gap TWAP weights
    contribute nothing but the row still counts as weighted."""
    from threat_detection_nosql_spark.queries.relational import (
        cdc_last_writer_state)
    from threat_detection_nosql_spark.queries.temporal import (
        ohlc_hourly_bars, user_twap_value)

    base = 1_700_000_000
    rows = [
        # user 1, one hour bar, three events, two at the same instant
        (10, base, 1, "view", 3.00),
        (11, base, 1, "view", 1.00),       # same ts, higher id
        (12, base + 600, 1, "view", 2.00),
    ]
    _write_events(spark, tmp_path, rows)

    bar = ohlc_hourly_bars(spark, str(tmp_path)).collect()
    assert len(bar) == 1
    r = bar[0]
    # open = event_id 10 (lowest id at the tied first instant),
    # close = event_id 12
    assert (r.open_cents, r.close_cents) == (300, 200)
    assert (r.high_cents, r.low_cents, r.volume) == (300, 100, 3)

    cdc = {r.user_id: r for r in
           cdc_last_writer_state(spark, str(tmp_path)).collect()}
    assert cdc[1].live_value_cents == 200          # last (ts, id) wins
    assert cdc[1].n_changes == 3 and cdc[1].n_deletes == 0

    twap = {r.user: r for r in
            user_twap_value(spark, str(tmp_path)).collect()}
    t = twap[1]
    # weights: id10 -> 0us (tie), id11 -> 600s; weighted mean =
    # (300*0 + 100*600e6) / 600e6 = 100 cents = 1.0
    assert t.n_weighted_events == 2
    assert t.active_us == 600 * 1_000_000
    assert abs(t.twap_value - 1.0) < 1e-9


def test_revenue_bridge_decomposition_identity(spark):
    """The bridge's defining property: volume_effect + price_effect
    == delta for every row (the waterfall closes), and effects
    recompute from the emitted integers."""
    from threat_detection_nosql_spark.queries.tpch import (
        revenue_bridge_wow)

    rows = revenue_bridge_wow(spark, SF_SMALL).collect()
    assert len(rows) > 100
    for r in rows:
        assert r.delta_cents == r.rev_cents - r.prev_rev_cents
        # the waterfall closes EXACTLY - all-integer decomposition
        assert (r.volume_effect_cents + r.price_effect_cents
                == r.delta_cents), r
        # volume effect recomputes from the emitted integers:
        # (v1-v0)*rev0 div v0 with truncation toward zero


def test_abc_xyz_python_rederivation(spark):
    """Full matrix recomputed in exact integer arithmetic from the
    raw lineitem — Pareto bands by cumulative share, XYZ by the CV²
    cross-multiplication."""
    con = _ddb(SF_SMALL)
    rows = con.sql("""
        SELECT l_partkey, date_trunc('month', l_shipdate),
               CAST(l_quantity AS BIGINT),
               CAST(round(l_extendedprice*100,0) AS BIGINT)
                 * (100 - CAST(round(l_discount*100,0) AS BIGINT))
        FROM lineitem""").fetchall()
    con.close()
    monthly = defaultdict(int)
    rev = defaultdict(int)
    for pk, m, q, re4 in rows:
        monthly[(pk, m)] += q
        rev[pk] += re4
    stats = defaultdict(lambda: [0, 0, 0])
    for (pk, _), mq in monthly.items():
        s = stats[pk]
        s[0] += 1
        s[1] += mq
        s[2] += mq * mq
    xyz = {}
    for pk, (n, s, qq) in stats.items():
        spread = n * qq - s * s
        xyz[pk] = ("X" if 4 * spread <= s * s
                   else "Y" if spread <= s * s else "Z")
    tot = sum(rev.values())
    cum = 0
    abc = {}
    for pk in sorted(rev, key=lambda p: (-rev[p], p)):
        cum += rev[pk]
        abc[pk] = ("A" if 5 * cum <= 4 * tot
                   else "B" if 20 * cum <= 19 * tot else "C")
    cells = defaultdict(lambda: [0, 0])
    for pk in rev:
        c = cells[(abc[pk], xyz[pk])]
        c[0] += 1
        c[1] += rev[pk]
    from threat_detection_nosql_spark.queries.tpch import abc_xyz_parts
    got = {(r.abc_class, r.xyz_class): r
           for r in abc_xyz_parts(spark, SF_SMALL).collect()}
    assert set(got) == set(cells)
    for key, (n, r4) in cells.items():
        assert got[key].n_parts == n
        assert abs(got[key].rev_share - r4 / tot) < 1e-6


def test_neyman_allocation_properties(spark):
    """The apportionment invariants: Σ alloc == K exactly, every
    alloc within 1 of its fractional ideal (the Hamilton-method
    quota property), and the weight recomputes from raw lengths as
    round(1024·sqrt(N·Σx²−S²)) per stratum."""
    import math

    from threat_detection_nosql_spark.queries.corpus import (
        _NEYMAN_K, neyman_allocation_plan)

    con = _ddb(SF_SMALL)
    rows = con.sql("""SELECT source, count(*) ,
                             sum(CAST(length(text) AS HUGEINT)),
                             sum(CAST(length(text) AS HUGEINT)
                                 * length(text))
                      FROM documents GROUP BY source""").fetchall()
    con.close()
    weights = {src: round(math.sqrt(float(n * qq - s * s)) * 1024)
               for src, n, s, qq in rows}
    got = {r.source: r for r in
           neyman_allocation_plan(spark, SF_SMALL).collect()}
    assert set(got) == set(weights)
    assert sum(r.alloc for r in got.values()) == _NEYMAN_K
    tw = sum(weights.values())
    for src, w in weights.items():
        r = got[src]
        assert r.weight == w
        ideal = _NEYMAN_K * w / tw
        assert abs(r.ideal - ideal) < 1e-6
        # Hamilton quota property: floor(ideal) <= alloc <= ceil(ideal)
        assert math.floor(ideal) <= r.alloc <= math.ceil(ideal), src


def test_neyman_quota_sample_execution(spark):
    """The draw honors the plan exactly: per-stratum count ==
    min(alloc, N), ranks are the contiguous 1..count prefix, total ==
    K when no stratum saturates, and the draw is deterministic
    across invocations."""
    from threat_detection_nosql_spark.queries.corpus import (
        _NEYMAN_K, neyman_allocation_plan, neyman_quota_sample)

    plan = {r.source: r for r in
            neyman_allocation_plan(spark, SF_SMALL).collect()}
    rows = neyman_quota_sample(spark, SF_SMALL).collect()
    by_src = defaultdict(list)
    for r in rows:
        by_src[r.source].append((r.draw_rank, r.doc_id))
    assert set(by_src) <= set(plan)
    for src, drawn in by_src.items():
        expect = min(plan[src].alloc, plan[src].n_docs)
        assert len(drawn) == expect, src
        assert sorted(rk for rk, _ in drawn) == list(
            range(1, expect + 1))
    if all(p.alloc <= p.n_docs for p in plan.values()):
        assert len(rows) == _NEYMAN_K
    again = neyman_quota_sample(spark, SF_SMALL).collect()
    assert {(r.source, r.doc_id, r.draw_rank) for r in rows} \
        == {(r.source, r.doc_id, r.draw_rank) for r in again}
