"""Round-7e wave: independent Python rederivations of the Benford /
chi-square / MAD / Theil-Sen / pivot / referential-integrity kernels
(oracle parity itself rides scripts/check_all.py and the parametrized
module sweeps)."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import duckdb

from tests.conftest import SF_SMALL
from threat_detection_nosql_spark.queries.metrics import (
    _BENFORD_PPB,
    activity_weekend_chi2,
    benford_digit_audit,
    value_mad_outliers,
)
from threat_detection_nosql_spark.queries.relational import (
    _PIVOT_YEARS,
    referential_integrity_audit,
    segment_year_pivot,
)
from threat_detection_nosql_spark.queries.temporal import (
    theil_sen_user_trend,
)


def _ddb(sf):
    con = duckdb.connect()
    for t in ("customer", "orders", "nation", "lineitem", "part",
              "supplier", "events"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    return con


def _disc_median(xs):
    """percentile_disc(0.5) == quantile_disc(x, 0.5): the smallest
    observed value whose CDF >= 0.5, i.e. sorted[ceil(n/2) - 1]
    (probed against both engines)."""
    s = sorted(xs)
    return s[math.ceil(0.5 * len(s)) - 1]


def test_benford_literal_table():
    # the table IS log10(1 + 1/d) in ppb, and sums to ~1e9
    for d, p in enumerate(_BENFORD_PPB, start=1):
        assert p == round(1e9 * math.log10(1 + 1 / d))
    assert abs(sum(_BENFORD_PPB) - 1_000_000_000) <= 5


def test_benford_python_rederivation(spark):
    con = _ddb(SF_SMALL)
    totals = [r[0] for r in
              con.sql("SELECT o_totalprice FROM orders").fetchall()]
    con.close()
    counts = Counter(str(round(t * 100))[0] for t in totals)
    n_total = len(totals)
    got = {r.digit: r for r in
           benford_digit_audit(spark, SF_SMALL).collect()}
    assert sorted(got) == list(range(1, 10))  # dense domain
    for d in range(1, 10):
        n = counts.get(str(d), 0)
        row = got[d]
        assert row.n == n
        assert row.n_total == n_total
        assert row.obs_ppm == (1_000_000 * n) // n_total
        e = n_total * _BENFORD_PPB[d - 1] / 1e9
        assert abs(row.chi2_contrib - (n - e) ** 2 / e) < 1e-5, d


def test_chi2_margins_and_contrib(spark):
    con = _ddb(SF_SMALL)
    rows = con.sql("""
        SELECT event_type,
               CASE WHEN isodow(ts) - 1 >= 5 THEN 1 ELSE 0 END
        FROM events""").fetchall()
    con.close()
    obs = Counter(rows)
    rown = Counter(a for a, _ in rows)
    coln = Counter(w for _, w in rows)
    n = len(rows)
    got = activity_weekend_chi2(spark, SF_SMALL).collect()
    assert {(r.activity, r.is_weekend) for r in got} == set(obs)
    for r in got:
        cell = (r.activity, r.is_weekend)
        assert r.obs == obs[cell]
        assert r.row_n == rown[r.activity]
        assert r.col_n == coln[r.is_weekend]
        assert r.n_total == n
        e = rown[r.activity] * coln[r.is_weekend] / n
        assert abs(r.expected - e) < 1e-5
        assert abs(r.chi2_contrib - (obs[cell] - e) ** 2 / e) < 1e-5


def test_mad_outliers_python_rederivation(spark):
    con = _ddb(SF_SMALL)
    rows = con.sql("SELECT event_type, value FROM events").fetchall()
    con.close()
    by_act = defaultdict(list)
    for a, v in rows:
        by_act[a].append(v)
    got = {r.activity: r for r in
           value_mad_outliers(spark, SF_SMALL).collect()}
    assert set(got) == set(by_act)
    for a, vs in by_act.items():
        med = _disc_median(vs)
        ads = [abs(v - med) for v in vs]
        mad = _disc_median(ads)
        n_out = sum(1 for d in ads if d > 3.5 * mad)
        r = got[a]
        assert r.n == len(vs)
        assert r.n_outliers == n_out, a
        assert abs(r.median_r6 - med) < 1e-6
        assert abs(r.mad_r6 - mad) < 1e-6
        # the screen must neither flag nothing nor everything
        assert 0 < r.n_outliers < r.n, a


def test_theil_sen_python_rederivation(spark):
    con = _ddb(SF_SMALL)
    rows = con.sql("""
        SELECT user_id, CAST(ts AS DATE) AS day, count(*) AS y
        FROM events GROUP BY 1, 2""").fetchall()
    con.close()
    daily = defaultdict(dict)
    for u, d, y in rows:
        daily[u][d] = y
    expect = {}
    for u, dm in daily.items():
        if len(dm) < 10:
            continue
        days = sorted(dm)
        slopes = [(dm[d2] - dm[d1]) / (d2 - d1).days
                  for i, d1 in enumerate(days) for d2 in days[i + 1:]]
        expect[u] = (len(dm), len(slopes), round(_disc_median(slopes), 6))
    top = sorted(expect.items(), key=lambda kv: (-kv[1][2], kv[0]))[:20]
    got = theil_sen_user_trend(spark, SF_SMALL).collect()
    assert [(r.user, (r.n_days, r.n_pairs, r.sen_slope)) for r in got] == top


def test_segment_pivot_python_rederivation(spark):
    con = _ddb(SF_SMALL)
    rows = con.sql("""
        SELECT c_mktsegment, year(o_orderdate),
               CAST(round(o_totalprice * 100, 0) AS BIGINT)
        FROM orders JOIN customer ON o_custkey = c_custkey""").fetchall()
    con.close()
    sums = defaultdict(int)
    segs = set()
    for seg, y, c in rows:
        sums[(seg, y)] += c
        segs.add(seg)
    got = segment_year_pivot(spark, SF_SMALL).collect()
    assert [r.c_mktsegment for r in got] == sorted(segs)
    for r in got:
        for y in _PIVOT_YEARS:
            want = sums.get((r.c_mktsegment, y))
            assert r[f"y{y}"] == want, (r.c_mktsegment, y)


def test_referential_integrity_python_rederivation(spark):
    con = _ddb(SF_SMALL)
    k = lambda q: {r[0] for r in con.sql(q).fetchall()}  # noqa: E731
    lo = k("SELECT l_orderkey FROM lineitem")
    lp = k("SELECT l_partkey FROM lineitem")
    ls = k("SELECT l_suppkey FROM lineitem")
    oo = k("SELECT o_orderkey FROM orders")
    oc = k("SELECT o_custkey FROM orders")
    n_li = con.sql("SELECT count(*) FROM lineitem "
                   "WHERE l_orderkey NOT IN (SELECT o_orderkey "
                   "FROM orders)").fetchone()[0]
    cc = k("SELECT c_custkey FROM customer")
    pp = k("SELECT p_partkey FROM part")
    ss = k("SELECT s_suppkey FROM supplier")
    con.close()
    expect = {
        "orphan_lineitems": n_li,
        "childless_orders": len(oo - lo),
        "orderless_customers": len(cc - oc),
        "unshipped_parts": len(pp - lp),
        "unshipped_suppliers": len(ss - ls),
    }
    got = {r.audit_check: r.n for r in
           referential_integrity_audit(spark, SF_SMALL).collect()}
    assert got == expect


def test_stream_funnel_ordered_resequences_across_batches(spark, tmp_path):
    """The event-time-timer funnel claim: batch 2 delivers events that
    belong BETWEEN batch 1's buffered events (bounded disorder inside
    the 1-hour delay) plus a far-future sentinel advancing the final
    watermark. Drained per-user stage flags must equal the BATCH
    stacked-min funnel (t1 = min view, t2 = min click > t1, t3 = min
    purchase > t2) over the time-sorted union at/below the final
    watermark — asserting both the resequencing property and the
    in-order-replay == stacked-min equivalence the operator relies
    on."""
    import os
    import time
    from collections import defaultdict

    from pyspark.sql import functions as F

    from threat_detection_nosql_spark.streaming.stream_queries import (
        funnel_ordered_agg,
        run_stream_to_table,
    )

    base = 1_700_000_000
    acts = ["view", "click", "purchase", "error", "view"]

    def ev(eid, minute):
        return (eid, base + minute * 60, eid % 3, acts[(eid * 7 + 3) % 5])

    f1 = [ev(i, m) for i, m in enumerate(range(0, 101, 2))]
    f2 = [ev(100 + i, m) for i, m in enumerate(range(41, 96, 2))]
    sentinel = (999, base + 200 * 60, 7, "error")
    f2.append(sentinel)
    src = tmp_path / "feed"
    os.makedirs(src)
    schema = "event_id long, sec long, user long, activity string"
    for name, rows in [("f1.parquet", f1), ("f2.parquet", f2)]:
        (spark.createDataFrame(rows, schema)
         .coalesce(1).write.parquet(str(src / name)))
        time.sleep(1.1)  # file-source processes in mtime order

    stream = (spark.readStream
              .schema(schema)
              .option("maxFilesPerTrigger", "1")
              .parquet(str(src / "*.parquet"))
              .withColumn("ts", F.timestamp_seconds(F.col("sec")))
              .withWatermark("ts", "1 hour")
              .select("user", "ts", "event_id", "activity"))
    table = run_stream_to_table(funnel_ordered_agg(stream), mode="update")
    got = {r.user: (r.r1, r.r2, r.r3) for r in
           (table.groupBy("user")
            .agg(F.max("reached1").alias("r1"),
                 F.max("reached2").alias("r2"),
                 F.max("reached3").alias("r3")).collect())}

    cutoff = sentinel[1] - 3600
    per_user = defaultdict(list)
    for eid, sec, u, a in f1 + f2:
        if sec <= cutoff:
            per_user[u].append((sec, a))
    expected = {sentinel[2]: (0, 0, 0)}  # only event above cutoff
    for u, seq in per_user.items():
        views = [s for s, a in seq if a == "view"]
        t1 = min(views) if views else None
        clicks = [s for s, a in seq
                  if a == "click" and t1 is not None and s > t1]
        t2 = min(clicks) if clicks else None
        purchases = [s for s, a in seq
                     if a == "purchase" and t2 is not None and s > t2]
        t3 = min(purchases) if purchases else None
        expected[u] = (int(t1 is not None), int(t2 is not None),
                       int(t3 is not None))
    assert got == expected
    # the fixture must exercise the full funnel, not a vacuous prefix
    assert any(v == (1, 1, 1) for v in expected.values()), expected


def _variant(uid):
    """hash_bucket(user_id, salt='exp') % 2 replayed in Python: 60-bit
    md5 prefix mod 10000 mod 2 (operators/sampling.py)."""
    import hashlib
    h = hashlib.md5(f"exp:{uid}".encode()).hexdigest()
    return (int(h[:15], 16) % 10000) % 2


def test_mrr_python_rederivation(spark):
    import numpy as np

    from threat_detection_nosql_spark.queries.metrics import (
        mrr_retrieval_eval,
    )

    con = duckdb.connect()
    rows = con.execute(
        f"SELECT vec_id, label, embedding FROM "
        f"'{SF_SMALL}/embeddings.parquet'").fetchall()
    con.close()
    ids = np.array([r[0] for r in rows])
    labs = {r[0]: r[1] for r in rows}
    vecs = {r[0]: np.asarray(r[2], dtype=np.float64) for r in rows}
    got = {r.q_id: r for r in mrr_retrieval_eval(spark, SF_SMALL).collect()}
    assert sorted(got) == sorted(i for i in ids if i < 8)
    for q in got:
        cands = []
        qv = vecs[q]
        for i in ids:
            if i == q:
                continue
            c = round(float(vecs[i] @ qv
                      / (np.linalg.norm(vecs[i]) * np.linalg.norm(qv))), 6)
            cands.append((-c, i, labs[i] == labs[q]))
        cands.sort()
        rank = next((k + 1 for k, (_, _, rel) in enumerate(cands) if rel),
                    None)
        r = got[q]
        assert r.first_rel_rank == rank, q
        if rank is None:
            assert r.reciprocal_rank is None
        else:
            assert abs(r.reciprocal_rank - 1.0 / rank) < 1e-6


def test_welch_python_rederivation(spark):
    from threat_detection_nosql_spark.queries.metrics import (
        welch_t_variant_test,
    )

    con = _ddb(SF_SMALL)
    rows = con.sql(
        "SELECT user_id, count(*) FROM events GROUP BY 1").fetchall()
    con.close()
    ys = defaultdict(list)
    for uid, y in rows:
        ys[_variant(uid)].append(y)
    import statistics
    na, nb = len(ys[0]), len(ys[1])
    ma, mb = sum(ys[0]) / na, sum(ys[1]) / nb
    va, vb = statistics.variance(ys[0]), statistics.variance(ys[1])
    se2a, se2b = va / na, vb / nb
    t = (ma - mb) / math.sqrt(se2a + se2b)
    dof = (se2a + se2b) ** 2 / (se2a ** 2 / (na - 1) + se2b ** 2 / (nb - 1))
    r = welch_t_variant_test(spark, SF_SMALL).collect()[0]
    assert (r.n_a, r.n_b) == (na, nb)
    assert abs(r.mean_a - ma) < 1e-6 and abs(r.mean_b - mb) < 1e-6
    assert abs(r.t_stat - t) < 1e-5
    assert abs(r.welch_dof - dof) < 1e-3
    assert min(na, nb) >= 5  # the split must not be vacuous


def test_did_python_rederivation(spark):
    from datetime import datetime

    from threat_detection_nosql_spark.queries.metrics import (
        diff_in_diff_purchases,
    )

    con = _ddb(SF_SMALL)
    rows = con.sql(
        "SELECT user_id, ts, event_type FROM events").fetchall()
    con.close()
    cut = datetime(2024, 1, 16)
    users = defaultdict(set)
    cells = defaultdict(int)
    for uid, ts, et in rows:
        v = _variant(uid)
        users[v].add(uid)
        if et == "purchase":
            cells[(v, int(ts >= cut))] += 1
    nu = {v: len(users[v]) for v in (0, 1)}
    m = {k: cells[k] / nu[k[0]] for k in
         [(0, 0), (0, 1), (1, 0), (1, 1)]}
    did = (m[(1, 1)] - m[(1, 0)]) - (m[(0, 1)] - m[(0, 0)])
    r = diff_in_diff_purchases(spark, SF_SMALL).collect()[0]
    assert (r.nu_a, r.nu_b) == (nu[0], nu[1])
    assert abs(r.pre_mean_a - m[(0, 0)]) < 1e-6
    assert abs(r.post_mean_a - m[(0, 1)]) < 1e-6
    assert abs(r.pre_mean_b - m[(1, 0)]) < 1e-6
    assert abs(r.post_mean_b - m[(1, 1)]) < 1e-6
    assert abs(r.did_effect - did) < 1e-6
    # both periods must carry purchases on both variants
    assert all(cells[k] > 0 for k in m), cells


def test_qte_python_rederivation(spark):
    from threat_detection_nosql_spark.queries.metrics import (
        variant_quantile_effects,
    )

    con = _ddb(SF_SMALL)
    rows = con.sql(
        "SELECT user_id, count(*) FROM events GROUP BY 1").fetchall()
    con.close()
    ys = defaultdict(list)
    for uid, y in rows:
        ys[_variant(uid)].append(y)

    def disc(xs, q):
        s = sorted(xs)
        return s[math.ceil(q * len(s)) - 1]

    got = {r.q_pct: r for r in
           variant_quantile_effects(spark, SF_SMALL).collect()}
    assert sorted(got) == [25, 50, 75, 90]
    for pct in (25, 50, 75, 90):
        qa = disc(ys[0], pct / 100)
        qb = disc(ys[1], pct / 100)
        r = got[pct]
        assert (r.q_a, r.q_b, r.qte) == (qa, qb, qb - qa), pct


def test_sprt_python_rederivation(spark):
    """Day-end cumulative LLR and decision freeze replayed in Python
    from raw events with the same integer literal table; also pins the
    SPRT invariants: state is 'continue' strictly before decision_day
    and frozen at the crossing sign from it onward."""
    from threat_detection_nosql_spark.queries.metrics import (
        _SPRT_HIT_PPB,
        _SPRT_LOWER_PPB,
        _SPRT_MISS_PPB,
        _SPRT_UPPER_PPB,
        sprt_daily_monitor,
    )

    assert _SPRT_HIT_PPB == round(1e9 * math.log(2.0))
    assert _SPRT_MISS_PPB == round(1e9 * math.log(0.8 / 0.9))
    con = _ddb(SF_SMALL)
    rows = con.sql("""
        SELECT user_id, CAST(ts AS DATE), event_type FROM events
        """).fetchall()
    con.close()
    daily = defaultdict(lambda: [0, 0])  # (variant, day) -> [trials, hits]
    for uid, day, et in rows:
        c = daily[(_variant(uid), day)]
        c[0] += 1
        c[1] += et == "purchase"
    got = defaultdict(list)
    for r in sprt_daily_monitor(spark, SF_SMALL).collect():
        got[r.variant].append(r)
    for v, rs in got.items():
        assert [r.day for r in rs] == sorted(r.day for r in rs)
        cum, decided = 0, None
        for r in rs:
            trials, hits = daily[(v, r.day)]
            assert (r.trials, r.hits) == (trials, hits), (v, r.day)
            cum += hits * _SPRT_HIT_PPB + (trials - hits) * _SPRT_MISS_PPB
            assert r.cum_llr_ppb == cum, (v, r.day)
            if decided is None:
                if cum >= _SPRT_UPPER_PPB:
                    decided = ("h1", r.day)
                elif cum <= _SPRT_LOWER_PPB:
                    decided = ("h0", r.day)
            if decided is None:
                assert r.state == "continue"
            else:
                # decision_day is a per-variant attribute (same value
                # on every row of the variant, incl. pre-crossing days)
                assert r.decision_day == decided[1]
                exp = decided[0] if r.day >= decided[1] else "continue"
                assert r.state == exp, (v, r.day)
    # the purchase rate sits near p1, so the monitor must DECIDE h1
    assert all(rs[-1].state == "h1" for rs in got.values())


def test_seasonal_naive_python_rederivation(spark):
    from threat_detection_nosql_spark.queries.temporal import (
        seasonal_naive_backtest,
    )

    con = _ddb(SF_SMALL)
    rows = con.sql(
        "SELECT CAST(ts AS DATE), value FROM events").fetchall()
    con.close()
    daily = defaultdict(int)
    for day, v in rows:
        daily[day] += round(v * 100)
    mx = max(daily)
    got = seasonal_naive_backtest(spark, SF_SMALL).collect()
    expect = []
    from datetime import timedelta
    for day in sorted(daily):
        prev = day - timedelta(days=7)
        if (mx - day).days < 14 and prev in daily:
            a, f = daily[day], daily[prev]
            expect.append((day, a, f, abs(a - f),
                           (1_000_000 * abs(a - f)) // a))
    assert [(r.day, r.actual_cents, r.forecast_cents, r.abs_err_cents,
             r.ape_ppm) for r in got] == expect
    assert len(expect) == 14  # dense 30-day span -> full horizon


def test_holt_python_rederivation(spark):
    """Level/trend recurrence replayed in Python over the exact daily
    cents (compared pre-rounding with an ulp-scale tolerance — the
    emitted columns round via F.round, which is half-away like the
    oracle, NOT Python's half-even round())."""
    from threat_detection_nosql_spark.queries.temporal import (
        holt_linear_daily,
    )

    con = _ddb(SF_SMALL)
    rows = con.sql("""
        SELECT CAST(ts AS DATE) AS day,
               CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT)
        FROM events GROUP BY 1 ORDER BY 1""").fetchall()
    con.close()
    got = holt_linear_daily(spark, SF_SMALL).collect()
    assert [r.day for r in got] == [d for d, _ in rows]
    l = b = None
    for r, (day, cents) in zip(got, rows):
        y = float(cents)
        if l is None:
            fc = None
            l, b = y, 0.0
        else:
            fc = l + b
            l_new = 0.5 * y + 0.5 * (l + b)
            b = 0.3 * (l_new - l) + 0.7 * b
            l = l_new
        assert r.actual_cents == cents
        assert abs(r.level_r6 - l) < 1e-5
        assert abs(r.trend_r6 - b) < 1e-5
        if fc is None:
            assert r.forecast_r6 is None
        else:
            assert abs(r.forecast_r6 - fc) < 1e-5
    # the trend must actually move (fixture not degenerate)
    assert any(abs(r.trend_r6) > 1.0 for r in got)


def test_variant_stats_python_rederivation(spark):
    import json as _json

    from threat_detection_nosql_spark.queries.relational import (
        props_variant_stats,
    )

    con = _ddb(SF_SMALL)
    rows = con.sql("SELECT event_type, props FROM events").fetchall()
    con.close()
    agg = defaultdict(lambda: [0, []])
    for et, props in rows:
        agg[et][0] += 1
        try:
            k = _json.loads(props).get("k")
        except Exception:
            k = None
        if isinstance(k, int):
            agg[et][1].append(k)
    got = {r.event_type: r for r in
           props_variant_stats(spark, SF_SMALL).collect()}
    assert set(got) == set(agg)
    for et, (n, ks) in agg.items():
        r = got[et]
        assert (r.n, r.n_with_k) == (n, len(ks))
        assert (r.k_min, r.k_max, r.k_sum) == (min(ks), max(ks), sum(ks))


def test_funnel_gap_greedy_anchor_semantics(spark):
    """The conversion-window contract: the gap anchors at the ACCEPTED
    previous stage. User 1: click lands 25h after the first view but
    within 24h of a LATER view — it must NOT convert (greedy, not
    best-match). User 2: click within the window converts; purchase
    outside the window from the click does not."""
    from pyspark.sql import functions as F

    from threat_detection_nosql_spark.queries.temporal import (
        funnel_stage_times,
    )

    H = 3600
    rows = [
        # user 1: views at h0 and h10; click at h25 (25h after first
        # view, 15h after second) -> greedy t1=h0, click out of window
        (1, 0 * H, "view"), (1, 10 * H, "view"), (1, 25 * H, "click"),
        # user 2: view h0, click h23 (in window), purchase h23+25h
        # (out of window from t2)
        (2, 0 * H, "view"), (2, 23 * H, "click"),
        (2, 48 * H, "purchase"),
        # user 3: full funnel inside the windows
        (3, 0 * H, "view"), (3, 1 * H, "click"), (3, 2 * H, "purchase"),
    ]
    log = (spark.createDataFrame(rows, "user long, sec long, "
                                 "activity string")
           .withColumn("ts", F.timestamp_seconds(F.col("sec"))))
    out = {r.user: (r.t1 is not None, r.t2 is not None, r.t3 is not None)
           for r in funnel_stage_times(
               log, ["view", "click", "purchase"],
               max_gap_us=24 * H * 1_000_000).collect()}
    assert out == {1: (True, False, False),
                   2: (True, True, False),
                   3: (True, True, True)}


def test_funnel_24h_binds_vs_unbounded(spark):
    from threat_detection_nosql_spark.queries.temporal import (
        funnel_conversion,
        funnel_conversion_24h,
    )

    b = funnel_conversion_24h(spark, SF_SMALL).collect()[0]
    u = funnel_conversion(spark, SF_SMALL).collect()[0]
    assert b.viewed == u.viewed
    assert b.clicked_24h <= u.clicked_after_view
    assert b.purchased_24h <= u.purchased_after_click
    # the window must actually bind on this data (not vacuous)
    assert b.clicked_24h < u.clicked_after_view
    assert 0 < b.purchased_24h


def test_linear_attribution_conservation_and_rederivation(spark):
    """Credited cents must sum EXACTLY to the revenue of attributed
    purchases (the integer-remainder rule conserves money), and the
    per-touch totals must match a Python replay."""
    from threat_detection_nosql_spark.queries.temporal import (
        _ATTR_WINDOW_US,
        linear_touch_attribution,
    )

    con = _ddb(SF_SMALL)
    rows = con.sql("""
        SELECT event_id, user_id, epoch_us(ts), event_type, value
        FROM events WHERE event_type IN ('purchase', 'view', 'click')
        """).fetchall()
    con.close()
    touches = defaultdict(list)
    purchases = []
    for eid, uid, us, et, v in rows:
        if et == "purchase":
            purchases.append((eid, uid, us, round(v * 100)))
        else:
            touches[uid].append((us, eid, et))
    credit = Counter()
    ntouch = Counter()
    attributed_cents = 0
    for pid, uid, pus, cents in purchases:
        win = [(us, eid, et) for us, eid, et in touches[uid]
               if us < pus and pus - us <= _ATTR_WINDOW_US]
        if not win:
            continue
        attributed_cents += cents
        n = len(win)
        base = cents // n
        last = max(win)  # (us, eid) order = the remainder recipient
        for us, eid, et in win:
            ntouch[et] += 1
            credit[et] += base + (cents - n * base
                                  if (us, eid) == last[:2] else 0)
    got = {r.touch: r for r in
           linear_touch_attribution(spark, SF_SMALL).collect()}
    assert set(got) == set(credit)
    for et in credit:
        assert got[et].n_touches == ntouch[et], et
        assert got[et].credited_cents == credit[et], et
    assert sum(r.credited_cents for r in got.values()) == attributed_cents
    assert attributed_cents > 0


def test_session_entry_exit_python_rederivation(spark):
    from threat_detection_nosql_spark.queries.temporal import (
        _SESSION_GAP_US,
        session_entry_exit_report,
    )

    con = _ddb(SF_SMALL)
    rows = con.sql("""
        SELECT user_id, epoch_us(ts), event_id, event_type
        FROM events ORDER BY user_id, epoch_us(ts), event_id
        """).fetchall()
    con.close()
    entries = Counter()
    exits = Counter()
    bounces = Counter()
    by_user = defaultdict(list)
    for uid, us, eid, et in rows:
        by_user[uid].append((us, eid, et))
    for uid, evs in by_user.items():
        sessions = []
        prev_us = None
        for us, eid, et in evs:  # already (us, eid)-sorted
            if prev_us is None or us - prev_us > _SESSION_GAP_US:
                sessions.append([])
            sessions[-1].append(et)
            prev_us = us
        for s in sessions:
            entries[s[0]] += 1
            exits[s[-1]] += 1
            if len(s) == 1:
                bounces[s[0]] += 1
    got = {r.activity: r for r in
           session_entry_exit_report(spark, SF_SMALL).collect()}
    assert set(got) == set(entries) | set(exits)
    total_sessions = sum(entries.values())
    for et, r in got.items():
        assert r.n_entries == entries[et], et
        assert r.n_exits == exits[et], et
        assert r.n_bounces == bounces[et], et
    assert sum(r.n_entries for r in got.values()) == total_sessions
    assert sum(r.n_exits for r in got.values()) == total_sessions


def test_retention_waterfall_conservation(spark):
    """end = start + new + expansion − contraction − churned on every
    week, start/end chain across consecutive weeks, and the fixture
    exercises every movement class."""
    from datetime import timedelta

    from threat_detection_nosql_spark.queries.temporal import (
        revenue_retention_waterfall,
    )

    rows = revenue_retention_waterfall(spark, SF_SMALL).collect()
    assert len(rows) >= 4
    for r in rows:
        assert (r.end_cents == r.start_cents + r.new_cents
                + r.expansion_cents - r.contraction_cents
                - r.churned_cents), r
    by_week = {r.week: r for r in rows}
    for r in rows:
        nxt = by_week.get(r.week + timedelta(days=7))
        if nxt is not None and nxt.churned_cents + nxt.start_cents > 0:
            # start of week w+1 == end of week w (same weekly frame)
            assert nxt.start_cents == r.end_cents, (r.week, nxt.week)
    assert any(r.new_cents > 0 for r in rows)
    assert any(r.expansion_cents > 0 for r in rows)
    assert any(r.contraction_cents > 0 for r in rows)
    assert any(r.churned_cents > 0 for r in rows)


def test_fulfillment_percentiles_python_rederivation(spark):
    from threat_detection_nosql_spark.queries.relational import (
        fulfillment_cycle_percentiles,
    )

    con = _ddb(SF_SMALL)
    rows = con.sql("""
        SELECT o_orderpriority,
               date_diff('day', o_orderdate, l_shipdate)
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        """).fetchall()
    con.close()
    by_prio = defaultdict(list)
    for prio, d in rows:
        by_prio[prio].append(d)

    def disc(xs, q):
        s = sorted(xs)
        return s[math.ceil(q * len(s)) - 1]

    got = {r.o_orderpriority: r for r in
           fulfillment_cycle_percentiles(spark, SF_SMALL).collect()}
    assert set(got) == set(by_prio)
    for prio, ds in by_prio.items():
        r = got[prio]
        n_late = sum(1 for d in ds if d > 90)
        assert r.n == len(ds)
        assert r.p50_ship_days == disc(ds, 0.5), prio
        assert r.p90_ship_days == disc(ds, 0.9), prio
        assert r.n_late == n_late
        assert r.late_ppm == (1_000_000 * n_late) // len(ds)
        assert r.p50_ship_days <= r.p90_ship_days
