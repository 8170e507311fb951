"""Property-based cross-validation for the round-7 statistics wave:
Mann-Whitney U against brute-force pair counting (a DIFFERENT
derivation than the rank algebra the query uses), Kaplan-Meier
against the textbook product-limit recursion on generated
convert/censor populations, and the isotonic minimax closed form
against the classical stack-PAV algorithm run in exact rationals."""

from __future__ import annotations

import hashlib
from fractions import Fraction

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from tests.conftest import SF_DIR


def _variant(uid: int) -> int:
    h = hashlib.md5(f"exp:{uid}".encode()).hexdigest()
    return int(h[:15], 16) % 10000 % 2


def _write_events(spark, tmp_path, rows):
    """rows: (event_id, sec, user_id, event_type, value)."""
    (spark.createDataFrame(
        rows, "event_id long, sec long, user_id long, "
              "event_type string, value double")
     .select("event_id", F.timestamp_seconds("sec").alias("ts"),
             "user_id", "event_type", "value")
     .coalesce(1).write.mode("overwrite")
     .parquet(str(tmp_path / "events.parquet")))
    return str(tmp_path)


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.too_slow,
                                 HealthCheck.function_scoped_fixture])
@given(counts=st.lists(st.integers(1, 8), min_size=4, max_size=20))
def test_mann_whitney_equals_pair_counting(spark, tmp_path, counts):
    """U(B) must equal #{(a,b): y_b > y_a} + 0.5*#{ties} — the
    definition, computed with no ranks at all."""
    from threat_detection_nosql_spark.queries.metrics import (
        mann_whitney_variant_test,
    )
    ys = {uid: c for uid, c in enumerate(counts)}
    a = [y for u, y in ys.items() if _variant(u) == 0]
    b = [y for u, y in ys.items() if _variant(u) == 1]
    if not a or not b or len(set(ys.values())) == 1:
        return  # degenerate draw: empty arm or zero variance
    rows, eid = [], 0
    for u, c in ys.items():
        for i in range(c):
            rows.append((eid, 1000 + i, u, "click", 0.0))
            eid += 1
    sf = _write_events(spark, tmp_path, rows)
    u_brute = sum((1.0 if yb > ya else 0.5 if yb == ya else 0.0)
                  for ya in a for yb in b)
    out = mann_whitney_variant_test(spark, sf).collect()[0]
    assert (out.n_a, out.n_b) == (len(a), len(b))
    assert abs(out.u_stat - u_brute) < 1e-6
    assert abs(out.rank_biserial
               - (1 - 2 * u_brute / (len(a) * len(b)))) < 1e-6


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.too_slow,
                                 HealthCheck.function_scoped_fixture])
@given(subjects=st.lists(
    st.tuples(st.integers(0, 12), st.booleans()),
    min_size=1, max_size=25))
def test_kaplan_meier_matches_product_limit(spark, tmp_path, subjects):
    """Generated convert/censor populations, including simultaneous
    event+censor times, all-converted and all-censored draws."""
    from threat_detection_nosql_spark.queries.temporal import (
        kaplan_meier_conversion,
    )
    rows, eid = [], 0
    for uid, (dur, conv) in enumerate(subjects):
        rows.append((eid, 1_000_000, uid, "click", 0.0))
        eid += 1
        kind = "purchase" if conv else "click"
        val = 200.0 if conv else 0.0
        rows.append((eid, 1_000_000 + dur * 3600, uid, kind, val))
        eid += 1
    sf = _write_events(spark, tmp_path, rows)
    # textbook product-limit
    from collections import Counter
    d = Counter(t for t, c in subjects if c)
    cens = Counter(t for t, c in subjects if not c)
    n_risk, s, expect = len(subjects), 1.0, {}
    for t in sorted(set(d) | set(cens)):
        if d[t] > 0:
            s *= 1.0 - d[t] / n_risk
        expect[t] = (n_risk, d[t], cens[t], s)
        n_risk -= d[t] + cens[t]
    got = kaplan_meier_conversion(spark, sf).collect()
    assert len(got) == len(expect)
    for r in got:
        en, ed, ec, es = expect[r.t_hours]
        assert (r.n_risk, r.n_events, r.n_censored) == (en, ed, ec)
        assert abs(r.survival - es) < 1e-6


def _stack_pav(ns, ps):
    """Classical pool-adjacent-violators in exact rationals."""
    blocks: list[list] = []  # [n, pos]
    for n, p in zip(ns, ps):
        blocks.append([n, p])
        while (len(blocks) > 1
               and Fraction(blocks[-2][1], blocks[-2][0])
               >= Fraction(blocks[-1][1], blocks[-1][0])):
            n2, p2 = blocks.pop()
            blocks[-1][0] += n2
            blocks[-1][1] += p2
    # blocks partition the bins in order; every original bin inside a
    # pooled block gets the block's pooled rate
    expanded, i = [], 0
    for n_blk, p_blk in blocks:
        acc, rate = 0, Fraction(p_blk, n_blk)
        while acc < n_blk:
            acc += ns[i]
            expanded.append(rate)
            i += 1
        assert acc == n_blk
    return expanded


def test_isotonic_minimax_equals_stack_pav(spark):
    """The query's minimax closed form fit(i) = max_j min_k pooled
    must equal the classical stack algorithm, run in exact
    rationals on the query's own emitted (n, npos) bins."""
    from threat_detection_nosql_spark.queries.metrics import (
        isotonic_calibration,
    )
    rows = sorted(isotonic_calibration(spark, SF_DIR).collect(),
                  key=lambda r: r.bin)
    ns = [r.n for r in rows]
    ps = [r.npos for r in rows]
    want = _stack_pav(ns, ps)
    assert len(want) == len(rows)
    for r, rate in zip(rows, want):
        # emission rounds via floor(x*1e6+0.5)/1e6
        import math
        expect = math.floor(float(rate) * 1e6 + 0.5) / 1e6
        assert abs(r.iso_rate - expect) <= 1e-6, (r.bin, r.iso_rate,
                                                  float(rate))
    # and the fit is a genuine pooling somewhere (not the raw rates)
    assert any(abs(r.iso_rate - r.raw_rate) > 1e-9 for r in rows)
