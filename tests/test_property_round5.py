"""Property-based cross-validation for the late round-5 operators:
the fixed-round k-core peel against a pure-python simulation of the
same synchronized rounds, and the closed-form EWMA expression against
the naive recursion it replaces."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_edge = st.tuples(st.integers(0, 14), st.integers(0, 14))


def _simulate_kcore(edges, k, rounds):
    """Reference peel: the same synchronized rounds as kcore_fixed."""
    nbrs: dict[int, list[int]] = {}
    for u, v in edges:
        nbrs.setdefault(u, []).append(v)
        nbrs.setdefault(v, []).append(u)
    alive = set(nbrs)
    for _ in range(rounds):
        deg = {n: sum(1 for m in nbrs[n] if m in alive)
               for n in alive}
        alive = {n for n in alive if deg[n] >= k}
    return {n: sum(1 for m in nbrs[n] if m in alive)
            for n in alive
            if sum(1 for m in nbrs[n] if m in alive) >= k}


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(edges=st.lists(_edge, min_size=1, max_size=30),
       k=st.integers(2, 3))
def test_kcore_matches_simulated_peel(spark, edges, k):
    from threat_detection_nosql_spark.operators.graph import kcore_fixed

    edges = [e for e in edges if e[0] != e[1]]
    # the operator peels the symmetrized DISTINCT edge multiset;
    # normalize the python reference the same way
    uniq = sorted({(min(e), max(e)) for e in edges})
    if not uniq:
        return
    df = spark.createDataFrame(uniq, "src long, dst long")
    got = {r.node: r.core_degree
           for r in kcore_fixed(df, k=k, n_rounds=4).collect()}
    want = _simulate_kcore(uniq, k, rounds=4)
    assert got == want


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(xs=st.lists(st.integers(1, 50), min_size=1, max_size=20))
def test_ewma_closed_form_equals_recursion(spark, xs):
    """The windowed closed form sₜ = (1-α)ᵗ·Σ wₖxₖ(1-α)⁻ᵏ must equal
    the textbook recursion s₁ = x₁, sₜ = α·xₜ + (1-α)·sₜ₋₁."""
    import datetime as dt

    import pyarrow as pa
    import pyarrow.parquet as pq

    from threat_detection_nosql_spark.queries.temporal import (
        _EWMA_ALPHA, user_daily_ewma)

    import tempfile
    with tempfile.TemporaryDirectory() as d:
        rows = []
        eid = 0
        for day_idx, n in enumerate(xs):
            for j in range(n):
                rows.append((eid,
                             dt.datetime(2024, 1, 1, 6)
                             + dt.timedelta(days=day_idx,
                                            seconds=j), 1))
                eid += 1
        pq.write_table(pa.table({
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array(["click"] * len(rows)),
            "value": pa.array([1.0] * len(rows), pa.float64()),
            "props": pa.array(['{"k": 1}'] * len(rows)),
        }), f"{d}/events.parquet")

        got = [r["ewma"] for r in user_daily_ewma(spark, d)
               .orderBy("day").collect()]
        s = None
        want = []
        for x in xs:
            s = float(x) if s is None else (_EWMA_ALPHA * x
                                            + (1 - _EWMA_ALPHA) * s)
            want.append(s)
        for g, w in zip(got, want):
            assert abs(g - w) < 1e-4, (got, want)


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(edges=st.lists(_edge, min_size=1, max_size=30))
def test_lpa_matches_simulated_sync_rounds(spark, edges):
    """label_propagation_fixed must equal a pure-python simulation of
    the same synchronous rounds (modal neighbor label, min tie-break)
    on arbitrary graphs."""
    from collections import Counter

    from threat_detection_nosql_spark.operators.graph import (
        label_propagation_fixed)

    edges = [e for e in edges if e[0] != e[1]]
    uniq = sorted({(min(e), max(e)) for e in edges})
    if not uniq:
        return
    nbrs: dict[int, list[int]] = {}
    for u, v in uniq:
        nbrs.setdefault(u, []).append(v)
        nbrs.setdefault(v, []).append(u)
    labels = {n: n for n in nbrs}
    for _ in range(3):
        nxt = {}
        for n in nbrs:
            counts = Counter(labels[m] for m in nbrs[n])
            top = max(counts.values())
            nxt[n] = min(l for l, c in counts.items() if c == top)
        labels = nxt

    df = spark.createDataFrame(uniq, "src long, dst long")
    got = {r.node: r.community
           for r in label_propagation_fixed(df, n_iters=3).collect()}
    assert got == labels
