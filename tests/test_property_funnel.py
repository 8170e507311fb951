"""Property-based cross-validation of round-3 operators: the stacked-
window funnel must agree with a brute-force reference on arbitrary
inputs, and hash-mod mixture sampling must be partition-invariant."""

from __future__ import annotations

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from threat_detection_nosql_spark.queries.temporal import funnel_stage_times

_key = st.sampled_from(["u1", "u2", "u3"])
_sec = st.integers(min_value=0, max_value=3600)
_act = st.sampled_from(["view", "click", "purchase", "other"])


def _brute_funnel(rows, stages):
    out = {}
    by_user: dict[str, list] = {}
    for u, s, a in rows:
        by_user.setdefault(u, []).append((s, a))
    for u, evs in by_user.items():
        times, prev = [], None
        for stage in stages:
            cand = [s for s, a in evs if a == stage
                    and (prev is None or s > prev)]
            cur = min(cand) if cand else None
            times.append(cur)
            if cur is None:
                # later stages can never be reached (ts > NULL is false)
                times.extend([None] * (len(stages) - len(times)))
                break
            prev = cur
        out[u] = tuple(times)
    return out


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(rows=st.lists(st.tuples(_key, _sec, _act), min_size=1, max_size=40))
def test_funnel_stage_times_match_bruteforce(spark, rows):
    stages = ["view", "click", "purchase"]
    pdf = pd.DataFrame({
        "user": [u for u, _, _ in rows],
        "ts": [pd.Timestamp("2024-01-01") + pd.Timedelta(seconds=s)
               for _, s, _ in rows],
        "activity": [a for _, _, a in rows]})
    got = {r["user"]: tuple(
        None if r[f"t{i}"] is None else pd.Timestamp(r[f"t{i}"])
        for i in range(1, 4))
        for r in funnel_stage_times(
            spark.createDataFrame(pdf), stages).collect()}
    want = {u: tuple(None if s is None
                     else pd.Timestamp("2024-01-01")
                     + pd.Timedelta(seconds=s) for s in ts)
            for u, ts in _brute_funnel(rows, stages).items()}
    assert got == want


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(seed=st.integers(min_value=0, max_value=10_000),
       parts=st.integers(min_value=1, max_value=7))
def test_mixture_sample_is_partition_invariant(spark, seed, parts):
    """The hash-mod keep decision must be a pure function of the key —
    identical row set under any repartitioning (the property engine
    rand()-sampling does NOT have)."""
    from threat_detection_nosql_spark.operators import sampling

    rows = [(i, f"s{(i * 7 + seed) % 3}", float(i % 11) + 1)
            for i in range(seed % 50 + 20)]
    df = spark.createDataFrame(rows, "doc_id long, source string, m double")
    rates = sampling.temperature_mixture_rates(df, "source", F.col("m"))
    base = {r["doc_id"] for r in sampling.mixture_hash_sample(
        df, "doc_id", "source", rates).collect()}
    shuffled = {r["doc_id"] for r in sampling.mixture_hash_sample(
        df.repartition(parts, "doc_id"), "doc_id", "source",
        rates).collect()}
    assert base == shuffled


def _brute_funnel_gap(rows, stages, gap_s):
    out = {}
    by_user: dict[str, list] = {}
    for u, s, a in rows:
        by_user.setdefault(u, []).append((s, a))
    for u, evs in by_user.items():
        times, prev = [], None
        for j, stage in enumerate(stages):
            cand = [s for s, a in evs if a == stage
                    and (prev is None
                         or (s > prev and s - prev <= gap_s))]
            cur = min(cand) if cand else None
            times.append(cur)
            if cur is None:
                times.extend([None] * (len(stages) - len(times)))
                break
            prev = cur
        out[u] = tuple(times)
    return out


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(rows=st.lists(st.tuples(_key, _sec, _act), min_size=1, max_size=40),
       gap_s=st.integers(min_value=1, max_value=900))
def test_funnel_gap_matches_bruteforce(spark, rows, gap_s):
    """max_gap_us agrees with the greedy brute force on arbitrary
    inputs and arbitrary window lengths — including windows short
    enough to reject most chains."""
    stages = ["view", "click", "purchase"]
    pdf = pd.DataFrame({
        "user": [u for u, _, _ in rows],
        "ts": [pd.Timestamp("2024-01-01") + pd.Timedelta(seconds=s)
               for _, s, _ in rows],
        "activity": [a for _, _, a in rows]})
    got = {r["user"]: tuple(
        None if r[f"t{i}"] is None else pd.Timestamp(r[f"t{i}"])
        for i in range(1, 4))
        for r in funnel_stage_times(
            spark.createDataFrame(pdf), stages,
            max_gap_us=gap_s * 1_000_000).collect()}
    want = {u: tuple(None if s is None
                     else pd.Timestamp("2024-01-01")
                     + pd.Timedelta(seconds=s) for s in ts)
            for u, ts in _brute_funnel_gap(rows, stages, gap_s).items()}
    assert got == want
