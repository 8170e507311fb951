"""Property-based cross-validation: the as-of join operator must agree
with pandas merge_asof (backward, allow_exact_matches) on arbitrary
inputs, and the range-pair counter with a brute-force O(n²) count."""

from __future__ import annotations

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from threat_detection_nosql_spark.operators.temporal_joins import (
    asof_backward_join,
    range_pair_counts,
)

# timestamps as second offsets within a day; small key space forces
# collisions (same key, duplicate left timestamps, empty right sides)
_key = st.sampled_from(["k1", "k2", "k3"])
_sec = st.integers(min_value=0, max_value=86_399)


def _to_ts(sec):
    return pd.Timestamp("2024-01-01") + pd.Timedelta(seconds=sec)


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(left=st.lists(st.tuples(_key, _sec), min_size=1, max_size=25),
       right=st.lists(st.tuples(_key, _sec), min_size=0, max_size=25))
def test_asof_matches_pandas_merge_asof(spark, left, right):
    lpdf = pd.DataFrame(
        {"user": [k for k, _ in left],
         "ts": [_to_ts(s) for _, s in left],
         "rid": range(len(left))})
    # operator contract: right unique per (key, ts)
    rpdf = (pd.DataFrame(
        {"user": pd.Series([k for k, _ in right], dtype=object),
         "ts": pd.Series([_to_ts(s) for _, s in right],
                         dtype="datetime64[ns]")})
        .drop_duplicates())
    rpdf["payload"] = rpdf["ts"]

    expected = pd.merge_asof(
        lpdf.sort_values("ts", kind="stable"),
        rpdf.sort_values("ts", kind="stable"),
        on="ts", by="user", direction="backward",
        allow_exact_matches=True)
    exp = {int(r.rid): (None if pd.isnull(r.payload) else r.payload)
           for r in expected.itertuples()}

    ldf = spark.createDataFrame(lpdf)
    if len(rpdf):
        rdf = spark.createDataFrame(rpdf)
    else:
        rdf = spark.createDataFrame([], "user string, ts timestamp, "
                                        "payload timestamp")
    out = asof_backward_join(ldf, rdf, key="user", ts="ts",
                             payload="payload")
    got = {r["rid"]: (None if r["asof_payload"] is None
                      else pd.Timestamp(r["asof_payload"]))
           for r in out.collect()}
    assert got == exp


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(rows=st.lists(st.tuples(_key, _sec), min_size=1, max_size=30),
       band=st.integers(min_value=1, max_value=7200))
def test_range_pairs_match_bruteforce(spark, rows, band):
    pdf = pd.DataFrame({"user": [k for k, _ in rows],
                        "sec": [s for _, s in rows]})
    expected: dict[str, int] = {}
    for k, grp in pdf.groupby("user"):
        secs = list(grp["sec"])
        n = sum(1 for a in secs for b in secs if a < b <= a + band)
        if n:
            expected[k] = n
    df = (spark.createDataFrame(pdf)
          .select("user", (F.lit("2024-01-01 00:00:00").cast("timestamp")
                           + F.make_interval(secs=F.col("sec")))
                  .alias("ts")))
    got = {r["user"]: r["n_pairs"]
           for r in range_pair_counts(df, "user", "ts", band).collect()}
    assert got == expected


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(left=st.lists(st.tuples(_key, _sec), min_size=1, max_size=25),
       right=st.lists(st.tuples(_key, _sec), min_size=0, max_size=25))
def test_asof_forward_matches_pandas_merge_asof(spark, left, right):
    from threat_detection_nosql_spark.operators.temporal_joins import (
        asof_forward_join,
    )
    lpdf = pd.DataFrame(
        {"user": [k for k, _ in left],
         "ts": [_to_ts(s) for _, s in left],
         "rid": range(len(left))})
    rpdf = (pd.DataFrame(
        {"user": pd.Series([k for k, _ in right], dtype=object),
         "ts": pd.Series([_to_ts(s) for _, s in right],
                         dtype="datetime64[ns]")})
        .drop_duplicates())
    rpdf["payload"] = rpdf["ts"]

    expected = pd.merge_asof(
        lpdf.sort_values("ts", kind="stable"),
        rpdf.sort_values("ts", kind="stable"),
        on="ts", by="user", direction="forward",
        allow_exact_matches=True)
    exp = {int(r.rid): (None if pd.isnull(r.payload) else r.payload)
           for r in expected.itertuples()}

    ldf = spark.createDataFrame(lpdf)
    if len(rpdf):
        rdf = spark.createDataFrame(rpdf)
    else:
        rdf = spark.createDataFrame([], "user string, ts timestamp, "
                                        "payload timestamp")
    out = asof_forward_join(ldf, rdf, key="user", ts="ts",
                            payload="payload")
    got = {r["rid"]: (None if r["asof_payload"] is None
                      else pd.Timestamp(r["asof_payload"]))
           for r in out.collect()}
    assert got == exp
