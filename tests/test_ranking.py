"""operators/ranking.py — distributed exact rank / ntile / cumsum.

The helpers must be bit-equal to their single-partition window forms,
INCLUDING when chained (round-10 found chained calls corrupting ranks
when the twice-referenced range exchange materialized twice with
different sampled boundaries — fixed by pinning the keyed frame)."""
from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from tests.conftest import SF_SMALL
from threat_detection_nosql_spark.operators.ranking import (
    with_global_cumsum,
    with_global_ntile,
    with_global_rank,
)
from threat_detection_nosql_spark.sources.readers import load_table


def _orders(spark):
    return (load_table(spark, SF_SMALL, "orders")
            .select("o_orderkey", "o_custkey",
                    F.round(F.col("o_totalprice") * 100, 0).cast("long")
                    .alias("cents")))


import pytest

# 0 forces the distributed range-partitioned path on the tiny test
# frame; the default gate takes the plain-window path — both must be
# bit-equal to the single-partition window form.
BOTH_PATHS = pytest.mark.parametrize("thresh", [0, 1_000_000])


@BOTH_PATHS
def test_global_rank_matches_window(spark, thresh):
    df = _orders(spark)
    got = {r["o_orderkey"]: r["rk"] for r in with_global_rank(
        df, ["cents", "o_orderkey"], small_threshold=thresh).collect()}
    want = {r["o_orderkey"]: r["rk"] for r in df.withColumn(
        "rk", F.row_number().over(
            W.orderBy("cents", "o_orderkey"))).collect()}
    assert got == want


@BOTH_PATHS
def test_global_rank_desc_and_total(spark, thresh):
    df = _orders(spark)
    n = df.count()
    rows = with_global_rank(df, [F.desc("cents"), F.asc("o_orderkey")],
                            total_col="n",
                            small_threshold=thresh).collect()
    assert all(r["n"] == n for r in rows)
    want = {r["o_orderkey"]: r["rk"] for r in df.withColumn(
        "rk", F.row_number().over(
            W.orderBy(F.desc("cents"), F.asc("o_orderkey")))).collect()}
    assert {r["o_orderkey"]: r["rk"] for r in rows} == want


def test_gated_and_distributed_schemas_identical(spark):
    """The size gate must be invisible to consumers: identical column
    names AND types on both paths (long rank, long total). Nullability
    flags may differ (lit(n) vs window sum) — values never do."""
    def shape(df):
        return [(f.name, f.dataType) for f in df.schema.fields]

    df = _orders(spark)
    a = with_global_rank(df, ["cents", "o_orderkey"], total_col="n",
                         small_threshold=0)
    b = with_global_rank(df, ["cents", "o_orderkey"], total_col="n",
                         small_threshold=1_000_000)
    assert shape(a) == shape(b)
    ca = with_global_cumsum(df, ["cents", "o_orderkey"], ["cents"],
                            small_threshold=0)
    cb = with_global_cumsum(df, ["cents", "o_orderkey"], ["cents"],
                            small_threshold=1_000_000)
    assert shape(ca) == shape(cb)


@BOTH_PATHS
def test_global_ntile_matches_window_all_bucket_counts(spark, thresh):
    df = _orders(spark)
    for b in (3, 7, 10):
        got = {r["o_orderkey"]: r["bucket"] for r in with_global_ntile(
            df, ["cents", "o_orderkey"], b,
            small_threshold=thresh).collect()}
        want = {r["o_orderkey"]: r["bucket"] for r in df.withColumn(
            "bucket", F.ntile(b).over(
                W.orderBy("cents", "o_orderkey"))).collect()}
        assert got == want, f"ntile({b})"


def test_global_ntile_more_buckets_than_rows(spark):
    df = _orders(spark).limit(5)
    got = sorted(r["bucket"] for r in with_global_ntile(
        df, ["cents", "o_orderkey"], 10).collect())
    assert got == [1, 2, 3, 4, 5]  # ntile = rank when N < B


def test_chained_ntiles_stay_exact(spark):
    """The round-10 regression: a second helper call on the first's
    output must still match two independent window ntiles."""
    df = _orders(spark)
    c = with_global_ntile(df, ["cents", "o_orderkey"], 3,
                          bucket_col="a")
    c = with_global_ntile(c, [F.desc("cents"), F.asc("o_orderkey")], 4,
                          bucket_col="b")
    got = {r["o_orderkey"]: (r["a"], r["b"]) for r in c.collect()}
    w2 = (df.withColumn("a", F.ntile(3).over(
              W.orderBy("cents", "o_orderkey")))
          .withColumn("b", F.ntile(4).over(
              W.orderBy(F.desc("cents"), F.asc("o_orderkey")))))
    want = {r["o_orderkey"]: (r["a"], r["b"]) for r in w2.collect()}
    assert got == want
    assert max(v[0] for v in got.values()) == 3
    assert max(v[1] for v in got.values()) == 4


@BOTH_PATHS
def test_global_cumsum_matches_window_multi_col(spark, thresh):
    df = _orders(spark).withColumn("one", F.lit(1))
    got = {r["o_orderkey"]: (r["cs"], r["cnt"]) for r in
           with_global_cumsum(df, ["cents", "o_orderkey"],
                              ["cents", "one"],
                              cumsum_cols=["cs", "cnt"],
                              small_threshold=thresh).collect()}
    w = (W.orderBy("cents", "o_orderkey")
         .rowsBetween(W.unboundedPreceding, 0))
    want = {r["o_orderkey"]: (r["cs"], r["cnt"]) for r in
            df.withColumn("cs", F.sum("cents").over(w))
              .withColumn("cnt", F.sum("one").over(w)).collect()}
    assert got == want


@BOTH_PATHS
def test_global_cumsum_null_semantics(spark, thresh):
    """Running sum over a nullable column: NULL iff every value up to
    the row is NULL — including rows whose whole RANGE PARTITION is an
    all-NULL prefix (the round-10 divergence: offset + NULL returned
    NULL instead of the preceding partitions' total)."""
    rows = [(i, None if (i < 4 or 7 <= i < 10) else i * 10)
            for i in range(14)]
    df = spark.createDataFrame(rows, "k int, v int")
    got = {r["k"]: r["cs"] for r in with_global_cumsum(
        df, ["k"], ["v"], cumsum_cols=["cs"],
        num_partitions=7,  # ~2 rows/partition: all-NULL partitions exist
        small_threshold=thresh).collect()}
    w = W.orderBy("k").rowsBetween(W.unboundedPreceding, 0)
    want = {r["k"]: r["cs"] for r in
            df.withColumn("cs", F.sum("v").over(w)).collect()}
    assert got == want


def test_ntile_quota_formula_property():
    """Property check of the quota arithmetic itself (pure Python
    replica of ntile_from_rank) against DuckDB's ntile over every rank
    of randomized (N, B) — no Spark needed, so hypothesis can sweep
    hundreds of shapes."""
    import duckdb
    from hypothesis import given, settings
    from hypothesis import strategies as st

    def formula(rk: int, n: int, b: int) -> int:
        q, r = divmod(n, b)
        if q == 0:
            return rk
        pivot = (q + 1) * r
        if rk <= pivot:
            return (rk - 1) // (q + 1) + 1
        return r + (rk - pivot - 1) // q + 1

    con = duckdb.connect()

    @settings(max_examples=60, deadline=None)
    @given(n=st.integers(1, 500), b=st.integers(1, 40))
    def check(n: int, b: int) -> None:
        want = [r[0] for r in con.execute(
            f"SELECT ntile({b}) OVER (ORDER BY range) FROM range({n}) "
            f"ORDER BY range").fetchall()]
        got = [formula(rk, n, b) for rk in range(1, n + 1)]
        assert got == want, (n, b)

    check()


def test_gate_bypasses_bytes_heuristic_on_explode(spark):
    """r11 verdict ask #3: a Generate (explode) between the FileScan
    and a gated helper invalidates the input-file-bytes heuristic —
    the tiny-bytes plan below fans out to >threshold ROWS, and the
    gate must notice via the runtime count, not wave it through on
    scan size."""
    from threat_detection_nosql_spark.operators.ranking import (
        _gate_small, _has_generate)
    base = load_table(spark, SF_SMALL, "orders").select("o_orderkey")
    fanned = base.select(
        "o_orderkey",
        F.explode(F.sequence(F.lit(1), F.lit(50))).alias("rep"))
    assert _has_generate(fanned)
    assert not _has_generate(base)
    n = fanned.count()
    small, _ = _gate_small(fanned, n - 1)  # exploded count > threshold
    assert small is False  # bytes heuristic would have said True
    small, _ = _gate_small(fanned, n + 1)
    assert small is True  # runtime count still gates correctly


def test_gate_env_flag_parsing(spark, monkeypatch):
    """TDNS_RANKING_FORCE_DISTRIBUTED=0/false must NOT force the
    distributed path (r11 ADVICE: raw truthiness treated '0' as on)."""
    from threat_detection_nosql_spark.operators import ranking
    df = _orders(spark)
    for off in ("0", "false", "no", ""):
        monkeypatch.setenv(ranking._FORCE_ENV, off)
        assert ranking._force_distributed() is False
        assert ranking._gate_small(df, 1_000_000)[0] is True
    monkeypatch.setenv(ranking._FORCE_ENV, "1")
    assert ranking._force_distributed() is True
    assert ranking._gate_small(df, 1_000_000)[0] is False


def test_gate_known_small_and_pinned_short_circuits(spark):
    """KNOWN_SMALL skips every gate job; an already-checkpointed frame
    is not re-checkpointed by the runtime fallback (r11 ADVICE)."""
    from threat_detection_nosql_spark.operators.ranking import (
        KNOWN_SMALL, _gate_small, _is_pinned_scan)
    tiny = spark.createDataFrame([(i,) for i in range(5)], "k int")
    small, frame = _gate_small(tiny, KNOWN_SMALL)
    assert small is True and frame is tiny
    pinned = tiny.localCheckpoint()
    assert _is_pinned_scan(pinned)
    assert _is_pinned_scan(tiny)  # parallelized collections count too
    assert not _is_pinned_scan(tiny.select(F.col("k") + 1))
    small, frame = _gate_small(pinned, 100)
    assert small is True and frame is pinned  # same object, no re-pin
    # and KNOWN_SMALL still yields the exact window result end-to-end
    got = {r["k"]: r["rk"] for r in with_global_rank(
        tiny, ["k"], small_threshold=KNOWN_SMALL).collect()}
    assert got == {i: i + 1 for i in range(5)}
