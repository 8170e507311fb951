

def test_gap_fill_locf_planted(spark, tmp_path):
    """Planted event log with a 2-day hole: the spine must emit the
    missing days with n_events=0, carry the last observed daily value
    across the hole, and leave days before the first observation out
    of the spine entirely."""
    import datetime as dt

    import pyarrow as pa
    import pyarrow.parquet as pq

    from threat_detection_nosql_spark.queries.temporal import (
        user_daily_gap_filled)

    def ts(day, h):
        return dt.datetime(2024, 1, day, h, 0, 0)

    rows = [  # user 1: active Jan 2 and Jan 5 -> spine 2,3,4,5
        (0, ts(2, 9), 1, "click", 10.0),
        (1, ts(2, 10), 1, "click", 20.0),   # Jan 2 avg 15.0
        (2, ts(5, 9), 1, "click", 40.0),    # Jan 5 avg 40.0
    ]
    table = pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] for r in rows],
                       pa.timestamp("us")),
        "user_id": pa.array([r[2] for r in rows], pa.int64()),
        "event_type": pa.array([r[3] for r in rows]),
        "value": pa.array([r[4] for r in rows], pa.float64()),
        "props": pa.array(['{"k": 1}'] * len(rows)),
    })
    pq.write_table(table, str(tmp_path / "events.parquet"))

    got = {r["day"].day: r
           for r in user_daily_gap_filled(spark, str(tmp_path)).collect()}
    assert sorted(got) == [2, 3, 4, 5]
    assert (got[2]["n_events"], got[2]["day_avg"]) == (2, 15.0)
    for d in (3, 4):
        assert (got[d]["n_events"], got[d]["day_avg"],
                got[d]["locf_value"], got[d]["is_gap"]) == (0, None, 15.0, 1)
    assert (got[5]["n_events"], got[5]["locf_value"]) == (1, 40.0)


def test_ewma_constant_series_then_spike(spark, tmp_path):
    """A flat daily series keeps the EWMA at the constant and raises no
    burst; a 5x spike day trips the 2x-prior-EWMA flag and pulls the
    EWMA up by exactly alpha's share."""
    import datetime as dt

    import pyarrow as pa
    import pyarrow.parquet as pq

    from threat_detection_nosql_spark.queries.temporal import user_daily_ewma

    rows = []
    eid = 0
    for day, n in [(1, 2), (2, 2), (3, 2), (4, 10)]:
        for j in range(n):
            rows.append((eid, dt.datetime(2024, 1, day, 8 + j), 7))
            eid += 1
    table = pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
        "user_id": pa.array([r[2] for r in rows], pa.int64()),
        "event_type": pa.array(["click"] * len(rows)),
        "value": pa.array([1.0] * len(rows), pa.float64()),
        "props": pa.array(['{"k": 1}'] * len(rows)),
    })
    pq.write_table(table, str(tmp_path / "events.parquet"))

    got = {r["day"].day: r
           for r in user_daily_ewma(spark, str(tmp_path)).collect()}
    assert [got[d]["is_burst"] for d in (1, 2, 3, 4)] == [0, 0, 0, 1]
    for d in (1, 2, 3):
        assert abs(got[d]["ewma"] - 2.0) < 1e-9
    assert abs(got[4]["ewma"] - (0.3 * 10 + 0.7 * 2.0)) < 1e-6


def test_seasonal_zscore_conditions_on_cell(spark, tmp_path):
    """Two seasonal cells with different scales: a value that is huge
    globally but normal for ITS cell must not outrank a value that is
    modest globally but extreme for its own (low-variance) cell."""
    import datetime as dt

    import pyarrow as pa
    import pyarrow.parquet as pq

    from threat_detection_nosql_spark.queries.temporal import (
        seasonal_zscore_anomalies)

    rows = []
    # cell A (Mon 9h): values around 100 +/- 10 -> 130 is z=3-ish
    for i, v in enumerate([90.0, 100.0, 110.0, 130.0]):
        rows.append((i, dt.datetime(2024, 1, 1, 9, i), 1, v))
    # cell B (Mon 14h): values around 1000, tight -> 1001 is normal
    for i, v in enumerate([999.0, 1000.0, 1001.0, 1000.0]):
        rows.append((10 + i, dt.datetime(2024, 1, 1, 14, i), 2, v))
    table = pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
        "user_id": pa.array([r[2] for r in rows], pa.int64()),
        "event_type": pa.array(["click"] * len(rows)),
        "value": pa.array([r[3] for r in rows], pa.float64()),
        "props": pa.array(['{"k": 1}'] * len(rows)),
    })
    pq.write_table(table, str(tmp_path / "events.parquet"))

    got = seasonal_zscore_anomalies(spark, str(tmp_path)).collect()
    # top anomaly is the 130 in the low-scale cell, not anything from
    # the high-scale cell
    assert got[0]["event_id"] == 3
    assert got[0]["abs_z"] > 1.5
    by_id = {r["event_id"]: r for r in got}
    assert all(by_id[e]["abs_z"] < got[0]["abs_z"]
               for e in by_id if e >= 10)


def test_ols_trend_exact_line_and_single_day(spark, tmp_path):
    """A user whose daily counts lie exactly on y = 2x + 1 must recover
    slope 2 / intercept 1 exactly (all-integer sums); a single-day user
    gets NULL slope, not a crash or a zero."""
    import datetime as dt

    import pyarrow as pa
    import pyarrow.parquet as pq

    from threat_detection_nosql_spark.queries.temporal import (
        user_activity_trend)

    rows = []
    eid = 0
    for d, n in [(1, 1), (2, 3), (3, 5), (4, 7)]:  # y = 2x + 1, x=d-1
        for j in range(n):
            rows.append((eid, dt.datetime(2024, 1, d, 6 + j), 1))
            eid += 1
    rows.append((eid, dt.datetime(2024, 1, 2, 12), 2))  # single-day user
    table = pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
        "user_id": pa.array([r[2] for r in rows], pa.int64()),
        "event_type": pa.array(["click"] * len(rows)),
        "value": pa.array([1.0] * len(rows), pa.float64()),
        "props": pa.array(['{"k": 1}'] * len(rows)),
    })
    pq.write_table(table, str(tmp_path / "events.parquet"))

    got = {r["user"]: r for r in user_activity_trend(
        spark, str(tmp_path)).collect()}
    assert got[1]["slope"] == 2.0
    assert got[1]["intercept"] == 1.0
    assert got[1]["trend"] == "up"
    assert got[2]["slope"] is None and got[2]["trend"] is None


def test_transition_matrix_rows_are_distributions(spark):
    """Each prev-activity row of the Markov matrix must be a proper
    conditional distribution: probabilities in (0, 1], summing to ~1."""
    from collections import defaultdict

    from tests.conftest import SF_DIR
    from threat_detection_nosql_spark.queries.temporal import (
        activity_transition_matrix)

    rows = activity_transition_matrix(spark, SF_DIR).collect()
    assert rows
    by_prev = defaultdict(float)
    for r in rows:
        assert 0.0 < r["p"] <= 1.0
        by_prev[r["prev_activity"]] += r["p"]
    for prev, total in by_prev.items():
        assert abs(total - 1.0) < 1e-4, prev


def test_streak_islands_split_on_gap(spark, tmp_path):
    """After-hours days 1,2,3 then 5,6 (gap at 4): longest streak is 3
    starting day 1; an in-hours event on day 4 must NOT bridge the
    islands."""
    import datetime as dt

    import pyarrow as pa
    import pyarrow.parquet as pq

    from threat_detection_nosql_spark.queries.temporal import (
        longest_after_hours_streak)

    rows = []
    eid = 0
    for d in (1, 2, 3, 5, 6):     # after-hours (23h)
        rows.append((eid, dt.datetime(2024, 1, d, 23), 1, "click")); eid += 1
    rows.append((eid, dt.datetime(2024, 1, 4, 12), 1, "click"))  # in-hours
    pq.write_table(pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
        "user_id": pa.array([r[2] for r in rows], pa.int64()),
        "event_type": pa.array([r[3] for r in rows]),
        "value": pa.array([1.0] * len(rows), pa.float64()),
        "props": pa.array(['{"k": 1}'] * len(rows)),
    }), str(tmp_path / "events.parquet"))

    got = longest_after_hours_streak(spark, str(tmp_path)).collect()
    assert len(got) == 1
    assert got[0]["longest_streak"] == 3
    assert got[0]["streak_start"].day == 1


def test_cusum_sustained_shift_alerts_burst_does_not(spark, tmp_path):
    """A sustained +2x shift in the back half must trip the CUSUM
    alert; the flat-then-single-spike user must not — the separation
    CUSUM provides over a per-day burst flag."""
    import datetime as dt

    import pyarrow as pa
    import pyarrow.parquet as pq

    from threat_detection_nosql_spark.queries.temporal import (
        user_cusum_alerts)

    rows = []
    eid = 0

    def add(day, user, n):
        nonlocal eid
        for k in range(n):
            rows.append((eid, dt.datetime(2024, 1, day, 2 + (k % 20)),
                         user))
            eid += 1

    for d in range(1, 8):
        add(d, 1, 4)          # user 1: flat 4/day...
    for d in range(8, 15):
        add(d, 1, 12)         # ...then a sustained 3x shift
    for d in range(1, 14):
        add(d, 2, 4)          # user 2: flat with one spike
    add(14, 2, 12)
    pq.write_table(pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
        "user_id": pa.array([r[2] for r in rows], pa.int64()),
        "event_type": pa.array(["click"] * len(rows)),
        "value": pa.array([1.0] * len(rows), pa.float64()),
        "props": pa.array(['{"k": 1}'] * len(rows)),
    }), str(tmp_path / "events.parquet"))

    got = {r["user"]: r
           for r in user_cusum_alerts(spark, str(tmp_path)).collect()}
    assert got[1]["n_alert_days"] >= 1
    assert got[1]["first_alert_day"] is not None
    assert got[2]["n_alert_days"] == 0
