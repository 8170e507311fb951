"""Round-11 infrastructure contracts: the per-user index cache, the
stale-index GC, and the ranking size-gate knobs."""
from __future__ import annotations

import os
import time

from threat_detection_nosql_spark.operators import ranking
from threat_detection_nosql_spark.queries import advanced as A


def test_cache_root_is_private_and_overridable(tmp_path, monkeypatch):
    monkeypatch.setenv("TDNS_CACHE_DIR", str(tmp_path / "cache"))
    root = A._cache_root()
    assert root == str(tmp_path / "cache")
    assert (os.stat(root).st_mode & 0o777) == 0o700
    # index paths live under the private root, not bare /tmp
    p = A._ivfpq_index_path("/root/testdata/sf0.001")
    assert p.startswith(root)


def test_sweep_stale_indexes_age_rule(tmp_path, monkeypatch):
    monkeypatch.setenv("TDNS_CACHE_DIR", str(tmp_path / "cache"))
    root = A._cache_root()
    young = os.path.join(root, "ivfpq_index_young")
    old = os.path.join(root, "ivfpq_index_old")
    keep = os.path.join(root, "ivfpq_index_keep")
    for d in (young, old, keep):
        os.makedirs(d)
    stale = time.time() - 8 * 86400
    os.utime(old, (stale, stale))
    A._sweep_stale_indexes("ivfpq_index_", keep)
    assert os.path.isdir(keep)
    assert os.path.isdir(young)      # under max_age: untouched
    assert not os.path.isdir(old)    # stale sibling: GC'd


def test_ranking_gate_env_forces_distributed(spark, monkeypatch):
    """TDNS_RANKING_FORCE_DISTRIBUTED (the audit_plans knob) must win
    over the bytes heuristic."""
    df = spark.range(100).withColumnRenamed("id", "k")
    monkeypatch.setenv(ranking._FORCE_ENV, "1")
    small, _ = ranking._gate_small(df, ranking.GATE_ROWS)
    assert small is False
    monkeypatch.delenv(ranking._FORCE_ENV)
    # no file source -> pin+count fallback -> small at 100 rows
    small, _ = ranking._gate_small(df, ranking.GATE_ROWS)
    assert small is True


def test_input_bytes_reads_scan_metadata(spark):
    from tests.conftest import SF_SMALL
    from threat_detection_nosql_spark.sources.readers import load_table
    n = ranking._input_bytes(load_table(spark, SF_SMALL, "orders"))
    want = os.path.getsize(f"{SF_SMALL}/orders.parquet")
    assert n == want
