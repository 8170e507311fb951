"""Registry invariants the driver contract depends on: every oracle
belongs to a registered query, names never collide across modules, and
every query is a callable with the (spark, sf_dir) signature."""

from __future__ import annotations

import inspect
import re

from threat_detection_nosql_spark import queries as Q

_MODULES = ["threat", "relational", "pipeline", "corpus", "advanced",
            "graph_queries", "metrics", "ml_queries",
            "streaming_queries", "temporal", "tpch", "cleaning",
            "tokenizer", "curation", "formats"]


def _modules():
    import importlib
    return {m: importlib.import_module(
        f"threat_detection_nosql_spark.queries.{m}") for m in _MODULES}


def _mod_queries(mod):
    return {**mod.QUERIES, **getattr(mod, "QUERIES_TAIL", {})}


def _mod_oracles(mod):
    return {**mod.ORACLES, **getattr(mod, "ORACLES_TAIL", {})}


def test_every_oracle_has_a_query():
    for name, mod in _modules().items():
        missing = set(_mod_oracles(mod)) - set(_mod_queries(mod))
        assert not missing, f"{name}: oracles without queries {missing}"


def test_no_cross_module_name_collisions():
    seen: dict[str, str] = {}
    for name, mod in _modules().items():
        for q in _mod_queries(mod):
            assert q not in seen, \
                f"{q} defined in both {seen[q]} and {name}"
            seen[q] = name


def test_all_queries_merge_is_complete():
    merged = Q.all_queries()
    per_module = sum(len(_mod_queries(m)) for m in _modules().values())
    assert len(merged) == per_module


def _current_window():
    """The registry pins each round's driver prefix as an explicit
    ``_WINDOW_R<n>`` name tuple; resolve the highest-numbered one so
    this test survives rotations without edits."""
    wins = {int(m.group(1)): getattr(Q, a)
            for a in dir(Q)
            for m in [re.match(r"_WINDOW_R(\d+)$", a)] if m}
    assert wins, "registry defines no _WINDOW_R* tuple"
    return wins[max(wins)]


def test_driver_window_is_oracle_backed_and_rows_only_parked():
    """Driver-window invariants (rotation-proof): the first 50 registry
    entries are exactly the current ``_WINDOW_R*`` tuple; outside the
    window, every oracle-backed query precedes every rows-only one
    (the park). Rows-only names may appear INSIDE the window — the r8
    verdict asks rotations to window never-driver-seen rows-only
    additions once for an executed-clean record — but never more than
    a handful of slots."""
    merged = Q.all_queries()
    oracles = Q.all_oracles()
    names = list(merged)
    window = _current_window()
    assert len(window) == 50
    assert tuple(names[:50]) == window
    ro_in_window = [n for n in window if n not in oracles]
    # r10 windows six rows-only queries (verdict ask #7 spreads the
    # never-windowed rows-only family over r10-r11 rotations)
    assert len(ro_in_window) <= 8, ro_in_window
    rest = names[50:]
    n_oracle_rest = sum(1 for n in rest if n in oracles)
    assert len(window) - len(ro_in_window) + n_oracle_rest >= 150
    for n in rest[:n_oracle_rest]:
        assert n in oracles, f"{n} ahead of the park but has no oracle"
    for n in rest[n_oracle_rest:]:
        assert n not in oracles, f"rows-only park holds oracle query {n}"


def test_queries_take_spark_and_sf_dir():
    for q, fn in Q.all_queries().items():
        params = list(inspect.signature(fn).parameters)
        assert len(params) >= 2, f"{q} has signature {params}"


def test_tws_profiles_registered_regardless_of_protobuf():
    """Round-10: stream_tws_profiles registers UNCONDITIONALLY (the
    protobuf gate now selects the implementation — transformWithState
    vs the applyInPandasWithState twin — not the registry membership),
    so the registry count is environment-independent."""
    assert "stream_tws_profiles" in Q.all_queries()
    assert "stream_tws_profiles" in Q.all_oracles()
