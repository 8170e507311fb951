"""Property-graph surface queries vs DuckDB oracle."""

from __future__ import annotations

import pytest

from tests.conftest import SF_DIR, compare_query_to_oracle
from threat_detection_nosql_spark.queries import graph_queries


@pytest.mark.parametrize(
    "name", sorted({**graph_queries.QUERIES, **graph_queries.QUERIES_TAIL}))
def test_graph_query_matches_oracle(spark, ddb, name):
    queries = {**graph_queries.QUERIES, **graph_queries.QUERIES_TAIL}
    oracles = {**graph_queries.ORACLES, **graph_queries.ORACLES_TAIL}
    compare_query_to_oracle(spark, ddb, queries[name], oracles[name])


def test_edge_multiplicity_equals_fact_rows(spark):
    """Multigraph invariant: every edge type has exactly one edge per
    log row (SURVEY.md §1.2)."""
    rows = {(r["kind"], r["name"]): r["n"]
            for r in graph_queries.graph_summary(spark, SF_DIR).collect()}
    edge_counts = {v for (k, _), v in rows.items() if k == "edge"}
    assert len(edge_counts) == 1  # all four edge tables same cardinality
    assert rows[("node", "User")] <= next(iter(edge_counts))


def test_pagerank_fixed_star_graph_hub_dominates(spark):
    from threat_detection_nosql_spark.operators.graph import pagerank_fixed
    from pyspark.sql import functions as F
    spokes = [(f"s{i}", "hub") for i in range(10)]
    edges = spark.createDataFrame(
        spokes + [(b, a) for a, b in spokes], "src string, dst string")
    ranks = {r.node: r["rank"]
             for r in pagerank_fixed(edges, n_iters=3).collect()}
    assert max(ranks, key=ranks.get) == "hub"
    # no dangling nodes → total rank mass is conserved at 1
    assert abs(sum(ranks.values()) - 1.0) < 1e-9
    assert len({v for k, v in ranks.items() if k != "hub"}) == 1


def test_connected_components_labels_and_convergence(spark):
    """Two components + an isolated edge: every node gets the smallest
    reachable id; a path graph converges within its diameter."""
    from threat_detection_nosql_spark.operators.graph import (
        connected_components)
    # path 1-2-3-4-5 (one component), triangle 10-11-12, pair 20-21
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5),
         (10, 11), (11, 12), (10, 12),
         (20, 21)], "src long, dst long")
    got = {r.node: r.component
           for r in connected_components(edges).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1,
                   10: 10, 11: 10, 12: 10, 20: 20, 21: 20}


def test_near_dup_groups_transitive_closure(spark):
    """A~B and B~C must land in ONE component even when A and C share
    no band — the under-deletion case pair-keeping gets wrong."""
    from tests.conftest import SF_DIR
    from threat_detection_nosql_spark.operators.dedup import (
        minhash_signature_near_dups)
    from threat_detection_nosql_spark.queries.advanced import (
        _NDG_THRESHOLD, near_dup_groups)
    from threat_detection_nosql_spark.sources.readers import load_table

    out = near_dup_groups(spark, SF_DIR).cache()
    assert out.count() == load_table(spark, SF_DIR, "documents").count()
    comp = {r.doc_id: r.component for r in out.collect()}
    # closure check: both endpoints of every thresholded pair agree
    pairs = minhash_signature_near_dups(
        load_table(spark, SF_DIR, "documents"),
        min_est_jaccard=_NDG_THRESHOLD).collect()
    assert pairs, "fixture lost its planted near-dups"
    for r in pairs:
        assert comp[r.doc_a] == comp[r.doc_b]
    # exactly one canonical per component, and it is the min id
    canon = {r.component for r in out.filter("is_canonical = 1").collect()}
    assert canon == set(comp.values())
    for d, c in comp.items():
        assert c <= d
    out.unpersist()


def test_connected_components_property_random_graphs(spark):
    """Property check vs a pure-python union-find on seeded random
    graphs: labels must equal the min node id of each true component
    for every topology (stars, chains, cliques, isolates mixed)."""
    import random

    from threat_detection_nosql_spark.operators.graph import (
        connected_components)

    rng = random.Random(7)
    for trial in range(3):
        n = 40
        edges = [(rng.randrange(n), rng.randrange(n))
                 for _ in range(rng.randrange(10, 45))]
        edges = [e for e in edges if e[0] != e[1]]
        if not edges:
            continue
        parent = list(range(n))

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for u, v in edges:
            parent[find(u)] = find(v)
        # expected label = min node id in each union-find component
        root_min = {}
        touched = {x for e in edges for x in e}
        for x in touched:
            r = find(x)
            root_min[r] = min(root_min.get(r, x), x)
        want = {x: root_min[find(x)] for x in touched}

        df = spark.createDataFrame(edges, "src long, dst long")
        got = {r.node: r.component
               for r in connected_components(df).collect()}
        assert got == want, f"trial {trial}"


def test_star_components_match_union_find_and_label_propagation(spark):
    """The alternating large-star/small-star variant must agree with
    both the union-find ground truth and the min-label operator on
    random graphs."""
    import random

    from threat_detection_nosql_spark.operators.graph import (
        connected_components, connected_components_star)

    rng = random.Random(11)
    for _ in range(3):
        n = 50
        edges = [(rng.randrange(n), rng.randrange(n))
                 for _ in range(rng.randrange(12, 60))]
        edges = [e for e in edges if e[0] != e[1]]
        if not edges:
            continue
        df = spark.createDataFrame(edges, "src long, dst long")
        a = {r.node: r.component
             for r in connected_components(df).collect()}
        b = {r.node: r.component
             for r in connected_components_star(df).collect()}
        assert a == b


def test_star_components_collapse_deep_chain_in_log_rounds(spark):
    """The scale property the min-label operator lacks: a 200-node
    path graph (diameter 200) must fully collapse within ~log2(n)
    alternating rounds."""
    from threat_detection_nosql_spark.operators.graph import (
        connected_components_star)

    path = [(i, i + 1) for i in range(200)]
    df = spark.createDataFrame(path, "src long, dst long")
    got = {r.node: r.component
           for r in connected_components_star(df, max_iter=12).collect()}
    assert len(got) == 201
    assert all(c == 0 for c in got.values())


def test_link_prediction_square_graph(spark, tmp_path):
    """Planted 4-cycle co-purchase graph (1-2-3-4-1, every edge at
    support 2): the only candidate pairs are the two diagonals, each
    with both cycle neighbors in common (cn=2, Jaccard 1.0,
    AA = 2/ln 2), and no adjacent pair may appear."""
    import math

    import pyarrow as pa
    import pyarrow.parquet as pq

    from threat_detection_nosql_spark.queries.graph_queries import (
        link_prediction_top20)

    baskets = [(1, 2), (1, 2), (2, 3), (2, 3),
               (1, 4), (1, 4), (3, 4), (3, 4)]
    ok, pk = [], []
    for o, parts in enumerate(baskets):
        for p in parts:
            ok.append(o)
            pk.append(p)
    table = pa.table({"l_orderkey": pa.array(ok, pa.int64()),
                      "l_partkey": pa.array(pk, pa.int64())})
    pq.write_table(table, str(tmp_path / "lineitem.parquet"))

    rows = {(r["part_a"], r["part_b"]): r
            for r in link_prediction_top20(spark, str(tmp_path)).collect()}
    assert set(rows) == {(1, 3), (2, 4)}
    for r in rows.values():
        assert r["common_neighbors"] == 2
        assert abs(r["jaccard"] - 1.0) < 1e-9
        assert abs(r["adamic_adar"] - 2.0 / math.log(2.0)) < 1e-6


def test_label_propagation_two_cliques(spark):
    """Two 4-cliques joined by one bridge edge: LPA must settle each
    clique on its minimum member id, and the bridge must not merge
    them (a component algorithm would)."""
    from threat_detection_nosql_spark.operators.graph import (
        label_propagation_fixed)

    def clique(ns):
        return [(a, b) for a in ns for b in ns if a < b]

    edges = clique([1, 2, 3, 4]) + clique([10, 11, 12, 13]) + [(4, 10)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.node: r.community
           for r in label_propagation_fixed(df, n_iters=3).collect()}
    assert {got[n] for n in (1, 2, 3)} == {1}
    assert {got[n] for n in (11, 12, 13)} == {10}
    assert got[4] in (1, 2) and got[10] in (10, 11)  # bridge endpoints stay home


def test_kcore_peels_tail_recursively(spark):
    """A triangle with a pendant path: the 2-core is exactly the
    triangle — the path must peel away over MULTIPLE rounds (5 needs
    4 gone first), which a single-pass degree filter gets wrong."""
    from threat_detection_nosql_spark.operators.graph import kcore_fixed

    edges = [(1, 2), (2, 3), (1, 3),   # triangle
             (3, 4), (4, 5)]           # pendant chain
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.node: r.core_degree
           for r in kcore_fixed(df, k=2, n_rounds=4).collect()}
    assert got == {1: 2, 2: 2, 3: 2}


def test_personalized_pagerank_concentrates_on_seed_side(spark):
    """Barbell graph (two hubs joined by a bridge), teleport seeded on
    one hub: that hub and its spokes must outrank the mirror-image far
    side, which plain PageRank would score identically."""
    from threat_detection_nosql_spark.operators.graph import (
        pagerank_personalized)

    near = [(f"a{i}", "hubA") for i in range(5)]
    far = [(f"b{i}", "hubB") for i in range(5)]
    edges = near + far + [("hubA", "hubB")]
    sym = edges + [(b, a) for a, b in edges]
    df = spark.createDataFrame(sym, "src string, dst string")
    seeds = spark.createDataFrame([("hubA",)], "node string")
    ranks = {r.node: r["rank"]
             for r in pagerank_personalized(df, seeds, n_iters=3).collect()}
    assert ranks["hubA"] > ranks["hubB"]
    assert ranks["a0"] > ranks["b0"]
    assert max(ranks, key=ranks.get) == "hubA"


def test_personalized_pagerank_rejects_empty_seeds(spark):
    import pytest as _pytest

    from threat_detection_nosql_spark.operators.graph import (
        pagerank_personalized)

    df = spark.createDataFrame([("a", "b"), ("b", "a")],
                               "src string, dst string")
    empty = spark.createDataFrame([], "node string")
    with _pytest.raises(ValueError, match="empty seed set"):
        pagerank_personalized(df, empty)


def test_components_star_handoff_on_exhausted_passes(spark):
    """Round 9: exhausting the min-label pass budget hands off to
    star-contraction instead of raising — a 120-node path (diameter
    120) with a 2-pass budget must still produce exact components.
    max_iter=0 skips min-label entirely (pure star path)."""
    from threat_detection_nosql_spark.operators.graph import (
        connected_components)

    path = [(i, i + 1) for i in range(120)]
    df = spark.createDataFrame(path, "src long, dst long")
    got = {r.node: r.component
           for r in connected_components(df, max_iter=2).collect()}
    assert len(got) == 121 and all(c == 0 for c in got.values())

    tiny = spark.createDataFrame([(5, 9), (9, 3), (20, 21)],
                                 "src long, dst long")
    got0 = {r.node: r.component
            for r in connected_components(tiny, max_iter=0).collect()}
    assert got0 == {5: 3, 9: 3, 3: 3, 20: 20, 21: 20}


# ---------------------------------------------------------------------------
# HyperBall
# ---------------------------------------------------------------------------

def _hb_py_regs(names, p=4):
    """Python replay of the per-node initial registers (portable
    60-bit md5 hash, same arithmetic as operators/dedup hash)."""
    import hashlib
    w_bits = 60 - p
    out = {}
    for s in names:
        x = int(hashlib.md5(s.encode()).hexdigest()[:15], 16)
        w = x % (1 << w_bits)
        idx = x >> w_bits
        rho = (w_bits + 1) if w == 0 else (w_bits + 1 - w.bit_length())
        out[s] = (idx, rho)
    return out


def test_hyperball_registers_equal_exact_ball_hll(spark):
    """The defining HyperBall invariant: registers at radius t are the
    element-wise max of the INITIAL registers over the exact ball
    members — checked on a path graph where balls are hand-countable."""
    from threat_detection_nosql_spark.operators.graph import (
        hyperball_registers,
    )
    chain = ["a", "b", "c", "d", "e"]
    pairs = list(zip(chain, chain[1:]))
    edges = spark.createDataFrame(
        [(s, d) for s, d in pairs] + [(d, s) for s, d in pairs],
        "src string, dst string")
    by_t = hyperball_registers(edges, n_iters=2, p=4)
    init = _hb_py_regs(chain)
    idx_of = {n: init[n][0] for n in chain}
    for t, regs in enumerate(by_t):
        got = {}
        for r in regs.collect():
            got.setdefault(r["node"], {})[r["idx"]] = r["r"]
        for i, n in enumerate(chain):
            ball = [chain[j] for j in range(len(chain))
                    if abs(j - i) <= t]
            want: dict[int, int] = {}
            for m in ball:
                ix, rho = init[m]
                want[ix] = max(want.get(ix, 0), rho)
            assert got[n] == want, (n, t)


def test_hyperball_report_shape_and_growth(spark):
    from tests.conftest import SF_SMALL
    from threat_detection_nosql_spark.queries.graph_queries import (
        hyperball_reach_report,
    )
    rows = {r["t"]: r for r in
            hyperball_reach_report(spark, SF_SMALL).collect()}
    assert sorted(rows) == [0, 1, 2]
    n_nodes = {r["n_nodes"] for r in rows.values()}
    assert len(n_nodes) == 1  # every node keeps a sketch at every t
    # balls only grow with t; t=0 is the single-element ball whose
    # linear-counting estimate is near-exact for m=16
    assert abs(rows[0]["avg_ball"] - 1.0) < 0.15
    assert rows[0]["avg_ball"] <= rows[1]["avg_ball"] <= rows[2]["avg_ball"]
    assert rows[1]["max_ball"] <= rows[2]["max_ball"]
