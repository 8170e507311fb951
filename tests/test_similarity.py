"""ANN operators: LSH and IVF top-k vs the exact brute-force baseline —
recall must be high on the testdata's clustered embeddings."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR
from threat_detection_nosql_spark.operators import similarity
from threat_detection_nosql_spark.queries.pipeline import cosine_topk
from threat_detection_nosql_spark.sources.readers import load_table


@pytest.fixture(scope="module")
def emb_queries(spark):
    emb = (load_table(spark, SF_DIR, "embeddings")
           .select("vec_id",
                   F.col("embedding").cast("array<double>").alias("v")))
    qs = (emb.filter(F.col("vec_id") < 8)
          .select(F.col("vec_id").alias("q_id"), "v"))
    return emb, qs


@pytest.fixture(scope="module")
def exact_topk(spark):
    return {(r.q_id, r.vec_id)
            for r in cosine_topk(spark, SF_DIR).collect()}


def _recall(approx_rows, exact_pairs):
    approx = {(r.q_id, r.vec_id) for r in approx_rows}
    return len(approx & exact_pairs) / len(exact_pairs)


def test_lsh_ann_recall(spark, emb_queries, exact_topk):
    emb, qs = emb_queries
    rows = similarity.lsh_cosine_neighbors(emb, qs, k=5).collect()
    assert _recall(rows, exact_topk) >= 0.8


def test_e2lsh_ann_recall_and_determinism(spark, emb_queries,
                                          exact_topk):
    """Portable E2LSH (round 11, the oracle-backed lsh_ann_topk): high
    recall vs brute force AND bit-identical across two runs (md5
    params, no engine RNG — unlike the MLlib variant above)."""
    emb, qs = emb_queries
    rows = similarity.e2lsh_neighbors(
        emb, qs, k=5, queries_in_corpus=True).collect()
    assert _recall(rows, exact_topk) >= 0.8
    again = similarity.e2lsh_neighbors(
        emb, qs, k=5, queries_in_corpus=True).collect()
    key = lambda r: (r.q_id, r.rank)  # noqa: E731
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


def test_ivf_ann_recall(spark, emb_queries, exact_topk):
    # the testdata's true top-5 neighbors are weak (cosine ≈ 0.3), so
    # cell pruning caps recall ≈ 0.78 even probing half the cells;
    # assert a realistic floor + that recall grows with n_probe
    emb, qs = emb_queries
    rows = similarity.ivf_cosine_neighbors(emb, qs, k=5,
                                           n_cells=8, n_probe=4).collect()
    r4 = _recall(rows, exact_topk)
    rows1 = similarity.ivf_cosine_neighbors(emb, qs, k=5,
                                            n_cells=8, n_probe=1).collect()
    r1 = _recall(rows1, exact_topk)
    assert r4 >= 0.7
    assert r4 >= r1


def test_ivf_returns_k_per_query(spark, emb_queries):
    emb, qs = emb_queries
    out = similarity.ivf_cosine_neighbors(emb, qs, k=5).groupBy("q_id") \
        .count().collect()
    assert all(r["count"] == 5 for r in out)


def test_srp_ann_recall(spark, emb_queries, exact_topk):
    emb, qs = emb_queries
    rows = similarity.srp_lsh_neighbors(emb, qs, k=5).collect()
    assert _recall(rows, exact_topk) >= 0.6


def test_srp_planes_portable_and_bounded():
    planes = similarity.srp_planes(4, 8)
    flat = [w for p in planes for w in p]
    assert all(-1.0 <= w < 1.0 for w in flat)
    # derived from md5 of "p:j" — stable across processes/engines
    assert planes == similarity.srp_planes(4, 8)
    assert len({tuple(p) for p in planes}) == 4


# ---------------------------------------------------------------------------
# ANN-first embedding near-dup (round 5): recall + plan-shape pins
# ---------------------------------------------------------------------------

def test_ann_near_dups_planted_cluster_recall_is_1(spark):
    """In the regime LSH is parameterized for (near-dup clusters,
    cosine ≥ 0.8) the ANN path must find every planted duplicate —
    recall 1.0, same flags the exact kernel would emit."""
    import numpy as np
    rng = np.random.default_rng(42)
    base = rng.normal(size=(20, 64))
    rows = []
    vid = 0
    for i in range(20):                      # 20 clusters of 3 near-dups
        for _ in range(3):
            v = base[i] + rng.normal(scale=0.02, size=64)
            rows.append((vid, [float(x) for x in v]))
            vid += 1
    for _ in range(40):                      # 40 singleton decoys
        rows.append((vid, [float(x) for x in rng.normal(size=64)]))
        vid += 1
    emb = spark.createDataFrame(rows, "vec_id long, v array<double>")

    from threat_detection_nosql_spark.operators import similarity
    from threat_detection_nosql_spark.queries import pipeline as P
    planes = similarity.srp_planes(P._ANN_PLANES, P._ANN_DIM)
    sigs = similarity.srp_signatures(emb, planes,
                                     band_bits=P._ANN_BAND_BITS)
    cand = {(r.a, r.b) for r in
            (sigs.alias("x").join(sigs.alias("y"), ["band", "sig"])
             .filter(F.col("x.vec_id") != F.col("y.vec_id"))
             .select(F.col("x.vec_id").alias("a"),
                     F.col("y.vec_id").alias("b")).distinct().collect())}
    # every intra-cluster pair must be a candidate (cosine ≈ 0.999)
    for c in range(20):
        ids = [3 * c, 3 * c + 1, 3 * c + 2]
        for i in ids:
            for j in ids:
                if i != j:
                    assert (i, j) in cand, f"missed planted pair {i},{j}"


def test_ann_near_dups_bounded_vs_exact_on_testdata(spark):
    """The registered testdata has NO genuine near-dups (exact NN
    cosines span 0.27-0.51 — pure random-vector regime, where
    sub-quadratic exact NN is information-theoretically impossible), so
    this pins the documented trade rather than recall 1.0: every vector
    keeps a row, ANN cosines never exceed the exact optimum, and
    measured exact-NN recall stays above the empirical floor of these
    pruning params (~0.32 here). The recall-1.0 guarantee in the regime
    the operator targets is the planted-cluster test above."""
    from threat_detection_nosql_spark.queries.pipeline import (
        embedding_ann_near_dups, embedding_near_dups)
    exact = {r.vec_id: (r.nn_id, r.cosine, r.is_near_dup)
             for r in embedding_near_dups(spark, SF_DIR).collect()}
    ann = {r.vec_id: (r.nn_id, r.cosine, r.is_near_dup)
           for r in embedding_ann_near_dups(spark, SF_DIR).collect()}
    assert set(ann) == set(exact)            # every vector keeps a row
    for v, (_, cos, _) in ann.items():
        assert cos <= exact[v][1] + 1e-9     # never beats the optimum
    nn_recall = sum(ann[v][0] == exact[v][0] for v in exact) / len(exact)
    assert nn_recall >= 0.25


def test_ann_near_dups_plan_has_no_cartesian(spark):
    """The scale guarantee: candidate generation is a banded equi-join,
    never an all-pairs cross join (the exact kernel's block
    CartesianProduct must NOT appear in the registered ANN plan)."""
    from threat_detection_nosql_spark.queries.pipeline import (
        embedding_ann_near_dups)
    plan = embedding_ann_near_dups(spark, SF_DIR) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_ann_recall_report_semantics(spark):
    """The recall harness's structural guarantees: exact is a perfect
    baseline by construction (recall 1.0 through the same join), every
    ANN method spends a STRICTLY smaller candidate budget than the
    exact scan (the point of the index), and recalls live in [0, 1]
    with avg >= min."""
    from threat_detection_nosql_spark.queries.advanced import (
        ann_recall_report)
    rows = {r.method: r for r in ann_recall_report(spark, SF_DIR).collect()}
    assert set(rows) == {"exact", "ivf_fixed", "srp"}
    ex = rows["exact"]
    assert ex.avg_recall == 1.0 and ex.min_recall == 1.0
    assert ex.candidates == ex.n_queries * 499  # 8 * (N-1), N=500
    for m in ("ivf_fixed", "srp"):
        r = rows[m]
        assert r.candidates < ex.candidates
        assert 0.0 <= r.min_recall <= r.avg_recall <= 1.0
