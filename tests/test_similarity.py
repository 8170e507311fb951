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
