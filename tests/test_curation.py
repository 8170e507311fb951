"""Corpus-curation wave (queries/curation.py + the shared triangle
kernel): oracle parity for the four new queries plus the semantic
invariants an oracle hash can't express — bucket monotonicity for the
perplexity filter, target/source separation for DSIR, label
disjointness for hard negatives, and a planted-graph unit test of the
local clustering coefficient."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR, compare_query_to_oracle
from threat_detection_nosql_spark.queries.curation import (
    ORACLES as CUR_ORACLES,
    QUERIES as CUR_QUERIES,
)
from threat_detection_nosql_spark.queries.graph_queries import (
    ORACLES_TAIL as GQ_ORACLES,
    QUERIES_TAIL as GQ_QUERIES,
    _oriented_triangles,
)


@pytest.mark.parametrize("name", sorted(CUR_QUERIES))
def test_curation_matches_oracle(spark, ddb, name):
    compare_query_to_oracle(spark, ddb, CUR_QUERIES[name],
                            CUR_ORACLES[name])


def test_clustering_coefficient_matches_oracle(spark, ddb):
    compare_query_to_oracle(
        spark, ddb, GQ_QUERIES["local_clustering_coefficient"],
        GQ_ORACLES["local_clustering_coefficient"])


def test_perplexity_buckets(spark):
    rows = CUR_QUERIES["doc_perplexity_filter"](spark, SF_DIR).collect()
    n = len(rows)
    assert n > 0
    by_bucket: dict = {}
    for r in rows:
        assert r.n_tokens > 0
        assert r.cross_entropy > 0  # −log2 p of p<1 tokens
        by_bucket.setdefault(r.ppl_bucket, []).append(r.cross_entropy)
    assert set(by_bucket) == {"head", "middle", "tail"}
    # quartile buckets: head holds ≥ a quarter of the corpus (ties only
    # grow it), tail ≤ a quarter + tie slack
    assert len(by_bucket["head"]) >= n // 4
    # every head score ≤ every middle score ≤ every tail score
    assert max(by_bucket["head"]) <= min(by_bucket["middle"])
    assert max(by_bucket["middle"]) <= min(by_bucket["tail"])


def test_perplexity_oov_scored(spark):
    # the held-out split guarantees odd docs contain tokens the
    # even-doc LM never saw; those docs still score (OOV mass, not null)
    df = CUR_QUERIES["doc_perplexity_filter"](spark, SF_DIR)
    assert df.filter(F.col("cross_entropy").isNull()).count() == 0
    n_docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").count()
    assert df.count() == n_docs


def test_dsir_separates_target_from_source(spark):
    rows = CUR_QUERIES["dsir_importance_weights"](spark, SF_DIR).collect()
    en = [r.avg_log_ratio for r in rows if r.lang == "en"]
    rest = [r.avg_log_ratio for r in rows if r.lang != "en"]
    assert en and rest
    # the importance weight must tilt toward the target slice on
    # average — the whole point of DSIR resampling
    assert sum(en) / len(en) > sum(rest) / len(rest)


def test_hard_negatives_label_disjoint(spark):
    rows = CUR_QUERIES["hard_negative_mining"](spark, SF_DIR).collect()
    assert rows
    by_q: dict = {}
    for r in rows:
        assert r.neg_label != r.q_label
        assert -1.0 <= r.cosine <= 1.0
        by_q.setdefault(r.q_id, []).append(r)
    for q, members in by_q.items():
        ranks = sorted(m.rank for m in members)
        assert ranks == list(range(1, len(members) + 1))
        by_rank = sorted(members, key=lambda m: m.rank)
        cosines = [m.cosine for m in by_rank]
        assert cosines == sorted(cosines, reverse=True)


def test_clustering_coefficient_bounds(spark):
    rows = GQ_QUERIES["local_clustering_coefficient"](
        spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r.deg >= 2
        # T(v) ≤ C(deg, 2) ⇒ coefficient ∈ [0, 1]
        assert 0.0 <= r.clustering_coeff <= 1.0
        assert r.triangles <= r.deg * (r.deg - 1) // 2


def test_triangle_kernel_planted(spark):
    # K3 plus a pendant: each K3 corner has 1 triangle; the pendant
    # edge adds degree but no closure
    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3), (3, 4)], "p1 long, p2 long")
    deg, tri = _oriented_triangles(edges)
    corners = sorted(
        tri.select(F.col("e1.src"), F.col("e1.dk.n"), F.col("e2.dk.n"))
        .collect()[0])
    assert corners == [1, 2, 3]
    degs = {r.node: r.deg for r in deg.collect()}
    assert degs == {1: 2, 2: 2, 3: 3, 4: 1}
