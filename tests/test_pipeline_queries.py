"""LLM-pipeline queries (dedup/similarity/text/multimodal) vs oracle."""

from __future__ import annotations

import pytest

from tests.conftest import compare_query_to_oracle
from threat_detection_nosql_spark.queries import pipeline


@pytest.mark.parametrize(
    "name", sorted({**pipeline.QUERIES, **pipeline.QUERIES_TAIL}))
def test_pipeline_query_matches_oracle(spark, ddb, name):
    queries = {**pipeline.QUERIES, **pipeline.QUERIES_TAIL}
    oracles = {**pipeline.ORACLES, **pipeline.ORACLES_TAIL}
    if name not in oracles:  # rows-only (e.g. MMR's sequential greedy)
        pytest.skip(f"{name} has no SQL oracle "
                    "(tests/test_retrieval_eval.py pins value parity)")
    compare_query_to_oracle(spark, ddb, queries[name], oracles[name])


def test_embedding_near_dup_planted_semantics(spark, tmp_path):
    """Planted vectors pin the GEMM kernel's semantics: identical
    vectors pair at cosine 1.0, the self-pair is masked, ties break to
    the smallest nn_id, and sub-threshold neighbors are not flagged."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from threat_detection_nosql_spark.queries.pipeline import (
        embedding_near_dups)

    vecs = [(0, [1.0, 0.0]),
            (1, [1.0, 0.0]),    # identical to 0 -> cosine 1.0, dup
            (2, [0.0, 1.0]),    # nearest is 3 at cos ~0.11 -> not dup
            (3, [0.9, 0.1])]    # ties 0 and 1 at ~0.994 -> nn_id 0
    table = pa.table({
        "vec_id": pa.array([v[0] for v in vecs], pa.int64()),
        "embedding": pa.array([v[1] for v in vecs],
                              pa.list_(pa.float32())),
    })
    pq.write_table(table, str(tmp_path / "embeddings.parquet"))

    rows = {r["vec_id"]: r
            for r in embedding_near_dups(spark, str(tmp_path)).collect()}
    assert {(v, rows[v]["nn_id"], rows[v]["is_near_dup"])
            for v in rows} == {(0, 1, 1), (1, 0, 1), (2, 3, 0), (3, 0, 1)}
    assert rows[0]["cosine"] == 1.0
    assert abs(rows[3]["cosine"] - 0.993884) < 1e-6


def test_bm25_saturation_and_length_norm(spark, tmp_path):
    """Planted docs pin the two properties BM25 adds over TF-IDF:
    term-frequency saturation (10× the tf is nowhere near 10× the
    score) and doc-length normalization (the same tf in a longer doc
    scores LOWER)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from threat_detection_nosql_spark.queries.pipeline import bm25_top_terms

    # every doc holds <= 2 distinct tokens so the top-3 window never
    # crowds the planted term out
    docs = [
        (0, "rare pad pad pad"),                    # tf=1, dl=4
        (1, ("rare " * 10) + "pad pad"),            # tf=10, dl=12
        (2, "rare " + "pad " * 39),                 # tf=1, dl=40
        (3, "pad pad pad pad"),                     # df(rare)=3 < N
    ]
    table = pa.table({
        "doc_id": pa.array([d[0] for d in docs], pa.int64()),
        "text": pa.array([d[1] for d in docs]),
        "lang": pa.array(["en"] * len(docs)),
        "source": pa.array(["t"] * len(docs)),
        "n_chars": pa.array([len(d[1]) for d in docs], pa.int64()),
    })
    pq.write_table(table, str(tmp_path / "documents.parquet"))

    rows = bm25_top_terms(spark, str(tmp_path)).collect()
    rare = {r["doc_id"]: r["bm25"] for r in rows if r["token"] == "rare"}
    assert set(rare) == {0, 1, 2}
    assert rare[1] > rare[0]              # more tf -> higher score
    assert rare[1] < 3 * rare[0]          # ...but saturating, not linear
    assert rare[2] < rare[0]              # same tf, longer doc -> lower


def test_hashed_features_fixed_width_and_determinism(spark):
    """The hashing trick's contract: every bucket is in [0, 64) and
    the featurization is deterministic (same text -> same buckets,
    no fitted vocabulary to drift)."""
    from tests.conftest import SF_DIR
    from threat_detection_nosql_spark.queries.pipeline import (
        _FH_BUCKETS, hashed_feature_counts)

    rows = hashed_feature_counts(spark, SF_DIR).collect()
    assert rows
    assert all(0 <= r["bucket"] < _FH_BUCKETS for r in rows)
    again = hashed_feature_counts(spark, SF_DIR).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


def test_novelty_unique_vs_shared_and_short_docs(spark, tmp_path):
    """A doc made of corpus-unique shingles scores 1.0, an exact clone
    pair scores 0.0 (every shingle shared), and a 2-word doc reports
    NULL novelty with zero shingles instead of crashing on the
    descending-sequence trap."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from threat_detection_nosql_spark.queries.pipeline import (
        doc_novelty_scores)

    docs = [
        (0, "alpha beta gamma delta"),     # unique shingles -> 1.0
        (1, "one two three four five"),    # clone of 2 -> 0.0
        (2, "one two three four five"),
        (3, "too short"),                  # < 3 words -> NULL
    ]
    pq.write_table(pa.table({
        "doc_id": pa.array([d[0] for d in docs], pa.int64()),
        "text": pa.array([d[1] for d in docs]),
        "lang": pa.array(["en"] * len(docs)),
        "source": pa.array(["t"] * len(docs)),
        "n_chars": pa.array([len(d[1]) for d in docs], pa.int64()),
    }), str(tmp_path / "documents.parquet"))

    got = {r["doc_id"]: r
           for r in doc_novelty_scores(spark, str(tmp_path)).collect()}
    assert got[0]["novelty"] == 1.0
    assert got[1]["novelty"] == 0.0 and got[2]["novelty"] == 0.0
    assert got[3]["n_shingles"] == 0 and got[3]["novelty"] is None
