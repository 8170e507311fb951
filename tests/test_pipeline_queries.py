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
