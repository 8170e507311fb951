"""Round-13 parity pins (r12 ADVICE #4): the recall harness's inline
SRP and IVF top-k must stay row-identical to the standalone
oracle-checked queries. The inline chains share the operators
(srp_signatures, cosine_topk_from_candidates, kmeans_fixed,
ivf_fixed_neighbors) but not the query code path — without this pin,
only the DuckDB oracle constrains drift if either side's knobs or
rescore path change independently."""

from __future__ import annotations

import pytest

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def spark():
    from threat_detection_nosql_spark.session import get_spark
    return get_spark("test_round13_parity")


def _rows(df, cols=("q_id", "vec_id")):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def test_ann_recall_srp_topk_matches_standalone(spark):
    from threat_detection_nosql_spark.queries import advanced
    parts = advanced._ann_recall_parts(spark, SF_DIR)
    standalone = advanced.srp_ann_topk(spark, SF_DIR)
    assert _rows(parts["srp_top"]) == _rows(
        standalone.select("q_id", "vec_id"))


def test_ann_recall_ivf_topk_matches_standalone(spark):
    from threat_detection_nosql_spark.queries import advanced
    parts = advanced._ann_recall_parts(spark, SF_DIR)
    standalone = advanced.ivf_fixed_ann_topk(spark, SF_DIR)
    assert _rows(parts["ivf_top"]) == _rows(
        standalone.select("q_id", "vec_id"))
