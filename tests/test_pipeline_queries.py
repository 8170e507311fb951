"""LLM-pipeline queries (dedup/similarity/text/multimodal) vs oracle."""

from __future__ import annotations

import pytest

from tests.conftest import compare_query_to_oracle
from threat_detection_nosql_spark.queries import pipeline


@pytest.mark.parametrize("name", sorted(pipeline.QUERIES))
def test_pipeline_query_matches_oracle(spark, ddb, name):
    compare_query_to_oracle(spark, ddb, pipeline.QUERIES[name],
                            pipeline.ORACLES[name])
