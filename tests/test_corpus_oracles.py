"""Corpus-curation queries (queries/corpus.py) vs DuckDB oracle —
the same order-insensitive value-hash comparison the driver runs."""

from __future__ import annotations

import pytest

from tests.conftest import compare_query_to_oracle
from threat_detection_nosql_spark.queries import corpus


@pytest.mark.parametrize(
    "name", sorted({**corpus.QUERIES, **corpus.QUERIES_TAIL}))
def test_corpus_query_matches_oracle(spark, ddb, name):
    queries = {**corpus.QUERIES, **corpus.QUERIES_TAIL}
    oracles = {**corpus.ORACLES, **corpus.ORACLES_TAIL}
    if name not in oracles:  # rows-only checks live in test_corpus
        pytest.skip(f"{name} has no SQL oracle")
    compare_query_to_oracle(spark, ddb, queries[name], oracles[name])
