"""repeated_substring_spans (D28): exact substring-level dedup span
semantics on a planted mini-corpus — cross-doc quotes, within-doc
repetition, adjacency merging, and the K-token floor."""
from __future__ import annotations

import pytest

from threat_detection_nosql_spark.queries.pipeline import _SPAN_K


def _tok(n, tag):
    return " ".join(f"{tag}{i}" for i in range(n))


@pytest.fixture(scope="module")
def spans(spark, tmp_path_factory):
    """Three docs: 0 and 1 share a verbatim 12-token quote (unique
    text around it); doc 2 repeats its own 10-token phrase twice with
    a unique separator gap > K."""
    quote = _tok(12, "q")          # 12 shared tokens
    phrase = _tok(10, "p")         # 10 tokens, repeated inside doc 2
    rows = [
        (0, f"{_tok(20, 'a')} {quote} {_tok(20, 'b')}"),
        (1, f"{_tok(20, 'c')} {quote} {_tok(20, 'd')}"),
        (2, f"{phrase} {_tok(20, 'e')} {phrase}"),
    ]
    d = tmp_path_factory.mktemp("spans")
    spark.createDataFrame(rows, "doc_id long, text string") \
        .write.mode("overwrite").parquet(str(d / "documents.parquet"))
    import threat_detection_nosql_spark.queries.pipeline as P
    out = P.repeated_substring_spans(spark, str(d)).collect()
    return {(r.doc_id, r.span_start): r for r in out}


def test_cross_doc_quote_found_exactly(spans):
    """The 12-token quote starts at token 20 in both docs and the
    span covers exactly its K-gram closure [20, 31]."""
    for doc in (0, 1):
        r = spans[(doc, 20)]
        assert r.span_end == 31
        assert r.n_tokens == 12
        # 12 tokens -> 12 - K + 1 duplicated grams
        assert r.n_dup_grams == 12 - _SPAN_K + 1


def test_within_doc_repetition_found(spans):
    """Doc 2's phrase occurs twice IN THE SAME doc — both
    occurrences are spans (corpus-wide count >= 2 includes
    within-doc)."""
    assert (2, 0) in spans
    assert spans[(2, 0)].n_tokens == 10
    assert (2, 30) in spans          # 10 phrase + 20 separator
    assert spans[(2, 30)].n_tokens == 10


def test_no_spurious_spans(spans):
    """Unique filler never appears in any span: exactly the 4
    planted regions exist."""
    assert len(spans) == 4
