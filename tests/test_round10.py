

def test_corpus_dedup_index_reused_and_stable(spark):
    """Round-10: incremental_corpus_dedup probes a PERSISTED corpus
    index (exact-hash map + signatures + band table) — a second
    invocation must reuse the same ready index and return identical
    classifications."""
    import os

    from tests.conftest import SF_SMALL
    from threat_detection_nosql_spark.queries import advanced

    p1 = advanced.ensure_corpus_dedup_index(spark, SF_SMALL)
    assert os.path.exists(os.path.join(p1, "_INDEX_READY"))
    for sub in ("exact", "signatures", "bands"):
        assert os.path.exists(os.path.join(p1, sub)), sub
    assert advanced.ensure_corpus_dedup_index(spark, SF_SMALL) == p1
    a = sorted(map(tuple, advanced.incremental_corpus_dedup(
        spark, SF_SMALL).collect()))
    b = sorted(map(tuple, advanced.incremental_corpus_dedup(
        spark, SF_SMALL).collect()))
    assert a == b and len(a) > 0
