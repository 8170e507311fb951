"""Corpus-curation queries (queries/corpus.py): semantics that the
oracle hash can't see — sampling determinism under repartitioning,
packing budget invariants, salted-join equivalence."""

import pytest
from pyspark.sql import functions as F

from threat_detection_nosql_spark.operators import packing, sampling, skew
from threat_detection_nosql_spark.queries import corpus

SF = "/root/testdata/sf0.001"


def test_hash_sample_partition_invariant(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    a = sampling.hash_sample(docs, "doc_id", 0.2)
    b = sampling.hash_sample(docs.repartition(17, "source"), "doc_id", 0.2)
    ids_a = {r.doc_id for r in a.select("doc_id").collect()}
    ids_b = {r.doc_id for r in b.select("doc_id").collect()}
    assert ids_a == ids_b and 0 < len(ids_a) < docs.count()


def test_hash_sample_rate_roughly_holds(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    n = docs.count()
    kept = sampling.hash_sample(docs, "doc_id", 0.5).count()
    assert abs(kept / n - 0.5) < 0.15  # md5 buckets ≈ uniform


def test_stratified_rates_differ_by_stratum(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    out = sampling.stratified_hash_sample(
        docs, "doc_id", "source", {"src0": 1.0}, default=0.0)
    srcs = {r.source for r in out.select("source").distinct().collect()}
    assert srcs == {"src0"}


def test_packing_respects_budget_starts(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    with_tok = docs.select(
        "doc_id", "source",
        F.size(F.split("text", r"\s+")).alias("n_tokens"))
    out = packing.pack_by_budget(with_tok, "n_tokens", 256,
                                 shard="source", order="doc_id").toPandas()
    # within each shard, bins are contiguous from 0 and each doc's
    # start offset lies in [bin*budget, (bin+1)*budget)
    for src, grp in out.groupby("source"):
        grp = grp.sort_values("doc_id")
        start = 0
        for _, row in grp.iterrows():
            assert row["bin"] == start // 256
            start += row["n_tokens"]
        assert set(grp["bin"]) == set(range(int(grp["bin"].max()) + 1))


def test_salted_join_matches_plain_join(spark):
    ev = (spark.read.parquet(f"{SF}/events.parquet")
          .select("user_id", "value"))
    cust = (spark.read.parquet(f"{SF}/customer.parquet")
            .select(F.col("c_custkey").alias("user_id"), "c_nationkey"))
    salted = skew.salted_join(ev, cust, "user_id", n_salts=4)
    plain = ev.join(cust, "user_id")
    assert salted.count() == plain.count()
    a = salted.groupBy("c_nationkey").count().toPandas() \
        .sort_values("c_nationkey").reset_index(drop=True)
    b = plain.groupBy("c_nationkey").count().toPandas() \
        .sort_values("c_nationkey").reset_index(drop=True)
    assert a.equals(b)


def test_repetition_stats_flags_repeated_doc(spark):
    df = spark.createDataFrame(
        [(1, "spam spam spam spam", "en", "s", 19),
         (2, "all words here differ fully", "en", "s", 27)],
        "doc_id long, text string, lang string, source string, "
        "n_chars long")
    import os
    import tempfile
    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(os.path.join(d, "documents.parquet"))
        out = {r.doc_id: r for r in
               corpus.repetition_stats(spark, d).collect()}
    assert out[1].distinct_token_ratio == 0.25
    assert out[1].top_token_frac == 1.0
    assert out[1].dup_2gram_frac == pytest.approx(2 / 3)
    assert out[2].distinct_token_ratio == 1.0
    assert out[2].dup_2gram_frac == 0.0


def test_normalized_hash_collapses_case_and_digits(spark):
    import os
    import tempfile
    df = spark.createDataFrame(
        [(1, "Hello   World 123", "en", "s", 17),
         (2, "hello world 999", "en", "s", 15)],
        "doc_id long, text string, lang string, source string, "
        "n_chars long")
    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(os.path.join(d, "documents.parquet"))
        out = corpus.normalized_text_hash(spark, d).collect()
    hashes = {r.doc_id: r.norm_hash for r in out}
    assert hashes[1] == hashes[2]  # same canonical form


def test_split_assignment_stable_and_exhaustive(spark):
    from threat_detection_nosql_spark.queries import corpus
    out = corpus.dataset_split_assignment(spark, SF).toPandas()
    assert set(out["split"]) <= {"train", "valid", "test"}
    # heavily skewed toward train (98/1/1 buckets)
    assert (out["split"] == "train").mean() > 0.9
    again = corpus.dataset_split_assignment(spark, SF).toPandas()
    assert out.sort_values("doc_id").reset_index(drop=True).equals(
        again.sort_values("doc_id").reset_index(drop=True))


def test_semantic_dedup_pairs_only_within_cluster(spark):
    from threat_detection_nosql_spark.queries import corpus
    out = corpus.semantic_cluster_dedup(spark, SF)
    pdf = out.toPandas()
    assert len(pdf) == spark.read.parquet(
        f"{SF}/embeddings.parquet").count()
    assert set(pdf["cluster_id"]) <= set(range(corpus._N_SEEDS))
    assert pdf["is_semantic_dup"].isin([0, 1]).all()


def test_curation_pipeline_stage_monotonicity(spark):
    """The stage funnel must only shrink: sampled ⊆ deduped ⊆ quality
    ⊆ input per source, and sampled token mass is positive wherever
    docs survive."""
    from tests.conftest import SF_DIR
    from threat_detection_nosql_spark.queries.corpus import (
        corpus_curation_pipeline,
    )
    for r in corpus_curation_pipeline(spark, SF_DIR).collect():
        n_input = r["n_input"]
        n_quality = r["n_quality"] or 0
        n_deduped = r["n_deduped"] or 0
        n_sampled = r["n_sampled"] or 0
        assert n_input >= n_quality >= n_deduped >= n_sampled >= 0
        if n_sampled:
            assert r["sampled_tokens"] > 0


def test_nb_classifier_separable_fixture(spark, tmp_path):
    """On a corpus whose languages use disjoint vocabularies Naive
    Bayes must classify every held-out doc correctly (the registered
    documents table shares one vocab across langs, so accuracy there
    only measures frequency skew — this pins that the MODEL works)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from threat_detection_nosql_spark.queries.corpus import (
        nb_lang_predictions)

    texts = {"en": "dog cat house tree", "fr": "chien chat maison arbre"}
    rows = []
    for i in range(20):  # doc_id % 5 == 0 held out -> 4 test docs
        lang = "en" if i % 2 == 0 else "fr"
        rows.append((i, texts[lang] + f" {texts[lang].split()[i % 4]}",
                     lang))
    table = pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows]),
        "lang": pa.array([r[2] for r in rows]),
        "source": pa.array(["t"] * len(rows)),
        "n_chars": pa.array([len(r[1]) for r in rows], pa.int64()),
    })
    pq.write_table(table, str(tmp_path / "documents.parquet"))

    got = nb_lang_predictions(spark, str(tmp_path)).collect()
    assert len(got) == 4
    assert all(r["correct"] == 1 for r in got)
    assert {r["actual_lang"] for r in got} == {"en", "fr"}
