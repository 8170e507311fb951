"""Rows-only queries: hash-seeded / ML-backed operators whose values
are Spark-specific by construction (MinHash/SimHash/LSH use Spark's
xxhash64 & MLlib signatures; no DuckDB oracle can reproduce them).
The driver records rows-only checks; unit tests with planted
duplicates assert the semantics (tests/test_dedup.py,
tests/test_similarity.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from threat_detection_nosql_spark.operators import dedup, multimodal, similarity
from threat_detection_nosql_spark.sources.readers import load_table


def minhash_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return dedup.minhash_near_dup_pairs(docs, jaccard_threshold=0.9)


def minhash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return dedup.minhash_dedup_keep(docs, jaccard_threshold=0.5)


def simhash_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return dedup.simhash_fingerprints(docs)


def simhash_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return dedup.simhash_near_dup_pairs(docs, max_hamming=3)


def winnowing_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return dedup.winnowing_fingerprints(docs)


def fingerprint_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return dedup.fingerprint_overlap_pairs(docs)


def _emb_and_queries(spark: SparkSession, sf_dir: str):
    emb = (load_table(spark, sf_dir, "embeddings")
           .select("vec_id",
                   F.col("embedding").cast("array<double>").alias("v")))
    qs = (emb.filter(F.col("vec_id") < 8)
          .select(F.col("vec_id").alias("q_id"), "v"))
    return emb, qs


def lsh_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb, qs = _emb_and_queries(spark, sf_dir)
    return similarity.lsh_cosine_neighbors(emb, qs, k=5)


def ivf_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb, qs = _emb_and_queries(spark, sf_dir)
    return similarity.ivf_cosine_neighbors(emb, qs, k=5)


def media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    media = multimodal.attach_fake_media(docs)
    feats = multimodal.extract_media_features(media)
    # the driver's canonicalizer hashes atomic columns only; serialize
    # the feature vector to a rounded JSON string at the query surface
    return feats.select(
        "doc_id", "media_type", "feat_dim",
        F.to_json(F.transform("features",
                              lambda x: F.round(x.cast("double"), 6)))
         .alias("features_json"))


def media_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return multimodal.frame_sample(multimodal.attach_fake_media(docs))


QUERIES = {
    "minhash_near_dups": minhash_near_dups,
    "minhash_dedup": minhash_dedup,
    "simhash_fingerprints": simhash_fingerprints,
    "simhash_near_dups": simhash_near_dups,
    "winnowing_fingerprints": winnowing_fingerprints,
    "fingerprint_overlap": fingerprint_overlap,
    "lsh_ann_topk": lsh_ann_topk,
    "ivf_ann_topk": ivf_ann_topk,
    "media_features": media_features,
    "media_frame_sample": media_frame_sample,
}

ORACLES: dict[str, str] = {}  # rows-only by construction (see module doc)
