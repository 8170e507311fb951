"""Approximate nearest-neighbor search over embedding columns
(BASELINE.json north star: similarity search at 100 TB).

Two scale paths above the brute-force baseline (queries/pipeline.py
``cosine_topk``):

- **BucketedRandomProjectionLSH** (Spark ML): Euclidean-bucket join;
  with L2-normalized vectors, Euclidean distance is monotone in cosine
  (d² = 2 − 2cos), so bucketing normalized vectors answers cosine ANN.
- **IVF (inverted file)**: KMeans coarse quantizer → search only the
  ``n_probe`` nearest cells — the shuffle is bounded by cell sizes, the
  centroid table broadcasts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_DOT = "aggregate(zip_with({a}, {b}, (x, y) -> x * y), 0D, (acc, x) -> acc + x)"


def _l2_normalize(df: DataFrame, vec_col: str = "v") -> DataFrame:
    norm = F.sqrt(F.aggregate(F.transform(F.col(vec_col), lambda x: x * x),
                              F.lit(0.0), lambda a, x: a + x))
    # divide via zip_with against a repeated-norm array: `norm` appears
    # as a plain (non-lambda) argument, so it evaluates once per row —
    # inside a transform lambda CollapseProject would inline it and
    # recompute the full O(d) aggregate per element (O(d²) per row)
    return df.withColumn(
        vec_col, F.zip_with(F.col(vec_col),
                            F.array_repeat(norm, F.size(F.col(vec_col))),
                            lambda x, n: x / n))


def lsh_cosine_neighbors(emb: DataFrame, queries: DataFrame,
                         k: int = 5, bucket_length: float = 0.5,
                         num_hash_tables: int = 4,
                         seed: int = 42) -> DataFrame:
    """ANN top-k via BucketedRandomProjectionLSH on L2-normalized
    vectors. ``emb``/``queries``: (vec_id|q_id, v array<double>).
    Returns (q_id, vec_id, cosine, rank) — approximate: only pairs
    colliding in ≥1 hash bucket are scored.
    """
    from pyspark.ml.feature import BucketedRandomProjectionLSH
    from pyspark.ml.functions import array_to_vector

    corpus = _l2_normalize(emb).withColumn(
        "features", array_to_vector("v"))
    qs = _l2_normalize(queries.withColumnRenamed("q_id", "vec_id")) \
        .withColumn("features", array_to_vector("v"))
    lsh = BucketedRandomProjectionLSH(
        inputCol="features", outputCol="hashes",
        bucketLength=bucket_length, numHashTables=num_hash_tables,
        seed=seed)
    model = lsh.fit(corpus)
    # threshold 2.0 = the max possible L2 distance of unit vectors:
    # candidate generation is purely bucket-collision driven
    joined = model.approxSimilarityJoin(qs, corpus, 2.0, distCol="d")
    scored = (joined
              .select(F.col("datasetA.vec_id").alias("q_id"),
                      F.col("datasetB.vec_id").alias("vec_id"),
                      # unit vectors: cos = 1 - d²/2
                      F.round(1 - F.col("d") * F.col("d") / 2, 6)
                      .alias("cosine"))
              .filter(F.col("q_id") != F.col("vec_id")))
    w = Window.partitionBy("q_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k))


def ivf_cosine_neighbors(emb: DataFrame, queries: DataFrame,
                         k: int = 5, n_cells: int = 16,
                         n_probe: int = 4, seed: int = 42) -> DataFrame:
    """IVF ANN: KMeans coarse quantizer over normalized vectors;
    each query searches its ``n_probe`` closest cells only.

    At 100 TB: the corpus is written partitioned by ``cell`` once;
    per-query work is a broadcast of (q_id, probe cells) against the
    pruned partitions — no corpus-wide shuffle per query batch.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    corpus = _l2_normalize(emb).withColumn("features",
                                           array_to_vector("v"))
    km = KMeans(k=n_cells, seed=seed, featuresCol="features",
                predictionCol="cell")
    model = km.fit(corpus)
    assigned = model.transform(corpus).select("vec_id", "v", "cell")

    centers = [c.tolist() for c in model.clusterCenters()]
    centers_df = (emb.sparkSession
                  .createDataFrame([(i, c) for i, c in enumerate(centers)],
                                   "cell int, center array<double>"))
    qs = _l2_normalize(queries)
    q_cells = (qs.crossJoin(F.broadcast(centers_df))
               .withColumn("qc_dot", F.expr(_DOT.format(a="v", b="center")))
               .withColumn("rk", F.row_number().over(
                   Window.partitionBy("q_id")
                   .orderBy(F.desc("qc_dot"), F.asc("cell"))))
               .filter(F.col("rk") <= n_probe)
               .select("q_id", F.col("v").alias("q_v"), "cell"))

    scored = (assigned.join(F.broadcast(q_cells), "cell")
              .filter(F.col("q_id") != F.col("vec_id"))
              .withColumn("cosine", F.round(
                  F.expr(_DOT.format(a="v", b="q_v")), 6))
              .select("q_id", "vec_id", "cosine"))
    w = Window.partitionBy("q_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k))
