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


# ---------------------------------------------------------------------------
# Signed-random-projection LSH with PORTABLE hyperplanes
# ---------------------------------------------------------------------------

def srp_planes(n_planes: int, dim: int) -> list[list[float]]:
    """Deterministic hyperplanes derived from md5 (the same portable
    hash family as operators/dedup._portable_hash60): component (p, j)
    is hash60(f"{p}:{j}") mapped linearly onto [-1, 1). No engine RNG
    anywhere, so an oracle can reproduce the planes bit-for-bit from
    the same literals."""
    import hashlib
    return [
        [(int(hashlib.md5(f"{p}:{j}".encode()).hexdigest()[:15], 16)
          / float(1 << 59)) - 1.0
         for j in range(dim)]
        for p in range(n_planes)]


def srp_signatures(emb: DataFrame, planes: list[list[float]],
                   band_bits: int = 4, vec_col: str = "v",
                   id_col: str = "vec_id") -> DataFrame:
    """(id, band, sig) per input row: sign bit of the dot product with
    each plane, packed ``band_bits`` bits per band. All n_planes dot
    products are one Arrow-batched GEMM — a single corpus scan, no
    join, no shuffle; the output carries n_planes/band_bits rows per
    vector (the LSH index).

    The n x dim batch matrix multiplies the dim x n_planes plane matrix
    through BLAS inside ``mapInPandas`` — the vectorized-Python fast
    path for dense math that Spark's expression layer would otherwise
    run as interpreted higher-order functions (24 `aggregate(zip_with)`
    siblings measured ~2s on 2k vectors; the GEMM is milliseconds; the
    fully-unrolled flat-arithmetic alternative exceeds janino's method
    limits and falls back to interpretation, worse still). Sign-bit
    semantics (`dot > 0`) are float-robust: summation-order differences
    vs the SQL oracle matter only for dots at ~1e-15, measure-zero for
    real embeddings (oracle agreement is pinned by tests at two scale
    factors)."""
    import numpy as np
    import pandas as pd

    from threat_detection_nosql_spark.sources.readers import spread
    emb = spread(emb)
    plane_mat = np.asarray(planes, dtype=np.float64).T  # dim x n_planes
    n_bands = len(planes) // band_bits
    pack = (1 << np.arange(band_bits)).astype(np.int64)

    def signer(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            vecs = np.vstack(pdf[vec_col].to_numpy())
            bits = (vecs @ plane_mat) > 0
            sigs = bits.reshape(len(pdf), n_bands, band_bits) @ pack
            yield pd.DataFrame({
                id_col: np.repeat(pdf[id_col].to_numpy(), n_bands),
                "band": np.tile(np.arange(n_bands, dtype=np.int32),
                                len(pdf)),
                "sig": sigs.reshape(-1),
            })

    return (emb.select(id_col, vec_col)
            .mapInPandas(signer, schema=f"{id_col} long, band int, sig long"))


def srp_lsh_neighbors(emb: DataFrame, queries: DataFrame, k: int = 5,
                      n_planes: int = 24, band_bits: int = 3,
                      dim: int = 64,
                      queries_in_corpus: bool = False) -> DataFrame:
    """ANN top-k via portable signed-random-projection LSH: candidates
    are (query, corpus) pairs agreeing on at least one band signature;
    only candidates are cosine-scored. The banded index join shuffles
    (id, band, sig) triples — never vectors; vectors are re-attached to
    the candidate pairs by id. Deterministic end-to-end, so the DuckDB
    oracle replays it exactly (queries/advanced.srp_ann_topk)."""
    planes = srp_planes(n_planes, dim)
    c_sig = srp_signatures(emb, planes, band_bits)
    if queries_in_corpus:
        # query ids ⊆ corpus ids: reuse the corpus signatures instead
        # of compiling the n_planes-dot expression tree a second time
        q_ids = queries.select(F.col("q_id").alias("vec_id"))
        q_sig = (c_sig.join(F.broadcast(q_ids), "vec_id")
                 .withColumnRenamed("vec_id", "_qid"))
    else:
        q_sig = (srp_signatures(queries, planes, band_bits, id_col="q_id")
                 .withColumnRenamed("q_id", "_qid"))
    cand = (c_sig.join(q_sig, (c_sig.band == q_sig.band)
                       & (c_sig.sig == q_sig.sig))
            .filter(F.col("_qid") != F.col("vec_id"))
            .select(F.col("_qid").alias("q_id"), "vec_id")
            .distinct())
    return cosine_topk_from_candidates(emb, queries, cand, k)


def cosine_topk_from_candidates(emb: DataFrame, queries: DataFrame,
                                cand: DataFrame, k: int) -> DataFrame:
    """Exact-cosine rescore + per-query top-k over (q_id, vec_id)
    candidate pairs — the shared back half of every candidate-generating
    ANN (SRP sign-LSH, E2LSH bucket join). Cosine runs as a batched
    numpy kernel (the HOF dot runs interpreted — srp_signatures
    rationale); the final HALF_UP rounding stays in Spark so oracle
    round semantics are exact."""
    import numpy as np
    import pandas as pd

    def cosine_batch(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            vv = np.vstack(pdf["v"].to_numpy())
            qq = np.vstack(pdf["q_v"].to_numpy())
            cos = ((vv * qq).sum(axis=1)
                   / (np.linalg.norm(vv, axis=1)
                      * np.linalg.norm(qq, axis=1)))
            yield pd.DataFrame({"q_id": pdf["q_id"],
                                "vec_id": pdf["vec_id"],
                                "raw_cosine": cos})

    corpus = emb.select("vec_id", "v")
    qv = queries.select(F.col("q_id").alias("_qid"),
                        F.col("v").alias("q_v"))
    pairs = (cand.join(corpus, "vec_id")
             .join(F.broadcast(qv), F.col("q_id") == F.col("_qid"))
             .select("q_id", "vec_id", "v", "q_v"))
    scored = (pairs.mapInPandas(
        cosine_batch, schema="q_id long, vec_id long, raw_cosine double")
        .select("q_id", "vec_id",
                F.round("raw_cosine", 6).alias("cosine")))
    w = Window.partitionBy("q_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("q_id", "vec_id", "cosine", "rank"))


# ---------------------------------------------------------------------------
# Portable E2LSH (p-stable Euclidean bucket LSH, Datar et al. 2004)
# ---------------------------------------------------------------------------


def e2lsh_params(n_tables: int, n_proj: int, dim: int,
                 bucket_w: float) -> tuple[list[list[list[float]]],
                                           list[list[float]]]:
    """Deterministic E2LSH parameters from md5 (the srp_planes
    derivation): per (table t, projection i) a UNIT direction vector
    (components hash60(f"e2:{t}:{i}:{j}") mapped onto [-1, 1), then
    L2-normalized — driver-side Python floats, emitted as literals so
    the oracle replays the normalized values exactly), and an offset b
    in [0, bucket_w) from hash60(f"e2b:{t}:{i}"). Classic E2LSH draws
    Gaussian directions; the uniform family keeps the locality
    property (close vectors land in equal or adjacent buckets) and is
    what the md5 derivation can replay in SQL."""
    import hashlib
    import math

    def h60(s: str) -> int:
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    dirs = []
    for t in range(n_tables):
        tbl = []
        for i in range(n_proj):
            raw = [h60(f"e2:{t}:{i}:{j}") / float(1 << 59) - 1.0
                   for j in range(dim)]
            nrm = math.sqrt(sum(c * c for c in raw))
            tbl.append([c / nrm for c in raw])
        dirs.append(tbl)
    offs = [[h60(f"e2b:{t}:{i}") / float(1 << 60) * bucket_w
             for i in range(n_proj)]
            for t in range(n_tables)]
    return dirs, offs


_E2_BASE = 1000   # per-projection bucket ids packed base-1000
_E2_SHIFT = 500   # bucket ids recentered to >=0 before packing


def e2lsh_keys(emb: DataFrame, dirs, offs, bucket_w: float,
               id_col: str = "vec_id") -> DataFrame:
    """(id, tbl, key) per input row: each table's key packs its
    ``n_proj`` bucket ids floor((v·r/‖v‖ + b)/w) into one BIGINT
    (bucket + 500, base-1000 positional — projections of unit vectors
    against [-1,1)^dim directions stay far inside ±500). One Arrow
    GEMM per batch, mirroring srp_signatures; the raw dot runs first
    and the norm divides after, matching the SQL oracle's
    list_dot_product(v,r)/sqrt(list_dot_product(v,v)) op order. Floor
    at a bucket boundary is the same measure-zero float caveat as
    SRP's sign bit (boundary hits need the dot within ~1e-15 of an
    exact boundary; pinned green at two scale factors)."""
    import numpy as np
    import pandas as pd

    from threat_detection_nosql_spark.sources.readers import spread
    emb = spread(emb)
    n_tables, n_proj = len(dirs), len(dirs[0])
    plane_mat = np.asarray(
        [d for tbl in dirs for d in tbl], dtype=np.float64).T
    b_vec = np.asarray([b for tbl in offs for b in tbl],
                       dtype=np.float64)
    mult = (_E2_BASE ** np.arange(n_proj)).astype(np.int64)

    def keyer(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            vecs = np.vstack(pdf["v"].to_numpy())
            raw = vecs @ plane_mat
            norms = np.linalg.norm(vecs, axis=1)
            bk = np.floor((raw / norms[:, None] + b_vec)
                          / bucket_w).astype(np.int64)
            keys = ((bk.reshape(len(pdf), n_tables, n_proj) + _E2_SHIFT)
                    * mult).sum(axis=2)
            yield pd.DataFrame({
                id_col: np.repeat(pdf[id_col].to_numpy(), n_tables),
                "tbl": np.tile(np.arange(n_tables, dtype=np.int32),
                               len(pdf)),
                "key": keys.reshape(-1),
            })

    return (emb.select(id_col, "v")
            .mapInPandas(keyer, schema=f"{id_col} long, tbl int, key long"))


def e2lsh_neighbors(emb: DataFrame, queries: DataFrame, k: int = 5,
                    n_tables: int = 8, n_proj: int = 1,
                    bucket_w: float = 0.1, dim: int = 64,
                    queries_in_corpus: bool = False) -> DataFrame:
    """ANN top-k via portable E2LSH: candidates are (query, corpus)
    pairs whose ``n_proj`` quantized projections agree in at least one
    table; only candidates are cosine-scored. Fully deterministic
    (md5-derived directions/offsets), so a DuckDB oracle replays
    bucketing, candidate join and scoring exactly
    (queries/advanced.lsh_ann_topk) — the oracle-backed replacement
    for the Spark-RNG BucketedRandomProjectionLSH variant
    (lsh_cosine_neighbors, kept for MLlib parity in tests)."""
    dirs, offs = e2lsh_params(n_tables, n_proj, dim, bucket_w)
    c_key = e2lsh_keys(emb, dirs, offs, bucket_w)
    if queries_in_corpus:
        q_ids = queries.select(F.col("q_id").alias("vec_id"))
        q_key = (c_key.join(F.broadcast(q_ids), "vec_id")
                 .withColumnRenamed("vec_id", "_qid"))
    else:
        q_key = (e2lsh_keys(queries, dirs, offs, bucket_w, id_col="q_id")
                 .withColumnRenamed("q_id", "_qid"))
    cand = (c_key.join(q_key, (c_key.tbl == q_key.tbl)
                       & (c_key.key == q_key.key))
            .filter(F.col("_qid") != F.col("vec_id"))
            .select(F.col("_qid").alias("q_id"), "vec_id")
            .distinct())
    return cosine_topk_from_candidates(emb, queries, cand, k)
