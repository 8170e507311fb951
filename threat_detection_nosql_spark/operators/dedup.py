"""Near-duplicate detection operators — the subquadratic scale paths
(SURVEY.md §7 step 8; BASELINE.json LLM-pipeline north star).

Three families, all shuffle-bounded and driver-light:

- **MinHash + LSH** via Spark ML (`HashingTF` → `MinHashLSH` →
  `approxSimilarityJoin`): candidate pairs are generated per hash-band
  bucket, O(n·bands) not O(n²).
- **SimHash**: 60-bit fingerprint from token hashes, built entirely from
  JVM expressions (explode → conditional bit sums → one groupBy);
  Hamming candidates via banded chunk-equality joins, verified with
  ``bit_count(a XOR b)``.
- **Winnowing fingerprints**: k-char rolling hashes + sliding-window
  minima (array expressions, no UDF) — the standard document
  fingerprinting scheme for plagiarism/near-dup at corpus scale.

Hashing is PORTABLE by default: a 60-bit value drawn from md5 hex
(`_portable_hash60`), which Spark and DuckDB compute bit-identically —
so SimHash, winnowing, and the signature-based MinHash are fully
oracle-checkable. The Spark-ML MinHashLSH path (xxhash64/MLlib
signatures, engine-specific by construction) remains as the
`minhash_near_dup_pairs` alternative and is checked rows-only.
Unit tests plant known duplicates for the semantics either way.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _portable_hash60(c: Column | str) -> Column:
    """60-bit hash = first 15 hex digits of md5, as a BIGINT.

    md5 is the one hash both engines expose identically, so every
    operator built on this is reproducible in the DuckDB oracle:
    Spark `conv(substring(md5(x),1,15),16,10)` ==
    DuckDB `CAST(('0x' || substr(md5(x),1,15)) AS BIGINT)`.
    60 bits stays clear of the BIGINT sign bit.
    """
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")

# ---------------------------------------------------------------------------
# MinHash + LSH (Spark ML)
# ---------------------------------------------------------------------------


def minhash_near_dup_pairs(docs: DataFrame,
                           jaccard_threshold: float = 0.5,
                           num_hash_tables: int = 8,
                           shingle_len: int = 3,
                           num_features: int = 1 << 18,
                           seed: int = 42) -> DataFrame:
    """Candidate near-dup pairs with Jaccard *distance* below threshold.

    Pipeline: word shingles → sparse binary term vector (HashingTF) →
    MinHashLSH signatures → approxSimilarityJoin (band-bucket join).
    Returns (doc_a, doc_b, jaccard_dist), doc_a < doc_b.
    """
    from pyspark.ml.feature import HashingTF, MinHashLSH

    w = F.split(F.col("text"), r"\s+")
    # k-grams via zip_with over k shifted slices: the lambda bodies
    # reference only lambda variables, so the split is evaluated O(k)
    # times per row. The element_at-inside-transform formulation gets
    # the outer `w` inlined by CollapseProject and re-splits the text
    # once per element access (~10× slower on this corpus).
    n_sh = F.greatest(F.size(w) - shingle_len + 1, F.lit(0))
    grams = F.slice(w, 1, n_sh)
    for j in range(1, shingle_len):
        grams = F.zip_with(grams, F.slice(w, j + 1, n_sh),
                           lambda a, b: F.concat_ws(" ", a, b))
    shingled = (docs
                .filter(F.size(w) >= shingle_len)
                .select("doc_id", F.array_distinct(grams).alias("shingles")))
    tf = HashingTF(inputCol="shingles", outputCol="features",
                   numFeatures=num_features, binary=True)
    # cache: the shingle+TF projection is the expensive stage (array
    # lambdas are interpreted), and approxSimilarityJoin scans it once
    # per side — uncached it re-vectorizes the corpus 2-3×
    vec = tf.transform(shingled).filter(
        F.expr("size(shingles) > 0")).cache()
    lsh = MinHashLSH(inputCol="features", outputCol="hashes",
                     numHashTables=num_hash_tables, seed=seed)
    model = lsh.fit(vec)
    pairs = model.approxSimilarityJoin(vec, vec, jaccard_threshold,
                                       distCol="jaccard_dist")
    out = (pairs
           .select(F.col("datasetA.doc_id").alias("doc_a"),
                   F.col("datasetB.doc_id").alias("doc_b"),
                   F.round("jaccard_dist", 6).alias("jaccard_dist"))
           .filter(F.col("doc_a") < F.col("doc_b")))
    # scope the TF cache to this call: materialize the (near-dup-pair)
    # result eagerly, then release the vectorized-corpus blocks so
    # repeated invocations don't accumulate cached storage
    out = out.localCheckpoint(eager=True)
    vec.unpersist()
    return out


def minhash_dedup_keep(docs: DataFrame,
                       jaccard_threshold: float = 0.3,
                       **kwargs) -> DataFrame:
    """Dedup decision: keep-lowest-doc_id per near-dup *component*
    (single-link clusters via full connected components — a chain
    A~B~C collapses to one canonical doc even though A and C never
    pair directly)."""
    pairs = minhash_near_dup_pairs(docs, jaccard_threshold, **kwargs)
    comp = connected_components(pairs)
    return (docs.join(comp, "doc_id", "left")
            .select("doc_id",
                    F.coalesce("comp", "doc_id").alias("canonical_id"),
                    (F.col("comp").isNotNull()
                     & (F.col("comp") != F.col("doc_id")))
                    .alias("is_duplicate")))


# ---------------------------------------------------------------------------
# MinHash signatures (portable hash — oracle-checkable LSH)
# ---------------------------------------------------------------------------


_MH_PRIME = 2147483647  # 2^31 − 1: a_i·x stays < 2^62, BIGINT-safe


def minhash_params(n_hashes: int) -> list[tuple[int, int]]:
    """Deterministic (aᵢ, bᵢ) for the affine permutation family
    hᵢ(x) = (aᵢ·x + bᵢ) mod p over GF(2³¹−1) — a universal hash
    family, derived from md5 like operators/similarity.srp_planes so
    the oracle reproduces the constants from the same literals."""
    import hashlib

    def h60(s: str) -> int:
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    return [(h60(f"mh_a{i}") % (_MH_PRIME - 1) + 1,
             h60(f"mh_b{i}") % _MH_PRIME)
            for i in range(n_hashes)]


def minhash_shingles(docs: DataFrame,
                     shingle_len: int = 3) -> DataFrame:
    """The distinct word-shingle set behind the MinHash family —
    (doc_id, shingle), k-grams via zip_with over shifted slices, docs
    shorter than one shingle dropped. Factored out so the calibration
    audit measures EXACT Jaccard over the very same sets the
    signatures sketch (queries/advanced.minhash_calibration_report)."""
    from threat_detection_nosql_spark.sources.readers import spread
    docs = spread(docs)
    w = F.split(F.col("text"), r"\s+")
    n_sh = F.greatest(F.size(w) - shingle_len + 1, F.lit(0))
    grams = F.slice(w, 1, n_sh)
    for j in range(1, shingle_len):
        grams = F.zip_with(grams, F.slice(w, j + 1, n_sh),
                           lambda a, b: F.concat_ws(" ", a, b))
    return (docs
            .filter(F.size(w) >= shingle_len)
            .select("doc_id",
                    F.explode(F.array_distinct(grams)).alias("shingle")))


def minhash_signatures(docs: DataFrame, n_hashes: int = 16,
                       shingle_len: int = 3) -> DataFrame:
    """Classic k-permutation MinHash signature per doc: the min over
    the doc's distinct word-shingles of ``n_hashes`` permutations of a
    SINGLE base hash — hᵢ(x) = (aᵢ·x + bᵢ) mod 2³¹−1 over
    x = hash60(shingle) mod p (an affine universal family). One md5
    per shingle instead of n_hashes md5s (md5 was ~95% of the stage
    cost); the permutations are integer multiply-adds inside codegen.
    One explode + ONE groupBy computing all components (map-side
    partials make the shuffle |docs|×1 row). Deterministic constants →
    bit-identical in the DuckDB oracle. Returns (doc_id, s0..s{n-1})."""
    sh = (minhash_shingles(docs, shingle_len)
          .withColumn("x", _portable_hash60(F.col("shingle"))
                      % F.lit(_MH_PRIME)))
    aggs = [
        F.min((F.lit(a) * F.col("x") + F.lit(b)) % F.lit(_MH_PRIME))
        .alias(f"s{i}")
        for i, (a, b) in enumerate(minhash_params(n_hashes))
    ]
    return sh.groupBy("doc_id").agg(*aggs)


def minhash_signature_near_dups(docs: DataFrame, n_hashes: int = 16,
                                n_bands: int = 8, shingle_len: int = 3,
                                min_est_jaccard: float = 0.0) -> DataFrame:
    """Banded-LSH candidate pairs with estimated Jaccard, end-to-end
    deterministic: signatures → band keys (rows_per_band = n_hashes /
    n_bands consecutive components per band) → equi-join on the band
    struct (candidates ONLY where a full band collides — O(n·bands)
    rows, never all-pairs) → estimated Jaccard = fraction of agreeing
    signature components. Pairs with est < (1/r)-ish similarity are
    unlikely to share a band — the standard LSH S-curve tradeoff.
    Returns (doc_a, doc_b, est_jaccard), doc_a < doc_b."""
    assert n_hashes % n_bands == 0, "n_bands must divide n_hashes"
    r = n_hashes // n_bands
    sig = minhash_signatures(docs, n_hashes, shingle_len).cache()
    bands = sig.select(
        "doc_id",
        F.explode(F.array(*[
            F.struct(F.lit(b).alias("band"),
                     *[F.col(f"s{b * r + j}").alias(f"v{j}")
                       for j in range(r)])
            for b in range(n_bands)])).alias("bk"))
    a = bands.select(F.col("doc_id").alias("doc_a"), "bk")
    bb = bands.select(F.col("doc_id").alias("doc_b"), "bk")
    cand = (a.join(bb, "bk")
            .filter(F.col("doc_a") < F.col("doc_b"))
            .select("doc_a", "doc_b").distinct())
    sa = sig.select(F.col("doc_id").alias("doc_a"),
                    *[F.col(f"s{i}").alias(f"_a{i}")
                      for i in range(n_hashes)])
    sb = sig.select(F.col("doc_id").alias("doc_b"),
                    *[F.col(f"s{i}").alias(f"_b{i}")
                      for i in range(n_hashes)])
    est = sum(F.when(F.col(f"_a{i}") == F.col(f"_b{i}"), 1).otherwise(0)
              for i in range(n_hashes)) / float(n_hashes)
    return (cand.join(sa, "doc_a").join(sb, "doc_b")
            .select("doc_a", "doc_b", F.round(est, 6).alias("est_jaccard"))
            .filter(F.col("est_jaccard") >= min_est_jaccard))


# ---------------------------------------------------------------------------
# SimHash (pure expressions)
# ---------------------------------------------------------------------------

_SIMHASH_BITS = 60  # stay clear of the sign bit of a Spark LongType


def simhash_fingerprints(docs: DataFrame,
                         bits: int = _SIMHASH_BITS) -> DataFrame:
    """60-bit SimHash per doc: token → portable md5-based hash60 →
    per-bit ±1 sums → sign → packed bigint. One explode + one groupBy
    (map-side partial aggregation makes the shuffle |docs|×1 row).
    Oracle-checkable: DuckDB reproduces the hash bit-for-bit."""
    from threat_detection_nosql_spark.sources.readers import spread
    docs = spread(docs)
    tok = (docs
           .select("doc_id",
                   F.explode(F.split(F.col("text"), r"\s+")).alias("tok"))
           .withColumn("h", _portable_hash60(F.col("tok"))))
    bit_sums = [
        F.sum(F.when(F.shiftright("h", i).bitwiseAND(F.lit(1)) == 1, 1)
              .otherwise(-1)).alias(f"b{i}")
        for i in range(bits)
    ]
    agg = tok.groupBy("doc_id").agg(*bit_sums)
    fp = None
    for i in range(bits):
        term = F.when(F.col(f"b{i}") > 0, F.lit(1 << i)).otherwise(F.lit(0))
        fp = term if fp is None else fp + term
    return agg.select("doc_id", fp.cast("long").alias("simhash"))


def simhash_near_dup_pairs(docs: DataFrame,
                           max_hamming: int = 8,
                           n_bands: int | None = None,
                           bits: int = _SIMHASH_BITS) -> DataFrame:
    """Pairs within Hamming distance: band the fingerprint into
    ``n_bands`` chunks that PARTITION all ``bits`` (uneven widths when
    they don't divide evenly); by pigeonhole any pair within distance
    < n_bands must share a chunk. ``n_bands`` defaults to
    ``max_hamming + 1`` so the default configuration is exact;
    passing a smaller ``n_bands`` opts into the recall-tuned
    (incomplete, cheaper) candidate generator explicitly. Verify with
    bit_count(xor)."""
    if n_bands is None:
        n_bands = max_hamming + 1
    fp = simhash_fingerprints(docs, bits).cache()
    # partition [0, bits) into n_bands contiguous chunks covering every
    # bit: first (bits % n_bands) bands get an extra bit
    base, extra = divmod(bits, n_bands)
    starts, s = [], 0
    widths = [base + (1 if i < extra else 0) for i in range(n_bands)]
    for wd in widths:
        starts.append(s)
        s += wd
    bands = fp.select(
        "doc_id", "simhash",
        F.explode(F.array(*[
            F.struct(F.lit(i).alias("band"),
                     F.shiftright("simhash", starts[i])
                      .bitwiseAND(F.lit((1 << widths[i]) - 1))
                      .alias("chunk"))
            for i in range(n_bands)])).alias("b"))
    a = bands.select(F.col("doc_id").alias("doc_a"),
                     F.col("simhash").alias("sim_a"), "b")
    bb = bands.select(F.col("doc_id").alias("doc_b"),
                      F.col("simhash").alias("sim_b"), "b")
    return (a.join(bb, "b")
            .filter(F.col("doc_a") < F.col("doc_b"))
            .dropDuplicates(["doc_a", "doc_b"])
            .withColumn("hamming", F.bit_count(
                F.col("sim_a").bitwiseXOR(F.col("sim_b"))))
            .filter(F.col("hamming") <= max_hamming)
            .select("doc_a", "doc_b", "hamming"))


# ---------------------------------------------------------------------------
# Winnowing fingerprints (rolling hash, array expressions)
# ---------------------------------------------------------------------------


def winnowing_fingerprints(docs: DataFrame, k: int = 8,
                           window: int = 16) -> DataFrame:
    """Document fingerprinting via winnowing: hash every k-char gram,
    keep the minimum of each sliding window, distinct per doc.

    Formulated as posexplode → sliding-window ``min`` (rowsBetween) →
    distinct, NOT as nested array expressions: an array formulation
    (`transform(sequence(...), j -> array_min(slice(grams, j, w)))`)
    gets its `grams` subexpression inlined by Catalyst's
    CollapseProject into the per-window lambda, re-hashing every k-gram
    once per window — O(len²·k) interpreted work (measured 60s for 500
    short docs). The row formulation hashes each gram exactly once,
    runs the window min in one pass, and keeps per-doc state bounded
    (no giant arrays) — the shape that survives book-length documents.
    """
    from pyspark.sql.window import Window

    from threat_detection_nosql_spark.sources.readers import spread
    docs = spread(docs)

    gram_hashes = F.expr(
        f"transform(sequence(1, greatest(length(text) - {k - 1}, 0)),"
        f" i -> cast(conv(substr(md5(substring(text, i, {k})), 1, 15),"
        f" 16, 10) as bigint))")
    grams = (docs
             .select("doc_id", F.posexplode(gram_hashes)
                     .alias("pos", "h")))
    w = (Window.partitionBy("doc_id").orderBy("pos")
         .rowsBetween(Window.currentRow, window - 1))
    n = Window.partitionBy("doc_id")
    return (grams
            .withColumn("winmin", F.min("h").over(w))
            .withColumn("n_grams", F.count("*").over(n))
            .filter(F.col("pos") <= F.col("n_grams") - window)
            .select("doc_id", F.col("winmin").alias("fingerprint"))
            .distinct())


def fingerprint_overlap_pairs(docs: DataFrame, k: int = 8,
                              window: int = 16,
                              min_shared: int = 2,
                              max_df: int = 64) -> DataFrame:
    """Docs sharing ≥ min_shared winnowing fingerprints — equi-join on
    fingerprint (candidates only where hashes collide), count per pair.

    ``max_df`` drops *stop fingerprints* (present in > max_df docs)
    before the self-join — the standard winnowing-corpus practice
    (MOSS-style): a fingerprint shared by half the corpus carries no
    near-dup signal but contributes df² join pairs. Without the cap a
    hot fingerprint makes the join quadratic in corpus size; with it
    the pair count is bounded by |fingerprints| × max_df². Fingerprints
    with df == 1 can't form a pair and are dropped for the same reason.
    """
    fp = winnowing_fingerprints(docs, k, window).cache()
    df_count = (fp.groupBy("fingerprint")
                .agg(F.count("*").alias("df"))
                .filter((F.col("df") >= 2) & (F.col("df") <= max_df)))
    fp = fp.join(df_count.select("fingerprint"), "fingerprint")
    a = fp.select(F.col("doc_id").alias("doc_a"), "fingerprint")
    b = fp.select(F.col("doc_id").alias("doc_b"), "fingerprint")
    return (a.join(b, "fingerprint")
            .filter(F.col("doc_a") < F.col("doc_b"))
            .groupBy("doc_a", "doc_b")
            .agg(F.count("*").alias("shared_fingerprints"))
            .filter(F.col("shared_fingerprints") >= min_shared))


# ---------------------------------------------------------------------------
# Connected components (for dedup clusters)
# ---------------------------------------------------------------------------


def connected_components(pairs: DataFrame, max_iter: int = 20) -> DataFrame:
    """Dedup-shaped façade over the shared min-label-propagation
    primitive (operators/graph.connected_components — one
    implementation serves near-dup closure, DBSCAN cluster assignment
    and graph queries): takes (doc_a, doc_b) pair rows, returns
    (doc_id, comp) where comp is the smallest doc_id reachable.

    At extreme scale the alternating large-star/small-star algorithm
    (Kiveris et al., "Connected Components in MapReduce and Beyond")
    halves rounds; the propagation join is the same primitive.
    """
    from threat_detection_nosql_spark.operators.graph import (
        connected_components as _cc)
    edges = pairs.select(F.col("doc_a").cast("long").alias("src"),
                         F.col("doc_b").cast("long").alias("dst"))
    return _cc(edges, max_iter=max_iter).select(
        F.col("node").alias("doc_id"), F.col("component").alias("comp"))


MH_XS_COL = "_mh_xs"  # the one definition callers must project to


def minhash_signature_exprs(text: Column, n_hashes: int = 16,
                            shingle_len: int = 3,
                            xs_col: str = MH_XS_COL) -> tuple[Column, list]:
    """Per-ROW (stateless) MinHash signature — bit-identical to
    ``minhash_signatures``'s grouped aggregation (same shingling, same
    base hash, same affine permutations), for streaming sides where a
    document arrives as one row and a groupBy would be a needless
    stateful aggregation.

    Returns ``(xs, [s0..s{n-1}])`` where ``xs`` is the per-shingle
    base-hash ARRAY column and every signature component is expressed
    over ``F.col(xs_col)`` — the caller MUST project ``xs`` to a real
    column named ``xs_col`` first (``.withColumn(xs_col, xs)``) and
    then select the components: referencing the md5 chain directly
    from all 16 components would let CollapseProject inline it 16x per
    row (the element_at-in-transform lesson, operators-wide)."""
    w = F.split(text, r"\s+")
    n_sh = F.greatest(F.size(w) - shingle_len + 1, F.lit(0))
    grams = F.slice(w, 1, n_sh)
    for j in range(1, shingle_len):
        grams = F.zip_with(grams, F.slice(w, j + 1, n_sh),
                           lambda a, b: F.concat_ws(" ", a, b))
    xs = F.transform(
        F.array_distinct(grams),
        lambda s: _portable_hash60(s) % F.lit(_MH_PRIME))
    def _perm(a: int, b: int):
        return lambda v: (F.lit(a) * v + F.lit(b)) % F.lit(_MH_PRIME)

    sigs = [
        F.array_min(F.transform(F.col(xs_col), _perm(a, b)))
        .alias(f"s{i}")
        for i, (a, b) in enumerate(minhash_params(n_hashes))]
    return xs, sigs
