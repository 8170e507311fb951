"""Mergeable-sketch rollups (Apache DataSketches, built into Spark
4.x SQL: ``hll_sketch_agg`` / ``hll_union_agg`` / ``kll_sketch_*`` /
``theta_sketch_agg``).

This is THE 100 TB pattern for distinct counts and quantiles:
materialize one KB-sized sketch per (partition-key, group) once — an
algebraic aggregation, map-side combinable, fixed-size state — then
answer any coarser rollup by *merging sketches* instead of rescanning
the fact table. A year of daily sketches merges in milliseconds;
exact countDistinct over the same year rescans 100 TB.

Estimates are engine-specific (no DuckDB value oracle) — accuracy is
pinned by tolerance tests against exact counts
(tests/test_sketches.py), the same gate approx_count_distinct gets.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_CM_PRIME = 2147483647  # 2^31 − 1: a·x stays < 2^62, BIGINT-safe


def countmin_params(depth: int) -> list[tuple[int, int]]:
    """Deterministic (aᵢ, bᵢ) per sketch row for the affine universal
    family hᵢ(x) = (aᵢ·x + bᵢ) mod p mod width — md5-derived like
    dedup.minhash_params, so a SQL oracle reproduces the constants."""
    import hashlib

    def h60(s: str) -> int:
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    return [(h60(f"cm_a{i}") % (_CM_PRIME - 1) + 1,
             h60(f"cm_b{i}") % _CM_PRIME)
            for i in range(depth)]


def countmin_cells(weighted: DataFrame, key_col: str = "tok",
                   weight_col: str = "cnt", depth: int = 4,
                   width: int = 1024) -> DataFrame:
    """Sparse Count-Min sketch of a weighted key frame → (r, c,
    cell_cnt). Built from the DISTINCT-key frame with weights (one
    hash per distinct key, not per occurrence — identical counters,
    ~tokens/vocab less hashing). The explode emits ``depth`` cells per
    key; the aggregation map-combines, so the shuffle is bounded by
    depth×width rows regardless of corpus size — the same
    fixed-state-rollup scale story as the HLL/KLL sketches above, but
    with PORTABLE hashes: a SQL engine replays every counter exactly.

    CM guarantees (per Cormode & Muthukrishnan): estimate ≥ true
    count always (increments only collide upward), and the overcount
    per row is the colliding mass — min over ``depth`` rows keeps it
    ≤ 2N/width with high probability."""
    from threat_detection_nosql_spark.operators.dedup import (
        _portable_hash60,
    )
    x = _portable_hash60(F.col(key_col)) % F.lit(_CM_PRIME)
    cells = F.explode(F.array(*[
        F.struct(F.lit(i).alias("r"),
                 ((F.lit(a) * x + F.lit(b)) % F.lit(_CM_PRIME)
                  % F.lit(width)).alias("c"))
        for i, (a, b) in enumerate(countmin_params(depth))]))
    return (weighted
            .select(cells.alias("rc"), F.col(weight_col).alias("w"))
            .groupBy(F.col("rc.r").alias("r"), F.col("rc.c").alias("c"))
            .agg(F.sum("w").alias("cell_cnt")))


def countmin_estimates(sketch: DataFrame, candidates: DataFrame,
                       key_col: str = "tok", depth: int = 4,
                       width: int = 1024) -> DataFrame:
    """Point queries against a Count-Min sketch: min over the
    ``depth`` counters each candidate hashes to. The sketch is ≤
    depth×width rows → broadcast; candidates never shuffle."""
    from threat_detection_nosql_spark.operators.dedup import (
        _portable_hash60,
    )
    x = _portable_hash60(F.col(key_col)) % F.lit(_CM_PRIME)
    probes = F.explode(F.array(*[
        F.struct(F.lit(i).alias("r"),
                 ((F.lit(a) * x + F.lit(b)) % F.lit(_CM_PRIME)
                  % F.lit(width)).alias("c"))
        for i, (a, b) in enumerate(countmin_params(depth))]))
    keep = [f for f in candidates.columns]
    return (candidates
            .select(*keep, probes.alias("rc"))
            .join(F.broadcast(sketch),
                  (F.col("rc.r") == F.col("r"))
                  & (F.col("rc.c") == F.col("c")))
            .groupBy(*keep)
            .agg(F.min("cell_cnt").alias("cm_est")))



def daily_user_sketches(events: DataFrame,
                        lg_k: int = 12) -> DataFrame:
    """Per (day, event_type) HLL sketch of user_id — the materialized
    base table a production pipeline writes daily. Sketch size is
    2^lg_k bytes regardless of cardinality."""
    return (events
            .groupBy(F.to_date("ts").alias("day"),
                     F.col("event_type"))
            .agg(F.hll_sketch_agg("user_id", F.lit(lg_k)).alias("sk"),
                 F.count("*").alias("n_events")))


def rollup_distinct_users(daily: DataFrame) -> DataFrame:
    """Distinct users per event_type across all days = union of the
    daily sketches. Merging touches |days|×|types| KB-sized rows —
    never the events table."""
    return (daily
            .groupBy("event_type")
            .agg(F.hll_sketch_estimate(F.hll_union_agg("sk"))
                  .alias("est_distinct_users"),
                 F.sum("n_events").alias("n_events")))


def daily_value_sketches(events: DataFrame,
                         k: int = 200) -> DataFrame:
    """Per (day, event_type) KLL quantile sketch of `value` — same
    materialize-once pattern for percentiles."""
    return (events
            .groupBy(F.to_date("ts").alias("day"),
                     F.col("event_type"))
            .agg(F.kll_sketch_agg_double("value", F.lit(k)).alias("sk")))


def rollup_value_quantiles(daily: DataFrame,
                           quantiles: tuple[float, ...] = (0.5, 0.99),
                           ) -> DataFrame:
    """Merged per-type quantiles from the daily KLL sketches.
    ``kll_sketch_merge_double`` is a binary scalar (no agg form), so
    the per-group sketch list (|days| KB-sized blobs — driver never
    sees them) folds with an ``aggregate`` expression."""
    merged = (daily.groupBy("event_type")
              .agg(F.collect_list("sk").alias("sks"))
              .withColumn("sk", F.expr(
                  "aggregate(slice(sks, 2, size(sks) - 1), sks[0], "
                  "(acc, x) -> kll_sketch_merge_double(acc, x))")))
    cols = [F.kll_sketch_get_quantile_double("sk", F.lit(q))
             .alias(f"p{int(q * 100)}")
            for q in quantiles]
    return merged.select("event_type", *cols)


def misra_gries_heavy_hitters(df: DataFrame, col: str,
                              k: int = 64) -> DataFrame:
    """Heavy hitters with BOUNDED per-task state: Misra-Gries summaries
    of at most ``k`` counters per partition (mapInPandas — the decrement
    step is inherently sequential), merged by key-summing the partition
    summaries. Estimates are lower bounds; each partition's decrement
    total bounds its undercount, so `err_bound` = Σ per-partition
    decrements is a certified error: true_count ∈ [est, est + err].

    This is the shape that works when `groupBy(col).count()` can't: a
    100 TB corpus with billions of distinct tokens shuffles billions of
    (token, count) partials, while the MG merge shuffles ≤ k rows per
    partition, regardless of cardinality. The exact re-aggregation of a
    candidate set (two-pass refinement) stays cheap because the
    candidates number ≤ k.
    """
    import pandas as pd

    def summarize(batches):
        counters: dict = {}
        decrements = 0
        for batch in batches:
            for v in batch[col]:
                if v in counters:
                    counters[v] += 1
                elif len(counters) < k:
                    counters[v] = 1
                else:
                    # decrement-all: the classic MG step, O(k) amortized
                    decrements += 1
                    dead = []
                    for key in counters:
                        counters[key] -= 1
                        if counters[key] == 0:
                            dead.append(key)
                    for key in dead:
                        del counters[key]
        if counters:
            # decrement total rides on exactly ONE row per partition so
            # the global error bound is a plain sum
            yield pd.DataFrame({
                col: list(counters.keys()),
                "est": list(counters.values()),
                "dec": [decrements] + [0] * (len(counters) - 1)})

    key_type = dict(df.dtypes)[col]
    summaries = df.select(col).mapInPandas(
        summarize, schema=f"{col} {key_type}, est long, dec long").cache()
    # the cache is read twice (err scalar + merge) inside this one plan;
    # scope it to the call: materialize the ≤ k·partitions-row result
    # eagerly (localCheckpoint), then release the summaries blocks —
    # both reads see the SAME materialized summaries, and nothing is
    # left cached after return
    err = summaries.agg(F.sum("dec").alias("err_bound"))
    out = (summaries.groupBy(col)
           .agg(F.sum("est").alias("est_count"))
           .crossJoin(F.broadcast(err))
           .orderBy(F.desc("est_count"), F.asc(col))
           .localCheckpoint(eager=True))
    summaries.unpersist()
    return out


# ---------------------------------------------------------------------------
# Portable HyperLogLog: like countmin_cells, built on the md5 hash
# family so the REGISTERS (and therefore the estimate itself) are
# SQL-replayable — the property the DataSketches HLL above cannot
# offer (engine-specific state → rows-only checks).
# ---------------------------------------------------------------------------

_HLL_P = 10                    # 2^10 = 1024 registers
_HLL_M = 1 << _HLL_P
_HLL_W_BITS = 60 - _HLL_P      # rank window: low 50 bits
_HLL_ALPHA = 0.7213 / (1 + 1.079 / _HLL_M)


def hll_register_cols(key: Column, p: int = _HLL_P
                      ) -> tuple[Column, Column]:
    """(idx, rho) register columns for a 2^p-register portable HLL of
    ``key``: idx = high p bits of the 60-bit md5 hash, rho = leading
    zeros in the low-bit window + 1. All integer arithmetic
    (div/mod/bin-length — no float bit tricks), identical in Spark and
    DuckDB. Shared by the corpus-level sketch below (p=_HLL_P) and the
    per-node HyperBall sketches (graph.hyperball_registers, small p)."""
    from threat_detection_nosql_spark.operators.dedup import (
        _portable_hash60,
    )
    w_bits = 60 - p
    x = _portable_hash60(key)
    w = x % F.lit(1 << w_bits)
    # idx: exact integer div by 2^w_bits — (x - x%2^w) is a multiple
    # of 2^w ≤ 2^60, which double divides by a power of two exactly
    idx = ((x - w) / F.lit(float(1 << w_bits))).cast("long")
    rho = F.when(w == 0, F.lit(w_bits + 1)).otherwise(
        F.lit(w_bits + 1) - F.length(F.bin(w)))
    return idx, rho


def hll_portable_registers(df: DataFrame, key_col: str) -> DataFrame:
    """(idx, r) register table over the whole frame (corpus-level
    distinct sketch). Map-combined max, shuffle bounded at 2^p rows."""
    idx, rho = hll_register_cols(F.col(key_col).cast("string"))
    return (df.select(idx.alias("idx"), rho.alias("rho"))
            .groupBy("idx").agg(F.max("rho").alias("r")))


def hll_portable_estimate(registers: DataFrame) -> DataFrame:
    """One-row (n_nonempty, hll_estimate): the standard HLL formula
    with the linear-counting small-range correction, every term plain
    double arithmetic a SQL engine replays. Empty registers contribute
    2^0 = 1 to the harmonic sum and count into V for the correction."""
    agg = registers.agg(
        F.count("*").alias("n_nonempty"),
        F.sum(F.pow(F.lit(2.0), -F.col("r"))).alias("s_nonempty"))
    m = F.lit(float(_HLL_M))
    v = m - F.col("n_nonempty")
    s = F.col("s_nonempty") + v  # empty registers: 2^-0 each
    e_raw = F.lit(_HLL_ALPHA) * m * m / s
    e = F.when((e_raw <= 2.5 * m) & (v > 0),
               m * F.log(m / v)).otherwise(e_raw)
    return agg.select("n_nonempty",
                      F.round(e, 4).alias("hll_estimate"))


# ---------------------------------------------------------------------------
# Portable Bloom filter: the membership sketch the family was missing
# (CM = frequency, HLL = cardinality, KLL = quantiles, MG = heavy
# hitters, Bloom = membership). Built on the same md5 hash family, with
# 60-bit words (bit index < 60 keeps every shifted value positive
# BIGINT in both engines), so the packed words AND every probe verdict
# are SQL-replayable. Spark's own runtime bloom pushdown is the same
# idea applied by the optimizer; this is the explicit, oracle-checkable
# operator form.
# ---------------------------------------------------------------------------

_BLOOM_WORD_BITS = 60


def bloom_positions(key: Column | str, n_hashes: int,
                    m_bits: int) -> Column:
    """Array of ``n_hashes`` bit positions in [0, m_bits) for a key —
    hash_i = md5-60("bl{i}:" || key) % m, the same affine-free portable
    family as the other sketches."""
    from threat_detection_nosql_spark.operators.dedup import (
        _portable_hash60,
    )
    return F.array(*[
        _portable_hash60(F.concat(F.lit(f"bl{i}:"), F.col(key)
                                  if isinstance(key, str) else key))
        % F.lit(m_bits)
        for i in range(n_hashes)])


def bloom_words(keys: DataFrame, key_col: str, n_hashes: int = 4,
                m_bits: int = 7200) -> DataFrame:
    """Build the filter: (word, word_bits) with at most m/60 rows —
    the bounded-state rollup shape. One explode per key emits its
    ``n_hashes`` positions; ``bit_or`` packs each 60-bit word
    map-side, so the shuffle carries ≤ m/60 rows regardless of build
    cardinality, and two partial filters OR-merge (union → bit_or) —
    the mergeability that makes Bloom a per-partition/streaming-ready
    sketch."""
    pos = (keys.select(F.explode(
        bloom_positions(key_col, n_hashes, m_bits)).alias("pos"))
        .distinct())
    word = ((F.col("pos") - F.col("pos") % _BLOOM_WORD_BITS)
            / _BLOOM_WORD_BITS).cast("long")
    # shiftleft needs the column form (the python API takes only an
    # int literal for numBits)
    bit = F.expr(f"shiftleft(CAST(1 AS BIGINT), "
                 f"CAST(pos % {_BLOOM_WORD_BITS} AS INT))")
    return (pos.select(word.alias("word"), bit.alias("b"))
            .groupBy("word").agg(F.bit_or("b").alias("word_bits")))


def bloom_probe(words: DataFrame, probes: DataFrame, key_col: str,
                n_hashes: int = 4, m_bits: int = 7200) -> DataFrame:
    """Probe verdict per key: member iff ALL its positions' bits are
    set. The probe explodes to n_hashes rows, joins the (tiny,
    broadcast) word table, and counts set bits back to one row per
    key — a missing word row or a zero bit both count as a miss."""
    pos = probes.select(
        F.col(key_col),
        F.explode(bloom_positions(key_col, n_hashes, m_bits))
        .alias("pos"))
    word = ((F.col("pos") - F.col("pos") % _BLOOM_WORD_BITS)
            / _BLOOM_WORD_BITS).cast("long")
    bit = (F.col("pos") % _BLOOM_WORD_BITS).cast("int")
    hits = (pos.select(key_col, word.alias("word"), bit.alias("bit"))
            .join(F.broadcast(words), "word", "left")
            .select(key_col,
                    (F.expr("shiftright(coalesce(word_bits, "
                            "CAST(0 AS BIGINT)), bit)") % 2 == 1)
                    .cast("int").alias("hit")))
    return (hits.groupBy(key_col)
            .agg((F.sum("hit") == n_hashes).cast("int")
                 .alias("in_filter")))


# -- Portable KMV quantile sketch (bottom-k by hash) --------------------------

KMV_K = 256


_KMV_SALT = 32


def _salted_bottom_k(df: DataFrame, part_cols: list[str],
                     k: int) -> DataFrame:
    """Exact bottom-k by (h, event_id) per partition key, salted: a
    first row_number window over (key, hash(event_id) % 32) buckets
    caps any hot key's window partition at ~rows/32, then a second
    window over the ≤ 32·k survivors takes the true bottom-k. Exact
    for the same structural reason the similar_user_pairs cap is
    (threat.py): every global bottom-k row is in its salt bucket's
    bottom-k. ADVICE r8: the previous single window put a hot key's
    ENTIRE row set in one window partition — the unbounded-partition
    shape this repo already fixed elsewhere."""
    from pyspark.sql.window import Window
    w1 = (Window.partitionBy(*part_cols, "salt")
          .orderBy(F.col("h").asc(), F.col("event_id").asc()))
    w2 = (Window.partitionBy(*part_cols)
          .orderBy(F.col("h").asc(), F.col("event_id").asc()))
    return (df
            .withColumn("salt", F.pmod(F.hash("event_id"),
                                       F.lit(_KMV_SALT)))
            .withColumn("rk", F.row_number().over(w1))
            .filter(F.col("rk") <= k)
            .withColumn("rk", F.row_number().over(w2))
            .filter(F.col("rk") <= k)
            .drop("rk", "salt"))


def kmv_daily_value_samples(events: DataFrame, k: int = KMV_K) -> DataFrame:
    """Per (day, event_type) bottom-k sample of ``value``: the k rows
    with the smallest md5(event_id) — the k-minimum-values sketch, the
    PORTABLE cousin of the KLL pipeline above. The hash is a uniform
    (and deterministic) rank, so the kept rows are a uniform sample of
    the group and any SQL engine replays the sketch exactly — unlike
    the DataSketches blobs, every byte here is oracle-checkable.

    Mergeability is structural: the bottom-k of a union IS the
    bottom-k of the per-part bottom-k's (every globally-small hash is
    small in its own part), so daily sketches materialize once and any
    coarser rollup merges k-row samples without rescanning the fact
    table — the same 100 TB story as the HLL/KLL rollups. The bottom-k
    itself runs as a salted two-stage window (``_salted_bottom_k``) so
    a hot (day, type) never lands in one window partition."""
    h = F.md5(F.col("event_id").cast("string"))
    return _salted_bottom_k(
        events.select(F.to_date("ts").alias("day"), "event_type",
                      "event_id", "value", h.alias("h")),
        ["day", "event_type"], k)


def kmv_merge_quantiles(daily: DataFrame, k: int = KMV_K) -> DataFrame:
    """Merge daily KMV samples per event_type (re-take the bottom-k of
    the union — touches |days|·k rows per type, never the fact table)
    and read off discrete quantiles. percentile_disc returns an
    OBSERVED sample value, so the result is bit-identical across
    engines — no interpolation arithmetic. Salted two-stage bottom-k
    again: |days|·k rows per type is bounded, but a multi-year rollup
    of a hot type still shouldn't ride one window partition."""
    merged = _salted_bottom_k(daily, ["event_type"], k)
    return (merged.groupBy("event_type")
            .agg(F.count("*").alias("n_sampled"),
                 F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY value)")
                 .alias("p50"),
                 F.expr("percentile_disc(0.9) WITHIN GROUP (ORDER BY value)")
                 .alias("p90"),
                 F.expr("percentile_disc(0.99) WITHIN GROUP (ORDER BY value)")
                 .alias("p99")))


# ---------------------------------------------------------------------------
# Theta/KMV set operations (round 11): distinct-set INTERSECTION
# estimates from mergeable bottom-k sketches — the sketch-family gap
# after frequency (CM), cardinality (HLL), quantiles (KLL/KMV),
# heavy hitters (MG) and membership (Bloom). Public framework:
# Beyer et al. 2007 (KMV) / the theta-sketch generalization.
# ---------------------------------------------------------------------------

THETA_K = 64  # sized so the ESTIMATOR path (not just exact
# mode) engages on the 150-distinct-user test types; rel err
# ~1/sqrt(k) with the exact audit column alongside
_H60_MAX = 1 << 60  # md5-60bit hash space; "exact mode" theta


def theta_user_sketches(events: DataFrame,
                        k: int = THETA_K) -> DataFrame:
    """Per event_type bottom-k sketch of DISTINCT md5-60bit user
    hashes — (event_type, h) rows, ≤ k per type. Salted two-stage
    bottom-k (the _salted_bottom_k shape) so a hot type's full
    distinct-user set never rides one window partition. Mergeable the
    KMV way: the bottom-k of a union is the bottom-k of per-part
    bottom-k's."""
    from pyspark.sql.window import Window
    h = F.conv(F.substring(
        F.md5(F.col("user_id").cast("string")), 1, 15), 16, 10
    ).cast("long")
    du = events.select("event_type", h.alias("h")).distinct()
    w1 = Window.partitionBy("event_type", "salt").orderBy("h")
    w2 = Window.partitionBy("event_type").orderBy("h")
    return (du
            .withColumn("salt", F.pmod(F.hash("h"), F.lit(_KMV_SALT)))
            .withColumn("rk", F.row_number().over(w1))
            .filter(F.col("rk") <= k)
            .withColumn("rk", F.row_number().over(w2))
            .filter(F.col("rk") <= k)
            .drop("rk", "salt"))


def theta_overlap_estimates(sk: DataFrame,
                            k: int = THETA_K) -> DataFrame:
    """Pairwise intersection-cardinality estimates from the sketches:
    theta_X = k-th smallest hash when |X| >= k else 2^60 (exact
    mode); for a pair, theta = min(theta_a, theta_b), n = common
    sketch hashes strictly below theta, estimate = n·2^60/theta.
    When both sides are exact-mode the estimate IS the exact
    intersection. Everything is integer until the one final division,
    so a SQL oracle replays the estimator bit-for-bit."""
    stats = (sk.groupBy("event_type")
             .agg(F.count("*").alias("n_sk"), F.max("h").alias("h_max")))
    th = stats.select(
        "event_type",
        F.when(F.col("n_sk") >= k, F.col("h_max"))
        .otherwise(F.lit(_H60_MAX)).alias("theta"))
    pairs = (th.select(F.col("event_type").alias("type_a"),
                       F.col("theta").alias("th_a"))
             .join(F.broadcast(
                 th.select(F.col("event_type").alias("type_b"),
                           F.col("theta").alias("th_b"))),
                   F.col("type_a") < F.col("type_b"))
             .select("type_a", "type_b",
                     F.least("th_a", "th_b").alias("theta_i")))
    common = (sk.select(F.col("event_type").alias("type_a"), "h")
              .join(sk.select(F.col("event_type").alias("type_b"),
                              F.col("h").alias("hb")),
                    F.col("h") == F.col("hb"))
              .filter(F.col("type_a") < F.col("type_b"))
              .select("type_a", "type_b", "h"))
    n = (common.join(F.broadcast(pairs), ["type_a", "type_b"])
         .filter(F.col("h") < F.col("theta_i"))
         .groupBy("type_a", "type_b")
         .agg(F.count("*").alias("n_common")))
    return (pairs.join(n, ["type_a", "type_b"], "left")
            .select("type_a", "type_b",
                    F.coalesce("n_common", F.lit(0)).cast("long")
                    .alias("n_common"),
                    F.round(F.coalesce("n_common", F.lit(0))
                            .cast("double") * F.lit(float(_H60_MAX))
                            / F.col("theta_i").cast("double"), 4)
                    .alias("est_overlap")))
