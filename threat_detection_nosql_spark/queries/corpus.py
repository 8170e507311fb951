"""Corpus-curation queries (training-data pipeline surface, round 2).

These extend the LLM-pipeline family (queries/pipeline.py) with the
curation stages a 100 TB pretraining corpus needs between raw crawl
and tokenizer: deterministic sampling / corpus mixing, composition
reporting, repetition-based quality signals (Gopher-style), text
normalization + redaction, and token-budget sequence packing. All are
pure JVM expressions (no Python UDF); every query has a bit-exact
DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from threat_detection_nosql_spark.operators import packing, sampling, skew
from threat_detection_nosql_spark.sources.readers import load_table

# ---------------------------------------------------------------------------
# C1: deterministic (hash-mod) stratified sampling — corpus mixing
# ---------------------------------------------------------------------------

_RATES = {"src0": 0.5}  # downweight one source, keep the rest at 10%
_DEFAULT_RATE = 0.1


def deterministic_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified hash-mod sample of `documents`: src0 kept at 50%,
    every other source at 10%. The keep decision is a pure function of
    doc_id (portable md5 bucket) — invariant under repartitioning,
    rerun, and engine, unlike seeded rand()-sampling. Scan-level
    predicate: no shuffle, pushdown-friendly."""
    docs = load_table(spark, sf_dir, "documents")
    out = sampling.stratified_hash_sample(
        docs, key="doc_id", stratum="source",
        fractions=_RATES, default=_DEFAULT_RATE)
    return out.select("doc_id", "source", "lang")


_SAMPLE_SQL = """
SELECT doc_id, source, lang
FROM documents
WHERE CAST(('0x' || substr(md5('sample:' || CAST(doc_id AS VARCHAR)), 1, 15))
           AS BIGINT) % 10000
      < CASE WHEN source = 'src0' THEN 5000 ELSE 1000 END
"""


# ---------------------------------------------------------------------------
# C2: corpus composition report — what a data-mixing decision reads
# ---------------------------------------------------------------------------

def corpus_composition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per (source, lang): doc count, token total, mean chars, and the
    cell's share of all corpus tokens. One hash agg (map-side partial)
    + a broadcast of the single global total via a window over the
    tiny aggregated frame — the fact table is scanned once."""
    docs = load_table(spark, sf_dir, "documents")
    n_tok = F.size(F.split(F.col("text"), r"\s+"))
    agg = (docs.groupBy("source", "lang")
           .agg(F.count("*").alias("n_docs"),
                F.sum(n_tok).alias("total_tokens"),
                F.round(F.avg(F.length("text")), 6).alias("avg_chars")))
    from pyspark.sql.window import Window
    total = F.sum("total_tokens").over(Window.partitionBy())
    return agg.select(
        "source", "lang", "n_docs", "total_tokens", "avg_chars",
        F.round(F.col("total_tokens") / total, 6).alias("token_share"))


_COMPOSITION_SQL = r"""
WITH a AS (
  SELECT source, lang,
         CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(len(string_split_regex(text, '\s+'))) AS BIGINT)
           AS total_tokens,
         round(avg(length(text)), 6) AS avg_chars
  FROM documents GROUP BY source, lang)
SELECT source, lang, n_docs, total_tokens, avg_chars,
       round(total_tokens * 1.0 / sum(total_tokens) OVER (), 6)
         AS token_share
FROM a
"""


# ---------------------------------------------------------------------------
# C3: repetition stats — Gopher-style quality signals
# ---------------------------------------------------------------------------

def repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc repetition signals (the Gopher/RefinedWeb filter
    family): distinct-token ratio, most-frequent-token share, and
    duplicate-2-gram fraction. Token mode needs a (doc, token) count →
    per-doc max (two map-side-combinable aggs); the n-gram ratios are
    array expressions computed in the same scan and carried through
    a doc_id join of two pre-aggregated (thus tiny) sides."""
    docs = load_table(spark, sf_dir, "documents")
    w = F.split(F.col("text"), r"\s+")
    n = F.size(w)
    grams = F.zip_with(F.slice(w, 1, F.greatest(n - 1, F.lit(0))),
                       F.slice(w, 2, F.greatest(n - 1, F.lit(0))),
                       lambda a, b: F.concat_ws(" ", a, b))
    arr = docs.select(
        "doc_id",
        n.alias("n_tokens"),
        F.round(F.size(F.array_distinct(w)) / n, 6)
         .alias("distinct_token_ratio"),
        F.round(F.when(n >= 2,
                       1 - F.size(F.array_distinct(grams))
                       / (n - 1)).otherwise(0.0), 6)
         .alias("dup_2gram_frac"))
    tok = docs.select("doc_id", F.explode(w).alias("tok"))
    tc = tok.groupBy("doc_id", "tok").agg(F.count("*").alias("c"))
    top = (tc.groupBy("doc_id")
           .agg((F.max("c") / F.sum("c")).alias("_top")))
    return (arr.join(top, "doc_id")
            .select("doc_id", "n_tokens", "distinct_token_ratio",
                    F.round("_top", 6).alias("top_token_frac"),
                    "dup_2gram_frac"))


_REPETITION_SQL = r"""
WITH toks AS (
  SELECT doc_id, string_split_regex(text, '\s+') AS w FROM documents),
arr AS (
  SELECT doc_id,
         CAST(len(w) AS INT) AS n_tokens,
         round(len(list_distinct(w)) * 1.0 / len(w), 6)
           AS distinct_token_ratio,
         w
  FROM toks),
grams AS (
  SELECT doc_id, w[i] || ' ' || w[i+1] AS g
  FROM toks, unnest(range(1, len(w))) AS t(i)),
g2 AS (
  SELECT doc_id,
         round(1 - count(DISTINCT g) * 1.0 / count(*), 6)
           AS dup_2gram_frac
  FROM grams GROUP BY doc_id),
tc AS (
  SELECT doc_id, unnest(w) AS tok FROM toks),
tcc AS (
  SELECT doc_id, tok, count(*) AS c FROM tc GROUP BY doc_id, tok),
top AS (
  SELECT doc_id, round(max(c) * 1.0 / sum(c), 6) AS top_token_frac
  FROM tcc GROUP BY doc_id)
SELECT a.doc_id, a.n_tokens, a.distinct_token_ratio, top.top_token_frac,
       coalesce(g2.dup_2gram_frac, 0.0) AS dup_2gram_frac
FROM arr a
JOIN top USING (doc_id)
LEFT JOIN g2 USING (doc_id)
"""


# ---------------------------------------------------------------------------
# C4: normalization + redaction → canonical text hash
# ---------------------------------------------------------------------------

def normalized_text_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cleaning stage: lowercase, collapse whitespace, redact digit
    runs to a placeholder (the PII-redaction pattern — emails/URLs are
    the same regexp_replace shape), then emit the canonical md5 and
    length. The hash is what exact-dedup keys on after cleaning, so
    this composes with exact_dedup_groups. Pure codegen expressions."""
    docs = load_table(spark, sf_dir, "documents")
    norm = F.trim(F.regexp_replace(F.lower(F.col("text")), r"\s+", " "))
    redacted = F.regexp_replace(norm, "[0-9]+", "<num>")
    return docs.select(
        "doc_id",
        F.md5(redacted).alias("norm_hash"),
        F.length(redacted).alias("norm_len"))


_NORMALIZE_SQL = r"""
SELECT doc_id,
       md5(regexp_replace(trim(regexp_replace(lower(text), '\s+', ' ', 'g')),
                          '[0-9]+', '<num>', 'g')) AS norm_hash,
       CAST(length(regexp_replace(
              trim(regexp_replace(lower(text), '\s+', ' ', 'g')),
              '[0-9]+', '<num>', 'g')) AS INT) AS norm_len
FROM documents
"""


# ---------------------------------------------------------------------------
# C5: token-budget sequence packing
# ---------------------------------------------------------------------------

_PACK_BUDGET = 512


def packed_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Assign each doc to a token-budget bin, packed per source shard
    in doc_id order (operators/packing.py). The per-shard window keeps
    the sort distributed — no global ordering ever materializes."""
    docs = load_table(spark, sf_dir, "documents")
    n_tok = F.size(F.split(F.col("text"), r"\s+"))
    with_tok = docs.select("doc_id", "source", n_tok.alias("n_tokens"))
    return packing.pack_by_budget(
        with_tok, tokens_col="n_tokens", budget=_PACK_BUDGET,
        shard="source", order="doc_id")


_PACK_SQL = rf"""
WITH t AS (
  SELECT doc_id, source,
         CAST(len(string_split_regex(text, '\s+')) AS INT) AS n_tokens
  FROM documents)
SELECT doc_id, source, n_tokens,
       CAST(floor((sum(n_tokens) OVER (PARTITION BY source
                                       ORDER BY doc_id
                                       ROWS UNBOUNDED PRECEDING)
                   - n_tokens) / {_PACK_BUDGET}) AS BIGINT) AS bin
FROM t
"""


# ---------------------------------------------------------------------------
# C6: salted join correctness surface (operators/skew.py)
# ---------------------------------------------------------------------------

def salted_event_nation_counts(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    """Events joined to the customer dim THROUGH the salted-join
    operator (hot user_ids scatter over 8 sub-keys), then nation
    rollup. The oracle is the plain join — pinning that salting is
    semantics-preserving end-to-end at the query surface, not just in
    unit tests."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "value")
    cust = (load_table(spark, sf_dir, "customer")
            .select(F.col("c_custkey").alias("user_id"), "c_nationkey"))
    joined = skew.salted_join(ev, cust, "user_id", n_salts=8)
    return (joined.groupBy("c_nationkey")
            .agg(F.count("*").alias("n_events"),
                 F.round(F.sum("value"), 4).alias("total_value")))


_SALTED_SQL = """
SELECT c_nationkey,
       CAST(count(*) AS BIGINT) AS n_events,
       round(sum(value), 4) AS total_value
FROM events JOIN customer ON user_id = c_custkey
GROUP BY c_nationkey
"""


QUERIES = {
    "deterministic_sample": deterministic_sample,
    "corpus_composition": corpus_composition,
    "repetition_stats": repetition_stats,
    "normalized_text_hash": normalized_text_hash,
    "packed_sequences": packed_sequences,
    "salted_event_nation_counts": salted_event_nation_counts,
}

ORACLES = {
    "deterministic_sample": _SAMPLE_SQL,
    "corpus_composition": _COMPOSITION_SQL,
    "repetition_stats": _REPETITION_SQL,
    "normalized_text_hash": _NORMALIZE_SQL,
    "packed_sequences": _PACK_SQL,
    "salted_event_nation_counts": _SALTED_SQL,
}


# ---------------------------------------------------------------------------
# C7: deterministic train/valid/test split
# ---------------------------------------------------------------------------

def dataset_split_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """98/1/1 train/valid/test assignment from the same portable hash
    bucket as C1 (different salt → independent of the sampling
    decision). Membership is a pure function of doc_id: adding data or
    re-sharding the corpus never moves an existing doc across splits —
    the property that prevents eval-set contamination over corpus
    versions."""
    docs = load_table(spark, sf_dir, "documents")
    b = sampling.hash_bucket(F.col("doc_id"), salt="split")
    return docs.select(
        "doc_id",
        F.when(b < 9800, "train")
         .when(b < 9900, "valid")
         .otherwise("test").alias("split"))


_SPLIT_SQL = """
SELECT doc_id,
       CASE
         WHEN b < 9800 THEN 'train'
         WHEN b < 9900 THEN 'valid'
         ELSE 'test'
       END AS split
FROM (SELECT doc_id,
             CAST(('0x' || substr(md5('split:' || CAST(doc_id AS VARCHAR)),
                                  1, 15)) AS BIGINT) % 10000 AS b
      FROM documents) t
"""


# ---------------------------------------------------------------------------
# C8: semantic (embedding-cluster) dedup — SemDeDup-shaped
# ---------------------------------------------------------------------------

_N_SEEDS = 8
_SEM_THRESHOLD = 0.35


def semantic_cluster_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-shaped dedup: coarse-cluster embeddings, then flag a
    vector as duplicate when a smaller-id member of ITS OWN cluster is
    within cosine ≥ threshold. Pairwise work is bounded to
    within-cluster — the property that makes semantic dedup feasible
    at corpus scale (Σ|cluster|² ≪ n²); the cluster id doubles as the
    shuffle key so each cluster dedups independently.

    For oracle determinism the coarse quantizer is seeded-assignment
    (centroids := the first ``_N_SEEDS`` vectors, broadcast; nearest
    by rounded cosine, seed-id tie-break) rather than trained KMeans —
    the assignment/join/flag dataflow is identical to a trained
    quantizer, which is what a production run would fit first."""
    emb = (load_table(spark, sf_dir, "embeddings")
           .select("vec_id",
                   F.col("embedding").cast("array<double>").alias("v")))
    from threat_detection_nosql_spark.operators.similarity import (
        _l2_normalize,
    )
    nemb = _l2_normalize(emb)
    seeds = (nemb.filter(F.col("vec_id") < _N_SEEDS)
             .select(F.col("vec_id").alias("seed_id"),
                     F.col("v").alias("sv")))
    dot = F.aggregate(F.zip_with("v", "sv", lambda x, y: x * y),
                      F.lit(0.0), lambda acc, x: acc + x)
    from pyspark.sql.window import Window
    w = Window.partitionBy("vec_id").orderBy(
        F.desc("cos"), F.asc("seed_id"))
    assign = (nemb.join(F.broadcast(seeds))
              .withColumn("cos", F.round(dot, 6))
              .withColumn("_rn", F.row_number().over(w))
              .filter(F.col("_rn") == 1)
              .select("vec_id", F.col("seed_id").alias("cluster_id"), "v"))
    a = assign.select("vec_id", "cluster_id", "v")
    b = assign.select(F.col("vec_id").alias("b_id"), "cluster_id",
                      F.col("v").alias("sv"))
    pair_cos = F.round(dot, 6)
    dups = (a.join(b, "cluster_id")
            .filter(F.col("b_id") < F.col("vec_id"))
            .withColumn("pcos", pair_cos)
            .filter(F.col("pcos") >= _SEM_THRESHOLD)
            .select("vec_id").distinct()
            .withColumn("is_semantic_dup", F.lit(1)))
    return (assign.join(dups, "vec_id", "left")
            .select("vec_id", "cluster_id",
                    F.coalesce("is_semantic_dup", F.lit(0))
                     .alias("is_semantic_dup")))


_SEMANTIC_DEDUP_SQL = f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
n AS (SELECT vec_id,
             list_transform(v, x -> x / sqrt(list_dot_product(v, v))) AS v
      FROM e),
s AS (SELECT vec_id AS seed_id, v AS sv FROM n WHERE vec_id < {_N_SEEDS}),
scored AS (SELECT a.vec_id, s.seed_id,
                  round(list_dot_product(a.v, s.sv), 6) AS cos
           FROM n a CROSS JOIN s),
assign AS (
  SELECT vec_id, seed_id AS cluster_id
  FROM (SELECT *, row_number() OVER (PARTITION BY vec_id
                  ORDER BY cos DESC, seed_id ASC) AS rn
        FROM scored) t
  WHERE rn = 1),
m AS (SELECT a.vec_id, a.cluster_id, n.v
      FROM assign a JOIN n USING (vec_id)),
dups AS (
  SELECT DISTINCT x.vec_id
  FROM m x JOIN m y
    ON x.cluster_id = y.cluster_id AND y.vec_id < x.vec_id
  WHERE round(list_dot_product(x.v, y.v), 6) >= {_SEM_THRESHOLD})
SELECT a.vec_id, a.cluster_id,
       CASE WHEN d.vec_id IS NULL THEN 0 ELSE 1 END AS is_semantic_dup
FROM assign a LEFT JOIN dups d ON a.vec_id = d.vec_id
"""

QUERIES.update({
    "dataset_split_assignment": dataset_split_assignment,
    "semantic_cluster_dedup": semantic_cluster_dedup,
})

ORACLES.update({
    "dataset_split_assignment": _SPLIT_SQL,
    "semantic_cluster_dedup": _SEMANTIC_DEDUP_SQL,
})


# ---------------------------------------------------------------------------
# C9: context-window chunking (RAG / training-sequence prep)
# ---------------------------------------------------------------------------

_CHUNK_SIZE = 64
_CHUNK_STRIDE = 32


def doc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping fixed-size word-window chunks per document
    (size 64, stride 32) — the chunking stage of a RAG/embedding
    pipeline. One generate (explode of the start-position sequence) +
    slice per chunk, all JVM expressions; chunk identity is the md5 of
    the joined window so downstream chunk-level dedup keys on it.
    Scales linearly: output rows = Σ ceil(n_tokens/stride), no
    shuffle at all (chunking is embarrassingly row-parallel)."""
    docs = load_table(spark, sf_dir, "documents")
    w = F.split(F.col("text"), r"\s+")
    n = F.size(w)
    starts = F.sequence(F.lit(1), n, F.lit(_CHUNK_STRIDE))
    chunked = (docs
               .select("doc_id", w.alias("w"),
                       F.explode(starts).alias("start")))
    chunk = F.slice("w", F.col("start"), _CHUNK_SIZE)
    return chunked.select(
        "doc_id",
        ((F.col("start") - 1) / _CHUNK_STRIDE).cast("int")
         .alias("chunk_idx"),
        F.size(chunk).alias("chunk_tokens"),
        F.md5(F.concat_ws(" ", chunk)).alias("chunk_hash"))


_CHUNKS_SQL = rf"""
WITH toks AS (
  SELECT doc_id, string_split_regex(text, '\s+') AS w FROM documents)
SELECT doc_id,
       CAST((s - 1) / {_CHUNK_STRIDE} AS INT) AS chunk_idx,
       CAST(len(w[s : s + {_CHUNK_SIZE} - 1]) AS INT) AS chunk_tokens,
       md5(array_to_string(w[s : s + {_CHUNK_SIZE} - 1], ' ')) AS chunk_hash
FROM toks, unnest(range(1, len(w) + 1, {_CHUNK_STRIDE})) AS t(s)
"""

QUERIES["doc_chunks"] = doc_chunks
ORACLES["doc_chunks"] = _CHUNKS_SQL


# ---------------------------------------------------------------------------
# C10: one-pass column profiler (data-quality audit surface)
# ---------------------------------------------------------------------------

def orders_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Generic table profiler over `orders`: per column null count +
    distinct count, plus numeric min/max — the schema-drift /
    data-quality audit a pipeline runs on every new data drop. ALL
    statistics come out of ONE aggregation pass (no per-column jobs
    like pandas-style .describe() loops); the exact countDistincts
    share a single Expand. Output is long-form (one row per column)
    via an unpivot so new columns never change the schema."""
    orders = load_table(spark, sf_dir, "orders")
    cols = ["o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus"]
    aggs = []
    for c in cols:
        aggs += [
            F.sum(F.col(c).isNull().cast("long")).alias(f"{c}__nulls"),
            F.countDistinct(c).alias(f"{c}__distinct"),
        ]
    aggs += [F.min("o_totalprice").alias("num__min"),
             F.max("o_totalprice").alias("num__max")]
    wide = orders.agg(*aggs)
    rows = [
        F.struct(F.lit(c).alias("column"),
                 F.col(f"{c}__nulls").alias("n_nulls"),
                 F.col(f"{c}__distinct").alias("n_distinct"))
        for c in cols
    ]
    return (wide.select(F.explode(F.array(*rows)).alias("r"),
                        "num__min", "num__max")
            .select(F.col("r.column").alias("column"),
                    F.col("r.n_nulls").alias("n_nulls"),
                    F.col("r.n_distinct").alias("n_distinct"),
                    F.when(F.col("r.column") == "o_totalprice",
                           F.round("num__min", 4)).alias("num_min"),
                    F.when(F.col("r.column") == "o_totalprice",
                           F.round("num__max", 4)).alias("num_max")))


_PROFILE_SQL = """
WITH w AS (
  SELECT
    CAST(sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS k_n,
    CAST(count(DISTINCT o_orderkey) AS BIGINT) AS k_d,
    CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS c_n,
    CAST(count(DISTINCT o_custkey) AS BIGINT) AS c_d,
    CAST(sum(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS t_n,
    CAST(count(DISTINCT o_totalprice) AS BIGINT) AS t_d,
    CAST(sum(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS s_n,
    CAST(count(DISTINCT o_orderstatus) AS BIGINT) AS s_d,
    round(min(o_totalprice), 4) AS mn,
    round(max(o_totalprice), 4) AS mx
  FROM orders)
SELECT 'o_orderkey' AS "column", k_n AS n_nulls, k_d AS n_distinct,
       NULL::DOUBLE AS num_min, NULL::DOUBLE AS num_max FROM w
UNION ALL
SELECT 'o_custkey', c_n, c_d, NULL, NULL FROM w
UNION ALL
SELECT 'o_totalprice', t_n, t_d, mn, mx FROM w
UNION ALL
SELECT 'o_orderstatus', s_n, s_d, NULL, NULL FROM w
"""


# ---------------------------------------------------------------------------
# C11: unpivot / melt (wide → long reshaping)
# ---------------------------------------------------------------------------

def user_features_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide→long melt of the per-user feature matrix (native
    ``DataFrame.unpivot`` — compiles to Expand, one pass, no join):
    the shape feature stores and plotting layers consume."""
    from threat_detection_nosql_spark.queries.threat import user_features
    feats = user_features(spark, sf_dir)
    value_cols = ["total_activities", "after_hours_activities",
                  "weekend_activities", "unique_systems"]
    out = feats.select("user", *value_cols).unpivot(
        "user", value_cols, "feature", "value")
    return out.withColumn("value", F.col("value").cast("double"))


_UNPIVOT_SQL = """
WITH f AS (SELECT user, total_activities, after_hours_activities,
                  weekend_activities, unique_systems
           FROM ({base}) t)
SELECT user, 'total_activities' AS feature,
       CAST(total_activities AS DOUBLE) AS value FROM f
UNION ALL
SELECT user, 'after_hours_activities', CAST(after_hours_activities AS DOUBLE) FROM f
UNION ALL
SELECT user, 'weekend_activities', CAST(weekend_activities AS DOUBLE) FROM f
UNION ALL
SELECT user, 'unique_systems', CAST(unique_systems AS DOUBLE) FROM f
"""


def _unpivot_sql() -> str:
    from threat_detection_nosql_spark.queries.threat import (
        _USER_FEATURES_SQL,
    )
    return _UNPIVOT_SQL.format(base=_USER_FEATURES_SQL)


QUERIES.update({
    "orders_profile": orders_profile,
    "user_features_unpivot": user_features_unpivot,
})

ORACLES.update({
    "orders_profile": _PROFILE_SQL,
})
ORACLES["user_features_unpivot"] = _unpivot_sql()


# ---------------------------------------------------------------------------
# C10: Z-order (Morton) clustering value — multi-column data skipping
# ---------------------------------------------------------------------------

def event_zorder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-value of (user, hour_of_day) per event — the clustering key
    operators/layout.zorder_layout range-partitions on so scans
    filtered on EITHER column prune files (tests/test_layout.py pins
    the span-tightening property). Pure bit-interleave expression, so
    it is oracle-checkable bit-for-bit."""
    from threat_detection_nosql_spark.operators.etl import activity_log
    from threat_detection_nosql_spark.operators.layout import zorder_value
    log = activity_log(spark, sf_dir)
    return log.select(
        "event_id",
        zorder_value(F.col("user"), F.col("hour_of_day"), bits=16)
        .alias("zval"))


def _zorder_sql() -> str:
    from threat_detection_nosql_spark.operators.etl import (
        ACTIVITY_LOG_ORACLE_SQL,
    )
    from threat_detection_nosql_spark.operators.layout import zorder_sql
    z = zorder_sql("log.user", "hour_of_day", bits=16)
    return (f"WITH log AS ({ACTIVITY_LOG_ORACLE_SQL}) "
            f"SELECT event_id, CAST({z} AS BIGINT) AS zval FROM log")


QUERIES["event_zorder"] = event_zorder
ORACLES["event_zorder"] = _zorder_sql()


# ---------------------------------------------------------------------------
# C10: temperature-based mixture reweighting (sampling share ∝ mass^α)
# ---------------------------------------------------------------------------

_MIX_ALPHA = 0.3
_MIX_BUDGET = 0.5
def _n_tok():
    return F.size(F.split(F.col("text"), r"\s+"))


def temperature_mixture_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixture-rebalancing plan per source: raw token share, the
    α=0.3 temperature share (the multilingual-LM upweighting of small
    sources), and the deterministic keep-rate realizing that mixture
    at half the corpus budget. |sources| output rows — the broadcast
    side of the sampling join."""
    docs = load_table(spark, sf_dir, "documents")
    return sampling.temperature_mixture_rates(
        docs, "source", _n_tok(),
        alpha=_MIX_ALPHA, budget_frac=_MIX_BUDGET)


_MIX_RATES_CTE = rf"""
d AS (SELECT doc_id, source,
             len(string_split_regex(text, '\s+')) AS n_tok
      FROM documents),
agg AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(n_tok) AS BIGINT) AS mass
        FROM d GROUP BY source),
tot AS (SELECT CAST(sum(mass) AS DOUBLE) AS tm,
               sum(pow(CAST(mass AS DOUBLE), {_MIX_ALPHA})) AS tp
        FROM agg),
rates AS (SELECT source, n_docs, mass,
                 round(mass / tm, 6) AS share,
                 round(pow(CAST(mass AS DOUBLE), {_MIX_ALPHA}) / tp, 6)
                   AS t_share,
                 round(least(1.0,
                       {_MIX_BUDGET} * (pow(CAST(mass AS DOUBLE),
                                            {_MIX_ALPHA}) / tp)
                       * tm / mass), 6) AS rate
          FROM agg, tot)
"""

_MIX_PLAN_SQL = f"""
WITH {_MIX_RATES_CTE}
SELECT source, n_docs, mass, share, t_share, rate FROM rates
"""


def temperature_mixture_sample(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    """The plan applied: per-source kept docs/tokens after the
    hash-mod filter at the computed rates. The rate table broadcasts;
    the corpus-side decision is one scan-level predicate — a 100 TB
    corpus is rebalanced without a single fact shuffle (the output agg
    is map-combined to |sources| rows)."""
    docs = load_table(spark, sf_dir, "documents").withColumn(
        "n_tok", _n_tok())
    rates = sampling.temperature_mixture_rates(
        docs, "source", F.col("n_tok"),
        alpha=_MIX_ALPHA, budget_frac=_MIX_BUDGET)
    kept = sampling.mixture_hash_sample(
        docs, key="doc_id", stratum="source", rates=rates)
    return (kept.groupBy("source")
            .agg(F.count("*").alias("kept_docs"),
                 F.sum("n_tok").alias("kept_tokens")))


_MIX_SAMPLE_SQL = f"""
WITH {_MIX_RATES_CTE}
SELECT source, CAST(count(*) AS BIGINT) AS kept_docs,
       CAST(sum(n_tok) AS BIGINT) AS kept_tokens
FROM d JOIN rates USING (source)
WHERE CAST(('0x' || substr(md5('mix:' || CAST(doc_id AS VARCHAR)), 1, 15))
           AS BIGINT) % 10000
      < CAST(floor(round(rate * 10000, 3)) AS BIGINT)
GROUP BY source
"""


# ---------------------------------------------------------------------------
# C11: length-bucketed batch planning (padding-efficient batching)
# ---------------------------------------------------------------------------

_BATCH_TOKEN_BUDGET = 4096


def length_bucket_batches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Power-of-two length buckets (bucket = floor(log2(n_tokens)))
    with per-bucket batch counts at a fixed token budget — the batch
    plan that minimizes padding waste when sequences batch with their
    own length class. One map-combined agg to ~log2(max_len) rows;
    exact powers of two are float-safe in both engines (log2 is exact
    there)."""
    docs = load_table(spark, sf_dir, "documents").withColumn(
        "n_tok", _n_tok()).filter(F.col("n_tok") > 0)
    bucket = F.floor(F.log2("n_tok")).cast("int")
    return (docs.groupBy(bucket.alias("len_bucket"))
            .agg(F.count("*").alias("n_docs"),
                 F.sum("n_tok").alias("total_tokens"),
                 F.min("n_tok").alias("min_tokens"),
                 F.max("n_tok").alias("max_tokens"),
                 F.ceil(F.sum("n_tok") / F.lit(_BATCH_TOKEN_BUDGET))
                 .cast("long").alias("n_batches")))


_LENGTH_BUCKETS_SQL = rf"""
WITH d AS (SELECT len(string_split_regex(text, '\s+')) AS n_tok
           FROM documents)
SELECT CAST(floor(log2(n_tok)) AS INT) AS len_bucket,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_tok) AS BIGINT) AS total_tokens,
       CAST(min(n_tok) AS INT) AS min_tokens,
       CAST(max(n_tok) AS INT) AS max_tokens,
       CAST(ceil(CAST(sum(n_tok) AS DOUBLE) / {_BATCH_TOKEN_BUDGET})
            AS BIGINT) AS n_batches
FROM d WHERE n_tok > 0
GROUP BY floor(log2(n_tok))
"""


QUERIES.update({
    "temperature_mixture_plan": temperature_mixture_plan,
    "temperature_mixture_sample": temperature_mixture_sample,
    "length_bucket_batches": length_bucket_batches,
})

ORACLES.update({
    "temperature_mixture_plan": _MIX_PLAN_SQL,
    "temperature_mixture_sample": _MIX_SAMPLE_SQL,
    "length_bucket_batches": _LENGTH_BUCKETS_SQL,
})


# ---------------------------------------------------------------------------
# C12: the composed curation pipeline (filter → dedup → mix) as ONE query
# ---------------------------------------------------------------------------

_PIPE_MIN_TOK = 5
_PIPE_MAX_MWL = 15.0


def corpus_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full curation pass composed end-to-end — quality filter →
    exact dedup (keep min doc_id per content hash) → temperature
    mixture sampling — reported as a per-source stage funnel
    (n_input → n_quality → n_deduped → n_sampled + surviving tokens).

    One lazy plan: Catalyst fuses the filter into the scan, the dedup
    is the only content shuffle, the rate table is a broadcast, and
    the four stage counts are map-combined aggs over shared lineage —
    demonstrating that the pipeline operators COMPOSE without
    materialization barriers between stages."""
    docs = load_table(spark, sf_dir, "documents").withColumn(
        "n_tok", _n_tok())
    mwl = (F.length(F.regexp_replace("text", r"\s", ""))
           / F.col("n_tok"))
    quality = docs.filter((F.col("n_tok") >= _PIPE_MIN_TOK)
                          & (mwl <= _PIPE_MAX_MWL))
    keep = (quality.groupBy(F.md5("text").alias("h"))
            .agg(F.min("doc_id").alias("keep_id")))
    deduped = (quality.withColumn("h", F.md5("text"))
               .join(keep, "h")
               .filter(F.col("doc_id") == F.col("keep_id"))
               .drop("h", "keep_id"))
    rates = sampling.temperature_mixture_rates(
        deduped, "source", F.col("n_tok"),
        alpha=_MIX_ALPHA, budget_frac=_MIX_BUDGET)
    sampled = sampling.mixture_hash_sample(
        deduped, key="doc_id", stratum="source", rates=rates)

    def stage(df: DataFrame, name: str, with_tokens: bool = False):
        aggs = [F.count("*").alias(name)]
        if with_tokens:
            aggs.append(F.sum("n_tok").alias("sampled_tokens"))
        return df.groupBy("source").agg(*aggs)

    return (stage(docs, "n_input")
            .join(stage(quality, "n_quality"), "source", "left")
            .join(stage(deduped, "n_deduped"), "source", "left")
            .join(stage(sampled, "n_sampled", with_tokens=True),
                  "source", "left"))


_PIPELINE_SQL = rf"""
WITH d AS (SELECT doc_id, source, text,
                  len(string_split_regex(text, '\s+')) AS n_tok
           FROM documents),
q AS (SELECT * FROM d
      WHERE n_tok >= {_PIPE_MIN_TOK}
        AND length(regexp_replace(text, '\s', '', 'g')) * 1.0 / n_tok
            <= {_PIPE_MAX_MWL}),
keep AS (SELECT md5(text) AS h, min(doc_id) AS keep_id
         FROM q GROUP BY md5(text)),
dd AS (SELECT q.* FROM q JOIN keep ON md5(q.text) = keep.h
       WHERE q.doc_id = keep.keep_id),
agg AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(n_tok) AS BIGINT) AS mass
        FROM dd GROUP BY source),
tot AS (SELECT CAST(sum(mass) AS DOUBLE) AS tm,
               sum(pow(CAST(mass AS DOUBLE), {_MIX_ALPHA})) AS tp
        FROM agg),
rates AS (SELECT source,
                 round(least(1.0,
                       {_MIX_BUDGET} * (pow(CAST(mass AS DOUBLE),
                                            {_MIX_ALPHA}) / tp)
                       * tm / mass), 6) AS rate
          FROM agg, tot),
sampled AS (SELECT dd.source, dd.doc_id, dd.n_tok
            FROM dd JOIN rates USING (source)
            WHERE CAST(('0x' || substr(md5('mix:' ||
                        CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT)
                  % 10000
                  < CAST(floor(round(rate * 10000, 3)) AS BIGINT))
SELECT i.source,
       i.n_input, qq.n_quality, ddc.n_deduped, s.n_sampled,
       s.sampled_tokens
FROM (SELECT source, CAST(count(*) AS BIGINT) AS n_input
      FROM d GROUP BY source) i
LEFT JOIN (SELECT source, CAST(count(*) AS BIGINT) AS n_quality
           FROM q GROUP BY source) qq USING (source)
LEFT JOIN (SELECT source, CAST(count(*) AS BIGINT) AS n_deduped
           FROM dd GROUP BY source) ddc USING (source)
LEFT JOIN (SELECT source, CAST(count(*) AS BIGINT) AS n_sampled,
                  CAST(sum(n_tok) AS BIGINT) AS sampled_tokens
           FROM sampled GROUP BY source) s USING (source)
"""


QUERIES["corpus_curation_pipeline"] = corpus_curation_pipeline
ORACLES["corpus_curation_pipeline"] = _PIPELINE_SQL


# ---------------------------------------------------------------------------
# C13: per-domain capping (deterministic "reservoir": keep K per stratum)
# ---------------------------------------------------------------------------

_CAP_PER_SOURCE = 40


def domain_capped_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cap every source at K documents — the anti-domination rule of
    web-corpus curation (no crawl domain may swamp the mixture). The
    kept set is the K smallest portable hashes per source: exactly a
    K-item reservoir sample, but partition-invariant and replayable
    (a seeded reservoir depends on encounter order; the hash rank does
    not). WindowGroupLimit prunes to ≤K rows per map task before the
    per-source exchange."""
    from pyspark.sql.window import Window as W
    docs = load_table(spark, sf_dir, "documents")
    h = sampling.hash_bucket(F.col("doc_id"), salt="cap")
    w = W.partitionBy("source").orderBy(F.asc("h"), F.asc("doc_id"))
    return (docs.select("doc_id", "source", h.alias("h"))
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= _CAP_PER_SOURCE)
            .select("doc_id", "source",
                    F.col("rn").cast("int").alias("rank_in_source")))


_DOMAIN_CAP_SQL = f"""
WITH h AS (SELECT doc_id, source,
                  CAST(('0x' || substr(md5('cap:' ||
                       CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT)
                  % 10000 AS h
           FROM documents)
SELECT doc_id, source, CAST(rn AS INT) AS rank_in_source
FROM (SELECT doc_id, source,
             row_number() OVER (PARTITION BY source
                                ORDER BY h ASC, doc_id ASC) AS rn
      FROM h) t
WHERE rn <= {_CAP_PER_SOURCE}
"""


QUERIES["domain_capped_sample"] = domain_capped_sample
ORACLES["domain_capped_sample"] = _DOMAIN_CAP_SQL


# ---------------------------------------------------------------------------
# Deterministic WEIGHTED sampling (round-4 tail): Efraimidis–Spirakis
# A-ES keys over the portable hash — importance sampling (longer docs
# proportionally likelier) that is replayable, unlike rand()-weighted
# reservoir sampling.
# ---------------------------------------------------------------------------

_WS_K = 50  # sample size


def weighted_doc_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k by the A-ES key u^(1/w): u = portable-hash uniform in
    (0,1), w = doc token count — inclusion probability proportional to
    weight, decision a pure function of doc_id. The key is rounded to
    12 decimals BEFORE the top-k so cross-engine pow() last-ulp
    differences can't flip the selection; doc_id breaks exact ties.
    TakeOrderedAndProject top-k — no global sort, driver sees k rows."""
    from threat_detection_nosql_spark.operators.dedup import (
        _portable_hash60,
    )
    docs = load_table(spark, sf_dir, "documents")
    toks = F.filter(F.split("text", r"\s+"), lambda x: x != F.lit(""))
    u = ((_portable_hash60(
        F.concat(F.lit("wsample:"), F.col("doc_id").cast("string")))
        + 1).cast("double") / F.lit(float(1 << 60)))
    w = F.size(toks).cast("double")
    key = F.round(F.pow(u, 1.0 / w), 12)
    return (docs.filter(F.size(toks) > 0)
            .select("doc_id", "source",
                    F.size(toks).alias("n_tokens"),
                    key.alias("es_key"))
            .orderBy(F.desc("es_key"), F.asc("doc_id"))
            .limit(_WS_K))


_WSAMPLE_SQL = rf"""
WITH d AS (
  SELECT doc_id, source,
         len(list_filter(string_split_regex(text, '\s+'),
                         x -> x <> '')) AS n_tokens
  FROM documents),
k AS (
  SELECT doc_id, source, CAST(n_tokens AS BIGINT) AS n_tokens,
         round(pow((CAST(('0x' || substr(md5('wsample:'
                     || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT)
                    + 1) / CAST({1 << 60} AS DOUBLE),
                   1.0 / n_tokens), 12) AS es_key
  FROM d WHERE n_tokens > 0)
SELECT doc_id, source, n_tokens, es_key
FROM k
ORDER BY es_key DESC, doc_id ASC
LIMIT {_WS_K}
"""


QUERIES_TAIL = {"weighted_doc_sample": weighted_doc_sample}
ORACLES_TAIL = {"weighted_doc_sample": _WSAMPLE_SQL}


# -- Naive Bayes language classifier (train + predict, fully replayable) -----

def nb_lang_predictions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multinomial Naive Bayes language classifier trained and scored
    entirely in SQL expressions — the statistical upgrade of
    ``lang_id_heuristic`` and, unlike the engine-RNG ML detectors, a
    model whose EVERY parameter the DuckDB oracle replays value-for-
    value: Laplace-smoothed log-likelihoods log((c(t,lang)+1) /
    (tokens_lang + V)), log priors, and per-doc log-posterior argmax.

    Deterministic 80/20 split (doc_id % 5 == 0 held out — the
    ``dataset_split_assignment`` convention). Shapes, in order: train
    token counts (one map-combinable agg), the vocab×lang parameter
    grid (|V|×5 — built by cross-joining the vocab against the 5-row
    class table, then LEFT-joining observed counts so unseen-in-class
    tokens get the smoothing floor), test tokens inner-joined to the
    broadcastable grid on token, one (doc, lang) sum, one argmax
    window over the ROUNDED posterior (ulp-stable cut, ties to the
    lexicographically first language). No UDF, no driver state beyond
    the plan — at 100× corpus the grid stays |V|×5 and everything else
    is hash aggs and one vocab-keyed join."""
    docs = load_table(spark, sf_dir, "documents")
    train = docs.filter(F.col("doc_id") % 5 != 0)
    test = docs.filter(F.col("doc_id") % 5 == 0)

    def toks(df):
        return (df.select("doc_id", "lang",
                          F.explode(F.split(F.col("text"), r"\s+"))
                          .alias("token"))
                .filter(F.col("token") != ""))

    tr = toks(train)
    cls_counts = tr.groupBy("lang", "token").agg(F.count("*").alias("c"))
    cls_totals = (cls_counts.groupBy("lang")
                  .agg(F.sum("c").alias("total"))
                  .join(train.groupBy("lang")
                        .agg(F.count("*").alias("n_docs")), "lang"))
    n_train = train.count()
    vocab = cls_counts.select("token").distinct()
    v_size = vocab.count()
    grid = (vocab.crossJoin(F.broadcast(cls_totals))
            .join(cls_counts, ["lang", "token"], "left")
            .select("lang", "token", "total", "n_docs",
                    F.coalesce(F.col("c"), F.lit(0)).alias("c")))
    loglik = F.log((F.col("c") + 1.0)
                   / (F.col("total") + F.lit(float(v_size))))
    params = grid.select(
        "lang", "token", loglik.alias("loglik"),
        F.log(F.col("n_docs") / F.lit(float(n_train))).alias("logprior"))
    te = (toks(test).groupBy("doc_id", F.col("lang").alias("actual_lang"),
                             "token")
          .agg(F.count("*").alias("tf")))
    scored = (te.join(params, "token")
              .groupBy("doc_id", "actual_lang", "lang", "logprior")
              .agg(F.sum(F.col("tf") * F.col("loglik")).alias("ll")))
    post = scored.select(
        "doc_id", "actual_lang", "lang",
        F.round(F.col("logprior") + F.col("ll"), 6).alias("log_posterior"))
    from pyspark.sql.window import Window as W
    w = W.partitionBy("doc_id").orderBy(F.desc("log_posterior"),
                                        F.asc("lang"))
    return (post.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("doc_id", "actual_lang",
                    F.col("lang").alias("pred_lang"), "log_posterior",
                    F.when(F.col("lang") == F.col("actual_lang"), 1)
                    .otherwise(0).alias("correct")))


_NB_SQL = r"""
WITH train AS (SELECT * FROM documents WHERE doc_id % 5 <> 0),
test AS (SELECT * FROM documents WHERE doc_id % 5 = 0),
tr AS (SELECT doc_id, lang,
              unnest(string_split_regex(text, '\s+')) AS token
       FROM train),
trf AS (SELECT * FROM tr WHERE token <> ''),
cls_counts AS (SELECT lang, token, CAST(count(*) AS BIGINT) AS c
               FROM trf GROUP BY 1, 2),
cls_totals AS (SELECT t.lang, t.total, d.n_docs
               FROM (SELECT lang, sum(c) AS total
                     FROM cls_counts GROUP BY 1) t
               JOIN (SELECT lang, count(*) AS n_docs
                     FROM train GROUP BY 1) d USING (lang)),
n_train AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM train),
vocab AS (SELECT DISTINCT token FROM cls_counts),
v_size AS (SELECT CAST(count(*) AS DOUBLE) AS v FROM vocab),
grid AS (SELECT ct.lang, vocab.token, ct.total, ct.n_docs,
                COALESCE(cc.c, 0) AS c
         FROM vocab CROSS JOIN cls_totals ct
         LEFT JOIN cls_counts cc
           ON cc.lang = ct.lang AND cc.token = vocab.token),
params AS (SELECT lang, token,
                  ln((c + 1.0) / (total + (SELECT v FROM v_size)))
                    AS loglik,
                  ln(n_docs / (SELECT n FROM n_train)) AS logprior
           FROM grid),
te AS (SELECT doc_id, lang AS actual_lang, token,
              CAST(count(*) AS BIGINT) AS tf
       FROM (SELECT doc_id, lang,
                    unnest(string_split_regex(text, '\s+')) AS token
             FROM test) x
       WHERE token <> '' GROUP BY 1, 2, 3),
scored AS (SELECT te.doc_id, te.actual_lang, p.lang, p.logprior,
                  sum(te.tf * p.loglik) AS ll
           FROM te JOIN params p USING (token)
           GROUP BY 1, 2, 3, 4),
post AS (SELECT doc_id, actual_lang, lang,
                round(logprior + ll, 6) AS log_posterior
         FROM scored)
SELECT doc_id, actual_lang, lang AS pred_lang, log_posterior,
       CASE WHEN lang = actual_lang THEN 1 ELSE 0 END AS correct
FROM (SELECT *, row_number() OVER (PARTITION BY doc_id
            ORDER BY log_posterior DESC, lang ASC) AS rn
      FROM post) t
WHERE rn = 1
"""

QUERIES_TAIL["nb_lang_predictions"] = nb_lang_predictions
ORACLES_TAIL["nb_lang_predictions"] = _NB_SQL


def source_lang_chi2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson chi-square independence statistic between document
    source and language, with the contingency dimensions and degrees
    of freedom — the composition audit that tells you whether sources
    are language-skewed BEFORE a mixture plan assumes they aren't
    (df = (|sources|−1)·(|langs|−1); compare χ² to the df to eyeball
    dependence). Expected counts come from the margins: e = row·col/N.

    One (source, lang) hash agg; margins are two roll-ups of it joined
    back broadcast; every input to the χ² sum is an integer count and
    the statistic is rounded once at the end."""
    docs = load_table(spark, sf_dir, "documents")
    joint = docs.groupBy("source", "lang").agg(F.count("*").alias("c"))
    n_total = float(docs.count())
    rows_ = joint.groupBy("source").agg(F.sum("c").alias("row_n"))
    cols = joint.groupBy("lang").agg(F.sum("c").alias("col_n"))
    j = (joint.join(F.broadcast(rows_), "source")
         .join(F.broadcast(cols), "lang"))
    e = F.col("row_n") * F.col("col_n") / F.lit(n_total)
    term = (F.col("c") - e) * (F.col("c") - e) / e
    agg = j.agg(F.round(F.sum(term), 6).alias("chi2"),
                F.count("*").alias("n_cells"))
    dims = (rows_.agg(F.count("*").alias("n_sources"))
            .crossJoin(cols.agg(F.count("*").alias("n_langs"))))
    return (agg.crossJoin(dims)
            .select("chi2", "n_cells", "n_sources", "n_langs",
                    ((F.col("n_sources") - 1) * (F.col("n_langs") - 1))
                    .alias("dof")))


_CHI2_SQL = """
WITH joint AS (SELECT source, lang, CAST(count(*) AS BIGINT) AS c
               FROM documents GROUP BY 1, 2),
tot AS (SELECT CAST(sum(c) AS DOUBLE) AS n FROM joint),
r AS (SELECT source, CAST(sum(c) AS BIGINT) AS row_n
      FROM joint GROUP BY 1),
l AS (SELECT lang, CAST(sum(c) AS BIGINT) AS col_n FROM joint GROUP BY 1),
terms AS (SELECT (c - row_n * col_n / n) * (c - row_n * col_n / n)
                 / (row_n * col_n / n) AS t
          FROM joint JOIN r USING (source) JOIN l USING (lang)
          CROSS JOIN tot),
agg AS (SELECT round(sum(t), 6) AS chi2,
               CAST(count(*) AS BIGINT) AS n_cells FROM terms),
dims AS (SELECT (SELECT CAST(count(*) AS BIGINT) FROM r) AS n_sources,
                (SELECT CAST(count(*) AS BIGINT) FROM l) AS n_langs)
SELECT chi2, n_cells, n_sources, n_langs,
       (n_sources - 1) * (n_langs - 1) AS dof
FROM agg CROSS JOIN dims
"""

QUERIES_TAIL["source_lang_chi2"] = source_lang_chi2
ORACLES_TAIL["source_lang_chi2"] = _CHI2_SQL


def vocab_growth_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps'-law curve: cumulative distinct vocabulary vs cumulative
    token count as the corpus is consumed in doc_id order — the
    diminishing-returns view that says how much NEW language the next
    million tokens will buy (flattening curve → more data adds volume,
    not vocabulary). Sub-linear growth is the expected shape (Heaps
    1978 — public knowledge).

    Cumulative DISTINCT has no window form, so the curve is built from
    first occurrences: a token's first_doc is one min-agg, the
    cumulative vocabulary at doc d is a running count of tokens whose
    first_doc ≤ d. Everything is an integer count; since round 10 the
    two running sums ride ONE distributed prefix-sum pass
    (operators/ranking.with_global_cumsum — range partition +
    per-slice running sums + broadcast value offsets), so the per-doc
    frame never funnels through a single-partition sort."""
    from threat_detection_nosql_spark.operators.ranking import \
        with_global_cumsum
    docs = load_table(spark, sf_dir, "documents")
    tok = (docs.select("doc_id",
                       F.explode(F.split(F.col("text"), r"\s+"))
                       .alias("token"))
           .filter(F.col("token") != ""))
    per_doc = tok.groupBy("doc_id").agg(F.count("*").alias("n_tokens"))
    first = tok.groupBy("token").agg(F.min("doc_id").alias("first_doc"))
    news = first.groupBy("first_doc").agg(F.count("*").alias("n_new"))
    base = (per_doc.join(news,
                         per_doc["doc_id"] == news["first_doc"], "left")
            .select("doc_id", "n_tokens",
                    F.coalesce("n_new", F.lit(0)).alias("n_new")))
    return (with_global_cumsum(base, ["doc_id"], ["n_tokens", "n_new"],
                               cumsum_cols=["cum_tokens", "cum_vocab"])
            .select("doc_id", "cum_tokens", "cum_vocab"))


_VOCAB_GROWTH_SQL = r"""
WITH tok AS (SELECT doc_id, unnest(string_split_regex(text, '\s+')) AS token
             FROM documents),
tf AS (SELECT doc_id, token FROM tok WHERE token <> ''),
per_doc AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens
            FROM tf GROUP BY 1),
first AS (SELECT token, min(doc_id) AS first_doc FROM tf GROUP BY 1),
news AS (SELECT first_doc, CAST(count(*) AS BIGINT) AS n_new
         FROM first GROUP BY 1),
base AS (SELECT p.doc_id, n_tokens, COALESCE(n_new, 0) AS n_new
         FROM per_doc p LEFT JOIN news ON news.first_doc = p.doc_id)
SELECT doc_id,
       CAST(sum(n_tokens) OVER w AS BIGINT) AS cum_tokens,
       CAST(sum(n_new) OVER w AS BIGINT) AS cum_vocab
FROM base
WINDOW w AS (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING
             AND CURRENT ROW)
"""

QUERIES_TAIL["vocab_growth_curve"] = vocab_growth_curve
ORACLES_TAIL["vocab_growth_curve"] = _VOCAB_GROWTH_SQL


_ZIPF_TOP = 100


def zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf's-law check: OLS slope of ln(frequency) on ln(rank) over
    the top-100 token ranks (slope ≈ −1 for natural language; a flat
    slope flags synthetic or templated text) — with Heaps'
    (``vocab_growth_curve``) and novelty, the corpus-statistics trio.

    Ranks come from one global (freq DESC, token ASC) total order —
    engine-identical; the regression is the closed-form 5-sum OLS over
    just 100 (ln rank, ln freq) pairs, where ln(rank) is a log of an
    exact integer and ln(freq) a log of an exact count, so both
    engines transform identical inputs and only the final two rounded
    divisions can differ at the ulp level."""
    from pyspark.sql.window import Window as W
    docs = load_table(spark, sf_dir, "documents")
    freq = (docs.select(F.explode(F.split(F.col("text"), r"\s+"))
                        .alias("token"))
            .filter(F.col("token") != "")
            .groupBy("token").agg(F.count("*").alias("freq")))
    # top-K FIRST (sort+limit = distributed TakeOrderedAndProject per-
    # partition heaps), THEN the rank window over the K-row remainder —
    # the former row_number-then-filter funneled the whole vocabulary
    # through one window task (round-10 audit)
    ranked = (freq.orderBy(F.desc("freq"), F.asc("token"))
              .limit(_ZIPF_TOP)
              .withColumn(
                  "rank", F.row_number().over(
                      W.orderBy(F.desc("freq"), F.asc("token")))))
    xy = ranked.select(F.log("rank").alias("x"), F.log("freq").alias("y"))
    s = xy.agg(F.count("*").alias("n"),
               F.sum("x").alias("sx"), F.sum("y").alias("sy"),
               F.sum(F.col("x") * F.col("y")).alias("sxy"),
               F.sum(F.col("x") * F.col("x")).alias("sxx"))
    slope = ((F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
             / (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")))
    intercept = (F.col("sy") - slope * F.col("sx")) / F.col("n")
    return s.select("n", F.round(slope, 6).alias("zipf_slope"),
                    F.round(intercept, 6).alias("zipf_intercept"))


_ZIPF_SQL = rf"""
WITH tok AS (SELECT unnest(string_split_regex(text, '\s+')) AS token
             FROM documents),
freq AS (SELECT token, CAST(count(*) AS BIGINT) AS freq
         FROM tok WHERE token <> '' GROUP BY 1),
ranked AS (SELECT freq,
                  row_number() OVER (ORDER BY freq DESC, token ASC)
                    AS rank
           FROM freq QUALIFY rank <= {_ZIPF_TOP}),
xy AS (SELECT ln(rank) AS x, ln(freq) AS y FROM ranked),
s AS (SELECT CAST(count(*) AS BIGINT) AS n,
             sum(x) AS sx, sum(y) AS sy,
             sum(x * y) AS sxy, sum(x * x) AS sxx
      FROM xy)
SELECT n,
       round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS zipf_slope,
       round((sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n,
             6) AS zipf_intercept
FROM s
"""

QUERIES_TAIL["zipf_fit"] = zipf_fit
ORACLES_TAIL["zipf_fit"] = _ZIPF_SQL


# ---------------------------------------------------------------------------
# C-tail: vocabulary richness estimation (Chao1 + Good-Turing)
# ---------------------------------------------------------------------------

def vocab_richness_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source vocabulary richness: observed distinct tokens V,
    total tokens N, singleton/doubleton counts N1/N2, the Chao1
    lower-bound estimate of the TRUE vocabulary size (public
    knowledge — Chao 1984: V + N1^2/(2*N2), bias-corrected
    V + N1*(N1-1)/2 when N2 = 0), and the Good-Turing unseen-token
    probability mass N1/N (Good 1953) — the two numbers a corpus
    curator reads to judge whether a source's vocabulary is saturated
    or still growing (complements vocab_growth_curve, which shows the
    trajectory; this estimates the asymptote).

    Exactness: two stacked integer hash aggs (token counts, then the
    frequency-of-frequency rollup) — everything BIGINT until the two
    final divisions, rounded at emission.

    Scale shape: explode -> (source, token) count (map-side partials
    absorb the explode) -> per-source conditional agg. No joins, no
    windows, nothing driver-side; the same two-agg chain at any
    corpus size."""
    docs = load_table(spark, sf_dir, "documents")
    tok = (docs.select("source",
                       F.explode(F.split("text", r"\s+")).alias("token"))
           .filter(F.col("token") != ""))
    cnt = tok.groupBy("source", "token").agg(F.count("*").alias("c"))
    per = (cnt.groupBy("source")
           .agg(F.count("*").alias("v_observed"),
                F.sum("c").alias("n_tokens"),
                F.sum((F.col("c") == 1).cast("long")).alias("n1"),
                F.sum((F.col("c") == 2).cast("long")).alias("n2")))
    chao1 = F.when(
        F.col("n2") > 0,
        F.col("v_observed")
        + (F.col("n1") * F.col("n1")).cast("double")
        / (2.0 * F.col("n2"))).otherwise(
        F.col("v_observed")
        + (F.col("n1") * (F.col("n1") - 1)).cast("double") / 2.0)
    return per.select(
        "source", "v_observed", "n_tokens", "n1", "n2",
        F.round(chao1, 6).alias("chao1_vocab"),
        F.round(F.col("n1").cast("double") / F.col("n_tokens"), 6)
        .alias("gt_unseen_mass")).orderBy("source")


_RICHNESS_SQL = r"""
WITH tok AS (SELECT source,
                    unnest(string_split_regex(text, '\s+')) AS token
             FROM documents),
cnt AS (SELECT source, token, CAST(count(*) AS BIGINT) AS c
        FROM tok WHERE token <> '' GROUP BY source, token),
per AS (SELECT source,
               CAST(count(*) AS BIGINT) AS v_observed,
               CAST(sum(c) AS BIGINT) AS n_tokens,
               CAST(sum(CAST(c = 1 AS INT)) AS BIGINT) AS n1,
               CAST(sum(CAST(c = 2 AS INT)) AS BIGINT) AS n2
        FROM cnt GROUP BY source)
SELECT source, v_observed, n_tokens, n1, n2,
       round(CASE WHEN n2 > 0
                  THEN v_observed + CAST(n1 * n1 AS DOUBLE) / (2.0 * n2)
                  ELSE v_observed + CAST(n1 * (n1 - 1) AS DOUBLE) / 2.0
             END, 6) AS chao1_vocab,
       round(CAST(n1 AS DOUBLE) / n_tokens, 6) AS gt_unseen_mass
FROM per
ORDER BY source
"""

QUERIES_TAIL["vocab_richness_report"] = vocab_richness_report
ORACLES_TAIL["vocab_richness_report"] = _RICHNESS_SQL


# ---------------------------------------------------------------------------
# C-tail: group k-fold assignment — leakage-free CV splits
# ---------------------------------------------------------------------------

_KFOLD_K = 5


def group_kfold_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group k-fold CV assignment over the events fact table with
    user_id as the group key: fold = portable-hash(user) mod 5, so
    EVERY event of a user lands in one fold — the grouped-CV property
    (sklearn GroupKFold semantics) that stops per-user temporal
    leakage across train/test folds. Emits the per-fold balance
    report a practitioner actually checks before trusting the split:
    group count, row count, row share, and per-fold purchase rate
    (the label-balance proxy).

    Membership is a pure function of user_id (dataset_split_assignment
    house style) — adding events or re-sharding never moves a user
    across folds. One scan, one map-combinable agg keyed by the
    5-value fold; the distinct-user count per fold rides the same agg
    as count(DISTINCT user_id) (Spark plans a partial-distinct
    expand, still one pass)."""
    ev = load_table(spark, sf_dir, "events")
    fold = sampling.hash_bucket(F.col("user_id"), salt="fold") % _KFOLD_K
    per = (ev.select(fold.alias("fold"), "user_id",
                     (F.col("event_type") == "purchase").cast("long")
                     .alias("is_purchase"))
           .groupBy("fold")
           .agg(F.countDistinct("user_id").alias("n_users"),
                F.count("*").alias("n_events"),
                F.sum("is_purchase").alias("n_purchases")))
    from pyspark.sql.window import Window
    tot = F.sum("n_events").over(Window.partitionBy())
    return (per.select(
        "fold", "n_users", "n_events",
        F.round(F.col("n_events").cast("double") / tot, 6)
        .alias("event_share"),
        F.round(F.col("n_purchases").cast("double") / F.col("n_events"), 6)
        .alias("purchase_rate"))
        .orderBy("fold"))


_GKFOLD_SQL = f"""
WITH e AS (SELECT CAST(('0x' || substr(md5('fold:'
                       || CAST(user_id AS VARCHAR)), 1, 15)) AS BIGINT)
                  % 10000 % {_KFOLD_K} AS fold,
                  user_id,
                  CAST(event_type = 'purchase' AS INT) AS is_purchase
           FROM events),
per AS (SELECT fold,
               CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
               CAST(count(*) AS BIGINT) AS n_events,
               CAST(sum(is_purchase) AS BIGINT) AS n_purchases
        FROM e GROUP BY fold),
tot AS (SELECT CAST(sum(n_events) AS BIGINT) AS t FROM per)
SELECT fold, n_users, n_events,
       round(CAST(n_events AS DOUBLE) / t, 6) AS event_share,
       round(CAST(n_purchases AS DOUBLE) / n_events, 6) AS purchase_rate
FROM per CROSS JOIN tot
ORDER BY fold
"""

QUERIES_TAIL["group_kfold_assignment"] = group_kfold_assignment
ORACLES_TAIL["group_kfold_assignment"] = _GKFOLD_SQL


# -- C15: Neyman allocation with largest-remainder apportionment -------------

_NEYMAN_K = 200          # total sample budget to apportion
# (small enough that every test SF genuinely subsamples each
#  stratum; a plan whose alloc exceeds a stratum population
#  saturates in neyman_quota_sample and shows up as rows < K)


def neyman_allocation_plan(spark: SparkSession,
                           sf_dir: str) -> DataFrame:
    """Stratified-sampling design: apportion a fixed budget of
    {K} draws across source strata by Neyman allocation
    (n_h ∝ N_h·σ_h — minimum-variance for a fixed budget), with the
    fractional ideal turned into integers by the LARGEST-REMAINDER
    (Hamilton) method. The sampling-design twin of the executors
    (deterministic_sample / weighted_doc_sample take samples; this
    decides how many each stratum deserves).

    Exactness: N_h·σ_h = sqrt(N_h·Σx² − S_h²) — one sqrt of an exact
    DECIMAL/HUGEINT spread per stratum, scaled and rounded to the
    integer weight W_h = round(1024·sqrt(spread)). That per-stratum
    double is a single IEEE expression (identical both engines — no
    cross-strata float sum ever happens); everything after is exact
    integer arithmetic: base_h = K·W_h div ΣW, leftover = K − Σbase
    handed to the largest K·W_h mod ΣW remainders (ties to the
    smaller source name). Σ alloc == K by construction.

    Scale shape: one fact agg to stratum grain, a broadcast 1-row
    total, and a rank window over the |strata| rows — constant-size
    regardless of corpus."""
    docs = load_table(spark, sf_dir, "documents")
    per = (docs.groupBy("source")
           .agg(F.count("*").alias("n_docs"),
                F.sum(F.length("text").cast("decimal(38,0)"))
                .alias("s"),
                F.sum((F.length("text").cast("decimal(38,0)")
                       * F.length("text")).cast("decimal(38,0)"))
                .alias("qq")))
    spread = (F.col("n_docs").cast("decimal(38,0)") * F.col("qq")
              - F.col("s") * F.col("s"))
    weighted = per.select(
        "source", "n_docs",
        F.round(F.sqrt(spread.cast("double")) * 1024, 0).cast("long")
        .alias("w"))
    tot = weighted.agg(F.sum("w").alias("tw"),
                       F.count("*").alias("n_strata"))
    k = F.lit(_NEYMAN_K)
    based = (weighted.crossJoin(F.broadcast(tot))
             .withColumn("base", F.expr(
                 f"CAST({_NEYMAN_K} AS BIGINT) * w div tw"))
             .withColumn("rem", F.expr(
                 f"CAST({_NEYMAN_K} AS BIGINT) * w % tw")))
    from pyspark.sql.window import Window as W
    leftover = (k - F.sum("base").over(W.partitionBy()))
    rk = F.row_number().over(W.orderBy(F.desc("rem"), F.asc("source")))
    return (based
            .withColumn("alloc",
                        (F.col("base")
                         + (rk <= leftover).cast("long")).cast("long"))
            .select("source", "n_docs", F.col("w").alias("weight"),
                    F.round(k * F.col("w")
                            / F.col("tw").cast("double"), 6)
                    .alias("ideal"),
                    "alloc")
            .orderBy("source"))


neyman_allocation_plan.__doc__ = (
    neyman_allocation_plan.__doc__.replace("{K}", str(_NEYMAN_K)))


_NEYMAN_SQL = f"""
WITH per AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(CAST(length(text) AS HUGEINT)) AS HUGEINT) AS s,
         CAST(sum(CAST(length(text) AS HUGEINT) * length(text))
              AS HUGEINT) AS qq
  FROM documents GROUP BY source),
weighted AS (
  SELECT source, n_docs,
         CAST(round(sqrt(CAST(CAST(n_docs AS HUGEINT) * qq - s * s
                              AS DOUBLE)) * 1024, 0) AS BIGINT) AS w
  FROM per),
tot AS (SELECT CAST(sum(w) AS BIGINT) AS tw FROM weighted),
based AS (
  SELECT source, n_docs, w, tw,
         CAST({_NEYMAN_K} AS BIGINT) * w // tw AS base,
         CAST({_NEYMAN_K} AS BIGINT) * w % tw AS rem
  FROM weighted CROSS JOIN tot),
lo AS (SELECT {_NEYMAN_K} - sum(base) AS leftover FROM based),
ranked AS (
  SELECT b.*, l.leftover,
         row_number() OVER (ORDER BY rem DESC, source ASC) AS rk
  FROM based b CROSS JOIN lo l)
SELECT source, n_docs, w AS weight,
       round({_NEYMAN_K} * w / CAST(tw AS DOUBLE), 6) AS ideal,
       CAST(base + CASE WHEN rk <= leftover THEN 1 ELSE 0 END
            AS BIGINT) AS alloc
FROM ranked
ORDER BY source
"""

QUERIES_TAIL["neyman_allocation_plan"] = neyman_allocation_plan
ORACLES_TAIL["neyman_allocation_plan"] = _NEYMAN_SQL


def neyman_quota_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXECUTION of neyman_allocation_plan: per stratum, draw exactly
    its allocated quota by deterministic hash order (smallest
    md5('ney:'||doc_id) first — reproducible, uniform within the
    stratum, and stable under reruns). Emits the drawn docs with
    their within-stratum rank; Σ rows == the plan's budget.

    Exactness: the draw order is a portable md5 ranking (the house
    sampling hash family), the quota join is exact integers from the
    plan; rank ≤ alloc is the whole filter.

    Scale shape: the plan is a broadcast |strata|-row frame; the draw
    is one row_number window PARTITIONED BY source (WindowGroupLimit
    prunes map-side once Spark sees the rank filter) — no global
    sort, no shuffle beyond the per-stratum rank exchange."""
    from pyspark.sql.window import Window as W
    docs = load_table(spark, sf_dir, "documents")
    plan = neyman_allocation_plan(spark, sf_dir).select(
        "source", "alloc")
    key = F.md5(F.concat(F.lit("ney:"),
                         F.col("doc_id").cast("string")))
    w = W.partitionBy("source").orderBy(key.asc(), F.asc("doc_id"))
    ranked = docs.select("doc_id", "source",
                         F.row_number().over(w).alias("draw_rank"))
    return (ranked.join(F.broadcast(plan), "source")
            .filter(F.col("draw_rank") <= F.col("alloc"))
            .select("source", "doc_id", "draw_rank")
            .orderBy("source", "draw_rank"))


_NEYMAN_SAMPLE_SQL = (
    _NEYMAN_SQL[:_NEYMAN_SQL.rindex("SELECT source, n_docs")]
    .rstrip()                      # ends after ranked's closing paren
    + """,
plan AS (
  SELECT source,
         CAST(base + CASE WHEN rk <= leftover THEN 1 ELSE 0 END
              AS BIGINT) AS alloc
  FROM ranked),
drawn AS (
  SELECT doc_id, source,
         row_number() OVER (PARTITION BY source
                            ORDER BY md5('ney:' ||
                                     CAST(doc_id AS VARCHAR)) ASC,
                                     doc_id ASC) AS draw_rank
  FROM documents)
SELECT d.source, d.doc_id, d.draw_rank
FROM drawn d JOIN plan p ON d.source = p.source
WHERE d.draw_rank <= p.alloc
ORDER BY d.source, d.draw_rank
""")

QUERIES_TAIL["neyman_quota_sample"] = neyman_quota_sample
ORACLES_TAIL["neyman_quota_sample"] = _NEYMAN_SAMPLE_SQL
