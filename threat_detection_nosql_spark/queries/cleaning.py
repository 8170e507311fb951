"""Corpus-cleaning queries: PII redaction and benchmark decontamination.

Two training-data-pipeline stages the reference has no analog for
(its corpus is synthetic activity logs): scrubbing personal data before
training, and removing documents that leak evaluation benchmarks into
the training set. Both are pure JVM expression pipelines (regex /
n-gram joins — no UDFs), so they hold up at 100 TB: redaction is
embarrassingly parallel per document, and decontamination shuffles only
distinct n-grams, never document text.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from threat_detection_nosql_spark.operators.etl import (
    ACTIVITY_LOG_ORACLE_SQL,
)
from threat_detection_nosql_spark.sources.readers import load_table

# Patterns deliberately restricted to syntax with identical semantics in
# Java regex (Spark) and RE2 (DuckDB): char classes, bounded repeats,
# word boundaries. No backrefs / lookaround (RE2 has neither).
_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PHONE_RE = r"\b555-\d{4}\b"


def _with_planted_pii(docs: DataFrame) -> DataFrame:
    """The synthetic corpus carries no PII; plant a deterministic
    email + phone tail on every 7th doc so the redaction path is
    actually exercised (and oracle-checked) end to end."""
    tail = F.concat(
        F.col("text"), F.lit(" contact: user"), F.col("doc_id"),
        F.lit("@example.com or 555-"),
        F.lpad(((F.col("doc_id") * 7) % 10000).cast("string"), 4, "0"))
    return docs.select(
        "doc_id",
        F.when(F.col("doc_id") % 7 == 0, tail).otherwise(F.col("text"))
         .alias("text"))


def pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc PII inventory + redacted-content hash. Counting and
    replacement are single-pass regex expressions inside whole-stage
    codegen; the output carries a hash, not the text, so the result
    set stays small however large the corpus."""
    base = _with_planted_pii(load_table(spark, sf_dir, "documents"))
    redacted = F.regexp_replace(
        F.regexp_replace("text", _EMAIL_RE, "<EMAIL>"),
        _PHONE_RE, "<PHONE>")
    return base.select(
        "doc_id",
        F.regexp_count("text", F.lit(_EMAIL_RE)).alias("n_emails"),
        F.regexp_count("text", F.lit(_PHONE_RE)).alias("n_phones"),
        F.md5(redacted).alias("redacted_hash"))


_PII_BASE_CTE = """
base AS (
  SELECT doc_id,
         CASE WHEN doc_id % 7 = 0
              THEN text || ' contact: user' || doc_id
                   || '@example.com or 555-'
                   || lpad(CAST((doc_id * 7) % 10000 AS VARCHAR), 4, '0')
              ELSE text END AS text
  FROM documents)
"""

_PII_SQL = f"""
WITH {_PII_BASE_CTE}
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '{_EMAIL_RE}')) AS INT)
         AS n_emails,
       CAST(len(regexp_extract_all(text, '{_PHONE_RE}')) AS INT)
         AS n_phones,
       md5(regexp_replace(
             regexp_replace(text, '{_EMAIL_RE}', '<EMAIL>', 'g'),
             '{_PHONE_RE}', '<PHONE>', 'g')) AS redacted_hash
FROM base
"""


def _word_ngrams(docs: DataFrame, n: int) -> DataFrame:
    """Distinct word-n-grams per doc, as array expressions. Same
    zip_with-over-shifted-slices shape as pipeline._shingles (and the
    same CollapseProject caveat: lambdas only touch lambda variables,
    so the text is split O(n) times per row, not per element)."""
    from threat_detection_nosql_spark.sources.readers import spread
    docs = spread(docs)
    w = F.split(F.col("text"), r"\s+")
    n_g = F.greatest(F.size(w) - (n - 1), F.lit(0))
    acc: Column = F.slice(w, 1, n_g)
    for j in range(2, n + 1):
        acc = F.zip_with(acc, F.slice(w, j, n_g),
                         lambda a, b: F.concat_ws(" ", a, b))
    # per-doc dedup BEFORE the explode: array_distinct runs map-side,
    # so no (doc_id, gram) shuffle ever happens just to dedup — at
    # corpus scale that shuffle is the whole query's bottleneck
    return (docs.filter(F.size(w) >= n)
            .select("doc_id",
                    F.explode(F.array_distinct(acc)).alias("gram")))


_DECON_N = 8          # n-gram length (WMDP/GPT-3-style 8-gram overlap)
_DECON_BENCH = 50     # doc_id % _DECON_BENCH == 0 plays the benchmark set


def benchmark_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train-set decontamination by 8-gram collision: every doc sharing
    a word-8-gram with the (held-out) benchmark slice is flagged with
    its overlap count. The benchmark n-gram set is orders of magnitude
    smaller than the corpus → broadcast; the corpus side streams through
    map-side, so the only shuffle is the per-doc overlap count."""
    docs = load_table(spark, sf_dir, "documents")
    grams = _word_ngrams(docs, _DECON_N)
    bench = (grams.filter(F.col("doc_id") % _DECON_BENCH == 0)
             .select("gram").distinct())
    return (grams.filter(F.col("doc_id") % _DECON_BENCH != 0)
            .join(F.broadcast(bench), "gram")
            .groupBy("doc_id")
            .agg(F.count("*").alias("n_overlap")))


_DECON_GRAM = " || ' ' || ".join(
    f"wds[i+{j}]" if j else "wds[i]" for j in range(_DECON_N))

_DECON_SQL = rf"""
WITH w AS (SELECT doc_id, string_split_regex(text, '\s+') AS wds
           FROM documents),
g AS (SELECT DISTINCT doc_id, {_DECON_GRAM} AS gram
      FROM w, LATERAL (SELECT unnest(range(1, len(wds) - {_DECON_N - 2}))
                       AS i) ix),
bench AS (SELECT DISTINCT gram FROM g WHERE doc_id % {_DECON_BENCH} = 0)
SELECT g.doc_id, CAST(count(*) AS BIGINT) AS n_overlap
FROM g JOIN bench USING (gram)
WHERE g.doc_id % {_DECON_BENCH} <> 0
GROUP BY g.doc_id
"""


QUERIES = {
    "pii_redaction": pii_redaction,
    "benchmark_decontamination": benchmark_decontamination,
}

ORACLES = {
    "pii_redaction": _PII_SQL,
    "benchmark_decontamination": _DECON_SQL,
}


# ---------------------------------------------------------------------------
# Data-quality gate: declarative constraint report over the fact tables
# ---------------------------------------------------------------------------

def data_quality_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Constraint-violation report (the pre-ingest gate a production
    pipeline runs before training-data promotion): null checks, value
    ranges, key uniqueness, and referential integrity, one row per
    rule with its violation count.

    Shape: the null/range rules are conditional aggregates fused into
    ONE scan per table; uniqueness is a count-per-key agg re-aggregated
    (map-combined both levels); the FK orphan check is a left-anti
    join against the parent keys. Every rule is expressible as a
    count, so the report unions tiny 1-row aggregates — at 100 TB each
    input table is still scanned at most twice (once fused rules, once
    the key agg), never per-rule.
    """
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")

    def rule(name, cnt):
        return cnt.select(F.lit(name).alias("rule"),
                          F.col("violations").cast("long")
                          .alias("violations"))

    li_scan = li.agg(
        F.sum(F.when(F.col("l_quantity") <= 0, 1).otherwise(0))
        .alias("bad_qty"),
        F.sum(F.when(F.col("l_extendedprice") < 0, 1).otherwise(0))
        .alias("bad_price"),
        F.sum(F.when(F.col("l_discount").between(0.0, 1.0), 0).otherwise(1))
        .alias("bad_discount"),
        F.sum(F.when(F.col("l_shipdate").isNull(), 1).otherwise(0))
        .alias("null_shipdate"))
    ord_dup = (orders.groupBy("o_orderkey").agg(F.count("*").alias("n"))
               .agg(F.sum(F.when(F.col("n") > 1, F.col("n") - 1)
                          .otherwise(0)).alias("violations")))
    orphans = (li.select("l_orderkey")
               .join(orders.select("o_orderkey"),
                     F.col("l_orderkey") == F.col("o_orderkey"),
                     "left_anti")
               .agg(F.count("*").alias("violations")))
    return (rule("lineitem_quantity_positive",
                 li_scan.select(F.col("bad_qty").alias("violations")))
            .unionByName(rule(
                "lineitem_price_nonnegative",
                li_scan.select(F.col("bad_price").alias("violations"))))
            .unionByName(rule(
                "lineitem_discount_in_unit_range",
                li_scan.select(F.col("bad_discount").alias("violations"))))
            .unionByName(rule(
                "lineitem_shipdate_not_null",
                li_scan.select(F.col("null_shipdate").alias("violations"))))
            .unionByName(rule("orders_orderkey_unique", ord_dup))
            .unionByName(rule("lineitem_orderkey_fk", orphans)))


_QUALITY_REPORT_SQL = """
SELECT 'lineitem_quantity_positive' AS rule,
       CAST(sum(CASE WHEN l_quantity <= 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS violations
FROM lineitem
UNION ALL
SELECT 'lineitem_price_nonnegative',
       CAST(sum(CASE WHEN l_extendedprice < 0 THEN 1 ELSE 0 END) AS BIGINT)
FROM lineitem
UNION ALL
SELECT 'lineitem_discount_in_unit_range',
       CAST(sum(CASE WHEN l_discount BETWEEN 0.0 AND 1.0
                     THEN 0 ELSE 1 END) AS BIGINT)
FROM lineitem
UNION ALL
SELECT 'lineitem_shipdate_not_null',
       CAST(sum(CASE WHEN l_shipdate IS NULL THEN 1 ELSE 0 END) AS BIGINT)
FROM lineitem
UNION ALL
SELECT 'orders_orderkey_unique',
       CAST(sum(CASE WHEN n > 1 THEN n - 1 ELSE 0 END) AS BIGINT)
FROM (SELECT o_orderkey, count(*) AS n FROM orders GROUP BY o_orderkey)
UNION ALL
SELECT 'lineitem_orderkey_fk',
       CAST(count(*) AS BIGINT)
FROM lineitem WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders)
"""


QUERIES["data_quality_report"] = data_quality_report
ORACLES["data_quality_report"] = _QUALITY_REPORT_SQL


# ---------------------------------------------------------------------------
# Distribution-drift gate (round-4 tail): PSI between two corpus slices
# ---------------------------------------------------------------------------

_PSI_CUTOFF = "1996-01-01"  # reference = orders before, current = after
_PSI_BINS = 10
_PSI_EPS = 1e-6             # empty-bin clamp (standard PSI practice)


def feature_drift_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index of o_totalprice between the pre- and
    post-cutoff order slices — the drift gate a production pipeline
    runs before promoting new training data against a frozen reference
    snapshot. Output is the per-bin audit table (counts, fractions,
    PSI contribution): the total PSI is the sum of psi_term, but the
    per-bin rows are what an operator actually debugs.

    Shape: one agg for the global [min, max] (broadcast 1 row), then
    ONE scan bins both slices with conditional sums — the shuffle
    carries ``_PSI_BINS`` rows. Equal-width bins over the global range
    (not reference quantiles) keep every edge deterministic, so the
    DuckDB oracle replays bin assignment bit-for-bit."""
    orders = load_table(spark, sf_dir, "orders")
    cut = F.lit(_PSI_CUTOFF).cast("timestamp")
    sliced = orders.select(
        F.col("o_totalprice").cast("double").alias("p"),
        (F.col("o_orderdate") < cut).alias("is_ref"))
    mm = sliced.agg(F.min("p").alias("mn"), F.max("p").alias("mx"))
    # degenerate-slice guard (mn == mx): unit span keeps the binning
    # finite; mirrored in the oracle SQL so both engines agree
    span = F.when(F.col("mx") == F.col("mn"), F.lit(1.0)) \
        .otherwise((F.col("mx") - F.col("mn")) / F.lit(float(_PSI_BINS)))
    binned = (sliced.crossJoin(F.broadcast(mm))
              .select(F.least(
                  F.floor((F.col("p") - F.col("mn")) / span),
                  F.lit(_PSI_BINS - 1)).cast("int").alias("bin"),
                  "is_ref"))
    counts = (binned.groupBy("bin").agg(
        F.sum(F.when(F.col("is_ref"), 1).otherwise(0)).alias("ref_n"),
        F.sum(F.when(F.col("is_ref"), 0).otherwise(1)).alias("cur_n")))
    tot = counts.agg(F.sum("ref_n").alias("ref_tot"),
                     F.sum("cur_n").alias("cur_tot"))
    rf = F.greatest(F.col("ref_n") / F.col("ref_tot"), F.lit(_PSI_EPS))
    cf = F.greatest(F.col("cur_n") / F.col("cur_tot"), F.lit(_PSI_EPS))
    return (counts.crossJoin(F.broadcast(tot))
            .select("bin", "ref_n", "cur_n",
                    F.round(rf, 6).alias("ref_frac"),
                    F.round(cf, 6).alias("cur_frac"),
                    F.round((cf - rf) * F.log(cf / rf), 6)
                    .alias("psi_term")))


_PSI_SQL = f"""
WITH sliced AS (
  SELECT CAST(o_totalprice AS DOUBLE) AS p,
         o_orderdate < TIMESTAMP '{_PSI_CUTOFF}' AS is_ref
  FROM orders),
mm AS (SELECT min(p) AS mn, max(p) AS mx FROM sliced),
binned AS (
  SELECT CAST(least(floor((p - mn) / (CASE WHEN mx = mn THEN CAST(1.0 AS DOUBLE)
                       ELSE (mx - mn) / {_PSI_BINS}.0 END)),
                    {_PSI_BINS - 1}) AS INT) AS bin, is_ref
  FROM sliced CROSS JOIN mm),
counts AS (
  SELECT bin,
         CAST(sum(CASE WHEN is_ref THEN 1 ELSE 0 END) AS BIGINT) AS ref_n,
         CAST(sum(CASE WHEN is_ref THEN 0 ELSE 1 END) AS BIGINT) AS cur_n
  FROM binned GROUP BY bin),
tot AS (SELECT sum(ref_n) AS ref_tot, sum(cur_n) AS cur_tot FROM counts)
SELECT bin, ref_n, cur_n,
       round(greatest(ref_n / ref_tot, {_PSI_EPS}), 6) AS ref_frac,
       round(greatest(cur_n / cur_tot, {_PSI_EPS}), 6) AS cur_frac,
       round((greatest(cur_n / cur_tot, {_PSI_EPS})
              - greatest(ref_n / ref_tot, {_PSI_EPS}))
             * ln(greatest(cur_n / cur_tot, {_PSI_EPS})
                  / greatest(ref_n / ref_tot, {_PSI_EPS})), 6)
         AS psi_term
FROM counts CROSS JOIN tot
"""


QUERIES_TAIL = {"feature_drift_psi": feature_drift_psi}
ORACLES_TAIL = {"feature_drift_psi": _PSI_SQL}


# ---------------------------------------------------------------------------
# Pseudonymization (round-4 tail): salted-hash identity replacement
# that PRESERVES referential integrity (same input → same pseudonym,
# so joins/groupBys still work) — the GDPR-grade sibling of
# pii_redaction's free-text scrubbing.
# ---------------------------------------------------------------------------

_PSEUDO_SALT = "corpus-v1"  # deployment-secret in production; fixed
                            # literal here so the oracle replays it


def pseudonymized_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Events with user/pc identities replaced by salted SHA-256
    pseudonyms, then re-aggregated per pseudonym to prove joins and
    groupBys survive the mapping. Pure codegen expressions — scales
    like any scan; the aggregation is the same one shuffle the
    un-pseudonymized query pays."""
    from threat_detection_nosql_spark.operators.etl import activity_log
    log = activity_log(spark, sf_dir)
    pseudo = lambda c: F.sha2(  # noqa: E731
        F.concat(F.lit(_PSEUDO_SALT), F.lit("|"), F.col(c).cast("string")),
        256)
    return (log.select(pseudo("user").alias("user_pseudo"),
                       pseudo("pc").alias("pc_pseudo"))
            .groupBy("user_pseudo")
            .agg(F.count("*").alias("n_events"),
                 F.countDistinct("pc_pseudo").alias("n_systems")))


_PSEUDO_SQL = f"""
WITH log AS ({ACTIVITY_LOG_ORACLE_SQL})
SELECT sha256('{_PSEUDO_SALT}' || '|' || CAST(user AS VARCHAR))
         AS user_pseudo,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(count(DISTINCT sha256('{_PSEUDO_SALT}' || '|'
                                  || CAST(pc AS VARCHAR)))
            AS BIGINT) AS n_systems
FROM log
GROUP BY 1
"""


QUERIES_TAIL["pseudonymized_activity"] = pseudonymized_activity
ORACLES_TAIL["pseudonymized_activity"] = _PSEUDO_SQL


# -- cross-source quantile normalization --------------------------------------

_QN_BUCKETS = 10


def source_quantile_normalized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile-normalize document lengths ACROSS sources: each doc's
    n_chars maps to the global average of its within-source decile —
    the classic cross-domain score calibration (quantile normalization,
    Bolstad et al. 2003 — public knowledge). Needed whenever per-source
    quality/length scores are compared or thresholded jointly: a "long"
    doc from a short-doc source should rank like a "long" doc from a
    long-doc source, not like a short one.

    Shape: two ntile windows (within-source and global — both total
    orders via the (n_chars, doc_id) tie-break, so both engines bucket
    identically), one 10-row global-decile aggregate (broadcast), one
    join on the integer decile. The doubles only appear in the final
    rounded average; bucketing itself is pure integer rank logic.

    Scale note: the within-source ntile partitions by source and
    scales horizontally; the GLOBAL decile uses the distributed exact
    ntile (operators/ranking.py — range-partition + per-slice
    row_number + broadcast offsets), so no single-partition sort
    remains and the unchanged plain-ntile oracle hash-proves the
    rebased ranking identical."""
    from pyspark.sql.window import Window as W
    from threat_detection_nosql_spark.operators.ranking import \
        with_global_ntile
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars")
    src_w = W.partitionBy("source").orderBy("n_chars", "doc_id")
    bucketed = (with_global_ntile(docs, ["n_chars", "doc_id"], _QN_BUCKETS,
                                  bucket_col="global_decile")
                .select(
                    "doc_id", "source", "n_chars",
                    F.ntile(_QN_BUCKETS).over(src_w)
                    .alias("source_decile"),
                    "global_decile"))
    ref = (bucketed.groupBy("global_decile")
           .agg(F.round(F.avg("n_chars"), 6).alias("norm_chars"))
           .withColumnRenamed("global_decile", "source_decile"))
    return (bucketed
            .join(F.broadcast(ref), "source_decile")
            .select("doc_id", "source", "n_chars", "source_decile",
                    "norm_chars"))


_QNORM_SQL = f"""
WITH bucketed AS (
  SELECT doc_id, source, n_chars,
         CAST(ntile({_QN_BUCKETS}) OVER (PARTITION BY source
              ORDER BY n_chars, doc_id) AS INT) AS source_decile,
         CAST(ntile({_QN_BUCKETS}) OVER (
              ORDER BY n_chars, doc_id) AS INT) AS global_decile
  FROM documents),
ref AS (SELECT global_decile AS source_decile,
               round(avg(n_chars), 6) AS norm_chars
        FROM bucketed GROUP BY 1)
SELECT doc_id, source, n_chars, source_decile, norm_chars
FROM bucketed JOIN ref USING (source_decile)
"""

QUERIES_TAIL["source_quantile_normalized"] = source_quantile_normalized
ORACLES_TAIL["source_quantile_normalized"] = _QNORM_SQL


# -- KS statistic between split length distributions ---------------------------

def ks_split_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov distance between the document-
    length distributions of the two halves of a 50/50 hash split —
    the standard distribution-equality audit run before trusting a
    splitter: a pure hash split is exchangeable, so its KS distance
    MUST sit under the classical critical value
    c(0.05)*sqrt((na+nb)/(na*nb)) (pinned in tests); pointing the
    same audit at a time- or source-correlated split is the
    real-world use, where it lights up. Emits the supremum location
    and the critical value beside the statistic. (The 98/1/1
    dataset_split_assignment holdouts are too small for a powered KS
    at the test SFs; the 50/50 probe audits the same hash family.)

    Exactness: the KS supremum is computed over EXACT INTEGERS —
    sup |cumA/na - cumB/nb| = max |cumA*nb - cumB*na| / (na*nb),
    maximized as a BIGINT before the single final division, so no
    float comparison ever picks the argmax. Ties in the integer gap
    break to the smallest length (min over argmax rows). The
    critical value is one sqrt of an exact ratio.

    Scale shape: one scan -> per-(length, split) count agg (grid x 2)
    -> one ordered window over the length grid -> 1-row argmax agg.
    The single-partition window is over distinct lengths, not rows."""
    from pyspark.sql.window import Window
    from threat_detection_nosql_spark.operators.sampling import hash_bucket
    docs = load_table(spark, sf_dir, "documents")
    split = hash_bucket(F.col("doc_id"), salt="split-ks")
    base = docs.select(F.length("text").alias("len"),
                       (split < 5000).alias("is_a"))
    grid = (base.groupBy("len")
            .agg(F.sum(F.col("is_a").cast("long")).alias("a"),
                 F.sum((~F.col("is_a")).cast("long")).alias("b")))
    w = Window.orderBy("len").rowsBetween(Window.unboundedPreceding, 0)
    cum = grid.select(
        "len",
        F.sum("a").over(w).alias("ca"), F.sum("b").over(w).alias("cb"),
        F.sum("a").over(Window.partitionBy()).alias("na"),
        F.sum("b").over(Window.partitionBy()).alias("nb"))
    gap = F.abs(F.col("ca") * F.col("nb") - F.col("cb") * F.col("na"))
    scored = cum.select("len", "na", "nb", gap.alias("gap"))
    top = scored.agg(F.max("gap").alias("gmax"))
    arg = (scored.join(F.broadcast(top), F.col("gap") == F.col("gmax"))
           .agg(F.min("len").alias("ks_at_len"),
                F.first("gmax").alias("gmax"),
                F.first("na").alias("na"), F.first("nb").alias("nb")))
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    return arg.select(
        F.col("na").alias("n_half_a"), F.col("nb").alias("n_half_b"),
        "ks_at_len",
        F.round(d("gmax") / (d("na") * d("nb")), 6).alias("ks_stat"),
        F.round(F.lit(1.358) * F.sqrt((d("na") + d("nb"))
                                      / (d("na") * d("nb"))), 6)
        .alias("crit_05"))


_KS_SQL = """
WITH base AS (
  SELECT length(text) AS len,
         CAST(('0x' || substr(md5('split-ks:'
              || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT)
           % 10000 < 5000 AS is_a
  FROM documents),
grid AS (SELECT len,
                CAST(sum(CAST(is_a AS INT)) AS BIGINT) AS a,
                CAST(sum(CAST(NOT is_a AS INT)) AS BIGINT) AS b
         FROM base GROUP BY len),
cum AS (SELECT len,
               CAST(sum(a) OVER (ORDER BY len ROWS UNBOUNDED PRECEDING)
                    AS BIGINT) AS ca,
               CAST(sum(b) OVER (ORDER BY len ROWS UNBOUNDED PRECEDING)
                    AS BIGINT) AS cb,
               CAST(sum(a) OVER () AS BIGINT) AS na,
               CAST(sum(b) OVER () AS BIGINT) AS nb
        FROM grid),
scored AS (SELECT len, na, nb, abs(ca * nb - cb * na) AS gap FROM cum),
arg AS (SELECT min(len) AS ks_at_len, any_value(na) AS na,
               any_value(nb) AS nb, any_value(gap) AS gmax
        FROM scored WHERE gap = (SELECT max(gap) FROM scored))
SELECT na AS n_half_a, nb AS n_half_b, ks_at_len,
       round(CAST(gmax AS DOUBLE)
             / (CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)), 6) AS ks_stat,
       round(1.358 * sqrt((CAST(na AS DOUBLE) + CAST(nb AS DOUBLE))
                          / (CAST(na AS DOUBLE) * CAST(nb AS DOUBLE))), 6)
         AS crit_05
FROM arg
"""

QUERIES_TAIL = {**globals().get("QUERIES_TAIL", {}),
                "ks_split_drift": ks_split_drift}
ORACLES_TAIL = {**globals().get("ORACLES_TAIL", {}),
                "ks_split_drift": _KS_SQL}
