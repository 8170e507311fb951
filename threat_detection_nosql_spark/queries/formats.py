"""Source/sink format matrix under the oracle gate (SURVEY.md §2.1).

The reference's only interchange surfaces are a pandas CSV load
(`data_preprocessing.py:12`) and driver-side CSV dumps
(`Comparaison_ML.py:1166-1168`). A Spark engine at 100 TB needs the
full format matrix — columnar (parquet, ORC), line-delimited JSON for
interchange, RFC-4180 CSV with real quoting, and hive-partitioned
layouts with partition-pruned scans. `sources/writers.write_results`
has carried json/orc/csv since round 1, but only pytest exercised
them; these queries put each format's WRITE → SCAN round-trip under
the driver's DuckDB hash gate: the oracle states the semantics
directly off the source table, so any fidelity loss in the format
round-trip (timestamp truncation, quote mangling, type widening)
breaks the hash.

Scale notes: every query here writes once, scans once, and aggregates
to a handful of rows — both sides partition-parallel. The partitioned
sink shuffles on the partition column before writing so the layout is
one-file-per-partition-value instead of |tasks|×|values| fragments
(the same discipline as write_ivf_index), and the read-back filter is
a PartitionFilter (directory pruning, pinned by tests/test_formats.py)
— the property that makes a 100 TB fact table scannable for one key.
"""

from __future__ import annotations

import hashlib
import os

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from threat_detection_nosql_spark.sources.readers import load_table

QUERIES: dict = {}
ORACLES: dict = {}
QUERIES_TAIL: dict = {}
ORACLES_TAIL: dict = {}

# Micro-precision on both write and read: Spark's DEFAULT json/csv
# timestamp pattern keeps milliseconds only, which would silently
# truncate micros — exactly the fidelity bug the oracle hash exists
# to catch, so the round-trip pins the full precision explicitly.
_TS_MICROS = "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"

_US_PER_DAY = 86_400_000_000  # sub-day micros fit a BIGINT sum
_DIGEST_MOD = 1_000_000_007  # prime fold keeps md5-digest sums in BIGINT


def _sum_e4(c: str) -> Column:
    """Exact value digest: sum of round(x·10⁴) as BIGINT. A rounded
    DOUBLE sum is only reproducible while |sum|·2⁻⁵² · √n stays under
    the rounding grain — the 10× soak broke that for order totals
    (~1e11) — so every fidelity digest here sums integers instead:
    associative, engine- and partitioning-independent at ANY scale."""
    return F.sum(F.round(F.col(c) * 10000, 0).cast("long"))


def _sum_e4_sql(expr: str) -> str:
    return f"CAST(sum(CAST(round(({expr}) * 10000) AS BIGINT)) AS BIGINT)"


def _fmt_dir(sf_dir: str, name: str) -> str:
    """Per-(process, dataset, query) scratch layout under /tmp —
    overwrite mode makes every run idempotent; keying by sf_dir keeps
    different scale factors apart, and folding the PID in keeps two
    CONCURRENT runs at the same SF (bench + driver, parallel test
    sessions) from overwriting each other's dataset mid-scan (the
    round-9 ADVICE race)."""
    tag = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:10]
    return f"/tmp/tdns_formats/{tag}-{os.getpid()}/{name}"


# ---------------------------------------------------------------------------
# FX1: line-delimited JSON round-trip (the interchange format)
# ---------------------------------------------------------------------------

_EVENTS_JSON_SCHEMA = T.StructType([
    T.StructField("event_id", T.LongType()),
    T.StructField("ts", T.TimestampType()),
    T.StructField("user_id", T.LongType()),
    T.StructField("event_type", T.StringType()),
    T.StructField("value", T.DoubleType()),
    T.StructField("props", T.StringType()),
])


def events_jsonl_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events → JSONL sink → explicit-schema FAILFAST scan → per-type
    fidelity digest. min/max epoch-micros pin the date range,
    the sub-day micros sum pins every row's sub-second part, and the
    value sum pins the doubles — if the sink or the scan loses
    anything, the digest diverges from the oracle's direct read."""
    path = _fmt_dir(sf_dir, "events_jsonl")
    ev = load_table(spark, sf_dir, "events")
    (ev.write.mode("overwrite")
       .option("timestampFormat", _TS_MICROS).json(path))
    back = (spark.read.schema(_EVENTS_JSON_SCHEMA)
            .option("timestampFormat", _TS_MICROS)
            .option("mode", "FAILFAST").json(path))
    us = F.unix_micros("ts")
    return (back.groupBy("event_type")
            .agg(F.count("*").alias("n"),
                 F.countDistinct("user_id").alias("n_users"),
                 F.min(us).alias("ts_us_min"),
                 F.max(us).alias("ts_us_max"),
                 F.sum(us % F.lit(_US_PER_DAY)).alias("ts_us_day_sum"),
                 _sum_e4("value").alias("value_sum_e4"),
                 F.sum(F.length("props")).alias("props_len_sum")))


_EVENTS_JSONL_SQL = f"""
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
       min(epoch_us(ts)) AS ts_us_min,
       max(epoch_us(ts)) AS ts_us_max,
       CAST(sum(epoch_us(ts) % {_US_PER_DAY}) AS BIGINT) AS ts_us_day_sum,
       {_sum_e4_sql("value")} AS value_sum_e4,
       CAST(sum(length(props)) AS BIGINT) AS props_len_sum
FROM events
GROUP BY event_type
"""


# ---------------------------------------------------------------------------
# FX2: ORC round-trip (the second columnar format)
# ---------------------------------------------------------------------------

def orders_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orders → ORC sink → scan → per-status digest. ORC carries its
    own types (no format options to get wrong); the digest pins that
    the timestamp/double/decimal-ish columns survive the column
    encoding untouched."""
    path = _fmt_dir(sf_dir, "orders_orc")
    orders = load_table(spark, sf_dir, "orders")
    orders.write.mode("overwrite").orc(path)
    back = spark.read.orc(path)
    # o_orderdate loads as TIMESTAMP_NTZ on a vanilla session — pin its
    # fidelity as a wall-clock string, which is timezone-free on both
    # engines (epoch micros would shift with the session timezone)
    wall = F.date_format("o_orderdate", "yyyy-MM-dd HH:mm:ss")
    return (back.groupBy("o_orderstatus")
            .agg(F.count("*").alias("n"),
                 F.countDistinct("o_custkey").alias("n_cust"),
                 _sum_e4("o_totalprice").alias("price_sum_e4"),
                 F.min(wall).alias("date_min"),
                 F.max(wall).alias("date_max"),
                 F.sum(F.length("o_orderpriority"))
                  .alias("prio_len_sum")))


_ORDERS_ORC_SQL = f"""
SELECT o_orderstatus,
       CAST(count(*) AS BIGINT) AS n,
       CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_cust,
       {_sum_e4_sql("o_totalprice")} AS price_sum_e4,
       min(strftime(o_orderdate, '%Y-%m-%d %H:%M:%S')) AS date_min,
       max(strftime(o_orderdate, '%Y-%m-%d %H:%M:%S')) AS date_max,
       CAST(sum(length(o_orderpriority)) AS BIGINT) AS prio_len_sum
FROM orders
GROUP BY o_orderstatus
"""


# ---------------------------------------------------------------------------
# FX3: RFC-4180 CSV gauntlet (quoting under adversarial content)
# ---------------------------------------------------------------------------

def documents_csv_gauntlet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV round-trip under content the testdata itself never
    stresses: a payload with embedded delimiters, double quotes, and a
    newline built deterministically around each document's text, so
    the sink must quote and the scan must parse multi-line records
    (RFC 4180 doubled-quote escaping — Spark's default escape is the
    non-standard backslash, overridden here on BOTH sides). The md5
    digest sum certifies byte-exact payload survival per language."""
    path = _fmt_dir(sf_dir, "documents_csv")
    docs = load_table(spark, sf_dir, "documents")
    payload = F.concat(F.col("lang"), F.lit(',"'), F.col("text"),
                       F.lit('"\n'), F.col("source"))
    staged = docs.select("doc_id", "lang", payload.alias("payload"))
    (staged.write.mode("overwrite")
     .option("header", True).option("quote", '"').option("escape", '"')
     .csv(path))
    back = (spark.read
            .schema("doc_id BIGINT, lang STRING, payload STRING")
            .option("header", True).option("multiLine", True)
            .option("quote", '"').option("escape", '"')
            .option("mode", "FAILFAST").csv(path))
    # 48-bit md5 prefix folded mod a prime so the SUM stays inside
    # BIGINT even at the 100x soak corpus (5e8 rows x <1e9 each)
    digest = (F.conv(F.substring(F.md5("payload"), 1, 12), 16, 10)
              .cast("long") % F.lit(_DIGEST_MOD))
    return (back.groupBy("lang")
            .agg(F.count("*").alias("n"),
                 F.sum(F.length("payload")).alias("payload_len_sum"),
                 F.sum(digest).alias("payload_md5_sum")))


_DOCS_CSV_SQL = f"""
WITH staged AS (
  SELECT lang,
         lang || ',"' || text || '"' || chr(10) || source AS payload
  FROM documents
)
SELECT lang,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(length(payload)) AS BIGINT) AS payload_len_sum,
       CAST(sum(CAST(('0x' || substr(md5(payload), 1, 12)) AS BIGINT)
                % {_DIGEST_MOD}) AS BIGINT) AS payload_md5_sum
FROM staged
GROUP BY lang
"""


# ---------------------------------------------------------------------------
# FX4: hive-partitioned sink + partition-pruned scan
# ---------------------------------------------------------------------------

_PRUNE_TYPE = "purchase"


def events_partitioned_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events → parquet partitioned by event_type → scan filtered to
    one type → daily rollup. The filter resolves against the directory
    layout (PartitionFilters in the plan, pinned by
    tests/test_formats.py), so the scan reads exactly one partition's
    files — at 100 TB the difference between touching 1/|types| of the
    table and all of it. The pre-write repartition on the partition
    column yields one file per directory instead of one per task."""
    path = _fmt_dir(sf_dir, "events_by_type")
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type", "value")
    (ev.repartition("event_type")
       .write.mode("overwrite").partitionBy("event_type").parquet(path))
    back = spark.read.parquet(path)
    return (back.filter(F.col("event_type") == _PRUNE_TYPE)
            .groupBy(F.to_date("ts").alias("day"))
            .agg(F.count("*").alias("n"),
                 F.countDistinct("user_id").alias("n_users"),
                 _sum_e4("value").alias("value_sum_e4")))


_EVENTS_PRUNE_SQL = f"""
SELECT CAST(ts AS DATE) AS day,
       CAST(count(*) AS BIGINT) AS n,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
       {_sum_e4_sql("value")} AS value_sum_e4
FROM events
WHERE event_type = '{_PRUNE_TYPE}'
GROUP BY CAST(ts AS DATE)
"""


# ---------------------------------------------------------------------------
# FX5: schema evolution — mergeSchema over two dataset generations
# ---------------------------------------------------------------------------

def schema_evolution_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two parquet generations of the same table — v1 written before a
    `value` column existed, v2 after — scanned together with
    mergeSchema. The digest pins Spark's evolution semantics: v1 rows
    surface a NULL `value`, aggregates skip them, nothing is dropped
    or misaligned. The standing situation of any long-lived 100 TB
    table whose producer added a column mid-history."""
    root = _fmt_dir(sf_dir, "events_evolved")
    base = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value")
    v1 = base.filter(F.col("event_id") % 2 == 0).drop("value")
    v2 = base.filter(F.col("event_id") % 2 == 1)
    v1.write.mode("overwrite").parquet(f"{root}/v1")
    v2.write.mode("overwrite").parquet(f"{root}/v2")
    back = (spark.read.option("mergeSchema", True)
            .parquet(f"{root}/v1", f"{root}/v2"))
    return (back.groupBy("event_type")
            .agg(F.count("*").alias("n"),
                 F.count(F.when(F.col("value").isNull(), 1))
                  .alias("n_missing_value"),
                 _sum_e4("value").alias("value_sum_e4"),
                 F.countDistinct("user_id").alias("n_users")))


_EVOLUTION_SQL = f"""
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CASE WHEN event_id % 2 = 0 OR value IS NULL
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_missing_value,
       {_sum_e4_sql("CASE WHEN event_id % 2 = 1 THEN value END")}
         AS value_sum_e4,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
FROM events
GROUP BY event_type
"""


# ---------------------------------------------------------------------------
# FX6: compression codec fidelity — same digest under every codec
# ---------------------------------------------------------------------------

_CODECS = ("snappy", "gzip", "zstd")


def compression_codec_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One digest row per parquet compression codec, written and
    scanned under that codec — all three rows must carry the
    identical digest (compression is transparent to values, or the
    hash breaks). Codec choice is a first-order 100 TB knob
    (zstd ~30% smaller than snappy at similar scan cost); this query
    certifies the knob is safe to turn on this engine build."""
    base = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "value")
    parts = []
    for codec in _CODECS:
        path = _fmt_dir(sf_dir, f"events_{codec}")
        (base.write.mode("overwrite")
         .option("compression", codec).parquet(path))
        back = spark.read.parquet(path)
        parts.append(back.agg(
            F.count("*").alias("n"),
            F.sum("event_id").alias("id_sum"),
            _sum_e4("value").alias("value_sum_e4"))
            .select(F.lit(codec).alias("codec"), "n", "id_sum",
                    "value_sum_e4"))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


_CODEC_SQL = f"""
WITH d AS (SELECT CAST(count(*) AS BIGINT) AS n,
                  CAST(sum(event_id) AS BIGINT) AS id_sum,
                  {_sum_e4_sql("value")} AS value_sum_e4
           FROM events)
SELECT c.codec, d.n, d.id_sum, d.value_sum_e4
FROM (VALUES {", ".join(f"('{c}')" for c in _CODECS)}) c(codec)
CROSS JOIN d
"""


# ---------------------------------------------------------------------------
# FX7: streaming JSONL ingest — the JSON file source, incrementally
# ---------------------------------------------------------------------------

def stream_jsonl_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events staged as a JSONL directory, then consumed as a JSON
    FILE STREAM one file per micro-batch — the landing-zone ingest
    shape (upstream drops line-delimited JSON, the engine tails the
    directory). The per-type digest must match the batch oracle no
    matter how the files were batched: count/sum/min/max are all
    merge-able, so state is one row per event_type forever. Every
    other stream in the repo sources parquet; this pins the JSON
    source's schema projection + timestamp parse under the same gate."""
    from threat_detection_nosql_spark.streaming.stream_queries import (
        run_stream_to_table,
    )
    path = _fmt_dir(sf_dir, "events_jsonl_stream")
    ev = load_table(spark, sf_dir, "events")
    (ev.write.mode("overwrite")
       .option("timestampFormat", _TS_MICROS).json(path))
    raw = (spark.readStream.schema(_EVENTS_JSON_SCHEMA)
           .option("timestampFormat", _TS_MICROS)
           .option("pathGlobFilter", "*.json")
           .option("maxFilesPerTrigger", 1)
           .json(path))
    us = F.unix_micros("ts")
    agg = (raw.groupBy("event_type")
           .agg(F.count("*").alias("n"),
                F.min(us).alias("ts_us_min"),
                F.max(us).alias("ts_us_max"),
                _sum_e4("value").alias("value_sum_e4")))
    return run_stream_to_table(agg, mode="complete")


_STREAM_JSONL_SQL = f"""
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n,
       min(epoch_us(ts)) AS ts_us_min,
       max(epoch_us(ts)) AS ts_us_max,
       {_sum_e4_sql("value")} AS value_sum_e4
FROM events
GROUP BY event_type
"""


QUERIES_TAIL.update({
    "events_jsonl_roundtrip": events_jsonl_roundtrip,
    "orders_orc_roundtrip": orders_orc_roundtrip,
    "documents_csv_gauntlet": documents_csv_gauntlet,
    "events_partitioned_prune": events_partitioned_prune,
    "schema_evolution_union": schema_evolution_union,
    "compression_codec_report": compression_codec_report,
    "stream_jsonl_ingest": stream_jsonl_ingest,
})

ORACLES_TAIL.update({
    "events_jsonl_roundtrip": _EVENTS_JSONL_SQL,
    "orders_orc_roundtrip": _ORDERS_ORC_SQL,
    "documents_csv_gauntlet": _DOCS_CSV_SQL,
    "events_partitioned_prune": _EVENTS_PRUNE_SQL,
    "schema_evolution_union": _EVOLUTION_SQL,
    "compression_codec_report": _CODEC_SQL,
    "stream_jsonl_ingest": _STREAM_JSONL_SQL,
})


# ---------------------------------------------------------------------------
# FX8: small-file compaction under the gate (the maintenance verb)
# ---------------------------------------------------------------------------

def compacted_scan_digest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deliberately fragment a dataset (64 writer tasks -> 64 files),
    run sources/writers.compact_dataset over it, and digest the
    COMPACTED layout — the oracle reads the source table directly, so
    the hash certifies the rewrite is value-lossless. File-count
    reduction itself is pinned by tests/test_formats.py (the target
    byte size makes the post-compaction count environment-dependent,
    so it stays out of the hashed result)."""
    from threat_detection_nosql_spark.sources.writers import (
        compact_dataset,
    )
    path = _fmt_dir(sf_dir, "events_fragmented")
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "value")
    ev.repartition(64).write.mode("overwrite").parquet(path)
    compact_dataset(spark, path)
    back = spark.read.parquet(path)
    return (back.groupBy("event_type")
            .agg(F.count("*").alias("n"),
                 F.sum("event_id").alias("id_sum"),
                 _sum_e4("value").alias("value_sum_e4")))


_COMPACT_SQL = f"""
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(event_id) AS BIGINT) AS id_sum,
       {_sum_e4_sql("value")} AS value_sum_e4
FROM events
GROUP BY event_type
"""


# ---------------------------------------------------------------------------
# FX9: schema drift detection (the pre-ingest audit verb)
# ---------------------------------------------------------------------------

def schema_drift_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Plant two dataset generations with a removed column, an added
    column, AND a type change (value DOUBLE -> FLOAT), then run
    sources/writers.schema_drift over them. Metadata-only (two parquet
    footer reads, no data scan) -- the audit that catches an upstream
    producer silently widening or dropping a field before a backfill
    bakes it in. The planted drift is fixed, so the oracle is its
    literal three-row answer."""
    from threat_detection_nosql_spark.sources.writers import schema_drift
    root = _fmt_dir(sf_dir, "events_drift")
    ev = load_table(spark, sf_dir, "events")
    v1 = ev.select("event_id", "event_type", "value")
    v2 = ev.select("event_id", F.col("value").cast("float").alias("value"),
                   "props")
    v1.write.mode("overwrite").parquet(f"{root}/v1")
    v2.write.mode("overwrite").parquet(f"{root}/v2")
    drift = schema_drift(spark, f"{root}/v1", f"{root}/v2")
    return spark.createDataFrame(
        [(d["column"], d["change"], d["old_type"], d["new_type"])
         for d in drift],
        "col_name string, change string, old_type string, "
        "new_type string")


_DRIFT_SQL = """
SELECT * FROM (VALUES
  ('event_type', 'removed', 'string', NULL),
  ('props', 'added', NULL, 'string'),
  ('value', 'type_changed', 'double', 'float'))
  t(col_name, change, old_type, new_type)
"""


QUERIES_TAIL.update({
    "compacted_scan_digest": compacted_scan_digest,
    "schema_drift_report": schema_drift_report,
})
ORACLES_TAIL.update({
    "compacted_scan_digest": _COMPACT_SQL,
    "schema_drift_report": _DRIFT_SQL,
})


# ---------------------------------------------------------------------------
# FX10: text-format round-trip (the line-per-record source)
# ---------------------------------------------------------------------------

def documents_text_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → one tab-delimited line per doc via the `text` sink
    → line scan → parse → per-lang digest. The text format is the
    rawest ingest shape (access logs, WET extracts, jsonl-before-
    parsing all arrive this way); the round-trip pins that lines carry
    through byte-exact and the downstream split/cast re-derives the
    typed columns. The payload embeds the md5 of the document text, so
    the digest certifies content identity without writing multi-line
    text into a line-oriented format."""
    path = _fmt_dir(sf_dir, "documents_text")
    docs = load_table(spark, sf_dir, "documents")
    line = F.concat_ws("\t", F.col("doc_id").cast("string"),
                       F.col("lang"), F.md5("text"),
                       F.col("n_chars").cast("string"))
    docs.select(line.alias("value")).write.mode("overwrite").text(path)
    back = spark.read.text(path)
    parts = F.split(F.col("value"), "\t")
    parsed = back.select(
        parts.getItem(0).cast("long").alias("doc_id"),
        parts.getItem(1).alias("lang"),
        parts.getItem(2).alias("text_md5"),
        parts.getItem(3).cast("long").alias("n_chars"))
    digest = (F.conv(F.substring("text_md5", 1, 12), 16, 10)
              .cast("long") % F.lit(_DIGEST_MOD))
    return (parsed.groupBy("lang")
            .agg(F.count("*").alias("n"),
                 F.sum("doc_id").alias("doc_id_sum"),
                 F.sum("n_chars").alias("n_chars_sum"),
                 F.sum(digest).alias("text_md5_sum")))


_DOCS_TEXT_SQL = f"""
SELECT lang,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(doc_id) AS BIGINT) AS doc_id_sum,
       CAST(sum(n_chars) AS BIGINT) AS n_chars_sum,
       CAST(sum(CAST(('0x' || substr(md5(text), 1, 12)) AS BIGINT)
                % {_DIGEST_MOD}) AS BIGINT) AS text_md5_sum
FROM documents
GROUP BY lang
"""


QUERIES_TAIL["documents_text_roundtrip"] = documents_text_roundtrip
ORACLES_TAIL["documents_text_roundtrip"] = _DOCS_TEXT_SQL
