"""Format-matrix round-trips (queries/formats.py) — oracle parity at
sf0.001 plus the physical properties the queries claim: byte-exact CSV
payload survival and partition-pruned read-back."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMALL, TABLES, compare_query_to_oracle
from threat_detection_nosql_spark.queries import formats
from threat_detection_nosql_spark.sources.readers import load_table


@pytest.fixture(scope="module")
def ddb_small():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_SMALL}/{t}.parquet'")
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(formats.QUERIES_TAIL))
def test_formats_oracle_parity(spark, ddb_small, name):
    compare_query_to_oracle(spark, ddb_small,
                            formats.QUERIES_TAIL[name],
                            formats.ORACLES_TAIL[name], sf_dir=SF_SMALL)


def test_jsonl_roundtrip_row_exact(spark):
    """Beyond the digest: every events row survives the JSONL sink →
    scan byte-for-byte (sf0.001, 1k rows — cheap to compare whole)."""
    formats.events_jsonl_roundtrip(spark, SF_SMALL).collect()  # write
    path = formats._fmt_dir(SF_SMALL, "events_jsonl")
    back = (spark.read.schema(formats._EVENTS_JSON_SCHEMA)
            .option("timestampFormat", formats._TS_MICROS)
            .option("mode", "FAILFAST").json(path))
    src = load_table(spark, SF_SMALL, "events")
    assert back.count() == src.count()
    # anti-joins empty both ways == exact multiset equality (event_id
    # is unique, so the join key dedup concern doesn't apply)
    cols = back.columns
    diff = (src.select(cols).exceptAll(back.select(cols)).count()
            + back.select(cols).exceptAll(src.select(cols)).count())
    assert diff == 0


def test_csv_gauntlet_payload_exact(spark):
    """The adversarial payload (embedded comma, quotes, newline) comes
    back byte-identical for every document."""
    formats.documents_csv_gauntlet(spark, SF_SMALL).collect()  # write
    path = formats._fmt_dir(SF_SMALL, "documents_csv")
    back = (spark.read
            .schema("doc_id BIGINT, lang STRING, payload STRING")
            .option("header", True).option("multiLine", True)
            .option("quote", '"').option("escape", '"')
            .option("mode", "FAILFAST").csv(path))
    docs = load_table(spark, SF_SMALL, "documents")
    expected = docs.select(
        "doc_id",
        F.concat(F.col("lang"), F.lit(',"'), F.col("text"),
                 F.lit('"\n'), F.col("source")).alias("payload"))
    got = {r["doc_id"]: r["payload"] for r in back.collect()}
    for r in expected.collect():
        assert got[r["doc_id"]] == r["payload"]
        assert "\n" in got[r["doc_id"]]  # the newline really round-tripped


def test_partitioned_prune_plan(spark):
    """The read-back filter must resolve as a PartitionFilter
    (directory pruning), not a post-scan predicate."""
    df = formats.events_partitioned_prune(spark, SF_SMALL)
    plan = df._jdf.queryExecution().executedPlan().toString()
    pf = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert pf and "event_type" in pf[0]
    assert formats._PRUNE_TYPE in pf[0]


def test_schema_evolution_v1_rows_surface_null_value(spark):
    """mergeSchema back-fills the missing column with NULLs for the
    old generation, and the merged schema carries the new column."""
    formats.schema_evolution_union(spark, SF_SMALL).collect()  # write
    root = formats._fmt_dir(SF_SMALL, "events_evolved")
    back = (spark.read.option("mergeSchema", True)
            .parquet(f"{root}/v1", f"{root}/v2"))
    assert "value" in back.columns
    v1_nonnull = back.filter(
        (F.col("event_id") % 2 == 0) & F.col("value").isNotNull()).count()
    assert v1_nonnull == 0
    assert back.filter(F.col("value").isNotNull()).count() > 0


def test_codec_report_rows_identical(spark):
    rows = formats.compression_codec_report(spark, SF_SMALL).collect()
    assert sorted(r["codec"] for r in rows) == ["gzip", "snappy", "zstd"]
    digests = {(r["n"], r["id_sum"], r["value_sum_e4"]) for r in rows}
    assert len(digests) == 1


def test_stream_jsonl_ingest_multi_batch(spark):
    """The landing-zone stream really ingests file-by-file (one
    micro-batch per part file) and still lands the batch answer."""
    from threat_detection_nosql_spark.streaming.stream_queries import (
        LAST_STREAM_PROGRESS,
    )
    got = formats.stream_jsonl_ingest(spark, SF_SMALL)
    src = load_table(spark, SF_SMALL, "events")
    assert got.agg(F.sum("n")).first()[0] == src.count()
    assert LAST_STREAM_PROGRESS["input_rows"] == src.count()


def test_partitioned_layout_one_file_per_type(spark):
    """The pre-write repartition keeps the layout at one data file per
    partition directory (not |tasks| fragments)."""
    import glob
    import os
    formats.events_partitioned_prune(spark, SF_SMALL).collect()
    root = formats._fmt_dir(SF_SMALL, "events_by_type")
    dirs = [d for d in glob.glob(os.path.join(root, "event_type=*"))]
    assert dirs
    for d in dirs:
        files = [f for f in os.listdir(d) if f.endswith(".parquet")]
        assert len(files) == 1, (d, files)


def test_compaction_reduces_file_count(spark):
    """The fragmented layout (64 writer tasks) collapses to the
    byte-target file count; the digest equality itself is pinned by
    the oracle gate, the file count here (environment-dependent byte
    sizes keep it out of the hashed result)."""
    import glob
    import os
    formats.compacted_scan_digest(spark, SF_SMALL).collect()
    root = formats._fmt_dir(SF_SMALL, "events_fragmented")
    files = glob.glob(os.path.join(root, "*.parquet"))
    assert 1 <= len(files) < 64


def test_schema_drift_report_rows(spark):
    rows = {(r["col_name"], r["change"])
            for r in formats.schema_drift_report(spark, SF_SMALL).collect()}
    assert rows == {("event_type", "removed"), ("props", "added"),
                    ("value", "type_changed")}
