"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry at sf0.01, canonicalizes the result the
way the driver does (toPandas → columns sorted by name → sort_values
over all columns → rounded floats), and hash-compares against the
DuckDB ``oracle_sql()`` entry when present. Rows-only queries are still
canonicalized so list-typed/unhashable columns are caught locally
before the driver sees them.

Deliberately uses a VANILLA SparkSession (not session.get_spark) — the
driver brings its own session, so config-dependent code must work
without ours (.claude/skills/verify/SKILL.md).

Usage: python scripts/check_all.py [--sf DIR] [--first N] [--mem 16g] [name_filter ...]

``--first N`` restricts the run to the first N registry entries — the
driver hashes exactly the first-50 prefix, so ``--first 50`` replicates
the round's correctness window.
"""
from __future__ import annotations

import hashlib
import json
import sys
import time
import traceback

import duckdb
import pandas as pd

SF_DIR = "/root/testdata/sf0.01"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def _canon(pdf: pd.DataFrame, float_round: int = 6) -> pd.DataFrame:
    pdf = pdf[sorted(pdf.columns)]
    for c in pdf.columns:
        if pdf[c].dtype.kind == "f":
            pdf[c] = pdf[c].round(float_round)
    pdf = pdf.sort_values(list(pdf.columns), kind="mergesort")
    return pdf.reset_index(drop=True)


def _hash(pdf: pd.DataFrame) -> str:
    return hashlib.md5(
        pdf.to_csv(index=False, float_format="%.6f").encode()).hexdigest()


def main() -> int:
    args = sys.argv[1:]
    sf_dir = SF_DIR
    first_n = None
    mem = None  # default: the driver's own 1g — sized for sf0.01
    while args and args[0] in ("--sf", "--first", "--mem"):
        flag, val, args = args[0], args[1], args[2:]
        if flag == "--sf":
            sf_dir = val
        elif flag == "--first":
            first_n = int(val)
        else:  # --mem: scale soaks (10x+ dirs) need a bigger JVM heap
            mem = val
    filters = args
    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as entrymod
    from pyspark.sql import SparkSession

    builder = (SparkSession.builder.master("local[8]")
               .config("spark.sql.shuffle.partitions", "8")
               .config("spark.ui.enabled", "false")
               .appName("check_all"))
    if mem:
        builder = builder.config("spark.driver.memory", mem)
    spark = builder.getOrCreate()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = entrymod.queries()
    if first_n is not None:
        qs = dict(list(qs.items())[:first_n])
    oracles = entrymod.oracle_sql()
    results: dict[str, dict] = {}
    n_bad = 0
    # Per-query watchdog: an intermittent Spark AQE race (observed
    # twice at the 10x soak — a collect parks forever in
    # AdaptiveSparkPlanExec.withFinalPlanUpdate's event-queue take)
    # can otherwise hang the WHOLE sweep. Cancellation is scoped to a
    # per-query job group (NOT cancelAllJobs): timer.cancel() cannot
    # stop a callback that already fired, so a context-global cancel
    # racing a query that finishes near the deadline would kill the
    # NEXT query's jobs and record a spurious BAD. cancelJobGroup on a
    # finished group is a harmless no-op warning. Streaming
    # microbatches run under StreamExecution's OWN runId job group
    # (jobs submitted from its thread), so the per-query group cancel
    # can't reach them and run_stream_to_table blocks in
    # processAllAvailable() with no timeout — the timer therefore also
    # stops every active streaming query. A done-flag checked inside
    # the callback closes the finish-near-deadline race (a fired timer
    # can't be cancel()ed, and stopping the NEXT query's streams would
    # record a spurious BAD). Override via CHECK_ALL_TIMEOUT_S
    # (0 = off).
    import os
    import threading
    import uuid
    wd_s = int(os.environ.get("CHECK_ALL_TIMEOUT_S", "900"))
    for name, fn in qs.items():
        if filters and not any(f in name for f in filters):
            continue
        t0 = time.time()
        rec: dict = {}
        timer = None
        done = threading.Event()
        if wd_s:
            group = f"check_all:{name}:{uuid.uuid4().hex[:8]}"
            spark.sparkContext.setJobGroup(
                group, name, interruptOnCancel=True)

            def _kill(g=group, ev=done, qname=name):
                if ev.is_set():
                    return
                print(f"WATCHDOG firing for {qname}", flush=True)
                spark.sparkContext.cancelJobGroup(g)
                try:
                    for q in spark.streams.active:
                        if not ev.is_set():
                            q.stop()
                except Exception:
                    pass  # stream may race to completion; cancel wins

            timer = threading.Timer(wd_s, _kill)
            timer.daemon = True
            timer.start()
        try:
            sdf = fn(spark, sf_dir)
            spdf = _canon(sdf.toPandas())
            rec["spark_rows"] = len(spdf)
            rec["spark_s"] = round(time.time() - t0, 2)
            if name in oracles:
                opdf = _canon(con.sql(oracles[name]).df())
                rec["oracle_rows"] = len(opdf)
                rec["rows_match"] = len(spdf) == len(opdf)
                rec["schema_match"] = list(spdf.columns) == list(opdf.columns)
                rec["hash_match"] = (rec["schema_match"]
                                     and _hash(spdf) == _hash(opdf))
                if not rec["hash_match"]:
                    n_bad += 1
                    if rec["schema_match"] and rec["rows_match"]:
                        neq = spdf.compare(opdf) if len(spdf) == len(opdf) \
                            else None
                        if neq is not None and len(neq):
                            # stringify: compare() yields MultiIndex
                            # columns whose tuple keys break json.dump
                            rec["first_diff"] = neq.head(3).to_string()
            else:
                rec["check"] = "rows_only"
        except Exception:
            rec["err"] = traceback.format_exc()[-1500:]
            n_bad += 1
        finally:
            done.set()
            if timer is not None:
                timer.cancel()
                # no clearJobGroup in the Python API; the next
                # iteration's setJobGroup supersedes this group anyway
        results[name] = rec
        status = ("OK " if rec.get("hash_match") else
                  "ro " if rec.get("check") else "BAD")
        print(f"{status} {name:35s} {rec.get('spark_s', '-'):>7} "
              f"rows={rec.get('spark_rows')}", flush=True)
        if rec.get("err"):
            print(rec["err"][-600:], flush=True)

    if not filters and first_n is None:
        # the readers UTC pin (readers.load_table) must have fired on a
        # vanilla session during a full run — temporal parity with the
        # zoneless DuckDB reads depends on it
        tz = spark.conf.get("spark.sql.session.timeZone")
        if tz != "UTC":
            print(f"BAD session.timeZone is {tz!r}, not UTC — "
                  "the readers UTC pin never fired")
            n_bad += 1

    with open("/tmp/check_all.json", "w") as f:
        json.dump(results, f, indent=1, default=str)
    print(f"\n{n_bad} problem(s); detail in /tmp/check_all.json")
    return 1 if n_bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
