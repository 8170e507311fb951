"""State-size soak for the stateful streaming family (VERDICT r8 #6).

The batch quadratic family has a 10x/30x/100x soak table in
COVERAGE.md; this measures the STREAMING side the same way: drive each
stateful query's drain at sf0.1 and the soak multipliers, read the
final micro-batch's ``stateOperators[].numRowsTotal`` from
``stream_queries.LAST_STREAM_PROGRESS`` (captured by
``run_stream_to_table``), and print one JSON line per (query, dir) with
state rows vs input rows. The scaling claim under test: state is fixed
(KMV bottom-k), key-bounded (dedup keys, funnel users, CDC keys), or
watermark-bounded (timer buffers) — never proportional to stream
length.

Usage: python scripts/soak_stream_state.py [dir ...]
Defaults: /root/testdata/sf0.1 /tmp/soak_sf1 /tmp/soak_sf10 (skips
missing dirs).
"""
from __future__ import annotations

import json
import os
import sys
import time

from pyspark.sql import SparkSession

sys.path.insert(0, "/root/repo")

QUERIES = [
    "stream_incremental_dedup",
    "stream_kmv_quantiles",
    "stream_funnel_ordered",
    "stream_cdc_state",
    "stream_peak_concurrency",
    "stream_theta_overlap",  # round 11: fixed k-entry theta sketches
]


def main() -> int:
    dirs = sys.argv[1:] or ["/root/testdata/sf0.1", "/tmp/soak_sf1",
                            "/tmp/soak_sf10"]
    spark = (SparkSession.builder.master("local[32]")
             .config("spark.sql.shuffle.partitions", "32")
             .config("spark.driver.memory", "48g")
             .config("spark.sql.session.timeZone", "UTC")
             .config("spark.ui.enabled", "false").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as entry
    from threat_detection_nosql_spark.streaming import stream_queries as S
    qs = entry.queries()
    for d in dirs:
        if not os.path.isdir(d):
            print(json.dumps({"dir": d, "skipped": "missing"}))
            continue
        for name in QUERIES:
            t0 = time.time()
            try:
                out_rows = qs[name](spark, d).count()
            except Exception as e:  # record, keep sweeping
                print(json.dumps({"dir": d, "query": name,
                                  "error": str(e)[:200]}))
                continue
            prog = dict(S.LAST_STREAM_PROGRESS)
            ops = prog.get("state_operators") or []
            print(json.dumps({
                "dir": d, "query": name,
                "sec": round(time.time() - t0, 2),
                "input_rows": prog.get("input_rows"),
                "state_rows_total": sum(
                    op.get("numRowsTotal") or 0 for op in ops),
                "state_operators": ops,
                "out_rows": out_rows}), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
