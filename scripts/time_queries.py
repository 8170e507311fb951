"""Time registered queries (Spark side only — no oracle) at a given
SF dir. The scale-soak companion to check_all: check_all proves
correctness parity, this measures wall-clock growth across soak
multipliers so super-linear blowups show as ratios, not anecdotes.

Usage: python scripts/time_queries.py SF_DIR [--mem 32g] [--count] name...

--count uses df.count() instead of collect() (for queries whose
output grows with the soak multiplier; fine here because none of the
timed plans end in a prunable row-preserving left join — see the
round-5 near_dup pruning lesson before adding names).
"""
from __future__ import annotations

import sys
import time


def main() -> int:
    args = sys.argv[1:]
    usage = ("usage: python scripts/time_queries.py SF_DIR "
             "[--mem 32g] [--count] name...")
    if not args:
        print(usage)
        return 2
    sf_dir = args.pop(0)
    mem = "8g"
    use_count = False
    while args and args[0] in ("--mem", "--count"):
        if args[0] == "--mem":
            mem = args[1]
            args = args[2:]
        else:
            use_count = True
            args = args[1:]
    names = args
    stray = [n for n in names if n.startswith("--")]
    if not names or stray:
        print(f"usage error: flags go before query names ({stray})"
              if stray else "usage error: no query names given")
        return 2
    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as entrymod
    from pyspark.sql import SparkSession

    spark = (SparkSession.builder.master("local[16]")
             .config("spark.sql.shuffle.partitions", "32")
             .config("spark.driver.memory", mem)
             .config("spark.ui.enabled", "false")
             .appName("time_queries").getOrCreate())
    queries = entrymod.queries()
    # warm codegen/Arrow/parquet once so the first timed query is not
    # charged JVM startup (same rationale as bench.py)
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    spark.read.parquet(f"{sf_dir}/events.parquet").limit(1).collect()
    for name in names:
        start = time.perf_counter()
        df = queries[name](spark, sf_dir)
        n = df.count() if use_count else len(df.collect())
        print(f"{name:38s} {time.perf_counter() - start:8.2f} s "
              f"rows={n}", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
