"""Time a subset of bench queries with EXACTLY the bench.py
methodology (get_spark session, warmup, median-of-3, collect vs count
from the bench group lists) — the fast measure/re-measure loop for the
optimization round without paying the full ~20-min sweep.

Usage: python scripts/bench_subset.py [--sf DIR] name [name ...]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402
from threat_detection_nosql_spark.queries import all_queries  # noqa: E402
from threat_detection_nosql_spark.session import get_spark  # noqa: E402


def main() -> int:
    args = sys.argv[1:]
    sf_dir = bench.SF_DIR
    if args and args[0] == "--sf":
        sf_dir = args[1]
        args = args[2:]
    names = args
    count_set = set(bench.HEADLINE_COUNT)
    for _, _, count in bench.GROUP_SPECS:
        count_set.update(count)

    spark = get_spark("bench_subset")
    queries = all_queries()
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    queries["after_hours_top10"](spark, sf_dir).limit(1).collect()

    total_med = total_min = 0.0
    for name in names:
        fn = queries[name]
        runs = []
        for _ in range(3):
            start = time.perf_counter()
            df = fn(spark, sf_dir)
            df.count() if name in count_set else df.collect()
            runs.append(time.perf_counter() - start)
        runs.sort()
        total_med += runs[1]
        total_min += runs[0]
        print(f"{name:42s} med {runs[1]:7.3f}  min {runs[0]:7.3f}  "
              f"max {runs[2]:7.3f}")
    print(f"{'TOTAL':42s} med {total_med:7.3f}  min {total_min:7.3f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
