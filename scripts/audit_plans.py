"""Registry-wide physical-plan audit: flags CartesianProduct,
single-partition window funnels, and build errors across every
lazily-buildable registered query.

Eager-build families are skipped — streaming drains, model fits, BPE
training, and checkpointing ANN/closure paths execute real jobs at
plan-build time and carry their own pinned plan tests
(tests/test_plans.py, tests/test_similarity.py). Broadcast
nested-loop joins are NOT flagged: broadcasts of 1-row/tiny aggregate
frames (thresholds, totals, min-max stats) are the intended pattern.

A ``Window`` fed by ``Exchange SinglePartition`` IS flagged unless the
exchange's subtree contains an aggregate: a global window over a
pre-aggregated k-row frame (distinct scores, per-partition counts,
grouped quantile edges) is bounded, but one over raw fact-table rows
funnels the whole table through a single task — the round-9 verdict's
one scale-killer (the old order_value_histogram equi-depth ntile).

Usage: python scripts/audit_plans.py [--sf DIR]
Exit 1 if anything is flagged. Round-7 baseline: 236 audited, 0 flags.
"""
from __future__ import annotations

import sys


def _tree_depth(line: str) -> int:
    """Character offset where the operator name starts in Spark's
    tree rendering (`+- ` / `:- ` connectors); 0 for the root line."""
    i = max(line.find("+- "), line.find(":- "))
    return i + 3 if i >= 0 else 0


def single_partition_windows(plan: str) -> int:
    """Count Window operators whose input is an un-aggregated
    Exchange SinglePartition (global sort of raw rows)."""
    lines = plan.splitlines()
    hits = 0
    for idx, line in enumerate(lines):
        if "Exchange SinglePartition" not in line:
            continue
        d = _tree_depth(line)
        # nearest ancestors: lines above with strictly decreasing depth
        cur, window_above = d, False
        for j in range(idx - 1, -1, -1):
            dj = _tree_depth(lines[j])
            if dj < cur:
                cur = dj
                if "Window" in lines[j]:
                    window_above = True
                    break
                if cur == 0 or "Exchange" in lines[j] \
                        or "Aggregate" in lines[j] or "Join" in lines[j]:
                    break  # a reducing/reshuffling op owns this exchange
        if not window_above:
            continue
        # subtree below the exchange: an aggregate means bounded input.
        # A bare localCheckpoint scan (`Scan ExistingRDD`) is NOT
        # exempt by itself — the ranking helpers checkpoint fact-scale
        # frames too. Their size-gated small-path windows never appear
        # here: main() forces TDNS_RANKING_FORCE_DISTRIBUTED, so every
        # helper builds the distributed (scale) plan for this audit.
        reduced = False
        for j in range(idx + 1, len(lines)):
            dj = _tree_depth(lines[j])
            if dj <= d:
                break
            if "Aggregate" in lines[j]:
                reduced = True
                break
        if not reduced:
            hits += 1
    return hits

SKIP = ("stream_", "bpe_", "kmeans", "iforest", "pca_", "mahalanobis",
        "dbscan", "ensemble", "smote", "supervised", "autoencoder",
        "ocsvm", "ivf", "lsh_ann", "minhash_near_dups", "minhash_dedup",
        "embedding_ann", "near_dup_groups", "media_")


def main() -> int:
    sf_dir = "/root/testdata/sf0.01"
    args = sys.argv[1:]
    if args and args[0] == "--sf":
        sf_dir = args[1]
    sys.path.insert(0, "/root/repo")
    import os
    # audit the SCALE path: the ranking helpers' size gate would pick
    # the (runtime-bounded, legal) plain window at sf0.01 — force the
    # distributed form so the plan this audit grades is the one a
    # 100x run executes
    os.environ["TDNS_RANKING_FORCE_DISTRIBUTED"] = "1"
    from threat_detection_nosql_spark.queries import all_queries
    from threat_detection_nosql_spark.session import get_spark
    spark = get_spark("audit_plans")
    flagged: dict[str, str] = {}
    n = 0
    for name, fn in all_queries().items():
        if any(s in name for s in SKIP):
            continue
        try:
            plan = fn(spark, sf_dir)._jdf.queryExecution() \
                .executedPlan().toString()
        except Exception as e:  # noqa: BLE001 - report, don't die
            flagged[name] = f"build-error: {str(e)[:100]}"
            continue
        n += 1
        cart = plan.count("CartesianProduct")
        if cart:
            flagged[name] = f"CartesianProduct x{cart}"
        spw = single_partition_windows(plan)
        if spw:
            flagged[name] = f"single-partition window x{spw}"
    print(f"audited {n} queries; {len(flagged)} flagged")
    for k, v in sorted(flagged.items()):
        print(f"FLAG {k}: {v}")
    return 1 if flagged else 0


if __name__ == "__main__":
    raise SystemExit(main())
