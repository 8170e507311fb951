"""Registry-wide physical-plan audit: flags CartesianProduct (and
build errors) across every lazily-buildable registered query.

Eager-build families are skipped — streaming drains, model fits, BPE
training, and checkpointing ANN/closure paths execute real jobs at
plan-build time and carry their own pinned plan tests
(tests/test_plans.py, tests/test_similarity.py). Broadcast
nested-loop joins are NOT flagged: broadcasts of 1-row/tiny aggregate
frames (thresholds, totals, min-max stats) are the intended pattern.

Usage: python scripts/audit_plans.py [--sf DIR]
Exit 1 if anything is flagged. Round-7 baseline: 236 audited, 0 flags.
"""
from __future__ import annotations

import sys

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
    print(f"audited {n} queries; {len(flagged)} flagged")
    for k, v in sorted(flagged.items()):
        print(f"FLAG {k}: {v}")
    return 1 if flagged else 0


if __name__ == "__main__":
    raise SystemExit(main())
