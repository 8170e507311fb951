"""Benchmark the connected-component algorithms at soak scale.

VERDICT r8 asked for star-contraction as the at-scale default.  Round 9
made :func:`operators.graph.connected_components` a hybrid (min-label
passes with a star-contraction handoff); this script measures all three
strategies on the two topology regimes that matter:

- SHALLOW: K-way near-dup cliques (the graph the dedup/DBSCAN callers
  actually produce) — min-label converges in ~2 passes and each pass is
  cheaper than an alternating-star round, so the hybrid should match
  pure min-label here.
- DEEP: long path chains (diameter >> pass budget) — pure min-label
  needs diameter passes (the old code raised RuntimeError); star and
  the hybrid finish in O(log n) rounds.

Deterministic inputs (pure sequence arithmetic, no RNG).  Usage:

    python scripts/bench_cc.py [n_edges_shallow] [n_chains] [chain_len]

Prints one JSON line per (topology, algorithm) with wall seconds and
the component count (equal across algorithms or the run FAILED).
"""
from __future__ import annotations

import json
import sys
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, "/root/repo")

from threat_detection_nosql_spark.operators.graph import (  # noqa: E402
    connected_components, connected_components_star)


def main() -> int:
    n_shallow = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
    n_chains = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000
    chain_len = int(sys.argv[3]) if len(sys.argv) > 3 else 1_000
    spark = (SparkSession.builder.master("local[32]")
             .config("spark.sql.shuffle.partitions", "32")
             .config("spark.driver.memory", "24g")
             .config("spark.ui.enabled", "false").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    # SHALLOW: one 10-node star per block — every node attaches to its
    # block's base (id//10)*10, so each full block is a diameter-2
    # component. A trailing partial block of 1 node has no edge (the
    # self-loop is filtered) and is not edge-incident, hence not a
    # component; partial blocks of >= 2 nodes are.
    ids = spark.range(n_shallow)
    shallow = (ids.select(
        F.col("id").alias("src"),
        ((F.col("id") / 10).cast("long") * 10).alias("dst"))
        .filter(F.col("src") != F.col("dst")))
    n_shallow_comps = n_shallow // 10 + (1 if n_shallow % 10 >= 2 else 0)
    # DEEP: n_chains paths of chain_len nodes each.
    seq = spark.range(n_chains * chain_len)
    deep = (seq.select(F.col("id").alias("src"),
                       (F.col("id") + 1).alias("dst"))
            .filter((F.col("id") + 1) % chain_len != 0))

    cases = {
        "shallow_cliques": (shallow, n_shallow_comps),
        "deep_chains": (deep, n_chains),
    }
    algos = {
        "minlabel_pure": lambda e: connected_components(
            e, max_iter=10_000),  # never hands off
        "star_pure": lambda e: connected_components_star(e),
        "hybrid_default": lambda e: connected_components(e),
    }
    for topo, (edges, want) in cases.items():
        edges = edges.localCheckpoint()
        for name, fn in algos.items():
            if topo == "deep_chains" and name == "minlabel_pure" \
                    and chain_len > 200:
                # diameter passes at one shuffle join each — hours.
                # The old default (30-pass cap) RAISED here; record it
                # as the regime boundary rather than burning the box.
                print(json.dumps({"topology": topo, "algo": name,
                                  "sec": None, "n_components": None,
                                  "note": f"needs ~{chain_len} passes; "
                                          "skipped (old default raised "
                                          "RuntimeError at 30)"}))
                continue
            t0 = time.time()
            got = (fn(edges).agg(
                F.countDistinct("component").alias("n")).collect()[0]["n"])
            print(json.dumps({
                "topology": topo, "algo": name,
                "sec": round(time.time() - t0, 2),
                "n_components": got, "expected": want,
                "ok": got == want}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
