"""Histogram gradient boosting — M14 PROPER (`Comparaison_ML.py:
643-688` trains ``xgboost.XGBClassifier``; the library cannot be
installed in this environment, so this implements the ALGORITHM:
XGBoost's second-order, histogram-based tree boosting), distributed
the way xgboost's own distributed mode is:

- per boosting round, gradients g = w·(p − y) and hessians
  h = w·p·(1 − p) are row-local expressions;
- split finding aggregates (node, feature, bin) → (Σg, Σh) histograms
  — ONE map-combinable groupBy per tree level whose result is at most
  nodes × features × bins rows (the AllReduce'd histogram in xgboost's
  distributed design), collected to the driver for the argmax;
- split gain and leaf weights use the XGBoost objective exactly:
  gain = ½[G_L²/(H_L+λ) + G_R²/(H_R+λ) − G²/(H+λ)] − γ,
  leaf w* = −G/(H+λ), margin update += η·w*;
- node routing is a pure column expression (heap-indexed node ids,
  node ← 2·node + [bin > threshold]) — no UDF anywhere in training;
- prediction replays the trees as nested expressions (bin lookup +
  per-level routing + leaf CASE map), entirely inside codegen.

Driver traffic per level is the bounded histogram (like the Lloyd /
BPE argmax pattern elsewhere in this repo); rows never leave the
cluster. Binning is fixed-width over the global per-feature min/max
(one aggregation) — deterministic, no engine RNG.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass
class _Tree:
    # heap node id -> (feature index, bin threshold); route left when
    # bin <= threshold
    splits: dict[int, tuple[int, int]] = field(default_factory=dict)
    # terminal heap node id -> leaf weight (already scaled by eta)
    leaves: dict[int, float] = field(default_factory=dict)


@dataclass
class HistGBDTModel:
    bin_mins: list[float]
    bin_widths: list[float]
    n_bins: int
    trees: list[_Tree]
    features_col: str = "scaled"

    def _bins_col(self):
        mins = F.array(*[F.lit(m) for m in self.bin_mins])
        widths = F.array(*[F.lit(w) for w in self.bin_widths])
        x = F.expr(f"_fv")
        return F.zip_with(
            F.zip_with(x, mins, lambda v, m: v - m),
            widths,
            lambda d, w: F.least(
                F.greatest(F.floor(d / w), F.lit(0)),
                F.lit(self.n_bins - 1)).cast("int"))

    def margin_col(self):
        """Total boosted margin as ONE column expression over `_bins`."""
        total = F.lit(0.0)
        for tree in self.trees:
            node = F.lit(1)
            for _level in range(_max_levels(tree)):
                routed = node
                # route each split node; unsplit nodes keep their id
                for nid, (feat, thr) in tree.splits.items():
                    goes_right = F.element_at("_bins", feat + 1) > thr
                    routed = F.when(
                        node == nid, nid * 2 + goes_right.cast("int")) \
                        .otherwise(routed)
                node = routed
            leaf = F.lit(0.0)
            for nid, w in tree.leaves.items():
                leaf = F.when(node == nid, F.lit(w)).otherwise(leaf)
            total = total + leaf
        return total

    def transform(self, df: DataFrame) -> DataFrame:
        from pyspark.ml.functions import vector_to_array
        out = (df.withColumn("_fv", vector_to_array(self.features_col))
               .withColumn("_bins", self._bins_col())
               .withColumn("rawPrediction", self.margin_col())
               .drop("_fv", "_bins"))
        p = F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("rawPrediction")))
        return (out.withColumn("probability", p)
                .withColumn("prediction",
                            (p >= 0.5).cast("double")))


def _max_levels(tree: _Tree) -> int:
    if not tree.splits:
        return 0
    import math
    return max(int(math.log2(n)) for n in tree.splits) + 1


def hist_gbdt_fit(train: DataFrame, label: str,
                  features_col: str = "scaled",
                  weight_col: str | None = "weight",
                  n_rounds: int = 30, max_depth: int = 3,
                  n_bins: int = 32, eta: float = 0.3,
                  lam: float = 1.0, gamma: float = 0.0,
                  min_child_hessian: float = 1e-3) -> HistGBDTModel:
    """Train the booster. One Spark job per tree level (the histogram
    agg) plus one per round for the leaf-weight agg — bounded driver
    traffic, no driver-side row data ever."""
    from pyspark.ml.functions import vector_to_array

    base = train.withColumn("_fv", vector_to_array(features_col))
    n_feat = len(base.select("_fv").first()[0])
    stats = base.agg(*[F.min(F.element_at("_fv", i + 1)).alias(f"mn{i}")
                       for i in range(n_feat)],
                     *[F.max(F.element_at("_fv", i + 1)).alias(f"mx{i}")
                       for i in range(n_feat)]).first()
    mins = [float(stats[f"mn{i}"]) for i in range(n_feat)]
    widths = [max((float(stats[f"mx{i}"]) - mins[i]) / n_bins, 1e-12)
              for i in range(n_feat)]

    model = HistGBDTModel(mins, widths, n_bins, [],
                          features_col=features_col)
    w_col = (F.col(weight_col) if weight_col
             and weight_col in train.columns else F.lit(1.0))
    # (bins, y, w) is the entire training state; margin evolves per
    # round. localCheckpoint keeps each round's lineage flat (30 rounds
    # of withColumn would otherwise stack 30 re-derivations).
    cur = (base.withColumn("_bins", model._bins_col())
           .select(F.col("_bins"),
                   F.col(label).cast("double").alias("_y"),
                   w_col.cast("double").alias("_w"),
                   F.lit(0.0).alias("_margin"))
           .localCheckpoint())

    for _round in range(n_rounds):
        p = F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("_margin")))
        work = (cur.withColumn("_g", F.col("_w") * (p - F.col("_y")))
                .withColumn("_h", F.col("_w") * p * (F.lit(1.0) - p))
                .withColumn("_node", F.lit(1)))
        tree = _Tree()
        for _level in range(max_depth):
            open_nodes = sorted(
                {n for n in _frontier(tree, _level)})
            if not open_nodes:
                break
            hist = (work.filter(F.col("_node").isin(open_nodes))
                    .select("_node", "_g", "_h",
                            F.posexplode("_bins").alias("_f", "_b"))
                    .groupBy("_node", "_f", "_b")
                    .agg(F.sum("_g").alias("g"), F.sum("_h").alias("h"))
                    .collect())
            splits = _best_splits(hist, n_bins, lam, gamma,
                                  min_child_hessian)
            if not splits:
                break
            tree.splits.update(splits)
            node = F.col("_node")
            routed = node
            for nid, (feat, thr) in splits.items():
                routed = F.when(
                    node == nid,
                    nid * 2 + (F.element_at("_bins", feat + 1) > thr)
                    .cast("int")).otherwise(routed)
            work = work.withColumn("_node", routed)
        leaf_rows = (work.groupBy("_node")
                     .agg(F.sum("_g").alias("g"), F.sum("_h").alias("h"))
                     .collect())
        for r in leaf_rows:
            if r["_node"] in tree.splits:
                continue  # internal (shouldn't happen; safety)
            tree.leaves[r["_node"]] = float(
                -eta * r["g"] / (r["h"] + lam))
        model.trees.append(tree)
        upd = F.lit(0.0)
        for nid, w in tree.leaves.items():
            upd = F.when(F.col("_node") == nid, F.lit(w)).otherwise(upd)
        cur = (work.withColumn("_margin", F.col("_margin") + upd)
               .select("_bins", "_y", "_w", "_margin")
               .localCheckpoint())
    return model


def _frontier(tree: _Tree, level: int) -> set[int]:
    """Heap node ids open for splitting at this level: children of the
    previous level's splits (root at level 0)."""
    if level == 0:
        return {1}
    prev = {n for n in tree.splits if 2 ** (level - 1) <= n < 2 ** level}
    return {c for n in prev for c in (2 * n, 2 * n + 1)}


def _best_splits(hist_rows, n_bins: int, lam: float, gamma: float,
                 min_child_hessian: float) -> dict[int, tuple[int, int]]:
    """Driver-side argmax over the collected histogram: for each open
    node, scan every (feature, bin-threshold) prefix and keep the max
    XGBoost gain. Histogram size is nodes x features x bins — KBs."""
    from collections import defaultdict
    agg: dict[int, dict[int, dict[int, tuple[float, float]]]] = \
        defaultdict(lambda: defaultdict(dict))
    for r in hist_rows:
        agg[r["_node"]][r["_f"]][r["_b"]] = (r["g"], r["h"])
    out: dict[int, tuple[int, int]] = {}
    for node, feats in agg.items():
        # Σ over any single feature's bins is the node total
        f0 = next(iter(feats.values()))
        tot_g = sum(g for (g, _h) in f0.values())
        tot_h = sum(h for (_g, h) in f0.values())
        parent = tot_g * tot_g / (tot_h + lam)
        best = (0.0, None)
        for f, bins in sorted(feats.items()):
            gl = hl = 0.0
            for b in range(n_bins - 1):
                g, h = bins.get(b, (0.0, 0.0))
                gl += g
                hl += h
                gr, hr = tot_g - gl, tot_h - hl
                if hl < min_child_hessian or hr < min_child_hessian:
                    continue
                gain = 0.5 * (gl * gl / (hl + lam)
                              + gr * gr / (hr + lam) - parent) - gamma
                if gain > best[0] + 1e-12:
                    best = (gain, (f, b))
        if best[1] is not None:
            out[node] = best[1]
    return out
