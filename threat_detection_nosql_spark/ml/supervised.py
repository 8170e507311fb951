"""Supervised classification stage (SURVEY.md §2.8 M10–M15, A20–A22).

Reference: SMOTE-resampled sklearn GridSearchCV stack
(`Comparaison_ML.py:551-701`). Spark-first substitutions (documented):

- M10 SMOTE → two paths: class-weight column (`weightCol`, the default
  here — Spark ML's native imbalance mechanism), and a real distributed
  SMOTE (synthetic kNN interpolation) + random undersampler in
  ml/resample.py matching imblearn's sampling_strategy semantics.
- M11 stratified 80/20 split → per-label `sampleBy` with fixed seed.
- M12 RandomForest + grid CV → `RandomForestClassifier` +
  `CrossValidator(numFolds=3)` on an f1 evaluator.
- M13 RBF-kernel SVC → two models: `LinearSVC` (margin baseline) and
  `rbf_rff_lr` — LogisticRegression on random Fourier features, which
  approximates the RBF kernel AND yields the probabilities the
  reference's `SVC(probability=True)` exposes.
- M14 XGBoost → THREE paths: `hist_gbdt` (ml/boosting.py — the XGBoost
  algorithm proper: second-order gradients, histogram split finding,
  exact objective, from scratch and fully distributed), `GBTClassifier`
  (Spark ML baseline), and `xgboost.spark` when the library is
  installed (import-gated).
- A20–A22: confusion matrix / accuracy / precision / recall / F1 as
  SQL expressions over (label, prediction) counts; AUC via
  `BinaryClassificationEvaluator`.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

LABEL = "is_anomaly"


def stratified_split(df: DataFrame, label: str = LABEL,
                     test_frac: float = 0.2,
                     seed: int = 42) -> tuple[DataFrame, DataFrame]:
    """M11: 80/20 stratified (`Comparaison_ML.py:579`). `sampleBy`
    keeps per-class proportions; the complement (anti-join on the key
    set) is the test side."""
    classes = [r[label] for r in df.select(label).distinct().collect()]
    train = df.sampleBy(label, {c: 1 - test_frac for c in classes}, seed)
    test = df.join(train.select("user"), "user", "left_anti")
    return train, test


def with_class_weights(df: DataFrame, label: str = LABEL) -> DataFrame:
    """M10 substitute: balanced class weights n/(k·n_c) as weightCol —
    the same effective reweighting sklearn's class_weight='balanced'
    applies, without synthetic oversampling."""
    counts = df.groupBy(label).count()
    n = df.count()
    k = counts.count()
    weights = {r[label]: n / (k * r["count"]) for r in counts.collect()}
    expr = F.when(F.col(label) == list(weights)[0],
                  F.lit(float(weights[list(weights)[0]])))
    for c in list(weights)[1:]:
        expr = expr.when(F.col(label) == c, F.lit(float(weights[c])))
    return df.withColumn("weight", expr.otherwise(F.lit(1.0)))


def _fit_rf(train: DataFrame, label: str, seed: int, tune: bool):
    from pyspark.ml.classification import RandomForestClassifier
    # reference's (single-point) grid, Comparaison_ML.py:588-595:
    # n_estimators 200, max_depth 10, min_samples_leaf 2 →
    # minInstancesPerNode, max_features 'sqrt' → featureSubsetStrategy;
    # class_weight 'balanced' rides weightCol (min_samples_split has
    # no Spark analog — node splitting is governed by instances/node)
    rf = RandomForestClassifier(
        featuresCol="scaled", labelCol=label, weightCol="weight",
        numTrees=200, maxDepth=10, minInstancesPerNode=2,
        featureSubsetStrategy="sqrt", seed=seed)
    if not tune:
        return rf.fit(train)
    # M12/M15: grid CV, cv=3, f1 scoring (`Comparaison_ML.py:586-613`)
    from pyspark.ml.evaluation import MulticlassClassificationEvaluator
    from pyspark.ml.tuning import CrossValidator, ParamGridBuilder
    grid = (ParamGridBuilder()
            .addGrid(rf.numTrees, [100, 200])
            .addGrid(rf.maxDepth, [5, 10])
            .build())
    ev = MulticlassClassificationEvaluator(
        labelCol=label, predictionCol="prediction", metricName="f1")
    cv = CrossValidator(estimator=rf, estimatorParamMaps=grid,
                        evaluator=ev, numFolds=3, parallelism=4,
                        seed=seed)
    return cv.fit(train).bestModel


def _fit_gbt(train: DataFrame, label: str, seed: int):
    """M14: SparkXGBClassifier when available, else GBTClassifier."""
    try:
        from xgboost.spark import SparkXGBClassifier  # type: ignore
        xgb = SparkXGBClassifier(
            features_col="scaled", label_col=label,
            learning_rate=0.01, n_estimators=300, max_depth=6,
            subsample=0.8)
        return xgb.fit(train)
    except ImportError:
        from pyspark.ml.classification import GBTClassifier
        # 40 boosting rounds: on the 200-row fixture quality saturates
        # well before 40 (each round = one Spark job, so rounds are the
        # wall-clock driver on small data)
        gbt = GBTClassifier(featuresCol="scaled", labelCol=label,
                            weightCol="weight", maxIter=40, maxDepth=6,
                            stepSize=0.05, subsamplingRate=0.8, seed=seed)
        return gbt.fit(train)


def _fit_hist_gbdt(train: DataFrame, label: str, seed: int):
    """M14 proper: from-scratch second-order histogram boosting
    (ml/boosting.py) — the XGBoost algorithm itself, distributed via
    per-level histogram aggregation, independent of the GBTClassifier
    substitute above. ``seed`` is unused: training is fully
    deterministic (fixed-width bins, exact argmax)."""
    from threat_detection_nosql_spark.ml.boosting import hist_gbdt_fit
    # 10 rounds saturates the fixture (quality plateaus by ~6); each
    # round is a handful of Spark jobs, so rounds drive wall-clock
    return hist_gbdt_fit(train, label, n_rounds=10)


def _fit_svc(train: DataFrame, label: str, seed: int):
    from pyspark.ml.classification import LinearSVC
    svc = LinearSVC(featuresCol="scaled", labelCol=label,
                    weightCol="weight", regParam=0.1, maxIter=40)
    return svc.fit(train)


RFF_DIM = 256  # D: kernel-approximation rank; error is O(1/sqrt(D))


def _rff_transform(df: DataFrame, weights, offsets,
                   in_col: str = "scaled",
                   out_col: str = "rff") -> DataFrame:
    """Random Fourier features (Rahimi & Recht 2007): z(x) =
    sqrt(2/D)·cos(xW + b) with W ~ N(0, 2γI), b ~ U[0, 2π) satisfies
    E[z(x)·z(y)] = exp(−γ‖x−y‖²) — the RBF kernel — so any LINEAR
    model on z approximates the corresponding kernel machine. The map
    is one Arrow-batched GEMM per batch (pandas UDF, broadcast W/b):
    fully distributed, no kernel matrix ever materializes."""
    import pandas as pd
    from pyspark.ml.functions import array_to_vector, vector_to_array

    bc = df.sparkSession.sparkContext.broadcast((weights, offsets))

    def _z(xs):
        w, b = bc.value
        x = np.array(xs.tolist())
        z = np.sqrt(2.0 / w.shape[1]) * np.cos(x @ w + b)
        return pd.Series(list(z))

    z_udf = F.pandas_udf(_z, "array<double>")
    return df.withColumn(
        out_col, array_to_vector(z_udf(vector_to_array(in_col))))


def _rff_planes(d: int, n_features: int, seed: int, gamma: float | None):
    if gamma is None:
        gamma = 1.0 / d  # sklearn 'scale' on unit-variance input
    rng = np.random.default_rng(seed)
    w = rng.normal(0.0, np.sqrt(2.0 * gamma), size=(d, n_features))
    b = rng.uniform(0.0, 2.0 * np.pi, size=n_features)
    return w, b


class _RFFLogisticModel:
    """RBF-approx classifier: RFF map + Spark ML LogisticRegression.
    transform() re-applies the SAME (broadcast) planes then the LR
    model, so prediction / rawPrediction / probability columns behave
    exactly like any Spark ML classifier's."""

    def __init__(self, weights, offsets, lr_model):
        self._w, self._b, self._lr = weights, offsets, lr_model

    def transform(self, df: DataFrame) -> DataFrame:
        return self._lr.transform(_rff_transform(df, self._w, self._b))


def _fit_rbf_lr(train: DataFrame, label: str, seed: int,
                n_features: int = RFF_DIM, gamma: float | None = None):
    """M13 parity: the reference trains an RBF-kernel SVC with
    ``probability=True`` (`Comparaison_ML.py:615-641`); Spark ML has no
    kernel SVM and LinearSVC has no probabilities. Random Fourier
    features close both gaps at once: LogisticRegression on the RFF map
    ≈ kernel logistic regression with the RBF kernel — a margin-shaped
    nonlinear decision boundary WITH calibrated probabilities, and the
    fit itself is distributed (per-row feature map + Spark ML LR), not
    a driver-sample detour."""
    from pyspark.ml.classification import LogisticRegression

    d = train.select("scaled").first()[0].size
    w, b = _rff_planes(d, n_features, seed, gamma)
    lr = LogisticRegression(featuresCol="rff", labelCol=label,
                            weightCol="weight", regParam=0.01,
                            maxIter=100)
    return _RFFLogisticModel(w, b, lr.fit(_rff_transform(train, w, b)))


def confusion_matrix(pred: DataFrame, label: str = LABEL,
                     pred_col: str = "prediction") -> DataFrame:
    """A20: 2×2 counts as a grouped aggregate."""
    return (pred.groupBy(F.col(label).cast("int").alias("label"),
                         F.col(pred_col).cast("int").alias("prediction"))
            .agg(F.count("*").alias("n")))


def classification_metrics(pred: DataFrame, label: str = LABEL,
                           pred_col: str = "prediction") -> dict[str, float]:
    """A21/A22 via one aggregation pass + evaluator AUC."""
    agg = pred.agg(
        F.count("*").alias("n"),
        F.sum(((F.col(label) == 1) & (F.col(pred_col) == 1)).cast("int"))
         .alias("tp"),
        F.sum(((F.col(label) == 0) & (F.col(pred_col) == 1)).cast("int"))
         .alias("fp"),
        F.sum(((F.col(label) == 1) & (F.col(pred_col) == 0)).cast("int"))
         .alias("fn"),
        F.sum(((F.col(label) == 0) & (F.col(pred_col) == 0)).cast("int"))
         .alias("tn")).first()
    tp, fp, fn, tn = agg["tp"], agg["fp"], agg["fn"], agg["tn"]
    precision = tp / (tp + fp) if tp + fp else 0.0
    recall = tp / (tp + fn) if tp + fn else 0.0
    f1 = (2 * precision * recall / (precision + recall)
          if precision + recall else 0.0)
    out = {"accuracy": (tp + tn) / agg["n"], "precision": precision,
           "recall": recall, "f1": f1}
    if "rawPrediction" in pred.columns:
        from pyspark.ml.evaluation import BinaryClassificationEvaluator
        ev = BinaryClassificationEvaluator(
            labelCol=label, rawPredictionCol="rawPrediction",
            metricName="areaUnderROC")
        out["auc"] = ev.evaluate(pred)
    return out


def supervised_report(features: DataFrame, label: str = LABEL,
                      seed: int = 42, tune: bool = False) -> DataFrame:
    """Train RF / GBT(XGB) / LinearSVC on a stratified split with class
    weights; emit one metrics row per model (the
    `rapport_performances.csv` analog)."""
    train, test = stratified_split(features, label, seed=seed)
    train = with_class_weights(train, label).cache()
    rows = []
    for name, fit in (("random_forest", _fit_rf),
                      ("gbt", _fit_gbt),
                      ("hist_gbdt", _fit_hist_gbdt),
                      ("linear_svc", _fit_svc),
                      ("rbf_rff_lr", _fit_rbf_lr)):
        model = (fit(train, label, seed, tune) if fit is _fit_rf
                 else fit(train, label, seed))
        pred = model.transform(test)
        m = classification_metrics(pred, label)
        rows.append((name, round(m["accuracy"], 6),
                     round(m["precision"], 6), round(m["recall"], 6),
                     round(m["f1"], 6), round(m.get("auc", 0.0), 6)))
    return features.sparkSession.createDataFrame(
        rows, "model string, accuracy double, precision double, "
              "recall double, f1 double, auc double")
