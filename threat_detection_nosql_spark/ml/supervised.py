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
- M13 RBF-kernel SVC → `LinearSVC` (Spark ML has no kernel SVM).
- M14 XGBoost → `GBTClassifier`; `xgboost.spark` is used when the
  library is installed (import-gated).
- A20–A22: confusion matrix / accuracy / precision / recall / F1 as
  SQL expressions over (label, prediction) counts; AUC via
  `BinaryClassificationEvaluator`.
"""

from __future__ import annotations

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
    rf = RandomForestClassifier(
        featuresCol="scaled", labelCol=label, weightCol="weight",
        numTrees=200, maxDepth=10, seed=seed)
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


def _fit_svc(train: DataFrame, label: str, seed: int):
    from pyspark.ml.classification import LinearSVC
    svc = LinearSVC(featuresCol="scaled", labelCol=label,
                    weightCol="weight", regParam=0.1, maxIter=40)
    return svc.fit(train)


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
                      ("linear_svc", _fit_svc)):
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
