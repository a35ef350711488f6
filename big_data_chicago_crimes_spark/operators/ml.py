"""MLlib pipelines (reference capability: SURVEY.md §2.11, README.md:19-23).

The reference trains four models (logistic regression, random forest,
GBT regression, k-means) through hand-inlined StringIndexer →
VectorAssembler → scaler stages. This module centralizes that as one
``feature_pipeline`` builder and four seeded model runners, with the
reference's bugs FIXED, not replicated:

1. ``Pipeline().fit(df).transform(df)`` — the reference calls
   ``.transform`` on the unfitted Pipeline (Dataset.py:608, 727, 835).
2. Each boolean column casts from ITSELF (Dataset.py:114 overwrites
   Domestic from Arrest).
3. dtype-driven encode-column selection uses ``df.dtypes`` — the
   reference's ``df.select().dtypes`` (empty select) silently produced
   ``[]`` (Dataset.py:868).

Seeds mirror the reference (42 / 0) so every run is reproducible.
"""

from __future__ import annotations

from pyspark.ml import Pipeline
from pyspark.ml.classification import LogisticRegression, RandomForestClassifier
from pyspark.ml.clustering import KMeans
from pyspark.ml.evaluation import BinaryClassificationEvaluator, RegressionEvaluator
from pyspark.ml.feature import (
    MinMaxScaler,
    StandardScaler,
    StringIndexer,
    VectorAssembler,
)
from pyspark.ml.regression import GBTRegressor
from pyspark.ml.stat import Correlation
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SEED = 42


def string_columns(df: DataFrame, exclude: tuple[str, ...] = ()) -> list[str]:
    """Schema-reflective feature selection (the reference's dtype-driven
    pattern, Dataset.py:578-579 — with the empty-select bug fixed)."""
    return [c for c, t in df.dtypes if t == "string" and c not in exclude]


def numeric_columns(df: DataFrame, exclude: tuple[str, ...] = ()) -> list[str]:
    num = {"int", "bigint", "double", "float", "smallint", "tinyint"}
    return [c for c, t in df.dtypes if t in num and c not in exclude]


def feature_pipeline(
    df: DataFrame,
    label_col: str,
    exclude: tuple[str, ...] = (),
    scaler: str = "standard",
) -> tuple[DataFrame, list[str]]:
    """Index every string column (frequencyDesc, handleInvalid=keep —
    Dataset.py:582-585), assemble numerics + indexed cols, scale.
    Returns (transformed df with 'features' col, feature column names).
    FIT-then-transform — reference bug 1 fixed."""
    to_encode = string_columns(df, exclude=exclude + (label_col,))
    indexers = [
        StringIndexer(
            inputCol=c,
            outputCol=f"{c}_idx",
            handleInvalid="keep",
            stringOrderType="frequencyDesc",
        )
        for c in to_encode
    ]
    feature_cols = [
        c for c in numeric_columns(df, exclude=exclude + (label_col,))
    ] + [f"{c}_idx" for c in to_encode]
    assembler = VectorAssembler(
        inputCols=feature_cols, outputCol="features_raw", handleInvalid="keep"
    )
    if scaler == "minmax":  # GBT path (Dataset.py:827-829)
        sc = MinMaxScaler(inputCol="features_raw", outputCol="features")
    else:  # withMean=False keeps sparse vectors sparse (Dataset.py:596-599)
        sc = StandardScaler(
            inputCol="features_raw", outputCol="features", withMean=False, withStd=True
        )
    pipeline = Pipeline(stages=[*indexers, assembler, sc])
    return pipeline.fit(df).transform(df), feature_cols


def logistic_regression_predictions(df: DataFrame, label_col: str) -> DataFrame:
    """LR (maxIter=100, regParam=0.1 — Dataset.py:644-646) held-out
    predictions (the frame the reference's hist_arrests chart consumes)."""
    prepared, _ = feature_pipeline(df, label_col)
    train, test = prepared.randomSplit([0.8, 0.2], seed=SEED)
    model = LogisticRegression(
        featuresCol="features", labelCol=label_col, maxIter=100, regParam=0.1
    ).fit(train)
    return model.transform(test)


def logistic_regression_auc(df: DataFrame, label_col: str) -> DataFrame:
    """LR → 1-row AUC."""
    preds = logistic_regression_predictions(df, label_col)
    auc = BinaryClassificationEvaluator(
        labelCol=label_col, metricName="areaUnderROC"
    ).evaluate(preds)
    return df.sparkSession.createDataFrame([(float(auc),)], "roc_auc double")


def random_forest_predictions(df: DataFrame, label_col: str) -> DataFrame:
    """RF (numTrees=20, maxDepth=10, seed=42 — Dataset.py:732-735)
    held-out predictions."""
    prepared, _ = feature_pipeline(df, label_col)
    train, test = prepared.randomSplit([0.7, 0.3], seed=SEED)
    model = RandomForestClassifier(
        featuresCol="features",
        labelCol=label_col,
        numTrees=20,
        maxDepth=10,
        seed=SEED,
    ).fit(train)
    return model.transform(test)


def random_forest_auc(df: DataFrame, label_col: str) -> DataFrame:
    """RF → 1-row AUC."""
    preds = random_forest_predictions(df, label_col)
    auc = BinaryClassificationEvaluator(
        labelCol=label_col, metricName="areaUnderROC"
    ).evaluate(preds)
    return df.sparkSession.createDataFrame([(float(auc),)], "roc_auc double")


def gbt_regression_rmse(df: DataFrame, label_col: str) -> DataFrame:
    """GBT regression on a pre-aggregated series (the reference trains on
    groupBy-count output, Dataset.py:800,839-847) → 1-row RMSE."""
    prepared, _ = feature_pipeline(df, label_col, scaler="minmax")
    train, test = prepared.randomSplit([0.7, 0.3], seed=SEED)
    model = GBTRegressor(
        featuresCol="features",
        labelCol=label_col,
        maxIter=100,
        maxDepth=5,
        stepSize=0.05,
        seed=SEED,
    ).fit(train)
    preds = model.transform(test)
    rmse = RegressionEvaluator(labelCol=label_col, metricName="rmse").evaluate(preds)
    return df.sparkSession.createDataFrame([(float(rmse),)], "rmse double")


def kmeans_assign(
    df: DataFrame, feature_cols: list[str], k: int = 3
) -> DataFrame:
    """KMeans (seed=0 — Dataset.py:286-294) row→cluster assignment: the
    input frame plus a ``cluster`` column. This is the crime_map input —
    each district colored by its cluster (Dataset.py:291-312)."""
    assembler = VectorAssembler(inputCols=feature_cols, outputCol="features")
    assembled = assembler.transform(df)
    model = KMeans(k=k, seed=0, featuresCol="features").fit(assembled)
    return (
        model.transform(assembled)
        .withColumnRenamed("prediction", "cluster")
        .drop("features")
    )


def kmeans_cluster_sizes(df: DataFrame, feature_cols: list[str], k: int = 3) -> DataFrame:
    """KMeans (k=3, seed=0 — Dataset.py:286-294) → cluster size table."""
    return (
        kmeans_assign(df, feature_cols, k)
        .groupBy("cluster")
        .agg(F.count("*").alias("n"))
        .orderBy("cluster")
    )


def pearson_correlation_matrix(df: DataFrame, cols: list[str]) -> DataFrame:
    """ml.stat.Correlation (Dataset.py:883-885) flattened to (col_a,
    col_b, corr) rows — matrix as a DataFrame, not a driver-side plot."""
    assembler = VectorAssembler(inputCols=cols, outputCol="features")
    assembled = assembler.transform(df.na.drop(subset=cols))
    corr_row = Correlation.corr(assembled, "features", "pearson").head()
    matrix = corr_row[0].toArray()
    rows = [
        (cols[i], cols[j], round(float(matrix[i][j]), 6))
        for i in range(len(cols))
        for j in range(len(cols))
    ]
    return df.sparkSession.createDataFrame(
        rows, "col_a string, col_b string, corr double"
    )


def one_hot_pipeline(df: DataFrame, label_col: str) -> tuple[DataFrame, list[str]]:
    """Indexer → OneHotEncoder → assembler variant (M14: OneHotEncoder is
    imported but commented out in the reference, Dataset.py:26; provided
    here as a working alternative to frequency-indexed categoricals)."""
    from pyspark.ml.feature import OneHotEncoder

    to_encode = string_columns(df, exclude=(label_col,))
    indexers = [
        StringIndexer(inputCol=c, outputCol=f"{c}_idx", handleInvalid="keep")
        for c in to_encode
    ]
    encoder = OneHotEncoder(
        inputCols=[f"{c}_idx" for c in to_encode],
        outputCols=[f"{c}_oh" for c in to_encode],
    )
    feature_cols = numeric_columns(df, exclude=(label_col,)) + [
        f"{c}_oh" for c in to_encode
    ]
    assembler = VectorAssembler(
        inputCols=feature_cols, outputCol="features", handleInvalid="keep"
    )
    pipeline = Pipeline(stages=[*indexers, encoder, assembler])
    return pipeline.fit(df).transform(df), feature_cols


def one_hot_lr_predictions(df: DataFrame, label_col: str) -> DataFrame:
    """LR held-out predictions over the one-hot feature pipeline — the
    M14 OneHotEncoder path (imported but commented out in the reference,
    Dataset.py:26) run end-to-end so the driver gate certifies it, not
    just the local suite. Same split/hyperparameters as
    :func:`logistic_regression_predictions`; only the featurization
    differs."""
    prepared, _ = one_hot_pipeline(df, label_col)
    train, test = prepared.randomSplit([0.8, 0.2], seed=SEED)
    model = LogisticRegression(
        featuresCol="features", labelCol=label_col, maxIter=100, regParam=0.1
    ).fit(train)
    return model.transform(test)


# The CV regParam grid, exported so the certification query's membership
# check and the operator can never drift apart (ADVICE r12).
CV_REG_PARAM_GRID: tuple[float, ...] = (0.01, 0.1)


def cross_validated_lr_auc(df: DataFrame, label_col: str, folds: int = 3) -> DataFrame:
    """CrossValidator + ParamGridBuilder (M14: imported and sketched in
    comments at Dataset.py:615-642 but never run) — a working 3-fold CV
    over the LR regularization grid; returns (best_reg_param, roc_auc)."""
    from pyspark.ml.tuning import CrossValidator, ParamGridBuilder

    prepared, _ = feature_pipeline(df, label_col)
    lr = LogisticRegression(featuresCol="features", labelCol=label_col, maxIter=20)
    grid = ParamGridBuilder().addGrid(lr.regParam, list(CV_REG_PARAM_GRID)).build()
    evaluator = BinaryClassificationEvaluator(
        labelCol=label_col, metricName="areaUnderROC"
    )
    cv = CrossValidator(
        estimator=lr,
        estimatorParamMaps=grid,
        evaluator=evaluator,
        numFolds=folds,
        seed=SEED,
        # fold×param fits are independent — run them concurrently
        # (each fit's jobs still parallelize across executor threads)
        parallelism=4,
    )
    model = cv.fit(prepared)
    best = model.bestModel
    auc = max(model.avgMetrics)
    return df.sparkSession.createDataFrame(
        [(float(best.getRegParam()), float(auc))], "best_reg_param double, roc_auc double"
    )
