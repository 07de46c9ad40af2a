"""Response-time regression (SURVEY.md §2.7 U2-U8; reference
predictions/response_time_prediction.py).

Feature pipeline parity with the reference (:99-140):
  StringIndexer(endpoint|request_method|country, handleInvalid=keep)
  -> OneHotEncoder x3
  -> VectorAssembler(3 one-hots + request_length + hour_of_day + status_code)
  -> RandomForestRegressor(numTrees=20, maxDepth=5,
                           label=request_time_seconds)

Differences (intent-preserving, SURVEY.md §7 M5):
  * training is an explicitly schedulable batch entry point, not a daemon
    thread with sleep(3600) (:266-274);
  * the training cap is an ordered LIMIT (deterministic) instead of an
    unordered Postgres LIMIT 100000 (:86);
  * model artifacts save/load through the same MLlib API (:143-144, :185).
"""

from __future__ import annotations

from pyspark.ml import Pipeline, PipelineModel
from pyspark.ml.evaluation import RegressionEvaluator
from pyspark.ml.feature import OneHotEncoder, StringIndexer, VectorAssembler
from pyspark.ml.regression import RandomForestRegressor
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from nginx_analytics_spark.operators.features import MIN_TRAINING_ROWS

CATEGORICAL = ("endpoint", "request_method", "country")
NUMERIC = ("request_length", "hour_of_day", "status_code")
LABEL = "request_time_seconds"


def build_pipeline(num_trees: int = 20, max_depth: int = 5, seed: int = 42) -> Pipeline:
    indexers = [
        StringIndexer(inputCol=c, outputCol=f"{c}_idx", handleInvalid="keep")
        for c in CATEGORICAL
    ]
    encoders = [
        OneHotEncoder(inputCol=f"{c}_idx", outputCol=f"{c}_vec") for c in CATEGORICAL
    ]
    assembler = VectorAssembler(
        inputCols=[f"{c}_vec" for c in CATEGORICAL] + list(NUMERIC),
        outputCol="features",
        handleInvalid="keep",
    )
    rf = RandomForestRegressor(
        featuresCol="features",
        labelCol=LABEL,
        numTrees=num_trees,
        maxDepth=max_depth,
        seed=seed,
    )
    return Pipeline(stages=[*indexers, *encoders, assembler, rf])


def train(
    features: DataFrame,
    model_path: str | None = None,
    min_rows: int = MIN_TRAINING_ROWS,
) -> PipelineModel | None:
    """Fit the pipeline; None when below the reference's 100-row gate
    (response_time_prediction.py:94)."""
    if features.limit(min_rows).count() < min_rows:
        return None
    model = build_pipeline().fit(features)
    if model_path:
        model.write().overwrite().save(model_path)
    return model


def load(model_path: str) -> PipelineModel:
    return PipelineModel.load(model_path)


def predict(model: PipelineModel, features: DataFrame) -> DataFrame:
    """Score a feature frame -> the response_time_predictions shape
    (reference :194-203). ``prediction_timestamp`` is stamped by the
    warehouse writer."""
    return model.transform(features).select(
        "endpoint",
        "request_method",
        F.col("prediction").alias("predicted_time"),
        F.col(LABEL).alias("actual_time"),
    )


def rmse(predictions: DataFrame) -> float:
    """U7: RegressionEvaluator RMSE on (actual, predicted)
    (reference :217-223)."""
    ev = RegressionEvaluator(
        labelCol="actual_time", predictionCol="predicted_time", metricName="rmse"
    )
    return float(ev.evaluate(predictions))
