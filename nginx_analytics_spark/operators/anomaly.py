"""Z-score traffic anomaly detection (SURVEY.md §2.8 zscore_anomaly /
anomaly_detail; reference predictions/anomaly_detection.py:17-114).

The reference computes this per micro-batch: current-batch per-IP stats
LEFT JOIN a Postgres-computed 7-day hourly history, hand-rolled z-score
columns, a rule filter, then two joins back to the raw batch to attach
sample requests. Here the history is native Spark over the same fact frame
(one engine, one plan) and the whole detection is one DataFrame DAG.

Scale notes: the history frame is one row per key (small relative to the
fact table) -> broadcast-hint it into both the scoring join (J1) and the
detail joins (J2/J3), so the 100 TB fact scan never shuffles; the only
wide exchange is the per-key aggregation, which is partial-agg'd map-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from nginx_analytics_spark.functions.rounding import half_up
from nginx_analytics_spark.operators.aggregates import key_stats

# Reference thresholds (predictions/anomaly_detection.py:65-68).
Z_THRESHOLD = 3.0
NEW_KEY_COUNT_THRESHOLD = 100


def score_keys(
    batch_stats: DataFrame,
    history: DataFrame,
    key: str,
    z_threshold: float = Z_THRESHOLD,
    new_key_count: int = NEW_KEY_COUNT_THRESHOLD,
    round_to: int | None = 6,
    broadcast_history: bool = True,
) -> DataFrame:
    """J1 + P12-P14 + P9: join per-key batch stats with history stats and
    derive z_score / is_anomaly / anomaly_reason.

    Semantics preserved from the reference (anomaly_detection.py:56-75):
      * LEFT join — keys with no history survive with NULL stats.
      * z_score = (request_count - avg_requests) / stddev_requests; NULL
        when stddev is NULL (single-bucket history) or history missing.
      * is_anomaly = (z IS NOT NULL AND |z| > t)
                     OR (avg_requests IS NULL AND request_count > n) —
        the "new key with heavy traffic" branch.
      * anomaly_reason CASE chain; NULL when not anomalous.

    ``broadcast_history=True`` (default) hints the one-row-per-key history
    into a broadcast join — right when history is small vs the batch.
    Pass ``False`` when both frames descend from a table bucketed on
    ``key`` (warehouse.write_raw_logs_bucketed): the bucket layout already
    co-locates the join, and the plan runs with ZERO Exchange (asserted
    in tests/test_warehouse.py).
    """
    hist = F.broadcast(history) if broadcast_history else history
    joined = batch_stats.join(hist, on=key, how="left")
    # nullif guard: a key whose hourly counts are constant has stddev 0;
    # its z-score is undefined (NULL), not ±inf (Postgres would error here —
    # implement the intent, SURVEY.md §2.2 notes).
    z_raw = (F.col("request_count") - F.col("avg_requests")) / F.nullif(
        F.col("stddev_requests"), F.lit(0.0)
    )
    z = half_up(z_raw, round_to) if round_to is not None else z_raw
    scored = joined.withColumn("z_score", z)
    zc = F.col("z_score")
    is_anom = (zc.isNotNull() & (F.abs(zc) > z_threshold)) | (
        F.col("avg_requests").isNull() & (F.col("request_count") > new_key_count)
    )
    reason = (
        F.when(zc > z_threshold, F.lit("Traffic spike detected"))
        .when(zc < -z_threshold, F.lit("Traffic drop detected"))
        .when(
            F.col("avg_requests").isNull()
            & (F.col("request_count") > new_key_count),
            F.lit("New high-volume source"),
        )
        .otherwise(F.lit(None).cast("string"))
    )
    return scored.withColumn("is_anomaly", is_anom).withColumn(
        "anomaly_reason", reason
    )


def detect(
    batch: DataFrame,
    history: DataFrame,
    key: str,
    value: str,
    z_threshold: float = Z_THRESHOLD,
    new_key_count: int = NEW_KEY_COUNT_THRESHOLD,
) -> DataFrame:
    """Full per-batch detection: A1 stats -> score -> keep anomalies only
    (reference anomaly_detection.py:25-75)."""
    stats = key_stats(batch, key, value)
    scored = score_keys(stats, history, key, z_threshold, new_key_count)
    return scored.filter(F.col("is_anomaly"))


def detail(
    batch: DataFrame,
    anomalies: DataFrame,
    key: str,
    ts: str,
    uri: str,
) -> DataFrame:
    """J2 + J3 + P11 + P21: attach sample requests to anomalous keys.

    Reference (anomaly_detection.py:80-98) does an inner join against the
    pre-aggregated anomaly keys (semantically a semi-join) and then an
    enrich join for the anomaly attributes; because the anomaly frame is
    one row per key, a single broadcast inner join expresses both.
    """
    attrs = anomalies.select(
        key,
        half_up(F.abs(F.col("z_score")), 6).alias("anomaly_score"),
        "is_anomaly",
        "anomaly_reason",
    )
    return batch.join(F.broadcast(attrs), on=key, how="inner").select(
        F.col(ts).alias("timestamp"),
        F.col(key),
        F.col(uri).alias("request_uri"),
        "anomaly_score",
        "is_anomaly",
        "anomaly_reason",
    )
