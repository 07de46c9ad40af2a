"""Stream-stream joins — the hardest stateful operator Spark offers
(X42; the reference has nothing like it, SURVEY.md §2.6).

A watermarked inner join of two event streams with a TIME-INTERVAL
condition: each side buffers rows in state only until the other side's
watermark passes the interval bound, so state is bounded by
(watermark delay + interval width) × arrival rate — the structurally
safe formulation of "purchases within an hour of a click". Without the
interval condition Spark would have to keep both sides' state forever.

Emission semantics (inner join, append mode): a pair emits in the
micro-batch where both sides are present; in an availableNow replay all
data shares one batch, so the final sink holds EXACTLY the batch-join
result restricted by the interval — which is what the SQL oracle
computes. (Outer stream-stream joins additionally emit NULL rows on
watermark expiry; inner is deterministic for replay comparison.)

Scale: state is hash-partitioned on the join key like any stateful op;
the interval bound is what keeps per-key state O(window), independent
of stream length.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    interval: str = "1 hour",
    delay: str = "1 minute",
) -> DataFrame:
    """Watermarked stream-stream inner join: right rows within
    [left_ts, left_ts + interval] of a matching-key left row."""
    lw = left.withWatermark(left_ts, delay)
    rw = right.withWatermark(right_ts, delay)
    cond = (
        (lw[key] == rw[key])
        & (rw[right_ts] >= lw[left_ts])
        & (rw[right_ts] <= lw[left_ts] + F.expr(f"INTERVAL {interval}"))
    )
    return lw.join(rw, cond).select(
        lw[key].alias(key),
        lw[left_ts].alias(left_ts),
        rw[right_ts].alias(right_ts),
    )


def run_click_purchase_join_available_now(
    spark: SparkSession,
    sf_dir: str,
    interval: str = "1 hour",
) -> DataFrame:
    """Drive the click→purchase interval join over the events fixture as
    two REAL streams (separate file-source instances of the same fixture
    — a genuine stream-stream join, not a stream-static one) to
    completion, returning the emitted pairs."""
    import uuid

    from nginx_analytics_spark.sources.readers import events_stream

    clicks = (
        events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "click")
        .select("user_id", F.col("ts").alias("click_ts"))
    )
    purchases = (
        events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "purchase")
        .select("user_id", F.col("ts").alias("purchase_ts"))
    )
    joined = interval_join(
        clicks, purchases, "user_id", "click_ts", "purchase_ts", interval
    )
    sink = "ssjoin_" + uuid.uuid4().hex[:12]
    q = (
        joined.writeStream.format("memory")
        .queryName(sink)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(sink)


def run_click_purchase_left_join_available_now(
    spark: SparkSession,
    sf_dir: str,
    interval: str = "1 hour",
    delay: str = "1 minute",
) -> DataFrame:
    """LEFT-OUTER stream-stream interval join: matched pairs emit when
    matched; a click with no purchase in its window emits a NULL row
    only once the JOIN watermark — min of both streams' per-source
    watermarks — strictly passes click_ts + interval (state for later
    clicks is retained, not emitted; verified empirically, the same
    append-emission contract derivation as the windowed twins). The SQL
    oracle replicates that cut with
    ``click_ts + interval < least(max(click_ts), max(purchase_ts)) - delay``.
    """
    import uuid

    from nginx_analytics_spark.sources.readers import events_stream

    clicks = (
        events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "click")
        .select("user_id", F.col("ts").alias("click_ts"))
        .withWatermark("click_ts", delay)
    )
    purchases = (
        events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "purchase")
        .select("user_id", F.col("ts").alias("purchase_ts"))
        .withWatermark("purchase_ts", delay)
    )
    cond = (
        (clicks["user_id"] == purchases["user_id"])
        & (purchases["purchase_ts"] >= clicks["click_ts"])
        & (
            purchases["purchase_ts"]
            <= clicks["click_ts"] + F.expr(f"INTERVAL {interval}")
        )
    )
    joined = clicks.join(purchases, cond, "left_outer").select(
        clicks["user_id"].alias("user_id"), "click_ts", "purchase_ts"
    )
    sink = "ssleft_" + uuid.uuid4().hex[:12]
    q = (
        joined.writeStream.format("memory")
        .queryName(sink)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(sink)
