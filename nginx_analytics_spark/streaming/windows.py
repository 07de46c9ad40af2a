"""Event-time windowed aggregation (T1/T2) and the streaming anomaly job.

Reference (predictions/anomaly_detection.py:179-191): watermark 1 min ->
tumbling 1-min window -> identity applyInPandas -> foreachBatch(detect).
The identity grouped-map UDF is a pure Arrow round-trip with no semantics
(SURVEY.md §2.7 U1) and is dropped; the grouped-map capability is exercised
by real operators elsewhere (similarity/dedup). The windowing here is a
real windowed aggregation, not a batching device.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from nginx_analytics_spark.operators import anomaly
from nginx_analytics_spark.operators.aggregates import key_stats
from nginx_analytics_spark.sources.warehouse import Warehouse


def windowed_counts(
    stream: DataFrame,
    ts: str = "timestamp",
    delay: str = "1 minute",
    window: str = "1 minute",
    keys: tuple[str, ...] = (),
    slide: str | None = None,
) -> DataFrame:
    """T1+T2+A5: watermarked tumbling (or, with ``slide``, sliding/hopping)
    window counts.

    In append mode a window is emitted only once the watermark
    (max event time - ``delay``) passes its end — late rows beyond the
    delay are dropped from state. State size is bounded by
    (#keys x windows-in-delay x window/slide), independent of stream
    length — the 100 TB/day-safe shape.
    """
    w = (
        F.window(F.col(ts), window, slide)
        if slide
        else F.window(F.col(ts), window)
    )
    grouping = [w.alias("w"), *[F.col(k) for k in keys]]
    return (
        stream.withWatermark(ts, delay)
        .groupBy(*grouping)
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            *[F.col(k) for k in keys],
            "n_events",
        )
    )


def session_counts(
    stream: DataFrame,
    ts: str = "timestamp",
    delay: str = "1 minute",
    gap: str = "12 hours",
    keys: tuple[str, ...] = (),
) -> DataFrame:
    """Gap-based session windows (``F.session_window``): a key's events
    within ``gap`` of each other merge into one session; the session's end
    is last_event + gap. The capability beyond the reference's fixed
    tumbling window (SURVEY.md §2.6 "no session windows").

    Append-mode emission: a session is final (and emitted) once the
    watermark passes its end — no future event can merge into it. State is
    one open session per key, merged incrementally at scale.
    """
    grouping = [
        F.session_window(F.col(ts), gap).alias("w"),
        *[F.col(k) for k in keys],
    ]
    return (
        stream.withWatermark(ts, delay)
        .groupBy(*grouping)
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            *[F.col(k) for k in keys],
            "n_events",
        )
    )


def run_windowed_counts_available_now(
    stream: DataFrame,
    ts: str = "timestamp",
    delay: str = "1 minute",
    window: str = "1 minute",
    keys: tuple[str, ...] = (),
) -> DataFrame:
    """Drive a watermarked windowed count to completion with
    Trigger.AvailableNow and return the emitted (append-mode) result.

    Emission semantics (verified empirically against the batch equivalent):
    after the final no-data micro-batch, append mode has emitted exactly the
    windows with window_end <= max(event_time) - delay; later windows stay
    in state and are withheld — the oracle for this operator replicates
    that predicate in SQL.
    """
    agg = windowed_counts(stream, ts=ts, delay=delay, window=window, keys=keys)
    return _run_append_available_now(agg)


def run_sliding_counts_available_now(
    stream: DataFrame,
    ts: str = "timestamp",
    delay: str = "1 minute",
    window: str = "2 minutes",
    slide: str = "1 minute",
    keys: tuple[str, ...] = (),
) -> DataFrame:
    """Sliding-window variant of :func:`run_windowed_counts_available_now`
    (same append-emission semantics; each event lands in window/slide
    overlapping windows)."""
    agg = windowed_counts(
        stream, ts=ts, delay=delay, window=window, keys=keys, slide=slide
    )
    return _run_append_available_now(agg)


def run_session_counts_available_now(
    stream: DataFrame,
    ts: str = "timestamp",
    delay: str = "1 minute",
    gap: str = "12 hours",
    keys: tuple[str, ...] = (),
) -> DataFrame:
    """Drive :func:`session_counts` to completion; emitted sessions are
    those whose end (last event + gap) the final watermark passed."""
    agg = session_counts(stream, ts=ts, delay=delay, gap=gap, keys=keys)
    return _run_append_available_now(agg)


def dedup_within_watermark(
    stream: DataFrame,
    keys: list[str],
    ts: str = "timestamp",
    delay: str = "1 minute",
) -> DataFrame:
    """Streaming exact dedup (``dropDuplicatesWithinWatermark``): keep the
    first row per key; duplicates arriving within the watermark delay are
    dropped ACROSS micro-batches (the at-least-once-upstream dedup the
    reference's producer implies, SURVEY §2.5 — here as a real streaming
    operator, not a batch afterthought).

    State story at 100 TB/day: one entry per key with an expiration at
    first_seen + delay — bounded by keys-per-delay-window, not stream
    length; a plain streaming ``dropDuplicates`` would grow state forever.
    """
    return stream.withWatermark(ts, delay).dropDuplicatesWithinWatermark(keys)


def _run_append_available_now(agg: DataFrame) -> DataFrame:
    import uuid

    sink = "windowed_" + uuid.uuid4().hex[:12]
    q = (
        agg.writeStream.format("memory")
        .queryName(sink)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return agg.sparkSession.table(sink)


def start_anomaly_job(
    enriched_stream: DataFrame,
    warehouse: Warehouse,
    checkpoint_dir: str,
    as_of_of_batch=None,
    z_threshold: float = anomaly.Z_THRESHOLD,
    new_key_count: int = anomaly.NEW_KEY_COUNT_THRESHOLD,
    trigger: dict | None = None,
) -> StreamingQuery:
    """The streaming z-score job (reference anomaly_detection.py:17-114):
    per micro-batch, score current per-IP stats against the warehouse's
    7-day hourly history and append flagged keys + sample requests.

    The history query runs natively on the partitioned raw_logs table
    (replacing the reference's Postgres round-trip) and is broadcast into
    the scoring join, so the batch side never shuffles.
    """
    from nginx_analytics_spark.operators.aggregates import hourly_reagg

    def detect_batch(batch_df: DataFrame, batch_id: int) -> None:
        # persist BEFORE the emptiness probe: isEmpty() on the raw frame is
        # its own source scan, doubling numInputRows per batch (caught by
        # the BatchMetricsListener test) — probing the persisted frame fills
        # the cache instead, so the source is read exactly once.
        batch_df.persist()
        try:
            if batch_df.isEmpty():
                return
            as_of = (
                as_of_of_batch(batch_df)
                if as_of_of_batch is not None
                else batch_df.agg(F.max("timestamp")).first()[0].isoformat(sep=" ")
            )
            stats = key_stats(batch_df, "remote_addr", "request_time_seconds")
            if warehouse.exists("raw_logs"):
                history = hourly_reagg(
                    warehouse.raw_logs_window(as_of, 7),
                    key="remote_addr",
                    ts="timestamp",
                    as_of=as_of,
                    lookback_days=7,
                )
            else:  # first batch ever: empty history, new-key rule only
                history = stats.select("remote_addr").limit(0).select(
                    "remote_addr",
                    F.lit(None).cast("double").alias("avg_requests"),
                    F.lit(None).cast("double").alias("stddev_requests"),
                )
            scored = anomaly.score_keys(
                stats, history, "remote_addr", z_threshold, new_key_count
            )
            flagged = scored.filter(F.col("is_anomaly"))
            details = anomaly.detail(
                batch_df, flagged, "remote_addr", "timestamp", "request_uri"
            )
            warehouse.append_anomalies(details)
        finally:
            batch_df.unpersist()

    writer = (
        enriched_stream.writeStream.foreachBatch(detect_batch)
        .outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
    )
    if trigger:
        writer = writer.trigger(**trigger)
    return writer.start()
