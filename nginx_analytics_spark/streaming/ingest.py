"""Streaming ingest job — the reference's ingestor re-expressed.

Reference (ingestor/main.py): Kafka -> CAST value -> from_json(38 cols) ->
UA scrub -> typed derivations -> foreachBatch JDBC append to Postgres,
with THREE separate actions per batch (isEmpty, write, count — each
recomputing the parse, SURVEY.md §3.1). Here:

  * source is pluggable: any streaming DataFrame with a string ``value``
    column (file-stream of JSONL in tests — S3/Kafka in production carry
    the same contract);
  * the batch function runs ONE computation: persist -> write -> count
    from the persisted frame -> unpersist;
  * sink is the partitioned Parquet warehouse (date partition pruning at
    read time replaces the btree indexes).

Streaming config parity (SURVEY.md §2.6): checkpointing (T5), pluggable
trigger (T3), append output mode (T4), awaitTermination (T7). Offset
policy (T6) belongs to the Kafka source options when that source is used.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from nginx_analytics_spark.operators.parse import parse_enrich_validated
from nginx_analytics_spark.schema import NGINX_LOG_SCHEMA
from nginx_analytics_spark.sources.warehouse import Warehouse


def jsonl_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-backed stand-in for the Kafka value stream: each line one JSON
    event, exposed as a single ``value: string`` column (the Kafka value
    contract, reference ingestor/main.py:66). ``max_files_per_trigger``
    bounds each micro-batch to N files (deterministic batch boundaries in
    tests; backpressure in production file-fed deployments)."""
    reader = spark.readStream
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.text(path)


def kafka_source_options(
    bootstrap_servers: str, topic: str, starting_offsets: str = "latest"
) -> dict[str, str]:
    """The Kafka source's option contract (S3/T6; reference
    ingestor/main.py:57-63): subscription, offset policy, and the
    reference's failOnDataLoss=false stance (a retention-expired offset
    must not kill the ingest job). Split out so the contract is unit-
    testable without a broker or the spark-sql-kafka package."""
    return {
        "kafka.bootstrap.servers": bootstrap_servers,
        "subscribe": topic,
        "startingOffsets": starting_offsets,
        "failOnDataLoss": "false",
    }


def kafka_stream(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str,
    starting_offsets: str = "latest",
) -> DataFrame:
    """The production source (reference ingestor/main.py:57-63). Requires
    the spark-sql-kafka package on the classpath; the test image lacks it,
    so tests assert the option contract and that this wiring reaches
    Spark's kafka data-source lookup."""
    reader = spark.readStream.format("kafka")
    for k, v in kafka_source_options(bootstrap_servers, topic, starting_offsets).items():
        reader = reader.option(k, v)
    return reader.load()


def start_ingest(
    raw_stream: DataFrame,
    warehouse: Warehouse,
    checkpoint_dir: str,
    trigger: dict | None = None,
    on_batch: Callable[[int, int], None] | None = None,
    exactly_once: bool = False,
) -> StreamingQuery:
    """parse_enrich the stream and append to raw_logs, one action per batch.

    ``trigger``: kwargs for DataStreamWriter.trigger (e.g.
    ``{"availableNow": True}`` in tests, ``{"processingTime": "1 minute"}``
    for the reference cadence).

    ``exactly_once=True`` routes each batch through the idempotent
    batch-id-directory sink (X73, ``append_raw_logs_exactly_once``): a
    retried micro-batch overwrites its own output instead of appending a
    duplicate copy — the delivery guarantee the plain append sink cannot
    give (retry after a landed-but-uncheckpointed batch duplicates).
    """

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        enriched = parse_enrich_validated(batch_df)
        enriched.persist()
        try:
            if exactly_once:
                warehouse.append_raw_logs_exactly_once(enriched, batch_id)
            else:
                warehouse.append_raw_logs(enriched)
            n = enriched.count()  # served from cache — no recompute
            if on_batch is not None:
                on_batch(batch_id, n)
        finally:
            enriched.unpersist()

    writer = (
        raw_stream.writeStream.foreachBatch(write_batch)
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
    )
    if trigger:
        writer = writer.trigger(**trigger)
    return writer.start()
