"""Kafka source contract (S3/T6, VERDICT r1 item 5): the image has no
spark-sql-kafka package or broker, so these tests pin the option contract
and prove the builder actually reaches Spark's kafka data-source lookup —
the parts that CAN break without a broker.
"""

from __future__ import annotations

import pytest

from nginx_analytics_spark.streaming.ingest import kafka_source_options, kafka_stream


def test_kafka_source_options_contract():
    opts = kafka_source_options(
        "broker-1:9092,broker-2:9092", "nginx-logs", starting_offsets="earliest"
    )
    assert opts == {
        "kafka.bootstrap.servers": "broker-1:9092,broker-2:9092",
        "subscribe": "nginx-logs",
        "startingOffsets": "earliest",
        "failOnDataLoss": "false",
    }


def test_kafka_source_default_offset_policy_is_latest():
    # reference ingestor/main.py:61 — a restarted job resumes from the
    # checkpoint; a FRESH job starts at the log head, not a full replay.
    assert kafka_source_options("b:9092", "t")["startingOffsets"] == "latest"


def test_kafka_stream_reaches_kafka_datasource_lookup(spark):
    """Without the kafka package, load() must fail at data-source lookup —
    mentioning kafka — proving format/options wiring executes (the failure
    mode for a typo'd format string would be a different error)."""
    with pytest.raises(Exception, match="(?i)kafka"):
        kafka_stream(spark, "localhost:9092", "nginx-logs")
