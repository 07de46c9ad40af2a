"""parse_enrich — the canonical ingest transformation (operators P1-P8).

Reference semantics (reference ingestor/main.py:66-81), declared once:

  P1  CAST(value AS STRING)            (Kafka value -> JSON text)
  P2  from_json(value, 38-field all-string schema)   PERMISSIVE
  P3  select("data.*")                 (struct flatten)
  P4  filter(http_user_agent != 'promtail/2.2.1')    — SQL 3VL: NULL UA rows
      are dropped too; that is the reference behavior and is kept.
  P5  timestamp            = to_timestamp(time_iso8601)
  P6  request_time_seconds = CAST(request_time AS DOUBLE)   (bad -> NULL)
  P7  status_code          = CAST(status AS INT)            (bad -> NULL)
  P8  endpoint             = regexp_extract(request_uri, '^/[^/]+/([^/]+)', 1)
                             (2nd path segment; no match -> '')

Everything is built-in column expressions — the whole transform stays inside
WholeStageCodegen; at 100 TB this is a pure map stage with no shuffle, and
the UA filter + column pruning push into the source scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from nginx_analytics_spark.schema import NGINX_LOG_SCHEMA, REQUIRED_EVENT_KEYS

# The agent the reference scrubs (its own log shipper).
SCRUBBED_USER_AGENT = "promtail/2.2.1"

# 2nd path segment of the request URI (reference ingestor/main.py:80).
ENDPOINT_PATTERN = r"^/[^/]+/([^/]+)"


def endpoint_expr(uri: Column | str) -> Column:
    """P8: endpoint = 2nd URI path segment ('' when the URI is shallower)."""
    return F.regexp_extract(uri, ENDPOINT_PATTERN, 1)


def decode_json_events(raw: DataFrame, value_col: str = "value") -> DataFrame:
    """P1-P3: binary/string JSON payload -> flattened 38 string columns."""
    return (
        raw.select(F.col(value_col).cast(T.StringType()).alias("value"))
        .select(F.from_json("value", NGINX_LOG_SCHEMA).alias("data"))
        .select("data.*")
    )


def producer_key_filter(df: DataFrame) -> Column:
    """P22: the producer's coarse validation — an event must carry
    request, remote_addr, status, request_time (reference
    producer/main.py:68-74). Expressed as a filter condition so it also
    drops the all-NULL rows PERMISSIVE mode yields for malformed JSON."""
    cond = F.lit(True)
    for key in REQUIRED_EVENT_KEYS:
        cond = cond & F.col(key).isNotNull()
    return cond


def enrich(df: DataFrame) -> DataFrame:
    """P4-P8 over a flattened 38-string-column frame."""
    # try_* variants pin the reference's PERMISSIVE semantics (malformed
    # input -> NULL, Spark 3.4 non-ANSI default) regardless of the host
    # session's spark.sql.ansi.enabled — Spark 4 defaults it to true, where
    # a plain CAST on 'not-a-number' would abort the job.
    return (
        df.filter(F.col("http_user_agent") != SCRUBBED_USER_AGENT)
        .withColumn("timestamp", F.try_to_timestamp(F.col("time_iso8601")))
        .withColumn(
            "request_time_seconds", F.col("request_time").try_cast(T.DoubleType())
        )
        .withColumn("status_code", F.col("status").try_cast(T.IntegerType()))
        .withColumn("endpoint", endpoint_expr("request_uri"))
    )


def parse_enrich(raw: DataFrame, value_col: str = "value") -> DataFrame:
    """The full canonical chain: JSON payload frame -> enriched fact frame.

    The reference re-declares this in three jobs (ingestor/main.py:66-81,
    predictions/anomaly_detection.py:171-176, predictions/
    response_time_prediction.py:238-250); here every job composes this one
    function (SURVEY.md §7 "parse once").
    """
    return enrich(decode_json_events(raw, value_col))


def parse_enrich_validated(raw: DataFrame, value_col: str = "value") -> DataFrame:
    """parse_enrich + the producer's required-key validation (P22)."""
    decoded = decode_json_events(raw, value_col)
    return enrich(decoded.filter(producer_key_filter(decoded)))
