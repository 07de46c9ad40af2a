"""Fixture adapter: the synthetic ``events`` table viewed as an nginx log.

The driver fixtures (FIXTURES.md §C) map ``events`` onto the reference's
log stream: ts≈timestamp, user_id≈remote_addr, event_type≈endpoint,
value≈request_time_seconds, props≈JSON payload. Two adapters:

  * :func:`events_parsed` — the declarative analog of parse_enrich used by
    the oracle-checked queries (pure column expressions, SQL-expressible).
  * :func:`events_as_nginx_jsonl` — a deterministic synthesis of REAL
    38-field nginx JSON events from fixture rows, so the smoke path and
    streaming tests exercise the actual from_json -> enrich chain
    (reference ingestor/main.py:66-81) end-to-end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from nginx_analytics_spark.operators.parse import endpoint_expr
from nginx_analytics_spark.schema import EVENT_PROPS_SCHEMA

# The event_type scrubbed by the fixture analog of the UA filter (P4).
SCRUBBED_EVENT_TYPE = "error"


def events_parsed(events: DataFrame) -> DataFrame:
    """parse_enrich analog over the events fixture (P2,P4,P6,P7,P8).

    Columns: event_id, ts, user_id, event_type, value, prop_k (from the
    JSON props payload), request_uri (synth), endpoint (regex 2nd segment).
    """
    uri = F.concat(F.lit("/api/"), F.col("event_type"), F.lit("/u"), F.col("user_id"))
    return (
        events.filter(F.col("event_type") != SCRUBBED_EVENT_TYPE)
        .withColumn("prop_k", F.from_json("props", EVENT_PROPS_SCHEMA)["k"])
        .withColumn("request_uri", uri)
        .withColumn("endpoint", endpoint_expr(uri))
        .withColumn("value_seconds", F.col("value").cast("double"))
        .drop("props")
    )


EVENTS_PARSED_SQL = f"""
SELECT event_id,
       CAST(ts AS TIMESTAMP) AS ts,
       user_id,
       event_type,
       value,
       CAST(json_extract(props, '$.k') AS BIGINT) AS prop_k,
       '/api/' || event_type || '/u' || user_id AS request_uri,
       regexp_extract('/api/' || event_type || '/u' || user_id,
                      '^/[^/]+/([^/]+)', 1) AS endpoint,
       CAST(value AS DOUBLE) AS value_seconds
FROM events
WHERE event_type <> '{SCRUBBED_EVENT_TYPE}'
"""


def events_as_nginx_jsonl(events: DataFrame) -> DataFrame:
    """Deterministically synthesize the reference's 38-field wire format.

    Returns a single-column frame ``value: string`` of nginx JSON events —
    the same shape the Kafka value stream has — so the real
    parse_enrich chain can be driven by fixture data. Includes the edge
    rows the operators branch on (FIXTURES.md §A): promtail user agents
    (every row where k % 19 == 0), non-numeric request_time (k % 23 == 0),
    shallow URIs with no 2nd path segment (k % 29 == 0).
    """
    k = F.coalesce(F.from_json("props", EVENT_PROPS_SCHEMA)["k"], F.lit(0))
    ua = F.when(k % 19 == 0, F.lit("promtail/2.2.1")).otherwise(
        F.concat(F.lit("agent/"), (k % 7).cast("string"))
    )
    request_time = F.when(k % 23 == 0, F.lit("not-a-number")).otherwise(
        F.col("value").cast("string")
    )
    uri = F.when(k % 29 == 0, F.lit("/healthz")).otherwise(
        F.concat(F.lit("/api/"), F.col("event_type"), F.lit("/u"), F.col("user_id"))
    )
    status = (F.lit(200) + (k % 5) * 100).cast("string")
    payload = F.struct(
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("time_iso8601"),
        F.concat(F.lit("10.0."), (F.col("user_id") % 256), F.lit(".7")).alias(
            "remote_addr"
        ),
        F.concat(F.lit("GET "), uri, F.lit(" HTTP/1.1")).alias("request"),
        uri.alias("request_uri"),
        status.alias("status"),
        request_time.alias("request_time"),
        ua.alias("http_user_agent"),
        F.lit("GET").alias("request_method"),
        F.col("event_id").cast("string").alias("request_id"),
        (k * 10 + 100).cast("string").alias("request_length"),
        F.lit("US").alias("geoip2_country_code"),
    )
    return events.select(F.to_json(payload).alias("value"))
