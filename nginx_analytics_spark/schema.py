"""Canonical schemas.

The reference declares the 38-field all-string nginx access-log wire schema
three times (reference ingestor/main.py:7-45, predictions/
anomaly_detection.py:130-168, predictions/response_time_prediction.py:22-60
— copy-pasted). Here it is declared ONCE and shared by every job
(SURVEY.md §7 "parse once").
"""

from __future__ import annotations

from pyspark.sql import types as T

# Wire-format field order as emitted by nginx log_format escape=json and
# validated by the producer (reference producer/main.py:68-71: an event must
# carry request, remote_addr, status, request_time).
NGINX_LOG_FIELDS: tuple[str, ...] = (
    "msec",
    "connection",
    "connection_requests",
    "pid",
    "request_id",
    "request_length",
    "remote_addr",
    "remote_user",
    "remote_port",
    "time_local",
    "time_iso8601",
    "request",
    "request_uri",
    "args",
    "status",
    "body_bytes_sent",
    "bytes_sent",
    "http_referer",
    "http_user_agent",
    "http_x_forwarded_for",
    "http_host",
    "server_name",
    "request_time",
    "upstream",
    "upstream_connect_time",
    "upstream_header_time",
    "upstream_response_time",
    "upstream_response_length",
    "upstream_cache_status",
    "ssl_protocol",
    "ssl_cipher",
    "scheme",
    "request_method",
    "server_protocol",
    "pipe",
    "gzip_ratio",
    "http_cf_ray",
    "geoip2_country_code",
)

# All strings on the wire (reference ingestor/main.py:7-45).
NGINX_LOG_SCHEMA = T.StructType(
    [T.StructField(f, T.StringType(), True) for f in NGINX_LOG_FIELDS]
)

# Producer-side required keys (reference producer/main.py:68-71).
REQUIRED_EVENT_KEYS: tuple[str, ...] = (
    "request",
    "remote_addr",
    "status",
    "request_time",
)

# Typed columns derived at parse time (reference ingestor/main.py:69-81).
ENRICHED_COLUMNS = {
    "timestamp": T.TimestampType(),
    "request_time_seconds": T.DoubleType(),
    "status_code": T.IntegerType(),
    "endpoint": T.StringType(),
}

# Result-table schemas (reference postgres/init.sql:49-77). The SERIAL id is
# intentionally dropped: no consumer reads it (SURVEY.md §1.4).
ANOMALIES_SCHEMA = T.StructType(
    [
        T.StructField("timestamp", T.TimestampType()),
        T.StructField("remote_addr", T.StringType()),
        T.StructField("request_uri", T.StringType()),
        T.StructField("anomaly_score", T.DoubleType()),
        T.StructField("is_anomaly", T.BooleanType()),
        T.StructField("anomaly_reason", T.StringType()),
        T.StructField("detection_time", T.TimestampType()),
    ]
)

RESPONSE_TIME_PREDICTIONS_SCHEMA = T.StructType(
    [
        T.StructField("endpoint", T.StringType()),
        T.StructField("request_method", T.StringType()),
        T.StructField("predicted_time", T.DoubleType()),
        T.StructField("actual_time", T.DoubleType()),
        T.StructField("prediction_timestamp", T.TimestampType()),
    ]
)

TRAFFIC_FORECASTS_SCHEMA = T.StructType(
    [
        T.StructField("forecast_timestamp", T.TimestampType()),
        T.StructField("endpoint", T.StringType()),
        T.StructField("predicted_requests", T.IntegerType()),
        T.StructField("prediction_timestamp", T.TimestampType()),
    ]
)

# Synthetic fixture: events.props is a JSON object payload (FIXTURES.md §B);
# the harness parses it through the same from_json path the nginx wire
# schema uses.
EVENT_PROPS_SCHEMA = T.StructType([T.StructField("k", T.LongType(), True)])
