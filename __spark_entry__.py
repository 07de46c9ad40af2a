"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

The real surface lives in :mod:`nginx_analytics_spark.registry`; this file
only adapts it to the driver contract.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from nginx_analytics_spark import registry
from nginx_analytics_spark.operators.aggregates import key_stats
from nginx_analytics_spark.operators.logview import events_as_nginx_jsonl
from nginx_analytics_spark.operators.parse import parse_enrich_validated
from nginx_analytics_spark.sources import load_table

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship smoke: drive the REAL nginx pipeline end-to-end.

    Synthesizes 38-field nginx JSON events from the sf0.001 fixture,
    runs the canonical parse_enrich chain (P1-P8 + producer validation,
    reference ingestor/main.py:66-81), then the per-IP stats aggregation
    (A1, reference predictions/anomaly_detection.py:25-29).
    """
    events = load_table(spark, SMOKE_SF_DIR, "events")
    raw = events_as_nginx_jsonl(events)
    enriched = parse_enrich_validated(raw)
    return key_stats(enriched, "remote_addr", "request_time_seconds")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return registry.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI-SQL twins (omitted for non-SQL-expressible ops,
    which get the driver's rows-only check)."""
    return registry.oracle_sql()
