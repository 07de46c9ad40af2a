"""ML feature projections (SURVEY.md §2.8 training_features /
predict_features; reference predictions/response_time_prediction.py:68-91
and :161-174).

The reference pushed the training projection to Postgres as SQL and
re-implemented a (buggy — SURVEY.md §2.2 note ²) DataFrame twin for the
predict path. Here both are ONE projection over the enriched fact frame;
the intent (parenthesized conjunction), not the bug, is implemented.

Determinism: the reference's ``LIMIT 100000`` is unordered; here the cap is
ordered by a unique key so results are stable and oracle-comparable
(SURVEY.md §7 hard-point (a)). At scale an ORDER BY ... LIMIT k plans as
TakeOrderedAndProject — per-partition top-k then a k-row merge, no global
sort.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

TRAINING_CAP = 100_000  # reference response_time_prediction.py:86
MIN_TRAINING_ROWS = 100  # reference response_time_prediction.py:94


def normalize_country(country: Column | str) -> Column:
    """P10: '' or NULL country -> 'UNKNOWN'
    (reference response_time_prediction.py:78, :168)."""
    c = F.col(country) if isinstance(country, str) else country
    return F.when(c.isNull() | (c == ""), F.lit("UNKNOWN")).otherwise(c)


def feature_projection(
    df: DataFrame,
    *,
    endpoint: str = "endpoint",
    method: str = "request_method",
    request_length: str = "request_length",
    ts: str = "timestamp",
    country: str = "geoip2_country_code",
    status: str = "status_code",
    label: str = "request_time_seconds",
    keep: tuple[str, ...] = (),
) -> DataFrame:
    """P16+P10+P17+P20: the model's input columns with validity filters.

    Columns mirror reference response_time_prediction.py:73-85: endpoint,
    request_method, request_length (float), hour_of_day, country
    (''->UNKNOWN), status_code, request_time_seconds; filtered to
    non-null positive labels and non-empty endpoints. ``keep`` passes
    extra columns through (e.g. an ordering key).
    """
    return (
        df.filter(
            F.col(label).isNotNull()
            & (F.col(label) > 0)
            & (F.col(endpoint) != "")
        )
        .select(
            F.col(endpoint).alias("endpoint"),
            F.col(method).alias("request_method"),
            F.col(request_length).cast("float").alias("request_length"),
            # bigint to match the ANSI EXTRACT(HOUR ...) type in the oracle
            F.hour(F.col(ts)).cast("bigint").alias("hour_of_day"),
            normalize_country(country).alias("country"),
            F.col(status).alias("status_code"),
            F.col(label).alias("request_time_seconds"),
            *[F.col(c) for c in keep],
        )
    )


def training_features(
    df: DataFrame, order_key: str, cap: int = TRAINING_CAP, **cols
) -> DataFrame:
    """Training set: feature projection + deterministic ordered cap
    (replaces the reference's unordered LIMIT 100000,
    response_time_prediction.py:86)."""
    projected = feature_projection(df, keep=(order_key,), **cols)
    return projected.orderBy(order_key).limit(cap).drop(order_key)
