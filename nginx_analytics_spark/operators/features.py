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

from pyspark.sql import Column, DataFrame, Window
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


def ntile_bins(
    df: DataFrame,
    group: str,
    value: str,
    tiebreak: str,
    n: int = 10,
) -> DataFrame:
    """Exact per-group quantile binning: ``bin`` = NTILE(n) over the
    group ordered by (value, tiebreak) — equal-count buckets for feature
    bucketization / outlier capping. The tiebreak key makes the bucket
    assignment deterministic when values repeat.

    Scale note: NTILE needs each group's full ordering — one hash
    exchange on ``group`` and a per-partition sort, so a single huge
    group serializes into one task. For corpus-scale binning of ONE
    global distribution use :func:`quantile_bucketize` (two-pass approx
    cutpoints, no per-group sort)."""
    w = Window.partitionBy(group).orderBy(
        F.col(value).asc(), F.col(tiebreak).asc()
    )
    return df.withColumn("bin", F.ntile(n).over(w).cast("bigint"))


def quantile_bucketize(
    df: DataFrame,
    value: str,
    n: int = 10,
    accuracy: int = 10_000,
) -> DataFrame:
    """The 100 TB binning path: bucket rows against APPROXIMATE global
    quantile cutpoints instead of sorting any group.

    Pass 1 computes n-1 interior cutpoints with ``percentile_approx``
    (Greenwald-Khanna sketch: mergeable map-side partials, one tiny
    exchange). Pass 2 broadcasts the 1-row cutpoint frame and assigns
    ``bin`` = 1 + #cutpoints <= value — a narrow map, no shuffle of data
    rows, no per-group sort, skew-immune. Buckets are equal-count only up
    to sketch error (1/accuracy); assignment is still deterministic for
    a fixed input because the sketch is deterministic for a fixed
    partitioning of the aggregation (property-tested; not cross-engine
    oracle-matched — sketch internals are engine-specific)."""
    qs = [i / n for i in range(1, n)]
    cuts = df.agg(
        F.percentile_approx(F.col(value), qs, accuracy).alias("_cuts")
    )
    binned = df.crossJoin(F.broadcast(cuts)).withColumn(
        "bin",
        # NULL measurements get a NULL bin (the filter-HOF drops
        # NULL-predicate elements, which would silently classify NULLs
        # into bin 1 otherwise)
        F.when(
            F.col(value).isNotNull(),
            F.lit(1)
            + F.size(F.filter("_cuts", lambda c: c <= F.col(value))),
        ).cast("bigint"),
    )
    return binned.drop("_cuts")
