"""Aggregation operators (SURVEY.md §2.4).

All are stock hash aggregations: Spark plans them as partial (map-side)
+ final (post-shuffle) HashAggregate, so at 100 TB the shuffle moves only
one row per (key, partition) — the canonical scalable shape. No driver-side
collection anywhere.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from nginx_analytics_spark.functions.rounding import half_up


def global_count(df: DataFrame, alias: str = "n_rows") -> DataFrame:
    """A3: COUNT(*) as a one-row frame (reference README.md:35).

    Parquet count(*) is answered from footer row-counts when the
    aggregate-pushdown rule applies — no data scan.
    """
    return df.agg(F.count(F.lit(1)).alias(alias))


def key_stats(
    df: DataFrame,
    key: str | Column,
    value: str | Column,
    round_to: int | None = 6,
) -> DataFrame:
    """A1: per-key request count + mean of a measure.

    Reference: detect_anomalies' per-IP batch stats
    (predictions/anomaly_detection.py:25-29) —
    groupBy(remote_addr).agg(count(*) request_count, avg(rt) avg_request_time).
    ``round_to`` exists for oracle comparability of float means; pass None
    for raw doubles in production.
    """
    mean = F.avg(value)
    if round_to is not None:
        mean = half_up(mean, round_to)
    return df.groupBy(key).agg(
        F.count(F.lit(1)).alias("request_count"),
        mean.alias("avg_request_time"),
    )


def hourly_reagg(
    df: DataFrame,
    key: str,
    ts: str,
    as_of: str,
    lookback_days: int = 7,
    round_to: int | None = 6,
) -> DataFrame:
    """A2: two-level re-aggregation — the anomaly history profile.

    Reference (predictions/anomaly_detection.py:36-49, SQL pushed to
    Postgres): inner GROUP BY (key, hour-truncated ts) -> COUNT(*);
    outer GROUP BY key -> AVG + STDDEV of the hourly counts, over a
    trailing window. ``NOW()`` is parameterized as ``as_of`` for
    determinism (SURVEY.md §7 hard-point (a)). STDDEV is sample stddev
    in both Postgres and Spark (stddev = stddev_samp); single-bucket keys
    yield NULL stddev — preserved, the z-score rule branches on it.

    Scale note: the plan has two exchanges — hash(key, hour_bucket) for the
    inner level, hash(key) for the outer (the finer distribution does not
    satisfy the coarser one, so no shuffle reuse). The inner level already
    collapses the fact volume to one row per (key, hour), so the second
    exchange moves #keys x #hours rows — negligible at any scale. The
    trailing-window filter is a partition-pruning predicate when the fact
    table is date-partitioned.
    """
    lower = F.lit(as_of).cast("timestamp") - F.expr(f"INTERVAL {lookback_days} DAYS")
    hourly = (
        df.filter((F.col(ts) > lower) & (F.col(ts) <= F.lit(as_of).cast("timestamp")))
        .groupBy(F.col(key), F.date_trunc("hour", F.col(ts)).alias("hour_bucket"))
        .agg(F.count(F.lit(1)).alias("request_count"))
    )
    avg_c, std_c = F.avg("request_count"), F.stddev("request_count")
    if round_to is not None:
        avg_c, std_c = half_up(avg_c, round_to), half_up(std_c, round_to)
    return hourly.groupBy(key).agg(
        avg_c.alias("avg_requests"),
        std_c.alias("stddev_requests"),
    )


def distinct_counts(df: DataFrame, group: str, key: str) -> DataFrame:
    """Exact per-group COUNT(DISTINCT key) — the unique-visitors query
    implied by the reference's data model (SURVEY.md §2.4 note).

    Spark plans distinct-agg as a two-stage expand/aggregate; exact but
    shuffle-heavy at scale — prefer :func:`approx_distinct_counts` at
    100 TB unless exactness is required.
    """
    return df.groupBy(group).agg(
        F.count_distinct(F.col(key)).alias("distinct_keys"),
        F.count(F.lit(1)).alias("n_rows"),
    )


def approx_distinct_counts(df: DataFrame, group: str, key: str, rsd: float = 0.05) -> DataFrame:
    """HyperLogLog++ distinct estimate — the 100 TB-scale path: one pass,
    constant memory per group, no expand."""
    return df.groupBy(group).agg(
        F.approx_count_distinct(key, rsd).alias("approx_distinct_keys"),
        F.count(F.lit(1)).alias("n_rows"),
    )


PCTS = (0.50, 0.95, 0.99)


def percentiles(
    df: DataFrame,
    group: str,
    value: str,
    probs: tuple[float, ...] = PCTS,
    round_to: int | None = 6,
) -> DataFrame:
    """Exact grouped percentiles (linear interpolation — the latency
    p50/p95/p99 staple of log analytics the reference never exposes).

    Scale note: exact percentile buffers each group's values (OOM on a
    100 TB hot key) — it is the *verification* operator. The serving path
    at scale is :func:`approx_percentiles`. Interpolation matches ANSI
    ``quantile_cont`` (DuckDB oracle-parity verified).
    """
    aggs = []
    for p in probs:
        c = F.percentile(F.col(value), F.lit(p))
        if round_to is not None:
            c = half_up(c, round_to)
        aggs.append(c.alias(f"p{int(p * 100)}"))
    return df.groupBy(group).agg(*aggs, F.count(F.lit(1)).alias("n_rows"))


def approx_percentiles(
    df: DataFrame,
    group: str,
    value: str,
    probs: tuple[float, ...] = PCTS,
    accuracy: int = 10_000,
) -> DataFrame:
    """KLL/Greenwald-Khanna sketch percentiles — the 100 TB path: one pass,
    mergeable partial sketches (map-side combine), bounded memory per group
    (rank error <= 1/accuracy). Estimate, so rows-only checked; the test
    suite bounds it against the exact operator."""
    approx = F.percentile_approx(F.col(value), F.array(*[F.lit(p) for p in probs]), accuracy)
    return df.groupBy(group).agg(
        *[approx[i].alias(f"p{int(p * 100)}") for i, p in enumerate(probs)],
        F.count(F.lit(1)).alias("n_rows"),
    )
