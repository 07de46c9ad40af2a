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


# -- mergeable sketches & incremental maintenance (X60/X61) ----------------


def daily_sketches(
    df: DataFrame, ts: str, key: str, lg_k: int = 12
) -> DataFrame:
    """Per-day HLL sketches of a key (DataSketches HllSketch as a binary
    column) — the materialization that makes 100 TB distinct-count
    queries O(days) instead of O(rows): store one sketch per (day), then
    answer ANY date-range distinct-count by unioning the covered
    sketches. Register maxima are order-insensitive, so the union over
    daily sketches equals the sketch of the raw range exactly
    (asserted in tests/test_sketches.py)."""
    return df.groupBy(F.date_trunc("day", F.col(ts)).alias("day")).agg(
        F.hll_sketch_agg(F.col(key), F.lit(lg_k)).alias("sketch"),
        F.count(F.lit(1)).alias("n_rows"),
    )


def sketch_range_estimate(
    sketches: DataFrame, day_lo: str, day_hi: str
) -> DataFrame:
    """Union the daily sketches covering [day_lo, day_hi) and estimate —
    a scan of #days pre-aggregated rows, no raw-data access."""
    return (
        sketches.filter(
            (F.col("day") >= F.lit(day_lo).cast("timestamp"))
            & (F.col("day") < F.lit(day_hi).cast("timestamp"))
        )
        .agg(F.hll_union_agg("sketch").alias("u"))
        .select(F.hll_sketch_estimate("u").alias("distinct_estimate"))
    )


def key_stats_partial(df: DataFrame, key: str, value: str) -> DataFrame:
    """The MERGEABLE form of key_stats (A1): (row count, non-null value
    count, sum) partials instead of a finalized average — the
    representation an incremental pipeline stores, because averages
    don't merge and rounded averages merge wrong. ``nv`` is tracked
    separately from ``n`` because AVG's denominator is the NON-NULL
    count — dividing by count(*) would skew the average of any key with
    NULL measurements (and an all-NULL key must finalize to NULL, not
    0)."""
    return df.groupBy(key).agg(
        F.count(F.lit(1)).alias("n"),
        F.count(F.col(value)).alias("nv"),
        F.sum(F.col(value)).alias("s"),
    )


def merge_key_stats(a: DataFrame, b: DataFrame, key: str) -> DataFrame:
    """Algebraic merge of two partial frames (full outer join + coalesced
    addition) — incremental view maintenance for per-key stats: merging
    yesterday's partials with today's delta equals recomputing over the
    union (property-tested). At 100 TB the delta side is a day's data and
    the stored partials are one row per key — the merge never rescans
    history."""
    bb = b.select(
        F.col(key),
        F.col("n").alias("_bn"),
        F.col("nv").alias("_bnv"),
        F.col("s").alias("_bs"),
    )
    return (
        a.join(bb, on=key, how="full_outer")
        .select(
            F.col(key),
            (
                F.coalesce(F.col("n"), F.lit(0))
                + F.coalesce(F.col("_bn"), F.lit(0))
            ).alias("n"),
            (
                F.coalesce(F.col("nv"), F.lit(0))
                + F.coalesce(F.col("_bnv"), F.lit(0))
            ).alias("nv"),
            (
                F.coalesce(F.col("s"), F.lit(0.0))
                + F.coalesce(F.col("_bs"), F.lit(0.0))
            ).alias("s"),
        )
    )


def finalize_key_stats(partials: DataFrame, round_to: int = 6) -> DataFrame:
    """Partials -> the key_stats surface: request_count = count(*),
    average over the non-null denominator (NULL when no values — nullif
    also keeps the division ANSI-safe)."""
    return partials.select(
        *[c for c in partials.columns if c not in ("n", "nv", "s")],
        F.col("n").alias("request_count"),
        half_up(
            F.col("s") / F.nullif(F.col("nv"), F.lit(0)), round_to
        ).alias("avg_request_time"),
    )


# --------------------------------------------------------------------------
# X71: mergeable KLL quantile rollup — completing the sketch-rollup
# trilogy (X60 HLL: distinct; X68 CMS: frequency; this: quantiles).
# --------------------------------------------------------------------------


def kll_daily_sketches(
    df: DataFrame, ts: str, value: str, k: int = 2048
) -> DataFrame:
    """One KLL quantile sketch of ``value`` per day (DataSketches KLL as
    a binary column, native ``kll_sketch_agg_double``). The same
    store-small / answer-any-range contract as the HLL rollup: a
    trailing-window latency-percentile query merges #days sketch rows
    instead of rescanning raw events. ``k`` bounds both sketch size and
    rank error (~1.7% two-sided at k=200; 2048 gives ~0.2%)."""
    return df.groupBy(F.date_trunc("day", F.col(ts)).alias("day")).agg(
        F.kll_sketch_agg_double(F.col(value), F.lit(k)).alias("sketch"),
        F.count(F.col(value)).alias("n_values"),
    )


def kll_range_percentiles(
    sketches: DataFrame,
    day_lo: str,
    day_hi: str,
    quantiles: tuple[float, ...] = (0.5, 0.95, 0.99),
) -> DataFrame:
    """Merge the daily KLL sketches covering [day_lo, day_hi) and read
    the requested quantiles — one row, O(days) input, zero raw access.
    KLL merge is lossless-in-guarantee: the merged sketch carries the
    same rank-error bound as a sketch built directly over the range
    (property-tested against exact percentiles)."""
    merged = (
        sketches.filter(
            (F.col("day") >= F.lit(day_lo).cast("timestamp"))
            & (F.col("day") < F.lit(day_hi).cast("timestamp"))
        )
        .agg(F.kll_merge_agg_double("sketch").alias("u"))
    )
    return merged.select(
        F.kll_sketch_get_n_double("u").alias("n_values"),
        *[
            F.kll_sketch_get_quantile_double(F.col("u"), F.lit(q)).alias(
                f"p{int(q * 100)}"
            )
            for q in quantiles
        ],
    )


# --------------------------------------------------------------------------
# X72: Theta sketch distinct SET ALGEBRA — the question HLL cannot
# answer: |A ∩ B| and |A \ B| over mergeable sketches.
# --------------------------------------------------------------------------


def theta_group_sketches(df: DataFrame, group: str, key: str) -> DataFrame:
    """One Theta sketch of distinct ``key`` per ``group`` value — the
    mergeable representation that supports union AND intersection AND
    difference (HLL unions only). Store per (segment, day) at scale;
    any segment-overlap question then answers from sketch rows. Only
    the sketch is computed — an exact distinct alongside it would pay
    the full two-phase distinct expand the sketch exists to avoid
    (tests compare against exact set ops they compute themselves)."""
    return df.groupBy(group).agg(
        F.theta_sketch_agg(F.col(key)).alias("sketch"),
    )


def theta_overlap(
    sketches: DataFrame, group: str, group_a: str, group_b: str
) -> DataFrame:
    """Distinct-key set algebra between two groups' sketches:
    |A|, |B|, |A ∩ B|, |A \\ B|, |B \\ A|, |A ∪ B| — one row, computed
    entirely in the compressed domain (broadcast-sized inputs: two
    sketch blobs)."""
    a = sketches.filter(F.col(group) == group_a).select(
        F.col("sketch").alias("sa")
    )
    b = sketches.filter(F.col(group) == group_b).select(
        F.col("sketch").alias("sb")
    )
    both = a.crossJoin(F.broadcast(b))
    est = F.theta_sketch_estimate
    return both.select(
        F.lit(group_a).alias("group_a"),
        F.lit(group_b).alias("group_b"),
        est(F.col("sa")).alias("n_a"),
        est(F.col("sb")).alias("n_b"),
        est(F.theta_intersection(F.col("sa"), F.col("sb"))).alias("n_inter"),
        est(F.theta_difference(F.col("sa"), F.col("sb"))).alias("n_a_only"),
        est(F.theta_difference(F.col("sb"), F.col("sa"))).alias("n_b_only"),
        est(F.theta_union(F.col("sa"), F.col("sb"))).alias("n_union"),
    )
