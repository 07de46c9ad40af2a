"""Behavioral analytics — funnel + cohort retention (SURVEY §2.9 class).

The ordered-event analyses every log/event store grows into; the reference
stops at per-key counts. Both are expressed as conditional aggregations +
broadcast joins — no window-function pass over the raw stream, no
per-user state:

  * :func:`conversion_funnel` — strictly-ordered stage progression
    (stage k+1 must happen AFTER the user's stage-k time). Each stage is
    one hash aggregation (min of a conditional timestamp) joined back;
    fact scans stay narrow, per-stage frames are one row per user.
  * :func:`cohort_retention` — users bucketed by first-seen period
    (cohort); retention = distinct users per (cohort, period offset).
    Two hash aggregations and one join.

Scale: the per-user frames are deliberately NOT broadcast-hinted — an
explicit hint is honored regardless of size and never demoted, which
would OOM the driver on a non-dimension-sized user set. Left to the
cost model, Spark broadcasts them while they fit
(autoBroadcastJoinThreshold) and AQE falls back to a shuffle join on
user_id beyond that; either way the shape is narrow aggs + one join per
stage, never a self-join on the fact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def conversion_funnel(
    events: DataFrame,
    stages: list[str],
    user: str = "user_id",
    etype: str = "event_type",
    ts: str = "ts",
) -> DataFrame:
    """Strictly-ordered funnel: stage i counts users whose first
    ``stages[i]`` event happened after their first qualifying
    ``stages[i-1]`` event (and so on back to stage 0).

    Returns (stage_idx, stage, n_users) with stage_idx 1-based —
    n_users is non-increasing by construction.
    """
    reached: DataFrame | None = None  # (user, stage_ts) of the previous stage
    out_rows = []
    for i, stage in enumerate(stages):
        cond = F.col(etype) == stage
        if reached is None:
            cur = events.filter(cond).groupBy(user).agg(
                F.min(ts).alias("stage_ts")
            )
        else:
            cur = (
                events.filter(cond)
                .join(reached, user)
                .filter(F.col(ts) > F.col("stage_ts"))
                .groupBy(user)
                .agg(F.min(ts).alias("next_ts"))
                .withColumnRenamed("next_ts", "stage_ts")
            )
        # Each stage frame feeds TWO consumers (its count row and the next
        # stage's join input): without an eager cut, stage i re-executes
        # all i-1 prior filter+agg+join passes — O(stages²) fact scans —
        # and relies on Catalyst exchange reuse. cur is one row per user,
        # so the materialization is cheap; eager=True per the module-wide
        # rule on frames reused across joins (see dedup/similarity).
        cur = cur.localCheckpoint(eager=True)
        out_rows.append(
            cur.agg(
                F.lit(i + 1).cast("bigint").alias("stage_idx"),
                F.lit(stage).alias("stage"),
                F.count(F.lit(1)).alias("n_users"),
            )
        )
        reached = cur.select(user, "stage_ts")
    out = out_rows[0]
    for frame in out_rows[1:]:
        out = out.unionByName(frame)
    return out


def cohort_retention(
    events: DataFrame,
    user: str = "user_id",
    ts: str = "ts",
    period_days: int = 7,
) -> DataFrame:
    """Cohort retention: users bucketed by the week of their first
    activity (Monday-start, ANSI date_trunc semantics — identical in the
    oracle engine); retention = distinct users active ``offset`` periods
    after their cohort week starts. The offset-0 row is the cohort size.

    Returns (cohort_start date, period_offset, n_users).
    """
    day = F.to_date(F.col(ts))
    firsts = events.groupBy(user).agg(
        F.to_date(F.date_trunc("week", F.min(day))).alias("cohort_start")
    )
    activity = events.select(F.col(user), day.alias("day")).distinct()
    return (
        activity.join(firsts, user)
        .select(
            user,
            "cohort_start",
            F.floor(
                F.datediff(F.col("day"), F.col("cohort_start")) / period_days
            ).cast("bigint").alias("period_offset"),
        )
        .groupBy("cohort_start", "period_offset")
        .agg(F.count_distinct(F.col(user)).alias("n_users"))
    )


def sessionize(
    events: DataFrame,
    user: str = "user_id",
    ts: str = "ts",
    tiebreak: str = "event_id",
    gap_seconds: int = 21_600,
) -> DataFrame:
    """Batch sessionization — the gap-based session assignment the
    streaming path gets from ``session_window`` (streaming/windows.py),
    expressed for at-rest data: a new session starts when a user's
    inter-event gap exceeds ``gap_seconds``.

    Classic lag-flag-cumsum, one window pass: flag = (gap > limit) in
    integer MICROSECOND arithmetic (engine-portable — no seconds
    truncation), session_idx = running sum of flags. One hash exchange
    on user + a per-user sort; state is O(1) per row. Skew note: a
    single hyperactive user serializes into one task — cap or salt such
    keys upstream if a user can exceed a partition."""
    from pyspark.sql import Window

    w = Window.partitionBy(user).orderBy(F.col(ts).asc(), F.col(tiebreak).asc())
    # fixture timestamps are TIMESTAMP_NTZ; the engine runs UTC sessions
    # (session.py), so the cast is wall-clock-identity and unix_micros
    # yields the same integer DuckDB's epoch_us(naive ts) does.
    us = F.unix_micros(F.col(ts).cast("timestamp"))
    gap_over = us - F.lag(us).over(w) > gap_seconds * 1_000_000
    flag = F.when(F.coalesce(gap_over, F.lit(True)), 1).otherwise(0)
    idx = F.sum(flag).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return events.withColumn("session_idx", idx.cast("bigint"))


def session_stats(
    events: DataFrame,
    user: str = "user_id",
    ts: str = "ts",
    tiebreak: str = "event_id",
    gap_seconds: int = 21_600,
) -> DataFrame:
    """Per-session rollup over :func:`sessionize`: event count, bounds,
    duration (seconds, portable microsecond arithmetic). The groupBy
    clusters on (user, session_idx) — the same distribution the
    sessionize window produced, so AQE reuses the exchange."""
    s = sessionize(events, user, ts, tiebreak, gap_seconds)
    us = F.unix_micros(F.col(ts).cast("timestamp"))
    dur_us = F.max(us) - F.min(us)
    return s.groupBy(user, "session_idx").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min(ts).alias("session_start"),
        F.max(ts).alias("session_end"),
        (dur_us / 1_000_000.0).alias("duration_sec"),
    )
