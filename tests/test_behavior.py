"""Funnel / cohort operators: the ordering semantics the oracle diff
can't isolate (a user must progress strictly forward in time)."""

from __future__ import annotations

from pyspark.sql import functions as F

from nginx_analytics_spark.operators import behavior


def _events(spark, rows):
    df = spark.createDataFrame(rows, "user_id long, event_type string, ts string")
    return df.select("user_id", "event_type", F.col("ts").cast("timestamp").alias("ts"))


def test_funnel_requires_strict_order(spark):
    ev = _events(
        spark,
        [
            # user 1: full ordered funnel
            (1, "view", "2024-01-01 10:00:00"),
            (1, "click", "2024-01-01 10:05:00"),
            (1, "purchase", "2024-01-01 10:10:00"),
            # user 2: click BEFORE first view -> stalls at stage 1
            (2, "click", "2024-01-01 09:00:00"),
            (2, "view", "2024-01-01 10:00:00"),
            # user 3: view+click, purchase before click -> stalls at stage 2
            (3, "view", "2024-01-01 08:00:00"),
            (3, "purchase", "2024-01-01 08:30:00"),
            (3, "click", "2024-01-01 09:00:00"),
            # user 4: never viewed -> not in funnel at all
            (4, "purchase", "2024-01-01 12:00:00"),
        ],
    )
    out = {
        r.stage: r.n_users
        for r in behavior.conversion_funnel(ev, ["view", "click", "purchase"]).collect()
    }
    assert out == {"view": 3, "click": 2, "purchase": 1}


def test_funnel_counts_non_increasing_on_fixture(spark):
    from nginx_analytics_spark.sources import load_table

    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    rows = sorted(
        behavior.conversion_funnel(ev, ["view", "click", "purchase"]).collect(),
        key=lambda r: r.stage_idx,
    )
    counts = [r.n_users for r in rows]
    assert counts == sorted(counts, reverse=True)
    assert counts[0] > 0


def test_cohort_offset_zero_is_cohort_size(spark):
    ev = _events(
        spark,
        [
            (1, "view", "2024-01-01 10:00:00"),  # Monday -> cohort 2024-01-01
            (1, "view", "2024-01-09 10:00:00"),  # week offset 1
            (2, "view", "2024-01-02 10:00:00"),  # same cohort week
            (3, "view", "2024-01-10 10:00:00"),  # cohort 2024-01-08
        ],
    )
    out = {
        (str(r.cohort_start), r.period_offset): r.n_users
        for r in behavior.cohort_retention(ev).collect()
    }
    assert out == {
        ("2024-01-01", 0): 2,
        ("2024-01-01", 1): 1,
        ("2024-01-08", 0): 1,
    }
