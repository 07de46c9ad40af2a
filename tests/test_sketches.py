"""X60/X61: HLL sketch rollup mergeability + incremental-stats algebra."""

from __future__ import annotations

from pyspark.sql import functions as F

from nginx_analytics_spark.operators import aggregates
from nginx_analytics_spark.sources import load_table

SF = "/root/testdata/sf0.001"
LO, HI = "2024-01-10 00:00:00", "2024-01-17 00:00:00"


def _range(ev):
    return ev.filter(
        (F.col("ts") >= F.lit(LO).cast("timestamp"))
        & (F.col("ts") < F.lit(HI).cast("timestamp"))
    )


def test_sketch_union_equals_direct_sketch(spark):
    """HLL register maxima are order- and grouping-insensitive: the union
    of 7 daily sketches must estimate EXACTLY what one sketch built over
    the raw 7-day range estimates."""
    ev = load_table(spark, SF, "events")
    daily = aggregates.daily_sketches(ev, "ts", "user_id")
    via_rollup = aggregates.sketch_range_estimate(daily, LO, HI).first()[0]
    direct = (
        _range(ev)
        .agg(F.hll_sketch_estimate(
            F.hll_sketch_agg(F.col("user_id"), F.lit(12))).alias("e"))
        .first()[0]
    )
    assert via_rollup == direct


def test_sketch_estimate_accuracy(spark):
    ev = load_table(spark, SF, "events")
    daily = aggregates.daily_sketches(ev, "ts", "user_id")
    est = aggregates.sketch_range_estimate(daily, LO, HI).first()[0]
    exact = _range(ev).select("user_id").distinct().count()
    assert abs(est - exact) <= max(1, 0.05 * exact), (est, exact)


def test_merge_partials_equals_full_recompute(spark):
    ev = load_table(spark, SF, "events")
    cut = F.lit("2024-01-15 00:00:00").cast("timestamp")
    old = aggregates.key_stats_partial(
        ev.filter(F.col("ts") < cut), "user_id", "value"
    )
    delta = aggregates.key_stats_partial(
        ev.filter(F.col("ts") >= cut), "user_id", "value"
    )
    merged = {
        r.user_id: (r.n, r.nv, r.s)
        for r in aggregates.merge_key_stats(old, delta, "user_id").collect()
    }
    full = {
        r.user_id: (r.n, r.nv, r.s)
        for r in aggregates.key_stats_partial(ev, "user_id", "value").collect()
    }
    assert set(merged) == set(full)
    for k, (n, nv, s) in full.items():
        mn, mnv, ms = merged[k]
        assert (mn, mnv) == (n, nv), k
        assert abs(ms - s) <= 1e-9 * max(1.0, abs(s)), k


def test_merge_handles_disjoint_keys(spark):
    """A key present only in the delta (new user) or only in history must
    survive the full-outer merge with its own partials."""
    from pyspark.sql import Row

    a = spark.createDataFrame([Row(k="old", n=2, nv=2, s=4.0)])
    b = spark.createDataFrame([Row(k="new", n=3, nv=3, s=9.0)])
    out = {
        r.k: (r.n, r.nv, r.s)
        for r in aggregates.merge_key_stats(a, b, "k").collect()
    }
    assert out == {"old": (2, 2, 4.0), "new": (3, 3, 9.0)}


def test_partials_null_value_semantics(spark):
    """AVG's denominator is the non-null count: a key with NULL
    measurements must finalize to sum/count(value), and an all-NULL key
    to NULL — not 0 (the code-review regression this pins)."""
    from pyspark.sql import Row

    rows = [
        Row(k="mixed", v=10.0), Row(k="mixed", v=None),
        Row(k="allnull", v=None), Row(k="allnull", v=None),
    ]
    df = spark.createDataFrame(rows, schema="k string, v double")
    out = {
        r.k: (r.request_count, r.avg_request_time)
        for r in aggregates.finalize_key_stats(
            aggregates.key_stats_partial(df, "k", "v")
        ).collect()
    }
    assert out["mixed"] == (2, 10.0)
    assert out["allnull"] == (2, None)
    direct = {
        r.k: (r.request_count, r.avg_request_time)
        for r in aggregates.key_stats(df, "k", "v").collect()
    }
    assert out == direct


def test_finalize_matches_key_stats(spark):
    ev = load_table(spark, SF, "events")
    via_partial = aggregates.finalize_key_stats(
        aggregates.key_stats_partial(ev, "user_id", "value")
    )
    direct = aggregates.key_stats(ev, "user_id", "value")
    a = {(r.user_id, r.request_count, r.avg_request_time)
         for r in via_partial.collect()}
    b = {(r.user_id, r.request_count, r.avg_request_time)
         for r in direct.collect()}
    assert a == b
