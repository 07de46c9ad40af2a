"""Temporal join operators: boundary and tolerance semantics the oracle
diff can't isolate, plus the no-nested-loop plan claim."""

from __future__ import annotations

import io
from contextlib import redirect_stdout

from pyspark.sql import functions as F

from nginx_analytics_spark.operators import temporal


def _df(spark, rows, schema):
    return spark.createDataFrame(rows, schema)


def test_asof_inclusive_boundary_and_carry(spark):
    left = _df(
        spark,
        [(1, 10, "e1"), (1, 15, "e2"), (1, 25, "e3"), (2, 5, "e4")],
        "k long, ts long, name string",
    ).select("k", F.timestamp_seconds("ts").alias("ts"), "name")
    right = _df(
        spark,
        [(1, 10, 100.0), (1, 20, 200.0), (2, 50, 900.0)],
        "k long, ts long, value double",
    ).select("k", F.timestamp_seconds("ts").alias("ts"), "value")
    out = {
        r.name: r.asof_value
        for r in temporal.asof_join(left, right, key="k", payload=("value",)).collect()
    }
    assert out == {
        "e1": 100.0,  # equal timestamp matches (inclusive)
        "e2": 100.0,  # between right rows -> carries the earlier
        "e3": 200.0,
        "e4": None,  # no right row at or before
    }


def test_asof_null_payload_is_the_match_not_a_stale_carry(spark):
    """ASOF semantics: the LATEST right row wins even when its payload is
    NULL — a per-column ignorenulls carry would leak the older value."""
    left = _df(spark, [(1, 20, "e1")], "k long, ts long, name string").select(
        "k", F.timestamp_seconds("ts").alias("ts"), "name"
    )
    right = _df(
        spark, [(1, 10, 5.0), (1, 15, None)], "k long, ts long, value double"
    ).select("k", F.timestamp_seconds("ts").alias("ts"), "value")
    out = temporal.asof_join(left, right, key="k", payload=("value",)).collect()
    assert out[0].asof_value is None  # matched ts=15 whose value IS NULL


def test_asof_null_keys_never_match(spark):
    """SQL join semantics: a NULL key matches nothing — NULL-key left rows
    get NULL payloads and NULL-key right rows are invisible, exactly like
    the oracle's `l.k = r.k` equi-condition (3VL-false on NULLs)."""
    left = _df(
        spark,
        [(None, 20, "null-key"), (1, 20, "real-key")],
        "k long, ts long, name string",
    ).select("k", F.timestamp_seconds("ts").alias("ts"), "name")
    right = _df(
        spark,
        [(None, 10, 666.0), (1, 10, 100.0)],
        "k long, ts long, value double",
    ).select("k", F.timestamp_seconds("ts").alias("ts"), "value")
    out = {
        r.name: r.asof_value
        for r in temporal.asof_join(left, right, key="k", payload=("value",)).collect()
    }
    assert out == {"null-key": None, "real-key": 100.0}


def test_asof_tolerance_expires_matches(spark):
    left = _df(spark, [(1, 1000, "a"), (1, 5000, "b")], "k long, ts long, name string")
    left = left.select("k", F.timestamp_seconds("ts").alias("ts"), "name")
    right = _df(spark, [(1, 900, 7.0)], "k long, ts long, value double")
    right = right.select("k", F.timestamp_seconds("ts").alias("ts"), "value")
    out = {
        r.name: r.asof_value
        for r in temporal.asof_join(
            left, right, key="k", payload=("value",), tolerance="10 minutes"
        ).collect()
    }
    assert out == {"a": 7.0, "b": None}  # 4100s later > 600s tolerance


def test_asof_payload_names_need_no_ddl_quoting(spark):
    """Payload column names with spaces must survive the struct-carry DDL
    (backquoted field names — review-found regression risk)."""
    left = _df(spark, [(1, 20)], "k long, ts long").select(
        "k", F.timestamp_seconds("ts").alias("ts")
    )
    right = _df(spark, [(1, 10, 7.0)], "k long, ts long, v double").select(
        "k",
        F.timestamp_seconds("ts").alias("ts"),
        F.col("v").alias("purchase value"),
    )
    out = temporal.asof_join(left, right, key="k", payload=("purchase value",))
    assert out.collect()[0]["asof_purchase value"] == 7.0


def test_binned_range_join_half_open_and_bin_spanning(spark):
    events = _df(
        spark, [(1, 100), (1, 4000), (1, 7199), (1, 7200)], "k long, ts long"
    ).select("k", F.timestamp_seconds("ts").alias("ts"))
    # one interval [100, 7200) spanning 3 one-hour bins
    iv = _df(spark, [(1, 100, 7200, 9)], "k long, s long, e long, wid long").select(
        "k",
        F.timestamp_seconds("s").alias("s"),
        F.timestamp_seconds("e").alias("e"),
        "wid",
    )
    out = temporal.binned_range_join(
        events, iv, key="k", ts="ts", start="s", end="e", bin_minutes=60
    )
    hits = sorted(r.ts.timestamp() for r in out.collect())
    assert hits == [100.0, 4000.0, 7199.0]  # end exclusive; no duplicates


def test_binned_range_join_no_nested_loop(spark):
    """The scale claim: the plan must be an equi-join (hash/merge on key +
    bin), never BroadcastNestedLoop/Cartesian."""
    events = _df(spark, [(1, 100)], "k long, ts long").select(
        "k", F.timestamp_seconds("ts").alias("ts")
    )
    iv = _df(spark, [(1, 0, 200, 1)], "k long, s long, e long, wid long").select(
        "k",
        F.timestamp_seconds("s").alias("s"),
        F.timestamp_seconds("e").alias("e"),
        "wid",
    )
    out = temporal.binned_range_join(
        events, iv, key="k", ts="ts", start="s", end="e", bin_minutes=60
    )
    buf = io.StringIO()
    with redirect_stdout(buf):
        out.explain("formatted")
    p = buf.getvalue()
    assert "BroadcastNestedLoopJoin" not in p
    assert "CartesianProduct" not in p


def test_change_periods_scd2_semantics(spark):
    from nginx_analytics_spark.operators.temporal import change_periods

    rows = [
        # (k, order, tie, attr)
        (1, 10, 1, "A"),
        (1, 20, 2, "A"),   # same attr — same run
        (1, 30, 3, "B"),   # change
        (1, 40, 4, "A"),   # change back — NEW period, not merged with run 1
        (2, 15, 5, "X"),   # second key isolated
    ]
    df = spark.createDataFrame(rows, ["k", "o", "tie", "a"])
    got = sorted(
        (r["k"], r["a"], r["valid_from"], r["valid_to"])
        for r in change_periods(df, "k", "o", "a", tie_break="tie").collect()
    )
    assert got == [
        (1, "A", 10, 30),
        (1, "A", 40, None),
        (1, "B", 30, 40),
        (2, "X", 15, None),
    ]


def test_change_periods_tie_break_deterministic(spark):
    from nginx_analytics_spark.operators.temporal import change_periods

    # two simultaneous observations: tie-break decides run order
    rows = [(1, 10, 1, "A"), (1, 10, 2, "B")]
    df = spark.createDataFrame(rows, ["k", "o", "tie", "a"])
    got = sorted(
        (r["a"], r["valid_to"] is None)
        for r in change_periods(df, "k", "o", "a", tie_break="tie").collect()
    )
    assert got == [("A", False), ("B", True)]
