"""X70: data-quality expectation checks — rule semantics + the
single-pass plan property."""

from __future__ import annotations

import io
import re
from contextlib import redirect_stdout

from pyspark.sql import Row

from nginx_analytics_spark.operators import expectations as ex


def _report(df):
    return {r.rule: (r.violations, r.passed) for r in df.collect()}


def test_rule_semantics_on_edge_rows(spark):
    df = spark.createDataFrame(
        [
            Row(k=1, v=5.0),
            Row(k=1, v=None),     # dup key + NULL value
            Row(k=2, v=-1.0),     # below range
            Row(k=3, v=150.0),    # above range
            Row(k=None, v=50.0),  # NULL key
        ],
        "k int, v double",
    )
    got = _report(
        ex.check(
            df,
            {
                "k_unique": ex.unique("k"),
                "k_not_null": ex.not_null("k"),
                "v_in_0_100": ex.within("v", 0.0, 100.0),
            },
        )
    )
    # struct-wrapped distinct counts NULL as a key VALUE (r5 ADVICE):
    # 5 rows - 4 distinct keys {1, 2, 3, NULL} = 1 — only the true
    # duplicate; the null-key row is not_null's finding, not unique's
    assert got["k_unique"] == (1, False)
    assert got["k_not_null"] == (1, False)
    # NULL v is NOT a range violation (within is null-safe by contract)
    assert got["v_in_0_100"] == (2, False)


def test_unique_multi_column_null_semantics(spark):
    """r5 ADVICE: a composite key containing NULLs must count DUPLICATE
    null-keys, not every null-containing row — (1, NULL) twice is one
    violation; a lone (2, NULL) is none."""
    df = spark.createDataFrame(
        [Row(a=1, b=None), Row(a=1, b=None), Row(a=2, b=None), Row(a=1, b=1)],
        "a int, b int",
    )
    got = _report(ex.check(df, {"ab_unique": ex.unique("a", "b")}))
    assert got["ab_unique"] == (1, False)


def test_reference_rule_counts_orphans(spark):
    child = spark.createDataFrame(
        [Row(fk=1), Row(fk=2), Row(fk=99), Row(fk=None)], "fk int"
    )
    parent = spark.createDataFrame([Row(pk=1), Row(pk=2), Row(pk=3)], "pk int")
    got = _report(ex.check_reference(child, "fk", parent, "pk", "fk_in_parent"))
    # NULL fk is excluded (null-freedom is a separate rule); 99 is the orphan
    assert got["fk_in_parent"] == (1, False)


def test_all_green_suite(spark):
    df = spark.createDataFrame([Row(k=1), Row(k=2)], "k int")
    got = _report(ex.check(df, {"k_unique": ex.unique("k"),
                                "k_not_null": ex.not_null("k")}))
    assert got == {"k_unique": (0, True), "k_not_null": (0, True)}


def test_single_pass_plan(spark):
    """The scale contract: N single-table rules share ONE scan and one
    aggregate — the plan over a parquet table must contain exactly one
    parquet scan however many rules are checked."""
    from nginx_analytics_spark.sources import load_table

    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    checked = ex.check(
        ev,
        {
            "a": ex.unique("event_id"),
            "b": ex.not_null("user_id"),
            "c": ex.within("value", 0.0, 100.0),
            "d": ex.not_null("event_type"),
        },
    )
    buf = io.StringIO()
    with redirect_stdout(buf):
        checked.explain("formatted")
    plan = buf.getvalue()
    assert len(re.findall(r"Scan parquet +\(\d+\)", plan)) == 1
