"""Deterministic sampling/split operators: the reproducibility properties
that justify hash-based splits over randomSplit."""

from __future__ import annotations

from pyspark.sql import functions as F

from nginx_analytics_spark.operators import sampling
from nginx_analytics_spark.sources import load_table

SF = "/root/testdata/sf0.001"


def test_split_exhaustive_disjoint_and_near_weights(spark):
    ev = load_table(spark, SF, "events")
    out = sampling.dataset_split(ev, "event_id")
    n = ev.count()
    counts = {r.split: r.n for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert set(counts) == {"train", "val", "test"}
    assert sum(counts.values()) == n  # exhaustive + disjoint (one row, one split)
    assert abs(counts["train"] / n - 0.8) < 0.03
    assert abs(counts["val"] / n - 0.1) < 0.02
    assert abs(counts["test"] / n - 0.1) < 0.02


def test_split_independent_of_partitioning(spark):
    """The property randomSplit lacks: membership is a pure function of the
    key — any repartitioning yields the identical assignment."""
    ev = load_table(spark, SF, "events").select("event_id")
    a = {r.event_id: r.split for r in sampling.dataset_split(ev, "event_id").collect()}
    b = {
        r.event_id: r.split
        for r in sampling.dataset_split(ev.repartition(17), "event_id").collect()
    }
    assert a == b


def test_samples_are_nested(spark):
    ev = load_table(spark, SF, "events").select("event_id")
    s10 = {r.event_id for r in sampling.stratified_sample(ev, "event_id", 0.1).collect()}
    s20 = {r.event_id for r in sampling.stratified_sample(ev, "event_id", 0.2).collect()}
    assert s10 <= s20
    assert len(s10) < len(s20)


def test_salt_gives_independent_streams(spark):
    ev = load_table(spark, SF, "events").select("event_id")
    a = {r.event_id for r in sampling.stratified_sample(ev, "event_id", 0.5, salt=1).collect()}
    b = {r.event_id for r in sampling.stratified_sample(ev, "event_id", 0.5, salt=2).collect()}
    n = ev.count()
    overlap = len(a & b) / n
    # independent 50% streams overlap ~25%; same stream would be ~50%
    assert 0.15 < overlap < 0.35, overlap


def test_grouped_split_has_no_leakage(spark):
    ev = load_table(spark, SF, "events")
    out = sampling.dataset_split(ev, "user_id")
    per_user = (
        out.groupBy("user_id")
        .agg(F.count_distinct("split").alias("n_splits"))
        .agg(F.max("n_splits"))
        .first()[0]
    )
    assert per_user == 1  # every user's rows in exactly one split


def test_split_is_narrow_map(spark):
    import io
    from contextlib import redirect_stdout

    ev = load_table(spark, SF, "events")
    buf = io.StringIO()
    with redirect_stdout(buf):
        sampling.dataset_split(ev, "event_id").explain("formatted")
    assert "Exchange" not in buf.getvalue()


def test_per_group_sample_exact_counts_and_prefix(spark):
    from nginx_analytics_spark.operators.sampling import per_group_sample

    rows = [("a", i) for i in range(50)] + [("b", i + 100) for i in range(5)]
    df = spark.createDataFrame(rows, ["g", "k"])
    s10 = per_group_sample(df, "g", "k", 10)
    counts = {r["g"]: r["n"] for r in s10.groupBy("g").agg(F.count("*").alias("n")).collect()}
    assert counts == {"a": 10, "b": 5}  # min(k, group size)
    # prefix consistency: k=10 ⊂ k=20
    k10 = {tuple(r) for r in s10.collect()}
    k20 = {tuple(r) for r in per_group_sample(df, "g", "k", 20).collect()}
    assert k10 <= k20
    # partition-invariance
    k10b = {tuple(r) for r in per_group_sample(df.repartition(7), "g", "k", 10).collect()}
    assert k10 == k10b
