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


def test_quality_weighted_sample_properties(spark):
    """X83: keep-probability tracks the weight (monotone in quality),
    the normalized variant hits its target size, lower targets nest
    inside higher ones, and membership is partition-invariant."""
    from nginx_analytics_spark.operators.text import quality_score

    docs = load_table(spark, SF, "documents")
    q = quality_score(docs).select("doc_id", "quality")
    n = q.count()

    out = sampling.quality_weighted_sample(
        q, "quality", "doc_id", target_frac=0.5, beta=2.0, salt=9
    )
    kept = out.collect()
    # target rate: expected 0.5 * n, binomial-ish tolerance
    assert abs(len(kept) / n - 0.5) < 0.08, len(kept) / n

    # monotone preference: keep-rate in the top quality quartile must
    # beat the bottom quartile (beta=2 sharpens the contrast)
    qs = sorted(r.quality for r in q.collect())
    lo_cut, hi_cut = qs[n // 4], qs[3 * n // 4]
    kept_ids = {r.doc_id for r in kept}
    lo = [r for r in q.collect() if r.quality <= lo_cut]
    hi = [r for r in q.collect() if r.quality >= hi_cut]
    lo_rate = sum(r.doc_id in kept_ids for r in lo) / len(lo)
    hi_rate = sum(r.doc_id in kept_ids for r in hi) / len(hi)
    assert hi_rate > lo_rate + 0.2, (lo_rate, hi_rate)

    # nesting: fixed hash + rate monotone in target_frac
    kept25 = {
        r.doc_id
        for r in sampling.quality_weighted_sample(
            q, "quality", "doc_id", target_frac=0.25, beta=2.0, salt=9
        ).collect()
    }
    assert kept25 <= kept_ids
    assert len(kept25) < len(kept_ids)

    # partition-invariance (the property RNG samplers lack)
    kept_rep = {
        r.doc_id
        for r in sampling.quality_weighted_sample(
            q.repartition(13), "quality", "doc_id",
            target_frac=0.5, beta=2.0, salt=9,
        ).collect()
    }
    assert kept_rep == kept_ids


def test_quality_weighted_sample_unnormalized_rate_is_weight(spark):
    """target_frac=None: the weight IS the keep probability — empirical
    keep-rate per weight band tracks the band's weight, single pass."""
    rows = [(i, w) for i, w in enumerate([0.1] * 400 + [0.9] * 400)]
    df = spark.createDataFrame(rows, ["k", "w"])
    kept = sampling.quality_weighted_sample(df, "w", "k").collect()
    lo = sum(1 for r in kept if r.w == 0.1) / 400
    hi = sum(1 for r in kept if r.w == 0.9) / 400
    assert abs(lo - 0.1) < 0.06, lo
    assert abs(hi - 0.9) < 0.06, hi
    # rate column carries the audit value: exactly the weight here
    assert {r.rate for r in kept} == {0.1, 0.9}


def test_quality_weighted_sample_degenerate_weights_fail_loudly(spark):
    """r8 ADVICE: with target_frac set, an all-zero / all-null / NaN
    weight column over a NON-empty frame must raise at execution time
    instead of computing NULL rates and silently emptying the handoff
    corpus. An empty input frame stays a legal empty output."""
    import pytest

    for weights in ([0.0, 0.0, 0.0], [None, None, None], [float("nan"), 0.5, 0.5]):
        df = spark.createDataFrame(
            [(i, w) for i, w in enumerate(weights)], "k long, w double"
        )
        out = sampling.quality_weighted_sample(df, "w", "k", target_frac=0.5)
        with pytest.raises(Exception, match="degenerate quality scorer"):
            out.collect()

    # empty frame: nothing evaluated, nothing raised, empty output
    empty = spark.createDataFrame([], "k long, w double")
    assert (
        sampling.quality_weighted_sample(empty, "w", "k", target_frac=0.5).count()
        == 0
    )

    # the guard costs the happy path nothing observable: a healthy
    # frame still hits its target rate
    ok = spark.createDataFrame([(i, 0.5) for i in range(400)], ["k", "w"])
    n = sampling.quality_weighted_sample(ok, "w", "k", target_frac=0.5).count()
    assert abs(n / 400 - 0.5) < 0.08, n


def test_weighted_sample_wor_aes_properties(spark):
    """X93 (Efraimidis–Spirakis A-ES): exactly min(k, |group|) rows,
    k-prefix consistency (same salt: the k-sample is a strict prefix
    of the k+m-sample), NULL/non-positive weights excluded, and the
    statistical contract — for k=1, P(select i) = w_i / Σw under A-ES,
    so over many salted re-draws the heavy row's selection frequency
    must track its weight share."""
    docs = load_table(spark, SF, "documents").select(
        "source", "doc_id", "n_chars"
    )
    got = sampling.weighted_sample_wor(
        docs, "doc_id", "n_chars", 5, group_col="source"
    )
    per = {r["source"]: r["n"] for r in got.groupBy("source").agg(
        F.count(F.lit(1)).alias("n")).collect()}
    sizes = {r["source"]: r["n"] for r in docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n")).collect()}
    assert per == {s: min(5, n) for s, n in sizes.items()}
    # prefix consistency
    k5 = {(r.source, r.doc_id) for r in got.collect()}
    k9 = {(r.source, r.doc_id) for r in sampling.weighted_sample_wor(
        docs, "doc_id", "n_chars", 9, group_col="source").collect()}
    assert k5 < k9
    # zero/NULL weights carry no mass
    wdf = spark.createDataFrame(
        [(1, 10.0), (2, 0.0), (3, None), (4, -2.0), (5, 1.0)],
        "k long, w double",
    )
    picked = sampling.weighted_sample_wor(wdf, "k", "w", 10)
    assert {r.k for r in picked.collect()} == {1, 5}
    # statistical gate: two rows, weights 9:1 — over 1000 salted k=1
    # draws the heavy row's frequency approaches 0.9 (A-ES exact
    # marginal for k=1); the portable hash is uniform enough that a
    # wide tolerance is a real gate, not a tautology. All salts in ONE
    # job: the salted multiplier is a column expression of the same
    # arithmetic weighted_sample_wor builds per call.
    KNUTH, M32 = sampling.KNUTH, sampling.M32
    two = spark.createDataFrame([(11, 9.0), (23, 1.0)], "k long, w double")
    salts = spark.range(1000).withColumnRenamed("id", "salt")
    mult = F.pmod(F.lit(KNUTH) * (F.lit(2) * F.col("salt") + 1), F.lit(M32))
    h = F.pmod(F.col("k") * mult + F.col("salt"), F.lit(M32))
    aes = F.log((h.cast("double") + F.lit(0.5)) / F.lit(float(M32))) / F.col(
        "w"
    )
    winners = (
        two.crossJoin(salts)
        .withColumn("aes", aes)
        .groupBy("salt")
        .agg(F.max_by("k", "aes").alias("k"))
    )
    freq_heavy = winners.filter("k = 11").count() / 1000
    assert 0.8 < freq_heavy < 0.97, freq_heavy
