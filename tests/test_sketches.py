"""X60/X61/X68: sketch rollup mergeability + incremental-stats algebra."""

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


# ---- X68: count-min frequency rollup ------------------------------------


def test_cms_never_undercounts_and_is_tight_here(spark):
    """CMS guarantee: est >= true count for every probed key; and at
    this fixture's load factor (150 users / 4x2048 cells) collisions
    are rare enough that >= 90% of estimates are EXACT (calibrated:
    measured 1.0 at sf0.001; the gate leaves margin for regeneration)."""
    from nginx_analytics_spark.operators import frequency

    ev = load_table(spark, SF, "events")
    sketches = frequency.cms_daily_sketches(ev, "ts", "user_id")
    est = {
        r.user_id: r.est
        for r in frequency.cms_estimate(
            sketches, ev.select("user_id"), "user_id", LO, HI
        ).collect()
    }
    true = {
        r.user_id: r.n
        for r in _range(ev).groupBy("user_id").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert set(est) >= set(true)
    for k, t in true.items():
        assert est[k] >= t, (k, est[k], t)
    exact = sum(1 for k, t in true.items() if est[k] == t)
    assert exact / len(true) >= 0.9
    # keys outside the window estimate >= 0 and only via collisions
    for k, e in est.items():
        if k not in true:
            assert e >= 0


def test_cms_merged_daily_equals_direct_build(spark):
    """Counter union is addition: per-day sketches merged over the range
    must give the SAME estimate as one sketch built from the filtered
    range — the identity that makes the rollup answer arbitrary windows
    without raw rescan."""
    from nginx_analytics_spark.operators import frequency

    ev = load_table(spark, SF, "events")
    probes = ev.select("user_id")
    daily = frequency.cms_daily_sketches(ev, "ts", "user_id")
    via_merge = {
        r.user_id: r.est
        for r in frequency.cms_estimate(daily, probes, "user_id", LO, HI).collect()
    }
    direct_sketch = frequency.cms_daily_sketches(_range(ev), "ts", "user_id")
    direct = {
        r.user_id: r.est
        for r in frequency.cms_estimate(
            direct_sketch, probes, "user_id", LO, HI
        ).collect()
    }
    assert via_merge == direct


def test_cms_unseen_key_hits_empty_cell(spark):
    """A probe key absent from the data estimates 0 when any of its
    depth cells is empty (the coalesce path) — with 150 occupied keys
    in 4x2048 cells an unseen key's min cell is empty."""
    from nginx_analytics_spark.operators import frequency

    ev = load_table(spark, SF, "events")
    sketches = frequency.cms_daily_sketches(ev, "ts", "user_id")
    probes = spark.createDataFrame(
        [("user_never_seen_xyz",)], "user_id string"
    )
    got = frequency.cms_estimate(sketches, probes, "user_id", LO, HI).collect()
    assert len(got) == 1 and got[0].est == 0


# ---- X71: KLL quantile rollup -------------------------------------------


def test_kll_range_percentiles_within_rank_error(spark):
    """Merged daily KLL sketches must return range percentiles whose
    EMPIRICAL RANK is within the sketch's rank-error bound of the
    target (rank, not value, is the KLL contract — same reasoning as
    the percentile_approx test). At k=2048 the two-sided error is
    ~0.2%; the gate allows 1% plus empirical-CDF discreteness."""
    from nginx_analytics_spark.operators import aggregates

    ev = load_table(spark, SF, "events")
    got = aggregates.kll_range_percentiles(
        aggregates.kll_daily_sketches(ev, "ts", "value"), LO, HI
    ).collect()[0]
    vs = sorted(r.value for r in _range(ev).select("value").collect())
    n = len(vs)
    assert got.n_values == n
    for p, target in (("p50", 0.50), ("p95", 0.95), ("p99", 0.99)):
        est = getattr(got, p)
        lo = sum(1 for v in vs if v < est) / n
        hi = sum(1 for v in vs if v <= est) / n
        tol = 0.01 + 2.0 / n
        assert lo - tol <= target <= hi + tol, (p, est, lo, hi)


def test_kll_merged_equals_direct_build(spark):
    """Merging per-day sketches over the range must answer like a
    sketch built directly from the filtered range (same n; quantiles
    within the rank-error bound of each other — KLL merge preserves
    the guarantee, not the byte-identical sketch)."""
    from nginx_analytics_spark.operators import aggregates

    ev = load_table(spark, SF, "events")
    merged = aggregates.kll_range_percentiles(
        aggregates.kll_daily_sketches(ev, "ts", "value"), LO, HI
    ).collect()[0]
    direct = aggregates.kll_range_percentiles(
        aggregates.kll_daily_sketches(_range(ev), "ts", "value"), LO, HI
    ).collect()[0]
    assert merged.n_values == direct.n_values
    vs = sorted(r.value for r in _range(ev).select("value").collect())
    n = len(vs)
    for p in ("p50", "p95", "p99"):
        ra = sum(1 for v in vs if v <= getattr(merged, p)) / n
        rb = sum(1 for v in vs if v <= getattr(direct, p)) / n
        assert abs(ra - rb) <= 0.01 + 2.0 / n, (p, ra, rb)


# ---- X72: Theta sketch set algebra --------------------------------------


def test_theta_overlap_exact_below_retention(spark):
    """With far fewer distinct users than the sketch's 2^12 retention,
    Theta estimates are EXACT: every set-algebra output must equal the
    corresponding exact distinct set operation."""
    from nginx_analytics_spark.operators import aggregates

    ev = load_table(spark, SF, "events")
    got = aggregates.theta_overlap(
        aggregates.theta_group_sketches(ev, "event_type", "user_id"),
        "event_type",
        "purchase",
        "error",
    ).collect()[0]
    users = lambda et: {  # noqa: E731
        r.user_id
        for r in ev.filter(F.col("event_type") == et)
        .select("user_id")
        .distinct()
        .collect()
    }
    a, b = users("purchase"), users("error")
    assert round(got.n_a) == len(a)
    assert round(got.n_b) == len(b)
    assert round(got.n_inter) == len(a & b)
    assert round(got.n_a_only) == len(a - b)
    assert round(got.n_b_only) == len(b - a)
    assert round(got.n_union) == len(a | b)


# ---- X78: incremental dataset card from sketch rollups -------------------


def test_corpus_card_incremental_merged_equals_direct(spark):
    """X78 (r5 verdict item 6): the card computed by merging per-source
    rollup rows must equal the card computed from a single-group rollup
    over the whole corpus — EXACTLY for the additive metrics and the
    below-retention Theta vocabulary; within the estimator's error for
    HLL distinct texts (a DataSketches HLL union can promote the target
    representation, so merged and direct estimates may differ by a
    count or two — the guarantee that merges is the ERROR BOUND, same
    as KLL's rank error, not the byte-identical sketch)."""
    from nginx_analytics_spark.operators import text as t

    docs = load_table(spark, SF, "documents")
    via_groups = {
        r.metric: r.value
        for r in t.corpus_report_incremental(t.corpus_rollups(docs)).collect()
    }
    one_group = {
        r.metric: r.value
        for r in t.corpus_report_incremental(
            t.corpus_rollups(docs.withColumn("source", F.lit("all")))
        ).collect()
    }
    for m in ("n_docs", "total_ws_tokens", "mean_ws_tokens",
              "distinct_tokens"):
        assert via_groups[m] == one_group[m], m
    rel = abs(via_groups["distinct_texts"] - one_group["distinct_texts"])
    assert rel / one_group["distinct_texts"] <= 0.01
    assert abs(
        via_groups["approx_exact_dup_rate"] - one_group["approx_exact_dup_rate"]
    ) <= 0.01
    n = int(via_groups["n_docs"])
    lens = sorted(
        r.n for r in docs.select(
            F.size(F.split("text", " ")).alias("n")).collect()
    )
    for p, q in (("p50_ws_tokens", 0.5), ("p95_ws_tokens", 0.95)):
        for card in (via_groups, one_group):
            rank = sum(1 for v in lens if v <= card[p]) / n
            assert abs(rank - q) <= 0.01 + 2.0 / n, (p, rank)


def test_corpus_card_incremental_accuracy_vs_exact(spark):
    """The sketch card's estimates must track ground truth: additive
    metrics exactly; Theta vocabulary EXACTLY (fixture vocab is far
    below the 2^12 retention); HLL distinct texts within 5%; and the
    sketch dup rate within 5 points of X77's exact exact_dup_rate."""
    from nginx_analytics_spark import registry

    docs = load_table(spark, SF, "documents")
    q = registry.queries()
    card = {r.metric: r.value for r in q["corpus_report_incremental"](spark, SF).collect()}
    exact_card = {r.metric: r.value for r in q["corpus_report"](spark, SF).collect()}
    assert card["n_docs"] == exact_card["n_docs"]
    assert card["total_ws_tokens"] == exact_card["total_ws_tokens"]
    assert card["mean_ws_tokens"] == exact_card["mean_ws_tokens"]
    true_vocab = (
        docs.select(F.explode(F.split("text", " ")).alias("t"))
        .agg(F.count_distinct("t"))
        .first()[0]
    )
    assert card["distinct_tokens"] == float(true_vocab)
    true_texts = docs.agg(F.count_distinct("text")).first()[0]
    assert abs(card["distinct_texts"] - true_texts) / true_texts <= 0.05
    assert abs(card["approx_exact_dup_rate"] - exact_card["exact_dup_rate"]) <= 0.05


def test_corpus_card_at_rest_rollup_roundtrip(spark, tmp_path):
    """X78 operational loop: rollup rows persisted to Parquet, a new
    batch APPENDS its own rollup rows (no grouping discipline needed —
    the card's merge aggregate unions any number of rows per source),
    and the card read from the at-rest table equals the card computed
    over the full corpus in one pass (within the documented estimator
    contracts; additive metrics exactly)."""
    from nginx_analytics_spark.operators import text as t

    docs = load_table(spark, SF, "documents")
    old = docs.filter(F.col("doc_id") % 10 != 0)
    batch = docs.filter(F.col("doc_id") % 10 == 0)
    path = f"{tmp_path}/rollups"
    t.corpus_rollups(old).write.mode("overwrite").parquet(path)
    t.corpus_rollups(batch).write.mode("append").parquet(path)

    at_rest = {
        r.metric: r.value
        for r in t.corpus_report_incremental(
            spark.read.parquet(path)
        ).collect()
    }
    direct = {
        r.metric: r.value
        for r in t.corpus_report_incremental(t.corpus_rollups(docs)).collect()
    }
    for m in ("n_docs", "total_ws_tokens", "mean_ws_tokens",
              "distinct_tokens"):
        assert at_rest[m] == direct[m], m
    assert abs(at_rest["distinct_texts"] - direct["distinct_texts"]) \
        / direct["distinct_texts"] <= 0.01


def test_corpus_rollups_all_null_text_group(spark):
    """r6 ADVICE: explode drops NULL token arrays, so a group whose
    every text is NULL has no vocab-Theta side; the rollup join must be
    LEFT or that group's n_docs/len/HLL row silently vanishes from the
    card. The group survives with vocab_theta NULL, and the card read's
    union aggregates skip the NULL sketch like any NULL agg input."""
    from nginx_analytics_spark.operators import text as t

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma", "a"),
            (2, "alpha beta delta", "a"),
            (3, None, "b"),
            (4, None, "b"),
        ],
        "doc_id long, text string, source string",
    )
    roll = t.corpus_rollups(docs)
    rows = {r.source: r for r in roll.collect()}
    assert set(rows) == {"a", "b"}          # the all-NULL group survives
    assert rows["b"].n_docs == 2
    assert rows["b"].vocab_theta is None

    card = {
        r.metric: r.value
        for r in t.corpus_report_incremental(roll).collect()
    }
    assert card["n_docs"] == 4.0
    assert card["distinct_tokens"] == 4.0   # alpha beta gamma delta
