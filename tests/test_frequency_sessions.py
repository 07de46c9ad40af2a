"""r4 operators: heavy hitters, batch sessionization, pivot/set-op/trend
registrations — semantics the oracle tier can't single out."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Row
from pyspark.sql import functions as F

from nginx_analytics_spark.operators import behavior, frequency
from nginx_analytics_spark.sources import load_table

SF = "/root/testdata/sf0.001"


def test_heavy_hitters_exact_and_partition_invariant(spark):
    """The candidate set depends on partitioning; the RESULT must not —
    and must equal the naive groupBy/HAVING answer exactly."""
    tok = (
        load_table(spark, SF, "documents")
        .select(F.explode(F.split("text", " ")).alias("term"))
    )
    naive = {
        (r.term, r.n)
        for r in tok.groupBy("term")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= 50)
        .collect()
    }
    for parts in (1, 7):
        got = {
            (r.term, r.n)
            for r in frequency.heavy_hitters(
                tok.repartition(parts), "term", 50
            ).collect()
        }
        assert got == naive, parts


def test_heavy_hitters_local_threshold_pigeonhole(spark):
    """A key concentrated in one partition and diluted in others must
    still be found (the per-partition accumulate-across-batches
    contract)."""
    rows = [Row(k="hot")] * 40 + [Row(k=f"cold{i}") for i in range(60)]
    df = spark.createDataFrame(rows).repartition(4)
    got = frequency.heavy_hitters(df, "k", 40).collect()
    assert [(r.k, r.n) for r in got] == [("hot", 40)]


def test_heavy_hitters_degenerate_guard_falls_back(spark):
    """When the candidate superset would exceed the broadcast bound (or
    the threshold admits every key), the operator must take the plain
    groupBy/HAVING plan — never broadcast the full distinct-key set —
    and stay exact (ADVICE r4: phi*n_p <= 1 made every key a candidate)."""
    rows = [Row(k=f"u{i}") for i in range(500)] + [Row(k="hot")] * 5
    df = spark.createDataFrame(rows).repartition(8)
    # min_count=2 over 505 rows: phi*n_p ≈ 0.25 per 63-row partition →
    # every key is a candidate; bound of 10 forces the fallback.
    got = frequency.heavy_hitters(df, "k", 2, max_broadcast_candidates=10)
    assert [(r.k, r.n) for r in got.collect()] == [("hot", 5)]
    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        got.explain("formatted")
    assert "MapInPandas" not in buf.getvalue()  # plain plan, no broadcast pass
    # min_count<=1 short-circuits straight to the plain plan
    got1 = frequency.heavy_hitters(spark.createDataFrame(rows), "k", 1)
    assert got1.count() == 501


def _ev(uid, t, eid):
    return Row(user_id=uid, ts=t, event_id=eid)


def test_sessionize_gap_boundary(spark):
    """gap == limit stays in-session (strict >); gap just over starts a
    new one; first event of a user always opens session 1."""
    base = dt.datetime(2024, 1, 1)
    gap = 3600
    rows = [
        _ev(1, base, 1),
        _ev(1, base + dt.timedelta(seconds=gap), 2),  # == limit: same
        _ev(1, base + dt.timedelta(seconds=2 * gap, microseconds=1), 3),  # new
        _ev(2, base, 4),
    ]
    out = behavior.sessionize(
        spark.createDataFrame(rows), gap_seconds=gap
    ).collect()
    idx = {r.event_id: r.session_idx for r in out}
    assert idx == {1: 1, 2: 1, 3: 2, 4: 1}


def test_session_stats_rollup(spark):
    base = dt.datetime(2024, 1, 1)
    rows = [
        _ev(1, base, 1),
        _ev(1, base + dt.timedelta(seconds=10), 2),
        _ev(1, base + dt.timedelta(hours=12), 3),
    ]
    out = behavior.session_stats(
        spark.createDataFrame(rows), gap_seconds=3600
    ).collect()
    by_idx = {r.session_idx: r for r in out}
    assert by_idx[1].n_events == 2 and by_idx[1].duration_sec == 10.0
    assert by_idx[2].n_events == 1 and by_idx[2].duration_sec == 0.0


def test_pivot_fills_absent_cells_with_zero(spark):
    from nginx_analytics_spark import registry

    pdf = registry.queries()["daily_event_matrix"](spark, SF).toPandas()
    assert not pdf[["click", "error", "purchase", "signup", "view"]].isna().any().any()
    ev = load_table(spark, SF, "events")
    assert int(pdf[["click", "error", "purchase", "signup", "view"]].sum().sum()) == ev.count()


def test_intersect_dedups(spark):
    from nginx_analytics_spark import registry

    pdf = registry.queries()["purchase_and_error_users"](spark, SF).toPandas()
    assert pdf["user_id"].is_unique


def test_frame_samples_fanout_and_short_docs(spark):
    """Frame fan-out: count per doc = min(max_frames,
    floor((len-32)/16)+1) for len >= 32, else 0; overlapping windows
    share bytes (frame k+1 starts mid-frame-k)."""
    from nginx_analytics_spark.operators import multimodal

    docs = load_table(spark, SF, "documents")
    frames = multimodal.frame_samples(multimodal.attach_payload(docs))
    got = {r.doc_id: r.n for r in
           frames.groupBy("doc_id").agg(F.count("*").alias("n")).collect()}
    lens = {r.doc_id: r.n_chars for r in docs.collect()}
    for did, n_chars in lens.items():
        want = 0 if n_chars < 32 else min(8, (n_chars - 32) // 16 + 1)
        assert got.get(did, 0) == want, (did, n_chars)
    # offsets follow the stride
    one = frames.filter(F.col("doc_id") == max(got, key=got.get)) \
                .orderBy("frame_idx").collect()
    assert [r.offset for r in one] == [16 * k for k in range(len(one))]
