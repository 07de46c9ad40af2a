"""r4 operators: shuffle-shard export, quantile binning, TF-IDF,
centroids — the determinism/scale properties their docstrings promise."""

from __future__ import annotations

from pyspark.sql import functions as F

from nginx_analytics_spark.operators import export, features, similarity, text
from nginx_analytics_spark.sources import load_table

SF = "/root/testdata/sf0.001"


def _manifest_rows(df):
    return {
        (r.doc_id, r.shard, r.pos)
        for r in df.select("doc_id", "shard", "pos").collect()
    }


def test_shard_assignments_partition_invariant(spark):
    """Shard AND position are pure functions of the key — the same under
    any input partitioning (the property repartition/rand-based sharding
    lacks)."""
    docs = load_table(spark, SF, "documents").select("doc_id")
    a = _manifest_rows(export.shard_assignments(docs, "doc_id", 8))
    b = _manifest_rows(
        export.shard_assignments(docs.repartition(13), "doc_id", 8)
    )
    assert a == b
    # every shard populated, positions contiguous from 1 per shard
    by_shard = {}
    for _, shard, pos in a:
        by_shard.setdefault(shard, []).append(pos)
    assert set(by_shard) == set(range(8))
    for shard, poss in by_shard.items():
        assert sorted(poss) == list(range(1, len(poss) + 1)), shard


def test_shard_order_decorrelated_from_key_order(spark):
    """The hash scramble must break ingest order: within a shard,
    consecutive positions should NOT be consecutive doc_ids."""
    docs = load_table(spark, SF, "documents").select("doc_id")
    m = export.shard_assignments(docs, "doc_id", 4)
    rows = sorted(
        ((r.shard, r.pos, r.doc_id) for r in m.collect())
    )
    monotone_runs = sum(
        1
        for (s1, p1, d1), (s2, p2, d2) in zip(rows, rows[1:])
        if s1 == s2 and d2 == d1 + 1
    )
    assert monotone_runs < len(rows) * 0.05  # ~random order, not ingest order


def test_shard_assignment_decorrelated_from_key_residues(spark):
    """Regression: `h % n` sharding with the odd Knuth multiplier
    (K ≡ 1 mod 16) degenerates to `key % n` for power-of-two n — ids
    allocated round-robin across 8 sources would each land in ONE shard.
    The high-bit assignment must spread every residue class across
    shards."""
    docs = load_table(spark, SF, "documents").select("doc_id")
    m = export.shard_assignments(docs, "doc_id", 8).collect()
    by_residue = {}
    for r in m:
        by_residue.setdefault(r.doc_id % 8, set()).add(r.shard)
    for residue, shards in by_residue.items():
        assert len(shards) >= 4, (residue, shards)


def test_write_shards_layout_and_roundtrip(spark, tmp_path):
    docs = load_table(spark, SF, "documents")
    path = str(tmp_path / "shards")
    n = export.write_shards(docs, path, "doc_id", 4)
    assert n == 4
    back = spark.read.parquet(path)
    assert back.count() == docs.count()
    # stored order within a shard follows pos (read back preserves file order)
    one = back.filter(F.col("shard") == 0).select("pos").toPandas()["pos"]
    assert list(one) == sorted(one)


def test_quantile_bucketize_properties(spark):
    """Monotone in value; bucket counts balanced within sketch tolerance;
    no shuffle of data rows (broadcast cutpoints only)."""
    ev = load_table(spark, SF, "events").select("event_id", "value")
    binned = features.quantile_bucketize(ev, "value", 10)
    pdf = binned.toPandas().sort_values("value")
    assert pdf["bin"].is_monotonic_increasing
    counts = pdf.groupby("bin").size()
    assert set(counts.index) == set(range(1, 11))
    n = len(pdf)
    assert (counts > 0.5 * n / 10).all() and (counts < 1.5 * n / 10).all()


def test_quantile_bucketize_no_row_shuffle(spark):
    import io
    from contextlib import redirect_stdout

    ev = load_table(spark, SF, "events").select("event_id", "value")
    binned = features.quantile_bucketize(ev, "value", 10)
    buf = io.StringIO()
    with redirect_stdout(buf):
        binned.explain("formatted")
    plan = buf.getvalue()
    # the only exchanges allowed are the 1-row sketch agg + its broadcast
    assert plan.count("Exchange SinglePartition") <= 1
    assert "Exchange hashpartitioning" not in plan


def test_ntile_matches_bucketize_on_uniform_data(spark):
    """On a distinct-valued column the sketch path lands >=90% of rows in
    the exact NTILE bucket (sanity link between the two binning paths)."""
    ev = load_table(spark, SF, "events").select("event_id", "value")
    exact = features.ntile_bins(
        ev.withColumn("g", F.lit(1)), "g", "value", "event_id", 10
    ).select("event_id", F.col("bin").alias("exact_bin"))
    approx = features.quantile_bucketize(ev, "value", 10).select(
        "event_id", F.col("bin").alias("approx_bin")
    )
    both = exact.join(approx, "event_id").toPandas()
    agree = (both["exact_bin"] == both["approx_bin"]).mean()
    assert agree >= 0.9, agree


def test_label_centroids_shape_and_values(spark):
    emb = load_table(spark, SF, "embeddings").select("label", "embedding")
    cent = similarity.label_centroids(emb).toPandas()
    n_labels = emb.select("label").distinct().count()
    dim = len(emb.first().embedding)
    assert len(cent) == n_labels * dim
    # spot-check one (label, dim) against a driver-side mean
    import numpy as np

    rows = emb.filter(F.col("label") == cent.label.iloc[0]).collect()
    want = float(np.mean([r.embedding[0] for r in rows], dtype=np.float64))
    got = float(
        cent[(cent.label == cent.label.iloc[0]) & (cent.dim == 0)].centroid.iloc[0]
    )
    assert abs(got - want) < 1e-5


def test_tfidf_rare_term_outranks_common(spark):
    """A term appearing in one document must outscore (per occurrence) a
    corpus-wide stopword-like term in the same document."""
    docs = load_table(spark, SF, "documents")
    out = text.tfidf_top_terms(docs, k=3)
    assert out.filter(F.col("rank") > 3).count() == 0
    per_doc = out.groupBy("doc_id").count().toPandas()
    assert (per_doc["count"] <= 3).all()
    # idf of a ubiquitous term is ~0 -> it cannot be a top term unless tf huge
    top = out.toPandas()
    ubiquitous = top[top.df == docs.count()]
    assert (ubiquitous.tfidf <= 1e-6).all()
