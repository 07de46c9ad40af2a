"""Sequence packing (X34), repetition gates (X33), temperature mixing
(X35) — operator-level semantics tests."""

from __future__ import annotations

from pyspark.sql import functions as F

from nginx_analytics_spark.operators import packing, sampling, text


def test_pack_plan_layout_and_boundaries(spark):
    rows = [
        # (doc_id, source, n_tokens) — one group, budget 10
        (1, "s", 4),   # start 0,  chunk 0, offset 0, within
        (2, "s", 6),   # start 4,  chunk 0, offset 4, ends at 9 — within
        (3, "s", 7),   # start 10, chunk 1, offset 0, ends 16 — within
        (4, "s", 5),   # start 17, chunk 1, offset 7, ends 21 — SPANS
        (5, "s", 3),   # start 22, chunk 2, offset 2, within
    ]
    df = spark.createDataFrame(rows, ["doc_id", "source", "n_tokens"])
    out = {
        r["doc_id"]: (r["chunk_id"], r["chunk_offset"], r["spans_boundary"])
        for r in packing.pack_plan(
            df, "n_tokens", 10, part_col="source", order_col="doc_id"
        ).collect()
    }
    assert out == {
        1: (0, 0, False),
        2: (0, 4, False),
        3: (1, 0, False),
        4: (1, 7, True),
        5: (2, 2, False),
    }


def test_pack_plan_groups_independent(spark):
    rows = [(1, "a", 9), (2, "a", 9), (1, "b", 9)]
    df = spark.createDataFrame(rows, ["doc_id", "source", "n_tokens"])
    out = {
        (r["source"], r["doc_id"]): r["chunk_id"]
        for r in packing.pack_plan(
            df, "n_tokens", 10, part_col="source", order_col="doc_id"
        ).collect()
    }
    # group b restarts at chunk 0 — no cross-group token bleed
    assert out == {("a", 1): 0, ("a", 2): 0, ("b", 1): 0}
    # and doc 2 in group a starts at offset 9 of chunk 0
    assert out[("a", 2)] == 0


def test_repetition_stats_flags_degenerate_doc(spark):
    rows = [
        (1, "spam ham " * 30),               # one bigram dominates
        (2, " ".join(f"w{i}" for i in range(40))),  # all distinct
        (3, "x"),                             # gramless short doc
        (4, "a b"),                           # exactly one bigram, no trigram
        (5, "a b c"),                         # two distinct bigrams, one trigram
    ]
    df = spark.createDataFrame([(i, t.strip()) for i, t in rows], ["doc_id", "text"])
    out = {
        r["doc_id"]: (
            r["top_bigram_frac"],
            r["dup_trigram_frac"],
            r["repetition_ok"],
        )
        for r in text.repetition_stats(df).collect()
    }
    assert out[1][2] is False and out[1][0] > 0.4 and out[1][1] > 0.9
    assert out[2][2] is True and out[2][1] == 0.0
    assert out[3] == (0.0, 0.0, True)
    # single-bigram doc: frac 1.0 trips the bigram gate; no trigrams -> 0.0
    assert out[4] == (1.0, 0.0, False)
    # all-distinct grams: 1/2 bigram frac trips the gate, trigram frac 0
    assert out[5] == (0.5, 0.0, False)


def test_word_ngrams_multiplicity_and_short_doc(spark):
    df = spark.createDataFrame([("a b a b",), ("a",)], ["t"]).select(
        text.word_ngrams("t", 2).alias("g")
    )
    got = [r["g"] for r in df.collect()]
    assert got[0] == ["a b", "b a", "a b"]  # duplicates preserved
    assert got[1] == []


def test_temperature_rates_upsample_small_groups(spark):
    rows = [("big", i) for i in range(900)] + [("small", i) for i in range(100)]
    df = spark.createDataFrame(rows, ["src", "k"])
    rates = {
        r["src"]: r["rate"]
        for r in sampling.temperature_rates(df, "src", alpha=0.5).collect()
    }
    # alpha<1: the small group keeps a LARGER fraction than the big one;
    # here it up-samples past 1.0 and caps (sqrt weighting: 10/40 of the
    # 500-row target is 125 rows against a 100-row group)
    assert rates["small"] == 1.0
    assert rates["big"] == 0.416667  # min(1, 30/40 * 0.5 * 1000 / 900), 6dp
    # capped volume lands under the target — the documented trade-off
    expected = 900 * rates["big"] + 100 * rates["small"]
    assert expected <= 500


def test_temperature_sample_deterministic_and_subset(spark):
    rows = [("a", i) for i in range(400)] + [("b", i + 1000) for i in range(100)]
    df = spark.createDataFrame(rows, ["src", "k"])
    s1 = sorted(
        r["k"] for r in sampling.temperature_sample(df, "src", "k").collect()
    )
    s2 = sorted(
        r["k"] for r in sampling.temperature_sample(df, "src", "k").collect()
    )
    assert s1 == s2  # reproducible
    # repartitioning must not change membership (hash of the KEY, not the
    # partition/seed machinery randomSplit depends on)
    s3 = sorted(
        r["k"]
        for r in sampling.temperature_sample(
            df.repartition(13), "src", "k"
        ).collect()
    )
    assert s1 == s3


def test_temperature_alpha_one_is_uniform_rate(spark):
    rows = [("a", i) for i in range(300)] + [("b", i + 500) for i in range(100)]
    df = spark.createDataFrame(rows, ["src", "k"])
    rates = {
        r["src"]: r["rate"]
        for r in sampling.temperature_rates(
            df, "src", alpha=1.0, target_frac=0.25
        ).collect()
    }
    assert rates["a"] == rates["b"] == 0.25


def test_salted_join_equals_plain_join(spark):
    from nginx_analytics_spark.operators import skew

    big = spark.createDataFrame(
        [(i, i % 3, float(i)) for i in range(200)], ["event_id", "k", "v"]
    )
    small = spark.createDataFrame(
        [(0, "a"), (1, "b"), (2, "c")], ["k", "name"]
    )
    salted = sorted(
        map(tuple, skew.salted_join(big, small, "k").select("event_id", "k", "v", "name").collect())
    )
    plain = sorted(
        map(tuple, big.join(small, "k").select("event_id", "k", "v", "name").collect())
    )
    assert salted == plain


def test_salted_join_left_keeps_unmatched(spark):
    from nginx_analytics_spark.operators import skew

    big = spark.createDataFrame([(1, 0), (2, 9)], ["event_id", "k"])
    small = spark.createDataFrame([(0, "a")], ["k", "name"])
    got = {
        r["event_id"]: r["name"]
        for r in skew.salted_join(big, small, "k", how="left").collect()
    }
    assert got == {1: "a", 2: None}


def test_char_pair_counts_deterministic_order(spark):
    from nginx_analytics_spark.operators import text as t

    df = spark.createDataFrame([(1, "abab"), (2, "ab")], ["doc_id", "text"])
    got = [(r["pair"], r["n"]) for r in t.char_pair_counts(df).collect()]
    # pairs: 'ab','ba','ab' from doc1 + 'ab' from doc2 -> ab:3, ba:1
    assert got == [("ab", 3), ("ba", 1)]


def test_overlap_chunks_window_math(spark):
    """X76 boundary math: single window at/under chunk_size; windows
    start every stride tokens; consecutive full windows share exactly
    ``overlap`` tokens; the last window reaches the final token; the
    concatenation of stride-prefixes reconstructs the document."""
    from nginx_analytics_spark.operators.packing import overlap_chunks

    def toks(n):
        return " ".join(f"t{i}" for i in range(n))

    df = spark.createDataFrame(
        [(1, toks(10)), (2, toks(64)), (3, toks(65)), (4, toks(200))],
        "doc_id long, text string",
    )
    out = {}
    for r in overlap_chunks(df, chunk_size=64, overlap=16).collect():
        out.setdefault(r.doc_id, []).append(r)
    for rows in out.values():
        rows.sort(key=lambda r: r.chunk_idx)

    assert [r.n_tokens for r in out[1]] == [10]
    assert [r.n_tokens for r in out[2]] == [64]
    # 65 tokens: second window starts at 48, runs to token 64 (17 tokens)
    assert [r.n_tokens for r in out[3]] == [64, 17]
    assert out[3][1].chunk_text.split(" ")[0] == "t48"
    # 200 tokens: starts 0,48,96,144 -> sizes 64,64,64,56
    assert [r.n_tokens for r in out[4]] == [64, 64, 64, 56]
    # consecutive full windows overlap by exactly 16 tokens
    a, b = out[4][0].chunk_text.split(" "), out[4][1].chunk_text.split(" ")
    assert a[-16:] == b[:16]
    # last window reaches the final token
    assert out[4][-1].chunk_text.split(" ")[-1] == "t199"
    # stride-prefix concatenation reconstructs the document
    recon = []
    for r in out[4][:-1]:
        recon.extend(r.chunk_text.split(" ")[:48])
    recon.extend(out[4][-1].chunk_text.split(" "))
    assert recon == toks(200).split(" ")


def test_overlap_chunks_rejects_bad_overlap(spark):
    from nginx_analytics_spark.operators.packing import overlap_chunks

    df = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    for bad in (-1, 64, 65):
        try:
            overlap_chunks(df, chunk_size=64, overlap=bad)
            raise AssertionError("expected ValueError")
        except ValueError:
            pass
