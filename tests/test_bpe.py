"""X75: distributed BPE trainer — golden equivalence against a pure-
Python reference implementation of the same (Sennrich) algorithm."""

from __future__ import annotations

from collections import Counter

from nginx_analytics_spark.operators import bpe


def _reference_bpe(texts: list[str], n_merges: int, min_weight: int = 2):
    """The sequential textbook algorithm, for golden comparison."""
    vocab = Counter()
    for t in texts:
        for w in t.split(" "):
            if w:
                vocab[w] += 1
    symtab = {
        w: [*list(w)[:-1], list(w)[-1] + bpe.END] for w in vocab
    }
    merges = []
    for rank in range(1, n_merges + 1):
        pairs: Counter = Counter()
        for w, c in vocab.items():
            s = symtab[w]
            for a, b in zip(s, s[1:]):
                pairs[(a, b)] += c
        if not pairs:
            break
        # same tie-break as the distributed argmax: weight desc, pair asc
        (left, right), w = sorted(
            pairs.items(), key=lambda kv: (-kv[1], kv[0])
        )[0]
        if w < min_weight:
            break
        merges.append((rank, left, right, left + right, w))
        for word, s in symtab.items():
            res, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == left and s[i + 1] == right:
                    res.append(left + right)
                    i += 2
                else:
                    res.append(s[i])
                    i += 1
            symtab[word] = res
    return merges


def test_learn_merges_matches_reference_on_classic_corpus(spark):
    texts = [
        "low low low low low",
        "lower lower",
        "newest newest newest newest newest newest",
        "widest widest widest",
    ]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    got = [
        (r.rank, r.left, r.right, r.merged, r.weight)
        for r in bpe.learn_merges(df, n_merges=8).orderBy("rank").collect()
    ]
    want = _reference_bpe(texts, 8)
    assert got == want
    # sanity on the classic example: the suffix family must be learned
    assert any(m[3] == "est</w>" for m in got)


def test_learn_merges_matches_reference_on_fixture_docs(spark):
    """The property that matters: distributed == sequential on REAL
    text (a 60-doc slice of the documents fixture)."""
    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .orderBy("doc_id")
        .limit(60)
        .select("text")
    )
    texts = [r.text for r in docs.collect()]
    got = [
        (r.rank, r.left, r.right, r.merged, r.weight)
        for r in bpe.learn_merges(docs, n_merges=10).orderBy("rank").collect()
    ]
    assert got == _reference_bpe(texts, 10)
    assert len(got) == 10  # real text has ≥10 above-threshold merges


def test_learn_merges_stops_below_min_weight(spark):
    df = spark.createDataFrame([("ab cd",)], "text string")
    got = bpe.learn_merges(df, n_merges=5, min_weight=2).collect()
    assert got == []  # every pair occurs once — nothing worth merging


def _reference_segment(texts: list[str], merges) -> dict[str, list[str]]:
    """Final per-word segmentation after applying ``merges`` in rank
    order — the trained vocabulary's state, recomputed sequentially."""
    words = {w for t in texts for w in t.split(" ") if w}
    symtab = {w: [*list(w)[:-1], w[-1] + bpe.END] for w in words}
    for left, right in merges:
        for word, s in symtab.items():
            res, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == left and s[i + 1] == right:
                    res.append(left + right)
                    i += 2
                else:
                    res.append(s[i])
                    i += 1
            symtab[word] = res
    return symtab


def test_bpe_encode_reproduces_training_segmentation(spark):
    """X90 identity: applying the learned merge table to the training
    corpus must segment every word exactly as the trainer's final
    vocabulary state does — encode IS training's apply kernel run in
    rank order, so tokenize-then-pack ships the same units the merges
    were learned over."""
    texts = [
        "low low low low low",
        "lower lower",
        "newest newest newest newest newest newest",
        "widest widest widest",
        "low lower newest widest newest",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    merges_df = bpe.learn_merges(df, n_merges=8)
    merges = [(r.left, r.right) for r in merges_df.orderBy("rank").collect()]
    want = _reference_segment(texts, merges)
    got = {
        r.doc_id: list(r.tokens)
        for r in bpe.bpe_encode(df, merges_df).collect()
    }
    for i, t in enumerate(texts):
        expect = [s for w in t.split(" ") if w for s in want[w]]
        assert got[i] == expect, (t, got[i], expect)
    # n_tokens matches, and tokens reconstruct the text exactly
    out = bpe.bpe_encode(df, merges).collect()
    for r in out:
        assert r.n_tokens == len(r.tokens)
        joined = "".join(r.tokens).replace(bpe.END, " ").rstrip(" ")
        assert joined == " ".join(
            w for w in texts[r.doc_id].split(" ") if w
        ).replace(" ", " ")  # END markers close each word
    # END marker closes every word: marker count == word count
    for r in out:
        n_words = len([w for w in texts[r.doc_id].split(" ") if w])
        assert sum(t.endswith(bpe.END) for t in r.tokens) == n_words


def test_bpe_encode_more_merges_never_grow_token_count(spark):
    texts = ["the cat sat on the mat", "the bat and the cat", "mat mat mat"]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    merges = bpe.learn_merges(df, n_merges=10, min_weight=2)
    pairs = [(r.left, r.right) for r in merges.orderBy("rank").collect()]
    prev = None
    for k in range(len(pairs) + 1):
        total = sum(
            r.n_tokens for r in bpe.bpe_encode(df, pairs[:k]).collect()
        )
        if prev is not None:
            assert total <= prev, (k, total, prev)
        prev = total


def test_bpe_encode_edge_shapes(spark):
    df = spark.createDataFrame(
        [(0, ""), (1, "   "), (2, "a"), (3, None)],
        "doc_id long, text string",
    )
    got = {r.doc_id: (list(r.tokens), r.n_tokens)
           for r in bpe.bpe_encode(df, []).collect()}
    assert got[0] == ([], 0) and got[1] == ([], 0) and got[3] == ([], 0)
    assert got[2] == ([f"a{bpe.END}"], 1)
