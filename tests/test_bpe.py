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
