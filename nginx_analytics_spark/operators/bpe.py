"""X75: distributed BPE tokenizer training (Sennrich et al. 2016,
"Neural Machine Translation of Rare Words with Subword Units").

The missing half of the tokenizer story: X41 (``text.char_pair_counts``)
measures corpus pair statistics; this module runs the actual iterative
merge-learning loop that produces a tokenizer's merge table.

Scale design — the Sennrich vocabulary trick, distributed:

  * The corpus is scanned ONCE, into a (word, weight) VOCABULARY frame
    (weight = corpus frequency). Every training round then operates on
    the vocabulary — size = distinct words, orders of magnitude smaller
    than the corpus — with pair counts weighted by word frequency,
    which is exactly equal to counting over the raw corpus.
  * Each round is one codegen'd aggregation (explode adjacent symbol
    pairs, sum weights, take the argmax) plus one Arrow-batched kernel
    applying the merge to each word's symbol sequence. The driver holds
    ONLY the merge table (n_merges rows); the vocabulary stays
    distributed and is localCheckpoint'ed per round so the loop never
    stacks lineage (same discipline as graph.connected_components).
  * Determinism: the argmax tie-breaks on (weight DESC, left ASC,
    right ASC), so the learned merges are a pure function of the
    corpus.

Words are split to characters with a ``</w>`` end-of-word marker on the
final symbol (the original formulation, so merges distinguish suffixes
from mid-word units). Iterative and therefore not SQL-expressible — the
registered query is rows-only; correctness is pinned by a golden test
against an in-test pure-Python reference implementation of the same
algorithm.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

END = "</w>"


def word_vocab(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(symbols array<string>, weight) — the frequency-weighted
    vocabulary, each word split into characters with the end marker
    appended to the last one. One corpus scan, one shuffle on the word."""
    words = docs.select(
        F.explode(F.split(F.col(text_col), " ")).alias("w")
    ).filter(F.col("w") != "")
    vocab = words.groupBy("w").agg(F.count(F.lit(1)).alias("weight"))
    chars = F.split(F.col("w"), "")
    n = F.size(chars)
    symbols = F.concat(
        F.slice(chars, 1, n - 1),
        F.array(F.concat(F.element_at(chars, -1), F.lit(END))),
    )
    # The vocabulary is orders of magnitude smaller than the corpus (the
    # whole point of the Sennrich trick) — coalesce it so the ~4 jobs per
    # training round schedule a handful of tasks instead of a full
    # shuffle-partition fan; size the divisor up if the vocab is huge.
    parallelism = max(1, vocab.sparkSession.sparkContext.defaultParallelism // 4)
    return vocab.select(symbols.alias("symbols"), "weight").coalesce(parallelism)


def pair_weights(vocab: DataFrame) -> DataFrame:
    """(left, right, weight) — adjacent-symbol pair frequencies over the
    corpus, computed from the weighted vocabulary (map-side combined;
    the exchange carries one row per distinct pair per partition)."""
    s = F.col("symbols")
    n = F.size(s)
    pairs = F.when(
        n >= 2,
        F.zip_with(
            F.slice(s, 1, n - 1),
            F.slice(s, 2, n - 1),
            lambda a, b: F.struct(a.alias("l"), b.alias("r")),
        ),
    ).otherwise(F.array())
    return (
        vocab.select(F.explode(pairs).alias("p"), "weight")
        .groupBy(F.col("p.l").alias("left"), F.col("p.r").alias("right"))
        .agg(F.sum("weight").alias("weight"))
    )


def _apply_merge(vocab: DataFrame, left: str, right: str) -> DataFrame:
    """Replace every adjacent (left, right) with the merged symbol, in
    one Arrow-batched pass over the vocabulary (left-to-right greedy —
    the standard application order)."""
    merged = left + right

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for syms in pdf["symbols"]:
                res = []
                i, n = 0, len(syms)
                while i < n:
                    if i + 1 < n and syms[i] == left and syms[i + 1] == right:
                        res.append(merged)
                        i += 2
                    else:
                        res.append(syms[i])
                        i += 1
                out.append(res)
            yield pd.DataFrame(
                {"symbols": out, "weight": pdf["weight"].to_numpy()}
            )

    return vocab.mapInPandas(kernel, schema="symbols array<string>, weight bigint")


def learn_merges(
    docs: DataFrame,
    n_merges: int = 20,
    text_col: str = "text",
    min_weight: int = 2,
) -> DataFrame:
    """Learn the top ``n_merges`` BPE merges. Returns a DataFrame
    (rank, left, right, merged, weight) — the tokenizer's merge table
    in learning order. Stops early when no pair reaches ``min_weight``
    (merging singletons memorizes the corpus tail)."""
    spark = docs.sparkSession
    vocab = word_vocab(docs, text_col).localCheckpoint(eager=True)
    merges: list[tuple[int, str, str, str, int]] = []
    for rank in range(1, n_merges + 1):
        top = (
            pair_weights(vocab)
            .orderBy(
                F.col("weight").desc(), F.col("left").asc(), F.col("right").asc()
            )
            .limit(1)
            .collect()
        )
        if not top or top[0]["weight"] < min_weight:
            break
        left, right, w = top[0]["left"], top[0]["right"], int(top[0]["weight"])
        merges.append((rank, left, right, left + right, w))
        vocab = _apply_merge(vocab, left, right).localCheckpoint(eager=True)
    return spark.createDataFrame(
        merges, "rank int, left string, right string, merged string, weight bigint"
    )


def bpe_encode(
    docs: DataFrame,
    merges,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """X90: APPLY a learned merge table to the corpus — the production
    step :func:`learn_merges` trains for but (until r13) nothing
    executed: tokenize every document into BPE subword units so the
    downstream packing/export plan (``packing.pack_plan``,
    ``export.shard_manifest``) can ship token-true shards instead of
    whitespace-token approximations. Returns
    ``(id_col, tokens array<string>, n_tokens int)``.

    Semantics EXACTLY reproduce training: words are pre-tokenized the
    same way as :func:`word_vocab` (whitespace split, characters with
    ``</w>`` appended to the last), and merges apply in RANK ORDER,
    each greedily left-to-right — the :func:`_apply_merge` kernel's
    logic per word. Rank-order application is equivalent to the
    lowest-rank-pair priority loop (GPT-2 style) here because merges
    are learned sequentially: merge k's parts can only be symbols that
    exist after merges 1..k-1, so applying a later merge can never
    create an earlier merge's pair. The identity is pinned by test:
    for every word of the training corpus, ``bpe_encode``'s
    segmentation equals the trained vocabulary's final symbol
    sequence.

    ``merges`` is the :func:`learn_merges` output frame (collected —
    it is n_merges rows, a driver constant by construction) or an
    already-materialized list of ``(left, right)`` pairs in rank
    order.

    Scale: one Arrow-batched pass over the corpus; the merge table
    ships as a closure constant and each batch keeps a WORD cache
    (natural-language word frequency is Zipfian, so the per-batch hit
    rate is high and the cost per batch approaches distinct-words x
    merges, not tokens x merges). No shuffle at all — tokenization is
    embarrassingly parallel; the one wide edge in the tokenize-and-
    pack pipeline stays :func:`packing.pack_plan`'s window."""
    if isinstance(merges, DataFrame):
        merges = [
            (r["left"], r["right"])
            for r in merges.orderBy("rank").collect()
        ]
    pairs = [(str(l), str(r)) for l, r in merges]

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cache: dict[str, list[str]] = {}

        def segment(word: str) -> list[str]:
            got = cache.get(word)
            if got is not None:
                return got
            syms = [*list(word)[:-1], word[-1] + END]
            for left, right in pairs:
                if len(syms) < 2:
                    break
                res, i, n = [], 0, len(syms)
                while i < n:
                    if i + 1 < n and syms[i] == left and syms[i + 1] == right:
                        res.append(left + right)
                        i += 2
                    else:
                        res.append(syms[i])
                        i += 1
                syms = res
            cache[word] = syms
            return syms

        for pdf in batches:
            toks = []
            for text in pdf[text_col]:
                out: list[str] = []
                for w in (text or "").split(" "):
                    if w:
                        out.extend(segment(w))
                toks.append(out)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].to_numpy(),
                    "tokens": toks,
                    "n_tokens": [len(t) for t in toks],
                }
            )

    return docs.select(id_col, text_col).mapInPandas(
        kernel, schema=f"{id_col} long, tokens array<string>, n_tokens int"
    )
