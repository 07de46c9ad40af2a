"""Text analysis operators over the ``documents`` table (SURVEY.md §7 M6).

Corpus-pipeline primitives the reference's log-only surface lacks:

  * :func:`token_stats`    — whitespace + BPE-ish regex token counting.
  * :func:`language_id`    — stopword-profile n-gram heuristic language ID.
  * :func:`quality_score`  — length / punctuation / diversity scoring.
  * :func:`fingerprint`    — polynomial rolling-hash document fingerprints.

All pure ``pyspark.sql.functions`` column expressions — whole-stage
codegen, no Python. Each operator is written to be *oracle-expressible*:
the same arithmetic exists in ANSI-SQL form in the registry, and the
deterministic integer/regex primitives were parity-checked between Spark
(Java regex, sequential folds) and DuckDB (RE2, list_reduce).

Scale: every operator is a narrow map over one text column — no shuffle,
no state; they pipeline into the scan stage at any data size. The
production fingerprint for dedup keys is ``xxhash64`` (one JVM call); the
polynomial hash here exists for cross-engine verifiability and rolling
(prefix) use.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from nginx_analytics_spark.functions.rounding import half_up

# BPE-ish pre-tokenization: letter runs | digit runs | single punctuation.
BPE_TOKEN_RE = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"

# Tiny per-language stopword profiles (top function words). The classifier
# scores each profile by token hits; argmax with a fixed tie-break order.
STOPWORD_PROFILES: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to", "in", "is", "that", "it", "for"),
    "de": ("der", "die", "das", "und", "ist", "ein", "nicht", "mit", "zu", "auf"),
    "es": ("el", "la", "de", "que", "y", "en", "los", "del", "se", "por"),
    "fr": ("le", "la", "les", "des", "et", "est", "un", "une", "du", "que"),
    "zh": ("de", "shi", "le", "zai", "he", "you", "wo", "ta", "men", "zhe"),
}
LANG_ORDER = ("en", "de", "es", "fr", "zh")  # deterministic tie-break

POLY_BASE = 131
POLY_MOD = 1_000_000_007


def tokens(text: Column | str) -> Column:
    return F.split(text, " ")


def profile_hits(text: Column | str, profile: tuple[str, ...]) -> Column:
    """Number of space-delimited tokens (with multiplicity) found in a
    stopword profile.

    Implemented as one ``regexp_count`` over the raw text with zero-width
    anchors — exactly equivalent to filtering ``split(text, ' ')`` against
    the profile (anchors consume nothing, so adjacent single-space tokens
    all match; ``\\A``/``\\z`` rather than ``^``/``$`` so a trailing
    newline inside a token is NOT treated as a boundary, matching split
    semantics). Chosen over the lambda-HOF form (``F.filter`` +
    ``array_contains``) because higher-order functions always evaluate on
    Spark's interpreted expression path, which degrades 5-25x in long
    sessions (BENCH_r02: language_id 0.49s -> 2.28s); ``regexp_count`` is
    whole-stage-codegen'd and keeps the operator a zero-shuffle narrow map
    — the shape that survives 100 TB (an explode + broadcast-join + agg
    alternative would add an exchange per query for no benefit).
    """
    alternation = "|".join(profile)
    return F.regexp_count(
        F.col(text) if isinstance(text, str) else text,
        F.lit(rf"(?<=\A| )(?:{alternation})(?= |\z)"),
    )


def token_stats(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Token counting: whitespace tokens, BPE-ish regex tokens, char count."""
    t = tokens(text_col)
    return docs.select(
        F.col(id_col),
        F.size(t).alias("ws_tokens"),
        F.size(
            F.regexp_extract_all(text_col, F.lit(BPE_TOKEN_RE), F.lit(0))
        ).alias("bpe_tokens"),
        F.length(text_col).alias("n_chars"),
        F.size(F.array_distinct(t)).alias("distinct_tokens"),
    )


def language_pred(scores: dict[str, Column]) -> Column:
    """The argmax CASE over per-language score columns: ties resolve in
    LANG_ORDER; all-zero scores predict 'und' (undetermined). Shared by
    :func:`language_id` and :func:`clean_corpus` so the two stay one
    arithmetic (and one SQL twin)."""
    pred = F.when(sum(scores[lang] for lang in LANG_ORDER) == 0, F.lit("und"))
    for lang in LANG_ORDER:
        cond = None
        for other in LANG_ORDER:
            if other == lang:
                continue
            c = scores[lang] >= scores[other]
            cond = c if cond is None else (cond & c)
        pred = pred.when(cond, F.lit(lang))
    return pred


def language_id(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Heuristic language ID: argmax of stopword-profile hit counts.

    Emits the per-profile scores and the predicted language; ties resolve
    in LANG_ORDER (an ordered CASE — same arithmetic as the SQL oracle).
    Documents hitting no profile at all predict 'und' (undetermined).
    """
    scores = {
        lang: profile_hits(text_col, STOPWORD_PROFILES[lang]) for lang in LANG_ORDER
    }
    out = docs.select(
        F.col(id_col),
        *[scores[lang].alias(f"score_{lang}") for lang in LANG_ORDER],
    )
    return out.withColumn(
        "predicted_lang",
        language_pred({lang: F.col(f"score_{lang}") for lang in LANG_ORDER}),
    )


def quality_components(text_col: str) -> dict[str, Column]:
    """The quality rubric's raw column expressions, shared by
    :func:`quality_score` and :func:`clean_corpus` (one arithmetic, one
    SQL twin — like :func:`language_pred`):

    quality = 0.4*min(1, ws_tokens/100) + 0.3*type_token_ratio
            + 0.2*(1 - punct_ratio) + 0.1*min(1, 4*stopword_ratio)
    — a transparent linear rubric of the classic corpus-filtering signals
    (Gopher/C4-style length & symbol heuristics)."""
    t = tokens(text_col)
    n_tokens = F.size(t)
    n_chars = F.length(text_col)
    ttr = F.size(F.array_distinct(t)).cast("double") / n_tokens
    punct = F.length(
        F.regexp_replace(text_col, "[A-Za-z0-9 ]", "")
    ).cast("double") / n_chars
    stop = profile_hits(text_col, STOPWORD_PROFILES["en"]).cast("double") / n_tokens
    quality = (
        0.4 * F.least(F.lit(1.0), n_tokens / F.lit(100.0))
        + 0.3 * ttr
        + 0.2 * (1 - punct)
        + 0.1 * F.least(F.lit(1.0), 4 * stop)
    )
    return {
        "ws_tokens": n_tokens,
        "n_chars": n_chars,
        "type_token_ratio": ttr,
        "punct_ratio": punct,
        "stopword_ratio": stop,
        "quality": quality,
    }


def quality_score(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    round_to: int = 6,
) -> DataFrame:
    """Document quality heuristics: length, diversity, punctuation,
    stopwords (rubric in :func:`quality_components`); deterministic and
    SQL-twinned for the oracle."""
    c = quality_components(text_col)
    return docs.select(
        F.col(id_col),
        c["ws_tokens"].alias("ws_tokens"),
        c["n_chars"].alias("n_chars"),
        half_up(c["type_token_ratio"], round_to).alias("type_token_ratio"),
        half_up(c["punct_ratio"], round_to).alias("punct_ratio"),
        half_up(c["stopword_ratio"], round_to).alias("stopword_ratio"),
        half_up(c["quality"], round_to).alias("quality"),
    )


def poly_hash(text: Column | str, length: int | None = None) -> Column:
    """Polynomial rolling hash over character codes (mod 1e9+7).

    ``length`` limits to a prefix (the rolling-window use). O(len) lambda
    folds — for production dedup keys prefer ``xxhash64``; this variant is
    the cross-engine-verifiable fingerprint.
    """
    src = F.substring(text, 1, length) if length else (
        F.col(text) if isinstance(text, str) else text
    )
    return F.aggregate(
        F.transform(F.split(src, ""), lambda c: F.ascii(c).cast("bigint")),
        F.lit(0).cast("bigint"),
        lambda acc, x: (acc * POLY_BASE + x) % POLY_MOD,
    )


def fingerprint(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Document fingerprints: 128-char-prefix and full-text rolling hashes,
    plus the production xxhash64 content key (not oracle-compared — engine
    hash seeds differ across systems by design).

    The rolling hashes run as an Arrow-batched pandas kernel, not the
    :func:`poly_hash` column expression: a sequential per-character fold is
    the genuinely non-columnar case (higher-order functions always evaluate
    on Spark's interpreted expression path, whose long-session JIT behavior
    is 5-25x bimodal), and Python integers reproduce the same modular
    arithmetic exactly, so oracle parity is unchanged.
    """
    from collections.abc import Iterator

    import pandas as pd

    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("prefix_fp", T.LongType()),
            T.StructField("full_fp", T.LongType()),
            T.StructField("content_key", T.LongType()),
        ]
    )

    def roll(s: str | None, limit: int | None = None) -> int | None:
        if s is None:
            return None
        acc = 0
        for ch in s[:limit] if limit else s:
            acc = (acc * POLY_BASE + ord(ch)) % POLY_MOD
        return acc

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "prefix_fp": pdf[text_col].map(lambda s: roll(s, 128)),
                    "full_fp": pdf[text_col].map(roll),
                    "content_key": pdf["content_key"],
                }
            )

    # content_key computed JVM-side before the kernel and passed through —
    # one narrow map stage, no join, no shuffle at any scale.
    return docs.select(
        F.col(id_col), F.col(text_col), F.xxhash64(text_col).alias("content_key")
    ).mapInPandas(kernel, schema)


def clean_scores(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, text, predicted_lang, ws_tokens, quality) in ONE Arrow
    mapInPandas pass — the fused scoring stage of :func:`clean_corpus`.

    Why a Python kernel and not the column-expression composition: the
    rubric needs all 5 language scores PLUS the stopword ratio, and each
    ``profile_hits`` is its own full-text ``regexp_count`` scan — six
    lookaround scans per row, measured 3.7x the whole pipeline at sf0.1
    (BENCH_r03 clean_corpus 0.91s -> 3.36s isolated). Here the text is
    tokenized ONCE per row and all profile counts come from one dict
    lookup per token; the quality arithmetic is the identical IEEE op
    sequence as :func:`quality_components` (Python and JVM doubles agree
    op-for-op), so the rounded score — and the oracle hash — is
    unchanged. Zero exchange, same as the expression form: the kernel is
    a narrow map that pipelines into the scan at any scale (the
    ``fingerprint`` pattern).
    """
    import math
    import re
    from collections.abc import Iterator

    import pandas as pd

    from pyspark.sql import types as T

    lexicon: dict[str, list[str]] = {}
    for lang in LANG_ORDER:
        for wd in STOPWORD_PROFILES[lang]:
            lexicon.setdefault(wd, []).append(lang)
    punct_re = re.compile(r"[A-Za-z0-9 ]")  # same ASCII class as the SQL twin

    def score(s: str | None):
        if s is None:
            return None, None, None
        toks = s.split(" ")  # == split(text, ' ') with limit -1 (Java/DuckDB)
        n = len(toks)
        counts = dict.fromkeys(LANG_ORDER, 0)
        for t in toks:
            for lang in lexicon.get(t, ()):
                counts[lang] += 1
        if sum(counts.values()) == 0:
            lang = "und"
        else:  # argmax, ties resolve in LANG_ORDER (same CASE as the oracle)
            best = max(counts[lg] for lg in LANG_ORDER)
            lang = next(lg for lg in LANG_ORDER if counts[lg] == best)
        n_chars = len(s)
        if n_chars == 0:
            return lang, n, None  # punct ratio is 0/0 -> NULL quality
        ttr = len(set(toks)) / n
        punct = len(punct_re.sub("", s)) / n_chars
        stop = counts["en"] / n
        quality = (
            0.4 * min(1.0, n / 100.0)
            + 0.3 * ttr
            + 0.2 * (1 - punct)
            + 0.1 * min(1.0, 4 * stop)
        )
        return lang, n, math.floor(quality * 1e6 + 0.5) / 1e6  # half_up(6)

    fields = {f.name: f.dataType for f in docs.schema.fields}
    schema = T.StructType(
        [
            T.StructField(id_col, fields[id_col]),
            T.StructField(text_col, fields[text_col]),
            T.StructField("predicted_lang", T.StringType()),
            T.StructField("ws_tokens", T.IntegerType()),
            T.StructField("quality", T.DoubleType()),
        ]
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            scored = [score(s) for s in pdf[text_col]]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    text_col: pdf[text_col],
                    "predicted_lang": [r[0] for r in scored],
                    "ws_tokens": pd.array(
                        [r[1] for r in scored], dtype="Int32"
                    ),
                    "quality": pd.array(
                        [r[2] for r in scored], dtype="Float64"
                    ),
                }
            )

    return docs.select(id_col, text_col).mapInPandas(kernel, schema)


def clean_corpus(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_quality: float = 0.55,
    min_tokens: int = 20,
) -> DataFrame:
    """The composed training-data cleaning pipeline: language-ID +
    quality-score + length gate + exact text dedup, as ONE DataFrame DAG.

    Plan shape (the part that matters at 100 TB): the scoring stage
    (:func:`clean_scores`) is a single Arrow-batched narrow map that
    tokenizes each document once and derives all language scores and the
    quality rubric from that one token stream, so the whole filter chain
    is one pass fused into the scan — no joins between the "stages". The
    only exchange is the exact-dedup window, hash-partitioned on the text
    (at scale, key the exchange on ``xxhash64(text)`` instead to avoid
    shuffling full documents; the raw text key here is what the
    cross-engine oracle can express).

    Emits (id, predicted_lang, ws_tokens, quality) for documents that are
    a recognized language, >= ``min_tokens`` tokens, >= ``min_quality``
    (on the 6-dp rounded score, so the gate is engine-portable), and the
    first (lowest id) copy of their exact text.
    """
    from pyspark.sql.window import Window

    scored = clean_scores(docs, id_col, text_col)
    kept = scored.filter(
        (F.col("predicted_lang") != "und")
        & (F.col("ws_tokens") >= min_tokens)
        & (F.col("quality") >= min_quality)
    )
    w = Window.partitionBy(text_col).orderBy(F.col(id_col).asc())
    return (
        kept.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(id_col, "predicted_lang", "ws_tokens", "quality")
    )


def word_ngrams(text: Column | str, n: int) -> Column:
    """n-token grams WITH multiplicity (unlike dedup.word_shingles, which
    dedups for set-Jaccard) — repetition measurement needs every
    occurrence. Documents shorter than ``n`` tokens yield an empty array.
    Same single-bind ``transform`` trick as word_shingles (tokenize once
    per row, not once per gram) — and the same driver-side tree memo
    (functions.exprcache): the HOF lambdas dominate the BUILD cost of
    repetition_stats and the curation composites."""
    if isinstance(text, str):
        from nginx_analytics_spark.functions.exprcache import cached_column

        return cached_column(
            ("word_ngrams", text, n), lambda: word_ngrams(F.col(text), n)
        )
    t = text

    def build(w: Column) -> Column:
        idx = F.sequence(F.lit(1), F.size(w) - (n - 1))
        gram = lambda i: F.concat_ws(  # noqa: E731
            " ", *[F.element_at(w, i + j) for j in range(n)]
        )
        return F.when(F.size(w) >= n, F.transform(idx, gram)).otherwise(
            F.array().cast("array<string>")
        )

    return F.element_at(F.transform(F.array(F.split(t, " ")), build), 1)


# Gopher-style repetition gates (Rae et al. 2021, table A1 analogues):
# a document dominated by one repeated bigram, or whose trigram stream is
# mostly repeats, is boilerplate/spam for training purposes.
TOP_BIGRAM_FRAC_MAX = 0.18
DUP_TRIGRAM_FRAC_MAX = 0.30


def repetition_stats(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """X33: per-document repetition metrics — (id, top_bigram_frac =
    occurrences of the most frequent bigram / all bigram occurrences,
    dup_trigram_frac = 1 - distinct/total trigrams, repetition_ok).

    Plan: ZERO shuffles — every metric is a function of one document, so
    it is computed per-row with array higher-order functions inside the
    scan stage (project-only plan, no Exchange): the most-frequent-bigram
    count is the longest run in the sorted bigram array (boundary indices
    -> gaps -> max), distinct/total trigrams are array_distinct/size.
    The former two-level hash-agg formulation shuffled every gram
    occurrence (O(tokens) rows, two exchanges + two joins back) to
    compute what never leaves the row. Fractions are 6-dp rounded
    (half_up) so the gate is engine-portable; gramless short docs score
    0.0 (no evidence of repetition).
    """

    def _max_multiplicity(sorted_arr: Column) -> Column:
        # max run length in a sorted array: run-start indices -> gaps.
        # Single-bind via transform-over-1-element-array, as word_ngrams.
        # Size guards matter under ANSI: sequence(2, n) flips DESCENDING
        # for n < 2, feeding element_at an index 0 -> runtime error, so
        # the <2-element cases are answered literally instead.
        return F.element_at(
            F.transform(
                F.array(sorted_arr),
                lambda s: F.when(
                    F.size(s) >= 2,
                    F.element_at(
                        F.transform(
                            F.array(
                                F.concat(
                                    F.array(F.lit(1)),
                                    F.filter(
                                        F.sequence(F.lit(2), F.size(s)),
                                        lambda i: F.element_at(s, i)
                                        != F.element_at(s, i - 1),
                                    ),
                                    F.array(F.size(s) + 1),
                                )
                            ),
                            lambda b: F.array_max(
                                F.transform(
                                    F.sequence(F.lit(1), F.size(b) - 1),
                                    lambda j: F.element_at(b, j + 1)
                                    - F.element_at(b, j),
                                )
                            ),
                        ),
                        1,
                    ),
                ).otherwise(F.size(s)),
            ),
            1,
        )

    from nginx_analytics_spark.functions.exprcache import cached_column

    bi = word_ngrams(text_col, 2)
    tri = word_ngrams(text_col, 3)
    # the run-length tree is five nested HOF lambdas — by far the most
    # expensive Column BUILD in the registry (~0.3 s of py4j round trips
    # per construction); memoized per text column (functions.exprcache)
    max_bg = (
        cached_column(
            ("repetition_max_bg", text_col),
            lambda: _max_multiplicity(F.array_sort(word_ngrams(text_col, 2))),
        )
        if isinstance(text_col, str)
        else _max_multiplicity(F.array_sort(bi))
    )
    stats = docs.select(
        F.col(id_col),
        F.size(bi).alias("tot_bg"),
        max_bg.alias("max_bg"),
        F.size(F.array_distinct(tri)).alias("dist_tg"),
        F.size(tri).alias("tot_tg"),
    )
    top_bg = F.when(
        F.col("tot_bg") > 0, half_up(F.col("max_bg") / F.col("tot_bg"), 6)
    ).otherwise(F.lit(0.0))
    dup_tg = F.when(
        F.col("tot_tg") > 0, half_up(1 - F.col("dist_tg") / F.col("tot_tg"), 6)
    ).otherwise(F.lit(0.0))
    return stats.select(
        F.col(id_col),
        top_bg.alias("top_bigram_frac"),
        dup_tg.alias("dup_trigram_frac"),
        (
            (top_bg <= TOP_BIGRAM_FRAC_MAX) & (dup_tg <= DUP_TRIGRAM_FRAC_MAX)
        ).alias("repetition_ok"),
    )


def char_pair_counts(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 50,
) -> DataFrame:
    """X41: corpus-wide adjacent character-pair frequencies, top-k — the
    statistic the first BPE merge step of tokenizer training maximizes.
    Deterministic order: count desc, pair asc.

    The pair enumeration splits the string into a character array ONCE
    per row (single-bind transform, as word_ngrams) and concatenates
    adjacent elements by index — O(len) per document. The former
    ``substring(text, i, 2)`` form re-walked the UTF-8 string from byte 0
    on every call (variable-width chars defeat direct indexing), i.e.
    O(len²) per document; the array form measured ~1.9× faster end-to-end
    at sf0.1. Downstream is one shuffle of |alphabet|² partial counts
    (map-side combine), and the global top-k LIMIT sorts an
    already-aggregated frame of at most |alphabet|² rows.
    """
    from nginx_analytics_spark.functions.exprcache import cached_column

    def _pairs_arr() -> Column:
        chars = F.split(F.col(text_col), "")
        return F.element_at(
            F.transform(
                F.array(chars),
                lambda cc: F.transform(
                    F.sequence(F.lit(1), F.size(cc) - 1),
                    lambda i: F.concat(
                        F.element_at(cc, i), F.element_at(cc, i + 1)
                    ),
                ),
            ),
            1,
        )

    # two nested HOF lambdas — tree memoized per text column
    pairs_arr = cached_column(("char_pairs_arr", text_col), _pairs_arr)
    pairs = (
        docs.filter(F.length(text_col) >= 2)
        .select(F.explode(pairs_arr).alias("pair"))
    )
    return (
        pairs.groupBy("pair")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("pair").asc())
        .limit(k)
    )


def tfidf_top_terms(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    round_to: int = 6,
) -> DataFrame:
    """TF-IDF document-term scoring with per-document top-k terms — the
    keyword-extraction primitive of a text-curation pipeline (and the
    lexical half of hybrid lexical+embedding retrieval).

    score(d, t) = tf(d, t) * ln(N / df(t)), raw counts, no smoothing —
    every factor is an exact integer ratio, so the only float op is the
    final ln * multiply (rounded engine-portably at ``round_to`` dp).

    Plan shape (all stock relational ops, zero Python):
      explode(tokens) -> groupBy(doc, term) count   [tf: one shuffle,
          partial-agg'd map-side so the exchange carries (doc, term, n)]
      tf  -> groupBy(term) count                    [df: vocabulary-sized]
      tf JOIN df ON term, CROSS JOIN 1-row N frame  [df is Zipf-compact —
          orders smaller than the corpus; AQE broadcasts it when it fits,
          else the term-key shuffle is partial-agg-sized, not corpus-sized]
      row_number() OVER (doc, score DESC, term ASC) <= k   [bounded state
          per doc; ties broken lexically for determinism]

    At 100 TB the explode dominates — it pipelines inside the scan stage;
    nothing materializes the exploded corpus."""
    tok = docs.select(
        F.col(id_col), F.explode(tokens(F.col(text_col))).alias("term")
    )
    tf = tok.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    df_t = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(df_t, "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "tfidf",
            half_up(
                F.col("tf") * F.log(F.col("n_docs") / F.col("df")), round_to
            ),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy(id_col).orderBy(
        F.col("tfidf").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k)
        .select(id_col, "term", "tf", "df", "tfidf", "rank")
    )


def unigram_logprob(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    round_to: int = 6,
) -> DataFrame:
    """Corpus-unigram-LM document scoring — the CCNet-style quality
    signal: score(d) = mean over d's tokens of ln p(token), with p the
    corpus unigram frequency. Documents of common, fluent vocabulary
    score near the corpus ceiling; gibberish and rare-token spam score
    far below — the standard perplexity-bucket filter for pretraining
    data, here with the LM trained and applied in one job.

    Plan: explode -> (term count, 1-row total) -> per-token ln p via a
    term join -> per-doc avg. The vocabulary frame is Zipf-compact (AQE
    broadcasts it when it fits); both aggregations partial map-side; the
    explode pipelines in the scan. Exactly the TF-IDF topology
    (tfidf_top_terms) with the doc-term matrix folded to a scalar."""
    tok = docs.select(
        F.col(id_col), F.explode(tokens(F.col(text_col))).alias("term")
    )
    vocab = tok.groupBy("term").agg(F.count(F.lit(1)).alias("n_t"))
    total = tok.agg(F.count(F.lit(1)).alias("n_total"))
    scored = (
        tok.join(vocab, "term")
        .crossJoin(F.broadcast(total))
        .select(
            F.col(id_col),
            F.log(F.col("n_t") / F.col("n_total")).alias("lp"),
        )
    )
    return scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_tokens"),
        half_up(F.avg("lp"), round_to).alias("avg_logprob"),
    )


def corpus_report(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_quality: float = 0.55,
) -> DataFrame:
    """X77: the corpus DATASET CARD — the one-page summary a training
    team reads before consuming a corpus: size, token budget, language
    mix, quality distribution, and exact-duplicate rate, as
    (metric, value) rows.

    One plan, two passes over nothing but the fused scoring map: the
    per-doc metrics come from :func:`clean_scores` (single Arrow pass,
    pipelined into the scan), and every report line is an aggregate of
    that frame computed in ONE global aggregation (the distinct-text
    dup rate expands to Catalyst's standard two-phase distinct inside
    the same aggregate). Shares are averages of 0/1 indicators;
    NULL-quality docs (empty text) are excluded from the quality mean
    by both engines' AVG semantics. All floats half_up-rounded — the
    report is oracle-hash-checked, so the card's numbers are exactly
    reproducible."""
    from nginx_analytics_spark.functions.rounding import half_up

    s = clean_scores(docs, id_col, text_col)
    ind = lambda c: F.when(c, 1.0).otherwise(0.0)  # noqa: E731
    agg = s.agg(
        F.count(F.lit(1)).cast("double").alias("n_docs"),
        F.sum("ws_tokens").cast("double").alias("total_ws_tokens"),
        half_up(F.avg("ws_tokens")).alias("mean_ws_tokens"),
        F.max("ws_tokens").cast("double").alias("max_ws_tokens"),
        half_up(F.avg(ind(F.col("predicted_lang") == "en"))).alias(
            "share_lang_en"
        ),
        half_up(F.avg(ind(F.col("predicted_lang") == "und"))).alias(
            "share_lang_und"
        ),
        half_up(F.avg("quality")).alias("mean_quality"),
        half_up(F.avg(ind(F.col("quality") >= min_quality))).alias(
            "share_quality_pass"
        ),
        half_up(
            F.lit(1.0)
            - F.count_distinct(F.col(text_col)) / F.count(F.lit(1))
        ).alias("exact_dup_rate"),
    )
    names = [
        "n_docs", "total_ws_tokens", "mean_ws_tokens", "max_ws_tokens",
        "share_lang_en", "share_lang_und", "mean_quality",
        "share_quality_pass", "exact_dup_rate",
    ]
    branches = [
        F.struct(F.lit(n).alias("metric"), F.col(n).alias("value"))
        for n in names
    ]
    return agg.select(F.explode(F.array(*branches)).alias("r")).select(
        "r.metric", "r.value"
    )


# --------------------------------------------------------------------------
# X78: the INCREMENTAL dataset card — X77's report recomputed from
# mergeable per-group sketch rollups instead of a raw rescan.
# --------------------------------------------------------------------------


def corpus_rollups(
    docs: DataFrame,
    text_col: str = "text",
    group_col: str = "source",
    kll_k: int = 2048,
    hll_lg_k: int = 12,
) -> DataFrame:
    """One mergeable rollup row per ``group_col`` slice of the corpus —
    the at-rest representation from which the dataset card refreshes
    WITHOUT rescanning raw text (r5 verdict item 6). Per group:

      * ``n_docs`` / ``total_ws_tokens`` — plain additive counts;
      * ``len_sketch`` — KLL(ws_tokens) (X71): any length quantile of
        any group subset later, via lossless-in-guarantee merge;
      * ``text_hll`` — HLL of the raw text values (X60): mergeable
        distinct-text count => exact-dup-rate estimate;
      * ``vocab_theta`` — Theta over whitespace tokens (X72): mergeable
        distinct-vocabulary count that also supports cross-group
        intersection (shared vocabulary between sources).

    Scale shape: both aggregates are partial-aggregated map-side — the
    token explode never shuffles raw tokens, only per-partition sketch
    blobs keyed by group. At 100 TB these rollup rows are O(groups),
    stored beside the corpus; a new batch appends its own rollup row
    and the card is re-read from sketches alone."""
    toks = F.split(F.col(text_col), " ")
    per = docs.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(toks)).cast("bigint").alias("total_ws_tokens"),
        F.kll_sketch_agg_double(
            F.size(toks).cast("double"), F.lit(kll_k)
        ).alias("len_sketch"),
        F.hll_sketch_agg(F.col(text_col), F.lit(hll_lg_k)).alias("text_hll"),
    )
    vocab = (
        docs.select(F.col(group_col), F.explode(toks).alias("token"))
        .groupBy(group_col)
        .agg(F.theta_sketch_agg(F.col("token")).alias("vocab_theta"))
    )
    # LEFT join (r6 ADVICE): explode drops NULL token arrays, so a group
    # whose every text is NULL has no vocab side at all — an inner join
    # would silently drop that group's n_docs/len/HLL rollup row from the
    # card. The left join keeps it with vocab_theta NULL, which the card
    # read's theta_union_agg skips like any NULL aggregate input
    # (verified by test_corpus_rollups_all_null_text_group).
    return per.join(vocab, group_col, "left")


def corpus_report_incremental(
    rollups: DataFrame, round_to: int = 6
) -> DataFrame:
    """The card read: merge the per-group rollup rows into one corpus
    summary — (metric, value) rows like :func:`corpus_report`, but
    computed ENTIRELY in the compressed domain (inputs: O(groups) sketch
    rows, zero raw access). Additive metrics are exact; distinct-vocab
    is a Theta estimate (exact below its 2^12 retention); distinct-text
    is an HLL estimate whose MERGE guarantee is the error bound, not a
    byte-identical sketch (a DataSketches HLL union can promote the
    target representation, so merged vs direct may differ by a count);
    length quantiles carry KLL's rank error. All three are
    property-tested merged-vs-direct under exactly those contracts. ``approx_exact_dup_rate`` = 1 - distinct_texts/n_docs, the
    sketch twin of X77's exact ``exact_dup_rate``."""
    from nginx_analytics_spark.functions.rounding import half_up

    u = rollups.agg(
        F.sum("n_docs").cast("double").alias("n_docs"),
        F.sum("total_ws_tokens").cast("double").alias("total_ws_tokens"),
        F.kll_merge_agg_double("len_sketch").alias("len_u"),
        F.hll_union_agg("text_hll").alias("text_u"),
        F.theta_union_agg("vocab_theta").alias("vocab_u"),
    ).select(
        "n_docs",
        "total_ws_tokens",
        half_up(F.col("total_ws_tokens") / F.col("n_docs"), round_to).alias(
            "mean_ws_tokens"
        ),
        F.kll_sketch_get_quantile_double(F.col("len_u"), F.lit(0.5)).alias(
            "p50_ws_tokens"
        ),
        F.kll_sketch_get_quantile_double(F.col("len_u"), F.lit(0.95)).alias(
            "p95_ws_tokens"
        ),
        F.hll_sketch_estimate("text_u").cast("double").alias("distinct_texts"),
        half_up(
            F.round(F.theta_sketch_estimate("vocab_u"))
        ).alias("distinct_tokens"),
        half_up(
            # clamp: HLL's relative error can estimate distinct > count,
            # and a card must not print a negative dup rate
            F.greatest(
                F.lit(0.0),
                F.lit(1.0)
                - F.hll_sketch_estimate("text_u") / F.col("n_docs"),
            ),
            round_to,
        ).alias("approx_exact_dup_rate"),
    )
    names = [
        "n_docs", "total_ws_tokens", "mean_ws_tokens", "p50_ws_tokens",
        "p95_ws_tokens", "distinct_texts", "distinct_tokens",
        "approx_exact_dup_rate",
    ]
    branches = [
        F.struct(F.lit(n).alias("metric"), F.col(n).alias("value"))
        for n in names
    ]
    return u.select(F.explode(F.array(*branches)).alias("r")).select(
        "r.metric", "r.value"
    )
