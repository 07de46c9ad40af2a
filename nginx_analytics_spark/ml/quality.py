"""X81: learned corpus-quality classifier — the gate-distillation
pattern of production training-data pipelines (GPT-3's Appendix-A
quality filter, CCNet's fasttext scorer): run the EXPENSIVE curation
gate stack (X39: fused language/quality kernel + repetition stats +
cross-split contamination scan) once over a labeled slice, then distill
its verdicts into a single cheap linear scorer whose features are plain
one-scan column expressions. The student then prices every future
document at one codegen'd projection + an 8-float dot product — no
Arrow kernel, no n-gram scans, no contamination join — and, unlike the
boolean gates, emits a CALIBRATED probability that downstream
temperature sampling (X28) can weight by instead of thresholding.

Spark-first shape: features are pure ``pyspark.sql.functions``
expressions fused into the scan (zero exchange before the fit's own
treeAggregate); the fit is MLlib ``LogisticRegression`` (U2/U3/U5
surface — the same Pipeline machinery as ml/response_time.py, reference
prediction/response_time_prediction.py:61-70); scoring is a broadcast
of the 8-coefficient model inside one projection.

Honesty note: on the synthetic fixture the teacher IS the heuristic
gate stack, so the student provably approximates those heuristics (the
AUC gate in tests/test_ml_quality.py). In production the same harness
distills whatever expensive teacher you have — LLM judges, human
ratings — the mechanics are identical; what this module contributes is
the distillation plumbing at engine scale, not the teacher.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nginx_analytics_spark.operators import curation, sampling

#: student feature names, in assembly order (all derived in ONE scan)
QUALITY_FEATURES = [
    "ws_tokens",
    "n_chars",
    "avg_word_len",
    "punct_ratio",
    "digit_ratio",
    "upper_ratio",
    "distinct_token_ratio",
    "top_token_share",
]


def quality_features(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, f1..f8) — the student's cheap feature projection: token/char
    counts, shape ratios, vocabulary richness, and the max single-token
    frequency share (a one-expression repetition proxy). Every column is
    a JVM expression over ONE tokenization (let-bound array, the
    ``word_shingles`` hygiene pattern) — the plan is scan + project,
    shuffle-free at any scale.

    NULL text is coalesced to '' first (r6 ADVICE): split/length
    propagate NULL, and eight NULL features would hit VectorAssembler's
    default ``handleInvalid='error'`` at runtime — the scorer
    advertises pricing EVERY production document, so a NULL-text doc
    gets the empty-document feature vector (and the teacher's gates
    reject empty text, so the student learns to score it low).

    Output contract (r7 ADVICE): the returned projection is
    ``(id_col,)`` + :data:`QUALITY_FEATURES` ONLY — the coalesced text
    is an internal let-binding and is never propagated, so no caller
    can mistake '' for the corpus's NULL."""
    txt = F.coalesce(F.col(text_col), F.lit(""))
    toks = F.split(txt, " ")
    n_tok = F.size(toks).cast("double")
    n_chr = F.length(txt).cast("double")
    counted = (
        docs.select(
            F.col(id_col),
            txt.alias(text_col),
            toks.alias("_t"),
            n_tok.alias("ws_tokens"),
            n_chr.alias("n_chars"),
        )
        .select(
            id_col,
            "ws_tokens",
            "n_chars",
            (F.col("n_chars") / F.greatest(F.col("ws_tokens"), F.lit(1.0))).alias(
                "avg_word_len"
            ),
            (
                F.length(F.regexp_replace(text_col, r"[A-Za-z0-9 ]", ""))
                / F.greatest(F.col("n_chars"), F.lit(1.0))
            ).alias("punct_ratio"),
            (
                F.length(F.regexp_replace(text_col, r"[^0-9]", ""))
                / F.greatest(F.col("n_chars"), F.lit(1.0))
            ).alias("digit_ratio"),
            (
                F.length(F.regexp_replace(text_col, r"[^A-Z]", ""))
                / F.greatest(F.col("n_chars"), F.lit(1.0))
            ).alias("upper_ratio"),
            (
                F.size(F.array_distinct("_t"))
                / F.greatest(F.col("ws_tokens"), F.lit(1.0))
            ).alias("distinct_token_ratio"),
            # max token frequency via a single fold over the SORTED array
            # (state = (prev, current run, best run)): O(n log n) sort +
            # O(n) fold, all codegen'd — NOT the transform×filter
            # formulation, whose per-doc cost is O(tokens²) and would
            # dominate on long documents at scale
            (
                F.aggregate(
                    F.array_sort("_t"),
                    F.struct(
                        F.lit("").alias("prev"),
                        F.lit(0.0).alias("run"),
                        F.lit(0.0).alias("best"),
                    ),
                    lambda acc, t: F.struct(
                        t.alias("prev"),
                        F.when(t == acc["prev"], acc["run"] + 1.0)
                        .otherwise(F.lit(1.0))
                        .alias("run"),
                        F.greatest(
                            acc["best"],
                            F.when(t == acc["prev"], acc["run"] + 1.0).otherwise(
                                F.lit(1.0)
                            ),
                        ).alias("best"),
                    ),
                    lambda acc: acc["best"],
                )
                / F.greatest(F.col("ws_tokens"), F.lit(1.0))
            ).alias("top_token_share"),
        )
    )
    return counted


def weak_labels(
    docs: DataFrame,
    bench_fraction: float = curation.BENCH_FRACTION,
    contam_n: int = curation.CONTAM_N,
    kept: DataFrame | None = None,
) -> DataFrame:
    """(doc_id, label) over the TRAIN split only: label 1 iff the doc
    survives the full X39 curation gate stack. The benchmark carve-out
    is excluded from the teacher signal entirely — those docs are
    dropped for being benchmarks, not for being low quality, and
    labeling them 0 would teach the student the hash split.

    The id column is fixed to ``doc_id`` because the TEACHER is: the
    curation gate stack carves its benchmark split on
    ``portable_frac("doc_id", salt=7)`` internally, and the train
    filter here must be the byte-identical predicate — a configurable
    id would silently desynchronize the two splits and label carve-out
    docs 0 (r6 review finding).

    ``kept`` lets a caller that ALREADY ran the gate stack (the handoff
    job curates the same corpus with the same parameters) pass its
    survivor set instead of paying the expensive gates a second time —
    it MUST be the output of ``curate_documents(docs,
    bench_fraction=bench_fraction, contam_n=contam_n)`` or the teacher
    desynchronizes from the gate the pipeline applies (r7 review)."""
    frac = sampling.portable_frac("doc_id", salt=7)  # the X39 split salt
    train = docs.filter(frac >= bench_fraction)
    if kept is None:
        kept = curation.curate_documents(
            docs, bench_fraction=bench_fraction, contam_n=contam_n
        )
    kept = kept.select("doc_id")
    return train.select("doc_id").join(
        kept.withColumn("label", F.lit(1.0)), "doc_id", "left"
    ).fillna({"label": 0.0})


def train_quality_classifier(
    docs: DataFrame,
    seed: int = 42,
    bench_fraction: float = curation.BENCH_FRACTION,
    contam_n: int = curation.CONTAM_N,
    kept: DataFrame | None = None,
):
    """Fit the distilled scorer: features -> standardized logistic
    regression (deterministic LBFGS under a fixed seed and layout).
    Returns the fitted PipelineModel; persist with ``model.save(path)``
    exactly like the response-time model (S10). ``bench_fraction`` /
    ``contam_n`` / ``kept`` thread through to :func:`weak_labels` so a
    caller that curates with non-default gates distills against THOSE
    gates, not the defaults (r7 review)."""
    from pyspark.ml import Pipeline
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import StandardScaler, VectorAssembler

    data = quality_features(docs).join(
        weak_labels(
            docs,
            bench_fraction=bench_fraction,
            contam_n=contam_n,
            kept=kept,
        ),
        "doc_id",
    )
    pipe = Pipeline(
        stages=[
            VectorAssembler(inputCols=QUALITY_FEATURES, outputCol="raw"),
            StandardScaler(inputCol="raw", outputCol="features"),
            LogisticRegression(
                featuresCol="features",
                labelCol="label",
                maxIter=50,
                regParam=0.01,
            ),
        ]
    )
    return pipe.fit(data)


def score_quality(model, docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(id, quality_prob) for every document — P(survives the gate
    stack) from the distilled model: one feature projection + an
    8-float dot product per row."""
    from pyspark.ml.functions import vector_to_array

    scored = model.transform(quality_features(docs))
    return scored.select(
        id_col,
        vector_to_array("probability")[1].alias("quality_prob"),
    )
