"""X81: distilled corpus-quality classifier (ml/quality.py)."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from nginx_analytics_spark.ml import quality
from nginx_analytics_spark.operators import sampling
from nginx_analytics_spark.sources import load_table

SF = "/root/testdata/sf0.001"


def _auc(pdf) -> float:
    pos = pdf[pdf.label == 1.0].quality_prob.values
    neg = pdf[pdf.label == 0.0].quality_prob.values
    return float(
        np.mean([(p > neg).mean() + 0.5 * (p == neg).mean() for p in pos])
    )


def test_student_learns_the_gate_stack(spark):
    """The distillation contract: the cheap linear scorer must rank the
    teacher's keep/reject verdicts far above chance (AUC gate; measured
    0.96 on the fixture — the gate leaves regeneration margin)."""
    docs = load_table(spark, SF, "documents")
    model = quality.train_quality_classifier(docs)
    scored = quality.score_quality(model, docs).join(
        quality.weak_labels(docs), "doc_id"
    )
    pdf = scored.toPandas()
    assert set(pdf.label.unique()) == {0.0, 1.0}  # both classes present
    assert _auc(pdf) >= 0.9
    assert pdf.quality_prob.between(0.0, 1.0).all()


def test_labels_cover_train_split_only_scores_cover_everyone(spark):
    """The teacher labels ONLY the train split (benchmark carve-out docs
    are dropped for being benchmarks, not for quality — labeling them 0
    would teach the student the hash split); the student still SCORES
    every document."""
    docs = load_table(spark, SF, "documents")
    labels = quality.weak_labels(docs)
    frac = sampling.portable_frac("doc_id", salt=7)
    n_train = docs.filter(frac >= 0.05).count()
    n_all = docs.count()
    assert labels.count() == n_train < n_all

    from nginx_analytics_spark import registry

    out = registry.queries()["quality_classifier_scores"](spark, SF)
    pdf = out.toPandas()
    assert len(pdf) == n_all
    assert pdf.label.isna().sum() == n_all - n_train  # carve-out: scored, unlabeled
    assert pdf.quality_prob.notna().all()


def test_feature_projection_is_shuffle_free(spark):
    """The student's cost model: feature derivation must plan as scan +
    project, no exchange (the whole point of distilling the gate
    stack)."""
    import io
    from contextlib import redirect_stdout

    feats = quality.quality_features(load_table(spark, SF, "documents"))
    buf = io.StringIO()
    with redirect_stdout(buf):
        feats.explain("formatted")
    assert "Exchange" not in buf.getvalue()
    assert set(quality.QUALITY_FEATURES) <= set(feats.columns)


def test_model_save_load_roundtrip(spark, tmp_path):
    """S10 parity: the fitted pipeline persists and reloads with
    identical scores (same model bytes — no refit nondeterminism)."""
    from pyspark.ml import PipelineModel

    docs = load_table(spark, SF, "documents").limit(200)
    model = quality.train_quality_classifier(docs)
    path = str(tmp_path / "qmodel")
    model.write().overwrite().save(path)
    back = PipelineModel.load(path)
    a = {r.doc_id: r.quality_prob for r in quality.score_quality(model, docs).collect()}
    b = {r.doc_id: r.quality_prob for r in quality.score_quality(back, docs).collect()}
    assert a == b


def test_null_text_docs_score_instead_of_crashing(spark):
    """r6 ADVICE: split/length propagate NULL, and eight NULL features
    would hit VectorAssembler's default handleInvalid='error'. The
    scorer advertises pricing EVERY production document, so NULL text
    coalesces to the empty-document feature vector — features are all
    non-NULL, training survives, and the NULL-text doc scores in the
    bottom quality tail (empty text fails every teacher gate)."""
    docs = load_table(spark, SF, "documents").limit(200)
    with_null = docs.unionByName(
        spark.createDataFrame(
            [(10**9, None, "und", "synthetic", 0)], docs.schema
        )
    )
    feats = quality.quality_features(with_null)
    row = feats.filter(F.col("doc_id") == 10**9).collect()[0]
    assert all(row[c] is not None for c in quality.QUALITY_FEATURES)

    model = quality.train_quality_classifier(with_null)
    scored = quality.score_quality(model, with_null).toPandas()
    assert len(scored) == with_null.count()
    p_null = scored.set_index("doc_id").quality_prob[10**9]
    assert p_null <= scored.quality_prob.median()


def test_weak_labels_accept_precomputed_survivors(spark):
    """r7 review: a caller that already ran the gate stack (the handoff
    job) passes its survivor set as ``kept``; labels must be identical
    to the self-curated path at the same gate parameters — including
    NON-default ones, which train_quality_classifier now threads
    through instead of silently teaching against the default gates."""
    from nginx_analytics_spark.operators import curation

    docs = load_table(spark, SF, "documents").limit(300)
    bf = 0.2  # non-default gate split
    kept = curation.curate_documents(docs, bench_fraction=bf)
    via_kept = quality.weak_labels(docs, bench_fraction=bf, kept=kept)
    direct = quality.weak_labels(docs, bench_fraction=bf)
    a = {(r.doc_id, r.label) for r in via_kept.collect()}
    b = {(r.doc_id, r.label) for r in direct.collect()}
    assert a == b and a
