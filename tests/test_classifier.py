"""Learned quality filter: the folded codegen scorer must match MLlib's
transform bit-for-near-bit, the weak-label bootstrap must actually learn
the rule it was taught, and the scoring plan must stay JVM-only."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kupo_spark.functions.classifier import (
    FEATURES,
    QualityModel,
    score_quality,
    train_quality_classifier,
)
from kupo_spark.functions.textops import quality_score

DOCS = "/root/testdata/sf0.001/documents.parquet"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(DOCS)


@pytest.fixture(scope="module")
def model(docs):
    return train_quality_classifier(docs)


@pytest.mark.slow
def test_folded_scorer_matches_mllib_transform(docs, model):
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import VectorAssembler

    feats = quality_score(docs)
    labels = feats.select("doc_id", F.col("gopher_pass").cast("double").alias("label"))
    assembled = VectorAssembler(
        inputCols=FEATURES, outputCol="features", handleInvalid="skip"
    ).transform(feats.join(labels, "doc_id")).persist()
    lr_model = LogisticRegression(
        maxIter=50, regParam=0.0, featuresCol="features", labelCol="label"
    ).fit(assembled)
    ml_probs = {
        r.doc_id: float(r.probability[1])
        for r in lr_model.transform(assembled).select("doc_id", "probability").collect()
    }
    folded = {r.doc_id: r.prob for r in score_quality(docs, model).collect()}
    assert set(folded) == set(ml_probs)
    assert max(abs(folded[d] - ml_probs[d]) for d in folded) < 1e-9


def test_weak_label_bootstrap_learns_the_rule(docs, model):
    # scored verdict vs the Gopher rule it was trained to imitate: the
    # linear model can't be perfect, but it must beat chance by a wide
    # margin on its own training distribution
    truth = {r.doc_id: r.gopher_pass for r in quality_score(docs).collect()}
    pred = {r.doc_id: r.pred for r in score_quality(docs, model).collect()}
    agree = sum(1 for d in truth if truth[d] == pred[d]) / len(truth)
    assert agree > 0.85, f"classifier agrees with weak label only {agree:.2%}"
    # both classes are actually present in the corpus and the predictions
    assert len({v for v in truth.values()}) == 2
    assert len({v for v in pred.values()}) == 2


def test_scoring_plan_stays_jvm(docs, model):
    from kupo_spark.plans.explain import formatted_plan

    plan = formatted_plan(score_quality(docs, model))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_model_expr_roundtrip_literals():
    m = QualityModel(features=("a", "b"), weights=(0.5, -2.0), intercept=1.25)
    expr = m.score_expr()
    assert "0.5" in expr and "-2.0" in expr and "1.25" in expr


def test_frozen_model_scores_spread(docs):
    from kupo_spark.functions.classifier import FROZEN_QUALITY_MODEL

    rows = score_quality(docs, FROZEN_QUALITY_MODEL).collect()
    probs = [r.prob for r in rows]
    assert 0.0 <= min(probs) and max(probs) <= 1.0
    assert len({r.pred for r in rows}) == 2  # both verdicts occur
