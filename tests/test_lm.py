"""Bigram stupid-backoff LM scoring: DuckDB oracle parity, backoff
semantics under a held-out training split, and plan shape."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from kupo_spark import oracle_pipeline
from kupo_spark.functions.lm import bigram_counts, lm_score, token_pairs, unigram_counts
from tools.check_correctness import rows_key

DOCS = "/root/testdata/sf0.001/documents.parquet"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(DOCS)


def test_lm_score_matches_duckdb(docs, duck):
    sdf = lm_score(docs)
    srows, scols = sdf.collect(), sdf.columns
    res = duck.execute(oracle_pipeline.lm_score_sql())
    ocols = [d[0] for d in res.description]
    orows = res.fetchall()
    assert len(srows) == len(orows) > 0
    assert rows_key(srows, scols) == rows_key(orows, ocols)


def test_lm_self_scores_are_negative_log_probs(docs):
    rows = lm_score(docs).collect()
    scored = [r for r in rows if r.n_transitions > 0]
    assert scored and all(r.avg_logprob < 0 for r in scored)


def test_lm_backoff_hand_computed(spark):
    # train: "a b", "a c" -> c(a)=2, c(b)=1, c(c)=1, N=4, c(a b)=c(a c)=1
    train = spark.createDataFrame([(0, "a b"), (1, "a c")], "doc_id long, text string")
    # score: "a b" seen bigram ln(1/2); "b c" unseen -> ln(.4*1/4);
    # "c z" unseen w2 OOV -> ln(.4*1/4)
    target = spark.createDataFrame([(9, "a b"), (8, "b c"), (7, "c z")],
                                   "doc_id long, text string")
    got = {r.doc_id: r for r in lm_score(target, train_docs=train).collect()}
    assert got[9].avg_logprob == round(math.log(1 / 2), 6)
    assert got[8].avg_logprob == round(math.log(0.4 * 1 / 4), 6)
    assert got[7].avg_logprob == round(math.log(0.4 * 1 / 4), 6)
    # short doc: nothing to score
    short = spark.createDataFrame([(6, "a")], "doc_id long, text string")
    r = lm_score(short, train_docs=train).collect()[0]
    assert r.n_transitions == 0 and r.avg_logprob == 0.0


def test_lm_heldout_split_backoff_fires(spark, docs):
    # train on even doc_ids, score odd: some bigrams are unseen, so the
    # held-out scores must dip below the self-trained ones somewhere
    train = docs.where(F.col("doc_id") % 2 == 0)
    target = docs.where(F.col("doc_id") % 2 == 1)
    held = {r.doc_id: r.avg_logprob for r in lm_score(target, train_docs=train).collect()}
    self_ = {r.doc_id: r.avg_logprob for r in lm_score(docs).collect()}
    diffs = [held[d] - self_[d] for d in held]
    assert min(diffs) < 0  # backoff penalized at least one held-out doc


def test_lm_counts_shapes(docs):
    uni = unigram_counts(docs)
    bi = bigram_counts(docs)
    pairs = token_pairs(docs)
    n_pairs = pairs.count()
    assert uni.count() > 0 and bi.count() > 0
    assert bi.agg(F.sum("c")).collect()[0][0] == n_pairs


def test_lm_plan_stays_jvm(docs):
    from kupo_spark.plans.explain import formatted_plan

    plan = formatted_plan(lm_score(docs))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
