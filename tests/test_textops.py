"""Unit semantics for the Gopher-style repetition/quality filters
(functions/textops.py::quality_score) on crafted documents — the oracle
parity test (test_correctness.py) covers the corpus; this pins the
boundary behavior."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kupo_spark.functions.textops import quality_score


def _score(spark, texts):
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id bigint, text string"
    )
    return {r["doc_id"]: r.asDict() for r in quality_score(docs).collect()}


def test_pure_repetition_fails_gopher(spark):
    # "spam spam ... spam": every 2-gram is the same one
    rows = _score(spark, [" ".join(["spam"] * 50)])
    r = rows[0]
    assert r["top_2gram_frac"] == 1.0
    assert r["frac_dup_2gram"] == 1.0
    assert r["n_tokens"] == 50
    assert r["gopher_pass"] is False


def test_diverse_text_passes_gopher(spark):
    text = " ".join(f"word{i:03d}" for i in range(40))
    r = _score(spark, [text])[0]
    assert r["top_2gram_frac"] == pytest.approx(1 / 39, abs=1e-6)
    assert r["frac_dup_2gram"] == 0.0
    assert r["gopher_pass"] is True


def test_single_token_doc_has_empty_gram_stats(spark):
    r = _score(spark, ["lonely"])[0]
    assert r["frac_dup_2gram"] == 0.0
    assert r["top_2gram_frac"] == 0.0
    assert r["n_tokens"] == 1
    assert r["gopher_pass"] is False  # below the token floor


def test_partial_repetition_fractions(spark):
    # tokens: a b a b c -> grams: [ab, ba, ab, bc]; 'a b' occurs twice
    r = _score(spark, ["a b a b c"])[0]
    assert r["top_2gram_frac"] == pytest.approx(2 / 4)
    assert r["frac_dup_2gram"] == pytest.approx(2 / 4)


def test_no_python_in_quality_plan(spark):
    docs = spark.createDataFrame([(1, "a b c")], "doc_id bigint, text string")
    plan = quality_score(docs)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_bpe_piece_count_hand_computed(spark):
    from kupo_spark.functions.textops import bpe_piece_count

    docs = spark.createDataFrame(
        [(1, "ab c3 d-e  f"), (2, ""), (3, "hello world")],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in bpe_piece_count(docs).collect()}
    # ab | c | 3 | d | - | e | f
    assert (got[1].n_pieces, got[1].n_tokens) == (7, 4)
    assert got[1].pieces_per_token == 1.75
    assert (got[2].n_pieces, got[2].n_tokens, got[2].pieces_per_token) == (0, 0, 0.0)
    assert (got[3].n_pieces, got[3].n_tokens) == (2, 2)


def test_empty_doc_stats_define_to_zero(spark):
    from kupo_spark.functions.textops import quality_score, token_stats

    docs = spark.createDataFrame([(1, ""), (2, "  ")], "doc_id long, text string")
    ts = {r.doc_id: r for r in token_stats(docs).collect()}
    assert ts[1].n_tokens == 0 and ts[1].avg_token_len == 0.0 and ts[1].ttr == 0.0
    qs = {r.doc_id: r for r in quality_score(docs).collect()}
    assert qs[2].stopword_ratio == 0.0 and qs[2].quality_score == 0.0
    assert not qs[2].gopher_pass


def test_tfidf_vocab_broadcast_gate(spark):
    """tfidf_top_terms above the vocabulary-broadcast cutoff falls back to
    a shuffled df join — same rows either way (the gate is a plan choice,
    never a semantics choice)."""
    from kupo_spark.functions.textops import tfidf_top_terms

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    bcast = sorted(map(tuple, tfidf_top_terms(docs).collect()))
    shuffled = sorted(
        map(tuple, tfidf_top_terms(docs, broadcast_vocab_limit=0).collect())
    )
    assert bcast == shuffled and len(bcast) > 0
