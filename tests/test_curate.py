"""Curation composition: the optional learned gates (LM floor, quality
classifier) and their precedence behind the dedup/length gates."""

from __future__ import annotations

import pytest

from kupo_spark.functions.classifier import FROZEN_QUALITY_MODEL, score_quality
from kupo_spark.functions.curate import curate
from kupo_spark.functions.lm import lm_score

DOCS = "/root/testdata/sf0.001/documents.parquet"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(DOCS)


def test_lm_gate_drops_below_floor_with_precedence(docs):
    base = {r.doc_id: r for r in curate(docs).collect()}
    lm = {r.doc_id: r.avg_logprob for r in lm_score(docs).collect()}
    floor = sorted(lm.values())[len(lm) // 10]  # ~10th percentile
    out = {r.doc_id: r for r in curate(docs, lm_floor=floor).collect()}
    flagged = [d for d, r in out.items() if r.drop_reason == "lm_outlier"]
    assert flagged, "floor produced no lm_outlier drops"
    for d in flagged:
        assert lm[d] < floor
        # precedence: only docs that passed every earlier gate reach the LM gate
        assert base[d].keep
    # docs dropped by earlier gates keep their original reason
    for d, r in base.items():
        if not r.keep:
            assert out[d].drop_reason == r.drop_reason


def test_quality_gate_drops_low_prob(docs):
    # pick a threshold that must flag something: just above the median
    # classifier prob of the docs that survive the earlier gates
    base = {r.doc_id: r.keep for r in curate(docs).collect()}
    probs = {r.doc_id: r.prob for r in score_quality(docs, FROZEN_QUALITY_MODEL).collect()}
    kept_probs = sorted(probs[d] for d, k in base.items() if k)
    thr = kept_probs[len(kept_probs) // 2] + 1e-9
    out = {
        r.doc_id: r
        for r in curate(
            docs, quality_model=FROZEN_QUALITY_MODEL, quality_threshold=thr
        ).collect()
    }
    flagged = [d for d, r in out.items() if r.drop_reason == "low_quality"]
    assert flagged, "classifier gate produced no drops"
    assert all(probs[d] < thr and base[d] for d in flagged)


def test_new_gates_only_demote_previously_kept_docs(docs):
    # enabling both learned gates must leave every earlier verdict intact:
    # previously-dropped docs keep their reason; previously-kept docs are
    # either still kept or demoted with one of the NEW reasons only
    base = {r.doc_id: r for r in curate(docs).collect()}
    gated = {
        r.doc_id: r
        for r in curate(
            docs,
            lm_floor=-10.0,
            quality_model=FROZEN_QUALITY_MODEL,
            quality_threshold=0.9,
        ).collect()
    }
    assert set(base) == set(gated)
    for d, b in base.items():
        g = gated[d]
        if not b.keep:
            assert (g.keep, g.drop_reason) == (b.keep, b.drop_reason)
        else:
            assert g.keep or g.drop_reason in ("lm_outlier", "low_quality")
