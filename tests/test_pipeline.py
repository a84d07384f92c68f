"""The end-to-end preparation flow: stage accounting, determinism, and
the exported corpus being exactly the curated+sampled kept set."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kupo_spark.functions.classifier import FROZEN_QUALITY_MODEL
from kupo_spark.functions.pipeline import prepare_training_data

DOCS = "/root/testdata/sf0.001/documents.parquet"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(DOCS)


def test_full_flow_accounting_and_export(docs, tmp_path, spark):
    # pick an LM floor that must fire: the median self-trained score
    # (kept docs straddle the median)
    from kupo_spark.functions.lm import lm_score

    scores = sorted(r.avg_logprob for r in lm_score(docs).collect())
    floor = scores[len(scores) // 2]
    manifest, report = prepare_training_data(
        docs,
        str(tmp_path / "shards"),
        n_shards=4,
        substring_k=8,
        lm_floor=floor,
        quality_model=FROZEN_QUALITY_MODEL,
        quality_threshold=0.2,
        sample_fraction=0.9,
        seed="e2e",
    )
    assert report["n_input"] == docs.count()
    assert report["n_kept"] == report["n_input"] - sum(report["drop_reasons"].values())
    # exported = sampled subset of kept
    assert 0 < report["n_exported"] <= report["n_kept"]
    assert report["n_shards"] <= 4
    # every exported doc is readable and unique
    out = spark.read.parquet(str(tmp_path / "shards"))
    assert out.count() == report["n_exported"]
    assert out.select("doc_id").distinct().count() == report["n_exported"]
    # the learned LM gate specifically fired (not just the dedup gates)
    assert report["drop_reasons"].get("lm_outlier", 0) > 0


def test_flow_is_deterministic(docs, tmp_path):
    kw = dict(n_shards=4, substring_k=8, sample_fraction=0.8, seed="rep")
    _, r1 = prepare_training_data(docs, str(tmp_path / "a"), **kw)
    _, r2 = prepare_training_data(docs, str(tmp_path / "b"), **kw)
    assert r1 == r2


def test_substring_stage_feeds_curation(docs, tmp_path):
    # with aggressive tiling the rewritten texts change the verdicts:
    # the report must reflect chunk removals
    _, report = prepare_training_data(
        docs, str(tmp_path / "s"), n_shards=2, substring_k=4
    )
    assert report["n_chunks_removed"] > 0
