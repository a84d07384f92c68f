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
    manifest, report = prepare_training_data(
        docs,
        str(tmp_path / "shards"),
        n_shards=4,
        substring_k=8,
        lm_floor=-10.0,
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
    # learned gates actually fired somewhere in the histogram
    assert set(report["drop_reasons"]) & {"lm_outlier", "low_quality", "exact_dup",
                                          "near_dup", "too_short"}


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
