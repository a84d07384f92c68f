"""startOrResume semantics (Configuration.hs:182-241) and metrics text."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kupo_spark.operators.serve import metrics_text
from kupo_spark.streaming.indexer import StreamingIndexer, resume_bound


def test_start_requires_since_on_fresh_index(spark, tmp_path):
    ix = StreamingIndexer(str(tmp_path / "fresh"))
    with pytest.raises(ValueError, match="since required"):
        resume_bound(ix, spark)
    assert resume_bound(ix, spark, since=0) == (0, True)


def test_resume_at_stored_tip(spark, blocks, tmp_path):
    ix = StreamingIndexer(str(tmp_path / "resume"))
    ix.process_batch(blocks.where(F.col("slot_no") < 10), 0)
    assert resume_bound(ix, spark) == (9, False)
    # an older/equal --since resumes from the checkpoint — re-running the
    # original launch command is a supported operational pattern
    # (Configuration.hs:203-211)
    assert resume_bound(ix, spark, since=3) == (9, False)
    assert resume_bound(ix, spark, since=9) == (9, False)
    # only a since NEWER than the most recent checkpoint conflicts
    with pytest.raises(ValueError, match="more recent"):
        resume_bound(ix, spark, since=10)


def test_resume_bound_all_retracted_is_inclusive(spark, blocks, tmp_path):
    """A workdir whose checkpoints are ALL retracted resumes as a fresh
    start: the bound must be INCLUSIVE or a re-forwarded block at exactly
    `since` is silently skipped (the caller's had_data check sees the raw
    commit entries, which remain non-empty)."""
    from kupo_spark.streaming.indexer import resume_bound

    ix = StreamingIndexer(str(tmp_path / "allrb"))
    ix.process_batch(
        blocks.where((F.col("slot_no") >= 1) & (F.col("slot_no") < 10)), 0
    )
    assert resume_bound(ix, spark) == (9, False)
    ix.append_rollback(0)  # retract every checkpoint (all slots are >= 1)
    assert resume_bound(ix, spark, since=5) == (5, True)
    assert resume_bound(ix, spark) == (0, True)


def test_metrics_text(index):
    text = metrics_text(index)
    assert "# TYPE kupo_inputs gauge" in text
    assert "kupo_most_recent_checkpoint 99" in text
    assert text.endswith("\n")
