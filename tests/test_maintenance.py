"""Rollback / GC state-transition properties — the analog of the reference's
state-machine layer (test/Test/Kupo/AppSpec.hs): apply retractions and check
invariants against expected UTxO-set behavior."""

from __future__ import annotations

from pyspark.sql import functions as F

from kupo_spark.operators import maintenance as mt


def test_rollback_at_tip_is_noop(index):
    tip = index.checkpoints.agg(F.max("slot_no")).collect()[0][0]
    rolled = mt.rollback_to(index, tip)
    assert rolled.inputs.count() == index.inputs.count()
    assert rolled.checkpoints.count() == index.checkpoints.count()
    # no rows un-spent
    assert (
        rolled.inputs.where(F.col("spent_at").isNotNull()).count()
        == index.inputs.where(F.col("spent_at").isNotNull()).count()
    )


def test_rollback_retracts_suffix_and_unspends(index):
    s = 50
    rolled = mt.rollback_to(index, s)
    assert rolled.inputs.where(F.col("created_at") > s).count() == 0
    assert rolled.inputs.where(F.col("spent_at") > s).count() == 0
    # un-spent rows cleared all spend metadata
    bad = rolled.inputs.where(
        F.col("spent_at").isNull()
        & (F.col("spent_by").isNotNull() | F.col("spent_with").isNotNull())
    )
    assert bad.count() == 0
    assert rolled.checkpoints.agg(F.max("slot_no")).collect()[0][0] <= s


def test_rollback_is_idempotent(index):
    s = 40
    once = mt.rollback_to(index, s)
    twice = mt.rollback_to(once, s)
    assert once.inputs.count() == twice.inputs.count()


def test_prune_keeps_unspent(index):
    pruned = mt.prune_inputs(index, k=10)
    assert (
        pruned.inputs.where(F.col("spent_at").isNull()).count()
        == index.inputs.where(F.col("spent_at").isNull()).count()
    )
    tip = index.checkpoints.agg(F.max("slot_no")).collect()[0][0]
    assert pruned.inputs.where(F.col("spent_at") < tip - 10).count() == 0


def test_prune_binary_data_drops_orphans(index):
    rolled = mt.rollback_to(index, 10)
    gc = mt.prune_binary_data(rolled)
    n_before = index.binary_data.count()
    n_after = gc.binary_data.count()
    assert n_after <= n_before
    # every surviving payload is referenced
    refs = rolled.inputs.where(F.col("datum_hash").isNotNull()).select(
        F.col("datum_hash").alias("binary_data_hash")
    ).distinct()
    assert gc.binary_data.join(refs, "binary_data_hash", "left_anti").count() == 0


def test_delete_by_pattern(index):
    from kupo_spark import chainspec as cs

    pat = f"{cs.payment_credential_of(13)}/*"
    left = mt.delete_by_pattern(index, pat)
    from kupo_spark.patterns import pattern_from_text, to_column

    assert left.inputs.where(to_column(pattern_from_text(pat))).count() == 0
    assert left.inputs.count() < index.inputs.count()
