"""Bucketed co-located join (the 100 TB spent-resolution layout), ordered
results (O1), and point assertions (P16 point bounds)."""

from __future__ import annotations

import pytest

from kupo_spark.operators.bucketing import bucketed_resolve, write_bucketed_pair
from kupo_spark.operators.fold_inputs import UnknownPointError, fold_inputs
from kupo_spark.plans.explain import formatted_plan


def test_bucketed_resolve_join_has_no_shuffle(spark, blocks):
    write_bucketed_pair(blocks, "bktest", buckets=8)
    # disable broadcast so the planner must pick the join strategy a
    # 100 TB-sized spends table would get: a sort-merge join — which the
    # bucketed+sorted layout serves with NO shuffle exchange on either side
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketed_resolve(spark, "bktest")
        plan = formatted_plan(joined)
        assert "SortMergeJoin" in plan, plan
        assert "hashpartitioning" not in plan, plan  # no shuffle exchange
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    # and it computes the same spent-marks as the shuffling join
    from kupo_spark.operators.indexer import build_index

    expect = build_index(blocks).inputs.where("spent_at IS NOT NULL").count()
    got = joined.where("spent_at IS NOT NULL").count()
    assert got == expect


def test_sorted_result_is_chain_ordered(index):
    rows = fold_inputs(
        index, "*", sorted_result=True, order="oldest_first"
    ).select("created_at", "transaction_index", "output_index").collect()
    keys = [(r[0], r[1], r[2]) for r in rows]
    assert keys == sorted(keys)
    rows_desc = fold_inputs(
        index, "*", sorted_result=True, order="most_recent_first"
    ).select("created_at", "transaction_index", "output_index").collect()
    keys_desc = [(r[0], r[1], r[2]) for r in rows_desc]
    assert keys_desc == sorted(keys_desc, reverse=True)


def test_point_bound_asserted(index):
    from kupo_spark import chainspec as cs

    good = (50, cs.md5_hex("blk50"))
    n = fold_inputs(index, "*", created_after_point=good).count()
    assert n == fold_inputs(index, "*", created_after=50).count()
    with pytest.raises(UnknownPointError):
        fold_inputs(index, "*", created_after_point=(50, "00" * 16)).count()
    with pytest.raises(UnknownPointError):
        fold_inputs(index, "*", spent_before_point=(10 ** 9, cs.md5_hex("blk50"))).count()
