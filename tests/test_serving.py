"""Warm serving path — result parity with the cold fold, order-without-sort
proof, and plan shape (no Exchange / Sort / Join in a hot point lookup)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kupo_spark import chainspec as cs
from kupo_spark.operators.fold_inputs import fold_inputs
from kupo_spark.operators.serving import Serving
from kupo_spark.plans.explain import formatted_plan


@pytest.fixture(scope="module")
def serving(index):
    s = Serving(index, partitions=4).warm()
    yield s
    s.close()


CASES = [
    {"pattern": "*"},
    {"pattern": cs.address_of(42)},
    {"pattern": f"*@{cs.transaction_id_of(123)}"},
    {"pattern": f"*/{cs.delegation_credential_of(5)}", "status": "spent"},
    {"pattern": f"{cs.policy_id_of(3)}.*"},
    {"pattern": "*", "created_after": 20, "created_before": 80, "status": "unspent"},
    {"pattern": "*", "filter_policy_id": cs.policy_id_of(3)},
]


@pytest.mark.parametrize("case", CASES)
def test_serving_matches_cold_fold_in_order(serving, index, case):
    """Same rows, same order — without any per-query sort on the hot path."""
    hot = [tuple(r) for r in serving.fold_rows(**case)]
    cold = [
        tuple(r)
        for r in fold_inputs(index, sorted_result=True, **case).collect()
    ]
    # chain order ties only on identical (created_at, transaction_index,
    # output_index), which the synthetic chain never produces — so exact
    # list equality is the correct check
    assert hot == cold


def test_oldest_first_is_reversal(serving, index):
    addr = cs.address_of(42)
    hot = [tuple(r) for r in serving.fold_rows(addr, order="oldest_first")]
    cold = [
        tuple(r)
        for r in fold_inputs(
            index, addr, sorted_result=True, order="oldest_first"
        ).collect()
    ]
    assert hot == cold


def test_hot_point_lookup_plan_is_scan_only(serving):
    """The warm plan must be filter+project over the in-memory relation:
    no Exchange, no Sort, no Join — those were paid once at warm()."""
    df = serving.fold(cs.address_of(42))
    plan = formatted_plan(df)
    assert "InMemoryTableScan" in plan
    # explain prints the cached relation's BUILD plan below InMemoryRelation;
    # only the query side above it must be join/sort/shuffle-free
    query_side = plan.split("InMemoryRelation", 1)[0]
    for op in ("Exchange", "SortMergeJoin", "BroadcastHashJoin", "+- Sort"):
        assert op not in query_side, f"{op} leaked into the warm plan:\n{query_side}"


def test_resolve_hashes_on_hot_view(serving, index):
    """Dictionary joins still compose on the warm path."""
    pol = f"{cs.policy_id_of(3)}.*"
    hot = {
        tuple(r)
        for r in serving.fold(pol, resolve_hashes=True).collect()
    }
    cold = {
        tuple(r)
        for r in fold_inputs(index, pol, resolve_hashes=True).collect()
    }
    assert hot == cold


def test_fold_stream_matches_collect_both_orders(serving):
    addr = f"*/{cs.delegation_credential_of(5)}"
    want = [tuple(r) for r in serving.fold_rows(addr)]
    got = [tuple(r) for r in serving.fold_stream(addr)]
    assert got == want and len(got) > 5
    want_old = [tuple(r) for r in serving.fold_rows(addr, order="oldest_first")]
    got_old = [tuple(r) for r in serving.fold_stream(addr, order="oldest_first")]
    assert got_old == want_old


def test_fold_pages_keyset_pagination(serving):
    """Pages concatenate to the full ordered result, with no row repeated
    or skipped across page borders; both orders."""
    addr = f"*/{cs.delegation_credential_of(5)}"
    for order in ("most_recent_first", "oldest_first"):
        want = [tuple(r) for r in serving.fold_rows(addr, order=order)]
        pages = list(serving.fold_pages(addr, page_size=7, order=order))
        assert all(len(p) <= 7 for p in pages)
        got = [tuple(r) for page in pages for r in page]
        assert got == want


def test_etag_304_cycle(serving):
    pat = f"*/{cs.delegation_credential_of(5)}"
    status, tag, rows = serving.fold_rows_if_none_match(None, pat)
    assert status == 200 and rows
    status2, tag2, rows2 = serving.fold_rows_if_none_match(tag, pat)
    assert (status2, rows2) == (304, None) and tag2 == tag
