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


def _jobs_during(spark, fn):
    """Run fn under a fresh job group; return the number of Spark jobs it
    launched (statusTracker sees every job of the group)."""
    import uuid

    sc = spark.sparkContext
    group = f"jobcount-{uuid.uuid4().hex[:8]}"
    sc.setJobGroup(group, "job counting")
    try:
        out = fn()
    finally:
        sc.setJobGroup(None, None)
    return len(sc.statusTracker().getJobIdsForGroup(group)), out


def test_repeat_point_lookup_launches_no_job(serving, spark):
    """The hot-row cache (kupo's page-cache analog): a repeated P8 point
    lookup is a dict probe — ZERO Spark jobs, so latency is free of the
    ~20 ms per-job scheduler floor (VERDICT r4 finding #3)."""
    pat = f"*@{cs.transaction_id_of(123)}"
    first = serving.fold_rows(pat)  # fills the cache (may launch jobs)
    n_jobs, again = _jobs_during(spark, lambda: serving.fold_rows(pat))
    assert n_jobs == 0
    assert [tuple(r) for r in again] == [tuple(r) for r in first] and first
    # cached pages are isolated per (pattern, order, kwargs) AND mutation-safe
    again.append("sentinel")
    assert serving.fold_rows(pat)[-1] != "sentinel"
    old = serving.fold_rows(pat, order="oldest_first")
    assert [tuple(r) for r in old] == [tuple(r) for r in first][::-1]


def test_point_bound_fold_memoizes_assertion(serving, spark):
    """A point-valued range bound (P16) resolves through the driver memo:
    the first request pays the assert job, repeats pay only the collect —
    and an unknown point is still rejected, also memoized."""
    import pytest as _pytest

    from kupo_spark.operators.fold_inputs import UnknownPointError

    good = (50, cs.md5_hex("blk50"))
    addr = cs.address_of(42)
    first = serving.fold_rows(addr, created_after_point=good)
    want = [tuple(r) for r in serving.fold_rows(addr, created_after=50)]
    assert [tuple(r) for r in first] == want
    n_jobs, again = _jobs_during(
        spark, lambda: serving.fold_rows(addr, created_after_point=good)
    )
    # no assert-count job — and the address-family row cache absorbs the
    # collect too, so the repeat launches nothing at all
    assert n_jobs == 0
    assert [tuple(r) for r in again] == want
    with _pytest.raises(UnknownPointError):
        serving.fold_rows(addr, created_after_point=(50, "00" * 16))
    n_jobs, _ = _jobs_during(
        spark,
        lambda: _pytest.raises(
            UnknownPointError,
            lambda: serving.fold_rows(addr, created_after_point=(50, "00" * 16)),
        ),
    )
    assert n_jobs == 0  # negative verdicts memoized too


def test_etag_is_memoized_and_swap_fresh(index, spark):
    """etag() runs its aggregate once per Serving; a NEW Serving (the swap
    path constructs one) starts cold — no cache can outlive its snapshot."""
    s = Serving(index, partitions=2)
    tag = s.etag()
    n_jobs, tag2 = _jobs_during(spark, s.etag)
    assert n_jobs == 0 and tag2 == tag
    pat = f"*@{cs.transaction_id_of(123)}"
    rows = s.fold_rows(pat)
    assert rows
    # a swap builds a fresh Serving: its caches are empty by construction
    s2 = Serving(index, partitions=2)
    assert (
        len(s2._row_cache) == 0
        and len(s2._point_memo) == 0
        and s2._etag_memo is None
    )
    assert [tuple(r) for r in s2.fold_rows(pat)] == [tuple(r) for r in rows]
    s.close()
    s2.close()


def test_serve_json_plan_cache_and_parity(serving, index):
    """GET /matches execution path: serve_json returns the SAME cached plan
    object per shape (the compiled-statement analog — per-request Catalyst
    planning serializes concurrent clients on the driver), and its rows are
    byte-identical to a cold result_json over the base index."""
    from kupo_spark.operators import serve as _serve

    policy = cs.policy_id_of(3)
    kw = dict(sorted_result=True, order="most_recent_first", status=None)
    df1 = serving.serve_json(f"{policy}.*", **kw)
    df2 = serving.serve_json(f"{policy}.*", **kw)
    assert df1 is df2  # plan reused, not rebuilt
    hot = [r["result"] for r in df1.collect()]
    cold = [
        r["result"]
        for r in _serve.result_json(index, f"{policy}.*", **kw).collect()
    ]
    assert hot == cold and hot
    # distinct literals are distinct plans (literals are baked into Catalyst)
    assert serving.serve_json(f"{policy}.*", created_after=10, **kw) is not df1


def test_serve_json_rows_point_cached_no_job(serving, spark):
    """A repeated point lookup through the HTTP execution path serves its
    rendered JSON from the driver row cache: ZERO Spark jobs."""
    pat = f"*@{cs.transaction_id_of(123)}"
    kw = dict(sorted_result=True, order="most_recent_first", status=None)
    first = list(serving.serve_json_rows(pat, **kw))
    n_jobs, again = _jobs_during(
        spark, lambda: list(serving.serve_json_rows(pat, **kw))
    )
    assert n_jobs == 0
    assert again == first and first


def test_wide_scan_pages_cached_within_byte_bound(serving, spark):
    """r11: non-address wide scans get the page-cache behavior too —
    a fully delivered page that fits ROW_CACHE_MAX_ENTRY_BYTES is cached
    and repeats run ZERO jobs, for both the Row path (fold_rows) and the
    rendered streaming path (serve_json_rows)."""
    serving._row_cache.clear()
    first = serving.fold_rows("*")
    n_jobs, again = _jobs_during(spark, lambda: serving.fold_rows("*"))
    assert n_jobs == 0
    assert [tuple(r) for r in again] == [tuple(r) for r in first] and first
    # oldest-first repeats reverse the same cached page
    rev = serving.fold_rows("*", order="oldest_first")
    n_jobs, rev_again = _jobs_during(
        spark, lambda: serving.fold_rows("*", order="oldest_first")
    )
    assert [tuple(r) for r in rev_again] == [tuple(r) for r in rev]
    # rendered streaming path: a full drain populates the cache
    kw = dict(sorted_result=True)
    body_first = list(serving.serve_json_rows("*", **kw))
    n_jobs, body_again = _jobs_during(
        spark, lambda: list(serving.serve_json_rows("*", **kw))
    )
    assert n_jobs == 0
    assert body_again == body_first and body_first


def test_tip_is_memoized(serving, spark):
    """tip() aggregates once per snapshot; every HTTP response reads the
    memo (addCacheHeaders would otherwise cost one Spark job per request)."""
    slot, h = serving.tip()
    n_jobs, tip2 = _jobs_during(spark, serving.tip)
    assert n_jobs == 0 and tip2 == (slot, h)
    assert serving.etag() == f'W/"{slot}-{(h or "")[:16]}"'


def test_addr_family_served_from_clustered_view_and_cached(serving, spark, index):
    """Exact-address / delegation shapes route through the address-
    clustered view and repeats hit the row cache (zero jobs) — while
    results stay identical to the cold chain-order fold (the parametrized
    parity test covers values; this pins the caching + the bound)."""
    # a NON-EMPTY address from this chain (address_of(42) may not appear
    # in the small unit fixture)
    addr = index.inputs.groupBy("address").count().orderBy(F.desc("count")).first()[
        "address"
    ]
    deleg = f"*/{cs.delegation_credential_of(5)}"
    first_a = serving.fold_rows(addr)
    first_d = serving.fold_rows(deleg)
    n_jobs, again = _jobs_during(
        spark, lambda: (serving.fold_rows(addr), serving.fold_rows(deleg))
    )
    assert n_jobs == 0
    assert [tuple(r) for r in again[0]] == [tuple(r) for r in first_a] and first_a
    assert [tuple(r) for r in again[1]] == [tuple(r) for r in first_d]
    # entries beyond the per-entry BYTE bound are NOT cached (driver memory
    # stays bounded no matter how hot a 190 MB delegation answer is; the
    # bound is byte-denominated like kupo's page cache, so cacheability
    # does not depend on row width — r11)
    old = Serving.ROW_CACHE_MAX_ENTRY_BYTES
    try:
        Serving.ROW_CACHE_MAX_ENTRY_BYTES = 0
        serving._row_cache.clear()
        rows = serving.fold_rows(addr)
        assert rows and len(serving._row_cache) == 0
    finally:
        Serving.ROW_CACHE_MAX_ENTRY_BYTES = old


def test_lru_cache_byte_budget_and_thread_safety():
    """The row cache is byte-bounded (kupo's page cache is) and safe under
    concurrent handler threads — eviction never raises on a racing pop."""
    import threading

    from kupo_spark.operators.serving import _LruCache

    c = _LruCache(max_entries=1000, max_bytes=100)
    c.put("a", ("x" * 40,), 40)
    c.put("b", ("y" * 40,), 40)
    c.put("c", ("z" * 40,), 40)  # 120 bytes > 100: evicts the LRU entry
    assert c.get("a") is None and c.get("b") is not None and c.get("c") is not None
    # LRU, not FIFO: a hit refreshes recency
    c2 = _LruCache(max_entries=2)
    c2.put("a", 1)
    c2.put("b", 2)
    assert c2.get("a") == 1  # refresh a
    c2.put("c", 3)  # evicts b (the least recently USED), not a
    assert c2.get("a") == 1 and c2.get("b") is None and c2.get("c") == 3
    # hammer from many threads: no KeyError, bounds hold
    big = _LruCache(max_entries=8)
    errors = []

    def worker(tid):
        try:
            for i in range(500):
                big.put((tid, i), i)
                big.get((tid, i - 1))
        except Exception as e:  # pragma: no cover
            errors.append(e)

    ts = [threading.Thread(target=worker, args=(t,)) for t in range(8)]
    [t.start() for t in ts]
    [t.join() for t in ts]
    assert errors == [] and len(big) <= 8


def test_policy_fold_hot_path_is_order_safe(serving, index, spark):
    """The no-sort policy fold takes a PINNED broadcast semi-join (narrow,
    order-preserving) under the gate, and the pure map-key predicate when
    the key set is declared too big — never an order-destroying shuffle
    join."""
    pol = f"{cs.policy_id_of(3)}.*"
    plan = formatted_plan(serving.fold(pol))
    query_side = plan.split("InMemoryRelation", 1)[0]
    assert "BroadcastHashJoin" in query_side and "LeftSemi" in query_side
    assert "SortMergeJoin" not in query_side
    # force the fallback: with a zero limit the plan has NO join at all
    old = Serving.POLICY_BROADCAST_LIMIT
    try:
        Serving.POLICY_BROADCAST_LIMIT = 0
        s2 = Serving(index, partitions=2)
        plan2 = formatted_plan(s2.fold(pol))
        q2 = plan2.split("InMemoryRelation", 1)[0]
        assert "Join" not in q2
        # and both plans return identical ordered rows
        a = [tuple(r) for r in serving.fold_rows(pol)]
        b = [tuple(r) for r in s2.fold_rows(pol)]
        assert a == b and a
    finally:
        Serving.POLICY_BROADCAST_LIMIT = old


def test_fold_rows_bounded_small_is_list_big_is_stream(serving):
    """The driver-memory guard is structural: under the cap the bounded
    path returns a list equal to fold_rows; past the cap it returns an
    ITERATOR whose rows equal fold_rows without the driver ever holding
    more than cap+1 of them."""
    addr = cs.address_of(42)
    small = serving.fold_rows_bounded(addr)
    assert isinstance(small, list)
    assert [tuple(r) for r in small] == [
        tuple(r) for r in serving.fold_rows(addr)
    ]
    # wildcard at sf0.001 (12k rows) with a tiny cap: streamed
    big = serving.fold_rows_bounded("*", max_rows=50)
    assert not isinstance(big, list)
    rows = [tuple(r) for r in big]
    assert rows == [tuple(r) for r in serving.fold_rows("*")]
    # point shapes delegate to the page-sized fold_rows path
    pt = serving.fold_rows_bounded(f"*@{cs.transaction_id_of(123)}", max_rows=1)
    assert isinstance(pt, list)


def test_inherit_hot_carries_point_and_exact(index):
    """A successor Serving pre-renders its predecessor's hot point bodies
    AND exact-address pages — and computes them from its own snapshot."""
    old = Serving(index, partitions=2)
    txid = cs.transaction_id_of(123)
    addr = cs.address_of(42)
    body = old.serve_json_body(f"*@{txid}", sorted_result=True)
    list(old.serve_json_rows(addr, sorted_result=True))
    assert body is not None
    new = Serving(index, partitions=2)
    new.inherit_hot(old)
    # both caches primed: serving again launches no recompute (compare by
    # cache probe — the keys must be present with identical content)
    k_body = ("json_body", f"*@{txid}", (("sorted_result", True),))
    k_rows = ("json_rows", f"*@{txid}", (("sorted_result", True),))  # not cached — point went to json_body
    assert new._row_cache.get(k_body) == body
    k_exact = ("json_rows", addr, (("sorted_result", True),))
    assert new._row_cache.get(k_exact) is not None
    assert new._row_cache.get(k_rows) is None
    old.close()
    new.close()
