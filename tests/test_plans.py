"""Physical-plan regression tests — mirror of kupo's EXPLAIN QUERY PLAN
golden assertions (DatabaseSpec.hs:359-700): the queries must keep parquet
filter pushdown, partition pruning, and broadcast dimension joins."""

from __future__ import annotations

import pytest

from kupo_spark import chainspec as cs
from kupo_spark.operators.fold_inputs import fold_inputs
from kupo_spark.operators.indexer import build_index, read_index, write_index
from kupo_spark.plans.explain import assert_in_plan, formatted_plan


@pytest.fixture(params=["true", "false"], ids=["aqe-on", "aqe-off"], autouse=True)
def aqe_regime(request, spark):
    """Pin every plan golden under BOTH adaptive-execution regimes — the
    reference pins EXPLAIN output under both of its index regimes
    (DatabaseSpec.hs:359-700).  A plan shape that only holds because AQE
    rescues it at runtime must fail the golden, not production: plans are
    compiled lazily, so toggling the conf here governs each test's
    formatted_plan compilation."""
    prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", request.param)
    yield request.param
    spark.conf.set("spark.sql.adaptive.enabled", prev)


@pytest.fixture(scope="module")
def disk_index(spark, blocks, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("index"))
    write_index(build_index(blocks), path, slot_bucket=20)
    return read_index(spark, path, slot_bucket=20)


def test_exact_address_pushed_to_scan(disk_index):
    addr = cs.address_of(42)
    df = fold_inputs(disk_index, addr)
    plan = assert_in_plan(df, "PushedFilters")
    assert f"EqualTo(address,{addr})" in plan or "isnotnull(address" in plan
    # the filter must reach the parquet reader, not sit above it
    assert "PushedFilters: [" in plan


def test_materialized_index_skips_checkpoint_joins(disk_index):
    # write_index denormalizes the J1/J2 header hashes, so a fold over the
    # materialized index must read them straight off the scan — no joins
    df = fold_inputs(disk_index, "*")
    plan = formatted_plan(df)
    assert "created_header_hash" in plan
    assert "BroadcastHashJoin" not in plan


def test_small_sorted_fold_sorts_in_one_pass(disk_index, spark):
    """r11 chain_order_sort: when Catalyst's estimate says the fold input
    fits one advisory partition, the global sort is a 1-partition range
    exchange — RangePartitioner skips its boundary-sampling job, so the
    child (scan + joins) executes ONCE instead of twice.  A big estimate
    (advisory shrunk to 1 byte) must keep the sampled parallel sort."""
    addr = cs.address_of(42)
    plan = formatted_plan(fold_inputs(disk_index, addr, sorted_result=True))
    # the planner prints RangePartitioning(1) as SinglePartition: one
    # exchange, zero sampling
    assert "SinglePartition" in plan and "rangepartitioning" not in plan
    key = "spark.sql.adaptive.advisoryPartitionSizeInBytes"
    prev = spark.conf.get(key, "64MB")
    spark.conf.set(key, "1b")
    try:
        plan = formatted_plan(fold_inputs(disk_index, addr, sorted_result=True))
        assert "rangepartitioning(created_at" in plan  # sampled parallel sort
    finally:
        spark.conf.set(key, prev)


def test_checkpoint_joins_are_broadcast(blocks):
    # an in-memory (un-materialized) index still resolves J1/J2 per query,
    # and those dimension joins must be broadcast
    df = fold_inputs(build_index(blocks), "*")
    plan = formatted_plan(df)
    assert plan.count("BroadcastHashJoin") >= 2  # J1 + J2


def test_created_range_prunes_partitions(disk_index):
    df = fold_inputs(disk_index, "*", created_after=40, created_before=59)
    plan = formatted_plan(df)
    assert "PartitionFilters" in plan
    assert "created_bucket" in plan
    # correctness of pruning: bucket width 20 → only buckets 2 within range
    assert df.count() > 0


def test_column_pruning_reaches_scan(disk_index):
    from kupo_spark.operators.fold_inputs import count_inputs

    df = count_inputs(disk_index, "*")
    plan = formatted_plan(df)
    # a COUNT over the wildcard pattern must not read wide payload columns
    assert "assets" not in plan.split("ReadSchema")[1].split("\n")[0]


def test_policy_semi_join_plan(disk_index, spark):
    """P9 is size-adaptive (r11): a small inputs estimate compiles to the
    pushed map-key predicate (no join machinery at all); at scale (advisory
    shrunk to 1 byte) the fold keeps kupo's join-index plan — the narrow
    policies scan with the policy filter pushed down, semi-joined on
    output_reference.  Both return identical rows."""
    pol = f"{cs.policy_id_of(3)}.*"
    small_df = fold_inputs(disk_index, pol)
    small_plan = formatted_plan(small_df)
    assert "LeftSemi" not in small_plan
    # the predicate compiles to array_contains(map_keys(assets), policy)
    assert "map_keys(assets" in small_plan
    key = "spark.sql.adaptive.advisoryPartitionSizeInBytes"
    prev = spark.conf.get(key, "64MB")
    spark.conf.set(key, "1b")
    try:
        big_df = fold_inputs(disk_index, pol)
        plan = formatted_plan(big_df)
        assert "LeftSemi" in plan
        # the policy filter is pushed into the policies side-table scan
        assert f"EqualTo(policy_id,{cs.policy_id_of(3)})" in plan
    finally:
        spark.conf.set(key, prev)
    a = sorted(map(tuple, small_df.collect()))
    b = sorted(map(tuple, big_df.collect()))
    assert a == b and len(a) > 0


def test_pruned_scan_matches_unpruned_results(disk_index, index):
    """Partition pruning is a plan property, not a semantics change: the
    range query over the bucketed parquet index must return exactly the
    rows the in-memory index returns."""
    kw = dict(created_after=33, created_before=71)
    disk = {r["output_reference"] for r in fold_inputs(disk_index, "*", **kw).collect()}
    mem = {r["output_reference"] for r in fold_inputs(index, "*", **kw).collect()}
    assert disk == mem and len(disk) > 0


def test_no_python_eval_in_match_pipeline(blocks):
    idx = build_index(blocks)
    plan = formatted_plan(idx.inputs)
    assert "BatchEvalPython" not in plan  # no row-at-a-time Python in the hot path
    assert "SortAggregate" not in plan  # the W1 dedup shuffle must stay gone


def test_codegen_on_exploded_outputs(blocks):
    from kupo_spark.operators.indexer import exploded_outputs

    df = exploded_outputs(blocks)
    # force a final (non-AQE) plan string by looking at simple mode too
    plan = formatted_plan(df)
    assert "BatchEvalPython" not in plan


def test_topk_scores_in_arrow_batches(spark):
    from kupo_spark.functions.similarity import brute_force_topk

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    plan = formatted_plan(brute_force_topk(emb))
    # scoring is one Arrow-batched matmul scan — never row-at-a-time Python,
    # and never a pre-rank shuffle/join of the corpus
    assert "BatchEvalPython" not in plan
    assert "MapInPandas" in plan
    assert "Join" not in plan


def test_exact_duplicates_single_shuffle(spark):
    """One window over the digest = one Exchange; the agg + re-join version
    would shuffle the digest table twice."""
    from kupo_spark.functions.dedup import exact_duplicates

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    import re

    plan = formatted_plan(exact_duplicates(docs))
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1
    assert "Join" not in plan


def test_frequent_shingle_cap_bounds_hot_key(spark):
    """A stopword-heavy corpus (one shingle shared by every doc) must not
    produce a quadratic posting list once the df cap is on."""
    from kupo_spark.functions.dedup import drop_frequent_shingles, ngram_jaccard_pairs, shingles

    n = 40
    rows = [(i, f"of the and unique{i} token{i} filler{i}") for i in range(n)]
    docs = spark.createDataFrame(rows, "doc_id BIGINT, text STRING")

    sh = shingles(docs)
    capped = drop_frequent_shingles(sh, max_df=10)
    # the hot shingle ('of the and', df = 40) is gone; doc-unique ones stay
    assert capped.where("sh = 'of the and'").count() == 0
    assert capped.count() == sh.count() - n

    # uncapped: every pair shares the hot shingle -> n*(n-1)/2 intersection
    # rows; capped: no shared shingles at all -> zero candidate pairs
    assert ngram_jaccard_pairs(docs, threshold=0.01).count() == n * (n - 1) // 2
    assert ngram_jaccard_pairs(docs, threshold=0.01, max_df=10).count() == 0


def test_txid_between_on_packed_reference(disk_index):
    """P7 compiles to the reference's byte-interval scan over the packed
    34-byte output_reference (Database.hs:745-755): the BETWEEN bounds must
    reach the parquet scan as pushed binary range filters."""
    txid = cs.transaction_id_of(3)
    df = fold_inputs(disk_index, f"*@{txid}")
    plan = formatted_plan(df)
    assert "output_reference_bin" in plan
    assert "GreaterThanOrEqual(output_reference_bin" in plan
    assert "LessThanOrEqual(output_reference_bin" in plan
    assert df.count() > 0


def test_packed_reference_columns_match_codecs(index):
    """The column-side unhex/lpad construction must produce byte-identical
    rows to the driver-side packers (the codec the query bound uses)."""
    from kupo_spark.codecs import (
        pack_datum_info,
        pack_ext_output_reference,
        unpack_datum_info,
        unpack_ext_output_reference,
    )

    rows = index.inputs.select(
        "transaction_id", "output_index", "transaction_index",
        "output_reference_bin", "ext_output_reference_bin",
        "datum_kind", "datum_hash", "datum_info",
    ).limit(200).collect()
    assert rows
    seen_datum = False
    for r in rows:
        ext = pack_ext_output_reference(
            r.transaction_id, r.output_index, r.transaction_index
        )
        assert bytes(r.ext_output_reference_bin) == ext
        assert bytes(r.output_reference_bin) == ext[:-2]  # generated-column rule
        assert unpack_ext_output_reference(ext) == (
            r.transaction_id, r.output_index, r.transaction_index
        )
        want = pack_datum_info(r.datum_kind, r.datum_hash)
        got = None if r.datum_info is None else bytes(r.datum_info)
        assert got == want
        if want is not None:
            seen_datum = True
            assert unpack_datum_info(want) == (r.datum_kind, r.datum_hash)
    assert seen_datum


def test_refine_rerank_plan_is_broadcast_bounded(spark):
    """The exact-rerank stage pairs candidates with vectors through
    BROADCAST joins only (the candidate list is tiny by construction —
    no shuffle of the vector table) and adds no Python beyond the
    pq_encode scan."""
    import re

    from kupo_spark.functions.pq import pq_refined_topk, train_codebooks

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    books = train_codebooks(emb, iters=1)
    plan = formatted_plan(pq_refined_topk(emb, books, n_queries=5, k=3, refine=2))
    assert "BatchEvalPython" not in plan
    # pq_encode (stage 1 codes) + the ADC closure scorer are the only
    # Arrow stages — and exactly once each: the candidate lineage (a full
    # corpus scan) must not be re-evaluated by the rerank's join structure
    assert len(re.findall(r"^\(\d+\) MapInPandas", plan, re.M)) == 2
    # every rerank join is a broadcast build — the quantized vector table
    # is never exchanged by a join (the only Exchanges are the top-k
    # window sorts)
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan
    assert "BroadcastHashJoin" in plan


def test_prune_utxo_horizon_is_broadcast(spark, blocks):
    """M4's unstable-window horizon (build_index(prune_utxo=True)) is a
    broadcast 1-row aggregate joined into the inputs stream — never a
    shuffled join and never a driver collect, so the ingest plan keeps its
    single narrow pass at any chain length."""
    from kupo_spark.operators.indexer import build_index

    idx = build_index(blocks, ("*",), prune_utxo=True)
    plan = formatted_plan(idx.inputs)
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


def test_policies_pairs_compile_without_dedup_exchange(spark):
    """W4 (r11): (output_reference, policy_id) pairs are distinct by
    construction — each produced output appears exactly once (the W1
    invariant) and map keys are unique within one assets map — so the
    policies derivation must compile with NO Exchange/aggregate at all,
    and the rows must still come out pair-distinct."""
    import re

    from kupo_spark.chaingen import blocks_from_events, load_events
    from kupo_spark.operators.indexer import build_index

    blk = blocks_from_events(load_events(spark, "/root/testdata/sf0.001"))
    idx = build_index(blk)
    plan = formatted_plan(idx.policies)
    assert re.search(r"\(\d+\) Exchange", plan) is None
    assert "HashAggregate" not in plan
    n = idx.policies.count()
    assert n > 0
    assert n == idx.policies.dropDuplicates(
        ["output_reference", "policy_id"]
    ).count()


def test_contamination_corpus_side_reaches_bench_join_unshuffled(spark):
    """r11: contamination feeds the NON-distinct shingle stream into the
    broadcast bench join and de-duplicates the survivors (countDistinct
    above the join) — so no Exchange may sit between the join and the
    corpus Generate below it (the old plan paid a corpus-wide
    dropDuplicates exchange there)."""
    from kupo_spark.functions.sampling import contamination

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = formatted_plan(contamination(docs, ["a b c d"], n=3))
    tree = plan.split("\n\n")[0].splitlines()
    ji = next(i for i, l in enumerate(tree) if "BroadcastHashJoin" in l)
    gi = next(i for i, l in enumerate(tree) if "Generate" in l)
    assert ji < gi, "corpus Generate must sit below the bench join"
    assert not any("Exchange" in l for l in tree[ji + 1 : gi])
