"""Chunking + packing: DuckDB oracle parity for the chunker, greedy
invariants and a hand-computed fixture for the packer."""

from __future__ import annotations

from collections import defaultdict

from pyspark.sql import functions as F

from kupo_spark.functions.chunking import (
    chunk_documents,
    chunk_documents_sql,
    pack_sequences,
)

DOCS = "/root/testdata/sf0.001/documents.parquet"


def test_chunking_matches_duckdb_oracle(spark, duck):
    docs = spark.read.parquet(DOCS)
    got = {
        (r.doc_id, r.chunk_id, r.n_tokens, r.chunk_text)
        for r in chunk_documents(docs, 32, 8).collect()
    }
    oracle = duck.execute(chunk_documents_sql(32, 8)).fetchall()
    assert got == {tuple(r) for r in oracle}
    assert len(got) > 500  # fan-out actually happened


def test_chunk_windows_cover_and_overlap(spark):
    docs = spark.read.parquet(DOCS).limit(20)
    toks = {
        r.doc_id: [t for t in r.text.split(" ") if t]
        for r in docs.collect()
    }
    chunks = defaultdict(dict)
    for r in chunk_documents(docs, 32, 8).collect():
        chunks[r.doc_id][r.chunk_id] = r.chunk_text.split(" ")
    stride = 24
    for doc_id, by_id in chunks.items():
        full = toks[doc_id]
        n = len(by_id)
        assert sorted(by_id) == list(range(n))
        for cid, ct in by_id.items():
            assert ct == full[cid * stride : cid * stride + 32]
        # windows cover every token: last window reaches the end
        assert (n - 1) * stride + len(by_id[n - 1]) == len(full)
        # consecutive windows overlap by 8 (when both are full-width)
        for cid in range(n - 1):
            if len(by_id[cid]) == 32:
                assert by_id[cid][stride:] == by_id[cid + 1][: 32 - stride][:8]


def test_pack_sequences_greedy_fixture(spark):
    docs = spark.createDataFrame(
        [(i, " ".join(["w"] * n)) for i, n in
         [(1, 100), (2, 300), (3, 200), (4, 600), (5, 50)]],
        "doc_id long, text string",
    )
    # single bucket -> pure greedy in doc-id order with budget 512:
    # [100+300] [200] [600 oversize] [50]
    out = {r.doc_id: (r.pack_id, r.oversize) for r in
           pack_sequences(docs, budget=512, buckets=1).collect()}
    assert out[1][0] == out[2][0]
    packs = [out[i][0] for i in (1, 3, 4, 5)]
    assert len(set(packs)) == 4  # 1/3/4/5 in distinct packs
    assert [out[i][1] for i in (1, 2, 3, 4, 5)] == [False, False, False, True, False]
    assert sorted(packs) == packs  # pack ids increase with doc order


def test_pack_sequences_invariants_on_corpus(spark):
    docs = spark.read.parquet(DOCS)
    rows = pack_sequences(docs, budget=256, buckets=8).collect()
    assert len(rows) == docs.count()  # every doc packed exactly once
    by_pack = defaultdict(list)
    for r in rows:
        by_pack[r.pack_id].append(r)
    for pid, members in by_pack.items():
        total = sum(r.n_tokens for r in members)
        if total > 256:  # only a lone oversize doc may overflow
            assert len(members) == 1 and members[0].oversize
        buckets = {r.bucket for r in members}
        assert len(buckets) == 1 and pid >> 32 == members[0].bucket
    # determinism
    again = {(r.doc_id, r.pack_id) for r in
             pack_sequences(docs, budget=256, buckets=8).collect()}
    assert again == {(r.doc_id, r.pack_id) for r in rows}


def test_chunking_plan_stays_jvm(spark):
    from kupo_spark.plans.explain import formatted_plan

    plan = formatted_plan(chunk_documents(spark.read.parquet(DOCS)))
    assert "BatchEvalPython" not in plan and "Exchange" not in plan


from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=8, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=200), min_size=1, max_size=12),
    st.sampled_from([(16, 0), (16, 4), (32, 8), (7, 6)]),
)
def test_chunking_properties(spark, lens, params):
    """Property: windows tile every document — counts follow the ceil
    formula, concatenating the stride-prefixes + final tail reconstructs
    the token stream exactly."""
    chunk, overlap = params
    stride = chunk - overlap
    docs = spark.createDataFrame(
        [(i, " ".join(f"t{i}_{j}" for j in range(n))) for i, n in enumerate(lens)],
        "doc_id long, text string",
    )
    rows = chunk_documents(docs, chunk, overlap).collect()
    by_doc = defaultdict(dict)
    for r in rows:
        by_doc[r.doc_id][r.chunk_id] = r.chunk_text.split(" ") if r.chunk_text else []
    for i, n in enumerate(lens):
        want = [f"t{i}_{j}" for j in range(n)]
        got = by_doc.get(i, {})
        if n == 0:
            assert got == {}
            continue
        k = 1 if n <= chunk else 1 + -(-(n - chunk) // stride)
        assert sorted(got) == list(range(k))
        # tiling: the stride-prefixes of all but the last window are the
        # document's first (k-1)*stride tokens, and the last window is
        # exactly the remainder — so the windows cover every token
        head = [t for cid in range(k - 1) for t in got[cid][:stride]]
        assert head == want[: (k - 1) * stride]
        assert got[k - 1] == want[(k - 1) * stride :]
        # every chunk except possibly the last is full-width
        for cid in range(k - 1):
            assert len(got[cid]) == chunk


@settings(max_examples=8, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=700), min_size=1, max_size=14),
    st.integers(min_value=1, max_value=4),
)
def test_packing_properties(spark, lens, buckets):
    """Property: every doc packed once; no pack exceeds the budget unless
    it is a lone flagged oversize doc; within a bucket, pack ids are
    nondecreasing in doc order."""
    budget = 512
    docs = spark.createDataFrame(
        [(i, " ".join(["w"] * n)) for i, n in enumerate(lens)],
        "doc_id long, text string",
    )
    rows = pack_sequences(docs, budget=budget, buckets=buckets).collect()
    assert len(rows) == len(lens)
    packs = defaultdict(list)
    for r in rows:
        assert r.n_tokens == lens[r.doc_id]
        packs[r.pack_id].append(r)
    for members in packs.values():
        total = sum(r.n_tokens for r in members)
        if total > budget:
            assert len(members) == 1 and members[0].oversize
    for b in range(buckets):
        seq = sorted((r.doc_id, r.pack_id) for r in rows if r.bucket == b)
        assert [p for _, p in seq] == sorted(p for _, p in seq)
