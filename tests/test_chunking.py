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
