"""Training-shard export: DuckDB parity of the (shard, pos) assignment,
exact-once coverage, determinism across runs, and balance."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kupo_spark.functions.shards import assign_shards, write_shards
from tools.check_correctness import rows_key

DOCS = "/root/testdata/sf0.001/documents.parquet"
N = 8


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(DOCS)


def test_assignment_matches_duckdb(docs, duck):
    from kupo_spark.functions.shards import assign_shards_sql

    sdf = assign_shards(docs, N, seed="r4")
    sql = assign_shards_sql(N, seed="r4")
    srows, scols = sdf.collect(), sdf.columns
    res = duck.execute(sql)
    ocols = [d[0] for d in res.description]
    orows = res.fetchall()
    assert len(srows) == len(orows) > 0
    assert rows_key(srows, scols) == rows_key(orows, ocols)


def test_every_doc_exactly_once_and_balanced(docs):
    a = assign_shards(docs, N).collect()
    n = docs.count()
    assert len(a) == n and len({r.doc_id for r in a}) == n
    sizes = {}
    for r in a:
        sizes[r.shard] = sizes.get(r.shard, 0) + 1
    assert set(sizes) <= set(range(N))
    # binomial balance: no shard more than 2x the mean at 500/8 ~ 62
    assert max(sizes.values()) < 2 * n / N
    # pos is a dense 0..size-1 enumeration per shard
    for s, size in sizes.items():
        got = sorted(r.pos for r in a if r.shard == s)
        assert got == list(range(size))


def test_write_shards_deterministic_and_shuffled(docs, tmp_path, spark):
    out1, out2 = str(tmp_path / "s1"), str(tmp_path / "s2")
    m1 = {r.shard: r.n_rows for r in write_shards(docs, out1, N, seed="x").collect()}
    m2 = {r.shard: r.n_rows for r in write_shards(docs, out2, N, seed="x").collect()}
    assert m1 == m2 and sum(m1.values()) == docs.count()
    r1 = spark.read.parquet(out1).select("doc_id", "shard").collect()
    r2 = spark.read.parquet(out2).select("doc_id", "shard").collect()
    assert sorted(map(tuple, r1)) == sorted(map(tuple, r2))
    # a different seed is a different permutation
    m3 = write_shards(docs, str(tmp_path / "s3"), N, seed="y")
    a_x = {r.doc_id: r.shard for r in assign_shards(docs, N, seed="x").collect()}
    a_y = {r.doc_id: r.shard for r in assign_shards(docs, N, seed="y").collect()}
    assert any(a_x[d] != a_y[d] for d in a_x)
    # within a shard, file order is key order, decorrelated from doc_id
    # order (the key column itself is dropped from the export; one file
    # per shard, so read order == written order)
    out_cols = spark.read.parquet(out1).columns
    assert "k" not in out_cols
    shard0 = [r.doc_id for r in spark.read.parquet(f"{out1}/shard=0").collect()]
    assert shard0 != sorted(shard0)


def test_quote_seed_is_data_not_syntax(docs):
    # the seed is bound as a literal column; a quote must not break (or
    # rewrite) the expression
    a = assign_shards(docs, N, seed="it's").collect()
    assert len(a) == docs.count()


def test_prefix_seeds_are_independent(spark):
    # ':' separator: seed '1' doc 23 must not collide with seed '12' doc 3
    from kupo_spark.functions.shards import shard_key

    d = spark.createDataFrame([(23,), (3,)], "doc_id long")
    keys = {r.doc_id: (r.a, r.b) for r in d.select(
        "doc_id", shard_key("1").alias("a"), shard_key("12").alias("b")
    ).collect()}
    assert keys[23][0] != keys[3][1]  # '1:23' vs '12:3'
    assert keys[23][0] != keys[23][1]  # different seeds differ per doc too


def test_assignment_plan_stays_jvm(docs):
    from kupo_spark.plans.explain import formatted_plan

    plan = formatted_plan(assign_shards(docs, N))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
