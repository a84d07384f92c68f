"""ANN top-k ranking: the two-stage partial top-k (`topk_merge`) must be
bit-identical to the naive per-query window, and the physical plan must never
rank a whole corpus's scores for one query in a single reducer."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from kupo_spark.functions.similarity import (
    brute_force_topk,
    ivf_topk,
    label_filtered_topk,
    lsh_topk,
    topk_merge,
)
from kupo_spark.plans.explain import formatted_plan

EMB = "/root/testdata/sf0.001/embeddings.parquet"


def _naive_topk(scored, k):
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def test_topk_merge_matches_single_window(spark):
    # synthetic scored set with deliberate score ties across bucket borders
    rows = [
        (q, n, float((n * 7 + q) % 13) / 13.0)
        for q in range(4)
        for n in range(500)
        if n != q
    ]
    scored = spark.createDataFrame(rows, "query_id BIGINT, neighbor_id BIGINT, cosine DOUBLE")
    for k in (1, 5, 17):
        got = sorted(topk_merge(scored, k).collect())
        want = sorted(_naive_topk(scored, k).collect())
        assert got == want


def test_topk_merge_small_bucket_count(spark):
    # buckets=1 degenerates to the naive window; buckets >> rows still exact
    rows = [(0, n, float(n % 5)) for n in range(1, 40)]
    scored = spark.createDataFrame(rows, "query_id BIGINT, neighbor_id BIGINT, cosine DOUBLE")
    want = sorted(_naive_topk(scored, 7).collect())
    assert sorted(topk_merge(scored, 7, buckets=1).collect()) == want
    assert sorted(topk_merge(scored, 7, buckets=1024).collect()) == want


def test_all_topk_paths_use_partial_rank(spark):
    """No plan may contain a window whose only partition key is query_id
    over the full scored corpus: the first (wide) rank must be keyed by
    (query_id, part_bucket)."""
    emb = spark.read.parquet(EMB)
    for fn in (brute_force_topk, label_filtered_topk, lsh_topk, ivf_topk):
        plan = formatted_plan(fn(emb, n_queries=3, k=4))
        assert "part_bucket" in plan, fn.__name__
        # the partial rank window carries both keys
        assert "query_id" in plan and "_prank" in plan, fn.__name__


def test_topk_paths_agree_on_exact_subset(spark):
    """label_filtered/brute_force are exact: merging per-label exact top-k
    over a single-label corpus equals brute force."""
    emb = spark.read.parquet(EMB).withColumn("label", F.lit("x"))
    bf = {(r.query_id, r.rank): r.neighbor_id for r in brute_force_topk(emb, 5, 3).collect()}
    lf = {(r.query_id, r.rank): r.neighbor_id for r in label_filtered_topk(emb, 5, 3).collect()}
    assert bf == lf and len(bf) == 15
