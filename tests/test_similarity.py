"""ANN top-k ranking: the two-stage partial top-k (`topk_merge`) must be
bit-identical to the naive per-query window, and the physical plan must never
rank a whole corpus's scores for one query in a single reducer."""

from __future__ import annotations

import pytest

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
    """At scale no plan may contain a window whose only partition key is
    query_id over the full scored corpus: the first (wide) rank must be
    keyed by (query_id, part_bucket).  r11 gates the partial stage on the
    scored stream's size estimate, so the scale plan is pinned by shrinking
    the advisory partition size (everything estimates 'big'); a
    small-estimate corpus legitimately drops the partial stage (one
    exchange instead of two — same rows, pinned below)."""
    emb = spark.read.parquet(EMB)
    key = "spark.sql.adaptive.advisoryPartitionSizeInBytes"
    prev = spark.conf.get(key, "64MB")
    spark.conf.set(key, "1b")
    try:
        for fn in (brute_force_topk, label_filtered_topk, lsh_topk, ivf_topk):
            plan = formatted_plan(fn(emb, n_queries=3, k=4))
            assert "part_bucket" in plan, fn.__name__
            # the partial rank window carries both keys
            assert "query_id" in plan and "_prank" in plan, fn.__name__
    finally:
        spark.conf.set(key, prev)
    # the small-estimate fast path ranks in ONE window — no partial stage
    plan = formatted_plan(brute_force_topk(emb, n_queries=3, k=4))
    assert "part_bucket" not in plan and "query_id" in plan


def test_topk_paths_agree_on_exact_subset(spark):
    """label_filtered/brute_force are exact: merging per-label exact top-k
    over a single-label corpus equals brute force."""
    emb = spark.read.parquet(EMB).withColumn("label", F.lit("x"))
    bf = {(r.query_id, r.rank): r.neighbor_id for r in brute_force_topk(emb, 5, 3).collect()}
    lf = {(r.query_id, r.rank): r.neighbor_id for r in label_filtered_topk(emb, 5, 3).collect()}
    assert bf == lf and len(bf) == 15


def test_kmeans_centroids_trained_and_exact(spark):
    """2 Lloyd rounds in quantized integer space: centroids move off the
    seed vectors, keep dimensionality, stay bounded by the data range, and
    the whole training is deterministic (exact int sums + floor-mean — no
    float nondeterminism to average away)."""
    from kupo_spark.functions.similarity import ivf_assign, kmeans_centroids, quantized

    emb = spark.read.parquet(EMB)
    cent = {r.centroid_id: list(r.cv) for r in kmeans_centroids(emb, 8, iters=2).collect()}
    seeds = {
        r.vec_id: list(r.q)
        for r in quantized(emb).where(F.col("vec_id") < 8).collect()
    }
    assert set(cent) <= set(range(8)) and len(cent) >= 2
    dim = len(next(iter(seeds.values())))
    assert all(len(v) == dim for v in cent.values())
    # training moved at least one centroid off its seed
    assert any(cent[i] != seeds[i] for i in cent)
    # determinism: a second run is bit-identical
    again = {r.centroid_id: list(r.cv) for r in kmeans_centroids(emb, 8, iters=2).collect()}
    assert again == cent
    # every centroid component within the data's quantized range
    lo = min(min(v) for v in seeds.values()) - 10**6
    hi = max(max(v) for v in seeds.values()) + 10**6
    assert all(lo <= x <= hi for v in cent.values() for x in v)


def test_kmeans_objective_non_increasing(spark):
    """Lloyd's algorithm never increases the within-cluster L2² objective
    (floor-rounding of means can only add O(dim) per point, far below the
    assignment improvements at this scale)."""
    from kupo_spark.functions.similarity import kmeans_centroids, nearest_centroid, quantized

    emb = spark.read.parquet(EMB)
    q = quantized(emb)

    def objective(iters):
        cent = kmeans_centroids(emb, 8, iters=iters)
        scored = q.crossJoin(F.broadcast(cent)).withColumn(
            "dist2",
            F.expr("aggregate(zip_with(q, cv, (x, y) -> (x - y) * (x - y)), 0L, (a, v) -> a + v)"),
        )
        return (
            scored.groupBy("vec_id").agg(F.min("dist2").alias("d"))
            .agg(F.sum("d")).collect()[0][0]
        )

    o1, o2 = objective(1), objective(2)
    assert o2 <= o1


def test_embedding_near_dup_pairs(spark):
    """LSH-gated cosine near-dup: a planted near-duplicate (same vector +
    tiny perturbation) must co-bucket and be found; every reported pair
    meets the threshold and is a genuine high-cosine pair (verified against
    the exact cosine); output is canonical (vec_a < vec_b)."""
    from kupo_spark.functions.similarity import embedding_near_dup_pairs

    emb = spark.read.parquet(EMB)
    base = emb.limit(1).collect()[0]
    near = [float(x) + 1e-4 for x in base.embedding]
    planted = spark.createDataFrame(
        [(10_000, near, getattr(base, "label", "x"))],
        "vec_id BIGINT, embedding ARRAY<FLOAT>, label STRING",
    ).select(*emb.columns)
    corpus = emb.unionByName(planted)

    pairs = embedding_near_dup_pairs(corpus, threshold=0.9).collect()
    assert (base.vec_id, 10_000) in {(r.vec_a, r.vec_b) for r in pairs}
    for r in pairs:
        assert r.vec_a < r.vec_b
        assert r.cosine >= 0.9


def test_topk_tolerates_null_and_ragged_vectors(spark):
    """A NULL or wrong-dimension embedding must be excluded from scoring —
    never crash the executor batch — on both the query and corpus side,
    for the brute-force scan and the keyed (cell-restricted) variants."""
    from kupo_spark.functions.similarity import (
        brute_force_topk,
        label_filtered_topk,
        lsh_buckets,
        nearest_centroid,
        quantized,
    )

    emb = spark.read.parquet(EMB)
    bad = spark.createDataFrame(
        [
            (20_000, None, 0),            # NULL embedding
            (20_001, [0.5, -0.5], 0),     # ragged (dim 2, not 64)
        ],
        "vec_id BIGINT, embedding ARRAY<FLOAT>, label INT",
    ).select(*emb.columns)
    corpus = emb.unionByName(bad)

    clean = {(r.query_id, r.rank): r.neighbor_id
             for r in brute_force_topk(emb, n_queries=5, k=3).collect()}
    with_bad = {(r.query_id, r.rank): r.neighbor_id
                for r in brute_force_topk(corpus, n_queries=5, k=3).collect()}
    assert clean == with_bad  # bad rows never rank

    scored_ids = {r.neighbor_id for r in label_filtered_topk(corpus, 5, 3).collect()}
    assert 20_000 not in scored_ids and 20_001 not in scored_ids

    buckets = {r.vec_id for r in lsh_buckets(corpus).collect()}
    assert 20_000 not in buckets and 20_001 not in buckets

    cent = quantized(emb).where(F.col("vec_id") < 4).selectExpr(
        "vec_id as centroid_id", "q as cv"
    )
    assigned = {r.vec_id for r in nearest_centroid(quantized(corpus), cent).collect()}
    assert 20_000 not in assigned and 20_001 not in assigned


def test_ivf_multiprobe_matches_duckdb_oracle(spark, duck):
    """nprobe=2 Spark result is bit-identical to the DuckDB oracle with the
    same probes CTE (trained centroids, 2 Lloyd rounds)."""
    from kupo_spark.oracle_pipeline import ivf_topk_sql

    emb = spark.read.parquet(EMB)
    got = {
        (r.query_id, r.neighbor_id, r.cosine, r.rank)
        for r in ivf_topk(emb, 10, 5, kmeans_iters=2, nprobe=2).collect()
    }
    oracle = duck.execute(
        ivf_topk_sql(10, 5, kmeans_iters=2, nprobe=2)
    ).fetchall()
    assert got == {tuple(r) for r in oracle}
    assert len(got) > 0


def test_ivf_recall_non_decreasing_in_nprobe(spark):
    """Candidates grow monotonically with nprobe, and exact re-ranking over
    a candidate superset can only displace a true neighbor with a truer
    one — so recall vs brute force never drops when nprobe rises."""
    emb = spark.read.parquet(EMB)
    exact = {(r.query_id, r.neighbor_id) for r in brute_force_topk(emb, 10, 5).collect()}

    def recall(nprobe):
        got = {
            (r.query_id, r.neighbor_id)
            for r in ivf_topk(emb, 10, 5, kmeans_iters=2, nprobe=nprobe).collect()
        }
        return len(got & exact) / len(exact)

    r1, r2, r4 = recall(1), recall(2), recall(4)
    assert r1 <= r2 <= r4
    assert r4 > r1 or r1 == 1.0


# ---------------------------------------------------------------------------
# distributed query side (join path): no driver materialization, same rows
# ---------------------------------------------------------------------------


def _rows(df):
    return {tuple(r) for r in df.select("query_id", "neighbor_id", "cosine", "rank").collect()}


@pytest.mark.slow
def test_distributed_paths_match_closure_paths(spark):
    """The join path must be bit-identical to the closure path: same exact
    integer dots, same cosine rounding, same tie-breaks — at the oracle's
    n_queries=10 AND at a corpus-sized query set."""
    from kupo_spark.functions.similarity import (
        brute_force_topk,
        ivf_topk,
        label_filtered_topk,
        lsh_topk,
    )

    emb = spark.read.parquet(EMB)
    n_corpus = emb.count()
    for fn, kw in [
        (brute_force_topk, {}),
        (lsh_topk, {}),
        (ivf_topk, {}),
        (ivf_topk, {"nprobe": 3}),
        (ivf_topk, {"kmeans_iters": 1}),
        (label_filtered_topk, {}),
    ]:
        for nq in (10, n_corpus):
            a = _rows(fn(emb, n_queries=nq, k=3, distributed=False, **kw))
            b = _rows(fn(emb, n_queries=nq, k=3, distributed=True, **kw))
            assert a == b, (fn.__name__, kw, nq)


def test_distributed_path_never_collects_queries(spark, monkeypatch):
    """Proof of no driver materialization: poison DataFrame.collect — plan
    construction on the distributed path must survive for the bucket/label/
    brute-force variants (IVF legitimately collects its ≤n_centroids
    centroid rows, checked separately)."""
    from kupo_spark.functions import similarity as sim

    emb = spark.read.parquet(EMB)
    # patch the CONCRETE class (pyspark 4's classic DataFrame shadows the
    # pyspark.sql.DataFrame facade methods)
    DataFrame = type(emb)
    plans = {}
    orig = DataFrame.collect

    def poisoned(self):
        raise AssertionError("driver collect on the distributed query path")

    monkeypatch.setattr(DataFrame, "collect", poisoned)
    plans["brute"] = sim.brute_force_topk(emb, n_queries=10**9, k=3)
    plans["lsh"] = sim.lsh_topk(emb, n_queries=10**9, k=3)
    plans["label"] = sim.label_filtered_topk(emb, n_queries=10**9, k=3)
    monkeypatch.setattr(DataFrame, "collect", orig)
    # the plans execute, and the keyed variants pair through a real join
    assert plans["brute"].count() > 0
    for name in ("lsh", "label"):
        assert plans[name].count() > 0
        assert "Join" in formatted_plan(plans[name])
    # IVF distributed: only the centroid collect remains — count the calls
    calls = []

    def counting(self):
        calls.append(self.columns)
        return orig(self)

    monkeypatch.setattr(DataFrame, "collect", counting)
    df = sim.ivf_topk(emb, n_queries=10**9, k=3, nprobe=2)
    monkeypatch.setattr(DataFrame, "collect", orig)
    assert len(calls) == 1 and set(calls[0]) == {"centroid_id", "cv"}
    assert df.count() > 0


def test_semantic_dedup_matches_duckdb(spark, duck):
    from kupo_spark import oracle_pipeline
    from kupo_spark.functions.similarity import semantic_dedup
    from tools.check_correctness import rows_key

    emb = spark.read.parquet(EMB)
    sdf = semantic_dedup(emb, threshold=0.3, kmeans_iters=2)
    srows, scols = sdf.collect(), sdf.columns
    res = duck.execute(oracle_pipeline.semantic_dedup_sql(0.3, 16, 2))
    ocols = [d[0] for d in res.description]
    orows = res.fetchall()
    assert len(srows) == len(orows) > 0
    assert rows_key(srows, scols) == rows_key(orows, ocols)
    # the verdict actually drops something at this threshold, every
    # dropped vector points at a smaller id, kept rows carry -1
    by_id = {r.vec_id: r for r in srows}
    dropped = [r for r in srows if not r.keep]
    assert dropped, "threshold produced no dups -- fixture is degenerate"
    for r in dropped:
        assert r.dup_of < r.vec_id
        assert by_id[r.dup_of].cell == r.cell
    assert all(r.dup_of == -1 for r in srows if r.keep)


def test_semantic_dedup_verdict_is_order_invariant(spark):
    # the drop rule references ALL earlier cluster-mates, so feeding the
    # frame with a different partitioning cannot change the verdict
    from kupo_spark.functions.similarity import semantic_dedup

    emb = spark.read.parquet(EMB)
    a = sorted(map(tuple, semantic_dedup(emb, threshold=0.3).collect()))
    b = sorted(map(tuple, semantic_dedup(emb.repartition(7), threshold=0.3).collect()))
    assert a == b


def test_batch_pre_topk_is_exact_superset(spark):
    """r12 (guide §2.3): the closure-path scorers emit only a per-batch
    SUPERSET of each query's global top-k (margin rows within _TOPK_EPS of
    the batch's k-th best raw cosine survive), so the rank exchange and
    the Arrow transfer carry ~k rows per query per batch instead of the
    whole cross product.  The ranked output must stay bit-identical to
    the untouched distributed (join) path — including on a corpus built
    of exact ties crossing the k boundary, where the rounded ranking key
    falls back to neighbor_id order."""
    rows = [(i, [0.5] * 64) for i in range(40)]  # 40 identical vectors
    for i in range(40, 60):  # near-ties straddling round(·, 6) boundaries
        v = [0.5] * 64
        v[0] = 0.5 + (i - 50) * 1e-7
        rows.append((i, v))
    ties = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    closure = sorted(
        map(tuple, brute_force_topk(ties, n_queries=8, k=5).collect())
    )
    joined = sorted(
        map(tuple, brute_force_topk(ties, n_queries=8, k=5, distributed=True).collect())
    )
    assert closure == joined and len(closure) == 8 * 5


def test_batch_pre_topk_mask_boundaries():
    """The superset mask keeps k-th-boundary ties and margin rows, drops
    self-pairs, and keeps everything when the batch is smaller than k."""
    import numpy as np

    from kupo_spark.functions.similarity import _topk_superset_mask

    # 6 corpus vectors scored against 1 query (vec 0 is the query itself);
    # dots chosen so vectors 3/4/5 tie exactly at the k=2 boundary
    nids = np.array([0, 1, 2, 3, 4, 5], dtype=np.int64)
    qids = np.array([0], dtype=np.int64)
    nq = np.array([4], dtype=np.int64)
    nc = np.array([4, 4, 4, 4, 4, 4], dtype=np.int64)
    dots = np.array([[4], [4], [3], [2], [2], [2]], dtype=np.int64)
    keep = _topk_superset_mask(dots, nc, nq, nids, qids, 2)
    assert not keep[0, 0]          # self-pair dropped
    assert keep[1, 0] and keep[2, 0]  # the true top-2
    # small batch: everything but self kept
    keep_all = _topk_superset_mask(dots[:3], nc[:3], nq, nids[:3], qids, 5)
    assert keep_all[1, 0] and keep_all[2, 0] and not keep_all[0, 0]
