"""Similarity search over an embedding column (array<float>).

Numerical determinism strategy: embeddings are quantized to int64 at 1e-6
resolution (floor(x·1e6 + 0.5)); dot products and norms are then *exact*
integer sums (order-independent, engine-independent), and the final cosine
is a fixed sequence of IEEE-double ops — so Spark and DuckDB agree bit-for-
bit, and `round(cos, 6)` is stable.  Quantization error ~1e-6 is far below
any ranking-relevant signal.

Scale design:
- brute-force top-k: broadcast the (small) query set against the corpus —
  one scan, no shuffle of the corpus; ranking is a two-stage partial top-k
  (see :func:`topk_merge`) so no single reducer ever holds a whole corpus's
  scores for one query.
- sign-LSH: 6 deterministic hyperplanes (±1 components derived from md5
  nibble parity) → 64 buckets; candidates share a bucket.  Bucketing is a
  narrow projection; the ANN join shuffles only bucket-mates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

QUANT = "transform(embedding, x -> cast(floor(cast(x as double) * 1000000 + 0.5) as bigint))"

N_PLANES = 6
DIM = 64

#: fan-out of the partial top-k stage; at 100 TB raise to ≈ the cluster's
#: core count so every partial-rank group is a comfortable reducer.
TOPK_BUCKETS = 64


def topk_merge(scored: DataFrame, k: int, buckets: int = TOPK_BUCKETS) -> DataFrame:
    """Exact per-query top-k as partial top-k + tiny merge.

    A single ``Window.partitionBy("query_id")`` over the scored corpus ranks
    every candidate for a query in ONE task — the reducer holds O(corpus)
    rows per query.  Instead:

    1. *partial*: rank within ``(query_id, hash(neighbor_id) % buckets)`` —
       each group sees ~corpus/buckets rows, giving `buckets`-way parallelism
       and bounded reducer memory — and keep each group's local top-k;
    2. *merge*: rank the surviving ``buckets × k`` rows per query — a tiny,
       broadcast-sized window.

    Both stages order by the same ``(cosine DESC, neighbor_id ASC)`` key, so
    the result is bit-identical to the single-window ranking.

    When Catalyst's size estimate says the whole scored stream fits one
    advisory partition, the partial stage is pure overhead (its exchange +
    sort pass cost more than the reducer-memory bound buys) and the merge
    window ranks directly — one exchange instead of two, same rows (r11,
    guide §2.4).  The gate is the same scale-adaptive estimate the
    chain-order sort uses; big corpora keep the two-stage plan and its
    bounded reducers.
    """
    from kupo_spark.operators.fold_inputs import _estimated_plan_bytes, _size_bytes

    order = [F.col("cosine").desc(), F.col("neighbor_id").asc()]
    merge = Window.partitionBy("query_id").orderBy(*order)
    advisory = _size_bytes(
        scored.sparkSession.conf.get(
            "spark.sql.adaptive.advisoryPartitionSizeInBytes", "64MB"
        ),
        64 << 20,
    )
    if _estimated_plan_bytes(scored) <= advisory:
        return (
            scored.withColumn("rank", F.row_number().over(merge))
            .where(F.col("rank") <= k)
            .select("query_id", "neighbor_id", "cosine", "rank")
        )
    partial = Window.partitionBy("query_id", "part_bucket").orderBy(*order)
    return (
        scored.withColumn("part_bucket", F.pmod(F.hash("neighbor_id"), F.lit(buckets)))
        .withColumn("_prank", F.row_number().over(partial))
        .where(F.col("_prank") <= k)
        .withColumn("rank", F.row_number().over(merge))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def quantized(emb: DataFrame) -> DataFrame:
    return emb.select("vec_id", F.expr(QUANT).alias("q"))


#: query sets up to this size ride the task closure (one driver collect, one
#: numpy matmul per Arrow batch — the fast path); above it the query side
#: stays distributed and pairs with the corpus through an equi-join on the
#: restriction key (bucket / centroid / label) — no driver materialization.
#: Same shape as dedup.BROADCAST_ID_LIMIT: an explicit, documented gate.
QUERY_COLLECT_LIMIT = 100_000

#: exact int64 norm / dot as JVM expressions (the join path's scorer; the
#: closure path computes the same integers with numpy — bit-identical)
_NORM = "aggregate({v}, 0L, (a, x) -> a + x * x)"
_DOT = "aggregate(zip_with(qv, cv, (x, y) -> x * y), 0L, (a, x) -> a + x)"
_COSINE = (
    "round(cast(dot as double) /"
    " (sqrt(cast(nq as double)) * sqrt(cast(nc as double))), 6)"
)


def _valid(df: DataFrame, col: str = "q") -> DataFrame:
    return df.where(F.col(col).isNotNull() & (F.size(col) == DIM))


#: superset margin of the per-batch pre-top-k (see _topk_superset_mask).
#: round(cos, 6) can only reorder two rows whose raw cosines differ by
#: ≤ 1e-6, so keeping everything within 1e-6 of the batch's k-th best raw
#: cosine provably retains every row the global rounded ranking can place
#: in its top k; 2e-6 adds slack for free (a few extra survivor rows).
_TOPK_EPS = 2e-6


def _topk_superset_mask(dots, nc, nq, neighbor_ids, qids, k):
    """Boolean (batch × queries) mask keeping a provable SUPERSET of each
    query's global top-k candidates from this batch (guide §2.3: aggregate
    before you shuffle — the scorer emits ~k rows per query per batch
    instead of the whole cross product, shrinking the rank exchange's
    input from corpus × queries to batches × k × queries at every scale).

    Exactness: the global ranking key is (round(cosine, 6) DESC,
    neighbor_id ASC).  The raw cosine here is the bit-identical IEEE
    sequence the JVM evaluates (int64→double exact at quantized
    magnitudes, correctly-rounded sqrt/mul/div), and |a−b| > 1e-6 implies
    round(a,6) ≠ round(b,6), so any row that the rounded key can rank
    above a batch's k-th best raw value lies within _TOPK_EPS of it —
    the mask keeps all of them.  NaN cosines (zero-norm vectors) sort
    FIRST under Spark's DESC ordering, so NaN rows are kept
    unconditionally; self-pairs are dropped here (the caller no longer
    re-filters)."""
    import numpy as np

    with np.errstate(invalid="ignore", divide="ignore"):
        raw = dots / (
            np.sqrt(nc.astype(np.float64))[:, None]
            * np.sqrt(nq.astype(np.float64))[None, :]
        )
    self_mask = neighbor_ids[:, None] == qids[None, :]
    nan_keep = np.isnan(raw) & ~self_mask
    work = np.where(self_mask | np.isnan(raw), -np.inf, raw)
    nb = work.shape[0]
    if nb <= k:
        return ~self_mask
    kth = np.partition(work, nb - k, axis=0)[nb - k]
    return (nan_keep | (work >= kth - _TOPK_EPS)) & ~self_mask


def _join_scored(corpus_keyed: DataFrame, queries_keyed: DataFrame, keys: list[str]) -> DataFrame:
    """Distributed pairing: equi-join quantized queries × corpus on the
    restriction ``keys`` (empty = brute-force cartesian), with both sides'
    norms hoisted BEFORE the join so the per-pair work is one exact int64
    ``zip_with`` dot.  The query side is never collected — at a large query
    set this is the only shape that survives (the closure path would
    materialize the queries on the driver and ship them with every task)."""
    c = _valid(corpus_keyed).select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("q").alias("cv"),
        F.expr(_NORM.format(v="q")).alias("nc"),
        *keys,
    )
    qk = _valid(queries_keyed).select(
        F.col("vec_id").alias("query_id"),
        F.col("q").alias("qv"),
        F.expr(_NORM.format(v="q")).alias("nq"),
        *keys,
    )
    joined = c.join(qk, keys) if keys else c.crossJoin(qk)
    return (
        joined.where(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("dot", F.expr(_DOT))
        .withColumn("cosine", F.expr(_COSINE))
        .select("query_id", "neighbor_id", "cosine")
    )


def brute_force_topk(
    emb: DataFrame, n_queries: int = 10, k: int = 5, distributed: bool | None = None
) -> DataFrame:
    """Exact cosine top-k of every corpus vector for each of the first
    `n_queries` vec_ids (self excluded); deterministic tie-break on
    neighbor id.

    ``distributed`` (default: auto at ``QUERY_COLLECT_LIMIT``) keeps the
    query side as a DataFrame and pairs it with the corpus through a
    cartesian join (brute force IS all-pairs) — exact same integers, no
    driver collect; use when the query set is itself corpus-sized.

    Scoring is ONE corpus scan with the (small, by contract) query matrix
    riding the task closure: each Arrow batch of corpus vectors is scored
    against all queries with one int64 numpy matmul — exact integer dots
    (bit-identical to the SQL oracle), vectorized instead of per-element
    interpreted lambda evaluation.  The corpus is never shuffled before the
    partial top-k; scores stream out of the scan stage batch by batch.

    NOTE the query side is snapshotted EAGERLY (one collect at plan-build
    time) — callers get a frame whose query set is fixed as of this call,
    not re-resolved at execution like a fully-lazy join plan would be.
    NULL or wrong-dimension embeddings are excluded from both sides (the
    old HOF plan scored them as NULL cosine, which equally never ranked)."""
    import numpy as np
    import pandas as pd

    q = quantized(emb)
    if distributed is None:
        distributed = n_queries > QUERY_COLLECT_LIMIT
    if distributed:
        scored = _join_scored(q, q.where(F.col("vec_id") < n_queries), [])
        return topk_merge(scored, k)
    qrows = q.where(F.col("vec_id") < n_queries).collect()
    qrows = [r for r in qrows if r.q is not None and len(r.q) == DIM]
    qids = np.array([r.vec_id for r in qrows], dtype=np.int64)
    qmat = (
        np.array([r.q for r in qrows], dtype=np.int64)
        if qrows
        else np.zeros((0, DIM), dtype=np.int64)
    )
    nq = (qmat * qmat).sum(axis=1)
    n_q = len(qids)

    def score(batches):
        for pdf in batches:
            if n_q == 0:
                continue
            ok = pdf["q"].map(lambda v: v is not None and len(v) == DIM)
            pdf = pdf[ok]
            if len(pdf) == 0:
                continue
            cmat = np.array(pdf["q"].tolist(), dtype=np.int64)
            nc = (cmat * cmat).sum(axis=1)
            dots = cmat @ qmat.T  # (batch, n_q) exact int64
            # per-batch pre-top-k (r12, guide §2.3): only a provable
            # superset of each query's global top-k leaves the scan —
            # batches × k × queries rows reach the rank exchange instead
            # of corpus × queries (and that many fewer rows cross the
            # Arrow boundary back to the JVM)
            nids = pdf["vec_id"].values.astype(np.int64)
            keep = _topk_superset_mask(dots, nc, nq, nids, qids, k)
            ri, qi = np.nonzero(keep)
            if len(ri) == 0:
                continue
            yield pd.DataFrame(
                {
                    "neighbor_id": nids[ri],
                    "nc": nc[ri],
                    "query_id": qids[qi],
                    "nq": nq[qi],
                    "dot": dots[ri, qi],
                }
            )

    scored = q.mapInPandas(
        score, "neighbor_id long, nc long, query_id long, nq long, dot long"
    ).withColumn(
        "cosine",
        F.expr(
            "round(cast(dot as double) /"
            " (sqrt(cast(nq as double)) * sqrt(cast(nc as double))), 6)"
        ),
    )
    return topk_merge(scored, k)


def _keyed_vector_scores(
    corpus: DataFrame, key_col: str, keyed_query_rows, prefilter_k: int | None = None
) -> DataFrame:
    """Score a keyed corpus frame (vec_id, q, `key_col`) against per-key
    query sets with one int64 numpy matmul per (Arrow batch × key) — the
    shared scale engine of every partition-restricted ANN variant (IVF
    cell, LSH bucket, label filter).

    ``prefilter_k`` (r12, guide §2.3): when the caller immediately ranks
    the scored stream to its top ``k`` (every production consumer does),
    each (batch × key) group emits only a provable SUPERSET of the global
    top-k rows (see :func:`_topk_superset_mask`) instead of the full
    group × queries cross product — the rank exchange and the
    Python→JVM Arrow transfer carry ~k rows per query per batch at every
    scale.  ``None`` keeps the full scored stream (callers that consume
    raw scores).

    The (broadcast-small by contract) query rows are snapshotted to the
    driver and ride the task closure grouped by key: the corpus scan needs
    NO join and keeps its storage partitioning; scores stream out of the
    scan batch by batch.  Integer dots/norms are exact (bit-identical to
    the SQL oracle); the cosine division/round stays JVM-side.  NULL or
    wrong-dimension vectors are excluded from both sides."""
    import numpy as np
    import pandas as pd

    keyed: dict = {}
    for r in keyed_query_rows:
        if r.q is None or len(r.q) != DIM:
            continue
        keyed.setdefault(r[key_col], []).append((r.vec_id, r.q))
    mats = {}
    for key, rows in keyed.items():
        qids = np.array([v for v, _ in rows], dtype=np.int64)
        qmat = np.array([q for _, q in rows], dtype=np.int64)
        mats[key] = (qids, qmat, (qmat * qmat).sum(axis=1))

    def score(batches):
        for pdf in batches:
            ok = pdf["q"].map(lambda v: v is not None and len(v) == DIM)
            pdf = pdf[ok]
            for key, grp in pdf.groupby(key_col, sort=False):
                entry = mats.get(key)
                if entry is None or len(grp) == 0:
                    continue
                qids, qmat, nq = entry
                cmat = np.array(grp["q"].tolist(), dtype=np.int64)
                nc = (cmat * cmat).sum(axis=1)
                dots = cmat @ qmat.T  # (batch, n_q) exact int64
                n_q = len(qids)
                nids = grp["vec_id"].values.astype(np.int64)
                if prefilter_k is not None:
                    keep = _topk_superset_mask(dots, nc, nq, nids, qids, prefilter_k)
                    ri, qi = np.nonzero(keep)
                    if len(ri) == 0:
                        continue
                    yield pd.DataFrame(
                        {
                            "neighbor_id": nids[ri],
                            "nc": nc[ri],
                            "query_id": qids[qi],
                            "nq": nq[qi],
                            "dot": dots[ri, qi],
                        }
                    )
                    continue
                out = pd.DataFrame(
                    {
                        "neighbor_id": np.repeat(nids, n_q),
                        "nc": np.repeat(nc, n_q),
                        "query_id": np.tile(qids, len(grp)),
                        "nq": np.tile(nq, len(grp)),
                        "dot": dots.reshape(-1),
                    }
                )
                yield out[out.neighbor_id != out.query_id]

    scored = corpus.mapInPandas(
        score, "neighbor_id long, nc long, query_id long, nq long, dot long"
    )
    return scored.withColumn(
        "cosine",
        F.expr(
            "round(cast(dot as double) /"
            " (sqrt(cast(nq as double)) * sqrt(cast(nc as double))), 6)"
        ),
    )


def label_filtered_topk(
    emb: DataFrame, n_queries: int = 10, k: int = 3, distributed: bool | None = None
) -> DataFrame:
    """Filtered ANN: exact top-k restricted to corpus vectors sharing the
    query's label (the metadata-predicate + vector-search composition; at
    scale the corpus is partitioned by the filter column so the search
    reads only matching partitions and scores them vectorized).
    ``distributed`` pairs via a label equi-join instead of collecting the
    query side (auto above ``QUERY_COLLECT_LIMIT``)."""
    q = emb.select("vec_id", "label", F.expr(QUANT).alias("q"))
    if distributed is None:
        distributed = n_queries > QUERY_COLLECT_LIMIT
    if distributed:
        scored = _join_scored(q, q.where(F.col("vec_id") < n_queries), ["label"])
        return topk_merge(scored, k)
    qrows = q.where(F.col("vec_id") < n_queries).collect()
    scored = _keyed_vector_scores(q, "label", qrows, prefilter_k=k)
    return topk_merge(scored, k)


def hyperplane_expr(j: int, dim: int = DIM) -> str:
    """Deterministic ±1 hyperplane j: component i = +1 iff the i-th hex
    nibble of md5('hp{j}')‖md5('hp2{j}') is odd."""
    h = f"concat(md5('hp{j}'), md5('hp2{j}'))"
    return (
        f"transform(sequence(0, {dim - 1}), "
        f"i -> IF(position(substring({h}, i + 1, 1) IN '13579bdf') > 0, 1L, -1L))"
    )


def _hyperplane_matrix(planes: int, dim: int):
    """The deterministic ±1 hyperplanes as a (planes × dim) int64 numpy
    matrix — the Python mirror of :func:`hyperplane_expr`, byte-for-byte
    the same md5-nibble-parity rule the SQL oracle evaluates."""
    import hashlib

    import numpy as np

    H = np.empty((planes, dim), dtype=np.int64)
    for j in range(planes):
        h = (
            hashlib.md5(f"hp{j}".encode()).hexdigest()
            + hashlib.md5(f"hp2{j}".encode()).hexdigest()
        )
        H[j] = [1 if h[i] in "13579bdf" else -1 for i in range(dim)]
    return H


def lsh_buckets(emb: DataFrame, planes: int = N_PLANES, dim: int = DIM) -> DataFrame:
    """(vec_id, bucket): bucket = sign-bit string over the hyperplanes.

    The ±1 hyperplane matrix is a compile-time constant, so the projection
    is one int64 numpy matmul per Arrow batch (exact — sign decisions are
    integer comparisons, bit-identical to the SQL oracle's per-element
    evaluation); one scan, no join, no interpreted lambdas."""
    import numpy as np
    import pandas as pd

    H = _hyperplane_matrix(planes, dim)

    def project(batches):
        for pdf in batches:
            ok = pdf["q"].map(lambda v: v is not None and len(v) == dim)
            pdf = pdf[ok]
            if len(pdf) == 0:
                continue
            qmat = np.array(pdf["q"].tolist(), dtype=np.int64)
            signs = (qmat @ H.T) >= 0  # (batch, planes) exact
            buckets = [
                "".join("1" if b else "0" for b in row) for row in signs
            ]
            yield pd.DataFrame({"vec_id": pdf["vec_id"].values, "bucket": buckets})

    return quantized(emb).mapInPandas(project, "vec_id long, bucket string")


def _group_pairs_fn():
    """Pandas fn for applyInPandas: all ordered pairs WITHIN one group (an
    LSH bucket / a k-means cell), scored by exact int64 dot + norms via a
    blocked matmul — the temp is (block × n), not (n × n), so a hot group
    degrades gracefully instead of materializing n² at once."""
    import numpy as np
    import pandas as pd

    def group_pairs(key, pdf):
        ok = pdf["q"].map(lambda v: v is not None and len(v) == DIM)
        pdf = pdf[ok]
        n = len(pdf)
        empty = pd.DataFrame(
            {c: pd.Series(dtype="int64") for c in ("vec_a", "vec_b", "dot", "nq", "nc")}
        )
        if n < 2:
            return empty
        order = np.argsort(pdf["vec_id"].values)
        ids = pdf["vec_id"].values[order]
        mat = np.array(pdf["q"].tolist(), dtype=np.int64)[order]
        norms = (mat * mat).sum(axis=1)
        chunks = []
        for lo in range(0, n - 1, 1024):
            hi = min(lo + 1024, n - 1)
            dots = mat[lo:hi] @ mat.T  # (block, n)
            r, c = np.nonzero(
                np.arange(n)[None, :] > np.arange(lo, hi)[:, None]
            )
            chunks.append(
                pd.DataFrame(
                    {
                        "vec_a": ids[r + lo],
                        "vec_b": ids[c],
                        "dot": dots[r, c],
                        "nq": norms[r + lo],
                        "nc": norms[c],
                    }
                )
            )
        return pd.concat(chunks) if chunks else empty

    return group_pairs


_PAIRS_SCHEMA = "vec_a long, vec_b long, dot long, nq long, nc long"


def _scored_pairs_within(grouped) -> DataFrame:
    """GroupedData → (vec_a < vec_b, cosine): blocked pairwise scoring plus
    the JVM-side rounded-cosine projection shared by every within-group
    pair path."""
    scored = grouped.applyInPandas(_group_pairs_fn(), _PAIRS_SCHEMA)
    return scored.withColumn(
        "cosine",
        F.expr(
            "round(cast(dot as double) /"
            " (sqrt(cast(nq as double)) * sqrt(cast(nc as double))), 6)"
        ),
    )


def embedding_near_dup_pairs(
    emb: DataFrame, threshold: float = 0.3, planes: int = N_PLANES
) -> DataFrame:
    """Embedding-cosine near-duplicates, the ANN-gated scale path: candidate
    pairs must share a sign-LSH bucket (linear candidate generation — the
    bucket join only pairs bucket-mates, never all-pairs), then the exact
    integer cosine verifies candidates only.  Returns (vec_a < vec_b,
    cosine ≥ threshold).  Recall is the standard LSH trade: a pair at angle
    θ survives all `planes` hyperplanes with probability (1 − θ/π)^planes —
    raise recall with band OR-ing exactly as in the MinHash pipeline."""
    q = quantized(emb)
    b = lsh_buckets(emb, planes)
    qb = q.join(b, "vec_id")
    scored = _scored_pairs_within(qb.groupBy("bucket"))
    return scored.where(F.col("cosine") >= threshold).select("vec_a", "vec_b", "cosine")


def semantic_dedup(
    emb: DataFrame, threshold: float = 0.3, n_centroids: int = 16,
    kmeans_iters: int = 2,
) -> DataFrame:
    """SemDeDup (Abbas et al., 2023): cluster the embeddings with k-means,
    then within each cluster drop every vector that has cosine ≥ threshold
    with an earlier (smaller-id) cluster-mate.  Returns
    (vec_id, cell, keep, dup_of) with dup_of = the smallest such earlier
    id (-1 when kept).  The dropped-by rule references ALL earlier
    cluster-mates — kept or themselves dropped — so the verdict for a
    vector never depends on processing order, only on the id order (same
    batch-invariance contract as :func:`dedup.minhash_est_dedup`).

    Scale design: identical candidate-gating shape to the LSH near-dup
    path, with the k-means cell as the blocking key — pairwise work is
    Σ|cell|² bounded by the coarse quantizer, the per-cell scoring is the
    shared blocked int64 matmul, and the verdict is one map-side-combinable
    min per dropped vector.  The cluster step reuses :func:`ivf_assign`
    (exact-integer Lloyd), so an oracle engine re-derives identical cells."""
    assigned = ivf_assign(emb, n_centroids, kmeans_iters)
    qa = quantized(emb).join(assigned, "vec_id")
    scored = _scored_pairs_within(qa.groupBy("centroid_id"))
    dups = (
        scored.where(F.col("cosine") >= threshold)
        .groupBy(F.col("vec_b").alias("vec_id"))
        .agg(F.min("vec_a").alias("dup_of"))
    )
    return assigned.join(dups, "vec_id", "left").select(
        "vec_id",
        F.col("centroid_id").alias("cell"),
        F.col("dup_of").isNull().alias("keep"),
        F.coalesce("dup_of", F.lit(-1)).cast("long").alias("dup_of"),
    )


N_CENTROIDS = 16


def nearest_centroid(q: DataFrame, centroids: DataFrame) -> DataFrame:
    """(vec_id, centroid_id): argmin-L2² assignment against the (tiny, by
    construction) centroid set.

    The centroids are snapshotted to the driver and ride the task closure;
    each Arrow batch of vectors computes its full distance matrix with one
    int64 numpy matmul expansion (‖q‖² − 2·q·c + ‖c‖², exact — no float
    round-off) and takes the row argmin.  Centroid rows are sorted by id so
    numpy's first-minimum argmin IS the centroid-id tie-break the SQL
    oracle's min(struct(dist2, centroid_id)) performs.  One corpus scan,
    no join, no per-vector reducer; inside k-means the per-round collect
    also truncates the growing Lloyd lineage."""
    return nearest_centroid_rows(q, centroids.collect())


def nearest_centroid_rows(q: DataFrame, centroid_rows) -> DataFrame:
    """:func:`nearest_centroid` over already-collected centroid rows —
    callers that also need the rows driver-side (multi-probe fan-out)
    collect once instead of re-executing the centroid lineage (with
    trained centroids that lineage is the whole Lloyd iteration)."""
    import numpy as np
    import pandas as pd

    crows = sorted(centroid_rows, key=lambda r: r.centroid_id)
    cids = np.array([r.centroid_id for r in crows], dtype=np.int64)
    cmat = (
        np.array([r.cv for r in crows], dtype=np.int64)
        if crows
        else np.zeros((0, DIM), dtype=np.int64)
    )
    cn = (cmat * cmat).sum(axis=1)

    def assign(batches):
        for pdf in batches:
            if len(cids) == 0:
                continue
            ok = pdf["q"].map(lambda v: v is not None and len(v) == DIM)
            pdf = pdf[ok]
            if len(pdf) == 0:
                continue
            qmat = np.array(pdf["q"].tolist(), dtype=np.int64)
            d = (qmat * qmat).sum(axis=1)[:, None] - 2 * (qmat @ cmat.T) + cn[None, :]
            idx = d.argmin(axis=1)
            yield pd.DataFrame(
                {"vec_id": pdf["vec_id"].values, "centroid_id": cids[idx]}
            )

    return q.mapInPandas(assign, "vec_id long, centroid_id long")


#: exact floor-mean of a bigint sum: subtract the positive mod first so the
#: double division is exact (numerator divisible by c), identical in DuckDB
_FLOOR_MEAN = "cast((s - ((s % c + c) % c)) / c as bigint)"


def kmeans_centroids(
    emb: DataFrame, n_centroids: int = N_CENTROIDS, iters: int = 2
) -> DataFrame:
    """(centroid_id, cv): k-means centroids after ``iters`` Lloyd rounds in
    quantized integer space.

    Seeds are the first `n_centroids` vectors (deterministic).  Each round:
    exact-int argmin assignment against the broadcast centroids, then the
    new centroid is the per-dimension floor-mean — posexplode + sum/count
    (map-side-combinable; dim× row inflation, k×dim-row output), the shape
    that survives a 100 TB corpus.  All arithmetic is exact (int sums,
    mod-adjusted floor division), so an oracle engine re-derives
    bit-identical centroids; empty cells drop out in both engines alike."""
    return _kmeans_q(quantized(emb), n_centroids, iters)


def _kmeans_q(
    q: DataFrame, n_centroids: int, iters: int, seeds: DataFrame | None = None
) -> DataFrame:
    """The Lloyd loop over an already-quantized ``(vec_id, q)`` frame —
    shared by :func:`kmeans_centroids` (raw embeddings, first-n seeds: the
    pinned oracle contract) and the persisted index's ``rebalance``, which
    passes density-aware ``seeds`` (centroid_id, cv): first-n seeding
    anchors one centroid per far-flung seed vector, and Lloyd then cannot
    break up a dominant cluster — each outside centroid keeps its own
    points, so the hot cell survives every round."""
    cent = seeds
    if cent is None:
        cent = q.where(F.col("vec_id") < n_centroids).select(
            F.col("vec_id").alias("centroid_id"), F.col("q").alias("cv")
        )
    for _ in range(iters):
        assigned = nearest_centroid(q, cent)
        sums = (
            q.join(assigned, "vec_id")
            .select("centroid_id", F.posexplode("q").alias("pos", "x"))
            .groupBy("centroid_id", "pos")
            .agg(F.sum("x").alias("s"), F.count("*").alias("c"))
        )
        cent = (
            sums.withColumn("m", F.expr(_FLOOR_MEAN))
            .groupBy("centroid_id")
            .agg(
                F.expr(
                    "transform(array_sort(collect_list(struct(pos, m))), p -> p.m)"
                ).alias("cv")
            )
        )
    return cent


def _ivf_centroids(
    emb: DataFrame, n_centroids: int, kmeans_iters: int
) -> DataFrame:
    """(centroid_id, cv): the Lloyd-trained centroids when
    ``kmeans_iters>0``, else the deterministic seed set (first
    `n_centroids` vectors)."""
    if kmeans_iters > 0:
        return kmeans_centroids(emb, n_centroids, kmeans_iters)
    return quantized(emb).where(F.col("vec_id") < n_centroids).select(
        F.col("vec_id").alias("centroid_id"), F.col("q").alias("cv")
    )


def ivf_assign(
    emb: DataFrame, n_centroids: int = N_CENTROIDS, kmeans_iters: int = 0
) -> DataFrame:
    """IVF coarse quantization: assign every vector to its nearest centroid.
    ``kmeans_iters=0`` uses the deterministic seed set (the first
    `n_centroids` vectors); ``kmeans_iters>0`` trains the centroids with
    that many Lloyd rounds first (:func:`kmeans_centroids`).  Either way
    distances are exact integer L2², so the argmin (tie-break on centroid
    id) is engine-exact."""
    return nearest_centroid(
        quantized(emb), _ivf_centroids(emb, n_centroids, kmeans_iters)
    )


def _probe_rows(qvec_rows, centroid_rows, nprobe: int) -> list:
    """Multi-probe fan-out: each query row is replicated under its
    ``nprobe`` nearest cells (exact int L2², ties on centroid id) so the
    keyed scorer visits every probed cell.  Driver-side numpy over
    (n_queries × n_centroids) — both tiny by contract."""
    import numpy as np
    from pyspark.sql import Row

    crows = sorted(centroid_rows, key=lambda r: r.centroid_id)
    cids = np.array([r.centroid_id for r in crows], dtype=np.int64)
    cmat = np.array([r.cv for r in crows], dtype=np.int64)
    cn = (cmat * cmat).sum(axis=1)
    out = []
    for r in qvec_rows:
        if r.q is None or len(r.q) != DIM:
            continue
        v = np.array(r.q, dtype=np.int64)
        d = int(v @ v) - 2 * (cmat @ v) + cn
        # cids ascend, stable sort → equal-distance ties break on cell id
        for j in np.argsort(d, kind="stable")[:nprobe]:
            out.append(Row(vec_id=r.vec_id, q=r.q, centroid_id=int(cids[j])))
    return out


def nearest_centroids_multi(q: DataFrame, centroid_rows, nprobe: int) -> DataFrame:
    """(vec_id, centroid_id) × nprobe: each vector's ``nprobe`` nearest
    cells — the distributed multi-probe fan-out (:func:`_probe_rows` without
    the driver loop).  Centroids ride the closure (tiny by construction);
    exact int distances; stable argsort over ascending cell ids gives the
    same tie-break as the driver-side variant and the SQL oracle."""
    import numpy as np
    import pandas as pd

    crows = sorted(centroid_rows, key=lambda r: r.centroid_id)
    cids = np.array([r.centroid_id for r in crows], dtype=np.int64)
    cmat = (
        np.array([r.cv for r in crows], dtype=np.int64)
        if crows
        else np.zeros((0, DIM), dtype=np.int64)
    )
    cn = (cmat * cmat).sum(axis=1)
    npb = min(nprobe, len(cids))

    def probe(batches):
        for pdf in batches:
            if npb == 0:
                continue
            ok = pdf["q"].map(lambda v: v is not None and len(v) == DIM)
            pdf = pdf[ok]
            if len(pdf) == 0:
                continue
            qmat = np.array(pdf["q"].tolist(), dtype=np.int64)
            d = (qmat * qmat).sum(axis=1)[:, None] - 2 * (qmat @ cmat.T) + cn[None, :]
            idx = np.argsort(d, axis=1, kind="stable")[:, :npb]
            yield pd.DataFrame(
                {
                    "vec_id": np.repeat(pdf["vec_id"].values, npb),
                    "centroid_id": cids[idx].reshape(-1),
                }
            )

    return q.mapInPandas(probe, "vec_id long, centroid_id long")


def ivf_topk(
    emb: DataFrame, n_queries: int = 10, k: int = 5,
    n_centroids: int = N_CENTROIDS, kmeans_iters: int = 0, nprobe: int = 1,
    distributed: bool | None = None,
) -> DataFrame:
    """ANN top-k over the query's ``nprobe`` nearest IVF cells (candidates
    share a probed cell; each corpus vector lives in exactly one cell, so
    probes never double-count a neighbor).  At 100 TB the corpus is stored
    partitioned by centroid_id, so a probe reads exactly ``nprobe``
    partitions — recall rises with nprobe at linear read cost, the
    standard IVF quality dial.

    ``distributed`` (default: auto at ``QUERY_COLLECT_LIMIT``) keeps the
    query side as a DataFrame: probes are computed executor-side against
    the closure-shipped centroids (bounded at ``n_centroids`` rows — the
    one collect this path keeps) and candidates pair via a centroid_id
    equi-join."""
    q = quantized(emb)
    # collect the centroids ONCE: assignment and probe fan-out both need
    # them, and with kmeans_iters>0 the lineage is the whole Lloyd loop
    crows = _ivf_centroids(emb, n_centroids, kmeans_iters).collect()
    assign = nearest_centroid_rows(q, crows)
    qa = q.join(assign, "vec_id")
    if distributed is None:
        distributed = n_queries > QUERY_COLLECT_LIMIT
    if distributed:
        queries = q.where(F.col("vec_id") < n_queries)
        probes = nearest_centroids_multi(queries, crows, max(1, nprobe))
        scored = _join_scored(qa, queries.join(probes, "vec_id"), ["centroid_id"])
        return topk_merge(scored, k)
    if nprobe <= 1:
        qrows = qa.where(F.col("vec_id") < n_queries).collect()
    else:
        queries = q.where(F.col("vec_id") < n_queries)
        qrows = _probe_rows(queries.collect(), crows, nprobe)
    scored = _keyed_vector_scores(qa, "centroid_id", qrows, prefilter_k=k)
    return topk_merge(scored, k)


def lsh_topk(
    emb: DataFrame, n_queries: int = 10, k: int = 5, planes: int = N_PLANES,
    distributed: bool | None = None,
) -> DataFrame:
    """ANN top-k: candidates restricted to the query's LSH bucket.

    ``distributed`` (default: auto at ``QUERY_COLLECT_LIMIT``) keeps the
    query side as a DataFrame and pairs with the corpus via a bucket
    equi-join — only bucket-mates shuffle, no driver collect."""
    q = quantized(emb)
    buckets = lsh_buckets(emb, planes)
    qb = q.join(buckets, "vec_id")
    if distributed is None:
        distributed = n_queries > QUERY_COLLECT_LIMIT
    if distributed:
        scored = _join_scored(qb, qb.where(F.col("vec_id") < n_queries), ["bucket"])
        return topk_merge(scored, k)
    qrows = qb.where(F.col("vec_id") < n_queries).collect()
    scored = _keyed_vector_scores(qb, "bucket", qrows, prefilter_k=k)
    return topk_merge(scored, k)
