"""Product quantization (PQ) for embedding compression + ADC search.

The missing piece between brute-force/LSH/IVF and a real 100 TB vector
corpus: storing raw float vectors costs dim×4 bytes/vector; PQ stores
``m`` one-byte (here: sub-byte) codes — 64-dim float32 → 8 bytes at
m=8 — and searches them without decompression via Asymmetric Distance
Computation (Jégou, Douze, Schmid, "Product Quantization for Nearest
Neighbor Search", IEEE TPAMI 2011; the IVF-PQ scheme FAISS popularized).

Design, Spark-first:

- **Codebook training is driver-side on a deterministic sample.**  PQ
  codebooks are tiny (m × 2^bits × dim/m ints) and are always trained on
  a corpus sample in practice; the sample (first ``sample`` vectors) fits
  the driver by contract.  Training runs Lloyd rounds in the repo's exact
  integer space (quantized 1e-6 grid, floor-means) — bit-deterministic,
  no float nondeterminism, same arithmetic the SQL oracles use.
- **Encoding is distributed.**  ``pq_encode`` maps each Arrow batch with
  one numpy matmul per subspace (argmin over centroids, stable tie-break
  on centroid id) — a narrow scan, no shuffle, no join.
- **ADC search never reconstructs the corpus.**  For each query,
  ``m × 2^bits`` distance tables ride the task closure; scoring a vector
  is ``m`` table lookups + a sum (vectorized numpy take over the whole
  batch).  The exact invariant tested: ADC(q, code(x)) equals the true
  L2² between q and the *reconstructed* x — approximation error lives
  entirely in the code assignment, never in the scoring.
- Ranking reuses :func:`kupo_spark.functions.similarity.topk_merge`
  (two-stage partial top-k — no per-query single reducer).

``ivf_pq_topk`` composes the IVF coarse partition (cell-restricted
candidates, ``nprobe`` dial) with ADC scoring — the standard IVF-PQ
layout where a 100 TB corpus is stored partitioned by coarse cell with
8-byte codes, and a probe reads nprobe partitions of codes only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kupo_spark.functions.similarity import (
    DIM,
    QUERY_COLLECT_LIMIT,
    _ivf_centroids,
    _probe_rows,
    _valid,
    nearest_centroid_rows,
    nearest_centroids_multi,
    quantized,
    topk_merge,
)

__all__ = [
    "train_codebooks", "pq_encode", "pq_reconstruct", "pq_adc_topk",
    "pq_refined_topk", "exact_rerank", "ivf_pq_topk",
]

M_SUB = 8  #: subspaces (64-dim -> 8 dims each)
BITS = 4  #: 2^4 = 16 centroids per subspace -> 4 bits/code, 8 codes/vector


def _floor_mean(s: int, c: int) -> int:
    """Exact floor(s / c) for ints (Python // floors already; kept for
    symmetry with the SQL _FLOOR_MEAN used by the k-means oracle)."""
    return s // c


def train_codebooks(
    emb: DataFrame,
    m: int = M_SUB,
    bits: int = BITS,
    iters: int = 3,
    sample: int = 4096,
) -> list:
    """Train ``m`` per-subspace codebooks of ``2^bits`` centroids each on
    the first ``sample`` vectors, with Lloyd rounds in exact integer
    arithmetic.  Returns ``codebooks[m][2^bits][dim/m]`` (plain ints —
    deterministic, serializable, closure-friendly).

    Seeds are the first ``2^bits`` sampled vectors' sub-slices; an empty
    cluster keeps its previous centroid (standard practice, keeps k
    stable).  Deterministic end to end: same data → same codebooks."""
    import numpy as np

    if DIM % m:
        raise ValueError(f"dim {DIM} not divisible by m={m}")
    dsub = DIM // m
    k = 1 << bits
    # vec_id-bounded, not .limit(): limit() takes whichever partitions
    # answer first, which would make the "deterministic sample" contract
    # (and therefore the stored codes) run-dependent
    rows = (
        quantized(emb)
        .where(F.col("q").isNotNull() & (F.size("q") == DIM))
        .where(F.col("vec_id") < sample)
        .collect()
    )
    if len(rows) < k:
        raise ValueError(f"sample of {len(rows)} vectors < {k} centroids")
    # collect() order follows partition completion order — sort by vec_id so
    # the seed centroids (sub[:k]) honour the determinism contract above
    rows.sort(key=lambda r: r.vec_id)
    data = np.array([r.q for r in rows], dtype=np.int64)  # (n, DIM)
    books = []
    for j in range(m):
        sub = data[:, j * dsub : (j + 1) * dsub]  # (n, dsub)
        cent = sub[:k].copy()
        for _ in range(iters):
            # exact int L2^2; argmin ties break on lowest centroid index
            d = (
                (sub * sub).sum(axis=1)[:, None]
                - 2 * (sub @ cent.T)
                + (cent * cent).sum(axis=1)[None, :]
            )
            a = d.argmin(axis=1)
            for ci in range(k):
                mask = a == ci
                n = int(mask.sum())
                if n == 0:
                    continue  # empty cluster keeps its centroid
                s = sub[mask].sum(axis=0)
                cent[ci] = np.floor_divide(s, n)
        books.append(cent.tolist())
    return books


def pq_encode(emb: DataFrame, codebooks: list) -> DataFrame:
    """(vec_id, code array<int> of length m): nearest sub-centroid per
    subspace.  One numpy matmul per (Arrow batch × subspace); the scan
    stays narrow (vec_id + embedding), nothing shuffles."""
    import numpy as np
    import pandas as pd

    m = len(codebooks)
    dsub = DIM // m
    cents = [np.array(b, dtype=np.int64) for b in codebooks]
    cnorms = [(c * c).sum(axis=1) for c in cents]

    def encode(batches):
        for pdf in batches:
            ok = pdf["q"].map(lambda v: v is not None and len(v) == DIM)
            pdf = pdf[ok]
            if not len(pdf):
                continue
            mat = np.array(pdf["q"].tolist(), dtype=np.int64)
            codes = np.empty((len(pdf), m), dtype=np.int64)
            for j in range(m):
                sub = mat[:, j * dsub : (j + 1) * dsub]
                d = (
                    (sub * sub).sum(axis=1)[:, None]
                    - 2 * (sub @ cents[j].T)
                    + cnorms[j][None, :]
                )
                codes[:, j] = d.argmin(axis=1)
            yield pd.DataFrame(
                {"vec_id": pdf["vec_id"].values, "code": list(codes)}
            )

    return quantized(emb).mapInPandas(encode, "vec_id long, code array<long>")


def pq_reconstruct(codes: DataFrame, codebooks: list) -> DataFrame:
    """(vec_id, qr): the reconstructed (approximate) quantized vector —
    concatenated sub-centroids.  Pure JVM: the codebooks become a literal
    array-of-arrays per subspace and ``element_at`` gathers, so
    reconstruction is a codegen projection, no Python."""
    cols = []
    m = len(codebooks)
    for j, book in enumerate(codebooks):
        lit = (
            "array("
            + ",".join("array(" + ",".join(str(x) for x in c) + ")" for c in book)
            + ")"
        )
        cols.append(f"element_at({lit}, cast(code[{j}] as int) + 1)")
    expr = "flatten(array(" + ",".join(cols) + "))"
    return codes.select("vec_id", F.expr(expr).alias("qr"))


def _adc_tables(query_rows, codebooks):
    """Per-query ADC tables: tables[q][j][c] = L2²(q_sub_j, centroid_c) —
    exact ints, shape (n_q, m, 2^bits)."""
    import numpy as np

    m = len(codebooks)
    dsub = DIM // m
    cents = [np.array(b, dtype=np.int64) for b in codebooks]
    qids, tabs = [], []
    for r in query_rows:
        if r.q is None or len(r.q) != DIM:
            continue
        v = np.array(r.q, dtype=np.int64)
        per = []
        for j in range(m):
            sub = v[j * dsub : (j + 1) * dsub]
            diff = cents[j] - sub[None, :]
            per.append((diff * diff).sum(axis=1))
        qids.append(r.vec_id)
        tabs.append(np.stack(per))  # (m, k)
    import numpy as np

    return np.array(qids, dtype=np.int64), (
        np.stack(tabs) if tabs else np.zeros((0, m, 1 << BITS), dtype=np.int64)
    )


def _adc_table_expr(codebooks: list) -> str:
    """Per-query ADC tables as ONE codegen expression over a query-vector
    column ``qv``: ``tab[j][c] = L2²(qv_sub_j, centroid_{j,c})`` — exact
    int64, the same integers :func:`_adc_tables` computes with numpy.  The
    codebooks (m × 2^bits × dim/m ints, ~1 KB) become array literals, so
    the distributed query side needs NO Python and NO driver collect."""
    m = len(codebooks)
    dsub = DIM // m
    subs = []
    for j, book in enumerate(codebooks):
        lit = (
            "array("
            + ",".join(
                "array(" + ",".join(str(int(x)) for x in c) + ")" for c in book
            )
            + ")"
        )
        subs.append(
            f"transform({lit}, c -> aggregate("
            f"zip_with(slice(qv, {j * dsub + 1}, {dsub}), c,"
            " (x, y) -> (x - y) * (x - y)), 0L, (a, x) -> a + x))"
        )
    return "array(" + ",".join(subs) + ")"


#: ADC score of one (query table, corpus code) pair: m gathers + a sum —
#: the JVM-side analog of the closure path's vectorized numpy take
_ADC_SUM = (
    "aggregate(zip_with(tab, code, (t, ci) -> element_at(t, cast(ci as int) + 1)),"
    " 0L, (a, x) -> a + x)"
)


def _query_tables(emb: DataFrame, codebooks: list, n_queries: int) -> DataFrame:
    """(query_id, tab): the distributed query side — ADC tables computed
    executor-side from the codebook literals, never materialized on the
    driver."""
    return _valid(quantized(emb).where(F.col("vec_id") < n_queries)).select(
        F.col("vec_id").alias("query_id"), F.col("q").alias("qv")
    ).select("query_id", F.expr(_adc_table_expr(codebooks)).alias("tab"))


def _adc_rank(scored: DataFrame, k: int) -> DataFrame:
    return topk_merge(
        scored.withColumn("cosine", -F.col("adist").cast("double")).drop("adist"), k
    )


def pq_adc_topk(
    emb: DataFrame,
    codebooks: list,
    n_queries: int = 10,
    k: int = 5,
    distributed: bool | None = None,
) -> DataFrame:
    """Approximate top-k by ADC over PQ codes: for each query, ``m``
    table lookups + a sum per candidate (numpy ``take`` over the whole
    Arrow batch — the corpus is scanned once as codes, never
    reconstructed).  Queries stay exact (asymmetric).

    ``distributed`` (default: auto at ``QUERY_COLLECT_LIMIT``, mirroring
    the other top-k paths) keeps the query side as a DataFrame: ADC
    tables are a codegen projection from the codebook literals
    (:func:`_adc_table_expr`) and scoring is ``m`` ``element_at`` gathers
    per pair — no driver collect, no per-query closure shipping (at 100k+
    queries the closure path's ~16 KB/query tables would be GBs per task).

    Output mirrors the other top-k paths (query_id, neighbor_id, cosine,
    rank) with ``cosine`` = −ADC L2² (cast to double; "higher is
    better") so :func:`topk_merge` ranks it unchanged."""
    import numpy as np
    import pandas as pd

    codes = pq_encode(emb, codebooks)
    if distributed is None:
        distributed = n_queries > QUERY_COLLECT_LIMIT
    if distributed:
        scored = (
            codes.select(F.col("vec_id").alias("neighbor_id"), "code")
            .crossJoin(_query_tables(emb, codebooks, n_queries))
            .where(F.col("neighbor_id") != F.col("query_id"))
            .select("query_id", "neighbor_id", F.expr(_ADC_SUM).alias("adist"))
        )
        return _adc_rank(scored, k)
    qrows = quantized(emb).where(F.col("vec_id") < n_queries).collect()
    qids, tabs = _adc_tables(qrows, codebooks)
    m = len(codebooks)

    def score(batches):
        for pdf in batches:
            if not len(pdf) or not len(qids):
                continue
            cmat = np.array(pdf["code"].tolist(), dtype=np.int64)  # (n, m)
            n = len(pdf)
            # dist[q, i] = sum_j tabs[q, j, cmat[i, j]] — m vectorized takes
            dist = np.zeros((len(qids), n), dtype=np.int64)
            for j in range(m):
                dist += tabs[:, j, :][:, cmat[:, j]]
            out = pd.DataFrame(
                {
                    "query_id": np.repeat(qids, n),
                    "neighbor_id": np.tile(pdf["vec_id"].values, len(qids)),
                    "adist": dist.reshape(-1),
                }
            )
            yield out[out.query_id != out.neighbor_id]

    scored = codes.mapInPandas(score, "query_id long, neighbor_id long, adist long")
    return _adc_rank(scored, k)


def pq_refined_topk(
    emb: DataFrame,
    codebooks: list,
    n_queries: int = 10,
    k: int = 5,
    refine: int = 4,
    distributed: bool | None = None,
) -> DataFrame:
    """Two-stage search with exact reranking — the FAISS ``RefineFlat``
    stage every production PQ deployment runs: ADC ranks the WHOLE corpus
    from 8-byte codes to a top-``k·refine`` candidate list per query, then
    only those candidates' raw vectors are read back and reranked by the
    exact integer cosine.  Recall approaches exact search as ``refine``
    grows while the expensive exact arithmetic touches ``k·refine`` rows
    per query instead of the corpus.

    Scale shape: stage 1 is :func:`pq_adc_topk` (one code scan, no
    reconstruction); stage 2 joins the tiny candidate list (broadcast —
    ``n_queries·k·refine`` rows by construction) against the vector
    table, so the corpus is scanned once per stage and never shuffled.
    Ranking ties and rounding match :func:`similarity.brute_force_topk`
    exactly, so a candidate set that contains the true top-k yields the
    identical rows."""
    from kupo_spark.functions.similarity import _COSINE, _DOT, _NORM

    cand = pq_adc_topk(
        emb, codebooks, n_queries, k * refine, distributed=distributed
    ).select("query_id", "neighbor_id")
    return exact_rerank(cand, emb, k)


def exact_rerank(cand: DataFrame, emb: DataFrame, k: int) -> DataFrame:
    """Rerank a (query_id, neighbor_id) candidate list by the exact
    integer cosine over ``emb``'s raw vectors — the refine stage, shared
    by :func:`pq_refined_topk` and the persisted index.  The candidate
    list is broadcast-small by construction (n_queries·k·refine rows), so
    the vector table is scanned once and never shuffled; rounding and
    tie-break match the brute-force path bit-for-bit."""
    from kupo_spark.functions.similarity import _COSINE, _DOT, _NORM

    pairs = cand.select("query_id", "neighbor_id")
    q = _valid(quantized(emb))
    qv = q.select(
        F.col("vec_id").alias("query_id"),
        F.col("q").alias("qv"),
        F.expr(_NORM.format(v="q")).alias("nq"),
    )
    cv = q.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("q").alias("cv"),
        F.expr(_NORM.format(v="q")).alias("nc"),
    )
    # join order matters twice over: (a) ONLY candidate-bounded frames may
    # broadcast — a first cut broadcast corpus-wide qv and measured 15×
    # super-linear at the sf10 scaling point; (b) the candidate lineage
    # (a full corpus ADC scan) must evaluate ONCE — deriving a query-id
    # semi-join from `pairs` re-ran it.  So: pairs broadcast into the
    # neighbor-vector scan (candidate-bounded result), and THAT result
    # broadcast into the query-vector scan.  The corpus streams through
    # two scans, is never shuffled, and cand executes exactly once.
    with_neighbor = cv.join(F.broadcast(pairs), "neighbor_id")
    scored = (
        qv.join(F.broadcast(with_neighbor), "query_id")
        .withColumn("dot", F.expr(_DOT))
        .withColumn("cosine", F.expr(_COSINE))
        .select("query_id", "neighbor_id", "cosine")
    )
    return topk_merge(scored, k)


def _adc_cell_scorer(qids, tabs, cells, m, prefilter_k=None):
    """mapInPandas kernel scoring stored (vec_id, code, centroid_id) rows
    against closure-shipped per-probe ADC tables — each probe row only
    scores codes of its own cell.  Shared by :func:`ivf_pq_topk` and the
    persisted :class:`~kupo_spark.functions.ann_index.VectorIndex`.

    ``prefilter_k`` (r12, guide §2.3): every consumer immediately ranks
    the stream to its top ``k`` (``_adc_rank``), so each (batch × cell)
    group emits only the rows with ``adist`` ≤ the group's k-th smallest
    — ties at the boundary kept (ADC distances are exact int64, so the
    comparison is exact; the merge's neighbor_id tiebreak settles them).
    A provable superset of the global top-k leaves the scan: ~k rows per
    probe per batch instead of the cell × probes cross product."""
    import numpy as np
    import pandas as pd

    def score(batches):
        for pdf in batches:
            if not len(pdf) or not len(qids):
                continue
            for cell, grp in pdf.groupby("centroid_id", sort=False):
                sel = cells == cell
                if not sel.any() or not len(grp):
                    continue
                t = tabs[sel]
                qi = qids[sel]
                cmat = np.array(grp["code"].tolist(), dtype=np.int64)
                n = len(grp)
                dist = np.zeros((len(qi), n), dtype=np.int64)
                for j in range(m):
                    dist += t[:, j, :][:, cmat[:, j]]
                nids = grp["vec_id"].values.astype(np.int64)
                if prefilter_k is not None:
                    self_mask = qi[:, None] == nids[None, :]
                    if n > prefilter_k:
                        work = np.where(
                            self_mask, np.iinfo(np.int64).max, dist
                        )
                        kth = np.partition(work, prefilter_k - 1, axis=1)[
                            :, prefilter_k - 1
                        ]
                        keep = (work <= kth[:, None]) & ~self_mask
                    else:
                        keep = ~self_mask
                    qr, nr = np.nonzero(keep)
                    if len(qr) == 0:
                        continue
                    yield pd.DataFrame(
                        {
                            "query_id": qi[qr],
                            "neighbor_id": nids[nr],
                            "adist": dist[qr, nr],
                        }
                    )
                    continue
                out = pd.DataFrame(
                    {
                        "query_id": np.repeat(qi, n),
                        "neighbor_id": np.tile(nids, len(qi)),
                        "adist": dist.reshape(-1),
                    }
                )
                yield out[out.query_id != out.neighbor_id]

    return score


def _adc_join_scored(codes: DataFrame, qtab: DataFrame) -> DataFrame:
    """Distributed ADC pairing: (vec_id, code, centroid_id) codes
    equi-joined to (query_id, tab, centroid_id) probe tables, scored by
    the codegen gather-sum — no Python, no driver collect."""
    return (
        codes.select(F.col("vec_id").alias("neighbor_id"), "code", "centroid_id")
        .join(qtab, "centroid_id")
        .where(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", F.expr(_ADC_SUM).alias("adist"))
    )


def ivf_pq_topk(
    emb: DataFrame,
    codebooks: list,
    n_queries: int = 10,
    k: int = 5,
    n_centroids: int = 16,
    kmeans_iters: int = 0,
    nprobe: int = 1,
    distributed: bool | None = None,
) -> DataFrame:
    """IVF-PQ: coarse cells bound the candidates (``nprobe`` dial, same
    machinery as :func:`similarity.ivf_topk`), ADC scores the codes.  The
    100 TB layout: codes stored partitioned by coarse cell; a probe reads
    nprobe partitions of 8-byte codes — both the read volume and the
    arithmetic per candidate drop by ~an order of magnitude vs raw
    vectors.

    ``distributed`` (default: auto at ``QUERY_COLLECT_LIMIT``) keeps the
    query side as a DataFrame: probes fan out executor-side against the
    closure-shipped centroids (bounded at ``n_centroids`` rows — the one
    collect this path keeps, same as :func:`similarity.ivf_topk`), ADC
    tables are a codegen projection, and candidates pair via a
    centroid_id equi-join — no per-query driver materialization."""
    import numpy as np

    q = quantized(emb)
    crows = _ivf_centroids(emb, n_centroids, kmeans_iters).collect()
    assign = nearest_centroid_rows(q, crows)
    codes = pq_encode(emb, codebooks).join(assign, "vec_id")
    queries = q.where(F.col("vec_id") < n_queries)
    if distributed is None:
        distributed = n_queries > QUERY_COLLECT_LIMIT
    if distributed:
        probes = nearest_centroids_multi(queries, crows, max(1, nprobe))
        qtab = _query_tables(emb, codebooks, n_queries).join(
            probes.withColumnRenamed("vec_id", "query_id"), "query_id"
        )
        return _adc_rank(_adc_join_scored(codes, qtab), k)
    probe = _probe_rows(queries.collect(), crows, max(1, nprobe))
    qids, tabs = _adc_tables(probe, codebooks)
    # cell each (replicated) probe row targets, aligned with qids
    cells = np.array(
        [r.centroid_id for r in probe if r.q is not None and len(r.q) == DIM],
        dtype=np.int64,
    )
    scored = codes.mapInPandas(
        _adc_cell_scorer(qids, tabs, cells, len(codebooks), prefilter_k=k),
        "query_id long, neighbor_id long, adist long",
    )
    return _adc_rank(scored, k)
