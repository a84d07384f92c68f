"""Scalar quantization (SQ8) — the compression tier between the flat
store and PQ (FAISS ``ScalarQuantizer`` / Milvus ``SQ8``): each dimension
is linearly quantized to one byte against the corpus's per-dimension
[min, max] range.  4× smaller than raw float32 / int64-quantized storage
with near-exact recall — the standard "cheap win" before PQ's 32×.

Exact-integer discipline (the repo-wide determinism contract):

- the trained parameters are the per-dimension min/max of the int64
  1e-6-grid embedding — two exact aggregates;
- ``code[i] = ((q[i] − mn[i]) · 255) div (mx[i] − mn[i])`` (floor div,
  non-negative operands; 0 when the dimension is constant) ∈ [0, 255];
- dequantization ``recon[i] = mn[i] + (code[i] · (mx[i] − mn[i])) div 255``
  is again exact int64, so the asymmetric search — EXACT query against
  reconstructed corpus, the same contract as ADC — is the repo's standard
  exact integer cosine, bit-identical in DuckDB.

Scale shape: training is one narrow aggregate (posexplode + min/max —
map-side combinable); encode and reconstruct are codegen projections from
the 64-element parameter literals (no Python, no shuffle, no join); search
reuses the shared scoring kernels (closure matmul / distributed
cross-join) with the same ``QUERY_COLLECT_LIMIT`` gate.

Reference analog: none — kupo has no vector surface; extends the
LLM-data-pipeline similarity family (SURVEY.md §2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kupo_spark.functions.similarity import (
    DIM,
    QUERY_COLLECT_LIMIT,
    _join_scored,
    _keyed_vector_scores,
    _valid,
    quantized,
    topk_merge,
)

__all__ = ["sq_train", "sq_encode", "sq_reconstruct", "recon_expr", "sq_topk"]


def sq_train(emb: DataFrame, dim: int = DIM) -> tuple[list[int], list[int]]:
    """Per-dimension (mins, maxs) of the valid quantized corpus — the
    whole trained state of SQ8 (2·dim ints; rides any closure/literal).
    One posexplode + groupBy(pos) aggregate, map-side combinable."""
    rows = (
        _valid(quantized(emb))
        .select(F.posexplode("q").alias("pos", "x"))
        .groupBy("pos")
        .agg(F.min("x").alias("mn"), F.max("x").alias("mx"))
        .collect()
    )
    by_pos = {r.pos: (int(r.mn), int(r.mx)) for r in rows}
    if set(by_pos) != set(range(dim)):
        raise ValueError(f"corpus has no valid {dim}-dim vectors")
    return (
        [by_pos[i][0] for i in range(dim)],
        [by_pos[i][1] for i in range(dim)],
    )


def _lit_arr(xs: list[int]) -> str:
    return "array(" + ",".join(str(int(x)) for x in xs) + ")"


def sq_encode(
    emb: DataFrame, mins: list[int], maxs: list[int]
) -> DataFrame:
    """(vec_id, code array<int> ∈ [0,255]^dim): one codegen projection —
    the parameters are array literals, exact floor arithmetic.

    Codes are CLAMPED to [0, 255]: a frozen quantizer (the persisted
    index's ``add`` path) must encode values outside its training range
    to the nearest representable cell, exactly as FAISS's SQ does.  For
    the corpus the parameters were trained on the clamp is a no-op (every
    value is inside [mn, mx] by construction), which is why the DuckDB
    oracle needs none."""
    mn, mx = _lit_arr(mins), _lit_arr(maxs)
    expr = (
        f"transform(sequence(0, {len(mins) - 1}), i -> CASE "
        f"WHEN element_at({mx}, i + 1) = element_at({mn}, i + 1) THEN 0 "
        f"ELSE cast(greatest(0L, least(255L, "
        f"((q[i] - element_at({mn}, i + 1)) * 255) DIV "
        f"(element_at({mx}, i + 1) - element_at({mn}, i + 1)))) as int) END)"
    )
    return _valid(quantized(emb)).select(
        "vec_id", F.expr(expr).alias("code")
    )


def recon_expr(mins: list[int], maxs: list[int]) -> str:
    """The dequantization as one SQL expression over a ``code`` column —
    exposed so keyed layouts (the persisted IVF-SQ8 index) can project it
    while keeping their partition columns."""
    mn, mx = _lit_arr(mins), _lit_arr(maxs)
    return (
        f"transform(sequence(0, {len(mins) - 1}), i -> "
        f"element_at({mn}, i + 1) + "
        f"(cast(code[i] as bigint) * (element_at({mx}, i + 1) - element_at({mn}, i + 1)))"
        f" DIV 255)"
    )


def sq_reconstruct(
    codes: DataFrame, mins: list[int], maxs: list[int]
) -> DataFrame:
    """(vec_id, q): exact-integer dequantization — the search-side view of
    the stored codes, again pure codegen."""
    return codes.select("vec_id", F.expr(recon_expr(mins, maxs)).alias("q"))


def sq_topk(
    emb: DataFrame,
    n_queries: int = 10,
    k: int = 5,
    distributed: bool | None = None,
) -> DataFrame:
    """(query_id, neighbor_id, cosine, rank): exact top-k over the
    SQ8-RECONSTRUCTED corpus for the first ``n_queries`` exact queries
    (asymmetric, like ADC).  Same output shape, rounding, tie-break and
    ``distributed`` gate as :func:`similarity.brute_force_topk`; the only
    difference from exact search is the ≤(mx−mn)/255 per-dimension
    quantization error in the corpus side."""
    mins, maxs = sq_train(emb)
    recon = sq_reconstruct(sq_encode(emb, mins, maxs), mins, maxs)
    queries = _valid(quantized(emb)).where(F.col("vec_id") < n_queries)
    if distributed is None:
        distributed = n_queries > QUERY_COLLECT_LIMIT
    if distributed:
        return topk_merge(_join_scored(recon, queries, []), k)
    # closure path: the shared per-key Arrow matmul kernel with one
    # constant key — a single query group scored against every batch
    corpus = recon.withColumn("_k", F.lit(0))
    qrows = queries.withColumn("_k", F.lit(0)).collect()
    return topk_merge(_keyed_vector_scores(corpus, "_k", qrows), k)
