"""Product quantization: codebook training determinism, encode/reconstruct
consistency, the ADC exactness invariant (ADC distance == true L2² against
the reconstructed vector — approximation lives only in the code
assignment), recall sanity vs exact search, and the IVF-PQ composition."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from kupo_spark.functions.pq import (
    ivf_pq_topk,
    pq_adc_topk,
    pq_encode,
    pq_reconstruct,
    train_codebooks,
)
from kupo_spark.functions.similarity import DIM, brute_force_topk, quantized

EMB = "/root/testdata/sf0.001/embeddings.parquet"


def _books(spark, iters=3):
    emb = spark.read.parquet(EMB)
    return emb, train_codebooks(emb, iters=iters)


def test_codebooks_deterministic_and_shaped(spark):
    emb, books = _books(spark)
    again = train_codebooks(emb, iters=3)
    assert books == again
    assert len(books) == 8
    assert all(len(b) == 16 for b in books)
    assert all(len(c) == DIM // 8 for b in books for c in b)


def test_training_reduces_reconstruction_error(spark):
    """Lloyd rounds in exact int arithmetic never increase the total
    quantization error (floor-rounding slack is dwarfed by assignment
    gains at this scale)."""
    emb = spark.read.parquet(EMB)
    data = np.array(
        [r.q for r in quantized(emb).limit(4096).collect()], dtype=np.int64
    )

    def total_err(iters):
        books = train_codebooks(emb, iters=iters)
        err = 0
        for j, book in enumerate(books):
            sub = data[:, j * 8 : (j + 1) * 8]
            cent = np.array(book, dtype=np.int64)
            d = (
                (sub * sub).sum(axis=1)[:, None]
                - 2 * (sub @ cent.T)
                + (cent * cent).sum(axis=1)[None, :]
            )
            err += int(d.min(axis=1).sum())
        return err

    assert total_err(3) <= total_err(1) <= total_err(0)


def test_encode_reconstruct_consistent(spark):
    """Reconstruction (JVM element_at gather) returns exactly the
    concatenated sub-centroids the (Python) encoder picked."""
    emb, books = _books(spark)
    codes = pq_encode(emb, books)
    rec = {r.vec_id: list(r.qr) for r in pq_reconstruct(codes, books).collect()}
    for r in codes.limit(50).collect():
        want = [x for j, c in enumerate(r.code) for x in books[j][int(c)]]
        assert rec[r.vec_id] == want
    assert all(0 <= c < 16 for r in codes.collect() for c in r.code)


def test_adc_equals_distance_to_reconstruction(spark):
    """THE PQ invariant: the distributed ADC score (−cosine column) for
    (query, neighbor) equals the exact int L2² between the query vector
    and the neighbor's reconstructed vector."""
    emb, books = _books(spark)
    topk = pq_adc_topk(emb, books, n_queries=5, k=4).collect()
    qvec = {r.vec_id: np.array(r.q, dtype=np.int64) for r in
            quantized(emb).where(F.col("vec_id") < 5).collect()}
    rec = {
        r.vec_id: np.array(r.qr, dtype=np.int64)
        for r in pq_reconstruct(pq_encode(emb, books), books).collect()
    }
    assert len(topk) == 20
    for r in topk:
        diff = qvec[r.query_id] - rec[r.neighbor_id]
        assert -r.cosine == float(diff @ diff)


def test_pq_recall_beats_chance_and_ivfpq_subset(spark):
    emb, books = _books(spark)
    exact = {(r.query_id, r.neighbor_id) for r in brute_force_topk(emb, 10, 5).collect()}
    pq = {(r.query_id, r.neighbor_id) for r in pq_adc_topk(emb, books, 10, 5).collect()}
    recall = len(pq & exact) / len(exact)
    # 500-vector corpus, 50 exact pairs: chance overlap ~1%.  The synthetic
    # embeddings are near-uniform — PQ's worst case (no cluster structure
    # for the codebooks to exploit) — so recall is modest (measured 0.16),
    # but still an order of magnitude above chance.
    assert recall >= 0.08
    # IVF-PQ at full probe coverage == plain ADC (cells partition the
    # corpus, so probing all of them restores the full candidate set)
    full = {
        (r.query_id, r.neighbor_id, r.cosine, r.rank)
        for r in ivf_pq_topk(emb, books, 10, 5, n_centroids=4, nprobe=4).collect()
    }
    plain = {
        (r.query_id, r.neighbor_id, r.cosine, r.rank)
        for r in pq_adc_topk(emb, books, 10, 5).collect()
    }
    assert full == plain


def test_ivf_pq_recall_non_decreasing_in_nprobe(spark):
    emb, books = _books(spark)
    base = {(r.query_id, r.neighbor_id) for r in pq_adc_topk(emb, books, 10, 5).collect()}

    def hit(nprobe):
        got = {
            (r.query_id, r.neighbor_id)
            for r in ivf_pq_topk(
                emb, books, 10, 5, n_centroids=8, kmeans_iters=1, nprobe=nprobe
            ).collect()
        }
        return len(got & base) / len(base)

    assert hit(1) <= hit(2) <= hit(8)
    assert hit(8) == 1.0  # all 8 cells probed == unrestricted ADC


def test_distributed_adc_matches_closure_path(spark):
    """distributed=True (the 100k+-query path) ranks the EXACT same
    neighbors with the exact same ADC integers as the closure path — the
    codegen table expression and the numpy tables compute the same L2²."""
    emb, books = _books(spark)

    def key(rows):
        return sorted((r.query_id, r.rank, r.neighbor_id, r.cosine) for r in rows)

    a = pq_adc_topk(emb, books, n_queries=8, k=4, distributed=False).collect()
    b = pq_adc_topk(emb, books, n_queries=8, k=4, distributed=True).collect()
    assert key(a) == key(b) and len(a) == 8 * 4
    a2 = ivf_pq_topk(emb, books, n_queries=8, k=4, nprobe=2, distributed=False).collect()
    b2 = ivf_pq_topk(emb, books, n_queries=8, k=4, nprobe=2, distributed=True).collect()
    assert key(a2) == key(b2) and len(a2) > 0


def test_large_query_set_auto_distributes_without_collect(spark):
    """Above QUERY_COLLECT_LIMIT the PQ query side must be join-based: the
    plan pairs queries via a Join, the ONLY Python stage is the corpus
    encode (one MapInPandas), and building the plan launches no job — a
    collect-fed closure would materialize the query side eagerly and ship
    per-query ADC tables (~16 KB each → GBs at 100k queries) in every
    task (VERDICT r4 finding #1)."""
    import re

    from kupo_spark.functions.similarity import QUERY_COLLECT_LIMIT
    from kupo_spark.plans.explain import formatted_plan

    def stages(plan, op):  # detail-section entries: one per physical stage
        return len(re.findall(rf"^\(\d+\) {op}", plan, re.M))

    emb, books = _books(spark, iters=1)
    df = pq_adc_topk(emb, books, n_queries=QUERY_COLLECT_LIMIT + 1, k=3)
    plan = formatted_plan(df)
    assert "Join" in plan
    assert stages(plan, "MapInPandas") == 1  # pq_encode only
    assert "BatchEvalPython" not in plan
    # IVF-PQ: encode + corpus assign + probe fan-out are the three Arrow
    # stages; the ADC tables themselves stay codegen (no 4th Python stage)
    df2 = ivf_pq_topk(
        emb, books, n_queries=QUERY_COLLECT_LIMIT + 1, k=3, nprobe=2
    )
    plan2 = formatted_plan(df2)
    assert "Join" in plan2
    assert stages(plan2, "MapInPandas") == 3
    assert "BatchEvalPython" not in plan2


def test_codebooks_invariant_to_partitioning(spark):
    """collect() order varies with partitioning; the sorted sample must
    make codebooks (and therefore stored codes) partition-invariant."""
    emb = spark.read.parquet(EMB)
    base = train_codebooks(emb, iters=2)
    assert train_codebooks(emb.repartition(7), iters=2) == base
    assert train_codebooks(emb.repartition(3, "vec_id"), iters=2) == base


def test_refined_full_width_recovers_exact_search(spark):
    """pq_refined_topk with a candidate list covering the whole corpus IS
    brute-force exact search (same rows, cosines, ranks) — the refine
    stage's rerank arithmetic matches the exact path bit-for-bit."""
    from kupo_spark.functions.pq import pq_refined_topk

    emb, books = _books(spark, iters=1)
    n = emb.count()
    refined = sorted(
        map(tuple, pq_refined_topk(emb, books, 10, 5, refine=(n // 5) + 1).collect())
    )
    exact = sorted(map(tuple, brute_force_topk(emb, 10, 5).collect()))
    assert refined == exact


def test_refined_recall_non_decreasing_in_refine(spark):
    """More refine width -> candidate superset -> recall vs exact search
    can only improve; refine=1 reranks ADC's own top-k (same SET of
    candidates, possibly reordered)."""
    from kupo_spark.functions.pq import pq_refined_topk

    emb, books = _books(spark)
    exact = {(r.query_id, r.neighbor_id) for r in brute_force_topk(emb, 10, 5).collect()}

    def recall(refine):
        got = {
            (r.query_id, r.neighbor_id)
            for r in pq_refined_topk(emb, books, 10, 5, refine=refine).collect()
        }
        return len(got & exact) / len(exact)

    r1, r4, r16 = recall(1), recall(4), recall(16)
    assert r1 <= r4 + 1e-9 and r4 <= r16 + 1e-9
    # and refine=1's candidate SET is ADC's top-5 exactly
    adc = {
        (r.query_id, r.neighbor_id)
        for r in pq_adc_topk(emb, books, 10, 5).collect()
    }
    from kupo_spark.functions.pq import pq_refined_topk as _prt
    r1set = {
        (r.query_id, r.neighbor_id) for r in _prt(emb, books, 10, 5, refine=1).collect()
    }
    assert r1set == adc


def test_adc_prefilter_keeps_boundary_ties():
    """r12 (guide §2.3): the ADC cell scorer's per-batch pre-top-k keeps
    every row tied at the k-th smallest distance (exact int64 compare, no
    epsilon) and drops self-pairs, so the merge's neighbor_id tiebreak
    sees every row it could rank."""
    import numpy as np
    import pandas as pd

    from kupo_spark.functions.pq import _adc_cell_scorer

    # one probe row (query 0) on cell 7; m=1, 4 centroids; table maps
    # code c -> distance [0, 5, 5, 9][c]
    qids = np.array([0], dtype=np.int64)
    tabs = np.array([[[0, 5, 5, 9]]], dtype=np.int64)
    cells = np.array([7], dtype=np.int64)
    pdf = pd.DataFrame(
        {
            "vec_id": [0, 1, 2, 3, 4],
            "code": [[0], [1], [2], [3], [1]],
            "centroid_id": [7, 7, 7, 7, 7],
        }
    )
    score = _adc_cell_scorer(qids, tabs, cells, 1, prefilter_k=2)
    out = pd.concat(list(score(iter([pdf]))))
    kept = set(zip(out.query_id, out.neighbor_id, out.adist))
    # self (vec 0, dist 0) dropped; k=2 smallest among rest = 5, with a
    # three-way tie (vecs 1, 2, 4) all kept; dist 9 (vec 3) dropped
    assert kept == {(0, 1, 5), (0, 2, 5), (0, 4, 5)}
