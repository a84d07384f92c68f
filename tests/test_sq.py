"""Scalar quantization (SQ8): code range, the per-dimension reconstruction
error bound, near-exact recall, constant-dimension degeneracy, and the
closure/distributed path equality.  The oracle parity test
(test_correctness.py / the driver's 'sq8' arm) covers the corpus."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from kupo_spark.functions.similarity import brute_force_topk, quantized
from kupo_spark.functions.sq import sq_encode, sq_reconstruct, sq_topk, sq_train

EMB = "/root/testdata/sf0.001/embeddings.parquet"


def test_codes_in_byte_range_and_error_bounded(spark):
    emb = spark.read.parquet(EMB)
    mins, maxs = sq_train(emb)
    codes = sq_encode(emb, mins, maxs)
    r = codes.selectExpr(
        "min(array_min(code)) AS lo", "max(array_max(code)) AS hi"
    ).first()
    assert 0 <= r.lo and r.hi <= 255
    # |recon - q| <= ceil(span/255) per dimension (floor-div twice)
    recon = sq_reconstruct(codes, mins, maxs).withColumnRenamed("q", "rq")
    err = (
        quantized(emb)
        .join(recon, "vec_id")
        .selectExpr(
            "max(aggregate(zip_with(q, rq, (a, b) -> abs(a - b)),"
            " 0L, (m, x) -> greatest(m, x))) AS e"
        )
        .first()
        .e
    )
    bound = max(mx - mn for mn, mx in zip(mins, maxs)) // 255 + 1
    assert err <= bound


@pytest.mark.slow
def test_sq_recall_near_exact_and_paths_agree(spark):
    emb = spark.read.parquet(EMB)
    exact = {
        (r.query_id, r.neighbor_id) for r in brute_force_topk(emb, 10, 5).collect()
    }
    got = sq_topk(emb, 10, 5)
    sq = {(r.query_id, r.neighbor_id) for r in got.collect()}
    # 8-bit quantization loses almost nothing (measured 1.0 on this corpus)
    assert len(sq & exact) / len(exact) >= 0.9
    dist = sq_topk(emb, 10, 5, distributed=True)
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, dist.collect()))


def test_constant_dimension_degenerates_to_zero_code(spark):
    """A dimension with mx == mn must encode to 0 and reconstruct to mn —
    not divide by zero."""
    rows = [(i, [float(i % 7) / 10] + [0.5] * 63) for i in range(20)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    mins, maxs = sq_train(emb)
    assert mins[1] == maxs[1]  # the constant dim
    codes = sq_encode(emb, mins, maxs)
    assert codes.selectExpr("max(code[1]) AS m").first().m == 0
    recon = sq_reconstruct(codes, mins, maxs)
    assert recon.selectExpr("max(q[1]) AS m").first().m == mins[1]
    # and ranking still works end to end
    assert sq_topk(emb, 3, 2).count() == 6


def test_frozen_quantizer_clamps_out_of_range_values(spark):
    """Encoding with a frozen quantizer (the persisted index's add path)
    must clamp values outside the training range to [0, 255] — never emit
    out-of-range codes or reconstruct beyond [mn, mx]."""
    base = spark.createDataFrame(
        [(i, [float(i) / 100] * 64) for i in range(10)],
        "vec_id long, embedding array<float>",
    )
    mins, maxs = sq_train(base)
    wild = spark.createDataFrame(
        [(100, [5.0] * 64), (101, [-5.0] * 64)],
        "vec_id long, embedding array<float>",
    )
    codes = sq_encode(wild, mins, maxs)
    r = codes.selectExpr(
        "min(array_min(code)) AS lo", "max(array_max(code)) AS hi"
    ).first()
    assert r.lo == 0 and r.hi == 255
    recon = sq_reconstruct(codes, mins, maxs)
    b = recon.selectExpr(
        "min(array_min(q)) AS lo", "max(array_max(q)) AS hi"
    ).first()
    assert min(mins) <= b.lo and b.hi <= max(maxs)
