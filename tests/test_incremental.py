"""Exact substring dedup, sketch-only (est-jaccard) dedup, and the
incremental signature store: DuckDB oracle parity, the batch≡incremental
equivalence the store is designed around, and plan shape."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kupo_spark import oracle_pipeline
from kupo_spark.functions.dedup import (
    exact_substring_dedup,
    minhash_est_dedup,
    minhash_est_pairs,
)
from kupo_spark.functions.incremental import IncrementalDeduper
from tools.check_correctness import rows_key

DOCS = "/root/testdata/sf0.001/documents.parquet"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(DOCS)


def _match(sdf, duck, sql):
    srows, scols = sdf.collect(), sdf.columns
    res = duck.execute(sql)
    ocols = [d[0] for d in res.description]
    orows = res.fetchall()
    assert len(srows) == len(orows) > 0
    assert sorted(scols) == sorted(ocols)
    assert rows_key(srows, scols) == rows_key(orows, ocols)


def test_substring_dedup_matches_duckdb(docs, duck):
    _match(
        exact_substring_dedup(docs, k=8),
        duck,
        oracle_pipeline.exact_substring_dedup_sql(8),
    )


def test_substring_dedup_removes_cross_doc_repeats(spark):
    # dedup is tile-aligned: the shared boilerplate must start a tile
    boiler = "click here to subscribe now"
    rows = [
        (1, f"{boiler} alpha beta gamma delta"),
        (2, f"{boiler} epsilon zeta eta theta"),
        (3, "unique words only in this one"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in exact_substring_dedup(docs, k=5).collect()}
    # doc 1 holds the first occurrence of both of its tiles -> intact
    assert out[1].clean_text == rows[0][1] and out[1].n_removed == 0
    # doc 2's first tile IS the boilerplate tile already seen in doc 1
    assert out[2].clean_text == "epsilon zeta eta theta"
    assert out[2].n_removed == 1 and out[2].n_tiles == 2
    assert out[3].clean_text == rows[2][1] and out[3].n_removed == 0


def test_substring_dedup_within_doc_repeat_and_empty(spark):
    docs = spark.createDataFrame(
        [(1, "a b a b a b"), (2, "")], "doc_id long, text string"
    )
    out = {r.doc_id: r for r in exact_substring_dedup(docs, k=2).collect()}
    assert out[1].clean_text == "a b" and out[1].n_removed == 2
    assert out[2].clean_text == "" and out[2].n_tiles == 1


def test_substring_dedup_plan_stays_jvm(docs):
    from kupo_spark.plans.explain import formatted_plan

    plan = formatted_plan(exact_substring_dedup(docs))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_est_dedup_matches_duckdb(docs, duck):
    _match(
        minhash_est_dedup(docs, threshold=0.5),
        duck,
        oracle_pipeline.minhash_est_dedup_sql(0.5),
    )


def test_est_pairs_subset_of_candidates_and_nonempty(docs):
    pairs = minhash_est_pairs(docs, threshold=0.5).collect()
    assert len(pairs) > 0
    assert all(r.doc_a < r.doc_b and 0.5 <= r.est_jaccard <= 1.0 for r in pairs)


def _verdict_set(df):
    return sorted((r.doc_id, r.keep, r.dup_of) for r in df.collect())


@pytest.mark.parametrize("n_batches", [2, 3])
def test_incremental_equals_batch(spark, docs, tmp_path, n_batches):
    batch_verdict = _verdict_set(minhash_est_dedup(docs, threshold=0.5))
    n = docs.count()
    dd = IncrementalDeduper(spark, str(tmp_path / "store"), threshold=0.5)
    got = []
    for i in range(n_batches):
        lo, hi = i * n // n_batches, (i + 1) * n // n_batches
        batch = docs.where((F.col("doc_id") >= lo) & (F.col("doc_id") < hi))
        got.extend(_verdict_set(dd.add_batch(batch)))
    assert sorted(got) == batch_verdict
    # every batch doc is stored, with its verdict's keep flag
    stored = {r.doc_id: r.keep for r in dd.stored().collect()}
    assert stored == {d: k for d, k, _ in batch_verdict}


def test_incremental_reopen_continues(spark, docs, tmp_path):
    root = str(tmp_path / "store")
    half = docs.count() // 2
    IncrementalDeduper(spark, root, threshold=0.5).add_batch(
        docs.where(F.col("doc_id") < half)
    )
    # a NEW deduper over the same root sees the stored signatures
    dd2 = IncrementalDeduper(spark, root, threshold=0.5)
    got = _verdict_set(dd2.add_batch(docs.where(F.col("doc_id") >= half)))
    full = {
        (r.doc_id, r.keep, r.dup_of)
        for r in minhash_est_dedup(docs, threshold=0.5).collect()
        if r.doc_id >= half
    }
    assert set(got) == full


def test_incremental_rejects_non_monotone_batch(spark, docs, tmp_path):
    dd = IncrementalDeduper(spark, str(tmp_path / "store"), threshold=0.5)
    dd.add_batch(docs.where(F.col("doc_id") >= 100))
    with pytest.raises(ValueError, match="id-monotone"):
        dd.add_batch(docs.where(F.col("doc_id") < 100))


def test_incremental_handles_shingle_less_docs(spark, tmp_path):
    # "a b" has < 3 tokens -> no shingles -> NULL signatures; it must be
    # stored and kept, and never pair with another shingle-less doc
    docs = spark.createDataFrame(
        [(1, "a b"), (2, "x y"), (3, "one two three four five")],
        "doc_id long, text string",
    )
    dd = IncrementalDeduper(spark, str(tmp_path / "store"), threshold=0.5)
    verdict = _verdict_set(dd.add_batch(docs))
    assert verdict == [(1, True, -1), (2, True, -1), (3, True, -1)]
    assert dd.stored().count() == 3


def test_add_batch_replay_returns_original_verdicts(spark, docs, tmp_path):
    dd = IncrementalDeduper(spark, str(tmp_path / "store"), threshold=0.5)
    b1 = docs.where(F.col("doc_id") < 250)
    first = _verdict_set(dd.add_batch(b1))
    dd.add_batch(docs.where((F.col("doc_id") >= 250) & (F.col("doc_id") < 400)))
    # replaying batch 1 after the store advanced: same verdicts, no growth
    n_before = dd.stored().count()
    replay = _verdict_set(dd.add_batch(b1))
    assert replay == first
    assert dd.stored().count() == n_before
    # a PARTIAL overlap is corruption, not a replay
    with pytest.raises(ValueError, match="id-monotone"):
        dd.add_batch(docs.where((F.col("doc_id") >= 240) & (F.col("doc_id") < 420)))


def test_streaming_near_dedup_equals_batch(spark, docs, tmp_path):
    import os
    import time as _t

    from kupo_spark.streaming.corpus import streaming_near_dedup

    src = str(tmp_path / "src")
    os.makedirs(src)
    # three id-monotone files, mtimes staggered so the file source
    # processes them in order, one per micro-batch
    pdf = docs.select("doc_id", "text").toPandas().sort_values("doc_id")
    now = _t.time() - 3600
    for i, lo in enumerate(range(0, 500, 200)):
        p = f"{src}/f{i}.parquet"
        pdf[(pdf.doc_id >= lo) & (pdf.doc_id < lo + 200)].to_parquet(p)
        os.utime(p, (now + i, now + i))
    stream = (
        spark.readStream.schema("doc_id BIGINT, text STRING")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out, ckpt, store = (str(tmp_path / d) for d in ("out", "ckpt", "store"))
    q = streaming_near_dedup(
        stream, store, out, ckpt, threshold=0.5, availableNow=True
    )
    q.awaitTermination(180)
    got = sorted(
        (r.doc_id, r.keep, r.dup_of)
        for r in spark.read.parquet(out).select("doc_id", "keep", "dup_of").collect()
    )
    want = _verdict_set(minhash_est_dedup(docs, threshold=0.5))
    assert got == want


from hypothesis import given, settings
from hypothesis import strategies as st

_WORDS = ["aa", "bb", "cc", "dd"]


def _ref_substring_dedup(texts: list[tuple[int, list[str]]], k: int):
    """Pure-Python reference: first (doc_id, pos) occurrence of each
    chunk survives; docs reassembled from surviving tiles in pos order."""
    import math

    tiles = []
    for d, toks in texts:
        n = max(1, math.ceil(len(toks) / k))
        for i in range(n):
            tiles.append((d, i, " ".join(toks[i * k:(i + 1) * k])))
    first = {}
    for d, p, c in sorted(tiles):
        first.setdefault(c, (d, p))
    out = {}
    for d, toks in texts:
        n = max(1, math.ceil(len(toks) / k))
        kept, removed = [], 0
        for i in range(n):
            c = " ".join(toks[i * k:(i + 1) * k])
            if first[c] == (d, i):
                kept.append(c)
            else:
                removed += 1
        out[d] = (" ".join(kept), n, removed)
    return out


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.lists(st.sampled_from(_WORDS), min_size=0, max_size=9),
        min_size=1, max_size=6,
    ),
    st.sampled_from([1, 2, 3]),
)
def test_substring_dedup_matches_python_reference(spark, token_lists, k):
    texts = [(i, toks) for i, toks in enumerate(token_lists)]
    docs = spark.createDataFrame(
        [(d, " ".join(toks)) for d, toks in texts], "doc_id long, text string"
    )
    got = {
        r.doc_id: (r.clean_text, r.n_tiles, r.n_removed)
        for r in exact_substring_dedup(docs, k=k).collect()
    }
    assert got == _ref_substring_dedup(texts, k)


def test_store_migrates_from_pre_dup_of_layout(spark, docs, tmp_path):
    # build a store, then strip dup_of to fake the v1 layout on disk;
    # reopening must migrate and reconstruct dup_of exactly
    import shutil
    from pathlib import Path

    from kupo_spark.table import LOG_DIR, Table

    root = str(tmp_path / "store")
    dd = IncrementalDeduper(spark, root, threshold=0.5)
    want = _verdict_set(dd.add_batch(docs.where(F.col("doc_id") < 300)))
    old_rows = dd.stored().drop("dup_of").persist()
    old_rows.count()
    old_schema = old_rows.schema
    shutil.rmtree(Path(root) / LOG_DIR)
    t = Table.create(root, old_schema)
    t.append(old_rows)
    # reopen: migration kicks in
    dd2 = IncrementalDeduper(spark, root, threshold=0.5)
    assert "dup_of" in {f.name for f in dd2.table.schema().fields}
    migrated = sorted(
        (r.doc_id, r.keep, r.dup_of)
        for r in dd2.stored().select("doc_id", "keep", "dup_of").collect()
    )
    assert migrated == want
    # and the migrated store keeps working
    v2 = _verdict_set(dd2.add_batch(docs.where(F.col("doc_id") >= 300)))
    full = _verdict_set(minhash_est_dedup(docs, threshold=0.5))
    assert sorted(want + v2) == full


def test_est_jaccard_tracks_exact_jaccard(docs):
    # estimator sanity: E[matches/n] = J. With n=12 the per-pair std is
    # sqrt(J(1-J)/12) <= 0.145, so the mean |est - exact| over the
    # candidate pairs must stay well inside 0.2
    from kupo_spark.functions.dedup import minhash_near_dup_pairs

    exact = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in minhash_near_dup_pairs(docs, threshold=0.0).collect()
    }
    est = {
        (r.doc_a, r.doc_b): r.est_jaccard
        for r in minhash_est_pairs(docs, threshold=0.0).collect()
    }
    common = set(exact) & set(est)
    assert len(common) >= 20
    diffs = [abs(exact[p] - est[p]) for p in common]
    assert sum(diffs) / len(diffs) < 0.2


def test_migration_rejects_wrong_threshold(spark, docs, tmp_path):
    import shutil
    from pathlib import Path

    from kupo_spark.table import LOG_DIR, Table

    root = str(tmp_path / "store")
    dd = IncrementalDeduper(spark, root, threshold=0.5)
    dd.add_batch(docs.where(F.col("doc_id") < 300))
    old_rows = dd.stored().drop("dup_of").persist()
    old_rows.count()
    shutil.rmtree(Path(root) / LOG_DIR)
    t = Table.create(root, old_rows.schema)
    t.append(old_rows)
    # the keep flags encode threshold 0.5; migrating at 0.9 contradicts them
    with pytest.raises(ValueError, match="different threshold"):
        IncrementalDeduper(spark, root, threshold=0.9)
    # and the failed migration left the v1 store intact (atomicity)
    assert Table(root).read(spark).count() == old_rows.count()
    # reopening with the original threshold still migrates fine
    dd2 = IncrementalDeduper(spark, root, threshold=0.5)
    assert "dup_of" in {f.name for f in dd2.table.schema().fields}


@settings(max_examples=5, deadline=None)
@given(st.lists(st.integers(min_value=1, max_value=499), min_size=1, max_size=3, unique=True))
def test_incremental_equals_batch_any_split(spark, docs, tmp_path_factory, cuts):
    # ANY id-monotone batch split yields the one-shot verdicts — the
    # contract under random cut points, not just even halves
    bounds = [0] + sorted(cuts) + [500]
    root = str(tmp_path_factory.mktemp("hyp") / "store")
    dd = IncrementalDeduper(spark, root, threshold=0.5)
    got = []
    for lo, hi in zip(bounds, bounds[1:]):
        batch = docs.where((F.col("doc_id") >= lo) & (F.col("doc_id") < hi))
        got.extend(_verdict_set(dd.add_batch(batch)))
    want = _verdict_set(minhash_est_dedup(docs, threshold=0.5))
    assert sorted(got) == want


def test_store_optimize_preserves_verdicts_and_replay(spark, docs, tmp_path):
    dd = IncrementalDeduper(spark, str(tmp_path / "store"), threshold=0.5)
    b1 = docs.where(F.col("doc_id") < 200)
    v1 = _verdict_set(dd.add_batch(b1))
    dd.add_batch(docs.where((F.col("doc_id") >= 200) & (F.col("doc_id") < 350)))
    before = _verdict_set(dd.stored().select("doc_id", "keep", "dup_of"))
    n_files_before = len(dd.table.snapshot().files)
    dd.optimize()
    # strictly fewer files (two small appends MUST bin-pack), identical
    # contents, replay still works
    assert n_files_before >= 2
    assert len(dd.table.snapshot().files) < n_files_before
    assert _verdict_set(dd.stored().select("doc_id", "keep", "dup_of")) == before
    assert _verdict_set(dd.add_batch(b1)) == v1
    # and fresh batches continue normally through the compacted base
    v3 = _verdict_set(dd.add_batch(docs.where(F.col("doc_id") >= 350)))
    full = _verdict_set(minhash_est_dedup(docs, threshold=0.5))
    assert sorted(before + v3) == full
