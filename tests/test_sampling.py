"""Deterministic sampling (DuckDB bit-parity), data mixing, and benchmark
contamination."""

from __future__ import annotations

from kupo_spark.functions.sampling import (
    contamination,
    deterministic_sample,
    mix_by_source,
    sample_sql,
)

DOCS = "/root/testdata/sf0.001/documents.parquet"


def test_sample_matches_duckdb_bit_exact(spark, duck):
    docs = spark.read.parquet(DOCS)
    got = {r.doc_id for r in deterministic_sample(docs, 0.3, seed="s1").collect()}
    oracle = {r[0] for r in duck.execute(
        sample_sql(0.3, seed="s1").replace("SELECT *", "SELECT doc_id")
    ).fetchall()}
    assert got == oracle
    # plausible rate on 500 docs
    assert 0.2 <= len(got) / 500 <= 0.4


def test_sample_reproducible_and_seed_sensitive(spark):
    docs = spark.read.parquet(DOCS)
    a = {r.doc_id for r in deterministic_sample(docs, 0.5, "a").collect()}
    b = {r.doc_id for r in deterministic_sample(docs, 0.5, "a").collect()}
    c = {r.doc_id for r in deterministic_sample(docs, 0.5, "b").collect()}
    assert a == b
    assert a != c
    # nested: a smaller fraction with the same seed is a subset
    half = {r.doc_id for r in deterministic_sample(docs, 0.25, "a").collect()}
    assert half <= a


def test_mix_by_source_rates(spark):
    docs = spark.read.parquet(DOCS)
    mixed = mix_by_source(docs, {"src0": 1.0, "src1": 0.0}, seed="m")
    by_src = {r.source for r in mixed.select("source").distinct().collect()}
    assert "src1" not in by_src            # rate 0 -> gone
    n_src0 = docs.where("source = 'src0'").count()
    assert mixed.where("source = 'src0'").count() == n_src0  # rate 1 -> all
    assert mixed.where("source = 'src2'").count() == 0       # default 0


def test_contamination_flags_overlapping_docs(spark):
    docs = spark.read.parquet(DOCS)
    # use a real document's text as the "benchmark" -> that doc must flag
    sample = docs.orderBy("doc_id").limit(1).collect()[0]
    out = contamination(docs, [sample.text], n=5, min_hits=1)
    flagged = {r.doc_id for r in out.where("contaminated").collect()}
    assert sample.doc_id in flagged
    assert out.count() == docs.count()  # every doc gets a row
    # an impossible benchmark flags nothing
    clean = contamination(docs, ["zz yy xx ww vv uu"], n=5)
    assert clean.where("contaminated").count() == 0
    # empty benchmark set: all-clean fast path
    assert contamination(docs, []).where("contaminated").count() == 0


def test_contamination_counts_distinct_shingles(spark):
    docs = spark.createDataFrame(
        [(1, "a b c d e"), (2, "a b c x y"), (3, "q r s t u")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r.n_contaminated_shingles for r in
           contamination(docs, ["a b c d"], n=3, min_hits=1).collect()}
    # benchmark 3-grams: {a b c, b c d}; doc1 shares both, doc2 one
    assert out == {1: 2, 2: 1, 3: 0}


def test_contamination_paths_share_schema_and_quote_safe_seed(spark, duck):
    docs = spark.read.parquet(DOCS).limit(20)
    empty = contamination(docs, [])
    full = contamination(docs, ["a b c d"])
    assert empty.schema == full.schema  # unionByName-safe
    # a quoted seed stays data on both engines and still bit-matches
    got = {r.doc_id for r in deterministic_sample(
        spark.read.parquet(DOCS), 0.5, seed="o'clock").collect()}
    oracle = {r[0] for r in duck.execute(
        sample_sql(0.5, seed="o'clock").replace("SELECT *", "SELECT doc_id")
    ).fetchall()}
    assert got == oracle


def test_empty_oracle_sql_is_valid(spark, duck):
    """contamination_sql(()) and mix_by_source_sql({}) — the defaults of
    fingerprint_chunks_shards_sample_sql — must emit runnable SQL, not
    `VALUES ` / a WHEN-less CASE (ADVICE r4)."""
    from kupo_spark.functions.sampling import contamination_sql, mix_by_source_sql

    duck.execute(f"CREATE OR REPLACE VIEW documents AS SELECT * FROM read_parquet('{DOCS}')")
    rows = duck.execute(contamination_sql([])).fetchall()
    assert len(rows) == 500 and all(r[1] == 0 and r[2] is False for r in rows)
    # empty mix == bare default threshold; default=0.0 keeps nothing,
    # default=1.0 keeps everything
    assert duck.execute(mix_by_source_sql({}, default=0.0)).fetchall() == []
    assert len(duck.execute(mix_by_source_sql({}, default=1.0)).fetchall()) == 500
    # Spark side agrees with the default-threshold semantics
    docs = spark.read.parquet(DOCS)
    from kupo_spark.functions.sampling import mix_by_source

    kept = {r.doc_id for r in mix_by_source(docs, {}, default=0.5).collect()}
    oracle = {r[0] for r in duck.execute(
        mix_by_source_sql({}, default=0.5).replace("SELECT *", "SELECT doc_id")
    ).fetchall()}
    assert kept == oracle


def test_mix_by_source_rejects_bad_fractions(spark):
    import pytest

    docs = spark.read.parquet(DOCS)
    with pytest.raises(ValueError):
        mix_by_source(docs, {"src0": 1.5})
    with pytest.raises(ValueError):
        mix_by_source(docs, {"src0": 0.5}, default=-0.1)


def test_contamination_dedups_repeated_shingles_post_filter(spark):
    """r11: the default feed is the NON-distinct shingle stream (the
    dedup happens after the bench join, over hit rows only) — a document
    whose token stream repeats a benchmark n-gram must still count it
    exactly once."""
    docs = spark.createDataFrame(
        [(1, "a b c a b c"), (2, "q r s t u")],
        "doc_id long, text string",
    )
    # doc1's 3-gram stream is [a b c, b c a, c a b, a b c] — 'a b c' twice
    out = {r.doc_id: r.n_contaminated_shingles for r in
           contamination(docs, ["a b c"], n=3, min_hits=1).collect()}
    assert out == {1: 1, 2: 0}
