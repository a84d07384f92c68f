"""Dedup scale-path policies: the candidate-id semi-join must produce
identical results whether it broadcasts (sparse candidates) or falls back
to a shuffle (dup-saturated corpus), and the cluster convergence probe
cadence must not change the fixpoint."""

from __future__ import annotations

import pytest

from kupo_spark.functions.dedup import minhash_near_dup_pairs, near_dup_clusters


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet("/root/testdata/sf0.001/documents.parquet")


def test_broadcast_fallback_same_pairs(docs):
    bcast = sorted(
        (r.doc_a, r.doc_b, r.jaccard)
        for r in minhash_near_dup_pairs(docs, threshold=0.5).collect()
    )
    shuffled = sorted(
        (r.doc_a, r.doc_b, r.jaccard)
        for r in minhash_near_dup_pairs(
            docs, threshold=0.5, broadcast_id_limit=0
        ).collect()
    )
    assert bcast == shuffled and len(bcast) > 0


def test_cluster_probe_cadence_same_fixpoint(docs):
    every_round = sorted(
        (r.doc_id, r.cluster)
        for r in near_dup_clusters(docs, threshold=0.5, check_every=1).collect()
    )
    every_third = sorted(
        (r.doc_id, r.cluster)
        for r in near_dup_clusters(docs, threshold=0.5, check_every=3).collect()
    )
    assert every_round == every_third


def test_boilerplate_saturation_guards(spark, docs):
    """A corpus-wide boilerplate prefix makes boiler shingles win the
    min-hash permutations: band buckets go corpus-sized and the self-join
    quadratic.  max_df (drop corpus-frequent shingles pre-hash) + max_bucket
    (drop residual hot buckets) bound the candidates while every TRUE
    near-dup pair is still found."""
    from pyspark.sql import functions as F

    from kupo_spark.functions.dedup import lsh_candidate_pairs, shingles

    boiler = "all rights reserved terms and conditions apply to the content"
    base = docs.select(
        "doc_id", F.concat(F.lit(boiler + " "), F.col("text")).alias("text")
    )
    dup_src = base.where(F.col("doc_id") % 2 == 0)
    sat = base.unionByName(
        dup_src.select(
            (F.col("doc_id") + 10_000_000).alias("doc_id"),
            F.concat(F.col("text"), F.lit(" tail")).alias("text"),
        )
    )
    n_docs = sat.count()
    # unguarded: the boilerplate collapses band buckets toward corpus bins
    raw_cand = lsh_candidate_pairs(sat).count()
    guarded_sh = shingles(sat)
    from kupo_spark.functions.dedup import drop_frequent_shingles

    capped = drop_frequent_shingles(guarded_sh, max_df=n_docs // 4)
    guarded_cand = lsh_candidate_pairs(sat, sh=capped, max_bucket=50).count()
    assert guarded_cand < raw_cand  # the guards actually bound the blow-up
    # and the guarded pipeline keeps LSH-grade recall on the true pairs
    # (LSH is probabilistic: a borderline-similarity pair can miss a band;
    # the exact n-gram path under the SAME cap is the ground truth)
    from kupo_spark.functions.dedup import ngram_jaccard_pairs

    found = {
        (r.doc_a, r.doc_b)
        for r in minhash_near_dup_pairs(
            sat, threshold=0.5, max_df=n_docs // 4, max_bucket=50
        ).collect()
    }
    planted = {
        (int(r.doc_id), int(r.doc_id) + 10_000_000) for r in dup_src.collect()
    }
    exact = {
        (r.doc_a, r.doc_b)
        for r in ngram_jaccard_pairs(
            sat, threshold=0.5, max_df=n_docs // 4
        ).collect()
    }
    assert len(planted & found) / len(planted) >= 0.95
    assert len(exact & found) / max(1, len(exact)) >= 0.95


def test_cluster_guards_pass_through(docs):
    """near_dup_clusters forwards the saturation guards: on a clean corpus
    generous caps (and the shuffle id-join fallback) are semantics-neutral,
    so the guarded fixpoint equals the unguarded one — the plumbing the
    shipped curation path relies on."""
    plain = sorted(
        (r.doc_id, r.cluster)
        for r in near_dup_clusters(docs, threshold=0.5).collect()
    )
    guarded = sorted(
        (r.doc_id, r.cluster)
        for r in near_dup_clusters(
            docs, threshold=0.5, max_df=10_000, max_bucket=10_000,
            broadcast_id_limit=0,
        ).collect()
    )
    assert plain == guarded


def test_shingle_arrays_equal_exploded_shingles(spark):
    """r11: the zero-shuffle per-doc array form must carry exactly the
    exploded+distinct shingle multiset — including the empty array for a
    document shorter than k (the exploded form has no rows for it) — and
    its plan must contain no Exchange (distinctness computed in-row)."""
    from pyspark.sql import functions as F

    from kupo_spark.functions.dedup import shingle_arrays, shingles
    from kupo_spark.plans.explain import formatted_plan

    docs = spark.createDataFrame(
        [
            (1, "a b c d e"),
            (2, "a b c a b c d"),  # duplicate shingles within the doc
            (3, "x y"),  # < k tokens: empty set
            (4, "a b c d e"),
        ],
        "doc_id long, text string",
    )
    arr = shingle_arrays(docs, 3)
    exploded = sorted(
        (r.doc_id, r.sh)
        for r in arr.select("doc_id", F.explode("shs").alias("sh")).collect()
    )
    legacy = sorted((r.doc_id, r.sh) for r in shingles(docs, 3).collect())
    assert exploded == legacy and len(legacy) > 0
    assert {r.doc_id for r in arr.where(F.size("shs") == 0).collect()} == {3}
    assert "Exchange" not in formatted_plan(arr)


def test_signatures_from_raw_stream_equal_distinct_feed(spark):
    """r11 (examined, left alone — this pins WHY): min over a multiset
    equals min over its support set, so the min-hash signatures are
    invariant to per-doc shingle duplication, and Catalyst's
    RemoveRedundantAggregates (SPARK-33122) already deletes the distinct
    aggregate below the duplicate-insensitive min groupBy — BOTH feeds
    compile to one Exchange (the doc_id groupBy of the partial mins) and
    bit-identical signatures.  If a future change blocks the rule (e.g.
    an expression the optimizer cannot see through), the distinct feed
    regains a corpus-wide shingle-string shuffle and this test fails."""
    from kupo_spark.functions.dedup import (
        minhash_signatures_wide,
        shingle_stream,
        shingles,
    )
    from kupo_spark.plans.explain import formatted_plan

    docs = spark.createDataFrame(
        [
            (1, "a b c a b c d e"),  # duplicated shingles within the doc
            (2, "a b c d e"),
            (3, "x y"),  # < k tokens: no shingles, no signature row
            (4, "q w e r t y u"),
        ],
        "doc_id long, text string",
    )
    new = minhash_signatures_wide(docs, sh=shingle_stream(docs, 3))
    old = minhash_signatures_wide(docs)  # default: distinct feed
    assert sorted(map(tuple, new.collect())) == sorted(map(tuple, old.collect()))
    import re

    def n_exchanges(df):
        # count physical Exchange NODES (the formatted tree also names each
        # node in its outline, so a raw substring count double-counts)
        return len(re.findall(r"\(\d+\) Exchange", formatted_plan(df)))

    raw = minhash_signatures_wide(docs, sh=shingle_stream(docs, 3))
    distinct_fed = minhash_signatures_wide(docs, sh=shingles(docs, 3))
    # both plans: only the doc_id groupBy of the partial mins shuffles —
    # the optimizer removed the distinct feed's dropDuplicates aggregate
    assert n_exchanges(raw) == 1
    assert n_exchanges(distinct_fed) == 1


def test_default_and_guarded_paths_agree_when_cap_is_loose(docs):
    """r11: the default (array-set) verification path and the max_df
    guarded (exploded capped) path share results exactly when the cap is
    loose enough to drop nothing."""
    from kupo_spark.functions.dedup import minhash_near_dup_pairs

    default = sorted(
        (r.doc_a, r.doc_b, r.jaccard)
        for r in minhash_near_dup_pairs(docs, threshold=0.5).collect()
    )
    guarded = sorted(
        (r.doc_a, r.doc_b, r.jaccard)
        for r in minhash_near_dup_pairs(
            docs, threshold=0.5, max_df=10_000_000
        ).collect()
    )
    assert default == guarded and len(default) > 0


def test_ngram_default_array_path_matches_capped_plan(docs):
    """r11: the default ngram path derives postings + set sizes from the
    persisted shingle-array table (no dropDuplicates exchange, no counts
    groupBy); the capped path keeps the exploded plan.  With a cap far
    above any real document frequency the two paths must compute the
    identical pair set — pinning that the array rewrite changed the plan,
    not the Jaccard."""
    from kupo_spark.functions.dedup import ngram_jaccard_pairs

    array_path = sorted(
        (r.doc_a, r.doc_b, r.jaccard)
        for r in ngram_jaccard_pairs(docs, threshold=0.5).collect()
    )
    exploded_path = sorted(
        (r.doc_a, r.doc_b, r.jaccard)
        for r in ngram_jaccard_pairs(docs, threshold=0.5, max_df=10**9).collect()
    )
    assert array_path == exploded_path and len(array_path) > 0


def test_small_corpus_verification_skips_id_semi_join(docs, spark):
    """r12: when the shingle-array table fits one advisory partition and
    the pair list broadcasts, the candidate-id pre-filter (union +
    broadcast + left-semi probe) is skipped — the broadcast pair joins
    already restrict the probe side to candidate rows.  Forcing the
    at-scale regime (advisory shrunk to 1 byte) must bring the semi-join
    back, and both regimes must return the identical pair set."""
    from kupo_spark.plans.explain import formatted_plan

    small = minhash_near_dup_pairs(docs, threshold=0.5)
    assert "LeftSemi" not in formatted_plan(small)
    key = "spark.sql.adaptive.advisoryPartitionSizeInBytes"
    prev = spark.conf.get(key, "64MB")
    spark.conf.set(key, "1b")
    try:
        big = minhash_near_dup_pairs(docs, threshold=0.5)
        assert "LeftSemi" in formatted_plan(big)
        assert sorted(map(tuple, small.collect())) == sorted(
            map(tuple, big.collect())
        )
    finally:
        spark.conf.set(key, prev)
