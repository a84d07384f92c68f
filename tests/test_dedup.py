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
