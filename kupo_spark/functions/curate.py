"""Corpus curation — the end-to-end keep/drop decision a training-data
pipeline actually ships: exact dedup ∧ near-dup cluster canonicalization ∧
quality thresholds, composed from the individual operators.

Plan shape: three independent per-doc signals (hash-group canonical,
connected-component canonical, token stats) joined on doc_id — each signal
is one scan+agg over the corpus; the join keys are doc ids (uniform), so
the composition scales exactly as its parts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kupo_spark.functions.dedup import exact_duplicates, near_dup_clusters
from kupo_spark.functions.textops import token_stats


def curate(
    docs: DataFrame,
    min_tokens: int = 20,
    near_dup_threshold: float = 0.5,
    lm_floor: float | None = None,
    quality_model=None,
    quality_threshold: float = 0.5,
    max_df: int | None = None,
    max_bucket: int | None = None,
) -> DataFrame:
    """(doc_id, keep, drop_reason): keep a document iff it is the canonical
    representative of BOTH its exact-hash group and its near-dup cluster,
    and it meets the length floor.  drop_reason names the first failed
    gate (exact_dup → near_dup → too_short → lm_outlier → low_quality).

    Optional learned gates (off by default):

    - ``lm_floor``: drop documents whose bigram-LM typicality
      (:func:`kupo_spark.functions.lm.lm_score`, self-trained) falls
      below the floor — the perplexity filter.
    - ``quality_model``: a :class:`~kupo_spark.functions.classifier.
      QualityModel`; drop documents the folded classifier scores below
      ``quality_threshold``.

    ``max_df`` / ``max_bucket`` pass through to the near-dup clustering's
    LSH saturation guards (:func:`dedup.minhash_near_dup_pairs`) — a
    boilerplate-heavy corpus must be able to guard the SHIPPED curation
    path, not just the standalone pair operator.

    Each enabled gate is one more per-doc signal joined on doc_id — the
    composition's scale behavior stays that of its parts."""
    exact = exact_duplicates(docs).select("doc_id", "canonical_doc_id")
    clusters = near_dup_clusters(
        docs, threshold=near_dup_threshold, max_df=max_df, max_bucket=max_bucket
    )
    stats = token_stats(docs).select("doc_id", "n_tokens")
    joined = (
        docs.select("doc_id")
        .join(exact, "doc_id")
        .join(clusters, "doc_id")
        .join(stats, "doc_id")
    )
    reason = (
        F.when(F.col("canonical_doc_id") != F.col("doc_id"), F.lit("exact_dup"))
        .when(F.col("cluster") != F.col("doc_id"), F.lit("near_dup"))
        .when(F.col("n_tokens") < min_tokens, F.lit("too_short"))
    )
    if lm_floor is not None:
        from kupo_spark.functions.lm import lm_score

        lm = lm_score(docs).select("doc_id", "avg_logprob", "n_transitions")
        joined = joined.join(lm, "doc_id")
        reason = reason.when(
            (F.col("n_transitions") > 0) & (F.col("avg_logprob") < lm_floor),
            F.lit("lm_outlier"),
        )
    if quality_model is not None:
        from kupo_spark.functions.classifier import score_quality

        clf = score_quality(docs, quality_model).select("doc_id", "prob")
        joined = joined.join(clf, "doc_id")
        reason = reason.when(
            F.col("prob") < quality_threshold, F.lit("low_quality")
        )
    return joined.select(
        "doc_id",
        reason.isNull().alias("keep"),
        reason.alias("drop_reason"),
    )
