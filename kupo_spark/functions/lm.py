"""N-gram language-model scoring — the perplexity-filter stage of a
training-data pipeline (CCNet / "quality filtering by LM score").

A bigram model with stupid backoff (Brants et al. 2007, "Large Language
Models in Machine Translation") — THE n-gram smoothing designed for
distributed count tables: no discount renormalization pass, so the model
is literally two count tables and scoring is a join:

    S(w2 | w1) = c(w1 w2) / c(w1)            if the bigram was seen
               = alpha * c(w2) / N           otherwise (alpha = 0.4)
    OOV w2 scores as count 1.

Scale design: training is two map-side-combinable groupBy counts over an
exploded token/pair stream; scoring is the pair stream LEFT-joined
against the count tables on token keys (posting-list shape; frequent
tokens are hot keys, but the payload is one int per row and AQE's
skew-join split handles the "the the"-style head).  Everything is
JVM-side expressions — no Python in the hot path — and every arithmetic
step (integer counts, one double division, ln) is engine-portable, so a
DuckDB oracle re-derives identical scores.

The standard usage trains on a high-quality reference corpus and scores
the crawl (``lm_score(crawl, train_docs=wiki)``); self-scoring (the
default) reduces to "how typical is this document of the corpus" — low
scores surface boilerplate-free outliers, high scores repetitive sludge.

Reference analog: none — kupo has no text surface; this extends the
LLM-data-pipeline family (SURVEY.md §2, pipeline operators).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kupo_spark.functions.textops import TOKENS

ALPHA = 0.4


def token_pairs(docs: DataFrame) -> DataFrame:
    """(doc_id, pos, w1, w2): adjacent token pairs; documents with fewer
    than two tokens contribute none."""
    return (
        docs.select("doc_id", F.expr(TOKENS).alias("t"))
        .where(F.expr("size(t) >= 2"))
        .select(
            "doc_id",
            F.posexplode(
                F.expr("transform(sequence(0, size(t) - 2), i -> struct(t[i] as w1, t[i + 1] as w2))")
            ).alias("pos", "p"),
        )
        .select("doc_id", "pos", "p.w1", "p.w2")
    )


def unigram_counts(docs: DataFrame) -> DataFrame:
    """(w, c): corpus token counts — one explode + one combinable groupBy."""
    return (
        docs.select(F.explode(F.expr(TOKENS)).alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("c"))
    )


def bigram_counts(docs: DataFrame) -> DataFrame:
    """(w1, w2, c): corpus bigram counts."""
    return token_pairs(docs).groupBy("w1", "w2").agg(F.count("*").alias("c"))


def lm_score(
    docs: DataFrame,
    train_docs: DataFrame | None = None,
    alpha: float = ALPHA,
) -> DataFrame:
    """(doc_id, n_transitions, avg_logprob): per-token average log
    stupid-backoff score of every document under the model trained on
    ``train_docs`` (default: ``docs`` itself — in-corpus typicality).
    Documents with < 2 tokens get (0, 0.0): nothing to score, no verdict.

    The unigram total N is folded in as a literal (one tiny aggregate —
    same pattern as the corpus-size scalar in tf-idf) rather than a
    cross-join column, keeping the scored stream's exchanges to the two
    count-table joins."""
    train = docs if train_docs is None else train_docs
    uni = unigram_counts(train)
    bi = bigram_counts(train)
    n_total = uni.agg(F.sum("c")).collect()[0][0] or 1

    pairs = token_pairs(docs)
    u1 = uni.select(F.col("w").alias("w1"), F.col("c").alias("c1"))
    u2 = uni.select(F.col("w").alias("w2"), F.col("c").alias("c2"))
    bi2 = bi.select("w1", "w2", F.col("c").alias("cb"))
    scored = (
        pairs.join(bi2, ["w1", "w2"], "left")
        .join(u1, "w1", "left")
        .join(u2, "w2", "left")
        .withColumn(
            "lp",
            F.expr(
                f"CASE WHEN cb IS NOT NULL THEN ln(cb / c1) "
                f"ELSE ln({alpha} * coalesce(c2, 1) / {n_total}) END"
            ),
        )
    )
    per_doc = scored.groupBy("doc_id").agg(
        F.count("*").alias("n_transitions"),
        F.expr("round(sum(lp) / count(*), 6)").alias("avg_logprob"),
    )
    return (
        docs.select("doc_id")
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_transitions", F.lit(0)).cast("long").alias("n_transitions"),
            F.coalesce("avg_logprob", F.lit(0.0)).alias("avg_logprob"),
        )
    )
