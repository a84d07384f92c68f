"""Text-analysis operators for training-data pipelines.

All hot-path expressions are JVM-side builtins (split/filter/transform/
aggregate) — no Python UDFs — so they stay inside whole-stage codegen and
scale linearly over a 100 TB documents table: every operator here is a
narrow projection + optional groupBy, no joins, no skew.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TOKENS = "filter(split(text, ' '), x -> x != '')"

#: language marker profiles (function words).  Scoring = total occurrence
#: count of each language's markers in the text; deterministic and
#: engine-portable (occurrence counting via length/replace).  Swap in real
#: profiles for real corpora.
LANG_PROFILES: dict[str, list[str]] = {
    "de": ["der", "und", "nicht"],
    "en": ["the", "and", "of"],
    "es": ["que", "los", "una"],
    "fr": ["les", "une", "est"],
    "zh": ["de5", "shi4", "le5"],
}

STOPWORDS = ("the", "a", "of", "and", "in")

#: Gopher-style repetition/quality thresholds (Rae et al. 2021, "Scaling
#: Language Models: ... Gopher", §A1.1 — adapted to this corpus: the
#: synthetic documents are space-separated word streams with no lines or
#: punctuation, so the line- and symbol-based rules are degenerate and the
#: token/n-gram repetition rules carry the signal).
GOPHER_MIN_TOKENS = 20
GOPHER_MAX_TOKENS = 100_000
GOPHER_MIN_AVG_TOKEN_LEN = 2.0
GOPHER_MAX_AVG_TOKEN_LEN = 12.0
GOPHER_MAX_TOP_2GRAM_FRAC = 0.20
GOPHER_MAX_DUP_2GRAM_FRAC = 0.60
GOPHER_MIN_STOPWORD_RATIO = 0.0


def _occurrences(col: str, marker: str) -> str:
    """# of occurrences of `marker` in `col` — portable SQL idiom."""
    return f"(length({col}) - length(replace({col}, '{marker}', ''))) DIV {len(marker)}"


def lang_score_expr(lang: str, col: str = "text") -> str:
    return " + ".join(_occurrences(col, m) for m in LANG_PROFILES[lang])


def token_stats(docs: DataFrame) -> DataFrame:
    """Token counting + lexical-diversity stats per document."""
    t = docs.select(
        "doc_id",
        F.expr(TOKENS).alias("t"),
        F.expr("length(replace(text, ' ', ''))").alias("total_tok_chars"),
    )
    # empty-document guards: real corpora (and the substring-dedup rewrite)
    # produce zero-token docs; the ratios define to 0.0 there
    return t.select(
        "doc_id",
        F.expr("size(t)").alias("n_tokens"),
        F.expr("size(array_distinct(t))").alias("n_uniq_tokens"),
        F.expr(
            "CASE WHEN size(t) = 0 THEN 0.0"
            " ELSE round(total_tok_chars / size(t), 6) END"
        ).alias("avg_token_len"),
        F.expr(
            "CASE WHEN size(t) = 0 THEN 0.0"
            " ELSE round(size(array_distinct(t)) / size(t), 6) END"
        ).alias("ttr"),
    )


def quality_score(docs: DataFrame) -> DataFrame:
    """Heuristic quality scoring + Gopher-style repetition filters.

    Columns: stopword ratio (fluency proxy), a diversity×length score, the
    two n-gram repetition measures from the Gopher rules (fraction of
    2-grams that recur; fraction of 2-gram mass held by the most frequent
    2-gram), and ``gopher_pass`` — the conjunction of the threshold rules.

    All expressions are JVM higher-order functions over the token array —
    no shuffle, no UDF: per-document cost is O(len²) on the (bounded-length)
    2-gram array, which stays embarrassingly parallel at 100 TB.  The same
    arithmetic is reproduced verbatim in the DuckDB oracle
    (``oracle_pipeline.quality_sql``)."""
    stop_pred = " OR ".join(f"x = '{w}'" for w in STOPWORDS)
    t = docs.select(
        "doc_id",
        F.expr(TOKENS).alias("t"),
        F.expr("length(replace(text, ' ', ''))").alias("total_tok_chars"),
    )
    # token 2-grams; sequence(1, 0) in Spark would count DOWN, so guard the
    # single-token case to a typed empty array
    g = t.withColumn(
        "grams",
        F.expr(
            "CASE WHEN size(t) >= 2 THEN "
            "transform(sequence(1, size(t) - 1), "
            "i -> concat(element_at(t, i), ' ', element_at(t, i + 1))) "
            "ELSE array() END"
        ),
    ).withColumn(
        "gram_counts",
        F.expr("transform(array_distinct(grams), d -> size(filter(grams, x -> x = d)))"),
    )
    # empty-document guards (same contract as token_stats: ratios are 0.0)
    scored = g.select(
        "doc_id",
        F.expr(
            "CASE WHEN size(t) = 0 THEN 0.0 ELSE "
            f"round(size(filter(t, x -> {stop_pred})) / size(t), 6) END"
        ).alias("stopword_ratio"),
        F.expr(
            "CASE WHEN size(t) = 0 THEN 0.0 ELSE "
            "round(least(1.0, size(t) / 100.0) * (size(array_distinct(t)) / size(t)), 6) END"
        ).alias("quality_score"),
        F.expr("size(t)").alias("n_tokens"),
        F.expr(
            "CASE WHEN size(t) = 0 THEN 0.0"
            " ELSE round(total_tok_chars / size(t), 6) END"
        ).alias("avg_token_len"),
        F.expr(
            "CASE WHEN size(grams) = 0 THEN cast(0.0 as double) ELSE "
            "round(aggregate(filter(gram_counts, c -> c > 1), 0, (a, c) -> a + c) "
            "/ size(grams), 6) END"
        ).alias("frac_dup_2gram"),
        F.expr(
            "CASE WHEN size(grams) = 0 THEN cast(0.0 as double) ELSE "
            "round(array_max(gram_counts) / size(grams), 6) END"
        ).alias("top_2gram_frac"),
    )
    return scored.withColumn(
        "gopher_pass",
        F.expr(
            f"n_tokens >= {GOPHER_MIN_TOKENS} AND n_tokens <= {GOPHER_MAX_TOKENS} "
            f"AND avg_token_len >= {GOPHER_MIN_AVG_TOKEN_LEN} "
            f"AND avg_token_len <= {GOPHER_MAX_AVG_TOKEN_LEN} "
            f"AND top_2gram_frac <= {GOPHER_MAX_TOP_2GRAM_FRAC} "
            f"AND frac_dup_2gram <= {GOPHER_MAX_DUP_2GRAM_FRAC} "
            f"AND stopword_ratio >= {GOPHER_MIN_STOPWORD_RATIO}"
        ),
    )


def lang_id(docs: DataFrame) -> DataFrame:
    """Marker-profile language ID: per-language occurrence score, argmax
    with alphabetical tie-break."""
    scores = docs.select(
        "doc_id",
        *[F.expr(lang_score_expr(lg)).cast("long").alias(f"score_{lg}") for lg in sorted(LANG_PROFILES)],
    )
    langs = sorted(LANG_PROFILES)
    best = F.greatest(*[F.col(f"score_{lg}") for lg in langs])
    pred = None
    for lg in reversed(langs):  # earliest alphabetical wins ties
        cond = F.col(f"score_{lg}") == best
        pred = F.when(cond, F.lit(lg)) if pred is None else F.when(cond, F.lit(lg)).otherwise(pred)
        # building right-to-left so the leftmost (alphabetically first) WHEN wins
    return scores.select(
        "doc_id",
        pred.alias("predicted_lang"),
        best.alias("best_score"),
    )


#: vocabulary-broadcast cutoff for tf-idf: a curated corpus's vocabulary
#: grows sub-linearly, but a raw web crawl's does not (URLs, hashes,
#: typos) — above this many distinct terms the df join falls back to a
#: shuffle on the term key (uniform md5-ish distribution of real token
#: strings; AQE splits any residual "the"-style head).  Same explicit-gate
#: discipline as dedup.BROADCAST_ID_LIMIT / similarity.QUERY_COLLECT_LIMIT.
BROADCAST_VOCAB_LIMIT = 2_000_000


def tfidf_top_terms(
    docs: DataFrame, top: int = 3, broadcast_vocab_limit: int = BROADCAST_VOCAB_LIMIT
) -> DataFrame:
    """TF-IDF weighting with the top-`top` terms per document (tie-break on
    the term).  Classic pre-training-corpus featurization: two aggregations
    (term frequency per doc, document frequency per term) + a window.

    The df(term) dimension broadcasts while the vocabulary is under
    ``broadcast_vocab_limit`` distinct terms (the aggregate is already
    materialized for the join, so the count is one cheap extra job on the
    persisted frame); above it the join shuffles on the term key."""
    tok = docs.select("doc_id", F.explode(F.expr(TOKENS)).alias("term"))
    tf = tok.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    dfreq = tok.select("doc_id", "term").distinct().groupBy("term").agg(
        F.count("*").alias("df_t")
    ).persist()
    small_vocab = dfreq.count() <= broadcast_vocab_limit
    n = docs.agg(F.count("*").alias("n_docs"))
    scored = (
        tf.join(F.broadcast(dfreq) if small_vocab else dfreq, "term")
        .crossJoin(F.broadcast(n))
        .withColumn("tfidf", F.expr("round(tf * ln(n_docs / df_t), 6)"))
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), F.col("term").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= top)
        .select("doc_id", "term", "tfidf", "rank")
    )


def fingerprint(docs: DataFrame) -> DataFrame:
    """Document fingerprinting: md5 of the normalized text + a 256-way
    shard bucket (the partition key for a distributed dedup join)."""
    return docs.select(
        "doc_id",
        F.expr("md5(regexp_replace(lower(text), '[^a-z0-9 ]', ''))").alias("fingerprint"),
    ).withColumn("bucket", F.expr("substring(fingerprint, 1, 2)"))


#: BPE-ish piece pattern: letter runs, digit runs, or one other mark —
#: the granularity a byte-pair tokenizer bottoms out at before merges.
#: Disjoint character classes, so Java regex (Spark) and RE2 (DuckDB)
#: produce identical matches.
BPE_PIECE_RE = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"


def bpe_piece_count(docs: DataFrame) -> DataFrame:
    """(doc_id, n_pieces, n_tokens, pieces_per_token): sub-word piece
    counting — the "how many tokens will the tokenizer bill me for"
    estimate next to the whitespace count.  One regexp_extract_all
    projection, no shuffle."""
    return docs.select(
        "doc_id",
        F.expr(f"size(regexp_extract_all(text, '{BPE_PIECE_RE}', 0))").alias(
            "n_pieces"
        ),
        F.expr(f"size({TOKENS})").alias("n_tokens"),
    ).select(
        "doc_id",
        "n_pieces",
        "n_tokens",
        F.expr(
            "CASE WHEN n_tokens = 0 THEN 0.0 "
            "ELSE round(n_pieces / n_tokens, 6) END"
        ).alias("pieces_per_token"),
    )
