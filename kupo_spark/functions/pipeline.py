"""End-to-end training-data preparation — every stage of the pipeline
composed the way a user would actually ship it:

    scrub → substring dedup → curate (exact/near dedup + length +
    optional LM/classifier gates) → deterministic sample → shard export

One call, one stats report.  Each stage is the already-tested operator;
the composition adds NO new distributed machinery — joins are on doc_id
(uniform), each stage is shuffle-bounded by its own contract, and the
whole flow is restart-safe because every stage is deterministic
(md5-keyed sampling/sharding, id-ordered dedup verdicts).

The stage ORDER is deliberate and matches production pipelines
(RefinedWeb/FineWeb): scrubbing rewrites text BEFORE any hashing so
redaction can't split duplicate groups; substring dedup rewrites before
document-level dedup so shared boilerplate doesn't glue distinct
documents into near-dup clusters; sampling runs after curation so the
sample fraction applies to clean data; sharding is last.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kupo_spark.functions.curate import curate
from kupo_spark.functions.dedup import exact_substring_dedup
from kupo_spark.functions.sampling import deterministic_sample
from kupo_spark.functions.scrub import pii_scrub
from kupo_spark.functions.shards import write_shards


def prepare_training_data(
    docs: DataFrame,
    out_path: str,
    n_shards: int = 16,
    scrub: bool = True,
    substring_k: int | None = None,
    min_tokens: int = 20,
    near_dup_threshold: float = 0.5,
    lm_floor: float | None = None,
    quality_model=None,
    quality_threshold: float = 0.5,
    sample_fraction: float | None = None,
    seed: str = "0",
    max_df: int | None = None,
    max_bucket: int | None = None,
) -> tuple[DataFrame, dict]:
    """Run the full preparation flow; returns (shard manifest, report).

    ``max_df`` / ``max_bucket`` are the near-dup LSH saturation guards
    (:func:`kupo_spark.functions.dedup.minhash_near_dup_pairs`), passed
    through curation — set them for boilerplate-heavy crawls.

    The report counts documents entering/surviving each stage plus the
    curation drop-reason histogram — the numbers a dataset card needs."""
    report: dict = {"n_input": docs.count()}
    d = docs.select("doc_id", "text")
    # at most ONE stage cache lives at a time: each rewrite stage persists
    # BEFORE its report counter (so the expensive lineage — 5-pattern
    # regex scrub, substring-dedup window — runs once), and the previous
    # stage's cache is released as soon as its successor materializes;
    # the finally releases whatever is live if any stage throws
    live: list = []

    def _persist(df: DataFrame) -> DataFrame:
        df = df.persist()
        live.append(df)
        return df

    def _release_upto(keep_last: int = 1) -> None:
        while len(live) > keep_last:
            live.pop(0).unpersist()

    try:
        if scrub:
            s = _persist(pii_scrub(d))
            report["n_had_pii"] = s.where("has_pii").count()
            d = s.select("doc_id", F.col("text_scrubbed").alias("text"))

        if substring_k is not None:
            sub = _persist(exact_substring_dedup(d, k=substring_k))
            report["n_chunks_removed"] = (
                sub.agg(F.sum("n_removed")).collect()[0][0] or 0
            )
            # sub is materialized -> the scrub cache is dead
            _release_upto(1)
            d = sub.select("doc_id", F.col("clean_text").alias("text"))

        d = _persist(d)  # three curation signals + the final join read this
        verdict = _persist(
            curate(
                d,
                min_tokens=min_tokens,
                near_dup_threshold=near_dup_threshold,
                lm_floor=lm_floor,
                quality_model=quality_model,
                quality_threshold=quality_threshold,
                max_df=max_df,
                max_bucket=max_bucket,
            )
        )
        report["drop_reasons"] = {
            r.drop_reason: r.cnt
            for r in verdict.where(~F.col("keep"))
            .groupBy("drop_reason")
            .agg(F.count("*").alias("cnt"))
            .collect()
        }
        # verdict (and therefore d) are materialized -> earlier rewrite
        # caches are dead; keep d + verdict for the export join
        _release_upto(2)
        kept = d.join(verdict.where("keep").select("doc_id"), "doc_id")
        report["n_kept"] = report["n_input"] - sum(report["drop_reasons"].values())

        # per-stage seeds: the sample draw and the shard permutation share
        # the md5(seed:doc_id) family, so handing both the SAME seed would
        # fully correlate them (every exported key < fraction·2^60, and
        # any later draw from that seed — a validation split, say — would
        # select exactly the prefix of every shard).  Disjoint derived
        # seeds give independent draws, per the sampling contract.
        if sample_fraction is not None:
            kept = deterministic_sample(
                kept, sample_fraction, seed=f"{seed}:sample"
            )

        manifest = write_shards(kept, out_path, n_shards, seed=f"{seed}:shard")
        report["n_exported"] = manifest.agg(F.sum("n_rows")).collect()[0][0] or 0
        report["n_shards"] = manifest.count()
        return manifest, report
    finally:
        _release_upto(0)
