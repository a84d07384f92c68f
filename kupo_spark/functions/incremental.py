"""Incremental corpus deduplication against a persisted signature store.

The batch dedup operators re-read the whole corpus per run; at 100 TB of
accumulated crawl snapshots that is the cost that kills a pipeline.  The
incremental path persists ONLY the min-hash sketch — n·8 bytes per
document, ~100 bytes/doc — in an ACID :class:`kupo_spark.table.Table`,
and deduplicates each new batch by

1. computing the batch's wide signatures (one shingle scan of the NEW
   text only — previously seen text is never re-read or re-shingled),
2. LSH-banding the batch against (store ∪ batch) band keys — an
   equi-join on uniform md5 keys, linear in batch size, never in corpus
   size on the probe side,
3. verifying candidates by signature agreement
   (:func:`kupo_spark.functions.dedup.estimate_pairs`), and
4. appending the batch's signatures (kept AND dropped — see below) to
   the store in one atomic commit.

A document is dropped iff some earlier document (smaller doc_id, kept or
itself dropped) is an est-jaccard near-duplicate.  Referencing all
earlier documents makes the verdict a function of the id order alone, so
feeding the corpus in any id-monotone batch split yields byte-identical
verdicts to a one-shot :func:`dedup.minhash_est_dedup` pass — the
equivalence a resumable 100 TB ingest needs, and the property the tests
pin.  Dropped documents' signatures are stored too (flagged) precisely
to keep that invariant: they can still be the "earlier duplicate" that
condemns a later arrival.

Reference analog: none — kupo has no corpus-dedup surface; this extends
the LLM-data-pipeline family (SURVEY.md §2, pipeline operators).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import BooleanType, LongType, StructField, StructType

from kupo_spark.functions.dedup import (
    N_BANDS,
    ROWS_PER_BAND,
    band_keys_from_wide,
    estimate_pairs,
    minhash_signatures_wide,
)
from kupo_spark.table import Table


def store_schema(n_sigs: int) -> StructType:
    # the verdict (keep, dup_of) is stored alongside the sketch so a
    # replayed batch (streaming retry) can return its original verdicts
    # instead of recomputing against a store that already advanced
    return StructType(
        [StructField("doc_id", LongType())]
        + [StructField(f"sig_{i}", LongType()) for i in range(n_sigs)]
        + [StructField("keep", BooleanType()), StructField("dup_of", LongType())]
    )


class IncrementalDeduper:
    """Sketch store + per-batch dedup verdicts.

    ``add_batch(docs)`` returns (doc_id, keep, dup_of) for the batch and
    atomically appends the batch's signatures.  Batches must be
    id-monotone (every doc_id ≥ all previously stored ids — natural for
    append-only ingest); this is asserted, because a smaller id arriving
    late could never retroactively condemn an already-stored document.
    """

    def __init__(
        self,
        spark: SparkSession,
        root: str,
        threshold: float = 0.5,
        bands: int = N_BANDS,
        rows: int = ROWS_PER_BAND,
        k: int = 3,
    ):
        self.spark = spark
        self.threshold = threshold
        self.bands, self.rows, self.k = bands, rows, k
        self.n = bands * rows
        if Table.exists(root):
            self.table = Table(root)
            if "dup_of" not in {f.name for f in self.table.schema().fields}:
                self._migrate_v1(root)
        else:
            self.table = Table.create(root, store_schema(self.n))

    def _migrate_v1(self, root: str) -> None:
        """Schema migration from the pre-dup_of store layout: dup_of is
        reconstructed EXACTLY from the stored sketches (kept docs are -1
        by definition; a dropped doc's dup_of is the smallest earlier
        near-duplicate, recomputable because ALL earlier docs' signatures
        are in the store).  The rewrite is ONE atomic schema-evolving
        overwrite commit — a crash mid-migration leaves the v1 store
        intact and the next open retries.

        Requires the SAME threshold the store was built with: the
        reconstruction is cross-checked against the stored keep flags
        (keep ⟺ dup_of == -1) and a mismatch aborts the migration."""
        old = self.table.read(self.spark).persist()
        universe = old.drop("keep")
        bk = band_keys_from_wide(universe, self.bands, self.rows)
        cand = (
            bk.select(F.col("doc_id").alias("doc_a"), "band", "key")
            .join(
                bk.select(F.col("doc_id").alias("doc_b"), "band", "key"),
                ["band", "key"],
            )
            .where(F.col("doc_a") < F.col("doc_b"))
            .select("doc_a", "doc_b")
            .distinct()
        )
        dups = (
            estimate_pairs(cand, universe, universe, self.n, self.threshold)
            .groupBy(F.col("doc_b").alias("doc_id"))
            .agg(F.min("doc_a").alias("dup_of"))
        )
        migrated = (
            old.join(dups, "doc_id", "left")
            .withColumn("dup_of", F.coalesce("dup_of", F.lit(-1)).cast("long"))
            .select([f.name for f in store_schema(self.n).fields])
            .persist()
        )
        inconsistent = migrated.where(
            F.col("keep") != (F.col("dup_of") == -1)
        ).count()
        if inconsistent:
            migrated.unpersist()
            old.unpersist()
            raise ValueError(
                f"v1 store migration: {inconsistent} rows where the "
                f"reconstructed dup_of contradicts the stored keep flag — "
                f"the store was built with a different threshold than "
                f"{self.threshold}; reopen with the original threshold"
            )
        self.table.overwrite_schema(migrated, store_schema(self.n))
        old.unpersist()
        migrated.unpersist()

    def stored(self) -> DataFrame:
        return self.table.read(self.spark)

    def optimize(self, vacuum_retention_seconds: float | None = None) -> int:
        """Operational maintenance for a long-lived store: every batch is
        one small appended file, so after N batches the LSH probe reads N
        files — bin-pack them (Delta OPTIMIZE, dataChange=false: replay
        and time travel unaffected) and optionally vacuum files older
        than the retention window.  Returns the new log version."""
        v = self.table.optimize(self.spark)
        if vacuum_retention_seconds is not None:
            self.table.vacuum(vacuum_retention_seconds)
        return v

    def add_batch(self, docs: DataFrame) -> DataFrame:
        """Dedup ``docs`` against the store and itself, append signatures,
        return (doc_id, keep, dup_of) — dup_of is the smallest earlier
        near-duplicate id, -1 when kept."""
        stored = self.stored().persist()
        max_stored = stored.agg(F.max("doc_id")).collect()[0][0]
        min_new = docs.agg(F.min("doc_id")).collect()[0][0]
        if max_stored is not None and min_new is not None and min_new <= max_stored:
            # replay? (streaming retry re-delivers a batch the store already
            # absorbed) -> return the stored verdicts, touch nothing.  The
            # returned frame is a FRESH un-cached plan over the store's
            # immutable parquet files: no driver materialization (collect
            # would OOM on a large batch), no cache pinned per retry, and
            # no truncated lineage (localCheckpoint blocks die with their
            # executor) — consuming it just re-reads the store once.
            ids = docs.select("doc_id")
            hit = stored.join(ids, "doc_id", "inner").persist()
            try:
                if hit.count() == ids.count():
                    return (
                        self.stored()
                        .join(ids, "doc_id", "inner")
                        .select("doc_id", "keep", "dup_of")
                    )
                raise ValueError(
                    f"batch is not id-monotone: new doc_id {min_new} <= "
                    f"stored max {max_stored}"
                )
            finally:
                hit.unpersist()
                stored.unpersist()
        # one shingle scan of the NEW text only; docs with no shingles get
        # a NULL-sig row (kept, band-inert) so every batch doc is stored
        wide_new = (
            docs.select("doc_id")
            .join(minhash_signatures_wide(docs, self.n, self.k), "doc_id", "left")
            .persist()
        )
        universe = stored.drop("keep", "dup_of").unionByName(wide_new)
        bk_new = band_keys_from_wide(wide_new, self.bands, self.rows)
        bk_all = band_keys_from_wide(universe, self.bands, self.rows)
        cand = (
            bk_all.select(F.col("doc_id").alias("doc_a"), "band", "key")
            .join(
                bk_new.select(F.col("doc_id").alias("doc_b"), "band", "key"),
                ["band", "key"],
            )
            .where(F.col("doc_a") < F.col("doc_b"))
            .select("doc_a", "doc_b")
            .distinct()
        )
        dups = (
            estimate_pairs(cand, universe, wide_new, self.n, self.threshold)
            .groupBy(F.col("doc_b").alias("doc_id"))
            .agg(F.min("doc_a").alias("dup_of"))
        )
        verdict = (
            wide_new.select("doc_id")
            .join(dups, "doc_id", "left")
            .select(
                "doc_id",
                F.col("dup_of").isNull().alias("keep"),
                F.coalesce("dup_of", F.lit(-1)).cast("long").alias("dup_of"),
            )
            .persist()
        )
        verdict.count()  # pin the verdict before the store advances
        self.table.append(wide_new.join(verdict, "doc_id"))
        stored.unpersist()
        wide_new.unpersist()
        return verdict
