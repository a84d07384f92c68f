"""Streaming corpus curation: continuous near-duplicate filtering of an
incoming document stream against the persisted signature store.

``streaming_near_dedup`` wires :class:`~kupo_spark.functions.incremental.
IncrementalDeduper` under ``foreachBatch``: every micro-batch is
sketched, LSH-probed against the store (which holds the sketch of ALL
documents ever seen — ~100 bytes each, never the text), the verdict is
sinked, and the batch's signatures are committed to the store atomically.

Exactly-once: Structured Streaming may re-deliver a micro-batch after a
failure.  The store keeps each document's verdict next to its sketch, so
a replayed batch short-circuits to its original verdicts instead of
tripping the id-monotonicity guard or recomputing against a store that
has already advanced — and the sink write is per-batch-directory
overwrite (``out_path/batch_id=N``), so the replay rewrites the same
files instead of appending duplicates.

Mirrors the batch≡incremental contract of the underlying deduper: the
union of all per-batch verdicts equals the one-shot
``minhash_est_dedup`` over the whole stream (id-monotone arrival).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from kupo_spark.functions.incremental import IncrementalDeduper


def streaming_near_dedup(
    stream_docs: DataFrame,
    store_root: str,
    out_path: str,
    checkpoint: str,
    threshold: float = 0.5,
    **trigger_kwargs,
):
    """Start the continuous dedup query: verdicts (doc_id, keep, dup_of)
    append to ``out_path`` as parquet; signatures accumulate in the ACID
    table at ``store_root``.  Returns the StreamingQuery.

    ``trigger_kwargs`` pass through to ``trigger()`` (e.g.
    ``availableNow=True`` for a drain-and-stop run)."""

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        dd = IncrementalDeduper(
            batch_df.sparkSession, store_root, threshold=threshold
        )
        verdict = dd.add_batch(batch_df.select("doc_id", "text"))
        # idempotent sink: a replayed batch overwrites its own directory
        verdict.write.mode("overwrite").parquet(f"{out_path}/batch_id={batch_id}")

    writer = stream_docs.writeStream.foreachBatch(handle).option(
        "checkpointLocation", checkpoint
    )
    if trigger_kwargs:
        writer = writer.trigger(**trigger_kwargs)
    return writer.start()


def streaming_index_vectors(
    stream_emb: DataFrame,
    index_root: str,
    checkpoint: str,
    **trigger_kwargs,
):
    """Continuous growth of a persisted ANN index
    (:class:`~kupo_spark.functions.ann_index.VectorIndex`): each
    micro-batch of (vec_id, embedding) rows is encoded with the STORED
    parameters and appended in one atomic commit — the live-frontier
    analog of :func:`streaming_near_dedup` for the vector tier.  The
    index must be BUILT first (training needs a seed corpus — the
    frozen-quantizer contract; ``refresh`` handles drift out of band).

    Exactly-once under id-monotone arrival: a replayed micro-batch
    (Structured Streaming re-delivery after a failure) is detected from
    the log's per-file max-vec_id stats — no data scan — and
    short-circuits instead of double-appending; a genuinely non-monotone
    batch fails loudly (it could not have been absorbed atomically).
    Returns the StreamingQuery."""
    from pyspark.sql import functions as F

    from kupo_spark.functions.ann_index import VectorIndex

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        ix = VectorIndex(index_root)
        lo, hi = batch_df.agg(F.min("vec_id"), F.max("vec_id")).first()
        stored_max = ix.max_vec_id()
        if stored_max is not None and lo <= stored_max:
            if hi <= stored_max:
                return  # replay of a fully-absorbed batch
            raise ValueError(
                f"vector batch is not id-monotone: min vec_id {lo} <= "
                f"stored max {stored_max} but max {hi} is new"
            )
        ix.add(batch_df)

    writer = stream_emb.writeStream.foreachBatch(handle).option(
        "checkpointLocation", checkpoint
    )
    if trigger_kwargs:
        writer = writer.trigger(**trigger_kwargs)
    return writer.start()
