"""Maintenance — rollback (stream retraction) and the gardener's GC.

Reference:
  * ``rollbackTo`` — delete inputs created after the point, un-spend inputs
    spent after it, truncate checkpoints (``SQLite.hs:799-819,1053-1063``;
    consumer call ``src/Kupo/App.hs:505-510``);
  * ``pruneInputs`` — drop spent rows older than the rollback horizon
    (``SQLite.hs:654-657,876-883``);
  * ``pruneBinaryData`` — anti-join GC of orphan datums
    (``SQLite.hs:758-760,1031-1041``).

These are pure DataFrame → DataFrame state transitions (in a Delta/Iceberg
deployment each would be a transactional DELETE/UPDATE/MERGE; the dataflow —
and therefore the shuffle/scan profile — is identical).  kupo's LIMIT-50000
incremental delete loops exist to keep SQLite transactions short; Spark
deletes are atomic per table so the increments are dropped while semantics
are preserved (SURVEY §2.7 O5).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kupo_spark.chainspec import LONGEST_ROLLBACK
from kupo_spark.operators.indexer import Index


def rollback_to(index: Index, slot_no: int) -> Index:
    """M1: retract the suffix after `slot_no`.  Idempotent — applying at or
    after the current tip is a no-op (SQLite.hs:799-806)."""
    s = F.lit(slot_no)
    unspend = F.col("spent_at").isNotNull() & (F.col("spent_at") > s)
    spent_cols = ["spent_by", "spent_input_index", "spent_with"]
    if "spent_header_hash" in index.inputs.columns:
        # denormalized J2 column (write_index) must be retracted with the
        # spent_at it was resolved from
        spent_cols.append("spent_header_hash")
    inputs = index.inputs.where(F.col("created_at") <= s)
    for c in spent_cols + ["spent_at"]:
        inputs = inputs.withColumn(c, F.when(unspend, F.lit(None)).otherwise(F.col(c)))
    checkpoints = index.checkpoints.where(F.col("slot_no") <= s)
    surviving = inputs.select("output_reference")
    policies = index.policies.join(surviving, "output_reference", "left_semi")
    assets = index.assets.join(surviving, "output_reference", "left_semi")
    return Index(
        inputs=inputs,
        checkpoints=checkpoints,
        policies=policies,
        assets=assets,
        binary_data=index.binary_data,
        scripts=index.scripts,
    )


def prune_inputs(index: Index, k: int = LONGEST_ROLLBACK) -> Index:
    """M2: GC spent rows beyond the rollback horizon:
    spent_at < tip - k (SQLite.hs:876-883).  The horizon is a broadcast
    1-row aggregate rather than a driver-side collect, so a GC pass that
    composes into a larger pipeline stays a single plan."""
    horizon = index.checkpoints.agg(
        (F.coalesce(F.max("slot_no"), F.lit(0)) - F.lit(k)).alias("_horizon")
    )
    inputs = (
        index.inputs.join(F.broadcast(horizon))
        .where(F.col("spent_at").isNull() | (F.col("spent_at") >= F.col("_horizon")))
        .drop("_horizon")
    )
    surviving = inputs.select("output_reference")
    return Index(
        inputs=inputs,
        checkpoints=index.checkpoints,
        policies=index.policies.join(surviving, "output_reference", "left_semi"),
        assets=index.assets.join(surviving, "output_reference", "left_semi"),
        binary_data=index.binary_data,
        scripts=index.scripts,
    )


def prune_binary_data(index: Index) -> Index:
    """M3/J6: drop datum payloads no longer referenced by any input —
    a hash anti-join (SQLite.hs:1031-1041; kupo forces an index for this,
    Spark's broadcast/SHJ anti-join needs no hint at dimension sizes)."""
    referenced = index.inputs.where(F.col("datum_hash").isNotNull()).select(
        F.col("datum_hash").alias("binary_data_hash")
    )
    binary_data = index.binary_data.join(referenced, "binary_data_hash", "left_semi")
    return Index(
        inputs=index.inputs,
        checkpoints=index.checkpoints,
        policies=index.policies,
        assets=index.assets,
        binary_data=binary_data,
        scripts=index.scripts,
    )


def delete_by_pattern(index: Index, pattern) -> Index:
    """W6 deleteInputs (DELETE /matches/{pattern}) — anti-filter rewrite."""
    from kupo_spark.patterns import pattern_from_text, to_column

    if isinstance(pattern, str):
        pattern = pattern_from_text(pattern)
    inputs = index.inputs.where(~to_column(pattern))
    surviving = inputs.select("output_reference")
    return Index(
        inputs=inputs,
        checkpoints=index.checkpoints,
        policies=index.policies.join(surviving, "output_reference", "left_semi"),
        assets=index.assets.join(surviving, "output_reference", "left_semi"),
        binary_data=index.binary_data,
        scripts=index.scripts,
    )


def put_patterns_backfill(index: Index, old_patterns, rollback_slot: int) -> Index:
    """M5 batch form (PUT /patterns: rollback → install → backfill,
    reference ``src/Kupo/App/Http.hs:655-685`` + the consumer replay).
    ``index`` is the index REBUILT with the ENLARGED pattern set over the
    full replay source; the composed state drops rows only the NEW
    patterns match whose ``created_at`` ≤ the rollback point — the
    reference's contract that pre-point matches of new patterns stay
    absent (they were never rolled forward over).  Old-pattern rows are
    untouched (rollback deletes + backfill re-adds them); spent-marks are
    global, as in any full replay."""
    from kupo_spark.patterns import pattern_from_text, to_column

    old_pred = F.lit(False)
    for p in old_patterns:
        if isinstance(p, str):
            p = pattern_from_text(p)
        old_pred = old_pred | to_column(p)
    keep = (F.col("created_at") > F.lit(rollback_slot)) | old_pred
    inputs = index.inputs.where(keep)
    surviving = inputs.select("output_reference")
    return Index(
        inputs=inputs,
        checkpoints=index.checkpoints,
        policies=index.policies.join(surviving, "output_reference", "left_semi"),
        assets=index.assets.join(surviving, "output_reference", "left_semi"),
        binary_data=index.binary_data,
        scripts=index.scripts,
    )


def metadata_by_slot(blocks: DataFrame, slot_no: int, transaction_id: str | None = None) -> DataFrame:
    """GET /metadata/{slot} (S4 + Http.hs:754-805): per-tx metadata payloads
    of the block at `slot_no` — a point lookup on the block stream."""
    df = blocks.where(
        (F.col("slot_no") == F.lit(slot_no)) & F.col("metadata_cbor").isNotNull()
    )
    if transaction_id is not None:
        df = df.where(F.col("transaction_id") == F.lit(transaction_id))
    return df.select("transaction_id", "metadata_cbor")


def metadata_by_slot_rendered(
    blocks: DataFrame, slot_no: int, transaction_id: str | None = None
) -> DataFrame:
    """GET /metadata/{slot} response shape: each row rendered as the
    reference's ``{"hash", "raw", "schema"}`` JSON (``metadataToJson'``,
    Metadata.hs:154-160) — recursive schema rendering is Python-side
    (Arrow-batched pandas UDF), the lookup itself stays JVM-side."""
    import pandas
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import StringType

    # explicit returnType, no type hints: `from __future__ import
    # annotations` stringifies hints, which breaks pandas_udf's lazy hint
    # resolution for locally-defined functions
    def _render_batch(hex_cbor):
        from kupo_spark.metadata import render_metadata_text

        return pandas.Series([render_metadata_text(h) for h in hex_cbor])

    _render = pandas_udf(_render_batch, returnType=StringType())

    rows = metadata_by_slot(blocks, slot_no, transaction_id)
    return rows.select(
        "transaction_id", _render(F.col("metadata_cbor")).alias("metadata_json")
    )
