"""Serving-layer result rendering + health — the HTTP surface's data plane.

C7: JSON rendering field-exact to ``resultToJson``
(``src/Kupo/Data/Pattern.hs:447-521``): `transaction_index, transaction_id,
output_index, address, value{coins, assets}, datum_hash, datum_type,
script_hash, created_at{slot_no, header_hash}, spent_at{slot_no,
header_hash, transaction_id, input_index, redeemer}`.  Value's assets render
as dotted ``policy.asset`` keys (``Value.hs:60-99``).

Rendering happens JVM-side with ``to_json`` over a named_struct — the
response stream is a column, producible at full scan parallelism (kupo
streams rows one-at-a-time through a single Warp worker; we emit the same
payloads as a distributed column and let the HTTP tier iterate
``toLocalIterator``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from kupo_spark.operators.fold_inputs import fold_inputs
from kupo_spark.operators.indexer import Index


def _value_struct() -> Column:
    # MAP<policy, MAP<asset, qty>> → MAP<'policy.asset', qty> dotted keys
    dotted = F.expr(
        """
        map_from_entries(
          flatten(transform(map_entries(assets),
            p -> transform(map_entries(p.value),
              a -> struct(concat(p.key, '.', a.key) AS key, a.value AS value)))))
        """
    )
    return F.struct(F.col("coins").alias("coins"), dotted.alias("assets"))


def result_json(index: Index, pattern="*", **fold_kwargs) -> DataFrame:
    """(output_reference, result) where result is the resultToJson-shaped
    JSON payload for GET /matches."""
    rows = fold_inputs(index, pattern, **fold_kwargs)
    # re-attach assets + datum_kind for rendering (fold's result projection
    # mirrors kupo's row; the JSON adds the value map and datum_type)
    extra = index.inputs.select("output_reference", "assets", "datum_kind")
    df = rows.join(extra, "output_reference", "inner")
    payload = F.struct(
        F.col("transaction_index"),
        F.col("transaction_id"),
        F.col("output_index"),
        F.col("address"),
        _value_struct().alias("value"),
        F.col("datum_hash"),
        F.when(F.col("datum_kind") == "inline", F.lit("inline"))
        .when(F.col("datum_kind") == "reference", F.lit("hash"))
        .alias("datum_type"),
        F.col("script_hash"),
        F.struct(
            F.col("created_at").alias("slot_no"),
            F.col("created_header_hash").alias("header_hash"),
        ).alias("created_at"),
        F.when(
            F.col("spent_at").isNotNull(),
            F.struct(
                F.col("spent_at").alias("slot_no"),
                F.col("spent_header_hash").alias("header_hash"),
                F.col("spent_by").alias("transaction_id"),
                F.col("spent_input_index").alias("input_index"),
                F.col("spent_with").alias("redeemer"),
            ),
        ).alias("spent_at"),
    )
    return df.select(
        "output_reference", F.to_json(payload, {"ignoreNullFields": "false"}).alias("result")
    )


def metrics_text(index: Index) -> str:
    """GET /metrics — Prometheus exposition rendering of the health gauges
    (reference ``src/Kupo/Data/Health.hs:251+``).  Driver-side formatting of
    a 1-row aggregate."""
    row = health(index).collect()[0]
    lines = []
    for name, value in [
        ("kupo_most_recent_checkpoint", row["most_recent_checkpoint"]),
        ("kupo_checkpoints", row["n_checkpoints"]),
        ("kupo_inputs", row["n_inputs"]),
        ("kupo_unspent_inputs", row["n_unspent"]),
    ]:
        lines.append(f"# TYPE {name} gauge")
        lines.append(f"{name} {value}")
    return "\n".join(lines) + "\n"


def health(index: Index) -> DataFrame:
    """GET /health (Http.hs:488-540): most recent checkpoint + counts —
    the sync-progress signal."""
    cp = index.checkpoints.agg(
        F.max("slot_no").alias("most_recent_checkpoint"),
        F.count("*").alias("n_checkpoints"),
    )
    counts = index.inputs.agg(
        F.count("*").alias("n_inputs"),
        F.sum(F.when(F.col("spent_at").isNull(), 1).otherwise(0)).alias("n_unspent"),
    )
    return cp.crossJoin(counts)
