"""JSON block source — the Ogmios/Hydra transport analog (S2/S3).

Reference: kupo's Ogmios client consumes chain-sync results as JSON over a
WebSocket and decodes them into PartialBlock (``src/Kupo/App/ChainSync/
Ogmios.hs:48-75``, decoders ``src/Kupo/Data/Ogmios.hs``).  The Spark-native
equivalent: a JSON-lines stream parsed with ``from_json`` against an explicit
schema — usable both batch (``spark.read``) and streaming
(``spark.readStream``), websocket delivery being an ingestion-infra concern
upstream of the engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("output_index", T.IntegerType()),
        T.StructField("address", T.StringType()),
        T.StructField("coins", T.LongType()),
        T.StructField(
            "assets", T.MapType(T.StringType(), T.MapType(T.StringType(), T.LongType()))
        ),
        T.StructField("datum_kind", T.StringType()),
        T.StructField("datum_hash", T.StringType()),
        T.StructField("datum_cbor", T.StringType()),
        T.StructField("script_hash", T.StringType()),
        T.StructField("script_cbor", T.StringType()),
    ]
)

BLOCK_SCHEMA = T.StructType(
    [
        T.StructField("slot_no", T.LongType()),
        T.StructField("header_hash", T.StringType()),
        T.StructField("transaction_index", T.IntegerType()),
        T.StructField("transaction_id", T.StringType()),
        T.StructField("inputs", T.ArrayType(T.StringType())),
        T.StructField("outputs", T.ArrayType(OUTPUT_SCHEMA)),
        # JSON object keys are strings; re-keyed to INT after decode
        T.StructField(
            "spend_redeemers", T.MapType(T.StringType(), T.StringType())
        ),
        T.StructField("metadata_tags", T.ArrayType(T.LongType())),
        T.StructField("metadata_cbor", T.StringType()),
    ]
)


def blocks_to_jsonl(blocks: DataFrame) -> DataFrame:
    """Serialize a blocks frame to one JSON document per transaction (the
    wire shape a JSON transport would deliver)."""
    return blocks.select(F.to_json(F.struct(*blocks.columns)).alias("value"))


def blocks_from_json(df: DataFrame) -> DataFrame:
    """Decode a DataFrame with a JSON `value` column into the blocks shape.
    Works on batch and streaming inputs alike."""
    decoded = df.select(F.from_json("value", BLOCK_SCHEMA).alias("b")).select("b.*")
    # malformed lines decode to all-null structs — quarantine them rather
    # than letting null transactions flow into the indexer (the PERMISSIVE-
    # mode corrupt-record policy; an Ogmios decode failure is fatal in the
    # reference, but a distributed backfill wants skip-and-count semantics)
    decoded = decoded.where(
        F.col("transaction_id").isNotNull() & F.col("slot_no").isNotNull()
    )
    return decoded.withColumn(
        "spend_redeemers",
        F.expr("transform_keys(spend_redeemers, (k, v) -> cast(k as int))"),
    )


def read_jsonl_blocks(spark: SparkSession, path: str) -> DataFrame:
    return blocks_from_json(spark.read.text(path))


def stream_jsonl_blocks(spark: SparkSession, path: str) -> DataFrame:
    return blocks_from_json(spark.readStream.text(path))
