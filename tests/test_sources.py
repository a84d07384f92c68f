"""JSON block-source roundtrip (S2/S3 transport analog) and gardener."""

from __future__ import annotations

from pyspark.sql import functions as F

from kupo_spark.operators.gardener import run_gc
from kupo_spark.operators.indexer import build_index
from kupo_spark.sources.json_blocks import blocks_from_json, blocks_to_jsonl, read_jsonl_blocks


def test_json_roundtrip_preserves_blocks(spark, blocks, tmp_path):
    path = str(tmp_path / "blocks.jsonl")
    blocks_to_jsonl(blocks).write.mode("overwrite").text(path)
    back = read_jsonl_blocks(spark, path)
    # same names/types (JSON decode loosens nullability flags)
    assert [(f.name, f.dataType.simpleString()) for f in back.schema.fields] == [
        (f.name, f.dataType.simpleString()) for f in blocks.schema.fields
    ]
    # index built from the JSON transport equals the native one
    a = build_index(back).inputs
    b = build_index(blocks).inputs
    cols = ["output_reference", "address", "coins", "created_at", "spent_at", "spent_with"]
    assert {tuple(r) for r in a.select(cols).collect()} == {
        tuple(r) for r in b.select(cols).collect()
    }


def test_json_decode_is_streaming_compatible(spark, blocks, tmp_path):
    path = str(tmp_path / "blocks2.jsonl")
    blocks_to_jsonl(blocks).write.mode("overwrite").text(path)
    stream = blocks_from_json(spark.readStream.text(path))
    assert stream.isStreaming
    assert [(f.name, f.dataType.simpleString()) for f in stream.schema.fields] == [
        (f.name, f.dataType.simpleString()) for f in blocks.schema.fields
    ]


def test_gardener_gc(index):
    gc = run_gc(index, k=10)
    tip = index.checkpoints.agg(F.max("slot_no")).collect()[0][0]
    assert gc.inputs.where(F.col("spent_at") < tip - 10).count() == 0
    # orphan payloads gone
    refs = gc.inputs.where(F.col("datum_hash").isNotNull()).select(
        F.col("datum_hash").alias("binary_data_hash")
    )
    assert gc.binary_data.join(refs, "binary_data_hash", "left_anti").count() == 0
