"""Per-session cache of built indexes, keyed by sf_dir.

The driver calls every declared query independently; building the index is a
shared prefix, so we build once per (session, sf_dir) and persist the six
DataFrames (MEMORY_AND_DISK) — the analog of kupo's long-lived database.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from kupo_spark.chaingen import load_blocks
from kupo_spark.operators.indexer import Index, build_index
from kupo_spark.session import tune_session

_CACHE: dict[tuple[int, str], tuple[DataFrame, Index]] = {}


def get_blocks_and_index(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, Index]:
    key = (id(spark.sparkContext), sf_dir.rstrip("/"))
    hit = _CACHE.get(key)
    if hit is not None:
        return hit
    tune_session(spark)
    blocks = load_blocks(spark, sf_dir).persist()
    index = build_index(blocks, patterns=("*",)).persist()
    index.inputs.count()  # materialize the one shuffle once
    _CACHE[key] = (blocks, index)
    return blocks, index


def get_index(spark: SparkSession, sf_dir: str) -> Index:
    return get_blocks_and_index(spark, sf_dir)[1]


def get_blocks(spark: SparkSession, sf_dir: str) -> DataFrame:
    return get_blocks_and_index(spark, sf_dir)[0]
