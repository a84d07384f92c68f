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


def evict_stale(cache: dict, ctx_id: int) -> None:
    """Drop every cache entry belonging to a different SparkContext.

    Caches here are keyed by ``(id(sparkContext), ...)``; in a long-lived
    service that restarts its session, entries for dead contexts would
    otherwise accumulate forever (and a recycled ``id()`` could even alias a
    new context onto stale plans).  One active context per process is the
    Spark model, so on first touch from a context we clear the rest.
    """
    for key in [k for k in cache if k[0] != ctx_id]:
        val = cache.pop(key)
        vals = val if isinstance(val, tuple) else (val,)
        for v in vals:
            try:  # unpersist is best-effort: the owning context may be gone
                v.unpersist()
            except Exception:  # noqa: BLE001
                pass


def get_blocks_and_index(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, Index]:
    ctx_id = id(spark.sparkContext)
    evict_stale(_CACHE, ctx_id)
    key = (ctx_id, sf_dir.rstrip("/"))
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
