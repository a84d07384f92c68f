"""Training-shard export — the last stage of a data pipeline: a
deterministic global shuffle of the curated corpus into fixed shard
files that a training job streams sequentially.

Shuffle key = md5(seed ‖ doc_id): a cryptographic permutation of the id
space, so (a) the order is reproducible across runs, engines, and
retries — the same retry-stability contract as
:mod:`kupo_spark.functions.sampling` — and (b) consecutive shard rows
are an unbiased sample of the corpus (what SGD wants), no matter how the
source was ordered (by crawl, by domain, by time).

Sharding is hash-mod on the same key: statistically balanced
(binomial around N/n), deterministic, and embarrassingly parallel — no
global sort, no sampling-dependent range boundaries.  At 100 TB the
whole export is ONE hash exchange on the shard id plus a
sort-within-partition; the alternative (row_number over a global order
for exactly-equal shards) needs a total order and is deliberately not
the default.

Reference analog: none — kupo has no export surface; extends the
LLM-data-pipeline family (SURVEY.md §2, pipeline operators).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def shard_key_expr(seed: str = "") -> str:
    """Deterministic shuffle key: md5 over seed + doc id rendered in
    decimal (engine-portable)."""
    return f"md5(concat('{seed}', cast(doc_id as string)))"


def assign_shards(docs: DataFrame, n_shards: int, seed: str = "") -> DataFrame:
    """(doc_id, shard, pos): shard = key mod n_shards, pos = the row's
    rank in the shard's key order.  The pos window partitions by shard —
    uniform by construction, so the window exchange is skew-free and each
    partition holds ~N/n_shards rows."""
    from pyspark.sql.window import Window

    key = shard_key_expr(seed)
    keyed = docs.select(
        "doc_id",
        F.expr(key).alias("k"),
        F.expr(
            f"pmod(cast(conv(substr({key}, 1, 15), 16, 10) as bigint), {n_shards})"
        ).alias("shard"),
    )
    w = Window.partitionBy("shard").orderBy("k", "doc_id")
    return keyed.select(
        "doc_id", "shard", (F.row_number().over(w) - 1).cast("long").alias("pos")
    )


def write_shards(
    docs: DataFrame, path: str, n_shards: int, seed: str = ""
) -> DataFrame:
    """Write the corpus as ``path/shard=S/`` parquet, rows of each shard
    in shuffled (key) order — one hash exchange + sortWithinPartitions,
    no global sort.  Returns (shard, n_rows) for the manifest."""
    keyed = docs.withColumn("k", F.expr(shard_key_expr(seed))).withColumn(
        "shard",
        F.expr(
            f"pmod(cast(conv(substr({shard_key_expr(seed)}, 1, 15), 16, 10) as bigint),"
            f" {n_shards})"
        ),
    )
    (
        keyed.repartition(n_shards, "shard")
        .sortWithinPartitions("shard", "k", "doc_id")
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(path)
    )
    spark = docs.sparkSession
    return (
        spark.read.parquet(path)
        .groupBy("shard")
        .agg(F.count("*").alias("n_rows"))
    )
