"""Training-shard export — the last stage of a data pipeline: a
deterministic global shuffle of the curated corpus into fixed shard
files that a training job streams sequentially.

Shuffle key = md5(seed ‖ ':' ‖ doc_id): a cryptographic permutation of
the id space, so (a) the order is reproducible across runs, engines, and
retries — the same retry-stability contract as
:mod:`kupo_spark.functions.sampling` — and (b) consecutive shard rows
are an unbiased sample of the corpus (what SGD wants), no matter how the
source was ordered (by crawl, by domain, by time).  The seed is bound as
a literal COLUMN, never interpolated into SQL text (a quote in the seed
must stay data, not syntax — sampling.py's rule), and the ':' separator
keeps prefix-extending seeds ('1' vs '12') from colliding.

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

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from kupo_spark.functions.sampling import key_prefix_int, md5_key


def shard_key(seed: str = "") -> Column:
    """Deterministic shuffle key column: the sampling family's
    md5(seed:doc_id) — ONE derivation shared with
    :mod:`kupo_spark.functions.sampling`, so the quote-safety and
    prefix-seed rules live in one place."""
    return md5_key(seed)


def shard_of(key: Column, n_shards: int) -> Column:
    """Shard id from the key's 60-bit integer prefix (shared
    :func:`~kupo_spark.functions.sampling.key_prefix_int`)."""
    return F.pmod(key_prefix_int(key), F.lit(n_shards))


def assign_shards(docs: DataFrame, n_shards: int, seed: str = "") -> DataFrame:
    """(doc_id, shard, pos): shard = key mod n_shards, pos = the row's
    rank in the shard's key order.  The pos window partitions by shard —
    uniform by construction, so the window exchange is skew-free and each
    partition holds ~N/n_shards rows."""
    from pyspark.sql.window import Window

    keyed = docs.select(
        "doc_id", shard_key(seed).alias("k")
    ).withColumn("shard", shard_of(F.col("k"), n_shards))
    w = Window.partitionBy("shard").orderBy("k", "doc_id")
    return keyed.select(
        "doc_id", "shard", (F.row_number().over(w) - 1).cast("long").alias("pos")
    )


def assign_shards_sql(n_shards: int, seed: str = "") -> str:
    """DuckDB oracle for :func:`assign_shards` over the ``documents`` view
    — same md5(seed:doc_id) key, 60-bit prefix mod, and per-shard
    (key, doc_id) rank."""
    quoted = seed.replace("'", "''")
    key = f"md5('{quoted}' || ':' || CAST(doc_id AS VARCHAR))"
    return f"""
WITH keyed AS (
  SELECT doc_id, {key} AS k,
         CAST(('0x' || substr({key}, 1, 15)) AS BIGINT) % {n_shards} AS shard
  FROM documents
)
SELECT doc_id, shard,
       CAST(row_number() OVER (PARTITION BY shard ORDER BY k, doc_id) - 1 AS BIGINT)
         AS pos
FROM keyed
"""


def write_shards(
    docs: DataFrame, path: str, n_shards: int, seed: str = ""
) -> DataFrame:
    """Write the corpus as ``path/shard=S/`` parquet, rows of each shard
    in shuffled (key) order — one hash exchange + sortWithinPartitions,
    no global sort.  Returns (shard, n_rows) for the manifest."""
    keyed = docs.withColumn("k", shard_key(seed)).withColumn(
        "shard", shard_of(F.col("k"), n_shards)
    )
    (
        keyed.repartition(n_shards, "shard")
        .sortWithinPartitions("shard", "k", "doc_id")
        # the key is pipeline-internal — don't bill every downstream
        # training reader 32 bytes/row for it (the projection after the
        # sort preserves in-partition order)
        .drop("k")
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
