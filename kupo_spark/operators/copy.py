"""copyDatabase (W8) and read-only replica (S7) analogs.

Reference: ``copyDatabase`` streams an existing index through a pattern set
into a fresh database (``SQLite.hs:476-576``; producer/consumer queue of 10k
rows + VACUUM).  In Spark this is a trivially parallel filtered re-write —
scan with the compiled pattern predicate pushed down, write a fresh
partitioned index.  The replica (``src/Kupo/App.hs:594-610``) is any other
SparkSession reading the same materialized index — MVCC comes from immutable
parquet snapshots (Delta/Iceberg versions in production).
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from kupo_spark.operators.indexer import Index, read_index, write_index
from kupo_spark.patterns import any_to_column, pattern_from_text


def copy_index(index: Index, patterns, dest: str, slot_bucket: int = 1000) -> None:
    """Filter every table through the pattern set and write a fresh index."""
    pats = [pattern_from_text(p) if isinstance(p, str) else p for p in patterns]
    inputs = index.inputs.where(any_to_column(pats))
    surviving = inputs.select("output_reference")
    filtered = Index(
        inputs=inputs,
        checkpoints=index.checkpoints,
        policies=index.policies.join(surviving, "output_reference", "left_semi"),
        assets=index.assets.join(surviving, "output_reference", "left_semi"),
        # dictionary GC: only payloads still referenced (the copy runs the
        # equivalent of pruneBinaryData on the way out)
        binary_data=index.binary_data.join(
            inputs.where(F.col("datum_hash").isNotNull()).select(
                F.col("datum_hash").alias("binary_data_hash")
            ),
            "binary_data_hash",
            "left_semi",
        ),
        scripts=index.scripts.join(
            inputs.where(F.col("script_hash").isNotNull()).select("script_hash"),
            "script_hash",
            "left_semi",
        ),
    )
    write_index(filtered, dest, slot_bucket=slot_bucket)


def open_replica(spark: SparkSession, path: str, slot_bucket: int = 1000) -> Index:
    """S7: a read-only consumer over an index another writer maintains."""
    return read_index(spark, path, slot_bucket=slot_bucket)
