"""Bucketed co-located spent-resolution — the 100 TB layout for the one
big-big join in the engine.

At scale, `produced` and `spends` are both written bucketed+sorted by
``output_reference``; the resolution join then needs NO shuffle on either
side (bucket-pruned, co-located).  This module demonstrates/encodes that
layout with Spark's native bucketed tables; a plan test asserts the join
runs without an Exchange.  (kupo's analog is its primary-key B-tree: the
UPDATE joins on the PK index — our bucketing is the same idea for a
distributed store.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from kupo_spark.operators.indexer import exploded_outputs, spent_refs


def _drop_table(spark: SparkSession, name: str) -> None:
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    # a catalog-less restart can leave the managed location behind
    warehouse = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    import shutil

    shutil.rmtree(f"{warehouse.removeprefix('file:')}/{name.lower()}", ignore_errors=True)


def write_bucketed_pair(
    blocks: DataFrame, prefix: str, buckets: int = 32
) -> None:
    """Write produced/spends as bucketed+sorted tables keyed on
    output_reference."""
    spark = blocks.sparkSession
    _drop_table(spark, f"{prefix}_produced")
    _drop_table(spark, f"{prefix}_spends")
    produced = exploded_outputs(blocks).drop("metadata_tags")
    (
        produced.write.mode("overwrite")
        .bucketBy(buckets, "output_reference")
        .sortBy("output_reference")
        .saveAsTable(f"{prefix}_produced")
    )
    (
        spent_refs(blocks)
        .withColumnRenamed("spent_ref", "output_reference")
        .write.mode("overwrite")
        .bucketBy(buckets, "output_reference")
        .sortBy("output_reference")
        .saveAsTable(f"{prefix}_spends")
    )


def bucketed_resolve(spark: SparkSession, prefix: str) -> DataFrame:
    """The markInputs join over co-located buckets — shuffle-free."""
    produced = spark.table(f"{prefix}_produced")
    spends = spark.table(f"{prefix}_spends")
    return produced.join(spends, "output_reference", "left")
