"""SparkSession factory tuned for the local[32] test box but configured the
way we'd configure a 1000-executor cluster job: AQE on (runtime re-planning,
skew-join splitting, partition coalescing), UTC session time, Arrow-batched
Python exchange, shuffle partitions sized to cores rather than the 200
default.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "kupo-spark", cpus: str | None = None) -> SparkSession:
    cpus = cpus or os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(max(int(cpus), 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # size partitions by bytes, not core count: a 10 MB shuffle collapses
        # to one task instead of 32 (local task dispatch is ~20 ms/task,
        # serialized), while a 100 TB shuffle still gets advisory-size splits
        .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
        # let AQE re-partition cached plans too — the dedup/ANN pipelines
        # persist small intermediates whose inherited 32-way partitioning
        # otherwise taxes every downstream stage
        .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # driver-generated parquet uses TIMESTAMP(NANOS); map to LONG
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def tune_session(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable configs to an externally provided session
    (the driver hands us its own SparkSession)."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
    spark.conf.set("spark.sql.shuffle.partitions", "32")
    try:
        spark.conf.set(
            "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true"
        )
    except Exception:  # noqa: BLE001 - static on some builds
        pass
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except Exception:  # noqa: BLE001 - static conf on some builds; builder sets it
        pass
    return spark
