"""Checkpoint queries — GET /checkpoints, GET /checkpoints/{slot}.

Reference: ``listCheckpointsDesc`` (log-spaced sample for chain-sync
intersection, ``SQLite.hs:722-733,1005-1010``), ``listAncestorsDesc``
(``SQLite.hs:735-739,1012-1017``), ``selectMaxCheckpoint``
(``SQLite.hs:1049-1051``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kupo_spark.chainspec import LONGEST_ROLLBACK
from kupo_spark.operators.indexer import Index


def sample_distances(k: int = LONGEST_ROLLBACK) -> list[int]:
    """Distances-from-tip sampled by listCheckpointsDesc — the reference's
    exact list (SQLite.hs:724-729)::

        points = [ 0, 10 .. k `div` 2^n ]
                 ++ [ k `div` (2^e) | e <- [ n-1, n-2 .. 0 ] ]
          where n = ceiling (log k)   -- natural log

    Duplicate *slots* are dropped downstream (nubOn checkpointSlotNo),
    matching ``list_checkpoints``' dropDuplicates."""
    import math

    n = math.ceil(math.log(k))
    dense = list(range(0, k // (2**n) + 1, 10))
    halvings = [k // (2**e) for e in range(n - 1, -1, -1)]
    return dense + halvings


def max_checkpoint(index: Index) -> DataFrame:
    """A3: the tip — MAX(slot_no) with its header hash."""
    return index.checkpoints.orderBy(F.col("slot_no").desc()).limit(1)


def list_checkpoints(index: Index, k: int = LONGEST_ROLLBACK) -> DataFrame:
    """O3: for each sampled distance d, the OLDEST checkpoint within that
    distance of the tip — ``slot_no >= tip - d ORDER BY slot_no ASC LIMIT 1``
    (SQLite.hs:1006-1010) — distinct on slot."""
    cps = index.checkpoints
    dists = sample_distances(k)
    spark = cps.sparkSession
    dist_df = spark.createDataFrame([(d,) for d in dists], "d LONG")
    tip = cps.agg(F.max("slot_no").alias("tip"))
    slots = (
        F.broadcast(dist_df)
        .crossJoin(F.broadcast(tip))
        .join(cps, cps.slot_no >= F.col("tip") - F.col("d"), "inner")
        .groupBy("d")
        .agg(F.min("slot_no").alias("slot_no"))
        .select("slot_no")
        .dropDuplicates(["slot_no"])
    )
    return slots.join(cps, "slot_no", "inner").select("slot_no", "header_hash")


def ancestors(index: Index, slot_no: int, n: int = 1) -> DataFrame:
    """O2 listAncestorsDesc: the n checkpoints strictly before `slot_no`."""
    return (
        index.checkpoints.where(F.col("slot_no") < F.lit(slot_no))
        .orderBy(F.col("slot_no").desc())
        .limit(n)
        .select("slot_no", "header_hash")
    )


def checkpoint_by_slot(index: Index, slot_no: int, strict: bool = True) -> DataFrame:
    """GET /checkpoints/{slot}: exact checkpoint, or with strict=False the
    latest checkpoint at-or-before the slot (Http.hs:547-581)."""
    if strict:
        return index.checkpoints.where(F.col("slot_no") == F.lit(slot_no))
    return (
        index.checkpoints.where(F.col("slot_no") <= F.lit(slot_no))
        .orderBy(F.col("slot_no").desc())
        .limit(1)
    )


def get_binary_data(index: Index, datum_hash: str) -> DataFrame:
    """O4 getBinaryData (SQLite.hs:751-756)."""
    return index.binary_data.where(F.col("binary_data_hash") == F.lit(datum_hash)).limit(1)


def get_script(index: Index, script_hash: str) -> DataFrame:
    """O4 getScript (SQLite.hs:772-777)."""
    return index.scripts.where(F.col("script_hash") == F.lit(script_hash)).limit(1)
