"""Warm serving path — a long-lived query session over a resident index.

Kupo's sub-millisecond point lookups come from a warm SQLite B-tree inside
one process; a Spark job launched per query pays a fixed scheduling +
planning floor instead (~hundreds of ms cold).  The serving analog on Spark
is a **long-lived session holding the index hot**:

* the inputs table is pre-joined ONCE with the checkpoints dimension
  (J1/J2 — so no per-query broadcast), then
* range-partitioned and sorted in chain order (O1: created_at,
  transaction_index, output_index — all descending), and
* persisted in executor memory.

A point query is then *filter → project → collect* over the cached
segments: no shuffle, no sort, no join — the chain order survives because
``where``/``select`` are narrow transformations that preserve per-partition
row order, and ``collect`` concatenates partitions in partition order,
which the range partitioner made globally descending.  This is the same
layout a 1000-executor deployment would serve from (sorted segment files,
pruned by the range metadata); at 100 TB the segments live on many
executors and the filter fans out, but the per-query plan is unchanged.

``fold_inputs`` detects the pre-resolved view (header-hash columns already
present) and skips its checkpoint joins, so ALL fold semantics — patterns,
status flags, slot ranges, residual filters — run unmodified against the
hot view; results are bit-identical to the cold path (pinned by tests).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kupo_spark.operators.fold_inputs import fold_inputs
from kupo_spark.operators.indexer import Index

CHAIN_ORDER_KEYS = ("created_at", "transaction_index", "output_index")


class Serving:
    PLAN_CACHE_SIZE = 256

    def __init__(self, index: Index, partitions: int = 8):
        self._plan_cache: dict = {}
        cps = index.checkpoints
        created = F.broadcast(
            cps.select(
                F.col("slot_no").alias("_c_slot"),
                F.col("header_hash").alias("created_header_hash"),
            )
        )
        spent = F.broadcast(
            cps.select(
                F.col("slot_no").alias("_s_slot"),
                F.col("header_hash").alias("spent_header_hash"),
            )
        )
        inputs = index.inputs
        inputs = inputs.join(created, inputs.created_at == created._c_slot, "inner").drop(
            "_c_slot"
        )
        inputs = inputs.join(spent, inputs.spent_at == spent._s_slot, "left").drop(
            "_s_slot"
        )
        order = [F.col(k).desc() for k in CHAIN_ORDER_KEYS]
        self._view = (
            inputs.repartitionByRange(partitions, *order)
            .sortWithinPartitions(*order)
            .persist()
        )
        self.index = Index(
            inputs=self._view,
            checkpoints=index.checkpoints.coalesce(1).persist(),
            policies=index.policies.repartition(partitions).persist(),
            assets=index.assets,
            binary_data=index.binary_data.coalesce(4).persist(),
            scripts=index.scripts.coalesce(1).persist(),
            slot_bucket=index.slot_bucket,
        )
        self._hot = [
            self._view,
            self.index.checkpoints,
            self.index.policies,
            self.index.binary_data,
            self.index.scripts,
        ]

    def warm(self) -> "Serving":
        """Materialize every cached table (first query pays nothing)."""
        for df in self._hot:
            df.count()
        return self

    def fold(self, pattern="*", use_plan_cache: bool = True, **kwargs) -> DataFrame:
        """fold_inputs over the hot view.  Output arrives in chain order
        (most recent first) WITHOUT a sort step — the storage order is the
        query order, as in kupo's index traversal (SQLite.hs:948-969).

        Repeated query shapes reuse their analyzed/optimized plan via a
        small cache — the analog of kupo preparing its SQL statements once
        (SQLite.hs:919-1003 are compiled per connection, not per request);
        without it every request pays ~60 ms of Catalyst on this box."""
        kwargs.setdefault("sorted_result", False)
        if not use_plan_cache:
            return fold_inputs(self.index, pattern, **kwargs)
        key = (str(pattern), tuple(sorted(kwargs.items())))
        df = self._plan_cache.get(key)
        if df is None:
            df = fold_inputs(self.index, pattern, **kwargs)
            if len(self._plan_cache) >= self.PLAN_CACHE_SIZE:
                self._plan_cache.pop(next(iter(self._plan_cache)))
            self._plan_cache[key] = df
        return df

    def fold_rows(self, pattern="*", order: str = "most_recent_first", **kwargs):
        """Collect a fold in the requested chain order (O1).  The view is
        stored most-recent-first; oldest-first is a driver-side reversal of
        the collected page."""
        rows = self.fold(pattern, **kwargs).collect()
        return rows if order == "most_recent_first" else rows[::-1]

    def close(self) -> None:
        for df in self._hot:
            df.unpersist()
