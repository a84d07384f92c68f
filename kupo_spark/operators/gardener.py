"""The gardener — kupo's periodic GC component (``src/Kupo/App.hs:633-674``):
prune spent inputs beyond the rollback horizon, GC orphan datum payloads,
optimize storage.  One pass = one call; scheduling is an ops concern."""

from __future__ import annotations

from kupo_spark.chainspec import LONGEST_ROLLBACK
from kupo_spark.operators.indexer import Index, write_index
from kupo_spark.operators.maintenance import prune_binary_data, prune_inputs


def run_gc(index: Index, k: int = LONGEST_ROLLBACK) -> Index:
    """M2 then M3 — the gardener's loop body (App.hs:666-674)."""
    return prune_binary_data(prune_inputs(index, k))


def optimize(index: Index, path: str, slot_bucket: int = 1000) -> None:
    """M6 `PRAGMA optimize` analog: rewrite the index with fresh partition
    layout + within-partition ordering (compaction / OPTIMIZE-ZORDER in a
    table-format deployment; also the `--defer-db-indexes` endgame — bulk
    ingest unsorted, then lay out once near the tip, SURVEY §4)."""
    write_index(index, path, slot_bucket=slot_bucket)
