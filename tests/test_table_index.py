"""IndexDB — atomic whole-index commits over the ACID table layer, and its
integration as the streaming indexer's compacted base."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from kupo_spark.operators.indexer import build_index
from kupo_spark.operators.table_index import DB_TABLES, IndexDB


@pytest.fixture(scope="module")
def small_blocks(blocks):
    return blocks.where(F.col("slot_no") < 60)


def _commit(db, spark, blk, slot_cap):
    return db.commit(build_index(blk.where(F.col("slot_no") < slot_cap)), slot_bucket=50)


def test_commit_read_roundtrip(spark, small_blocks, tmp_path):
    db = IndexDB(str(tmp_path / "db"))
    ix = build_index(small_blocks)
    db.commit(ix, slot_bucket=50)
    got = db.read(spark)
    assert got.inputs.count() == ix.inputs.count()
    assert got.checkpoints.count() == ix.checkpoints.count()
    assert got.slot_bucket == 50
    # layout parity with write_index: partition column + denormalized J1/J2
    assert "created_bucket" in got.inputs.columns
    assert "created_header_hash" in got.inputs.columns


def test_whole_db_snapshot_isolation_and_time_travel(spark, small_blocks, tmp_path):
    db = IndexDB(str(tmp_path / "db"))
    v1 = _commit(db, spark, small_blocks, 30)
    old = db.read(spark)  # resolved at v1
    old_inputs, old_cp = old.inputs.count(), old.checkpoints.count()
    v2 = _commit(db, spark, small_blocks, 60)
    # the pinned reader still sees v1's state for EVERY table
    assert old.inputs.count() == old_inputs
    assert old.checkpoints.count() == old_cp
    new = db.read(spark)
    assert new.inputs.count() > old_inputs
    # explicit time travel
    assert db.read(spark, db_version=v1).inputs.count() == old_inputs
    assert db.read(spark, db_version=v2).inputs.count() == new.inputs.count()


def test_crashed_commit_leaves_catalog_consistent(spark, small_blocks, tmp_path):
    db = IndexDB(str(tmp_path / "db"))
    _commit(db, spark, small_blocks, 30)
    good = db.entry()
    # simulate a crash after the table overwrites but before the catalog
    # publish: run a full commit, then delete its catalog entry
    v2 = _commit(db, spark, small_blocks, 60)
    (db.catalog / f"{v2:020d}.json").unlink()
    assert db.latest_version() == 0
    assert db.entry() == good  # readers still get the old pinned state
    got = db.read(spark)
    assert got.inputs.count() == db.read(spark, db_version=0).inputs.count()
    # the next commit supersedes the residue
    v3 = _commit(db, spark, small_blocks, 60)
    assert db.read(spark, db_version=v3).inputs.count() > got.inputs.count()


def test_catalog_aware_vacuum(spark, small_blocks, tmp_path):
    db = IndexDB(str(tmp_path / "db"))
    v1 = _commit(db, spark, small_blocks, 30)
    v2 = _commit(db, spark, small_blocks, 60)
    n2 = db.read(spark, db_version=v2).inputs.count()
    deleted = db.vacuum(keep_entries=1, retention_seconds=0.0)
    assert deleted  # v1's exclusive files collected
    assert db.read(spark).inputs.count() == n2  # current state intact
    with pytest.raises(Exception):
        db.entry(v1)  # expired catalog entry dropped


def test_vacuum_collects_crashed_overwrite_residue(spark, small_blocks, tmp_path):
    """A crashed overwrite can be a sub-table's *latest* Table version while
    no catalog entry references it — the catalog-aware vacuum must collect
    it (plain Table.vacuum would protect it)."""
    db = IndexDB(str(tmp_path / "db"))
    _commit(db, spark, small_blocks, 60)
    v2 = _commit(db, spark, small_blocks, 30)
    (db.catalog / f"{v2:020d}.json").unlink()  # crash before publish
    live_count = db.read(spark).inputs.count()
    deleted = db.vacuum(keep_entries=1, retention_seconds=0.0)
    assert deleted  # the unreferenced overwrite's files went away
    assert db.read(spark).inputs.count() == live_count


def test_catalog_entry_records_metadata(spark, small_blocks, tmp_path):
    db = IndexDB(str(tmp_path / "db"))
    db.commit(build_index(small_blocks), slot_bucket=50, extra={"seq": 7})
    e = db.entry()
    assert e["seq"] == 7
    assert e["slot_bucket"] == 50
    assert set(e["tables"]) == {name for name, _ in DB_TABLES}
    raw = json.loads(
        (db.catalog / f"{db.latest_version():020d}.json").read_text()
    )
    assert raw == e
