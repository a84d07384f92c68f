"""ACID transaction-log table format (kupo_spark/table.py).

Covers the Delta-model guarantees the round-2 verdict asked for: atomic
commits, snapshot isolation, time travel, optimistic concurrency with
conflict detection, OPTIMIZE compaction that preserves history, RESTORE,
VACUUM of both removed files and crashed-writer orphans, checkpointed log
recovery, and log-level data skipping."""

from __future__ import annotations

import json
import time

import pytest
from pyspark.sql import functions as F

from kupo_spark.table import (
    ConcurrentDeleteError,
    ConcurrentWriteError,
    Table,
    _stats_of,
    _Tx,
)


def _df(spark, lo, hi, label="x"):
    return spark.range(lo, hi).select(
        F.col("id"), F.lit(label).alias("label"), (F.col("id") % 4).alias("bucket")
    )


@pytest.fixture()
def table(spark, tmp_path):
    root = str(tmp_path / "t")
    return Table.create(root, _df(spark, 0, 1).schema)


def test_append_read_roundtrip(spark, table):
    table.append(_df(spark, 0, 100))
    table.append(_df(spark, 100, 150))
    got = table.read(spark)
    assert got.count() == 150
    assert got.agg(F.sum("id")).collect()[0][0] == sum(range(150))
    assert [f.name for f in got.schema.fields] == ["id", "label", "bucket"]


def test_snapshot_isolation_and_time_travel(spark, table):
    v1 = table.append(_df(spark, 0, 10))
    pinned = table.read(spark, version=v1)  # plan resolved at v1
    t_mid = time.time()
    v2 = table.append(_df(spark, 10, 30))
    assert pinned.count() == 10  # later commit invisible to the pinned plan
    assert table.read(spark, version=v1).count() == 10
    assert table.read(spark, version=v2).count() == 30
    assert table.read(spark, timestamp=t_mid).count() == 10
    hist = table.history()
    assert [h["operation"] for h in hist] == ["APPEND", "APPEND", "CREATE"]


def test_partitioned_writes_and_pruning(spark, tmp_path):
    t = Table.create(
        str(tmp_path / "p"), _df(spark, 0, 1).schema, partition_by=["bucket"]
    )
    t.append(_df(spark, 0, 400))
    snap = t.snapshot()
    assert all(a["partitionValues"].get("bucket") is not None for a in snap.files)
    got = t.read(spark)
    assert got.where(F.col("bucket") == 2).count() == 100
    # partition-dir inference widened bucket to long; read() restores the
    # committed type
    assert dict(got.dtypes)["bucket"] == "bigint"


def test_overwrite_replaces_everything(spark, table):
    table.append(_df(spark, 0, 50))
    v_old = table.append(_df(spark, 50, 60))
    table.overwrite(_df(spark, 1000, 1010))
    got = table.read(spark)
    assert got.count() == 10
    assert got.agg(F.min("id")).collect()[0][0] == 1000
    assert table.read(spark, version=v_old).count() == 60  # history intact


def test_delete_where_rewrites_only_hit_files(spark, table):
    table.append(_df(spark, 0, 100, label="a"))
    v2 = table.append(_df(spark, 100, 200, label="b"))
    before = table.snapshot()
    untouched = {
        a["path"] for a in before.files
        if _stats_of(a)["minValues"]["id"] >= 100
    }
    table.delete_where(spark, "id < 10")
    after = table.snapshot()
    assert table.read(spark).count() == 190
    assert table.read(spark).agg(F.min("id")).collect()[0][0] == 10
    # files that couldn't contain id<10 were not rewritten
    assert untouched <= set(after.adds)
    # and the pre-delete snapshot still reads in full
    assert table.read(spark, version=v2).count() == 200


def test_delete_where_null_predicate_rows_survive(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, "a"), (2, None), (3, "b")], "id bigint, tag string"
    )
    t = Table.create(str(tmp_path / "n"), df.schema)
    t.append(df)
    t.delete_where(spark, "tag = 'a'")  # NULL tag row must survive
    assert sorted(r["id"] for r in t.read(spark).collect()) == [2, 3]


def test_optimize_compacts_but_preserves_history(spark, table):
    for i in range(6):
        table.append(_df(spark, i * 10, i * 10 + 10))
    v_before = table.snapshot().version
    n_before = len(table.snapshot().files)
    table.optimize(spark)
    snap = table.snapshot()
    assert len(snap.files) < n_before
    assert all(a["dataChange"] is False for a in snap.files if "part-" in a["path"])
    assert table.read(spark).count() == 60
    # the pre-OPTIMIZE version still resolves to the old (uncompacted) files
    assert table.read(spark, version=v_before).count() == 60
    assert len(table.snapshot(v_before).files) == n_before


def test_restore_is_a_new_commit(spark, table):
    v1 = table.append(_df(spark, 0, 10))
    table.append(_df(spark, 10, 20))
    table.overwrite(_df(spark, 99, 100))
    v_restore = table.restore(v1)
    assert table.read(spark).count() == 10
    assert table.read(spark).agg(F.max("id")).collect()[0][0] == 9
    hist = table.history()
    assert hist[0]["operation"] == "RESTORE" and hist[0]["version"] == v_restore
    # restore the restore away
    table.restore(v_restore - 1)
    assert table.read(spark).count() == 1


def test_crashed_writer_is_invisible_and_vacuumable(spark, table):
    table.append(_df(spark, 0, 10))
    # a writer stages data files then dies before committing
    table._stage(_df(spark, 1000, 2000), [])
    assert table.read(spark).count() == 10  # orphans invisible
    removed = table.vacuum(retention_seconds=0.0)
    assert removed  # orphans collected
    assert table.read(spark).count() == 10  # live files untouched


def test_vacuum_respects_retention_then_collects(spark, table):
    table.append(_df(spark, 0, 10))
    v1 = table.snapshot().version
    table.overwrite(_df(spark, 10, 20))
    assert table.vacuum(retention_seconds=3600) == []  # too young
    assert table.read(spark, version=v1).count() == 10  # time travel alive
    removed = table.vacuum(retention_seconds=0.0)
    assert removed
    # time travel past the vacuum horizon is gone — vacuum's contract
    with pytest.raises(Exception):
        table.read(spark, version=v1).count()


def test_concurrent_append_rebases(spark, table):
    v0 = table.append(_df(spark, 0, 10))
    adds = table._stage(_df(spark, 10, 20), [])
    # a racing writer claims the version our transaction wants
    table.append(_df(spark, 100, 110))
    v = table._commit_tx(_Tx("APPEND", adds=adds, read_version=v0))
    assert v == table.latest_version()
    assert table.read(spark).count() == 30  # both writers' rows present


def test_concurrent_overwrite_conflicts(spark, table):
    snap_v = table.append(_df(spark, 0, 10))
    adds = table._stage(_df(spark, 50, 60), [])
    removes = sorted(table.snapshot().adds)
    table.append(_df(spark, 100, 110))  # concurrent data change
    with pytest.raises(ConcurrentWriteError):
        table._commit_tx(
            _Tx(
                "OVERWRITE",
                adds=adds,
                removes=removes,
                read_version=snap_v,
                reads_whole_table=True,
            )
        )


def test_concurrent_delete_conflicts(spark, table):
    table.append(_df(spark, 0, 10))
    snap = table.snapshot()
    victim = sorted(snap.adds)[0]
    # our tx plans to rewrite `victim`; a racing OPTIMIZE removes it first
    table.optimize(spark, max_file_bytes=1 << 30)
    if victim not in table.snapshot().adds:  # optimize removed it
        with pytest.raises(ConcurrentDeleteError):
            table._commit_tx(
                _Tx(
                    "DELETE",
                    adds=[],
                    removes=[victim],
                    read_version=snap.version,
                )
            )


def test_checkpoint_recovery_matches_full_replay(spark, table):
    for i in range(13):  # crosses the interval-10 checkpoint boundary
        table.append(_df(spark, i, i + 1))
    ckpts = list(table.log.glob("*.checkpoint.json"))
    assert ckpts, "expected a checkpoint after >10 commits"
    hint = json.loads((table.log / "_checkpoint_hint").read_text())
    snap_fast = table.snapshot()  # uses checkpoint + tail
    assert hint["version"] <= snap_fast.version
    # force full replay by hiding the checkpoints; state must be identical
    for p in ckpts:
        p.rename(p.with_suffix(".hidden"))
    (table.log / "_checkpoint_hint").unlink()
    snap_slow = Table(str(table.root)).snapshot()
    assert snap_slow.adds == snap_fast.adds
    assert table.read(spark).count() == 13


def test_stats_skipping_prunes_files_from_plan(spark, table):
    table.append(_df(spark, 0, 100))
    table.append(_df(spark, 100, 200))
    table.append(_df(spark, 200, 300))
    snap = table.snapshot()
    assert all(
        "id" in _stats_of(a).get("minValues", {}) for a in snap.files
    )
    full = table.read(spark)
    pruned = table.read(
        spark,
        stats_filter=lambda s: s.get("maxValues", {}).get("id", 1 << 62) >= 250,
    )
    assert len(pruned.inputFiles()) < len(full.inputFiles())
    assert pruned.where(F.col("id") >= 250).count() == 50


def test_schema_enforcement(spark, table):
    bad = spark.range(5).select(F.col("id"), F.lit(1).alias("wrong"))
    with pytest.raises(ValueError, match="schema mismatch"):
        table.append(bad)


def test_create_twice_fails(spark, table, tmp_path):
    with pytest.raises(FileExistsError):
        Table.create(str(table.root), _df(spark, 0, 1).schema)


def test_read_appends_incremental_feed(spark, table):
    table.append(_df(spark, 0, 100))        # v1
    table.append(_df(spark, 100, 150))      # v2
    table.optimize(spark)                   # v3 (dataChange=false)
    table.append(_df(spark, 150, 160))      # v4
    # consumer caught up through v1 sees exactly the later appends,
    # with the compaction invisible (no double-counted rows)
    got = {r.id for r in table.read_appends(spark, since_version=1).collect()}
    assert got == set(range(100, 160))
    # full-range feed == whole table (appends only so far)
    assert table.read_appends(spark, -1).count() == 160
    # empty range -> empty frame with the table schema
    empty = table.read_appends(spark, table.latest_version())
    assert empty.count() == 0 and empty.schema == table.read(spark).schema


def test_read_appends_refuses_non_append_range(spark, table):
    table.append(_df(spark, 0, 100))
    v_ok = table.latest_version()
    table.delete_where(spark, "id < 10")
    with pytest.raises(ValueError, match="non-append"):
        table.read_appends(spark, since_version=v_ok - 1)
    # a range ending before the delete still works
    assert table.read_appends(spark, -1, to_version=v_ok).count() == 100
    with pytest.raises(ValueError, match="bad version range"):
        table.read_appends(spark, 99)


def test_overwrite_schema_is_one_atomic_commit(spark, tmp_path):
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    from kupo_spark.table import Table

    root = str(tmp_path / "evolve")
    t = Table.create(root, StructType([StructField("a", LongType())]))
    t.append(spark.range(5).select(F.col("id").alias("a")))
    v_before = t.latest_version()
    new_schema = StructType(
        [StructField("a", LongType()), StructField("b", StringType())]
    )
    df = spark.range(5).select(F.col("id").alias("a"), F.lit("x").alias("b"))
    v = t.overwrite_schema(df, new_schema)
    # exactly one new commit; new schema visible; old version still readable
    assert v == v_before + 1 == t.latest_version()
    assert [f.name for f in t.schema().fields] == ["a", "b"]
    assert t.read(spark).columns == ["a", "b"] and t.read(spark).count() == 5
    assert t.read(spark, version=v_before).columns == ["a"]


def test_append_conflicts_with_concurrent_schema_change(spark, tmp_path):
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    from kupo_spark.table import ConcurrentWriteError, Table

    root = str(tmp_path / "race")
    t = Table.create(root, StructType([StructField("a", LongType())]))
    t.append(spark.range(3).select(F.col("id").alias("a")))
    # writer A reads v1 and stages an old-schema append; writer B lands a
    # schema change first; A's rebase must fail, not mix old-schema files
    # into the new-schema table
    a_view = Table(root)
    snap = a_view.snapshot()  # A's read
    new_schema = StructType([StructField("a", LongType()), StructField("b", StringType())])
    t.overwrite_schema(
        spark.range(3).select(F.col("id").alias("a"), F.lit("x").alias("b")),
        new_schema,
    )
    from kupo_spark.table import _Tx

    adds = a_view._stage(
        spark.range(2).select(F.col("id").alias("a")),
        snap.metadata["partitionColumns"],
    )
    import pytest as _pytest

    with _pytest.raises(ConcurrentWriteError, match="metadata change"):
        a_view._commit_tx(_Tx("APPEND", adds=adds, read_version=snap.version))


def test_overwrite_schema_rejects_mismatched_frame(spark, tmp_path):
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    from kupo_spark.table import Table

    root = str(tmp_path / "strict")
    t = Table.create(root, StructType([StructField("a", LongType())]))
    t.append(spark.range(2).select(F.col("id").alias("a")))
    new_schema = StructType([StructField("a", LongType()), StructField("b", StringType())])
    import pytest as _pytest

    with _pytest.raises(Exception):  # missing column fails at WRITE time
        t.overwrite_schema(spark.range(2).select(F.col("id").alias("a")), new_schema)
    # table untouched by the failed call
    assert [f.name for f in t.schema().fields] == ["a"]


def test_commit_never_visible_empty(spark, tmp_path):
    """The commit's visibility point carries its content atomically: a
    reader polling latest_version/_read_actions while a writer commits in
    a tight loop must never observe a claimed-but-empty version (the
    claim-then-fill design this replaced had exactly that window)."""
    import threading

    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType, StructField, StructType

    from kupo_spark.table import Table

    root = str(tmp_path / "race")
    t = Table.create(root, StructType([StructField("a", LongType())]))
    df = spark.range(3).select(F.col("id").alias("a"))
    stop = threading.Event()
    bad: list[int] = []

    def reader():
        r = Table(root)
        while not stop.is_set():
            v = r.latest_version()
            if v < 0:
                continue
            try:
                actions = r._read_actions(v)
            except FileNotFoundError:
                continue  # raced ahead of a vacuumed tmp; not possible here
            if not actions:
                bad.append(v)
                return

    th = threading.Thread(target=reader, daemon=True)
    th.start()
    for _ in range(8):
        t.append(df)
    stop.set()
    th.join(timeout=10)
    assert bad == []


def test_exists_sees_legacy_txlog_layout(spark, tmp_path):
    """A legacy `_txlog` table EXISTS — otherwise exists-then-create
    callers shadow its whole history with a fresh empty _delta_log."""
    import os

    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType, StructField, StructType

    from kupo_spark.table import Table

    root = str(tmp_path / "legacy")
    t = Table.create(root, StructType([StructField("a", LongType())]))
    t.append(spark.range(2).select(F.col("id").alias("a")))
    os.rename(f"{root}/_delta_log", f"{root}/_txlog")
    assert Table.exists(root)
    assert Table(root).read(spark).count() == 2


def test_delete_where_in_space_containing_root(spark, tmp_path):
    """delete_where maps scanned URIs back to snapshot paths with percent
    decoding, so a table root containing a space still deletes (and an
    unmappable path raises instead of silently no-oping)."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType, StructField, StructType

    from kupo_spark.table import Table

    root = str(tmp_path / "with space" / "tbl")
    t = Table.create(root, StructType([StructField("a", LongType())]))
    t.append(spark.range(10).select(F.col("id").alias("a")))
    t.delete_where(spark, "a >= 5")
    got = sorted(r.a for r in Table(root).read(spark).collect())
    assert got == [0, 1, 2, 3, 4]


def test_stats_omitted_unless_every_row_group_has_them(tmp_path):
    """File-level bounds are only published for a column when every row
    group contributed one — a group without min/max (here: an all-null
    group) removes the column from minValues/maxValues rather than
    publishing bounds that may not cover the file."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from kupo_spark.table import _pa_stats

    f = tmp_path / "two_groups.parquet"
    w = pq.ParquetWriter(str(f), pa.schema([("a", pa.int64())]))
    w.write_table(pa.table({"a": [1, 2, 3]}))
    w.write_table(pa.table({"a": pa.array([None, None], type=pa.int64())}))
    w.close()
    stats = _pa_stats(f)
    assert stats["numRecords"] == 5
    # the all-null group has no min/max for `a`; the bound is dropped
    assert "a" not in stats["minValues"] and "a" not in stats["maxValues"]
    # null counts covered every group, so they survive
    assert stats["nullCount"]["a"] == 2
