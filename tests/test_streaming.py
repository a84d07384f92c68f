"""Streaming ingestion tests — micro-batch parity with batch indexing, plus
the rollback/replay scenario (the analog of the reference's state-machine
roll-forward/roll-backward sequences, test/Test/Kupo/AppSpec.hs:245)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kupo_spark.chaingen import load_events
from kupo_spark.operators.indexer import build_index
from kupo_spark.streaming.indexer import StreamingIndexer, stream_blocks_from_events_dir

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events_dir(spark, tmp_path_factory):
    """Events split into 4 files so availableNow produces multiple
    micro-batches (spends cross batch boundaries)."""
    d = str(tmp_path_factory.mktemp("events_stream"))
    ev = load_events(spark, SF_DIR)
    ev.withColumn("part", F.expr("event_id DIV 250")).repartitionByRange(
        4, "part"
    ).drop("part").write.mode("overwrite").parquet(d)
    return d


def _run_stream(spark, events_dir, out_dir, ckpt_dir):
    ix = StreamingIndexer(str(out_dir))
    stream = stream_blocks_from_events_dir(spark, events_dir)
    q = ix.start(stream, str(ckpt_dir))
    q.awaitTermination(120)
    return ix


def test_streaming_matches_batch(spark, blocks, events_dir, tmp_path):
    ix = _run_stream(spark, events_dir, tmp_path / "out", tmp_path / "ckpt")
    streamed = ix.resolved_index(spark)
    batch = build_index(blocks)

    s_inputs = {tuple(r) for r in streamed.inputs.select(
        "output_reference", "address", "coins", "created_at", "spent_at", "spent_by"
    ).collect()}
    b_inputs = {tuple(r) for r in batch.inputs.select(
        "output_reference", "address", "coins", "created_at", "spent_at", "spent_by"
    ).collect()}
    assert s_inputs == b_inputs
    assert streamed.checkpoints.count() == batch.checkpoints.count()
    assert streamed.binary_data.count() == batch.binary_data.count()
    assert streamed.policies.count() == batch.policies.count()


def _index_fingerprint(ix, spark):
    cols = ["output_reference", "address", "coins", "created_at", "spent_at", "spent_by"]
    resolved = ix.resolved_index(spark)
    return frozenset(tuple(r) for r in resolved.inputs.select(cols).collect())


def test_scoped_batch_replay_is_exactly_once_at_log_level(spark, blocks, tmp_path):
    """A failure replay inside one streaming query re-delivers the same
    (checkpoint scope, batch_id); the catalog dedup key makes the second
    delivery a no-op — the LOG itself is exactly-once, the kupo SQLite
    transaction guarantee (SQLite.hs:1112-1128)."""
    ix = StreamingIndexer(str(tmp_path / "dup"))
    first = blocks.where(F.col("slot_no") < 20)
    ix.process_batch(first, 0, dedup_scope="ckpt-a")
    committed = len(ix._committed())
    fp_once = _index_fingerprint(ix, spark)
    ix.process_batch(first, 0, dedup_scope="ckpt-a")  # failure replay
    assert len(ix._committed()) == committed  # nothing written
    assert _index_fingerprint(ix, spark) == fp_once
    # a DIFFERENT scope (fresh checkpoint dir = intentional reprocess) writes
    ix.process_batch(first, 0, dedup_scope="ckpt-b")
    assert len(ix._committed()) == committed + 1
    assert _index_fingerprint(ix, spark) == fp_once  # resolve dedups versions


def test_unscoped_batch_replay_is_idempotent_at_resolve(spark, blocks, tmp_path):
    """Direct process_batch calls (no scope) append a new version; latest-wins
    dedup at resolve time absorbs the duplicate."""
    ix = StreamingIndexer(str(tmp_path / "dup2"))
    first = blocks.where(F.col("slot_no") < 20)
    ix.process_batch(first, 0)
    once = ix.resolved_index(spark).inputs.count()
    ix.process_batch(first, 0)  # replay the same batch
    again = ix.resolved_index(spark)
    assert again.inputs.count() == once
    assert again.checkpoints.count() == 20
    # r11: the resolved policies pairs carry no dedup pass (the produced
    # window leaves one row per output_reference) — replayed versions must
    # still resolve to pair-distinct rows
    n_pol = again.policies.count()
    assert n_pol > 0
    assert n_pol == again.policies.dropDuplicates(
        ["output_reference", "policy_id"]
    ).count()


def test_crashed_publish_is_invisible_until_cataloged(spark, blocks, tmp_path):
    """Simulate a crash between the table appends and the catalog publish:
    the orphan appends must be invisible to readers (they read at the
    pinned versions, recorded before the residue), and the next ingest
    must retract the residue and safely reuse the seq."""
    ix = StreamingIndexer(str(tmp_path / "crash"))
    ix.process_batch(blocks.where(F.col("slot_no") < 20), 0)
    fp_committed = _index_fingerprint(ix, spark)

    # forge crash residue: append batch tables for seq 1, then "crash"
    # before the catalog entry that would have pinned them
    ix._append_batch_tables(
        blocks.where((F.col("slot_no") >= 20) & (F.col("slot_no") < 25)), 1
    )
    assert ix._uncommitted_seqs() == [1]
    assert _index_fingerprint(ix, spark) == fp_committed  # residue invisible
    assert ix.resolved_index(spark).checkpoints.count() == 20

    # recovery: the next batch retracts the residue, takes seq 1, commits
    ix.process_batch(blocks.where((F.col("slot_no") >= 20) & (F.col("slot_no") < 30)), 1)
    assert ix._uncommitted_seqs() == []
    assert ix.resolved_index(spark).checkpoints.count() == 30
    # the retracted residue never resurfaces: counts match a clean run
    clean = StreamingIndexer(str(tmp_path / "clean"))
    clean.process_batch(blocks.where(F.col("slot_no") < 20), 0)
    clean.process_batch(blocks.where((F.col("slot_no") >= 20) & (F.col("slot_no") < 30)), 1)
    assert (
        ix.resolved_index(spark).inputs.count()
        == clean.resolved_index(spark).inputs.count()
    )


def test_multi_output_transactions_indexed(index):
    from pyspark.sql import functions as FF

    multi = index.inputs.where(FF.col("output_index") == 1)
    assert multi.count() > 0
    # change outputs carry no datum/script/assets
    assert multi.where(FF.col("datum_hash").isNotNull()).count() == 0
    assert multi.where(FF.expr("size(map_keys(assets)) > 0")).count() == 0


def test_stream_resumes_from_checkpoint_on_new_files(spark, blocks, tmp_path):
    """Second run with the SAME checkpointLocation processes only files
    added since the first run (startOrResume via the stream checkpoint),
    and the resolved index ends up complete."""
    from kupo_spark.chaingen import load_events

    src = tmp_path / "src"
    src.mkdir()
    ev = load_events(spark, SF_DIR).persist()
    ev.where(F.col("event_id") < 500).coalesce(1).write.mode("overwrite").parquet(
        str(src / "a")
    )
    out, ckpt = tmp_path / "out", tmp_path / "ckpt"
    ix = StreamingIndexer(str(out))

    def run():
        q = ix.start(stream_blocks_from_events_dir(spark, f"{src}/*"), str(ckpt))
        q.awaitTermination(120)

    run()
    n_first = ix.resolved_index(spark).inputs.count()
    # new chain suffix arrives
    ev.where(F.col("event_id") >= 500).coalesce(1).write.mode("overwrite").parquet(
        str(src / "b")
    )
    seq_before = ix._next_seq()
    run()
    assert ix._next_seq() == seq_before + 1  # exactly one new micro-batch
    full = ix.resolved_index(spark)
    batch = build_index(blocks)
    assert full.inputs.count() == batch.inputs.count() > n_first


def test_compact_produces_equivalent_queryable_index(spark, blocks, events_dir, tmp_path):
    ix = _run_stream(spark, events_dir, tmp_path / "out", tmp_path / "ckpt")
    from kupo_spark.operators.fold_inputs import fold_inputs
    from kupo_spark.operators.indexer import read_index

    ix.compact(spark, str(tmp_path / "compacted"), slot_bucket=50)
    disk = read_index(spark, str(tmp_path / "compacted"), slot_bucket=50)
    batch = build_index(blocks)
    a = {tuple(r) for r in fold_inputs(disk, "*", status="unspent").collect()}
    b = {tuple(r) for r in fold_inputs(batch, "*", status="unspent").collect()}
    assert a == b


def test_incremental_compact_then_append_and_rollback(spark, blocks, tmp_path):
    """In-place compaction folds the logs into a base; later batches and
    rollbacks layer on top — resolved state must equal a batch rebuild."""
    from kupo_spark.operators import maintenance as mt

    ix = StreamingIndexer(str(tmp_path / "inc"))
    ix.process_batch(blocks.where(F.col("slot_no") < 50), 0)
    ix.compact(spark)  # in-place: logs ≤ base_seq now come from the base
    ix.process_batch(blocks.where((F.col("slot_no") >= 50) & (F.col("slot_no") < 80)), 0)
    ix.append_rollback(60)

    resolved = ix.resolved_index(spark)
    expect = mt.rollback_to(build_index(blocks.where(F.col("slot_no") < 80)), 60)
    cols = ["output_reference", "coins", "created_at", "spent_at", "spent_by"]
    a = {tuple(r) for r in resolved.inputs.select(cols).collect()}
    b = {tuple(r) for r in expect.inputs.select(cols).collect()}
    assert a == b
    assert resolved.checkpoints.count() == expect.checkpoints.count()
    # folds over the layered state must resolve J1 for POST-compact rows
    # too (regression: the base parquet's denormalized hash columns, if
    # carried into the re-split, NULL-fill the newer log rows and fool
    # fold_inputs into skipping the checkpoint joins)
    from kupo_spark.operators.fold_inputs import fold_inputs

    folded = fold_inputs(resolved, "*")
    assert folded.where(F.col("created_header_hash").isNull()).count() == 0
    assert folded.where(F.col("created_at") >= 50).count() > 0
    # a second compact folds the rollback in, and the state survives
    ix.compact(spark)
    again = {tuple(r) for r in ix.resolved_index(spark).inputs.select(cols).collect()}
    assert again == b


def test_gc_compact_prunes_binary_data_in_resolved_view(spark, blocks, tmp_path):
    """A GC transform applied at compact time must stay applied in every
    subsequent resolve (regression: binary_data/scripts were rebuilt from
    the FULL log, so prune_binary_data-at-compact was a no-op on the
    served index; they now layer on the base like produced/spends)."""
    from kupo_spark.operators import maintenance as mt

    ix = StreamingIndexer(str(tmp_path / "gc"))
    sub = blocks.where(F.col("slot_no") < 60)
    ix.process_batch(sub, 0)
    n_before = ix.resolved_index(spark).binary_data.count()
    # retract a suffix: datums referenced only by retracted rows orphan
    ix.append_rollback(30)
    ix.compact(spark, transform=mt.prune_binary_data)

    resolved = ix.resolved_index(spark)
    expect = mt.prune_binary_data(mt.rollback_to(build_index(sub), 30))
    got = {r.binary_data_hash for r in resolved.binary_data.collect()}
    want = {r.binary_data_hash for r in expect.binary_data.collect()}
    assert got == want
    assert len(got) < n_before  # the prune actually removed orphans
    # a post-compact batch may re-reference a pruned hash — it must come back
    ix.process_batch(blocks.where((F.col("slot_no") >= 60) & (F.col("slot_no") < 80)), 1)
    again = ix.resolved_index(spark).binary_data.count()
    assert again >= len(got)


@pytest.mark.slow
def test_truncate_log_after_compact_preserves_state(spark, blocks, tmp_path):
    """compact + truncate_log: folded log partitions are dropped, the
    resolved state is unchanged (it layers the base), later batches and
    rollbacks still land, and the resume tip / rollback-target validation
    still see checkpoints that now live only in the base."""
    from kupo_spark.streaming.indexer import resume_bound

    ix = StreamingIndexer(str(tmp_path / "tr"))
    ix.process_batch(blocks.where(F.col("slot_no") < 50), 0)
    ix.compact(spark)
    cols = ["output_reference", "coins", "created_at", "spent_at", "spent_by"]
    before = {tuple(r) for r in ix.resolved_index(spark).inputs.select(cols).collect()}
    n_files_before = len(ix._table("produced").snapshot().files)

    removed = ix.truncate_log()
    assert removed["produced"] > 0 and removed["checkpoints"] > 0
    assert len(ix._table("produced").snapshot().files) < n_files_before
    after = {tuple(r) for r in ix.resolved_index(spark).inputs.select(cols).collect()}
    assert after == before
    # a second truncate is a no-op (nothing left at or below the base)
    assert not any(ix.truncate_log().values())

    # checkpoints folded into the base still serve resume + PUT validation
    tip_before = max(r[2] for r in before)
    assert resume_bound(ix, spark) == (tip_before, False)
    with pytest.raises(ValueError, match="not a known checkpoint"):
        ix.put_patterns(spark, ["*/*"], 10**9, blocks)

    # later batches + rollbacks layer on the truncated log as usual
    ix.process_batch(
        blocks.where((F.col("slot_no") >= 50) & (F.col("slot_no") < 80)), 1
    )
    ix.append_rollback(60)
    from kupo_spark.operators import maintenance as mt

    expect = mt.rollback_to(build_index(blocks.where(F.col("slot_no") < 80)), 60)
    got = {tuple(r) for r in ix.resolved_index(spark).inputs.select(cols).collect()}
    want = {tuple(r) for r in expect.inputs.select(cols).collect()}
    assert got == want
    # physical vacuum after a second compact+truncate keeps reads working
    ix.compact(spark)
    ix.truncate_log(vacuum_retention=0.0)
    again = {tuple(r) for r in ix.resolved_index(spark).inputs.select(cols).collect()}
    assert again == want


def test_rollback_then_replay_restores_index(spark, blocks, events_dir, tmp_path):
    ix = _run_stream(spark, events_dir, tmp_path / "out", tmp_path / "ckpt1")
    full_before = ix.resolved_index(spark).inputs.count()

    # M1: retract past slot 50
    ix.append_rollback(50)
    rolled = ix.resolved_index(spark)
    assert rolled.inputs.where(F.col("created_at") > 50).count() == 0
    assert rolled.inputs.where(F.col("spent_at") > 50).count() == 0
    assert rolled.checkpoints.agg(F.max("slot_no")).collect()[0][0] <= 50

    # M5: the producer re-intersects and replays forward — feed the same
    # events again as a new stream run (fresh checkpoint dir = reconnect)
    q = ix.start(stream_blocks_from_events_dir(spark, events_dir), str(tmp_path / "ckpt2"))
    q.awaitTermination(120)
    replayed = ix.resolved_index(spark)
    assert replayed.inputs.count() == full_before
    # spend metadata fully restored
    batch = build_index(blocks)
    assert (
        replayed.inputs.where(F.col("spent_at").isNotNull()).count()
        == batch.inputs.where(F.col("spent_at").isNotNull()).count()
    )


def test_delete_by_pattern_log_record(spark, blocks, tmp_path):
    """W6 as retraction-as-data: append_delete kills matching rows written
    at or before the record (equal to the batch delete_by_pattern rewrite),
    later batches re-add fresh matches (one-time purge), and the verdict
    survives compaction, truncation, and a restart."""
    from kupo_spark.operators.maintenance import delete_by_pattern
    from kupo_spark.patterns import pattern_from_text, to_column

    cols = ["output_reference", "address", "coins", "created_at", "spent_at"]
    ix = StreamingIndexer(str(tmp_path / "del"))
    ix.process_batch(blocks.where(F.col("slot_no") < 30), 0)
    before = ix.resolved_index(spark)
    # pick an address present in BOTH halves (so the one-time-purge arm
    # below has fresh rows to re-add)
    addr = (
        before.inputs.select("address")
        .join(
            blocks.where((F.col("slot_no") >= 30) & (F.col("slot_no") < 60))
            .select(F.explode("outputs").alias("o"))
            .select(F.col("o.address").alias("address")),
            "address",
        )
        .groupBy("address")
        .count()
        .orderBy(F.desc("count"), "address")
        .first()["address"]
    )
    pred = to_column(pattern_from_text(addr))
    assert before.inputs.where(pred).count() > 0
    want = {
        tuple(r) for r in delete_by_pattern(before, addr).inputs.select(cols).collect()
    }
    ix.append_delete(addr)
    after = ix.resolved_index(spark)
    assert {tuple(r) for r in after.inputs.select(cols).collect()} == want
    # policies/assets are derived from surviving rows only
    assert (
        after.policies.join(
            after.inputs.select("output_reference"), "output_reference", "left_anti"
        ).count()
        == 0
    )
    # a LATER batch's matches survive (the delete is a one-time purge;
    # re-accumulation prevention is the P13 guard's job, not the record's)
    ix.process_batch(blocks.where((F.col("slot_no") >= 30) & (F.col("slot_no") < 60)), 1)
    post = ix.resolved_index(spark)
    fresh = post.inputs.where(pred)
    assert fresh.count() > 0
    assert fresh.agg(F.min("created_at")).collect()[0][0] >= 30
    post_set = {tuple(r) for r in post.inputs.select(cols).collect()}
    # compact folds the delete into the base; truncate drops folded parts
    ix.compact(spark)
    assert ix.log_current()
    ix.truncate_log()
    assert {
        tuple(r) for r in ix.resolved_index(spark).inputs.select(cols).collect()
    } == post_set
    # restart: the catalog is the durable record
    ix2 = StreamingIndexer(str(tmp_path / "del"))
    assert {
        tuple(r) for r in ix2.resolved_index(spark).inputs.select(cols).collect()
    } == post_set
    # a delete AFTER the compact still kills base rows (they carry base_seq)
    ix2.append_delete(addr)
    assert ix2.resolved_index(spark).inputs.where(pred).count() == 0
    assert not ix2.log_current()
