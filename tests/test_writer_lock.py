"""Cross-process writer fencing for the workdir (table.WriterLock).

Kupo enforces single-writer with an exclusive SQLite writer lock held for
the process lifetime (``src/Kupo/App/Database/SQLite.hs:355-384``): a
second ``kupo run`` on the same workdir fails loudly at startup.  These
tests pin the same contract on the streaming workdir: a live second writer
errors, a crashed writer's lock is breakable with the log intact, and an
expropriated (wrongly-presumed-dead) writer is fenced off before it can
interleave a commit.
"""

from __future__ import annotations

import json
import os
import subprocess

import pytest

from kupo_spark.chaingen import load_blocks
from kupo_spark.streaming.indexer import StreamingIndexer
from kupo_spark.table import WriterFencedError, WriterLock, WriterLockError

SF_DIR = "/root/testdata/sf0.001"


def _dead_pid() -> int:
    """A pid guaranteed dead: spawn a no-op and wait for it."""
    p = subprocess.Popen(["true"])
    p.wait()
    return p.pid


def test_acquire_and_release(tmp_path):
    lk = WriterLock(tmp_path / "w.lock")
    lk.acquire()
    assert lk.fence == 1
    lk.check()  # holder's token is current
    lk.release()
    assert not (tmp_path / "w.lock").exists()
    # a fresh acquire after clean release succeeds
    WriterLock(tmp_path / "w.lock").acquire().release()


def test_same_process_reacquire(tmp_path):
    a = WriterLock(tmp_path / "w.lock").acquire()
    b = WriterLock(tmp_path / "w.lock").acquire()  # same pid: shared claim
    assert b.nonce == a.nonce
    b.release()


def _spawn_holder(path) -> subprocess.Popen:
    """A REAL foreign holder: a subprocess that acquires through
    WriterLock (and therefore holds the kernel flock) and sleeps.  The
    old tests fabricated a payload file with a live pid — under
    kernel-enforced ownership a payload alone holds nothing (that is the
    point of the flock: no pid heuristic, so no pid-recycling wedge)."""
    script = (
        "import sys, time\n"
        "sys.path.insert(0, '/root/repo')\n"
        "from kupo_spark.table import WriterLock\n"
        f"WriterLock({str(path)!r}).acquire()\n"
        "print('HELD', flush=True)\n"
        "time.sleep(120)\n"
    )
    p = subprocess.Popen(["python", "-c", script], stdout=subprocess.PIPE, text=True)
    assert p.stdout.readline().strip() == "HELD"
    return p


def test_live_second_writer_fails_loudly(tmp_path):
    """A lock held by a LIVE foreign process refuses a second acquire —
    enforced by the kernel (EWOULDBLOCK), not a pid guess."""
    path = tmp_path / "w.lock"
    holder = _spawn_holder(path)
    try:
        with pytest.raises(WriterLockError, match="live"):
            WriterLock(path).acquire()
    finally:
        holder.kill()
        holder.wait()


def test_crashed_holder_flock_is_free_even_if_payload_pid_recycled(tmp_path):
    """The failure mode the flock design removes: a crashed holder whose
    payload pid was RECYCLED to some unrelated live process.  The pid
    heuristic would block startup forever; the kernel released the flock
    at crash, so acquire succeeds and the fence still advances."""
    path = tmp_path / "w.lock"
    live_unrelated = subprocess.Popen(["sleep", "60"])  # "recycled" pid
    try:
        path.write_text(
            json.dumps({"pid": live_unrelated.pid, "fence": 11, "nonce": "ghost"})
        )
        lk = WriterLock(path).acquire()  # no flock held -> free
        assert lk.fence == 12
        lk.check()
        lk.release()
    finally:
        live_unrelated.kill()
        live_unrelated.wait()


def test_crashed_writer_lock_recoverable(tmp_path):
    """A lock whose holder pid is dead is broken with a bumped fence."""
    path = tmp_path / "w.lock"
    path.write_text(json.dumps({"pid": _dead_pid(), "fence": 7, "nonce": "stale"}))
    lk = WriterLock(path).acquire()
    assert lk.fence == 8  # fencing token strictly advances across breaks
    lk.check()


def test_expropriated_writer_is_fenced(tmp_path):
    """After its lock is broken, the old holder's check() raises."""
    lk = WriterLock(tmp_path / "w.lock").acquire()
    # simulate a breaker that (wrongly) judged this pid dead
    (tmp_path / "w.lock").write_text(
        json.dumps({"pid": 999999, "fence": lk.fence + 1, "nonce": "newowner"})
    )
    with pytest.raises(WriterFencedError):
        lk.check()


def test_indexer_second_live_writer_fails(spark, tmp_path):
    """End-to-end on the streaming workdir: with a live foreign process on
    the lock, process_batch fails loudly BEFORE any table or catalog
    mutation — the log stays intact."""
    out = tmp_path / "wd"
    blocks = load_blocks(spark, SF_DIR).where("slot_no <= 2000")
    ix = StreamingIndexer(str(out))
    ix.process_batch(blocks, batch_id=0)
    entries_before = list(ix._entries())
    ix.release_writer()

    holder = _spawn_holder(out / "_writer.lock")
    try:
        second = StreamingIndexer(str(out))
        with pytest.raises(WriterLockError):
            second.process_batch(blocks, batch_id=1)
        # loud failure left the catalog exactly as it was
        assert second._catalog.entries() == entries_before
    finally:
        holder.kill()
        holder.wait()


def test_indexer_recovers_crashed_writer_and_fences_stale_one(spark, tmp_path):
    """A new indexer breaks a dead holder's lock and keeps writing; the
    stale holder (had it merely stalled) is fenced at its next publish."""
    out = tmp_path / "wd2"
    blocks = load_blocks(spark, SF_DIR).where("slot_no <= 2000")
    stale = StreamingIndexer(str(out))
    stale.process_batch(blocks, batch_id=0)

    # simulate the stale writer's process having "crashed": rewrite its
    # lock as if it belonged to a dead pid, then bring up a successor
    (out / "_writer.lock").write_text(
        json.dumps({"pid": _dead_pid(), "fence": stale._writer_lock.fence, "nonce": "crashed"})
    )
    successor = StreamingIndexer(str(out))
    successor.process_batch(
        load_blocks(spark, SF_DIR).where("slot_no > 2000"), batch_id=1
    )
    assert len(successor._committed()) == 2  # log intact + extended

    # the stale writer halts instead of interleaving
    with pytest.raises(WriterFencedError):
        stale.append_rollback(1000)
    # and its failed write published nothing
    assert len(successor._catalog.entries()) == len(successor._entries())


def test_lock_never_blocks_readers(spark, tmp_path):
    """Read-only constructions (resolved_index) neither take nor need the
    lock — a replica can serve while the master holds it."""
    out = tmp_path / "wd3"
    blocks = load_blocks(spark, SF_DIR).where("slot_no <= 2000")
    master = StreamingIndexer(str(out))
    master.process_batch(blocks, batch_id=0)  # master holds the lock
    replica = StreamingIndexer(str(out))
    idx = replica.resolved_index(spark)
    assert idx.inputs.count() > 0
    assert replica._writer_lock.nonce is None  # never acquired
    assert json.loads((out / "_writer.lock").read_text())["pid"] == os.getpid()


def test_racing_breakers_exactly_one_wins(tmp_path):
    """N separate PROCESSES race to break the same dead-holder lock: the
    nonce-verified replace admits exactly one; every loser sees the
    winner's live pid and raises WriterLockError.  This is the actual
    crash-recovery race (two supervisors restarting the writer at once)."""
    path = tmp_path / "w.lock"
    path.write_text(json.dumps({"pid": _dead_pid(), "fence": 3, "nonce": "stale"}))
    script = (
        "import sys, time, json\n"
        "sys.path.insert(0, '/root/repo')\n"
        "from kupo_spark.table import WriterLock, WriterLockError\n"
        "try:\n"
        f"    lk = WriterLock({str(path)!r}).acquire()\n"
        "    print('WON', lk.fence)\n"
        "    time.sleep(2)\n"  # hold while the others decide
        "    lk.check()\n"     # still ours at the end
        "    print('STILL_HELD')\n"
        "except WriterLockError:\n"
        "    print('LOST')\n"
    )
    procs = [
        subprocess.Popen(
            ["python", "-c", script], stdout=subprocess.PIPE, text=True
        )
        for _ in range(6)
    ]
    outs = [p.communicate(timeout=60)[0].split() for p in procs]
    winners = [o for o in outs if o and o[0] == "WON"]
    losers = [o for o in outs if o == ["LOST"]]
    assert len(winners) == 1 and len(losers) == 5, outs
    assert winners[0][-1] == "STILL_HELD"  # fencing token stayed current
    assert int(winners[0][1]) == 4  # fence bumped past the dead holder's
