"""The command-line surface (kupo_spark/cli.py) — the reference binary's
command set (src/Kupo/Options.hs:109-113) over file replay transports."""

from __future__ import annotations

import json
import urllib.error
import urllib.request

import pytest

from kupo_spark.cli import main, parse_since, parse_until
from tests.conftest import SF_DIR


def _get(url: str, accept: str = "application/json"):
    # 120s: under a long-lived suite JVM a follow-mode request can queue
    # behind an index swap; the tests' own deadline loops bound semantics,
    # this only needs to outlast a slow single response (flaked at 30s)
    req = urllib.request.Request(url, headers={"Accept": accept})
    with urllib.request.urlopen(req, timeout=120) as resp:
        return resp.status, json.loads(resp.read())


def _request(url: str, method: str, body: bytes | None = None):
    req = urllib.request.Request(url, method=method, data=body)
    try:
        with urllib.request.urlopen(req, timeout=120) as resp:
            return resp.status, json.loads(resp.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def test_version(capsys):
    assert main(["version"]) == 0
    assert "kupo-spark" in capsys.readouterr().out


def test_parse_points():
    assert parse_since(None) is None
    assert parse_since("origin") == (0, None)
    assert parse_since("123") == (123, None)
    assert parse_since("123.ABCD") == (123, "abcd")
    assert parse_since("tip") == "tip"
    assert parse_until("456") == (456, None)
    assert parse_until("456.FF") == (456, "ff")
    with pytest.raises(SystemExit):
        parse_since("tip-of-nothing")
    with pytest.raises(SystemExit):
        parse_until("nonsense")
    with pytest.raises(SystemExit):
        parse_until("300.")  # trailing dot without a hash
    with pytest.raises(SystemExit):
        parse_since("300.")


def test_run_requires_since_on_fresh_start():
    with pytest.raises(SystemExit, match="since"):
        main(
            ["--events", SF_DIR, "--in-memory", "--match", "*", "--gc-interval", "0", "--port", "0"],
            serve_forever=False,
        )


def test_run_requires_exactly_one_source():
    with pytest.raises(SystemExit, match="chain source"):
        main(
            ["--in-memory", "--since", "origin", "--match", "*", "--gc-interval", "0", "--port", "0"],
            serve_forever=False,
        )


def test_run_in_memory_serves_and_health_checks(index):
    server = main(
        [
            "--events", SF_DIR, "--in-memory", "--since", "origin", "--match", "*",
            "--gc-interval", "0", "--port", "0",
        ],
        serve_forever=False,
    )
    try:
        status, health = _get(f"{server.url}/health")
        assert status == 200
        assert health["connection_status"] == "connected"
        # the served index is the full batch build
        status, matches = _get(f"{server.url}/matches")
        assert status == 200
        assert len(matches) == index.inputs.count()
        # the health-check command is a usable liveness probe
        port = int(server.url.rsplit(":", 1)[1])
        assert main(["health-check", "--host", "127.0.0.1", "--port", str(port)]) == 0
    finally:
        server.close()


def test_run_workdir_sync_then_resume(tmp_path, spark, index):
    argv = [
        "--events", SF_DIR, "--workdir", str(tmp_path / "db"), "--since", "origin", "--match", "*",
        "--gc-interval", "0", "--port", "0",
    ]
    server = main(argv, serve_forever=False)
    try:
        n_first = server.index.inputs.count()
        assert n_first == index.inputs.count()
    finally:
        server.close()
    # re-running the ORIGINAL launch command resumes (startOrResume,
    # Configuration.hs:182-241) without double-ingesting
    server = main(argv, serve_forever=False)
    try:
        assert server.index.inputs.count() == n_first
    finally:
        server.close()
    # a --since NEWER than the stored tip is the reference's
    # errConflictingSinceOptions
    with pytest.raises(ValueError, match="more recent"):
        main(
            [
                "--events", SF_DIR, "--workdir", str(tmp_path / "db"),
                "--since", "10000000", "--match", "*", "--gc-interval", "0", "--port", "0",
            ],
            serve_forever=False,
        )


def test_since_tip_starts_at_the_source_tip(index):
    server = main(
        [
            "--events", SF_DIR, "--in-memory", "--since", "tip", "--match", "*",
            "--gc-interval", "0", "--port", "0",
        ],
        serve_forever=False,
    )
    try:
        tip = index.checkpoints.agg({"slot_no": "max"}).collect()[0][0]
        assert (
            server.index.inputs.count()
            == index.inputs.where(f"created_at >= {tip}").count()
        )
    finally:
        server.close()


def test_until_bounds_the_sync(index):
    server = main(
        [
            "--events", SF_DIR, "--in-memory", "--since", "origin", "--match", "*", "--until", "300",
            "--gc-interval", "0", "--port", "0",
        ],
        serve_forever=False,
    )
    try:
        assert (
            server.index.inputs.count()
            == index.inputs.where("created_at <= 300").count()
        )
    finally:
        server.close()


def test_read_only_replica_serves_but_refuses_mutations(tmp_path):
    argv = [
        "--events", SF_DIR, "--workdir", str(tmp_path / "db"), "--since", "origin", "--match", "*",
        "--gc-interval", "0", "--port", "0",
    ]
    main(argv, serve_forever=False).close()
    replica = main(
        [
            "--workdir", str(tmp_path / "db"), "--read-only",
            "--gc-interval", "0", "--port", "0",
        ],
        serve_forever=False,
    )
    try:
        status, health = _get(f"{replica.url}/health")
        assert status == 200 and health["connection_status"] == "connected"
        status, _ = _get(f"{replica.url}/matches")
        assert status == 200
        status, body = _request(f"{replica.url}/patterns/%2A", "DELETE")
        assert status == 503 and "read-only" in body["hint"]
        status, body = _request(
            f"{replica.url}/matches/%2A", "PUT",
            json.dumps({"rollback_to": {"slot_no": 1}, "patterns": ["*"]}).encode(),
        )
        assert status in (400, 404, 405, 503)  # rejected, never a mutation
        status, body = _request(
            f"{replica.url}/patterns", "PUT",
            json.dumps({"rollback_to": {"slot_no": 1}, "patterns": ["*"]}).encode(),
        )
        assert status == 503 and "read-only" in body["hint"]
    finally:
        replica.close()


def test_copy_command(tmp_path, spark, index, capsys):
    from kupo_spark import chainspec as cs
    from kupo_spark.operators.indexer import read_index, write_index
    from kupo_spark.patterns import any_to_column, pattern_from_text

    src, dest = str(tmp_path / "src"), str(tmp_path / "dest")
    write_index(index, src)
    deleg = f"*/{cs.delegation_credential_of(5)}"
    assert main(["copy", "--from", src, "--into", dest, "--match", deleg]) == 0
    copied = read_index(spark, dest)
    want = index.inputs.where(any_to_column([pattern_from_text(deleg)])).count()
    assert want > 0
    assert copied.inputs.count() == want
    # a pattern matching nothing still yields a READABLE index (the schema
    # sidecar survives the zero-part-file partitioned write)
    empty_dest = str(tmp_path / "empty")
    addr = cs.address_of(42)  # no tag-02 output of user 42 at this SF
    assert main(["copy", "--from", src, "--into", empty_dest, "--match", addr]) == 0
    assert read_index(spark, empty_dest).inputs.count() == 0


def test_run_requires_a_pattern():
    """newPatternsCache: no persisted patterns + no --match is an error
    (Configuration.hs:254-258)."""
    with pytest.raises(SystemExit, match="no pattern"):
        main(
            [
                "--events", SF_DIR, "--in-memory", "--since", "origin",
                "--gc-interval", "0", "--port", "0",
            ],
            serve_forever=False,
        )


def test_restart_with_different_patterns_is_rejected(tmp_path):
    """newPatternsCache: conflicting CLI vs persisted patterns error out
    (Configuration.hs:264-268) instead of silently mis-indexing."""
    base = [
        "--events", SF_DIR, "--workdir", str(tmp_path / "db"), "--since", "origin",
        "--gc-interval", "0", "--port", "0",
    ]
    main(base + ["--match", "*"], serve_forever=False).close()
    with pytest.raises(SystemExit, match="different"):
        main(base + ["--match", "*/*"], serve_forever=False)
    # no --match at all defers to the persisted set and resumes fine
    server = main(base, serve_forever=False)
    try:
        assert server.store.list()
    finally:
        server.close()


def test_restart_without_new_blocks_commits_nothing(tmp_path):
    """A restart that ingests nothing must not append a log entry or
    rewrite the base — restart cost is O(1), not O(index)."""
    from kupo_spark.streaming.indexer import StreamingIndexer

    argv = [
        "--events", SF_DIR, "--workdir", str(tmp_path / "db"), "--since", "origin",
        "--match", "*", "--gc-interval", "0", "--port", "0",
    ]
    main(argv, serve_forever=False).close()
    seq_before = StreamingIndexer(str(tmp_path / "db"))._next_seq()
    main(argv, serve_forever=False).close()
    assert StreamingIndexer(str(tmp_path / "db"))._next_seq() == seq_before


def test_copy_from_a_run_workdir(tmp_path, spark, index):
    """copy --from accepts a run workdir (streaming-log layout), the
    reference binary's documented use."""
    from kupo_spark.operators.indexer import read_index

    argv = [
        "--events", SF_DIR, "--workdir", str(tmp_path / "db"), "--since", "origin",
        "--match", "*", "--gc-interval", "0", "--port", "0",
    ]
    main(argv, serve_forever=False).close()
    dest = str(tmp_path / "export")
    assert main(["copy", "--from", str(tmp_path / "db"), "--into", dest]) == 0
    assert read_index(spark, dest).inputs.count() == index.inputs.count()


def test_until_point_hash_is_asserted():
    with pytest.raises(SystemExit, match="no such point"):
        main(
            [
                "--events", SF_DIR, "--in-memory", "--since", "origin",
                "--match", "*", "--until", "300.deadbeef",
                "--gc-interval", "0", "--port", "0",
            ],
            serve_forever=False,
        )


def test_close_stops_the_gardener(tmp_path):
    """KupoHttpServer.close() kills the CLI's gardener thread."""
    server = main(
        [
            "--events", SF_DIR, "--in-memory", "--since", "origin", "--match", "*",
            "--gc-interval", "3600", "--port", "0",
        ],
        serve_forever=False,
    )
    assert not server._stop_gc.is_set()
    server.close()
    assert server._stop_gc.is_set()


def test_follow_mode_serves_while_syncing(tmp_path, spark, index):
    """--follow: continuous sync + serve (the reference's concurrently4
    runtime) — a new event file appearing in the source directory grows
    the served index without a restart."""
    import shutil
    import time

    import duckdb

    events_dir = tmp_path / "events"
    events_dir.mkdir()
    con = duckdb.connect()
    con.execute(
        f"COPY (SELECT event_id, user_id FROM read_parquet('{SF_DIR}/events.parquet') "
        "WHERE event_id < 500) TO "
        f"'{events_dir}/part1.parquet' (FORMAT parquet)"
    )
    server = main(
        [
            "--events", str(events_dir), "--workdir", str(tmp_path / "db"),
            "--follow", "--since", "origin", "--match", "*",
            "--gc-interval", "0", "--port", "0",
        ],
        serve_forever=False,
    )
    try:
        status, h1 = _get(f"{server.url}/health")
        assert status == 200 and h1["most_recent_checkpoint"] is not None
        # a second file = new blocks arriving on the chain
        con.execute(
            f"COPY (SELECT event_id, user_id FROM read_parquet('{SF_DIR}/events.parquet') "
            "WHERE event_id >= 500) TO "
            f"'{events_dir}/part2.parquet' (FORMAT parquet)"
        )
        deadline = time.time() + 240
        tip = h1["most_recent_checkpoint"]
        while time.time() < deadline:
            _, h2 = _get(f"{server.url}/health")
            if h2["most_recent_checkpoint"] > tip:
                break
            time.sleep(0.5)
        assert h2["most_recent_checkpoint"] > tip, "follow stream never advanced"
        # the followed index converges to the batch build over the same events
        _, matches = _get(f"{server.url}/matches")
        assert len(matches) == index.inputs.count()
    finally:
        server.close()
    assert not server._stream_query.isActive  # close() stopped the stream


def _ogmios_fwd(slot: int, txid: str, addr: str) -> str:
    return json.dumps(
        {
            "jsonrpc": "2.0",
            "method": "nextBlock",
            "result": {
                "direction": "forward",
                "tip": {"slot": 500, "id": "9" * 64, "height": 50},
                "block": {
                    "type": "praos",
                    "era": "conway",
                    "id": f"{slot:064x}",
                    "slot": slot,
                    "height": slot,
                    "transactions": [
                        {
                            "id": txid,
                            "spends": "inputs",
                            "inputs": [
                                {"transaction": {"id": "0" * 64}, "index": 0}
                            ],
                            "outputs": [
                                {
                                    "address": addr,
                                    "value": {"ada": {"lovelace": 1000}},
                                }
                            ],
                        }
                    ],
                },
            },
        }
    )


def _ogmios_bwd(slot: int) -> str:
    return json.dumps(
        {
            "jsonrpc": "2.0",
            "method": "nextBlock",
            "result": {
                "direction": "backward",
                "tip": {"slot": 500, "id": "9" * 64, "height": 50},
                "point": {"slot": slot, "id": "8" * 64},
            },
        }
    )


@pytest.mark.slow
def test_follow_ogmios_applies_rollbacks(tmp_path):
    """--follow over Ogmios NDJSON segments: a RollBackward retracts the
    rolled-back suffix from the SERVED index and the replayed forwards
    re-index — live chain-sync including retractions."""
    import time

    seg_dir = tmp_path / "segments"
    seg_dir.mkdir()
    (seg_dir / "seg1.jsonl").write_text(_ogmios_fwd(100, "a" * 64, "addr1aaa") + "\n")
    server = main(
        [
            "--ogmios-file", str(seg_dir), "--workdir", str(tmp_path / "db"),
            "--follow", "--since", "origin", "--match", "*",
            "--gc-interval", "0", "--port", "0",
        ],
        serve_forever=False,
    )
    try:
        deadline = time.time() + 240
        while time.time() < deadline:
            _, matches = _get(f"{server.url}/matches")
            if matches:
                break
            time.sleep(0.5)
        assert {m["created_at"]["slot_no"] for m in matches} == {100}
        # the chain forks: roll back to 90, then a different block at 95
        (seg_dir / "seg2.jsonl").write_text(
            _ogmios_bwd(90) + "\n" + _ogmios_fwd(95, "b" * 64, "addr1bbb") + "\n"
        )
        while time.time() < deadline:
            _, matches = _get(f"{server.url}/matches")
            slots = {m["created_at"]["slot_no"] for m in matches}
            if slots == {95}:
                break
            time.sleep(0.5)
        assert slots == {95}, f"retraction not applied, served slots: {slots}"
        assert {m["transaction_id"] for m in matches} == {"b" * 64}
        # DELETE /matches of a pattern still covered by the active set is
        # guarded (P13, Errors.stillActivePattern) — in follow mode too
        status, body = _request(f"{server.url}/matches/%2A", "DELETE")
        assert status == 400 and body["hint"].startswith("Cannot delete")
    finally:
        server.close()
    # restart AFTER the rollback: the resume tip must be the post-fork 95,
    # not the dead 100 — otherwise the next segments are silently dropped
    (seg_dir / "seg3.jsonl").write_text(_ogmios_fwd(97, "c" * 64, "addr1ccc") + "\n")
    server = main(
        [
            "--ogmios-file", str(seg_dir), "--workdir", str(tmp_path / "db"),
            "--follow", "--match", "*", "--gc-interval", "0", "--port", "0",
        ],
        serve_forever=False,
    )
    try:
        deadline = time.time() + 240
        while time.time() < deadline:
            _, matches = _get(f"{server.url}/matches")
            slots = {m["created_at"]["slot_no"] for m in matches}
            if slots == {95, 97}:
                break
            time.sleep(0.5)
        assert slots == {95, 97}, f"post-fork resume dropped blocks: {slots}"
        # a segment delivered AFTER server startup — the PUT backfill below
        # must replay it too (the backfill source is re-listed at PUT time;
        # the startup DataFrame's frozen file listing would lose slot 99)
        (seg_dir / "seg4.jsonl").write_text(_ogmios_fwd(99, "d" * 64, "addr1ddd") + "\n")
        while time.time() < deadline:
            _, matches = _get(f"{server.url}/matches")
            slots = {m["created_at"]["slot_no"] for m in matches}
            if slots == {95, 97, 99}:
                break
            time.sleep(0.5)
        assert slots == {95, 97, 99}, f"live segment not indexed: {slots}"
        # PUT /patterns routes through the LOG (rollback + install +
        # backfill land as commits the batch swaps preserve)
        status, active = _request(
            f"{server.url}/patterns", "PUT",
            json.dumps(
                {"rollback_to": {"slot_no": 95}, "patterns": ["*/*"]}
            ).encode(),
        )
        assert status == 200 and "*/*" in active
        _, matches = _get(f"{server.url}/matches")
        assert {m["created_at"]["slot_no"] for m in matches} == {95, 97, 99}
        # a live fork BELOW the resumed start (95): the retraction must
        # lower the ingest bound or the re-forwarded 94 is dropped forever
        (seg_dir / "seg5.jsonl").write_text(
            _ogmios_bwd(93) + "\n" + _ogmios_fwd(94, "e" * 64, "addr1eee") + "\n"
        )
        while time.time() < deadline:
            _, matches = _get(f"{server.url}/matches")
            slots = {m["created_at"]["slot_no"] for m in matches}
            if slots == {94}:
                break
            time.sleep(0.5)
        assert slots == {94}, f"fork below resume point mishandled: {slots}"
    finally:
        server.close()


@pytest.mark.slow
def test_follow_hydra_segments(tmp_path, spark):
    """--follow over Hydra ServerOutput segments: the committed fixture
    delivered one message per segment must converge to the same served
    matches as a one-shot batch build (snapshots are final — no
    retraction lane)."""
    import time
    from pathlib import Path

    from kupo_spark.operators.indexer import build_index
    from kupo_spark.sources.hydra import read_hydra_jsonl

    fixture = Path(__file__).resolve().parent.parent / "fixtures" / "hydra_serveroutput.ndjson"
    lines = fixture.read_text().splitlines()
    expected = {
        (r.created_at, r.transaction_id, r.output_index)
        for r in build_index(read_hydra_jsonl(spark, str(fixture))).inputs.select(
            "created_at", "transaction_id", "output_index"
        ).collect()
    }
    seg_dir = tmp_path / "segments"
    seg_dir.mkdir()
    (seg_dir / "seg-000.jsonl").write_text(lines[0] + "\n")
    server = main(
        [
            "--hydra-file", str(seg_dir), "--workdir", str(tmp_path / "db"),
            "--follow", "--since", "origin", "--match", "*",
            "--gc-interval", "0", "--port", "0",
        ],
        serve_forever=False,
    )
    try:
        for i, line in enumerate(lines[1:], start=1):
            (seg_dir / f"seg-{i:03d}.jsonl").write_text(line + "\n")
        deadline = time.time() + 240
        got: set = set()
        while time.time() < deadline:
            _, matches = _get(f"{server.url}/matches")
            got = {
                (m["created_at"]["slot_no"], m["transaction_id"], m["output_index"])
                for m in matches
            }
            if got == expected:
                break
            time.sleep(0.5)
        assert got == expected, f"served {len(got)} vs batch {len(expected)}"
    finally:
        server.close()


@pytest.mark.slow
def test_follow_compacts_and_truncates(tmp_path):
    """--follow --gc-interval N: the in-body compaction folds the log into
    the base AND truncates the folded partitions — storage bounded by the
    compaction horizon — while the served index stays correct, and a
    restart resumes over base + truncated log."""
    import time

    seg_dir = tmp_path / "segments"
    seg_dir.mkdir()
    (seg_dir / "seg1.jsonl").write_text(_ogmios_fwd(100, "a" * 64, "addr1aaa") + "\n")
    server = main(
        [
            "--ogmios-file", str(seg_dir), "--workdir", str(tmp_path / "db"),
            "--follow", "--since", "origin", "--match", "*",
            "--gc-interval", "1", "--port", "0",
        ],
        serve_forever=False,
    )
    try:
        deadline = time.time() + 240
        expect = {100}
        for slot, tx in ((110, "b"), (120, "c"), (130, "d")):
            while time.time() < deadline:
                _, matches = _get(f"{server.url}/matches")
                if {m["created_at"]["slot_no"] for m in matches} == expect:
                    break
                time.sleep(0.5)
            assert {m["created_at"]["slot_no"] for m in matches} == expect
            time.sleep(1.1)  # make the next batch cross the gc interval
            (seg_dir / f"seg_{slot}.jsonl").write_text(
                _ogmios_fwd(slot, tx * 64, f"addr1{tx * 3}") + "\n"
            )
            expect = expect | {slot}
        while time.time() < deadline:
            _, matches = _get(f"{server.url}/matches")
            if {m["created_at"]["slot_no"] for m in matches} == expect:
                break
            time.sleep(0.5)
        ix = server._streaming
        base_seq = ix._base_seq()
        assert base_seq is not None, "in-body compaction never ran"
        for a in ix._table("produced").snapshot().files:
            assert int(a["partitionValues"]["batch_seq"]) > base_seq, (
                "folded log partition not truncated"
            )
    finally:
        server.close()
    # restart over base + truncated log: full state must come back
    server = main(
        [
            "--ogmios-file", str(seg_dir), "--workdir", str(tmp_path / "db"),
            "--follow", "--match", "*", "--gc-interval", "0", "--port", "0",
        ],
        serve_forever=False,
    )
    try:
        _, matches = _get(f"{server.url}/matches")
        assert {m["created_at"]["slot_no"] for m in matches} == {100, 110, 120, 130}
    finally:
        server.close()


def test_follow_since_point_not_yet_delivered(tmp_path):
    """--follow --since SLOT.HASH where the bridge has not delivered that
    slot yet: startup must NOT fail the point assertion (the reference
    validates the intersection against the node's chain, not local files)
    — the stream simply begins once the segment arrives.  A hash that
    CONTRADICTS an already-delivered block still fails."""
    import time

    seg_dir = tmp_path / "segments"
    seg_dir.mkdir()
    (seg_dir / "seg1.jsonl").write_text(_ogmios_fwd(100, "a" * 64, "addr1aaa") + "\n")
    # slot 120 is in the future of the delivered chain — must start up
    server = main(
        [
            "--ogmios-file", str(seg_dir), "--workdir", str(tmp_path / "db"),
            "--follow", "--since", f"120.{120:064x}", "--match", "*",
            "--gc-interval", "0", "--port", "0",
        ],
        serve_forever=False,
    )
    try:
        (seg_dir / "seg2.jsonl").write_text(_ogmios_fwd(120, "b" * 64, "addr1bbb") + "\n")
        deadline = time.time() + 240
        slots: set = set()
        while time.time() < deadline:
            _, matches = _get(f"{server.url}/matches")
            slots = {m["created_at"]["slot_no"] for m in matches}
            if slots == {120}:
                break
            time.sleep(0.5)
        # the bound is inclusive at 120: slot 100 stays out, 120 indexes
        assert slots == {120}, f"since-point bound wrong: {slots}"
    finally:
        server.close()
    # a delivered slot with a DIFFERENT header hash still fails fast
    import pytest as _pytest

    with _pytest.raises(SystemExit, match="no such point"):
        main(
            [
                "--ogmios-file", str(seg_dir), "--workdir", str(tmp_path / "db2"),
                "--follow", "--since", f"100.{'f' * 64}", "--match", "*",
                "--gc-interval", "0", "--port", "0",
            ],
            serve_forever=False,
        )


def test_follow_in_stream_point_mismatch_surfaces(tmp_path):
    """A deferred --since point whose slot later arrives with a DIFFERENT
    hash fails the stream, and the failure is VISIBLE: /health flips to
    disconnected (the health-check probe exits non-zero on it)."""
    import time

    seg_dir = tmp_path / "segments"
    seg_dir.mkdir()
    (seg_dir / "seg1.jsonl").write_text(_ogmios_fwd(100, "a" * 64, "addr1aaa") + "\n")
    server = main(
        [
            "--ogmios-file", str(seg_dir), "--workdir", str(tmp_path / "db"),
            "--follow", "--since", f"120.{'e' * 64}", "--match", "*",
            "--gc-interval", "0", "--port", "0",
        ],
        serve_forever=False,
    )
    try:
        # slot 120 arrives carrying a different header than the point's
        (seg_dir / "seg2.jsonl").write_text(_ogmios_fwd(120, "b" * 64, "addr1bbb") + "\n")
        deadline = time.time() + 240
        status = "connected"
        while time.time() < deadline:
            _, health = _get(f"{server.url}/health")
            status = health["connection_status"]
            if status == "disconnected":
                break
            time.sleep(0.5)
        assert status == "disconnected", "dead stream not surfaced in /health"
        q = server._stream_query
        assert q.exception() is not None and "not on the chain" in str(q.exception())
    finally:
        server.close()


def test_follow_delete_matches_survives_swap_and_restart(tmp_path):
    """DELETE /matches during --follow (reference supports it live,
    Http.hs:686-704): the delete lands as a LOG record (retraction-as-
    data), so it survives the next batch swap AND a restart; the P13
    guard still refuses patterns covered by the active set."""
    import time

    from kupo_spark import chainspec as cs

    a_addr, b_addr = cs.address_of(42), cs.address_of(43)
    seg_dir = tmp_path / "segments"
    seg_dir.mkdir()
    (seg_dir / "seg1.jsonl").write_text(
        _ogmios_fwd(100, "a" * 64, a_addr) + "\n"
        + _ogmios_fwd(110, "b" * 64, b_addr) + "\n"
    )
    args = [
        "--ogmios-file", str(seg_dir), "--workdir", str(tmp_path / "db"),
        "--follow", "--match", a_addr, "--match", b_addr,
        "--gc-interval", "0", "--port", "0",
    ]
    server = main(["--since", "origin", *args], serve_forever=False)
    try:
        deadline = time.time() + 240
        slots = set()
        while time.time() < deadline:
            _, matches = _get(f"{server.url}/matches")
            slots = {m["created_at"]["slot_no"] for m in matches}
            if slots == {100, 110}:
                break
            time.sleep(0.5)
        assert slots == {100, 110}
        # still-active pattern: guarded, follow mode included
        status, body = _request(f"{server.url}/matches/{a_addr}", "DELETE")
        assert status == 400 and body["hint"].startswith("Cannot delete")
        # deactivate the pattern, then purge its matches through the log
        status, body = _request(f"{server.url}/patterns/{a_addr}", "DELETE")
        assert status == 200 and body["deleted"] == 1
        status, body = _request(f"{server.url}/matches/{a_addr}", "DELETE")
        assert status == 200 and body["deleted"] == 1
        _, matches = _get(f"{server.url}/matches")
        assert {m["created_at"]["slot_no"] for m in matches} == {110}
        # the NEXT batch swap must preserve the delete (the old in-memory
        # rewrite would have been silently reverted here)
        (seg_dir / "seg2.jsonl").write_text(_ogmios_fwd(120, "c" * 64, b_addr) + "\n")
        while time.time() < deadline:
            _, matches = _get(f"{server.url}/matches")
            slots = {m["created_at"]["slot_no"] for m in matches}
            if slots == {110, 120}:
                break
            time.sleep(0.5)
        assert slots == {110, 120}, f"delete reverted by batch swap: {slots}"
    finally:
        server.close()
    # restart: the catalog is the durable record — the deleted rows and the
    # removed pattern both stay gone
    server = main(
        [*args[:5], "--match", b_addr, "--gc-interval", "0", "--port", "0"],
        serve_forever=False,
    )
    try:
        _, matches = _get(f"{server.url}/matches")
        assert {m["created_at"]["slot_no"] for m in matches} == {110, 120}
        _, pats = _get(f"{server.url}/patterns")
        assert pats == [b_addr]
    finally:
        server.close()


def test_follow_rejects_out_of_order_segments(tmp_path):
    """The bridge contract (natural-sorted names == arrival order) is
    ENFORCED, not just documented: a segment whose natural-sort key is
    below an already-processed one (mtime disagreeing with name order —
    backfilled copies, rsync, coarse timestamps) fails the stream loudly
    instead of applying rollbacks against the wrong prefix (ADVICE r4)."""
    import time

    seg_dir = tmp_path / "segments"
    seg_dir.mkdir()
    (seg_dir / "seg-10.jsonl").write_text(_ogmios_fwd(100, "a" * 64, "addr1aaa") + "\n")
    server = main(
        [
            "--ogmios-file", str(seg_dir), "--workdir", str(tmp_path / "db"),
            "--follow", "--since", "origin", "--match", "*",
            "--gc-interval", "0", "--port", "0",
        ],
        serve_forever=False,
    )
    try:
        deadline = time.time() + 240
        while time.time() < deadline:
            _, matches = _get(f"{server.url}/matches")
            if matches:
                break
            time.sleep(0.5)
        assert {m["created_at"]["slot_no"] for m in matches} == {100}
        # seg-9 arrives AFTER seg-10 (newer mtime, lower natural key):
        # the stream must die, not index it
        (seg_dir / "seg-9.jsonl").write_text(
            _ogmios_fwd(105, "b" * 64, "addr1bbb") + "\n"
        )
        status = "connected"
        while time.time() < deadline:
            _, health = _get(f"{server.url}/health")
            status = health["connection_status"]
            if status == "disconnected":
                break
            time.sleep(0.5)
        assert status == "disconnected", "out-of-order segment not surfaced"
        q = server._stream_query
        assert q.exception() is not None
        assert "out of natural-name order" in str(q.exception())
    finally:
        server.close()


def test_gardener_loop_prunes(index, monkeypatch):
    """--gc-interval wires the gardener: a tick swaps in the GC'd index."""
    import threading

    from kupo_spark.cli import _gardener
    from kupo_spark.operators.gardener import run_gc

    class _Srv:
        def __init__(self):
            self.index = index
            self._lock = threading.RLock()
            self._mutation_lock = threading.RLock()
            self.swapped = None

        def _swap_index(self, nxt):
            self.swapped = nxt

    srv = _Srv()
    stop = threading.Event()
    t = threading.Thread(target=_gardener, args=(srv, 0.05, True, stop))
    t.start()
    try:
        for _ in range(200):
            if srv.swapped is not None:
                break
            stop.wait(0.05)
    finally:
        stop.set()
        t.join(timeout=30)
    assert srv.swapped is not None
    assert srv.swapped.inputs.count() == run_gc(index).inputs.count()


# ---- writer-lock lifecycle end-to-end (VERDICT r6 #6) ---------------------


def _spawn_cli(workdir: str) -> "subprocess.Popen":
    """A REAL `kupo run` process: syncs the sf0.001 events dir into the
    workdir (acquiring the writer flock), serves, and loops until
    signalled.  Returns once the server is listening."""
    import subprocess
    import sys
    import threading

    script = (
        "import sys\n"
        "sys.path.insert(0, '/root/repo')\n"
        "from kupo_spark.cli import main\n"
        f"main(['run', '--events', {SF_DIR!r}, '--workdir', {workdir!r},"
        " '--since', 'origin', '--match', '*', '--port', '0',"
        " '--gc-interval', '0'], serve_forever=True)\n"
    )
    p = subprocess.Popen(
        [sys.executable, "-c", script],
        stdout=subprocess.DEVNULL,
        stderr=subprocess.PIPE,
        text=True,
    )
    up = threading.Event()

    def scan():
        for line in p.stderr:
            if "listening on" in line:
                up.set()

    threading.Thread(target=scan, daemon=True).start()
    assert up.wait(timeout=180), "CLI subprocess never came up"
    return p


@pytest.mark.slow
def test_cli_writer_lock_crash_restart_and_clean_exit(tmp_path, spark):
    """run → kill -9 → rerun: the crashed holder's kernel flock is
    auto-released, so the successor acquires through the dead-holder path
    with the fence advanced — no manual lock removal, no pid heuristic.
    Then: SIGINT'd clean shutdown releases and leaves NO lockfile."""
    import os
    import signal
    import time

    wd = tmp_path / "db"
    lock = wd / "_writer.lock"

    # ---- crash: SIGKILL while holding -------------------------------------
    p = _spawn_cli(str(wd))
    assert lock.exists()
    crashed = json.loads(lock.read_text())
    assert crashed["pid"] == p.pid
    p.send_signal(signal.SIGKILL)
    p.wait(timeout=30)
    assert lock.exists()  # the payload file survives the crash ...

    # ---- restart: acquires via the released flock, fence advances ---------
    server = main(
        [
            "run", "--events", SF_DIR, "--workdir", str(wd),
            "--since", "origin", "--match", "*", "--port", "0",
            "--gc-interval", "0",
        ],
        serve_forever=False,
    )
    try:
        taken = json.loads(lock.read_text())
        assert taken["pid"] == os.getpid()
        assert taken["fence"] > crashed["fence"]
        status, rows = _get(f"{server.url}/matches")
        assert status == 200 and len(rows) > 0
    finally:
        server.close()
        # release what THIS process took (the serve_forever finally does
        # this on the real path, exercised below by the SIGINT subprocess)
        from kupo_spark.table import WriterLock

        WriterLock(lock).acquire().release()

    # ---- clean exit: SIGINT → shutdown path → no lockfile -----------------
    p2 = _spawn_cli(str(wd))
    assert lock.exists()
    p2.send_signal(signal.SIGINT)
    assert p2.wait(timeout=60) == 0
    deadline = time.time() + 5
    while lock.exists() and time.time() < deadline:
        time.sleep(0.1)
    assert not lock.exists(), "clean exit must remove the writer lock"


def _raw_get(url_base: str, path: str):
    """Fresh-connection GET returning (status, headers, body) — a new
    connection each call so the kernel re-hashes across the front's
    SO_REUSEPORT accept queues."""
    import http.client

    host, port = url_base.split("//")[1].rsplit(":", 1)
    conn = http.client.HTTPConnection(host, int(port), timeout=120)
    try:
        conn.request("GET", path)
        r = conn.getresponse()
        return r.status, dict(r.getheaders()), r.read()
    finally:
        conn.close()


@pytest.mark.slow
def test_front_workers_serve_point_lookups_across_swap(tmp_path):
    """--front-workers N (VERDICT r8 #3): the SO_REUSEPORT front is the
    CLI's public listener.  A point lookup first proxies to the primary
    (which records the hot path); after a follow-mode index swap the
    worker generation rolls onto the NEW snapshot's rendered bodies, so
    subsequent lookups are answered in-process by the forked workers
    (X-Worker-Pid spread across >1 pid) with the post-swap checkpoint."""
    import os
    import http.client
    import time

    from kupo_spark import chainspec as cs

    addr = cs.address_of(42)
    seg_dir = tmp_path / "segments"
    seg_dir.mkdir()
    (seg_dir / "seg1.jsonl").write_text(_ogmios_fwd(100, "a" * 32, addr) + "\n")
    server = main(
        [
            "--ogmios-file", str(seg_dir), "--workdir", str(tmp_path / "db"),
            "--follow", "--since", "origin", "--match", "*",
            "--gc-interval", "0", "--port", "0", "--front-workers", "3",
        ],
        serve_forever=False,
    )
    front = server._front
    assert front is not None and front.url != server.url
    point = f"/matches/*@{'a' * 32}"
    try:
        # 1. unrendered path: proxied through to the Spark-owning primary
        s, hdrs, body = _raw_get(front.url, point)
        assert s == 200 and json.loads(body)
        assert "X-Worker-Pid" not in hdrs  # proxy, not a front render
        # mutations + misc routes flow through the front too
        s, pats = _get(f"{front.url}/patterns")
        assert s == 200 and pats == ["*"]
        # 2. deliver a new segment -> micro-batch commit -> index swap ->
        # _swap_index rolls the front generation onto the new snapshot
        (seg_dir / "seg2.jsonl").write_text(
            _ogmios_fwd(110, "b" * 32, addr) + "\n"
        )
        deadline = time.time() + 240
        pids: set[int] = set()
        while time.time() < deadline:
            try:
                s, hdrs, body = _raw_get(front.url, point)
            except (ConnectionError, http.client.HTTPException, OSError):
                # the loop spans a worker-generation roll: a fresh
                # connection can land in a retiring worker's backlog and
                # be closed without a response (the bounded roll window a
                # real client retries through) — keep polling
                time.sleep(0.3)
                continue
            assert s == 200 and json.loads(body)
            if (
                "X-Worker-Pid" in hdrs
                and int(hdrs.get("X-Most-Recent-Checkpoint", 0)) >= 110
            ):
                pids.add(int(hdrs["X-Worker-Pid"]))
                if len(pids) > 1:
                    break
            time.sleep(0.3)
        # served by >1 forked worker, all of the CURRENT generation, none
        # of them this (driver) process — and from the post-swap snapshot
        assert len(pids) > 1, f"front never spread post-swap: {pids}"
        assert pids <= set(front._pids)
        assert os.getpid() not in pids
    finally:
        server.close()
    assert front._pids == []  # close() reaped the worker generation


def test_longest_rollback_flag_drives_nondefault_horizon(index):
    """--longest-rollback (reference Options.hs:149) reaches build_index's
    M4 horizon end-to-end (VERDICT r10 #6): under a NON-default K, spent
    rows deeper than tip-K are dropped at ingest while rows at or inside
    the window — boundary included (distance == K is not > K) — stay
    MARKED."""
    from pyspark.sql import functions as F

    from kupo_spark.chainspec import LONGEST_ROLLBACK

    full = index.inputs
    tip = index.checkpoints.agg(F.max("slot_no")).collect()[0][0]
    # land the horizon ON an actual spend slot (so the >= boundary is
    # exercised), mid-chain — the resulting K is far smaller than the
    # default chainspec K (which exceeds this fixture's whole chain, so
    # only the override can make M4 prune at all here)
    horizon = (
        full.where(F.col("spent_at") <= tip - 40)
        .agg(F.max("spent_at"))
        .collect()[0][0]
    )
    k = tip - horizon
    assert k != LONGEST_ROLLBACK
    server = main(
        [
            "--events", SF_DIR, "--in-memory", "--since", "origin",
            "--match", "*", "--gc-interval", "0", "--port", "0",
            "--prune-utxo", "--longest-rollback", str(k),
        ],
        serve_forever=False,
    )
    try:
        spent = server.index.inputs.where(F.col("spent_at").isNotNull())
        # something was actually prunable at this depth, and it is gone
        assert full.where(F.col("spent_at") < horizon).count() > 0
        assert spent.where(F.col("spent_at") < horizon).count() == 0
        # boundary rows exist by construction and survive (>=, not >)
        assert full.where(F.col("spent_at") == horizon).count() > 0
        assert spent.count() == full.where(F.col("spent_at") >= horizon).count()
    finally:
        server.close()
