"""Loopback WebSocket transport (S1/S2): RFC 6455 layer, pipelined
chain-sync client, and end-to-end equality with the file-replay path."""

from __future__ import annotations

import json
import socket
import threading
from pathlib import Path

import pytest

from kupo_spark.oracle_sources import OGMIOS_SEGMENTS
from kupo_spark.sources import ws as W


def test_ws_roundtrip_all_frame_sizes():
    """Client→server and server→client text frames across the 7-bit,
    16-bit and 64-bit length encodings, with masking on the client side."""
    srv = socket.socket()
    srv.bind(("127.0.0.1", 0))
    srv.listen(1)
    port = srv.getsockname()[1]
    got: list[str] = []

    def server():
        conn, _ = srv.accept()
        wsrv = W._ws_accept(conn)
        for _ in range(3):
            msg = wsrv.recv_text()
            got.append(msg)
            wsrv.send_text(msg[::-1])
        wsrv.close()

    t = threading.Thread(target=server, daemon=True)
    t.start()
    cli = W.ws_connect("127.0.0.1", port)
    for payload in ("tiny", "x" * 1000, "y" * 70000):
        cli.send_text(payload)
        assert cli.recv_text() == payload[::-1]
    assert cli.recv_text() is None  # clean close
    cli.close()
    t.join(timeout=5)
    assert [len(g) for g in got] == [4, 1000, 70000]
    srv.close()


def test_handshake_does_not_swallow_first_frame():
    """The peer's first frame may arrive in the SAME TCP segment as the
    handshake bytes; the handshake's buffered reader pre-fetches it and
    must hand it to the connection, not drop it.  Forced deterministically
    here by writing handshake + first frame in one sendall, both
    directions (a Hydra node pushes unprompted; our Ogmios client sends
    findIntersection without waiting)."""
    # server -> client: 101 response and a text frame share one write
    srv = socket.socket()
    srv.bind(("127.0.0.1", 0))
    srv.listen(1)
    port = srv.getsockname()[1]
    server_got: list[str] = []

    def server():
        conn, _ = srv.accept()
        f = conn.makefile("rb")
        f.readline()
        key = None
        while True:
            line = f.readline().strip()
            if not line:
                break
            k, _, v = line.partition(b":")
            if k.strip().lower() == b"sec-websocket-key":
                key = v.strip().decode()
        resp = (
            "HTTP/1.1 101 Switching Protocols\r\nUpgrade: websocket\r\n"
            f"Connection: Upgrade\r\nSec-WebSocket-Accept: {W._accept_key(key)}\r\n\r\n"
        ).encode()
        frame = bytes([0x81, 5]) + b"hello"  # unmasked server text frame
        conn.sendall(resp + frame)  # ONE write: the race, made certain
        wsrv = W.WsConn(conn, masked=False, rfile=f)
        server_got.append(wsrv.recv_text())
        wsrv.close()

    t = threading.Thread(target=server, daemon=True)
    t.start()
    cli = W.ws_connect("127.0.0.1", port)
    assert cli.recv_text() == "hello"
    cli.send_text("world")
    cli.close()
    t.join(timeout=5)
    assert server_got == ["world"]
    srv.close()

    # client -> server: upgrade request and a masked frame share one write
    srv = socket.socket()
    srv.bind(("127.0.0.1", 0))
    srv.listen(1)
    port = srv.getsockname()[1]
    accepted_got: list[str] = []

    def server2():
        conn, _ = srv.accept()
        wsrv = W._ws_accept(conn)
        accepted_got.append(wsrv.recv_text())
        wsrv.close()

    t = threading.Thread(target=server2, daemon=True)
    t.start()
    import base64
    import os as _os

    raw = socket.create_connection(("127.0.0.1", port))
    key = base64.b64encode(_os.urandom(16)).decode()
    req = (
        f"GET / HTTP/1.1\r\nHost: x\r\nUpgrade: websocket\r\n"
        f"Connection: Upgrade\r\nSec-WebSocket-Key: {key}\r\n"
        "Sec-WebSocket-Version: 13\r\n\r\n"
    ).encode()
    mask = b"\x01\x02\x03\x04"
    payload = W._mask(b"early", mask)
    frame = bytes([0x81, 0x80 | 5]) + mask + payload
    raw.sendall(req + frame)  # ONE write
    t.join(timeout=5)
    assert accepted_got == ["early"]
    raw.close()
    srv.close()


def test_client_pipelines_full_window(tmp_path):
    """The client must prime `window` nextBlock requests BEFORE any
    response arrives (Ogmios.hs:48-75) — proven by a server that reads the
    whole window first and only then starts answering."""
    window = 20
    srv = socket.socket()
    srv.bind(("127.0.0.1", 0))
    srv.listen(1)
    port = srv.getsockname()[1]
    seen_before_reply: list[int] = []

    def server():
        conn, _ = srv.accept()
        wsrv = W._ws_accept(conn)
        find = json.loads(wsrv.recv_text())
        assert find["method"] == "findIntersection"
        wsrv.send_text(json.dumps({
            "jsonrpc": "2.0", "method": "findIntersection", "id": find["id"],
            "result": {"intersection": "origin", "tip": "origin"},
        }))
        pending = [json.loads(wsrv.recv_text()) for _ in range(window)]
        seen_before_reply.append(len(pending))  # all in flight, none answered
        for req in pending[:5]:
            wsrv.send_text(json.dumps({
                "jsonrpc": "2.0", "method": "nextBlock", "id": req["id"],
                "result": {"direction": "backward", "point": "origin",
                           "tip": "origin"},
            }))
        # drain the 5 refills the client owes, then end the replay
        for _ in range(5):
            wsrv.recv_text()
        wsrv.close()

    t = threading.Thread(target=server, daemon=True)
    t.start()
    n = W.sync_via_ws(
        f"ws://127.0.0.1:{port}", spool_dir=str(tmp_path / "spool"),
        window=window, segment_lines=1000,
    )
    t.join(timeout=10)
    assert seen_before_reply == [window]
    # the FIRST backward-to-origin is the protocol's echo of the requested
    # origin intersection — skipped, not spooled; the other four count
    assert n == 4
    srv.close()


@pytest.fixture(scope="module")
def spooled(tmp_path_factory):
    """Sync the committed Ogmios segments over a real loopback WebSocket
    into a spool directory."""
    spool = tmp_path_factory.mktemp("ws-spool")
    server = W.OgmiosReplayServer(OGMIOS_SEGMENTS).start()
    try:
        n = W.sync_via_ws(server.url, str(spool), window=100, segment_lines=7)
    finally:
        server.close()
    return spool, n


def test_ws_sync_preserves_document_stream(spooled):
    """Every document arrives, in canonical segment order."""
    from kupo_spark.sources.ogmios import segment_order

    spool, n = spooled
    want = []
    for seg in segment_order(OGMIOS_SEGMENTS):
        with open(seg) as fh:
            want += [json.loads(ln) for ln in fh if ln.strip()]
    got = []
    for seg in segment_order(str(spool)):
        with open(seg) as fh:
            got += [json.loads(ln) for ln in fh if ln.strip()]
    # the client echoes request ids into the spooled docs; ignore them
    for d in got:
        d.pop("id", None)
    for d in want:
        d.pop("id", None)
    assert got == want and n == len(want)


def test_ws_sync_index_matches_file_replay(spark, spooled):
    """VERDICT r4 #6 done-criterion: the canonical batch view built from
    the WS-spooled segments is row-identical to the one built from the
    committed fixture directory — same fork netting, same decode."""
    from kupo_spark.sources.ogmios import canonical_blocks

    spool, _ = spooled
    via_ws = canonical_blocks(spark, str(spool)).collect()
    via_files = canonical_blocks(spark, OGMIOS_SEGMENTS).collect()
    key = lambda r: (r["slot_no"], r["transaction_id"], r["output_index"])  # noqa: E731
    assert sorted(map(tuple, via_ws)) == sorted(map(tuple, via_files))
    assert via_ws  # non-empty replay


def _get(url: str):
    import urllib.request

    with urllib.request.urlopen(url) as r:
        return r.status, json.loads(r.read())


def test_cli_batch_ogmios_ws_matches_file_replay(tmp_path, spark):
    """`run --ogmios-ws` (batch): sync over the socket, then serve an index
    identical to `run --ogmios-file` over the fixture directory."""
    from kupo_spark.cli import main

    server = W.OgmiosReplayServer(OGMIOS_SEGMENTS).start()
    try:
        via_ws = main(
            [
                "--ogmios-ws", server.url, "--workdir", str(tmp_path / "ws-db"),
                "--since", "origin", "--match", "*", "--gc-interval", "0",
                "--port", "0",
            ],
            serve_forever=False,
        )
    finally:
        server.close()
    via_file = main(
        [
            "--ogmios-file", OGMIOS_SEGMENTS, "--workdir", str(tmp_path / "f-db"),
            "--since", "origin", "--match", "*", "--gc-interval", "0",
            "--port", "0",
        ],
        serve_forever=False,
    )
    try:
        _, m_ws = _get(f"{via_ws.url}/matches")
        _, m_file = _get(f"{via_file.url}/matches")
        key = lambda m: (m["created_at"]["slot_no"], m["transaction_id"], m["output_index"])  # noqa: E731
        assert sorted(m_ws, key=key) == sorted(m_file, key=key)
        assert m_ws
    finally:
        via_ws.close()
        via_file.close()


def test_cli_follow_ogmios_ws_converges(tmp_path):
    """--follow --ogmios-ws: the socket feeds the live stream; the served
    index converges to the file-replay canonical view (VERDICT r4 #6)."""
    import time

    from kupo_spark.cli import main
    from kupo_spark.sources.ogmios import segment_order

    want = sum(1 for seg in segment_order(OGMIOS_SEGMENTS) for _ in open(seg))
    server = W.OgmiosReplayServer(OGMIOS_SEGMENTS).start()
    cli = main(
        [
            "--ogmios-ws", server.url, "--workdir", str(tmp_path / "db"),
            "--follow", "--since", "origin", "--match", "*",
            "--gc-interval", "0", "--port", "0",
        ],
        serve_forever=False,
    )
    try:
        # wait for the stream to drain the replay into the served index
        deadline = time.time() + 240
        while time.time() < deadline:
            _, matches = _get(f"{cli.url}/matches")
            if matches and len(matches) >= 1:
                # compare against the canonical batch view's row count once
                # the spool has all documents
                from pathlib import Path

                spool = Path(tmp_path / "db" / "ws-segments")
                n_spooled = sum(
                    1 for p in spool.iterdir() for _ in open(p)
                ) if spool.exists() else 0
                if n_spooled >= want:
                    break
            time.sleep(0.5)
        assert time.time() < deadline, "ws follow never drained the replay"
        # one more settle loop: the last delivered batch must be indexed
        from kupo_spark.session import get_spark
        from kupo_spark.sources.ogmios import canonical_blocks

        spark = get_spark("ws-follow-check")
        expect = canonical_blocks(spark, OGMIOS_SEGMENTS)
        n_expect = expect.selectExpr("explode(outputs)").count()
        got = 0
        while time.time() < deadline:
            _, matches = _get(f"{cli.url}/matches")
            got = len(matches)
            if got == n_expect:
                break
            time.sleep(0.5)
        assert got == n_expect
    finally:
        cli.close()
        server.close()


def test_hydra_ws_push_stream_spools_verbatim(tmp_path):
    """Hydra push-mode replay: every ServerOutput line arrives verbatim,
    in order, across segment files."""
    from kupo_spark.oracle_sources import HYDRA_LOG

    server = W.HydraReplayServer(HYDRA_LOG).start()
    try:
        n = W.sync_hydra_ws(server.url, str(tmp_path / "spool"), segment_lines=2)
    finally:
        server.close()
    want = [ln for ln in open(HYDRA_LOG).read().splitlines() if ln.strip()]
    from kupo_spark.sources.ogmios import segment_order

    got = []
    for seg in segment_order(str(tmp_path / "spool")):
        got += [ln for ln in open(seg).read().splitlines() if ln.strip()]
    assert got == want and n == len(want)


def test_cli_batch_hydra_ws_matches_file_replay(tmp_path, spark):
    """`run --hydra-ws` serves the same /matches rows as --hydra-file over
    the committed ServerOutput log."""
    from kupo_spark.cli import main
    from kupo_spark.oracle_sources import HYDRA_LOG

    server = W.HydraReplayServer(HYDRA_LOG).start()
    try:
        via_ws = main(
            [
                "--hydra-ws", server.url, "--workdir", str(tmp_path / "ws-db"),
                "--since", "origin", "--match", "*", "--gc-interval", "0",
                "--port", "0",
            ],
            serve_forever=False,
        )
    finally:
        server.close()
    via_file = main(
        [
            "--hydra-file", HYDRA_LOG, "--workdir", str(tmp_path / "f-db"),
            "--since", "origin", "--match", "*", "--gc-interval", "0",
            "--port", "0",
        ],
        serve_forever=False,
    )
    try:
        _, m_ws = _get(f"{via_ws.url}/matches")
        _, m_file = _get(f"{via_file.url}/matches")
        key = lambda m: (m["created_at"]["slot_no"], m["transaction_id"], m["output_index"])  # noqa: E731
        assert sorted(m_ws, key=key) == sorted(m_file, key=key)
        assert m_ws
    finally:
        via_ws.close()
        via_file.close()


def test_ws_resume_no_redelivery(tmp_path):
    """A restarted sync intersects at the last spooled block: the server
    answers RollBackward to the intersection, then only blocks AFTER it —
    never re-delivering the spooled prefix (Ogmios.hs:88-120 resume).
    The echo RollBackward is received but NOT spooled (it carries zero
    information), so repeated restarts leave the spool byte-identical —
    the invariant the reconnecting follow loop relies on."""
    from kupo_spark.sources.ogmios import segment_order

    spool = str(tmp_path / "spool")
    server = W.OgmiosReplayServer(OGMIOS_SEGMENTS).start()
    try:
        n1 = W.sync_via_ws(server.url, spool, window=10, segment_lines=5)
        segs_before = [p.name for p in segment_order(spool)]
        # restart twice: resume from the spool each time
        n2 = W.sync_via_ws(
            server.url, spool, points=W.last_spooled_point(spool),
            window=10, segment_lines=5,
        )
        n3 = W.sync_via_ws(
            server.url, spool, points=W.last_spooled_point(spool),
            window=10, segment_lines=5,
        )
    finally:
        server.close()
    assert n1 > 0
    # each resume receives exactly the echo RollBackward, which is neither
    # spooled nor counted
    assert n2 == 0 and n3 == 0
    assert [p.name for p in segment_order(spool)] == segs_before


def test_ws_resume_canonical_view_unchanged(spark, tmp_path):
    """The RollBackward a resume spools nets out nothing: the canonical
    view over (original sync + resume) equals the fixture view."""
    from kupo_spark.sources.ogmios import canonical_blocks

    spool = str(tmp_path / "spool")
    server = W.OgmiosReplayServer(OGMIOS_SEGMENTS).start()
    try:
        W.sync_via_ws(server.url, spool, window=10, segment_lines=5)
        W.sync_via_ws(
            server.url, spool, points=W.last_spooled_point(spool),
            window=10, segment_lines=5,
        )
    finally:
        server.close()
    got = sorted(
        map(tuple, canonical_blocks(spark, spool).collect())
    )
    want = sorted(
        map(tuple, canonical_blocks(spark, OGMIOS_SEGMENTS).collect())
    )
    assert got == want


def test_ws_stale_spool_retracted_via_origin_rollback(spark, tmp_path):
    """A spool whose points the server does NOT know (a replaced/truncated
    upstream) must not survive a resume: the server falls back to the
    origin intersection and — per the chain-sync protocol — answers the
    first request with RollBackward to origin, which IS spooled (it is not
    the echo of the preferred resume point) so the canonical netting
    retracts the stale prefix and the view converges to the server's
    chain."""
    import json as _json

    from kupo_spark.sources.ogmios import canonical_blocks

    spool = str(tmp_path / "spool")
    # hand-spool a stale chain the replay server has never heard of
    stale_dir = Path(spool)
    stale_dir.mkdir(parents=True)
    stale = {
        "jsonrpc": "2.0",
        "method": "nextBlock",
        "result": {
            "direction": "forward",
            "tip": {"slot": 999, "id": "ee" * 32},
            "block": {
                "type": "praos", "era": "conway", "id": "ee" * 32,
                "slot": 999, "height": 1,
                "transactions": [{
                    "id": "dd" * 32, "spends": "inputs",
                    "inputs": [{"transaction": {"id": "0" * 64}, "index": 0}],
                    "outputs": [
                        {"address": "addr1x", "value": {"ada": {"lovelace": 1}}}
                    ],
                }],
            },
        },
    }
    (stale_dir / "seg-000000.jsonl").write_text(_json.dumps(stale) + "\n")
    server = W.OgmiosReplayServer(OGMIOS_SEGMENTS).start()
    try:
        n = W.sync_via_ws(
            server.url, spool, points=W.last_spooled_point(spool),
            window=10, segment_lines=5,
        )
    finally:
        server.close()
    # the origin rollback + the full replay were spooled
    docs = []
    from kupo_spark.sources.ogmios import segment_order

    for seg in segment_order(spool):
        docs += [_json.loads(ln) for ln in open(seg) if ln.strip()]
    backwards = [d for d in docs if d["result"].get("direction") == "backward"]
    assert any(d["result"].get("point") == "origin" for d in backwards)
    assert n == len(docs) - 1  # everything but the pre-existing stale doc
    # the canonical view over the spool equals the server's own chain —
    # the stale slot-999 block is gone
    got = sorted(map(tuple, canonical_blocks(spark, spool).collect()))
    want = sorted(map(tuple, canonical_blocks(spark, OGMIOS_SEGMENTS).collect()))
    assert got == want
    assert not any(r[0] == 999 for r in got)


def test_hydra_batch_rerun_is_idempotent(tmp_path):
    """A batch re-sync over the same spool skips the re-pushed history by
    the spooled count (the skip default), so re-running `run --hydra-ws`
    against one workdir never duplicates documents."""
    from kupo_spark.oracle_sources import HYDRA_LOG
    from kupo_spark.sources.ogmios import segment_order

    spool = str(tmp_path / "spool")
    server = W.HydraReplayServer(HYDRA_LOG).start()
    try:
        n1 = W.sync_hydra_ws(server.url, spool, segment_lines=2)
        n2 = W.sync_hydra_ws(server.url, spool, segment_lines=2)
    finally:
        server.close()
    want = [ln for ln in open(HYDRA_LOG).read().splitlines() if ln.strip()]
    got = []
    for seg in segment_order(spool):
        got += [ln for ln in open(seg).read().splitlines() if ln.strip()]
    assert got == want
    assert n1 == len(want) and n2 == len(want)  # received, not re-spooled


def test_cli_rejects_multiple_chain_sources(tmp_path):
    """Socket transports rewrite the file-source flags, so naming two
    sources must fail loudly BEFORE any transport spools — not after two
    follow loops have cross-contaminated a shared directory."""
    from kupo_spark.cli import main

    with pytest.raises(SystemExit, match="exactly one chain source"):
        main(
            [
                "--ogmios-ws", "ws://127.0.0.1:1", "--hydra-ws", "ws://127.0.0.1:2",
                "--workdir", str(tmp_path / "db"), "--since", "origin",
                "--match", "*", "--port", "0",
            ],
            serve_forever=False,
        )


def test_follow_via_ws_reconnect_loop(tmp_path):
    """The reconnecting follow loop: first connection syncs the replay;
    subsequent reconnects (replay server closes each time) add nothing;
    setting the stop event ends the loop."""
    import time

    from kupo_spark.sources.ogmios import segment_order

    spool = str(tmp_path / "spool")
    server = W.OgmiosReplayServer(OGMIOS_SEGMENTS).start()
    stop = threading.Event()
    t = threading.Thread(
        target=W.follow_via_ws,
        args=(server.url, spool, stop, 0.05),
        daemon=True,
    )
    t.start()
    try:
        deadline = time.time() + 30
        want = sum(
            1 for seg in segment_order(OGMIOS_SEGMENTS) for ln in open(seg) if ln.strip()
        )
        import os

        while time.time() < deadline:
            got = 0
            if os.path.isdir(spool):
                got = sum(
                    1 for seg in segment_order(spool) for ln in open(seg) if ln.strip()
                )
            if got >= want:
                break
            time.sleep(0.1)
        assert got == want
        # several reconnect cycles happen at 50 ms; the spool must not grow
        time.sleep(1.0)
        again = sum(1 for seg in segment_order(spool) for ln in open(seg) if ln.strip())
        assert again == want
    finally:
        stop.set()
        t.join(timeout=10)
        server.close()
    assert not t.is_alive()


def test_hydra_follow_skips_repushed_history(tmp_path):
    """follow_hydra_ws across reconnects: the re-pushed history is skipped
    by spooled count, so the spool holds each ServerOutput exactly once."""
    import time

    from kupo_spark.oracle_sources import HYDRA_LOG
    from kupo_spark.sources.ogmios import segment_order

    spool = str(tmp_path / "spool")
    server = W.HydraReplayServer(HYDRA_LOG).start()
    stop = threading.Event()
    t = threading.Thread(
        target=W.follow_hydra_ws, args=(server.url, spool, stop, 0.05), daemon=True
    )
    t.start()
    try:
        want = [ln for ln in open(HYDRA_LOG).read().splitlines() if ln.strip()]
        deadline = time.time() + 30
        import os

        while time.time() < deadline:
            got = []
            if os.path.isdir(spool):
                for seg in segment_order(spool):
                    got += [ln for ln in open(seg).read().splitlines() if ln.strip()]
            if len(got) >= len(want):
                break
            time.sleep(0.1)
        assert got == want
        time.sleep(1.0)  # reconnect cycles re-push history; must be skipped
        got2 = []
        for seg in segment_order(spool):
            got2 += [ln for ln in open(seg).read().splitlines() if ln.strip()]
        assert got2 == want
    finally:
        stop.set()
        t.join(timeout=10)
        server.close()
