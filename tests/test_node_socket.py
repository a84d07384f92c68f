"""Node-socket transport (S1): mux segment framing, chain-sync CBOR codec,
elastic pipelining, and end-to-end equality with the file-replay path.

Reference: the pipelined node client in ``src/Kupo/App/ChainSync/Node.hs``
(50-167) and the elastic window policy in ``src/Kupo/Data/ChainSync.hs``
(70-73)."""

from __future__ import annotations

import json
import socket
import threading

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from kupo_spark import cbor
from kupo_spark.oracle_sources import OGMIOS_SEGMENTS
from kupo_spark.sources import node as N


# ---------------------------------------------------------------------------
# mux framing + codec
# ---------------------------------------------------------------------------


def test_mux_roundtrip_multi_segment():
    """A >64 KiB CBOR message must split into several mux segments and
    reassemble; a burst of small messages sharing the stream must peel off
    one at a time."""
    a, b = socket.socketpair()
    big = cbor.mk_array([cbor.mk_uint(N.MSG_ROLL_FORWARD), cbor.mk_bytes(b"x" * 200_000)])
    small = cbor.mk_array([cbor.mk_uint(N.MSG_REQUEST_NEXT)])
    N.mux_send(a, cbor.encode(big), responder=True)
    for _ in range(3):
        N.mux_send(a, cbor.encode(small), responder=False)
    a.close()
    reader = N.MuxReader(b)
    first = reader.recv_msg()
    assert first[0] == N.MSG_ROLL_FORWARD and len(first[1]) == 200_000
    assert [reader.recv_msg() for _ in range(3)] == [[N.MSG_REQUEST_NEXT]] * 3
    assert reader.recv_msg() is None  # clean EOF
    b.close()


def test_block_json_cbor_roundtrip_fixture():
    """Every fixture block survives JSON -> CBOR-in-CBOR -> JSON exactly
    (the payload a real node ships opaque; here it carries the canonical
    document)."""
    from kupo_spark.sources.ogmios import segment_order

    blocks = []
    for seg in segment_order(OGMIOS_SEGMENTS):
        for ln in open(seg):
            if ln.strip():
                r = json.loads(ln)["result"]
                if r.get("direction") == "forward":
                    blocks.append(r["block"])
    assert blocks
    for blk in blocks:
        assert N._block_from_node(cbor.decode(N._block_to_bytes(blk))) == blk


def test_block_json_cbor_roundtrip_edge_values():
    """Empty map vs empty list, bools, null, negative ints and floats all
    round-trip (to_plain alone conflates {} and []; the node-kind decoder
    must not)."""
    blk = {
        "emptyMap": {},
        "emptyList": [],
        "flags": [True, False, None],
        "neg": -42,
        "big": 2**63 - 1,
        "pi": 3.140625,
        "nested": {"a": [{"b": {}}]},
    }
    assert N._block_from_node(cbor.decode(N._block_to_bytes(blk))) == blk


def test_elastic_window_policy():
    """The reference's distance-based pipelining (ChainSync.hs:70-73)."""
    assert N.max_in_flight(1_000_000) == 100
    assert N.max_in_flight(6001) == 100
    assert N.max_in_flight(6000) == 5
    assert N.max_in_flight(1001) == 5
    assert N.max_in_flight(1000) == 1
    assert N.max_in_flight(0) == 1


class _FakeSock:
    """A pre-recorded byte stream standing in for a connected socket, so
    the mux reassembly property can exercise arbitrary (adversarial)
    segment boundaries without socket-buffer coupling."""

    def __init__(self, data: bytes):
        import io

        self._data = io.BytesIO(data)

    def makefile(self, mode):
        return self._data


_msg_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=7),
        st.binary(min_size=0, max_size=200_000),
    ),
    min_size=1,
    max_size=5,
)


@settings(max_examples=30, deadline=None)
@given(msgs=_msg_strategy, data=st.data())
def test_mux_reassembly_any_segmentation(msgs, data):
    """Property: CBOR messages survive ANY segmentation of the byte stream
    into <=65535-byte mux segments — cuts mid-head, mid-payload, across
    message boundaries, empty-payload segments included."""
    stream = b"".join(
        cbor.encode(cbor.mk_array([cbor.mk_uint(w), cbor.mk_bytes(b)]))
        for w, b in msgs
    )
    frames, pos = b"", 0
    while pos < len(stream):
        cut = data.draw(
            st.integers(min_value=1, max_value=min(N._MAX_SEGMENT, len(stream) - pos))
        )
        chunk = stream[pos : pos + cut]
        pos += cut
        frames += __import__("struct").pack(">IHH", 0, N.PROTO_CHAIN_SYNC, len(chunk)) + chunk
    reader = N.MuxReader(_FakeSock(frames))
    got = [reader.recv_msg() for _ in msgs]
    assert got == [[w, b] for w, b in msgs]
    assert reader.recv_msg() is None


_json_scalars = st.one_of(
    st.none(),
    st.booleans(),
    st.integers(min_value=-(2**64), max_value=2**64 - 1),
    st.floats(allow_nan=False),
    st.text(max_size=40),
)
_json_docs = st.recursive(
    _json_scalars,
    lambda inner: st.one_of(
        st.lists(inner, max_size=4),
        st.dictionaries(st.text(max_size=10), inner, max_size=4),
    ),
    max_leaves=25,
)


@settings(max_examples=100, deadline=None)
@given(doc=st.dictionaries(st.text(max_size=10), _json_docs, max_size=4))
def test_block_payload_roundtrip_property(doc):
    """Property: any JSON document rides the CBOR-in-CBOR block payload
    exactly — nesting, unicode keys, 64-bit ints, finite floats, and the
    {}-vs-[] distinction."""
    assert N._block_from_node(cbor.decode(N._block_to_bytes(doc))) == doc


# ---------------------------------------------------------------------------
# pipelining (proven against a raw server, like the WS window test)
# ---------------------------------------------------------------------------


def test_client_pipelines_elastic_window(tmp_path):
    """Far from tip, the client must prime the FULL 100-deep window before
    any response arrives — proven by a server that reads all 100 requests
    first.  After responses put the cursor inside the 6000-slot band the
    shrunken window admits NO refills (in_flight is already above it)."""
    sock_path = str(tmp_path / "node.sock")
    srv = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
    srv.bind(sock_path)
    srv.listen(1)
    seen_before_reply: list[int] = []
    refills_after: list[int] = []

    def server():
        conn, _ = srv.accept()
        reader = N.MuxReader(conn)

        def reply(node):
            N.mux_send(conn, cbor.encode(node), responder=True)

        find = reader.recv_msg()
        assert find[0] == N.MSG_FIND_INTERSECT
        tip = {"slot": 10_000, "id": "00" * 32, "height": 1}
        reply(cbor.mk_array([
            cbor.mk_uint(N.MSG_INTERSECT_FOUND),
            N._point_to_node(None),
            N._tip_to_node(tip),
        ]))
        pending = [reader.recv_msg() for _ in range(100)]
        assert all(m == [N.MSG_REQUEST_NEXT] for m in pending)
        seen_before_reply.append(len(pending))
        for i in range(5):
            blk = {"slot": 7000 + i, "id": f"{i:02x}" * 32, "height": i}
            reply(cbor.mk_array([
                cbor.mk_uint(N.MSG_ROLL_FORWARD),
                cbor.mk_tag(24, cbor.mk_bytes(N._block_to_bytes(blk))),
                N._tip_to_node(tip),
            ]))
        # distance is now 10000-7004 < 6000 with 95 still in flight, so
        # the client owes zero refills; FIN (not RST) ends the replay
        # without discarding the responses already in the socket
        conn.shutdown(socket.SHUT_WR)
        extra = 0
        while reader.recv_msg() is not None:
            extra += 1
        refills_after.append(extra)
        conn.close()

    t = threading.Thread(target=server, daemon=True)
    t.start()
    n = N.sync_via_node_socket(sock_path, str(tmp_path / "spool"), segment_lines=100)
    t.join(timeout=10)
    assert not t.is_alive()
    assert seen_before_reply == [100]
    assert refills_after == [0]
    assert n == 5
    srv.close()


# ---------------------------------------------------------------------------
# replay end-to-end over the committed fixtures
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def spooled(tmp_path_factory):
    spool = tmp_path_factory.mktemp("node-spool")
    server = N.NodeReplayServer(
        OGMIOS_SEGMENTS, str(tmp_path_factory.mktemp("sock") / "node.sock")
    ).start()
    try:
        n = N.sync_via_node_socket(server.socket_path, str(spool), segment_lines=3)
    finally:
        server.close()
    return spool, n


def test_node_sync_preserves_document_stream(spooled):
    """Every canonical document survives the CBOR wire byte-exactly, in
    order (forwards as CBOR-in-CBOR blocks, backwards as wire points)."""
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
    for d in want:
        d.pop("id", None)
    assert got == want and n == len(want)


def test_node_sync_index_matches_file_replay(spark, spooled):
    """The canonical batch view over the socket-spooled segments is
    row-identical to the one over the fixture directory."""
    from kupo_spark.sources.ogmios import canonical_blocks

    spool, _ = spooled
    via_socket = sorted(map(tuple, canonical_blocks(spark, str(spool)).collect()))
    via_files = sorted(map(tuple, canonical_blocks(spark, OGMIOS_SEGMENTS).collect()))
    assert via_socket == via_files
    assert via_socket


def test_node_resume_no_redelivery(tmp_path):
    """A restarted sync intersects at the last spooled block; the echo
    RollBackward is neither spooled nor counted, so repeated restarts
    leave the spool byte-identical (the follow loop's invariant)."""
    from kupo_spark.sources.ogmios import segment_order
    from kupo_spark.sources.ws import last_spooled_point

    spool = str(tmp_path / "spool")
    server = N.NodeReplayServer(OGMIOS_SEGMENTS, str(tmp_path / "node.sock")).start()
    try:
        n1 = N.sync_via_node_socket(server.socket_path, spool, segment_lines=3)
        segs_before = [(p.name, p.read_bytes()) for p in segment_order(spool)]
        n2 = N.sync_via_node_socket(
            server.socket_path, spool, points=last_spooled_point(spool), segment_lines=3
        )
        n3 = N.sync_via_node_socket(
            server.socket_path, spool, points=last_spooled_point(spool), segment_lines=3
        )
    finally:
        server.close()
    assert n1 > 0 and n2 == 0 and n3 == 0
    assert [(p.name, p.read_bytes()) for p in segment_order(spool)] == segs_before


def test_node_stale_spool_retracted_via_origin_rollback(spark, tmp_path):
    """A spool the node does not know falls back to the origin
    intersection; the protocol's RollBackward-to-origin echo is spooled
    (it is not the preferred resume point) and the canonical netting
    retracts the stale prefix."""
    from kupo_spark.sources.ogmios import canonical_blocks, segment_order
    from kupo_spark.sources.ws import last_spooled_point

    spool = tmp_path / "spool"
    spool.mkdir()
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
    (spool / "seg-000000.jsonl").write_text(json.dumps(stale) + "\n")
    server = N.NodeReplayServer(OGMIOS_SEGMENTS, str(tmp_path / "node.sock")).start()
    try:
        n = N.sync_via_node_socket(
            server.socket_path, str(spool), points=last_spooled_point(str(spool))
        )
    finally:
        server.close()
    docs = []
    for seg in segment_order(str(spool)):
        docs += [json.loads(ln) for ln in open(seg) if ln.strip()]
    assert any(
        d["result"].get("direction") == "backward" and d["result"].get("point") == "origin"
        for d in docs
    )
    assert n == len(docs) - 1
    got = sorted(map(tuple, canonical_blocks(spark, str(spool)).collect()))
    want = sorted(map(tuple, canonical_blocks(spark, OGMIOS_SEGMENTS).collect()))
    assert got == want


def test_node_intersection_not_found(tmp_path):
    """Unknown points raise IntersectionNotFound, the reference's restart
    signal (Node.hs:96-97)."""
    server = N.NodeReplayServer(OGMIOS_SEGMENTS, str(tmp_path / "node.sock")).start()
    try:
        with pytest.raises(N.IntersectionNotFound):
            N.sync_via_node_socket(
                server.socket_path,
                str(tmp_path / "spool"),
                points=[{"slot": 999_999, "id": "ff" * 32}],
            )
    finally:
        server.close()


def test_follow_via_node_socket_reconnect_loop(tmp_path):
    """The reconnecting follow loop: first connection drains the replay;
    reconnect cycles (the replay server closes each time) add nothing;
    the stop event ends the loop."""
    import os
    import time

    from kupo_spark.sources.ogmios import segment_order

    spool = str(tmp_path / "spool")
    server = N.NodeReplayServer(OGMIOS_SEGMENTS, str(tmp_path / "node.sock")).start()
    stop = threading.Event()
    t = threading.Thread(
        target=N.follow_via_node_socket,
        args=(server.socket_path, spool, stop, 0.05),
        daemon=True,
    )
    t.start()
    try:
        want = sum(
            1 for seg in segment_order(OGMIOS_SEGMENTS) for ln in open(seg) if ln.strip()
        )
        deadline = time.time() + 30
        got = 0
        while time.time() < deadline:
            if os.path.isdir(spool):
                got = sum(
                    1 for seg in segment_order(spool) for ln in open(seg) if ln.strip()
                )
            if got >= want:
                break
            time.sleep(0.1)
        assert got == want
        time.sleep(1.0)  # several reconnect cycles; the spool must not grow
        again = sum(1 for seg in segment_order(spool) for ln in open(seg) if ln.strip())
        assert again == want
    finally:
        stop.set()
        t.join(timeout=10)
        server.close()
    assert not t.is_alive()


def _get(url: str):
    import urllib.request

    with urllib.request.urlopen(url) as r:
        return r.status, json.loads(r.read())


def test_cli_follow_node_socket_converges(tmp_path):
    """--follow --node-socket: the socket feeds the live stream; the
    served index converges to the file-replay canonical view."""
    import time
    from pathlib import Path

    from kupo_spark.cli import main
    from kupo_spark.session import get_spark
    from kupo_spark.sources.ogmios import canonical_blocks, segment_order

    want = sum(
        1 for seg in segment_order(OGMIOS_SEGMENTS) for ln in open(seg) if ln.strip()
    )
    server = N.NodeReplayServer(OGMIOS_SEGMENTS, str(tmp_path / "node.sock")).start()
    cli = main(
        [
            "--node-socket", server.socket_path, "--workdir", str(tmp_path / "db"),
            "--follow", "--since", "origin", "--match", "*",
            "--gc-interval", "0", "--port", "0",
        ],
        serve_forever=False,
    )
    try:
        spark = get_spark("node-follow-check")
        n_expect = (
            canonical_blocks(spark, OGMIOS_SEGMENTS).selectExpr("explode(outputs)").count()
        )
        deadline = time.time() + 240
        spool = Path(tmp_path / "db" / "node-segments")
        got = 0
        while time.time() < deadline:
            n_spooled = (
                sum(1 for p in segment_order(str(spool)) for _ in open(p))
                if spool.is_dir()
                else 0
            )
            _, matches = _get(f"{cli.url}/matches")
            got = len(matches)
            if n_spooled >= want and got == n_expect:
                break
            time.sleep(0.5)
        assert got == n_expect
    finally:
        cli.close()
        server.close()


def test_cli_batch_node_socket_matches_file_replay(tmp_path, spark):
    """`run --node-socket` (batch): sync over the AF_UNIX socket, then
    serve an index identical to `run --ogmios-file` over the fixtures."""
    from kupo_spark.cli import main

    server = N.NodeReplayServer(OGMIOS_SEGMENTS, str(tmp_path / "node.sock")).start()
    try:
        via_node = main(
            [
                "--node-socket", server.socket_path,
                "--workdir", str(tmp_path / "n-db"),
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
        _, m_node = _get(f"{via_node.url}/matches")
        _, m_file = _get(f"{via_file.url}/matches")
        key = lambda m: (m["created_at"]["slot_no"], m["transaction_id"], m["output_index"])  # noqa: E731
        assert sorted(m_node, key=key) == sorted(m_file, key=key)
        assert m_node
    finally:
        via_node.close()
        via_file.close()
