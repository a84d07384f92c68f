"""Loopback node-socket transport for the chain-sync source (S1).

The reference's primary chain producer is a Cardano node reached over a
UNIX domain socket, speaking the node-to-client chain-sync mini-protocol:
CBOR-coded messages inside the network mux's segment framing, driven by a
pipelined client (``src/Kupo/App/ChainSync/Node.hs:50-167``).  The sandbox
has no Cardano node, but AF_UNIX sockets work — so this module implements
the transport for real and replays the committed chain fixtures behind it:

* **mux segment framing** (public ouroboros-network wire spec): each
  segment is an 8-byte header — u32 transmission-time (lower 32 bits of a
  microsecond clock), u16 mini-protocol number with the high bit carrying
  the responder direction, u16 payload length — followed by at most 65535
  payload bytes; one CBOR message may span several segments, so the reader
  reassembles a byte stream and decodes messages off its front;
* **chain-sync codec** (public ouroboros-network spec; the same message
  vocabulary the typed-protocol client in ``Node.hs`` consumes): messages
  are CBOR arrays tagged by a leading word —

  ====  =======================================
  0     MsgRequestNext
  1     MsgAwaitReply
  2     MsgRollForward  (block, tip)
  3     MsgRollBackward (point, tip)
  4     MsgFindIntersect ([point])
  5     MsgIntersectFound (point, tip)
  6     MsgIntersectNotFound (tip)
  7     MsgDone
  ====  =======================================

  where ``point`` is ``[]`` (origin) or ``[slot, headerHash-bytes]`` and
  ``tip`` is ``[point, blockHeight]``.  RollForward's block rides as
  CBOR-in-CBOR (tag 24 around the serialized block), the way the node
  ships opaque era blocks;
* :class:`NodeReplayServer` — an AF_UNIX responder replaying the committed
  NDJSON segment fixtures (the same canonical-order documents the Ogmios
  replay uses) as chain-sync messages, closing after the last one (a
  replay ends; a live node idles at the tip behind MsgAwaitReply);
* :func:`sync_via_node_socket` — the kupo-shaped client: one
  FindIntersect, then **elastic pipelining** — the in-flight window is a
  function of distance-from-tip exactly as the reference computes it
  (100 / 5 / 1; ``src/Kupo/Data/ChainSync.hs:70-73``), so a far-behind
  sync saturates the socket while a caught-up one keeps at most one
  request outstanding (what makes forced rollbacks responsive).  Responses
  spool into natural-sort-ordered NDJSON segments consumed unchanged by
  the proven ``--follow`` file pipeline — the socket is the transport; the
  decode/fold/rollback semantics stay on the one tested path.

Everything here is public-protocol knowledge (ouroboros-network mux and
chain-sync specs, RFC 8949 CBOR); no reference code is transcribed.
"""

from __future__ import annotations

import json
import os
import socket
import struct
import threading
import time

from kupo_spark import cbor

# node-to-client chain-sync mini-protocol number (ouroboros-network
# registry: N2C chainSync = 5)
PROTO_CHAIN_SYNC = 5
_RESPONDER_BIT = 0x8000
_MAX_SEGMENT = 0xFFFF

MSG_REQUEST_NEXT = 0
MSG_AWAIT_REPLY = 1
MSG_ROLL_FORWARD = 2
MSG_ROLL_BACKWARD = 3
MSG_FIND_INTERSECT = 4
MSG_INTERSECT_FOUND = 5
MSG_INTERSECT_NOT_FOUND = 6
MSG_DONE = 7


# ---------------------------------------------------------------------------
# mux framing
# ---------------------------------------------------------------------------


def mux_send(sock: socket.socket, payload: bytes, responder: bool) -> None:
    """Ship one CBOR message, splitting into <=65535-byte mux segments."""
    proto = PROTO_CHAIN_SYNC | (_RESPONDER_BIT if responder else 0)
    ts = int(time.monotonic() * 1_000_000) & 0xFFFFFFFF
    for off in range(0, len(payload) or 1, _MAX_SEGMENT):
        chunk = payload[off : off + _MAX_SEGMENT]
        sock.sendall(struct.pack(">IHH", ts, proto, len(chunk)) + chunk)


class MuxReader:
    """Reassemble chain-sync CBOR messages from the mux segment stream.

    Messages and segments do not align one-to-one (a >64 KiB RollForward
    spans several segments; a pipelined burst of MsgRequestNext may share
    one), so this accumulates payload bytes and peels complete CBOR items
    off the front.  Truncation mid-item just means "read another segment";
    an actually-corrupt stream surfaces as EOF/ConnectionError."""

    def __init__(self, sock: socket.socket):
        self._file = sock.makefile("rb")
        self._buf = b""

    def recv_msg(self):
        """Next decoded CBOR message (plain list), or None on clean EOF."""
        while True:
            if self._buf:
                try:
                    node, pos = cbor.decode_item(self._buf, 0)
                except (cbor.CborError, IndexError, struct.error):
                    node = None  # incomplete item: need more segments
                if node is not None:
                    self._buf = self._buf[pos:]
                    return _msg_to_plain(node)
            head = self._file.read(8)
            if not head or len(head) < 8:
                return None
            _, _, ln = struct.unpack(">IHH", head)
            chunk = self._file.read(ln) if ln else b""
            if ln and (chunk is None or len(chunk) < ln):
                return None
            self._buf += chunk


def _msg_to_plain(node):
    """CBOR message array -> [word, ...] with points/tips as plain data."""
    plain = cbor.to_plain(node)
    if not isinstance(plain, list) or not plain or not isinstance(plain[0], int):
        raise cbor.CborError(f"not a chain-sync message: {plain!r}")
    return plain


# ---------------------------------------------------------------------------
# JSON document <-> CBOR nodes (block payloads ride as CBOR-in-CBOR)
# ---------------------------------------------------------------------------


def _json_to_node(v):
    if v is True:
        return ("simple", 21, 21)
    if v is False:
        return ("simple", 20, 20)
    if v is None:
        return ("simple", 22, 22)
    if isinstance(v, int):
        return cbor.mk_uint(v)
    if isinstance(v, float):
        return ("float", 27, struct.unpack(">Q", struct.pack(">d", v))[0])
    if isinstance(v, str):
        return cbor.mk_text(v)
    if isinstance(v, list):
        return cbor.mk_array([_json_to_node(i) for i in v])
    if isinstance(v, dict):
        return (
            "map",
            cbor._min_ai(len(v)),
            [(cbor.mk_text(str(k)), _json_to_node(val)) for k, val in v.items()],
        )
    raise TypeError(f"not JSON-encodable: {type(v)}")


def _block_to_bytes(block_json: dict) -> bytes:
    return cbor.encode(_json_to_node(block_json))


def _block_from_node(node) -> dict:
    """Decode a block node back to its JSON object, distinguishing empty
    maps from empty arrays by node kind (``to_plain`` cannot)."""
    kind, _ai, payload = node
    if kind == "map":
        return {
            _block_from_node(k): _block_from_node(v) for k, v in payload
        }
    if kind == "array":
        return [_block_from_node(i) for i in payload]
    if kind == "simple":
        return {20: False, 21: True, 22: None}.get(payload)
    if kind == "float":
        return struct.unpack(">d", payload.to_bytes(8, "big"))[0]
    return cbor.to_plain(node)


# ---------------------------------------------------------------------------
# points and tips on the wire
# ---------------------------------------------------------------------------


def _point_to_node(p):
    """'origin' | {'slot','id'} -> wire point ([] | [slot, hash])."""
    if p == "origin" or p is None:
        return cbor.mk_array([])
    return cbor.mk_array([cbor.mk_uint(p["slot"]), cbor.mk_bytes(bytes.fromhex(p["id"]))])


def _point_from_plain(p):
    if not p:
        return "origin"
    slot, h = p
    return {"slot": slot, "id": h.hex()}


def _tip_to_node(tip):
    """Fixture tip ({'slot','id','height'} | 'origin') -> [point, height]."""
    if tip == "origin" or tip is None:
        return cbor.mk_array([cbor.mk_array([]), cbor.mk_uint(0)])
    return cbor.mk_array(
        [_point_to_node({"slot": tip["slot"], "id": tip["id"]}), cbor.mk_uint(tip.get("height", 0))]
    )


def _tip_from_plain(t):
    point, height = t
    if not point:
        return "origin"
    slot, h = point
    return {"slot": slot, "id": h.hex(), "height": height}


def max_in_flight(distance_from_tip: int) -> int:
    """Elastic pipelining window, exactly the reference's policy
    (``Kupo/Data/ChainSync.hs:70-73``): saturate when far behind, stay
    collectable when caught up (a forced rollback must not wait behind a
    hundred outstanding requests)."""
    if distance_from_tip > 6000:
        return 100
    if distance_from_tip > 1000:
        return 5
    return 1


# ---------------------------------------------------------------------------
# replay server (the node stand-in)
# ---------------------------------------------------------------------------


class NodeReplayServer:
    """AF_UNIX chain-sync responder replaying an NDJSON segment directory.

    Speaks the mini-protocol the reference's pipelined client drives
    (``Node.hs:50-167``): FindIntersect answers IntersectFound when the
    requested point matches a replayed forward block (or origin) and
    IntersectNotFound otherwise; after a non-origin intersection the first
    RequestNext answers RollBackward to that point (the protocol's resume
    handshake), then forwards resume just past it.  When the replay is
    exhausted the first surplus RequestNext gets MsgAwaitReply — the
    protocol's "you are at the tip" — after which the server drains
    still-inbound pipelined requests and closes (closing with unread bytes
    in the kernel buffer RSTs responses already in flight)."""

    def __init__(self, seg_dir: str, socket_path: str):
        from kupo_spark.sources.ogmios import segment_order

        self._docs: list[dict] = []
        for seg in segment_order(seg_dir):
            with open(seg) as fh:
                self._docs += [json.loads(ln) for ln in fh if ln.strip()]
        # the replay corpus never changes: index forward points and compute
        # the tip once, not per connection/FindIntersect
        self._known = self._forward_points()
        self._tip_val = self._tip()
        self.socket_path = socket_path
        if os.path.exists(socket_path):
            os.unlink(socket_path)
        self._sock = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
        self._sock.bind(socket_path)
        self._sock.listen(4)
        self._closing = False

    def start(self) -> "NodeReplayServer":
        threading.Thread(target=self._accept_loop, daemon=True).start()
        return self

    def _accept_loop(self) -> None:
        while not self._closing:
            try:
                conn, _ = self._sock.accept()
            except OSError:
                return
            threading.Thread(target=self._serve_client, args=(conn,), daemon=True).start()

    def _forward_points(self) -> dict:
        pts = {}
        for i, doc in enumerate(self._docs):
            r = doc.get("result", {})
            blk = r.get("block")
            if r.get("direction") == "forward" and blk:
                pts[(blk["slot"], blk["id"])] = i
        return pts

    def _tip(self):
        best = "origin"
        for doc in self._docs:
            r = doc.get("result", {})
            blk = r.get("block")
            if r.get("direction") == "forward" and blk:
                best = {"slot": blk["slot"], "id": blk["id"], "height": blk.get("height", 0)}
        return best

    def _serve_client(self, conn: socket.socket) -> None:
        reader = MuxReader(conn)
        cursor = 0
        # protocol: the first RequestNext after ANY intersection — origin
        # included — answers RollBackward to that point (the origin echo is
        # what tells a client with a STALE spool to retract everything)
        pending_rollback = None
        tip = self._tip_val

        def reply(node) -> None:
            mux_send(conn, cbor.encode(node), responder=True)

        try:
            while True:
                msg = reader.recv_msg()
                if msg is None:
                    return
                word = msg[0]
                if word == MSG_FIND_INTERSECT:
                    known = self._known
                    hit = None
                    for p in msg[1]:
                        pj = _point_from_plain(p)
                        if pj == "origin":
                            hit, cursor = "origin", 0
                            pending_rollback = "origin"
                            break
                        if (pj["slot"], pj["id"]) in known:
                            hit = pj
                            cursor = known[(pj["slot"], pj["id"])] + 1
                            pending_rollback = pj
                            break
                    if hit is None:
                        reply(cbor.mk_array([
                            cbor.mk_uint(MSG_INTERSECT_NOT_FOUND), _tip_to_node(tip)
                        ]))
                    else:
                        reply(cbor.mk_array([
                            cbor.mk_uint(MSG_INTERSECT_FOUND),
                            _point_to_node(None if hit == "origin" else hit),
                            _tip_to_node(tip),
                        ]))
                elif word == MSG_REQUEST_NEXT:
                    if pending_rollback is not None:
                        reply(cbor.mk_array([
                            cbor.mk_uint(MSG_ROLL_BACKWARD),
                            _point_to_node(pending_rollback),
                            _tip_to_node(tip),
                        ]))
                        pending_rollback = None
                        continue
                    if cursor >= len(self._docs):
                        # replay exhausted: AwaitReply (protocol's at-tip
                        # signal), then FIN the write side and drain inbound
                        # before closing — a bare close() with unread bytes
                        # in the kernel buffer RSTs the responses already in
                        # flight; a live node would hold the reply open
                        reply(cbor.mk_array([cbor.mk_uint(MSG_AWAIT_REPLY)]))
                        try:
                            conn.shutdown(socket.SHUT_WR)
                        except OSError:
                            pass
                        while reader.recv_msg() is not None:
                            pass
                        conn.close()
                        return
                    doc = self._docs[cursor]
                    cursor += 1
                    r = doc.get("result", {})
                    if r.get("direction") == "backward":
                        reply(cbor.mk_array([
                            cbor.mk_uint(MSG_ROLL_BACKWARD),
                            _point_to_node(r["point"]),
                            _tip_to_node(r.get("tip", tip)),
                        ]))
                    else:
                        blk = _block_to_bytes(r["block"])
                        reply(cbor.mk_array([
                            cbor.mk_uint(MSG_ROLL_FORWARD),
                            cbor.mk_tag(24, cbor.mk_bytes(blk)),
                            _tip_to_node(r.get("tip", tip)),
                        ]))
                elif word == MSG_DONE:
                    conn.close()
                    return
        except (ConnectionError, OSError):
            return

    def close(self) -> None:
        self._closing = True
        try:
            self._sock.close()
        except OSError:
            pass
        if os.path.exists(self.socket_path):
            try:
                os.unlink(self.socket_path)
            except OSError:
                pass


# ---------------------------------------------------------------------------
# client
# ---------------------------------------------------------------------------


class IntersectionNotFound(ConnectionError):
    """Requested points unknown to the producer — the reference throws
    ``IntersectionNotFound`` and restarts from its checkpoints
    (``Node.hs:96-97``)."""


def sync_via_node_socket(
    socket_path: str,
    spool_dir: str,
    points: list | None = None,
    segment_lines: int = 50,
) -> int:
    """Drive chain-sync over the node socket and spool responses as the
    NDJSON segment documents the file pipeline consumes.

    Mirrors the reference client (``Node.hs:50-167``): one FindIntersect
    (default origin), then RequestNext pipelined under the ELASTIC window —
    recomputed per response from the tip/point distance via
    :func:`max_in_flight` — so a deep sync keeps 100 in flight while a
    caught-up one keeps 1.  RollForward blocks (CBOR-in-CBOR) decode back
    to the canonical JSON documents; a RollBackward always opens a fresh
    segment file (the bridge contract ``canonical_blocks`` nets forks by);
    the echo RollBackward to the requested resume point is neither spooled
    nor counted (reconnect loops are storage-idempotent), but a leading
    RollBackward to any OTHER point — the origin fallback when the node
    does not know our spool — is real information and is spooled so the
    canonical netting retracts the stale prefix.  Returns documents
    spooled."""
    from kupo_spark.sources.ws import SegmentSpool

    sock = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
    sock.connect(socket_path)
    reader = MuxReader(sock)
    spool = SegmentSpool(spool_dir, segment_lines)
    req_points = points if points is not None else ["origin"]
    try:
        mux_send(
            sock,
            cbor.encode(cbor.mk_array([
                cbor.mk_uint(MSG_FIND_INTERSECT),
                cbor.mk_array([_point_to_node(p) for p in req_points]),
            ])),
            responder=False,
        )
        msg = reader.recv_msg()
        if msg is None:
            return 0
        if msg[0] == MSG_INTERSECT_NOT_FOUND:
            raise IntersectionNotFound(f"tip={_tip_from_plain(msg[1])}")
        if msg[0] != MSG_INTERSECT_FOUND:
            raise ConnectionError(f"unexpected intersect reply {msg[0]}")
        inter_point = _point_from_plain(msg[1])
        tip = _tip_from_plain(msg[2])
        cur_slot = 0 if inter_point == "origin" else inter_point["slot"]
        tip_slot = 0 if tip == "origin" else tip["slot"]
        in_flight = 0

        def request_next():
            nonlocal in_flight
            try:
                mux_send(
                    sock,
                    cbor.encode(cbor.mk_array([cbor.mk_uint(MSG_REQUEST_NEXT)])),
                    responder=False,
                )
            except OSError:
                return  # server closed while refilling; recv observes EOF
            in_flight += 1

        def refill():
            # the reference refills ONE pipelined request per collected
            # response, bounded by the elastic window (Node.hs:106-108) —
            # recomputed here per response as the distance shrinks
            while in_flight < max_in_flight(max(0, tip_slot - cur_slot)):
                before = in_flight
                request_next()
                if in_flight == before:  # send failed: stop refilling
                    return

        refill()
        if in_flight == 0:  # window can be 0 only if send failed instantly
            return 0
        received = 0
        preferred = req_points[0]
        first = True
        while in_flight > 0:
            msg = reader.recv_msg()
            if msg is None:
                break  # server closed: replay complete
            word = msg[0]
            if word == MSG_AWAIT_REPLY:
                # the outstanding RequestNext is still pending server-side;
                # nothing to spool and nothing to refill (a replay server
                # closes right after, a live node would eventually answer)
                continue
            in_flight -= 1
            if word == MSG_ROLL_FORWARD:
                tag = msg[1]
                blk_bytes = tag[2] if isinstance(tag, tuple) else tag
                block = _block_from_node(cbor.decode(blk_bytes))
                tip = _tip_from_plain(msg[2])
                doc = {
                    "jsonrpc": "2.0",
                    "method": "nextBlock",
                    "result": {"block": block, "direction": "forward", "tip": tip},
                }
                cur_slot = block.get("slot", cur_slot)
                tip_slot = 0 if tip == "origin" else tip["slot"]
                first = False
                received += 1
                spool.append(json.dumps(doc, sort_keys=True))
            elif word == MSG_ROLL_BACKWARD:
                point = _point_from_plain(msg[1])
                tip = _tip_from_plain(msg[2])
                cur_slot = 0 if point == "origin" else point["slot"]
                tip_slot = 0 if tip == "origin" else tip["slot"]
                # the echo RollBackward to exactly the requested resume
                # point carries zero information (nothing past it is
                # spooled, by construction of last_spooled_point); one to
                # any OTHER point is a real retraction and is spooled
                if first and point == preferred:
                    first = False
                    refill()
                    continue
                first = False
                received += 1
                if spool.buffered:  # rollback opens a fresh segment
                    spool.flush()
                doc = {
                    "jsonrpc": "2.0",
                    "method": "nextBlock",
                    "result": {"direction": "backward", "point": point, "tip": tip},
                }
                spool.append(json.dumps(doc, sort_keys=True))
            else:
                raise ConnectionError(f"unexpected chain-sync message {word}")
            refill()
        spool.flush()
        return received
    finally:
        try:
            sock.close()
        except OSError:
            pass


def follow_via_node_socket(
    socket_path: str,
    spool_dir: str,
    stop: "threading.Event | None" = None,
    retry_delay: float = 1.0,
    segment_lines: int = 50,
) -> None:
    """Reconnecting follow loop — the node-socket half of ``--follow
    --node-socket``.  Each (re)connect resumes at the last spooled point
    (one RollBackward to the intersection instead of a re-delivery), and
    resume is storage-idempotent, so a quiet or replay-exhausted node
    costs nothing per retry.  Runs until ``stop`` is set."""
    from kupo_spark.sources.ws import follow_loop, last_spooled_point

    follow_loop(
        lambda: sync_via_node_socket(
            socket_path,
            spool_dir,
            points=last_spooled_point(spool_dir),
            segment_lines=segment_lines,
        ),
        stop,
        retry_delay,
    )
