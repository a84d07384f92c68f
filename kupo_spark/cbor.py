"""CBOR codec (RFC 8949) — pure Python, driver/UDF-side.

The container has no ``cbor2``, so this implements the subset of CBOR that
Cardano data uses (all major types 0-7, indefinite-length containers and
strings, tags, half/single/double floats) from the public RFC 8949 spec.

Two fidelity levels:

* the **node model** preserves every encoding choice — the head's
  "additional info" (so non-minimal integer widths survive), indefinite
  vs definite lengths, string chunking — which makes ``encode(decode(b))
  == b`` for arbitrary well-formed input.  That is the property kupo
  relies on when it stores datums/scripts as their *original* bytes
  (``Kupo/Data/Cardano/BinaryData.hs:48-62``: ``originalBytes`` roundtrip);
  tests pin it on the reference's own vectors
  (``test/vectors/binary_data.csv``, ``test/vectors/scripts.csv``).
* :func:`to_plain` projects a node to plain Python data (the struct side of
  SURVEY §1.3's struct+raw dual storage), and :func:`to_diagnostic` renders
  RFC 8949 §8 diagnostic notation for display.

A node is a tuple ``(kind, ai, payload)``:

====== ===========================================================
kind   payload
====== ===========================================================
uint   int value
nint   int value (the *encoded* value n, denoting -1 - n)
bytes  bytes, or list of chunk nodes when ai == INDEF
text   str, or list of chunk nodes when ai == INDEF
array  list of nodes
map    list of (key node, value node) pairs
tag    (tag number, inner node)
simple int value (20=false 21=true 22=null 23=undefined, others raw)
float  raw IEEE bits as int (half/single/double per ai)
====== ===========================================================

``ai`` is the head's additional-info field (0-27, or INDEF=31).
"""

from __future__ import annotations

import struct as _struct

INDEF = 31

_UINT_FMT = {24: ">B", 25: ">H", 26: ">I", 27: ">Q"}
_UINT_MAX = {24: 0xFF, 25: 0xFFFF, 26: 0xFFFFFFFF, 27: 0xFFFFFFFFFFFFFFFF}


class CborError(ValueError):
    pass


# ---------------------------------------------------------------------------
# decode
# ---------------------------------------------------------------------------


def _read_head(data: bytes, pos: int) -> tuple[int, int, int, int]:
    """-> (major type, additional info, argument value, new pos)."""
    if pos >= len(data):
        raise CborError("truncated: missing head")
    b = data[pos]
    mt, ai = b >> 5, b & 0x1F
    pos += 1
    if ai < 24:
        return mt, ai, ai, pos
    if ai in _UINT_FMT:
        fmt = _UINT_FMT[ai]
        size = _struct.calcsize(fmt)
        if pos + size > len(data):
            raise CborError("truncated: head argument")
        (val,) = _struct.unpack_from(fmt, data, pos)
        return mt, ai, val, pos + size
    if ai == INDEF:
        return mt, ai, -1, pos
    raise CborError(f"reserved additional info {ai}")


def decode_item(data: bytes, pos: int = 0):
    """Decode one data item; -> (node, new pos)."""
    mt, ai, val, pos = _read_head(data, pos)

    if mt == 0:
        return ("uint", ai, val), pos
    if mt == 1:
        return ("nint", ai, val), pos

    if mt in (2, 3):
        kind = "bytes" if mt == 2 else "text"
        if ai == INDEF:
            chunks = []
            while True:
                if pos >= len(data):
                    raise CborError("truncated: unterminated indefinite string")
                if data[pos] == 0xFF:
                    return (kind, INDEF, chunks), pos + 1
                node, pos = decode_item(data, pos)
                if node[0] != kind or node[1] == INDEF:
                    raise CborError("invalid chunk in indefinite string")
                chunks.append(node)
        if pos + val > len(data):
            raise CborError("truncated: string body")
        raw = data[pos : pos + val]
        pos += val
        if mt == 2:
            return ("bytes", ai, raw), pos
        try:
            return ("text", ai, raw.decode("utf-8")), pos
        except UnicodeDecodeError as e:
            # the module's malformed-input signal is CborError — a leaked
            # UnicodeDecodeError escapes callers' except clauses and kills
            # whole UDF batches on one bad string
            raise CborError(f"invalid UTF-8 in text string: {e}") from e

    if mt == 4:
        items = []
        if ai == INDEF:
            while True:
                if pos >= len(data):
                    raise CborError("truncated: unterminated indefinite array")
                if data[pos] == 0xFF:
                    return ("array", INDEF, items), pos + 1
                node, pos = decode_item(data, pos)
                items.append(node)
        for _ in range(val):
            node, pos = decode_item(data, pos)
            items.append(node)
        return ("array", ai, items), pos

    if mt == 5:
        pairs = []
        if ai == INDEF:
            while True:
                if pos >= len(data):
                    raise CborError("truncated: unterminated indefinite map")
                if data[pos] == 0xFF:
                    return ("map", INDEF, pairs), pos + 1
                k, pos = decode_item(data, pos)
                v, pos = decode_item(data, pos)
                pairs.append((k, v))
        for _ in range(val):
            k, pos = decode_item(data, pos)
            v, pos = decode_item(data, pos)
            pairs.append((k, v))
        return ("map", ai, pairs), pos

    if mt == 6:
        inner, pos = decode_item(data, pos)
        return ("tag", ai, (val, inner)), pos

    # mt == 7
    if ai < 24:
        return ("simple", ai, ai), pos
    if ai == 24:
        if val < 32:
            # RFC 8949 §3.3: two-byte simple values 0-31 are NOT
            # well-formed (they shadow the one-byte encodings); the
            # reference toolchain (cborg) rejects them
            raise CborError(f"non-canonical two-byte simple value {val}")
        return ("simple", ai, val), pos
    if ai in (25, 26, 27):
        return ("float", ai, val), pos
    raise CborError(f"malformed major-7 item (ai={ai})")


def decode(data: bytes):
    """Decode a single top-level item; error on trailing bytes."""
    node, pos = decode_item(data, 0)
    if pos != len(data):
        raise CborError(f"{len(data) - pos} trailing bytes")
    return node


# ---------------------------------------------------------------------------
# encode
# ---------------------------------------------------------------------------


def _head(mt: int, ai: int, val: int) -> bytes:
    if ai < 24:
        if val != ai:
            raise CborError("immediate head with mismatched value")
        return bytes([(mt << 5) | ai])
    if ai in _UINT_FMT:
        if val > _UINT_MAX[ai]:
            raise CborError("head argument out of range for width")
        return bytes([(mt << 5) | ai]) + _struct.pack(_UINT_FMT[ai], val)
    if ai == INDEF:
        return bytes([(mt << 5) | INDEF])
    raise CborError(f"bad additional info {ai}")


def encode(node) -> bytes:
    kind, ai, payload = node
    if kind == "uint":
        return _head(0, ai, payload)
    if kind == "nint":
        return _head(1, ai, payload)
    if kind == "bytes":
        if ai == INDEF:
            return _head(2, INDEF, -1) + b"".join(encode(c) for c in payload) + b"\xff"
        return _head(2, ai, len(payload)) + payload
    if kind == "text":
        if ai == INDEF:
            return _head(3, INDEF, -1) + b"".join(encode(c) for c in payload) + b"\xff"
        raw = payload.encode("utf-8")
        return _head(3, ai, len(raw)) + raw
    if kind == "array":
        body = b"".join(encode(i) for i in payload)
        if ai == INDEF:
            return _head(4, INDEF, -1) + body + b"\xff"
        return _head(4, ai, len(payload)) + body
    if kind == "map":
        body = b"".join(encode(k) + encode(v) for k, v in payload)
        if ai == INDEF:
            return _head(5, INDEF, -1) + body + b"\xff"
        return _head(5, ai, len(payload)) + body
    if kind == "tag":
        tag_no, inner = payload
        return _head(6, ai, tag_no) + encode(inner)
    if kind == "simple":
        if ai < 24:
            return _head(7, ai, payload)
        return bytes([(7 << 5) | 24, payload])
    if kind == "float":
        return bytes([(7 << 5) | ai]) + payload.to_bytes(
            {25: 2, 26: 4, 27: 8}[ai], "big"
        )
    raise CborError(f"unknown node kind {kind!r}")


# ---------------------------------------------------------------------------
# canonical construction helpers (minimal-width heads, definite lengths)
# ---------------------------------------------------------------------------


def _min_ai(val: int) -> int:
    if val < 24:
        return val
    for ai in (24, 25, 26, 27):
        if val <= _UINT_MAX[ai]:
            return ai
    raise CborError("argument exceeds 64 bits")


def mk_uint(v: int):
    if v < 0:
        return mk_nint(v)
    return ("uint", _min_ai(v), v)


def mk_nint(v: int):
    n = -1 - v
    if n < 0:
        raise CborError("mk_nint expects a negative int")
    return ("nint", _min_ai(n), n)


def mk_bytes(b: bytes):
    return ("bytes", _min_ai(len(b)), b)


def mk_text(s: str):
    return ("text", _min_ai(len(s.encode("utf-8"))), s)


def mk_array(items: list):
    return ("array", _min_ai(len(items)), list(items))


def mk_map(pairs: list):
    return ("map", _min_ai(len(pairs)), list(pairs))


def mk_tag(n: int, inner):
    return ("tag", _min_ai(n), (n, inner))


# ---------------------------------------------------------------------------
# projections
# ---------------------------------------------------------------------------

_SIMPLE = {20: False, 21: True, 22: None, 23: None}


def to_plain(node):
    """Project to plain Python data: ints, bytes, str, list, list-of-pairs
    (maps keep order and admit duplicate/unhashable keys), ``("tag", n, v)``
    for tags.  The struct half of the struct+raw dual storage."""
    kind, ai, payload = node
    if kind == "uint":
        return payload
    if kind == "nint":
        return -1 - payload
    if kind in ("bytes", "text"):
        if ai == INDEF:
            parts = [to_plain(c) for c in payload]
            return b"".join(parts) if kind == "bytes" else "".join(parts)
        return payload
    if kind == "array":
        return [to_plain(i) for i in payload]
    if kind == "map":
        return [(to_plain(k), to_plain(v)) for k, v in payload]
    if kind == "tag":
        return ("tag", payload[0], to_plain(payload[1]))
    if kind == "simple":
        return _SIMPLE.get(payload, ("simple", payload))
    if kind == "float":
        if ai == 25:
            return _decode_half(payload)
        fmt = ">f" if ai == 26 else ">d"
        return _struct.unpack(fmt, payload.to_bytes(4 if ai == 26 else 8, "big"))[0]
    raise CborError(f"unknown node kind {kind!r}")


def _decode_half(bits: int) -> float:
    # RFC 8949 appendix D half-precision decode
    exp = (bits >> 10) & 0x1F
    mant = bits & 0x3FF
    if exp == 0:
        val = mant * 2.0**-24
    elif exp != 31:
        val = (mant + 1024) * 2.0 ** (exp - 25)
    else:
        val = float("inf") if mant == 0 else float("nan")
    return -val if bits & 0x8000 else val


def to_diagnostic(node) -> str:
    """RFC 8949 §8 diagnostic notation (display/debug)."""
    kind, ai, payload = node
    if kind == "uint":
        return str(payload)
    if kind == "nint":
        return str(-1 - payload)
    if kind == "bytes":
        if ai == INDEF:
            return "(_ " + ", ".join(to_diagnostic(c) for c in payload) + ")"
        return "h'" + payload.hex() + "'"
    if kind == "text":
        if ai == INDEF:
            return "(_ " + ", ".join(to_diagnostic(c) for c in payload) + ")"
        return '"' + payload + '"'
    if kind == "array":
        inner = ", ".join(to_diagnostic(i) for i in payload)
        return f"[_ {inner}]" if ai == INDEF else f"[{inner}]"
    if kind == "map":
        inner = ", ".join(
            f"{to_diagnostic(k)}: {to_diagnostic(v)}" for k, v in payload
        )
        return "{_ " + inner + "}" if ai == INDEF else "{" + inner + "}"
    if kind == "tag":
        return f"{payload[0]}({to_diagnostic(payload[1])})"
    if kind == "simple":
        return {20: "false", 21: "true", 22: "null", 23: "undefined"}.get(
            payload, f"simple({payload})"
        )
    if kind == "float":
        return repr(to_plain(node))
    raise CborError(f"unknown node kind {kind!r}")


# ---------------------------------------------------------------------------
# Mary-era Value codec (Kupo/Data/Database.hs:196 `serializeCbor @MaryEra`)
# ---------------------------------------------------------------------------
#
# Public CDDL (cardano-ledger mary.cddl):
#   value = coin / [coin, multiasset<uint>]
#   multiasset<a> = { * policy_id => { * asset_name => a } }
# cardano-ledger's encCBOR emits definite-length maps with keys in
# Data.Map ascending (bytewise lexicographic) order.


def encode_mary_value(coins: int, assets: dict[bytes, dict[bytes, int]] | None) -> bytes:
    if not assets:
        return encode(mk_uint(coins))
    outer = []
    for policy in sorted(assets):
        inner = [
            (mk_bytes(name), mk_uint(qty))
            for name, qty in sorted(assets[policy].items())
        ]
        outer.append((mk_bytes(policy), mk_map(inner)))
    return encode(mk_array([mk_uint(coins), mk_map(outer)]))


def decode_mary_value(data: bytes) -> tuple[int, dict[bytes, dict[bytes, int]]]:
    node = decode(data)
    if node[0] == "uint":
        return node[2], {}
    if node[0] != "array" or len(node[2]) != 2:
        raise CborError("not a Mary-era value")
    coin_node, ma_node = node[2]
    if coin_node[0] != "uint" or ma_node[0] != "map":
        raise CborError("not a Mary-era value")
    assets: dict[bytes, dict[bytes, int]] = {}
    for pk, pv in ma_node[2]:
        if pk[0] != "bytes" or pv[0] != "map":
            raise CborError("bad multiasset entry")
        inner = {}
        for ak, av in pv[2]:
            if ak[0] != "bytes" or av[0] not in ("uint", "nint"):
                raise CborError("bad asset entry")
            inner[ak[2]] = to_plain(av)
        assets[pk[2]] = inner
    return coin_node[2], assets
