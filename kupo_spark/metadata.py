"""Recursive transaction metadata (C8) — model, codec, JSON rendering.

Reference: ``Kupo/Data/Cardano/Metadata.hs``:

* the model is ``Metadatum = I Integer | S Text | B Bytes | List [..] |
  Map [(k, v)]`` under a top-level ``Map Word64 Metadatum`` of labels
  (``Metadata.hs:42-56``);
* ``metadataToJson`` renders the recursive schema ``{"int": n} |
  {"string": s} | {"bytes": base16} | {"list": [..]} | {"map": [{"k":..,
  "v":..}]}`` (``Metadata.hs:73-96``), and ``metadataFromJson`` parses it
  back (``Metadata.hs:102-152``);
* ``GET /metadata/{slot}`` rows render as ``{"hash": blake2b-256,
  "raw": base16 CBOR, "schema": {label: metadatum}}``
  (``metadataToJson'``, ``Metadata.hs:154-160``).

The wire form is standard Cardano metadata CBOR — ``{* label => metadatum}``
with metadatum encoded directly as the corresponding CBOR item
(shelley.cddl ``transaction_metadata``) — handled by :mod:`kupo_spark.cbor`.

**Synthetic-chain integration.**  The chain derivation generates REAL
metadata CBOR per transaction as a hex column, via a SQL expression shared
verbatim between Spark and the DuckDB oracle (one spec, two engines — the
whole CBOR uint/head encoder is expressible in portable SQL because the
payload structure is fixed).  The Python model here decodes those bytes,
so codec fidelity is cross-checked three ways: Spark SQL == DuckDB SQL ==
this decoder.
"""

from __future__ import annotations

import hashlib
import json

from kupo_spark import cbor

# ---------------------------------------------------------------------------
# shared SQL: CBOR encoder for the synthetic metadata payload
# ---------------------------------------------------------------------------


def cbor_uint_sql(expr: str) -> str:
    """Portable SQL emitting the minimal-width CBOR head for a uint
    (RFC 8949 §3: immediate / 1-, 2-, 4-, 8-byte argument)."""
    h = f"lower(hex({expr}))"
    return (
        f"CASE WHEN {expr} < 24 THEN lpad({h}, 2, '0') "
        f"WHEN {expr} < 256 THEN '18' || lpad({h}, 2, '0') "
        f"WHEN {expr} < 65536 THEN '19' || lpad({h}, 4, '0') "
        f"WHEN {expr} < 4294967296 THEN '1a' || lpad({h}, 8, '0') "
        f"ELSE '1b' || lpad({h}, 16, '0') END"
    )


def datum_cbor_sql(e: str = "e") -> str:
    """Hex CBOR of the synthetic datum payload — a real Plutus-data shape,
    tag 121 (constructor 0) over ``[ I(e % 211), B(md5₄) ]``.  A function
    of ``e % 211`` only, so equal datum hashes always carry equal bytes
    (content-addressed storage invariant of the binary_data table)."""
    k = f"({e} % 211)"
    md5 = f"md5('dat' || CAST({k} AS STRING))"
    return f"'d879' || '82' || {cbor_uint_sql(k)} || '44' || substr({md5}, 1, 8)"


def script_cbor_sql(e: str = "e") -> str:
    """Hex of the synthetic script payload — the ledger's language-tagged
    form: ``'02'`` (plutus:v2) ‖ CBOR bytes item (4 bytes from md5).
    A function of ``e % 13`` only (content-addressed by script_hash)."""
    md5 = f"md5('scr' || CAST({e} % 13 AS STRING))"
    return f"'02' || '44' || substr({md5}, 1, 8)"


def metadata_cbor_sql(e: str = "e") -> str:
    """Hex CBOR of the synthetic transaction metadata for event ``e``
    (present when e % 4 = 0, mirroring chaingen's metadata gate):

    ``{ e % 10: [ I(e), B(md5₂), {S "k": I(e % 7)} ], 674: B(md5₄) }``

    Labels ascend (e % 10 < 674), maps/arrays definite-length, heads
    minimal-width — i.e. canonical CBOR, byte-identical to
    ``cbor.encode(mk_*)`` of the same structure (pinned by tests).
    """
    md5 = f"md5('m' || CAST({e} AS STRING))"  # STRING parses in Spark AND DuckDB
    label = f"lpad(lower(hex({e} % 10)), 2, '0')"  # labels 0-9: immediate head
    inner = (
        "'83'"  # array(3)
        f" || {cbor_uint_sql(e)}"  # I(e)
        f" || '42' || substr({md5}, 1, 4)"  # B(2 bytes)
        f" || 'a1' || '616b' || lpad(lower(hex({e} % 7)), 2, '0')"  # {"k": e%7}
    )
    tag674 = f"'1902a2' || '44' || substr({md5}, 1, 8)"  # 674 => B(4 bytes)
    return f"'a2' || {label} || {inner} || {tag674}"


def metadata_deep_cbor_sql(mc: str = "metadata_cbor") -> str:
    """Hex CBOR wrapping a transaction's ORIGINAL metadata bytes five
    levels deep (C8 deep-recursion oracle arm, round 11) — a shared-SQL
    derivation like :func:`metadata_cbor_sql` (one spec, two engines):

    ``{ 0: [ B(orig), { 1: [ S"deep", { S"k": I(len(orig) % 7) } ] } ] }``

    map → list → map → list → map; every head minimal-width, so the result
    is canonical CBOR the recursive renderer must walk to depth 5."""
    blen = f"CAST(length({mc}) / 2 AS BIGINT)"  # orig byte length (hex/2)
    bhead = (
        f"CASE WHEN {blen} < 24 THEN lpad(lower(hex(64 + {blen})), 2, '0') "
        f"ELSE '58' || lpad(lower(hex({blen})), 2, '0') END"
    )  # major-type-2 head (fixture payloads are < 256 bytes)
    n = f"({blen} % 7)"
    inner_map = f"'a1' || '616b' || lpad(lower(hex({n})), 2, '0')"  # {"k": n}
    inner_list = f"'82' || '6464656570' || {inner_map}"  # [ "deep", {...} ]
    mid_map = f"'a1' || '01' || {inner_list}"  # { 1: [...] }
    outer_list = f"'82' || {bhead} || {mc} || {mid_map}"  # [ B(orig), {...} ]
    return f"'a1' || '00' || {outer_list}"  # { 0: [...] }


def metadata_deep_schema_json_sql(mc: str = "metadata_cbor") -> str:
    """INDEPENDENT DuckDB/Spark SQL building the byte-exact JSON text the
    recursive renderer (:func:`schema_to_json` + ``json.dumps(...,
    separators=(',',':'))``) must produce for the deep structure above —
    the oracle side of the C8 deep arm.  Written from the Metadata.hs
    schema rules (``{"int"}/{"string"}/{"bytes"}/{"list"}/{"map":[{"k","v"}]}``),
    not from the Python renderer."""
    blen = f"CAST(length({mc}) / 2 AS BIGINT)"
    n = f"CAST(({blen} % 7) AS STRING)"
    head = '{"0":{"list":[{"bytes":"'
    mid = (
        '"},{"map":[{"k":{"int":1},"v":{"list":[{"string":"deep"},'
        '{"map":[{"k":{"string":"k"},"v":{"int":'
    )
    tail = "}}]}]}}]}]}}"
    return f"'{head}' || {mc} || '{mid}' || {n} || '{tail}'"


# ---------------------------------------------------------------------------
# model: CBOR node → Metadatum JSON schema (Metadata.hs:73-96)
# ---------------------------------------------------------------------------


class MetadataError(ValueError):
    pass


def metadatum_to_json(node) -> dict:
    kind, _ai, payload = node
    if kind == "uint":
        return {"int": cbor.to_plain(node)}
    if kind == "nint":
        return {"int": cbor.to_plain(node)}
    if kind == "text":
        return {"string": cbor.to_plain(node)}
    if kind == "bytes":
        return {"bytes": cbor.to_plain(node).hex()}
    if kind == "array":
        return {"list": [metadatum_to_json(i) for i in payload]}
    if kind == "map":
        return {
            "map": [
                {"k": metadatum_to_json(k), "v": metadatum_to_json(v)}
                for k, v in payload
            ]
        }
    raise MetadataError(f"not a metadatum: {kind}")


def metadatum_from_json(obj: dict):
    """Inverse parser (Metadata.hs:102-152) → canonical CBOR node."""
    if not isinstance(obj, dict) or len(obj) != 1:
        raise MetadataError(f"not a metadatum object: {obj!r}")
    (key, val), = obj.items()
    if key == "int":
        return cbor.mk_uint(val) if val >= 0 else cbor.mk_nint(val)
    if key == "string":
        return cbor.mk_text(val)
    if key == "bytes":
        return cbor.mk_bytes(bytes.fromhex(val))
    if key == "list":
        return cbor.mk_array([metadatum_from_json(i) for i in val])
    if key == "map":
        return cbor.mk_map(
            [
                (metadatum_from_json(p["k"]), metadatum_from_json(p["v"]))
                for p in val
            ]
        )
    raise MetadataError(f"unknown metadatum key: {key}")


def schema_to_json(raw: bytes) -> dict[str, dict]:
    """Decode metadata CBOR → ``{label(decimal text): metadatum json}``,
    labels ascending (``encodeMap show``, Data.Map order)."""
    node = cbor.decode(raw)
    if node[0] != "map":
        raise MetadataError("metadata must be a label map")
    out: list[tuple[int, dict]] = []
    for k, v in node[2]:
        if k[0] != "uint":
            raise MetadataError("metadata label must be a uint")
        out.append((k[2], metadatum_to_json(v)))
    return {str(lbl): js for lbl, js in sorted(out)}


def schema_from_json(schema: dict[str, dict]) -> bytes:
    """Parse the JSON schema back to canonical metadata CBOR."""
    pairs = [
        (cbor.mk_uint(int(lbl)), metadatum_from_json(v))
        for lbl, v in sorted(schema.items(), key=lambda kv: int(kv[0]))
    ]
    return cbor.encode(cbor.mk_map(pairs))


def metadata_hash(raw: bytes) -> str:
    """blake2b-256 of the raw auxiliary-data bytes (hashTxAuxData)."""
    return hashlib.blake2b(raw, digest_size=32).hexdigest()


def labels(raw: bytes) -> list[int]:
    node = cbor.decode(raw)
    return sorted(k[2] for k, _ in node[2])


def render_metadata(raw: bytes) -> dict:
    """``metadataToJson'`` (Metadata.hs:154-160): hash ‖ raw ‖ schema."""
    return {
        "hash": metadata_hash(raw),
        "raw": raw.hex(),
        "schema": schema_to_json(raw),
    }


def render_metadata_text(hex_cbor: str) -> str:
    """JSON text of :func:`render_metadata`, stable field order."""
    return json.dumps(render_metadata(bytes.fromhex(hex_cbor)), separators=(",", ":"))
