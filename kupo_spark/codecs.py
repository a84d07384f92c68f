"""Address/credential codecs — C1/C5 of the survey.

``patternFromText`` (reference ``src/Kupo/Data/Pattern.hs:252-381``) accepts,
besides raw hex: bech32 addresses/credentials (``addr1…``, ``stake1…``,
``addr_vk…``, ``stake_vk…``), and hashes verification keys with blake2b-224.
These are *driver-side* codecs (C5): they run once per query/pattern parse,
never in the data plane, so plain Python is the right tool.

bech32 implemented from the public BIP-0173 specification; base58 from the
public Bitcoin alphabet; blake2b-224 via hashlib.

The engine's address layout is the reference's reshuffled encoding
(``src/Kupo/Data/Database.hs:536-599``): ``tag(1B) ‖ [delegation 28B] ‖
header(1B) ‖ payment(28B)``, hex — chosen so payment lookups are suffix
matches and delegation lookups are prefix scans.
"""

from __future__ import annotations

import hashlib

# ---------------------------------------------------------------------------
# bech32 (BIP-0173)
# ---------------------------------------------------------------------------

_CHARSET = "qpzry9x8gf2tvdw0s3jn54khce6mua7l"


def _polymod(values: list[int]) -> int:
    gen = [0x3B6A57B2, 0x26508E6D, 0x1EA119FA, 0x3D4233DD, 0x2A1462B3]
    chk = 1
    for v in values:
        b = chk >> 25
        chk = (chk & 0x1FFFFFF) << 5 ^ v
        for i in range(5):
            chk ^= gen[i] if ((b >> i) & 1) else 0
    return chk


def _hrp_expand(hrp: str) -> list[int]:
    return [ord(c) >> 5 for c in hrp] + [0] + [ord(c) & 31 for c in hrp]


def _convertbits(data, frombits: int, tobits: int, pad: bool) -> list[int] | None:
    acc = bits = 0
    ret = []
    maxv = (1 << tobits) - 1
    for value in data:
        if value < 0 or value >> frombits:
            return None
        acc = (acc << frombits) | value
        bits += frombits
        while bits >= tobits:
            bits -= tobits
            ret.append((acc >> bits) & maxv)
    if pad:
        if bits:
            ret.append((acc << (tobits - bits)) & maxv)
    elif bits >= frombits or ((acc << (tobits - bits)) & maxv):
        return None
    return ret


def bech32_encode(hrp: str, payload: bytes) -> str:
    data = _convertbits(payload, 8, 5, True)
    values = _hrp_expand(hrp) + data
    checksum = _polymod(values + [0, 0, 0, 0, 0, 0]) ^ 1
    chk = [(checksum >> 5 * (5 - i)) & 31 for i in range(6)]
    return hrp + "1" + "".join(_CHARSET[d] for d in data + chk)


def bech32_decode(text: str) -> tuple[str, bytes] | None:
    if any(ord(c) < 33 or ord(c) > 126 for c in text):
        return None
    # BIP-173: mixed-case strings are invalid (the reference's bech32
    # library rejects them as StringToDecodeHasMixedCase) — lowercasing
    # first would accept what kupo refuses
    if text != text.lower() and text != text.upper():
        return None
    text = text.lower()
    pos = text.rfind("1")
    if pos < 1 or pos + 7 > len(text):
        return None
    hrp, data_part = text[:pos], text[pos + 1 :]
    if any(c not in _CHARSET for c in data_part):
        return None
    data = [_CHARSET.index(c) for c in data_part]
    if _polymod(_hrp_expand(hrp) + data) != 1:
        return None
    decoded = _convertbits(data[:-6], 5, 8, False)
    if decoded is None:
        return None
    return hrp, bytes(decoded)


# ---------------------------------------------------------------------------
# base58 (Bitcoin alphabet) — Byron bootstrap addresses
# ---------------------------------------------------------------------------

_B58 = "123456789ABCDEFGHJKLMNPQRSTUVWXYZabcdefghijkmnopqrstuvwxyz"


def base58_decode(text: str) -> bytes | None:
    n = 0
    for c in text:
        if c not in _B58:
            return None
        n = n * 58 + _B58.index(c)
    raw = n.to_bytes((n.bit_length() + 7) // 8, "big")
    pad = len(text) - len(text.lstrip("1"))
    return b"\x00" * pad + raw


def base58_encode(raw: bytes) -> str:
    n = int.from_bytes(raw, "big")
    out = ""
    while n:
        n, r = divmod(n, 58)
        out = _B58[r] + out
    pad = len(raw) - len(raw.lstrip(b"\x00"))
    return "1" * pad + out


# ---------------------------------------------------------------------------
# credentials & the reshuffled address encoding
# ---------------------------------------------------------------------------


def blake2b_224(data: bytes) -> bytes:
    return hashlib.blake2b(data, digest_size=28).digest()


def credential_from_verification_key(vk: bytes) -> str:
    """Pattern.hs:265-381: 32-byte verification keys are hashed to their
    blake2b-224 credential before matching."""
    if len(vk) != 32:
        raise ValueError("verification key must be 32 bytes")
    return blake2b_224(vk).hex()


def reshuffle_address(header: int, payment: bytes, delegation: bytes | None) -> str:
    """Ledger layout (header ‖ payment ‖ [delegation]) → the index-friendly
    reshuffled hex (Database.hs:536-599): tag ‖ [delegation] ‖ header ‖
    payment."""
    addr_type = header >> 4
    if addr_type in (0, 1, 2, 3):
        tag = 1  # base address (payment + delegation)
    elif addr_type in (4, 5):
        tag = 2  # pointer
    elif addr_type in (6, 7):
        tag = 3  # enterprise
    else:
        tag = 0  # bootstrap / other
    parts = [f"{tag:02d}"]
    if delegation is not None:
        parts.append(delegation.hex())
    parts.append(f"{header:02x}")
    parts.append(payment.hex())
    return "".join(parts)


def unshuffle_address(row_hex: str) -> tuple[int, bytes]:
    """Inverse of :func:`reshuffle_address` — the index row back to the
    ledger serialization (``addressFromRow``, ``Database.hs:601-615``):

    * tag 1 (base):       tag ‖ delegation(28) ‖ header ‖ payment  →
      header ‖ payment ‖ delegation
    * tag 2 (pointer):    tag ‖ ptr ‖ header ‖ payment  → header ‖ payment ‖
      ptr (the pointer is variable-width, so parse from the tail)
    * tag 3 (enterprise): tag ‖ header ‖ payment → header ‖ payment
    * tag 0 (bootstrap):  tag ‖ cbor → cbor (the Byron address bytes verbatim)

    Returns ``(tag, ledger_bytes)``.
    """
    raw = bytes.fromhex(row_hex)
    if not raw:
        raise ValueError("empty address row")
    tag, body = raw[0], raw[1:]
    if tag == 0:
        return tag, body
    # length guards raise ValueError (the error class address_to_text's
    # pass-through catch handles) — a bare slice would raise IndexError
    # and abort the whole rendering UDF batch on one malformed row
    if tag == 1:
        if len(body) < 29:
            raise ValueError("truncated base address row")
        delegation, header, payment = body[:28], body[28], body[29:]
        return tag, bytes([header]) + payment + delegation
    if tag == 2:
        if len(body) < 29:
            raise ValueError("truncated pointer address row")
        payment, header, ptr = body[-28:], body[-29], body[:-29]
        return tag, bytes([header]) + payment + ptr
    if tag == 3:
        if len(body) < 1:
            raise ValueError("truncated enterprise address row")
        return tag, bytes([body[0]]) + body[1:]
    raise ValueError(f"unknown address tag {tag}")


def address_to_text(address: str) -> str:
    """Rendered address for the JSON surface (``addressToJson``,
    ``Address.hs:25-34``): bech32 with hrp by the header's network nibble
    for shelley-era rows, base58 for bootstrap rows.  Text that is not a
    reshuffled row (already-rendered wire text, or the synthetic corpus's
    opaque hex) is returned verbatim."""
    if not (len(address) >= 4 and address[:2] in ("00", "01", "02", "03")):
        return address
    try:
        tag, ledger = unshuffle_address(address)
    except ValueError:
        return address
    if tag == 0:
        return base58_encode(ledger)
    hrp = "addr" if (ledger[0] & 0x0F) == 1 else "addr_test"
    return bech32_encode(hrp, ledger)


def address_from_bech32(text: str) -> str | None:
    """addr…/addr_test… bech32 → reshuffled hex address; stake…/stake_test…
    → the delegation credential hex (for `*/stake1…` patterns)."""
    dec = bech32_decode(text)
    if dec is None:
        return None
    hrp, payload = dec
    if hrp in ("addr", "addr_test") and len(payload) >= 29:
        header, payment = payload[0], payload[1:29]
        addr_type = header >> 4
        rest = payload[29:]
        if addr_type in (4, 5):
            # pointer address: the tail is the VARIABLE-width pointer and
            # rides the middle slot whole (the tag-2 arm of
            # unshuffle_address parses it back from there) — slicing 28
            # bytes here would silently drop or corrupt it
            delegation = rest or None
        else:
            delegation = rest[:28] if len(rest) >= 28 else None
        return reshuffle_address(header, payment, delegation)
    if hrp in ("stake", "stake_test") and len(payload) == 29:
        return payload[1:].hex()  # reward account: header ‖ 28B credential
    return None


def credential_from_bech32(text: str) -> str | None:
    """addr_vk/stake_vk (32B keys, hashed) and addr_vkh/stake_vkh/script
    (28B hashes, verbatim) → credential hex."""
    dec = bech32_decode(text)
    if dec is None:
        return None
    hrp, payload = dec
    if hrp in ("addr_vk", "stake_vk") and len(payload) == 32:
        return credential_from_verification_key(payload)
    if hrp in ("addr_vkh", "stake_vkh", "script") and len(payload) == 28:
        return payload.hex()
    return None


# ---------------------------------------------------------------------------
# Packed binary rows (Database.hs:238-260, db/v2.1.0/003.sql, db/v2.2.0):
# ext_output_reference = txid ‖ output_index(2 BE) ‖ transaction_index(2 BE)
# — 36 bytes with the ledger's 32-byte blake2b digests, and output_reference
# = everything but the trailing transaction_index (34 bytes); datum_info =
# flag byte (0 ⇒ reference, 1 ⇒ inline) ‖ datum hash.  Widths derive from
# the digest so the driver's narrower synthetic ids pack the same way.
# Driver-side codecs for query-bound construction + tests; the indexer
# materializes the same bytes column-side with unhex/lpad (engine-exact,
# no UDF).
# ---------------------------------------------------------------------------


def pack_output_reference(transaction_id: str, output_index: int) -> bytes:
    """txid ‖ u16-BE output index (outputReferenceToRow; 34 bytes with
    32-byte digests)."""
    if not 0 <= output_index <= 0xFFFF:
        raise ValueError(f"output_index out of u16 range: {output_index}")
    return bytes.fromhex(transaction_id) + output_index.to_bytes(2, "big")


def pack_ext_output_reference(
    transaction_id: str, output_index: int, transaction_index: int
) -> bytes:
    """txid ‖ u16-BE output index ‖ u16-BE transaction index
    (extendedOutputReferenceToRow; 36 bytes with 32-byte digests)."""
    if not 0 <= transaction_index <= 0xFFFF:
        raise ValueError(f"transaction_index out of u16 range: {transaction_index}")
    return pack_output_reference(transaction_id, output_index) + transaction_index.to_bytes(2, "big")


def unpack_ext_output_reference(b: bytes) -> tuple[str, int, int]:
    """(txid hex, output_index, transaction_index) — the inverse of
    extendedOutputReferenceFromRow; raises on impossible widths like the
    reference's non-empty-remaining check."""
    if len(b) < 6:
        raise ValueError(f"ext_output_reference too short: {len(b)} bytes")
    return b[:-4].hex(), int.from_bytes(b[-4:-2], "big"), int.from_bytes(b[-2:], "big")


def unpack_output_reference(b: bytes) -> tuple[str, int]:
    if len(b) < 4:
        raise ValueError(f"output_reference too short: {len(b)} bytes")
    return b[:-2].hex(), int.from_bytes(b[-2:], "big")


_DATUM_FLAGS = {"reference": 0, "inline": 1}


def pack_datum_info(datum_kind: str, datum_hash: str | None) -> bytes | None:
    """flag ‖ hash (datumInfoToRow); None for outputs without a datum."""
    if datum_kind == "none" or datum_hash is None:
        return None
    return bytes([_DATUM_FLAGS[datum_kind]]) + bytes.fromhex(datum_hash)


def unpack_datum_info(b: bytes | None) -> tuple[str, str | None]:
    """(datum_kind, datum_hash hex) ← flag ‖ hash; (none, None) for NULL —
    the inverse of the v2.2.0 generated columns (substr(datum_info, 2))."""
    if b is None:
        return "none", None
    if len(b) < 2 or b[0] not in (0, 1):
        raise ValueError("datum_info must be flag-byte ‖ hash")
    return ("reference", "inline")[b[0]], b[1:].hex()
