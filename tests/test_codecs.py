"""Codec roundtrip properties (bech32/base58/blake2b + the reshuffled
address encoding) — the analog of the reference's toRow/fromRow roundtrips
(DatabaseSpec.hs:199-213) and bech32 pattern entry points."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from kupo_spark import codecs
from kupo_spark.patterns import (
    MatchDelegation,
    MatchExact,
    MatchPayment,
    pattern_from_text,
)


@settings(max_examples=50, deadline=None)
@given(st.binary(min_size=0, max_size=60), st.sampled_from(["addr", "stake", "x"]))
def test_bech32_roundtrip(payload, hrp):
    enc = codecs.bech32_encode(hrp, payload)
    dec = codecs.bech32_decode(enc)
    assert dec == (hrp, payload)


def test_bech32_rejects_bitflip():
    enc = codecs.bech32_encode("addr", b"\x01" * 29)
    corrupted = enc[:-1] + ("q" if enc[-1] != "q" else "p")
    assert codecs.bech32_decode(corrupted) is None


@settings(max_examples=50, deadline=None)
@given(st.binary(min_size=0, max_size=40))
def test_base58_roundtrip(raw):
    assert codecs.base58_decode(codecs.base58_encode(raw)) == raw


def test_base_address_pattern_from_bech32():
    header, payment, delegation = 0x01, b"\xaa" * 28, b"\xbb" * 28
    addr = codecs.bech32_encode("addr", bytes([header]) + payment + delegation)
    p = pattern_from_text(addr)
    assert p == MatchExact("01" + "bb" * 28 + "01" + "aa" * 28)


def test_enterprise_address_pattern_from_bech32():
    header, payment = 0x61, b"\xcc" * 28
    addr = codecs.bech32_encode("addr_test", bytes([header]) + payment)
    p = pattern_from_text(addr)
    assert p == MatchExact("03" + "61" + "cc" * 28)


def test_stake_address_becomes_delegation_pattern():
    stake = codecs.bech32_encode("stake", bytes([0xE1]) + b"\xdd" * 28)
    assert pattern_from_text(stake) == MatchDelegation("dd" * 28)


def test_verification_key_is_hashed():
    vk = b"\x07" * 32
    text = codecs.bech32_encode("addr_vk", vk) + "/*"
    p = pattern_from_text(text)
    assert p == MatchPayment(codecs.blake2b_224(vk).hex())
    assert len(p.credential) == 56


def test_key_hash_taken_verbatim():
    kh = b"\x09" * 28
    p = pattern_from_text("*/" + codecs.bech32_encode("stake_vkh", kh))
    assert p == MatchDelegation(kh.hex())


def test_garbage_still_rejected():
    for bad in ["addr1qqqq", "nothex!", "stake1"]:
        with pytest.raises(Exception):
            pattern_from_text(bad)


def test_packed_reference_roundtrip_property():
    """outputReferenceToRow/FromRow parity (Database.hs:247-290): width
    checks, big-endian u16 fields, roundtrip over the full u16 corners."""
    import pytest
    from hypothesis import given, strategies as st

    from kupo_spark.codecs import (
        pack_ext_output_reference,
        pack_output_reference,
        unpack_ext_output_reference,
        unpack_output_reference,
    )

    @given(
        st.binary(min_size=32, max_size=32),
        st.integers(0, 0xFFFF),
        st.integers(0, 0xFFFF),
    )
    def roundtrip(txid, oix, tix):
        h = txid.hex()
        b = pack_ext_output_reference(h, oix, tix)
        assert len(b) == 36
        assert unpack_ext_output_reference(b) == (h, oix, tix)
        s = pack_output_reference(h, oix)
        assert len(s) == 34 and b[:34] == s
        assert unpack_output_reference(s) == (h, oix)
        # byte-interval rule the P7 BETWEEN relies on
        assert pack_output_reference(h, 0) <= s <= pack_output_reference(h, 0xFFFF)

    roundtrip()
    with pytest.raises(ValueError):
        pack_output_reference("00" * 32, 0x10000)
    with pytest.raises(ValueError):
        unpack_ext_output_reference(b"\x00" * 5)


def test_datum_info_roundtrip():
    import pytest

    from kupo_spark.codecs import pack_datum_info, unpack_datum_info

    h = "ab" * 32
    assert pack_datum_info("none", None) is None
    assert unpack_datum_info(None) == ("none", None)
    for kind, flag in (("reference", 0), ("inline", 1)):
        b = pack_datum_info(kind, h)
        assert b[0] == flag and len(b) == 33
        assert unpack_datum_info(b) == (kind, h)
    with pytest.raises(ValueError):
        unpack_datum_info(b"\x02" + bytes(32))


def test_pointer_address_roundtrip():
    """Pointer addresses (header types 4/5) carry a VARIABLE-width pointer
    that must survive reshuffle → unshuffle → text byte-exactly (it was
    silently dropped before; Database.hs keeps it in the middle slot)."""
    from kupo_spark.codecs import (
        address_from_bech32,
        address_to_text,
        bech32_encode,
        unshuffle_address,
    )

    header = 0x41  # type 4 (payment key + pointer), mainnet
    payment = bytes(range(28))
    ptr = bytes([0x81, 0x01, 0x02])  # variable-width pointer
    ledger = bytes([header]) + payment + ptr
    text = bech32_encode("addr", ledger)
    row = address_from_bech32(text)
    assert row is not None and row.startswith("02")  # pointer tag
    tag, back = unshuffle_address(row)
    assert tag == 2 and back == ledger  # pointer preserved whole
    assert address_to_text(row) == text


def test_unshuffle_truncated_rows_raise_value_error():
    """Malformed rows raise ValueError (the class the serve path's
    pass-through catches), never IndexError."""
    import pytest as _pytest

    from kupo_spark.codecs import unshuffle_address

    for bad in ("01abcd", "02abcd", "03", ""):
        with _pytest.raises(ValueError):
            unshuffle_address(bad)


def test_bech32_rejects_mixed_case():
    """BIP-173: mixed-case strings are invalid (the reference's bech32
    library throws StringToDecodeHasMixedCase)."""
    from kupo_spark.codecs import bech32_decode, bech32_encode

    text = bech32_encode("addr", bytes([0x61]) + bytes(28))
    assert bech32_decode(text) is not None
    assert bech32_decode(text.upper()) is not None  # all-upper is legal
    mixed = text[:5] + text[5].swapcase() + text[6:]
    assert bech32_decode(mixed) is None
