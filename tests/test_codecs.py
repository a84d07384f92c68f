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
