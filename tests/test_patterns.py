"""Pattern language tests — the analog of the reference's pattern fixture
matrix (test/Test/Kupo/Data/PatternSpec.hs + Pattern/Fixture.hs) and the
text-codec roundtrip properties."""

from __future__ import annotations

import pytest

from kupo_spark import chainspec as cs
from kupo_spark.patterns import (
    MatchAny,
    MatchAssetId,
    MatchDelegation,
    MatchExact,
    MatchMetadataTag,
    MatchOutputReference,
    MatchPayment,
    MatchPaymentAndDelegation,
    MatchPolicyId,
    MatchTransactionId,
    PatternError,
    includes,
    overlaps,
    pattern_from_text,
    pattern_to_text,
)

CRED_A = "a" * 56
CRED_B = "b" * 56
TXID = "c" * 32
POLICY = "d" * 32
ASSET = "e" * 32


ROUNDTRIP = [
    ("*", MatchAny(True)),
    ("*/*", MatchAny(False)),
    (f"{CRED_A}/*", MatchPayment(CRED_A)),
    (f"*/{CRED_B}", MatchDelegation(CRED_B)),
    (f"{CRED_A}/{CRED_B}", MatchPaymentAndDelegation(CRED_A, CRED_B)),
    (f"*@{TXID}", MatchTransactionId(TXID)),
    (f"3@{TXID}", MatchOutputReference(TXID, 3)),
    (f"{POLICY}.*", MatchPolicyId(POLICY)),
    (f"{POLICY}.{ASSET}", MatchAssetId(POLICY, ASSET)),
    ("{674}", MatchMetadataTag(674)),
]


@pytest.mark.parametrize("text,expected", ROUNDTRIP)
def test_parse_and_print_roundtrip(text, expected):
    p = pattern_from_text(text)
    assert p == expected
    assert pattern_from_text(pattern_to_text(p)) == p


@pytest.mark.parametrize("bad", ["", "zz@xx", "@", "xyz/qq!", "-1@" + TXID, "{x}"])
def test_parse_rejects(bad):
    with pytest.raises(PatternError):
        pattern_from_text(bad)


def test_exact_address_parse():
    addr = cs.address_of(42)
    assert pattern_from_text(addr) == MatchExact(addr)


def test_includes_algebra():
    """Mirrors the reference case table (Pattern.hs:179-221) exactly."""
    assert includes(MatchAny(True), MatchExact("00" + "0" * 58))
    assert includes(MatchAny(False), MatchDelegation(CRED_B))
    assert not includes(MatchAny(False), MatchExact("00" + "0" * 58))
    # MatchAny OnlyShelley includes every non-`*` pattern, even non-address
    # kinds (reference: `y /= MatchAny IncludingBootstrap`)
    assert includes(MatchAny(False), MatchPayment(CRED_A))
    assert includes(MatchAny(False), MatchTransactionId(TXID))
    assert includes(MatchAny(False), MatchPolicyId(POLICY))
    assert not includes(MatchAny(False), MatchAny(True))
    assert includes(MatchPayment(CRED_A), MatchPaymentAndDelegation(CRED_A, CRED_B))
    assert not includes(MatchPayment(CRED_A), MatchPaymentAndDelegation(CRED_B, CRED_A))
    # reference direction: (MatchOutputReference a, MatchTransactionId a')
    assert includes(MatchOutputReference(TXID, 1), MatchTransactionId(TXID))
    assert not includes(MatchTransactionId(TXID), MatchOutputReference(TXID, 1))
    assert includes(MatchPolicyId(POLICY), MatchAssetId(POLICY, ASSET))
    addr01 = "01" + CRED_B + "00" + CRED_A
    assert includes(MatchDelegation(CRED_B), MatchExact(addr01))
    assert includes(MatchPaymentAndDelegation(CRED_A, CRED_B), MatchExact(addr01))
    # bootstrap addresses have no payment part (Address.hs:56-61)
    assert not includes(MatchPayment(CRED_A), MatchExact("00" + "00" + CRED_A))


def test_overlaps_algebra():
    """Mirrors overlapTwo (Pattern.hs:147-177): payment-vs-delegation do NOT
    overlap; pairs sharing either credential DO."""
    assert not overlaps(MatchPayment(CRED_A), MatchDelegation(CRED_B))
    assert overlaps(MatchAny(True), MatchPolicyId(POLICY))
    assert not overlaps(MatchPayment(CRED_A), MatchPayment(CRED_B))
    assert overlaps(MatchPolicyId(POLICY), MatchAssetId(POLICY, ASSET))
    assert overlaps(
        MatchPaymentAndDelegation(CRED_A, CRED_B),
        MatchPaymentAndDelegation(CRED_A, "f" * 56),
    )
    assert overlaps(
        MatchPaymentAndDelegation(CRED_A, CRED_B),
        MatchPaymentAndDelegation("f" * 56, CRED_B),
    )
    assert overlaps(MatchPayment(CRED_A), MatchPaymentAndDelegation(CRED_A, CRED_B))
    assert overlaps(MatchOutputReference(TXID, 1), MatchTransactionId(TXID))
    assert not overlaps(MatchTransactionId(TXID), MatchPolicyId(POLICY))


def test_includes_implies_overlaps():
    """Algebra consistency property (Pattern.hs:143-221): subsumption is a
    special case of overlap, for every pattern-kind pair."""
    samples = [
        MatchAny(True), MatchAny(False),
        MatchExact("01" + CRED_B + "00" + CRED_A), MatchExact("00" + "00" + CRED_A),
        MatchPayment(CRED_A), MatchDelegation(CRED_B),
        MatchPaymentAndDelegation(CRED_A, CRED_B),
        MatchTransactionId(TXID), MatchOutputReference(TXID, 1),
        MatchPolicyId(POLICY), MatchAssetId(POLICY, ASSET),
    ]
    for p in samples:
        for q in samples:
            if includes(p, q):
                assert overlaps(p, q), (p, q)
            assert includes(p, p)


def test_parse_rejects_wrong_lengths():
    """transactionIdFromText / credential parsers reject wrong-length
    digests (Pattern.hs:265-381)."""
    with pytest.raises(PatternError):
        pattern_from_text("0@abc")
    with pytest.raises(PatternError):
        pattern_from_text("ff/*")
    with pytest.raises(PatternError):
        pattern_from_text("*/ff")
    with pytest.raises(PatternError):
        pattern_from_text("ff/" + CRED_B)


def test_metadata_tag_rejected_at_query_time(index):
    from kupo_spark.operators.fold_inputs import fold_inputs

    with pytest.raises(PatternError):
        fold_inputs(index, "{674}")
