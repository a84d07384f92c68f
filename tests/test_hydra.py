"""Hydra ServerOutput decoding (S3) — vectors authored to the message and
transaction shapes the reference decoder consumes (``Kupo/Data/Hydra.hs``;
the reference's own vector files are a git submodule not present in the
checkout, so the shapes are re-derived from the decoder source and pinned
here as golden)."""

from __future__ import annotations

import hashlib
import json

from kupo_spark import cbor
from kupo_spark.codecs import bech32_encode
from kupo_spark.sources.hydra import (
    IntersectionNotFound,
    decode_messages,
    partial_blocks,
    resume_filter,
    tips,
    witness_scripts,
)

import pytest

TXID_A = "aa" * 32
TXID_B = "bb" * 32
PAY = bytes([0x11]) * 28
DELG = bytes([0x22]) * 28
BASE_ADDR_RAW = bytes([0x01]) + PAY + DELG  # base: payment + delegation
ENT_ADDR_RAW = bytes([0x61]) + PAY  # enterprise: payment only
BASE_ADDR_ENGINE = "01" + DELG.hex() + "01" + PAY.hex()
ENT_ADDR_ENGINE = "03" + "61" + PAY.hex()
POLICY = bytes([0x0F]) * 28
DATUM_RAW = bytes.fromhex("d87980")  # unit constructor
SCRIPT_BODY = b"\x01\x02\x03\x04"

TRUE = ("simple", 21, 21)
NULL = ("simple", 22, 22)


def _blake2b(data: bytes, size: int) -> str:
    return hashlib.blake2b(data, digest_size=size).hexdigest()


def _mk_input(txid: str, ix: int):
    return cbor.mk_array([cbor.mk_bytes(bytes.fromhex(txid)), cbor.mk_uint(ix)])


def _script_node():
    return cbor.mk_array([cbor.mk_uint(2), cbor.mk_bytes(SCRIPT_BODY)])


# ledger scriptFromBytes form: language tag ‖ script CONTENT (the bytes
# item's payload, NOT its re-encoded CBOR with the length head) — this is
# what hashScript hashes and what the Ogmios source packs from
# script['cbor'], so both sources produce the same row
PACKED_SCRIPT = b"\x02" + SCRIPT_BODY


def _rich_tx():
    """Conway tx: 2 unsorted inputs (tag-258 set), a babbage-map output with
    inline datum + reference script, a legacy-array output referencing a
    witnessed datum, spend + mint redeemers, a witness plutus:v2 script."""
    out1 = cbor.mk_map(
        [
            (cbor.mk_uint(0), cbor.mk_bytes(BASE_ADDR_RAW)),
            (
                cbor.mk_uint(1),
                cbor.mk_array(
                    [
                        cbor.mk_uint(5_000_000),
                        cbor.mk_map(
                            [
                                (
                                    cbor.mk_bytes(POLICY),
                                    cbor.mk_map(
                                        [(cbor.mk_bytes(b"tok"), cbor.mk_uint(42))]
                                    ),
                                )
                            ]
                        ),
                    ]
                ),
            ),
            (
                cbor.mk_uint(2),
                cbor.mk_array(
                    [cbor.mk_uint(1), cbor.mk_tag(24, cbor.mk_bytes(DATUM_RAW))]
                ),
            ),
            (
                cbor.mk_uint(3),
                cbor.mk_tag(24, cbor.mk_bytes(cbor.encode(_script_node()))),
            ),
        ]
    )
    witness_datum = cbor.mk_uint(42)  # encodes to 182a
    out2 = cbor.mk_array(
        [
            cbor.mk_bytes(ENT_ADDR_RAW),
            cbor.mk_uint(1_000_000),
            cbor.mk_bytes(
                hashlib.blake2b(cbor.encode(witness_datum), digest_size=32).digest()
            ),
        ]
    )
    body = cbor.mk_map(
        [
            (
                cbor.mk_uint(0),
                cbor.mk_tag(
                    258,
                    cbor.mk_array([_mk_input(TXID_B, 1), _mk_input(TXID_A, 0)]),
                ),
            ),
            (cbor.mk_uint(1), cbor.mk_array([out1, out2])),
        ]
    )
    redeemers = cbor.mk_map(
        [
            (  # spend redeemer for sorted-input index 1 (bb…#1)
                cbor.mk_array([cbor.mk_uint(0), cbor.mk_uint(1)]),
                cbor.mk_array(
                    [
                        cbor.mk_uint(99),
                        cbor.mk_array([cbor.mk_uint(0), cbor.mk_uint(0)]),
                    ]
                ),
            ),
            (  # mint redeemer — must be dropped
                cbor.mk_array([cbor.mk_uint(1), cbor.mk_uint(0)]),
                cbor.mk_array(
                    [
                        cbor.mk_uint(7),
                        cbor.mk_array([cbor.mk_uint(0), cbor.mk_uint(0)]),
                    ]
                ),
            ),
        ]
    )
    wits = cbor.mk_map(
        [
            (cbor.mk_uint(4), cbor.mk_array([witness_datum])),
            (cbor.mk_uint(5), redeemers),
            (cbor.mk_uint(6), cbor.mk_array([cbor.mk_bytes(SCRIPT_BODY)])),
        ]
    )
    tx = cbor.mk_array([body, wits, TRUE, NULL])
    return cbor.encode(tx).hex(), _blake2b(cbor.encode(body), 32)


def _plain_tx():
    out = cbor.mk_array([cbor.mk_bytes(ENT_ADDR_RAW), cbor.mk_uint(777)])
    body = cbor.mk_map(
        [
            (cbor.mk_uint(0), cbor.mk_array([_mk_input(TXID_A, 3)])),
            (cbor.mk_uint(1), cbor.mk_array([out])),
        ]
    )
    tx = cbor.mk_array([body, cbor.mk_map([]), TRUE, NULL])
    return cbor.encode(tx).hex(), _blake2b(cbor.encode(body), 32)


RICH_HEX, RICH_ID = _rich_tx()
PLAIN_HEX, PLAIN_ID = _plain_tx()
SNAP_HEADER = _blake2b(bytes.fromhex(RICH_ID) + bytes.fromhex(PLAIN_ID), 32)

GENESIS_UTXO = {
    f"{TXID_A}#0": {
        "address": bech32_encode("addr", BASE_ADDR_RAW),
        "value": {"lovelace": 2_000_000, POLICY.hex(): {"746f6b": 3}},
    },
    f"{TXID_A}#2": {
        "address": bech32_encode("addr", ENT_ADDR_RAW),
        "value": {"lovelace": 10},
        "datum": DATUM_RAW.hex(),
    },
    f"{TXID_B}#0": {
        "address": bech32_encode("addr", ENT_ADDR_RAW),
        "value": {"lovelace": 5},
        "datumHash": "cc" * 32,
        "script": cbor.encode(_script_node()).hex(),
    },
}

MESSAGES = [
    json.dumps({"tag": "Greetings", "me": {"party": "vk"}}),
    json.dumps({"tag": "HeadIsOpen", "utxo": GENESIS_UTXO}),
    json.dumps({"tag": "TxValid", "transactionId": TXID_A}),
    json.dumps(
        {
            "tag": "SnapshotConfirmed",
            "snapshot": {
                "number": 7,
                "confirmed": [{"cborHex": RICH_HEX}, {"cborHex": PLAIN_HEX}],
            },
        }
    ),
]


@pytest.fixture(scope="module")
def decoded(spark):
    df = spark.createDataFrame([(m,) for m in MESSAGES], ["value"])
    return decode_messages(df)


@pytest.fixture(scope="module")
def blocks(decoded):
    return {
        (r.slot_no, r.transaction_index): r for r in partial_blocks(decoded).collect()
    }


def test_only_block_bearing_messages_yield_blocks(blocks):
    # genesis: 2 txs (grouped by txid); snapshot: 2 txs; TxValid/Greetings: none
    assert sorted(blocks) == [(0, 0), (0, 1), (7, 0), (7, 1)]


def test_snapshot_rich_transaction(blocks):
    r = blocks[(7, 0)]
    assert r.transaction_id == RICH_ID
    assert r.header_hash == SNAP_HEADER
    # inputs sorted by (txid, index) — ledger Set order
    assert r.inputs == [f"{TXID_A}#0", f"{TXID_B}#1"]
    o1, o2 = sorted(r.outputs, key=lambda o: o.output_index)
    assert o1.address == BASE_ADDR_ENGINE
    assert o1.coins == 5_000_000
    assert o1.assets == {POLICY.hex(): {"746f6b": 42}}
    assert o1.datum_kind == "inline"
    assert o1.datum_hash == _blake2b(DATUM_RAW, 32)
    assert o1.datum_cbor == DATUM_RAW.hex()
    assert o1.script_hash == _blake2b(PACKED_SCRIPT, 28)
    assert o1.script_cbor == PACKED_SCRIPT.hex()
    # legacy-form output: witnessed datum folded on by hash
    assert o2.address == ENT_ADDR_ENGINE
    assert o2.datum_kind == "reference"
    assert o2.datum_cbor == "182a"
    # spend redeemer only, keyed by sorted-input position
    assert dict(r.spend_redeemers) == {1: "1863"}
    # hydra transactions carry no metadata (Hydra.hs:220)
    assert r.metadata_tags is None and r.metadata_cbor is None


def test_snapshot_plain_transaction(blocks):
    r = blocks[(7, 1)]
    assert r.transaction_id == PLAIN_ID
    assert r.inputs == [f"{TXID_A}#3"]
    # empty map, not NULL — same shape as the Ogmios source for this case
    assert dict(r.spend_redeemers) == {}
    [o] = r.outputs
    assert (o.address, o.coins, o.datum_kind) == (ENT_ADDR_ENGINE, 777, "none")


def test_genesis_block_groups_utxo_by_transaction(blocks):
    g0, g1 = blocks[(0, 0)], blocks[(0, 1)]
    assert {g0.transaction_id, g1.transaction_id} == {TXID_A, TXID_B}
    a = g0 if g0.transaction_id == TXID_A else g1
    b = g0 if g0.transaction_id == TXID_B else g1
    assert a.inputs == [] and b.inputs == []
    # txid A: outputs at original indices 0 and 2
    oa0, oa2 = sorted(a.outputs, key=lambda o: o.output_index)
    assert (oa0.output_index, oa2.output_index) == (0, 2)
    assert oa0.address == BASE_ADDR_ENGINE  # bech32 → reshuffled hex
    assert oa0.assets == {POLICY.hex(): {"746f6b": 3}}
    assert oa2.datum_kind == "inline"
    assert oa2.datum_hash == _blake2b(DATUM_RAW, 32)
    [ob] = b.outputs
    assert ob.datum_kind == "reference" and ob.datum_hash == "cc" * 32
    assert ob.script_hash == _blake2b(PACKED_SCRIPT, 28)
    assert ob.script_cbor == PACKED_SCRIPT.hex()
    # genesis header hash: blake2b-256 over concatenated txids (sorted order)
    assert a.header_hash == _blake2b(
        bytes.fromhex(TXID_A) + bytes.fromhex(TXID_B), 32
    )


def test_tips(decoded):
    t = {r.slot_no: r for r in tips(decoded).collect()}
    assert set(t) == {0, 7}
    assert t[7].header_hash == SNAP_HEADER
    assert t[7].height == 7  # mkHydraBlock: BlockNo = snapshot number


def test_witness_scripts(decoded):
    rows = witness_scripts(decoded).collect()
    assert {(r.script_hash, r.script_cbor) for r in rows} == {
        (_blake2b(PACKED_SCRIPT, 28), PACKED_SCRIPT.hex())
    }


def test_resume_filter_skips_known_blocks(decoded):
    blocks = partial_blocks(decoded)
    genesis_header = _blake2b(bytes.fromhex(TXID_A) + bytes.fromhex(TXID_B), 32)
    out = resume_filter(blocks, [(0, genesis_header)])
    assert {r.slot_no for r in out.collect()} == {7}
    # all checkpoints known → nothing flows
    assert resume_filter(blocks, [(0, genesis_header), (7, SNAP_HEADER)]).count() == 0


def test_resume_filter_rejects_foreign_head(decoded):
    blocks = partial_blocks(decoded)
    with pytest.raises(IntersectionNotFound):
        resume_filter(blocks, [(7, "ff" * 32)]).collect()


def test_bootstrap_address_stored_whole():
    """Byron bootstrap addresses (header nibble 0x8) are variable-length
    CBOR — they must be stored verbatim under tag 00, never sliced at
    credential offsets (addressToRow's bootstrap arm)."""
    from kupo_spark.sources.hydra import _engine_address

    byron = bytes.fromhex("82d818582183581c") + bytes(28) + bytes.fromhex("a0001a12345678")
    assert _engine_address(byron) == "00" + byron.hex()
    # shelley addresses keep the reshuffled form
    assert _engine_address(ENT_ADDR_RAW) == ENT_ADDR_ENGINE


def test_genesis_address_decode_paths():
    from kupo_spark.codecs import base58_encode
    from kupo_spark.sources.hydra import _genesis_address

    assert _genesis_address(bech32_encode("addr", ENT_ADDR_RAW)) == ENT_ADDR_ENGINE
    byron = cbor.encode(
        cbor.mk_array([cbor.mk_tag(24, cbor.mk_bytes(b"\x00" * 8)), cbor.mk_uint(7)])
    )
    assert _genesis_address(base58_encode(byron)) == "00" + byron.hex()
    with pytest.raises(ValueError, match="undecodable genesis address"):
        _genesis_address("addr1notanaddress")


def test_script_packing_matches_ogmios_source():
    """Cross-source W3 invariant: the same Plutus script content packs to
    the same (hash, cbor) row from both decoders — the Hydra CBOR path
    must strip the bytes item's length head exactly as the Ogmios JSON
    path receives the content."""
    from kupo_spark.sources.hydra import _pack_script_node
    from kupo_spark.sources.ogmios import _pack_script

    h_hash, h_cbor = _pack_script_node(2, cbor.mk_bytes(SCRIPT_BODY))
    o_hash, o_cbor = _pack_script(
        {"language": "plutus:v2", "cbor": SCRIPT_BODY.hex()}
    )
    assert (h_hash, h_cbor) == (o_hash, o_cbor)
