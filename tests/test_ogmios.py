"""Ogmios nextBlock decoding (S2) — era-spanning vectors authored to the
Ogmios v6 response schema the reference decoder consumes
(``Kupo/Data/Ogmios.hs``; the reference's own vector files are a git
submodule not present in the checkout, so the shapes are re-derived from
the decoder source and pinned here as golden)."""

from __future__ import annotations

import hashlib
import json

import pytest
from pyspark.sql import functions as F

from kupo_spark.sources.ogmios import (
    decode_next_block,
    partial_blocks,
    rollback_points,
    tips,
    witness_scripts,
)

TX0 = "a" * 64
TX1 = "b" * 64
TX2 = "c" * 64
TX3 = "d" * 64
HDR = "9" * 64
POLICY = "f" * 56
KEYHASH = "3c07030e36bfffe67e2e2ec09e5293d384637cd2f004356ef320f3fe"
DATUM = "d87980"  # Plutus unit constructor
DATUM_HASH = hashlib.blake2b(bytes.fromhex(DATUM), digest_size=32).hexdigest()
WITNESS_HASH = "e" * 64


def _resp(result):
    return json.dumps(
        {"jsonrpc": "2.0", "method": "nextBlock", "result": result}
    )


def _tip(slot=120, height=12):
    return {"slot": slot, "id": HDR, "height": height}


# era-spanning transactions in one praos block:
#  - tx 0 (shelley-era shape): plain ADA output, no script data
#  - tx 1 (mary): multiasset value + metadata (cbor AND json label forms)
#  - tx 2 (alonzo): witnessed datum by hash, spend + mint redeemers,
#    native witness script
#  - tx 3 (babbage/conway): FAILED collateral tx — spends collaterals,
#    outputs dropped, collateralReturn at offset index; inline datum +
#    plutus:v3 reference script on the returned output
VECTORS = [
    _resp(
        {
            "direction": "forward",
            "tip": _tip(),
            "block": {
                "type": "praos",
                "era": "conway",
                "id": HDR,
                "slot": 100,
                "height": 10,
                "transactions": [
                    {
                        "id": TX0,
                        "spends": "inputs",
                        "inputs": [{"transaction": {"id": "0" * 64}, "index": 3}],
                        "outputs": [
                            {
                                "address": "addr1simple",
                                "value": {"ada": {"lovelace": 1000000}},
                            }
                        ],
                    },
                    {
                        "id": TX1,
                        "spends": "inputs",
                        "inputs": [{"transaction": {"id": TX0}, "index": 0}],
                        "outputs": [
                            {
                                "address": "addr1multi",
                                "value": {
                                    "ada": {"lovelace": 2000000},
                                    POLICY: {"746f6b656e": 5, "": 1},
                                },
                            }
                        ],
                        "metadata": {
                            "hash": "1" * 64,
                            "labels": {
                                "674": {"cbor": "6474657374"},
                                "1": {"json": {"msg": ["hello", 42]}},
                            },
                        },
                    },
                    {
                        "id": TX2,
                        "spends": "inputs",
                        "inputs": [
                            {"transaction": {"id": TX0}, "index": 1},
                            {"transaction": {"id": TX1}, "index": 0},
                        ],
                        "outputs": [
                            {
                                "address": "addr1datum",
                                "value": {"ada": {"lovelace": 3}},
                                "datumHash": WITNESS_HASH,
                            },
                            {
                                "address": "addr1plain",
                                "value": {"ada": {"lovelace": 4}},
                            },
                        ],
                        "datums": {WITNESS_HASH: "182a"},
                        "redeemers": [
                            {
                                "validator": {"purpose": "spend", "index": 1},
                                "redeemer": "d87980",
                            },
                            {
                                "validator": {"purpose": "mint", "index": 0},
                                "redeemer": "40",
                            },
                        ],
                        "scripts": {
                            "5" * 56: {
                                "language": "native",
                                "json": {"clause": "signature", "from": KEYHASH},
                            }
                        },
                    },
                    {
                        "id": TX3,
                        "spends": "collaterals",
                        "collaterals": [{"transaction": {"id": TX2}, "index": 0}],
                        "outputs": [
                            {"address": "dropped1", "value": {"ada": {"lovelace": 1}}},
                            {"address": "dropped2", "value": {"ada": {"lovelace": 2}}},
                        ],
                        "collateralReturn": {
                            "address": "addr1return",
                            "value": {"ada": {"lovelace": 5000000}},
                            "datum": DATUM,
                            "script": {"language": "plutus:v3", "cbor": "4e4d01"},
                        },
                    },
                ],
            },
        }
    ),
    _resp(
        {
            "direction": "backward",
            "tip": _tip(),
            "point": {"slot": 90, "id": "8" * 64},
        }
    ),
    _resp({"direction": "backward", "tip": "origin", "point": "origin"}),
]


@pytest.fixture(scope="module")
def decoded(spark):
    df = spark.createDataFrame([(v,) for v in VECTORS], "value STRING")
    return decode_next_block(df)


@pytest.fixture(scope="module")
def blocks_rows(decoded):
    rows = partial_blocks(decoded).orderBy("transaction_index").collect()
    return {r.transaction_id: r for r in rows}


def test_all_transactions_decoded(blocks_rows):
    assert set(blocks_rows) == {TX0, TX1, TX2, TX3}
    for r in blocks_rows.values():
        assert r.slot_no == 100
        assert r.header_hash == HDR


def test_simple_transaction(blocks_rows):
    r = blocks_rows[TX0]
    assert r.inputs == ["0" * 64 + "#3"]
    (o,) = r.outputs
    assert (o.output_index, o.address, o.coins) == (0, "addr1simple", 1000000)
    assert o.assets == {}
    assert o.datum_kind == "none"
    assert r.metadata_tags is None and r.metadata_cbor is None


def test_multiasset_value_and_metadata(blocks_rows):
    r = blocks_rows[TX1]
    (o,) = r.outputs
    assert o.coins == 2000000
    assert o.assets == {POLICY: {"746f6b656e": 5, "": 1}}
    assert r.metadata_tags == [1, 674]
    # {1: {"msg": ["hello", 42]}, 674: "test"} — json form converted via
    # valueToMetadatum, cbor form decoded verbatim; labels ascending
    expected = (
        "a2"
        + "01" + "a1" + "636d7367" + "82" + "6568656c6c6f" + "182a"
        + "1902a2" + "6474657374"
    )
    assert r.metadata_cbor == expected


def test_witnessed_datum_and_spend_redeemers(blocks_rows):
    r = blocks_rows[TX2]
    assert r.inputs == [TX0 + "#1", TX1 + "#0"]
    o0, o1 = r.outputs
    assert (o0.datum_kind, o0.datum_hash, o0.datum_cbor) == (
        "reference",
        WITNESS_HASH,
        "182a",  # witness bytes folded onto the referencing output
    )
    assert o1.datum_kind == "none"
    assert r.spend_redeemers == {1: "d87980"}  # mint redeemer filtered out


def test_collateral_mode(blocks_rows):
    """spends == collaterals: inputs come from collaterals, regular outputs
    are dropped, collateralReturn lands at index len(outputs)."""
    r = blocks_rows[TX3]
    assert r.inputs == [TX2 + "#0"]
    (o,) = r.outputs
    assert o.output_index == 2  # after the two dropped outputs
    assert o.address == "addr1return"
    assert (o.datum_kind, o.datum_hash, o.datum_cbor) == (
        "inline",
        DATUM_HASH,
        DATUM,
    )
    # plutus:v3 → '03' tag ‖ cbor, hash = blake2b-224 of tagged bytes
    body = bytes.fromhex("034e4d01")
    assert o.script_cbor == body.hex()
    assert o.script_hash == hashlib.blake2b(body, digest_size=28).hexdigest()


def test_witness_scripts_native_packing(decoded):
    rows = witness_scripts(decoded).collect()
    assert len(rows) == 1
    (r,) = rows
    assert r.script_hash == "5" * 56
    # native signature clause → [0, keyhash], tag '00' prefix
    body = bytes.fromhex("8200" + "581c" + KEYHASH)
    assert r.script_cbor == "00" + body.hex()


def test_rollback_points(decoded):
    pts = {
        (r.slot_no, r.header_hash) for r in rollback_points(decoded).collect()
    }
    assert pts == {(90, "8" * 64), (0, None)}


def test_tips(decoded):
    ts = {(r.slot_no, r.height) for r in tips(decoded).collect()}
    assert ts == {(120, 12), (0, None)}


def test_decoded_blocks_feed_the_indexer(decoded):
    from kupo_spark.operators.indexer import build_index

    blocks = partial_blocks(decoded)
    index = build_index(blocks)
    inputs = index.inputs.collect()
    assert len(inputs) == 5  # tx0·1 + tx1·1 + tx2·2 + collateralReturn·1
    by_ref = {r.output_reference: r for r in inputs}
    # tx1's only output was spent by tx2 (input index 1, with redeemer)
    spent = by_ref[f"{TX1}#0"]
    assert spent.spent_by == TX2
    assert spent.spent_with == "d87980"
    # witnessed datum landed in the binary_data dictionary
    assert index.binary_data.where(
        F.col("binary_data_hash") == WITNESS_HASH
    ).count() == 1


def test_unknown_input_source_routed_to_error_lane(spark):
    """A tx whose `spends` is neither 'inputs' nor 'collaterals' must not be
    silently decoded as inputs-mode (the reference decoder fails the parse,
    Ogmios.hs:235-237): it is excluded from blocks and surfaced on the
    rejected lane.  NULL spends (pre-Alonzo absent field) stays valid."""
    from kupo_spark.sources.ogmios import rejected_transactions

    def _plain_output(n):
        return {"address": f"addr1plain{n}", "value": {"ada": {"lovelace": n}}}

    docs = [
        _resp(
            {
                "direction": "forward",
                "tip": _tip(),
                "block": {
                    "type": "praos", "era": "conway", "id": HDR,
                    "slot": 77, "height": 7,
                    "transactions": [
                        {"id": TX0, "spends": "witnesses",
                         "inputs": [], "outputs": [_plain_output(1)]},
                        {"id": TX1, "spends": "inputs",
                         "inputs": [], "outputs": [_plain_output(2)]},
                        {"id": TX2,
                         "inputs": [], "outputs": [_plain_output(3)]},
                    ],
                },
            }
        )
    ]
    dec = decode_next_block(spark.createDataFrame([(d,) for d in docs], "value string"))
    blocks = partial_blocks(dec)
    assert {r.transaction_id for r in blocks.collect()} == {TX1, TX2}
    rej = rejected_transactions(dec).collect()
    assert [(r.transaction_id, r.spends) for r in rej] == [(TX0, "witnesses")]


def test_canonical_blocks_nets_out_rollbacks(spark, tmp_path):
    """canonical_blocks: a forward block is dead iff a LATER segment rolls
    back below its slot; same-file forwards follow their rollback and
    survive (the bridge contract)."""
    import json as _json

    from kupo_spark.sources.ogmios import canonical_blocks

    def fwd(slot, txid):
        return _resp(
            {
                "direction": "forward",
                "tip": _tip(),
                "block": {
                    "type": "praos",
                    "era": "conway",
                    "id": f"{slot:064x}",
                    "slot": slot,
                    "height": slot,
                    "transactions": [
                        {
                            "id": txid,
                            "spends": "inputs",
                            "inputs": [
                                {"transaction": {"id": "0" * 64}, "index": 0}
                            ],
                            "outputs": [
                                {
                                    "address": "addr1x",
                                    "value": {"ada": {"lovelace": 1}},
                                }
                            ],
                        }
                    ],
                },
            }
        )

    def bwd(slot):
        return _resp(
            {
                "direction": "backward",
                "tip": _tip(),
                "point": {"slot": slot, "id": "8" * 64},
            }
        )

    seg = tmp_path / "segs"
    seg.mkdir()
    (seg / "seg01.jsonl").write_text(fwd(100, "a" * 64) + "\n" + fwd(110, "b" * 64) + "\n")
    # later segment: roll back to 90, then re-forward 95 — kills 100 and 110
    (seg / "seg02.jsonl").write_text(bwd(90) + "\n" + fwd(95, "c" * 64) + "\n")
    (seg / "seg03.jsonl").write_text(fwd(96, "d" * 64) + "\n")
    rows = canonical_blocks(spark, str(seg)).select("slot_no", "transaction_id").collect()
    assert {(r.slot_no, r.transaction_id) for r in rows} == {
        (95, "c" * 64),
        (96, "d" * 64),
    }


def test_canonical_blocks_natural_segment_order(spark, tmp_path):
    """Delivery order is NATURAL-sorted (seg9 < seg10): a rollback in
    seg10 must kill forwards in seg9 even though '10' < '9'
    lexicographically (regression: plain string comparison inverted the
    order, resurrecting rolled-back blocks for non-zero-padded bridges)."""
    import json as _json

    from kupo_spark.sources.ogmios import canonical_blocks

    def fwd(slot, txid):
        return _resp(
            {
                "direction": "forward",
                "tip": _tip(),
                "block": {
                    "type": "praos", "era": "conway", "id": f"{slot:064x}",
                    "slot": slot, "height": slot,
                    "transactions": [
                        {
                            "id": txid, "spends": "inputs",
                            "inputs": [{"transaction": {"id": "0" * 64}, "index": 0}],
                            "outputs": [
                                {"address": "addr1x", "value": {"ada": {"lovelace": 1}}}
                            ],
                        }
                    ],
                },
            }
        )

    seg = tmp_path / "segs"
    seg.mkdir()
    (seg / "seg9.jsonl").write_text(fwd(100, "a" * 64) + "\n")
    (seg / "seg10.jsonl").write_text(
        _json.dumps(
            {
                "jsonrpc": "2.0",
                "method": "nextBlock",
                "result": {
                    "direction": "backward",
                    "tip": _tip(),
                    "point": {"slot": 90, "id": "8" * 64},
                },
            }
        )
        + "\n"
        + fwd(95, "b" * 64)
        + "\n"
    )
    rows = canonical_blocks(spark, str(seg)).select("slot_no").collect()
    assert {r.slot_no for r in rows} == {95}


def test_canonical_blocks_symlinked_and_space_dirs(spark, tmp_path):
    """The ordinal join keys on the segment BASENAME, so a symlinked or
    space-containing seg_dir — where input_file_name()'s percent-encoded,
    unresolved URI can never equal a reconstructed file://{resolve()} —
    still reads (ADVICE r4 regression)."""
    import os

    from kupo_spark.sources.ogmios import canonical_blocks

    real = tmp_path / "with space"
    real.mkdir()

    def fwd(slot, txid):
        return _resp(
            {
                "direction": "forward",
                "tip": _tip(),
                "block": {
                    "type": "praos", "era": "conway", "id": f"{slot:064x}",
                    "slot": slot, "height": slot,
                    "transactions": [
                        {
                            "id": txid, "spends": "inputs",
                            "inputs": [{"transaction": {"id": "0" * 64}, "index": 0}],
                            "outputs": [
                                {"address": "addr1x", "value": {"ada": {"lovelace": 1}}}
                            ],
                        }
                    ],
                },
            }
        )

    (real / "seg 1.jsonl").write_text(fwd(100, "a" * 64) + "\n")
    (real / "seg 2.jsonl").write_text(fwd(110, "b" * 64) + "\n")
    got = {r.slot_no for r in canonical_blocks(spark, str(real)).select("slot_no").collect()}
    assert got == {100, 110}
    link = tmp_path / "link"
    os.symlink(real, link)
    via_link = {
        r.slot_no for r in canonical_blocks(spark, str(link)).select("slot_no").collect()
    }
    assert via_link == {100, 110}
    # '+' is the adversarial case for the decode: Hadoop's URI encoding
    # leaves '+' literal, but a FORM decode would turn it into a space and
    # miss the basename join — the decode must be pure percent-decoding
    plus = tmp_path / "plus"
    plus.mkdir()
    (plus / "seg+1.jsonl").write_text(fwd(100, "a" * 64) + "\n")
    (plus / "seg %25+2.jsonl").write_text(fwd(110, "b" * 64) + "\n")
    via_plus = {
        r.slot_no for r in canonical_blocks(spark, str(plus)).select("slot_no").collect()
    }
    assert via_plus == {100, 110}


def test_canonical_blocks_random_walk_equivalence(spark, tmp_path):
    """Seeded random chains of forwards + rollbacks: the netting rule must
    reproduce a straight in-order replay (forward appends; backward
    removes every block above the point) for any delivery history that
    honors the bridge contract."""
    import json as _json
    import random

    from kupo_spark.sources.ogmios import canonical_blocks

    def fwd(slot, txid):
        return _resp(
            {
                "direction": "forward",
                "tip": _tip(),
                "block": {
                    "type": "praos", "era": "conway", "id": f"{slot:064x}",
                    "slot": slot, "height": slot,
                    "transactions": [
                        {
                            "id": txid, "spends": "inputs",
                            "inputs": [{"transaction": {"id": "0" * 64}, "index": 0}],
                            "outputs": [
                                {"address": "addr1x", "value": {"ada": {"lovelace": 1}}}
                            ],
                        }
                    ],
                },
            }
        )

    def bwd(slot):
        return _resp(
            {
                "direction": "backward",
                "tip": _tip(),
                "point": {"slot": slot, "id": "8" * 64},
            }
        )

    for seed in (7, 23, 99):
        rnd = random.Random(seed)
        seg = tmp_path / f"walk{seed}"
        seg.mkdir()
        alive: list[tuple[int, str]] = []  # the replay reference
        tip, n_tx = 0, 0
        for i in range(rnd.randint(6, 12)):
            lines = []
            if alive and rnd.random() < 0.4:
                # roll back to a random alive slot (or origin)
                point = rnd.choice([0] + [s for s, _ in alive])
                alive = [(s, t) for s, t in alive if s <= point]
                tip = point
                lines.append(bwd(point))
            for _ in range(rnd.randint(1, 3)):
                tip += rnd.randint(1, 5)
                txid = f"{seed:04x}{n_tx:04x}".ljust(64, "e")
                n_tx += 1
                alive.append((tip, txid))
                lines.append(fwd(tip, txid))
            (seg / f"seg-{i:03d}.jsonl").write_text("\n".join(lines) + "\n")
        rows = (
            canonical_blocks(spark, str(seg))
            .select("slot_no", "transaction_id")
            .collect()
        )
        assert {(r.slot_no, r.transaction_id) for r in rows} == set(alive), (
            f"seed {seed} diverged from replay"
        )


def test_canonical_blocks_fails_on_malformed_rollback(spark, tmp_path):
    """A RollBackward whose point cannot be decoded must fail the batch
    read (regression: a NULL kill-slot made the anti-join condition NULL
    and silently resurrected the rolled-back blocks — the exact failure
    the streaming body raises on)."""
    import json as _json

    import pytest as _pytest

    from kupo_spark.oracle_sources import OGMIOS_SEGMENTS
    from kupo_spark.sources.ogmios import canonical_blocks

    seg = tmp_path / "segs"
    seg.mkdir()
    import shutil

    shutil.copy(f"{OGMIOS_SEGMENTS}/seg-000.jsonl", seg / "seg-000.jsonl")
    (seg / "seg-001.jsonl").write_text(
        _json.dumps(
            {
                "jsonrpc": "2.0",
                "method": "nextBlock",
                "result": {"direction": "backward", "tip": {}, "point": {}},
            }
        )
        + "\n"
    )
    with _pytest.raises(Exception, match="malformed RollBackward"):
        canonical_blocks(spark, str(seg)).collect()


def test_canonical_blocks_committed_fixture(spark):
    """The committed segment-directory fixture (driver arm 'canonical' of
    q_ogmios_fold): the fork kills block A3 (slot 30) and keeps the
    re-forwarded branch — canonical slots are A1 A2 B3 B4 B5."""
    from kupo_spark.oracle_sources import OGMIOS_SEGMENTS
    from kupo_spark.sources.ogmios import canonical_blocks

    rows = canonical_blocks(spark, OGMIOS_SEGMENTS).select("slot_no").collect()
    assert sorted({r.slot_no for r in rows}) == [10, 20, 25, 35, 45]


def test_address_normalization_wire_forms():
    """A real Ogmios endpoint serves bech32/base58 address TEXT; the
    decoder normalizes every form to the reshuffled engine row (engine-hex
    replay fixtures pass through untouched, and near-miss base58 text is
    NOT munged into a fake Byron row)."""
    import pandas as pd

    from kupo_spark import cbor
    from kupo_spark.codecs import base58_encode, bech32_encode
    from kupo_spark.sources.ogmios import _normalize_address_batch

    pay, delg = bytes([0x11]) * 28, bytes([0x22]) * 28
    shelley = bech32_encode("addr", bytes([0x01]) + pay + delg)
    byron_raw = cbor.encode(
        cbor.mk_array(
            [cbor.mk_tag(24, cbor.mk_bytes(b"\x83\x00\x01\x02")), cbor.mk_uint(123)]
        )
    )
    byron = base58_encode(byron_raw)
    engine = "01" + delg.hex() + "01" + pay.hex()
    got = list(
        _normalize_address_batch(
            pd.Series([shelley, byron, engine, "addr1return", None])
        )
    )
    assert got[0] == engine  # bech32 → reshuffled row
    assert got[1] == "00" + byron_raw.hex()  # base58 Byron → tag-00 row
    assert got[2] == engine  # already-normalized: untouched
    assert got[3] == "addr1return"  # base58-alphabet text w/o CBOR shape
    assert got[4] is None
