"""Generate the committed source-protocol fixtures under ``fixtures/``.

Two deterministic message logs + one expected-rows sidecar:

* ``ogmios_nextblock.ndjson`` — Ogmios v6 ``nextBlock`` responses
  (forward blocks with era-spanning transactions + interleaved rollbacks).
  Its CORRECTNESS oracle is a pure-SQL DuckDB restatement of the decode
  semantics over the same JSON (``oracle_sources.py``) — no sidecar.
* ``hydra_serveroutput.ndjson`` — Hydra ``ServerOutput`` messages
  (``HeadIsOpen`` genesis UTxO + ``SnapshotConfirmed`` carrying Conway
  transaction CBOR).  CBOR is not SQL-decodable, so the oracle reads
  ``hydra_expected.ndjson``: golden rows authored HERE from the abstract
  transaction spec (addresses, coins, datums, spend DAG chosen up front),
  NEVER by running the ``kupo_spark.sources.hydra`` decoder — generation
  knowledge vs decode path, the same discipline as the reference's
  ``test/vectors`` golden files.

Run: ``python tools/gen_source_fixtures.py`` (idempotent, byte-stable).
"""

from __future__ import annotations

import hashlib
import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from kupo_spark import cbor  # noqa: E402
from kupo_spark.codecs import bech32_encode, reshuffle_address  # noqa: E402

FIXDIR = REPO / "fixtures"


def _md5(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


def hex64(s: str) -> str:
    return _md5(s) + _md5(s + "'")


def hex56(s: str) -> str:
    return (_md5(s) + _md5(s + "'"))[:56]


def bytes28(s: str) -> bytes:
    return bytes.fromhex(hex56(s))


def blake2b(data: bytes, size: int) -> str:
    return hashlib.blake2b(data, digest_size=size).hexdigest()


# six deterministic addresses, in both ledger-bytes and engine-hex form
def _addr(k: int) -> dict:
    if k % 2:  # base address: payment + delegation keys
        header = 0x01
        pay, dele = bytes28(f"fxpay{k % 4}"), bytes28(f"fxdel{k % 3}")
    else:  # enterprise: payment only
        header = 0x61
        pay, dele = bytes28(f"fxpay{k % 4}"), None
    raw = bytes([header]) + pay + (dele or b"")
    return {
        "raw": raw,
        "engine": reshuffle_address(header, pay, dele),
        "bech32": bech32_encode("addr", raw),
    }


ADDRS = [_addr(k) for k in range(6)]
POLICIES = [hex56(f"fxpol{p}") for p in range(3)]
ASSETS = ["0a1b2c", "d4e5f6", "00"]


# ===========================================================================
# Ogmios nextBlock fixture
# ===========================================================================

N_BLOCKS = 12


def _ogmios_datum_hex(n: int) -> str:
    # small but real plutus-data CBOR: [n]
    return cbor.encode(cbor.mk_array([cbor.mk_uint(n)])).hex()


def _ogmios_assets(n: int, j: int) -> dict:
    """Multiasset JSON for output (n, j); {} when none."""
    if (n + j) % 3 != 0:
        return {}
    out = {POLICIES[n % 2]: {ASSETS[0]: n + 1, ASSETS[1]: 2 * n + j}}
    if n % 6 == 0:
        out[POLICIES[2]] = {ASSETS[2]: 5}
    return out


def _ogmios_output(n: int, j: int) -> dict:
    value = {"ada": {"lovelace": 1000 * n + 37 * j + 1}}
    for pol, amap in _ogmios_assets(n, j).items():
        value[pol] = amap
    out = {"address": ADDRS[(n + j) % 6]["engine"], "value": value}
    kind = (n + j) % 4
    if kind == 1:
        out["datum"] = _ogmios_datum_hex(n)
    elif kind in (2, 3):
        out["datumHash"] = hex64(f"fxdh{n}.{j}")
    if (n + j) % 5 == 0:
        out["script"] = {
            "language": "plutus:v2",
            "cbor": cbor.encode(cbor.mk_bytes(bytes([n % 250, j]))).hex(),
        }
    elif n % 4 == 1 and j == 0:
        out["script"] = {
            "language": "native",
            "json": {"clause": "signature", "from": hex56("fxkey")},
        }
    return out


def gen_ogmios() -> list[str]:
    lines = []
    tip = {"slot": 10 * N_BLOCKS, "id": hex64("fxtip"), "height": N_BLOCKS}
    n = 0  # global tx counter
    txids = {}
    for i in range(N_BLOCKS):
        txs = []
        for _t in range(1 + i % 3):
            txid = hex64(f"fxotx{n}")
            txids[n] = txid
            collateral_mode = n in (5, 9)
            # spend chain: tx n consumes (n-2)#0; tx7 consumes tx5's
            # collateral return (index 2); external ref every 3rd tx
            fixture_ref = None
            if n >= 2:
                if n == 7:
                    fixture_ref = {"transaction": {"id": txids[5]}, "index": 2}
                else:
                    fixture_ref = {"transaction": {"id": txids[n - 2]}, "index": 0}
            refs = [fixture_ref] if fixture_ref else []
            if n % 3 == 0:
                refs.append({"transaction": {"id": hex64(f"fxext{n}")}, "index": 0})
            if not refs:  # every tx consumes something
                refs = [{"transaction": {"id": hex64(f"fxext{n}")}, "index": 1}]

            n_out = 1 + n % 3 if not collateral_mode else 2
            tx = {
                "id": txid,
                "spends": "collaterals" if collateral_mode else "inputs",
                "outputs": [_ogmios_output(n, j) for j in range(n_out)],
            }
            if collateral_mode:
                tx["collaterals"] = refs
                if n == 5:  # return output at index len(outputs) == 2
                    ret = _ogmios_output(n, 7)
                    ret["datum"] = _ogmios_datum_hex(n + 100)
                    ret.pop("datumHash", None)
                    tx["collateralReturn"] = ret
            else:
                tx["inputs"] = refs
                if fixture_ref and n % 2 == 0:
                    tx["redeemers"] = [
                        {
                            "validator": {"purpose": "spend", "index": 0},
                            "redeemer": _ogmios_datum_hex(n + 50),
                        },
                        {
                            "validator": {"purpose": "mint", "index": 0},
                            "redeemer": "ff",
                        },
                    ]
            # witness datums for half the reference-datum outputs
            wit = {}
            for j in range(n_out):
                if (n + j) % 4 == 2 and n % 2 == 0:
                    wit[hex64(f"fxdh{n}.{j}")] = _ogmios_datum_hex(n + 200 + j)
            if wit:
                tx["datums"] = wit
            if n % 5 == 1:
                tx["metadata"] = {
                    "hash": hex64(f"fxmh{n}"),
                    "labels": {
                        "674": {"cbor": cbor.encode(cbor.mk_text(f"m{n}")).hex()},
                        "42": {"json": {"k": [1, n]}},
                    },
                }
            txs.append(tx)
            n += 1
        lines.append(
            json.dumps(
                {
                    "jsonrpc": "2.0",
                    "method": "nextBlock",
                    "result": {
                        "direction": "forward",
                        "tip": tip,
                        "block": {
                            "type": "praos",
                            "era": "conway",
                            "id": hex64(f"fxhdr{i}"),
                            "slot": 10 * (i + 1),
                            "height": i + 1,
                            "transactions": txs,
                        },
                    },
                },
                sort_keys=True,
            )
        )
        if i in (4, 9):  # interleaved rollbacks the decode must skip
            point = (
                "origin"
                if i == 4
                else {"slot": 10 * i, "id": hex64(f"fxhdr{i - 1}")}
            )
            lines.append(
                json.dumps(
                    {
                        "jsonrpc": "2.0",
                        "method": "nextBlock",
                        "result": {"direction": "backward", "tip": tip, "point": point},
                    },
                    sort_keys=True,
                )
            )
    return lines


# ===========================================================================
# Ogmios segment-directory fixture (canonical_blocks: rollback netting)
# ===========================================================================


def _seg_resp(result: dict) -> str:
    return json.dumps(
        {"jsonrpc": "2.0", "method": "nextBlock", "result": result},
        sort_keys=True,
    )


def _seg_block(name: str, slot: int, txs: list[dict]) -> dict:
    tip = {"slot": 100, "id": hex64("fxsegtip"), "height": 10}
    return {
        "direction": "forward",
        "tip": tip,
        "block": {
            "type": "praos",
            "era": "conway",
            "id": hex64(f"fxsh{name}"),
            "slot": slot,
            "height": slot // 10,
            "transactions": txs,
        },
    }


def _seg_tx(
    m: int,
    n_out: int,
    inputs: list[tuple[str, int]],
    collateral: bool = False,
    redeemer: bool = False,
    witness_datums: bool = False,
) -> dict:
    """One segmented-chain tx reusing the main fixture's output generator
    (namespace offset 40 keeps addresses/datum kinds varied but txids and
    hashes distinct from the single-file fixture)."""
    n = 40 + m
    tx: dict = {
        "id": hex64(f"fxseg{m}"),
        "spends": "collaterals" if collateral else "inputs",
        "outputs": [_ogmios_output(n, j) for j in range(n_out)],
    }
    refs = [{"transaction": {"id": t}, "index": i} for t, i in inputs]
    if collateral:
        tx["collaterals"] = refs
        ret = _ogmios_output(n, 7)
        ret["datum"] = _ogmios_datum_hex(n + 100)
        ret.pop("datumHash", None)
        tx["collateralReturn"] = ret
    else:
        tx["inputs"] = refs
    if redeemer:
        tx["redeemers"] = [
            {
                "validator": {"purpose": "spend", "index": 0},
                "redeemer": _ogmios_datum_hex(n + 50),
            },
            {"validator": {"purpose": "mint", "index": 0}, "redeemer": "ff"},
        ]
    if witness_datums:
        tx["datums"] = {
            hex64(f"fxdh{n}.0"): _ogmios_datum_hex(n + 200),
            hex64(f"fxdh{n}.1"): _ogmios_datum_hex(n + 201),
        }
    return tx


def gen_ogmios_segments() -> dict[str, list[str]]:
    """Segment files for ``canonical_blocks`` (S2 batch view of a live
    chain-sync with a fork): seg-000 carries blocks A1(10)/A2(20)/A3(30);
    seg-001 opens with RollBackward to A2's point — killing A3 — then
    re-forwards B3(25)/B4(35); seg-002 extends with B5(45).  Canonical
    chain: A1 A2 B3 B4 B5.  Spends cross segments (B3 consumes A1's
    output; B4 consumes A2's collateral return) and one spend dies with
    its block (A3 consumed seg0tx1#0 — B3 re-consumes it on the new
    branch)."""
    t = lambda m: hex64(f"fxseg{m}")  # noqa: E731
    ext = lambda s: hex64(f"fxsegext{s}")  # noqa: E731
    a1 = _seg_block(
        "A1", 10,
        [
            _seg_tx(0, 2, [(ext("a"), 0)]),
            _seg_tx(1, 1, [(t(0), 0)], witness_datums=True),
        ],
    )
    a2 = _seg_block("A2", 20, [_seg_tx(2, 2, [(t(0), 1)], collateral=True)])
    a3 = _seg_block("A3", 30, [_seg_tx(3, 1, [(t(1), 0)], redeemer=True)])
    b3 = _seg_block(
        "B3", 25, [_seg_tx(4, 2, [(t(1), 0)], redeemer=True, witness_datums=True)]
    )
    b4 = _seg_block("B4", 35, [_seg_tx(5, 3, [(t(2), 2)])])
    b5 = _seg_block("B5", 45, [_seg_tx(6, 1, [(t(4), 0), (ext("b"), 3)])])
    rollback = {
        "direction": "backward",
        "tip": {"slot": 100, "id": hex64("fxsegtip"), "height": 10},
        "point": {"slot": 20, "id": hex64("fxshA2")},
    }
    return {
        "seg-000.jsonl": [_seg_resp(a1), _seg_resp(a2), _seg_resp(a3)],
        "seg-001.jsonl": [_seg_resp(rollback), _seg_resp(b3), _seg_resp(b4)],
        "seg-002.jsonl": [_seg_resp(b5)],
    }


# ===========================================================================
# Hydra ServerOutput fixture + expected sidecar
# ===========================================================================

ValueSpec = tuple[int, dict]  # (coins, {policy_hex: {asset_hex: qty}})


def _value_node(coins: int, assets: dict):
    if not assets:
        return cbor.mk_uint(coins)
    ma = cbor.mk_map(
        [
            (
                cbor.mk_bytes(bytes.fromhex(pol)),
                cbor.mk_map(
                    [
                        (cbor.mk_bytes(bytes.fromhex(a)), cbor.mk_uint(q))
                        for a, q in amap.items()
                    ]
                ),
            )
            for pol, amap in assets.items()
        ]
    )
    return cbor.mk_array([cbor.mk_uint(coins), ma])


def _conway_output_node(spec: dict):
    """Babbage/Conway map-form output node from an abstract output spec."""
    pairs = [
        (cbor.mk_uint(0), cbor.mk_bytes(ADDRS[spec["addr"]]["raw"])),
        (cbor.mk_uint(1), _value_node(spec["coins"], spec.get("assets", {}))),
    ]
    if spec.get("inline_datum") is not None:
        raw = bytes.fromhex(spec["inline_datum"])
        pairs.append(
            (
                cbor.mk_uint(2),
                cbor.mk_array([cbor.mk_uint(1), cbor.mk_tag(24, cbor.mk_bytes(raw))]),
            )
        )
    elif spec.get("datum_hash") is not None:
        pairs.append(
            (
                cbor.mk_uint(2),
                cbor.mk_array(
                    [cbor.mk_uint(0), cbor.mk_bytes(bytes.fromhex(spec["datum_hash"]))]
                ),
            )
        )
    if spec.get("script_ref") is not None:
        lang, body = spec["script_ref"]
        inner = cbor.encode(
            cbor.mk_array([cbor.mk_uint(lang), cbor.mk_bytes(bytes.fromhex(body))])
        )
        pairs.append((cbor.mk_uint(3), cbor.mk_tag(24, cbor.mk_bytes(inner))))
    return cbor.mk_map(pairs)


def _legacy_output_node(spec: dict):
    items = [
        cbor.mk_bytes(ADDRS[spec["addr"]]["raw"]),
        _value_node(spec["coins"], spec.get("assets", {})),
    ]
    if spec.get("datum_hash") is not None:
        items.append(cbor.mk_bytes(bytes.fromhex(spec["datum_hash"])))
    return cbor.mk_array(items)


def _conway_tx(spec: dict) -> tuple[str, str]:
    """Abstract tx spec → (cborHex, transaction_id).

    The txid is blake2b-256 over the encoded body — the ledger definition,
    computed here from the bytes this generator itself assembled."""
    # inputs sorted by (txid, index): the ledger Set order redeemers refer to
    ins = sorted(spec["inputs"])
    in_nodes = [
        cbor.mk_array([cbor.mk_bytes(bytes.fromhex(t)), cbor.mk_uint(ix)])
        for t, ix in ins
    ]
    in_set = cbor.mk_array(in_nodes)
    if spec.get("tag258"):
        in_set = cbor.mk_tag(258, in_set)
    out_node = cbor.mk_array(
        [
            (_legacy_output_node(o) if o.get("legacy") else _conway_output_node(o))
            for o in spec["outputs"]
        ]
    )
    body = cbor.mk_map(
        [
            (cbor.mk_uint(0), in_set),
            (cbor.mk_uint(1), out_node),
            (cbor.mk_uint(2), cbor.mk_uint(spec.get("fee", 170000))),
        ]
    )
    wit_pairs = []
    if spec.get("witness_datums"):
        wit_pairs.append(
            (
                cbor.mk_uint(4),
                cbor.mk_tag(
                    258,
                    cbor.mk_array(
                        [
                            cbor.decode(bytes.fromhex(d))
                            for d in spec["witness_datums"]
                        ]
                    ),
                ),
            )
        )
    if spec.get("redeemers"):
        if spec.get("legacy_redeemers"):
            wit_pairs.append(
                (
                    cbor.mk_uint(5),
                    cbor.mk_array(
                        [
                            cbor.mk_array(
                                [
                                    cbor.mk_uint(0),  # spend purpose
                                    cbor.mk_uint(ix),
                                    cbor.decode(bytes.fromhex(d)),
                                    cbor.mk_array(
                                        [cbor.mk_uint(1), cbor.mk_uint(2)]
                                    ),
                                ]
                            )
                            for ix, d in spec["redeemers"]
                        ]
                    ),
                )
            )
        else:
            wit_pairs.append(
                (
                    cbor.mk_uint(5),
                    cbor.mk_map(
                        [
                            (
                                cbor.mk_array([cbor.mk_uint(0), cbor.mk_uint(ix)]),
                                cbor.mk_array(
                                    [
                                        cbor.decode(bytes.fromhex(d)),
                                        cbor.mk_array(
                                            [cbor.mk_uint(1), cbor.mk_uint(2)]
                                        ),
                                    ]
                                ),
                            )
                            for ix, d in spec["redeemers"]
                        ]
                    ),
                )
            )
    if spec.get("witness_script") is not None:
        wits_key, body_hex = spec["witness_script"]
        wit_pairs.append(
            (
                cbor.mk_uint(wits_key),
                cbor.mk_array([cbor.mk_bytes(bytes.fromhex(body_hex))]),
            )
        )
    wits = cbor.mk_map(wit_pairs)
    body_bytes = cbor.encode(body)
    txid = blake2b(body_bytes, 32)
    tx = cbor.mk_array([body, wits, cbor.mk_uint(1), cbor.mk_array([])])
    return cbor.encode(tx).hex(), txid


def _pd(n: int) -> str:
    """Deterministic plutus-data CBOR hex: map {n: [n, n+1]}."""
    return cbor.encode(
        cbor.mk_map(
            [(cbor.mk_uint(n), cbor.mk_array([cbor.mk_uint(n), cbor.mk_uint(n + 1)]))]
        )
    ).hex()


def gen_hydra() -> tuple[list[str], list[dict]]:
    lines: list[str] = []
    expected: list[dict] = []

    def expect(txid, tix, spec_out, slot):
        assets = spec_out.get("assets", {})
        row = {
            "output_reference": f"{txid}#{spec_out['output_index']}",
            "transaction_id": txid,
            "transaction_index": tix,
            "output_index": spec_out["output_index"],
            "address": ADDRS[spec_out["addr"]]["engine"],
            "coins": spec_out["coins"],
            "created_at": slot,
            "datum_kind": "none",
            "datum_hash": None,
            "datum_cbor": None,
            "spent_at": None,
            "spent_by": None,
            "spent_input_index": None,
            "spent_with": None,
            "n_assets": sum(len(a) for a in assets.values()),
            "asset_qty": sum(q for a in assets.values() for q in a.values()),
        }
        if spec_out.get("inline_datum") is not None:
            row["datum_kind"] = "inline"
            row["datum_cbor"] = spec_out["inline_datum"]
            row["datum_hash"] = blake2b(bytes.fromhex(spec_out["inline_datum"]), 32)
        elif spec_out.get("datum_hash") is not None:
            row["datum_kind"] = "reference"
            row["datum_hash"] = spec_out["datum_hash"]
            row["datum_cbor"] = spec_out.get("witnessed_cbor")
        expected.append(row)
        return row

    lines.append(json.dumps({"tag": "Greetings", "me": {"vkey": hex64("fxme")}}))

    # ---- HeadIsOpen genesis: 3 txs, sorted by txid (Data.Map fold order)
    gtx = sorted(hex64(f"fxgtx{i}") for i in range(3))
    gspecs = {
        (gtx[0], 0): {
            "output_index": 0,
            "addr": 0,
            "coins": 11_000_000,
            "assets": {POLICIES[0]: {ASSETS[0]: 3, ASSETS[1]: 9}},
        },
        (gtx[0], 1): {
            "output_index": 1,
            "addr": 1,
            "coins": 5_500_000,
            "datum_hash": hex64("fxgdh"),
        },
        (gtx[1], 0): {
            "output_index": 0,
            "addr": 2,
            "coins": 7_250_000,
            "inline_datum": _pd(7),
        },
        (gtx[2], 0): {
            "output_index": 0,
            "addr": 3,
            "coins": 2_000_000,
            "genesis_script": (1, cbor.encode(cbor.mk_bytes(b"\x42\x42")).hex()),
        },
    }
    utxo = {}
    for (txid, ix), spec in gspecs.items():
        o = {
            "address": ADDRS[spec["addr"]]["bech32"],
            "value": {"lovelace": spec["coins"]},
        }
        for pol, amap in spec.get("assets", {}).items():
            o["value"][pol] = amap
        if spec.get("datum_hash") is not None:
            o["datumHash"] = spec["datum_hash"]
        elif spec.get("inline_datum") is not None:
            o["datum"] = spec["inline_datum"]
        if spec.get("genesis_script") is not None:
            lang, body = spec["genesis_script"]
            o["script"] = cbor.encode(
                cbor.mk_array(
                    [cbor.mk_uint(lang), cbor.mk_bytes(bytes.fromhex(body))]
                )
            ).hex()
        utxo[f"{txid}#{ix}"] = o
    lines.append(json.dumps({"tag": "HeadIsOpen", "utxo": utxo}, sort_keys=True))
    grows = {}
    for tix, txid in enumerate(gtx):
        for (t, ix), spec in sorted(gspecs.items()):
            if t == txid:
                grows[(txid, ix)] = expect(txid, tix, spec, slot=0)

    lines.append(json.dumps({"tag": "TxValid", "transactionId": gtx[0]}))

    # ---- SnapshotConfirmed #1: two Conway txs
    tx1_spec = {
        "inputs": [(gtx[0], 0), (gtx[1], 0)],
        "tag258": True,
        "outputs": [
            {
                "output_index": 0,
                "addr": 4,
                "coins": 9_000_000,
                "assets": {POLICIES[1]: {ASSETS[2]: 21}},
                "inline_datum": _pd(1),
            },
            {
                "output_index": 1,
                "addr": 5,
                "coins": 4_000_000,
                "datum_hash": blake2b(bytes.fromhex(_pd(2)), 32),
                "witnessed_cbor": _pd(2),
            },
            {
                "output_index": 2,
                "addr": 0,
                "coins": 1_500_000,
                "script_ref": (2, cbor.encode(cbor.mk_bytes(b"\x01\x02\x03")).hex()),
            },
        ],
        "witness_datums": [_pd(2)],
        "redeemers": [(0, _pd(3))],  # spend redeemer for sorted-input 0
    }
    tx1_hex, tx1_id = _conway_tx(tx1_spec)
    tx2_spec = {
        "inputs": [(tx1_id, 0)],
        "outputs": [{"output_index": 0, "addr": 1, "coins": 8_700_000}],
        "redeemers": [(0, _pd(4))],
    }
    tx2_hex, tx2_id = _conway_tx(tx2_spec)
    lines.append(
        json.dumps(
            {
                "tag": "SnapshotConfirmed",
                "snapshot": {
                    "number": 1,
                    "confirmed": [{"cborHex": tx1_hex}, {"cborHex": tx2_hex}],
                },
            }
        )
    )
    t1rows = {o["output_index"]: expect(tx1_id, 0, o, slot=1) for o in tx1_spec["outputs"]}
    t2rows = {o["output_index"]: expect(tx2_id, 1, o, slot=1) for o in tx2_spec["outputs"]}

    # ---- SnapshotConfirmed #2: legacy shapes
    tx3_spec = {
        "inputs": [(gtx[2], 0), (hex64("fxhext"), 4)],
        "outputs": [
            {
                "output_index": 0,
                "addr": 2,
                "coins": 1_900_000,
                "datum_hash": hex64("fxldh"),
                "legacy": True,
            }
        ],
        "legacy_redeemers": True,
        "redeemers": [(0, _pd(5))],
        "witness_script": (6, cbor.encode(cbor.mk_bytes(b"\x09")).hex()),
    }
    tx3_hex, tx3_id = _conway_tx(tx3_spec)
    lines.append(
        json.dumps(
            {
                "tag": "SnapshotConfirmed",
                "snapshot": {"number": 2, "confirmed": [{"cborHex": tx3_hex}]},
            }
        )
    )
    t3rows = {o["output_index"]: expect(tx3_id, 0, o, slot=2) for o in tx3_spec["outputs"]}
    assert t1rows and t2rows and t3rows

    # ---- spend DAG → spent_* columns (from the abstract spec, ledger-sorted)
    def mark(rows_by_key, consumed, spender_id, slot, redeemers, legacy=False):
        ins = sorted(consumed)
        rmap = dict(redeemers or [])
        for pos, (t, ix) in enumerate(ins):
            if (t, ix) in rows_by_key:
                row = rows_by_key[(t, ix)]
                row["spent_at"] = slot
                row["spent_by"] = spender_id
                row["spent_input_index"] = pos
                row["spent_with"] = rmap.get(pos)

    allrows = dict(grows)
    allrows.update({(tx1_id, ix): r for ix, r in t1rows.items()})
    allrows.update({(tx2_id, ix): r for ix, r in t2rows.items()})
    mark(allrows, tx1_spec["inputs"], tx1_id, 1, tx1_spec["redeemers"])
    mark(allrows, tx2_spec["inputs"], tx2_id, 1, tx2_spec["redeemers"])
    mark(allrows, tx3_spec["inputs"], tx3_id, 2, tx3_spec["redeemers"])

    return lines, expected


def main() -> None:
    outdir = Path(sys.argv[1]) if len(sys.argv) > 1 else FIXDIR
    outdir.mkdir(exist_ok=True)
    olines = gen_ogmios()
    (outdir / "ogmios_nextblock.ndjson").write_text("\n".join(olines) + "\n")
    segdir = outdir / "ogmios_segments"
    segdir.mkdir(exist_ok=True)
    segs = gen_ogmios_segments()
    for fname, slines in segs.items():
        (segdir / fname).write_text("\n".join(slines) + "\n")
    print(f"wrote {segdir}/ ({len(segs)} segment files)")
    hlines, hexp = gen_hydra()
    (outdir / "hydra_serveroutput.ndjson").write_text("\n".join(hlines) + "\n")
    (outdir / "hydra_expected.ndjson").write_text(
        "\n".join(json.dumps(r, sort_keys=True) for r in hexp) + "\n"
    )
    print(f"wrote {outdir}/ogmios_nextblock.ndjson ({len(olines)} lines)")
    print(f"wrote {outdir}/hydra_serveroutput.ndjson ({len(hlines)} messages)")
    print(f"wrote {outdir}/hydra_expected.ndjson ({len(hexp)} rows)")


if __name__ == "__main__":
    main()
