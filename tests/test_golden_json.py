"""Golden JSON parity with the reference encoder (VERDICT r3 item #5).

Three layers of certification for ``serve.result_json``:

1. **Golden vector end-to-end**: the reference's own extra golden vector
   (``test/vectors/golden/1.json``, an Ogmios ``nextBlock`` response its
   test suite decodes, ``OgmiosSpec.hs:63-66``) is decoded through our
   Ogmios source → ``build_index`` → ``result_json``, and every rendered
   payload is compared **byte-for-byte** against an expectation built by an
   independent pure-Python renderer in this file that follows the documented
   ``resultToJson`` rules (``Pattern.hs:447-521``).  The vector is read from
   the read-only reference checkout at test time (skip when absent) — it is
   never copied into the repo.

2. **OpenAPI Match schema**: every rendered row from the synthetic index is
   validated against the ``Match`` object schema of
   ``docs/api/v2.11.0.yaml:1268-1318`` (required keys, conditional
   ``datum``/``datum_type``/``script`` presence, ``additionalProperties:
   false``, value types), in all four (resolve_hashes × quantity-encoding)
   mode combinations.

3. **Quantity + address encodings**: ``asset-quantity=string`` renders every
   coin/asset quantity as a decimal string (``QuantityEncoding.hs:32-52``);
   ``rendered_addresses=True`` converts reshuffled index rows to bech32 wire
   text that round-trips through ``address_from_bech32``.
"""

from __future__ import annotations

import json
from pathlib import Path

import pytest
from pyspark.sql import functions as F

from kupo_spark.codecs import address_from_bech32, address_to_text
from kupo_spark.operators.indexer import build_index
from kupo_spark.operators.serve import result_json

GOLDEN = Path("/root/reference/test/vectors/golden/1.json")


# ---------------------------------------------------------------------------
# the independent expectation renderer (pure python, no Spark)
# ---------------------------------------------------------------------------


def _expect_assets(value: dict, as_string: bool) -> str:
    """Policies DESCENDING, asset names ASCENDING within a policy; bare
    policy key when the asset name is empty (Value.hs:73-99)."""
    frags = []
    for policy in sorted((k for k in value if k != "ada"), reverse=True):
        for name in sorted(value[policy]):
            key = policy if name == "" else f"{policy}.{name}"
            q = value[policy][name]
            frags.append(f'"{key}":"{q}"' if as_string else f'"{key}":{q}')
    return ",".join(frags)


def _expect_match(
    tx: dict,
    ti: int,
    oi: int,
    out: dict,
    block: dict,
    spends: dict,
    as_string: bool = False,
) -> str:
    """resultToJson for one golden-vector output, derived straight from the
    raw vector JSON (independent of the Spark pipeline)."""
    coins = out["value"]["ada"]["lovelace"]
    coins_s = f'"{coins}"' if as_string else str(coins)
    frags = [
        f'"transaction_index":{ti}',
        f'"transaction_id":"{tx["id"]}"',
        f'"output_index":{oi}',
        f'"address":"{out["address"]}"',
        f'"value":{{"coins":{coins_s},"assets":{{{_expect_assets(out["value"], as_string)}}}}}',
    ]
    if "datumHash" in out and out["datumHash"] is not None:
        frags += [f'"datum_hash":"{out["datumHash"]}"', '"datum_type":"hash"']
    elif out.get("datum") is not None:
        raise AssertionError("golden vector has no inline datums")
    else:
        frags.append('"datum_hash":null')
    frags.append('"script_hash":null')  # no scripts in the golden vector
    frags.append(
        f'"created_at":{{"slot_no":{block["slot"]},"header_hash":"{block["id"]}"}}'
    )
    ref = f'{tx["id"]}#{oi}'
    if ref in spends:
        by_tx, by_ix = spends[ref]
        frags.append(
            f'"spent_at":{{"slot_no":{block["slot"]},"header_hash":"{block["id"]}",'
            f'"transaction_id":"{by_tx}","input_index":{by_ix},"redeemer":null}}'
        )
    else:
        frags.append('"spent_at":null')
    return "{" + ",".join(frags) + "}"


@pytest.fixture(scope="module")
def golden_index(spark, tmp_path_factory):
    if not GOLDEN.exists():
        pytest.skip("reference golden vector not available")
    from kupo_spark.sources.ogmios import read_ogmios_jsonl

    doc = json.loads(GOLDEN.read_text())
    p = tmp_path_factory.mktemp("golden") / "log.ndjson"
    p.write_text(json.dumps(doc) + "\n")
    blocks = read_ogmios_jsonl(spark, str(p))
    return doc, build_index(blocks)


def _golden_expectations(doc: dict, as_string: bool = False) -> dict[str, str]:
    block = doc["result"]["block"]
    spends: dict[str, tuple[str, int]] = {}
    for tx in block["transactions"]:
        for ix, i in enumerate(tx.get("inputs") or []):
            spends[f'{i["transaction"]["id"]}#{i["index"]}'] = (tx["id"], ix)
    expected = {}
    for ti, tx in enumerate(block["transactions"]):
        for oi, out in enumerate(tx.get("outputs") or []):
            expected[f'{tx["id"]}#{oi}'] = _expect_match(
                tx, ti, oi, out, block, spends, as_string
            )
    return expected


def test_golden_vector_byte_exact(golden_index):
    # rendered_addresses=True is the reference configuration: the sources
    # normalize wire addresses into reshuffled rows at decode (as kupo's
    # own decoders do) and resultToJson/addressToJson re-renders wire text
    doc, idx = golden_index
    expected = _golden_expectations(doc)
    got = {
        r["output_reference"]: r["result"]
        for r in result_json(idx, "*", rendered_addresses=True).collect()
    }
    assert set(got) == set(expected)
    for ref in sorted(expected):
        assert got[ref] == expected[ref], f"mismatch at {ref}"


def test_golden_vector_quantity_as_string(golden_index):
    doc, idx = golden_index
    expected = _golden_expectations(doc, as_string=True)
    got = {
        r["output_reference"]: r["result"]
        for r in result_json(
            idx, "*", quantity_as_string=True, rendered_addresses=True
        ).collect()
    }
    assert got == expected


def test_golden_vector_addresses_render_to_wire_text(golden_index):
    """Normalized row-form addresses (bech32 + Byron base58 on the wire)
    re-render to the original wire text — addressToJson is a bijection on
    everything the decoder normalized."""
    doc, idx = golden_index
    rows = result_json(idx, "*", rendered_addresses=True).collect()
    wire = {
        o["address"]
        for tx in doc["result"]["block"]["transactions"]
        for o in tx.get("outputs") or []
    }
    rendered = {json.loads(r["result"])["address"] for r in rows}
    assert rendered == wire
    assert any(a.startswith("DdzFF") for a in rendered)  # Byron base58 kept


# ---------------------------------------------------------------------------
# OpenAPI Match schema validation (docs/api/v2.11.0.yaml:1268-1318)
# ---------------------------------------------------------------------------

_HEX = set("0123456789abcdef")


def _is_hex(s: str) -> bool:
    return isinstance(s, str) and set(s) <= _HEX and len(s) % 2 == 0


def _validate_match(payload: dict, *, resolve: bool, as_string: bool) -> None:
    required = [
        "transaction_index", "transaction_id", "output_index", "address",
        "value", "datum_hash", "script_hash", "created_at", "spent_at",
    ]
    for k in required:
        assert k in payload, f"missing required key {k}"
    allowed = set(required) | {"datum", "datum_type", "script"}
    assert set(payload) <= allowed, f"additionalProperties: {set(payload) - allowed}"

    assert isinstance(payload["transaction_index"], int)
    assert _is_hex(payload["transaction_id"])
    assert isinstance(payload["output_index"], int)
    assert isinstance(payload["address"], str)

    value = payload["value"]
    assert set(value) == {"coins", "assets"}
    qty_t = str if as_string else int
    assert isinstance(value["coins"], qty_t)
    if as_string:
        int(value["coins"])  # decimal string
    for k, q in value["assets"].items():
        assert isinstance(q, qty_t)
        policy, _, name = k.partition(".")
        assert _is_hex(policy) and (name == "" or _is_hex(name))

    assert payload["datum_hash"] is None or _is_hex(payload["datum_hash"])
    assert payload["script_hash"] is None or _is_hex(payload["script_hash"])

    # conditional keys: datum_type iff a datum exists (both modes);
    # datum/script keys present iff ?resolve_hashes (InlineAll)
    has_datum = payload["datum_hash"] is not None
    assert ("datum_type" in payload) == has_datum
    if has_datum:
        assert payload["datum_type"] in ("inline", "hash")
    assert ("datum" in payload) == resolve
    assert ("script" in payload) == resolve
    if resolve:
        assert payload["datum"] is None or _is_hex(payload["datum"])
        s = payload["script"]
        if s is not None:
            assert set(s) == {"script", "language"}
            assert s["language"] in ("native", "plutus:v1", "plutus:v2", "plutus:v3")
            assert _is_hex(s["script"])
        if payload["script_hash"] is None:
            assert s is None

    ca = payload["created_at"]
    assert set(ca) == {"slot_no", "header_hash"} and isinstance(ca["slot_no"], int)
    sa = payload["spent_at"]
    if sa is not None:
        assert set(sa) == {
            "slot_no", "header_hash", "transaction_id", "input_index", "redeemer"
        }
        assert isinstance(sa["slot_no"], int) and sa["slot_no"] >= ca["slot_no"]

    # key ORDER is part of the contract (aeson emits in code order)
    order = [
        "transaction_index", "transaction_id", "output_index", "address",
        "value", "datum_hash",
        *(["datum"] if resolve else []),
        *(["datum_type"] if has_datum else []),
        "script_hash",
        *(["script"] if resolve else []),
        "created_at", "spent_at",
    ]
    assert list(payload) == order


@pytest.mark.parametrize("resolve", [False, True])
@pytest.mark.parametrize("as_string", [False, True])
def test_match_schema_all_rows(index, resolve, as_string):
    rows = result_json(
        index, "*", resolve_hashes=resolve, quantity_as_string=as_string
    ).collect()
    assert rows
    for r in rows:
        payload = json.loads(r["result"])  # also proves well-formed JSON
        _validate_match(payload, resolve=resolve, as_string=as_string)


def test_resolve_hashes_inlines_known_datums(index):
    rows = [
        json.loads(r["result"])
        for r in result_json(index, "*", resolve_hashes=True).collect()
    ]
    inline = [p for p in rows if p.get("datum_type") == "inline"]
    assert inline and all(p["datum"] is not None for p in inline)
    scripts = [p for p in rows if p["script_hash"] is not None]
    assert scripts and any(p["script"] is not None for p in scripts)
    for p in scripts:
        if p["script"] is not None:
            # stored language-tagged bytes split into {script, language}
            assert p["script"]["language"] in (
                "native", "plutus:v1", "plutus:v2", "plutus:v3"
            )


# ---------------------------------------------------------------------------
# address rendering: reshuffled index rows → bech32 wire text, round-trip
# ---------------------------------------------------------------------------


def test_rendered_addresses_roundtrip(index):
    raws = [
        r["address"]
        for r in index.inputs.select("address").distinct().limit(200).collect()
    ]
    base = [a for a in raws if a.startswith("01")]
    assert base, "synthetic data should contain base addresses"
    for raw in base:
        text = address_to_text(raw)
        assert text.startswith(("addr1", "addr_test1"))
        assert address_from_bech32(text) == raw  # bijective on base addresses


def test_rendered_addresses_in_payload(index):
    rows = result_json(index, "*", rendered_addresses=True).limit(50).collect()
    for r in rows:
        addr = json.loads(r["result"])["address"]
        assert not set(addr) <= _HEX or not addr.startswith(("00", "01", "02", "03"))
