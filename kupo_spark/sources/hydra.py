"""Hydra source (S3) — protocol-faithful ServerOutput decoding.

Reference: ``Kupo/Data/Hydra.hs`` (357 LoC) + ``Kupo/App/ChainSync/Hydra.hs``.
A Hydra head is consumed as a chain of one block per confirmed snapshot:

* ``HeadIsOpen`` → one *genesis* block at slot 0, whose transactions are
  reconstructed from the initial ``utxo`` map by grouping output references
  per transaction id (``decodeHeadIsOpen`` / ``groupByTransactionId``,
  ``Hydra.hs:141-176``);
* ``SnapshotConfirmed`` → one block at ``slot = snapshot.number`` whose
  transactions arrive as full Conway-era **transaction CBOR** (``cborHex``,
  ``decodePartialTransaction``, ``Hydra.hs:180-221``);
* ``TxValid`` and anything else carries no block (``SomethingElse``).

Block identity follows ``mkHydraBlock`` (``Hydra.hs:101-120``): the header
hash is blake2b-256 over the concatenated transaction-id bytes, and the
block height equals the slot (snapshot number).

Spark-first split: the envelope is one ``from_json`` schema (JVM-side);
the byte-level work — Conway tx CBOR decode, blake2b txids, datum/script
packing — is an Arrow-batched pandas UDF over the already-pruned ``cborHex``
column, built on the repo's own :mod:`kupo_spark.cbor` codec (node model
preserves encoding widths, so re-encoding the body node reproduces the
original bytes and ``txid = blake2b256(body_bytes)`` is faithful).

Unlike the Ogmios JSON shape, addresses here are raw ledger bytes (CBOR
path) or bech32 text (genesis path); both are normalized to the engine's
reshuffled hex form (``codecs.reshuffle_address``), so payment/delegation
credential matching works identically to the synthetic chain.

Hydra transactions carry no metadata (``metadata = Nothing``,
``Hydra.hs:220`` — Hydra has no API to fetch it), so ``metadata_tags`` /
``metadata_cbor`` are NULL.
"""

from __future__ import annotations

import functools as _functools
import hashlib
import json

import pandas
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from kupo_spark import cbor
from kupo_spark.codecs import address_from_bech32, base58_decode, reshuffle_address

# ---------------------------------------------------------------------------
# ServerOutput envelope (decodeHydraMessage, Hydra.hs:124-137)
# ---------------------------------------------------------------------------

MESSAGE_DDL = (
    "tag string, "
    "transactionId string, "
    "utxo variant, "
    "snapshot struct<number: bigint, confirmed: array<struct<cborHex: string>>>"
)


def decode_messages(df: DataFrame, value_col: str = "value") -> DataFrame:
    """Parse raw ServerOutput JSON documents; one row per message."""
    return df.select(F.from_json(value_col, MESSAGE_DDL).alias("m")).select("m.*")


# ---------------------------------------------------------------------------
# Conway transaction CBOR → PartialTransaction (Hydra.hs:180-221)
# ---------------------------------------------------------------------------

# block payload produced per message: header hash + decoded transactions
_OUT_DDL = (
    "struct<output_index: int, address: string, coins: bigint, "
    "assets: map<string, map<string, bigint>>, datum_kind: string, "
    "datum_hash: string, datum_cbor: string, script_hash: string, "
    "script_cbor: string>"
)
_TX_DDL = (
    "struct<transaction_id: string, inputs: array<string>, "
    f"outputs: array<{_OUT_DDL}>, "
    "spend_redeemers: array<struct<key: int, value: string>>, "
    "witness_scripts: array<struct<script_hash: string, script_cbor: string>>>"
)
BLOCK_PAYLOAD_DDL = f"struct<header_hash: string, txs: array<{_TX_DDL}>>"


def _blake2b(data: bytes, size: int) -> str:
    return hashlib.blake2b(data, digest_size=size).hexdigest()


def _map_items(node) -> dict:
    """CBOR map node → {plain uint key: value node} (ignores non-uint keys)."""
    if node is None or node[0] != "map":
        return {}
    return {k[2]: v for k, v in node[2] if k[0] == "uint"}


def _set_items(node) -> list:
    """Array or tag-258 set node → item list (conway `set<a>` encoding)."""
    if node is None:
        return []
    if node[0] == "tag" and node[2][0] == 258:
        node = node[2][1]
    return node[2] if node[0] == "array" else []


def _engine_address(raw: bytes) -> str:
    """Ledger address bytes → reshuffled engine hex (Database.hs:536-599).

    Byron bootstrap addresses (header nibble 0x8) are a variable-length
    CBOR structure, not header‖credentials — slicing them at fixed offsets
    would fabricate garbage credentials, so they are stored whole under
    tag 00, matching the reference's addressToRow bootstrap arm."""
    header = raw[0]
    if header >> 4 == 0x8:
        return "00" + raw.hex()
    payment = raw[1:29]
    rest = raw[29:]
    if header >> 4 in (4, 5):
        # pointer address: the tail is the VARIABLE-width pointer and is
        # preserved whole in the middle slot (addressToRow keeps it; the
        # tag-2 unshuffle arm parses it back) — a 28-byte slice would
        # drop or corrupt it
        delegation = rest or None
    else:
        delegation = rest[:28] if len(rest) >= 28 else None
    return reshuffle_address(header, payment, delegation)


def _decode_value(node) -> tuple[int, dict]:
    """`coin / [coin, multiasset]` → (coins, {policy_hex: {asset_hex: qty}})."""
    if node[0] == "uint":
        return node[2], {}
    coins = node[2][0][2]
    assets = {}
    for pol, amap in node[2][1][2]:
        assets[pol[2].hex()] = {
            name[2].hex(): (q[2] if q[0] == "uint" else -1 - q[2])
            for name, q in amap[2]
        }
    return coins, assets


def _pack_script_node(tag: int, body) -> tuple[str, str]:
    """Language tag + script body node → (blake2b-224 hash, tag‖body hex) —
    the ledger's `scriptFromBytes` form shared with the Ogmios source.

    Plutus bodies (tags 1-3) are CBOR bytes ITEMS whose CONTENT is the
    script — the ledger hashes/stores the content, and the Ogmios source
    packs ``script['cbor']`` which is that content.  Re-encoding the item
    would smuggle its length head into the packing and yield a hash that
    matches neither the ledger script hash nor the Ogmios-sourced row.
    Native bodies (tag 0) are the timelock CBOR STRUCTURE, whose encoding
    IS the script bytes."""
    raw = cbor.to_plain(body) if body[0] == "bytes" else cbor.encode(body)
    packed = bytes([tag]) + raw
    return _blake2b(packed, 28), packed.hex()


def _decode_output(ix: int, node) -> dict:
    """Babbage/Conway output (map keys 0-3) or legacy array form →
    engine output dict (fromBabbageOutput semantics)."""
    out = {
        "output_index": ix,
        "address": None,
        "coins": None,
        "assets": {},
        "datum_kind": "none",
        "datum_hash": None,
        "datum_cbor": None,
        "script_hash": None,
        "script_cbor": None,
    }
    if node[0] == "array":  # legacy [address, value, datum_hash?]
        items = node[2]
        out["address"] = _engine_address(items[0][2])
        out["coins"], out["assets"] = _decode_value(items[1])
        if len(items) > 2:
            out["datum_kind"] = "reference"
            out["datum_hash"] = items[2][2].hex()
        return out
    m = _map_items(node)
    out["address"] = _engine_address(m[0][2])
    out["coins"], out["assets"] = _decode_value(m[1])
    if 2 in m:  # datum_option = [0, hash] | [1, tag24(data)]
        kind, payload = m[2][2][0][2], m[2][2][1]
        if kind == 0:
            out["datum_kind"] = "reference"
            out["datum_hash"] = payload[2].hex()
        else:
            raw = payload[2][1][2]  # tag 24 wrapping encoded plutus data
            out["datum_kind"] = "inline"
            out["datum_hash"] = _blake2b(raw, 32)
            out["datum_cbor"] = raw.hex()
    if 3 in m:  # script_ref = tag 24 wrapping encoded `[language, body]`
        script = cbor.decode(m[3][2][1][2])
        h, c = _pack_script_node(script[2][0][2], script[2][1])
        out["script_hash"], out["script_cbor"] = h, c
    return out


_SPEND_PURPOSE = 0  # AlonzoSpending redeemer tag


def _decode_redeemers(node) -> dict[int, str]:
    """Witness-set redeemers (legacy array of [tag, ix, data, ex] or conway
    map {[tag, ix]: [data, ex]}) → {input_index: data_hex}, spend-purpose
    only (Hydra.hs:208-215)."""
    spends = {}
    if node is None:
        return spends
    if node[0] == "array":
        for r in node[2]:
            tag, ix, data = r[2][0][2], r[2][1][2], r[2][2]
            if tag == _SPEND_PURPOSE:
                spends[ix] = cbor.encode(data).hex()
    else:
        for k, v in node[2]:
            tag, ix = k[2][0][2], k[2][1][2]
            if tag == _SPEND_PURPOSE:
                spends[ix] = cbor.encode(v[2][0]).hex()
    return spends


_WITNESS_SCRIPT_KEYS = ((1, 0), (3, 1), (6, 2), (7, 3))  # wits key → language


def _decode_tx(tx_hex: str) -> dict:
    """One Conway transaction CBOR → PartialTransaction dict."""
    node = cbor.decode(bytes.fromhex(tx_hex))
    body, wits = node[2][0], node[2][1]
    body_bytes = cbor.encode(body)
    bmap = _map_items(body)

    # ledger `Set` of inputs is ordered by (txid, index); redeemer indices
    # refer to positions in that order
    inputs = sorted(
        (i[2][0][2], i[2][1][2]) for i in _set_items(bmap.get(0))
    )
    outputs = [
        _decode_output(ix, o)
        for ix, o in enumerate((bmap.get(1) or ("array", 0, []))[2])
    ]

    wmap = _map_items(wits)
    witness_datums = {}
    for d in _set_items(wmap.get(4)):
        raw = cbor.encode(d)
        witness_datums[_blake2b(raw, 32)] = raw.hex()
    # fold witnessed bytes onto the outputs that reference them by hash
    for out in outputs:
        if out["datum_kind"] == "reference" and out["datum_cbor"] is None:
            out["datum_cbor"] = witness_datums.get(out["datum_hash"])

    scripts = []
    for key, lang in _WITNESS_SCRIPT_KEYS:
        for s in _set_items(wmap.get(key)):
            h, c = _pack_script_node(lang, s)
            scripts.append({"script_hash": h, "script_cbor": c})

    return {
        "transaction_id": _blake2b(body_bytes, 32),
        "inputs": [f"{t.hex()}#{ix}" for t, ix in inputs],
        "outputs": outputs,
        "spend_redeemers": [
            {"key": k, "value": v}
            for k, v in sorted(_decode_redeemers(wmap.get(5)).items())
        ],
        "witness_scripts": scripts,
    }


def _genesis_address(text: str) -> str:
    """Genesis UTxO address text → engine hex.  bech32 (Shelley) decodes to
    the reshuffled form; base58 (Byron bootstrap) is stored whole under
    tag 00; anything else is an error, never silently passed through as an
    unmatchable text column."""
    engine = address_from_bech32(text)
    if engine is not None:
        return engine
    raw = base58_decode(text)
    # a Byron address is CBOR `[tag24(payload), crc]` — 0x82 array header
    if raw is not None and len(raw) > 0 and raw[0] == 0x82:
        return "00" + raw.hex()
    raise ValueError(f"undecodable genesis address: {text!r}")


def _genesis_txs(utxo_json: str) -> list[dict]:
    """HeadIsOpen `utxo` map → synthetic genesis transactions, grouped by
    transaction id with outputs at their original indices (Hydra.hs:141-176).
    Map iteration order (sorted keys) mirrors the reference's Data.Map fold."""
    utxo = json.loads(utxo_json)
    by_tx: dict[str, list[tuple[int, dict]]] = {}
    for ref in sorted(utxo):
        tx_id, _, ix = ref.partition("#")
        by_tx.setdefault(tx_id, []).append((int(ix), utxo[ref]))
    txs = []
    for tx_id in sorted(by_tx):
        outputs = []
        for ix, o in sorted(by_tx[tx_id]):
            value = o.get("value", {})
            out = {
                "output_index": ix,
                "address": _genesis_address(o["address"]),
                "coins": value.get("lovelace", 0),
                "assets": {
                    pol: {name: int(q) for name, q in amap.items()}
                    for pol, amap in value.items()
                    if pol != "lovelace"
                },
                "datum_kind": "none",
                "datum_hash": None,
                "datum_cbor": None,
                "script_hash": None,
                "script_cbor": None,
            }
            # (Just hash, _) → Reference; bare datum → Inline (Hydra.hs:230-246)
            if o.get("datumHash") is not None:
                out["datum_kind"] = "reference"
                out["datum_hash"] = o["datumHash"]
            elif o.get("datum") is not None:
                raw = bytes.fromhex(o["datum"])
                out["datum_kind"] = "inline"
                out["datum_hash"] = _blake2b(raw, 32)
                out["datum_cbor"] = raw.hex()
            if o.get("script") is not None:
                # text script = CBOR `[tag, body]`; repack as tag‖body
                # (scriptFromBytes', Hydra.hs:274-290)
                s = cbor.decode(bytes.fromhex(o["script"]))
                h, c = _pack_script_node(s[2][0][2], s[2][1])
                out["script_hash"], out["script_cbor"] = h, c
            outputs.append(out)
        txs.append(
            {
                "transaction_id": tx_id,
                "inputs": [],
                "outputs": outputs,
                "spend_redeemers": [],
                "witness_scripts": [],
            }
        )
    return txs


def _block_of(txs: list[dict]) -> dict:
    """mkHydraBlock: header hash = blake2b-256 over concatenated txid bytes."""
    joined = b"".join(bytes.fromhex(t["transaction_id"]) for t in txs)
    return {"header_hash": _blake2b(joined, 32), "txs": txs}


def _blocks_frame(blocks: list) -> pandas.DataFrame:
    # a StructType-returning scalar pandas UDF must yield a DataFrame whose
    # columns are the struct fields (Spark materializes it as one struct col)
    return pandas.DataFrame(
        {
            "header_hash": [b["header_hash"] if b else None for b in blocks],
            "txs": [b["txs"] if b else None for b in blocks],
        }
    )


def _decode_snapshot_batch(cbor_hexes: pandas.Series) -> pandas.DataFrame:
    return _blocks_frame(
        [
            None if hexes is None else _block_of([_decode_tx(h) for h in hexes])
            for hexes in cbor_hexes
        ]
    )


def _decode_genesis_batch(utxo_json: pandas.Series) -> pandas.DataFrame:
    return _blocks_frame(
        [
            None if txt is None else _block_of(_genesis_txs(txt))
            for txt in utxo_json
        ]
    )


@_functools.lru_cache(maxsize=1)
def _udfs():
    # DDL return types parse against the active session — build lazily
    return (
        pandas_udf(_decode_snapshot_batch, returnType=BLOCK_PAYLOAD_DDL),
        pandas_udf(_decode_genesis_batch, returnType=BLOCK_PAYLOAD_DDL),
    )


def decode_snapshot(col):
    return _udfs()[0](col)


def decode_genesis(col):
    return _udfs()[1](col)


# ---------------------------------------------------------------------------
# messages → blocks (the engine's BLOCK_SCHEMA shape)
# ---------------------------------------------------------------------------


def partial_blocks(decoded: DataFrame) -> DataFrame:
    """ServerOutput messages → one row per transaction in the engine's blocks
    schema.  HeadIsOpen yields the slot-0 genesis block; each
    SnapshotConfirmed yields one block at slot = snapshot number."""
    genesis = decoded.where(F.col("tag") == "HeadIsOpen").select(
        F.lit(0).cast("long").alias("slot_no"),
        decode_genesis(F.to_json("utxo")).alias("blk"),
    )
    snaps = decoded.where(F.col("tag") == "SnapshotConfirmed").select(
        F.col("snapshot.number").alias("slot_no"),
        decode_snapshot(
            F.expr("transform(snapshot.confirmed, c -> c.cborHex)")
        ).alias("blk"),
    )
    blocks = genesis.unionByName(snaps)
    tx = blocks.select(
        "slot_no",
        F.col("blk.header_hash").alias("header_hash"),
        F.posexplode_outer("blk.txs").alias("transaction_index", "tx"),
    ).where(F.col("tx").isNotNull())
    return tx.select(
        "slot_no",
        "header_hash",
        F.col("transaction_index").cast("int").alias("transaction_index"),
        F.col("tx.transaction_id").alias("transaction_id"),
        F.col("tx.inputs").alias("inputs"),
        F.col("tx.outputs").alias("outputs"),
        # empty map (not NULL) when a tx has no spend redeemers — the Ogmios
        # source emits the same shape, so consumers see one schema
        F.map_from_entries(
            F.coalesce(
                F.col("tx.spend_redeemers"),
                F.expr("array()").cast("array<struct<key: int, value: string>>"),
            )
        ).alias("spend_redeemers"),
        F.lit(None).cast("array<long>").alias("metadata_tags"),
        F.lit(None).cast("string").alias("metadata_cbor"),
    )


def tips(decoded: DataFrame, blocks: DataFrame | None = None) -> DataFrame:
    """The tip implied by each block-bearing message (mkHydraBlock's Tip:
    height = slot = snapshot number).

    ``blocks``: pass an already-built (ideally persisted) ``partial_blocks``
    frame to share its snapshot decode — the Python CBOR UDF is the
    dominant per-batch cost, and a separate lineage re-runs it per
    action."""
    if blocks is None:
        blocks = partial_blocks(decoded)
    return (
        blocks.groupBy("slot_no", "header_hash")
        .agg(F.first("slot_no").alias("height"))
        .select("slot_no", "header_hash", "height")
    )


def witness_scripts(decoded: DataFrame) -> DataFrame:
    """Witness-set scripts → (script_hash, script_cbor) dictionary rows for
    the W3 scripts table (PartialTransaction.scripts, Hydra.hs:216)."""
    snaps = decoded.where(F.col("tag") == "SnapshotConfirmed").select(
        decode_snapshot(
            F.expr("transform(snapshot.confirmed, c -> c.cborHex)")
        ).alias("blk")
    )
    return (
        snaps.select(F.explode("blk.txs").alias("tx"))
        .select(F.explode("tx.witness_scripts").alias("s"))
        .select("s.script_hash", "s.script_cbor")
        .dropDuplicates(["script_hash"])
    )


class IntersectionNotFound(RuntimeError):
    """A known checkpoint's header hash disagrees with the head's block at
    the same slot (ChainSync/Hydra.hs:137-146) — the index belongs to a
    different head."""


def resume_filter(blocks: DataFrame, points: list[tuple[int, str]]) -> DataFrame:
    """Batch analog of the reference's fake-intersection skip
    (ChainSync/Hydra.hs:69-151): Hydra cannot negotiate an intersection, so
    already-indexed snapshots are skipped by checkpoint.  Blocks at a known
    checkpoint slot must carry the same header hash (else the head differs —
    raise); only blocks past the newest checkpoint flow through."""
    if not points:
        return blocks
    expected = dict(points)
    seen = (
        blocks.select("slot_no", "header_hash")
        .where(F.col("slot_no").isin(list(expected)))
        .distinct()
        .collect()
    )
    mismatched = [
        (row.slot_no, row.header_hash)
        for row in seen
        if expected[row.slot_no] != row.header_hash
    ]
    if mismatched:
        raise IntersectionNotFound(f"checkpoints not on this head: {mismatched}")
    cursor = max(slot for slot, _ in points)
    return blocks.where(F.col("slot_no") > F.lit(cursor))


def read_hydra_jsonl(spark: SparkSession, path: str) -> DataFrame:
    """Batch-read an NDJSON log of Hydra ServerOutput messages → blocks."""
    return partial_blocks(decode_messages(spark.read.text(path)))


def stream_hydra_jsonl(
    spark: SparkSession, path: str, max_files_per_trigger: int = 1
) -> DataFrame:
    """Stream the same NDJSON shape (file source; the websocket bridge is
    ingestion infra upstream, as with the Ogmios source)."""
    raw = (
        spark.readStream.option("maxFilesPerTrigger", max_files_per_trigger)
        .text(path)
    )
    return partial_blocks(decode_messages(raw))
