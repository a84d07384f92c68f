"""Ogmios chain-sync source (S2) — protocol-faithful nextBlock decoding.

Reference: ``Kupo/Data/Ogmios.hs`` (the 566-line JSON decoder kupo validates
against ``test/vectors/ogmios``).  This module decodes the same Ogmios v6
JSON-RPC ``nextBlock`` response documents into the engine's PartialBlock
shape, Spark-first:

* the **bulk structure** (envelope, transactions, inputs, outputs, values,
  redeemers) is typed out in one ``from_json`` schema and transformed with
  built-in functions — whole-stage-codegen, no Python;
* the **union-typed / recursive subtrees** the protocol has (``tip`` being
  ``"origin" | {slot, id, height}``, native-script clause trees, the
  ``{"cbor": ..} | {"json": ..}`` metadatum forms) are carried as Spark
  ``VARIANT`` columns — still JVM-side — and only the byte-level codec work
  (blake2b hashing, native-script → CBOR, metadatum assembly) crosses into
  Python via Arrow-batched pandas UDFs on already-pruned columns;
* decode semantics mirror the reference decoder exactly:
  - effective inputs come from the ``spends`` input source — ``inputs`` or
    ``collaterals`` (``Ogmios.hs:215-218``);
  - with ``spends == "collaterals"`` the regular outputs are DROPPED and
    only ``collateralReturn`` survives, at output index ``len(outputs)``
    (``Ogmios.hs:234-238`` / ``withReferences`` offset);
  - ``datumHash`` ⇒ reference datum, bare ``datum`` ⇒ inline
    (``Ogmios.hs:284-291``);
  - only ``purpose == "spend"`` redeemers are kept, keyed by input index
    (``Ogmios.hs:379-392``);
  - value is ``{"ada": {"lovelace": n}}`` plus policy→asset→quantity maps
    (``Ogmios.hs:495-524``);
  - scripts are ``native`` clause trees or ``plutus:v{1,2,3}`` CBOR with
    the language tag prefixed (``Ogmios.hs:316-337``).

Witness datums (``tx.datums``) are folded onto the outputs that reference
them by hash, matching how the engine models W3 dictionaries on outputs;
witness scripts are exposed separately via :func:`witness_scripts`.
"""

from __future__ import annotations

import hashlib
import json
import re

import pandas
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import (
    StringType,
    StructField,
    StructType,
)

from kupo_spark import cbor

# ---------------------------------------------------------------------------
# the nextBlock response schema (Ogmios.hs:176-246)
# ---------------------------------------------------------------------------

_OUTPUT = (
    "struct<"
    "address: string, "
    "value: map<string, map<string, bigint>>, "
    "datumHash: string, "
    "datum: string, "
    "script: variant"
    ">"
)

_TX = (
    "struct<"
    "id: string, "
    "spends: string, "
    "inputs: array<struct<transaction: struct<id: string>, index: int>>, "
    "collaterals: array<struct<transaction: struct<id: string>, index: int>>, "
    f"outputs: array<{_OUTPUT}>, "
    f"collateralReturn: {_OUTPUT}, "
    "datums: map<string, string>, "
    "redeemers: array<struct<validator: struct<purpose: string, index: int>, "
    "redeemer: string>>, "
    "scripts: map<string, variant>, "
    "metadata: struct<hash: string, labels: map<string, variant>>"
    ">"
)

NEXT_BLOCK_DDL = (
    "jsonrpc string, method string, "
    "result struct<"
    "direction: string, "
    "tip: variant, "
    "point: variant, "
    "block: struct<"
    "type: string, era: string, id: string, slot: bigint, height: bigint, "
    f"transactions: array<{_TX}>"
    ">>"
)


def decode_next_block(
    df: DataFrame, value_col: str = "value", keep: tuple = ()
) -> DataFrame:
    """Parse raw nextBlock JSON documents; one row per response.  ``keep``
    carries extra input columns (e.g. a file-order column) through."""
    cols = [F.from_json(value_col, NEXT_BLOCK_DDL).alias("r")]
    cols += [F.col(c) for c in keep]
    return df.select(*cols).select("r.result.*", *keep)


# ---------------------------------------------------------------------------
# edge kernels: blake2b + CBOR byte work (Arrow-batched, pruned inputs)
# ---------------------------------------------------------------------------

_SCRIPT_STRUCT = StructType(
    [StructField("script_hash", StringType()), StructField("script_cbor", StringType())]
)

_NATIVE_TAGS = {"all": 1, "any": 2}


def _native_to_node(clause: dict):
    """Native-script clause tree → timelock CBOR node (shelley.cddl
    ``native_script``; clause names per Ogmios.hs:340-365)."""
    c = clause["clause"]
    if c == "signature":
        return cbor.mk_array([cbor.mk_uint(0), cbor.mk_bytes(bytes.fromhex(clause["from"]))])
    if c in _NATIVE_TAGS:
        subs = [_native_to_node(s) for s in clause["from"]]
        return cbor.mk_array([cbor.mk_uint(_NATIVE_TAGS[c]), cbor.mk_array(subs)])
    if c == "some":
        subs = [_native_to_node(s) for s in clause["from"]]
        return cbor.mk_array(
            [cbor.mk_uint(3), cbor.mk_uint(clause["atLeast"]), cbor.mk_array(subs)]
        )
    if c == "after":  # RequireTimeStart (invalid_before)
        return cbor.mk_array([cbor.mk_uint(4), cbor.mk_uint(clause["slot"])])
    if c == "before":  # RequireTimeExpire (invalid_hereafter)
        return cbor.mk_array([cbor.mk_uint(5), cbor.mk_uint(clause["slot"])])
    raise ValueError(f"unrecognized native script clause: {c}")


_PLUTUS_TAG = {"plutus:v1": "01", "plutus:v2": "02", "plutus:v3": "03"}


def _pack_script(script: dict) -> tuple[str, str]:
    """Script JSON → (blake2b-224 hash hex, language-tagged CBOR hex) —
    decodeScript (Ogmios.hs:316-337) + the ledger's tag ‖ bytes hashing."""
    lang = script["language"]
    if lang == "native":
        body = b"\x00" + cbor.encode(_native_to_node(script["json"]))
    else:
        body = bytes.fromhex(_PLUTUS_TAG[lang] + script["cbor"])
    return hashlib.blake2b(body, digest_size=28).hexdigest(), body.hex()


def _pack_script_batch(script_json: pandas.Series) -> pandas.DataFrame:
    hashes, cbors = [], []
    for txt in script_json:
        if txt is None:
            hashes.append(None)
            cbors.append(None)
        else:
            h, c = _pack_script(json.loads(txt))
            hashes.append(h)
            cbors.append(c)
    return pandas.DataFrame({"script_hash": hashes, "script_cbor": cbors})


pack_script = pandas_udf(_pack_script_batch, returnType=_SCRIPT_STRUCT)


def _blake2b256_batch(hex_payload: pandas.Series) -> pandas.Series:
    return pandas.Series(
        [
            None
            if h is None
            else hashlib.blake2b(bytes.fromhex(h), digest_size=32).hexdigest()
            for h in hex_payload
        ]
    )


blake2b_256_hex = pandas_udf(_blake2b256_batch, returnType=StringType())


_ENGINE_HEX = re.compile(r"(00|01|02|03)([0-9a-f][0-9a-f])+")


def _normalize_address_batch(addr: pandas.Series) -> pandas.Series:
    """Wire address text → the reshuffled engine row form.

    A real Ogmios v6 endpoint serves bech32 (`addr1…`) / base58 (Byron)
    address TEXT, while the matching/indexing layer assumes the reshuffled
    hex rows (Database.hs:536-599) — without this normalization every
    address/credential pattern silently matches nothing on an Ogmios-fed
    index (the reference normalizes in its own decoder, Ogmios.hs).
    Already-normalized rows (the engine-hex replay fixtures) take the
    regex fast path untouched."""
    from kupo_spark import cbor as _cbor
    from kupo_spark.codecs import address_from_bech32, base58_decode

    def looks_byron(raw: bytes) -> bool:
        # Byron addresses are CBOR `[tag24(root-payload), crc]` — any
        # base58-alphabet string decodes to SOME bytes, so the structure
        # check is what separates a real bootstrap address from text
        try:
            node = _cbor.decode(raw)
        except _cbor.CborError:
            return False
        return (
            node[0] == "array"
            and len(node[2]) == 2
            and node[2][0][0] == "tag"
            and node[2][0][2][0] == 24
        )

    def norm(a):
        if a is None:
            return None
        if _ENGINE_HEX.fullmatch(a):
            return a
        via = address_from_bech32(a)
        if via is not None:
            return via
        raw = base58_decode(a)
        if raw is not None and looks_byron(raw):
            return "00" + raw.hex()
        return a  # unknown text: keep verbatim (lenient decode contract)

    return addr.map(norm)


normalize_address = pandas_udf(_normalize_address_batch, returnType=StringType())


def _metadatum_from_json_value(v):
    """valueToMetadatum (Ogmios.hs:545-560): object → Map with string keys,
    array → List, number → I, string → S."""
    if isinstance(v, dict):
        return cbor.mk_map(
            [(cbor.mk_text(k), _metadatum_from_json_value(x)) for k, x in v.items()]
        )
    if isinstance(v, list):
        return cbor.mk_array([_metadatum_from_json_value(x) for x in v])
    if isinstance(v, bool):
        raise ValueError("impossible: bool in metadatum")
    if isinstance(v, int):
        return cbor.mk_uint(v) if v >= 0 else cbor.mk_nint(v)
    if isinstance(v, str):
        return cbor.mk_text(v)
    raise ValueError(f"impossible: {type(v)} in metadatum")


def _pack_metadata_batch(labels_json: pandas.Series) -> pandas.Series:
    """labels ``{label: {"cbor": hex} | {"json": value}}`` → metadata CBOR
    hex ``{label => metadatum}`` (decodeMetadata, Ogmios.hs:526-560)."""

    def pack(txt):
        if txt is None:
            return None
        labels = json.loads(txt)
        pairs = []
        for lbl, form in sorted(labels.items(), key=lambda kv: int(kv[0])):
            if "cbor" in form and form["cbor"] is not None:
                node = cbor.decode(bytes.fromhex(form["cbor"]))
            else:
                node = _metadatum_from_json_value(form["json"])
            pairs.append((cbor.mk_uint(int(lbl)), node))
        return cbor.encode(cbor.mk_map(pairs)).hex()

    return pandas.Series([pack(t) for t in labels_json])


pack_metadata = pandas_udf(_pack_metadata_batch, returnType=StringType())


# ---------------------------------------------------------------------------
# nextBlock responses → PartialBlock rows (the engine's blocks shape)
# ---------------------------------------------------------------------------


def _known_spends():
    """The only input sources the protocol defines (Ogmios.hs:235-237 fails
    the parse on anything else); a NULL ``spends`` is the pre-Alonzo absent
    field."""
    return F.col("tx.spends").isNull() | F.col("tx.spends").isin(
        "inputs", "collaterals"
    )


def rejected_transactions(decoded: DataFrame) -> DataFrame:
    """Transactions whose ``spends`` names an unknown input source — the
    reference decoder fails the whole parse ("unrecognized input source");
    here the malformed rows are routed to this error lane instead of being
    silently decoded as inputs-mode."""
    fwd = decoded.where(F.col("direction") == "forward").select("block")
    tx = fwd.select(
        F.col("block.slot").alias("slot_no"),
        F.posexplode_outer("block.transactions").alias("transaction_index", "tx"),
    ).where(F.col("tx").isNotNull() & ~_known_spends())
    return tx.select(
        "slot_no",
        "transaction_index",
        F.col("tx.id").alias("transaction_id"),
        F.col("tx.spends").alias("spends"),
    )


def partial_blocks(decoded: DataFrame) -> DataFrame:
    """RollForward responses → one row per transaction in the engine's
    blocks schema (``sources.json_blocks.BLOCK_SCHEMA`` semantics).
    Transactions with an unrecognized ``spends`` value are excluded (see
    :func:`rejected_transactions`)."""
    fwd = decoded.where(F.col("direction") == "forward").select("block")
    tx = fwd.select(
        F.col("block.slot").alias("slot_no"),
        F.col("block.id").alias("header_hash"),
        F.posexplode_outer("block.transactions").alias("transaction_index", "tx"),
    ).where(F.col("tx").isNotNull() & _known_spends())

    collateral_mode = F.col("tx.spends") == F.lit("collaterals")

    eff_inputs = F.when(collateral_mode, F.col("tx.collaterals")).otherwise(
        F.col("tx.inputs")
    )
    inputs = F.transform(
        F.coalesce(eff_inputs, F.array()),
        lambda i: F.concat(i["transaction"]["id"], F.lit("#"), i["index"].cast("string")),
    )

    # collateral mode: regular outputs dropped, collateralReturn survives at
    # index len(outputs) (withReferences offset, Ogmios.hs:234-238)
    raw_outs = F.when(
        collateral_mode,
        F.when(
            F.col("tx.collateralReturn").isNotNull(),
            F.array(
                F.struct(
                    F.size(F.coalesce(F.col("tx.outputs"), F.array()))
                    .cast("int")
                    .alias("output_index"),
                    F.col("tx.collateralReturn").alias("o"),
                )
            ),
        ).otherwise(F.array()),
    ).otherwise(
        F.transform(
            F.coalesce(F.col("tx.outputs"), F.array()),
            lambda o, j: F.struct(j.cast("int").alias("output_index"), o.alias("o")),
        )
    )

    tx = tx.select(
        "slot_no",
        "header_hash",
        "transaction_index",
        F.col("tx.id").alias("transaction_id"),
        inputs.alias("inputs"),
        raw_outs.alias("raw_outs"),
        F.map_from_entries(
            F.transform(
                F.filter(
                    F.coalesce(F.col("tx.redeemers"), F.array()),
                    lambda r: r["validator"]["purpose"] == F.lit("spend"),
                ),
                lambda r: F.struct(
                    r["validator"]["index"].alias("key"), r["redeemer"].alias("value")
                ),
            )
        ).alias("spend_redeemers"),
        F.col("tx.datums").alias("witness_datums"),
        F.when(
            F.col("tx.metadata").isNotNull(),
            F.sort_array(
                F.transform(
                    F.map_keys(F.col("tx.metadata.labels")), lambda k: k.cast("long")
                )
            ),
        ).alias("metadata_tags"),
        F.when(
            F.col("tx.metadata").isNotNull(),
            pack_metadata(F.to_json(F.col("tx.metadata.labels"))),
        ).alias("metadata_cbor"),
    )

    # explode outputs to attach datum/script codec columns, then regroup
    out = tx.select(
        "slot_no",
        "header_hash",
        "transaction_index",
        "transaction_id",
        "inputs",
        "spend_redeemers",
        "metadata_tags",
        "metadata_cbor",
        F.explode_outer("raw_outs").alias("po"),
        "witness_datums",
    )
    o = F.col("po.o")
    datum_kind = (
        F.when(o.isNull(), F.lit(None).cast("string"))
        .when(o["datumHash"].isNotNull(), F.lit("reference"))
        .when(o["datum"].isNotNull(), F.lit("inline"))
        .otherwise(F.lit("none"))
    )
    # inline datums hash to blake2b-256 of the raw bytes; reference datums
    # pick up witnessed bytes from tx.datums when provided
    datum_hash = F.when(o["datumHash"].isNotNull(), o["datumHash"]).otherwise(
        F.when(o["datum"].isNotNull(), blake2b_256_hex(o["datum"]))
    )
    datum_cbor = F.when(o["datum"].isNotNull(), o["datum"]).otherwise(
        F.when(
            o["datumHash"].isNotNull(),
            F.element_at(F.col("witness_datums"), o["datumHash"]),
        )
    )
    packed_script = F.when(
        o["script"].isNotNull(), pack_script(F.to_json(o["script"]))
    )

    out = out.select(
        "slot_no",
        "header_hash",
        "transaction_index",
        "transaction_id",
        "inputs",
        "spend_redeemers",
        "metadata_tags",
        "metadata_cbor",
        F.when(
            o.isNotNull(),
            F.struct(
                F.col("po.output_index").alias("output_index"),
                normalize_address(o["address"]).alias("address"),
                F.element_at(F.element_at(o["value"], "ada"), "lovelace").alias("coins"),
                F.map_filter(
                    F.coalesce(
                        o["value"],
                        F.lit(None).cast("map<string, map<string, bigint>>"),
                    ),
                    lambda k, _v: k != F.lit("ada"),
                ).alias("assets"),
                datum_kind.alias("datum_kind"),
                datum_hash.alias("datum_hash"),
                datum_cbor.alias("datum_cbor"),
                packed_script["script_hash"].alias("script_hash"),
                packed_script["script_cbor"].alias("script_cbor"),
            ),
        ).alias("out"),
    )

    # maps aren't orderable → group on the scalar tx key, carry the rest
    grouped = (
        out.groupBy("slot_no", "header_hash", "transaction_index", "transaction_id")
        .agg(
            F.first("inputs").alias("inputs"),
            F.array_sort(
                F.collect_list("out"), lambda a, b: a["output_index"] - b["output_index"]
            ).alias("outputs"),
            F.first("spend_redeemers").alias("spend_redeemers"),
            F.first("metadata_tags", ignorenulls=False).alias("metadata_tags"),
            F.first("metadata_cbor", ignorenulls=False).alias("metadata_cbor"),
        )
        .select(
            "slot_no",
            "header_hash",
            "transaction_index",
            "transaction_id",
            "inputs",
            "outputs",
            "spend_redeemers",
            "metadata_tags",
            "metadata_cbor",
        )
    )
    return grouped


def rollback_points(decoded: DataFrame) -> DataFrame:
    """RollBackward responses → (slot_no, header_hash) retraction points
    ('origin' → slot 0, no hash)."""
    bwd = decoded.where(F.col("direction") == "backward")
    is_origin = F.try_variant_get(F.col("point"), "$", "string") == F.lit("origin")
    return bwd.select(
        _rollback_slot_col().alias("slot_no"),
        F.when(is_origin, F.lit(None).cast("string"))
        .otherwise(F.try_variant_get(F.col("point"), "$.id", "string"))
        .alias("header_hash"),
    )


def tips(decoded: DataFrame) -> DataFrame:
    """The tip carried on every response ('origin' → slot 0)."""
    is_origin = F.try_variant_get(F.col("tip"), "$", "string") == F.lit("origin")
    return decoded.select(
        F.when(is_origin, F.lit(0))
        .otherwise(F.try_variant_get(F.col("tip"), "$.slot", "long"))
        .alias("slot_no"),
        F.try_variant_get(F.col("tip"), "$.id", "string").alias("header_hash"),
        F.try_variant_get(F.col("tip"), "$.height", "long").alias("height"),
    )


def witness_scripts(decoded: DataFrame) -> DataFrame:
    """Transaction-level witness scripts (``tx.scripts``) → one
    (script_hash, script_cbor) dictionary row per script, for the W3
    scripts table.  Keys are the ledger script hashes; values re-packed
    through the same codec as per-output scripts."""
    rows = (
        decoded.where(F.col("direction") == "forward")
        .select(F.explode("block.transactions").alias("tx"))
        .select(F.explode("tx.scripts").alias("script_hash", "script"))
    )
    packed = rows.select(
        "script_hash", pack_script(F.to_json(F.col("script"))).alias("p")
    )
    return packed.select(
        "script_hash", F.col("p.script_cbor").alias("script_cbor")
    ).dropDuplicates(["script_hash"])


def read_ogmios_jsonl(spark: SparkSession, path: str) -> DataFrame:
    """Batch-read an NDJSON log of nextBlock responses → blocks."""
    return partial_blocks(decode_next_block(spark.read.text(path)))


#: RollBackward point → slot ('origin' → 0); shared by rollback_points and
#: the canonical segment view
def _rollback_slot_col():
    is_origin = F.try_variant_get(F.col("point"), "$", "string") == F.lit("origin")
    return F.when(is_origin, F.lit(0)).otherwise(
        F.try_variant_get(F.col("point"), "$.slot", "long")
    )


def _natural_key(name: str) -> tuple:
    """Numeric-aware sort key: ``seg9 < seg10`` (digit runs compare as
    integers, text runs as text) — deterministic across checkouts, unlike
    mtime, and matches any bridge whose segment names carry a monotone
    sequence number regardless of zero-padding."""
    import re

    return tuple(
        (0, f"{int(tok):020d}") if tok.isdigit() else (1, tok)
        for tok in re.split(r"(\d+)", name)
        if tok != ""
    )


def segment_order(seg_dir: str) -> list:
    """Delivery-ordered segment files (the bridge contract: names carry a
    monotone sequence number, natural-sorted).  Shared by the Spark view
    and the DuckDB oracle so both pin the identical listing."""
    from pathlib import Path

    return sorted(
        (p for p in Path(seg_dir).iterdir() if p.is_file()),
        key=lambda p: _natural_key(p.name),
    )


def canonical_blocks(spark: SparkSession, seg_dir: str) -> DataFrame:
    """Batch view of an NDJSON SEGMENT DIRECTORY with RollBackward records
    netted out — the canonical chain a batch replay (e.g. the PUT /patterns
    backfill) must see.

    Delivery order is the NATURAL-SORTED file name (``segment_order``):
    the bridge contract is one segment per delivery with a monotone
    sequence number in the name, and natural sort keeps ``seg9 < seg10``
    where plain lexicographic order would invert them — the same order
    the --follow stream sees for such names.  Within a file any rollback
    precedes its forwards (the shape a reconnecting chain-sync produces:
    the server answers an intersection with RollBackward first, then
    forwards).  A forward block at slot ``s`` is dead iff some rollback
    in a strictly LATER segment carries a point ``< s`` — an anti-join
    against the (tiny) rollback list, no row ordering needed.  The file
    list is pinned at call time (the frame reads exactly those files), so
    the ordinal map and the scan can never disagree about the directory's
    contents."""
    files = segment_order(seg_dir)
    # join key is the segment BASENAME (unique within the pinned listing),
    # not a reconstructed full URI: input_file_name() returns Spark's own
    # percent-encoded URI and does not resolve symlinks, so a rebuilt
    # ``file://{p.resolve()}`` diverges on symlinked or space-containing
    # seg_dirs (ADVICE r4).  The Hadoop Path encoding is PERCENT-encoding
    # (a literal '%' arrives as '%25') but url_decode implements FORM
    # decoding, which additionally maps '+' to ' ' — so '+' is pre-escaped
    # to '%2B', making the decode exactly urllib-unquote (the same decode
    # cli._check_segment_order applies).
    order = [(p.name, i) for i, p in enumerate(files)]
    raw = spark.read.text([str(p) for p in files]).withColumn(
        "_file",
        F.url_decode(
            F.regexp_replace(
                F.element_at(F.split(F.input_file_name(), "/"), -1), r"\+", "%2B"
            )
        ),
    )
    # ordinal via broadcast hash join (O(1) probe per row; a literal map
    # would be a linear scan per row at thousands of segments)
    ord_df = spark.createDataFrame(order, "_file string, _raw_ord long")
    # a file the scan sees but the pinned listing doesn't (or vice versa)
    # cannot happen by construction; a NULL ordinal would mean the URI
    # normalization broke — fail loudly rather than mis-order
    decoded = (
        decode_next_block(raw, keep=("_file",))
        .join(F.broadcast(ord_df), "_file", "left")
        .withColumn(
            "_ord",
            F.when(
                F.col("_raw_ord").isNull(),
                F.raise_error(
                    F.concat(
                        F.lit("unknown segment file in scan: "), F.col("_file")
                    )
                ).cast("long"),
            ).otherwise(F.col("_raw_ord")),
        )
        .drop("_raw_ord")
    )
    # a retraction whose point cannot be decoded would make the anti-join
    # condition NULL and silently resurrect the rolled-back blocks — fail
    # the read instead, exactly as the streaming body does
    rb_slot = _rollback_slot_col()
    rbs = decoded.where(F.col("direction") == "backward").select(
        F.col("_ord").alias("_rb_ord"),
        F.when(
            rb_slot.isNull(),
            F.raise_error(
                F.concat(
                    F.lit("malformed RollBackward point in segment "),
                    F.col("_file"),
                )
            ).cast("long"),
        )
        .otherwise(rb_slot)
        .alias("_rb_slot"),
    )
    fwd = decoded.where(F.col("direction") == "forward")
    # non-equi anti-join: pin BroadcastNestedLoopJoin — rollbacks are rare
    # (one per reconnect/fork), so the build side stays tiny at any scale
    # while the forward side streams through unshuffled
    alive = fwd.join(
        F.broadcast(rbs),
        (F.col("_rb_ord") > F.col("_ord"))
        & (F.col("_rb_slot") < F.col("block.slot")),
        "left_anti",
    )
    return partial_blocks(alive.drop("_file", "_ord"))


def stream_ogmios_jsonl(spark: SparkSession, path: str) -> DataFrame:
    """Stream the same NDJSON shape (file source; a websocket bridge lands
    files/offsets upstream, as with any Spark streaming ingest)."""
    return partial_blocks(decode_next_block(spark.readStream.text(path)))
