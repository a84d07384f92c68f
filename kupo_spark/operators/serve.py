"""Serving-layer result rendering + health — the HTTP surface's data plane.

C7: JSON rendering byte-exact to ``resultToJson``
(``src/Kupo/Data/Pattern.hs:447-521``), including the conditional key
rules the reference's aeson encoder has:

* default mode (``?resolve_hashes`` absent, ``AsReference``): no ``datum``
  / ``script`` keys ever; ``datum_type`` present only when the output has a
  datum (``"inline"`` | ``"hash"``);
* ``resolve_hashes=True`` (``InlineAll``): ``datum`` and ``script`` keys
  always present (``null`` when absent or unresolved), ``datum_type`` still
  conditional on a datum existing;
* ``value.assets`` keys are ``policyHex.assetHex``, or bare ``policyHex``
  when the asset name is empty (``Value.hs:60-99``); policies render in
  DESCENDING key order, asset names within a policy ASCENDING — the exact
  emission order of the reference's nested ``Map.foldrWithKey``;
* quantities (coins + asset values) encode as integers, or as strings when
  the client negotiated ``asset-quantity=string``
  (``QuantityEncoding.hs:32-52``);
* ``script`` objects are ``{"script": hex, "language": "native" |
  "plutus:v1|v2|v3"}`` derived from the stored language-tagged bytes
  (``Script.hs:109-123``).

The payload is assembled as a string column from conditional fragments
(``concat_ws`` drops NULL fragments → per-row key omission) — pure
whole-stage-codegen; every value is hex/bech32/integer so no JSON escaping
is needed.  kupo streams rows one-at-a-time through a single Warp worker;
here the same payloads are a distributed column the HTTP tier can iterate
via ``toLocalIterator``.
"""

from __future__ import annotations

import pandas
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType

from kupo_spark.codecs import address_to_text
from kupo_spark.operators.fold_inputs import fold_inputs
from kupo_spark.operators.indexer import Index


def _render_address_batch(addr: pandas.Series) -> pandas.Series:
    return pandas.Series(
        [None if a is None else address_to_text(a) for a in addr]
    )


render_address = pandas_udf(_render_address_batch, returnType=StringType())


def _qty(col: Column, as_string: bool) -> Column:
    # QuantityEncoding.hs:32-52 — Json.integer vs Json.text . show
    s = col.cast("string")
    return F.concat(F.lit('"'), s, F.lit('"')) if as_string else s


def _assets_body(as_string: bool) -> Column:
    """``"policy[.asset]":qty`` fragments joined with commas — policies in
    descending key order, asset names ascending (the reference's
    ``assetsToJson`` foldr emission order, Value.hs:73-99)."""
    qty = (
        "concat('\"', cast(a.value as string), '\"')"
        if as_string
        else "cast(a.value as string)"
    )
    return F.expr(
        f"""
        array_join(flatten(transform(
          sort_array(map_keys(coalesce(assets,
            cast(map() as map<string,map<string,bigint>>))), false),
          pk -> transform(sort_array(map_entries(element_at(assets, pk)), true),
            a -> concat('"', pk,
                        if(a.key = '', '', concat('.', a.key)),
                        '":', {qty})))), ',')
        """
    )


def _opt_str(col: Column) -> Column:
    """``null`` or ``"value"`` — maybe-encoded hex/text fields."""
    return F.when(col.isNull(), F.lit("null")).otherwise(
        F.concat(F.lit('"'), col, F.lit('"'))
    )


def _script_object(col: Column) -> Column:
    """Stored language-tagged script bytes → ``{"script":…,"language":…}``
    (scriptToJson, Script.hs:109-123; tag byte per scriptToBytes:125-137)."""
    tag = F.substring(col, 1, 2)
    lang = (
        F.when(tag == "00", F.lit("native"))
        .when(tag == "01", F.lit("plutus:v1"))
        .when(tag == "02", F.lit("plutus:v2"))
        .when(tag == "03", F.lit("plutus:v3"))
        # an unmapped tag (corruption, or a future language written by a
        # newer indexer) must not NULL-propagate through the concat and
        # silently DROP the script key the InlineAll contract guarantees —
        # render it, visibly unknown, instead of masking the data
        .otherwise(F.concat(F.lit("unknown:"), tag))
    )
    return F.concat(
        F.lit('{"script":"'),
        F.substring(col, 3, 2_000_000_000),
        F.lit('","language":"'),
        lang,
        F.lit('"}'),
    )


def result_json(
    index: Index,
    pattern="*",
    *,
    resolve_hashes: bool = False,
    quantity_as_string: bool = False,
    rendered_addresses: bool = False,
    keep_keys: bool = False,
    **fold_kwargs,
) -> DataFrame:
    """(output_reference, result) where result is the resultToJson-shaped
    JSON payload for GET /matches — byte-exact to the reference encoder.

    ``rendered_addresses=True`` converts reshuffled-hex index rows back to
    bech32/base58 wire text (``addressToJson``) — the reference-faithful
    mode for chain-shaped indexes, whose sources (Ogmios/Hydra/node)
    normalize wire addresses into row form at decode.  The default keeps
    the stored row form, which is what the driver's synthetic-corpus
    oracle arms compare on (their addresses are opaque hex, not
    re-renderable Cardano addresses).
    """
    # the chain-order sort (O1) must ride OVER the assets join below, or
    # the join would destroy it — so fold unsorted and sort the rendered
    # frame at the end
    sorted_result = fold_kwargs.pop("sorted_result", False)
    order = fold_kwargs.pop("order", "most_recent_first")
    rows = fold_inputs(index, pattern, resolve_hashes=resolve_hashes, **fold_kwargs)
    # re-attach assets + datum_kind for rendering (fold's result projection
    # mirrors kupo's row; the JSON adds the value map and datum_type)
    extra = index.inputs.select("output_reference", "assets", "datum_kind")
    df = rows.join(extra, "output_reference", "inner")
    if sorted_result:
        from kupo_spark.operators.fold_inputs import chain_order_sort, plan_is_small

        keys = ["created_at", "transaction_index", "output_index"]
        # gate on the PRE-join fold rows (the assets re-attach is
        # row-preserving but inflates the join's product estimate);
        # width factor 4 covers the attached assets map column
        df = chain_order_sort(
            df, keys, order == "most_recent_first",
            small=plan_is_small(rows, width_factor=4),
        )

    addr = render_address(F.col("address")) if rendered_addresses else F.col("address")
    has_datum = F.col("datum_kind").isin("inline", "reference")
    datum_type = F.when(F.col("datum_kind") == "inline", F.lit("inline")).otherwise(
        F.lit("hash")
    )

    frags = [
        F.concat(F.lit('"transaction_index":'), F.col("transaction_index").cast("string")),
        F.concat(F.lit('"transaction_id":"'), F.col("transaction_id"), F.lit('"')),
        F.concat(F.lit('"output_index":'), F.col("output_index").cast("string")),
        F.concat(F.lit('"address":"'), addr, F.lit('"')),
        F.concat(
            F.lit('"value":{"coins":'),
            _qty(F.col("coins"), quantity_as_string),
            F.lit(',"assets":{'),
            _assets_body(quantity_as_string),
            F.lit("}}"),
        ),
        F.concat(F.lit('"datum_hash":'), _opt_str(F.col("datum_hash"))),
    ]
    if resolve_hashes:
        # InlineAll: a `datum` key always (null when no/unresolved datum)
        frags.append(F.concat(F.lit('"datum":'), _opt_str(F.col("datum"))))
    # datum_type only when the output has a datum (both modes)
    frags.append(
        F.when(has_datum, F.concat(F.lit('"datum_type":"'), datum_type, F.lit('"')))
    )
    frags.append(F.concat(F.lit('"script_hash":'), _opt_str(F.col("script_hash"))))
    if resolve_hashes:
        script_obj = F.when(
            F.col("script").isNotNull(), _script_object(F.col("script"))
        ).otherwise(F.lit("null"))
        frags.append(F.concat(F.lit('"script":'), script_obj))
    frags.append(
        F.concat(
            F.lit('"created_at":{"slot_no":'),
            F.col("created_at").cast("string"),
            F.lit(',"header_hash":"'),
            F.col("created_header_hash"),
            F.lit('"}'),
        )
    )
    frags.append(
        F.concat(
            F.lit('"spent_at":'),
            F.when(F.col("spent_at").isNull(), F.lit("null")).otherwise(
                F.concat(
                    F.lit('{"slot_no":'),
                    F.col("spent_at").cast("string"),
                    F.lit(',"header_hash":"'),
                    F.col("spent_header_hash"),
                    F.lit('","transaction_id":'),
                    _opt_str(F.col("spent_by")),
                    F.lit(',"input_index":'),
                    F.when(F.col("spent_input_index").isNull(), F.lit("null")).otherwise(
                        F.col("spent_input_index").cast("string")
                    ),
                    F.lit(',"redeemer":'),
                    _opt_str(F.col("spent_with")),
                    F.lit("}"),
                )
            ),
        )
    )
    payload = F.concat(F.lit("{"), F.concat_ws(",", *frags), F.lit("}"))
    if keep_keys:
        # keyset pagination needs the chain-order keys NEXT TO the rendered
        # payload (Serving.serve_json_page filters/sorts/limits on them and
        # builds the next cursor from the last delivered row)
        return df.select(
            "output_reference",
            "created_at",
            "transaction_index",
            "output_index",
            payload.alias("result"),
        )
    return df.select("output_reference", payload.alias("result"))


def metrics_text(index: Index) -> str:
    """GET /metrics — Prometheus exposition rendering of the health gauges
    (reference ``src/Kupo/Data/Health.hs:251+``).  Driver-side formatting of
    a 1-row aggregate."""
    row = health(index).collect()[0]
    lines = []
    for name, value in [
        ("kupo_most_recent_checkpoint", row["most_recent_checkpoint"]),
        ("kupo_checkpoints", row["n_checkpoints"]),
        ("kupo_inputs", row["n_inputs"]),
        ("kupo_unspent_inputs", row["n_unspent"]),
    ]:
        lines.append(f"# TYPE {name} gauge")
        # max/sum over an EMPTY index are SQL NULL — 'name None' is invalid
        # exposition text and a scraper rejects the whole scrape, exactly
        # during bootstrap when operators are watching
        lines.append(f"{name} {0 if value is None else value}")
    return "\n".join(lines) + "\n"


def health(index: Index) -> DataFrame:
    """GET /health (Http.hs:488-540): most recent checkpoint + counts —
    the sync-progress signal."""
    cp = index.checkpoints.agg(
        F.max("slot_no").alias("most_recent_checkpoint"),
        F.count("*").alias("n_checkpoints"),
    )
    counts = index.inputs.agg(
        F.count("*").alias("n_inputs"),
        F.sum(F.when(F.col("spent_at").isNull(), 1).otherwise(0)).alias("n_unspent"),
    )
    return cp.crossJoin(counts)
