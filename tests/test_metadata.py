"""Recursive metadata model (C8) — golden vectors, JSON roundtrip, and
three-way codec agreement (Spark SQL == DuckDB SQL == Python decoder)."""

from __future__ import annotations

import json

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from kupo_spark import cbor, metadata


def _expected_cbor(e: int) -> bytes:
    """The synthetic metadata built with the canonical constructors —
    independent of the SQL expression."""
    import hashlib

    md5 = hashlib.md5(f"m{e}".encode()).hexdigest()
    item = cbor.mk_array(
        [
            cbor.mk_uint(e),
            cbor.mk_bytes(bytes.fromhex(md5[:4])),
            cbor.mk_map([(cbor.mk_text("k"), cbor.mk_uint(e % 7))]),
        ]
    )
    return cbor.encode(
        cbor.mk_map(
            [
                (cbor.mk_uint(e % 10), item),
                (cbor.mk_uint(674), cbor.mk_bytes(bytes.fromhex(md5[:8]))),
            ]
        )
    )


@pytest.mark.parametrize("e", [0, 8, 20, 500, 1024, 70000])
def test_sql_expression_matches_canonical_encoder(spark, duck, e):
    sql = metadata.metadata_cbor_sql(str(e))
    spark_hex = spark.sql(f"SELECT {sql} AS h").collect()[0][0]
    duck_hex = duck.execute(f"SELECT {sql} AS h").fetchone()[0]
    assert spark_hex == duck_hex == _expected_cbor(e).hex()


def test_golden_render_e500():
    raw = _expected_cbor(500)
    rendered = metadata.render_metadata(raw)
    # blake2b-256 of the raw bytes (hashTxAuxData), raw is base16
    assert rendered["raw"] == raw.hex()
    import hashlib

    assert rendered["hash"] == hashlib.blake2b(raw, digest_size=32).hexdigest()
    md5 = hashlib.md5(b"m500").hexdigest()
    assert rendered["schema"] == {
        "0": {
            "list": [
                {"int": 500},
                {"bytes": md5[:4]},
                {"map": [{"k": {"string": "k"}, "v": {"int": 500 % 7}}]},
            ]
        },
        "674": {"bytes": md5[:8]},
    }


def test_labels_match_chain_tags(spark, blocks):
    """Decoded CBOR labels must equal the ingest-side metadata_tags column
    for every metadata-bearing transaction."""
    rows = (
        blocks.where("metadata_cbor IS NOT NULL")
        .select("metadata_cbor", "metadata_tags")
        .limit(300)
        .collect()
    )
    assert rows
    for r in rows:
        assert metadata.labels(bytes.fromhex(r.metadata_cbor)) == sorted(
            r.metadata_tags
        )


def test_schema_json_roundtrip_on_chain(spark, blocks):
    """schema → JSON → schema is the identity on canonical bytes
    (metadataFromJson ∘ metadataToJson, Metadata.hs:102-152)."""
    hexes = [
        r[0]
        for r in blocks.where("metadata_cbor IS NOT NULL")
        .select("metadata_cbor")
        .distinct()
        .limit(100)
        .collect()
    ]
    assert hexes
    for h in hexes:
        raw = bytes.fromhex(h)
        assert metadata.schema_from_json(metadata.schema_to_json(raw)) == raw


metadatum_json = st.recursive(
    st.integers(min_value=-(2**63), max_value=2**63 - 1).map(lambda n: {"int": n})
    | st.text(max_size=12).map(lambda s: {"string": s})
    | st.binary(max_size=16).map(lambda b: {"bytes": b.hex()}),
    lambda kids: st.lists(kids, max_size=3).map(lambda xs: {"list": xs})
    | st.lists(st.tuples(kids, kids), max_size=3).map(
        lambda ps: {"map": [{"k": k, "v": v} for k, v in ps]}
    ),
    max_leaves=12,
)


@settings(max_examples=150, deadline=None)
@given(
    st.dictionaries(
        st.integers(min_value=0, max_value=2**32).map(str), metadatum_json, max_size=4
    )
)
def test_arbitrary_schema_roundtrip(schema):
    raw = metadata.schema_from_json(schema)
    assert metadata.schema_to_json(raw) == {
        str(k): v for k, v in sorted(((int(k), v) for k, v in schema.items()))
    }
    # canonical bytes survive decode→render→parse→encode
    assert metadata.schema_from_json(metadata.schema_to_json(raw)) == raw


def test_rendered_endpoint_builder(spark, blocks):
    from kupo_spark.operators.maintenance import metadata_by_slot_rendered

    slot = (
        blocks.where("metadata_cbor IS NOT NULL").select("slot_no").first().slot_no
    )
    out = metadata_by_slot_rendered(blocks, slot).collect()
    assert out
    for row in out:
        doc = json.loads(row.metadata_json)
        assert set(doc) == {"hash", "raw", "schema"}
        assert metadata.metadata_hash(bytes.fromhex(doc["raw"])) == doc["hash"]
        assert metadata.schema_to_json(bytes.fromhex(doc["raw"])) == doc["schema"]


def test_deep_wrap_renders_byte_exact_vs_sql_oracle():
    """C8 deep-recursion arm spec (round 11): the 5-level wrap built by
    `metadata_deep_cbor_sql` decodes + renders through the recursive
    Python renderer to EXACTLY the JSON text the independent SQL builder
    (`metadata_deep_schema_json_sql`) produces — across payload lengths
    that cross the CBOR bytes-head width boundary."""
    import json

    import duckdb

    from kupo_spark.metadata import (
        metadata_cbor_sql,
        metadata_deep_cbor_sql,
        metadata_deep_schema_json_sql,
        schema_to_json,
    )

    con = duckdb.connect()
    for e in (0, 4, 8, 100, 2048, 123456, 2**33):
        mc = metadata_cbor_sql(str(e))
        deep, expected = con.execute(
            f"SELECT {metadata_deep_cbor_sql(mc)}, "
            f"{metadata_deep_schema_json_sql(mc)}"
        ).fetchone()
        rendered = json.dumps(
            schema_to_json(bytes.fromhex(deep)), separators=(",", ":")
        )
        assert rendered == expected, e
