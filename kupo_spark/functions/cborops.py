"""CBOR columns for Spark — Arrow-batched pandas UDFs over kupo_spark.cbor.

Kupo serializes each matched output's value as Mary-era CBOR into the
``value`` BLOB column (``Kupo/Data/Database.hs:196``) and stores datums and
scripts as their original CBOR bytes.  The Spark-side analog: the index
keeps the *struct* representation (coins / assets map — queryable, pushes
down) and these kernels pack/unpack the *raw* representation at the edge
(ingest or serve), per SURVEY §1.3's struct+raw dual storage.

Codec work is Python, so it runs as **pandas UDFs** (Arrow batch transfer,
one Python roundtrip per ~10k-row batch, never per row) and only where a
binary payload is genuinely needed — the data plane itself stays JVM-side.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import (
    BinaryType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
)

from kupo_spark import cbor

# built as type objects, not a DDL string: pandas_udf parses DDL lazily on
# the executor, where no SparkSession exists
_VALUE_STRUCT = StructType(
    [
        StructField("coins", LongType()),
        StructField(
            "assets", MapType(StringType(), MapType(StringType(), LongType()))
        ),
    ]
)


def _assets_to_bytes(assets: dict | None) -> dict[bytes, dict[bytes, int]]:
    if not assets:
        return {}
    return {
        bytes.fromhex(policy): {
            bytes.fromhex(name): int(qty) for name, qty in inner.items()
        }
        for policy, inner in assets.items()
    }


@pandas_udf(BinaryType())
def mary_value_cbor(coins: pd.Series, assets: pd.Series) -> pd.Series:
    """(coins, assets map with hex keys) → Mary-era Value CBOR bytes."""
    return pd.Series(
        [
            cbor.encode_mary_value(int(c), _assets_to_bytes(a))
            for c, a in zip(coins, assets)
        ]
    )


@pandas_udf(_VALUE_STRUCT)
def mary_value_decoded(value_cbor: pd.Series) -> pd.DataFrame:
    """Inverse of :func:`mary_value_cbor`: CBOR bytes → (coins, assets)."""
    coins_out, assets_out = [], []
    for raw in value_cbor:
        coins, assets = cbor.decode_mary_value(bytes(raw))
        coins_out.append(coins)
        assets_out.append(
            {
                p.hex(): {n.hex(): q for n, q in inner.items()}
                for p, inner in assets.items()
            }
        )
    return pd.DataFrame({"coins": coins_out, "assets": assets_out})


@pandas_udf(StringType())
def cbor_diagnostic(payload: pd.Series) -> pd.Series:
    """CBOR bytes → RFC 8949 §8 diagnostic notation (display/debug)."""

    def render(raw):
        if raw is None:
            return None
        try:
            return cbor.to_diagnostic(cbor.decode(bytes(raw)))
        except cbor.CborError as e:
            return f"<invalid cbor: {e}>"

    return pd.Series([render(r) for r in payload])


def with_value_cbor(inputs: DataFrame, col: str = "value_cbor") -> DataFrame:
    """Attach the packed Mary-era value column to an inputs DataFrame —
    the write-side edge of the dual storage (Database.hs:196)."""
    return inputs.withColumn(col, mary_value_cbor(F.col("coins"), F.col("assets")))
