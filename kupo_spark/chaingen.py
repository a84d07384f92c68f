"""Block-stream source: derive the kupo-shaped chain from the ``events`` table.

This is the analog of kupo's chain-sync producers + era-normalizing decoders
(reference ``src/Kupo/App/ChainSync/*.hs`` and
``src/Kupo/Data/Cardano.hs:162-491`` → ``PartialBlock`` at
``src/Kupo/Data/PartialBlock.hs:35-50``): external data in, one uniform
nested block/transaction schema out.

Everything is a single narrow projection over the parquet scan — no shuffle,
no UDF; all expressions are JVM-side (whole-stage codegen) and the parquet
reader prunes to (event_id, user_id) only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# --- engine-portable SQL fragments (Spark SQL dialect) -------------------

_E = "event_id"
_U = "user_id"

_ADDRESS = """
CASE WHEN user_id % 4 = 1 THEN
  concat('01',
         md5(concat('del', cast(user_id % 53 as string))),
         substr(md5(concat('del2', cast(user_id % 53 as string))), 1, 24),
         '0', cast(user_id % 2 as string),
         md5(concat('pay', cast(user_id % 97 as string))),
         substr(md5(concat('pay2', cast(user_id % 97 as string))), 1, 24))
ELSE
  concat(lpad(cast(user_id % 4 as string), 2, '0'),
         '0', cast(user_id % 2 as string),
         md5(concat('pay', cast(user_id % 97 as string))),
         substr(md5(concat('pay2', cast(user_id % 97 as string))), 1, 24))
END
"""

_ASSETS = """
map_from_entries(
  transform(
    filter(array(0, 1), j -> j < cast(event_id % 3 as int)),
    j -> struct(
      md5(concat('pol', cast((event_id + j) % 7 as string))),
      map(md5(concat('ast', cast((event_id + 2 * j) % 5 as string))),
          cast(event_id % 100 + 1 + j as bigint)))))
"""

_DATUM_KIND = """
CASE WHEN event_id % 16 >= 11 THEN 'inline'
     WHEN event_id % 16 >= 6  THEN 'reference'
     ELSE 'none' END
"""

_DATUM_HASH = "CASE WHEN event_id % 16 >= 6 THEN md5(concat('dat', cast(event_id % 211 as string))) END"

# payload is known for inline datums and for 'reference with payload'
# (kupo's ref-data variant, Generators.hs:169-176 frequency mix)
# real canonical CBOR payloads (hex), from the SQL generators shared with
# the DuckDB oracle (kupo_spark.metadata.datum_cbor_sql / script_cbor_sql)
def _payload_exprs() -> tuple[str, str]:
    from kupo_spark.metadata import datum_cbor_sql, script_cbor_sql

    return (
        "CASE WHEN event_id % 16 >= 11 OR event_id % 16 = 6 "
        f"THEN {datum_cbor_sql('event_id')} END",
        f"CASE WHEN event_id % 6 = 0 THEN {script_cbor_sql('event_id')} END",
    )


_DATUM_CBOR, _SCRIPT_CBOR = _payload_exprs()
_SCRIPT_HASH = "CASE WHEN event_id % 6 = 0 THEN md5(concat('scr', cast(event_id % 13 as string))) END"

# Primary output (index 0) carries the value/datum/script payload; every
# 5th transaction also produces a plain change output at index 1 — so
# multi-output explode paths and output_index > 0 references are exercised
# everywhere (reference txs have arbitrary output counts, Generators.hs).
_OUT0 = f"""
named_struct(
  'output_index', cast(0 as int),
  'address', {_ADDRESS},
  'coins', cast((event_id % 1000) * 1000 + user_id as bigint),
  'assets', {_ASSETS},
  'datum_kind', {_DATUM_KIND},
  'datum_hash', {_DATUM_HASH},
  'datum_cbor', {_DATUM_CBOR},
  'script_hash', {_SCRIPT_HASH},
  'script_cbor', {_SCRIPT_CBOR}
)
"""

_OUT1 = f"""
named_struct(
  'output_index', cast(1 as int),
  'address', {_ADDRESS},
  'coins', cast((event_id % 777) * 100 + 3 as bigint),
  'assets', cast(map() as map<string,map<string,bigint>>),
  'datum_kind', 'none',
  'datum_hash', cast(null as string),
  'datum_cbor', cast(null as string),
  'script_hash', cast(null as string),
  'script_cbor', cast(null as string)
)
"""

_OUTPUTS = f"""
CASE WHEN event_id % 5 = 0 THEN array({_OUT0}, {_OUT1}) ELSE array({_OUT0}) END
"""

# tx e spends (e-17)#1 when that change output exists and e ≡ 3 (mod 6),
# else (e-17)#0 — so index-1 outputs participate in the spend graph; txs
# with e % 21 == 0 additionally spend (e-19)#0 as a SECOND input (covers
# spent_input_index > 0 and non-zero redeemer keys; targets are disjoint:
# t+17 spenders need t ≡ 1 (mod 3), t+19 spenders need t ≡ 2 (mod 3)).
_SPENT_INPUTS = """
CASE WHEN event_id % 21 = 0 AND event_id >= 19 THEN
  array(concat(md5(concat('tx', cast(event_id - 17 as string))), '#',
               IF((event_id - 17) % 5 = 0 AND event_id % 6 = 3, '1', '0')),
        concat(md5(concat('tx', cast(event_id - 19 as string))), '#0'))
WHEN event_id % 3 = 0 AND event_id >= 17 THEN
  array(concat(md5(concat('tx', cast(event_id - 17 as string))), '#',
               IF((event_id - 17) % 5 = 0 AND event_id % 6 = 3, '1', '0')))
ELSE cast(array() as array<string>) END
"""

_REDEEMERS = """
map_filter(map(
  cast(0 as int),
  IF(event_id % 6 = 0 AND event_id >= 17,
     concat('rdmr:', md5(concat('r', cast(event_id as string)))), NULL),
  cast(1 as int),
  IF(event_id % 21 = 0 AND event_id % 2 = 1 AND event_id >= 19,
     concat('rdmr2:', md5(concat('r2', cast(event_id as string)))), NULL)
), (k, v) -> v IS NOT NULL)
"""

_META_TAGS = """
IF(event_id % 4 = 0,
   array(cast(event_id % 10 as bigint), cast(674 as bigint)),
   array(cast(event_id % 10 as bigint)))
"""

# real canonical CBOR (hex), generated by the SQL expression shared with the
# DuckDB oracle — kupo_spark.metadata.metadata_cbor_sql documents the layout
def _meta_cbor_expr() -> str:
    from kupo_spark.metadata import metadata_cbor_sql

    return f"CASE WHEN event_id % 4 = 0 THEN {metadata_cbor_sql('event_id')} END"


_META_CBOR = _meta_cbor_expr()


def blocks_from_events(events: DataFrame) -> DataFrame:
    """events → PartialBlock-shaped stream: one row per transaction with the
    block point repeated (FIXTURES.md §1 schema)."""
    return events.select(
        F.expr("event_id DIV 10").alias("slot_no"),
        F.expr("md5(concat('blk', cast(event_id DIV 10 as string)))").alias("header_hash"),
        F.expr("cast(event_id % 10 as int)").alias("transaction_index"),
        F.expr("md5(concat('tx', cast(event_id as string)))").alias("transaction_id"),
        F.expr(_SPENT_INPUTS).alias("inputs"),
        F.expr(_OUTPUTS).alias("outputs"),
        F.expr(_REDEEMERS).alias("spend_redeemers"),
        F.expr(_META_TAGS).alias("metadata_tags"),
        F.expr(_META_CBOR).alias("metadata_cbor"),
    )


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Read events with an explicit pruned schema — the chain derivation only
    needs (event_id, user_id), and the driver parquet's TIMESTAMP(NANOS) `ts`
    column is unreadable by stock Spark schema inference."""
    return spark.read.schema("event_id BIGINT, user_id BIGINT").parquet(
        f"{sf_dir}/events.parquet"
    )


def load_blocks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Block stream for an sf_dir.

    The heavy era-normalizing derivation (md5/CBOR expression trees) runs
    where the events scan runs.  A small single-file source yields ONE
    scan split (the 4 MB ``openCostInBytes`` floor stops Spark splitting
    it), so the whole decode would run on one core while the rest idle —
    measured 17.5 s → 12.7 s cold build+count at the current sf0.1 by
    fanning the narrow (event_id, user_id) rows out to the cores first
    (r11; an earlier measurement at 100× larger inputs found the fan-out
    ~20% slower, but there the scan already split).  The gate is
    scale-adaptive (guide §2): estimated scan splits are derived from the
    source file size, so a production-size events table (≥ cores × 128 MB
    splits) never pays the extra narrow-row exchange."""
    ev = load_events(spark, sf_dir)
    target = spark.sparkContext.defaultParallelism
    try:
        import os as _os
        from pathlib import Path as _Path

        p = _Path(f"{sf_dir}/events.parquet")
        nbytes = (
            sum(f.stat().st_size for f in p.glob("**/*") if f.is_file())
            if p.is_dir()
            else _os.path.getsize(p)
        )
        raw = spark.conf.get(
            "spark.sql.files.maxPartitionBytes", "134217728"
        ).strip().lower()
        units = {"k": 1 << 10, "m": 1 << 20, "g": 1 << 30}
        raw = raw.removesuffix("b")
        mult = units.get(raw[-1:], 1)
        max_split = int(raw.rstrip("kmg") or "0") * mult or 128 * (1 << 20)
        est_splits = max(1, -(-nbytes // max_split))
    except (OSError, ValueError):
        est_splits = target  # unknown source shape: leave the scan alone
    if est_splits < target:
        ev = ev.repartition(target)
    return blocks_from_events(ev)
