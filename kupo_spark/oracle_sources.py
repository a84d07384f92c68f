"""DuckDB oracles for the protocol-source fixtures (S2/S3 hard signal).

``ogmios_fold_sql`` restates the Ogmios ``nextBlock`` decode semantics
(``Kupo/Data/Ogmios.hs:176-560``) **independently in SQL** over the very
NDJSON log the Spark source reads: effective inputs by ``spends`` mode,
collateral-mode output dropping with the ``len(outputs)`` return offset,
datum classification (hash ⇒ reference, bare ⇒ inline), witness-datum
folding, spend-purpose redeemers keyed by effective input position, and the
value map split into lovelace + multiasset quantities.

``hydra_fold_sql`` reads the expected-rows sidecar instead: Hydra blocks
arrive as Conway transaction CBOR, which SQL cannot decode, so the golden
rows are authored by ``tools/gen_source_fixtures.py`` from the abstract
transaction spec (the same generation-time-knowledge discipline as the
reference's ``test/vectors`` files) — never by running the decoder.
"""

from __future__ import annotations

from pathlib import Path

FIXTURES = Path(__file__).resolve().parent.parent / "fixtures"
OGMIOS_LOG = str(FIXTURES / "ogmios_nextblock.ndjson")
OGMIOS_SEGMENTS = str(FIXTURES / "ogmios_segments")
HYDRA_LOG = str(FIXTURES / "hydra_serveroutput.ndjson")
HYDRA_EXPECTED = str(FIXTURES / "hydra_expected.ndjson")

#: generous per-array unnest bounds (fixture maxima are below these)
_MAX_TX, _MAX_OUT, _MAX_IN, _MAX_RDM = 4, 6, 4, 4

SOURCE_FOLD_COLUMNS = [
    "output_reference", "transaction_id", "transaction_index", "output_index",
    "address", "coins", "created_at", "datum_kind", "ref_datum_hash",
    "datum_cbor", "spent_at", "spent_by", "spent_input_index", "spent_with",
    "n_assets", "asset_qty",
]


def ogmios_fold_sql(path: str = OGMIOS_LOG) -> str:
    fwd = f"""raw AS (
  SELECT json AS j FROM read_json_objects('{path}', format='newline_delimited')
),
fwd AS (
  SELECT json_extract(j, '$.result.block') AS blk FROM raw
  WHERE json_extract_string(j, '$.result.direction') = 'forward'
)"""
    return _fold_from_fwd(fwd)


def ogmios_canonical_fold_sql(seg_dir: str = OGMIOS_SEGMENTS) -> str:
    """Independent SQL restatement of ``sources.ogmios.canonical_blocks``:
    a forward block is dead iff a RollBackward in a strictly LATER segment
    carries a point below its slot ('origin' ⇒ 0); the fold body over the
    surviving blocks is shared with ``ogmios_fold_sql``.

    Delivery order is the natural-sorted file name — the same
    ``segment_order`` listing the Spark side pins (SQL cannot natural-sort
    digit runs, so the ordinal list is injected as VALUES from the shared
    helper; the NETTING logic itself is restated independently in SQL)."""
    from kupo_spark.sources.ogmios import segment_order

    seg_dir = str(Path(seg_dir))  # normalize (a trailing slash would make
    # the glob's reported filenames miss every CASE arm)
    files = segment_order(seg_dir)
    # ordinal via CASE, not a join: this DuckDB build miscompiles a join
    # between a read_json_objects(filename=true) scan and another relation
    # (reproducible segfault); a projection-level CASE is equivalent here
    whens = " ".join(f"WHEN '{p}' THEN {i}" for i, p in enumerate(files))
    # ELSE error(): a filename the listing didn't pin (path-normalization
    # drift, a file landing between listing and scan) must fail the oracle
    # loudly — a NULL ordinal would nullify the netting predicate and
    # silently return the un-netted chain (the Spark side raises on the
    # analogous mismatch)
    fwd = f"""raw AS (
  SELECT json AS j,
         CASE filename {whens}
              ELSE CAST(error('unknown segment file in oracle scan: '
                              || filename) AS BIGINT)
         END AS ord
  FROM read_json_objects('{seg_dir}/*.jsonl',
                         format='newline_delimited', filename=true)
),
rbs AS (
  SELECT ord,
         CASE WHEN json_extract_string(j, '$.result.point') = 'origin' THEN 0
              ELSE CAST(json_extract(j, '$.result.point.slot') AS BIGINT)
         END AS rb_slot
  FROM raw
  WHERE json_extract_string(j, '$.result.direction') = 'backward'
),
fwd AS (
  SELECT json_extract(j, '$.result.block') AS blk
  FROM raw a
  WHERE json_extract_string(j, '$.result.direction') = 'forward'
    AND NOT EXISTS (
      SELECT 1 FROM rbs r
      WHERE r.ord > a.ord
        AND r.rb_slot < CAST(json_extract(a.j, '$.result.block.slot') AS BIGINT)
    )
)"""
    return _fold_from_fwd(fwd)


def _fold_from_fwd(fwd_cte: str) -> str:
    return f"""
WITH {fwd_cte},
tx0 AS (
  SELECT CAST(json_extract(blk, '$.slot') AS BIGINT) AS slot_no,
         CAST(t.i AS INTEGER) AS transaction_index,
         json_extract(blk, '$.transactions[' || t.i || ']') AS tx
  FROM fwd, (SELECT UNNEST(range(0, {_MAX_TX})) AS i) t
  WHERE t.i < json_array_length(blk, '$.transactions')
),
txx AS (
  SELECT slot_no, transaction_index,
         json_extract_string(tx, '$.id') AS transaction_id,
         coalesce(json_extract_string(tx, '$.spends'), 'inputs') AS spends,
         tx
  FROM tx0
),
-- produced outputs: normal mode keeps outputs[j] at index j; collateral
-- mode drops them and keeps only collateralReturn at index len(outputs)
outs AS (
  SELECT slot_no, transaction_index, transaction_id,
         CAST(o.j AS INTEGER) AS output_index,
         json_extract(tx, '$.outputs[' || o.j || ']') AS o, tx
  FROM txx, (SELECT UNNEST(range(0, {_MAX_OUT})) AS j) o
  WHERE spends = 'inputs' AND o.j < json_array_length(tx, '$.outputs')
  UNION ALL
  SELECT slot_no, transaction_index, transaction_id,
         CAST(json_array_length(tx, '$.outputs') AS INTEGER),
         json_extract(tx, '$.collateralReturn'), tx
  FROM txx
  WHERE spends = 'collaterals'
    AND json_extract(tx, '$.collateralReturn') IS NOT NULL
),
out_rows AS (
  SELECT transaction_id || '#' || CAST(output_index AS VARCHAR) AS output_reference,
         transaction_id, transaction_index, output_index,
         json_extract_string(o, '$.address') AS address,
         CAST(json_extract(o, '$.value.ada.lovelace') AS BIGINT) AS coins,
         slot_no AS created_at,
         CASE WHEN json_extract(o, '$.datumHash') IS NOT NULL THEN 'reference'
              WHEN json_extract(o, '$.datum') IS NOT NULL THEN 'inline'
              ELSE 'none' END AS datum_kind,
         json_extract_string(o, '$.datumHash') AS ref_datum_hash,
         coalesce(
           json_extract_string(o, '$.datum'),
           json_extract_string(
             tx, '$.datums."' || json_extract_string(o, '$.datumHash') || '"')
         ) AS datum_cbor,
         o
  FROM outs
),
-- effective consumed references with their array position
spent AS (
  SELECT json_extract_string(tx, src || '[' || s.k || '].transaction.id')
           || '#'
           || CAST(json_extract(tx, src || '[' || s.k || '].index') AS VARCHAR)
           AS ref,
         slot_no AS spent_at, transaction_id AS spent_by,
         CAST(s.k AS INTEGER) AS spent_input_index
  FROM (SELECT *, CASE WHEN spends = 'collaterals'
                       THEN '$.collaterals' ELSE '$.inputs' END AS src
        FROM txx) txp,
       (SELECT UNNEST(range(0, {_MAX_IN})) AS k) s
  WHERE s.k < json_array_length(tx, src)
),
-- spend-purpose redeemers keyed by (tx, effective input position)
rdm AS (
  SELECT transaction_id AS spent_by,
         CAST(json_extract(tx, '$.redeemers[' || r.m || '].validator.index')
              AS INTEGER) AS rix,
         json_extract_string(tx, '$.redeemers[' || r.m || '].redeemer') AS redeemer
  FROM txx, (SELECT UNNEST(range(0, {_MAX_RDM})) AS m) r
  WHERE r.m < json_array_length(tx, '$.redeemers')
    AND json_extract_string(
          tx, '$.redeemers[' || r.m || '].validator.purpose') = 'spend'
),
ass AS (
  SELECT output_reference, COUNT(*) AS n_assets, SUM(qty) AS asset_qty
  FROM (
    SELECT p.output_reference,
           CAST(json_extract(json_extract(p.o, '$.value."' || p.pk || '"'),
                             '$."' || t.ak || '"') AS BIGINT) AS qty
    FROM (SELECT output_reference, o,
                 UNNEST(json_keys(o, '$.value')) AS pk
          FROM out_rows) p,
         UNNEST(json_keys(json_extract(p.o, '$.value."' || p.pk || '"'))) AS t(ak)
    WHERE p.pk <> 'ada'
  )
  GROUP BY output_reference
)
SELECT r.output_reference, r.transaction_id, r.transaction_index,
       r.output_index, r.address, r.coins, r.created_at, r.datum_kind,
       r.ref_datum_hash, r.datum_cbor,
       s.spent_at, s.spent_by, s.spent_input_index,
       rd.redeemer AS spent_with,
       CAST(coalesce(a.n_assets, 0) AS BIGINT) AS n_assets,
       -- SUM(BIGINT) is HUGEINT in DuckDB; a pandas/arrow fetch degrades
       -- HUGEINT to float64 ("286.0" vs Spark's "286"), which is exactly the
       -- r3 driver hash divergence on this row — keep every numeric output
       -- column in the BIGINT/INTEGER lane.
       CAST(coalesce(a.asset_qty, 0) AS BIGINT) AS asset_qty
FROM out_rows r
LEFT JOIN spent s ON s.ref = r.output_reference
LEFT JOIN rdm rd ON rd.spent_by = s.spent_by AND rd.rix = s.spent_input_index
LEFT JOIN ass a ON a.output_reference = r.output_reference
"""


def hydra_fold_sql(path: str = HYDRA_EXPECTED) -> str:
    return f"""
SELECT output_reference, transaction_id, transaction_index, output_index,
       address, coins, created_at, datum_kind, datum_hash, datum_cbor,
       spent_at, spent_by, spent_input_index, spent_with, n_assets, asset_qty
FROM read_json('{path}', format='newline_delimited', columns={{
  'output_reference': 'VARCHAR', 'transaction_id': 'VARCHAR',
  'transaction_index': 'INTEGER', 'output_index': 'INTEGER',
  'address': 'VARCHAR', 'coins': 'BIGINT', 'created_at': 'BIGINT',
  'datum_kind': 'VARCHAR', 'datum_hash': 'VARCHAR', 'datum_cbor': 'VARCHAR',
  'spent_at': 'BIGINT', 'spent_by': 'VARCHAR',
  'spent_input_index': 'INTEGER', 'spent_with': 'VARCHAR',
  'n_assets': 'BIGINT', 'asset_qty': 'BIGINT'}})
"""
