"""DuckDB oracle — ANSI-SQL statements of the *expected* engine results.

The driver registers the raw parquet tables (``events`` etc.) as views and
runs each query here side-by-side with the matching Spark query.  The
PRELUDE CTE block restates the chain derivation of ``chaingen.py`` /
``chainspec.py`` relationally, then each oracle query states the reference
semantics (foldInputsQry and friends, ``src/Kupo/App/Database/SQLite.hs``)
directly over those CTEs.

Engine-portability rules: integer-only arithmetic, md5/concat/substr only,
no timestamps, no floats, no engine-specific functions.
"""

from __future__ import annotations

from kupo_spark.patterns import Pattern, pattern_from_text, to_sql

PRELUDE = """
WITH ev AS (
  SELECT event_id AS e, user_id AS u FROM events
),
outs AS (
  -- output j=0 carries value/datum/script; every 5th tx adds a plain
  -- change output at index 1 (mirrors chaingen._OUTPUTS)
  SELECT
    e, u,
    e // 10 AS created_at,
    CAST(e % 10 AS INTEGER) AS transaction_index,
    md5('tx' || CAST(e AS VARCHAR)) AS transaction_id,
    CAST(t.j AS INTEGER) AS output_index,
    CASE WHEN u % 4 = 1 THEN
      '01'
      || md5('del' || CAST(u % 53 AS VARCHAR))
      || substr(md5('del2' || CAST(u % 53 AS VARCHAR)), 1, 24)
      || '0' || CAST(u % 2 AS VARCHAR)
      || md5('pay' || CAST(u % 97 AS VARCHAR))
      || substr(md5('pay2' || CAST(u % 97 AS VARCHAR)), 1, 24)
    ELSE
      lpad(CAST(u % 4 AS VARCHAR), 2, '0')
      || '0' || CAST(u % 2 AS VARCHAR)
      || md5('pay' || CAST(u % 97 AS VARCHAR))
      || substr(md5('pay2' || CAST(u % 97 AS VARCHAR)), 1, 24)
    END AS address,
    CASE WHEN t.j = 0 THEN (e % 1000) * 1000 + u
         ELSE (e % 777) * 100 + 3 END AS coins,
    CASE WHEN t.j <> 0 THEN 'none'
         WHEN e % 16 >= 11 THEN 'inline'
         WHEN e % 16 >= 6  THEN 'reference'
         ELSE 'none' END AS datum_kind,
    CASE WHEN t.j = 0 AND e % 16 >= 6
         THEN md5('dat' || CAST(e % 211 AS VARCHAR)) END AS datum_hash,
    CASE WHEN t.j = 0 AND (e % 16 >= 11 OR e % 16 = 6)
         THEN {datum_cbor} END AS datum_cbor,
    CASE WHEN t.j = 0 AND e % 6 = 0
         THEN md5('scr' || CAST(e % 13 AS VARCHAR)) END AS script_hash,
    CASE WHEN t.j = 0 AND e % 6 = 0
         THEN {script_cbor} END AS script_cbor
  FROM ev, (SELECT UNNEST([0, 1]) AS j) t
  WHERE t.j < CASE WHEN e % 5 = 0 THEN 2 ELSE 1 END
),
spend_src AS (
  -- input 0: (e-17)#{0|1} for every e ≡ 0 (mod 3)
  SELECT
    e - 17 AS spent_target,
    CASE WHEN (e - 17) % 5 = 0 AND e % 6 = 3
         THEN 1 ELSE 0 END AS spent_target_index,
    e // 10 AS spent_at,
    md5('tx' || CAST(e AS VARCHAR)) AS spent_by,
    CAST(0 AS INTEGER) AS spent_input_index,
    CASE WHEN e % 2 = 0 THEN 'rdmr:' || md5('r' || CAST(e AS VARCHAR)) END AS spent_with
  FROM ev WHERE e % 3 = 0 AND e >= 17
  UNION ALL
  -- input 1: (e-19)#0 for every e ≡ 0 (mod 21)
  SELECT
    e - 19,
    0,
    e // 10,
    md5('tx' || CAST(e AS VARCHAR)),
    CAST(1 AS INTEGER),
    CASE WHEN e % 2 = 1 THEN 'rdmr2:' || md5('r2' || CAST(e AS VARCHAR)) END
  FROM ev WHERE e % 21 = 0 AND e >= 19
),
inputs AS (
  SELECT
    o.transaction_id || '#' || CAST(o.output_index AS VARCHAR) AS output_reference,
    o.transaction_id || '#' || CAST(o.output_index AS VARCHAR)
      || '@' || CAST(o.transaction_index AS VARCHAR) AS ext_output_reference,
    o.transaction_id,
    o.transaction_index,
    o.output_index,
    o.address,
    right(o.address, 56) AS payment_credential,
    o.coins,
    o.datum_kind,
    o.datum_hash,
    o.script_hash,
    o.created_at,
    s.spent_at,
    s.spent_by,
    s.spent_input_index,
    s.spent_with
  FROM outs o LEFT JOIN spend_src s
    ON s.spent_target = o.e AND s.spent_target_index = o.output_index
),
checkpoints AS (
  SELECT DISTINCT e // 10 AS slot_no,
         md5('blk' || CAST(e // 10 AS VARCHAR)) AS header_hash
  FROM ev
),
assets_tbl AS (
  SELECT
    o.transaction_id || '#' || CAST(o.output_index AS VARCHAR) AS output_reference,
    md5('pol' || CAST((o.e + t.j) % 7 AS VARCHAR)) AS policy_id,
    md5('ast' || CAST((o.e + 2 * t.j) % 5 AS VARCHAR)) AS asset_name,
    o.e % 100 + 1 + t.j AS quantity
  FROM outs o, (SELECT UNNEST([0, 1]) AS j) t
  WHERE o.output_index = 0 AND t.j < o.e % 3
),
policies AS (
  SELECT DISTINCT output_reference, policy_id FROM assets_tbl
),
binary_data AS (
  SELECT DISTINCT datum_hash AS binary_data_hash, datum_cbor AS binary_data
  FROM outs WHERE datum_cbor IS NOT NULL
),
scripts AS (
  SELECT DISTINCT script_hash, script_cbor AS script
  FROM outs WHERE script_cbor IS NOT NULL
)
"""


def _splice_payloads(prelude: str) -> str:
    # real-CBOR payload expressions shared with chaingen (plain .replace —
    # the CTE text contains literal braces that str.format would trip on)
    from kupo_spark.metadata import datum_cbor_sql, script_cbor_sql

    return prelude.replace("{datum_cbor}", datum_cbor_sql("e")).replace(
        "{script_cbor}", script_cbor_sql("e")
    )


PRELUDE = _splice_payloads(PRELUDE)

FOLD_SELECT = (
    "i.output_reference, i.transaction_id, i.transaction_index, i.output_index, "
    "i.address, i.coins, i.datum_hash, i.script_hash, i.created_at, "
    "c1.header_hash AS created_header_hash, i.spent_at, "
    "c2.header_hash AS spent_header_hash, i.spent_by, i.spent_input_index, i.spent_with"
)


def fold_inputs_sql(
    pattern: Pattern | str = "*",
    *,
    status: str | None = None,
    created_after: int | None = None,
    created_before: int | None = None,
    spent_after: int | None = None,
    spent_before: int | None = None,
    resolve_hashes: bool = False,
    filter_policy_id: str | None = None,
    filter_asset_name: str | None = None,
    filter_transaction_id: str | None = None,
    filter_output_index: int | None = None,
    with_prelude: bool = True,
) -> str:
    """Reference foldInputsQry (SQLite.hs:919-1003) over the PRELUDE CTEs.

    ``with_prelude=False`` emits only the SELECT body, so several fold
    bodies can be UNION'd under one shared PRELUDE (merged driver rows).
    """
    if isinstance(pattern, str):
        pattern = pattern_from_text(pattern)
    select = FOLD_SELECT
    joins = (
        " FROM inputs i"
        " JOIN checkpoints c1 ON c1.slot_no = i.created_at"
        " LEFT JOIN checkpoints c2 ON c2.slot_no = i.spent_at"
    )
    if resolve_hashes:
        select += ", bd.binary_data AS datum, sc.script AS script"
        joins += (
            " LEFT JOIN binary_data bd ON bd.binary_data_hash = i.datum_hash"
            " LEFT JOIN scripts sc ON sc.script_hash = i.script_hash"
        )
    where = [to_sql(pattern)]
    if status == "unspent":
        where.append("i.spent_at IS NULL")
    elif status == "spent":
        where.append("i.spent_at IS NOT NULL")
    if created_after is not None:
        where.append(f"i.created_at >= {created_after}")
    if created_before is not None:
        where.append(f"i.created_at <= {created_before}")
    if spent_after is not None:
        where.append(f"i.spent_at IS NOT NULL AND i.spent_at >= {spent_after}")
    if spent_before is not None:
        where.append(f"i.spent_at IS NOT NULL AND i.spent_at <= {spent_before}")
    if filter_policy_id is not None and filter_asset_name is not None:
        where.append(
            "EXISTS (SELECT 1 FROM assets_tbl x WHERE x.output_reference = i.output_reference"
            f" AND x.policy_id = '{filter_policy_id}' AND x.asset_name = '{filter_asset_name}')"
        )
    elif filter_policy_id is not None:
        where.append(
            "EXISTS (SELECT 1 FROM assets_tbl x WHERE x.output_reference = i.output_reference"
            f" AND x.policy_id = '{filter_policy_id}')"
        )
    if filter_transaction_id is not None:
        where.append(f"i.transaction_id = '{filter_transaction_id}'")
        if filter_output_index is not None:
            where.append(f"i.output_index = {filter_output_index}")
    body = f"SELECT {select}{joins} WHERE " + " AND ".join(f"({w})" for w in where)
    return (PRELUDE + body) if with_prelude else body


def merged_fold_sql(arms: list[tuple[str, dict]]) -> str:
    """Several fold bodies UNION ALL'd under one PRELUDE, each tagged with a
    marker column ``q`` — the oracle side of a merged driver row."""
    parts = [
        f"SELECT t{i}.*, '{marker}' AS q FROM ("
        + fold_inputs_sql(**spec, with_prelude=False)
        + f") t{i}"
        for i, (marker, spec) in enumerate(arms)
    ]
    return PRELUDE + " UNION ALL ".join(parts)


def count_inputs_sql(pattern: Pattern | str = "*") -> str:
    if isinstance(pattern, str):
        pattern = pattern_from_text(pattern)
    return PRELUDE + f"SELECT COUNT(*) AS n FROM inputs i WHERE {to_sql(pattern)}"


def count_inputs_multi_sql(
    arms: list[tuple[str, Pattern | str]],
    policies_arm: tuple[str, Pattern | str] | None = None,
) -> str:
    """A1 for several patterns in one statement, tagged by marker;
    ``policies_arm`` appends an A2 countPolicies arm under the same tag
    column (one driver row certifies both aggregates)."""
    parts = []
    for marker, pattern in arms:
        if isinstance(pattern, str):
            pattern = pattern_from_text(pattern)
        parts.append(
            f"SELECT '{marker}' AS pattern, COUNT(*) AS n FROM inputs i "
            f"WHERE {to_sql(pattern)}"
        )
    if policies_arm is not None:
        marker, pattern = policies_arm
        if isinstance(pattern, str):
            pattern = pattern_from_text(pattern)
        parts.append(
            f"SELECT '{marker}' AS pattern, COUNT(*) AS n FROM policies p "
            "WHERE EXISTS (SELECT 1 FROM inputs i "
            f"WHERE i.output_reference = p.output_reference AND {to_sql(pattern)})"
        )
    return PRELUDE + " UNION ALL ".join(parts)


def _match_json_body(resolve_hashes: bool = False, quantity_as_string: bool = False) -> str:
    """One SELECT over the PRELUDE CTEs that rebuilds ``resultToJson``
    byte-for-byte in SQL (Pattern.hs:447-521) — the oracle for the
    serving renderer.  Key rules mirrored: datum/script keys only under
    resolve_hashes, datum_type only when a datum exists, policies emitted
    DESCENDING / asset names ASCENDING, bare policy key on empty asset
    names, quantities as integers or strings (QuantityEncoding.hs:32-52).
    """
    resolve, as_string = resolve_hashes, quantity_as_string

    def qty(expr: str) -> str:
        return f"'\"' || {expr} || '\"'" if as_string else expr

    assets = (
        "COALESCE((SELECT string_agg("
        "'\"' || x.policy_id || "
        "CASE WHEN x.asset_name = '' THEN '' ELSE '.' || x.asset_name END || "
        f"'\":' || {qty('CAST(x.quantity AS VARCHAR)')}, "
        "',' ORDER BY x.policy_id DESC, x.asset_name ASC) "
        "FROM assets_tbl x WHERE x.output_reference = i.output_reference), '')"
    )
    datum_frag = (
        "',\"datum\":' || CASE WHEN bd.binary_data IS NULL THEN 'null' "
        "ELSE '\"' || bd.binary_data || '\"' END || "
        if resolve
        else ""
    )
    script_frag = (
        "',\"script\":' || CASE WHEN sc.script IS NULL THEN 'null' ELSE "
        "'{\"script\":\"' || substr(sc.script, 3) || '\",\"language\":\"' || "
        "CASE substr(sc.script, 1, 2) WHEN '00' THEN 'native' "
        "WHEN '01' THEN 'plutus:v1' WHEN '02' THEN 'plutus:v2' "
        "ELSE 'plutus:v3' END || '\"}' END || "
        if resolve
        else ""
    )
    joins = (
        " FROM inputs i"
        " JOIN checkpoints c1 ON c1.slot_no = i.created_at"
        " LEFT JOIN checkpoints c2 ON c2.slot_no = i.spent_at"
        " LEFT JOIN binary_data bd ON bd.binary_data_hash = i.datum_hash"
        " LEFT JOIN scripts sc ON sc.script_hash = i.script_hash"
    )
    return (
        "SELECT i.output_reference, "
        "'{\"transaction_index\":' || CAST(i.transaction_index AS VARCHAR) || "
        "',\"transaction_id\":\"' || i.transaction_id || "
        "'\",\"output_index\":' || CAST(i.output_index AS VARCHAR) || "
        "',\"address\":\"' || i.address || "
        f"'\",\"value\":{{\"coins\":' || {qty('CAST(i.coins AS VARCHAR)')} || "
        f"',\"assets\":{{' || {assets} || '}}}}' || "
        "',\"datum_hash\":' || CASE WHEN i.datum_hash IS NULL THEN 'null' "
        "ELSE '\"' || i.datum_hash || '\"' END || "
        + datum_frag
        + "CASE WHEN i.datum_kind IN ('inline', 'reference') "
        "THEN ',\"datum_type\":\"' || "
        "(CASE WHEN i.datum_kind = 'inline' THEN 'inline' ELSE 'hash' END) || '\"' "
        "ELSE '' END || "
        "',\"script_hash\":' || CASE WHEN i.script_hash IS NULL THEN 'null' "
        "ELSE '\"' || i.script_hash || '\"' END || "
        + script_frag
        + "',\"created_at\":{\"slot_no\":' || CAST(i.created_at AS VARCHAR) || "
        "',\"header_hash\":\"' || c1.header_hash || '\"}' || "
        "',\"spent_at\":' || CASE WHEN i.spent_at IS NULL THEN 'null' ELSE "
        "'{\"slot_no\":' || CAST(i.spent_at AS VARCHAR) || "
        "',\"header_hash\":\"' || c2.header_hash || "
        "'\",\"transaction_id\":' || CASE WHEN i.spent_by IS NULL THEN 'null' "
        "ELSE '\"' || i.spent_by || '\"' END || "
        "',\"input_index\":' || CASE WHEN i.spent_input_index IS NULL THEN 'null' "
        "ELSE CAST(i.spent_input_index AS VARCHAR) END || "
        "',\"redeemer\":' || CASE WHEN i.spent_with IS NULL THEN 'null' "
        "ELSE '\"' || i.spent_with || '\"' END || '}' END "
        "|| '}' AS result" + joins
    )


def result_json_sql(arms: list[tuple[str, dict]]) -> str:
    """C7 oracle: several render modes UNION ALL'd under one PRELUDE,
    tagged by marker — pairs with a merged ``result_json`` driver row."""
    parts = [
        f"SELECT '{marker}' AS q, t{i}.* FROM ("
        + _match_json_body(**spec)
        + f") t{i}"
        for i, (marker, spec) in enumerate(arms)
    ]
    return PRELUDE + " UNION ALL ".join(parts)


def count_policies_sql(pattern: Pattern | str = "*") -> str:
    if isinstance(pattern, str):
        pattern = pattern_from_text(pattern)
    return PRELUDE + (
        "SELECT COUNT(*) AS n FROM policies p WHERE EXISTS ("
        f"SELECT 1 FROM inputs i WHERE i.output_reference = p.output_reference AND {to_sql(pattern)})"
    )


def max_checkpoint_sql() -> str:
    return PRELUDE + (
        "SELECT slot_no, header_hash FROM checkpoints "
        "WHERE slot_no = (SELECT max(slot_no) FROM checkpoints)"
    )


def reference_checkpoint_distances(k: int) -> list[int]:
    """The reference's exact distance-from-tip list (SQLite.hs:724-729):
    ``[0, 10 .. k div 2^n] ++ [k div 2^e | e <- [n-1, n-2 .. 0]]`` with
    ``n = ceiling (log k)`` (natural log).  Re-stated here independently of
    ``operators.checkpoints.sample_distances`` so the oracle cannot be
    self-confirming — both sides must land on the same published list.
    """
    import math

    n = math.ceil(math.log(k))
    dense = list(range(0, k // (2**n) + 1, 10))
    halvings = [k // (2**e) for e in range(n - 1, -1, -1)]
    return dense + halvings


def _list_checkpoints_body(k: int, tag: str, where: str | None = None) -> str:
    """One O3 sample body over an optionally-filtered checkpoint set,
    tagged with ``arm``.  ``where`` is the gappy-arm filter — applied
    identically by the Spark side (a filtered Index.checkpoints)."""
    dlist = ", ".join(str(d) for d in reference_checkpoint_distances(k))
    src = f"(SELECT * FROM checkpoints WHERE {where})" if where else "checkpoints"
    return f"""
SELECT '{tag}' AS arm, c.slot_no, c.header_hash
FROM {src} c JOIN (
  SELECT DISTINCT (
    -- oldest checkpoint within distance d of the tip (SQLite.hs:1006-1010:
    -- slot_no >= tip - ? ORDER BY slot_no ASC LIMIT 1)
    SELECT min(slot_no) FROM {src} x,
         (SELECT max(slot_no) AS tip FROM {src}) tip
    WHERE x.slot_no >= tip.tip - t.d
  ) AS slot_no
  FROM (SELECT UNNEST([{dlist}]) AS d) t
) s ON s.slot_no = c.slot_no
"""


def list_checkpoints_sql(k: int, gappy_where: str | None = None) -> str:
    """O3 listCheckpointsDesc oracle.  With ``gappy_where`` (round-9
    rotated arm) a second tagged arm runs the SAME sample over a filtered
    — gappy — checkpoint set, where several sampled distances resolve to
    one oldest checkpoint and the distinct-on-slot dedup actually fires."""
    body = _list_checkpoints_body(k, "dense")
    if gappy_where is None:
        return PRELUDE + body
    return (
        PRELUDE + body + " UNION ALL "
        + _list_checkpoints_body(k, "gappy", gappy_where)
    )


def ancestors_sql(slot_no: int, n: int = 1) -> str:
    return PRELUDE + (
        f"SELECT slot_no, header_hash FROM checkpoints WHERE slot_no < {slot_no} "
        f"ORDER BY slot_no DESC LIMIT {n}"
    )


def datum_lookup_sql(datum_hash: str) -> str:
    return PRELUDE + (
        f"SELECT binary_data_hash, binary_data FROM binary_data WHERE binary_data_hash = '{datum_hash}'"
    )


def script_lookup_sql(script_hash: str) -> str:
    return PRELUDE + (
        f"SELECT script_hash, script FROM scripts WHERE script_hash = '{script_hash}'"
    )


def rolled_back_inputs_sql(slot_no: int) -> str:
    """M1 rollbackTo: expected inputs table after retracting past `slot_no`."""
    s = slot_no
    return PRELUDE + f"""
SELECT
  output_reference, transaction_id, transaction_index, output_index, address,
  payment_credential, coins, datum_hash, script_hash, created_at,
  CASE WHEN spent_at IS NOT NULL AND spent_at <= {s} THEN spent_at END AS spent_at,
  CASE WHEN spent_at IS NOT NULL AND spent_at <= {s} THEN spent_by END AS spent_by,
  CASE WHEN spent_at IS NOT NULL AND spent_at <= {s} THEN spent_with END AS spent_with
FROM inputs WHERE created_at <= {s}
"""


def rollback_and_put_patterns_sql(
    rollback_slot: int, m5_old: str, m5_new: str, m5_slot: int
) -> str:
    """Tagged union: the M1 rollback arm plus the M5 PUT-/patterns batch
    composition (rollback → install ``m5_new`` beside ``m5_old`` →
    backfill): rows the OLD pattern matches survive in full; rows ONLY the
    new pattern matches exist only past the rollback point (they were
    never rolled forward over); spent-marks are global (full replay)."""
    s = rollback_slot
    old_sql = to_sql(pattern_from_text(m5_old))
    new_sql = to_sql(pattern_from_text(m5_new))
    proj = (
        "i.output_reference, i.transaction_id, i.transaction_index, "
        "i.output_index, i.address, i.payment_credential, i.coins, "
        "i.datum_hash, i.script_hash, i.created_at"
    )
    return PRELUDE + f"""
SELECT
  output_reference, transaction_id, transaction_index, output_index, address,
  payment_credential, coins, datum_hash, script_hash, created_at,
  CASE WHEN spent_at IS NOT NULL AND spent_at <= {s} THEN spent_at END AS spent_at,
  CASE WHEN spent_at IS NOT NULL AND spent_at <= {s} THEN spent_by END AS spent_by,
  CASE WHEN spent_at IS NOT NULL AND spent_at <= {s} THEN spent_with END AS spent_with,
  'rollback' AS q
FROM inputs WHERE created_at <= {s}
UNION ALL
SELECT {proj}, i.spent_at, i.spent_by, i.spent_with, 'put_patterns' AS q
FROM inputs i
WHERE (({old_sql}) OR ({new_sql}))
  AND (i.created_at > {m5_slot} OR ({old_sql}))
UNION ALL
-- round-11 streaming-replay arm: micro-batched ingest + mid-stream
-- rollback + re-delivery must RESOLVE to the one-shot batch index — the
-- oracle is simply the full index state
SELECT {proj}, i.spent_at, i.spent_by, i.spent_with, 'stream_replay' AS q
FROM inputs i
"""


def pruned_inputs_sql(k: int) -> str:
    """M2 pruneInputs: surviving inputs with horizon tip - k."""
    return PRELUDE + f"""
, tip AS (SELECT max(slot_no) AS tip FROM checkpoints)
SELECT i.output_reference, i.transaction_id, i.address, i.coins, i.created_at, i.spent_at
FROM inputs i, tip
WHERE i.spent_at IS NULL OR i.spent_at >= tip.tip - {k}
"""


def pruned_binary_data_sql(rollback_slot: int) -> str:
    """M3 after an M1 rollback at `rollback_slot`: datum payloads still
    referenced by surviving inputs (orphans GC'd via anti-join)."""
    return PRELUDE + f"""
SELECT bd.binary_data_hash, bd.binary_data
FROM binary_data bd
WHERE EXISTS (
  SELECT 1 FROM inputs i
  WHERE i.created_at <= {rollback_slot} AND i.datum_hash = bd.binary_data_hash
)
"""


def metadata_by_slot_sql(slot_no: int) -> str:
    from kupo_spark.metadata import metadata_cbor_sql

    return PRELUDE + f"""
SELECT transaction_id, {metadata_cbor_sql('e')} AS metadata_cbor
FROM outs WHERE created_at = {slot_no} AND e % 4 = 0 AND output_index = 0
"""
