"""fold_inputs — the main read query (GET /matches[/{pattern}]).

Reference: ``foldInputsQry`` assembles pattern predicate + status flag +
slot-range predicates + checkpoint joins + ordering
(``src/Kupo/App/Database/SQLite.hs:919-1003``); query params parsed at
``src/Kupo/App/Http.hs:587-684``; residual per-row filter (policy/asset/
transaction/output_index) at ``src/Kupo/Data/Http/FilterMatchesBy.hs`` +
``mkYieldIf`` ``Http.hs:662-684``; status flags
``src/Kupo/Data/Http/StatusFlag.hs:15-41``; slot ranges
``src/Kupo/Data/Http/SlotRange.hs:27-133``.

Spark plan shape: scan(inputs) with the compiled pattern + range predicates
pushed to parquet → two broadcast joins against the ``checkpoints`` dimension
(J1 inner on created_at, J2 left on spent_at) → optional broadcast-able
dictionary joins (J3 binary_data, J4 scripts) → global sort only when the
caller asks for ordered output.
"""

from __future__ import annotations

from typing import Literal

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kupo_spark.operators.indexer import Index
from kupo_spark.patterns import (
    MatchPolicyId,
    Pattern,
    PatternError,
    pattern_from_text,
    to_column,
)

Status = Literal["unspent", "spent"] | None
Order = Literal["most_recent_first", "oldest_first"]


class UnknownPointError(ValueError):
    """A point-valued range bound does not exist in the index
    (Http.hs:631-643 answers 400 `queryUnavailableInPresenceOfInvalidPoint`)."""


def assert_point(index: Index, slot_no: int, header_hash: str) -> None:
    """Point assertion for range bounds given as `{slot}.{hash}` points:
    the point must name a known checkpoint (reference asserts against the
    checkpoints table before streaming results, Http.hs:631-641)."""
    hit = (
        index.checkpoints.where(
            (F.col("slot_no") == F.lit(slot_no))
            & (F.col("header_hash") == F.lit(header_hash))
        ).limit(1).count()
    )
    if hit == 0:
        raise UnknownPointError(f"unknown point {slot_no}.{header_hash}")

RESULT_COLUMNS = [
    "output_reference", "transaction_id", "transaction_index", "output_index",
    "address", "coins", "datum_hash", "script_hash",
    "created_at", "created_header_hash",
    "spent_at", "spent_header_hash", "spent_by", "spent_input_index", "spent_with",
]


def fold_inputs(
    index: Index,
    pattern: Pattern | str = "*",
    *,
    status: Status = None,
    created_after: int | None = None,
    created_before: int | None = None,
    spent_after: int | None = None,
    spent_before: int | None = None,
    order: Order = "most_recent_first",
    resolve_hashes: bool = False,
    filter_policy_id: str | None = None,
    filter_asset_name: str | None = None,
    filter_transaction_id: str | None = None,
    filter_output_index: int | None = None,
    use_policy_join: bool = True,
    broadcast_policy_join: bool = False,
    sorted_result: bool = False,
    created_after_point: tuple[int, str] | None = None,
    spent_before_point: tuple[int, str] | None = None,
) -> DataFrame:
    if isinstance(pattern, str):
        pattern = pattern_from_text(pattern)

    # P16 point-valued bounds: assert the point exists, then use its slot
    if created_after_point is not None:
        assert_point(index, *created_after_point)
        created_after = created_after_point[0]
    if spent_before_point is not None:
        assert_point(index, *spent_before_point)
        spent_before = spent_before_point[0]

    df = index.inputs

    # P1–P10 pattern predicate.  For MatchPolicyId we can either use the
    # policies join-index (kupo's plan, J5/Database.hs:756-759) or the
    # map_contains_key predicate on the value column; the join-index scans a
    # narrow table with the policy filter pushed down, then semi-joins on
    # output_reference — the winning plan when `assets` maps are wide.
    if isinstance(pattern, MatchPolicyId) and use_policy_join:
        keys = index.policies.where(F.col("policy_id") == pattern.policy_id).select(
            "output_reference"
        )
        if broadcast_policy_join:
            # pinned BroadcastHashJoin: a per-partition probe-side filter —
            # narrow, so it PRESERVES the inputs' storage order, which the
            # serving tier's no-sort hot path depends on (an SMJ fallback
            # would shuffle and silently destroy it).  Callers gate this on
            # a proven-small key set.
            keys = F.broadcast(keys)
        df = df.join(keys, "output_reference", "left_semi")
    else:
        df = df.where(to_column(pattern))

    # P15 status flag (StatusFlag.hs:15-41)
    if status == "unspent":
        df = df.where(F.col("spent_at").isNull())
    elif status == "spent":
        df = df.where(F.col("spent_at").isNotNull())

    # P16 slot ranges (SlotRange.hs:27-133; SQL at SQLite.hs:971-999).
    # On a partitioned parquet index, mirror the created_at bounds onto the
    # created_bucket partition column → partition pruning at the scan.
    bucketed = index.slot_bucket is not None and "created_bucket" in df.columns
    if created_after is not None:
        df = df.where(F.col("created_at") >= F.lit(created_after))
        if bucketed:
            df = df.where(F.col("created_bucket") >= created_after // index.slot_bucket)
    if created_before is not None:
        df = df.where(F.col("created_at") <= F.lit(created_before))
        if bucketed:
            df = df.where(F.col("created_bucket") <= created_before // index.slot_bucket)
    if spent_after is not None:
        df = df.where(F.col("spent_at").isNotNull() & (F.col("spent_at") >= F.lit(spent_after)))
    if spent_before is not None:
        df = df.where(F.col("spent_at").isNotNull() & (F.col("spent_at") <= F.lit(spent_before)))

    # P14 residual filters (FilterMatchesBy.hs; mkYieldIf Http.hs:662-684).
    # Values are BOUND as literal columns, never string-interpolated into
    # SQL text: these arrive verbatim from HTTP query parameters, and an
    # f-string here would be a remotely reachable expression injection.
    if filter_policy_id is not None and filter_asset_name is not None:
        df = df.where(
            F.try_element_at(
                F.try_element_at(F.col("assets"), F.lit(filter_policy_id)),
                F.lit(filter_asset_name),
            ).isNotNull()
        )
    elif filter_policy_id is not None:
        df = df.where(F.map_contains_key(F.col("assets"), F.lit(filter_policy_id)))
    elif filter_asset_name is not None:
        raise PatternError("asset_name filter requires policy_id (FilterMatchesBy.hs:60)")
    if filter_transaction_id is not None:
        df = df.where(F.col("transaction_id") == F.lit(filter_transaction_id))
        if filter_output_index is not None:
            df = df.where(F.col("output_index") == F.lit(filter_output_index))
    elif filter_output_index is not None:
        raise PatternError("output_index filter requires transaction_id")

    # J1/J2: checkpoint resolution — broadcast the dimension.  A
    # materialized index (write_index) and the serving view pre-resolve the
    # hashes once; skip the joins when the columns are already present.
    if "created_header_hash" not in df.columns:
        from kupo_spark.operators.indexer import resolve_header_hashes

        df = resolve_header_hashes(df, index.checkpoints)

    cols = list(RESULT_COLUMNS)
    if resolve_hashes:
        # J3/J4 (SQLite.hs:939-943) — dictionary left joins.
        bd = index.binary_data.select(
            F.col("binary_data_hash").alias("_bd_hash"), F.col("binary_data").alias("datum")
        )
        sc = index.scripts.select(
            F.col("script_hash").alias("_sc_hash"), F.col("script").alias("script")
        )
        df = df.join(bd, df.datum_hash == bd._bd_hash, "left").drop("_bd_hash")
        df = df.join(sc, df.script_hash == sc._sc_hash, "left").drop("_sc_hash")
        cols += ["datum", "script"]

    df = df.select(*cols)

    if sorted_result:
        # O1: total chain order (SQLite.hs:948-969).  The range sort's
        # boundary sampling re-executes the child (a filtered parquet scan
        # with pushed predicates — cheap to repeat); truncating lineage via
        # localCheckpoint was measured SLOWER end-to-end because the
        # .localCheckpoint() call compiles the physical plan eagerly
        # (~0.3 s Catalyst) and materializes the whole match, while the
        # re-executed scan costs less than that at every scale where the
        # filter is selective.  Plain orderBy keeps lineage (executor loss
        # recomputes instead of failing the request) and lets AQE pick the
        # shuffle partitioning.
        keys = ["created_at", "transaction_index", "output_index"]
        if order == "most_recent_first":
            df = df.orderBy(*[F.col(k).desc() for k in keys])
        else:
            df = df.orderBy(*[F.col(k).asc() for k in keys])
    return df


def count_inputs(index: Index, pattern: Pattern | str = "*") -> DataFrame:
    """A1 countInputs (SQLite.hs:681-686,909-917) — as a 1-row DataFrame."""
    if isinstance(pattern, str):
        pattern = pattern_from_text(pattern)
    return index.inputs.where(to_column(pattern)).agg(F.count("*").alias("n"))


def count_policies(index: Index, pattern: Pattern | str = "*") -> DataFrame:
    """A2 countPolicies (SQLite.hs:688-693,885-895): distinct policy rows of
    the pattern's matches."""
    if isinstance(pattern, str):
        pattern = pattern_from_text(pattern)
    keys = index.inputs.where(to_column(pattern)).select("output_reference")
    return (
        index.policies.join(keys, "output_reference", "left_semi")
        .agg(F.count("*").alias("n"))
    )
