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

def _size_bytes(raw: str, default: int) -> int:
    """Parse a Spark size conf value ('64MB', '134217728b', '1g')."""
    try:
        s = raw.strip().lower().removesuffix("b")
        mult = {"k": 1 << 10, "m": 1 << 20, "g": 1 << 30}.get(s[-1:], 1)
        return int(s.rstrip("kmg") or "0") * mult or default
    except (ValueError, AttributeError):
        return default


def _estimated_plan_bytes(df: DataFrame) -> int:
    """Catalyst's own size estimate for a frame (file bytes at the leaves,
    scaled through projections) — the same signal AQE plans from."""
    try:
        return int(
            str(df._jdf.queryExecution().analyzed().stats().sizeInBytes())  # noqa: SLF001
        )
    except Exception:  # noqa: BLE001 — estimate unavailable: assume big
        return 1 << 62


def chain_order_sort(
    df: DataFrame,
    keys: list[str],
    descending: bool,
    small: bool | None = None,
) -> DataFrame:
    """O1 global chain-order sort with a scale-adaptive plan (guide §2.4).

    ``orderBy``'s range exchange first runs a SAMPLING job that re-executes
    the entire child (scan + joins) to pick partition boundaries, then
    executes the child again for real — two full passes.  When Catalyst's
    own size estimate says the sort input fits one advisory partition, a
    1-partition range exchange sorts in a single pass instead
    (``RangePartitioner`` skips sampling outright for one partition), and
    AQE would have coalesced the post-shuffle side to one partition anyway.
    A large (or unestimable) input keeps the sampled parallel range sort —
    the scale-safe plan.  The sort keys are a total order (one row per
    (created_at, transaction_index, output_index)), so output order is
    bit-identical on both paths.

    ``small`` overrides the estimate for callers whose frame carries
    row-preserving joins (dictionary left joins, the render's assets
    re-attach) that inflate Catalyst's product-based join estimate while
    leaving the true row count unchanged — they gate on the pre-join
    frame's estimate instead."""
    cols = [F.col(k).desc() if descending else F.col(k).asc() for k in keys]
    if small is None:
        advisory = _size_bytes(
            df.sparkSession.conf.get(
                "spark.sql.adaptive.advisoryPartitionSizeInBytes", "64MB"
            ),
            64 << 20,
        )
        small = _estimated_plan_bytes(df) <= advisory
    if small:
        return df.repartitionByRange(1, *cols).sortWithinPartitions(*cols)
    return df.orderBy(*cols)


def plan_is_small(df: DataFrame, width_factor: int = 1) -> bool:
    """True when Catalyst's size estimate for ``df`` (scaled by
    ``width_factor`` for columns a caller will attach later) fits one
    advisory partition — the single-pass-sort gate."""
    advisory = _size_bytes(
        df.sparkSession.conf.get(
            "spark.sql.adaptive.advisoryPartitionSizeInBytes", "64MB"
        ),
        64 << 20,
    )
    est = _estimated_plan_bytes(df)
    return est <= advisory // max(1, width_factor)


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
    use_policy_join: bool | None = None,
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
    # Default (None) is size-adaptive (r11, guide §3.1/§1.2): when the whole
    # inputs table fits one advisory partition, the semi-join's exchange/
    # broadcast machinery costs more than the map-key predicate scan it
    # saves (measured 0.182 vs 0.083 s noop at the bench corpus; both paths
    # return identical rows — the policies table IS the exploded map keys);
    # a big (or unestimable) inputs table keeps kupo's join-index plan,
    # which never reads the wide `assets` maps of non-matching rows.  The
    # gate is Catalyst's own size estimate — the same signal
    # chain_order_sort gates on — so the at-scale plan is unchanged.
    if isinstance(pattern, MatchPolicyId) and use_policy_join is None:
        use_policy_join = not plan_is_small(index.inputs)
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

    # single-pass-sort gate, taken BEFORE the row-preserving dictionary /
    # checkpoint joins below (their product-based size estimates inflate
    # while the row count cannot grow)
    small_sort = plan_is_small(df, width_factor=2) if sorted_result else None

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
        # O1: total chain order (SQLite.hs:948-969).  Truncating lineage via
        # localCheckpoint was measured SLOWER end-to-end (eager plan compile
        # + full materialization); chain_order_sort instead drops the range
        # sampler's re-execution pass entirely when the size estimate says
        # the input fits one partition, and keeps the sampled parallel sort
        # (lineage intact, AQE partitioning) for everything bigger.
        keys = ["created_at", "transaction_index", "output_index"]
        df = chain_order_sort(df, keys, order == "most_recent_first", small=small_sort)
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
