"""The indexer — kupo's consumer/matchBlock pipeline as one DataFrame job.

Reference semantics:
  * ``matchBlock`` one pass over block × pattern-set producing 5 streams
    (results, spent refs, datums, scripts, policies) —
    ``src/Kupo/Data/Pattern.hs:561-641``;
  * writes W1–W4 with INSERT-OR-IGNORE dedup (``SQLite.hs:608-710,831-844``);
  * spent-resolution ``markInputs`` UPDATE (``SQLite.hs:645-652,857-866``);
  * per-block gating of datum/script dictionary writes
    (``src/Kupo/App.hs:530-542``).

Spark realization (batch; the streaming wrapper lives in
``kupo_spark.streaming``):

  1. explode outputs (F1/F2), apply the OR-folded broadcast pattern predicate
     at the scan (predicate pushdown — no UDFs, all codegen),
  2. explode spent inputs (F3) with their redeemers (F5),
  3. resolve spends against produced outputs with ONE equi-join on
     ``output_reference`` — the batch analog of the markInputs MERGE.  At
     100 TB this is the only big-big shuffle; both sides can be bucketed by
     ``output_reference`` so it becomes a co-located join,
  4. derive the dictionary tables (checkpoints/policies/binary_data/scripts)
     from the same exploded frame with map-side dedup.
"""

from __future__ import annotations

from dataclasses import dataclass, replace
from typing import Iterable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kupo_spark.patterns import MatchAny, Pattern, any_to_column, pattern_from_text


@dataclass
class Index:
    """The six kupo tables (§1.2 of SURVEY.md) as DataFrames."""

    inputs: DataFrame
    checkpoints: DataFrame
    policies: DataFrame      # (output_reference, policy_id) join index
    assets: DataFrame        # (output_reference, policy_id, asset_name, quantity)
    binary_data: DataFrame   # (binary_data_hash, binary_data)
    scripts: DataFrame       # (script_hash, script)
    #: width of the created_at partition buckets when `inputs` is backed by
    #: partitioned parquet (None for in-memory indexes); slot-range queries
    #: add created_bucket bounds so the scan prunes whole partitions —
    #: the Spark-native analog of kupo's created_at B-tree index.
    slot_bucket: int | None = None

    def persist(self) -> "Index":
        return Index(*(df.persist() for df in (
            self.inputs, self.checkpoints, self.policies, self.assets,
            self.binary_data, self.scripts)), slot_bucket=self.slot_bucket)

    def unpersist(self) -> None:
        for df in (self.inputs, self.checkpoints, self.policies, self.assets,
                   self.binary_data, self.scripts):
            df.unpersist()

    def with_inputs(self, inputs: DataFrame) -> "Index":
        return replace(self, inputs=inputs)


def _as_patterns(patterns: Iterable[Pattern | str]) -> list[Pattern]:
    return [pattern_from_text(p) if isinstance(p, str) else p for p in patterns]


def _effective_outputs(blocks: DataFrame):
    """Era subtlety S8 (Cardano.hs:211-228,292-323): an invalid (phase-2
    failed) transaction produces ONLY its collateral-return output, at
    output index |outputs|.  Blocks without validity columns are all-valid."""
    if "is_valid" not in blocks.columns:
        return F.col("outputs")
    ret = F.when(
        F.col("collateral_return").isNotNull(),
        F.array(
            F.col("collateral_return").withField(
                "output_index", F.expr("cast(size(outputs) as int)")
            )
        ),
    ).otherwise(F.expr("slice(outputs, 1, 0)"))  # typed empty array
    return F.when(F.col("is_valid"), F.col("outputs")).otherwise(ret)


def exploded_outputs(blocks: DataFrame) -> DataFrame:
    """F1/F2: one row per produced output, with synthesized references."""
    o = blocks.select(
        "slot_no",
        "transaction_index",
        "transaction_id",
        "metadata_tags",
        F.explode(_effective_outputs(blocks)).alias("out"),
    )
    return o.select(
        F.concat(
            F.col("transaction_id"), F.lit("#"), F.col("out.output_index").cast("string")
        ).alias("output_reference"),
        F.concat(
            F.col("transaction_id"), F.lit("#"), F.col("out.output_index").cast("string"),
            F.lit("@"), F.col("transaction_index").cast("string"),
        ).alias("ext_output_reference"),
        # packed binary rows (Database.hs:238-260, db/v2.1.0/003.sql):
        # txid(32) ‖ output_index(2 BE) [‖ transaction_index(2 BE)] — P7/P8
        # compile to byte-interval predicates over these, mirroring the
        # reference's BETWEEN range scan; built with unhex/lpad (codegen, no
        # UDF).  The 34-byte form is the 36-byte form's prefix, kept
        # materialized so parquet min/max stats cover the range predicate.
        F.unhex(
            F.concat(
                F.col("transaction_id"),
                F.lpad(F.hex(F.col("out.output_index")), 4, "0"),
            )
        ).alias("output_reference_bin"),
        F.unhex(
            F.concat(
                F.col("transaction_id"),
                F.lpad(F.hex(F.col("out.output_index")), 4, "0"),
                F.lpad(F.hex(F.col("transaction_index")), 4, "0"),
            )
        ).alias("ext_output_reference_bin"),
        "transaction_id",
        "transaction_index",
        F.col("out.output_index").alias("output_index"),
        F.col("out.address").alias("address"),
        F.expr("right(out.address, 56)").alias("payment_credential"),
        F.col("out.coins").alias("coins"),
        F.col("out.assets").alias("assets"),
        F.col("out.datum_kind").alias("datum_kind"),
        F.col("out.datum_hash").alias("datum_hash"),
        # flag-byte ‖ hash (datumInfoToRow, Database.hs:393-399; NULL when
        # no datum — the v2.2.0 datum_info column, from which datum_hash is
        # the generated substr(datum_info, 2))
        F.when(
            F.col("out.datum_kind") == "inline",
            F.concat(F.unhex(F.lit("01")), F.unhex(F.col("out.datum_hash"))),
        )
        .when(
            F.col("out.datum_kind") == "reference",
            F.concat(F.unhex(F.lit("00")), F.unhex(F.col("out.datum_hash"))),
        )
        .alias("datum_info"),
        F.col("out.datum_cbor").alias("datum_cbor"),
        F.col("out.script_hash").alias("script_hash"),
        F.col("out.script_cbor").alias("script_cbor"),
        F.col("slot_no").alias("created_at"),
        "metadata_tags",
    )


def spent_refs(blocks: DataFrame) -> DataFrame:
    """F3+F5: one row per consumed output-reference with spend metadata.

    Era subtlety S8 (Cardano.hs:199-233): an invalid transaction consumes
    its *collateral* inputs instead of its inputs, and collateral spends
    carry no redeemer."""
    has_validity = "is_valid" in blocks.columns
    eff_inputs = (
        F.when(F.col("is_valid"), F.col("inputs")).otherwise(F.col("collateral_inputs"))
        if has_validity
        else F.col("inputs")
    )
    s = blocks.select(
        F.col("slot_no").alias("spent_at"),
        F.col("transaction_id").alias("spent_by"),
        F.posexplode(eff_inputs).alias("spent_input_index", "spent_ref"),
        "spend_redeemers",
        *(["is_valid"] if has_validity else []),
    )
    redeemer = F.expr("try_element_at(spend_redeemers, spent_input_index)")
    if has_validity:
        redeemer = F.when(F.col("is_valid"), redeemer)
    return s.select(
        "spent_ref",
        "spent_at",
        "spent_by",
        "spent_input_index",
        redeemer.alias("spent_with"),
    )


def build_index(
    blocks: DataFrame,
    patterns: Iterable[Pattern | str] = ("*",),
    prune_utxo: bool = False,
    cache: bool = False,
    longest_rollback: int | None = None,
) -> Index:
    """``cache=True`` persists the exploded-outputs frame so the six table
    derivations share one materialization (use when writing a full index;
    the equivalent of kupo's one-pass Codecs fold, Pattern.hs:523-531)."""
    pats = _as_patterns(patterns)
    outs = exploded_outputs(blocks)
    if cache:
        outs = outs.persist()

    # W1 INSERT OR IGNORE semantics (Pattern.hs:555-560, SQLite.hs:831-844):
    # kupo emits one match per (pattern, output) and dedups on insert.  Here
    # the pattern set is OR-folded into ONE predicate over the exploded
    # outputs — each output appears exactly once by construction, so the
    # dedup (a full shuffle + sort at 100 TB) is provably unnecessary.
    produced = outs.where(any_to_column(pats, at_ingest=True))

    spends = spent_refs(blocks)

    # markInputs as a batch equi-join (J7/W5).  Spent refs are unique by
    # ledger rules (an output is consumed at most once).
    inputs = (
        produced.join(spends, produced.output_reference == spends.spent_ref, "left")
        .drop("spent_ref")
    )
    if prune_utxo:
        # --prune-utxo (M4, App.hs:558-577): RemoveSpentInputs deletes a
        # spend only when it sits DEEPER than the unstable window
        # (``distanceToTip lastKnownTip lastKnownSlot > longestRollback``);
        # a spend within the window — boundary included, distance == k is
        # NOT > k — stays MARKED so a rollback can still un-spend it, and
        # the periodic gardener prunes it once it matures past the horizon.
        # The horizon is a broadcast 1-row aggregate (same discipline as
        # maintenance.prune_inputs), never a driver collect.
        from kupo_spark.chainspec import LONGEST_ROLLBACK

        k = LONGEST_ROLLBACK if longest_rollback is None else longest_rollback
        horizon = blocks.agg(
            (F.coalesce(F.max("slot_no"), F.lit(0)) - F.lit(k)).alias("_horizon")
        )
        inputs = (
            inputs.join(F.broadcast(horizon))
            .where(
                F.col("spent_at").isNull()
                | (F.col("spent_at") >= F.col("_horizon"))
            )
            .drop("_horizon")
        )

    checkpoints = blocks.select("slot_no", "header_hash").dropDuplicates(["slot_no"])

    # W4 insertPolicies (SQLite.hs:846-856): one (output_reference,
    # policy_id) row per asset policy of each produced output.  No dedup
    # pass: `produced` carries each output exactly once (the same W1
    # invariant above) and map keys are unique within one `assets` map, so
    # the exploded pairs are distinct by construction — a dropDuplicates
    # here is a full exchange + aggregate re-proving that invariant over
    # every pair at every scale (guide §2.4: a distinct on already-unique
    # data), removed r11.
    policies = produced.select(
        "output_reference", F.explode(F.map_keys("assets")).alias("policy_id")
    )
    assets = (
        produced.select("output_reference", F.explode("assets").alias("policy_id", "amap"))
        .select("output_reference", "policy_id", F.explode("amap").alias("asset_name", "quantity"))
    )

    # W3 gate: dictionary rows are written only for blocks that produced at
    # least one matched result (App.hs:530-542).  With a wildcard pattern the
    # gate is a no-op — skip the extra semi-join shuffle in that case.
    # No broadcast hint: matched_slots is bounded by the CHAIN length, not
    # the pattern (a broad pattern like `*/*` matches nearly every slot —
    # a forced broadcast would ship the whole slot set to every task);
    # AQE converts the semi-join to a broadcast at runtime when the
    # matched set is actually small.
    wildcard = any(isinstance(p, MatchAny) and p.include_bootstrap for p in pats)
    dict_src = outs
    if not wildcard:
        matched_slots = produced.select("created_at").dropDuplicates(["created_at"])
        dict_src = outs.join(
            matched_slots,
            outs.created_at == matched_slots.created_at,
            "left_semi",
        )

    binary_data = (
        dict_src.where(F.col("datum_cbor").isNotNull())
        .select(F.col("datum_hash").alias("binary_data_hash"), F.col("datum_cbor").alias("binary_data"))
        .dropDuplicates(["binary_data_hash"])
    )
    scripts = (
        dict_src.where(F.col("script_cbor").isNotNull())
        .select("script_hash", F.col("script_cbor").alias("script"))
        .dropDuplicates(["script_hash"])
    )

    return Index(
        inputs=inputs,
        checkpoints=checkpoints,
        policies=policies,
        assets=assets,
        binary_data=binary_data,
        scripts=scripts,
    )


#: checkpoints-broadcast cutoff for resolve_header_hashes: the dimension is
#: one row per block (slot + 32-hex hash ≈ 50 B), so 2M rows ≈ 100 MB — a
#: mainnet-scale chain (~11M blocks) must NOT be forced to every task;
#: above the cutoff the joins shuffle (AQE still broadcasts at runtime if
#: the actual bytes allow).  Same explicit-gate discipline as
#: dedup.BROADCAST_ID_LIMIT.
BROADCAST_CHECKPOINTS_LIMIT = 2_000_000


#: Columns of the materialized ``inputs`` table, in storage order.
def resolve_header_hashes(
    inputs: DataFrame, checkpoints: DataFrame, broadcast: bool = True
) -> DataFrame:
    """J1/J2 (SQLite.hs:930-937): resolve created/spent slots to header
    hashes against the checkpoints dimension — J1 inner (a match without
    a known creation checkpoint never surfaces), J2 left (unspent rows
    keep NULL).  Shared by fold_inputs, Serving, and write_index so the
    inner/left asymmetry lives in exactly one place.

    ``broadcast`` defaults True (the in-memory/test-scale call sites; the
    materialized index stores these columns denormalized, so per-query
    folds never re-join).  One-shot writers that know the chain length
    pass ``count <= BROADCAST_CHECKPOINTS_LIMIT`` — a mainnet-scale
    checkpoint dimension is a shuffled (or AQE-decided) join, never a
    forced 100 MB+ task closure."""
    created = checkpoints.select(
        F.col("slot_no").alias("_c_slot"),
        F.col("header_hash").alias("created_header_hash"),
    )
    spent = checkpoints.select(
        F.col("slot_no").alias("_s_slot"),
        F.col("header_hash").alias("spent_header_hash"),
    )
    if broadcast:
        created, spent = F.broadcast(created), F.broadcast(spent)
    inputs = inputs.join(created, inputs.created_at == created._c_slot, "inner").drop(
        "_c_slot"
    )
    return inputs.join(spent, inputs.spent_at == spent._s_slot, "left").drop("_s_slot")


def write_index(
    index: Index,
    path: str,
    slot_bucket: int = 1000,
    timings: dict | None = None,
    bucket_range: tuple[int, int] | None = None,
    only: str | None = None,
) -> None:
    """Materialize the index as parquet, laid out for the query mix:

    - ``inputs`` partitioned by a created_at bucket → partition pruning for
      slot-range queries (the analog of kupo's created_at index), and sorted
      within partitions by address so min/max stats skip credential scans
      (the Z-order/cluster-by analog);
    - the checkpoint header hashes (J1/J2, SQLite.hs:930-937) are resolved
      ONCE here and stored denormalized — kupo re-joins checkpoints per
      query because SQLite rows are precious; columnar storage makes the
      two dictionary-encoded hash columns nearly free, and every fold over
      the materialized index then skips two broadcast builds per request
      (`fold_inputs` detects the resolved columns and skips J1/J2);
    - side tables small → single dir each.

    ``timings`` (optional dict) receives per-phase wall seconds
    (``write_inputs`` / ``write_side_tables``) so bench runs can tell an
    ingest regression from harness contention.

    ``bucket_range=(lo, hi)`` writes only the inputs partitions with
    ``lo <= created_bucket < hi`` — the slot-range incremental primitive:
    a backfill or a chunked bulk load writes disjoint bucket ranges
    independently (at 100 TB, from different jobs) into the same layout.
    Range writes use DYNAMIC partition overwrite: each replaces exactly
    its own partition dirs, so ranges land in any order and re-running a
    range (job retry) is idempotent instead of appending duplicates.
    ``only`` restricts the call to one leg: ``"inputs"`` skips the side
    tables, ``"side"`` skips inputs (finish a chunked load by writing the
    five side tables + the schema sidecar once).
    """
    import time as _time

    inputs = index.inputs
    tip = None
    checkpoints = index.checkpoints
    ckpt_persisted = False
    if "created_header_hash" not in inputs.columns:
        # the checkpoints lineage is consumed FOUR times by this write —
        # the stats aggregate below, the two broadcast builds inside
        # resolve_header_hashes (J1 created / J2 spent), and the side-table
        # write — and on a fresh index each evaluation re-runs the whole
        # chain derivation (events scan + header-hash md5 + dedup,
        # measured ~1.4 s/eval at sf0.1).  Persist it for the duration of
        # the write (created and dropped inside this one call — not a
        # cross-run cache) so the derivation runs once (r11, guide §1.2).
        checkpoints = checkpoints.persist()
        ckpt_persisted = True
        # ONE tiny checkpoints aggregate decides the join strategy AND
        # bounds the bucket count (r11: this used to be two jobs — a
        # checkpoints count here plus a full inputs scan for
        # max(created_bucket) below; every created_at IS a checkpoint slot,
        # so the tip bounds the bucket range, and an over-bound only pads
        # the clamped task count, never the layout)
        stats = checkpoints.agg(
            F.count("*").alias("n"), F.max("slot_no").alias("tip")
        ).first()
        inputs = resolve_header_hashes(
            inputs, checkpoints,
            broadcast=stats["n"] <= BROADCAST_CHECKPOINTS_LIMIT,
        )
        tip = stats["tip"]
    inputs = inputs.withColumn(
        "created_bucket", (F.col("created_at") / slot_bucket).cast("long")
    )
    _t0 = _time.time()
    # one shuffle partition per created_bucket (clamped): with the session
    # default (32) a 10x-larger chain still hashes into 32 tasks, so each
    # task's address sort holds 10x the rows and starts spilling — the one
    # super-linear phase in the measured scaling curve.  Keying the task
    # count to the bucket count keeps per-task sort volume constant
    # (~slot_bucket worth of rows) at every scale, and each task then
    # writes exactly its own partition directory.
    n_buckets = 0
    if bucket_range is None and only != "side":
        n_buckets = (
            (tip or 0) // slot_bucket + 1
            if tip is not None
            else (inputs.agg(F.max("created_bucket").alias("b")).first()["b"] or 0)
            + 1
        )
    # one task per bucket (A/B'd at sf10: one-task-per-bucket beat
    # 8-buckets/task (97 s) and the fixed session default (107 s) — small
    # per-task sorts win; rows-per-bucket is fixed by slot_bucket, so
    # per-task volume stays constant at every scale).  Isolated wall time
    # for this phase at sf10 on this host: 54-73 s depending on page-cache
    # warmth (tools/ab_sf10.py, r7) — cross-round shifts beyond that band
    # have so far always been harness contention, not code (r6's 192 s
    # reading reproduced at 73 s in isolation).
    if only != "side":
        slice_df = inputs
        n_slice_buckets = n_buckets
        writer_opts: dict[str, str] = {}
        if bucket_range is not None:
            lo, hi = bucket_range
            slice_df = inputs.where(
                (F.col("created_bucket") >= lo) & (F.col("created_bucket") < hi)
            )
            n_slice_buckets = hi - lo
            # EVERY range writes with dynamic partition overwrite (ADVICE
            # r10): only the partition dirs present in this slice are
            # replaced, so (a) ranges from independent jobs land in any
            # order without a lo==0 write statically clearing the whole
            # root, and (b) a RE-RUN of any range replaces its own dirs
            # instead of appending duplicate rows — idempotent per
            # partition, which is what a retried 100 TB backfill job needs.
            writer_opts["partitionOverwriteMode"] = "dynamic"
        n_parts = max(32, min(4096, int(n_slice_buckets)))
        (
            slice_df.repartition(n_parts, "created_bucket")
            .sortWithinPartitions("address", "created_at")
            .write.mode("overwrite")
            .options(**writer_opts)
            .partitionBy("created_bucket")
            .parquet(f"{path}/inputs")
        )
    if timings is not None:
        timings["write_inputs"] = _time.time() - _t0
        _t0 = _time.time()
    if only == "inputs":
        if ckpt_persisted:
            checkpoints.unpersist()
        return
    # the inputs write above materialized the (cached) match lineage; the
    # five side tables are then cheap scans off the cache — submit their
    # jobs concurrently so the per-job scheduling floor overlaps instead
    # of serializing (Spark's scheduler is thread-safe by design)
    from concurrent.futures import ThreadPoolExecutor

    side = [
        (checkpoints, "checkpoints"),
        (index.policies, "policies"),
        (index.assets, "assets"),
        (index.binary_data, "binary_data"),
        (index.scripts, "scripts"),
    ]
    with ThreadPoolExecutor(len(side)) as ex:
        list(
            ex.map(
                lambda t: t[0].write.mode("overwrite").parquet(f"{path}/{t[1]}"),
                side,
            )
        )
    if timings is not None:
        timings["write_side_tables"] = _time.time() - _t0
    # schema sidecar: an empty table writes NO part files (partitionBy emits
    # nothing for 0 rows), so inference on read-back would fail — a filtered
    # copy can legitimately empty any table.  The sidecar also spares the
    # footer-sampling inference pass on every open.
    import json as _json

    schemas = {"inputs": inputs.schema.jsonValue()}
    for df, name in side:
        schemas[name] = df.schema.jsonValue()
    with open(f"{path}/_schemas.json", "w") as fh:
        _json.dump(schemas, fh)
    if ckpt_persisted:
        checkpoints.unpersist()


def read_index(spark, path: str, slot_bucket: int = 1000) -> Index:
    import json as _json
    import os as _os

    from pyspark.sql.types import StructType

    schemas: dict[str, StructType] = {}
    sidecar = f"{path}/_schemas.json"
    if _os.path.exists(sidecar):
        with open(sidecar) as fh:
            schemas = {
                k: StructType.fromJson(v) for k, v in _json.load(fh).items()
            }

    def rd(name: str):
        reader = spark.read
        if name in schemas:
            reader = reader.schema(schemas[name])
        return reader.parquet(f"{path}/{name}")

    return Index(
        inputs=rd("inputs"),
        checkpoints=rd("checkpoints"),
        policies=rd("policies"),
        assets=rd("assets"),
        binary_data=rd("binary_data"),
        scripts=rd("scripts"),
        slot_bucket=slot_bucket,
    )
