"""Streaming indexer — kupo's producer/consumer loop on Structured Streaming.

Reference semantics being reproduced:
  * Mailbox micro-batching: the consumer drains all pending blocks and
    writes them in one transaction (``src/Kupo/App/Mailbox.hs:60-83``,
    ``src/Kupo/App.hs:496-544``) → here: one ``foreachBatch`` invocation.
  * ``rollForwardAll`` write sequence W1–W5 (``App.hs:512-577``).
  * ``rollbackTo`` retraction (``SQLite.hs:799-819``) — the one operation
    vanilla Structured Streaming cannot express.

Design: a **log-structured index** (retraction-as-data):

  * every micro-batch APPENDS immutable logs — ``produced`` outputs,
    ``spends``, ``checkpoints``, dictionary rows — each tagged with a
    monotone ``batch_seq``;
  * a rollback is itself an appended record ``(batch_seq, slot)``: a log row
    written at seq ≤ r.batch_seq with slot > r.slot is dead;
  * ``resolved_index()`` replays the logs: kill dead rows, keep the
    latest surviving version per key (re-indexed rows after a rollback win),
    then resolve spends against produced with the one equi-join.

At scale this is exactly the Delta/Iceberg model (append + compact); the
spent-resolution join moves out of the ingest hot path into resolve/compact,
so ingest itself is shuffle-free per batch.

**Exactly-once commits.**  Each micro-batch is published with an atomic
commit protocol — the Spark-native analog of kupo's per-batch SQLite
transaction (``SQLite.hs:1112-1128``) and of a Delta ``_delta_log`` entry:

  1. all five log tables are written under ``_staging/<seq>/``;
  2. each staged table is renamed into its ``<table>/batch_seq=<seq>/``
     partition directory (rename = atomic, torn part-files never appear
     under a table root);
  3. a manifest file ``manifest/<seq>.json`` recording
     ``(seq, batch_id, dedup key)`` is written via tmp-file + rename —
     this rename IS the commit point.

Readers resolve visibility from the manifest: partition dirs without a
manifest entry (a crash between steps 2 and 3) are filtered out by the
``batch_seq`` partition column — an O(#crashes) predicate, pruned at the
scan.  A replayed ``foreachBatch`` delivery (same stream checkpoint + same
batch_id) finds its dedup key already manifested and returns without
writing, so the log — not merely the resolved view — is exactly-once.
"""

from __future__ import annotations

import json
import shutil
import time
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from kupo_spark.operators.indexer import Index, exploded_outputs, spent_refs
from kupo_spark.patterns import any_to_column, pattern_from_text

LOG_TABLES = ("produced", "spends", "checkpoints", "binary_data", "scripts")


class StreamingIndexer:
    def __init__(self, out_dir: str, patterns=("*",)):
        self.out_dir = out_dir
        self.patterns = [
            pattern_from_text(p) if isinstance(p, str) else p for p in patterns
        ]
        Path(out_dir).mkdir(parents=True, exist_ok=True)
        self._seq_file = Path(out_dir) / "_last_seq"
        self._manifest_dir = Path(out_dir) / "manifest"
        self._manifest_dir.mkdir(exist_ok=True)
        self._committed_cache: list[dict] | None = None

    # ---- sequencing + commit log ----------------------------------------

    def _committed(self) -> list[dict]:
        """All committed batch manifests, oldest first.  One small json per
        batch; a production deployment folds old entries into the compacted
        base the way Delta checkpoints its log.

        The directory is scanned once per indexer (startup recovery) and the
        in-memory list is appended to on every successful commit — without
        the cache each micro-batch re-reads every manifest file and the
        commit-log overhead grows O(n²) over the stream's lifetime."""
        if self._committed_cache is None:
            self._committed_cache = [
                json.loads(p.read_text())
                for p in sorted(self._manifest_dir.glob("*.json"))
            ]
        return self._committed_cache

    def _next_seq(self) -> int:
        last = -1
        if self._seq_file.exists():
            last = int(self._seq_file.read_text() or -1)
        # crash-safe floor: the manifest (and rollback log) are the durable
        # record; _last_seq is only a fast path
        for m in self._committed():
            last = max(last, m["seq"])
        for r in self._rollbacks():
            last = max(last, r["batch_seq"])
        return last + 1

    def _commit_seq(self, seq: int) -> None:
        self._seq_file.write_text(str(seq))

    def _uncommitted_seqs(self) -> list[int]:
        """Partition dirs present on disk but absent from the commit log —
        the residue of a crash between publish (step 2) and the manifest
        rename (step 3).  Normally empty, so the reader-side visibility
        predicate is O(#crashes), not O(#batches)."""
        committed = {m["seq"] for m in self._committed()}
        present: set[int] = set()
        for name in LOG_TABLES:
            t = Path(self.out_dir) / name
            if t.exists():
                present.update(
                    int(p.name.split("=", 1)[1])
                    for p in t.iterdir()
                    if p.name.startswith("batch_seq=")
                )
        return sorted(present - committed)

    def _read_log(self, spark: SparkSession, name: str) -> DataFrame:
        """Read one log table at committed visibility: `batch_seq` comes in
        as a partition column and uncommitted partitions (crash residue) are
        filtered out — the predicate prunes whole directories at the scan."""
        df = spark.read.parquet(f"{self.out_dir}/{name}")
        bad = self._uncommitted_seqs()
        if bad:
            df = df.where(~F.col("batch_seq").isin(bad))
        return df

    # ---- the foreachBatch body (rollForwardAll, App.hs:512-577) ---------

    def process_batch(
        self, blocks: DataFrame, batch_id: int, dedup_scope: str | None = None
    ) -> None:
        """One atomic ingest transaction.  With ``dedup_scope`` set (the
        streaming path passes its checkpoint location), a replayed delivery
        of the same (scope, batch_id) is a no-op — exactly-once at the log
        level.  Without a scope (direct calls), every invocation writes."""
        key = None if dedup_scope is None else f"{dedup_scope}:{batch_id}"
        if key is not None and any(m.get("key") == key for m in self._committed()):
            return

        seq = self._next_seq()
        out = Path(self.out_dir)
        stage = out / "_staging" / str(seq)
        if stage.exists():
            shutil.rmtree(stage)

        outs = exploded_outputs(blocks)
        produced = outs.where(any_to_column(self.patterns, at_ingest=True)).drop(
            "metadata_tags"
        )
        produced.write.mode("overwrite").parquet(str(stage / "produced"))
        spent_refs(blocks).write.mode("overwrite").parquet(str(stage / "spends"))
        blocks.select("slot_no", "header_hash").dropDuplicates(["slot_no"]).write.mode(
            "overwrite"
        ).parquet(str(stage / "checkpoints"))

        # W3 dictionaries (gate: only blocks with >= 1 match, App.hs:530-542)
        dict_src = outs
        if not any(getattr(p, "include_bootstrap", False) for p in self.patterns):
            matched_slots = produced.select("created_at").dropDuplicates(["created_at"])
            dict_src = outs.join(
                F.broadcast(matched_slots), outs.created_at == matched_slots.created_at, "left_semi"
            )
        dict_src.where(F.col("datum_cbor").isNotNull()).select(
            F.col("datum_hash").alias("binary_data_hash"),
            F.col("datum_cbor").alias("binary_data"),
        ).write.mode("overwrite").parquet(str(stage / "binary_data"))
        dict_src.where(F.col("script_cbor").isNotNull()).select(
            "script_hash", F.col("script_cbor").alias("script")
        ).write.mode("overwrite").parquet(str(stage / "scripts"))

        # publish: rename staged tables into partition dirs, then commit via
        # the manifest rename — the batch is invisible until that instant
        for name in LOG_TABLES:
            dst = out / name / f"batch_seq={seq}"
            dst.parent.mkdir(parents=True, exist_ok=True)
            if dst.exists():  # leftover of a crashed, never-manifested attempt
                shutil.rmtree(dst)
            (stage / name).rename(dst)
        shutil.rmtree(stage, ignore_errors=True)

        entry = {"seq": seq, "batch_id": batch_id, "key": key}
        tmp = self._manifest_dir / f".tmp-{seq}"
        tmp.write_text(json.dumps(entry))
        tmp.rename(self._manifest_dir / f"{seq:012d}.json")
        self._committed().append(entry)  # keep the cache current post-commit
        self._commit_seq(seq)

    # ---- rollback (M1/M5): retraction-as-data ---------------------------

    def append_rollback(self, slot: int) -> None:
        seq = self._next_seq()
        rb = Path(self.out_dir) / "rollbacks.jsonl"
        with rb.open("a") as f:
            f.write(json.dumps({"batch_seq": seq, "slot": slot, "ts": time.time()}) + "\n")
        self._commit_seq(seq)

    def _rollbacks(self) -> list[dict]:
        rb = Path(self.out_dir) / "rollbacks.jsonl"
        if not rb.exists():
            return []
        return [json.loads(line) for line in rb.read_text().splitlines() if line]

    # ---- resolve: replay logs into a queryable Index --------------------

    def _alive(self, df: DataFrame, slot_col: str) -> DataFrame:
        for r in self._rollbacks():
            df = df.where(
                ~((F.col("batch_seq") <= r["batch_seq"]) & (F.col(slot_col) > r["slot"]))
            )
        return df

    def _base_db(self):
        from kupo_spark.operators.table_index import IndexDB

        return IndexDB(f"{self.out_dir}/base_db")

    def _base_seq(self) -> int | None:
        db = self._base_db()
        if db.latest_version() < 0:
            return None
        return db.entry()["seq"]

    def _produced_and_spends(self, spark: SparkSession) -> tuple[DataFrame, DataFrame]:
        """Log rows newer than the compacted base, layered on the base's
        resolved rows (re-split into produced/spends so one resolution path
        serves both).  Base rows carry batch_seq = base_seq: rollbacks
        recorded before the compact can't touch them (already applied),
        newer rollbacks apply normally."""
        produced = self._read_log(spark, "produced")
        spends = self._read_log(spark, "spends")
        base_seq = self._base_seq()
        if base_seq is None:
            return produced, spends
        produced = produced.where(F.col("batch_seq") > base_seq)
        spends = spends.where(F.col("batch_seq") > base_seq)
        # drop write-time materialized columns: created_bucket (layout) and
        # the denormalized J1/J2 header hashes — keeping the hashes here
        # would make the re-unioned log rows carry NULLs for them and fool
        # fold_inputs into skipping the checkpoint joins; they are resolved
        # again at the next write/serve
        base = self._base_db().read(spark).inputs.drop(
            "created_bucket", "created_header_hash", "spent_header_hash"
        )
        seq = F.lit(base_seq).alias("batch_seq")
        spend_cols = ["spent_at", "spent_by", "spent_input_index", "spent_with"]
        base_produced = base.drop(*spend_cols).select("*", seq)
        base_spends = (
            base.where(F.col("spent_at").isNotNull())
            .select(
                F.col("output_reference").alias("spent_ref"),
                *spend_cols,
                seq,
            )
        )
        return (
            base_produced.unionByName(produced, allowMissingColumns=True),
            base_spends.unionByName(spends),
        )

    def resolved_index(self, spark: SparkSession) -> Index:
        produced_log, spends_log = self._produced_and_spends(spark)
        produced = self._alive(produced_log, "created_at")
        # latest surviving version per output (post-rollback re-index wins)
        w = Window.partitionBy("output_reference").orderBy(F.col("batch_seq").desc())
        produced = (
            produced.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1)
            .drop("_rn", "batch_seq")
        )
        spends = self._alive(spends_log, "spent_at")
        ws = Window.partitionBy("spent_ref").orderBy(F.col("batch_seq").desc())
        spends = (
            spends.withColumn("_rn", F.row_number().over(ws))
            .where(F.col("_rn") == 1)
            .drop("_rn", "batch_seq")
        )
        inputs = produced.join(
            spends, produced.output_reference == spends.spent_ref, "left"
        ).drop("spent_ref")

        checkpoints = (
            self._alive(self._read_log(spark, "checkpoints"), "slot_no")
            .dropDuplicates(["slot_no"])
            .drop("batch_seq")
        )
        binary_data = (
            self._read_log(spark, "binary_data")
            .dropDuplicates(["binary_data_hash"])
            .drop("batch_seq")
        )
        scripts = (
            self._read_log(spark, "scripts")
            .dropDuplicates(["script_hash"])
            .drop("batch_seq")
        )
        policies = (
            produced.select("output_reference", F.explode(F.map_keys("assets")).alias("policy_id"))
            .dropDuplicates(["output_reference", "policy_id"])
        )
        assets = (
            produced.select("output_reference", F.explode("assets").alias("policy_id", "amap"))
            .select("output_reference", "policy_id", F.explode("amap").alias("asset_name", "quantity"))
        )
        return Index(
            inputs=inputs,
            checkpoints=checkpoints,
            policies=policies,
            assets=assets,
            binary_data=binary_data,
            scripts=scripts,
        )

    def compact(
        self, spark: SparkSession, dest: str | None = None, slot_bucket: int = 1000
    ):
        """Materialize the resolved logs as a queryable index (gardener M6 /
        Delta OPTIMIZE analog).

        With ``dest=None`` the compact is **in-place incremental**: the
        resolved state is committed through an ``IndexDB`` at
        ``{out_dir}/base_db`` — one atomic catalog publish pinning all six
        table versions (the round-2 rmtree+rename crash window is gone:
        readers see the old base until the instant the entry lands, and a
        crash mid-compact leaves the old base intact).  The catalog entry
        records the fold point ``seq``; subsequent ``resolved_index()``
        reads base + only newer log rows, so replay cost stays bounded
        while ingest keeps appending.  Old bases remain time-travelable
        (``IndexDB.read(spark, db_version=...)``) until
        ``IndexDB.vacuum``.  With an explicit ``dest`` it is an export."""
        from kupo_spark.operators.indexer import write_index

        resolved = self.resolved_index(spark)
        if dest is None:
            base_seq = int(self._seq_file.read_text()) if self._seq_file.exists() else -1
            db = self._base_db()
            db.commit(resolved, slot_bucket=slot_bucket, extra={"seq": base_seq})
            return db.read(spark)
        write_index(resolved, dest, slot_bucket=slot_bucket)
        return resolved

    # ---- stream wiring --------------------------------------------------

    def start(
        self,
        blocks_stream: DataFrame,
        checkpoint_dir: str,
        available_now: bool = True,
    ):
        """Attach to a streaming blocks DataFrame.  availableNow mirrors
        kupo's --until/serve-only mode (App.hs:580-592); continuous triggers
        mirror the live chain-sync loop."""
        # The stream checkpoint dir scopes batch-id dedup: a failure replay
        # inside THIS query re-delivers the same (scope, batch_id) and is
        # skipped, while an intentional re-run with a fresh checkpoint dir
        # (kupo's reconnect-and-replay after rollback) reprocesses.
        def body(df: DataFrame, batch_id: int) -> None:
            self.process_batch(df, batch_id, dedup_scope=checkpoint_dir)

        writer = (
            blocks_stream.writeStream.foreachBatch(body)
            .option("checkpointLocation", checkpoint_dir)
            .outputMode("update")
        )
        if available_now:
            writer = writer.trigger(availableNow=True)
        return writer.start()


def start_or_resume(
    indexer: StreamingIndexer, spark: SparkSession, since: int | None = None
) -> int:
    """``startOrResume`` (reference ``src/Kupo/App/Configuration.hs:182-241``):
    pick the point to (re)start indexing from.

    - fresh index + ``since`` → start at `since`;
    - existing index → resume at the max stored checkpoint; a ``since``
      MORE RECENT than that checkpoint is an error
      (``Configuration.hs:203-211``), while an older/equal ``since`` —
      e.g. re-running the original launch command — resumes normally;
    - fresh index + no ``since`` → error (the reference demands an explicit
      starting point).
    """
    has_data = bool(indexer._committed())
    if not has_data:
        if since is None:
            raise ValueError("no previous checkpoints: --since required on first start")
        return since
    from pyspark.sql import functions as FF

    tip = (
        indexer._read_log(spark, "checkpoints")
        .agg(FF.max("slot_no"))
        .collect()[0][0]
    )
    if since is not None and since > tip:
        # errConflictingSinceOptions: only a --since NEWER than the most
        # recent checkpoint conflicts (Configuration.hs:203-211)
        raise ValueError(
            f"--since {since} is more recent than the most recent "
            f"checkpoint {tip}; remove --since or erase the index"
        )
    return tip


def stream_blocks_from_events_dir(spark: SparkSession, events_dir: str, max_files_per_trigger: int = 1) -> DataFrame:
    """File-source stream of events → blocks (the chain-sync producer S1/S2
    analog: an ordered stream of decoded blocks)."""
    from kupo_spark.chaingen import blocks_from_events

    ev = (
        spark.readStream.schema("event_id BIGINT, user_id BIGINT")
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(events_dir)
    )
    return blocks_from_events(ev)
