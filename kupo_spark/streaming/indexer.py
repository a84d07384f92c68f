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

**Exactly-once commits — ONE storage layer.**  Every log table is a
:class:`kupo_spark.table.Table` (the repo's ACID parquet format), and a
micro-batch is five blind ``Table.append``s followed by ONE
:class:`kupo_spark.operators.table_index.Catalog` entry that pins the five
resulting table versions — the Spark-native analog of kupo's per-batch
SQLite transaction (``SQLite.hs:1112-1128``).  That single exclusive file
creation is the commit point for the whole batch:

  * readers resolve the newest catalog entry and read every table AT its
    pinned version — appends landed after the pin (including those of a
    writer that crashed before publishing) are invisible by construction,
    no read-path visibility filter at all;
  * the next ``process_batch`` repairs crash residue first: any
    ``batch_seq`` present in a table's current snapshot but absent from
    the catalog is retracted with a remove-only table commit, then the
    seq is safely reused;
  * a replayed ``foreachBatch`` delivery (same stream checkpoint + same
    batch_id) finds its dedup key already cataloged and returns without
    writing, so the log — not merely the resolved view — is exactly-once;
  * a rollback (M1) is itself a catalog entry ``{"rollback": {...}}`` —
    the catalog is the single durable record of the stream's history.
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from kupo_spark.operators.indexer import Index, exploded_outputs, spent_refs
from kupo_spark.operators.table_index import Catalog
from kupo_spark.patterns import any_to_column, pattern_from_text
from kupo_spark.table import Table, WriterLock

LOG_TABLES = ("produced", "spends", "checkpoints", "binary_data", "scripts")


class StreamingIndexer:
    def __init__(self, out_dir: str, patterns=("*",)):
        import threading

        self.out_dir = out_dir
        self.patterns = [
            pattern_from_text(p) if isinstance(p, str) else p for p in patterns
        ]
        # serializes multi-commit writers: the follow stream's micro-batch
        # body vs an HTTP PUT /patterns (rollback + backfill must not
        # interleave with a concurrent batch — the reference serializes
        # both through the consumer's mailbox, App.hs:311-346).  Re-entrant
        # so put_patterns' own process_batch nests under it.
        self.write_lock = threading.RLock()
        Path(out_dir).mkdir(parents=True, exist_ok=True)
        # cross-PROCESS single-writer enforcement (kupo holds an exclusive
        # SQLite writer lock for the process lifetime, SQLite.hs:355-384):
        # acquired lazily at the first write so read-only constructions
        # (--read-only, copy, resolved_index) never contend; its fencing
        # token is re-checked before every catalog publish
        self._writer_lock = WriterLock(Path(out_dir) / "_writer.lock")
        self._catalog = Catalog(Path(out_dir) / "_catalog")
        self._entries_cache: list[dict] | None = None
        # resume path: a persisted pattern store (written by put_patterns)
        # is authoritative over the constructor argument — the reference
        # reloads its patterns table on restart (Configuration.hs)
        persisted = self.pattern_store().list()
        if persisted:
            self.patterns = persisted

    # ---- sequencing + commit log ----------------------------------------

    def _entries(self) -> list[dict]:
        """All catalog entries (batch commits + rollbacks), oldest first.
        Scanned once per indexer (startup recovery) and appended to on every
        publish — without the cache each micro-batch re-reads every entry
        and commit-log overhead grows O(n²) over the stream's lifetime."""
        if self._entries_cache is None:
            self._entries_cache = self._catalog.entries()
        return self._entries_cache

    def _ensure_writer(self) -> None:
        """Acquire (or re-validate) the cross-process writer lock.  A live
        second writer on the same workdir fails HERE, loudly, before any
        table or catalog mutation; a dead holder's lock is broken with a
        bumped fencing token (its stale process, were it merely stalled,
        halts at its next ``check``)."""
        if self._writer_lock.nonce is None:
            self._writer_lock.acquire()
        else:
            self._writer_lock.check()

    def release_writer(self) -> None:
        """Release the workdir writer lock (clean shutdown)."""
        self._writer_lock.release()

    def _publish(self, entry: dict) -> None:
        # acquire-or-fence: a first-time writer acquires here (compact /
        # truncate_log publish without going through process_batch); a
        # holder re-validates its fencing token — an expropriated writer
        # (its lock was broken by a newer owner after a wrong liveness
        # verdict) halts before interleaving a catalog entry with the new
        # owner's
        self._ensure_writer()
        self._catalog.publish(entry)
        self._entries().append(entry)

    def _committed(self) -> list[dict]:
        """Batch-commit entries only, oldest first."""
        return [e for e in self._entries() if "seq" in e]

    def _rollbacks(self) -> list[dict]:
        return [e["rollback"] for e in self._entries() if "rollback" in e]

    def _deletes(self) -> list[dict]:
        return [e["delete"] for e in self._entries() if "delete" in e]

    def _next_seq(self) -> int:
        last = -1
        for m in self._committed():
            last = max(last, m["seq"])
        for r in self._rollbacks():
            last = max(last, r["batch_seq"])
        for d in self._deletes():
            last = max(last, d["batch_seq"])
        return last + 1

    def _pinned_versions(self) -> dict[str, int]:
        """Per-table versions pinned by the newest batch commit."""
        for e in reversed(self._entries()):
            if "tables" in e:
                return e["tables"]
        return {}

    def _table(self, name: str) -> Table:
        return Table(f"{self.out_dir}/{name}")

    def _uncommitted_seqs(self) -> list[int]:
        """batch_seq values present in some table's CURRENT snapshot but
        absent from the catalog — the residue of a crash between the table
        appends and the catalog publish.  Invisible to readers (they read
        at pinned versions, recorded before the residue landed); retracted
        by the next ``process_batch`` before it reuses the seq."""
        committed = {m["seq"] for m in self._committed()}
        present: set[int] = set()
        for name in LOG_TABLES:
            if not Table.exists(f"{self.out_dir}/{name}"):
                continue
            for a in self._table(name).snapshot().files:
                sv = a.get("partitionValues", {}).get("batch_seq")
                if sv is not None:
                    present.add(int(sv))
        return sorted(present - committed)

    def _repair_crash_residue(self) -> None:
        """Retract orphan appends (remove-only commits, files kept for the
        log's history) so the upcoming append can reuse their seq without
        double-counting rows."""
        orphans = set(self._uncommitted_seqs())
        if not orphans:
            return
        for name in LOG_TABLES:
            if not Table.exists(f"{self.out_dir}/{name}"):
                continue
            t = self._table(name)
            stale = [
                a["path"]
                for a in t.snapshot().files
                if int(a.get("partitionValues", {}).get("batch_seq", -1)) in orphans
            ]
            if stale:
                t.remove_paths(stale, operation="ABORT-RECOVERY")

    def _read_log(self, spark: SparkSession, name: str) -> DataFrame:
        """Read one log table at the catalog-pinned version: `batch_seq`
        is a partition column; nothing newer than the pin (crash residue,
        in-flight appends) can appear in the scan."""
        pins = self._pinned_versions()
        if name not in pins:
            raise FileNotFoundError(f"no committed batches for table {name}")
        return self._table(name).read(spark, version=pins[name])

    # ---- the foreachBatch body (rollForwardAll, App.hs:512-577) ---------

    def _append_batch_tables(self, blocks: DataFrame, seq: int) -> dict[str, int]:
        """Stage one micro-batch: append the five log frames (tagged with
        ``batch_seq``) to their Tables; returns the per-table versions for
        the catalog entry.  NOT visible to readers until that entry lands."""
        outs = exploded_outputs(blocks)
        produced = outs.where(any_to_column(self.patterns, at_ingest=True)).drop(
            "metadata_tags"
        )
        spends = spent_refs(blocks)
        checkpoints = blocks.select("slot_no", "header_hash").dropDuplicates(
            ["slot_no"]
        )
        # W3 dictionaries (gate: only blocks with >= 1 match, App.hs:530-542).
        # The broadcast is safe HERE (unlike the batch indexer's gate):
        # matched_slots is bounded by one micro-batch's slots, not the chain.
        dict_src = outs
        if not any(getattr(p, "include_bootstrap", False) for p in self.patterns):
            matched_slots = produced.select("created_at").dropDuplicates(["created_at"])
            dict_src = outs.join(
                F.broadcast(matched_slots), outs.created_at == matched_slots.created_at, "left_semi"
            )
        binary_data = dict_src.where(F.col("datum_cbor").isNotNull()).select(
            F.col("datum_hash").alias("binary_data_hash"),
            F.col("datum_cbor").alias("binary_data"),
        )
        scripts = dict_src.where(F.col("script_cbor").isNotNull()).select(
            "script_hash", F.col("script_cbor").alias("script")
        )
        frames = {
            "produced": produced,
            "spends": spends,
            "checkpoints": checkpoints,
            "binary_data": binary_data,
            "scripts": scripts,
        }
        # the five appends are independent (separate Tables, separate logs;
        # batch visibility is the ONE catalog publish after all five land),
        # so their write jobs overlap from a thread pool instead of
        # serializing five scheduler floors per micro-batch (r11, guide
        # §2.6 — same discipline as write_index's side tables).  Creation
        # stays serial (cheap, and keeps the error path simple); a crash
        # mid-pool leaves un-cataloged appends exactly as the serial loop
        # did, repaired by _repair_crash_residue.
        from concurrent.futures import ThreadPoolExecutor

        tagged: dict[str, DataFrame] = {}
        for name in LOG_TABLES:
            df = frames[name].withColumn("batch_seq", F.lit(seq).cast("long"))
            path = f"{self.out_dir}/{name}"
            if not Table.exists(path):
                Table.create(path, df.schema, partition_by=["batch_seq"])
            tagged[name] = df
        with ThreadPoolExecutor(len(LOG_TABLES)) as ex:
            results = ex.map(
                lambda name: (name, self._table(name).append(tagged[name])),
                LOG_TABLES,
            )
            versions = dict(results)
        return versions

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
        self._ensure_writer()
        self._repair_crash_residue()
        seq = self._next_seq()
        versions = self._append_batch_tables(blocks, seq)
        self._publish(
            {"seq": seq, "batch_id": batch_id, "key": key, "tables": versions}
        )

    # ---- rollback (M1/M5): retraction-as-data ---------------------------

    def append_rollback(self, slot: int) -> None:
        import time

        self._ensure_writer()
        seq = self._next_seq()
        self._publish(
            {"rollback": {"batch_seq": seq, "slot": slot, "ts": time.time()}}
        )

    def append_delete(self, pattern) -> int:
        """W6 ``DELETE /matches/{pattern}`` as retraction-as-data (the same
        M1 shape as :meth:`append_rollback`): a produced row written at
        ``batch_seq <= seq`` matching the pattern is dead in every resolve
        from now on — which is exactly what makes the operation survive
        batch swaps, compaction (the delete folds into the base), and
        restarts.  The reference supports this during live operation
        (``Http.hs:686-704``); the overlap guard (P13) is the CALLER's job,
        as in the batch path.  Returns the record's batch_seq."""
        import time

        from kupo_spark.patterns import pattern_to_text

        p = pattern_from_text(pattern) if isinstance(pattern, str) else pattern
        self._ensure_writer()
        seq = self._next_seq()
        self._publish(
            {
                "delete": {
                    "batch_seq": seq,
                    "pattern": pattern_to_text(p),
                    "ts": time.time(),
                }
            }
        )
        return seq

    # ---- PUT /patterns (M5): rollback + install + backfill --------------

    def pattern_store(self):
        from kupo_spark.operators.pattern_store import PatternStore

        return PatternStore(f"{self.out_dir}/patterns.txt")

    def put_patterns(
        self,
        spark: SparkSession,
        patterns,
        rollback_slot: int,
        replay_blocks: DataFrame,
        longest_rollback: int | None = None,
    ) -> list:
        """``PUT /patterns`` end-to-end (``Http.hs:843-916`` +
        ``App.hs:311-346``): validate the requested rollback point against
        the safe zone, retract the index suffix (M1), install the new
        patterns in the :class:`PatternStore`, and backfill forward from
        the point with the ENLARGED pattern set.

        Validation mirrors the reference:

        * the point must be a known checkpoint (``getCheckpoint Strict`` —
          an unknown point is a client error);
        * the point must not be deeper than ``longestRollback`` below the
          current tip (``Http.hs:866-872``) — beyond that the chain source
          cannot replay, so the request is rejected, not partially applied.

        ``replay_blocks`` is the chain-sync replay source (in production
        the reconnected node/Ogmios stream; in tests the blocks frame);
        only slots ``> rollback_slot`` are re-indexed.  Matches of the new
        patterns BEFORE the point are intentionally absent — exactly the
        reference's contract, which is why the point is client-chosen.

        Returns the new active pattern list."""
        from kupo_spark.chainspec import LONGEST_ROLLBACK

        k = LONGEST_ROLLBACK if longest_rollback is None else longest_rollback
        with self.write_lock:
            # _layered, not _read_log: a checkpoint folded into the base by
            # compact+truncate is still a valid rollback target
            cps = self._alive(self._layered(spark, "checkpoints"), "slot_no")
            row = cps.agg(
                F.max("slot_no").alias("tip"),
                F.max(F.when(F.col("slot_no") == rollback_slot, 1)).alias("hit"),
            ).collect()[0]
            tip = row["tip"]
            if tip is None or row["hit"] is None:
                raise ValueError(
                    f"rollback point {rollback_slot} is not a known checkpoint"
                )
            if tip - rollback_slot > k:
                raise ValueError(
                    f"rollback point {rollback_slot} is beyond the safe zone: "
                    f"tip {tip} - k {k} (Http.hs:866-872)"
                )
            store = self.pattern_store()
            if not store.list():  # seed with the currently active set
                for p in self.patterns:
                    store.add(p)
            self.append_rollback(rollback_slot)
            new_list = (
                [patterns] if not isinstance(patterns, (list, tuple)) else list(patterns)
            )
            for p in new_list:
                store.add(pattern_from_text(p) if isinstance(p, str) else p)
            self.patterns = store.list()
            backfill = replay_blocks.where(F.col("slot_no") > rollback_slot)
            self.process_batch(backfill, 0)
            return self.patterns

    # ---- resolve: replay logs into a queryable Index --------------------

    def _alive(self, df: DataFrame, slot_col: str) -> DataFrame:
        for r in self._rollbacks():
            df = df.where(
                ~((F.col("batch_seq") <= r["batch_seq"]) & (F.col(slot_col) > r["slot"]))
            )
        return df

    def _apply_deletes(self, produced: DataFrame) -> DataFrame:
        """W6 delete records: kill produced rows written at or before the
        record that match its pattern.  A LATER re-produce of the same
        output (post-rollback re-index, or fresh chain activity) survives —
        the delete is a one-time purge, exactly the reference's semantics
        (re-accumulation is prevented by the P13 guard refusing deletes
        that overlap still-active patterns, not by the record).  Pre-compact
        deletes are already folded into the base (base rows carry
        ``batch_seq = base_seq`` > the record's seq, so the predicate
        skips them — same convention as rollbacks)."""
        from kupo_spark.patterns import to_column

        for d in self._deletes():
            p = pattern_from_text(d["pattern"])
            df_dead = (F.col("batch_seq") <= d["batch_seq"]) & to_column(p)
            produced = produced.where(~df_dead)
        return produced

    def _base_db(self):
        from kupo_spark.operators.table_index import IndexDB

        return IndexDB(f"{self.out_dir}/base_db")

    def log_current(self) -> bool:
        """True iff the compacted base already reflects the full log — no
        data batch or rollback landed after it (pin-only truncate entries
        don't count).  The O(1)-restart fast path: serve the base directly
        instead of re-compacting."""
        base_seq = self._base_seq()
        if base_seq is None:
            return False
        for e in self._entries():
            if "rollback" in e and e["rollback"]["batch_seq"] > base_seq:
                return False
            if "delete" in e and e["delete"]["batch_seq"] > base_seq:
                return False
            if "seq" in e and e["seq"] > base_seq and not e.get("truncate"):
                return False
        return True

    def _base_seq(self) -> int | None:
        db = self._base_db()
        if db.latest_version() < 0:
            return None
        return db.entry()["seq"]

    def _layered(self, spark: SparkSession, name: str) -> DataFrame:
        """Base-layered view of one side-log table (bounded replay): the
        compacted base's rows tagged ``batch_seq = base_seq`` + log rows
        strictly newer.  Rollbacks recorded before the compact are already
        applied inside the base; newer ones still apply to base rows (they
        carry ``base_seq``).  This also makes a GC'd compact effective:
        ``prune_binary_data`` applied at compact time stays pruned in every
        subsequent resolve (only post-compact log rows can re-add a hash)."""
        log = self._read_log(spark, name)
        base_seq = self._base_seq()
        if base_seq is None:
            return log
        base = getattr(self._base_db().read(spark), name).select(
            "*", F.lit(base_seq).cast("long").alias("batch_seq")
        )
        return base.unionByName(
            log.where(F.col("batch_seq") > base_seq), allowMissingColumns=True
        )

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
        produced = self._apply_deletes(self._alive(produced_log, "created_at"))
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
            self._alive(self._layered(spark, "checkpoints"), "slot_no")
            .dropDuplicates(["slot_no"])
            .drop("batch_seq")
        )
        binary_data = (
            self._layered(spark, "binary_data")
            .dropDuplicates(["binary_data_hash"])
            .drop("batch_seq")
        )
        scripts = (
            self._layered(spark, "scripts")
            .dropDuplicates(["script_hash"])
            .drop("batch_seq")
        )
        # no dedup pass (r11, same argument as build_index's W4): the
        # row_number window above leaves exactly ONE surviving row per
        # output_reference — across replays and rollback re-indexes — and
        # map keys are unique within one assets map, so the exploded pairs
        # are distinct by construction
        policies = produced.select(
            "output_reference", F.explode(F.map_keys("assets")).alias("policy_id")
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
        self,
        spark: SparkSession,
        dest: str | None = None,
        slot_bucket: int = 1000,
        transform=None,
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
        ``IndexDB.vacuum``.  With an explicit ``dest`` it is an export.

        ``transform`` (optional Index → Index) is applied to the resolved
        state before it is committed — the gardener's GC (M2/M3) folds into
        the compaction pass this way, so a follow-mode deployment never
        needs a second in-memory pruned copy."""
        from kupo_spark.operators.indexer import write_index

        if dest is None:
            # the in-place fold must be atomic against concurrent batch
            # commits: the fold point is read FIRST and the resolve pins
            # its table versions under the same lock, so a batch can never
            # land between them — it would be recorded as folded while
            # absent from the base (then physically dropped by
            # truncate_log).  Single-writer-process is the contract (the
            # reference is single-writer through its mailbox too); the
            # lock enforces it in-process.
            with self.write_lock:
                base_seq = self._next_seq() - 1
                resolved = self.resolved_index(spark)
                if transform is not None:
                    resolved = transform(resolved)
                db = self._base_db()
                db.commit(resolved, slot_bucket=slot_bucket, extra={"seq": base_seq})
                return db.read(spark)
        resolved = self.resolved_index(spark)
        if transform is not None:
            resolved = transform(resolved)
        write_index(resolved, dest, slot_bucket=slot_bucket)
        return resolved

    def truncate_log(self, vacuum_retention: float | None = None) -> dict[str, int]:
        """Drop log partitions already folded into the compacted base
        (``batch_seq <= base_seq``) — ``_layered`` resolves them from the
        base, so they are dead weight in every subsequent scan.  This is
        what keeps a long-lived follow deployment's storage bounded by the
        compaction horizon instead of the stream's lifetime (the analog of
        Delta log checkpoint + VACUUM over the commit history).

        Publishes one catalog entry pinning the truncated table versions
        (readers see old pins until it lands — crash-safe).  With
        ``vacuum_retention`` set, also physically deletes files no longer
        referenced and older than the retention window.  Returns the number
        of removed files per table."""
        removed: dict[str, int] = {}
        with self.write_lock:
            base_seq = self._base_seq()
            if base_seq is None:
                return removed
            self._repair_crash_residue()
            versions = dict(self._pinned_versions())
            for name in LOG_TABLES:
                t = self._table(name)
                dead = [
                    a["path"]
                    for a in t.snapshot().files
                    if a.get("partitionValues", {}).get("batch_seq") is not None
                    and int(a["partitionValues"]["batch_seq"]) <= base_seq
                ]
                if dead:
                    versions[name] = t.remove_paths(dead, operation="TRUNCATE")
                removed[name] = len(dead)
            if any(removed.values()):
                # "truncate" marks a pin-only entry: no new data rows, so
                # restart fast-path checks (_log_current) must not count it
                # as un-folded log content
                self._publish(
                    {
                        "seq": self._next_seq(),
                        "key": None,
                        "tables": versions,
                        "truncate": True,
                    }
                )
            if vacuum_retention is not None:
                # only after the new pins are published: physical deletion
                # must never race a reader resolving the OLD pinned versions
                # (the retention window covers in-flight lazy readers, as in
                # Delta's VACUUM contract)
                for name in LOG_TABLES:
                    self._table(name).vacuum(retention_seconds=vacuum_retention)
        return removed

    def vacuum_logs(self, retention_seconds: float) -> None:
        """Physically delete log files no longer referenced by any live
        snapshot.  Callers choose the safety rule: a deployment that defers
        this one full compaction cycle after ``truncate_log`` can pass 0
        (everything unreferenced then has been unreferenced a whole cycle);
        otherwise pass a window covering in-flight readers."""
        with self.write_lock:
            for name in LOG_TABLES:
                if Table.exists(f"{self.out_dir}/{name}"):
                    self._table(name).vacuum(retention_seconds=retention_seconds)

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
            # serialize against HTTP mutations (PUT /patterns rollback +
            # backfill, DELETE /matches) — both compute _next_seq() and an
            # interleaved batch would share a sequence number with the
            # mutation's retraction record, corrupting _alive's resolution.
            # Re-entrant, so callers that already hold the lock still nest.
            with self.write_lock:
                self.process_batch(df, batch_id, dedup_scope=checkpoint_dir)

        writer = (
            blocks_stream.writeStream.foreachBatch(body)
            .option("checkpointLocation", checkpoint_dir)
            .outputMode("update")
        )
        if available_now:
            writer = writer.trigger(availableNow=True)
        return writer.start()


def resume_bound(
    indexer: StreamingIndexer, spark: SparkSession, since: int | None = None
) -> tuple[int, bool]:
    """``startOrResume`` (reference ``src/Kupo/App/Configuration.hs:182-241``):
    pick the point to (re)start indexing from, plus whether the bound is
    INCLUSIVE (a fresh start syncs FROM the point; a resume re-enters
    strictly AFTER the stored tip).

    - fresh index + ``since`` → ``(since, True)``;
    - existing index → ``(alive tip, False)``; a ``since`` MORE RECENT
      than that checkpoint is an error (``Configuration.hs:203-211``),
      while an older/equal ``since`` — e.g. re-running the original
      launch command — resumes normally;
    - existing index whose checkpoints are ALL retracted → effectively
      fresh: ``(since or 0, True)`` — the inclusivity matters, a
      re-forwarded block at exactly ``since`` must be indexed;
    - fresh index + no ``since`` → error (the reference demands an
      explicit starting point)."""
    has_data = bool(indexer._committed())
    if not has_data:
        if since is None:
            raise ValueError("no previous checkpoints: --since required on first start")
        return since, True
    from pyspark.sql import functions as FF

    # rollback-aware: the raw checkpoints log still carries retracted rows
    # (retraction-as-data) — resuming from a rolled-back (dead) tip would
    # silently discard every post-fork block below it.  _layered, not
    # _read_log: after compact+truncate the old checkpoints live in the base
    tip = (
        indexer._alive(indexer._layered(spark, "checkpoints"), "slot_no")
        .agg(FF.max("slot_no"))
        .collect()[0][0]
    )
    if tip is None:
        # everything retracted: start over from `since` (or origin)
        return (since if since is not None else 0), True
    if since is not None and since > tip:
        # errConflictingSinceOptions: only a --since NEWER than the most
        # recent checkpoint conflicts (Configuration.hs:203-211)
        raise ValueError(
            f"--since {since} is more recent than the most recent "
            f"checkpoint {tip}; remove --since or erase the index"
        )
    return tip, False


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
