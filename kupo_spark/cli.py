"""kupo-spark command line — the reference binary's surface, Spark-backed.

Mirrors the reference's command set (``src/Kupo/Options.hs:109-113``)::

    python -m kupo_spark [run] --events DIR --workdir DIR --since POINT \
        [--match PATTERN]... [--until POINT] [--prune-utxo] \
        [--longest-rollback SLOTS] [--defer-db-indexes] \
        [--gc-interval SECONDS] [--read-only] \
        [--in-memory] [--host IPv4] [--port TCP/PORT]
    python -m kupo_spark copy --from DIR --into DIR [--match PATTERN]...
    python -m kupo_spark health-check [--host IPv4] [--port TCP/PORT]
    python -m kupo_spark version

Flag-for-flag with the reference (``Options.hs:180-420``) except the
chain-producer transports: the sandbox has no network, so ``--node-socket``
/ ``--ogmios-host`` / ``--hydra-host`` become file replay sources —
``--events`` (parquet event stream, the node-socket stand-in),
``--ogmios-file`` (Ogmios nextBlock NDJSON), ``--hydra-file`` (Hydra
ServerOutput NDJSON).  Semantics preserved:

- ``--since`` is mandatory on first start, optional (validated) after —
  ``startOrResume``, ``Configuration.hs:182-241``;
- ``--until`` bounds the sync for point-in-time snapshots;
- repeated ``--match`` is a logical disjunction;
- ``--prune-utxo`` removes spent inputs instead of marking them;
- ``--longest-rollback`` overrides the security parameter k
  (``Options.hs:149``): the M4 prune horizon, the gardener's GC depth,
  and how far PUT /patterns may rewind;
- ``--defer-db-indexes`` skips the post-sync compaction/layout pass (the
  "install indexes on next start" trade, ``Options.hs:353-361``): the
  next non-deferred start compacts;
- ``--gc-interval`` runs the gardener loop (M2+M3, ``App.hs:633-674``)
  in the background while serving;
- ``--read-only`` serves an existing workdir and refuses mutations
  (``Options.hs:363-370``);
- ``--in-memory`` builds the index without a durable workdir;
- ``--follow`` is the reference's continuous operation (producer +
  consumer + gardener + HTTP server concurrently, ``src/Kupo.hs:
  259-317``): the events directory is watched for new files, each
  micro-batch commits through the ACID log and swaps the served index.
"""

from __future__ import annotations

import argparse
import json
import sys
import threading
import time
import urllib.error
import urllib.request

__all__ = ["main", "build_parser", "parse_since", "parse_until"]

VERSION = "kupo-spark 0.4.0"


# ---- point parsing -------------------------------------------------------


def parse_since(text: str | None):
    """``--since``: 'origin' | 'tip' | SLOT | SLOT.HEADERHASH
    (Options.hs:296-316).  Returns None (absent), the sentinel 'tip', or
    (slot, header_hash|None)."""
    if text is None:
        return None
    if text == "tip":
        return "tip"
    if text == "origin":
        return (0, None)
    slot, dot, h = text.partition(".")
    if not slot.isdigit() or (dot and not h):
        raise SystemExit(f"invalid --since '{text}': expected origin, SLOT or SLOT.HASH")
    return (int(slot), h.lower() or None)


def parse_until(text: str | None):
    """``--until``: SLOT | SLOT.HEADERHASH (inclusive, Options.hs:319-329).
    Returns None (absent) or (slot, header_hash|None); a point's hash is
    asserted against the chain like ``--since``'s."""
    if text is None:
        return None
    slot, dot, h = text.partition(".")
    if not slot.isdigit() or (dot and not h):
        raise SystemExit(f"invalid --until '{text}': expected SLOT or SLOT.HASH")
    return (int(slot), h.lower() or None)


# ---- source selection ----------------------------------------------------


def _load_source(spark, args):
    """One of --events / --ogmios-file / --hydra-file → blocks DataFrame."""
    chosen = [o for o in ("events", "ogmios_file", "hydra_file") if getattr(args, o)]
    if len(chosen) != 1:
        raise SystemExit(
            "exactly one chain source required: --events, --ogmios-file or --hydra-file"
        )
    if args.events:
        import os

        from kupo_spark.chaingen import blocks_from_events, load_blocks

        base = args.events.rstrip("/").removesuffix("/events.parquet")
        if os.path.exists(f"{base}/events.parquet"):
            return load_blocks(spark, base)
        # a bare directory of event parquet files (the --follow layout)
        ev = spark.read.schema("event_id BIGINT, user_id BIGINT").parquet(base)
        return blocks_from_events(ev)
    if args.ogmios_file:
        import os

        from kupo_spark.sources.ogmios import canonical_blocks, read_ogmios_jsonl

        if os.path.isdir(args.ogmios_file):
            # a segment DIRECTORY (the --follow layout) may carry
            # RollBackward records: the batch view must net them out or a
            # replay (PUT /patterns backfill, batch sync) would resurrect
            # rolled-back blocks
            return canonical_blocks(spark, args.ogmios_file)
        return read_ogmios_jsonl(spark, args.ogmios_file)
    from kupo_spark.sources.hydra import read_hydra_jsonl

    return read_hydra_jsonl(spark, args.hydra_file)


# ---- run -----------------------------------------------------------------


def _assert_point(blocks, slot: int, header_hash: str) -> None:
    """SLOT.HASH points: the block at SLOT must carry HASH (the chain-sync
    intersection check)."""
    rows = blocks.where(blocks.slot_no == slot).select("header_hash").limit(1).collect()
    if not rows or rows[0][0] != header_hash:
        raise SystemExit(f"{slot}.{header_hash}: no such point on the chain")


def _resolve_patterns(cli: list[str], store_path: str | None) -> tuple[str, ...]:
    """``newPatternsCache`` (Configuration.hs:252-268): CLI patterns vs the
    workdir's persisted set — both empty errors, one empty defers to the
    other, both set and DIFFERENT errors ('use the HTTP API instead')."""
    import os

    from kupo_spark.operators.pattern_store import PatternStore
    from kupo_spark.patterns import pattern_from_text, pattern_to_text

    canon = sorted({pattern_to_text(pattern_from_text(p)) for p in cli})
    persisted: list[str] = []
    if store_path is not None and os.path.exists(store_path):
        persisted = sorted(pattern_to_text(p) for p in PatternStore(store_path).list())
    if not persisted and not canon:
        raise SystemExit(
            "no pattern defined: the indexer would index nothing — "
            "define matching patterns with --match"
        )
    if not canon:
        return tuple(persisted)
    if persisted and persisted != canon:
        raise SystemExit(
            "configuration patterns are different from previously known "
            "patterns; restarting with different --match options is not "
            "allowed — use the HTTP API (PUT /patterns) instead"
        )
    return tuple(canon)


def _gardener(
    server,
    interval: float,
    prune_utxo: bool,
    stop: threading.Event,
    longest_rollback: int | None = None,
):
    """Background gardener loop (App.hs:633-674): prune spent inputs past
    the safe zone (only under --prune-utxo) + orphan binary data."""
    from kupo_spark.chainspec import LONGEST_ROLLBACK
    from kupo_spark.operators.gardener import run_gc
    from kupo_spark.operators.maintenance import prune_binary_data

    k = LONGEST_ROLLBACK if longest_rollback is None else longest_rollback
    while not stop.wait(interval):
        # mutation lock, not the snapshot lock: the GC rebuild + the
        # swap's warm-before-publish take seconds, and readers must keep
        # serving the old snapshot throughout (they only touch _lock)
        with server._mutation_lock:
            nxt = run_gc(server.index, k) if prune_utxo else prune_binary_data(server.index)
            server._swap_index(nxt)


#: every way to name a chain source; exactly one may be given (the file
#: flags are also the REWRITE TARGETS of the socket transports, so the
#: exclusivity must be checked before any transport spools)
_SOURCE_FLAGS = (
    "events", "ogmios_file", "ogmios_ws", "node_socket", "hydra_file", "hydra_ws"
)


def _spool_transport(args, endpoint: str, spool_name: str, sync_fn, follow_fn):
    """Run a socket transport into an NDJSON segment spool and return the
    spool path (+ the follow loop's stop event, if any).

    Batch mode syncs to replay end before indexing; --follow starts the
    reconnecting loop (a dropped connection must not silently freeze the
    followed index — the serving close() sets the stop event) and waits
    for the first PUBLISHED segment so the file stream source has
    something to list.  Each transport gets its own spool directory name:
    the spooled document types differ, so a shared directory would feed
    one decoder another's documents on a workdir reuse."""
    import os
    import tempfile
    import time as _time

    spool = (
        f"{args.workdir}/{spool_name}"
        if args.workdir
        else tempfile.mkdtemp(prefix=f"kupo-{spool_name}-")
    )
    if args.follow:
        stop = threading.Event()
        threading.Thread(
            target=follow_fn, args=(endpoint, spool, stop), daemon=True
        ).start()
        for _ in range(100):
            # only published segments count — a dot-prefixed .tmp file is
            # mid-write and not yet visible to the stream source
            if os.path.isdir(spool) and any(
                not n.startswith(".") for n in os.listdir(spool)
            ):
                break
            _time.sleep(0.1)
        return spool, stop
    sync_fn(endpoint, spool)
    return spool, None


def cmd_run(args, serve_forever: bool = True):
    from kupo_spark.session import get_spark

    spark = get_spark("kupo-spark")

    if args.follow and (args.in_memory or args.read_only):
        raise SystemExit("--follow requires a writable --workdir (not --in-memory/--read-only)")
    chosen = [f for f in _SOURCE_FLAGS if getattr(args, f, None)]
    if len(chosen) > 1:
        raise SystemExit(
            "exactly one chain source required, got: "
            + ", ".join("--" + f.replace("_", "-") for f in chosen)
        )
    ws_stop = None  # --follow socket loop's stop event (server-owned)
    if getattr(args, "ogmios_ws", None):
        # WebSocket transport (the reference's actual Ogmios connection,
        # ChainSync/Ogmios.hs:48-75): the pipelined client spools nextBlock
        # responses into NDJSON segments, and everything downstream — batch
        # replay, --follow streaming, rollback netting — runs on the one
        # proven segment pipeline.  A restart intersects at the last
        # spooled block: the server answers RollBackward-to-intersection
        # then only the tail — no re-delivery of what the spool holds.
        from kupo_spark.sources.ws import follow_via_ws, last_spooled_point, sync_via_ws

        args.ogmios_file, ws_stop = _spool_transport(
            args, args.ogmios_ws, "ws-segments",
            lambda url, spool: sync_via_ws(url, spool, last_spooled_point(spool)),
            follow_via_ws,
        )

    if getattr(args, "node_socket", None):
        # node-to-client chain-sync over an AF_UNIX socket (the reference's
        # primary producer, ChainSync/Node.hs:50-167): mux-framed CBOR
        # messages, elastic pipelining, spooled into the same NDJSON
        # segment documents the Ogmios file pipeline consumes — transport
        # swaps, decode/fold/rollback semantics stay on the proven path.
        from kupo_spark.sources.node import follow_via_node_socket, sync_via_node_socket
        from kupo_spark.sources.ws import last_spooled_point

        args.ogmios_file, ws_stop = _spool_transport(
            args, args.node_socket, "node-segments",
            lambda path, spool: sync_via_node_socket(
                path, spool, points=last_spooled_point(spool)
            ),
            follow_via_node_socket,
        )

    if getattr(args, "hydra_ws", None):
        # Hydra's WS API is push-mode (ChainSync/Hydra.hs:56): spool the
        # ServerOutput stream into segments for the file pipeline
        from kupo_spark.sources.ws import follow_hydra_ws, sync_hydra_ws

        args.hydra_file, ws_stop = _spool_transport(
            args, args.hydra_ws, "hydra-segments", sync_hydra_ws, follow_hydra_ws
        )

    since = parse_since(args.since)
    until = parse_until(args.until)
    workdir_store = f"{args.workdir}/patterns.txt" if args.workdir else None
    patterns = _resolve_patterns(
        list(args.match), workdir_store if not args.in_memory else None
    )

    blocks = None if args.read_only else _load_source(spark, args)
    if blocks is not None and until is not None:
        if until[1] is not None and not args.follow:
            # follow mode defers instead: a point the bridge has not
            # delivered yet is validated in-stream on arrival (the
            # reference checks against the node's chain, not local files)
            _assert_point(blocks, *until)
        blocks = blocks.where(blocks.slot_no <= until[0])
    if since == "tip" and blocks is not None:
        # SinceTip: start at the producer's current tip (S5 FetchTip,
        # App.hs:444-469) — for a replay source, its final block; the tip
        # block itself is indexed so the resume point is established
        row = blocks.agg({"slot_no": "max"}).collect()[0]
        since = (int(row[0] or 0), None)

    def _fresh_blocks():
        # a live replay must re-list the source directory: the startup
        # DataFrame's file listing is frozen at creation, so a PUT
        # /patterns backfill (or metadata lookup) through it would
        # silently miss every segment delivered after startup.  The
        # --until bound is re-applied — the re-listed source must honor
        # the same snapshot ceiling as ingest.
        b = _load_source(spark, args)
        if until is not None:
            b = b.where(b.slot_no <= until[0])
        return b

    store_path = None
    indexer = None
    holder: dict = {}  # --follow: late-bound server + stream query

    if args.read_only:
        # the replica only reads: --since is irrelevant, patterns come
        # from the master's persisted store (already resolved above)
        if not args.workdir:
            raise SystemExit("--read-only requires --workdir")
        from kupo_spark.streaming.indexer import StreamingIndexer

        indexer = StreamingIndexer(args.workdir, patterns=patterns)
        index = indexer.resolved_index(spark)
        store_path = workdir_store
    elif args.in_memory:
        if since is None:
            raise SystemExit("--since is mandatory on first start")
        if since[1] is not None:
            _assert_point(blocks, *since)
        from kupo_spark.operators.indexer import build_index

        bounded = blocks.where(blocks.slot_no >= since[0])
        index = build_index(
            bounded, patterns=patterns, prune_utxo=args.prune_utxo, cache=True,
            longest_rollback=args.longest_rollback,
        )
        index.inputs.count()  # materialize (kupo syncs before serving)
    elif args.follow:
        # continuous mode — the reference's normal operation: producer +
        # consumer run concurrently with the HTTP server (concurrently4,
        # src/Kupo.hs:259-317).  The file-source stream is the chain-sync
        # producer: new event files appearing in the directory are new
        # blocks; each micro-batch commits through the ACID log and swaps
        # the served index.
        if not args.workdir:
            raise SystemExit("--follow requires --workdir")
        # a missing chain source already failed inside _load_source above
        from kupo_spark.streaming.indexer import (
            StreamingIndexer,
            resume_bound,
            stream_blocks_from_events_dir,
        )

        indexer = StreamingIndexer(args.workdir, patterns=patterns)
        # fail loudly at STARTUP if another live process writes this
        # workdir (kupo's exclusive writer lock, SQLite.hs:355-384)
        indexer._ensure_writer()
        start, inclusive = resume_bound(
            indexer, spark, None if since is None else since[0]
        )
        # --since/--until SLOT.HASH points the bridge has not delivered yet
        # cannot be checked at startup (the reference validates against the
        # node's chain, not local files) — they are validated IN-STREAM the
        # moment the slot arrives; a mismatch against the CANONICAL chain
        # fails the stream
        pending_points: list[tuple[int, str]] = []

        def _point_status(bdf, slot, header_hash):
            rows = (
                bdf.where(bdf.slot_no == slot)
                .select("header_hash")
                .limit(1)
                .collect()
            )
            if not rows:
                return "absent"
            return "match" if rows[0].header_hash == header_hash else "mismatch"

        def _startup_or_defer(slot, header_hash):
            st = _point_status(blocks, slot, header_hash)
            if st == "mismatch":
                raise SystemExit(f"{slot}.{header_hash}: no such point on the chain")
            if st == "absent":
                pending_points.append((slot, header_hash))

        if since is not None and since != "tip" and since[1] is not None:
            _startup_or_defer(*since)
        if until is not None and until[1] is not None:
            _startup_or_defer(*until)

        def _check_points(bdf):
            # tiny transient cost: one pushed-down point filter per pending
            # point per batch, and the list empties as the slots arrive
            for s, h in list(pending_points):
                if _point_status(bdf, s, h) == "absent":
                    continue  # this delivery doesn't carry the slot
                # the slot has arrived — judge against the CURRENT CANONICAL
                # chain, not the raw delivery: a doomed fork block at the
                # slot that the same (or an already-delivered) rollback
                # retracts must not kill the stream
                st = _point_status(_fresh_blocks(), s, h)
                if st == "mismatch":
                    raise ValueError(f"point {s}.{h} is not on the chain")
                if st == "match":
                    pending_points.remove((s, h))
                # absent in the canonical view: the carrying block was
                # netted out — the point stays pending

        ckpt = f"{args.workdir}/_stream_checkpoint"
        # mutable: a live RollBackward BELOW the resume point moves the
        # bound down — the re-forwarded branch must be indexed, not dropped
        bound_state = {"lo": start, "inclusive": inclusive}

        def _bound(bdf):
            if until is not None:
                bdf = bdf.where(bdf.slot_no <= until[0])
            lo = bound_state["lo"]
            return bdf.where(
                bdf.slot_no >= lo if bound_state["inclusive"] else bdf.slot_no > lo
            )

        def _compact_due() -> bool:
            # time-driven cadence check, shared by _maybe_compact and the
            # block-free fast paths (a delivery stream of Greetings/TxValid
            # only must still fire the gc loop — ADVICE r4)
            if args.gc_interval <= 0:
                return False
            now = time.monotonic()
            holder.setdefault("last_compact", now)
            return now - holder["last_compact"] >= args.gc_interval

        def _maybe_compact():
            # fold the log into the base every gc-interval, WITH the
            # gardener's GC (M2/M3) applied — serialized with ingest (runs
            # inside the stream body) so the base commit cannot race a
            # concurrent batch; also bounds the per-swap replay cost
            if _compact_due():
                from kupo_spark.operators.gardener import run_gc
                from kupo_spark.operators.maintenance import prune_binary_data

                if args.prune_utxo:
                    from kupo_spark.chainspec import LONGEST_ROLLBACK

                    _k = (
                        LONGEST_ROLLBACK
                        if args.longest_rollback is None
                        else args.longest_rollback
                    )

                    def gc(ix, _k=_k):
                        return run_gc(ix, _k)
                else:
                    gc = prune_binary_data
                with indexer.write_lock:  # no PUT /patterns mid-compaction
                    if holder.get("vacuum_armed"):
                        # physical deletion deferred ONE FULL CYCLE: what is
                        # unreferenced NOW was unreferenced at the previous
                        # compaction, a whole gc interval ago — any reader
                        # of those pins is long gone.  (An mtime-based
                        # retention would delete a just-unreferenced but
                        # old-by-mtime file under the still-served pins.)
                        indexer.vacuum_logs(0.0)
                        indexer._base_db().vacuum(retention_seconds=0.0)
                    # fold the log into a fresh GC'd base, then logically
                    # truncate the folded partitions — disk stays bounded
                    # by the compaction horizon, not the stream's lifetime
                    indexer.compact(spark, transform=gc)
                    indexer.truncate_log()
                    holder["vacuum_armed"] = True
                holder["last_compact"] = time.monotonic()

        def _swap(batch_id):
            _maybe_compact()
            srv = holder.get("server")
            if srv is not None:
                # resolve + swap under the writer lock: an unlocked swap
                # could install a pre-PUT snapshot OVER the PUT's newer one
                # (same race as server registration)
                with indexer.write_lock:
                    srv._swap_index(indexer.resolved_index(spark))

        if args.events:
            stream = _bound(stream_blocks_from_events_dir(spark, args.events))

            def body(df, batch_id):
                _check_points(df)
                # writer serialization: a concurrent PUT /patterns holds the
                # same lock across its rollback + backfill (mailbox analog)
                with indexer.write_lock:
                    indexer.process_batch(df, batch_id, dedup_scope=ckpt)
                _swap(batch_id)

        elif args.hydra_file:
            # Hydra ServerOutput segments: snapshots are FINAL inside an
            # open head (the protocol has no RollBackward), so the live
            # loop is decode → bound → commit — no retraction lane, and the
            # stream shape is the shared stream_hydra_jsonl helper
            from kupo_spark.sources.hydra import stream_hydra_jsonl

            stream = _bound(stream_hydra_jsonl(spark, args.hydra_file))

            def body(df, batch_id):
                # the CBOR pandas-UDF decode is the expensive lineage:
                # persist once (the five per-batch table writes would each
                # re-decode), and skip the commit + swap for block-free
                # deliveries — Greetings/TxValid are the MAJORITY of live
                # ServerOutput traffic, and a no-op commit costs five
                # appends + a catalog entry + a full resolve per message.
                # Exception: the FIRST commit must land even when empty
                # (it seeds the log tables; serving starts on it).
                df.persist()
                try:
                    if df.isEmpty() and indexer._committed():
                        # compaction cadence stays TIME-driven under
                        # sustained block-free traffic (ADVICE r4).  Route
                        # through _swap — not a bare _maybe_compact — so the
                        # served snapshot re-resolves onto the fresh base
                        # BEFORE a later cycle's vacuum deletes the truncated
                        # log files the stale snapshot still references.
                        if _compact_due():
                            _swap(batch_id)
                        return
                    _check_points(df)
                    with indexer.write_lock:
                        indexer.process_batch(df, batch_id, dedup_scope=ckpt)
                finally:
                    df.unpersist()
                _swap(batch_id)

        else:
            # Ogmios NDJSON segments: the live chain-sync INCLUDING
            # RollBackward retractions.  Bridge contract (documented): one
            # segment file per delivery, named with a monotone sequence
            # number (so natural-sorted names == arrival order, the rule
            # canonical_blocks batch replays share), at most one rollback
            # per segment and before its forwards — the shape a
            # reconnecting chain-sync produces (the server answers an
            # intersection with RollBackward first, then forwards).
            from pyspark.sql import functions as F

            from kupo_spark.sources.ogmios import (
                _natural_key,
                decode_next_block,
                partial_blocks,
                rollback_points,
            )

            stream = (
                spark.readStream.option("maxFilesPerTrigger", "1")
                .text(args.ogmios_file)
                .withColumn("_seg", F.input_file_name())
            )

            def _check_segment_order(df):
                # ENFORCE the bridge contract (natural-sorted names ==
                # arrival order) instead of merely documenting it: the file
                # stream delivers in MODIFICATION-TIME order, and if mtimes
                # disagree with name order (backfilled copies, rsync, coarse
                # timestamps) a rollback would be applied against the wrong
                # prefix and the streamed state silently diverges from the
                # canonical batch view — fail the stream loudly instead.
                from urllib.parse import unquote

                names = [
                    unquote(r[0].rsplit("/", 1)[-1])
                    for r in df.select("_seg").distinct().collect()
                ]
                keys = sorted(_natural_key(n) for n in names)
                last = holder.get("last_seg_key")
                if last is not None and keys and keys[0] <= last[0]:
                    raise ValueError(
                        "segment delivered out of natural-name order: "
                        f"{sorted(names)[0]!r} after {last[1]!r} — the bridge "
                        "contract requires monotone sequence-numbered names "
                        "with matching arrival (mtime) order"
                    )
                if keys:
                    holder["last_seg_key"] = (keys[-1], sorted(names)[-1])

            def body(df, batch_id):
                with indexer.write_lock:
                    key = f"{ckpt}:{batch_id}"
                    if any(m.get("key") == key for m in indexer._committed()):
                        return  # replayed delivery — both writes already landed
                    _check_segment_order(df)
                    decoded = decode_next_block(df.drop("_seg")).persist()
                    try:
                        _check_points(partial_blocks(decoded))
                        rb_rows = rollback_points(decoded).collect()
                        if any(r.slot_no is None for r in rb_rows):
                            # a retraction that cannot be decoded cannot be
                            # skipped (the reference fails the parse too) —
                            # fail the stream loudly, never index on a fork
                            raise ValueError(
                                "malformed RollBackward point in segment"
                            )
                        if rb_rows:
                            # retraction-as-data (M1): resolved reads drop
                            # newer-than-point rows committed before this
                            # record
                            rb = min(r.slot_no for r in rb_rows)
                            indexer.append_rollback(rb)
                            if rb < bound_state["lo"]:
                                # fork below the resume point: the
                                # re-forwarded branch (slots > rb) must
                                # pass the ingest bound
                                bound_state["lo"] = rb
                                bound_state["inclusive"] = False
                        indexer.process_batch(
                            _bound(partial_blocks(decoded)),
                            batch_id,
                            dedup_scope=ckpt,
                        )
                    finally:
                        decoded.unpersist()
                _swap(batch_id)

        query = (
            stream.writeStream.foreachBatch(body)
            .option("checkpointLocation", ckpt)
            .outputMode("update")
            .start()
        )
        # serve as soon as the log is non-empty (kupo answers queries while
        # syncing; an empty log has no resolvable state yet)
        deadline = time.time() + 300
        while not indexer._committed():
            if query.exception() is not None:
                raise query.exception()
            if time.time() > deadline:
                query.stop()
                raise SystemExit("--follow: no batch committed within 300 s")
            time.sleep(0.2)
        index = indexer.resolved_index(spark)
        store_path = workdir_store
        holder["query"] = query
    else:
        if not args.workdir:
            raise SystemExit("one of --workdir or --in-memory is required")
        from kupo_spark.streaming.indexer import StreamingIndexer, resume_bound

        indexer = StreamingIndexer(args.workdir, patterns=patterns)
        indexer._ensure_writer()  # loud startup failure on a live second writer
        had_data = bool(indexer._committed())
        start, inclusive = resume_bound(
            indexer, spark, None if since is None else since[0]
        )
        if since is not None and since[1] is not None:
            _assert_point(blocks, *since)
        # fresh start (or an all-retracted log) syncs FROM the point
        # (inclusive); a resume re-enters AFTER the stored alive tip (the
        # chain-sync intersection is the tip)
        bounded = blocks.where(
            blocks.slot_no >= start if inclusive else blocks.slot_no > start
        )
        # a restart with nothing new must not pay an ingest commit or a
        # full base rewrite — restart cost stays O(1), not O(index)
        ingested = not (had_data and bounded.isEmpty())
        if ingested:
            import uuid

            # prune-utxo under a workdir is effected by the gardener loop
            # (the reference prunes on GC too, App.hs:666-674); the log
            # keeps spent marks so rollbacks stay cheap
            indexer.process_batch(
                bounded, batch_id=0, dedup_scope=f"cli-{uuid.uuid4().hex}"
            )
        if args.defer_db_indexes:
            index = indexer.resolved_index(spark)
        elif not ingested and indexer.log_current():
            index = indexer._base_db().read(spark)  # base already current
        else:
            # compaction = the deferred-indexes endgame: lay the resolved
            # state out as the queryable base (SURVEY §4)
            index = indexer.compact(spark)
        store_path = workdir_store

    from kupo_spark.operators.http_server import KupoHttpServer

    front_workers = getattr(args, "front_workers", 0) or 0
    server = KupoHttpServer(
        spark,
        index,
        blocks=blocks,
        blocks_factory=_fresh_blocks if args.follow else None,
        # a replica must not touch the master's pattern store: serve
        # whatever is persisted there, install nothing
        patterns=() if args.read_only else patterns,
        store_path=store_path,
        host=args.host,
        # with a front, the FRONT owns the public port and the primary
        # takes an ephemeral one behind it (kupo's Warp multicore accept
        # loop is always the listener, Http.hs:207-263)
        port=0 if front_workers else args.port,
        read_only=args.read_only,
        streaming=indexer if args.follow else None,
        rendered_addresses=args.rendered_addresses,
        longest_rollback=args.longest_rollback,
    ).start()
    if front_workers:
        front = server.attach_front(
            workers=front_workers, host=args.host, port=args.port
        )
        print(
            f"kupo-spark front: {front_workers} SO_REUSEPORT workers on "
            f"{front.url} (primary {server.url})",
            file=sys.stderr,
        )
    stop = threading.Event()
    server._stop_gc = stop  # KupoHttpServer.close() sets it (gardener dies with the server)
    if ws_stop is not None:
        server._ws_stop = ws_stop  # close() also ends the websocket follow loop
    if holder.get("query") is not None:
        server._stream_query = holder["query"]  # close() stops the follow stream
        # close the registration race under the writer lock: a micro-batch
        # that committed while the server was being constructed found no
        # server to swap — resolve + register atomically w.r.t. commits so
        # the served state can never move backwards
        with indexer.write_lock:
            holder["server"] = server
            server._swap_index(indexer.resolved_index(spark))
    if args.gc_interval > 0 and not args.read_only and not args.follow:
        # batch mode only: in --follow the gardener folds into the
        # in-body compaction (an in-memory GC'd copy would be reverted by
        # the next batch swap)
        threading.Thread(
            target=_gardener,
            args=(server, args.gc_interval, args.prune_utxo, stop,
                  args.longest_rollback),
            daemon=True,
        ).start()
    print(f"kupo-spark listening on {server.url}", file=sys.stderr)
    if not serve_forever:
        return server
    try:
        while True:
            time.sleep(5)
            q = holder.get("query")
            if q is not None and q.exception() is not None:
                # a dead follow stream must be a VISIBLE failure — serving
                # a frozen index while claiming to follow is silent data
                # loss (the in-stream point validation raises through here)
                raise SystemExit(f"--follow stream failed: {q.exception()}")
    except KeyboardInterrupt:
        pass
    finally:
        server.close()
        if indexer is not None and not args.read_only:
            indexer.release_writer()
    return None


# ---- copy ----------------------------------------------------------------


def cmd_copy(args):
    """``copy --from --into [--match]...`` (Options.hs:111; the reference
    copies a filtered database).  Without --match, the source's own pattern
    store (falling back to '*') decides what survives.  The source may be
    either a run workdir (streaming-log/catalog layout) or a plain exported
    index (write_index layout)."""
    import os

    from kupo_spark.operators.copy import copy_index
    from kupo_spark.operators.indexer import read_index
    from kupo_spark.session import get_spark

    spark = get_spark("kupo-spark-copy")
    patterns = list(args.match)
    if not patterns:
        store = f"{args.src.rstrip('/')}/patterns.txt"
        if os.path.exists(store):
            from kupo_spark.operators.pattern_store import PatternStore
            from kupo_spark.patterns import pattern_to_text

            patterns = [pattern_to_text(p) for p in PatternStore(store).list()]
        if not patterns:
            patterns = ["*"]
    if os.path.isdir(f"{args.src.rstrip('/')}/_catalog"):
        from kupo_spark.streaming.indexer import StreamingIndexer

        index = StreamingIndexer(args.src, patterns=patterns).resolved_index(spark)
    else:
        index = read_index(spark, args.src)
    copy_index(index, patterns, args.dest)
    print(f"copied {args.src} -> {args.dest} ({len(patterns)} pattern(s))", file=sys.stderr)
    return 0


# ---- health-check --------------------------------------------------------


def cmd_health_check(args) -> int:
    """GET /health; exit 0 iff the server answers healthy (the reference's
    healthCheck command, used as a container liveness probe)."""
    url = f"http://{args.host}:{args.port}/health"
    req = urllib.request.Request(url, headers={"Accept": "application/json"})
    try:
        with urllib.request.urlopen(req, timeout=10) as resp:
            body = json.loads(resp.read())
    except (urllib.error.URLError, OSError, json.JSONDecodeError) as exc:
        print(f"health-check failed: {exc}", file=sys.stderr)
        return 1
    ok = body.get("connection_status") == "connected"
    print(json.dumps(body))
    return 0 if ok else 1


# ---- parser --------------------------------------------------------------


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="kupo-spark",
        description="Fast, lightweight & configurable chain-index, on Spark.",
    )
    sub = p.add_subparsers(dest="command")

    run = sub.add_parser("run", help="sync and serve an index (default command)")
    _add_run_args(run)
    _add_run_args(p)  # run is the default: flags work without the subcommand

    cp = sub.add_parser("copy", help="copy a filtered index")
    cp.add_argument("--from", dest="src", required=True, metavar="DIR")
    cp.add_argument("--into", dest="dest", required=True, metavar="DIR")
    cp.add_argument("--match", action="append", default=[], metavar="PATTERN")

    hc = sub.add_parser("health-check", help="exit 0 iff a running server is healthy")
    hc.add_argument("--host", default="127.0.0.1", metavar="IPv4")
    hc.add_argument("--port", type=int, default=1442, metavar="TCP/PORT")

    sub.add_parser("version", help="print version")
    return p


def _add_run_args(p: argparse.ArgumentParser) -> None:
    src = p.add_argument_group("chain source (file replay transports)")
    src.add_argument("--events", metavar="DIR", help="events parquet dir (node stand-in)")
    src.add_argument("--ogmios-file", metavar="FILEPATH", help="Ogmios nextBlock NDJSON")
    src.add_argument(
        "--ogmios-ws",
        metavar="ws://HOST:PORT",
        help="Ogmios WebSocket (pipelined nextBlock chain-sync)",
    )
    src.add_argument(
        "--node-socket",
        metavar="FILEPATH",
        help="cardano-node UNIX socket (mux-framed chain-sync mini-protocol)",
    )
    src.add_argument("--hydra-file", metavar="FILEPATH", help="Hydra ServerOutput NDJSON")
    src.add_argument(
        "--hydra-ws",
        metavar="ws://HOST:PORT",
        help="Hydra node WebSocket (push-mode ServerOutput stream)",
    )
    p.add_argument("--workdir", metavar="DIRECTORY", help="where the index is stored")
    p.add_argument("--in-memory", action="store_true", help="no durable storage")
    p.add_argument("--since", metavar="POINT", help="origin | SLOT | SLOT.HEADERHASH")
    p.add_argument("--until", metavar="POINT|SLOT", help="sync up-to (inclusive)")
    p.add_argument(
        "--match", action="append", default=[], metavar="PATTERN",
        help="pattern to match on; repeatable (logical 'or')",
    )
    p.add_argument(
        "--follow", action="store_true",
        help="continuous mode: keep following the --events directory for new "
        "event files while serving (the upstream's normal operation)",
    )
    p.add_argument("--prune-utxo", action="store_true")
    p.add_argument(
        "--longest-rollback", type=int, default=None, metavar="SLOTS",
        help="maximum rollback depth / safe zone in slots (the reference's "
        "Options.hs:149 security-parameter override): bounds which spent "
        "rows --prune-utxo may drop (M4), the gardener's GC horizon, and "
        "how deep PUT /patterns may rewind; default is the chain spec's k",
    )
    p.add_argument("--gc-interval", type=float, default=3600, metavar="SECONDS")
    p.add_argument("--defer-db-indexes", action="store_true")
    p.add_argument("--read-only", action="store_true")
    p.add_argument(
        "--rendered-addresses", action="store_true",
        help="render /matches addresses as bech32/base58 wire text "
        "(addressToJson — the upstream's always-on behavior); default "
        "serves the stored row form",
    )
    p.add_argument("--host", default="127.0.0.1", metavar="IPv4")
    p.add_argument("--port", type=int, default=1442, metavar="TCP/PORT")
    p.add_argument(
        "--front-workers", type=int, default=0, metavar="N",
        help="N SO_REUSEPORT worker processes as the public listener: hot "
        "point lookups are served from pre-rendered bodies on N GILs "
        "(kupo's Warp multicore accept loop analog), everything else "
        "proxies to the Spark-owning primary; refreshed on every index "
        "swap. 0 (default) serves directly from the primary.",
    )


def main(argv: list[str] | None = None, serve_forever: bool = True):
    argv = sys.argv[1:] if argv is None else argv
    parser = build_parser()
    args = parser.parse_args(argv)
    cmd = args.command or "run"
    if cmd == "version":
        print(VERSION)
        return 0
    if cmd == "copy":
        return cmd_copy(args)
    if cmd == "health-check":
        return cmd_health_check(args)
    return cmd_run(args, serve_forever=serve_forever)
