"""Custom stateful streaming operators (``applyInPandasWithState``).

The reference engine's only stateful stream is the chain-sync fold itself
(``src/Kupo/App.hs:496-577`` — consume block, update index, checkpoint),
which ``streaming/indexer.py`` models with ``foreachBatch``.  A
training-data pipeline ingesting a live crawl needs more: cross-batch
deduplication, event-time sessionization, and watermarked windowed
aggregation.  These are the Structured Streaming analogs of the batch
operators in ``functions/dedup.py`` / the events table, built on Spark's
two native stateful tools:

- ``applyInPandasWithState`` — Arrow-batched per-key state (the keyed
  state store lives in the executors, checkpointed with the query; scale
  = state is partitioned by the grouping key across the cluster, never
  driver-resident);
- ``withWatermark`` + ``window`` — built-in watermarked aggregation for
  the pure-SQL shapes (late rows dropped once the watermark passes,
  state evicted — bounded memory on an unbounded stream).

Watermark fine print (Spark >= 3.4, verified empirically on 4.1): each
batch runs with TWO watermarks — late-event filtering uses the PREVIOUS
batch's watermark, state eviction/timeout uses the current one — so a
row is only dropped as late if it is late relative to the watermark two
batches before its arrival, and timers fire one batch after the
watermark passes them.

Batch equivalents (``sessionize_batch``) are provided where the semantics
are expressible as plain DataFrame ops, so tests can pin
stream == batch == SQL-oracle on the same inputs.

Scale notes (100 TB stream):
- state per key is O(1) (a seen-flag or one open session), and the state
  store shards by key hash — no skew beyond the key distribution itself;
- ``streaming_dedup`` state grows with #distinct keys; pass
  ``ttl_seconds`` (event-time TTL via timeouts) to bound it on unbounded
  streams — the batch MinHash/exact dedup handles the historical corpus,
  the stream handles the live frontier;
- every operator emits append-mode rows, so sinks can be exactly-once
  file/table sinks.
"""

from __future__ import annotations

from typing import Iterable

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)

__all__ = ["streaming_dedup", "sessionize", "sessionize_batch", "windowed_event_counts"]

_US = 1_000_000


def _ts_us(col: pd.Series) -> pd.Series:
    """timestamp series -> int64 microseconds since epoch (tz-naive)."""
    return col.astype("datetime64[us]").astype("int64")


# ---------------------------------------------------------------------------
# streaming exact-dedup: first occurrence per key wins, across micro-batches
# ---------------------------------------------------------------------------


def streaming_dedup(
    docs: DataFrame,
    key_col: str = "content_hash",
    tie_col: str | None = None,
    ttl_seconds: float | None = None,
    time_col: str = "ts",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming analog of ``functions/dedup.py::exact_duplicates``: emit
    the FIRST document seen for each ``key_col`` value and silently drop
    every later duplicate — across micro-batch boundaries, which a
    stateless ``dropDuplicates`` inside ``foreachBatch`` cannot do.

    Within one micro-batch the representative is deterministic: the row
    minimizing ``tie_col`` (default: the key itself, i.e. any row — pass
    ``doc_id`` for a stable choice).  Across batches, earlier batch wins
    (arrival order), matching the "keep first crawl" curation rule.

    ``ttl_seconds`` bounds state on unbounded streams: a key unseen for
    that long (event time — a ``watermark`` on ``time_col`` is applied
    automatically) is evicted, so a re-crawl after the TTL re-emits.
    Without it, state is the exact distinct-key set (NoTimeout).
    """
    if ttl_seconds is not None:
        docs = docs.withWatermark(time_col, watermark)
    out_schema = docs.schema
    state_schema = StructType([StructField("seen", LongType())])
    tie = tie_col or key_col
    timeout = (
        GroupStateTimeout.EventTimeTimeout
        if ttl_seconds is not None
        else GroupStateTimeout.NoTimeout
    )
    ttl_ms = int(ttl_seconds * 1000) if ttl_seconds is not None else None
    cols = [f.name for f in out_schema.fields]

    def first_seen(
        key, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        fresh = not state.exists
        best: pd.DataFrame | None = None
        last_event_ms = None
        for pdf in pdfs:
            if not len(pdf):
                continue
            if ttl_ms is not None:
                ev = int(_ts_us(pdf[time_col]).max()) // 1000
                last_event_ms = ev if last_event_ms is None else max(last_event_ms, ev)
            if fresh and best is None:
                best = pdf.loc[[pdf[tie].idxmin()], cols]
            elif fresh:
                cand = pdf.loc[[pdf[tie].idxmin()], cols]
                if cand[tie].iloc[0] < best[tie].iloc[0]:
                    best = cand
        state.update((1,))
        if ttl_ms is not None:
            base = last_event_ms if last_event_ms is not None else 0
            state.setTimeoutTimestamp(
                max(base + ttl_ms, state.getCurrentWatermarkMs() + 1)
            )
        if best is not None:
            yield best

    return docs.groupBy(key_col).applyInPandasWithState(
        first_seen, out_schema, state_schema, "append", timeout
    )


# ---------------------------------------------------------------------------
# event-time sessionization with gap timeout
# ---------------------------------------------------------------------------

SESSION_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_start", TimestampType()),
        StructField("session_end", TimestampType()),
        StructField("n_events", LongType()),
        StructField("sum_value", DoubleType()),
    ]
)

# one entry per OPEN span, parallel arrays: a span only leaves the state
# once the watermark passes span_end + gap, so an in-watermark out-of-order
# event can still bridge/extend ANY open span (strict streamed ⊆ batch)
_SESSION_STATE = StructType(
    [
        StructField("start_us", ArrayType(LongType())),
        StructField("end_us", ArrayType(LongType())),
        StructField("n", ArrayType(LongType())),
        StructField("sum_value", ArrayType(DoubleType())),
    ]
)


def sessionize(
    events: DataFrame,
    gap_seconds: float = 1800.0,
    watermark: str = "30 minutes",
    key_col: str = "user_id",
    time_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Event-time sessions per user: consecutive events closer than
    ``gap_seconds`` belong to one session; a session closes when the gap
    elapses (event time, enforced by a state timeout once the watermark
    passes ``last_event + gap``).

    A span only EMITS once the watermark passes ``span_end + gap`` — every
    still-reachable span stays open in the state store (parallel arrays, one
    entry per span), so an in-watermark out-of-order event that bridges two
    spans, or precedes the earliest one, merges/extends them instead of
    racing an eager emission.  Streamed output is therefore strictly a
    subset of the batch sessionization of the same (non-late) events.
    Late events (older than the watermark) are dropped by Spark before
    reaching the operator — the standard watermark contract.

    Output: one row per closed session (append mode).
    """
    gap_us = int(gap_seconds * _US)
    gap_ms = gap_us // 1000

    def fold(
        key, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        uid = key[0]

        def session_row(s) -> dict:
            return {
                "user_id": uid,
                "session_start": pd.Timestamp(s[0], unit="us"),
                "session_end": pd.Timestamp(s[1], unit="us"),
                "n_events": s[2],
                "sum_value": s[3],
            }

        spans: list[list] = []
        if state.exists:
            st = state.get
            spans = [
                [int(a), int(b), int(c), float(d)]
                for a, b, c, d in zip(st[0], st[1], st[2], st[3])
            ]

        # gather EVERY Arrow chunk before folding: a key's micro-batch data
        # may span chunks, and a later chunk can hold earlier timestamps —
        # sorting per chunk would mis-split sessions
        parts = [] if state.hasTimedOut else [pdf for pdf in pdfs if len(pdf)]
        if parts:
            allp = pd.concat(parts, ignore_index=True)
            us = _ts_us(allp[time_col]).to_numpy()
            vals = allp[value_col].astype("float64").to_numpy()
            order = us.argsort(kind="stable")
            # interval-merge the batch (ascending) against every open span:
            # an in-watermark late event that precedes a span extends its
            # start backwards; one that lands between spans opens its own
            for i in order:
                t, v = int(us[i]), float(vals[i])
                placed = False
                for s in spans:
                    if s[0] - gap_us <= t <= s[1] + gap_us:
                        s[0] = min(s[0], t)
                        s[1] = max(s[1], t)
                        s[2] += 1
                        s[3] += v
                        placed = True
                        break
                if not placed:
                    spans.append([t, t, 1, v])
            # coalesce spans that an extension bridged together
            spans.sort(key=lambda s: s[0])
            merged: list[list] = []
            for s in spans:
                if merged and s[0] - merged[-1][1] <= gap_us:
                    merged[-1][1] = max(merged[-1][1], s[1])
                    merged[-1][2] += s[2]
                    merged[-1][3] += s[3]
                else:
                    merged.append(s)
            spans = merged

        # close ONLY spans the watermark has passed (end + gap <= wm): no
        # in-watermark arrival can reach them any more; everything else —
        # including non-tail spans an old event could still bridge — stays
        wm_ms = state.getCurrentWatermarkMs()
        closed = [s for s in spans if s[1] // 1000 + gap_ms <= wm_ms]
        kept = [s for s in spans if s[1] // 1000 + gap_ms > wm_ms]
        if kept:
            state.update(
                (
                    [s[0] for s in kept],
                    [s[1] for s in kept],
                    [s[2] for s in kept],
                    [s[3] for s in kept],
                )
            )
            state.setTimeoutTimestamp(
                max(min(s[1] // 1000 for s in kept) + gap_ms, wm_ms + 1)
            )
        elif state.exists:
            state.remove()
        if closed:
            yield pd.DataFrame([session_row(s) for s in closed])

    return (
        events.withWatermark(time_col, watermark)
        .groupBy(key_col)
        .applyInPandasWithState(
            fold, SESSION_SCHEMA, _SESSION_STATE, "append", GroupStateTimeout.EventTimeTimeout
        )
    )


def sessionize_batch(
    events: DataFrame,
    gap_seconds: float = 1800.0,
    key_col: str = "user_id",
    time_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Batch sessionization with identical semantics, as pure DataFrame
    ops: a gap > ``gap_seconds`` from the previous event starts a new
    session (lag + running sum of boundaries per key), then one row per
    session.  Used to pin ``sessionize`` stream == batch, and cheap at
    scale: two window passes + one agg, all shuffled once on ``key_col``.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(key_col).orderBy(time_col)
    gap = F.lit(gap_seconds)
    # unix_micros over an LTZ cast works for TIMESTAMP and TIMESTAMP_NTZ
    # inputs alike (only differences are used, so the tz anchor cancels)
    secs = F.unix_micros(F.col(time_col).cast("timestamp_ltz")) / F.lit(1e6)
    with_bound = events.select(
        key_col,
        time_col,
        value_col,
        (
            F.coalesce(
                secs - F.lag(secs).over(w) > gap,
                F.lit(True),
            )
        )
        .cast("long")
        .alias("is_boundary"),
    ).select(
        key_col,
        time_col,
        value_col,
        F.sum("is_boundary").over(w).alias("session_seq"),
    )
    return (
        with_bound.groupBy(key_col, "session_seq")
        .agg(
            F.min(time_col).alias("session_start"),
            F.max(time_col).alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
            F.sum(value_col).cast("double").alias("sum_value"),
        )
        .drop("session_seq")
    )


# ---------------------------------------------------------------------------
# watermarked windowed aggregation (built-in state)
# ---------------------------------------------------------------------------


def windowed_event_counts(
    events: DataFrame,
    window_duration: str = "1 hour",
    watermark: str = "2 hours",
    time_col: str = "ts",
) -> DataFrame:
    """Tumbling-window counts per event type with a watermark: the
    standard late-data-tolerant streaming aggregate.  Windows finalize
    (append mode) once the watermark passes their end; rows later than
    the watermark are dropped; window state is evicted after emission —
    memory stays bounded by (#windows inside the watermark) × (#types).

    Valid on batch DataFrames too (``withWatermark`` is a no-op there),
    which is how tests pin streaming totals against the batch answer.
    """
    return (
        events.withWatermark(time_col, watermark)
        .groupBy(F.window(time_col, window_duration), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("sum_value"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )
