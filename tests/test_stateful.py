"""Custom stateful streaming operators (`streaming/stateful.py`):
cross-batch dedup, event-time sessionization, watermarked windows.

Each test drives a file-source stream one file per micro-batch
(availableNow + maxFilesPerTrigger=1, mtimes staggered so the source
processes files in a known order) into a memory sink, then pins the
emitted rows against batch-computed semantics on the same events."""

from __future__ import annotations

import os
import time
import uuid

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from kupo_spark.streaming.stateful import (
    sessionize,
    sessionize_batch,
    streaming_dedup,
    windowed_event_counts,
)

EVENT_SCHEMA = (
    "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type STRING, value DOUBLE"
)
DOC_SCHEMA = "doc_id BIGINT, content_hash STRING, ts TIMESTAMP"


def _write_files(dirpath, schema: pa.schema, batches: list[list[tuple]]):
    """One parquet file per batch, mtimes strictly increasing so the file
    source's (mtime-ordered) processing matches list order."""
    os.makedirs(dirpath, exist_ok=True)
    now = time.time() - 3600
    for i, rows in enumerate(batches):
        cols = list(zip(*rows)) if rows else [[] for _ in schema.names]
        tbl = pa.table(
            {n: pa.array(c, type=schema.field(n).type) for n, c in zip(schema.names, cols)}
        )
        p = os.path.join(dirpath, f"f{i:03d}.parquet")
        pq.write_table(tbl, p)
        os.utime(p, (now + i, now + i))


def _run_to_memory(stream_df, mode: str = "append", timeout: int = 120):
    name = f"t{uuid.uuid4().hex[:12]}"
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout)
    return name


def _ts(s: str):
    return pd.Timestamp(s).to_pydatetime()


EV_PA = pa.schema(
    [
        ("event_id", pa.int64()),
        ("ts", pa.timestamp("us")),
        ("user_id", pa.int64()),
        ("event_type", pa.string()),
        ("value", pa.float64()),
    ]
)
DOC_PA = pa.schema(
    [("doc_id", pa.int64()), ("content_hash", pa.string()), ("ts", pa.timestamp("us"))]
)


# ---------------------------------------------------------------------------
# streaming_dedup
# ---------------------------------------------------------------------------


def test_streaming_dedup_first_seen_across_batches(spark, tmp_path):
    d = str(tmp_path / "docs")
    _write_files(
        d,
        DOC_PA,
        [
            [(2, "h1", _ts("2024-01-01 10:00")), (1, "h1", _ts("2024-01-01 10:01")),
             (3, "h2", _ts("2024-01-01 10:02"))],
            [(4, "h1", _ts("2024-01-01 10:03")), (5, "h3", _ts("2024-01-01 10:04"))],
            [(6, "h2", _ts("2024-01-01 10:05")), (7, "h3", _ts("2024-01-01 10:06"))],
        ],
    )
    docs = (
        spark.readStream.schema(DOC_SCHEMA).option("maxFilesPerTrigger", 1).parquet(d)
    )
    name = _run_to_memory(streaming_dedup(docs, "content_hash", tie_col="doc_id"))
    got = {(r.doc_id, r.content_hash) for r in spark.table(name).collect()}
    # one representative per key; batch 0 wins for h1 with the min doc_id
    assert got == {(1, "h1"), (3, "h2"), (5, "h3")}


def test_streaming_dedup_ttl_reemits_after_eviction(spark, tmp_path):
    d = str(tmp_path / "docs_ttl")
    _write_files(
        d,
        DOC_PA,
        [
            [(1, "h1", _ts("2024-01-01 10:00"))],
            # advances the watermark far past h1's TTL (1h)
            [(2, "hx", _ts("2024-01-01 15:00"))],
            # timers for h1 (due 11:00) fire while processing this batch
            [(3, "hy", _ts("2024-01-01 15:10"))],
            # h1 state was evicted -> this re-emits
            [(4, "h1", _ts("2024-01-01 15:20"))],
        ],
    )
    docs = (
        spark.readStream.schema(DOC_SCHEMA).option("maxFilesPerTrigger", 1).parquet(d)
    )
    name = _run_to_memory(
        streaming_dedup(
            docs, "content_hash", tie_col="doc_id", ttl_seconds=3600, watermark="1 minute"
        )
    )
    h1 = sorted(r.doc_id for r in spark.table(name).collect() if r.content_hash == "h1")
    assert h1 == [1, 4]


# ---------------------------------------------------------------------------
# sessionize
# ---------------------------------------------------------------------------


def _session_events():
    # user 1: session A (10:00, 10:10), session B (13:00)
    # user 2: session C (10:05)
    return [
        [(1, _ts("2024-01-01 10:00"), 1, "view", 1.0),
         (2, _ts("2024-01-01 10:10"), 1, "view", 2.0),
         (3, _ts("2024-01-01 10:05"), 2, "view", 4.0)],
        # closes A in-batch (13:00 - 10:10 > 30min gap)
        [(4, _ts("2024-01-01 13:00"), 1, "buy", 8.0)],
        # watermark advance; later batches fire timers for B and C
        [(5, _ts("2024-01-01 20:00"), 3, "view", 0.5)],
        [(6, _ts("2024-01-01 23:00"), 4, "view", 0.25)],
    ]


def test_sessionize_stream_emits_closed_sessions(spark, tmp_path):
    d = str(tmp_path / "sess")
    _write_files(d, EV_PA, _session_events())
    ev = spark.readStream.schema(EVENT_SCHEMA).option("maxFilesPerTrigger", 1).parquet(d)
    name = _run_to_memory(sessionize(ev, gap_seconds=1800, watermark="1 minute"))
    got = {
        (r.user_id, str(r.session_start), str(r.session_end), r.n_events, r.sum_value)
        for r in spark.table(name).collect()
    }
    expect = {
        (1, "2024-01-01 10:00:00", "2024-01-01 10:10:00", 2, 3.0),
        (1, "2024-01-01 13:00:00", "2024-01-01 13:00:00", 1, 8.0),
        (2, "2024-01-01 10:05:00", "2024-01-01 10:05:00", 1, 4.0),
    }
    # u3/u4 tail sessions stay open (watermark never passes their gap)
    assert expect <= got
    assert {r[0] for r in got} <= {1, 2, 3}  # u4's can never close here


def test_sessionize_batch_matches_duckdb_oracle(spark, duck):
    """Batch sessionization on the real events table == an independent
    lag/cumsum SQL oracle in DuckDB."""
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    got = {
        tuple(r)
        for r in sessionize_batch(ev, gap_seconds=3600)
        .select(
            "user_id",
            F.col("session_start").cast("string"),
            F.col("session_end").cast("string"),
            "n_events",
            F.round("sum_value", 6),
        )
        .collect()
    }
    oracle = duck.execute(
        """
        WITH b AS (
          SELECT user_id, ts, value,
                 CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
                           > INTERVAL 3600 SECOND
                      OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                      THEN 1 ELSE 0 END AS boundary
          FROM events
        ), s AS (
          SELECT *, SUM(boundary) OVER (
                   PARTITION BY user_id ORDER BY ts
                   ROWS UNBOUNDED PRECEDING) AS session_seq
          FROM b
        )
        SELECT user_id, CAST(MIN(ts) AS VARCHAR), CAST(MAX(ts) AS VARCHAR),
               COUNT(*), ROUND(SUM(value), 6)
        FROM s GROUP BY user_id, session_seq
        """
    ).fetchall()
    assert got == {tuple(r) for r in oracle}


def test_sessionize_stream_matches_batch_on_closed_sessions(spark, tmp_path):
    """Every session the stream closes must appear, byte-identical, in the
    batch sessionization of the same events."""
    d = str(tmp_path / "sess2")
    _write_files(d, EV_PA, _session_events())
    ev_stream = (
        spark.readStream.schema(EVENT_SCHEMA).option("maxFilesPerTrigger", 1).parquet(d)
    )
    name = _run_to_memory(sessionize(ev_stream, gap_seconds=1800, watermark="1 minute"))
    streamed = {
        tuple(r)
        for r in spark.table(name)
        .select(
            "user_id",
            F.col("session_start").cast("string"),
            F.col("session_end").cast("string"),
            "n_events",
            "sum_value",
        )
        .collect()
    }
    batch = {
        tuple(r)
        for r in sessionize_batch(spark.read.parquet(d), gap_seconds=1800)
        .select(
            "user_id",
            F.col("session_start").cast("string"),
            F.col("session_end").cast("string"),
            "n_events",
            "sum_value",
        )
        .collect()
    }
    assert streamed <= batch


# ---------------------------------------------------------------------------
# windowed_event_counts
# ---------------------------------------------------------------------------


def test_windowed_counts_stream_complete_matches_batch(spark, tmp_path):
    d = str(tmp_path / "winev")
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet").limit(400)
    ev.repartition(3).write.mode("overwrite").parquet(d)
    stream = spark.readStream.schema(EVENT_SCHEMA).option("maxFilesPerTrigger", 1).parquet(d)
    name = _run_to_memory(windowed_event_counts(stream), mode="complete")
    cols = ["window_start", "window_end", "event_type", "n_events", "sum_value"]
    got = {
        (str(r[0]), str(r[1]), r[2], r[3], round(r[4], 6))
        for r in spark.table(name).select(*cols).collect()
    }
    want = {
        (str(r[0]), str(r[1]), r[2], r[3], round(r[4], 6))
        for r in windowed_event_counts(spark.read.parquet(d)).select(*cols).collect()
    }
    assert got == want


def test_windowed_counts_append_drops_late_rows(spark, tmp_path):
    """Late-event filtering lags the watermark by one batch (Spark >= 3.4
    uses the previous batch's watermark for lateness, the current one for
    eviction) — hence the spacer batch between the advance and the late
    row."""
    d = str(tmp_path / "winlate")
    _write_files(
        d,
        EV_PA,
        [
            [(1, _ts("2024-01-01 10:10"), 1, "view", 1.0),
             (2, _ts("2024-01-01 10:20"), 1, "view", 1.0)],
            # advances watermark (2h) far past the 10:00 window
            [(3, _ts("2024-01-02 12:00"), 1, "view", 1.0)],
            # spacer: makes the advanced watermark the LATE-EVENT watermark
            [(4, _ts("2024-01-02 12:30"), 1, "view", 1.0)],
            # LATE: behind even the late-event watermark -> dropped
            [(5, _ts("2024-01-01 10:30"), 1, "view", 100.0)],
            [(6, _ts("2024-01-03 12:00"), 1, "view", 1.0)],
        ],
    )
    stream = spark.readStream.schema(EVENT_SCHEMA).option("maxFilesPerTrigger", 1).parquet(d)
    name = _run_to_memory(windowed_event_counts(stream, watermark="2 hours"))
    rows = {
        (str(r.window_start), r.n_events, r.sum_value)
        for r in spark.table(name).collect()
    }
    # the 10:00 window finalized with the two on-time rows, and the late
    # row neither re-aggregated into it nor resurrected it as a new row
    assert ("2024-01-01 10:00:00", 2, 2.0) in rows
    assert not any(v in (100.0, 102.0) for (_, _, v) in rows)


def test_sessionize_late_event_extends_session_backwards(spark, tmp_path):
    """An out-of-order event that arrives a batch later but bridges the
    open session (within gap) extends session_start backwards — the
    interval-merge path (chunk-order-independent)."""
    d = str(tmp_path / "sess_late")
    _write_files(
        d,
        EV_PA,
        [
            [(1, _ts("2024-01-01 10:00"), 1, "view", 1.0)],
            # late vs event time but accepted (late-filter lags a batch):
            # bridges the open session -> start moves to 09:50
            [(2, _ts("2024-01-01 09:50"), 1, "view", 2.0)],
            [(3, _ts("2024-01-01 20:00"), 2, "view", 0.0)],
            [(4, _ts("2024-01-01 23:00"), 3, "view", 0.0)],
        ],
    )
    ev = spark.readStream.schema(EVENT_SCHEMA).option("maxFilesPerTrigger", 1).parquet(d)
    name = _run_to_memory(sessionize(ev, gap_seconds=1800, watermark="1 minute"))
    got = {
        (r.user_id, str(r.session_start), str(r.session_end), r.n_events, r.sum_value)
        for r in spark.table(name).collect()
    }
    assert (1, "2024-01-01 09:50:00", "2024-01-01 10:00:00", 2, 3.0) in got


def test_sessionize_bridge_event_merges_open_spans(spark, tmp_path):
    """An in-watermark out-of-order event that lands BETWEEN two open
    spans (within gap of both) merges them into one session — the r3
    eager-emit path would already have closed the earlier span and
    emitted overlapping/split rows, violating streamed <= batch."""
    d = str(tmp_path / "sess_bridge")
    _write_files(
        d,
        EV_PA,
        [
            # two spans >gap apart, same batch: 10:00 and 11:30 (gap 30m)
            [(1, _ts("2024-01-01 10:00"), 1, "view", 1.0),
             (2, _ts("2024-01-01 11:30"), 1, "view", 2.0)],
            # bridgers chain the two spans at exactly the gap (inclusive on
            # both stream and batch sides): 10:00-10:30-11:00-11:30
            [(3, _ts("2024-01-01 10:30"), 1, "view", 4.0),
             (4, _ts("2024-01-01 11:00"), 1, "view", 8.0)],
            # advance watermark so the merged session can close
            [(5, _ts("2024-01-01 20:00"), 2, "view", 0.0)],
            [(6, _ts("2024-01-01 23:00"), 3, "view", 0.0)],
        ],
    )
    ev = spark.readStream.schema(EVENT_SCHEMA).option("maxFilesPerTrigger", 1).parquet(d)
    name = _run_to_memory(sessionize(ev, gap_seconds=1800, watermark="1 minute"))
    got = {
        (r.user_id, str(r.session_start), str(r.session_end), r.n_events, r.sum_value)
        for r in spark.table(name).collect()
    }
    # one merged session 10:00..11:30 with all four events
    assert (1, "2024-01-01 10:00:00", "2024-01-01 11:30:00", 4, 15.0) in got
    # and no split fragments of user 1
    assert sum(1 for g in got if g[0] == 1) == 1
