#!/bin/bash
# Round-9 unified scaling protocol (VERDICT r8 #1/#2): the SAME chunked +
# compose-min machinery at every sf point, every attempt gated on the
# FIRST post-settle calibration probe; sf10's ingest chunk idles between
# the build and write legs so the write runs inside a fresh pre-throttle
# window.  Two attempts per (sf, family); compose-min per sf at the end.
set -u
cd /root/repo
LOG=.bench/scaling-r9.log
echo "=== r9 scaling run start $(date -u +%FT%TZ)" >> "$LOG"
for attempt in 1 2; do
  for sf in 0.1 1 10; do
    for chunk in ingest shapes serving pipeline ann; do
      idle=0
      if [ "$sf" = "10" ] && [ "$chunk" = "ingest" ]; then idle=180; fi
      echo "--- attempt $attempt sf$sf $chunk (idle=$idle) $(date -u +%FT%TZ)" >> "$LOG"
      SPARK_DRIVER_MEMORY=48g KUPO_INGEST_WRITE_IDLE_S=$idle \
        python tools/bench_scaling.py "$sf" --only "$chunk" >> "$LOG" 2>&1
      echo "--- exit=$? $(date -u +%FT%TZ)" >> "$LOG"
    done
  done
done
for sf in 0.1 1 10; do
  echo "=== compose-min sf$sf" >> "$LOG"
  python tools/bench_scaling.py "$sf" --compose-min >> "$LOG" 2>&1
  echo "=== compose exit=$? " >> "$LOG"
done
echo "=== r9 scaling run done $(date -u +%FT%TZ)" >> "$LOG"
