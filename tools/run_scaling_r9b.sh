#!/bin/bash
# Targeted sf10 pass: long unconditional pre-idles (the back-to-back chunk
# cadence of the first pass triggered load-based throttle that the
# single-shot pre-probe cannot see), repeated ingest attempts until both
# recount barriers certify one, plus one fresh shapes + serving attempt.
set -u
cd /root/repo
LOG=.bench/scaling-r9.log
echo "=== r9b targeted sf10 pass start $(date -u +%FT%TZ)" >> "$LOG"
for round in 3 4; do
  for chunk in ingest shapes serving; do
    echo "--- attempt $round sf10 $chunk (targeted) $(date -u +%FT%TZ)" >> "$LOG"
    sleep 240   # unconditional cool-down: reset the load-triggered throttle
    SPARK_DRIVER_MEMORY=48g KUPO_INGEST_WRITE_IDLE_S=180 \
      KUPO_SERVING_WARM_IDLE_S=180 \
      python tools/bench_scaling.py 10 --only "$chunk" >> "$LOG" 2>&1
    echo "--- exit=$? $(date -u +%FT%TZ)" >> "$LOG"
  done
  # stop early if an ingest attempt certified (both barriers clean)
  python - <<'PY' && break
import json, sys
band = 7.0
ok = False
for line in open('.bench/scaling-attempts-sf10.jsonl'):
    q = json.loads(line).get('queries', {})
    pre, post = q.get('ingest_phase_cache_recount'), q.get('ingest_phase_cache_recount_post_write')
    if pre is not None and post is not None and pre <= band and post <= band:
        ok = True
sys.exit(0 if ok else 1)
PY
done
for sf in 0.1 1 10; do
  python tools/bench_scaling.py "$sf" --compose-min >> "$LOG" 2>&1
done
echo "=== r9b done $(date -u +%FT%TZ)" >> "$LOG"
