#!/bin/bash
# Round-10 final ingest pass: SLICED sf10 write (every unsliced attempt
# certified the build and lost the write — the 32-thread write leg alone
# crosses the host's load-triggered throttle onset; 4 bucket-range
# sub-writes of ~15-18 s each fit inside fresh windows), then fresh sf0.1
# attempts so its certified-name minima get competition from clean builds
# (the one both-barrier sf0.1 attempt on record carries a throttled 90 s
# build).
set -u
cd /root/repo
LOG=.bench/scaling-r10.log
echo "=== r10c sliced pass start $(date -u +%FT%TZ)" >> "$LOG"
sleep 600  # rest after the foreground correctness gate

for attempt in 1 2; do
  python - <<'PY' && break
import json, sys
ok = False
for line in open('.bench/scaling-attempts-sf10.jsonl'):
    q = json.loads(line).get('queries', {})
    pre, post = q.get('ingest_phase_cache_recount'), q.get('ingest_phase_cache_recount_post_write')
    sl = q.get('ingest_write_slice_recount_max')
    if pre is not None and post is not None and pre <= 7.0 and post <= 7.0 and (sl is None or sl <= 7.0):
        ok = True
sys.exit(0 if ok else 1)
PY
  echo "--- sf10 SLICED ingest attempt $attempt (r10c) $(date -u +%FT%TZ)" >> "$LOG"
  SPARK_DRIVER_MEMORY=48g KUPO_INGEST_WRITE_IDLE_S=150 \
    KUPO_INGEST_WRITE_SLICES=4 \
    python tools/bench_scaling.py 10 --only ingest >> "$LOG" 2>&1
  echo "--- exit=$? $(date -u +%FT%TZ)" >> "$LOG"
  sleep 420
done

for attempt in 1 2; do
  echo "--- sf0.1 ingest attempt $attempt (r10c) $(date -u +%FT%TZ)" >> "$LOG"
  sleep 240
  SPARK_DRIVER_MEMORY=48g python tools/bench_scaling.py 0.1 --only ingest >> "$LOG" 2>&1
  echo "--- exit=$? $(date -u +%FT%TZ)" >> "$LOG"
done

for sf in 0.1 1 10; do
  python tools/bench_scaling.py "$sf" --compose-min >> "$LOG" 2>&1
done
python tools/bench_scaling.py --verify >> "$LOG" 2>&1
echo "=== r10c done $(date -u +%FT%TZ)" >> "$LOG"
