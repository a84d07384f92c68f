#!/bin/bash
# Round-10 ingest certification pass: fresh sf1 + sf10 ingest attempts under
# the CURRENT two-barrier protocol.  Every attempt logged before r9's
# post-write recount barrier landed carries rc_post=None and is therefore
# uncertifiable by construction — the family needs at least one attempt that
# actually runs both barriers.  Long unconditional pre-idles reset the
# load-triggered throttle (see VERDICT r8/r9); compose-min now runs
# automatically after every attempt, so this script only loops until a
# certified attempt exists per sf.
set -u
cd /root/repo
LOG=.bench/scaling-r10.log
echo "=== r10 ingest certification pass start $(date -u +%FT%TZ)" >> "$LOG"

certified() {  # certified <sf> <band>
  python - "$1" "$2" <<'PY'
import json, sys
sf, band = sys.argv[1], float(sys.argv[2])
ok = False
for line in open(f'.bench/scaling-attempts-sf{sf}.jsonl'):
    q = json.loads(line).get('queries', {})
    pre = q.get('ingest_phase_cache_recount')
    post = q.get('ingest_phase_cache_recount_post_write')
    if pre is not None and post is not None and pre <= band and post <= band:
        ok = True
sys.exit(0 if ok else 1)
PY
}

for attempt in 1 2; do
  certified 1 5.0 && break
  echo "--- sf1 ingest attempt $attempt $(date -u +%FT%TZ)" >> "$LOG"
  sleep 240
  SPARK_DRIVER_MEMORY=48g KUPO_INGEST_WRITE_IDLE_S=120 \
    python tools/bench_scaling.py 1 --only ingest >> "$LOG" 2>&1
  echo "--- exit=$? $(date -u +%FT%TZ)" >> "$LOG"
done

for attempt in 1 2 3 4; do
  certified 10 7.0 && break
  echo "--- sf10 ingest attempt $attempt $(date -u +%FT%TZ)" >> "$LOG"
  sleep 300
  SPARK_DRIVER_MEMORY=48g KUPO_INGEST_WRITE_IDLE_S=180 \
    python tools/bench_scaling.py 10 --only ingest >> "$LOG" 2>&1
  echo "--- exit=$? $(date -u +%FT%TZ)" >> "$LOG"
done

for sf in 0.1 1 10; do
  python tools/bench_scaling.py "$sf" --compose-min >> "$LOG" 2>&1
done
python tools/bench_scaling.py --verify >> "$LOG" 2>&1
echo "=== r10 pass done $(date -u +%FT%TZ)" >> "$LOG"
