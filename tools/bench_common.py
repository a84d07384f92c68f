"""Shared compose-min machinery for the per-round bench artifacts.

VERDICT r10 #1/#2: SCALING.json became trustworthy when runs stopped
writing values directly and instead appended a gated attempt to a log,
with the committed value always the per-query min across in-band attempts
of the same code.  The per-round BENCH capture and HTTP_BENCH.json did not
use that protocol and paid for it twice in round 10: the committed BENCH
headline doubled on a host that was degraded-but-inside the 1.2 s memcopy
band (pre-calib 1.028 s vs healthy 0.83-0.96 s), and the driver's
end-of-round run overwrote a settled HTTP refresh with a band-edge 2x
slower capture.  This module gives both artifacts the same discipline:

- every run APPENDS its capture to ``.bench/bench-attempts-sf{N}.jsonl`` /
  ``.bench/http-attempts.jsonl``;
- the published values are composed per-query (BENCH) / per-shape (HTTP)
  minima across IN-BAND attempts measured on IDENTICAL code (content
  fingerprint, so uncommitted edits count);
- a refresh can therefore only LOWER a committed number — a degraded
  capture of unchanged code composes against the better prior attempts
  instead of replacing them.

Why min is honest here: this host's degradation is load-triggered
(memory: host-load-triggered-throttling — 2-10x throttle after ~2-4 min of
sustained 32-thread JVM load), so mid-run throttle inflates a varying
subset of queries while the pre-run bracket passes; the per-query min
across bracket-gated attempts converges to the healthy-host number as
attempts accumulate, and the full spread is published beside it.
"""

from __future__ import annotations

import hashlib
import json
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

#: files whose CONTENT defines measurement comparability: two attempts
#: min-compose only when every byte of the engine + the bench protocol
#: matches.  A content hash, not git HEAD — uncommitted edits change it.
_FINGERPRINT_GLOBS = ("kupo_spark/**/*.py", "bench.py", "tools/bench_http.py")

#: stricter eligibility band than bench_scaling's 1.2 s settle/quarantine
#: band (VERDICT r10 #1: the doubled headline rode in at memcopy 1.028 s —
#: inside 1.2, ~25% above the healthy 0.83-0.96 s readings, which under a
#: live 32-thread JVM is a ~2x multiplier on timed queries).  The settle
#: loop still waits on 1.2 (a run must finish either way); composition
#: additionally refuses to let a 1.0-1.2 s capture define a committed
#: value when a cleaner attempt of the same code exists.
ELIGIBLE_MEMCOPY_S = 1.0


def engine_fingerprint() -> str:
    h = hashlib.sha256()
    for pat in _FINGERPRINT_GLOBS:
        for p in sorted(REPO.glob(pat)):
            if "__pycache__" in p.parts:
                continue
            h.update(str(p.relative_to(REPO)).encode())
            h.update(b"\0")
            h.update(p.read_bytes())
            h.update(b"\0")
    return h.hexdigest()[:16]


def append_attempt(log_name: str, attempt: dict) -> Path:
    path = REPO / ".bench" / log_name
    path.parent.mkdir(parents=True, exist_ok=True)
    with path.open("a") as fh:
        fh.write(json.dumps(attempt) + "\n")
    return path


def load_attempts(log_name: str) -> list[dict]:
    path = REPO / ".bench" / log_name
    if not path.exists():
        return []
    return [
        json.loads(line)
        for line in path.read_text().splitlines()
        if line.strip()
    ]


def compose_query_mins(
    attempts: list[dict],
    fp: str,
    sf,
    keys,
    cpus: int = 32,
) -> tuple[dict, dict, int, bool]:
    """Per-query min across eligible attempts (same fingerprint + sf +
    CORE COUNT, pre-run memcopy inside :data:`ELIGIBLE_MEMCOPY_S`),
    restricted to ``keys`` (the CURRENT protocol's query set — stale keys
    from older protocols never leak in).  Falls back to all same-code
    attempts when none are eligible (disclosed via the returned flag): a
    min over degraded samples is still an upper bound, and hiding the
    family would be worse.  Returns (mins, spread, n_composed,
    degraded_only).

    ``cpus`` keys the pool by ``SPARK_GRAFT_CPUS``: the driver re-runs
    the bench at a LOWER core count to measure per-core scaling, and
    composing that run against the full-host minima would publish
    big-host numbers under the small-host capture — the compose-protocol
    analog of hard-coding the master.  Attempts that predate the field
    were all captured at 32 cores and are treated as such."""

    def _same_code(a):
        return (
            a.get("engine_fp") == fp
            and a.get("sf") == sf
            and int(a.get("cpus", 32)) == int(cpus)
        )

    def _in_band(a):
        pre = (a.get("host_calibration_pre") or {}).get("calib_memcopy_2gb_s")
        return pre is not None and pre <= ELIGIBLE_MEMCOPY_S

    same = [a for a in attempts if _same_code(a)]
    eligible = [a for a in same if _in_band(a)]
    degraded_only = not eligible
    pool = eligible or same
    mins: dict = {}
    spread: dict = {}
    for a in pool:
        for k, v in (a.get("queries") or {}).items():
            if k not in keys or not isinstance(v, (int, float)):
                continue
            s = spread.setdefault(k, {"min": v, "max": v, "n": 0})
            s["min"] = min(s["min"], v)
            s["max"] = max(s["max"], v)
            s["n"] += 1
            mins[k] = s["min"]
    return mins, spread, len(pool), degraded_only
