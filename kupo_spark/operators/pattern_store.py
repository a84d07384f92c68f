"""Active-pattern-set management — W7 insertPatterns/deletePattern plus the
HTTP pattern endpoints' semantics.

Reference: patterns table (``db/v1.0.0/002.sql``), writes at
``SQLite.hs:779-792``; ``DELETE /matches/{pattern}`` is guarded by the
subsumption algebra (only patterns *included* in the active set may be
deleted — ``src/Kupo/App/Http.hs:686-704`` via ``includes``,
``Pattern.hs:183-221``); ``GET /patterns/{p}`` lists active patterns
overlapping p.
"""

from __future__ import annotations

from pathlib import Path

from kupo_spark.patterns import Pattern, PatternError, includes, overlaps, pattern_from_text, pattern_to_text


class PatternStore:
    """Tiny config table (file-backed; a 1-row-per-pattern parquet/Delta
    table in production — it is broadcast-sized by definition)."""

    def __init__(self, path: str):
        self._file = Path(path)
        self._file.parent.mkdir(parents=True, exist_ok=True)

    def list(self) -> list[Pattern]:
        if not self._file.exists():
            return []
        return [
            pattern_from_text(line)
            for line in self._file.read_text().splitlines()
            if line.strip()
        ]

    def _write(self, pats: list[Pattern]) -> None:
        self._file.write_text("\n".join(sorted(pattern_to_text(p) for p in pats)) + "\n")

    def add(self, pattern: Pattern | str) -> list[Pattern]:
        p = pattern_from_text(pattern) if isinstance(pattern, str) else pattern
        pats = self.list()
        if p not in pats:
            pats.append(p)
            self._write(pats)
        return pats

    def delete(self, pattern: Pattern | str) -> list[Pattern]:
        """Guarded delete: refuse unless the pattern is subsumed by the
        active set (deleting rows outside every active pattern would corrupt
        the index — Http.hs:693-704)."""
        p = pattern_from_text(pattern) if isinstance(pattern, str) else pattern
        pats = self.list()
        if not any(includes(q, p) for q in pats):
            raise PatternError(
                f"refusing to delete {pattern_to_text(p)!r}: not included in any active pattern"
            )
        remaining = [q for q in pats if q != p]
        self._write(remaining)
        return remaining

    def matching(self, pattern: Pattern | str) -> list[Pattern]:
        """GET /patterns/{p}: active patterns overlapping p."""
        p = pattern_from_text(pattern) if isinstance(pattern, str) else pattern
        return [q for q in self.list() if overlaps(q, p)]
