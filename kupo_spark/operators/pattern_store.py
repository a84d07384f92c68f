"""Active-pattern-set management — W7 insertPatterns/deletePattern plus the
HTTP pattern endpoints' semantics.

Reference: patterns table (``db/v1.0.0/002.sql``), writes at
``SQLite.hs:779-792``.  Two distinct delete operations:

* ``DELETE /matches/{pattern}`` (``Http.hs:686-704``) deletes *index rows*
  and is REFUSED whenever the pattern overlaps any active pattern
  (``p `overlaps` patterns -> Errors.stillActivePattern``) — deleting rows
  still covered by an active pattern would silently corrupt the index.
* ``DELETE /patterns/{p}`` removes the pattern from the active set,
  unguarded.

``GET /patterns/{p}`` lists active patterns that fully *include* p
(``Http.hs:416`` uses ``included``, not ``overlaps``).
"""

from __future__ import annotations

from pathlib import Path

from kupo_spark.patterns import (
    Pattern,
    PatternError,
    included,
    overlaps,
    pattern_from_text,
    pattern_to_text,
)


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

    def guard_delete_matches(self, pattern: Pattern | str) -> Pattern:
        """DELETE /matches/{pattern} guard (Http.hs:697-699): REFUSE when the
        pattern overlaps ANY active pattern — those rows are still live.
        Returns the parsed pattern when deletion of its rows is safe."""
        p = pattern_from_text(pattern) if isinstance(pattern, str) else pattern
        pats = self.list()
        if any(overlaps(p, q) for q in pats):
            raise PatternError(
                f"refusing to delete matches of {pattern_to_text(p)!r}: "
                "still overlaps an active pattern (Errors.stillActivePattern)"
            )
        return p

    def remove(self, pattern: Pattern | str) -> list[Pattern]:
        """DELETE /patterns/{p}: drop the pattern from the active set —
        unguarded (the index rows stay; they just stop being extended)."""
        p = pattern_from_text(pattern) if isinstance(pattern, str) else pattern
        remaining = [q for q in self.list() if q != p]
        self._write(remaining)
        return remaining

    # backwards-compatible alias for the round-1 API
    delete = remove

    def matching(self, pattern: Pattern | str) -> list[Pattern]:
        """GET /patterns/{p}: active patterns that fully INCLUDE p
        (Http.hs:416 uses `included`, not `overlaps`)."""
        p = pattern_from_text(pattern) if isinstance(pattern, str) else pattern
        return included(p, self.list())
