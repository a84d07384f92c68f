"""kupo_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of CardanoSolutions/kupo (a Cardano chain-index).

Architecture (Spark-first, not a port):

- ``chaingen``   — adapter that derives a deterministic, kupo-shaped block
  stream (PartialBlock shape, see /root/reference/src/Kupo/Data/PartialBlock.hs:35-50)
  from the driver's synthetic ``events`` table.  Plays the role of kupo's
  era-normalizing block decoders (reference ``src/Kupo/Data/Cardano.hs:162-491``).
- ``patterns``   — the Pattern language: parse/print/algebra + compilation to
  Spark ``Column`` predicates (reference ``src/Kupo/Data/Pattern.hs:115-381``).
- ``operators``  — the engine: ``indexer`` (matchBlock → 6 index tables,
  reference ``src/Kupo/Data/Pattern.hs:561-641``), ``fold_inputs`` (the main
  read query, reference ``src/Kupo/App/Database/SQLite.hs:919-1003``),
  ``checkpoints`` (ancestor/sampling lookups), ``maintenance`` (rollback,
  GC/pruning — reference ``SQLite.hs:799-883``).
- ``functions``  — LLM-data-pipeline operators (dedup, similarity search,
  text analysis, multimodal plumbing) built on the same tables.
- ``oracle``     — DuckDB SQL statements of the *expected* results, used by
  the correctness harness to hash-compare engine output.

Everything is DataFrame/Catalyst-native: pattern predicates compile to
``Column`` expressions so parquet scans get pushdown; dimension joins are
broadcast; the spent-resolution join is an equi-join on ``output_reference``
that buckets cleanly at scale.
"""

__version__ = "0.1.0"
