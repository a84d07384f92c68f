"""Deterministic sampling and benchmark-contamination detection.

Two pipeline stages every pretraining corpus build runs between curation
and packing:

- **Reproducible sampling / data mixing.**  `rand()`-based sampling is
  run-dependent (partition order, task retries); a corpus recipe must be
  re-derivable.  `deterministic_sample` keeps a row iff the md5 of
  ``seed‖doc_id`` falls under the fraction threshold — a pure projection
  + filter, bit-identical across engines (DuckDB's md5 agrees with
  Spark's on the same string, so the oracle reproduces the exact row
  set), stable under retries, repartitioning, and cluster size.
  `mix_by_source` applies per-source fractions (the data-mixing recipe:
  "webcrawl 0.6, books 1.0, code 0.3") the same way.

- **Benchmark contamination.**  Training corpora must not contain the
  eval benchmarks (GPT-3 paper §4 and successors run exactly this
  n-gram-overlap check).  `contamination` flags documents sharing ≥
  ``min_hits`` word n-grams with any benchmark text: benchmark shingles
  are tiny by contract → broadcast semi-style join against the corpus
  shingle explode, one shuffle-free probe per shingle, then one groupBy
  on the (rare) hits.  Shingle construction matches ``dedup.SHINGLE``
  so counts agree with the near-dup family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

__all__ = [
    "deterministic_sample", "mix_by_source", "contamination",
    "md5_key", "key_prefix_int",
]

#: md5 is 128-bit; compare on the first 15 hex digits (60 bits) as int —
#: exact in int64, same arithmetic both engines
_MOD = 1 << 60


def md5_key(seed: str, id_col: str = "doc_id") -> F.Column:
    """md5(seed:id) — THE hash family of the deterministic-draw stages
    (sampling, mixing, shard export).  The seed is bound as a literal
    column (never interpolated into SQL text — a quote in the seed must
    stay data, not syntax) and the ':' separator keeps prefix-extending
    seeds from colliding."""
    return F.md5(F.concat(F.lit(seed), F.lit(":"), F.col(id_col).cast("string")))


def key_prefix_int(key: F.Column) -> F.Column:
    """First 60 bits of the hex digest as a non-negative int64 (exact in
    int64, same arithmetic in DuckDB)."""
    return F.conv(F.substring(key, 1, 15), 16, 10).cast("bigint")


def _keep(seed: str, fraction) -> F.Column:
    h = key_prefix_int(md5_key(seed))
    return h < (F.lit(_MOD).cast("double") * fraction).cast("bigint")


def deterministic_sample(
    docs: DataFrame, fraction: float, seed: str = "0"
) -> DataFrame:
    """Keep ≈``fraction`` of documents, chosen by content-independent
    hash — reproducible across runs, engines, partitionings."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0,1], got {fraction}")
    return docs.where(_keep(seed, F.lit(float(fraction))))


def mix_by_source(
    docs: DataFrame,
    fractions: dict[str, float],
    seed: str = "0",
    source_col: str = "source",
    default: float = 0.0,
) -> DataFrame:
    """Per-source sampling rates — the data-mixing recipe.  Sources not
    in ``fractions`` get ``default``.  Same hash family as
    :func:`deterministic_sample`, so mixes are reproducible and disjoint
    seeds give independent draws."""
    bad = {s: f for s, f in {**fractions, "<default>": default}.items()
           if not 0.0 <= f <= 1.0}
    if bad:
        raise ValueError(f"fractions must be in [0,1], got {bad}")
    rate = F.lit(float(default))
    for src, f in sorted(fractions.items()):
        rate = F.when(F.col(source_col) == src, F.lit(float(f))).otherwise(rate)
    return docs.where(_keep(seed, rate))


def sample_sql(fraction: float, seed: str = "0") -> str:
    """DuckDB oracle for :func:`deterministic_sample` over `documents`."""
    thresh = int((1 << 60) * fraction)
    quoted = seed.replace("'", "''")
    return f"""
SELECT * FROM documents
WHERE CAST(('0x' || substr(md5('{quoted}' || ':' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT)
      < {thresh}
"""


def mix_by_source_sql(
    fractions: dict[str, float],
    seed: str = "0",
    default: float = 0.0,
    source_col: str = "source",
) -> str:
    """DuckDB oracle for :func:`mix_by_source` over `documents` — same
    per-source thresholds (int64-truncated 60-bit products)."""
    quoted = seed.replace("'", "''")
    key = f"md5('{quoted}' || ':' || CAST(doc_id AS VARCHAR))"
    default_thresh = int(float(_MOD) * float(default))
    if not fractions:
        # a CASE with zero WHEN arms is invalid SQL — mirror the Spark
        # side (mix_by_source with {} is a bare default-threshold filter)
        thresh_expr = str(default_thresh)
    else:
        whens = " ".join(
            f"WHEN '{s}' THEN {int(float(_MOD) * float(f))}"
            for s, f in sorted(fractions.items())
        )
        thresh_expr = f"CASE {source_col} {whens} ELSE {default_thresh} END"
    return f"""
SELECT * FROM documents
WHERE CAST(('0x' || substr({key}, 1, 15)) AS BIGINT)
      < {thresh_expr}
"""


def contamination_sql(
    benchmark_texts: list[str], n: int = 3, min_hits: int = 1
) -> str:
    """DuckDB oracle for :func:`contamination` — the benchmark shingle
    set is built HERE with the operator's exact rule and injected as
    VALUES; the corpus side reuses the shared 3-shingle CTE."""
    if n != 3:
        raise ValueError("oracle shares the k=3 shingle CTE")
    from kupo_spark.oracle_pipeline import SHINGLES_CTE

    bench: set[str] = set()
    for t in benchmark_texts:
        toks = [w for w in t.split(" ") if w]
        bench.update(" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1))
    if not bench:
        # `VALUES ` with zero tuples is invalid SQL — mirror the Spark
        # side's empty-benchmark short-circuit (constant 0/false verdict)
        return """
SELECT doc_id,
       CAST(0 AS BIGINT) AS n_contaminated_shingles,
       FALSE AS contaminated
FROM documents
"""
    vals = ", ".join("('" + s.replace("'", "''") + "')" for s in sorted(bench))
    return f"""
WITH {SHINGLES_CTE},
bench(sh) AS (SELECT * FROM (VALUES {vals})),
hits AS (
  SELECT s.doc_id, count(*) AS nhit
  FROM shingles s JOIN bench b ON b.sh = s.sh
  GROUP BY 1
)
SELECT d.doc_id,
       CAST(coalesce(h.nhit, 0) AS BIGINT) AS n_contaminated_shingles,
       coalesce(h.nhit, 0) >= {min_hits} AS contaminated
FROM documents d
LEFT JOIN hits h ON h.doc_id = d.doc_id
"""


def contamination(
    docs: DataFrame,
    benchmark_texts: list[str],
    n: int = 3,
    min_hits: int = 1,
    sh: DataFrame | None = None,
) -> DataFrame:
    """(doc_id, n_contaminated_shingles, contaminated): documents sharing
    ≥ ``min_hits`` distinct word ``n``-grams with any benchmark text.

    The benchmark shingle set is built driver-side (eval suites are KB-
    scale by contract) and broadcast; the corpus side is
    :func:`dedup.shingle_stream` — pass a pre-computed/persisted ``sh``
    frame to share one materialized shingle table with the near-dup pass
    at 100 TB (the same ``sh=`` convention as the MinHash pipeline).

    The default feed is the NON-distinct shingle stream (r11, guide
    §2.3/§2.4): the broadcast bench join filters the corpus stream down to
    matched rows before any exchange, and per-doc distinctness is then
    computed over the survivors only (``countDistinct``), so the
    corpus-wide ``dropDuplicates`` shuffle the old ``shingles`` feed paid
    is gone — the only exchange over corpus-derived rows carries hits.
    Filter-then-distinct ≡ distinct-then-filter for the row-level bench
    predicate, so the counts are identical (pinned by
    ``test_contamination_counts_distinct_shingles``)."""
    from kupo_spark.functions.dedup import shingle_stream as _shingle_stream

    bench: set[str] = set()
    for t in benchmark_texts:
        toks = [w for w in t.split(" ") if w]
        bench.update(
            " ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)
        )
    if not bench:
        return docs.select(
            "doc_id",
            F.lit(0).cast("bigint").alias("n_contaminated_shingles"),
            F.lit(False).alias("contaminated"),
        )
    spark = docs.sparkSession
    bench_df = broadcast(
        spark.createDataFrame([(s,) for s in sorted(bench)], "sh string")
    )
    hits = (
        (sh if sh is not None else _shingle_stream(docs, n))
        .join(bench_df, "sh")
        .groupBy("doc_id")
        # countDistinct, not count: the default feed is non-distinct (the
        # dedup now happens post-filter, over hit rows only); a caller's
        # pre-distinct ``sh`` frame counts identically either way
        .agg(F.countDistinct("sh").alias("n_contaminated_shingles"))
    )
    found = F.coalesce("n_contaminated_shingles", F.lit(0).cast("bigint"))
    return (
        docs.select("doc_id")
        .join(hits, "doc_id", "left")
        .select(
            "doc_id",
            found.alias("n_contaminated_shingles"),
            (found >= min_hits).alias("contaminated"),
        )
    )
