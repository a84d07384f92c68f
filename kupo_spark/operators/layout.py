"""Z-order (Morton-curve) file layout for multi-column data skipping.

A sorted layout gives file-level min/max pruning on ONE leading column;
every other predicate scans all files.  Interleaving the bits of several
columns' grid coordinates (the Morton curve — Morton 1966; the layout
Delta Lake's OPTIMIZE ZORDER BY popularized) keeps files "cubic" in the
value space, so min/max stats stay tight on EVERY participating column
and a point/range predicate on any of them prunes ~(#files)^(1-1/d).

Spark-first construction, no UDFs and no global ranking window:

1. per-column grid coordinate: values scale into 2^bits buckets via
   min/max collected in one tiny agg (skew-heavy columns can pass
   explicit ``boundaries`` instead — an approx-quantile CDF lookup built
   from array arithmetic, still codegen);
2. the z-value is a pure bit-interleave expression (shift/or terms,
   whole-stage codegen);
3. ``repartitionByRange(z)`` + ``sortWithinPartitions(z)`` lays files
   out along the curve — range partitioning samples the z column, no
   single-reducer sort.

Used with :class:`kupo_spark.table.Table`, whose per-file min/max stats
the reader prunes on BEFORE listing files; ``tests/test_layout.py``
measures the pruning win on both dimensions against a linear sort.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["zorder_by", "z_value"]


def _grid(col: str, lo, hi, bits: int) -> Column:
    """Value → integer grid coordinate in [0, 2^bits)."""
    buckets = (1 << bits) - 1
    c = F.col(col).cast("double")
    # lo/hi are None on an empty frame or an all-NULL column — treat both
    # like a constant column (everything in cell 0) instead of TypeError
    if lo is None or hi is None or hi <= lo:
        return F.lit(0).cast("bigint")
    scaled = (c - F.lit(float(lo))) / F.lit(float(hi - lo)) * buckets
    return F.least(
        F.greatest(F.round(scaled).cast("bigint"), F.lit(0)), F.lit(buckets)
    )


def _cdf_grid(col: str, boundaries: list[float], bits: int) -> Column:
    """Skew-robust variant: coordinate = #boundaries below the value
    (an approx-quantile CDF), computed with array arithmetic."""
    buckets = (1 << bits) - 1
    arr = F.array(*[F.lit(float(b)) for b in sorted(boundaries)[:buckets]])
    return F.aggregate(
        arr,
        F.lit(0).cast("bigint"),
        lambda acc, b: acc + F.when(F.col(col).cast("double") >= b, 1).otherwise(0),
    )


def z_value(
    df: DataFrame,
    cols: list[str],
    bits: int = 8,
    boundaries: dict[str, list[float]] | None = None,
) -> Column:
    """The Morton interleave of ``cols``'s grid coordinates as a single
    bigint column expression (pure codegen: 2^bits grids, bits×#cols
    shift/or terms)."""
    if not cols:
        raise ValueError("zorder needs at least one column")
    if bits * len(cols) > 62:
        raise ValueError(f"bits={bits} × {len(cols)} cols exceeds int64")
    boundaries = boundaries or {}
    stats = None
    need_minmax = [c for c in cols if c not in boundaries]
    if need_minmax:
        row = df.agg(
            *[F.min(F.col(c).cast("double")).alias(f"lo_{c}") for c in need_minmax],
            *[F.max(F.col(c).cast("double")).alias(f"hi_{c}") for c in need_minmax],
        ).collect()[0]
        stats = row.asDict()
    z = F.lit(0).cast("bigint")
    for i, c in enumerate(cols):
        if c in boundaries:
            g = _cdf_grid(c, boundaries[c], bits)
        else:
            g = _grid(c, stats[f"lo_{c}"], stats[f"hi_{c}"], bits)
        # NULL values produce a NULL coordinate which would nullify the whole
        # interleave — pin them to cell 0 alongside the out-of-range clamp
        g = F.coalesce(g, F.lit(0).cast("bigint"))
        for j in range(bits):
            bit = F.shiftright(g, j).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, j * len(cols) + i))
    return z


def zorder_by(
    df: DataFrame,
    cols: list[str],
    n_files: int = 16,
    bits: int = 8,
    boundaries: dict[str, list[float]] | None = None,
) -> DataFrame:
    """Return ``df`` repartitioned+sorted along the Morton curve of
    ``cols``, ready to write: each output file covers a compact z-range,
    i.e. a small hyper-rectangle of the value space, so per-file min/max
    stats prune on every column in ``cols``."""
    z = z_value(df, cols, bits, boundaries).alias("_z")
    return (
        df.withColumn("_z", z)
        .repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
    )
