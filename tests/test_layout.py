"""Z-order layout: multi-dimensional file pruning through the Table
format's log-level min/max stats, measured against a linear sort."""

from __future__ import annotations

from pyspark.sql import functions as F

from kupo_spark.operators.layout import zorder_by
from kupo_spark.table import Table, _stats_of

SF_DIR = "/root/testdata/sf0.001"


def _mk_table(spark, path, df):
    t = Table.create(str(path), df.schema)
    t.append(df)
    return t


def _files_kept(t, pred):
    snap = t.snapshot()
    kept = [a for a in snap.files if pred(_stats_of(a))]
    return len(kept), len(snap.files)


def _user_pred(lo, hi):
    def p(stats):
        mins, maxs = stats.get("minValues", {}), stats.get("maxValues", {})
        if "user_id" not in mins:
            return True
        return not (maxs["user_id"] < lo or mins["user_id"] > hi)

    return p


def _value_pred(lo, hi):
    def p(stats):
        mins, maxs = stats.get("minValues", {}), stats.get("maxValues", {})
        if "value" not in mins:
            return True
        return not (maxs["value"] < lo or mins["value"] > hi)

    return p


def test_zorder_prunes_both_dimensions(spark, tmp_path):
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").select(
        "event_id", "user_id", "value"
    )
    zt = _mk_table(spark, tmp_path / "z", zorder_by(ev, ["user_id", "value"], n_files=16))
    lt = _mk_table(
        spark,
        tmp_path / "lin",
        ev.repartitionByRange(16, "user_id").sortWithinPartitions("user_id"),
    )

    lo_u, hi_u = 10, 12
    stats = ev.agg(F.min("value"), F.max("value")).collect()[0]
    span = stats[1] - stats[0]
    lo_v, hi_v = stats[0] + 0.4 * span, stats[0] + 0.45 * span

    zu, ztot = _files_kept(zt, _user_pred(lo_u, hi_u))
    zv, _ = _files_kept(zt, _value_pred(lo_v, hi_v))
    lu, ltot = _files_kept(lt, _user_pred(lo_u, hi_u))
    lv, _ = _files_kept(lt, _value_pred(lo_v, hi_v))

    # range partitioning may emit fewer files (empty ranges write none)
    assert ztot >= 8 and ltot >= 8
    # z-order prunes on BOTH dimensions
    assert zu < ztot and zv < ztot
    # the linear layout prunes user_id harder but cannot prune value;
    # z-order must beat it on the non-sort dimension
    assert zv < lv
    assert lv >= ltot - 1  # linear: value stats span everything


def test_zorder_pruned_read_is_exact(spark, tmp_path):
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").select(
        "event_id", "user_id", "value"
    )
    zt = _mk_table(spark, tmp_path / "z2", zorder_by(ev, ["user_id", "value"], n_files=8))
    pred = _user_pred(5, 9)
    pruned = zt.read(spark, stats_filter=pred).where("user_id between 5 and 9")
    full = zt.read(spark).where("user_id between 5 and 9")
    assert {tuple(r) for r in pruned.collect()} == {tuple(r) for r in full.collect()}


def test_zorder_boundaries_variant_and_validation(spark):
    import pytest

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").select(
        "event_id", "user_id", "value"
    )
    from kupo_spark.operators.layout import z_value

    # skew-robust CDF grid accepts explicit boundaries
    z = zorder_by(ev, ["user_id", "value"], boundaries={"value": [0.0, 10.0, 100.0]})
    assert z.count() == ev.count()
    with pytest.raises(ValueError):
        z_value(ev, [])
    with pytest.raises(ValueError):
        z_value(ev, ["user_id", "value"], bits=32)


def test_zorder_empty_and_null_inputs(spark):
    """Empty frame: min/max collect as None -> constant-column grid (no
    TypeError). NULL cells: coalesced to cell 0, never a NULL z-value."""
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").select(
        "event_id", "user_id", "value"
    )
    empty = ev.where(F.lit(False))
    assert zorder_by(empty, ["user_id", "value"], n_files=4).count() == 0

    withnull = ev.limit(50).withColumn(
        "value", F.when(F.col("event_id") % 2 == 0, F.col("value"))
    )
    from kupo_spark.operators.layout import z_value

    zdf = withnull.select(z_value(withnull, ["user_id", "value"]).alias("z"))
    assert zdf.where(F.col("z").isNull()).count() == 0
    # all-NULL column behaves like a constant column
    allnull = ev.limit(20).withColumn("value", F.lit(None).cast("double"))
    assert zorder_by(allnull, ["user_id", "value"], n_files=2).count() == 20
