"""Tests for copy/export (W8), replica (S7), pattern store (W7/P13 guard),
collateral semantics (S8) and JSON rendering (C7)."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from kupo_spark import chainspec as cs
from kupo_spark.operators.copy import copy_index, open_replica
from kupo_spark.operators.indexer import build_index, exploded_outputs, spent_refs
from kupo_spark.operators.pattern_store import PatternStore
from kupo_spark.operators.serve import health, result_json
from kupo_spark.patterns import PatternError, pattern_from_text, to_column


def test_copy_index_filters_everything(spark, index, tmp_path):
    pat = f"{cs.payment_credential_of(13)}/*"
    dest = str(tmp_path / "copy")
    copy_index(index, [pat], dest, slot_bucket=50)
    replica = open_replica(spark, dest, slot_bucket=50)
    # every surviving row matches; the replica session serves it read-only
    p = pattern_from_text(pat)
    assert replica.inputs.where(~to_column(p)).count() == 0
    assert replica.inputs.count() == index.inputs.where(to_column(p)).count()
    # dictionary GC on the way out: all payloads referenced
    refs = replica.inputs.where(F.col("datum_hash").isNotNull()).select(
        F.col("datum_hash").alias("binary_data_hash")
    )
    assert replica.binary_data.join(refs, "binary_data_hash", "left_anti").count() == 0


def test_pattern_store_delete_matches_guard(tmp_path):
    """DELETE /matches is refused while the pattern overlaps any active
    pattern (Http.hs:697-699); with the common active set {'*'} every
    delete is refused."""
    ps = PatternStore(str(tmp_path / "patterns.txt"))
    ps.add("*")
    cred = "a" * 56
    with pytest.raises(PatternError):
        ps.guard_delete_matches(f"{cred}/*")
    with pytest.raises(PatternError):
        ps.guard_delete_matches("*")
    # DELETE /patterns (remove) is unguarded; once '*' is gone, deleting
    # rows of a non-overlapping pattern is allowed
    ps.remove("*")
    ps.add(f"*/{'b' * 56}")
    # payment-credential pattern does not overlap a delegation pattern
    # (reference overlapTwo has no payment-vs-delegation case)
    ps.guard_delete_matches(f"{cred}/*")
    with pytest.raises(PatternError):
        ps.guard_delete_matches(f"*/{'b' * 56}")


def test_pattern_store_matching_uses_includes(tmp_path):
    """GET /patterns/{p} returns active patterns that fully INCLUDE p
    (Http.hs:416), not merely overlapping ones."""
    ps = PatternStore(str(tmp_path / "patterns.txt"))
    cred = "a" * 56
    deleg = "b" * 56
    ps.add(f"{cred}/*")
    ps.add(f"*/{deleg}")
    got = {p.to_text() for p in ps.matching(f"{cred}/{deleg}")}
    assert got == {f"{cred}/*", f"*/{deleg}"}
    # a mere overlap (shared payment, different query kind) is NOT listed
    assert ps.matching(f"*/{'c' * 56}") == []


def _blocks_with_validity(spark):
    out = (
        "array(named_struct('output_index', cast(0 as int), 'address', addr,"
        " 'coins', cast(9 as bigint),"
        " 'assets', cast(map() as map<string,map<string,bigint>>),"
        " 'datum_kind', 'none', 'datum_hash', cast(null as string),"
        " 'datum_cbor', cast(null as string), 'script_hash', cast(null as string),"
        " 'script_cbor', cast(null as string)))"
    )
    rows = spark.createDataFrame(
        [
            (1, 0, "t1", True, ["prev#0"], ["col#0"], "03" + "0" * 58),
            (1, 1, "t2", False, ["x#0"], ["y#0"], "03" + "1" * 58),
        ],
        "slot_no long, transaction_index int, transaction_id string, is_valid boolean,"
        " inputs array<string>, collateral_inputs array<string>, addr string",
    )
    return rows.select(
        "slot_no",
        F.expr("md5(concat('blk', slot_no))").alias("header_hash"),
        "transaction_index",
        "transaction_id",
        "is_valid",
        "inputs",
        "collateral_inputs",
        F.expr(out).alias("outputs"),
        F.expr(f"IF(is_valid, null, element_at({out}, 1))").alias("collateral_return"),
        F.expr("map(cast(0 as int), 'r0')").alias("spend_redeemers"),
        F.expr("array(cast(1 as bigint))").alias("metadata_tags"),
        F.lit(None).cast("string").alias("metadata_cbor"),
    )


def test_invalid_tx_consumes_collateral(spark):
    blocks = _blocks_with_validity(spark)
    spends = {r["spent_ref"]: r for r in spent_refs(blocks).collect()}
    assert "prev#0" in spends  # valid tx spends its inputs
    assert "y#0" in spends  # invalid tx spends collateral
    assert "x#0" not in spends  # ...not its inputs
    assert spends["prev#0"]["spent_with"] == "r0"  # redeemer on valid spend
    assert spends["y#0"]["spent_with"] is None  # no redeemer on collateral


def test_invalid_tx_produces_collateral_return_at_tail_index(spark):
    blocks = _blocks_with_validity(spark)
    outs = exploded_outputs(blocks)
    t2 = outs.where(F.col("transaction_id") == "t2").collect()
    assert len(t2) == 1
    # collateral return lands at index |outputs| = 1
    assert t2[0]["output_index"] == 1
    t1 = outs.where(F.col("transaction_id") == "t1").collect()
    assert len(t1) == 1 and t1[0]["output_index"] == 0


def test_result_json_shape(index):
    rows = result_json(index, "*", status="unspent").collect()
    row = next(r for r in rows if json.loads(r["result"])["value"]["assets"])
    payload = json.loads(row["result"])
    base = {
        "transaction_index", "transaction_id", "output_index", "address",
        "value", "datum_hash", "script_hash", "created_at", "spent_at",
    }
    # AsReference mode: datum_type present iff the output has a datum
    # (datumToJson vs NoDatum, Pattern.hs:465-471); never a datum/script key
    expected = base | ({"datum_type"} if payload["datum_hash"] is not None else set())
    assert set(payload.keys()) == expected
    assert set(payload["value"].keys()) == {"coins", "assets"}
    assert payload["spent_at"] is None
    assert payload["created_at"]["slot_no"] >= 0
    for k in payload["value"]["assets"]:
        assert "." in k  # dotted policy.asset keys (Value.hs:60-99)


def test_result_json_golden(index):
    """Golden serialization vector (the analog of test/vectors/golden/):
    the exact JSON payload for a fully-determined row — guards field order,
    null rendering and the dotted-asset encoding against drift."""
    # e=20, u is whatever the seed=42 data says; pick the row by reference
    ref = cs.output_reference_of(20)  # e=20: %5==0 (2 outputs), %4==0 (meta)
    row = next(
        r for r in result_json(index, "*").collect() if r["output_reference"] == ref
    )
    payload = json.loads(row["result"])
    e = 20
    assert payload["transaction_id"] == cs.transaction_id_of(e)
    assert payload["transaction_index"] == e % 10
    assert payload["output_index"] == 0
    u = _user_of(index, ref)
    assert payload["address"] == cs.address_of(u)
    assert payload["value"]["coins"] == (e % 1000) * 1000 + u
    assert payload["datum_hash"] is None  # e%16=4 -> none
    assert payload["script_hash"] is None  # e%6=2 -> none
    assert payload["created_at"] == {
        "slot_no": 2,
        "header_hash": cs.md5_hex("blk2"),
    }
    # two policies (e%3=2): dotted keys policy.asset
    assets = payload["value"]["assets"]
    assert set(assets) == {
        f"{cs.policy_id_of(20)}.{cs.asset_name_of(20)}",
        f"{cs.policy_id_of(21)}.{cs.asset_name_of(22)}",
    }
    assert assets[f"{cs.policy_id_of(20)}.{cs.asset_name_of(20)}"] == 20 % 100 + 1


def test_result_json_spent_row(index):
    rows = result_json(index, "*", status="spent").collect()
    payload = next(
        p for p in (json.loads(r["result"]) for r in rows)
        if p["spent_at"] and p["spent_at"]["redeemer"]
    )
    sp = payload["spent_at"]
    assert set(sp.keys()) == {
        "slot_no", "header_hash", "transaction_id", "input_index", "redeemer"
    }
    assert sp["redeemer"].startswith("rdmr")
    assert sp["input_index"] in (0, 1)
    assert sp["header_hash"] == cs.md5_hex(f"blk{sp['slot_no']}")


def _user_of(index, ref):
    from pyspark.sql import functions as FF

    coins = index.inputs.where(FF.col("output_reference") == ref).collect()[0]["coins"]
    return coins % 1000


def test_health(index):
    h = health(index).collect()[0]
    assert h["n_inputs"] > h["n_unspent"] > 0
    assert h["most_recent_checkpoint"] == 99


def test_frame_sample_plumbing(spark):
    """Deterministic frame sampling: every `every`-th fixed-size chunk, in
    order, partition-preserving, strict path honestly unimplemented."""
    import pytest

    from kupo_spark.functions.multimodal import as_media_table, frame_sample

    docs = spark.createDataFrame(
        [(1, "a" * 300, "s"), (2, "b" * 40, "s"), (3, "", "s")],
        "doc_id BIGINT, text STRING, source STRING",
    )
    media = as_media_table(docs)
    rows = frame_sample(media, frame_bytes=64, every=2).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    # doc 1: 300 bytes -> frames 0..4, sampled 0,2,4 (len 64,64,44)
    assert [r.frame_index for r in by_doc[1]] == [0, 2, 4]
    assert [len(r.frame) for r in by_doc[1]] == [64, 64, 300 - 4 * 64]
    assert bytes(by_doc[1][0].frame) == b"a" * 64
    # doc 2: one frame; doc 3: empty payload -> no frames
    assert [r.frame_index for r in by_doc[2]] == [0] and len(by_doc[2][0].frame) == 40
    assert 3 not in by_doc
    # the strict (real-codec) path surfaces NotImplementedError from the
    # executor, wrapped by PySpark
    from pyspark.errors.exceptions.captured import PythonException

    with pytest.raises(PythonException, match="NotImplementedError"):
        frame_sample(media, strict=True).collect()


def test_context_cache_evicts_stale_sessions(spark):
    """Caches keyed by (id(sparkContext), ...) drop entries from other
    (dead) contexts on first touch — no session-lifetime growth."""
    from kupo_spark import context as ctx

    class _Fake:
        def unpersist(self):
            raise RuntimeError("owning context gone")  # must be swallowed

    ctx._CACHE[(-1, "/nowhere")] = (_Fake(), _Fake())
    ctx.get_index(spark, "/root/testdata/sf0.001")
    assert (-1, "/nowhere") not in ctx._CACHE
    assert all(k[0] == id(spark.sparkContext) for k in ctx._CACHE)

    from kupo_spark import registry as reg

    reg._TAG_INDEX_CACHE[(-1, "/nowhere", "x")] = _Fake()
    reg._tag_index(spark, "/root/testdata/sf0.001")
    assert (-1, "/nowhere", "x") not in reg._TAG_INDEX_CACHE


def test_residual_asset_filter_binds_values_not_sql(index):
    """The policy_id+asset_name residual filter must BIND its values (they
    arrive verbatim from HTTP query params) — a quote or SQL fragment is
    just a key that matches nothing, never an expression."""
    from kupo_spark.operators.fold_inputs import fold_inputs

    hostile = "b') IS NOT NULL OR ('1'='1"
    rows = fold_inputs(
        index, "*", filter_policy_id="a'", filter_asset_name=hostile
    ).collect()
    assert rows == []
    # and a legitimate pair still matches
    pol = cs.policy_id_of(3)
    legit = fold_inputs(index, "*", filter_policy_id=pol)
    some = legit.limit(1).collect()
    assert some  # the fixture has assets under this policy


def test_metrics_text_renders_zero_for_empty_index(spark):
    """Prometheus exposition over an empty index must not contain the
    Python literal 'None' (an invalid sample a scraper rejects)."""
    from pyspark.sql.types import (
        LongType,
        MapType,
        StringType,
        StructField,
        StructType,
    )

    from kupo_spark.operators.indexer import Index
    from kupo_spark.operators.serve import metrics_text

    inputs = spark.createDataFrame(
        [],
        StructType(
            [
                StructField("spent_at", LongType()),
            ]
        ),
    )
    checkpoints = spark.createDataFrame(
        [],
        StructType(
            [
                StructField("slot_no", LongType()),
                StructField("header_hash", StringType()),
            ]
        ),
    )
    idx = Index(
        inputs=inputs,
        checkpoints=checkpoints,
        policies=None,
        assets=None,
        binary_data=None,
        scripts=None,
    )
    text = metrics_text(idx)
    assert "None" not in text
    assert "kupo_most_recent_checkpoint 0" in text


def test_script_object_unknown_tag_keeps_key(spark):
    """An unmapped script language tag renders visibly ('unknown:NN')
    instead of NULL-propagating the whole script fragment away."""
    from kupo_spark.operators.serve import _script_object

    df = spark.createDataFrame([("09deadbeef",)], "script string").select(
        _script_object(F.col("script")).alias("obj")
    )
    got = df.collect()[0]["obj"]
    assert got == '{"script":"deadbeef","language":"unknown:09"}'


def test_prune_utxo_marks_inside_unstable_window(spark, blocks):
    """M4 RemoveSpentInputs boundary (App.hs:558-577): build_index with
    prune_utxo=True deletes a spend only when distanceToTip EXCEEDS
    longestRollback; a spend AT the boundary (spent_at == tip - k) or
    shallower stays MARKED so a rollback can still un-spend it."""
    full = build_index(blocks, ("*",))
    tip = blocks.agg(F.max("slot_no")).collect()[0][0]
    # pick a horizon that lands EXACTLY on an existing spend slot, so the
    # test always exercises the boundary (distance == k -> marked)
    mid_spend = (
        full.inputs.where(F.col("spent_at").isNotNull())
        .agg(F.min("spent_at") + (F.max("spent_at") - F.min("spent_at")) / 2)
        .collect()[0][0]
    )
    horizon = int(
        full.inputs.where(F.col("spent_at") <= mid_spend)
        .agg(F.max("spent_at"))
        .collect()[0][0]
    )
    k = tip - horizon
    idx = build_index(blocks, ("*",), prune_utxo=True, longest_rollback=k)
    spent = idx.inputs.where(F.col("spent_at").isNotNull())
    # nothing deeper than the window survives
    assert spent.where(F.col("spent_at") < horizon).count() == 0
    kept_expected = full.inputs.where(F.col("spent_at") >= horizon).count()
    at_boundary = full.inputs.where(F.col("spent_at") == horizon).count()
    assert at_boundary > 0  # by construction: horizon IS a spend slot
    assert spent.count() == kept_expected  # boundary rows included (>=, not >)
    # unspent rows are untouched
    assert (
        idx.inputs.where(F.col("spent_at").isNull()).count()
        == full.inputs.where(F.col("spent_at").isNull()).count()
    )


def test_bucket_range_sliced_write_equals_one_shot(spark, blocks, tmp_path):
    """write_index(bucket_range=) — the slot-range incremental primitive:
    disjoint bucket-range sub-writes + one side-table pass must read back
    identical to a one-shot write (the chunked bulk-load / backfill path,
    and the sliced ingest-bench protocol)."""
    from kupo_spark.operators.indexer import build_index, read_index, write_index

    idx = build_index(blocks, ("*",), cache=True)
    idx.inputs.count()
    one, sliced = str(tmp_path / "one"), str(tmp_path / "sliced")
    write_index(idx, one, slot_bucket=20)
    max_created = idx.inputs.agg({"created_at": "max"}).first()[0]
    n_buckets = int(max_created) // 20 + 1
    assert n_buckets >= 3  # the fixture must actually slice
    step = -(-n_buckets // 3)
    for i in range(3):
        lo, hi = i * step, min((i + 1) * step, n_buckets)
        if lo < hi:
            write_index(idx, sliced, slot_bucket=20, bucket_range=(lo, hi), only="inputs")
    write_index(idx, sliced, slot_bucket=20, only="side")
    a, b = read_index(spark, one, slot_bucket=20), read_index(spark, sliced, slot_bucket=20)
    cols = sorted(a.inputs.columns)
    assert (
        a.inputs.select(*cols).orderBy("output_reference").collect()
        == b.inputs.select(*cols).orderBy("output_reference").collect()
    )
    for t in ("checkpoints", "policies", "assets", "binary_data", "scripts"):
        assert getattr(a, t).count() == getattr(b, t).count()
    idx.inputs.unpersist()


def test_bucket_range_out_of_order_and_retry_idempotent(spark, blocks, tmp_path):
    """ADVICE r10: range writes are dynamic-partition-overwrite — ranges
    land in ANY order (a range-0 write after other ranges must not clear
    the root) and a RE-RUN of any range replaces its own partition dirs
    instead of appending duplicate rows (retried backfill jobs)."""
    from kupo_spark.operators.indexer import build_index, read_index, write_index

    idx = build_index(blocks, ("*",), cache=True)
    idx.inputs.count()
    one, sliced = str(tmp_path / "one"), str(tmp_path / "sliced")
    write_index(idx, one, slot_bucket=20)
    max_created = idx.inputs.agg({"created_at": "max"}).first()[0]
    n_buckets = int(max_created) // 20 + 1
    step = -(-n_buckets // 3)
    ranges = [
        (i * step, min((i + 1) * step, n_buckets))
        for i in range(3)
        if i * step < min((i + 1) * step, n_buckets)
    ]
    # out of order: range 0 written LAST (statically it would wipe the rest)
    for lo, hi in ranges[1:] + ranges[:1]:
        write_index(idx, sliced, slot_bucket=20, bucket_range=(lo, hi), only="inputs")
    # retry: re-run the middle range — must not duplicate its rows
    write_index(idx, sliced, slot_bucket=20, bucket_range=ranges[1], only="inputs")
    write_index(idx, sliced, slot_bucket=20, only="side")
    a = read_index(spark, one, slot_bucket=20)
    b = read_index(spark, sliced, slot_bucket=20)
    cols = sorted(a.inputs.columns)
    assert (
        a.inputs.select(*cols).orderBy("output_reference").collect()
        == b.inputs.select(*cols).orderBy("output_reference").collect()
    )
    idx.inputs.unpersist()
