"""State-machine model test — the analog of the reference's QuickCheck
property (test/Test/Kupo/AppSpec.hs:245): random roll-forward / roll-backward
sequences replayed through the streaming indexer must agree with a simple
dict model of the UTxO set at every point."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from kupo_spark.streaming.indexer import StreamingIndexer

ADDR = "03" + "00" + "ab" * 28

_OUT = (
    "array(named_struct('output_index', cast(0 as int), 'address', '%s',"
    " 'coins', cast(7 as bigint),"
    " 'assets', cast(map() as map<string,map<string,bigint>>),"
    " 'datum_kind', 'none', 'datum_hash', cast(null as string),"
    " 'datum_cbor', cast(null as string), 'script_hash', cast(null as string),"
    " 'script_cbor', cast(null as string)))" % ADDR
)


def _block_df(spark, slot, txs):
    rows = [(slot, i, txid, spends) for i, (txid, spends) in enumerate(txs)]
    df = spark.createDataFrame(
        rows,
        "slot_no long, transaction_index int, transaction_id string, inputs array<string>",
    )
    return df.select(
        "slot_no",
        F.expr("md5(concat('blk', slot_no))").alias("header_hash"),
        "transaction_index",
        "transaction_id",
        "inputs",
        F.expr(_OUT).alias("outputs"),
        F.expr("cast(map() as map<int,string>)").alias("spend_redeemers"),
        F.expr("array(cast(0 as bigint))").alias("metadata_tags"),
        F.lit(None).cast("string").alias("metadata_cbor"),
    )


def _run_scenario(spark, base_dir, seed, steps=10):
    rng = random.Random(seed)
    ix = StreamingIndexer(str(base_dir / f"sm{seed}"))
    model: dict[str, dict] = {}  # ref -> {created, spent}
    checkpoints: set[int] = set()
    slot = 0
    next_tx = 0

    for _ in range(steps):
        if checkpoints and rng.random() < 0.3:
            target = rng.choice(sorted(checkpoints))
            ix.append_rollback(target)
            model = {r: m for r, m in model.items() if m["created"] <= target}
            for m in model.values():
                if m["spent"] is not None and m["spent"] > target:
                    m["spent"] = None
            checkpoints = {s for s in checkpoints if s <= target}
            slot = max(checkpoints)
        else:
            slot += 1
            txs = []
            for _ in range(rng.randint(1, 3)):
                txid = f"t{next_tx:04d}"
                next_tx += 1
                spends = []
                unspent = sorted(r for r, m in model.items() if m["spent"] is None)
                if unspent and rng.random() < 0.5:
                    n_spend = min(len(unspent), rng.randint(1, 2))
                    spends = rng.sample(unspent, n_spend)
                    for s in spends:
                        model[s]["spent"] = slot
                model[f"{txid}#0"] = {"created": slot, "spent": None}
                txs.append((txid, spends))
            ix.process_batch(_block_df(spark, slot, txs), 0)
            checkpoints.add(slot)

    resolved = ix.resolved_index(spark)
    rows = {r["output_reference"]: r for r in resolved.inputs.collect()}
    assert set(rows) == set(model)
    for ref, m in model.items():
        assert rows[ref]["created_at"] == m["created"], ref
        assert rows[ref]["spent_at"] == m["spent"], ref
    cps = {r["slot_no"] for r in resolved.checkpoints.collect()}
    assert cps == checkpoints


@pytest.mark.parametrize("seed", [7, 21, 42])
def test_random_rollforward_rollback_sequences_match_model(spark, tmp_path, seed):
    _run_scenario(spark, tmp_path, seed)
