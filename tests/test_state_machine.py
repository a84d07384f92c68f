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


# ---------------------------------------------------------------------------
# PUT /patterns (M5): rollback + install + backfill, interleaved with
# roll-forwards (Http.hs:843-916 + App.hs:311-346 end-to-end)
# ---------------------------------------------------------------------------

CRED_A, CRED_B, CRED_C = "ab" * 28, "cd" * 28, "ef" * 28
ADDR_OF = {c: "03" + "00" + c for c in (CRED_A, CRED_B, CRED_C)}


def _multi_block_df(spark, slot, txid, addrs):
    """One single-tx block with one output per address in ``addrs``."""
    structs = ", ".join(
        "named_struct('output_index', cast(%d as int), 'address', '%s',"
        " 'coins', cast(7 as bigint),"
        " 'assets', cast(map() as map<string,map<string,bigint>>),"
        " 'datum_kind', 'none', 'datum_hash', cast(null as string),"
        " 'datum_cbor', cast(null as string), 'script_hash', cast(null as string),"
        " 'script_cbor', cast(null as string))" % (i, ADDR_OF[c])
        for i, c in enumerate(addrs)
    )
    df = spark.createDataFrame(
        [(slot, 0, txid)],
        "slot_no long, transaction_index int, transaction_id string",
    )
    return df.select(
        "slot_no",
        F.expr("md5(concat('blk', slot_no))").alias("header_hash"),
        "transaction_index",
        "transaction_id",
        F.expr("cast(array() as array<string>)").alias("inputs"),
        F.expr(f"array({structs})").alias("outputs"),
        F.expr("cast(map() as map<int,string>)").alias("spend_redeemers"),
        F.expr("array(cast(0 as bigint))").alias("metadata_tags"),
        F.lit(None).cast("string").alias("metadata_cbor"),
    )


@pytest.mark.slow
def test_put_patterns_interleaved_matches_from_scratch(spark, tmp_path):
    """Two put_patterns installs interleaved with roll-forwards: the final
    index equals a from-scratch build over the same chain with the final
    pattern set (new-pattern matches BEFORE each install's rollback point
    do not exist — but the chain only emits them after, so the from-scratch
    build agrees exactly)."""
    from kupo_spark.operators.indexer import build_index

    ix = StreamingIndexer(str(tmp_path / "pp"), patterns=[f"{CRED_A}/*"])
    chain = []  # (slot, block_df)

    def forward(slot, addrs):
        blk = _multi_block_df(spark, slot, f"tx{slot:03d}", addrs)
        chain.append(blk)
        ix.process_batch(blk, 0)

    def all_blocks():
        df = chain[0]
        for b in chain[1:]:
            df = df.unionByName(b)
        return df

    # phase 1: only credential A exists on-chain
    for s in range(1, 7):
        forward(s, [CRED_A])
    # install B, rolling back to slot 4 (within safe zone), backfill 5-6
    ix.put_patterns(
        spark, [f"{CRED_B}/*"], 4, all_blocks(), longest_rollback=10
    )
    # phase 2: chain emits A and B outputs
    for s in range(7, 10):
        forward(s, [CRED_A, CRED_B])
    # install C, rolling back to slot 7, backfill 8-9
    ix.put_patterns(
        spark, [f"{CRED_C}/*"], 7, all_blocks(), longest_rollback=10
    )
    # phase 3: all three credentials on-chain
    for s in range(10, 13):
        forward(s, [CRED_A, CRED_B, CRED_C])

    assert sorted(
        __import__("kupo_spark.patterns", fromlist=["pattern_to_text"]).pattern_to_text(p)
        for p in ix.patterns
    ) == sorted([f"{CRED_A}/*", f"{CRED_B}/*", f"{CRED_C}/*"])

    got = {
        tuple(r)
        for r in ix.resolved_index(spark)
        .inputs.select("output_reference", "address", "created_at", "spent_at")
        .collect()
    }
    scratch = build_index(
        all_blocks(), patterns=[f"{CRED_A}/*", f"{CRED_B}/*", f"{CRED_C}/*"]
    )
    want = {
        tuple(r)
        for r in scratch.inputs.select(
            "output_reference", "address", "created_at", "spent_at"
        ).collect()
    }
    assert got == want
    # a fresh indexer over the same directory resumes with the persisted set
    resumed = StreamingIndexer(str(tmp_path / "pp"))
    assert sorted(map(str, resumed.patterns)) == sorted(map(str, ix.patterns))


def test_put_patterns_rejects_unsafe_or_unknown_points(spark, tmp_path):
    ix = StreamingIndexer(str(tmp_path / "ppbad"), patterns=[f"{CRED_A}/*"])
    chain = []
    for s in range(1, 8):
        blk = _multi_block_df(spark, s, f"tx{s:03d}", [CRED_A])
        chain.append(blk)
        ix.process_batch(blk, 0)
    blocks = chain[0]
    for b in chain[1:]:
        blocks = blocks.unionByName(b)
    seq_before = ix._next_seq()
    # deeper than the safe zone: tip 7 - k 3 -> slot 2 rejected
    with pytest.raises(ValueError, match="safe zone"):
        ix.put_patterns(spark, [f"{CRED_B}/*"], 2, blocks, longest_rollback=3)
    # not a checkpoint at all
    with pytest.raises(ValueError, match="not a known checkpoint"):
        ix.put_patterns(spark, [f"{CRED_B}/*"], 99, blocks, longest_rollback=10)
    # a rejected request mutates nothing: no rollback, no patterns, no batch
    assert ix._next_seq() == seq_before
    assert ix._rollbacks() == []
    assert ix.pattern_store().list() == []
