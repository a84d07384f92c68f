"""Isolated A/B of the sf10 shifts flagged by the round-6 verdict.

VERDICT r6 #1: the fresh SCALING.json measured ``ingest_phase_write_inputs``
at 192.5 s (vs r5's 84.2 s and the inline 51 s claim), with q_policy,
q_delegation and q_embedding_topk also shifted up — all on code untouched
by the round-6 diff.  This script settles code-vs-harness-vs-lazy-eval by
running ONLY the shifted metrics, in a fresh JVM, with explicit
materialization barriers so no work can move between timed phases:

- ``build``      — load + build_index(cache=True) + a full count (this
                   materializes the cached match lineage);
- ``recount``    — a second count of the cached inputs.  If the cache held,
                   this is ~1 s; if it was evicted/spilled, it re-derives
                   the lineage and the *write* phase would silently pay
                   that cost again — the lazy-eval mover the verdict
                   suspected.
- ``resolve_cnt``— checkpoints.count() (the join-strategy probe inside
                   write_index, hoisted out so the write phase is honest);
- ``write``      — write_index() proper, with its internal phase dict.

Usage (run per code version, nothing else on the host)::

    SPARK_DRIVER_MEMORY=48g python tools/ab_sf10.py <label> [repo_root]

``repo_root`` defaults to this repo; pass a worktree of an older commit to
A/B against it.  Results append one JSON line each to ``.bench/ab_sf10.jsonl``
under THIS repo (so the old-commit run reports into the same file).
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

HERE = Path(__file__).resolve().parent.parent  # canonical repo (for output)
label = sys.argv[1]
root = Path(sys.argv[2]).resolve() if len(sys.argv) > 2 else HERE
sys.path.insert(0, str(root))

SRC = str(HERE / ".bench" / "scaledata" / "sf10")
OUT = HERE / ".bench" / "ab_sf10.jsonl"
INDEX_DIR = str(HERE / ".bench" / f"ab-index-{label}")


def main() -> None:
    import shutil

    from kupo_spark import chainspec as cs
    from kupo_spark.chaingen import load_blocks
    from kupo_spark.functions import similarity
    from kupo_spark.operators.fold_inputs import fold_inputs
    from kupo_spark.operators.indexer import build_index, read_index, write_index
    from kupo_spark.session import get_spark

    spark = get_spark(f"ab-sf10-{label}")
    out: dict = {"label": label, "root": str(root)}

    t0 = time.time()
    blocks = load_blocks(spark, SRC)
    idx = build_index(blocks, patterns=("*",), cache=True)
    out["rows_inputs"] = idx.inputs.count()
    out["build"] = round(time.time() - t0, 2)

    t0 = time.time()
    idx.inputs.count()  # barrier: cheap iff the cache actually held
    out["recount"] = round(time.time() - t0, 2)

    t0 = time.time()
    out["n_checkpoints"] = idx.checkpoints.count()
    out["resolve_cnt"] = round(time.time() - t0, 2)

    shutil.rmtree(INDEX_DIR, ignore_errors=True)
    phases: dict = {}
    t0 = time.time()
    write_index(idx, INDEX_DIR, timings=phases)
    out["write_total"] = round(time.time() - t0, 2)
    out["phases"] = {k: round(v, 2) for k, v in phases.items()}

    index = read_index(spark, INDEX_DIR)
    index.checkpoints.persist().count()
    policy = cs.policy_id_of(3)
    deleg = cs.delegation_credential_of(5)

    def timed(fn, runs=2):
        fn()
        ts = []
        for _ in range(runs):
            t = time.time()
            fn()
            ts.append(time.time() - t)
        return round(sum(ts) / len(ts), 2)

    out["q_policy"] = timed(
        lambda: fold_inputs(index, f"{policy}.*", sorted_result=True).collect()
    )
    out["q_delegation"] = timed(
        lambda: fold_inputs(index, f"*/{deleg}", sorted_result=True).collect()
    )
    embs = spark.read.parquet(f"{SRC}/embeddings.parquet")
    out["q_embedding_topk"] = timed(
        lambda: similarity.brute_force_topk(embs, n_queries=10, k=5).collect(), 1
    )
    out["measured_at"] = time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime())
    with open(OUT, "a") as fh:
        fh.write(json.dumps(out) + "\n")
    print(json.dumps(out))
    shutil.rmtree(INDEX_DIR, ignore_errors=True)


if __name__ == "__main__":
    main()
