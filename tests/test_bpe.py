"""Learned BPE: driver and distributed training paths agree with an
independent pure-Python reference; encoding round-trips the text."""

from __future__ import annotations

import pytest

from kupo_spark.functions import bpe


def reference_bpe(freqs: dict, n_merges: int) -> list:
    """Independent re-statement of Sennrich et al. 2016 (learn_bpe.py),
    written against the paper, not the implementation under test."""
    vocab = {tuple(list(w[:-1]) + [w[-1] + bpe.EOW]): f for w, f in freqs.items()}
    merges = []
    for _ in range(n_merges):
        pairs: dict = {}
        for syms, f in vocab.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] = pairs.get((syms[i], syms[i + 1]), 0) + f
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        new_vocab = {}
        for syms, f in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and (syms[i], syms[i + 1]) == best:
                    out.append(syms[i] + syms[i + 1])
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[tuple(out)] = f
        vocab = new_vocab
    return merges


CORPUS = (
    "low low low low low lower lower newest newest newest newest newest "
    "newest widest widest widest"
)


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [(0, CORPUS), (1, "the newest of the new est lows"), (2, "low lower")],
        "doc_id long, text string",
    )


def _freqs(docs):
    out: dict = {}
    for r in docs.collect():
        for w in r["text"].split():
            out[w] = out.get(w, 0) + 1
    return out


def test_driver_path_matches_reference(docs):
    want = reference_bpe(_freqs(docs), 12)
    got = bpe.learn_bpe(docs, n_merges=12)
    assert got == want and len(got) == 12


def test_distributed_path_matches_driver(docs):
    """collect_limit=0 forces the DataFrame loop — identical merges,
    including tie-breaks."""
    driver = bpe.learn_bpe(docs, n_merges=8)
    dist = bpe.learn_bpe(docs, n_merges=8, collect_limit=0)
    assert [tuple(m) for m in dist] == [tuple(m) for m in driver]


def test_merges_exhaust_cleanly(spark):
    """Asking for more merges than the corpus supports stops early (the
    reference implementation's behavior), on both paths."""
    tiny = spark.createDataFrame([(0, "ab ab")], "doc_id long, text string")
    driver = bpe.learn_bpe(tiny, n_merges=50)
    dist = bpe.learn_bpe(tiny, n_merges=50, collect_limit=0)
    assert [tuple(m) for m in dist] == [tuple(m) for m in driver]
    assert 0 < len(driver) < 50


def test_encode_roundtrips_and_respects_merges(docs):
    merges = bpe.learn_bpe(docs, n_merges=12)
    rows = {r["doc_id"]: r["tokens"] for r in bpe.bpe_encode(docs, merges).collect()}
    for r in docs.collect():
        toks = rows[r["doc_id"]]
        # concatenating tokens and stripping the EOW markers restores the text
        assert "".join(toks).replace(bpe.EOW, " ").strip() == " ".join(
            r["text"].split()
        )
    # the most frequent training word tokenizes to ONE learned symbol
    assert f"newest{bpe.EOW}" in rows[0]


def test_encode_plan_is_arrow_batched(docs):
    from kupo_spark.plans.explain import formatted_plan

    merges = bpe.learn_bpe(docs, n_merges=4)
    plan = formatted_plan(bpe.bpe_encode(docs, merges))
    assert "MapInPandas" in plan and "BatchEvalPython" not in plan


def test_merge_fold_equals_python_on_random_sequences(spark):
    """The codegen merge fold == the Python reference merge over random
    symbol sequences, including the self-pair (a, a) and adjacent-overlap
    cases — one bulk DataFrame comparison, seeded."""
    import random

    from pyspark.sql import functions as F

    from kupo_spark.functions.bpe import _apply_merge, _merge_expr

    rng = random.Random(20260814)
    alphabet = ["a", "b", "ab", "c'", "\\d"]
    cases = [
        [rng.choice(alphabet) for _ in range(rng.randint(1, 12))]
        for _ in range(200)
    ]
    df = spark.createDataFrame(
        [(i, syms) for i, syms in enumerate(cases)],
        "id long, symbols array<string>",
    )
    for pair in [("a", "b"), ("a", "a"), ("ab", "a"), ("c'", "\\d")]:
        got = {
            r["id"]: list(r["merged"])
            for r in df.withColumn("merged", _merge_expr(*pair)).collect()
        }
        for i, syms in enumerate(cases):
            assert got[i] == _apply_merge(syms, pair), (pair, syms)
