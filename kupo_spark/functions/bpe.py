"""Learned BPE tokenizer training + application over the documents table.

The classic corpus-tokenizer pipeline step (Sennrich et al. 2016,
"Neural Machine Translation of Rare Words with Subword Units"): learn a
merge table from corpus statistics, then tokenize with it.  Spark-first
shape:

* **ONE corpus scan** builds the word-frequency table (`groupBy(word)`),
  and everything after iterates over that table — its size is bounded by
  the vocabulary (~millions of rows), not the corpus, which is what makes
  BPE training tractable at 100 TB: the 100 TB is read once.
* Merge iterations then run either **driver-side** (the word table
  collects when it is under ``collect_limit`` — the classic in-memory
  algorithm, fastest by far for its actual working-set size) or
  **distributed** (a DataFrame loop: explode adjacent symbol pairs,
  weighted count, argmax, then a codegen `aggregate()` fold rebuilds each
  word's symbol array with the winning pair merged — no Python in the
  loop).  Both paths share the tie-break (count desc, then pair text
  asc) and are pinned equal by tests.
* **Applying** the merges (`bpe_encode`) is a vectorized Arrow
  `mapInPandas` kernel — tokenization is a per-document CPU loop with a
  learned lookup table, the textbook case for the Pandas-UDF boundary
  (the merge table rides the closure; it is KB-sized by construction).

No oracle SQL: the merge loop is argmax-dependent iteration, which SQL
cannot express (same class as the streaming/iterative operators the
driver records rows-only) — correctness is pinned against an independent
pure-Python reference implementation in the tests instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: above this many distinct words the merge loop stays distributed
COLLECT_LIMIT = 1_000_000

#: end-of-word marker (Sennrich): distinguishes "est</w>" from "est"
EOW = "</w>"


def word_freq_table(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, freq) — the ONE corpus-wide scan of BPE training."""
    return (
        docs.select(
            F.explode(
                F.filter(F.split(F.col(text_col), r"\s+"), lambda w: w != "")
            ).alias("word")
        )
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
    )


def _symbols_col(word):
    """word → initial symbol array: characters, last one tagged ``EOW``."""
    chars = F.split(word, "")
    n = F.array_size(chars)
    return F.concat(
        F.slice(chars, 1, n - 1),
        F.array(F.concat(F.element_at(chars, -1), F.lit(EOW))),
    )


def _merge_expr(a: str, b: str):
    """Codegen fold merging every adjacent (a, b) into a+b in `symbols`.

    A single left-to-right pass, exactly the reference algorithm's merge
    step (greedy, non-overlapping: "aaa" with merge (a,a) → ["aa","a"]).
    The accumulator carries (acc array, pending flag): `pending` means the
    previous symbol was `a` awaiting a possible `b`."""
    def q(s: str) -> str:
        return s.replace("\\", "\\\\").replace("'", "\\'")

    qa, qb = q(a), q(b)
    return F.expr(
        f"""
        aggregate(
          symbols,
          named_struct('acc', cast(array() as array<string>), 'pend', false),
          (s, x) -> CASE
            WHEN s.pend AND x = '{qb}'
              THEN named_struct('acc', array_append(s.acc, '{qa}{qb}'),
                                'pend', false)
            WHEN s.pend AND x = '{qa}'
              THEN named_struct('acc', array_append(s.acc, '{qa}'),
                                'pend', true)
            WHEN s.pend
              THEN named_struct('acc', concat(s.acc, array('{qa}', x)),
                                'pend', false)
            WHEN x = '{qa}'
              THEN named_struct('acc', s.acc, 'pend', true)
            ELSE named_struct('acc', array_append(s.acc, x), 'pend', false)
          END,
          s -> CASE WHEN s.pend THEN array_append(s.acc, '{qa}') ELSE s.acc END
        )
        """
    )


def learn_bpe(
    docs: DataFrame,
    n_merges: int = 50,
    text_col: str = "text",
    collect_limit: int = COLLECT_LIMIT,
) -> list:
    """Learn ``n_merges`` BPE merges; returns [(left, right), ...] in
    merge order.  Deterministic: ties broken by (count desc, pair asc)."""
    wft = word_freq_table(docs, text_col).persist()
    try:
        n_words = wft.count()
        if n_words <= collect_limit:
            rows = wft.collect()
            return _learn_driver(
                {r["word"]: r["freq"] for r in rows}, n_merges
            )
        return _learn_distributed(wft, n_merges)
    finally:
        wft.unpersist()


def _learn_driver(freqs: dict, n_merges: int) -> list:
    """Classic in-memory loop over the word-frequency table."""
    words = {w: _initial_symbols(w) for w in freqs}
    merges: list = []
    for _ in range(n_merges):
        counts: dict = {}
        for w, syms in words.items():
            f = freqs[w]
            for pair in zip(syms, syms[1:]):
                counts[pair] = counts.get(pair, 0) + f
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        words = {w: _apply_merge(s, best) for w, s in words.items()}
    return merges


def _initial_symbols(word: str) -> list:
    return list(word[:-1]) + [word[-1] + EOW] if word else []


def _apply_merge(syms: list, pair: tuple) -> list:
    a, b = pair
    out, i = [], 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def _learn_distributed(wft: DataFrame, n_merges: int) -> list:
    """DataFrame merge loop: per iteration one explode + one weighted
    groupBy + an argmax `first()` (the only driver traffic: ONE row), then
    a codegen fold rewrites the symbol arrays.  The table is persisted per
    round and the previous round released — lineage stays one step deep."""
    state = wft.select(
        "word", "freq", _symbols_col(F.col("word")).alias("symbols")
    ).persist()
    state.count()
    merges: list = []
    for _ in range(n_merges):
        pairs = (
            state.select(
                "freq",
                F.explode(
                    F.zip_with(
                        F.slice(F.col("symbols"), 1, F.array_size("symbols") - 1),
                        F.slice(F.col("symbols"), 2, F.array_size("symbols") - 1),
                        lambda x, y: F.struct(x.alias("a"), y.alias("b")),
                    )
                ).alias("p"),
            )
            .groupBy("p")
            .agg(F.sum("freq").alias("n"))
        )
        best = pairs.orderBy(F.desc("n"), F.asc("p.a"), F.asc("p.b")).first()
        if best is None:
            break
        a, b = best["p"]["a"], best["p"]["b"]
        merges.append((a, b))
        nxt = state.withColumn("symbols", _merge_expr(a, b)).persist()
        nxt.count()
        state.unpersist()
        state = nxt
    state.unpersist()
    return merges


def bpe_encode(
    docs: DataFrame, merges: list, text_col: str = "text"
) -> DataFrame:
    """(doc_id, tokens array<string>): tokenize with a learned merge table
    — an Arrow-batched kernel (tokenization is a per-document loop over a
    KB-sized learned table; the scan stays one pass, no shuffle)."""
    import pandas

    ranks = {tuple(m): i for i, m in enumerate(merges)}

    def encode_word(word: str) -> list:
        syms = _initial_symbols(word)
        while len(syms) > 1:
            ranked = [
                (ranks[p], p)
                for p in zip(syms, syms[1:])
                if p in ranks
            ]
            if not ranked:
                break
            syms = _apply_merge(syms, min(ranked)[1])
        return syms

    schema = "doc_id long, tokens array<string>"

    def run(batches):
        cache: dict = {}
        for pdf in batches:
            toks = []
            for text in pdf[text_col]:
                out = []
                for w in str(text).split():
                    hit = cache.get(w)
                    if hit is None:
                        hit = cache[w] = encode_word(w)
                    out += hit
                toks.append(out)
            yield pandas.DataFrame(
                {"doc_id": pdf["doc_id"], "tokens": toks}
            )

    return docs.select("doc_id", text_col).mapInPandas(run, schema)
