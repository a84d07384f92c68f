"""Generate LARGER scale factors of the driver's synthetic tables.

The committed testdata stops at sf0.1 (TESTDATA.md); proving the scaling
story (VERDICT r4 #1) needs sf1/sf10 fixtures with the SAME schemas and
the same scaling rules the driver used:

    events      = 1,000,000 x sf rows   (event_id 0..n-1, user_id uniform
                                         over 15,000 x sf users)
    documents   =    50,000 x sf rows   (31-word vocab, 8..105 tokens,
                                         ~0.2% exact dups, lang/source mix)
    embeddings  =    20,000 x sf rows   (64-dim float32, 10 label clusters)

Only the three tables the engine reads are generated (the chain derives
from ``events``; the pipeline family reads ``documents``/``embeddings``).
Parquet is written with small row groups so Spark can SPLIT one file
across tasks (``spark.sql.files.maxPartitionBytes`` splits at row-group
boundaries) — at sf10 the events scan fans out to every core instead of
being one 10M-row task.

Deterministic (seeded per sf).  Usage::

    python tools/gen_scale_data.py 1 [outdir]     # sf1  -> .bench/scaledata/sf1
    python tools/gen_scale_data.py 10 [outdir]    # sf10 -> .bench/scaledata/sf10

Output lives under the gitignored ``.bench/`` by default — these are
measurement fixtures, not committed test inputs.
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

REPO = Path(__file__).resolve().parent.parent

VOCAB = [
    "a", "agg", "batch", "big", "column", "customer", "data", "dup", "fast",
    "filter", "group", "hash", "join", "key", "line", "merge", "order",
    "part", "query", "row", "scan", "slow", "small", "sort", "spark",
    "stream", "table", "the", "value", "vector", "window",
]
LANGS = ["en", "de", "es", "fr", "zh"]
LANG_P = [0.41, 0.14, 0.15, 0.15, 0.15]  # sf0.1 observed mix
N_SOURCES = 20
DIM = 64
N_LABELS = 10


def gen_events(sf: float, out: Path, rng: np.random.Generator) -> int:
    n = int(1_000_000 * sf)
    users = max(1, int(15_000 * sf))
    event_id = np.arange(n, dtype=np.int64)
    user_id = rng.integers(0, users, size=n, dtype=np.int64)
    # the chain derivation prunes to (event_id, user_id); the remaining
    # columns exist for schema fidelity with the driver's table
    table = pa.table(
        {
            "event_id": event_id,
            "ts": pa.array(
                (1_700_000_000_000_000_000 + event_id * 1_000_000).view("datetime64[ns]")
            ),
            "user_id": user_id,
            "event_type": pa.array(
                np.where(event_id % 3 == 0, "click", "view")
            ),
            "value": (event_id % 1000).astype(np.float64) / 10.0,
            "props": pa.array(np.full(n, "{}", dtype=object)),
        }
    )
    pq.write_table(table, out / "events.parquet", row_group_size=100_000)
    return n


def gen_documents(sf: float, out: Path, rng: np.random.Generator) -> int:
    n = max(500, int(50_000 * sf))
    lens = rng.integers(8, 106, size=n)
    total = int(lens.sum())
    words = np.array(VOCAB, dtype=object)[rng.integers(0, len(VOCAB), size=total)]
    offsets = np.concatenate(([0], np.cumsum(lens)))
    texts = [" ".join(words[offsets[i] : offsets[i + 1]]) for i in range(n)]
    # ~0.2% exact duplicates (the sf0.1 rate): copy the previous doc's text
    for i in rng.choice(np.arange(1, n), size=max(1, n // 500), replace=False):
        texts[i] = texts[i - 1]
    lang = rng.choice(LANGS, size=n, p=LANG_P)
    source = np.array([f"src{i}" for i in rng.integers(0, N_SOURCES, size=n)], dtype=object)
    table = pa.table(
        {
            "doc_id": np.arange(n, dtype=np.int64),
            "text": pa.array(texts),
            "lang": pa.array(lang),
            "source": pa.array(source),
            "n_chars": np.array([len(t) for t in texts], dtype=np.int64),
        }
    )
    pq.write_table(table, out / "documents.parquet", row_group_size=20_000)
    return n


def gen_embeddings(sf: float, out: Path, rng: np.random.Generator) -> int:
    n = max(500, int(20_000 * sf))
    centers = rng.normal(0.0, 0.08, size=(N_LABELS, DIM))
    label = rng.integers(0, N_LABELS, size=n).astype(np.int32)
    vecs = np.clip(
        centers[label] + rng.normal(0.0, 0.07, size=(n, DIM)), -0.35, 0.35
    ).astype(np.float32)
    table = pa.table(
        {
            "vec_id": np.arange(n, dtype=np.int64),
            "embedding": pa.FixedSizeListArray.from_arrays(
                pa.array(vecs.reshape(-1)), DIM
            ).cast(pa.list_(pa.float32())),
            "label": label,
        }
    )
    pq.write_table(table, out / "embeddings.parquet", row_group_size=20_000)
    return n


def main() -> None:
    sf = float(sys.argv[1])
    sf_name = f"sf{sys.argv[1]}"
    outdir = (
        Path(sys.argv[2]) if len(sys.argv) > 2 else REPO / ".bench" / "scaledata"
    ) / sf_name
    outdir.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(42_000 + int(sf * 100))
    ne = gen_events(sf, outdir, rng)
    nd = gen_documents(sf, outdir, rng)
    nv = gen_embeddings(sf, outdir, rng)
    print(f"{outdir}: events={ne} documents={nd} embeddings={nv}")


if __name__ == "__main__":
    main()
