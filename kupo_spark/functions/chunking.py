"""Document chunking and sequence packing — the step between a curated
corpus and a training batch: long documents split into overlapping
token windows, short ones packed into fixed-budget sequences (waste-free
batches; see e.g. the T5/GPT data pipelines' "pack to sequence length").

Tokenization matches ``textops.TOKENS`` (whitespace, empty-dropped) so
chunk/pack counts agree with ``token_stats`` exactly.

Scale shapes:
- ``chunk_documents`` is a pure JVM projection (sequence → posexplode →
  slice): per-row fan-out with no shuffle, codegen end to end, and the
  chunk count per doc is ⌈n/stride⌉ — linear, no quadratic hazard.
- ``pack_sequences`` is greedy first-fit *within a salted bucket*: docs
  shuffle once by the md5 key family's 60-bit prefix mod ``buckets``
  (cross-engine reproducible — the DuckDB oracle replays the packing),
  each bucket packs sequentially in doc-id order inside one Arrow-batched
  ``applyInPandas`` group.  Global greedy packing is inherently
  sequential; bucketing trades a bounded amount of per-bucket tail
  waste (≤ one open pack per bucket) for full parallelism — the
  standard distributed-packing compromise.  Bucket count scales with
  the cluster, waste stays ≤ buckets × budget tokens.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kupo_spark.functions.textops import TOKENS

__all__ = ["chunk_documents", "pack_sequences"]


def chunk_documents(
    docs: DataFrame, chunk_tokens: int = 128, overlap: int = 16
) -> DataFrame:
    """(doc_id, chunk_id, n_tokens, chunk_text): overlapping token
    windows of ``chunk_tokens`` advancing by ``chunk_tokens − overlap``.

    The last window is the remainder (shorter, never empty); a document
    shorter than one window yields exactly one chunk; an empty document
    yields none.  1-indexed ``slice`` keeps the arithmetic transparent to
    the SQL oracle."""
    if not 0 <= overlap < chunk_tokens:
        raise ValueError(f"need 0 <= overlap < chunk_tokens, got {overlap}/{chunk_tokens}")
    stride = chunk_tokens - overlap
    toks = docs.select("doc_id", F.expr(TOKENS).alias("t")).select(
        "doc_id", "t", F.expr("size(t)").alias("n")
    )
    n_chunks = f"case when n <= 0 then 0 when n <= {chunk_tokens} then 1 " \
               f"else 1 + cast(ceil((n - {chunk_tokens}) / {stride}.0) as int) end"
    return (
        toks.withColumn("n_chunks", F.expr(n_chunks))
        .where(F.col("n_chunks") > 0)
        .select(
            "doc_id",
            "t",
            F.posexplode(F.expr("sequence(0, n_chunks - 1)")).alias("chunk_id", "_i"),
        )
        .select(
            "doc_id",
            "chunk_id",
            F.expr(f"slice(t, chunk_id * {stride} + 1, {chunk_tokens})").alias("ct"),
        )
        .select(
            "doc_id",
            "chunk_id",
            F.expr("size(ct)").alias("n_tokens"),
            F.expr("array_join(ct, ' ')").alias("chunk_text"),
        )
    )


def chunk_documents_sql(chunk_tokens: int = 128, overlap: int = 16) -> str:
    """DuckDB oracle for :func:`chunk_documents` over the ``documents``
    view — same slicing arithmetic on 1-indexed lists."""
    stride = chunk_tokens - overlap
    return f"""
WITH toks AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS t
  FROM documents
),
sized AS (
  SELECT doc_id, t, len(t) AS n,
         CASE WHEN len(t) <= 0 THEN 0
              WHEN len(t) <= {chunk_tokens} THEN 1
              ELSE 1 + CAST(ceil((len(t) - {chunk_tokens}) / {stride}.0) AS INT)
         END AS n_chunks
  FROM toks
),
chunks AS (
  SELECT doc_id, gs.chunk_id,
         t[gs.chunk_id * {stride} + 1 : gs.chunk_id * {stride} + {chunk_tokens}] AS ct
  FROM sized, LATERAL (
    SELECT unnest(range(0, n_chunks)) AS chunk_id
  ) gs
  WHERE n_chunks > 0
)
SELECT doc_id, CAST(chunk_id AS INT) AS chunk_id,
       CAST(len(ct) AS INT) AS n_tokens,
       array_to_string(ct, ' ') AS chunk_text
FROM chunks
"""


def pack_sequences_sql(budget: int = 512, buckets: int = 32) -> str:
    """DuckDB oracle for :func:`pack_sequences` over ``documents`` — the
    greedy first-fit replayed as a recursive CTE walking each bucket in
    doc-id order with the identical overflow rule (recursion depth = the
    largest bucket's row count; buckets are md5-uniform so that is
    ~N/buckets)."""
    key = "md5('pack' || ':' || CAST(doc_id AS VARCHAR))"
    return f"""
WITH RECURSIVE t AS (
  SELECT doc_id,
         len(list_filter(string_split(text, ' '), x -> x <> '')) AS n_tokens,
         CAST(CAST(('0x' || substr({key}, 1, 15)) AS BIGINT) % {buckets} AS INTEGER)
           AS bucket
  FROM documents
),
seq AS (
  SELECT *, row_number() OVER (PARTITION BY bucket ORDER BY doc_id) AS rn FROM t
),
fill AS (
  SELECT bucket, rn, doc_id, n_tokens, n_tokens AS cur, 0 AS local
  FROM seq WHERE rn = 1
  UNION ALL
  SELECT s.bucket, s.rn, s.doc_id, s.n_tokens,
         CASE WHEN f.cur + s.n_tokens > {budget} THEN s.n_tokens
              ELSE f.cur + s.n_tokens END,
         CASE WHEN f.cur + s.n_tokens > {budget} THEN f.local + 1
              ELSE f.local END
  FROM fill f JOIN seq s ON s.bucket = f.bucket AND s.rn = f.rn + 1
)
SELECT doc_id, CAST(n_tokens AS INTEGER) AS n_tokens, bucket,
       CAST(bucket AS BIGINT) * 4294967296 + local AS pack_id,
       n_tokens > {budget} AS oversize
FROM fill
"""


def pack_sequences(
    docs: DataFrame, budget: int = 512, buckets: int = 32
) -> DataFrame:
    """(doc_id, n_tokens, bucket, pack_id, oversize): greedy first-fit
    packing of whole documents into sequences of ≤ ``budget`` tokens.

    Within each salted bucket, documents are taken in doc-id order and a
    pack closes when the next document would overflow the budget; a
    single document larger than the budget gets its own pack, flagged
    ``oversize``.  ``pack_id`` is globally unique (bucket ⋅ 2³² + local
    sequence number).  Deterministic: same corpus → same packs."""
    import pandas as pd

    from kupo_spark.functions.sampling import key_prefix_int, md5_key

    # bucket via the md5 key family (not Spark's murmur hash): the same
    # derivation every deterministic-draw stage uses, reproducible across
    # engines — which is what lets the DuckDB oracle replay the packing
    toks = docs.select(
        "doc_id",
        F.expr(f"size({TOKENS})").alias("n_tokens"),
        F.pmod(key_prefix_int(md5_key("pack")), F.lit(buckets))
        .cast("int")
        .alias("bucket"),
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id", kind="mergesort").reset_index(drop=True)
        pack_ids, oversize = [], []
        cur_tokens, local = 0, 0
        first = True
        for n in pdf["n_tokens"]:
            n = int(n)
            if not first and cur_tokens + n > budget:
                local += 1
                cur_tokens = 0
            first = False
            cur_tokens += n
            pack_ids.append(local)
            oversize.append(n > budget)
        bucket = int(pdf["bucket"].iloc[0]) if len(pdf) else 0
        pdf["pack_id"] = [bucket * (1 << 32) + p for p in pack_ids]
        pdf["oversize"] = oversize
        return pdf

    return toks.groupBy("bucket").applyInPandas(
        pack, "doc_id long, n_tokens int, bucket int, pack_id long, oversize boolean"
    )
