"""Query registry: every implemented operator from SURVEY.md §2, as a
(name → Spark callable, name → oracle SQL) pair.

The fold-query entries are generated from ONE kwargs spec each, fed to both
the Spark builder (``operators.fold_inputs``) and the SQL builder
(``oracle.fold_inputs_sql``) so the two sides cannot drift.  Pattern
constants are computed from ``chainspec`` (the same derivation the chain
itself uses), not sampled from data.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kupo_spark import chainspec as cs
from kupo_spark import oracle, oracle_pipeline, oracle_sources
from kupo_spark.context import get_blocks_and_index, get_index
from kupo_spark.functions import curate, dedup, multimodal, similarity, textops
from kupo_spark.operators import checkpoints as cp
from kupo_spark.operators import maintenance as mt
from kupo_spark.operators import serve as _serve
from kupo_spark.operators.fold_inputs import count_inputs, count_policies, fold_inputs
from kupo_spark.operators.indexer import build_index
from kupo_spark.patterns import MatchMetadataTag

# ---- pattern constants (derived, deterministic) --------------------------
ADDR_EXACT = cs.address_of(42)                  # tag-02 address of user 42
PAY_CRED = cs.payment_credential_of(13)
DELEG_CRED = cs.delegation_credential_of(5)     # user 5 is tag-01 (5 % 4 == 1)
PAY_CRED_U5 = cs.payment_credential_of(5)
TXID = cs.transaction_id_of(123)
POLICY = cs.policy_id_of(3)
ASSET = cs.asset_name_of(2)
ROLLBACK_SLOT = 700
PRUNE_K = cs.LONGEST_ROLLBACK
META_SLOT = 50

# ---- fold-query specs: one kwargs dict drives both engines ----------------
#
# The driver runs at most 50 CORRECTNESS queries (r01 recorded exactly the
# first 50 registered), so related shapes are MERGED into single driver rows:
# each merged row unions several fold bodies tagged by a marker column `q`,
# certifying every arm's semantics under one slot.
FOLD_SPECS: dict[str, dict] = {
    "fold_all": dict(pattern="*"),
    "fold_unspent": dict(pattern="*", status="unspent"),
    "fold_only_shelley": dict(pattern="*/*"),
    "fold_exact_address": dict(pattern=ADDR_EXACT),
    "fold_payment_cred": dict(pattern=f"{PAY_CRED}/*"),
    "fold_delegation": dict(pattern=f"*/{DELEG_CRED}"),
    "fold_payment_and_delegation": dict(pattern=f"{PAY_CRED_U5}/{DELEG_CRED}"),
    "fold_policy": dict(pattern=f"{POLICY}.*"),
    "fold_asset": dict(pattern=f"{POLICY}.{ASSET}"),
    "fold_created_range": dict(pattern="*", created_after=200, created_before=400),
    "fold_mixed_range": dict(pattern=f"{PAY_CRED}/*", created_before=800, spent_after=300),
    "fold_resolve_hashes": dict(pattern=f"{PAY_CRED}/*", resolve_hashes=True),
}

#: merged fold rows: name → [(marker, spec), ...]
MERGED_FOLD_SPECS: dict[str, list[tuple[str, dict]]] = {
    # P15 spent-window bounds (spent_after / spent_before)
    "fold_spent_window": [
        ("after", dict(pattern="*", status="spent", spent_after=500)),
        ("before", dict(pattern="*", status="spent", spent_before=400)),
    ],
    # P7 `*@txid` + P8 `ix@txid`
    "fold_by_reference": [
        ("txid", dict(pattern=f"*@{TXID}")),
        ("outref", dict(pattern=f"0@{TXID}")),
    ],
    # P14 residual query-param filters (policy+asset / txid+index)
    "fold_residual": [
        ("policy", dict(pattern="*", filter_policy_id=POLICY, filter_asset_name=ASSET)),
        ("txid", dict(pattern="*", filter_transaction_id=TXID, filter_output_index=0)),
    ],
}

QueryFn = Callable[[SparkSession, str], DataFrame]

_TAG_INDEX_CACHE: dict = {}


def _tag_index(spark: SparkSession, sf_dir: str):
    """Index built with a `{tag}` pattern — P11 is ingest-time matching."""
    from kupo_spark.context import evict_stale

    evict_stale(_TAG_INDEX_CACHE, id(spark.sparkContext))
    key = (id(spark.sparkContext), sf_dir, cs.META_TAG)
    if key not in _TAG_INDEX_CACHE:
        blocks, _ = get_blocks_and_index(spark, sf_dir)
        _TAG_INDEX_CACHE[key] = build_index(
            blocks, patterns=[MatchMetadataTag(cs.META_TAG)]
        )
    return _TAG_INDEX_CACHE[key]


_ROLLBACK_PROJ = [
    "output_reference", "transaction_id", "transaction_index", "output_index",
    "address", "payment_credential", "coins", "datum_hash", "script_hash",
    "created_at", "spent_at", "spent_by", "spent_with",
]


#: M5 arm constants (round-8 rotated arm): PUT /patterns batch form —
#: rollback to M5_SLOT, install M5_NEW beside M5_OLD, backfill
M5_SLOT = 400
M5_OLD = f"{PAY_CRED}/*"
M5_NEW = f"*/{DELEG_CRED}"

#: orphan-heal arm constants (round-9 rotated arm): the legacy crash-window
#: APPEND carries the vec_id % HEAL_MOD = HEAL_RES subset shifted by
#: HEAL_SHIFT (disjoint new ids) — shared by the Spark arm and its oracle
HEAL_SHIFT = 1_000_000
HEAL_MOD = 11
HEAL_RES = 3

#: gappy-arm checkpoint filter (round-9 rotated arm): an irregular ~4%
#: subset of slots, so the O3 log-spaced sample runs over large gaps and
#: several sampled distances resolve to the SAME oldest checkpoint —
#: exercising the distinct-on-slot dedup the dense fixture never fires.
#: One SQL expression, applied verbatim by both engines.
GAPPY_WHERE = "slot_no % 89 < 2 OR slot_no % 53 = 0"


def _q_list_checkpoints_plus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O3 listCheckpointsDesc, dense (the fixture's slot distribution) and
    gappy (round-9 rotated arm, VERDICT r8 #5: the same sample over the
    GAPPY_WHERE-filtered checkpoint set) — the gappy tip is the filtered
    set's own max, so both engines derive it identically."""
    import dataclasses

    idx = get_index(spark, sf_dir)
    dense = cp.list_checkpoints(idx).select(F.lit("dense").alias("arm"), "*")
    gappy_idx = dataclasses.replace(
        idx, checkpoints=idx.checkpoints.where(GAPPY_WHERE)
    )
    gappy = cp.list_checkpoints(gappy_idx).select(F.lit("gappy").alias("arm"), "*")
    return dense.unionByName(gappy)


def _q_rollback(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M1 rollbackTo PLUS the round-8 rotated M5 arm (VERDICT r7 #6): the
    PUT /patterns rollback→install→backfill composition
    (``maintenance.put_patterns_backfill``, the expression the HTTP batch
    route swaps in) — rows the OLD pattern matches survive in full, rows
    only the NEW pattern matches exist only past the rollback point.

    PLUS the round-11 rotated streaming-replay arm (VERDICT r10 #3b —
    F7/S6 were suite-tested only): drive :class:`StreamingIndexer` over
    the fixture chain split into micro-batches with a MID-STREAM rollback
    (ingest ≤600, ingest (600,800], roll back to 700 — retracting the
    (700,800] suffix and UN-spending rows spent there — then replay
    (700,tip], the chain-sync re-delivery after a fork,
    ``src/Kupo.hs:259-317`` + ``App.hs:311-346``).  The resolved log
    state must equal the one-shot batch index on the full chain; a
    rollback that over/under-retracts or a replay that double-applies
    flips the hash."""
    import dataclasses

    idx = get_index(spark, sf_dir)
    rolled = (
        mt.rollback_to(idx, ROLLBACK_SLOT)
        .inputs.select(*_ROLLBACK_PROJ)
        .withColumn("q", F.lit("rollback"))
    )
    from kupo_spark.patterns import pattern_from_text, to_column

    union_pred = to_column(pattern_from_text(M5_OLD)) | to_column(
        pattern_from_text(M5_NEW)
    )
    # the index rebuilt with the ENLARGED set ≡ the '*' index filtered to
    # the union predicate (build_index's pattern gate is a row filter)
    union_idx = dataclasses.replace(idx, inputs=idx.inputs.where(union_pred))
    m5 = (
        mt.put_patterns_backfill(union_idx, [M5_OLD], M5_SLOT)
        .inputs.select(*_ROLLBACK_PROJ)
        .withColumn("q", F.lit("put_patterns"))
    )
    import tempfile

    from kupo_spark.streaming.indexer import StreamingIndexer

    blocks, _ = get_blocks_and_index(spark, sf_dir)
    six = StreamingIndexer(tempfile.mkdtemp(prefix="kupo-replay-arm-"))
    six.process_batch(blocks.where(F.col("slot_no") <= 600), 1)
    six.process_batch(
        blocks.where((F.col("slot_no") > 600) & (F.col("slot_no") <= 800)), 2
    )
    six.append_rollback(ROLLBACK_SLOT)
    six.process_batch(blocks.where(F.col("slot_no") > ROLLBACK_SLOT), 3)
    replayed = (
        six.resolved_index(spark)
        .inputs.select(*_ROLLBACK_PROJ)
        .withColumn("q", F.lit("stream_replay"))
    )
    return rolled.unionByName(m5).unionByName(replayed)


_PRUNE_PROJ = [
    "output_reference", "transaction_id", "address", "coins", "created_at", "spent_at"
]


def _q_prune_inputs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M2 pruneInputs PLUS the round-10 rotated M4 arm (VERDICT r9 #4):
    ``build_index(prune_utxo=True)`` — the RemoveSpentInputs ingest path
    (``App.hs:558-577``), whose delete fires only when
    ``distanceToTip > longestRollback``; a spend AT the boundary
    (distance == k, i.e. ``spent_at == tip - k`` — 4 such rows in the
    sf0.01 fixture) stays MARKED.  The two arms share the horizon rule by
    design (M4 at ingest ≡ M2's later GC end-state), but m4edge runs the
    ingest-time broadcast-horizon code path the gardener arm never
    touches — before round 10 that path dropped ALL spent rows."""
    m2 = (
        mt.prune_inputs(get_index(spark, sf_dir), PRUNE_K)
        .inputs.select(*_PRUNE_PROJ)
        .withColumn("q", F.lit("m2"))
    )
    blocks, _ = get_blocks_and_index(spark, sf_dir)
    m4 = (
        build_index(blocks, ("*",), prune_utxo=True)
        .inputs.select(*_PRUNE_PROJ)
        .withColumn("q", F.lit("m4edge"))
    )
    return m2.unionByName(m4)


def _prune_inputs_plus_sql() -> str:
    proj = "i.output_reference, i.transaction_id, i.address, i.coins, i.created_at, i.spent_at"
    return oracle.PRELUDE + f"""
, tip AS (SELECT max(slot_no) AS tip FROM checkpoints)
SELECT {proj}, 'm2' AS q FROM inputs i, tip
WHERE i.spent_at IS NULL OR i.spent_at >= tip.tip - {PRUNE_K}
UNION ALL
SELECT {proj}, 'm4edge' FROM inputs i, tip
WHERE i.spent_at IS NULL OR i.spent_at >= tip.tip - {cs.LONGEST_ROLLBACK}
"""


def _q_prune_binary_data(spark: SparkSession, sf_dir: str) -> DataFrame:
    idx = mt.prune_binary_data(mt.rollback_to(get_index(spark, sf_dir), ROLLBACK_SLOT))
    return idx.binary_data


#: W8 copyDatabase arm pattern set (round-10 rotated arm): one credential
#: wildcard + one exact address, so the copy's OR-folded predicate and all
#: four side-table GC semi-joins are exercised
COPY_PATTERNS = (f"{cs.payment_credential_of(7)}/*", ADDR_EXACT)

_DELETE_PROJ = ["output_reference", "address", "coins", "created_at"]


def _q_delete_pattern_plus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W6 deleteInputs PLUS the round-10 rotated W8 copyDatabase arm
    (VERDICT r9 #4 — ``copy.py`` was suite-tested only): filter the live
    index through :data:`COPY_PATTERNS` into a fresh on-disk index
    (``SQLite.hs:476-576``), read it back (write→read round trip), and
    emit the copied inputs plus the GC'd side-table row counts — the
    copy prunes policies/assets to surviving outputs and the dictionaries
    to still-referenced hashes, so a missing semi-join flips a count.
    The ``copy_gc`` rows reuse the inputs projection with the table name
    in ``output_reference`` and the count in ``coins``."""
    idx = get_index(spark, sf_dir)
    deleted = (
        mt.delete_by_pattern(idx, f"{PAY_CRED}/*")
        .inputs.select(*_DELETE_PROJ)
        .withColumn("q", F.lit("delete"))
    )
    import tempfile

    from kupo_spark.operators.copy import copy_index, open_replica

    dest = tempfile.mkdtemp(prefix="kupo-copy-arm-")
    copy_index(idx, COPY_PATTERNS, dest)
    replica = open_replica(spark, dest)
    copied = (
        replica.inputs.select(*_DELETE_PROJ).withColumn("q", F.lit("copy"))
    )
    gc = None
    for tbl, df_t in (
        ("policies", replica.policies),
        ("assets", replica.assets),
        ("binary_data", replica.binary_data),
        ("scripts", replica.scripts),
    ):
        # no NULL cells: the driver's order-insensitive compare sorts rows
        # column-wise, and a NULL in a leading sort column breaks ordering
        row = df_t.agg(F.count("*").alias("n")).select(
            F.lit("copy_gc").alias("q"),
            F.lit(tbl).alias("output_reference"),
            F.lit("").alias("address"),
            F.col("n").cast("long").alias("coins"),
            F.lit(-1).cast("long").alias("created_at"),
        )
        gc = row if gc is None else gc.unionByName(row)
    return deleted.unionByName(copied).unionByName(gc)


def _delete_pattern_plus_sql() -> str:
    from kupo_spark.patterns import pattern_from_text

    match = " OR ".join(
        f"({oracle.to_sql(pattern_from_text(p))})" for p in COPY_PATTERNS
    )
    proj = "i.output_reference, i.address, i.coins, i.created_at"
    gc_counts = {
        "policies": (
            "SELECT count(*) FROM policies p WHERE EXISTS ("
            f"SELECT 1 FROM inputs i WHERE ({match}) "
            "AND i.output_reference = p.output_reference)"
        ),
        "assets": (
            "SELECT count(*) FROM assets_tbl a WHERE EXISTS ("
            f"SELECT 1 FROM inputs i WHERE ({match}) "
            "AND i.output_reference = a.output_reference)"
        ),
        "binary_data": (
            "SELECT count(*) FROM binary_data bd WHERE EXISTS ("
            f"SELECT 1 FROM inputs i WHERE ({match}) "
            "AND i.datum_hash = bd.binary_data_hash)"
        ),
        "scripts": (
            "SELECT count(*) FROM scripts sc WHERE EXISTS ("
            f"SELECT 1 FROM inputs i WHERE ({match}) "
            "AND i.script_hash = sc.script_hash)"
        ),
    }
    gc_rows = " UNION ALL ".join(
        f"SELECT '{tbl}', '', CAST(({sub}) AS BIGINT), "
        "CAST(-1 AS BIGINT), 'copy_gc'"
        for tbl, sub in gc_counts.items()
    )
    return oracle.PRELUDE + f"""
SELECT {proj}, 'delete' AS q FROM inputs i
WHERE NOT (right(i.address, 56) = '{PAY_CRED}')
UNION ALL
SELECT {proj}, 'copy' FROM inputs i WHERE {match}
UNION ALL
{gc_rows}
"""


_TAG_PROJ = ["output_reference", "transaction_id", "address", "coins", "created_at"]


def _q_metadata_by_slot_plus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GET /metadata/{slot} (S4) with and without the transaction_id
    filter, PLUS the round-11 rotated C8 deep-recursion arm (VERDICT r10
    #3c — ``metadata.py``'s recursive renderer was gated by one flat-ish
    fixture slot): each metadata payload at the slot is wrapped five
    levels deep (map→list→map→list→map, ``metadata_deep_cbor_sql`` — a
    shared Spark/DuckDB derivation like the chain's own metadata) and
    rendered through the ENGINE's recursive schema renderer
    (``schema_to_json``, Metadata.hs:73-96, Arrow-batched pandas UDF);
    the oracle builds the byte-exact expected JSON text independently in
    SQL, so any depth-limited, mis-ordered, or mis-escaped rendering
    flips the hash."""
    import pandas
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import StringType

    from kupo_spark.metadata import metadata_deep_cbor_sql

    blocks = get_blocks_and_index(spark, sf_dir)[0]
    base = mt.metadata_by_slot(blocks, META_SLOT).withColumn("q", F.lit("slot"))
    tx = mt.metadata_by_slot(
        blocks, META_SLOT, transaction_id=cs.transaction_id_of(500)
    ).withColumn("q", F.lit("tx"))

    # explicit returnType, no type hints (stringified annotations break
    # pandas_udf's hint resolution under `from __future__ import annotations`)
    def _render_schema(hex_cbor):
        import json as _json

        from kupo_spark.metadata import schema_to_json

        return pandas.Series(
            [
                _json.dumps(
                    schema_to_json(bytes.fromhex(h)), separators=(",", ":")
                )
                for h in hex_cbor
            ]
        )

    _render = pandas_udf(_render_schema, returnType=StringType())
    deep = (
        mt.metadata_by_slot(blocks, META_SLOT)
        .withColumn("deep_cbor", F.expr(metadata_deep_cbor_sql("metadata_cbor")))
        .select(
            "transaction_id",
            _render(F.col("deep_cbor")).alias("metadata_cbor"),
            F.lit("deep").alias("q"),
        )
    )
    return base.unionByName(tx).unionByName(deep)


def _q_index_metadata_tag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P11 `{tag}` ingest-only matching PLUS the round-11 rotated
    sliced-write arm (VERDICT r10 #3a — ``write_index(bucket_range=)``,
    the slot-range incremental primitive the sf10 ingest certification
    rests on, was suite-tested only): write the full index as three
    disjoint bucket-range sub-writes delivered OUT OF ORDER plus one
    RETRY of the middle range (dynamic partition overwrite must make the
    re-run idempotent), finish the side tables, read the layout back and
    emit every input — a dropped, duplicated, or stale partition dir
    flips the hash against the plain full-index oracle."""
    idx = _tag_index(spark, sf_dir)
    tag = idx.inputs.select(*_TAG_PROJ).withColumn("q", F.lit("tag"))

    import tempfile

    from kupo_spark.operators.indexer import read_index, write_index

    full = get_index(spark, sf_dir)
    dest = tempfile.mkdtemp(prefix="kupo-slicedw-arm-")
    sb = 100  # small buckets so even the sf0.001 fixture genuinely slices
    max_created = full.inputs.agg(F.max("created_at")).first()[0] or 0
    n_buckets = int(max_created) // sb + 1
    step = -(-n_buckets // 3)
    ranges = [
        (i * step, min((i + 1) * step, n_buckets))
        for i in range(3)
        if i * step < min((i + 1) * step, n_buckets)
    ]
    # out of order (range 0 last) + a retry of the middle range
    order = ranges[1:] + ranges[:1] + ranges[1:2]
    for lo, hi in order:
        write_index(full, dest, slot_bucket=sb, bucket_range=(lo, hi), only="inputs")
    write_index(full, dest, slot_bucket=sb, only="side")
    sliced = (
        read_index(spark, dest, slot_bucket=sb)
        .inputs.select(*_TAG_PROJ)
        .withColumn("q", F.lit("slicedw"))
    )
    return tag.unionByName(sliced)


def _source_fold(idx, datum_hash_col) -> DataFrame:
    """Common projection certifying a protocol source's decode → index →
    fold path: every indexed output with its spend resolution and the
    multiasset decode collapsed to (count, total quantity)."""
    per_assets = idx.assets.groupBy("output_reference").agg(
        F.count("*").alias("n_assets"), F.sum("quantity").alias("asset_qty")
    )
    return idx.inputs.join(per_assets, "output_reference", "left").select(
        "output_reference", "transaction_id", "transaction_index", "output_index",
        "address", "coins", "created_at", "datum_kind",
        datum_hash_col,
        "datum_cbor", "spent_at", "spent_by", "spent_input_index", "spent_with",
        F.coalesce("n_assets", F.lit(0)).alias("n_assets"),
        F.coalesce("asset_qty", F.lit(0)).alias("asset_qty"),
    )


def _q_ogmios_fold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S2 hard signal, two tagged arms: 'plain' — NDJSON nextBlock log →
    protocol decode → index (the oracle restates the decode semantics in
    SQL over the same JSON); 'canonical' — a SEGMENT DIRECTORY carrying a
    real RollBackward fork, netted out by ``canonical_blocks`` (the oracle
    restates the netting rule over the same files via ``filename``).
    Inline datum hashes are computed (blake2b) — not SQL-expressible — so
    the projection carries the hash only for reference datums."""
    from kupo_spark.sources.ogmios import canonical_blocks, read_ogmios_jsonl

    ref_hash = F.when(F.col("datum_kind") == "reference", F.col("datum_hash")).alias(
        "ref_datum_hash"
    )
    plain = _source_fold(
        build_index(read_ogmios_jsonl(spark, oracle_sources.OGMIOS_LOG)), ref_hash
    )
    canon = _source_fold(
        build_index(canonical_blocks(spark, oracle_sources.OGMIOS_SEGMENTS)), ref_hash
    )
    return plain.select(F.lit("plain").alias("arm"), "*").unionByName(
        canon.select(F.lit("canonical").alias("arm"), "*")
    )


def _q_hydra_fold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S3 hard signal: ServerOutput log (genesis UTxO + Conway tx CBOR) →
    decode → index; the oracle reads golden rows authored by the fixture
    generator from the abstract tx spec (CBOR is not SQL-decodable)."""
    from kupo_spark.sources.hydra import read_hydra_jsonl

    idx = build_index(read_hydra_jsonl(spark, oracle_sources.HYDRA_LOG))
    return _source_fold(idx, F.col("datum_hash"))


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _embs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def _lsh_buckets_and_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    # sentinels (not NULLs) in the off-arm columns: the driver's compare
    # sorts row tuples, and None is unordered against values in python3
    emb = _embs(spark, sf_dir)
    buckets = similarity.lsh_buckets(emb).select(
        F.lit("buckets").alias("q"), "vec_id", "bucket",
        F.lit(-1).cast("long").alias("vec_b"),
        F.lit(-2.0).cast("double").alias("cosine"),
    )
    near = similarity.embedding_near_dup_pairs(emb, threshold=0.3).select(
        F.lit("near_dup").alias("q"), F.col("vec_a").alias("vec_id"),
        F.lit("").alias("bucket"), "vec_b", "cosine",
    )
    # SemDeDup verdict rides the same slot: cell -> bucket (stringified),
    # dup_of -> vec_b, keep -> cosine (1.0 kept / 0.0 dropped)
    sem = similarity.semantic_dedup(emb, threshold=0.3, kmeans_iters=2).select(
        F.lit("semdedup").alias("q"), "vec_id",
        F.col("cell").cast("string").alias("bucket"),
        F.col("dup_of").alias("vec_b"),
        F.expr("CASE WHEN keep THEN 1.0 ELSE 0.0 END").cast("double").alias("cosine"),
    )
    return buckets.unionByName(near).unionByName(sem)


def _dedup_exact_and_substring(spark: SparkSession, sf_dir: str) -> DataFrame:
    # tagged union: the exact-dedup table plus the substring-dedup verdict;
    # clean_text folds to md5 so the value hash pins the reassembled text,
    # and (n_tiles, n_removed) reuse the exact arm's numeric slots
    docs = _docs(spark, sf_dir)
    exact = dedup.exact_duplicates(docs).select(
        F.lit("exact").alias("q"), "doc_id", "content_hash",
        "canonical_doc_id", "group_size",
    )
    sub = dedup.exact_substring_dedup(docs, k=8).select(
        F.lit("substring").alias("q"), "doc_id",
        F.expr("md5(clean_text)").alias("content_hash"),
        F.col("n_tiles").alias("canonical_doc_id"),
        F.col("n_removed").cast("long").alias("group_size"),
    )
    return exact.unionByName(sub)


def _token_stats_and_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    # tagged union: whitespace token stats + the BPE-ish piece count
    docs = _docs(spark, sf_dir)
    ws = textops.token_stats(docs).select(F.lit("ws").alias("q"), "*")
    bpe = textops.bpe_piece_count(docs).select(
        F.lit("bpe").alias("q"), "doc_id",
        F.col("n_pieces").alias("n_tokens"),
        F.col("n_tokens").alias("n_uniq_tokens"),
        F.col("pieces_per_token").alias("avg_token_len"),
        F.lit(-1.0).alias("ttr"),
    )
    return ws.unionByName(bpe)


#: data-mixing recipe + benchmark texts for the driver-checked arms —
#: shared literals between the Spark callable and the DuckDB oracle
MIX_FRACTIONS = {"src0": 0.5, "src1": 0.1}
MIX_DEFAULT = 0.25
CONTAM_BENCH = ("key agg row scan slow fast", "the line sort table window")
#: perplexity floor for the learned-curation arm: drops ~8% of the
#: synthetic docs with a measured >=3e-5 margin to every avg_logprob
LM_FLOOR = -3.45


def _curate_and_learned(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kupo_spark.functions.classifier import FROZEN_QUALITY_MODEL

    docs = _docs(spark, sf_dir)
    learned = curate.curate(
        docs,
        min_tokens=20,
        lm_floor=LM_FLOOR,
        quality_model=FROZEN_QUALITY_MODEL,
        quality_threshold=0.5,
    )
    # the base arm is DERIVED from the learned rows (rule reasons fire
    # before the learned gates), so the expensive near-dup clustering
    # lineage executes once; kept rows carry drop_reason '' (not NULL) —
    # the driver's sort compares cells across arms sharing a doc_id, and
    # None is unordered against strings in python3
    l_reason = F.coalesce("drop_reason", F.lit(""))
    b_reason = F.when(
        F.col("drop_reason").isin("lm_outlier", "low_quality"), F.lit("")
    ).otherwise(l_reason)
    return learned.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit("learned").alias("q"),
                    F.col("doc_id").alias("doc_id"),
                    F.col("keep").alias("keep"),
                    l_reason.alias("drop_reason"),
                ),
                F.struct(
                    F.lit("base").alias("q"),
                    F.col("doc_id").alias("doc_id"),
                    (b_reason == "").alias("keep"),
                    b_reason.alias("drop_reason"),
                ),
            )
        ).alias("r")
    ).select("r.*")


def _fingerprint_chunks_shards_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    # tagged union on the fingerprint shape: fingerprint + token chunking
    # (md5(chunk):n_tokens rides the fingerprint slot, chunk_id the bucket
    # slot) + shard assignment (shard/pos) + the deterministic sample (the
    # surviving row set IS the verdict)
    from kupo_spark.functions import chunking, sampling
    from kupo_spark.functions.shards import assign_shards

    docs = _docs(spark, sf_dir)
    fp = textops.fingerprint(docs).select(F.lit("fp").alias("q"), "*")
    ch = chunking.chunk_documents(docs, 32, 8).select(
        F.lit("chunks").alias("q"),
        "doc_id",
        F.concat(
            F.expr("md5(chunk_text)"), F.lit(":"), F.col("n_tokens").cast("string")
        ).alias("fingerprint"),
        F.col("chunk_id").cast("string").alias("bucket"),
    )
    sh = assign_shards(docs, 8, seed="r4").select(
        F.lit("shards").alias("q"),
        "doc_id",
        F.col("shard").cast("string").alias("fingerprint"),
        F.col("pos").cast("string").alias("bucket"),
    )
    sm = sampling.deterministic_sample(docs, 0.3, seed="s1").select(
        F.lit("sample").alias("q"),
        "doc_id",
        F.lit("kept").alias("fingerprint"),
        F.lit("").alias("bucket"),
    )
    mx = sampling.mix_by_source(
        docs, MIX_FRACTIONS, seed="m1", default=MIX_DEFAULT
    ).select(
        F.lit("mix").alias("q"),
        "doc_id",
        F.lit("kept").alias("fingerprint"),
        F.col("source").alias("bucket"),
    )
    ct = sampling.contamination(docs, list(CONTAM_BENCH)).select(
        F.lit("contam").alias("q"),
        "doc_id",
        F.col("n_contaminated_shingles").cast("string").alias("fingerprint"),
        F.when(F.col("contaminated"), "1").otherwise("0").alias("bucket"),
    )
    pk = chunking.pack_sequences(docs, budget=256, buckets=8).select(
        F.lit("pack").alias("q"),
        "doc_id",
        F.col("pack_id").cast("string").alias("fingerprint"),
        F.when(F.col("oversize"), "1").otherwise("0").alias("bucket"),
    )
    return (
        fp.unionByName(ch)
        .unionByName(sh)
        .unionByName(sm)
        .unionByName(mx)
        .unionByName(ct)
        .unionByName(pk)
    )


def _quality_and_clf(spark: SparkSession, sf_dir: str) -> DataFrame:
    # tagged union: heuristic quality/Gopher row + the frozen learned
    # classifier's verdict (prob -> stopword_ratio slot, pred ->
    # gopher_pass slot); scoring recomputed from the same rounded
    # features in both engines, weights as shared literals
    from kupo_spark.functions.classifier import FROZEN_QUALITY_MODEL, score_quality

    docs = _docs(spark, sf_dir)
    quality = textops.quality_score(docs).select(F.lit("quality").alias("q"), "*")
    clf = score_quality(docs, FROZEN_QUALITY_MODEL).select(
        F.lit("clf").alias("q"), "doc_id",
        F.round("prob", 6).alias("stopword_ratio"),
        F.lit(-1.0).alias("quality_score"),
        F.lit(-1).alias("n_tokens"),
        F.lit(-1.0).alias("avg_token_len"),
        F.lit(-1.0).alias("frac_dup_2gram"),
        F.lit(-1.0).alias("top_2gram_frac"),
        (F.round("prob", 6) >= 0.5).alias("gopher_pass"),
    )
    return quality.unionByName(clf)


def _tfidf_and_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    # tagged union: top tf-idf terms + the bigram-LM (stupid backoff)
    # typicality score; avg_logprob rides the tfidf slot, n_transitions
    # the rank slot
    from kupo_spark.functions import lm

    docs = _docs(spark, sf_dir)
    tf = textops.tfidf_top_terms(docs, top=3).withColumn("q", F.lit("tfidf")).select(
        "q", "doc_id", "term", "tfidf", "rank"
    )
    lmrow = lm.lm_score(docs).select(
        F.lit("lm").alias("q"), "doc_id", F.lit("").alias("term"),
        F.col("avg_logprob").alias("tfidf"),
        F.col("n_transitions").cast("int").alias("rank"),
    )
    return tf.unionByName(lmrow)


def _minhash_lsh_and_est(spark: SparkSession, sf_dir: str) -> DataFrame:
    # tagged union: exact-verified LSH pairs + the sketch-only
    # (signature-agreement) pair list the incremental store is built on
    docs = _docs(spark, sf_dir)
    exact = dedup.minhash_near_dup_pairs(docs, threshold=0.5).select(
        F.lit("lsh").alias("q"), "doc_a", "doc_b", "jaccard"
    )
    est = dedup.minhash_est_pairs(docs, threshold=0.5).select(
        F.lit("est").alias("q"), "doc_a", "doc_b",
        F.col("est_jaccard").alias("jaccard"),
    )
    # the boilerplate-saturation guards (max_df pre-hash shingle cap +
    # band bucket cap) — the oracle re-derives the capped space end to end
    guarded = dedup.minhash_near_dup_pairs(
        docs, threshold=0.5, max_df=64, max_bucket=32
    ).select(F.lit("guarded").alias("q"), "doc_a", "doc_b", "jaccard")
    return exact.unionByName(est).unionByName(guarded)


#: LLM-data-pipeline operators: name → (spark callable, oracle SQL | None)
PIPELINE_QUERIES: dict[str, tuple[QueryFn, str | None]] = {
    "q_dedup_exact": (
        _dedup_exact_and_substring,
        oracle_pipeline.dedup_exact_and_substring_sql(8),
    ),
    "q_text_token_stats": (
        lambda s, d: _token_stats_and_bpe(s, d),
        oracle_pipeline.token_stats_and_bpe_sql(),
    ),
    "q_text_quality": (
        lambda s, d: _quality_and_clf(s, d),
        oracle_pipeline.quality_and_clf_sql(),
    ),
    "q_text_lang_id": (
        lambda s, d: textops.lang_id(_docs(s, d)),
        oracle_pipeline.lang_id_sql(),
    ),
    "q_text_tfidf": (
        lambda s, d: _tfidf_and_lm(s, d),
        oracle_pipeline.tfidf_and_lm_sql(3),
    ),
    "q_text_fingerprint": (
        _fingerprint_chunks_shards_sample,
        oracle_pipeline.fingerprint_chunks_shards_sample_sql(
            mix_fractions=MIX_FRACTIONS,
            mix_default=MIX_DEFAULT,
            contam_bench=CONTAM_BENCH,
        ),
    ),
    "q_dedup_ngram_jaccard": (
        # max_df guards the posting-list self-join against stopword-shingle
        # blow-up; the oracle applies the identical cap
        lambda s, d: dedup.ngram_jaccard_pairs(_docs(s, d), threshold=0.5, max_df=100),
        oracle_pipeline.ngram_jaccard_sql(0.5, max_df=100),
    ),
    "q_dedup_minhash_lsh": (
        _minhash_lsh_and_est,
        oracle_pipeline.minhash_lsh_and_est_sql(0.5),
    ),
    "q_dedup_simhash": (
        lambda s, d: dedup.simhash(_docs(s, d)),
        oracle_pipeline.simhash_sql(),
    ),
    # tagged union: exact brute force + the SQ8 scalar-quantized tier (the
    # oracle re-derives min/max training + encode/dequantize + ranking)
    "q_embedding_topk": (
        lambda s, d: _exact_and_sq_topk(s, d),
        oracle_pipeline.embedding_topk_and_sq_sql(10, 5),
    ),
    # tagged union (50-row budget): the sign-LSH bucket index + the
    # embedding-cosine near-dup pairs derived from it (candidates share a
    # bucket, exact integer cosine verifies candidates only)
    "q_embedding_lsh_buckets": (
        lambda s, d: _lsh_buckets_and_near_dup(s, d),
        oracle_pipeline.lsh_buckets_near_dup_and_semdedup_sql(0.3),
    ),
    "q_multimodal_features": (
        lambda s, d: multimodal.extract_features(multimodal.as_media_table(_docs(s, d))),
        oracle_pipeline.multimodal_features_sql(),
    ),
    # tagged union: default curation + the FULL learned-gates composition
    # (rule gates -> bigram-LM perplexity floor -> frozen classifier);
    # thresholds chosen with measured >=3e-5 margins to every score so
    # rounded-float noise cannot flip a verdict (oracle_pipeline docstring)
    "q_curate": (
        lambda s, d: _curate_and_learned(s, d),
        oracle_pipeline.curate_and_learned_sql(20, lm_floor=LM_FLOOR),
    ),
    "q_dedup_clusters": (
        lambda s, d: dedup.near_dup_clusters(_docs(s, d), threshold=0.5),
        oracle_pipeline.near_dup_clusters_sql(0.5),
    ),
    "q_embedding_label_topk": (
        lambda s, d: similarity.label_filtered_topk(_embs(s, d), n_queries=10, k=3),
        oracle_pipeline.embedding_label_topk_sql(10, 3),
    ),
    # IVF centroids are k-means-trained (2 Lloyd rounds in exact integer
    # arithmetic); the oracle re-derives the identical centroids via CTEs.
    "q_embedding_ivf_assign": (
        lambda s, d: similarity.ivf_assign(_embs(s, d), kmeans_iters=2),
        oracle_pipeline.ivf_assign_sql(16, kmeans_iters=2),
    ),
    # ANN top-k variants: the candidate set is the (oracle-checked) bucket /
    # IVF cell, so the bucket-restricted exact top-k is fully deterministic —
    # the oracle splices the bucket CTE into the brute-force ranking.
    "q_embedding_lsh_topk": (
        lambda s, d: similarity.lsh_topk(_embs(s, d), n_queries=10, k=5),
        oracle_pipeline.lsh_topk_sql(10, 5),
    ),
    # tagged union (50-row budget): the two 100 TB ANN tiers — IVF coarse
    # partitioning and PQ/ADC compressed scoring.  The pq arm re-derives
    # codebook training (per-subspace exact-int Lloyd), corpus encode, and
    # the ADC table arithmetic in the oracle end to end.
    "q_embedding_ivf_topk": (
        lambda s, d: _ivf_and_pq_topk(s, d),
        oracle_pipeline.ivf_topk_and_pq_sql(
            10, 5, kmeans_iters=2, pq_iters=2,
            heal_shift=HEAL_SHIFT, heal_mod=HEAL_MOD, heal_res=HEAL_RES,
        ),
    ),
}


def _exact_and_sq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kupo_spark.functions.sq import sq_topk

    emb = _embs(spark, sf_dir)
    exact = similarity.brute_force_topk(emb, n_queries=10, k=5).select(
        F.lit("exact").alias("q"), "query_id", "neighbor_id", "cosine", "rank"
    )
    sq8 = sq_topk(emb, n_queries=10, k=5).select(
        F.lit("sq8").alias("q"), "query_id", "neighbor_id", "cosine", "rank"
    )
    return exact.unionByName(sq8)


def _ivf_and_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ten independent ANN lifecycles certified under one row.

    r11 (guide §2.6, overlap independent jobs): the lifecycles share no
    state — each builds under its own scratch root from the same immutable
    ``emb`` parquet, and every training/encode/commit is deterministic
    exact-integer arithmetic — so their EAGER legs (Lloyd collects, Table
    commits, rebalances, deletes) now run from a small thread pool instead
    of serializing ~50 scheduler floors end to end.  Spark's scheduler runs
    concurrent jobs by design; result frames are gathered and unioned in
    the exact order the sequential version used, and each lifecycle's
    internal ordering (build -> mutate -> assert -> query) is preserved
    inside its thunk, so the certified semantics and the row set are
    byte-identical (the arm re-verified against the oracle after the
    change).  Wall time is the point: this row was the slowest in the
    registry (40.6 s at sf0.01) with every second being per-job fixed
    overhead, not data."""
    import tempfile
    from concurrent.futures import ThreadPoolExecutor

    from kupo_spark.functions import pq
    from kupo_spark.functions.ann_index import VectorIndex

    emb = _embs(spark, sf_dir)

    def t_ivf():
        return similarity.ivf_topk(emb, n_queries=10, k=5, kmeans_iters=2).select(
            F.lit("ivf").alias("q"), "query_id", "neighbor_id", "cosine", "rank"
        )

    def t_pq_transient():
        # books feed both the transient ADC arm and the two-stage rerank
        # arm — one training, two frames (same dependency the sequential
        # code had)
        books = pq.train_codebooks(emb, iters=2)
        adc = pq.pq_adc_topk(emb, books, n_queries=10, k=5).select(
            F.lit("pq").alias("q"), "query_id", "neighbor_id", "cosine", "rank"
        )
        refined = pq.pq_refined_topk(emb, books, n_queries=10, k=5, refine=4).select(
            F.lit("pq_refined").alias("q"), "query_id", "neighbor_id", "cosine", "rank"
        )
        return adc, refined
    # the PERSISTED index (ann_index.VectorIndex): built from scratch under
    # a scratch root, queried through the stored centroids/codebooks — the
    # oracle checks the full build->store->query lifecycle, not the pinned
    # stored==transient test.  Round-6 rotated arms (VERDICT r5 #8):
    # 'stored_probe2' = IVF-flat multi-probe (nprobe=2; replaces 'stored',
    # which was definitionally the ivf arm's ranking); 'stored_deleted' =
    # the CRUD delete lifecycle (build, transactional delete of vec_id%7==0,
    # query — removed rows absent as neighbors, cells from the pre-delete
    # training); 'stored_rebalanced' = the OPTIMIZE lifecycle (strided-rank
    # density seeds + Lloyd retrain over the stored corpus, one overwrite
    # commit); 'stored_pq' = IVF-PQ probing every cell, which is exactly
    # the flat-ADC ranking (same ADC tables, all neighbors scored).
    scratch = tempfile.mkdtemp(prefix="annix-")  # lives until process exit:
    # the returned DataFrame lazily reads the stored parquet cells

    def t_flat():
        flat = VectorIndex.build(
            f"{scratch}/flat", emb, pq=False, n_centroids=16, kmeans_iters=2
        )
        return flat.topk(emb, n_queries=10, k=5, nprobe=2).select(
            F.lit("stored_probe2").alias("q"),
            "query_id", "neighbor_id", "cosine", "rank",
        )

    def t_flat_del():
        flat_del = VectorIndex.build(
            f"{scratch}/flat_del", emb, pq=False, n_centroids=16, kmeans_iters=2
        )
        flat_del.delete(
            [r.vec_id for r in emb.where("vec_id % 7 = 0").select("vec_id").collect()],
            spark,
        )
        return flat_del.topk(emb, n_queries=10, k=5, nprobe=1).select(
            F.lit("stored_deleted").alias("q"),
            "query_id", "neighbor_id", "cosine", "rank",
        )

    def t_flat_reb():
        flat_reb = VectorIndex.build(
            f"{scratch}/flat_reb", emb, pq=False, n_centroids=16, kmeans_iters=0
        )
        flat_reb.rebalance(spark, kmeans_iters=2)
        return flat_reb.topk(emb, n_queries=10, k=5, nprobe=1).select(
            F.lit("stored_rebalanced").alias("q"),
            "query_id", "neighbor_id", "cosine", "rank",
        )
    # round-7 rotated arm: the rebalance -> delete COMPOSITION (VERDICT r6
    # #5) — OPTIMIZE retrains/re-partitions, then a transactional delete
    # rewrites only hit files of the NEW layout; centroids stay the
    # rebalance-trained ones (full corpus), removed rows are absent as
    # neighbors.  Also pins that the meta-version guard (_pinned_version)
    # does NOT wrongly pin reads before a post-rebalance delete.
    def t_flat_rd():
        flat_rd = VectorIndex.build(
            f"{scratch}/flat_rd", emb, pq=False, n_centroids=16, kmeans_iters=0
        )
        flat_rd.rebalance(spark, kmeans_iters=2)
        flat_rd.delete(
            [r.vec_id for r in emb.where("vec_id % 5 = 0").select("vec_id").collect()],
            spark,
        )
        return flat_rd.topk(emb, n_queries=10, k=5, nprobe=1).select(
            F.lit("stored_reb_deleted").alias("q"),
            "query_id", "neighbor_id", "cosine", "rank",
        )
    # round-9 rotated arm (VERDICT r8 #5): the orphan-heal lifecycle,
    # driver-gated end to end — foreign OVERWRITE with no meta publish
    # (pin), then a LEGACY crash-window APPEND beyond the pin (written
    # through the raw table, the way an add() that predates the
    # pinned-refuse guard landed rows), then rebalance(seed_mode=
    # "strided"), which must rebuild from pinned-snapshot ∪ orphans
    # (_orphan_appends, ann_index.py:417) and discard the foreign
    # overwrite's scrambled assignment.  The oracle re-derives the
    # strided Lloyd retrain + nprobe=2 ranking over exactly that union:
    # dropped orphans or surviving foreign content flips the hash.
    def t_flat_heal():
        flat_heal = VectorIndex.build(
            f"{scratch}/flat_heal", emb, pq=False, n_centroids=16, kmeans_iters=2
        )
        foreign_heal = flat_heal.table.read(spark).withColumn(
            "centroid_id", (F.col("vec_id") % 16).cast("long")
        )
        flat_heal.table.overwrite(foreign_heal)  # crash: no _write_meta follows
        orphan_emb = emb.where(f"vec_id % {HEAL_MOD} = {HEAL_RES}").withColumn(
            "vec_id", F.col("vec_id") + F.lit(HEAL_SHIFT)
        )
        from kupo_spark.functions.ann_index import _encode_rows

        flat_heal.table.append(_encode_rows(orphan_emb, flat_heal.meta))
        reopened_heal = VectorIndex(f"{scratch}/flat_heal")
        assert reopened_heal._pinned_version() is not None
        reopened_heal.rebalance(spark, kmeans_iters=2, seed_mode="strided")
        assert reopened_heal._pinned_version() is None  # heal published meta
        return reopened_heal.topk(emb, n_queries=10, k=5, nprobe=2).select(
            F.lit("stored_healed").alias("q"),
            "query_id", "neighbor_id", "cosine", "rank",
        )
    # round-8 rotated arm (VERDICT r7 #6): the _pinned_version crash
    # window — a rebalance/refresh OVERWRITE lands (here: a scrambled
    # reassignment written straight to the table) but the process dies
    # before its meta publish.  A fresh open must pin every read to the
    # last consistent snapshot, so the query equals the UNDISTURBED
    # stored_probe2 derivation — the oracle re-derives exactly that.
    def t_flat_pin():
        flat_pin = VectorIndex.build(
            f"{scratch}/flat_pin", emb, pq=False, n_centroids=16, kmeans_iters=2
        )
        foreign = flat_pin.table.read(spark).withColumn(
            "centroid_id", (F.col("vec_id") % 16).cast("long")
        )
        flat_pin.table.overwrite(foreign)  # crash: no _write_meta follows
        reopened_pin = VectorIndex(f"{scratch}/flat_pin")
        assert reopened_pin._pinned_version() is not None
        return reopened_pin.topk(emb, n_queries=10, k=5, nprobe=2).select(
            F.lit("stored_pinned").alias("q"),
            "query_id", "neighbor_id", "cosine", "rank",
        )

    def t_pq_stored():
        pqix = VectorIndex.build(
            f"{scratch}/pq", emb, pq=True, n_centroids=16, kmeans_iters=2,
            codebook_iters=2,
        )
        return pqix.topk(emb, n_queries=10, k=5, nprobe=16).select(
            F.lit("stored_pq").alias("q"), "query_id", "neighbor_id", "cosine", "rank"
        )

    # the IVF-SQ8 middle tier: byte codes per cell, exact search over the
    # dequantized vectors — the oracle re-derives training + round trip +
    # cell-restricted ranking
    def t_sq8():
        sqix = VectorIndex.build(
            f"{scratch}/sq8", emb, mode="ivf_sq8", n_centroids=16, kmeans_iters=2
        )
        return sqix.topk(emb, n_queries=10, k=5, nprobe=1).select(
            F.lit("stored_sq8").alias("q"), "query_id", "neighbor_id", "cosine", "rank"
        )

    # 2-3 jobs in flight fills the scheduler; more just queue (guide §2.6)
    with ThreadPoolExecutor(max_workers=4) as pool:
        f_ivf = pool.submit(t_ivf)
        f_pqt = pool.submit(t_pq_transient)
        f_flat = pool.submit(t_flat)
        f_del = pool.submit(t_flat_del)
        f_reb = pool.submit(t_flat_reb)
        f_rd = pool.submit(t_flat_rd)
        f_heal = pool.submit(t_flat_heal)
        f_pin = pool.submit(t_flat_pin)
        f_pqs = pool.submit(t_pq_stored)
        f_sq8 = pool.submit(t_sq8)
        ivf = f_ivf.result()
        adc, refined = f_pqt.result()
        stored = f_flat.result()
        stored_deleted = f_del.result()
        stored_rebalanced = f_reb.result()
        stored_reb_deleted = f_rd.result()
        stored_healed = f_heal.result()
        stored_pinned = f_pin.result()
        stored_pq = f_pqs.result()
        stored_sq8 = f_sq8.result()
    return (
        ivf.unionByName(adc)
        .unionByName(stored)
        .unionByName(stored_deleted)
        .unionByName(stored_rebalanced)
        .unionByName(stored_reb_deleted)
        .unionByName(stored_pinned)
        .unionByName(stored_healed)
        .unionByName(stored_pq)
        .unionByName(refined)
        .unionByName(stored_sq8)
    )


#: render-mode arms shared by the Spark row and its oracle (C7)
RESULT_JSON_ARMS = [
    ("plain", {}),
    ("resolved", {"resolve_hashes": True}),
    ("string", {"quantity_as_string": True}),
]


#: round-10 rotated arm constants — the front-consistency arm serves ONE
#: point (event 109's tx, output 0 — its address carries payment cred 14)
#: through the SO_REUSEPORT front worker AND the primary, across a
#: DELETE-triggered index swap that removes exactly that credential; the
#: server's active pattern is cred 13 so the delete is disjoint-allowed.
FRONT_POINT_E = 109
FRONT_DEL_CRED = cs.payment_credential_of(14)


def _q_result_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C7 hard signal: the resultToJson-shaped payload (serve.result_json)
    in default / resolve_hashes / asset-quantity=string modes, against a
    DuckDB oracle that rebuilds the same JSON strings byte-for-byte.

    PLUS the round-10 rotated front-consistency arm (VERDICT r9 #4): a
    live ``KupoHttpServer`` with an attached :class:`ReusePortFront`
    serves the same point through a forked front worker and through the
    primary, before and after a ``DELETE /matches/{cred}`` proxied
    through the front (the delete swaps the index, re-renders the hot
    routes on the new snapshot inside ``_swap_index``, and rolls the
    worker generation).  Both sources' bodies and the front's ETag are
    oracle-checked: pre-swap the point renders its row, post-swap it
    must render ``[]`` from BOTH paths — a stale front generation or a
    front/primary divergence flips the hash."""
    idx = get_index(spark, sf_dir)
    df = None
    for marker, spec in RESULT_JSON_ARMS:
        arm = _serve.result_json(idx, "*", **spec).select(
            F.lit(marker).alias("q"), "output_reference", "result"
        )
        df = arm if df is None else df.unionByName(arm)
    return df.unionByName(_front_consistency_rows(spark, sf_dir))


def _front_consistency_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile
    import urllib.request

    from kupo_spark.operators.http_server import KupoHttpServer

    blocks, idx = get_blocks_and_index(spark, sf_dir)
    path = f"/matches/0@{cs.transaction_id_of(FRONT_POINT_E)}"
    srv = KupoHttpServer(
        spark,
        idx,
        blocks=blocks,
        patterns=(f"{PAY_CRED}/*",),  # cred 13: disjoint from the delete
        store_path=tempfile.mkdtemp(prefix="kupo-front-arm-") + "/patterns.txt",
    ).start()
    rows = []
    try:
        def get(base: str, p: str, method: str = "GET"):
            req = urllib.request.Request(base + p, method=method)
            with urllib.request.urlopen(req, timeout=120) as r:
                return dict(r.headers), r.read().decode()

        _, primary_pre = get(srv.url, path)  # also records the hot point
        front = srv.attach_front(workers=2, refresh_interval=3600)
        h, front_pre = get(front.url, path)
        rows += [
            ("front_pre", path, front_pre),
            ("primary_pre", path, primary_pre),
            ("front_pre_etag", path, h.get("ETag")),
        ]
        # the swap: DELETE proxied through the front to the primary;
        # _swap_index re-renders the hot routes and rolls the generation
        # synchronously, so the very next front GET must see the new body
        get(front.url, f"/matches/{FRONT_DEL_CRED}/*", method="DELETE")
        h2, front_post = get(front.url, path)
        _, primary_post = get(srv.url, path)
        rows += [
            ("front_post", path, front_post),
            ("primary_post", path, primary_post),
            ("front_post_etag", path, h2.get("ETag")),
        ]
    finally:
        srv.close()
    return spark.createDataFrame(
        rows, schema="q string, output_reference string, result string"
    )


def _result_json_plus_sql() -> str:
    from kupo_spark.patterns import pattern_from_text

    base = oracle.result_json_sql(RESULT_JSON_ARMS)
    oref = cs.output_reference_of(FRONT_POINT_E, 0)
    path = f"/matches/0@{cs.transaction_id_of(FRONT_POINT_E)}"
    body = oracle._match_json_body()
    pre = (
        f"(SELECT '[' || coalesce(string_agg(result, ','), '') || ']' "
        f"FROM ({body}) t WHERE t.output_reference = '{oref}')"
    )
    del_sql = oracle.to_sql(pattern_from_text(f"{FRONT_DEL_CRED}/*"))
    post = (
        f"(SELECT '[' || coalesce(string_agg(result, ','), '') || ']' "
        f"FROM ({body}) t JOIN inputs i ON i.output_reference = t.output_reference "
        f"WHERE t.output_reference = '{oref}' AND NOT ({del_sql}))"
    )
    etag = (
        "(SELECT header_hash FROM checkpoints "
        "WHERE slot_no = (SELECT max(slot_no) FROM checkpoints))"
    )
    front = (
        f"SELECT 'front_pre' AS q, '{path}' AS output_reference, {pre} AS result "
        f"UNION ALL SELECT 'primary_pre', '{path}', {pre} "
        f"UNION ALL SELECT 'front_pre_etag', '{path}', {etag} "
        f"UNION ALL SELECT 'front_post', '{path}', {post} "
        f"UNION ALL SELECT 'primary_post', '{path}', {post} "
        f"UNION ALL SELECT 'front_post_etag', '{path}', {etag}"
    )
    return base + " UNION ALL " + front


def _merged_fold(spark: SparkSession, sf_dir: str, arms: list[tuple[str, dict]]) -> DataFrame:
    idx = get_index(spark, sf_dir)
    df = None
    for marker, spec in arms:
        arm = fold_inputs(idx, **spec).withColumn("q", F.lit(marker))
        df = arm if df is None else df.unionByName(arm)
    return df


#: keyset page size for the paged correctness arm — deliberately not a
#: divisor of typical result sizes, so the last page is partial
PAGE_ARM_SIZE = 13
#: forced-overflow cap for the bounded-stream arm (result ≫ cap, so the
#: iterator path is the one certified)
BOUNDED_ARM_CAP = 7
#: created_after bound for the oldest_first paged arm (mid-fixture, so the
#: filter actually drops a prefix and the first page starts mid-result)
OPAGED_AFTER = 150


def _q_fold_resolve_hashes_plus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3/J4 dictionary joins (the plain ``full`` arm) PLUS the round-9
    rotated arm (VERDICT r8 #5): ``hpaged{N}`` — the keyset page walk
    COMPOSED with ``resolve_hashes`` and the unspent status filter, i.e.
    the J3/J4 dict joins × cursor arithmetic × P15 interaction.  Page
    membership is certified the same way as the residual row's paged arms:
    every row carries its page number, so a cursor boundary that drops or
    double-delivers a row under the composed plan flips the hash."""
    from pyspark.sql.types import StringType, StructField, StructType

    from kupo_spark.operators.serving import Serving

    idx = get_index(spark, sf_dir)
    pat = f"{PAY_CRED}/*"
    full = fold_inputs(idx, pat, resolve_hashes=True).withColumn(
        "q", F.lit("full")
    )
    serving = Serving(idx)
    try:
        plan = serving.fold(pat, resolve_hashes=True, status="unspent")
        schema = StructType(
            list(plan.schema.fields) + [StructField("q", StringType(), False)]
        )
        tagged = []
        for pno, page in enumerate(
            serving.fold_pages(
                pat,
                page_size=PAGE_ARM_SIZE,
                resolve_hashes=True,
                status="unspent",
            )
        ):
            tagged.extend(tuple(r) + (f"hpaged{pno}",) for r in page)
    finally:
        serving.close()
    return full.unionByName(spark.createDataFrame(tagged, schema))


def _fold_resolve_hashes_plus_sql() -> str:
    """Oracle for :func:`_q_fold_resolve_hashes_plus`: the resolved fold
    body verbatim (``full``), and the chain-order page-membership window
    over the resolved + unspent body (``hpaged{N}``)."""
    pat = f"{PAY_CRED}/*"
    body_full = oracle.fold_inputs_sql(pat, resolve_hashes=True, with_prelude=False)
    body_h = oracle.fold_inputs_sql(
        pat, resolve_hashes=True, status="unspent", with_prelude=False
    )
    order = "created_at DESC, transaction_index DESC, output_index DESC"
    hpaged = (
        f"SELECT th.*, 'hpaged' || CAST((row_number() OVER (ORDER BY {order})"
        f" - 1) // {PAGE_ARM_SIZE} AS VARCHAR) AS q FROM ({body_h}) th"
    )
    return (
        oracle.PRELUDE
        + f"SELECT tf.*, 'full' AS q FROM ({body_full}) tf"
        + " UNION ALL "
        + hpaged
    )


def _q_fold_residual_plus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The P14 residual-filter arms PLUS the round-7 rotated serving-tier
    arms (VERDICT r6 #5), all under the one driver row:

    - ``paged{N}``: the FULL keyset-pagination chain —
      ``Serving.fold_pages`` walks cursor pages of ``PAGE_ARM_SIZE`` over
      the delegation fold; every row is tagged with its page number, so
      the oracle (row_number windows over the same chain order) certifies
      exact page MEMBERSHIP, not just the concatenation: a boundary
      dropping or double-delivering a row under cursor arithmetic flips a
      tag and fails the hash.
    - ``bounded``: ``fold_rows_bounded`` with ``max_rows`` ≪ result size,
      forcing the bounded-memory iterator (toLocalIterator stream) path —
      certified row-for-row equal to the plain fold.
    - ``opaged{N}`` (round-8 rotated arm, VERDICT r7 #6): the keyset walk
      under ``order=oldest_first`` COMPOSED with a slot-range filter
      (``created_after``) — the ascending cursor arithmetic and the
      filter's interaction with page boundaries, page-membership
      certified the same way.
    """
    from kupo_spark.operators.serving import Serving

    from pyspark.sql.types import StringType, StructField, StructType

    base = _merged_fold(spark, sf_dir, MERGED_FOLD_SPECS["fold_residual"])
    idx = get_index(spark, sf_dir)
    serving = Serving(idx)
    pat = f"*/{DELEG_CRED}"
    try:
        plan = serving.fold(pat)
        schema = StructType(
            list(plan.schema.fields) + [StructField("q", StringType(), False)]
        )
        tagged = []
        for pno, page in enumerate(
            serving.fold_pages(pat, page_size=PAGE_ARM_SIZE)
        ):
            tagged.extend(tuple(r) + (f"paged{pno}",) for r in page)
        tagged.extend(
            tuple(r) + ("bounded",)
            for r in serving.fold_rows_bounded(pat, max_rows=BOUNDED_ARM_CAP)
        )
        for pno, page in enumerate(
            serving.fold_pages(
                pat,
                page_size=PAGE_ARM_SIZE,
                order="oldest_first",
                created_after=OPAGED_AFTER,
            )
        ):
            tagged.extend(tuple(r) + (f"opaged{pno}",) for r in page)
    finally:
        serving.close()
    extra = spark.createDataFrame(tagged, schema)
    return base.unionByName(extra)


def _fold_residual_plus_sql() -> str:
    """Oracle for :func:`_q_fold_residual_plus`: the residual arms, the
    page-membership window (page N = rows [N·size, (N+1)·size) of the
    chain-order ranking — exactly what a correct keyset cursor walk must
    deliver), and the bounded arm (the full fold verbatim)."""
    body = oracle.fold_inputs_sql(f"*/{DELEG_CRED}", with_prelude=False)
    order = "created_at DESC, transaction_index DESC, output_index DESC"
    paged = (
        f"SELECT tp.*, 'paged' || CAST((row_number() OVER (ORDER BY {order})"
        f" - 1) // {PAGE_ARM_SIZE} AS VARCHAR) AS q FROM ({body}) tp"
    )
    bounded = f"SELECT tb.*, 'bounded' AS q FROM ({body}) tb"
    # oldest_first + slot-range composition: the ASC ranking over the
    # FILTERED result is what a correct ascending cursor walk delivers
    obody = oracle.fold_inputs_sql(
        f"*/{DELEG_CRED}", created_after=OPAGED_AFTER, with_prelude=False
    )
    oorder = "created_at ASC, transaction_index ASC, output_index ASC"
    opaged = (
        f"SELECT toq.*, 'opaged' || CAST((row_number() OVER (ORDER BY {oorder})"
        f" - 1) // {PAGE_ARM_SIZE} AS VARCHAR) AS q FROM ({obody}) toq"
    )
    base = oracle.merged_fold_sql(MERGED_FOLD_SPECS["fold_residual"])
    return (
        base
        + " UNION ALL "
        + paged
        + " UNION ALL "
        + bounded
        + " UNION ALL "
        + opaged
    )


def queries() -> dict[str, QueryFn]:
    """≤50 entries (the driver's CORRECTNESS run caps there): chain-core
    queries first, merged rows for related shapes, LLM-pipeline ops last."""
    out: dict[str, QueryFn] = {}

    for name, spec in FOLD_SPECS.items():
        def fn(spark, sf_dir, _spec=spec):
            return fold_inputs(get_index(spark, sf_dir), **_spec)
        out[f"q_{name}"] = fn

    for name, arms in MERGED_FOLD_SPECS.items():
        def mfn(spark, sf_dir, _arms=arms):
            return _merged_fold(spark, sf_dir, _arms)
        out[f"q_{name}"] = mfn
    out["q_fold_residual"] = _q_fold_residual_plus
    out["q_fold_resolve_hashes"] = _q_fold_resolve_hashes_plus

    # A1 (wildcard + payment-credential) and A2 (countPolicies) in one row
    out["q_count_inputs"] = lambda s, d: (
        count_inputs(get_index(s, d), "*")
        .withColumn("pattern", F.lit("all"))
        .unionByName(
            count_inputs(get_index(s, d), f"{PAY_CRED}/*")
            .withColumn("pattern", F.lit("payment"))
        )
        .unionByName(
            count_policies(get_index(s, d), f"{PAY_CRED}/*")
            .withColumn("pattern", F.lit("policies"))
        )
    )
    # C7 resultToJson byte-exact in all three encoder modes, one row
    out["q_result_json"] = _q_result_json
    out["q_max_checkpoint"] = lambda s, d: cp.max_checkpoint(get_index(s, d))
    out["q_list_checkpoints"] = _q_list_checkpoints_plus
    out["q_ancestors"] = lambda s, d: cp.ancestors(get_index(s, d), 500, 3)
    # O4 both dictionary lookups (datum + script), one row
    out["q_binary_lookup"] = lambda s, d: (
        cp.get_binary_data(get_index(s, d), cs.datum_hash_of(17))
        .select(
            F.lit("datum").alias("kind"),
            F.col("binary_data_hash").alias("hash"),
            F.col("binary_data").alias("payload"),
        )
        .unionByName(
            cp.get_script(get_index(s, d), cs.script_hash_of(12)).select(
                F.lit("script").alias("kind"),
                F.col("script_hash").alias("hash"),
                F.col("script").alias("payload"),
            )
        )
    )
    out["q_assets_by_policy"] = lambda s, d: get_index(s, d).assets.where(
        F.col("policy_id") == POLICY
    ).select("output_reference", "asset_name", "quantity")
    # GET /checkpoints/{slot} strict + nonstrict, one row
    out["q_checkpoint_lookup"] = lambda s, d: (
        cp.checkpoint_by_slot(get_index(s, d), 42, strict=True)
        .withColumn("mode", F.lit("strict"))
        .unionByName(
            cp.checkpoint_by_slot(get_index(s, d), 98765, strict=False)
            .withColumn("mode", F.lit("nonstrict"))
        )
    )
    out["q_health"] = lambda s, d: _serve.health(get_index(s, d))
    out["q_rollback_inputs"] = _q_rollback
    out["q_prune_inputs"] = _q_prune_inputs
    out["q_prune_binary_data"] = _q_prune_binary_data
    # GET /metadata/{slot} with and without the transaction_id filter,
    # plus the round-11 C8 deep-recursion arm
    out["q_metadata_by_slot"] = _q_metadata_by_slot_plus
    out["q_delete_pattern"] = _q_delete_pattern_plus
    out["q_index_metadata_tag"] = _q_index_metadata_tag
    out["q_ogmios_fold"] = _q_ogmios_fold
    out["q_hydra_fold"] = _q_hydra_fold

    for name, (fn, _sql) in PIPELINE_QUERIES.items():
        out[name] = fn
    return out


def oracle_sql() -> dict[str, str]:
    out: dict[str, str] = {}
    for name, spec in FOLD_SPECS.items():
        out[f"q_{name}"] = oracle.fold_inputs_sql(**spec)
    for name, arms in MERGED_FOLD_SPECS.items():
        out[f"q_{name}"] = oracle.merged_fold_sql(arms)
    out["q_fold_residual"] = _fold_residual_plus_sql()
    out["q_fold_resolve_hashes"] = _fold_resolve_hashes_plus_sql()
    out["q_count_inputs"] = oracle.count_inputs_multi_sql(
        [("all", "*"), ("payment", f"{PAY_CRED}/*")],
        policies_arm=("policies", f"{PAY_CRED}/*"),
    )
    out["q_result_json"] = _result_json_plus_sql()
    out["q_max_checkpoint"] = oracle.max_checkpoint_sql()
    out["q_list_checkpoints"] = oracle.list_checkpoints_sql(
        cs.LONGEST_ROLLBACK, gappy_where=GAPPY_WHERE
    )
    out["q_ancestors"] = oracle.ancestors_sql(500, 3)
    out["q_binary_lookup"] = oracle.PRELUDE + (
        "SELECT 'datum' AS kind, binary_data_hash AS hash, binary_data AS payload "
        f"FROM binary_data WHERE binary_data_hash = '{cs.datum_hash_of(17)}' "
        "UNION ALL "
        "SELECT 'script', script_hash, script "
        f"FROM scripts WHERE script_hash = '{cs.script_hash_of(12)}'"
    )
    out["q_assets_by_policy"] = oracle.PRELUDE + (
        "SELECT output_reference, asset_name, quantity FROM assets_tbl "
        f"WHERE policy_id = '{POLICY}'"
    )
    out["q_checkpoint_lookup"] = oracle.PRELUDE + (
        "SELECT slot_no, header_hash, 'strict' AS mode "
        "FROM checkpoints WHERE slot_no = 42 "
        "UNION ALL "
        "SELECT slot_no, header_hash, 'nonstrict' FROM ("
        "SELECT slot_no, header_hash FROM checkpoints WHERE slot_no <= 98765 "
        "ORDER BY slot_no DESC LIMIT 1) t"
    )
    out["q_health"] = oracle.PRELUDE + (
        "SELECT (SELECT max(slot_no) FROM checkpoints) AS most_recent_checkpoint, "
        "(SELECT count(*) FROM checkpoints) AS n_checkpoints, "
        "(SELECT count(*) FROM inputs) AS n_inputs, "
        "(SELECT count(*) FROM inputs WHERE spent_at IS NULL) AS n_unspent"
    )
    out["q_rollback_inputs"] = oracle.rollback_and_put_patterns_sql(
        ROLLBACK_SLOT, M5_OLD, M5_NEW, M5_SLOT
    )
    out["q_prune_inputs"] = _prune_inputs_plus_sql()
    out["q_prune_binary_data"] = oracle.pruned_binary_data_sql(ROLLBACK_SLOT)
    from kupo_spark.metadata import (
        metadata_cbor_sql,
        metadata_deep_schema_json_sql,
    )

    _mc = metadata_cbor_sql("e")
    _deep_json = metadata_deep_schema_json_sql(_mc)
    out["q_metadata_by_slot"] = oracle.PRELUDE + (
        f"SELECT transaction_id, {_mc} AS metadata_cbor, "
        f"'slot' AS q FROM outs "
        f"WHERE created_at = {META_SLOT} AND e % 4 = 0 AND output_index = 0 "
        "UNION ALL "
        f"SELECT transaction_id, {_mc}, 'tx' "
        f"FROM outs WHERE created_at = {META_SLOT} AND e % 4 = 0 AND output_index = 0 "
        f"AND transaction_id = '{cs.transaction_id_of(500)}' "
        "UNION ALL "
        # round-11 C8 deep arm: the recursive renderer's output for the
        # 5-level wrap, built independently as SQL text
        f"SELECT transaction_id, {_deep_json}, 'deep' "
        f"FROM outs WHERE created_at = {META_SLOT} AND e % 4 = 0 AND output_index = 0"
    )
    out["q_delete_pattern"] = _delete_pattern_plus_sql()
    out["q_index_metadata_tag"] = oracle.PRELUDE + (
        "SELECT output_reference, transaction_id, address, coins, created_at, "
        "'tag' AS q "
        "FROM inputs i WHERE EXISTS (SELECT 1 FROM outs o "
        "WHERE o.transaction_id = i.transaction_id AND o.e % 4 = 0) "
        "UNION ALL "
        # round-11 sliced-write arm: three out-of-order bucket-range
        # sub-writes + one retry read back == the plain full index
        "SELECT output_reference, transaction_id, address, coins, "
        "created_at, 'slicedw' FROM inputs i"
    )
    out["q_ogmios_fold"] = (
        f"SELECT 'plain' AS arm, * FROM ({oracle_sources.ogmios_fold_sql()})\n"
        "UNION ALL\n"
        f"SELECT 'canonical' AS arm, * FROM ({oracle_sources.ogmios_canonical_fold_sql()})"
    )
    out["q_hydra_fold"] = oracle_sources.hydra_fold_sql()
    for name, (_fn, sql) in PIPELINE_QUERIES.items():
        if sql is not None:
            out[name] = sql
    return out


def flagship(spark: SparkSession) -> DataFrame:
    """Driver smoke query: unspent wildcard matches at sf0.001."""
    return fold_inputs(get_index(spark, "/root/testdata/sf0.001"), "*", status="unspent")
