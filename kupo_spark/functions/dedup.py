"""Deduplication operators — exact, n-gram Jaccard, MinHash+LSH, SimHash.

Scale design:

- **exact**: hash-groupBy on a content digest; the digest (not the text)
  is the shuffle key, so payload bytes never move twice.
- **n-gram Jaccard** (exact near-dup): explode word shingles, self-join on
  the shingle.  The join key is a 3-word string — at 100 TB replace with its
  md5 (fixed width) and pre-aggregate DISTINCT (doc, shingle) map-side; the
  quadratic blow-up only materializes per shared shingle, which is the
  standard posting-list bound.
- **MinHash+LSH** (the scale path): 12 min-hashes → 4 bands of 3 → band-key
  equi-join.  Candidate generation is linear in corpus size; only candidates
  pay the verification join.  Band keys are md5 strings — uniform, so the
  shuffle is skew-free by construction.
- **SimHash**: 16-bit signature via per-token nibble votes, all integer
  arithmetic (portable + codegen-friendly); hamming buckets by signature.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kupo_spark.functions.textops import TOKENS

N_MINHASH = 12
N_BANDS = 4
ROWS_PER_BAND = 3


def exact_duplicates(docs: DataFrame) -> DataFrame:
    """Exact dedup: canonical doc per content hash + group size.

    One shuffle total: the window partitions by the digest, so group stats
    ride the same Exchange the rows already need — no agg + re-join (which
    would shuffle the digest table twice)."""
    from pyspark.sql.window import Window

    w = Window.partitionBy("content_hash")
    return docs.select("doc_id", F.expr("md5(text)").alias("content_hash")).select(
        "doc_id",
        "content_hash",
        F.min("doc_id").over(w).alias("canonical_doc_id"),
        F.count("*").over(w).alias("group_size"),
    )


def shingle_stream(docs: DataFrame, k: int = 3) -> DataFrame:
    """All word k-shingles per document WITHOUT the per-doc distinct pass —
    the pre-filter feed for consumers that reduce the stream before any
    exchange (r11, guide §2.3: shuffle fewer bytes).  ``shingles`` pays a
    corpus-wide ``dropDuplicates`` exchange over every 3-word string; a
    consumer that filters the stream against a small broadcast set first
    (e.g. :func:`kupo_spark.functions.sampling.contamination`'s benchmark
    join) only needs distinctness of the few surviving rows, and
    filter-then-distinct ≡ distinct-then-filter for any row-level
    predicate."""
    idx = " || ' ' || ".join(f"t[i + {j}]" for j in range(k))
    return docs.select("doc_id", F.expr(TOKENS).alias("t")).select(
        "doc_id",
        F.explode(
            F.expr(
                f"CASE WHEN size(t) >= {k} THEN "
                f"transform(sequence(0, size(t) - {k}), i -> {idx}) "
                "ELSE cast(array() as array<string>) END"
            )
        ).alias("sh"),
    )


def shingles(docs: DataFrame, k: int = 3) -> DataFrame:
    """Distinct word k-shingles per document."""
    return shingle_stream(docs, k).dropDuplicates(["doc_id", "sh"])


def shingle_arrays(docs: DataFrame, k: int = 3) -> DataFrame:
    """(doc_id, shs): each document's DISTINCT k-shingle set as ONE array —
    the zero-shuffle form of :func:`shingles` (r11, guide §2.4).

    ``shingles`` dedups by exploding every shingle and shuffling the full
    3-word strings through ``dropDuplicates``; distinctness is a PER-DOCUMENT
    property, so ``array_distinct`` inside the row computes the same set with
    no exchange at all (measured: 0.28 s vs 0.84 s for the exploded+distinct
    noop at the bench corpus).  A document with fewer than ``k`` tokens gets
    an empty array (the exploded form simply has no rows for it).

    CONSUMPTION CONTRACT: materialize (persist) this frame before exploding
    it — ``explode`` over the un-materialized array expression re-evaluates
    the generator child per OUTPUT row (measured 9.2 s vs 0.28 s), because
    the tokenize+transform+array_distinct tree gets inlined into the
    Generate node.  :func:`minhash_near_dup_pairs` persists it and then
    derives both the exploded signature feed and the verification sets from
    the one cached table."""
    idx = " || ' ' || ".join(f"t[i + {j}]" for j in range(k))
    return docs.select("doc_id", F.expr(TOKENS).alias("t")).select(
        "doc_id",
        F.expr(
            f"array_distinct(CASE WHEN size(t) >= {k} THEN "
            f"transform(sequence(0, size(t) - {k}), i -> {idx}) "
            "ELSE cast(array() as array<string>) END)"
        ).alias("shs"),
    )


def drop_frequent_shingles(sh: DataFrame, max_df: int) -> DataFrame:
    """Remove shingles whose document frequency exceeds ``max_df``.

    A shingle shared by a large fraction of the corpus ("of the and") carries
    no dedup signal but makes the posting-list self-join quadratic in its df —
    THE scale hazard of exact Jaccard.  Hot shingles are few by definition
    (heavy hitters), so the filter is a broadcast anti-join; the df aggregate
    is a map-side-combinable count."""
    hot = (
        sh.groupBy("sh")
        .agg(F.count("*").alias("df"))
        .where(F.col("df") > max_df)
        .select("sh")
    )
    return sh.join(F.broadcast(hot), "sh", "left_anti")


def ngram_jaccard_pairs(
    docs: DataFrame, threshold: float = 0.5, k: int = 3, max_df: int | None = None
) -> DataFrame:
    """Exact near-dup pairs by k-shingle Jaccard ≥ threshold.

    With ``max_df`` set, shingles with document frequency above it are
    dropped BEFORE the self-join (and the per-doc set sizes are computed on
    the capped shingle space, keeping the Jaccard internally consistent) —
    bounding the posting-list blow-up by max_df² per shingle.

    The default (uncapped) path derives the posting list and the per-doc
    set sizes from a persisted :func:`shingle_arrays` table (r11, guide
    §2.4, same move as :func:`minhash_near_dup_pairs`): distinctness is
    per-document, so the exploded ``dropDuplicates`` exchange AND the
    counts ``groupBy`` shuffle both disappear — the persisted array row
    already is the distinct set, and its ``size`` is the count.  The
    capped path keeps the exploded plan its corpus-wide df counts and
    capped-space set sizes require."""
    if max_df is None:
        arr = shingle_arrays(docs, k).persist()
        sh = arr.select("doc_id", F.explode("shs").alias("sh"))
        counts = arr.select("doc_id", F.size("shs").alias("n"))
    else:
        sh = drop_frequent_shingles(shingles(docs, k), max_df).persist()
        counts = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    a = sh.select(F.col("doc_id").alias("doc_a"), "sh")
    b = sh.select(F.col("doc_id").alias("doc_b"), "sh")
    inter = (
        a.join(b, "sh")
        .where(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("i"))
    )
    ca = counts.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na"))
    cb = counts.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb"))
    return (
        inter.join(ca, "doc_a")
        .join(cb, "doc_b")
        .withColumn("jaccard", F.expr("round(i / (na + nb - i), 6)"))
        .where(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


#: modulus of the double-hashed min-hash family (fits 12·2³¹ in int64)
MINHASH_MOD = 2_147_483_647


def minhash_signatures_wide(
    docs: DataFrame, n: int = N_MINHASH, k: int = 3, sh: DataFrame | None = None
) -> DataFrame:
    """(doc_id, sig_0 … sig_{n-1}): n min-hashes over the shingle set,
    computed as ONE map-side-combinable aggregation (no crossJoin, no
    per-(doc, i) shuffle — the only shuffle is the groupBy(doc_id), with n
    partial mins folded map-side).

    Hash family = Kirsch-Mitzenmacher double hashing: two 60-bit halves of
    ONE md5 per shingle give h1, h2; g_i = (h1 + i·h2) mod M.  One digest
    per shingle row instead of n — the md5 is the dominant per-row cost of
    the signature scan — and the arithmetic is exact int64 in Spark and
    DuckDB alike (both parse the hex halves to the same bigint).

    The distinct pass in the default :func:`shingles` feed is FREE here:
    ``min`` is duplicate-insensitive, so Catalyst's
    ``RemoveRedundantAggregates`` (SPARK-33122) eliminates the
    ``dropDuplicates`` aggregate below this groupBy outright — the
    compiled plan is identical to feeding the raw :func:`shingle_stream`
    (verified: both plans carry exactly ONE Exchange, the doc_id groupBy
    of the map-side partial mins; pinned by
    ``test_signatures_from_raw_stream_equal_distinct_feed``).

    ``sh`` lets a caller that already materialized a shingle table (the
    verification path needs it too) share it instead of re-running the
    explode."""
    if sh is None:
        sh = shingles(docs, k)
    M = MINHASH_MOD
    hashed = sh.selectExpr(
        "doc_id",
        f"cast(conv(substr(md5(sh), 1, 15), 16, 10) as bigint) % {M} as h1",
        f"cast(conv(substr(md5(sh), 17, 15), 16, 10) as bigint) % {M} as h2",
    )
    aggs = [
        F.min(F.expr(f"(h1 + {i} * h2) % {M}")).alias(f"sig_{i}") for i in range(n)
    ]
    return hashed.groupBy("doc_id").agg(*aggs)


def minhash_signatures(docs: DataFrame, n: int = N_MINHASH, k: int = 3) -> DataFrame:
    """Narrow (doc_id, i, sig) view of the wide signatures (no extra
    shuffle — stack is a projection)."""
    wide = minhash_signatures_wide(docs, n, k)
    stack = ", ".join(f"{i}, sig_{i}" for i in range(n))
    return wide.select("doc_id", F.expr(f"stack({n}, {stack}) as (i, sig)"))


def band_keys_from_wide(
    wide: DataFrame, bands: int = N_BANDS, rows: int = ROWS_PER_BAND
) -> DataFrame:
    """(doc_id, band, key) from an already-materialized wide signature
    frame — pure projection, zero shuffles.  A row whose signatures are
    NULL (a document with no shingles, e.g. re-read from a signature
    store) gets NULL band keys, so an equi-join on (band, key) can never
    pair two shingle-less documents."""
    band_exprs = []
    for b in range(bands):
        # concat (NOT concat_ws): it propagates NULL, so a NULL-sig row
        # yields a NULL key with no CASE (a guard branch here measured
        # ~40% on the whole LSH pipeline)
        cols = ", '|', ".join(f"cast(sig_{b * rows + r} as string)" for r in range(rows))
        band_exprs.append(f"{b}, md5(concat({cols}))")
    return wide.select(
        "doc_id", F.expr(f"stack({bands}, {', '.join(band_exprs)}) as (band, key)")
    )


def lsh_band_keys(
    docs: DataFrame, bands: int = N_BANDS, rows: int = ROWS_PER_BAND, k: int = 3,
    sh: DataFrame | None = None,
) -> DataFrame:
    """(doc_id, band, key): band key = md5 of the band's signatures in
    sig-index order ('|'-joined decimal renderings, identical in DuckDB) —
    derived from the wide signature row by pure projection (zero shuffles
    beyond the signature groupBy)."""
    wide = minhash_signatures_wide(docs, bands * rows, k, sh=sh)
    return band_keys_from_wide(wide, bands, rows)


def lsh_candidate_pairs(
    docs: DataFrame, bands: int = N_BANDS, rows: int = ROWS_PER_BAND, k: int = 3,
    sh: DataFrame | None = None, max_bucket: int | None = None,
) -> DataFrame:
    """Distinct candidate pairs sharing at least one LSH band.

    ``max_bucket`` guards the band self-join's quadratic hazard: a bucket
    of B docs yields B² pairs, and a boilerplate-saturated corpus can push
    whole-corpus buckets through a band (boiler shingles win most min-hash
    permutations, so thousands of documents share a band key — measured
    85× blow-up on a 50%-dup corpus at sf1).  Buckets above the cap are
    DROPPED, same philosophy as :func:`drop_frequent_shingles`: a band key
    shared by that many documents carries no discriminative information.
    Hot buckets are few by definition, so the kill list broadcasts."""
    bk = lsh_band_keys(docs, bands, rows, k, sh=sh)
    if max_bucket is not None:
        hot = (
            bk.groupBy("band", "key")
            .agg(F.count("*").alias("n"))
            .where(F.col("n") > max_bucket)
            .select("band", "key")
        )
        bk = bk.join(F.broadcast(hot), ["band", "key"], "left_anti")
    a = bk.select(F.col("doc_id").alias("doc_a"), "band", "key")
    b = bk.select(F.col("doc_id").alias("doc_b"), "band", "key")
    return (
        a.join(b, ["band", "key"])
        .where(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )


#: candidate-id broadcast cutoff: above this many distinct candidate doc
#: ids the semi-join falls back to a shuffle (a dup-saturated corpus — e.g.
#: crawl snapshots — makes candidates O(corpus), which would blow a
#: broadcast; the count is free because candidates are already materialized)
BROADCAST_ID_LIMIT = 2_000_000


def minhash_near_dup_pairs(
    docs: DataFrame, threshold: float = 0.5, bands: int = N_BANDS,
    rows: int = ROWS_PER_BAND, k: int = 3,
    broadcast_id_limit: int = BROADCAST_ID_LIMIT,
    max_df: int | None = None, max_bucket: int | None = None,
) -> DataFrame:
    """The scale path: LSH candidates, then exact Jaccard verification of
    candidates only.

    ``max_df`` drops corpus-frequent shingles BEFORE min-hashing (same
    cap + same Jaccard-on-capped-space semantics as
    :func:`ngram_jaccard_pairs`): boilerplate shingles present in every
    document otherwise win most min-hash permutations and collapse the
    LSH buckets into whole-corpus bins.  ``max_bucket`` additionally
    bounds any residual hot band bucket (see
    :func:`lsh_candidate_pairs`).  Both default OFF so default results
    stay oracle-exact; a boilerplate-heavy corpus should set them — the
    standard discipline of web-scale dedup pipelines (stopword/template
    shingle suppression)."""
    # ONE shingle table feeds both candidate generation (via the signature
    # agg) and verification — without sharing it, the shingle derivation
    # (the pipeline's most expensive stage) runs twice.
    if max_df is None:
        # default path (r11, guide §2.4): the per-doc array form replaces
        # two shuffles outright — dropDuplicates (distinctness is
        # per-document, array_distinct computes it in-row) and the
        # verification sets' groupBy+collect_list (the persisted array IS
        # the set row).  The exploded view feeding the signature agg is
        # derived from the same cache (explode of a materialized array
        # column — see shingle_arrays' consumption contract), already
        # distinct by construction.  Measured: full pipeline 1.11 -> 0.69 s
        # at the bench corpus, identical 256 pairs.
        arr = shingle_arrays(docs, k).persist()
        sh = arr.select("doc_id", F.explode("shs").alias("sh"))
    else:
        # capped space: corpus-wide df counts need the exploded rows, and
        # the verification sets must be rebuilt from the CAPPED table —
        # keep the exploded plan end to end (the guarded path's extra
        # shuffles are the price of the cap, not overhead)
        arr = None
        sh = drop_frequent_shingles(shingles(docs, k), max_df).persist()
    cand = lsh_candidate_pairs(
        docs, bands, rows, k, sh=sh, max_bucket=max_bucket
    ).persist()
    n_cand = cand.count()  # materialize candidates once; they gate everything below
    # verification touches ONLY candidate documents: semi-join the shingle
    # table down to candidate ids before the pairwise intersection join —
    # broadcast when candidates are sparse (the common case), shuffle
    # semi-join when a dup-saturated corpus makes them corpus-sized.
    # When the whole array table fits one advisory partition AND the pair
    # list broadcasts, the semi-join is pure overhead (r12, guide §2.4):
    # the broadcast pair joins below already restrict the probe side to
    # candidate rows, so the id union + broadcast build + two probe passes
    # buy nothing — measured 569 -> 446 ms median on the full pipeline at
    # the bench corpus, pairs identical.  A big (or unestimable) array
    # table keeps the pre-filter: at scale it bounds the shingle-array
    # bytes that reach the pair joins' exchanges.
    from kupo_spark.operators.fold_inputs import plan_is_small

    pairs_broadcast = 2 * n_cand <= broadcast_id_limit
    if arr is not None and pairs_broadcast and plan_is_small(arr):
        sets = arr.select("doc_id", "shs", F.size("shs").alias("n"))
    else:
        ids = cand.select(F.col("doc_a").alias("doc_id")).union(cand.select("doc_b"))
        # broadcast path: semi-join dedups by itself, so skip the distinct (a
        # shuffle + extra job) and ship the raw 2·|cand| id list; the shuffle
        # fallback keeps distinct to bound the exchanged volume.
        ids = F.broadcast(ids) if pairs_broadcast else ids.distinct()
        # gather each candidate doc's (distinct) shingle set into ONE array
        # row, then verify pairs with array_intersect: two equi-joins replace
        # the posting-list plan (join-on-shingle + groupBy + two count
        # joins).  Array size is bounded by document length, and the
        # per-pair replication of a hot doc's array matches the posting-list
        # replication volume, so the scale behavior is unchanged.  On the
        # default path the sets come straight off the cached arrays (no
        # groupBy); the capped path gathers the capped exploded rows as
        # before.
        if arr is not None:
            sets = arr.join(ids, "doc_id", "left_semi").select(
                "doc_id", "shs", F.size("shs").alias("n")
            )
        else:
            sets = (
                sh.join(ids, "doc_id", "left_semi")
                .groupBy("doc_id")
                .agg(F.collect_list("sh").alias("shs"), F.count("*").alias("n"))
            )
    a = sets.select(
        F.col("doc_id").alias("doc_a"), F.col("shs").alias("sa"), F.col("n").alias("na")
    )
    b = sets.select(
        F.col("doc_id").alias("doc_b"), F.col("shs").alias("sb"), F.col("n").alias("nb")
    )
    # when the pair list is small (the common, LSH-gated case) broadcast it
    # into the first join, which therefore keeps `a`'s partitioning and
    # never shuffles a's arrays; the second join re-keys on doc_b, so the
    # (pairs ⋈ a) intermediate — candidate-bounded — shuffles AT MOST once
    # (AQE turns it into a broadcast join when it is small at runtime).  On
    # a dup-saturated corpus the same gate falls back to shuffle joins.
    pairs = F.broadcast(cand) if 2 * n_cand <= broadcast_id_limit else cand
    return (
        a.join(pairs, "doc_a")
        .join(b, "doc_b")
        .withColumn("i", F.size(F.array_intersect("sa", "sb")))
        .withColumn("jaccard", F.expr("round(i / (na + nb - i), 6)"))
        .where(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def near_dup_clusters(
    docs: DataFrame, threshold: float = 0.5, max_iters: int = 20,
    check_every: int = 2,
    broadcast_id_limit: int = BROADCAST_ID_LIMIT,
    max_df: int | None = None, max_bucket: int | None = None,
) -> DataFrame:
    """Duplicate clusters: connected components over the near-dup pair
    graph, by iterative min-label propagation (the standard large-graph CC
    algorithm — each round is one join+aggregate, rounds ≈ graph diameter,
    which for dedup graphs is tiny).  Singletons keep their own id, so the
    output is a total map doc_id → canonical cluster id, ready for the
    keep-one-per-cluster filter.

    ``max_df`` / ``max_bucket`` / ``broadcast_id_limit`` pass through to
    :func:`minhash_near_dup_pairs` — a dup-saturated corpus needs its
    guards in the clustered path too (clustering a saturated pair list is
    strictly worse than generating it).

    The driver-side convergence count is an extra job per probe, so it runs
    only every ``check_every`` rounds — a converged extra round is a cheap
    no-op join, while a skipped count at 100 TB is a whole scan saved.
    The probe itself is a ``changed`` flag computed in the SAME projection
    as the new label (``neighbor_min < cluster`` ⇔ the label moved), so
    probing is a filter-count over the just-checkpointed round output —
    not a join of the new label table against the old one (r11, guide
    §1.2: the comparison the join re-derived is already known row-locally
    when the label is computed; saves one join + full-table pass per
    probe at every scale)."""
    pairs = minhash_near_dup_pairs(
        docs, threshold, broadcast_id_limit=broadcast_id_limit,
        max_df=max_df, max_bucket=max_bucket,
    ).select("doc_a", "doc_b")
    sym = pairs.union(
        pairs.select(F.col("doc_b").alias("doc_a"), F.col("doc_a").alias("doc_b"))
    ).persist()
    labels = docs.select("doc_id").withColumn("cluster", F.col("doc_id")).persist()
    for it in range(max_iters):
        neigh = (
            sym.join(labels, sym.doc_b == labels.doc_id)
            .groupBy("doc_a")
            .agg(F.min("cluster").alias("neighbor_min"))
        )
        new_labels = (
            labels.join(neigh, labels.doc_id == neigh.doc_a, "left")
            .select(
                labels.doc_id,
                F.least(
                    labels.cluster, F.coalesce(F.col("neighbor_min"), labels.cluster)
                ).alias("cluster"),
                # min-label propagation only ever lowers a label, so
                # "changed this round" ⇔ a neighbor supplied a smaller one
                (F.col("neighbor_min") < labels.cluster).alias("changed"),
            )
            .localCheckpoint()  # truncate lineage per round
        )
        converged = False
        if (it + 1) % check_every == 0 or it == max_iters - 1:
            converged = new_labels.where("changed").limit(1).count() == 0
        labels.unpersist()
        labels = new_labels.select("doc_id", "cluster").persist()
        if converged:
            break
    return labels.select("doc_id", "cluster")


SIMHASH_BITS = 16


def simhash(docs: DataFrame, bits: int = SIMHASH_BITS) -> DataFrame:
    """SimHash signature: per-token 16-bit hash from the first 4 md5 hex
    nibbles; signature bit j set iff the sum of ±1 votes over tokens is
    positive.  Pure integer arithmetic → identical across engines."""
    nibbles = 4
    # value of hex char c: strpos('0123456789abcdef', c) - 1 (1-based strpos)
    tok = docs.select(
        "doc_id",
        F.explode(F.expr(TOKENS)).alias("tok"),
    ).withColumn("h4", F.expr("substring(md5(tok), 1, 4)"))
    votes = []
    for j in range(bits):
        nib, bit = divmod(j, 4)
        val = f"(position(substring(h4, {nib + 1}, 1) IN '0123456789abcdef') - 1)"
        votes.append(
            F.expr(f"sum(CASE WHEN ({val} DIV {2 ** bit}) % 2 = 1 THEN 1 ELSE -1 END)").alias(
                f"v{j}"
            )
        )
    agg = tok.groupBy("doc_id").agg(*votes)
    sig = " + ".join(f"(CASE WHEN v{j} > 0 THEN {2 ** j} ELSE 0 END)" for j in range(bits))
    return agg.select("doc_id", F.expr(f"cast({sig} as bigint)").alias("simhash"))


def chunk_tiles(docs: DataFrame, k: int = 8) -> DataFrame:
    """(doc_id, pos, chunk): non-overlapping k-token tiles covering the
    whole document.  The trailing tile may be short; a document with no
    tokens yields one empty tile so it survives reassembly."""
    n_tiles = f"greatest(1, cast(ceil(size(t) / cast({k} as double)) as int))"
    return docs.select("doc_id", F.expr(TOKENS).alias("t")).select(
        "doc_id",
        F.posexplode(
            F.expr(
                f"transform(sequence(1, {n_tiles}),"
                f" i -> array_join(slice(t, (i - 1) * {k} + 1, {k}), ' '))"
            )
        ).alias("pos", "chunk"),
    )


def exact_substring_dedup(docs: DataFrame, k: int = 8) -> DataFrame:
    """Exact substring (chunk-level) deduplication in the style of
    "Deduplicating Training Data Makes Language Models Better" (Lee et
    al., 2021): tile every document into k-token chunks, keep only the
    corpus-wide FIRST occurrence of each distinct chunk (first = smallest
    (doc_id, pos)), drop every later occurrence — within the same
    document or across documents — and reassemble each document from its
    surviving chunks.

    Returns (doc_id, clean_text, n_tiles, n_removed); clean_text is
    whitespace-normalized (tokens re-joined with single spaces), so a
    document with no duplicated chunks round-trips to its normalized
    text.

    Scale design: the paper's suffix array is replaced by the
    shuffle-native equivalent — a row_number window partitioned by
    md5(chunk) (fixed-width uniform key, skew-free by construction), so
    the whole operator is ONE exchange on the chunk hash plus ONE
    groupBy(doc_id) for reassembly.  No join-back and no posting-list
    blow-up: every tile occurs exactly once on each side of the window.
    A pathological hot chunk ("click here to subscribe" boilerplate)
    concentrates its occurrences on one partition; the payload per row is
    one k-token string, so the skew ceiling is bytes-of-duplicates, not
    pairs-of-duplicates."""
    from pyspark.sql.window import Window

    w = Window.partitionBy("h").orderBy("doc_id", "pos")
    ranked = (
        chunk_tiles(docs, k)
        .withColumn("h", F.expr("md5(chunk)"))
        .withColumn("rn", F.row_number().over(w))
    )
    return ranked.groupBy("doc_id").agg(
        F.expr(
            "array_join(transform(array_sort(collect_list("
            "CASE WHEN rn = 1 THEN struct(pos, chunk) END)), p -> p.chunk), ' ')"
        ).alias("clean_text"),
        F.count("*").alias("n_tiles"),
        F.sum(F.expr("CASE WHEN rn = 1 THEN 0 ELSE 1 END")).alias("n_removed"),
    )


def minhash_est_pairs(
    docs: DataFrame, threshold: float = 0.5, bands: int = N_BANDS,
    rows: int = ROWS_PER_BAND, k: int = 3, wide: DataFrame | None = None,
) -> DataFrame:
    """(doc_a, doc_b, est_jaccard): LSH candidates verified by SIGNATURE
    AGREEMENT (fraction of equal min-hashes) instead of the exact shingle
    intersection — the estimator E[matches/n] = J(a, b).

    This is the sketch-only dedup path: verification reads nothing but
    the n·8-byte signature rows, so a corpus can be deduplicated — and,
    crucially, INCREMENTALLY deduplicated against a stored signature
    table (:mod:`kupo_spark.functions.incremental`) — without re-reading
    or re-shingling any previously seen text.  At 100 TB of text the
    signature store is ~100 bytes/doc; the exact-verify path
    (:func:`minhash_near_dup_pairs`) would have to persist or recompute
    the full shingle sets."""
    if wide is None:
        wide = minhash_signatures_wide(docs, bands * rows, k)
    wide = wide.persist()
    bk = band_keys_from_wide(wide, bands, rows)
    a = bk.select(F.col("doc_id").alias("doc_a"), "band", "key")
    b = bk.select(F.col("doc_id").alias("doc_b"), "band", "key")
    cand = (
        a.join(b, ["band", "key"])
        .where(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )
    return estimate_pairs(cand, wide, wide, bands * rows, threshold)


def estimate_pairs(
    cand: DataFrame, wide_a: DataFrame, wide_b: DataFrame, n: int,
    threshold: float,
) -> DataFrame:
    """Signature-agreement verification of candidate pairs: join the two
    wide signature frames onto (doc_a, doc_b) and score
    est_jaccard = |{i : sig_a_i = sig_b_i}| / n.  Two equi-joins on doc
    ids, matches counted by a codegen CASE chain — no explode back to
    (doc, i) rows (which would 12× the shuffle volume)."""
    wa = wide_a.select(
        F.col("doc_id").alias("doc_a"),
        *[F.col(f"sig_{i}").alias(f"a_sig_{i}") for i in range(n)],
    )
    wb = wide_b.select(
        F.col("doc_id").alias("doc_b"),
        *[F.col(f"sig_{i}").alias(f"b_sig_{i}") for i in range(n)],
    )
    matches = " + ".join(
        f"(CASE WHEN a_sig_{i} = b_sig_{i} THEN 1 ELSE 0 END)" for i in range(n)
    )
    return (
        cand.join(wa, "doc_a")
        .join(wb, "doc_b")
        .withColumn(
            "est_jaccard",
            # divide by a DOUBLE, not a decimal literal (int / 12.0 is
            # DECIMAL in Spark SQL, which would leave the double lane)
            F.expr(f"round(({matches}) / cast({n} as double), 6)"),
        )
        .where(F.col("est_jaccard") >= threshold)
        .select("doc_a", "doc_b", "est_jaccard")
    )


def minhash_est_dedup(
    docs: DataFrame, threshold: float = 0.5, bands: int = N_BANDS,
    rows: int = ROWS_PER_BAND, k: int = 3,
) -> DataFrame:
    """(doc_id, keep, dup_of): the keep/drop verdict over the sketch-only
    pair list.  A document is dropped iff SOME earlier document (smaller
    doc_id — kept or itself dropped) is an est-jaccard near-duplicate;
    dup_of is the smallest such doc_id, -1 when kept.  Referencing ALL
    earlier documents (not just kept ones) keeps the rule batch-size
    invariant, which is what makes the incremental store exactly
    equivalent to a one-shot pass (tested)."""
    dups = (
        minhash_est_pairs(docs, threshold, bands, rows, k)
        .groupBy(F.col("doc_b").alias("doc_id"))
        .agg(F.min("doc_a").alias("dup_of"))
    )
    return docs.select("doc_id").join(dups, "doc_id", "left").select(
        "doc_id",
        F.col("dup_of").isNull().alias("keep"),
        F.coalesce("dup_of", F.lit(-1)).cast("long").alias("dup_of"),
    )
