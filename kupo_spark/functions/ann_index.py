"""Persisted ANN index — the build / store / query / grow lifecycle for
IVF and IVF-PQ over the ACID :class:`kupo_spark.table.Table`.

The transient search paths (:func:`similarity.ivf_topk`,
:func:`pq.ivf_pq_topk`) re-train and re-encode the corpus inside every
call — right for one-shot analytics, wrong for a serving index: at
100 TB the encode IS the expensive pass, and it must run once.  This
module splits the lifecycle the way real vector stores (FAISS on-disk,
SCaNN, Milvus) do:

- **build** — train the coarse quantizer (and PQ codebooks) exactly as
  the transient paths would, encode + cell-assign the corpus once, and
  commit the codes to a Table **partitioned by centroid_id** with the
  trained parameters in an atomically-written meta JSON.  Everything is
  the repo's exact-integer arithmetic, so an index built twice from the
  same corpus is byte-identical, and `topk` over the store equals the
  transient function over the raw embeddings (pinned by test).
- **query** — probes are assigned against the STORED centroids;  the
  closure path prunes the snapshot to the probed cells' files via the
  log's partitionValues (``Table.read(file_filter=...)``) — "a probe
  reads nprobe partitions" is literal: unprobed cells are never listed,
  opened, or scanned.  Scoring reuses the shared kernels
  (:func:`similarity._keyed_vector_scores`, :func:`pq._adc_cell_scorer`)
  and the same ``QUERY_COLLECT_LIMIT`` auto-gate switches to the
  distributed equi-join shape for corpus-sized query sets.
- **add** — new vectors are encoded with the STORED parameters and
  appended in one atomic commit; an index grown in batches equals the
  index built in one shot over the same corpus (tested), because no
  training state depends on the later arrivals.  (Like every ANN system
  with a frozen quantizer, recall degrades if the data distribution
  drifts from the training sample — that is what ``refresh`` is for.)
- **refresh** — retrain + re-encode over a new corpus in ONE overwrite
  commit; concurrent readers keep their snapshot (Table MVCC), a crash
  leaves the old index intact.

Reference analog: none — kupo has no vector surface; this extends the
LLM-data-pipeline family (SURVEY.md §2, similarity-search operators).
"""

from __future__ import annotations

import json
import os
import uuid
from pathlib import Path

import numpy as np

from pyspark.sql import DataFrame, Row, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, LongType, StructField, StructType

from kupo_spark.functions import pq as _pq
from kupo_spark.functions.similarity import (
    DIM,
    QUERY_COLLECT_LIMIT,
    _ivf_centroids,
    _join_scored,
    _keyed_vector_scores,
    _probe_rows,
    nearest_centroid_rows,
    nearest_centroids_multi,
    quantized,
    topk_merge,
)
from kupo_spark.table import Table

__all__ = ["VectorIndex"]

META_FILE = "ann_meta.json"

#: IVF-PQ layout: 4-bit codes, one row per vector, hive-partitioned by cell
CODES_SCHEMA = StructType(
    [
        StructField("vec_id", LongType()),
        StructField("code", ArrayType(LongType())),
        StructField("centroid_id", LongType()),
    ]
)

#: IVF-flat layout: the quantized vector itself per cell (exact search
#: within probed cells; ~8x the storage of PQ)
FLAT_SCHEMA = StructType(
    [
        StructField("vec_id", LongType()),
        StructField("q", ArrayType(LongType())),
        StructField("centroid_id", LongType()),
    ]
)


def _write_meta(root: Path, meta: dict) -> None:
    """Atomic meta publish: write-then-rename, same discipline as the
    Table log (a crash mid-write never leaves a torn meta)."""
    tmp = root / f".{META_FILE}.{uuid.uuid4().hex}"
    tmp.write_text(json.dumps(meta))
    os.replace(tmp, root / META_FILE)


class VectorIndex:
    """A persisted IVF / IVF-PQ index rooted at a directory.

    ``VectorIndex.build(root, emb, ...)`` to create;
    ``VectorIndex(root)`` to open an existing one."""

    def __init__(self, root: str):
        self.root = Path(root)
        meta_path = self.root / META_FILE
        if not meta_path.exists():
            raise FileNotFoundError(f"no ANN index meta at {meta_path}")
        self.meta = json.loads(meta_path.read_text())
        self.table = Table(str(self.root / "codes"))

    # -- lifecycle --------------------------------------------------------

    @staticmethod
    def build(
        root: str,
        emb: DataFrame,
        pq: bool = True,
        n_centroids: int = 16,
        kmeans_iters: int = 0,
        m: int = _pq.M_SUB,
        bits: int = _pq.BITS,
        codebook_iters: int = 3,
        codebook_sample: int = 4096,
        mode: str | None = None,
    ) -> "VectorIndex":
        """Train, encode, and persist.  Training is identical to the
        transient paths (same seeds, same exact-integer Lloyd), so the
        stored index reproduces their results bit-for-bit.

        ``mode`` overrides the ``pq`` flag: ``'ivf_pq'`` (codes + ADC),
        ``'ivf_flat'`` (exact vectors per cell), or ``'ivf_sq8'`` (byte
        codes per cell, exact search over the dequantized vectors — the
        FAISS/Milvus IVF-SQ8 middle tier: 4× smaller than flat,
        near-exact recall, no ADC approximation)."""
        mode = mode or ("ivf_pq" if pq else "ivf_flat")
        if mode not in ("ivf_pq", "ivf_flat", "ivf_sq8"):
            raise ValueError(f"unknown index mode {mode!r}")
        rootp = Path(root)
        rootp.mkdir(parents=True, exist_ok=True)
        if (rootp / META_FILE).exists():
            raise FileExistsError(f"index already exists at {root}")
        crows = _ivf_centroids(emb, n_centroids, kmeans_iters).collect()
        centroids = sorted(
            ([int(r.centroid_id), [int(x) for x in r.cv]] for r in crows),
            key=lambda c: c[0],
        )
        meta = {
            "mode": mode,
            "dim": DIM,
            "n_centroids": n_centroids,
            "kmeans_iters": kmeans_iters,
            "centroids": centroids,
        }
        if mode == "ivf_pq":
            meta["codebooks"] = _pq.train_codebooks(
                emb, m=m, bits=bits, iters=codebook_iters, sample=codebook_sample
            )
            meta["m"], meta["bits"] = m, bits
            meta["codebook_iters"] = codebook_iters
            meta["codebook_sample"] = codebook_sample
        elif mode == "ivf_sq8":
            from kupo_spark.functions.sq import sq_train

            mins, maxs = sq_train(emb)
            meta["mins"], meta["maxs"] = mins, maxs
        table = Table.create(
            str(rootp / "codes"),
            FLAT_SCHEMA if mode == "ivf_flat" else CODES_SCHEMA,
            partition_by=["centroid_id"],
        )
        # the log version whose commit established this meta's centroids /
        # partitioning: readers pin to it when the log later runs AHEAD of
        # meta (a refresh/rebalance that crashed between its overwrite and
        # its meta publish) — see _pinned_version
        meta["table_version"] = table.append(_encode_rows(emb, meta))
        # meta publishes LAST: an opener never sees meta without codes
        _write_meta(rootp, meta)
        return VectorIndex(root)

    def add(self, emb: DataFrame) -> int:
        """Encode + assign ``emb`` with the STORED parameters and append
        atomically.  Growing in batches ≡ one-shot build over the union
        (no training state depends on later arrivals); vec_ids are the
        caller's contract — append disjoint ids.

        Refuses while the index is PINNED (a prior refresh/rebalance
        crashed between its overwrite and its meta publish): rows appended
        beyond the pin are invisible to every read, and the healing
        rebalance rebuilds from the pinned snapshot — without this guard
        such rows would be silently discarded at heal time.  (Legacy
        states where adds already landed in the crash window are still
        recovered: rebalance unions orphan APPEND commits back into the
        rebuilt payload — see :meth:`_orphan_appends`.)"""
        self._require_unpinned("add")
        return self.table.append(_encode_rows(emb, self.meta))

    def _require_unpinned(self, op: str) -> None:
        pinned = self._pinned_version()
        if pinned is not None:
            raise RuntimeError(
                f"VectorIndex.{op}() refused: index is pinned to version "
                f"{pinned} (a refresh/rebalance crashed between its "
                "overwrite and its meta publish, so the log is ahead of "
                "meta). Run rebalance() first — it self-heals from the "
                "pinned snapshot and recovers any orphan appends."
            )

    def delete(self, vec_ids, spark: SparkSession | None = None) -> int:
        """Transactionally remove vectors by id (the CRUD face every
        vector store exposes): one copy-on-write Table delete — only
        files containing a hit are rewritten (log min/max prune the
        candidate set), readers keep their MVCC snapshot, and the cell
        partitioning survives the rewrite.  Returns the new log version.

        Refuses while pinned for the same reason as :meth:`add`: a delete
        applied beyond the pin is invisible to readers AND undone by the
        healing rebalance (which overwrites from the pinned snapshot) —
        the deleted rows would silently resurrect."""
        self._require_unpinned("delete")
        ids = sorted(int(v) for v in vec_ids)
        if not ids:
            return self.table.latest_version()
        spark = spark or SparkSession.getActiveSession()
        if spark is None:
            raise ValueError("no active SparkSession; pass spark=")
        cond = F.col("vec_id").isin(ids)
        return self.table.delete_where(spark, cond)

    def refresh(self, emb: DataFrame) -> "VectorIndex":
        """Retrain on (and re-encode) ``emb`` with the same
        hyperparameters, replacing the stored index in one overwrite
        commit.  The ANN answer to quantizer drift."""
        meta = dict(self.meta)
        crows = _ivf_centroids(
            emb, meta["n_centroids"], meta["kmeans_iters"]
        ).collect()
        meta["centroids"] = sorted(
            ([int(r.centroid_id), [int(x) for x in r.cv]] for r in crows),
            key=lambda c: c[0],
        )
        if meta["mode"] == "ivf_pq":
            meta["codebooks"] = _pq.train_codebooks(
                emb,
                m=meta["m"],
                bits=meta["bits"],
                iters=meta.get("codebook_iters", 3),
                sample=meta.get("codebook_sample", 4096),
            )
        elif meta["mode"] == "ivf_sq8":
            from kupo_spark.functions.sq import sq_train

            meta["mins"], meta["maxs"] = sq_train(emb)
        meta["table_version"] = self.table.overwrite(_encode_rows(emb, meta))
        _write_meta(self.root, meta)
        self.meta = meta
        return self

    def _stored_vectors(self, stored: DataFrame) -> DataFrame:
        """(vec_id, q): the corpus as search-comparable quantized vectors,
        reconstructed from the STORED representation — flat rows verbatim,
        SQ8 codes dequantized, PQ codes codebook-reconstructed.  What
        ``rebalance`` retrains/reassigns on; self-contained (no raw
        embedding table required)."""
        if self.meta["mode"] == "ivf_pq":
            return _pq.pq_reconstruct(stored, self.meta["codebooks"]).select(
                "vec_id", F.col("qr").alias("q")
            )
        return self._search_view(stored).select("vec_id", "q")

    def rebalance(
        self,
        spark: SparkSession | None = None,
        kmeans_iters: int = 4,
        n_centroids: int | None = None,
        seed_mode: str = "strided",
    ) -> "VectorIndex":
        """OPTIMIZE for the vector tier: retrain the coarse quantizer on
        the CURRENT stored corpus and re-partition the codes in ONE
        overwrite commit.  A hot cell (skewed centroid) makes nprobe
        pruning degenerate — a probe of the hot cell scans most of the
        corpus; retraining Lloyd over what is actually stored splits it.

        Only ``centroid_id`` changes: the stored codes/vectors are reused
        verbatim, so search WITHIN a probed cell returns exactly what it
        did before — recall shifts only through which cells a probe
        selects, and on a rebalanced layout the same ``nprobe`` covers a
        more proportionate corpus slice.  Readers keep their MVCC snapshot
        (old partitioning) until the commit lands; a crash leaves the old
        index intact (meta publishes last, same discipline as build).

        Training input is the stored representation itself (flat / SQ8
        dequantized / PQ reconstructed — :meth:`_stored_vectors`), so no
        raw embedding table is needed; ``n_centroids`` optionally re-sizes
        the cell count (cells ∝ √corpus is the IVF rule of thumb as the
        index grows).

        ``seed_mode`` picks the density-aware seeding strategy:

        - ``"strided"`` (oracle arm): seeds at exact evenly-strided RANKS
          of the vec_id order — exact integers an oracle engine
          re-derives identically, at the price of ONE global row_number
          sort per explicit maintenance call;
        - ``"sampled"`` (scale arm): a narrow fraction-sample of the
          corpus (Scan→Sample→Project, NO exchange / window / single-
          partition stage in the plan — asserted by test), stride-picked
          driver-side over the ~16·n collected sample rows.  Seed mass
          still follows data mass (the sample is uniform over rows);
          deterministic given the fixed sample seed, but not
          oracle-reproducible — the 100 TB default.
        """
        spark = spark or SparkSession.getActiveSession()
        if spark is None:
            raise ValueError("no active SparkSession; pass spark=")
        if seed_mode not in ("strided", "sampled"):
            raise ValueError(f"unknown seed_mode {seed_mode!r}")
        from kupo_spark.functions.similarity import _kmeans_q

        meta = dict(self.meta)
        if n_centroids is not None:
            meta["n_centroids"] = int(n_centroids)
        pinned = self._pinned_version()
        stored = self.table.read(spark, version=pinned)
        if pinned is not None:
            # self-heal recovery: rows committed via APPEND *after* the
            # foreign overwrite (legacy crash-window adds, before add()
            # learned to refuse while pinned) are invisible to pinned
            # readers; fold them back into the rebuilt payload instead of
            # discarding them with the foreign overwrite's content.
            # Their codes were produced by add() against the PUBLISHED
            # meta (self.meta), so they are valid under the codebooks this
            # rebalance reuses; centroid_id is reassigned below anyway.
            orphans = self._orphan_appends(spark, pinned)
            if orphans is not None:
                stored = stored.unionByName(orphans)
        vecs = self._stored_vectors(stored)
        n = meta["n_centroids"]
        total = vecs.count()
        if seed_mode == "strided":
            # seed vectors at evenly-strided RANKS of the vec_id order, so
            # seed MASS follows data mass — a region holding 90% of the
            # corpus gets ~90% of the seeds, and Lloyd then splits it
            # instead of leaving one anchored centroid per far outlier
            # (the failure mode of first-n seeding on a skewed store).
            # Ranks are exact integers (rank_i = floor((2i+1)·total/2n)+1),
            # so an oracle engine re-derives identical seeds.
            from pyspark.sql.window import Window

            ranks = sorted(
                {((2 * i + 1) * total) // (2 * n) + 1 for i in range(n)}
            )
            ranked = vecs.withColumn(
                "rn", F.row_number().over(Window.orderBy("vec_id"))
            )
            seeds = (
                ranked.where(F.col("rn").isin(ranks)).orderBy("vec_id").collect()
            )
        else:
            seeds = _sampled_seed_rows(self, vecs, n, total)
        seed_df = spark.createDataFrame(
            [
                Row(centroid_id=i, cv=[int(x) for x in r.q])
                for i, r in enumerate(seeds)
            ],
            "centroid_id long, cv array<long>",
        )
        # no max(1, ...) clamp: iters=0 means "seeds ARE the centroids",
        # exactly what the oracle CTE derivation does — the two engines
        # must agree for EVERY iters value, not just >=1
        cent = _kmeans_q(vecs, n, kmeans_iters, seeds=seed_df)
        crows = cent.collect()
        meta["centroids"] = sorted(
            ([int(r.centroid_id), [int(x) for x in r.cv]] for r in crows),
            key=lambda c: c[0],
        )
        assign = nearest_centroid_rows(
            vecs, [Row(centroid_id=cid, cv=cv) for cid, cv in meta["centroids"]]
        ).select("vec_id", F.col("centroid_id").cast("long"))
        payload = (
            stored.drop("centroid_id")
            .join(assign, "vec_id")
            .select(*[f.name for f in self.table.schema().fields])
        )
        meta["table_version"] = self.table.overwrite(payload)
        _write_meta(self.root, meta)
        self.meta = meta
        return self

    def _pinned_version(self) -> int | None:
        """The snapshot version this meta is valid for, or None for
        "latest".  The meta's centroids and the codes' centroid_id
        partitioning must agree; a refresh/rebalance commits them in two
        steps (table overwrite, then meta), so a crash in between leaves
        the log AHEAD of meta — probing old centroids against the new
        partitioning would silently collapse recall.  Detection: any
        OVERWRITE/RESTORE commit *after* ``meta["table_version"]`` means
        the data beyond that point belongs to a meta that never published;
        readers pin to the version just before it (the old files are
        immutable until vacuum — MVCC makes the old index fully
        servable), and the next refresh/rebalance self-heals by
        re-overwriting from the pinned snapshot.  Appends and deletes
        never re-partition, so they keep reads at "latest"."""
        mv = self.meta.get("table_version")
        if mv is None:  # legacy meta: no pinning information
            return None
        foreign = [
            h["version"]
            for h in self.table.history()
            if h["version"] > mv and h.get("operation") in ("OVERWRITE", "RESTORE")
        ]
        if not foreign:
            return None
        return min(foreign) - 1

    def _orphan_appends(self, spark: SparkSession, pinned: int):
        """Rows committed via APPEND after the foreign overwrite that
        established the pin — user writes landed in the crash window that
        pinned readers cannot see and a heal-by-overwrite would discard.
        Returns a DataFrame (table schema) or None when there are none.
        Raises if any orphan file was since rewritten by a non-append
        commit (its surviving rows cannot be told apart from the foreign
        overwrite's content — manual intervention beats silent loss)."""
        first_foreign = pinned + 1
        latest = self.table.latest_version()
        orphan_paths: list[str] = []
        rewritten: list[str] = []
        live = {a["path"] for a in self.table.snapshot(latest).files}
        for v in range(first_foreign + 1, latest + 1):
            actions = self.table._read_actions(v)
            op = next(
                (
                    a["commitInfo"].get("operation")
                    for a in actions
                    if "commitInfo" in a
                ),
                None,
            )
            if op != "APPEND":
                continue
            for a in actions:
                if "add" in a and a["add"].get("dataChange", True):
                    p = a["add"]["path"]
                    (orphan_paths if p in live else rewritten).append(p)
        if rewritten:
            raise RuntimeError(
                "cannot self-heal: orphan append files were rewritten by a "
                f"later commit ({rewritten[:3]}...); restore the table to a "
                "consistent version manually before rebalancing"
            )
        if not orphan_paths:
            return None
        schema = self.table.schema()
        df = spark.read.option("basePath", str(self.table.root)).parquet(
            *[str(self.table.root / p) for p in orphan_paths]
        )
        return df.select(
            *[F.col(f.name).cast(f.dataType).alias(f.name) for f in schema.fields]
        )

    # -- introspection ----------------------------------------------------

    def _centroid_rows(self) -> list:
        return [
            Row(centroid_id=cid, cv=cv) for cid, cv in self.meta["centroids"]
        ]

    def cells(self) -> dict[int, int]:
        """Per-cell row counts from the log's per-file stats — no data
        scan (the ops view: cell balance is THE health metric of an IVF
        layout)."""
        out: dict[int, int] = {}
        for add in self.table.snapshot(self._pinned_version()).files:
            cell = int(add["partitionValues"]["centroid_id"])
            stats = add.get("stats")
            n = (json.loads(stats) if isinstance(stats, str) else stats or {}).get(
                "numRecords", 0
            )
            out[cell] = out.get(cell, 0) + int(n)
        return out

    def max_vec_id(self) -> int | None:
        """Largest stored vec_id, from the log's per-file max stats — no
        data scan.  None on an empty index.  The id-monotonicity /
        replay-detection probe of the streaming growth path."""
        mx = None
        for add in self.table.snapshot(self._pinned_version()).files:
            stats = add.get("stats")
            v = (json.loads(stats) if isinstance(stats, str) else stats or {}).get(
                "maxValues", {}
            ).get("vec_id")
            if v is not None:
                mx = int(v) if mx is None else max(mx, int(v))
        return mx

    # -- query ------------------------------------------------------------

    def topk(
        self,
        queries: DataFrame,
        n_queries: int = 10,
        k: int = 5,
        nprobe: int = 1,
        distributed: bool | None = None,
        refine: int | None = None,
        vectors: DataFrame | None = None,
    ) -> DataFrame:
        """(query_id, neighbor_id, cosine, rank): top-k over the stored
        codes for the first ``n_queries`` vec_ids of ``queries`` (an
        embeddings frame — queries stay raw/exact, the asymmetric-search
        contract).  The closure path reads ONLY the probed cells' files
        (log-level partition pruning); the ``distributed`` gate (auto at
        ``QUERY_COLLECT_LIMIT``) switches to the centroid_id equi-join
        with no driver materialization.

        ``refine`` (ivf_pq only) is the two-stage exact rerank: the ADC
        ranking widens to top-``k·refine`` candidates and those rows'
        RAW vectors — read from ``vectors``, the caller's embedding
        table; the index stores codes only, the FAISS-style pairing of a
        compact index with a flat store — rerank by exact cosine."""
        if refine is not None:
            if self.meta["mode"] != "ivf_pq":
                raise ValueError(
                    "refine applies to ivf_pq (flat/sq8 search is already exact"
                    " over its stored representation)"
                )
            if vectors is None:
                raise ValueError("refine needs the raw vector table (vectors=)")
            cand = self.topk(
                queries, n_queries, k * refine, nprobe, distributed=distributed
            )
            return _pq.exact_rerank(cand, vectors, k)
        spark = queries.sparkSession
        crows = self._centroid_rows()
        q = quantized(queries).where(F.col("vec_id") < n_queries)
        if distributed is None:
            distributed = n_queries > QUERY_COLLECT_LIMIT
        if distributed:
            corpus = self._search_view(
                self.table.read(spark, version=self._pinned_version())
            )
            probes = nearest_centroids_multi(q, crows, max(1, nprobe))
            if self.meta["mode"] == "ivf_pq":
                qtab = _pq._query_tables(
                    queries, self.meta["codebooks"], n_queries
                ).join(probes.withColumnRenamed("vec_id", "query_id"), "query_id")
                return _pq._adc_rank(_pq._adc_join_scored(corpus, qtab), k)
            scored = _join_scored(corpus, q.join(probes, "vec_id"), ["centroid_id"])
            return topk_merge(scored, k)
        probe = _probe_rows(q.collect(), crows, max(1, nprobe))
        probed_cells = {int(r.centroid_id) for r in probe}
        corpus = self._search_view(
            self.table.read(
                spark,
                version=self._pinned_version(),
                file_filter=lambda a: int(a["partitionValues"]["centroid_id"])
                in probed_cells,
            )
        )
        if self.meta["mode"] == "ivf_pq":
            qids, tabs = _pq._adc_tables(probe, self.meta["codebooks"])
            cells = np.array([r.centroid_id for r in probe], dtype=np.int64)
            scored = corpus.mapInPandas(
                _pq._adc_cell_scorer(
                    qids, tabs, cells, len(self.meta["codebooks"]), prefilter_k=k
                ),
                "query_id long, neighbor_id long, adist long",
            )
            return _pq._adc_rank(scored, k)
        return topk_merge(
            _keyed_vector_scores(corpus, "centroid_id", probe, prefilter_k=k), k
        )

    def _search_view(self, stored: DataFrame) -> DataFrame:
        """The stored frame as the scoring kernels expect it: ivf_sq8
        dequantizes its byte codes to the flat (vec_id, q, centroid_id)
        shape with one codegen projection (the exact-integer round trip),
        so SQ8 search IS the flat path over reconstructed vectors; the
        other modes pass through."""
        if self.meta["mode"] != "ivf_sq8":
            return stored
        from kupo_spark.functions.sq import recon_expr

        return stored.select(
            "vec_id",
            F.expr(recon_expr(self.meta["mins"], self.meta["maxs"])).alias("q"),
            "centroid_id",
        )


def _sampled_seed_rows(
    ix: "VectorIndex", vecs: DataFrame, n: int, total: int, oversample: int = 16
) -> list:
    """Density-aware seeds with NO exchange in the plan: a narrow
    fraction-sample of the corpus (uniform over rows, so seed mass follows
    data mass in expectation), collected (~``oversample``·n rows), then
    stride-picked by vec_id order driver-side.  The distributed part is
    Scan→Filter→Project only — no Window, no repartition, no
    single-partition stage — which is what makes rebalance safe to run on
    a 100 TB store (VERDICT r6 #2).

    The sample is a CONTENT-KEYED Bernoulli filter
    (``xxhash64(vec_id, seed) mod M < frac·M``), not ``DataFrame.sample``:
    the built-in sampler seeds its RNG per PARTITION INDEX and consumes it
    in row order, so its output changes whenever scan-split packing or
    intra-file row order shifts (observed: two rebalances of byte-identical
    stores in one session sampling different rows), and a retried task
    re-draws different rows (the guide-§2.5 rand-repartition hazard).  The
    hash filter selects the same vec_ids under ANY partitioning, row
    order, task retry, or file layout — genuinely deterministic, same
    plan shape, same cost.  The executed plan of the seed scan is stashed
    on the index (``_last_seed_plan``) so the plan-golden test can assert
    the no-exchange property instead of trusting this docstring."""
    frac = min(1.0, (oversample * n) / max(1, total))
    M = 1 << 30
    sampled = vecs.where(
        F.pmod(F.xxhash64(F.col("vec_id"), F.lit(421)), F.lit(M))
        < F.lit(int(frac * M))
    ).select("vec_id", "q")
    ix._last_seed_plan = sampled._jdf.queryExecution().executedPlan().toString()
    rows = sampled.collect()
    if not rows:  # pathological sample on a tiny corpus: take everything
        rows = vecs.select("vec_id", "q").collect()
    rows.sort(key=lambda r: r.vec_id)
    m = len(rows)
    picks = sorted({((2 * i + 1) * m) // (2 * n) for i in range(n)})
    return [rows[j] for j in picks if j < m]


def _encode_rows(emb: DataFrame, meta: dict) -> DataFrame:
    """The one corpus encode pass: cell assignment against the meta's
    centroids (+ PQ or SQ8 codes by mode), shaped to the store schema."""
    crows = [Row(centroid_id=cid, cv=cv) for cid, cv in meta["centroids"]]
    q = quantized(emb)
    assign = nearest_centroid_rows(q, crows)
    if meta["mode"] == "ivf_pq":
        return (
            _pq.pq_encode(emb, meta["codebooks"])
            .join(assign, "vec_id")
            .select("vec_id", "code", F.col("centroid_id").cast("long"))
        )
    if meta["mode"] == "ivf_sq8":
        from kupo_spark.functions.sq import sq_encode

        return (
            sq_encode(emb, meta["mins"], meta["maxs"])
            .join(assign, "vec_id")
            .select(
                "vec_id",
                F.expr("transform(code, c -> cast(c as bigint))").alias("code"),
                F.col("centroid_id").cast("long"),
            )
        )
    return (
        q.where(F.col("q").isNotNull() & (F.size("q") == DIM))
        .join(assign, "vec_id")
        .select("vec_id", "q", F.col("centroid_id").cast("long"))
    )
