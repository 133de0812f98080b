"""Persisted IVF index — ANN as a STORED artifact (r8).

``topk_ivf_det`` assigns the corpus per CALL. Fine for a one-shot job;
wrong at 100 TB, where one corpus serves many query batches: every
call re-scans and re-quantizes all N vectors. The index here is the
assignment paid ONCE — a parquet tree PARTITIONED BY CELL plus a small
JSON meta holding the quantizer — so a query batch reads ONLY its
probed cells from storage. The probe filter lands in the scan's
PartitionFilters (plan-asserted in tests): at nprobe/nlist = 8%, 92%
of the index bytes are never opened. That is the actual IVF promise
(FAISS's on-disk IndexIVF, re-expressed as a Spark-native partitioned
table); the per-call path only ever delivered the compute half.

Layout (every path through :mod:`andl_spark.fsio` — local, file://,
hdfs://, s3a://)::

    <path>/data/_pointer.v<N>.json       current generation (rename-free
                                         versioned commit — andl_spark.pointer)
    <path>/data/gen=N/_meta.json         quantizer + params + calibration
    <path>/data/gen=N/_batch_id=…/list_id=…   (id, vector) rows

The data tree IS a streaming-index generation tree (r8b): build
seeds ``gen=1`` and flips the pointer (seed_neardup_index), appends
commit their own ``_batch_id`` partitions with dynamic overwrite and
the compaction-race re-resolve loop (commit_batch_partitions), and
``compact_ivf_index`` folds batch partitions atomically behind the
generation pointer — the ENTIRE maintenance plane (atomic flips,
retained prior generation, carry-over of concurrently-committed
batches, replay idempotence) is inherited from the near-dup index's
tested protocol rather than re-implemented, with
``part_cols=("_batch_id", "list_id")`` nesting the cell partitions
under the batch dirs so probe-time partition pruning keeps working.
Appended vectors quantize against the STORED centroids (standard IVF
practice — cells drift as the corpus grows; rebuild when the
calibration's measured recall decays).

Reference: david-pfx/Andl has no ANN surface — this extends SURVEY.md
§2.8's similarity-search ops (simsearch.py) with the index-persistence
half of the 100 TB story.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .. import fsio
from ..streaming.events import (
    compact_neardup_index,
    read_neardup_index,
    resolve_neardup_index,
    seed_neardup_index,
)
from .simsearch import (
    AUTO_NLIST_MAX,
    AUTO_PROBE_FRAC,
    NP_ASSIGN_MIN_NLIST,
    auto_nlist,
    auto_nprobe,
    calibrate_probe,
    calibrate_probe_hier,
    cosine_n_expr,
    hier_assign_np,
    hier_params,
    hier_probe_np,
    hier_seed_centroids,
    hier_trained_centroids,
    nearest_lists_cosine,
    nearest_lists_np,
    norm_expr,
    seed_centroids,
    trained_centroids,
)

import math

META_VERSION = 1

#: cell partitions nest under the batch dirs — pruning + maintenance
PART_COLS = ("_batch_id", "list_id")


def read_ivf_data(spark: SparkSession, path: str) -> DataFrame:
    """The index's CURRENT generation (vec_id, embedding, list_id,
    _batch_id) — resolves the generation pointer like every other
    reader/writer of a streaming index tree."""
    return read_neardup_index(spark, fsio.join(path, "data"))


def _assign_expr(vec_col, centroids: list[list[float]], nprobe: int,
                 vec_norm=None):
    """The serving assignment rule: numpy matmul at nlist ≥
    NP_ASSIGN_MIN_NLIST, JVM literal expression below. NOTE the
    equivalence contract with topk_ivf_det: identical for nlist < 64
    and in the auto-scale regime; for an EXPLICIT nlist ≥ 64
    topk_ivf_det keeps the JVM expression (oracle parity) while the
    index uses the matmul — the two agree up to the shared 4-decimal
    cosine rounding, so a row exactly AT a rounding boundary may
    assign one cell apart (the same caveat nearest_lists_np documents;
    the pinned row-identity tests run at nlist=16 where the paths are
    bit-identical)."""
    if len(centroids) >= NP_ASSIGN_MIN_NLIST:
        return nearest_lists_np(centroids, nprobe)(vec_col)
    return nearest_lists_cosine(vec_col, centroids, nprobe,
                                vec_norm=vec_norm)


def _flat_assigned(df: DataFrame, id_col: str, vec_col: str,
                   centroids: list[list[float]]) -> DataFrame:
    """(vec_id, embedding, list_id) with the row norm computed ONCE
    and fed to the expression-path assignment — inlining it would
    re-aggregate the O(dim) norm per centroid (the dominant
    interpreted-HOF cost topk_ivf_det's two-stage projection avoids;
    review r8b). The numpy path ignores vec_norm."""
    return (
        df.select(F.col(id_col).alias("vec_id"),
                  F.col(vec_col).alias("embedding"))
        .withColumn("__n", norm_expr(F.col("embedding")))
        .select("vec_id", "embedding",
                F.element_at(_assign_expr(
                    F.col("embedding"), centroids, 1,
                    vec_norm=F.col("__n")), 1).alias("list_id"))
    )


def build_ivf_index(
    corpus: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    nlist: int | None = None,
    quantizer: str = "seed",
    corpus_count: int | None = None,
    calibrate: float | None = None,
    k: int = 5,
    n1: int | None = None,
    n2: int | None = None,
) -> dict:
    """Build the index: resolve the quantizer (same rules as
    topk_ivf_det — √N auto-scale via ``nlist=None``), assign every
    corpus vector to its cell, write cell-partitioned parquet and the
    meta JSON. ``calibrate=<target recall>`` additionally runs the
    matching calibrator and stores the measured probe depth in the
    meta, so every future query of this index defaults to the measured
    operating point instead of the 8% clustered-corpus rule.

    Above the flat clamp (auto-scale with √N > 4096, i.e. N > 16.7M)
    the build AUTO-DISPATCHES to the TWO-LEVEL quantizer — same rule
    as topk_ivf_det: ≈√N total cells as n1·n2 with n1 ≈ n2 ≈ N^(1/4),
    assignment two bounded matmuls per row instead of √N dots; the
    combined cell id keeps the identical partition layout, so probes
    prune the same way. Explicit ``n1``/``n2`` force the hierarchy at
    any size. Returns the meta dict (kind: flat | hier)."""
    hier = n1 is not None or n2 is not None
    if nlist is None and not hier:
        if corpus_count is None:
            corpus_count = corpus.count()
        if corpus_count > AUTO_NLIST_MAX ** 2:
            hier = True
        else:
            nlist = auto_nlist(corpus_count)
    if hier:
        if n1 is None or n2 is None:
            a1, a2, _ = hier_params(corpus_count or corpus.count())
            n1, n2 = n1 or a1, n2 or a2
        if quantizer == "trained":
            cents = hier_trained_centroids(corpus, id_col, vec_col, n1, n2)
        elif quantizer == "seed":
            cents = hier_seed_centroids(corpus, id_col, vec_col, n1, n2)
        else:
            raise ValueError(f"unknown quantizer {quantizer!r} (seed | trained)")
        C1, C2 = cents
        if not C1 or not C2:
            raise ValueError("build_ivf_index: empty corpus — an IVF "
                             "index needs at least one vector to "
                             "quantize against")
        n1, n2 = len(C1), (len(C2[0]) if C2 else 0)
        calibration = None
        if calibrate is not None:
            calibration = calibrate_probe_hier(
                corpus, id_col, vec_col, k=k, target_recall=calibrate,
                n1=n1, n2=n2, quantizer=quantizer, cents=cents)
        assigned = corpus.select(
            F.col(id_col).alias("vec_id"),
            F.col(vec_col).alias("embedding"),
            hier_assign_np(C1, C2)(F.col(vec_col)).alias("list_id"),
        ).repartition("list_id")
        meta = {
            "version": META_VERSION, "kind": "hier",
            "nlist": n1 * n2, "n1": n1, "n2": n2,
            "C1": C1, "C2": C2,
            "quantizer": quantizer, "id_col": id_col, "vec_col": vec_col,
            "dim": len(C1[0]) if C1 else 0,
            "calibration": calibration,
        }
        seed_neardup_index(assigned, fsio.join(path, "data"),
                           part_cols=PART_COLS,
                           meta_files={"_meta.json": json.dumps(meta)})
        _invalidate_meta_cache(path)
        return meta
    if quantizer == "trained":
        centroids = trained_centroids(corpus, id_col, vec_col, nlist)
    elif quantizer == "seed":
        centroids = seed_centroids(corpus, id_col, vec_col, nlist)
    else:
        raise ValueError(f"unknown quantizer {quantizer!r} (seed | trained)")
    if not centroids:
        # fail HERE, not as an opaque array-index error on the first
        # append/query of a meta with nlist=0 (review r8b); the
        # cold-start pattern for ANN is build-on-first-corpus, unlike
        # the near-dup index whose empty seed is meaningful
        raise ValueError("build_ivf_index: empty corpus — an IVF index "
                         "needs at least one vector to quantize against")
    calibration = None
    if calibrate is not None:
        calibration = calibrate_probe(
            corpus, id_col, vec_col, k=k, target_recall=calibrate,
            nlist=len(centroids), quantizer=quantizer, centroids=centroids)
    assigned = _flat_assigned(corpus, id_col, vec_col, centroids)
    # one shuffle on the cell id so each cell is written by exactly
    # one task: without it every map task writes every cell — measured
    # 32,000 files (32 tasks x 1000 cells) at 1M vectors, a listing/
    # open-cost tax on every probe; with it, files == cells
    assigned = assigned.repartition("list_id")
    meta = {
        "version": META_VERSION,
        "kind": "flat",
        "nlist": len(centroids),
        "centroids": centroids,
        "quantizer": quantizer,
        "id_col": id_col,
        "vec_col": vec_col,
        "dim": len(centroids[0]) if centroids else 0,
        "calibration": calibration,
    }
    # the meta commits INSIDE the generation, before the pointer flip:
    # a rebuild (new quantizer) can never leave a reader pairing the
    # new generation's cells with the old generation's centroids
    seed_neardup_index(assigned, fsio.join(path, "data"),
                       part_cols=PART_COLS,
                       meta_files={"_meta.json": json.dumps(meta)})
    _invalidate_meta_cache(path)
    return meta


#: parsed metas keyed by (index path, generation dir): a generation is
#: immutable once flipped to, so its meta parses once — without this,
#: every query and every streaming micro-batch re-json.loads the
#: quantizer (the hier C2 tensor is n1·n2·dim doubles — ~100 MB of
#: JSON at the 16.7M+ auto-dispatch regime with dim 1024; review r8b)
_META_CACHE: dict[tuple, tuple] = {}  # (path, gen_dir) → (file ident, meta)
_META_CACHE_MAX = 32


def _invalidate_meta_cache(path: str) -> None:
    """Drop cached metas for ``path``: generation numbering restarts
    when an index tree is deleted and rebuilt at the same path, so the
    (path, gen dir) key would collide with the PREVIOUS index's
    quantizer (review r8b round 2). Every build_ivf_index calls this
    in-process; cross-PROCESS staleness (a rebuild from a different
    long-lived driver) is closed by _meta_at validating each hit
    against the meta file's (mtime, length) — the store's own identity
    for the bytes — so a restarted generation numbering can never
    serve the previous index's quantizer (ADVICE r8)."""
    for k in [k for k in _META_CACHE if k[0] == path]:
        _META_CACHE.pop(k, None)


def _meta_at(path: str, gen_dir: str) -> dict:
    p = fsio.join(gen_dir, "_meta.json")
    if not fsio.exists(p):  # legacy top-level layout
        p = fsio.join(path, "_meta.json")
    try:
        ident = (p,) + fsio.stat(p)
    except OSError:
        ident = (p, None, None)  # racing delete: parse uncached below
    key = (path, gen_dir)
    hit = _META_CACHE.get(key)
    # validate against the FILE's identity, not just the path: a
    # delete-and-rebuild at the same path restarts generation
    # numbering, so (path, gen dir) alone would happily serve the
    # previous index's quantizer from a DIFFERENT process whose cache
    # never saw the rebuild (ADVICE r8). One stat per hit — cheap
    # against the ~100 MB hier-quantizer parse it guards.
    if hit is not None and hit[0] == ident:
        return hit[1]
    while len(_META_CACHE) >= _META_CACHE_MAX:  # bounded FIFO
        _META_CACHE.pop(next(iter(_META_CACHE)))
    meta = json.loads(fsio.read_text(p))
    _META_CACHE[key] = (ident, meta)
    return meta


def read_ivf_snapshot(spark: SparkSession, path: str):
    """(meta, data) resolved from ONE pointer read, so the quantizer
    and the cells come from the SAME generation — resolving them
    separately opens a window where a concurrent rebuild flips the
    pointer in between and a reader pairs one generation's centroids
    with another's cells (review r8b; the torn pairing the in-
    generation meta commit exists to prevent)."""
    gen_dir = resolve_neardup_index(fsio.join(path, "data"))
    return _meta_at(path, gen_dir), spark.read.parquet(gen_dir)


def read_ivf_meta(path: str) -> dict:
    """Quantizer meta of the CURRENT generation — resolved through the
    same pointer as the data, so meta and cells always agree (the meta
    sidecar commits with its generation; compaction carries it). For a
    meta + data pair use read_ivf_snapshot (one pointer read)."""
    gen_dir = resolve_neardup_index(fsio.join(path, "data"))
    return _meta_at(path, gen_dir)


def ivf_index_append(
    batch: DataFrame,
    path: str,
    batch_id: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Append a batch against the STORED centroids, into its own
    ``_batch_id`` partitions with dynamic overwrite — a replay of the
    same batch_id rewrites exactly its partitions (the streaming
    ingest contract; usable directly inside foreachBatch).

    Each attempt resolves the generation ONCE and takes both the
    quantizer and the write target from it; after the write it
    re-resolves and, if the pointer moved (compaction OR a rebuild
    with a NEW quantizer), re-assigns under the new generation's meta
    and re-commits — the commit_batch_partitions re-resolve protocol,
    strengthened to re-QUANTIZE because a rebuild changes what the
    cell ids mean (review r8b: committing stale-centroid rows into a
    rebuilt generation would make those vectors unfindable forever)."""
    import time as _time

    from ..streaming.events import _INFLIGHT_PREFIX

    data_root = fsio.join(path, "data")
    # in-flight marker: the quiesce signal compact waits on before its
    # flip — the same no-double-writer protocol as the near-dup ingest
    # (see compact_neardup_index's r8b hardening note)
    marker = fsio.join(data_root, f"{_INFLIGHT_PREFIX}{batch_id}")
    fsio.write_text(marker, repr(_time.time()))  # aged by mtime
    try:
        _append_loop(batch, path, data_root, batch_id, id_col, vec_col)
    finally:
        fsio.delete(marker)


def _append_loop(batch, path, data_root, batch_id, id_col, vec_col):
    while True:
        gen_dir = resolve_neardup_index(data_root)
        meta = _meta_at(path, gen_dir)
        if meta.get("kind") == "hier":
            assigned = batch.select(
                F.col(id_col).alias("vec_id"),
                F.col(vec_col).alias("embedding"),
                hier_assign_np(meta["C1"], meta["C2"])(
                    F.col(vec_col)).alias("list_id"))
        else:
            assigned = _flat_assigned(batch, id_col, vec_col,
                                      meta["centroids"])
        (
            assigned.repartition("list_id")
            .withColumn("_batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy(*PART_COLS)
            .parquet(gen_dir)
        )
        if resolve_neardup_index(data_root) == gen_dir:
            return


def compact_ivf_index(spark: SparkSession, path: str) -> None:
    """Fold the accumulated ``_batch_id`` partitions into the seed
    partition behind an atomic generation flip — exactly
    compact_neardup_index with the cell-nested layout; see its
    docstring for the full concurrency protocol. Keeps the
    highest-numbered batch as-is (the only one a foreachBatch replay
    can re-deliver); run from ONE maintenance job. The nested layout
    bounds files PER CELL (the fold repartitions on list_id — one
    writer task per cell), so there is no target_files knob here: at
    nlist cells the fold is nlist files by construction."""
    compact_neardup_index(spark, fsio.join(path, "data"),
                          part_cols=PART_COLS)


def topk_ivf_index(
    spark: SparkSession,
    queries: DataFrame,
    path: str,
    k: int = 5,
    nprobe: int | None = None,
    id_col: str | None = None,
    vec_col: str | None = None,
) -> DataFrame:
    """Query the persisted index: assign each query its ``nprobe``
    nearest cells, then scan ONLY those cells — the probe set is
    collected driver-side (bounded: distinct cell ids across the query
    batch, ≤ nlist ints) and applied as a LITERAL partition filter, so
    the parquet scan prunes unprobed cells before reading a byte
    (plan-asserted: PartitionFilters carries the list_id predicate).
    ``nprobe`` defaults to the index's STORED calibration when the
    build measured one, else the 8% auto rule; on a two-level index it
    means p1 — probed TOP cells, each contributing all its sub-cells. Join shape and
    tie-breaking are identical to topk_ivf_det — on an unchanged corpus
    the two return the same rows (pinned in tests).

    The query batch is broadcast (the topk_bruteforce contract): bulk
    k-NN over a huge query set should go through the pair ops, not a
    per-query probe."""
    meta, data = read_ivf_snapshot(spark, path)
    id_col = id_col or meta["id_col"]
    vec_col = vec_col or meta["vec_col"]
    hier = meta.get("kind") == "hier"
    if nprobe is None:
        cal = meta.get("calibration")
        if cal:  # the stored measured operating point
            nprobe = cal["p1"] if hier else cal["nprobe"]
        elif hier:  # nprobe means p1 (probed TOP cells) for hier
            nprobe = max(2, math.ceil(meta["n1"] * AUTO_PROBE_FRAC))
        else:
            nprobe = auto_nprobe(meta["nlist"])
    if hier:
        probe_expr = hier_probe_np(meta["C1"], meta["C2"],
                                   nprobe)(F.col("qvec"))
    else:
        probe_expr = _assign_expr(F.col("qvec"), meta["centroids"],
                                  nprobe, vec_norm=F.col("qn"))
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec"),
        norm_expr(F.col(vec_col)).alias("qn"),
    ).withColumn("probe", probe_expr).localCheckpoint()  # probe lists computed ONCE: reused for the
    # driver-side partition-filter collect AND the probe join
    cells = sorted({c for r in q.select(
        F.explode("probe").alias("c")).distinct().collect()
        for c in [r["c"]] if c is not None})
    c = (
        data  # same generation as the meta above (one pointer read)
        .filter(F.col("list_id").isin(cells))  # partition pruning
        .select(F.col("vec_id").alias("cand_id"),
                F.col("embedding").alias("cvec"),
                norm_expr(F.col("embedding")).alias("cn"), "list_id")
    )
    qx = q.select("query_id", "qvec", "qn",
                  F.explode("probe").alias("list_id"))
    scored = (
        F.broadcast(qx).join(c, "list_id")
        .filter(F.col("query_id") != F.col("cand_id"))
        .select("query_id", "cand_id",
                cosine_n_expr(F.col("qvec"), F.col("cvec"),
                              F.col("qn"), F.col("cn")).alias("cosine"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("cand_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
    )


def ivf_ingest_stream(stream: DataFrame, path: str, checkpoint: str,
                      id_col: str = "vec_id", vec_col: str = "embedding"):
    """Streaming appends — the ANN-index twin of
    streaming.events.neardup_ingest_stream: each micro-batch quantizes
    against the STORED centroids and commits its own ``_batch_id``
    partitions (replay-idempotent via commit_batch_partitions, safe
    beside a concurrent compact_ivf_index — the same lease-free
    protocol the near-dup crawl loop runs). availableNow trigger;
    caller awaits termination. Steady-state cost scales with the
    batch: one bounded assignment matmul, no corpus re-scan."""

    def _ingest(batch_df: DataFrame, batch_id: int) -> None:
        ivf_index_append(batch_df, path, batch_id,
                         id_col=id_col, vec_col=vec_col)

    return (
        stream.writeStream.foreachBatch(_ingest)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
