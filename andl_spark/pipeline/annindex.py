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
practice — cells drift as the corpus grows; rebuild when the recall
gauge says so).

Lifecycle (r9): the pointer commits RENAME-FREE
(:mod:`andl_spark.pointer` — object-store safe); ``ivf_index_delete``
tombstones vectors (queries antijoin, compaction physically removes);
``measure_ivf_recall`` re-measures recall under the frozen quantizer
at each compaction and commits the gauge into the meta — the rebuild
trigger is a stored number, and ``build_ivf_index(carry_appended=
True)`` is the rebuild that keeps streamed vectors; hot cells write
salted (``_cell_shape``); serving reuses the generation's FileIndex
(the measured dominant cost at 4k+ cells — SCALE_r09.md §2).

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
    commit_batch_partitions,
    compact_neardup_index,
    read_neardup_index,
    resolve_neardup_index,
    seed_neardup_index,
)
from .simsearch import (
    AUTO_NLIST_MAX,
    AUTO_PROBE_FRAC,
    NP_ASSIGN_MIN_NLIST,
    UNROLL_MAX_DIM,
    auto_nlist,
    auto_nprobe,
    calibrate_probe,
    calibrate_probe_hier,
    cosine_n_expr,
    dot_expr_fixed,
    norm_expr_fixed,
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

#: the reserved cell id of DELETION TOMBSTONES (r9; VERDICT r8 item 2):
#: a deleted vector's id lands as a (vec_id, NULL embedding) row in the
#: list_id=-1 partition of the deleting batch — real cell ids are
#: always ≥ 0, probe sets never include -1, so tombstones are invisible
#: to candidate scans and read back with one pruned partition scan.
#: Queries antijoin them; compaction physically removes masked data
#: rows. Reference anchor: relvar DELETE (`update r .where(p)` —
#: sample3.andl §Updates, SURVEY §2.4 row 28) re-expressed for an
#: append-only partitioned index.
TOMBSTONE_LIST = -1

#: target rows per WRITER TASK within one cell (r9; VERDICT r8 "What's
#: wrong" 1): build/append/compact write one task per cell — right for
#: file count, but a hot cell (clustered corpora put >30% of vectors
#: in one cell) became one multi-GB single-task write. Cells above
#: this row count fan out across ceil(rows / this) salt buckets.
SALT_ROWS_PER_TASK = 1_000_000


def _cell_shape(df: DataFrame, rows_per_task: int = SALT_ROWS_PER_TASK,
                key_col: str = "vec_id") -> DataFrame:
    """Shuffle shape for the cell-partitioned writes, with HOT-CELL
    salting: count rows per cell (one map-side-combined aggregation —
    on a parquet-backed frame it reads only the list_id partition
    column; on a freshly-assigned frame it costs one extra assignment
    pass, the same bounded class as the calibration scan), then give
    cell i ``ceil(rows_i / rows_per_task)`` salt buckets keyed by
    ``xxhash64(vec_id)``. Uniform corpora keep width 1 everywhere —
    the one-file-per-cell invariant the r8b pins assert — while a hot
    cell writes across its width in parallel with files-per-cell ≤
    width (plus the maxRecordsPerFile bound on the write itself)."""
    cnts = {r[0]: r[1] for r in df.groupBy("list_id").count().collect()}
    hot = {lid: -(-c // rows_per_task) for lid, c in cnts.items()
           if c > rows_per_task}
    if not hot:
        return df.repartition("list_id")
    if len(hot) > 256:
        # degenerate regime (most cells hot): one uniform width beats
        # a 256+-entry literal map in codegen
        width = F.lit(max(hot.values()))
    else:
        pairs = []
        for lid, w in hot.items():
            pairs += [F.lit(lid), F.lit(w)]
        width = F.coalesce(
            F.element_at(F.create_map(*pairs), F.col("list_id")), F.lit(1))
    return df.repartition(F.col("list_id"),
                          F.pmod(F.xxhash64(F.col(key_col)), width))


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
    dim = len(centroids[0]) if centroids else 0
    _norm = (norm_expr_fixed if 0 < dim <= UNROLL_MAX_DIM
             else lambda name, *_: norm_expr(F.col(name)))
    return (
        df.select(F.col(id_col).alias("vec_id"),
                  F.col(vec_col).alias("embedding"))
        .withColumn("__n", _norm("embedding", dim))
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
    carry_appended: bool = False,
    rows_per_task: int = SALT_ROWS_PER_TASK,
) -> dict:
    """Build the index: resolve the quantizer (same rules as
    topk_ivf_det — √N auto-scale via ``nlist=None``), assign every
    corpus vector to its cell, write cell-partitioned parquet and the
    meta JSON. ``calibrate=<target recall>`` additionally runs the
    matching calibrator and stores the measured probe depth in the
    meta, so every future query of this index defaults to the measured
    operating point instead of the 8% clustered-corpus rule.

    REBUILD CONTRACT (ADVICE r8): calling this on an existing index
    seeds a fresh generation from ``corpus`` ALONE — vectors added
    since the last build via ivf_index_append/ivf_ingest_stream are
    NOT in the new generation unless the caller folds them in. Pass
    ``carry_appended=True`` to do that here: the current generation's
    live rows (appends included, tombstoned ids excluded) are unioned
    into the rebuild input, with ``corpus`` winning id collisions —
    including over tombstones: a rebuild starts from what the caller
    supplies, so re-supplying a deleted id is the deliberate
    resurrection path (deletes are otherwise kill-forever; see
    ivf_index_delete). A plain rebuild without it is the documented
    way to CLEAR tombstones and start from a curated corpus.

    Above the flat clamp (auto-scale with √N > 4096, i.e. N > 16.7M)
    the build AUTO-DISPATCHES to the TWO-LEVEL quantizer — same rule
    as topk_ivf_det: ≈√N total cells as n1·n2 with n1 ≈ n2 ≈ N^(1/4),
    assignment two bounded matmuls per row instead of √N dots; the
    combined cell id keeps the identical partition layout, so probes
    prune the same way. Explicit ``n1``/``n2`` force the hierarchy at
    any size. Returns the meta dict (kind: flat | hier)."""
    if carry_appended:
        spark = corpus.sparkSession
        data_root = fsio.join(path, "data")
        from ..streaming.events import _read_gen

        if _read_gen(data_root) is not None:
            _, data = read_ivf_snapshot(spark, path)
            live = (
                data.filter(F.col("list_id") != TOMBSTONE_LIST)
                .join(_tombstone_ids(data), "vec_id", "left_anti")
                .select(F.col("vec_id").alias(id_col),
                        F.col("embedding").alias(vec_col))
                # corpus wins id collisions: the caller's row is fresher
                .join(corpus.select(F.col(id_col)), id_col, "left_anti")
            )
            corpus = corpus.select(id_col, vec_col).unionByName(live)
            corpus_count = None  # force a recount of the union
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
        assigned = _cell_shape(corpus.select(
            F.col(id_col).alias("vec_id"),
            F.col(vec_col).alias("embedding"),
            hier_assign_np(C1, C2)(F.col(vec_col)).alias("list_id"),
        ), rows_per_task)
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
                           meta_files={"_meta.json": json.dumps(meta)},
                           max_records_per_file=rows_per_task)
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
    # open-cost tax on every probe; with it, files == cells for
    # uniform corpora, and hot cells fan out (_cell_shape, r9)
    assigned = _cell_shape(assigned, rows_per_task)
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
                       meta_files={"_meta.json": json.dumps(meta)},
                       max_records_per_file=rows_per_task)
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


#: generation-scoped DataFrame cache (r9): at 4,489 cells the 20M
#: rehearsal showed every fresh spark.read.parquet paying a PARALLEL
#: PARTITION DISCOVERY job over all ~4,400 leaf dirs (one LIST per
#: cell×batch dir — the dominant serve cost, and on an object store
#: thousands of LIST calls per query batch). A generation's file set
#: only changes when a batch partition lands, so the DataFrame (whose
#: FileIndex holds the listing) is reused keyed on the TOP-LEVEL batch
#: dir set — one cheap O(#batches) listing per call replaces the
#: O(#batches × #cells) recursive one. Replays rewrite a batch with
#: identical rows (the ingest contract), so an unchanged batch set
#: implies unchanged served content.
_DATA_CACHE: dict[tuple, DataFrame] = {}
_DATA_CACHE_MAX = 8


def read_ivf_snapshot(spark: SparkSession, path: str):
    """(meta, data) resolved from ONE pointer read, so the quantizer
    and the cells come from the SAME generation — resolving them
    separately opens a window where a concurrent rebuild flips the
    pointer in between and a reader pairs one generation's centroids
    with another's cells (review r8b; the torn pairing the in-
    generation meta commit exists to prevent). The data frame is
    served from the generation-scoped cache above; appends, deletes
    and compactions all change the batch-dir set or the generation and
    therefore miss it."""
    data_root = fsio.join(path, "data")
    gen_dir = resolve_neardup_index(data_root)
    batches = frozenset(n for n in fsio.listdir(gen_dir)
                        if n.startswith("_batch_id="))
    key = (spark.sparkContext.applicationId, path, gen_dir, batches)
    df = _DATA_CACHE.get(key)
    if df is None:
        while len(_DATA_CACHE) >= _DATA_CACHE_MAX:  # bounded FIFO
            _DATA_CACHE.pop(next(iter(_DATA_CACHE)))
        df = spark.read.parquet(gen_dir)
        _DATA_CACHE[key] = df
    return _meta_at(path, gen_dir), df


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
    rows_per_task: int = SALT_ROWS_PER_TASK,
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
        _append_loop(batch, path, data_root, batch_id, id_col, vec_col,
                     rows_per_task)
    finally:
        fsio.delete(marker)


def _append_loop(batch, path, data_root, batch_id, id_col, vec_col,
                 rows_per_task=SALT_ROWS_PER_TASK):
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
            _cell_shape(assigned, rows_per_task)
            .withColumn("_batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .option("maxRecordsPerFile", rows_per_task)  # bound files
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy(*PART_COLS)
            .parquet(gen_dir)
        )
        if resolve_neardup_index(data_root) == gen_dir:
            return


def ivf_index_delete(ids, path: str, batch_id: int,
                     id_col: str | None = None,
                     spark: SparkSession | None = None) -> None:
    """Delete vectors from the persisted index (r9; VERDICT r8 item 2
    — the pipeline's own dedup decides losers; before this, a deduped
    document's vector stayed probe-able forever). ``ids`` is a
    DataFrame holding the ids (``id_col`` defaults to the index's) or
    a plain Python list (pass ``spark``).

    Mechanics: one tombstone row (vec_id, NULL embedding) per id lands
    in the ``list_id=-1`` partition of this batch via the same
    marker + dynamic-overwrite + re-resolve commit every append uses —
    replay-idempotent per batch_id, safe beside concurrent compaction,
    and valid across a racing REBUILD unchanged (a tombstone masks an
    id, which no quantizer change re-interprets). Queries antijoin the
    tombstone set; :func:`compact_ivf_index` physically removes masked
    data rows from folded batches.

    Semantics are KILL-FOREVER per id (the FAISS ``remove_ids``
    contract): a later append of the same vec_id stays masked —
    re-ingesting a reversed deletion needs a new vec_id or a rebuild
    (whose fresh corpus carries no tombstones). Tombstone rows
    themselves are retained through compaction — dropping one is only
    safe when its target can never reappear, and a late-carried batch
    or a replayed kept batch can re-deliver data rows at any time; at
    a handful of bytes per deleted id the mask set stays negligible
    next to the vectors it replaces, and a rebuild clears it."""
    if not isinstance(ids, DataFrame):
        if spark is None:
            raise ValueError("ivf_index_delete: pass ids as a DataFrame "
                             "or provide spark= with a Python list")
        ids = spark.createDataFrame([(int(i),) for i in ids], "vec_id long")
        id_col = id_col or "vec_id"
    spark = ids.sparkSession
    meta, data = read_ivf_snapshot(spark, path)
    id_col = id_col or meta["id_col"]
    tomb = ids.select(F.col(id_col).alias("vec_id")).distinct().select(
        "vec_id",
        F.lit(None).cast(data.schema["embedding"].dataType)
        .alias("embedding"),
        F.lit(TOMBSTONE_LIST).alias("list_id"))
    commit_batch_partitions(tomb, batch_id, fsio.join(path, "data"),
                            part_cols=PART_COLS)


def _tombstone_ids(data: DataFrame) -> DataFrame:
    """Distinct deleted vec_ids in an index frame — one partition-
    pruned scan of the ``list_id=-1`` dirs."""
    return (data.filter(F.col("list_id") == TOMBSTONE_LIST)
            .select("vec_id").distinct())


def measure_ivf_recall(spark: SparkSession, path: str,
                       n_holdout: int = 32,
                       holdout: DataFrame | None = None) -> dict:
    """Measure the index's CURRENT recall under its FROZEN quantizer
    (r9; VERDICT r8 item 4 — annindex's own 'rebuild when the
    calibration's measured recall decays' advice, made measurable):
    appends quantize against the stored centroids, so after 10× growth
    or a distribution shift the build-time calibration silently
    overstates recall. One exhaustive holdout pass (the calibrate_probe
    machinery — exact recall at every depth, cost O(h·N), a
    maintenance-job expense) against the live rows, with the holdout
    defaulting to the NEWEST appended batch's vectors — the traffic
    most likely to have drifted off the build-time corpus; pass
    ``holdout=`` to gauge external query traffic instead.

    Returns a gauge record: the fresh smallest depth reaching the
    stored target (``measured_nprobe``/``measured_p1``), the exact
    recall AT the stored operating point (``recall_at_stored``), and
    ``decayed`` = that recall fell below the stored target — the
    rebuild trigger as a number. :func:`compact_ivf_index` runs this
    beside each compaction (when the index stores a calibration and
    has appended batches) and commits it into the new generation's
    ``_meta.json`` next to the build-time calibration."""
    meta, data = read_ivf_snapshot(spark, path)
    cal = meta.get("calibration")
    target = cal["target"] if cal else 0.9
    k = cal["k"] if cal else 5
    live = (data.filter(F.col("list_id") != TOMBSTONE_LIST)
            .join(_tombstone_ids(data), "vec_id", "left_anti")
            .select("vec_id", "embedding", "_batch_id"))
    holdout_batch = None
    if holdout is None:
        bids = [r[0] for r in live.select("_batch_id").distinct().collect()]
        appended = [b for b in bids if b >= 0]
        if appended:
            holdout_batch = max(appended)
            holdout = live.filter(F.col("_batch_id") == holdout_batch)
    corpus = live.drop("_batch_id")
    hier = meta.get("kind") == "hier"
    if hier:
        stored = cal["p1"] if cal else None
        rec = calibrate_probe_hier(
            corpus, "vec_id", "embedding", k=k, target_recall=target,
            n_holdout=n_holdout, n1=meta["n1"], n2=meta["n2"],
            quantizer=meta["quantizer"], cents=(meta["C1"], meta["C2"]),
            holdout=holdout,
            report_depths=(stored,) if stored else ())
        fresh = rec["p1"]
    else:
        stored = cal["nprobe"] if cal else None
        rec = calibrate_probe(
            corpus, "vec_id", "embedding", k=k, target_recall=target,
            n_holdout=n_holdout, nlist=meta["nlist"],
            quantizer=meta["quantizer"], centroids=meta["centroids"],
            holdout=holdout,
            report_depths=(stored,) if stored else ())
        fresh = rec["nprobe"]
    at_stored = (rec.get("at_depths", {}).get(stored)
                 if stored is not None else None)
    gauge = {
        "kind": rec["kind"],
        ("measured_p1" if hier else "measured_nprobe"): fresh,
        "stored": stored,
        "recall_at_stored": at_stored,
        "target": target, "k": k,
        "n_holdout": rec["n_holdout"],
        "holdout_batch": holdout_batch,
        "decayed": (at_stored is not None and at_stored < target),
    }
    if gauge["decayed"]:
        import logging

        logging.getLogger(__name__).warning(
            "ivf index %s recall decayed: %.4f at stored depth %s "
            "(target %.2f) — measured depth for target is now %s; "
            "consider build_ivf_index(carry_appended=True)",
            path, at_stored, stored, target, fresh)
    return gauge


def compact_ivf_index(spark: SparkSession, path: str,
                      rows_per_task: int = SALT_ROWS_PER_TASK,
                      gauge: bool | None = None,
                      gauge_holdout: int = 32) -> None:
    """Fold the accumulated ``_batch_id`` partitions into the seed
    partition behind an atomic generation flip — exactly
    compact_neardup_index with the cell-nested layout; see its
    docstring for the full concurrency protocol. Keeps the
    highest-numbered batch as-is (the only one a foreachBatch replay
    can re-deliver); run from ONE maintenance job. The nested layout
    bounds files PER CELL (the fold repartitions on list_id with
    hot-cell salting — see _cell_shape), so there is no target_files
    knob here.

    Tombstoned vectors (ivf_index_delete) are PHYSICALLY removed from
    the folded rows here — the fold antijoins every data row against
    the full tombstone set (folded + kept batches) — while the
    tombstone rows themselves fold into the seed partition and keep
    masking ids that a kept-batch replay or late-carried batch could
    re-deliver (see ivf_index_delete's retention rationale).

    ``gauge`` (r9; VERDICT r8 item 4): None = auto — when the index
    stores a build-time calibration AND has appended batches, run
    :func:`measure_ivf_recall` against the current generation (holdout
    = newest appended batch) and commit the gauge record into the new
    generation's ``_meta.json``, making recall decay a stored number
    instead of a guess. True forces it, False skips it."""
    do_gauge = gauge
    if do_gauge is None:
        try:
            meta = read_ivf_meta(path)
            do_gauge = (meta.get("calibration") is not None and any(
                n.startswith("_batch_id=") and not n.endswith("=-1")
                for n in fsio.listdir(
                    resolve_neardup_index(fsio.join(path, "data")))))
        except Exception:
            do_gauge = False
    meta_overrides = None
    if do_gauge:
        new_meta = dict(read_ivf_meta(path))
        new_meta["gauge"] = measure_ivf_recall(spark, path,
                                               n_holdout=gauge_holdout)
        meta_overrides = {"_meta.json": json.dumps(new_meta)}

    def _fold(folded: DataFrame, kept: DataFrame | None) -> DataFrame:
        tomb = _tombstone_ids(folded)
        if kept is not None:
            tomb = tomb.unionByName(_tombstone_ids(kept)).distinct()
        live = (folded.filter(F.col("list_id") != TOMBSTONE_LIST)
                .join(tomb, "vec_id", "left_anti"))
        return live.unionByName(
            folded.filter(F.col("list_id") == TOMBSTONE_LIST))

    compact_neardup_index(spark, fsio.join(path, "data"),
                          part_cols=PART_COLS,
                          fold_transform=_fold,
                          shape=lambda df: _cell_shape(df, rows_per_task),
                          max_records_per_file=rows_per_task,
                          meta_overrides=meta_overrides)


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
    # scoring: the index KNOWS its dimension, so the dot/norm unroll
    # to fixed-dim codegen'd arithmetic (r9) — bitwise identical to
    # the HOF forms (pinned row-identical to topk_ivf_det), measured
    # 20.2 → 13.9 s on the 20M serve (SCALE_r09 §2)
    from .simsearch import _score_exprs

    _norm, _cos = _score_exprs(int(meta.get("dim") or 0))
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec"),
        _norm(vec_col).alias("qn"),
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
                _norm("embedding").alias("cn"), "list_id")
    )
    # deleted vectors never surface (ivf_index_delete): antijoin the
    # tombstone set — its scan prunes to the list_id=-1 dirs alone.
    # Skipped entirely when the generation's (cached) file listing
    # shows no tombstone partition — the common case pays nothing.
    if any("list_id=-1" in f for f in data.inputFiles()):
        c = c.join(
            _tombstone_ids(data).withColumnRenamed("vec_id", "cand_id"),
            "cand_id", "left_anti")
    qx = q.select("query_id", "qvec", "qn",
                  F.explode("probe").alias("list_id"))
    scored = (
        F.broadcast(qx).join(c, "list_id")
        .filter(F.col("query_id") != F.col("cand_id"))
        .select("query_id", "cand_id",
                _cos("qvec", "cvec", "qn", "cn").alias("cosine"))
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
