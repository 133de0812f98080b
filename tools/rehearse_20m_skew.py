"""Round-10 scale rehearsal: the persisted IVF index at 20M vectors on
a SKEWED (clustered) corpus — VERDICT r9 items 1-4 measured.

The r9 20M fixture had uniform cells, so hot-cell salting never engaged
at scale and the full-fold compact (1227.8 s) was the measured cost to
kill. This run uses a corpus with ≥30% of vectors collapsing into one
quantizer cell (the clustered-crawl shape) and measures:

  1. build wall with salting ENGAGED — files-per-cell ≤ salt width
     bound verified on disk (item 4);
  2. warm serve, 32 scattered queries: mode="join" vs mode="shared"
     (item 3) with row-identity checked;
  3. a clustered append + INCREMENTAL compact vs the FULL fold on the
     same tree state (item 1) — cost proportional to the dirty
     fraction, row-identity of the resulting generations;
  4. the sampled recall gauge's cost beside the compact (item 2).

Run:  python tools/rehearse_20m_skew.py [N]      (default 20_000_000)
Prints one JSON line per step; paste the numbers into SCALE_r10.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from andl_spark.session import get_spark  # noqa: E402
from andl_spark.pipeline import annindex as AX  # noqa: E402


def log(step, **kw):
    print(json.dumps({"step": step, **kw}), flush=True)


def skewed_corpus(spark, n: int):
    """Deterministic 20M corpus, dim 8: 30% of vectors cluster tightly
    around one point (one quantizer cell — the hot-crawl shape), the
    rest EXACTLY the r9 analytic fixture's spread (copy/base jitter on
    coords 0-1 keeps ~200k distinct points across ~4.4k cells — the
    first cut of this corpus keyed the spread on base%101 alone, which
    collapsed to ~101 distinct vectors / 99 cells and made every cost
    look trivially cheap)."""
    base = F.col("id") % 200_000
    copy = (F.col("id") / 200_000).cast("long")

    def spread(j):
        c = ((base * (2 * j + 3)) % 101 - 50).cast("double") / 10.0
        if j == 0:
            c = c + copy.cast("double") * 0.001
        if j == 1:
            c = c + (base % 2003).cast("double") * 0.01
        return c

    def hot(j):
        # tight cluster at [40]*8 with deterministic sub-cell jitter
        return F.lit(40.0) + ((F.col("id") % 997).cast("double") * 1e-4
                              * (j + 1))

    is_hot = (F.col("id") % 10) < 3  # 30% of ids
    emb = F.array(*[
        F.when(is_hot, hot(j)).otherwise(spread(j)) for j in range(8)])
    return spark.range(n).select(
        F.col("id").alias("vec_id"), emb.alias("embedding"))


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000_000
    root = os.environ.get("REHEARSE_DIR", "/tmp/rehearse_r10")
    shutil.rmtree(root, ignore_errors=True)
    os.makedirs(root)
    spark = get_spark()
    corpus = skewed_corpus(spark, n)
    path = os.path.join(root, "ivf")

    # 1. build with salting engaged --------------------------------------
    t0 = time.time()
    meta = AX.build_ivf_index(corpus, path, corpus_count=n, calibrate=0.9)
    t_build = time.time() - t0
    gen_dir = os.path.join(path, "data", "gen=1", "_batch_id=-1")
    files_per_cell = {}
    for c in os.listdir(gen_dir):
        if c.startswith("list_id="):
            files_per_cell[c] = len([f for f in os.listdir(
                os.path.join(gen_dir, c)) if f.endswith(".parquet")])
    hot_files = max(files_per_cell.values())
    hot_rows = corpus.filter((F.col("vec_id") % 10) < 3).count()
    width_bound = -(-hot_rows // AX.SALT_ROWS_PER_TASK)
    log("build", sec=round(t_build, 1), kind=meta["kind"],
        nlist=meta["nlist"],
        cal=meta["calibration"] and {
            k: meta["calibration"][k] for k in ("kind", "recall")
            if k in meta["calibration"]},
        cells_on_disk=len(files_per_cell), hot_files=hot_files,
        hot_rows=hot_rows, salt_width_bound=width_bound,
        files_bound_ok=bool(hot_files <= width_bound + 1
                            and (width_bound == 1 or hot_files > 1)))

    # 2. warm serve: join vs shared on 32 scattered queries ---------------
    stride = max(1, n // 40)
    queries = corpus.filter(
        (F.col("vec_id") % stride == 7) & ((F.col("vec_id") % 10) >= 3)
    ).limit(32).localCheckpoint()
    nq = queries.count()
    AX.topk_ivf_index(spark, queries, path, k=5).count()  # warm listing
    t0 = time.time()
    j_rows = sorted(
        (r["query_id"], r["cand_id"], r["cosine"], r["rank"])
        for r in AX.topk_ivf_index(spark, queries, path, k=5,
                                   mode="join").collect())
    t_join = time.time() - t0
    t0 = time.time()
    s_rows = sorted(
        (r["query_id"], r["cand_id"], r["cosine"], r["rank"])
        for r in AX.topk_ivf_index(spark, queries, path, k=5,
                                   mode="shared").collect())
    t_shared = time.time() - t0
    log("serve32", n_queries=nq, join_sec=round(t_join, 1),
        shared_sec=round(t_shared, 1),
        rows_identical=bool(j_rows == s_rows), n_rows=len(j_rows))

    # 3. CLUSTERED append (new crawl of similar content: 200k vectors
    # tightly around ONE spread point -> one cold cell dirty) + delete,
    # then incremental vs full compact — a scattered append instead
    # dirties most cells, where the plan falls back to the one-pass
    # full fold (INCREMENTAL_MAX_DIRTY_FRAC)
    anchor = [((77_777 * (2 * j + 3)) % 101 - 50) / 10.0 for j in range(8)]
    batch = spark.range(200_000).select(
        (F.col("id") + n).alias("vec_id"),
        F.array(*[F.lit(anchor[j])
                  + (F.col("id") % 997).cast("double") * 1e-6
                  for j in range(8)]).alias("embedding"))
    t0 = time.time()
    AX.ivf_index_append(batch, path, batch_id=0)
    t_append = time.time() - t0
    AX.ivf_index_append(  # a kept max batch so the fold has work
        corpus.limit(1000).withColumn("vec_id", F.col("vec_id") + 2 * n),
        path, batch_id=1)
    AX.ivf_index_delete(list(range(100, 132)), path, batch_id=2,
                        spark=spark)
    data = AX.read_ivf_data(spark, path)
    dirty = data.filter(F.col("_batch_id").isin(0, 2)) \
        .filter(F.col("list_id") >= 0).select("list_id").distinct().count()
    log("append", sec=round(t_append, 1), batch_rows=200_000,
        dirty_cells=dirty, total_cells=len(files_per_cell))

    # clone the tree so full and incremental fold the SAME state
    full_root = os.path.join(root, "ivf_full")
    shutil.copytree(path, full_root)

    t0 = time.time()
    AX.compact_ivf_index(spark, path, incremental=True)
    t_inc = time.time() - t0
    gauge = AX.read_ivf_meta(path).get("gauge")
    log("compact_incremental", sec=round(t_inc, 1),
        gauge={k: gauge[k] for k in ("recall_at_stored", "decayed",
                                     "sampled_n", "corpus_n")
               if gauge and k in gauge} if gauge else None)

    t0 = time.time()
    AX.compact_ivf_index(spark, full_root, incremental=False)
    t_full = time.time() - t0
    log("compact_full", sec=round(t_full, 1),
        speedup=round(t_full / max(t_inc, 1e-9), 2))

    # row-identity of the two compacted generations
    a = AX.read_ivf_data(spark, path).select("vec_id", "list_id",
                                             "_batch_id")
    b = AX.read_ivf_data(spark, full_root).select("vec_id", "list_id",
                                                  "_batch_id")
    diff = a.exceptAll(b).count() + b.exceptAll(a).count()
    log("compact_identity", diff_rows=diff, ok=bool(diff == 0))

    # 4. serve parity after compaction (deletes masked) -------------------
    got = AX.topk_ivf_index(spark, queries, path, k=5, mode="shared")
    victims = set(range(100, 132))
    served = {r["cand_id"] for r in got.collect()}
    log("post_compact_serve", n=got.count(),
        victims_served=len(served & victims))
    log("done", n=n)


if __name__ == "__main__":
    main()
