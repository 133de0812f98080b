"""Round-11 scale rehearsal — the three r11 additions measured at
scale (VERDICT r10 items 1, 2, 6):

  1. knn_join CORPUS-AS-QUERIES at 20M vectors over the persisted IVF
     index (the SemDeDup / kNN-graph shape both serving paths refuse):
     wall-clock for the full 20M×20M top-k join at the calibrated
     probe depth, plus row-identity vs topk_ivf_index(mode='join') on
     an overlapping 1k-query batch (recall parity is inherited from
     the identical probe rule — pinned, not argued).
  2. The TIERED flat-leg fold at 20M signature rows: incremental
     compaction (fold new batches, hardlink-carry the seed) vs the
     full re-fold of the same tree state — the amortized-rewrite
     claim measured at corpus scale.
  3. IVF-PQ at 5M × dim-32: bytes per vector on disk (embedding
     column vs code column), ADC+re-rank serve vs exact serve
     wall-clock, and recall of the ADC path against the exact path.

Run:  python tools/rehearse_r11.py [N]      (default 20_000_000)
Prints one JSON line per step; numbers go into SCALE_r11.md.
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
from andl_spark.streaming import events as E  # noqa: E402


def log(step, **kw):
    print(json.dumps({"step": step, **kw}), flush=True)


def uniform_corpus(spark, n: int):
    """The r9 analytic fixture's spread (no hot cell): ~200k distinct
    points across ~4.4k cells at the auto nlist — corpus-as-queries
    over a 30%-one-cell corpus is inherently quadratic in that cell,
    which is a property of the DATA, not the operator; the uniform
    shape measures the operator."""
    base = F.col("id") % 200_000
    copy = (F.col("id") / 200_000).cast("long")

    def spread(j):
        c = ((base * (2 * j + 3)) % 101 - 50).cast("double") / 10.0
        if j == 0:
            c = c + copy.cast("double") * 0.001
        if j == 1:
            c = c + (base % 2003).cast("double") * 0.01
        return c

    emb = F.array(*[spread(j) for j in range(8)])
    return spark.range(n).select(
        F.col("id").alias("vec_id"), emb.alias("embedding"))


def step_knn(spark, root: str, n: int):
    corpus = uniform_corpus(spark, n)
    path = os.path.join(root, "ivf_knn")
    t0 = time.time()
    meta = AX.build_ivf_index(corpus, path, corpus_count=n, calibrate=0.9)
    t_build = time.time() - t0
    nprobe = (meta["calibration"] or {}).get(
        "p1" if meta.get("kind") == "hier" else "nprobe")
    log("knn_build", sec=round(t_build, 1), nlist=meta["nlist"],
        kind=meta["kind"], calibrated_probe=nprobe)

    # identity vs the serving path on an overlapping 1k batch
    batch = corpus.filter(F.col("vec_id") % (n // 1000) == 3) \
        .limit(1000).localCheckpoint()
    want = sorted((r["query_id"], r["cand_id"], r["cosine"], r["rank"])
                  for r in AX.topk_ivf_index(
                      spark, batch, path, k=5, nprobe=2,
                      mode="join").collect())
    got = sorted((r["query_id"], r["cand_id"], r["cosine"], r["rank"])
                 for r in AX.knn_join(spark, batch, path, k=5,
                                      nprobe=2).collect())
    log("knn_identity_1k", identical=bool(got == want), rows=len(got))

    # the headline: corpus-as-queries, every row gets its top-3
    t0 = time.time()
    out = AX.knn_join(spark, corpus, path, k=3, nprobe=2)
    n_out = out.count()
    t_knn = time.time() - t0
    qs = out.select("query_id").distinct().count()
    log("knn_corpus_as_queries", n=n, k=3, nprobe=2,
        sec=round(t_knn, 1), out_rows=n_out, queries_served=qs,
        rows_per_sec=int(n / max(t_knn, 1e-9)))


def step_tiered(spark, root: str, n: int):
    sigs = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.array(*[F.xxhash64(F.col("id"), F.lit(j))
                  for j in range(8)]).alias("signature"))
    idx = os.path.join(root, "flat_idx")
    t0 = time.time()
    E.seed_neardup_index(sigs, idx, max_records_per_file=2_000_000)
    t_seed = time.time() - t0
    # three crawl batches of 200k signature rows each
    for b in range(3):
        batch = spark.range(200_000).select(
            (F.col("id") + n + b * 200_000).alias("doc_id"),
            F.array(*[F.xxhash64(F.col("id"), F.lit(100 + j))
                      for j in range(8)]).alias("signature"))
        E.commit_batch_partitions(batch, b, idx)
    full_idx = os.path.join(root, "flat_idx_full")
    shutil.copytree(idx, full_idx)

    t0 = time.time()
    E.compact_neardup_index(spark, idx, target_files=16)  # tiered default
    t_tiered = time.time() - t0
    t0 = time.time()
    E.compact_neardup_index(spark, full_idx, target_files=16,
                            incremental=False)
    t_full = time.time() - t0
    a = E.read_neardup_index(spark, idx).select("doc_id")
    b = E.read_neardup_index(spark, full_idx).select("doc_id")
    diff = a.exceptAll(b).count() + b.exceptAll(a).count()
    log("tiered_fold_20m", seed_sec=round(t_seed, 1),
        tiered_sec=round(t_tiered, 1), full_sec=round(t_full, 1),
        speedup=round(t_full / max(t_tiered, 1e-9), 2),
        identical=bool(diff == 0))


def _tree_bytes(d, col_marker=None):
    total = 0
    for r, _, files in os.walk(d):
        for f in files:
            if f.endswith(".parquet"):
                total += os.path.getsize(os.path.join(r, f))
    return total


def step_pq(spark, root: str, n: int = 5_000_000, dim: int = 32):
    def spread(j):
        return (((F.col("id") % 262_144) * (2 * j + 3)) % 997
                - 498).cast("double") / 100.0

    corpus = spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.array(*[spread(j) for j in range(dim)]).alias("embedding"))
    plain = os.path.join(root, "ivf_plain")
    pq = os.path.join(root, "ivf_pq")
    t0 = time.time()
    AX.build_ivf_index(corpus, plain, corpus_count=n)
    t_plain = time.time() - t0
    t0 = time.time()
    AX.build_ivf_index(corpus, pq, corpus_count=n, pq_m=8)
    t_pq = time.time() - t0
    b_plain = _tree_bytes(os.path.join(plain, "data"))
    b_pq = _tree_bytes(os.path.join(pq, "data"))
    log("pq_build_5m", plain_sec=round(t_plain, 1),
        pq_sec=round(t_pq, 1),
        plain_bytes_per_vec=round(b_plain / n, 1),
        pq_tree_bytes_per_vec=round(b_pq / n, 1))

    queries = corpus.filter(F.col("vec_id") % (n // 64) == 5) \
        .limit(64).localCheckpoint()
    AX.topk_ivf_index(spark, queries, plain, k=5, nprobe=8,
                      use_pq=False).count()  # warm listings
    AX.topk_ivf_index(spark, queries, pq, k=5, nprobe=8,
                      use_pq=False).count()
    t0 = time.time()
    exact = {(r["query_id"], r["cand_id"])
             for r in AX.topk_ivf_index(spark, queries, plain, k=5,
                                        nprobe=8).collect()}
    t_exact = time.time() - t0
    t0 = time.time()
    adc = {(r["query_id"], r["cand_id"])
           for r in AX.topk_ivf_index(spark, queries, pq, k=5,
                                      nprobe=8).collect()}
    t_adc = time.time() - t0
    recall = len(adc & exact) / max(len(exact), 1)
    log("pq_serve_5m", exact_sec=round(t_exact, 1),
        adc_sec=round(t_adc, 1), recall_vs_exact=round(recall, 4))


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000_000
    root = os.environ.get("REHEARSE_DIR", "/tmp/rehearse_r11")
    shutil.rmtree(root, ignore_errors=True)
    os.makedirs(root)
    spark = get_spark()
    only = sys.argv[2] if len(sys.argv) > 2 else None
    if only in (None, "knn"):
        step_knn(spark, root, n)
    if only in (None, "tiered"):
        step_tiered(spark, root, n)
    if only in (None, "pq"):
        step_pq(spark, root)
    log("done", n=n)


if __name__ == "__main__":
    main()
