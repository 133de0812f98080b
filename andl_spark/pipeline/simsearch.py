"""Similarity search over embedding columns (array<float>).

Two paths:
  * topk_bruteforce — exact cosine top-k. Query set broadcast against
    the corpus; the dot product is a JVM higher-order expression
    (zip_with + aggregate), so the scan stays in whole-stage codegen.
    Correctness baseline; O(|queries| × |corpus|).
  * topk_lsh — random-hyperplane LSH: corpus bucketed by sign bits,
    queries probe their own bucket (+ optional multi-probe neighbors);
    the join is bucket-equi, shuffle-partitionable — the 100 TB path.
    (IVF coarse quantization would slot in the same way with learned
    centroids; hyperplanes need no training pass.)
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot_expr(a: Column, b: Column) -> Column:
    """Σ aᵢbᵢ in double precision, sequential fold (JVM, no UDF)."""
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, v: acc + v)


def norm_expr(a: Column) -> Column:
    return F.sqrt(F.aggregate(
        F.transform(a, lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0), lambda acc, v: acc + v,
    ))


def cosine_expr(a: Column, b: Column) -> Column:
    return dot_expr(a, b) / (norm_expr(a) * norm_expr(b))


def topk_bruteforce(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Exact top-k by cosine for each query vector.

    Output: (query_id, cand_id, cosine, rank), rank 1..k, ties broken
    by cand_id for determinism. Queries are broadcast — the corpus scan
    is a single pass, no shuffle until the per-query top-k window on
    the (tiny) scored candidate set."""
    q = F.broadcast(
        queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec"))
    )
    c = corpus.select(F.col(id_col).alias("cand_id"), F.col(vec_col).alias("cvec"))
    scored = q.crossJoin(c).filter(F.col("query_id") != F.col("cand_id")).select(
        "query_id", "cand_id", cosine_expr(F.col("qvec"), F.col("cvec")).alias("cosine")
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("cand_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
    )


def _hyperplanes(dim: int, bits: int, seed: int = 42) -> np.ndarray:
    rng = np.random.RandomState(seed)
    return rng.standard_normal((bits, dim))


def hyperplane_bucket(vec_col: Column | str, dim: int, bits: int = 8, seed: int = 42) -> Column:
    """Sign-bit bucket id from ``bits`` fixed random hyperplanes,
    computed as a JVM expression (the hyperplane matrix is baked into
    the plan as literals — no UDF, no broadcast needed)."""
    v = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    planes = _hyperplanes(dim, bits, seed)
    bucket = F.lit(0)
    for i in range(bits):
        plane = F.array(*[F.lit(float(x)) for x in planes[i]])
        d = F.aggregate(
            F.zip_with(v, plane, lambda x, p: x.cast("double") * p),
            F.lit(0.0), lambda acc, x: acc + x,
        )
        bucket = bucket + F.when(d > 0, F.lit(1 << i)).otherwise(F.lit(0))
    return bucket


def train_centroids(
    corpus: DataFrame,
    vec_col: str = "embedding",
    nlist: int = 16,
    seed: int = 42,
    train_cap: int = 100_000,
    max_iter: int = 5,  # coarse quantization doesn't need tight convergence
) -> list[list[float]]:
    """IVF coarse quantizer: k-means centroids via Spark MLlib (JVM,
    distributed Lloyd iterations). Training reads a bounded sample —
    at 100 TB you train on ~1e5 vectors, not the corpus — and the
    result is tiny (nlist × dim doubles on the driver)."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    train = corpus.select(
        array_to_vector(F.col(vec_col).cast("array<double>")).alias("features")
    ).limit(train_cap)
    model = KMeans(k=nlist, seed=seed, maxIter=max_iter).fit(train)
    return [[float(x) for x in c] for c in model.clusterCenters()]


def nearest_lists(vec_col: Column | str, centroids: list[list[float]], nprobe: int) -> Column:
    """array<int> of the ``nprobe`` nearest centroid ids by squared-L2,
    as a pure JVM expression: the centroid table is baked into the plan
    as literals, so assignment is a shuffle-free, UDF-free map — the
    property that makes IVF assignment embarrassingly parallel over a
    100 TB corpus."""
    v = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    cents = F.array(*[F.array(*[F.lit(x) for x in c]) for c in centroids])
    scored = F.transform(
        F.sequence(F.lit(1), F.lit(len(centroids))),
        lambda i: F.struct(
            F.aggregate(
                F.zip_with(v, F.element_at(cents, i),
                           lambda x, c: (x.cast("double") - c) * (x.cast("double") - c)),
                F.lit(0.0), lambda acc, d: acc + d,
            ).alias("d"),
            (i - 1).alias("list_id"),
        ),
    )
    return F.transform(F.slice(F.array_sort(scored), 1, nprobe), lambda s: s["list_id"])


def topk_ivf(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    nlist: int = 16,
    nprobe: int = 3,
    centroids: list[list[float]] | None = None,
) -> DataFrame:
    """IVF ANN: corpus partitioned into ``nlist`` k-means cells, each
    query scans only its ``nprobe`` nearest cells. Recall/cost dial is
    nprobe/nlist; the candidate join is equi on list_id (bucket-
    partitionable at scale, queries broadcast). Pass pre-trained
    ``centroids`` to skip training (e.g. reuse across query batches)."""
    if centroids is None:
        centroids = train_centroids(corpus, vec_col, nlist)
    c = corpus.select(
        F.col(id_col).alias("cand_id"), F.col(vec_col).alias("cvec"),
        F.element_at(nearest_lists(vec_col, centroids, 1), 1).alias("list_id"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec"),
        F.explode(nearest_lists(vec_col, centroids, nprobe)).alias("list_id"),
    )
    scored = (
        F.broadcast(q).join(c, "list_id")
        .filter(F.col("query_id") != F.col("cand_id"))
        .select("query_id", "cand_id", cosine_expr(F.col("qvec"), F.col("cvec")).alias("cosine"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("cand_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
    )


def topk_lsh(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    bits: int = 8,
    multiprobe: int = 1,
) -> DataFrame:
    """Approximate top-k: probe the query's bucket plus every bucket at
    Hamming distance ≤ multiprobe (flip i bits). Recall grows with
    probes; the candidate join stays bucket-equi either way."""
    dim = len(corpus.select(vec_col).first()[0])
    c = corpus.select(
        F.col(id_col).alias("cand_id"), F.col(vec_col).alias("cvec"),
        hyperplane_bucket(vec_col, dim, bits).alias("bucket"),
    )
    qb = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec"),
        hyperplane_bucket(vec_col, dim, bits).alias("bucket0"),
    )
    probes = [F.col("bucket0")]
    if multiprobe >= 1:
        probes += [F.col("bucket0").bitwiseXOR(F.lit(1 << i)) for i in range(bits)]
    if multiprobe >= 2:
        probes += [
            F.col("bucket0").bitwiseXOR(F.lit((1 << i) | (1 << j)))
            for i in range(bits) for j in range(i + 1, bits)
        ]
    q = qb.select(
        "query_id", "qvec", F.explode(F.array(*probes)).alias("bucket")
    )
    scored = (
        F.broadcast(q).join(c, "bucket")
        .filter(F.col("query_id") != F.col("cand_id"))
        .select("query_id", "cand_id", cosine_expr(F.col("qvec"), F.col("cvec")).alias("cosine"))
        .dropDuplicates(["query_id", "cand_id"])
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("cand_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
    )
