"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram
Jaccard, embedding-cosine — the dedup toolbox of a training-data
pipeline, each designed for the 100 TB shape of the problem.

Scale design:
  * exact: one hash-groupBy — the cheapest possible shuffle key
    (16-byte digest), map-side combine.
  * minhash_lsh / simhash: signatures via Arrow-batched Pandas UDFs
    (vectorized numpy, ~100× row-at-a-time Python); candidate
    generation via LSH band buckets so the pair join is bounded by
    bucket sizes, never O(n²).
  * ngram_jaccard: exact pairwise similarity — only sane within
    candidate buckets or small collections; a frequency cap drops
    stop-shingles that would explode the join.
  * embedding_dup: cosine over fixed-length vectors with JVM
    higher-order functions (zip_with/aggregate), no Python.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.pandas.functions import pandas_udf

from ..util import ensure_parallelism
from .text import fingerprint

# ---------------------------------------------------------------------
# exact
# ---------------------------------------------------------------------

def exact_dedup(df: DataFrame, id_col: str, text_col: str, normalized: bool = True) -> DataFrame:
    """Tag every row with its duplicate-group canonical id (min id per
    content digest) and an is_dup flag. One groupBy on the digest.
    """
    from pyspark.sql import Window

    digest = fingerprint(text_col) if normalized else F.md5(F.col(text_col))
    tagged = df.select(F.col(id_col), digest.alias("digest"))
    # min-over-window: one shuffle on digest (vs groupBy + re-join = two)
    canonical = F.min(id_col).over(Window.partitionBy("digest"))
    return tagged.select(
        id_col,
        canonical.alias("canonical_id"),
        (F.col(id_col) != canonical).alias("is_dup"),
    )


# ---------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------

_MERSENNE = (1 << 61) - 1


def _perm_params(num_perm: int, seed: int) -> tuple[np.ndarray, np.ndarray]:
    """a, b < 2^32 so a*h32 + b fits in uint64 with no overflow — keeps
    the (a·h+b) mod p sweep in vectorized native uint64 (an object-dtype
    fallback is ~100× slower)."""
    rng = np.random.RandomState(seed)
    a = rng.randint(1, 1 << 32, size=num_perm, dtype=np.uint64)
    b = rng.randint(0, 1 << 32, size=num_perm, dtype=np.uint64)
    return a, b


def _stable_hash32(s: str) -> int:
    """Stable 32-bit content hash (zlib.crc32 — C speed, process-salt
    free, unlike Python's hash())."""
    import zlib

    return zlib.crc32(s.encode("utf-8"))


def _shingle_hashes(text: str, k: int) -> np.ndarray:
    """Distinct k-word shingles → stable 32-bit hashes."""
    words = text.lower().split()
    if len(words) < k:
        shingles = {" ".join(words)} if words else {""}
    else:
        shingles = {" ".join(words[i : i + k]) for i in range(len(words) - k + 1)}
    return np.fromiter((_stable_hash32(s) for s in shingles), dtype=np.uint64, count=len(shingles))


def minhash_signatures(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_perm: int = 64,
    shingle_k: int = 3,
    seed: int = 42,
) -> DataFrame:
    """(id, signature: array<long>[num_perm]) via a vectorized Pandas UDF."""
    a, b = _perm_params(num_perm, seed)

    mersenne = _MERSENNE
    k = shingle_k

    # NB: the UDF body is fully self-contained (no references to module
    # functions) so cloudpickle ships it by value — executors of a
    # driver-owned session have no andl_spark on their sys.path.
    @pandas_udf("array<long>")
    def sig(texts: pd.Series) -> pd.Series:
        import zlib

        out = []
        for t in texts:
            words = (t or "").lower().split()
            if len(words) < k:
                shingles = {" ".join(words)} if words else {""}
            else:
                shingles = {" ".join(words[i : i + k]) for i in range(len(words) - k + 1)}
            hs = np.fromiter(
                (zlib.crc32(s.encode("utf-8")) for s in shingles),
                dtype=np.uint64, count=len(shingles),
            )[:, None]
            # (a*h + b) mod p for all perms at once — native uint64,
            # no overflow since a,b,h < 2^32
            vals = (hs * a + b) % mersenne
            out.append(vals.min(axis=0).astype(np.int64).tolist())
        return pd.Series(out)

    src = ensure_parallelism(df.select(id_col, text_col))
    return src.select(F.col(id_col), sig(F.col(text_col)).alias("signature"))


def lsh_candidate_pairs(
    signatures: DataFrame,
    id_col: str,
    num_bands: int = 16,
    rows_per_band: int = 4,
) -> DataFrame:
    """Band the signatures and emit candidate pairs (a < b) that share
    at least one band bucket. The groupBy key is (band, band_hash) —
    shuffle-partitionable; bucket sizes bound the pair fan-out."""
    bands = F.array(*[
        F.struct(
            F.lit(i).alias("band"),
            F.hash(F.slice("signature", i * rows_per_band + 1, rows_per_band)).alias("bucket"),
        )
        for i in range(num_bands)
    ])
    exploded = signatures.select(F.col(id_col), F.explode(bands).alias("bb")).select(
        id_col, "bb.band", "bb.bucket"
    )
    a = exploded.alias("a")
    # shuffle_hash hint: both sides of an LSH self-join are corpus-sized;
    # letting AQE broadcast one side rebuilds the whole signature
    # pipeline in a single-threaded broadcast-build stage (measured 10s
    # of a 13s query at sf0.1).
    b = exploded.alias("b").hint("shuffle_hash")
    return (
        a.join(b, on=["band", "bucket"], how="inner")
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
        .dropDuplicates()
    )


def minhash_jaccard(signatures: DataFrame, pairs: DataFrame, id_col: str = "id") -> DataFrame:
    """Estimated Jaccard for candidate pairs = fraction of equal
    signature positions (zip_with, JVM-side)."""
    sa = signatures.select(F.col(id_col).alias("id_a"), F.col("signature").alias("sig_a"))
    sb = signatures.select(F.col(id_col).alias("id_b"), F.col("signature").alias("sig_b"))
    matched = pairs.join(sa, "id_a").join(sb, "id_b")
    eq = F.zip_with("sig_a", "sig_b", lambda x, y: (x == y).cast("int"))
    num = F.aggregate(eq, F.lit(0), lambda acc, v: acc + v).cast("double")
    return matched.select(
        "id_a", "id_b", (num / F.size("sig_a")).alias("est_jaccard")
    )


def minhash_lsh_dedup(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.7,
    num_perm: int = 64,
    num_bands: int = 16,
    shingle_k: int = 3,
) -> DataFrame:
    """End-to-end near-dup pairs: signatures → LSH buckets → estimated
    Jaccard ≥ threshold. Returns (id_a, id_b, est_jaccard)."""
    # Persist + materialize signatures: they feed candidate generation
    # AND both sides of the scoring join. Eager count() matters — the
    # self-join's two scan stages run concurrently, and with a lazy
    # persist they race and each runs the Pandas UDF over the full
    # corpus before the cache lands.
    sigs = minhash_signatures(df, id_col, text_col, num_perm, shingle_k).persist()
    sigs.count()
    pairs = lsh_candidate_pairs(sigs, id_col, num_bands, num_perm // num_bands)
    scored = minhash_jaccard(sigs, pairs, id_col)
    return scored.filter(F.col("est_jaccard") >= threshold)


# ---------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------

def simhash_signatures(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """64-bit SimHash per document (vectorized Pandas UDF)."""

    @pandas_udf("long")
    def sim(texts: pd.Series) -> pd.Series:
        import zlib

        out = np.empty(len(texts), dtype=np.int64)
        for i, t in enumerate(texts):
            words = (t or "").lower().split()
            if not words:
                out[i] = 0
                continue
            # two independent 32-bit hashes per word → 64 sign bits,
            # all bit-extraction vectorized in numpy
            h = np.fromiter(
                (
                    (zlib.crc32(w.encode()) << 32) | zlib.crc32(w.encode(), 0xBEEF)
                    for w in words
                ),
                dtype=np.uint64, count=len(words),
            )
            bits = (h[:, None] >> np.arange(64, dtype=np.uint64)) & np.uint64(1)
            acc = np.where(bits == 1, 1, -1).sum(axis=0)
            sign_bits = (acc > 0).astype(np.uint64)
            out[i] = (sign_bits << np.arange(64, dtype=np.uint64)).sum().astype(np.int64)
        return pd.Series(out)

    src = ensure_parallelism(df.select(id_col, text_col))
    return src.select(F.col(id_col), sim(F.col(text_col)).alias("simhash"))


def simhash_near_pairs(signatures: DataFrame, id_col: str, max_hamming: int = 3) -> DataFrame:
    """Near-dup pairs by Hamming distance ≤ max_hamming.

    LSH on 4 × 16-bit chunks (pigeonhole: distance ≤ 3 ⇒ at least one
    chunk equal), so the join is on chunk buckets, never all-pairs."""
    chunks = F.array(*[
        F.struct(F.lit(i).alias("chunk"),
                 F.shiftrightunsigned("simhash", i * 16).bitwiseAND(F.lit(0xFFFF)).alias("val"))
        for i in range(4)
    ])
    # Materialize the (typically UDF-computed) signatures before the
    # self-join: its two scan stages run concurrently and would each
    # recompute the signature pipeline (chunk explode from cache is
    # cheap — cache pre-explode, 1 row instead of 4 per doc).
    signatures = signatures.persist()
    signatures.count()
    e = signatures.select(id_col, "simhash", F.explode(chunks).alias("c")).select(
        id_col, "simhash", "c.chunk", "c.val"
    )
    a, b = e.alias("a"), e.alias("b").hint("shuffle_hash")
    hamming = F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash")))
    return (
        a.join(b, on=["chunk", "val"])
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            hamming.alias("hamming"),
        )
        .dropDuplicates(["id_a", "id_b"])
        .filter(F.col("hamming") <= max_hamming)
    )


# ---------------------------------------------------------------------
# exact n-gram Jaccard
# ---------------------------------------------------------------------

def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.5,
    max_shingle_freq: int | None = None,
) -> DataFrame:
    """Exact word-n-gram Jaccard for all pairs sharing ≥1 shingle.

    JVM-side shingling: split → transform over index range → explode.
    ``max_shingle_freq`` drops shingles appearing in more than that
    many docs (stop-shingles) — the lever that keeps the self-join
    bounded at corpus scale."""
    # Materialize the split once per row; referencing the split expr
    # inside the transform lambda would re-split per shingle.
    with_words = ensure_parallelism(df.select(id_col, text_col)).select(
        F.col(id_col).alias("id"),
        F.split(F.lower(F.trim(F.col(text_col))), r"\s+").alias("words"),
    )
    words = F.col("words")
    n_sh = F.greatest(F.size(words) - (n - 1), F.lit(1))
    # O(1) element indexing (F.get) — a slice() per position would make
    # shingling O(len²) per document (measured 15× slower at sf0.1).
    # concat_ws skips the nulls get() yields past the end, which
    # reproduces the short-document fallback of a truncated slice.
    shingles = F.array_distinct(
        F.transform(
            F.sequence(F.lit(0), n_sh - 1),
            lambda i: F.concat_ws(" ", *[F.get(words, i + j) for j in range(n)]),
        )
    )
    # Persist the COMPACT (id, shingle-array) table and materialize it
    # before deriving anything: it feeds both sides of the pair join
    # (lazy persist would let the two scan stages race and shingle
    # everything twice), and it is the barrier that stops Catalyst
    # collapsing the projection — size(sh) + explode(sh) over the raw
    # expression drops the shingling out of codegen into interpreted
    # re-evaluation (measured 12x: 10.9s vs 0.9s at sf0.1). Caching
    # pre-explode also stores each shingle once, not once per exploded
    # row.
    base = with_words.select("id", shingles.alias("sh")).persist()
    base.count()
    # Carry each document's shingle count through the explode: the pair
    # join then has both sizes in-row, avoiding two extra shuffle joins
    # against the (candidate-pair-sized, potentially huge) common table.
    ex = base.select(
        "id", F.size("sh").alias("n_sh"), F.explode("sh").alias("shingle")
    )
    if max_shingle_freq is not None:
        freq = ex.groupBy("shingle").count().filter(F.col("count") <= max_shingle_freq)
        ex = ex.join(freq.select("shingle"), "shingle")
    # shuffle_hash: same single-task broadcast-build hazard as
    # lsh_candidate_pairs — never broadcast a corpus-sized side.
    a, b = ex.alias("a"), ex.alias("b").hint("shuffle_hash")
    common = (
        a.join(b, "shingle")
        .filter(F.col("a.id") < F.col("b.id"))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(
            F.count(F.lit(1)).alias("n_common"),
            F.first("a.n_sh").alias("sz_a"),
            F.first("b.n_sh").alias("sz_b"),
        )
    )
    return common.select(
        "id_a",
        "id_b",
        (F.col("n_common") / (F.col("sz_a") + F.col("sz_b") - F.col("n_common"))).alias("jaccard"),
    ).filter(F.col("jaccard") >= threshold)


# ---------------------------------------------------------------------
# embedding cosine near-dup
# ---------------------------------------------------------------------

def embedding_dup_pairs(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float = 0.95,
    bucket_bits: int = 0,
    n_tables: int = 1,
    dim: int | None = None,
    seed: int = 42,
) -> DataFrame:
    """Pairs with cosine ≥ threshold.

    bucket_bits>0 — the 100 TB path: ``n_tables`` independent
    random-hyperplane LSH tables (seeds seed..seed+n_tables-1); a pair
    is a candidate if it collides in ANY table, then candidates are
    verified by exact cosine. Per-pair recall at similarity s is
    1-(1-p^bits)^n_tables with p = 1-acos(s)/π — ≥0.99 for genuine
    near-dups (s≥0.95) at bits=8, n_tables=8. The join is bucket-equi,
    never O(n²), and fully mirrored by embedding_dup_pairs_sql so an
    independent engine reproduces the same candidate set.

    bucket_bits=0 compares all pairs (correctness baseline for tests
    only — a cartesian product, never the declared path at scale).
    """
    from .simsearch import cosine_expr, hyperplane_bucket

    v = df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("vec"))
    if bucket_bits > 0:
        if dim is None:
            raise ValueError("bucket_bits>0 requires dim (no driver-side inference)")
        tables = F.array(*[
            F.struct(
                F.lit(t).alias("tbl"),
                hyperplane_bucket("vec", dim, bucket_bits, seed + t).alias("bucket"),
            )
            for t in range(n_tables)
        ])
        e = v.select("id", "vec", F.explode(tables).alias("tb")).select(
            "id", "vec", "tb.tbl", "tb.bucket"
        )
        # corpus-sized both sides: shuffle-hash, never AQE-broadcast
        a, b = e.alias("a"), e.alias("b").hint("shuffle_hash")
        joined = (
            a.join(b, on=["tbl", "bucket"])
            .filter(F.col("a.id") < F.col("b.id"))
            .select(
                F.col("a.id").alias("id_a"), F.col("a.vec").alias("vec_a"),
                F.col("b.id").alias("id_b"), F.col("b.vec").alias("vec_b"),
            )
            .dropDuplicates(["id_a", "id_b"])
        )
        cos = cosine_expr(F.col("vec_a"), F.col("vec_b"))
        return (
            joined.select("id_a", "id_b", cos.alias("cosine"))
            .filter(F.col("cosine") >= threshold)
        )
    a, b = v.alias("a"), v.alias("b")
    joined = a.crossJoin(b).filter(F.col("a.id") < F.col("b.id"))
    cos = cosine_expr(F.col("a.vec"), F.col("b.vec"))
    return (
        joined.select(
            F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"), cos.alias("cosine")
        )
        .filter(F.col("cosine") >= threshold)
    )


def embedding_dup_pairs_sql(
    table: str = "embeddings",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    bucket_bits: int = 8,
    n_tables: int = 8,
    dim: int = 64,
    seed: int = 42,
    round_to: int | None = 4,
) -> str:
    """DuckDB mirror of the bucketed embedding_dup_pairs: same
    hyperplane literals per table, same any-table collision candidate
    set, same exact-cosine verify."""
    from .simsearch import cosine_sql, hyperplane_bucket_sql

    selects = " UNION ALL ".join(
        f"SELECT id, vec, {t} AS tbl, "
        f"{hyperplane_bucket_sql('vec', dim, bucket_bits, seed + t)} AS bucket FROM v"
        for t in range(n_tables)
    )
    cos = cosine_sql("a.vec", "b.vec")
    out_cos = f"ROUND(cosine + 1e-9, {round_to})" if round_to is not None else "cosine"
    return f"""
WITH v AS (SELECT {id_col} AS id, {vec_col}::DOUBLE[] AS vec FROM {table}),
e AS ({selects}),
cand AS (
  SELECT DISTINCT a.id AS id_a, b.id AS id_b, {cos} AS cosine
  FROM e a JOIN e b ON a.tbl = b.tbl AND a.bucket = b.bucket AND a.id < b.id
)
SELECT id_a, id_b, {out_cos} AS cosine FROM cand WHERE cosine >= {threshold}
"""


# ---------------------------------------------------------------------
# incremental (batch-vs-corpus) dedup
# ---------------------------------------------------------------------

def dedup_against_index(
    new_docs: DataFrame,
    index: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    index_fp_col: str = "fp",
) -> DataFrame:
    """Ingest-time dedup of a NEW batch against the historical corpus:
    keep rows whose normalized-content fingerprint is absent from the
    index AND unique within the batch (min-id winner). The index is a
    fingerprint-only table — at 100 TB the corpus column never moves,
    only its digests — and the antijoin shuffles the (small) new batch
    against the bucketed/partitioned index."""
    from pyspark.sql import Window

    fp = fingerprint(text_col)
    tagged = new_docs.withColumn("__fp", fp)
    fresh = tagged.join(
        index.select(F.col(index_fp_col).alias("__fp")), on="__fp", how="leftanti"
    )
    w = Window.partitionBy("__fp")
    return (
        fresh.withColumn("__min", F.min(id_col).over(w))
        .filter(F.col(id_col) == F.col("__min"))
        .drop("__fp", "__min")
    )
