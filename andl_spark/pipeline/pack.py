"""Sequence packing for training pipelines: lay documents into
fixed-token-budget training sequences.

Two standard layouts, each with the scale shape it deserves:

``chunk_sequences`` — concatenate-and-chunk (the GPT-style layout):
documents are concatenated in a stable global order and the token
stream is cut into fixed-size blocks; a document may straddle a block
boundary. The core is a GLOBAL running token sum. The naive Spark
formulation — ``Window.orderBy(id)`` with no partition — collapses the
whole table into ONE window partition, a guaranteed 100 TB
non-starter. Instead this uses the classic two-pass distributed prefix
sum (the scan algorithm): range-partition by id, sum tokens per
partition (one tiny row per partition to the driver), broadcast the
exclusive partition offsets back, then a partition-LOCAL cumsum window.
Work per row is linear, the only driver materialization is
n_partitions rows, and every window is bounded by a partition.
Integer arithmetic end-to-end, so a DuckDB
``SUM(tokens) OVER (ORDER BY id)`` oracle reproduces it exactly
(tests/test_pack.py).

``pack_greedy`` — whole-document first-fit-decreasing: no document is
split; each packing group is solved independently (partition-local, as
production packers do — a global FFD is inherently sequential and
unnecessary: utilization loss from partition-local packing vanishes as
group size / budget grows). Deterministic: groups are hash buckets of
the id (split.py's engine-portable md5 bucketing) and the in-group
order is (tokens desc, id). Arrow-batched applyInPandas, one shuffle.

The reference engine has no packing surface (its relations are small
static tables); this module is part of the §2.8 training-data
operator family (SURVEY.md).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .split import hash_bucket


def chunk_sequences(
    docs: DataFrame,
    id_col: str,
    tokens_col: str,
    block: int,
    n_parts: int = 32,
) -> DataFrame:
    """Concatenate-and-chunk layout. For each doc (ordered by
    ``id_col``) returns its place in the packed token stream:

    ``start_tok``   exclusive prefix sum of tokens (global offset)
    ``first_block`` / ``last_block``  fixed-size blocks it lands in
    ``n_blocks``    how many blocks it touches (straddles boundaries)
    ``block_off``   offset within its first block

    Zero-token docs occupy no stream space: they sit at their offset
    with ``n_blocks = 0`` and ``last_block < first_block``.

    Scale: two-pass prefix sum — no global window. The per-partition
    sums (one row each) are the only driver-side materialization.

    ``id_col`` must be unique. Pass 1 and pass 2 are separate jobs
    over the same lineage; that is sound because Spark's range
    partitioner samples with deterministic per-partition seeds and the
    explicit ``n_parts`` keeps AQE from re-coalescing — both jobs see
    identical partition boundaries (the gapless-stream test would
    fail otherwise).
    """
    d = docs.select(
        F.col(id_col).alias("id"),
        F.col(tokens_col).cast("long").alias("toks"),
    )
    part = (
        d.repartitionByRange(n_parts, "id")
        .sortWithinPartitions("id")
        .withColumn("__pid", F.spark_partition_id())
    )
    # pass 1: per-partition totals + min id — tiny (one row/partition).
    # Offsets are ordered by min id, NOT pid: range partition ids are
    # assigned by physical task order, which AQE may renumber.
    sums = (
        part.groupBy("__pid")
        .agg(F.sum("toks").alias("t"), F.min("id").alias("lo"))
        .collect()
    )
    off, acc = {}, 0
    for r in sorted(sums, key=lambda r: (r["lo"] is None, r["lo"])):
        off[r["__pid"]] = acc
        acc += r["t"] or 0
    off_df = part.sparkSession.createDataFrame(
        [(p, o) for p, o in off.items()], "__pid int, __off long")
    # pass 2: partition-local running sum + broadcast offset
    from pyspark.sql import Window

    w = (
        Window.partitionBy("__pid").orderBy("id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = (
        part.withColumn("__local", F.sum("toks").over(w))
        .join(F.broadcast(off_df), "__pid")
        .withColumn("__end", F.col("__local") + F.col("__off"))
        .withColumn("start_tok", F.col("__end") - F.col("toks"))
    )
    return cum.select(
        F.col("id").alias(id_col),
        F.col("toks").alias(tokens_col),
        "start_tok",
        F.floor(F.col("start_tok") / block).alias("first_block"),
        F.floor((F.col("__end") - 1) / block).alias("last_block"),
        F.when(F.col("toks") == 0, F.lit(0))
        .otherwise(F.floor((F.col("__end") - 1) / block)
                   - F.floor(F.col("start_tok") / block) + 1)
        .alias("n_blocks"),
        (F.col("start_tok") % block).alias("block_off"),
    )


def pack_greedy(
    docs: DataFrame,
    id_col: str,
    tokens_col: str,
    budget: int,
    n_groups: int = 256,
) -> DataFrame:
    """Whole-document packing: assigns each doc a ``seq_id`` such that
    every sequence's token total is <= ``budget`` (a single doc larger
    than the budget gets a sequence of its own — callers filter or
    chunk those upstream). First-fit-decreasing within deterministic
    md5-bucket groups of the id; ``seq_id`` is globally unique
    (``group * 2^32 + local``).

    Scale: one shuffle on the group bucket; each group packs
    independently in an Arrow batch. Choose ``n_groups`` so a group
    (corpus_tokens / n_groups) fits an executor — packing quality is
    unaffected once groups hold >> budget tokens.
    """
    import pandas as pd

    spark = docs.sparkSession
    d = docs.select(
        F.col(id_col).alias("id"),
        F.col(tokens_col).cast("long").alias("toks"),
        (hash_bucket(F.col(id_col)) % n_groups).alias("__grp"),
    )

    out_schema = "id long, toks long, __grp long, seq_id long"

    def _pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(
            ["toks", "id"], ascending=[False, True]).reset_index(drop=True)
        grp = int(pdf["__grp"].iloc[0]) if len(pdf) else 0
        bins: list[int] = []  # remaining capacity per open bin
        assign = []
        for t in pdf["toks"]:
            t = int(t)
            for i, cap in enumerate(bins):
                if t <= cap:
                    bins[i] = cap - t
                    assign.append(i)
                    break
            else:
                bins.append(max(budget - t, 0))
                assign.append(len(bins) - 1)
        pdf["seq_id"] = [grp * (1 << 32) + a for a in assign]
        return pdf

    return (
        d.groupBy("__grp").applyInPandas(_pack, out_schema)
        .select(F.col("id").alias(id_col), F.col("toks").alias(tokens_col),
                "seq_id")
    )
