"""Deterministic dataset splitting for training pipelines.

A 100 TB corpus is never split by `rand()`: the assignment must be a
pure function of a stable key so (a) re-runs, backfills, and late
arrivals land in the same split, (b) no shuffle or state is needed —
the split predicate is a scan-side filter, and (c) any engine can
reproduce it (the DuckDB oracle computes the identical buckets).

Bucketing: first 8 hex chars of md5(key) → uint32 → mod 10_000.
md5 is engine-portable (unlike Spark's Murmur3 `F.hash` or xxhash64,
whose seeds/variants differ across systems); for cryptographic-grade
keys at extreme scale swap in xxhash64 and re-derive oracles with the
same engine.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: bucket space; 10k gives 0.01% split granularity
N_BUCKETS = 10_000


def hash_bucket(key: Column | str) -> Column:
    """Stable bucket in [0, N_BUCKETS): md5-hex prefix mod buckets.
    Pure scan-side expression — no shuffle, no UDF, no state."""
    c = F.col(key) if isinstance(key, str) else key
    h = F.conv(F.substring(F.md5(c.cast("string")), 1, 8), 16, 10).cast("long")
    return (h % N_BUCKETS).alias("bucket")


def assign_split(
    df: DataFrame,
    key: str,
    fractions: dict[str, float] | None = None,
) -> DataFrame:
    """Adds a `split` column ('train'/'val'/'test' by default) chosen
    deterministically from the key hash. Fractions are cumulative
    bucket ranges, so changing one boundary never reshuffles rows
    between the OTHER splits (stable under fraction tweaks)."""
    fractions = fractions or {"train": 0.95, "val": 0.025, "test": 0.025}
    b = hash_bucket(key)
    expr = None
    lo = 0.0
    for name, frac in fractions.items():
        hi = lo + frac
        cond = b < int(round(hi * N_BUCKETS))
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
        lo = hi
    return df.withColumn("split", expr.otherwise(F.lit(list(fractions)[0])))


def split_oracle_sql(key: str, table: str, fractions: dict[str, float] | None = None) -> str:
    """The DuckDB-equivalent split assignment (drives the correctness
    gate; also documents the portable definition of the split)."""
    fractions = fractions or {"train": 0.95, "val": 0.025, "test": 0.025}
    bucket = (
        f"(('0x' || substr(md5(CAST({key} AS VARCHAR)), 1, 8))::BIGINT % {N_BUCKETS})"
    )
    case, lo = "CASE", 0.0
    for name, frac in fractions.items():
        hi = lo + frac
        case += f" WHEN {bucket} < {int(round(hi * N_BUCKETS))} THEN '{name}'"
        lo = hi
    case += f" ELSE '{list(fractions)[0]}' END"
    return f"SELECT *, {case} AS split FROM {table}"
