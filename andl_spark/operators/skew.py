"""Skew-aware join helpers (SURVEY.md §4).

AQE's skew-join splitting (enabled in get_spark) handles most skew at
runtime; these helpers cover the cases AQE can't:

  * salted_join — a shuffle join where one side has a few pathological
    hot keys (a power-law key appearing in 1% of 100 TB lands an entire
    executor's worth of rows on one task). The hot side gets a random
    salt in [0, salt); the other side is replicated salt× with every
    salt value. Key cardinality × salt stays bounded because only the
    join key is replicated, not the data volume per row.
  * broadcast-threshold guidance lives in the operators themselves
    (dims are broadcast explicitly); salting is for medium tables that
    are too big to broadcast but hot-keyed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: list[str],
    salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Join where ``skewed`` has hot values in the ``on`` columns.

    skewed rows get salt ~ U[0, salt); other rows are exploded to all
    salt values; the join key becomes (on..., __salt), spreading each
    hot key across ``salt`` shuffle partitions. Output drops the salt.

    rand() is seeded per-partition by Spark — deterministic plans
    aren't needed here because the salt never affects results, only
    placement.

    Only left-preserving joins are allowed: the explode replicates
    every ``other`` row ``salt`` times, so an unmatched right-side row
    of a right/full join would surface once per salt value.
    """
    if how not in ("inner", "left", "leftsemi", "left_semi", "leftanti", "left_anti"):
        raise ValueError(
            f"salted_join supports left-preserving joins only, not {how!r} "
            "(right/full would emit unmatched other-side rows salt times)"
        )
    salted_l = skewed.withColumn("__salt", (F.rand(seed=42) * salt).cast("int"))
    salted_r = other.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    return salted_l.join(salted_r, on=[*on, "__salt"], how=how).drop("__salt")


def key_histogram(df: DataFrame, key: str, top: int = 20) -> DataFrame:
    """Diagnostic: the heaviest join keys (run before choosing a
    strategy; a top-1 share over ~1/num_partitions means salting or
    AQE skew handling is mandatory)."""
    return df.groupBy(key).count().orderBy(F.col("count").desc()).limit(top)
