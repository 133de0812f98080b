"""Set operators on the common heading — Andl `union minus rminus
intersect symdiff`.

Reference behavior (Test/SuiteRelDyadic.andl:26-30, 44-48): when the
two operands have different headings, Andl's set ops operate on the
*common* attributes — degree(S union SP) == 1 (just S#). We reproduce
that: both sides are projected (column-pruned scan, free in parquet)
onto the shared columns, then Spark's set operators run with set
semantics (distinct).

Scale: Spark implements these as hash-partitioned shuffles on the full
row; AQE coalesces partitions. `intersect`/`except` are already
distinct-producing in Spark SQL semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from .joins import common_columns


def _aligned(left: DataFrame, right: DataFrame) -> tuple[DataFrame, DataFrame]:
    common = common_columns(left, right)
    if not common:
        raise ValueError("set operation requires at least one common attribute")
    return left.select(*common), right.select(*common)


def union(left: DataFrame, right: DataFrame) -> DataFrame:
    l, r = _aligned(left, right)
    return l.unionByName(r).dropDuplicates()


def minus(left: DataFrame, right: DataFrame) -> DataFrame:
    l, r = _aligned(left, right)
    return l.subtract(r)  # EXCEPT DISTINCT — set semantics built in


def rminus(left: DataFrame, right: DataFrame) -> DataFrame:
    return minus(right, left)


def intersect(left: DataFrame, right: DataFrame) -> DataFrame:
    l, r = _aligned(left, right)
    return l.intersect(r)


def symdiff(left: DataFrame, right: DataFrame) -> DataFrame:
    l, r = _aligned(left, right)
    return l.subtract(r).unionByName(r.subtract(l))
