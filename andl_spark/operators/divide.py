"""Relational divide and image relations.

Reference: Andl `rdivide` and the image-relation idiom
``S .select{ * partition := ({{*}} rdivide SP) }`` followed by
per-partition aggregation (Sample/sample3.andl:38-46). Classic Codd
divide: dividend(x,y) ÷ divisor(y) = the x whose image covers ALL of
divisor.

Spark-first strategy: the textbook double-antijoin materializes
candidates × divisor; at 100 TB that cross product is the bottleneck.
We instead use the count-matching form — one semijoin + one groupBy —
both shuffle-partitioned on the dividend keys, with the divisor
(small by construction) broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .joins import common_columns


def rdivide(dividend: DataFrame, divisor: DataFrame) -> DataFrame:
    """x-columns of dividend whose image contains every divisor tuple.

    dividend heading = x ∪ y, divisor heading = y (the common columns).
    """
    y = common_columns(dividend, divisor)
    if not y:
        raise ValueError("rdivide requires common attributes (the divisor heading)")
    x = [c for c in dividend.columns if c not in y]
    if not x:
        raise ValueError("dividend must have attributes beyond the divisor heading")
    div = divisor.select(*y).dropDuplicates()
    # The divisor cardinality rides a broadcast cross join instead of a
    # driver-side count() (r11): one fewer job per call, and the plan
    # stays fully lazy — composable without a hidden action. The
    # divisor is small by contract, so the 1-row total broadcast is
    # free; rows are identical (empty divisor → empty inner join →
    # empty result either way).
    total = div.agg(F.count(F.lit(1)).alias("__total"))
    # Broadcast-filter FIRST (kills non-divisor rows at the scan), then
    # one shuffle on x does dedup + count together: countDistinct gets
    # map-side partial aggregation, vs. a full dropDuplicates shuffle
    # of the dividend followed by a second count shuffle. Null y can't
    # reach the agg (equality join), so countDistinct is exact.
    matched = dividend.select(*x, *y).join(F.broadcast(div), on=y, how="inner")
    return (
        matched.groupBy(*x)
        .agg(F.countDistinct(*y).alias("__n"))
        .crossJoin(F.broadcast(total))
        .filter(F.col("__n") == F.col("__total"))
        .select(*x)
    )


def image_agg(
    left: DataFrame,
    right: DataFrame,
    aggs: dict[str, F.Column],
) -> DataFrame:
    """Per-left-tuple aggregation over its image in *right*, keeping
    left tuples whose image is EMPTY (zero-preserving) — the
    ES3 report of sample3.andl:45.

    ``aggs`` maps output column name → aggregate Column over right's
    columns; empty images produce 0 for counts/sums via coalesce.
    One left-outer join + one groupBy; Catalyst broadcasts *left* keys
    if small, and the groupBy gets map-side partial aggregation.
    """
    key = common_columns(left, right)
    if not key:
        raise ValueError("image_agg requires common attributes")
    joined = left.join(right, on=key, how="left")
    grouped = joined.groupBy(*[F.col(c) for c in left.columns])
    return grouped.agg(*[expr.alias(name) for name, expr in aggs.items()])
