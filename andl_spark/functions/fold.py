"""fold() — Andl's single aggregation primitive, mapped to Spark
aggregates.

Reference: Andl.Runtime/AccumulatorBlock.cs — ``fold(op, expr)`` folds
a dyadic operator over the group's values; it appears inside
``.select{}`` (grouped aggregation, sample2.andl:97-109) or under
``.order()`` (running aggregation, sample5.andl). Spark-side these
become hash-aggregate functions (map-side partial combine) or window
frames respectively — both whole-stage-codegen'd, no Python.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Andl fold operator → Spark aggregate builder.
FOLD_OPS: dict[str, object] = {
    "+": F.sum,
    "*": F.product,
    "max": F.max,
    "min": F.min,
    "and": F.bool_and,
    "or": F.bool_or,
    "count": F.count,
    "avg": F.avg,
    # text concatenation fold: fold(&, s)
    "&": lambda c: F.concat_ws("", F.collect_list(c)),
    # fold(union, rva) — union of relation-valued attrs → flatten arrays
    "union": lambda c: F.array_distinct(F.flatten(F.collect_list(c))),
}


def fold(op: str, col: Column | str) -> Column:
    """fold('+', QTY) → sum(QTY) etc. Aggregate context."""
    try:
        return FOLD_OPS[op](F.col(col) if isinstance(col, str) else col)
    except KeyError:
        raise ValueError(f"unknown fold op {op!r}; known: {sorted(FOLD_OPS)}") from None


def running_fold(op: str, col: Column | str, window) -> Column:
    """fold() under .order() — running aggregate over a window frame
    (rows unbounded-preceding → current), sample5.andl running sums."""
    from pyspark.sql import Window

    frame = window.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return fold(op, col).over(frame)
