"""Point-in-time (as-of) join — an operator Spark's DataFrame API lacks.

For each left ("probe") row, find the most recent right ("state") row
whose timestamp is <= the probe's, within the same key group — the
trades/quotes and feature-store lookup pattern. The reference engine
has no streaming/temporal surface at all (its tables are static
relations, Andl.Runtime/DataTableLocal.cs), so this is part of the
Spark-first upgrade alongside §2.7 streaming.

Scale shape — the union-and-running-window formulation:

    probe(k, ts, ...) ∪ state(k, ts, v...)  →  one shuffle on k
    last(v ignoring nulls) over (partition k order ts, side) → asof v
    filter side = probe

A single Exchange on the key, linear work per group, no range-join
candidate explosion (the naive formulation — join on k with
``l.ts >= r.ts`` then argmax — materializes |probe|×|state| rows per
key before pruning; at 100 TB that is the difference between a plan
that runs and one that doesn't). Ties (state row at exactly the probe
ts) resolve to the state row: state sorts before probe at equal ts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_SIDE = "__asof_side"


def asof_join(
    probe: DataFrame,
    state: DataFrame,
    on: list[str],
    ts: str,
    value_cols: list[str],
    tie_col: str | None = None,
    tolerance: int | None = None,
) -> DataFrame:
    """As-of join: probe rows gain ``asof_<c>`` for each value column.

    ``probe`` and ``state`` must share the ``on`` key columns and the
    ``ts`` column (numeric or timestamp; align units beforehand).
    ``value_cols`` are state columns carried onto the matching probe
    row (all null when no state row precedes the probe). The matching
    state row travels as ONE unit — a probe row's ``asof_*`` values
    always come from the same state row, and a NULL value in the
    matching row stays NULL (it is not back-filled from an older row).
    ``tie_col`` breaks ties between state rows with identical ``ts``
    deterministically (the greatest wins). ``tolerance`` nulls out
    matches staler than the given distance — in ``ts``'s own units for
    numeric ``ts``, in SECONDS for timestamp ``ts``.
    """
    probe_cols = probe.columns
    reserved = {f"asof_{c}" for c in value_cols} | {_SIDE, "__asof_row"}
    clash = (set(value_cols) | reserved) & (set(probe_cols) - {ts})
    if clash:
        raise ValueError(
            f"columns {sorted(clash)} clash with probe columns; alias them first")

    keep = list(dict.fromkeys(on + [ts] + value_cols + ([tie_col] if tie_col else [])))
    # the whole candidate state row rides in one struct so every
    # asof_<c> (and the staleness check) reads the SAME matched row
    row_struct = F.struct(F.col(ts).alias("__ts"),
                          *[F.col(c).alias(c) for c in value_cols])
    union = (
        probe.withColumn(_SIDE, F.lit(1))
        .unionByName(state.select(*keep).withColumn(_SIDE, F.lit(0)),
                     allowMissingColumns=True)
    )
    order = [F.col(ts), F.col(_SIDE)] + ([F.col(tie_col)] if tie_col else [])
    w = (
        Window.partitionBy(*on)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = F.last(
        F.when(F.col(_SIDE) == 0, row_struct), ignorenulls=True
    ).over(w)
    out = (
        union.withColumn("__asof_row", matched)
        .filter(F.col(_SIDE) == 1)
    )
    if tolerance is not None:
        gap = F.col(ts) - F.col("__asof_row.__ts")
        if "timestamp" in dict(union.dtypes)[ts]:
            gap = F.col(ts).cast("double") - F.col("__asof_row.__ts").cast("double")
        out = out.withColumn(
            "__asof_row",
            F.when(gap > F.lit(tolerance), F.lit(None)).otherwise(F.col("__asof_row")),
        )
    return out.select(
        *probe_cols,
        *[F.col(f"__asof_row.{c}").alias(f"asof_{c}") for c in value_cols],
    )
