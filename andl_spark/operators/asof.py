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

import functools
import operator

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_SIDE = "__asof_side"
# bucket id for NULL-ts rows: sorts before every real floor(ts/width)
_NULL_BKT = -(2 ** 63)


def asof_join(
    probe: DataFrame,
    state: DataFrame,
    on: list[str],
    ts: str,
    value_cols: list[str],
    tie_col: str | None = None,
    tolerance: int | None = None,
    bucket_width: int | None = None,
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

    ``bucket_width`` (numeric ``ts`` only) switches to the SKEW-PROOF
    two-pass plan: windows partition on (key, floor(ts/width)) so a
    hot key — one user with billions of rows — never serializes into a
    single window partition. Pass 1 computes the bucket-local as-of;
    pass 2 forward-fills each bucket's carry-in (the last state row of
    any earlier bucket, one row per key×bucket — tiny) and coalesces.
    Identical results to the single-window plan (property-tested);
    choose width so one key×bucket fits an executor partition.
    """
    probe_cols = probe.columns
    reserved = {f"asof_{c}" for c in value_cols} | {
        _SIDE, "__asof_row", "__bkt", "__local", "__carry", "__carry_in"}
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
    state_row = F.when(F.col(_SIDE) == 0, row_struct)
    if bucket_width is None:
        w = (
            Window.partitionBy(*on)
            .orderBy(*order)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        out = (
            union.withColumn("__asof_row", F.last(state_row, ignorenulls=True).over(w))
            .filter(F.col(_SIDE) == 1)
        )
    else:
        if "timestamp" in dict(union.dtypes)[ts]:
            raise ValueError("bucket_width needs a numeric ts; convert "
                             "timestamps to epoch units first")
        # NULL ts sorts before every real bucket (mirroring the single
        # window's nulls-first order); NULL keys never survive the
        # equi-joins below, so those groups — degenerate, not the skew
        # target — take the single-window plan and union back in.
        u = union.withColumn(
            "__bkt",
            F.when(F.col(ts).isNull(), F.lit(_NULL_BKT))
            .otherwise(F.floor(F.col(ts) / F.lit(bucket_width))),
        )
        fallback = None
        if on:
            null_key = functools.reduce(
                operator.or_, [F.col(k).isNull() for k in on])
            fallback = u.filter(null_key)
            u = u.filter(~null_key)
        wl = (
            Window.partitionBy(*on, "__bkt")
            .orderBy(*order)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        local = u.withColumn("__local", F.last(state_row, ignorenulls=True).over(wl))
        # null-safe ordering key: a non-null leading field keeps NULL-ts
        # state rows visible to max_by (they lose to any real ts)
        ordk = F.struct(F.col(ts).isNotNull().alias("__n"),
                        F.col(ts).alias("__t"),
                        *([F.col(tie_col)] if tie_col else []))
        carries = (
            u.filter(F.col(_SIDE) == 0)
            .groupBy(*on, "__bkt")
            .agg(F.max_by(row_struct, ordk).alias("__carry"))
        )
        # forward-fill: each key×bucket's carry-in = the newest state
        # row from any EARLIER bucket (one row per key×bucket)
        buckets = u.select(*on, "__bkt").distinct()
        wb = (
            Window.partitionBy(*on)
            .orderBy("__bkt")
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        carry_in = (
            buckets.join(carries, on + ["__bkt"], "left")
            .withColumn("__carry_in", F.last("__carry", ignorenulls=True).over(wb))
            .select(*on, "__bkt", "__carry_in")
        )
        out = (
            local.filter(F.col(_SIDE) == 1)
            .join(carry_in, on + ["__bkt"])
            .withColumn("__asof_row", F.coalesce(F.col("__local"), F.col("__carry_in")))
            .select(*probe_cols, "__asof_row")
        )
        if fallback is not None:
            wf = (
                Window.partitionBy(*on)
                .orderBy(*order)
                .rowsBetween(Window.unboundedPreceding, Window.currentRow)
            )
            out = out.unionByName(
                fallback
                .withColumn("__asof_row",
                            F.last(state_row, ignorenulls=True).over(wf))
                .filter(F.col(_SIDE) == 1)
                .select(*probe_cols, "__asof_row")
            )
    if tolerance is not None:
        gap = F.col(ts) - F.col("__asof_row.__ts")
        if "timestamp" in dict(union.dtypes)[ts]:
            gap = F.col(ts).cast("double") - F.col("__asof_row.__ts").cast("double")
        # A matched state row whose ts is NULL has unknown age: it must
        # not survive a staleness bound (gap is NULL, so `gap > tol`
        # alone would keep it). Only rows with a match are nulled —
        # the no-match case stays NULL either way.
        out = out.withColumn(
            "__asof_row",
            F.when(
                F.col("__asof_row").isNotNull()
                & (gap.isNull() | (gap > F.lit(tolerance))),
                F.lit(None),
            ).otherwise(F.col("__asof_row")),
        )
    return out.select(
        *probe_cols,
        *[F.col(f"__asof_row.{c}").alias(f"asof_{c}") for c in value_cols],
    )
