"""Skew-robust grouped running folds (ord/running-total family at scale).

Andl's ``.order(%group)`` running folds (Sample/sample5.andl:27-44;
Runtime/OrderedIndex.cs accumulators) compile naturally to
``Window.partitionBy(group).orderBy(keys)`` — one shuffle, one sort.
That plan has a hidden failure mode the r5 zipf rehearsal measured
directly: a window partition IS a task, so when one group owns 30% of
a fact table (one customer with 30% of all orders), the whole hot
group funnels through a single task — q_window_running degraded 3.1×
on the skewed sf1 variant while every join in the suite stayed flat
under AQE skew handling, because AQE can split a skewed JOIN partition
but can never split a WINDOW partition (the frame is sequential).

This module is the escape hatch: the same two-pass
range-partition + offset-combine scheme ``pipeline/pack.py`` and the
language front-end's un-grouped ``.order()`` already use, generalized
to per-GROUP running folds so a hot group is spread across many tasks:

1. ``repartitionByRange(N, groups…, order…)`` — the total order of
   (group, order-key) is cut into N contiguous slices, so a hot group
   spans as many partitions as its row share demands instead of
   landing in one;
2. local running folds per (physical partition × group) via an
   ordinary window on ``(spark_partition_id(), groups…)`` — every
   window partition is bounded by the range-slice size, never by group
   size (the exchange this adds hashes on (pid, group), which is
   balanced for the same reason);
3. per-(partition, group) partials — row count plus each fold's last
   local prefix — prefix-combined by a window over the PARTIALS table
   partitioned by group and ordered by partition id. That table has at
   most (N + distinct-groups) rows and at most N rows per group, so
   this window is trivially balanced no matter how hot the data key is;
4. offsets equi-join back on (pid, groups) — again bounded per key —
   and global value = local prefix ⊕ group offset (⊕-identity when the
   group starts in this partition).

Only combinable folds are supported (sum, count/ordinal, min, max,
product, ordered concat — the reference's fold(+ * max min &)
surface); sequential folds (user-defined, ``-``/``/``) have no
two-pass combine and must stay on the single-partition-per-group
window. lang/interp.py auto-dispatches grouped running folds here
whenever every fold is combinable and no lag/lead/nth/ord/ordg is
present (r6; VERDICT r5 finding 1). lag/lead/nth across slice
boundaries are derivable as equi-joins on the emitted group ordinal
(``<ordinal> - k``), exactly as lang/interp.py does for the un-grouped
case.

Result rows are identical to the plain grouped window whenever the
order keys are unique per group (tests/test_runfold.py pins this on
the zipf-head distribution itself); with duplicate order keys both
plans are frame-nondeterministic in the same way.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["grouped_running", "RUN_OPS"]

#: op → (local(col, frame) running prefix,
#:       combine(partial_col, prefix_window) over the tiny partials,
#:       merge(local, offset))
#
# Merges must be NULL-SKIPPING to stay row-identical to the plain
# grouped window: F.sum/F.product over a window skip NULL inputs, so a
# row whose local slice-prefix is all-NULL has loc=NULL and the plain
# window would return the prior-slice value — coalesce(loc⊕off, loc,
# off) reproduces that (⊕ of two non-nulls, else whichever side
# exists, else NULL). least/greatest already skip NULLs natively.
RUN_OPS = {
    "sum": (
        lambda c, fr: F.sum(c).over(fr),
        lambda p, wq: F.sum(p).over(wq),
        lambda loc, off: F.coalesce(loc + off, loc, off),
    ),
    "min": (
        lambda c, fr: F.min(c).over(fr),
        lambda p, wq: F.min(p).over(wq),
        # least/greatest skip NULLs, so a missing offset (group starts
        # in this slice) leaves the local prefix untouched
        lambda loc, off: F.least(loc, off),
    ),
    "max": (
        lambda c, fr: F.max(c).over(fr),
        lambda p, wq: F.max(p).over(wq),
        lambda loc, off: F.greatest(loc, off),
    ),
    "product": (
        lambda c, fr: F.product(c).over(fr),
        lambda p, wq: F.product(p).over(wq),
        lambda loc, off: F.coalesce(loc * off, loc, off),
    ),
    "count": (
        lambda c, fr: F.count(c).over(fr),
        lambda p, wq: F.sum(p).over(wq),
        # count is never NULL locally; offset NULL only for the first
        # slice of a group
        lambda loc, off: loc + F.coalesce(off, F.lit(0)),
    ),
    # Andl fold(&, s) — ordered text concat. Associative, so it two-pass
    # combines: collect_list over an ordered frame preserves frame order
    # (same property lang/interp.py's un-grouped scheme relies on);
    # partials concatenate in __pid order; earlier-slice offset prefixes
    # the local value. Null semantics match concat_ws (nulls skipped).
    "concat": (
        lambda c, fr: F.concat_ws("", F.collect_list(c).over(fr)),
        lambda p, wq: F.concat_ws("", F.collect_list(p).over(wq)),
        lambda loc, off: F.concat(F.coalesce(off, F.lit("")), loc),
    ),
}


def grouped_running(
    df: DataFrame,
    groups: list[str],
    order: list[str | Column],
    folds: dict[str, tuple[str, str | Column]],
    *,
    ordinal: str | None = None,
    nparts: int | None = None,
) -> DataFrame:
    """Running folds per group, skew-robust.

    ``folds`` maps output column name → ``(op, value column)`` with op
    in ``RUN_OPS``. ``ordinal`` optionally names an output column for
    the 1-based within-group row number (Andl ``ord()`` under
    ``%group``). Order keys should be unique per group for
    deterministic frames (same contract as the plain window).
    """
    bad = [op for op, _ in folds.values() if op not in RUN_OPS]
    if bad:
        raise ValueError(f"unsupported running fold op(s) {bad}; "
                         f"supported: {sorted(RUN_OPS)}")
    spark = df.sparkSession
    if nparts is None:
        # shuffle.partitions can be the literal "auto" under
        # AQE-auto-optimized shuffle (e.g. Databricks) — fall back to
        # cluster default parallelism rather than raising
        try:
            nparts = int(spark.conf.get("spark.sql.shuffle.partitions"))
        except (TypeError, ValueError):
            nparts = spark.sparkContext.defaultParallelism
    okeys = [F.col(o) if isinstance(o, str) else o for o in order]
    out_cols = list(df.columns)

    base = (
        df.repartitionByRange(nparts, *[F.col(g) for g in groups], *okeys)
        .withColumn("__pid", F.spark_partition_id())
        # PIN the partitioning (r8): __pid is read by TWO subtrees (the
        # per-slice partials and the offsets join-back). Range
        # partitioning samples its boundaries per evaluation, so if
        # Spark's exchange reuse fails to dedupe the two subtrees (AQE
        # re-planning does this on complex DAGs — observed on the span
        # monster-doc path), each subtree sees DIFFERENT boundaries and
        # the offset join silently combines mismatched slices. The lazy
        # localCheckpoint truncates both subtrees onto ONE materialized
        # RDD: boundaries are sampled exactly once, __pid is consistent
        # by construction, and nothing runs until the caller acts.
        #
        # Trade-off (reviewed r8): localCheckpoint blocks are pinned to
        # executors, so an executor loss mid-query fails the query
        # instead of recomputing (Spark's documented caveat; rerun the
        # query). persist() would recompute but its CacheManager entry
        # leaks per call (no unpersist point — the r2 lesson), and a
        # reliable checkpoint writes the whole shuffle to the
        # checkpoint dir. Runfold consumers materialize promptly, so
        # the pinned window is one query; a deployment needing executor
        # -loss tolerance mid-runfold should set a checkpoint dir and
        # swap this for df.checkpoint(eager=False).
        .localCheckpoint(eager=False)
    )
    wl = Window.partitionBy("__pid", *groups).orderBy(*okeys)
    frame = wl.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cur = base.withColumn("__lrn", F.row_number().over(wl))
    for name, (op, val) in folds.items():
        col = F.col(val) if isinstance(val, str) else val
        cur = cur.withColumn(f"__lp_{name}", RUN_OPS[op][0](col, frame))

    # (pid, group) partials: tiny — ≤ nparts rows per group by
    # construction, so the prefix window below cannot be skewed
    partials = cur.groupBy("__pid", *groups).agg(
        F.max("__lrn").alias("__n"),
        *[
            F.max_by(f"__lp_{name}", "__lrn").alias(f"__t_{name}")
            for name in folds
        ],
    )
    wq = (
        Window.partitionBy(*groups)
        .orderBy("__pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offs = partials.select(
        "__pid",
        *groups,
        F.sum("__n").over(wq).alias("__rn_off"),
        *[
            RUN_OPS[op][1](f"__t_{name}", wq).alias(f"__off_{name}")
            for name, (op, _) in folds.items()
        ],
    )

    joined = cur.join(offs, on=["__pid", *groups], how="inner")
    sel = [F.col(c) for c in out_cols]
    if ordinal is not None:
        sel.append(
            (F.col("__lrn") + F.coalesce(F.col("__rn_off"), F.lit(0)))
            .cast("long")
            .alias(ordinal)
        )
    for name, (op, _) in folds.items():
        sel.append(
            RUN_OPS[op][2](F.col(f"__lp_{name}"), F.col(f"__off_{name}"))
            .alias(name)
        )
    return joined.select(*sel)
