"""Fixed-point iteration — Andl's `.while()` (recursive queries).

Reference: Sample/recursive.andl and Test/SuiteRelWhile.andl — seed
relation, apply an expression to produce new tuples, accumulate until
no new tuples appear (SQL `WITH RECURSIVE` equivalent; engine loop in
Andl.Runtime/DataTableLocal.cs Recurse).

Spark-first design (semi-naive evaluation):
  * Each iteration applies ``step`` only to the *frontier* (tuples
    discovered last round), not the accumulated set — the Datalog
    optimization that keeps per-iteration join input small even when
    the closure is huge.
  * One action per iteration: the frontier is persisted and counted
    (materialize + emptiness test in a single job). The accumulated
    total is only checkpointed every ``checkpoint_every`` iterations —
    enough to stop lineage explosion on deep recursions without paying
    a materialization job per round.
  * The only driver-side value is the per-iteration frontier count
    (computed distributed); tuple data never hits the driver.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame


def _run(
    seed: DataFrame,
    produce: Callable[[DataFrame], DataFrame],
    new_only: Callable[[DataFrame, DataFrame], DataFrame],
    max_iterations: int,
    checkpoint_every: int = 1,  # kept for API stability; deltas always checkpoint
) -> DataFrame:
    # Invariant: every delta is an eagerly-materialized localCheckpoint,
    # so `total` is always a FLAT union of materialized roots — lineage
    # depth stays O(1) regardless of recursion depth, and nothing is
    # ever recomputed. One materializing job per iteration; the
    # emptiness probe reads the checkpointed blocks (no recompute).
    # AQE's partition coalescing keeps each delta to a handful of
    # partitions, so the union stays narrow even after many rounds.
    total = seed.localCheckpoint(eager=True)
    frontier = total
    for _ in range(max_iterations):
        delta = new_only(produce(frontier), total).localCheckpoint(eager=True)
        if delta.isEmpty():
            return total
        total = total.unionByName(delta)
        frontier = delta
    raise RuntimeError(f"fixpoint did not converge in {max_iterations} iterations")


def fixpoint(
    seed: DataFrame,
    step: Callable[[DataFrame], DataFrame],
    max_iterations: int = 100,
    checkpoint_every: int = 3,
) -> DataFrame:
    """Smallest superset of ``seed`` closed under ``step`` (set
    semantics). ``step`` takes the current frontier and returns
    candidate tuples with the same heading (column order normalized)."""
    cols = seed.columns
    return _run(
        seed.dropDuplicates(),
        lambda fr: step(fr).select(*cols),
        lambda produced, total: produced.subtract(total),
        max_iterations,
        checkpoint_every,
    )


def fixpoint_naive(
    seed: DataFrame,
    step: Callable[[DataFrame], DataFrame],
    max_iterations: int = 100,
) -> DataFrame:
    """Fixpoint where ``step`` receives the ACCUMULATED relation, not
    the frontier — required for non-linear recursion (the step's logic
    re-examines all facts each pass, e.g. constraint propagation in
    Sample/sudoku.andl, where a new known digit prunes possibilities
    everywhere). Semi-naive doesn't apply: a step over just the delta
    would miss inferences that combine old and new facts.

    Cost model: each pass recomputes over the full set, so passes
    should shrink the *search space* monotonically even though the
    relation grows; the accumulated total is checkpointed every pass
    because it is re-joined wholly."""
    cols = seed.columns
    total = seed.dropDuplicates().localCheckpoint(eager=True)
    for _ in range(max_iterations):
        delta = step(total).select(*cols).subtract(total).localCheckpoint(eager=True)
        if delta.isEmpty():
            return total
        total = total.unionByName(delta).localCheckpoint(eager=True)
    raise RuntimeError(f"fixpoint did not converge in {max_iterations} iterations")


def fixpoint_with_level(
    seed: DataFrame,
    step: Callable[[DataFrame], DataFrame],
    level_col: str = "level",
    max_iterations: int = 100,
    checkpoint_every: int = 3,
) -> DataFrame:
    """Fixpoint keeping a 0-based iteration level (org-chart flattening,
    Sample/recursive.andl:23-27). Dedup ignores the level column — a
    tuple reached at level 2 is not re-added at level 5 (first-reach
    semantics). NB: this is intentionally STRONGER than SQL's
    WITH RECURSIVE ... UNION, which dedups whole rows including the
    level, so SQL emits a node once per distinct level it is reached
    at while this emits it once at its first level. The two agree only
    when every node has a unique reach level (shortest-path trees,
    acyclic org charts)."""
    from pyspark.sql import functions as F

    data_cols = [c for c in seed.columns if c != level_col]
    if level_col not in seed.columns:
        seed = seed.withColumn(level_col, F.lit(0))
    cols = data_cols + [level_col]
    return _run(
        seed.select(*cols).dropDuplicates(data_cols),
        lambda fr: step(fr).select(*cols),
        lambda produced, total: (
            produced.join(total.select(*data_cols), on=data_cols, how="leftanti")
            .dropDuplicates(data_cols)
        ),
        max_iterations,
        checkpoint_every,
    )
