"""Fixed-point iteration — Andl's `.while()` (recursive queries).

Reference: Sample/recursive.andl and Test/SuiteRelWhile.andl — seed
relation, apply an expression to produce new tuples, accumulate until
no new tuples appear (SQL `WITH RECURSIVE` equivalent; engine loop in
Andl.Runtime/DataTableLocal.cs Recurse).

Spark-first design (semi-naive evaluation):
  * Each iteration applies ``step`` only to the *frontier* (the tuples
    discovered last round), not the whole accumulated set — the same
    optimization Datalog engines use; keeps per-iteration join input
    small even when the closure is huge.
  * ``localCheckpoint`` every iteration truncates lineage; without it a
    deep recursion builds an exponentially-nested plan that stalls the
    Catalyst optimizer long before data size matters.
  * The only driver-side values are per-iteration frontier *counts*
    (computed distributed); tuple data never hits the driver.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame


def fixpoint(
    seed: DataFrame,
    step: Callable[[DataFrame], DataFrame],
    max_iterations: int = 100,
) -> DataFrame:
    """Smallest superset of ``seed`` closed under ``step`` (set semantics).

    ``step`` takes the current frontier and returns candidate new
    tuples with the same heading (extra columns are dropped, order
    normalized via unionByName).
    """
    cols = seed.columns
    total = seed.dropDuplicates().localCheckpoint(eager=True)
    frontier = total
    for _ in range(max_iterations):
        produced = step(frontier).select(*cols)
        # New tuples only: semi-naive delta. subtract = EXCEPT DISTINCT.
        frontier = produced.subtract(total).localCheckpoint(eager=True)
        if frontier.isEmpty():
            return total
        total = total.unionByName(frontier).localCheckpoint(eager=True)
    raise RuntimeError(f"fixpoint did not converge in {max_iterations} iterations")


def fixpoint_with_level(
    seed: DataFrame,
    step: Callable[[DataFrame], DataFrame],
    level_col: str = "level",
    max_iterations: int = 100,
) -> DataFrame:
    """Fixpoint keeping a 0-based iteration level (org-chart flattening,
    Sample/recursive.andl:23-27). Dedup ignores the level column — a
    tuple reached at level 2 is not re-added at level 5 (shortest-path
    semantics, matching WITH RECURSIVE UNION behavior on first reach).
    """
    from pyspark.sql import functions as F

    data_cols = [c for c in seed.columns if c != level_col]
    if level_col not in seed.columns:
        seed = seed.withColumn(level_col, F.lit(0))
    cols = data_cols + [level_col]
    total = seed.select(*cols).dropDuplicates(data_cols).localCheckpoint(eager=True)
    frontier = total
    for _ in range(max_iterations):
        produced = step(frontier).select(*cols)
        frontier = (
            produced.join(total.select(*data_cols), on=data_cols, how="leftanti")
            .dropDuplicates(data_cols)
            .localCheckpoint(eager=True)
        )
        if frontier.isEmpty():
            return total
        total = total.unionByName(frontier).localCheckpoint(eager=True)
    raise RuntimeError(f"fixpoint did not converge in {max_iterations} iterations")
