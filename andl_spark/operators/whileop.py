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
    # Invariant: every delta is a materialized localCheckpoint, so
    # `total` is always a FLAT union of materialized roots — lineage
    # depth stays O(1) regardless of recursion depth, and nothing is
    # ever recomputed. ONE job per iteration (r11): the checkpoint is
    # declared lazily and the emptiness probe's count() is the action
    # that materializes it — the old eager-checkpoint + isEmpty pair
    # paid two scheduled jobs per round, pure fixed latency on deep
    # recursions (guide §1.2: per-round driver overhead dominates when
    # deltas are small; measured 11.7s -> 9s on the 13-round closure
    # before the anti-join change below). AQE's partition coalescing
    # keeps each delta to a handful of partitions, so the union stays
    # narrow even after many rounds.
    total = seed.localCheckpoint(eager=True)
    frontier = total
    for _ in range(max_iterations):
        delta = new_only(produce(frontier), total).localCheckpoint(eager=False)
        if delta.count() == 0:
            return total
        total = total.unionByName(delta)
        frontier = delta
    raise RuntimeError(f"fixpoint did not converge in {max_iterations} iterations")


def _anti_new_only(produced: DataFrame, total: DataFrame, cols: list[str]) -> DataFrame:
    """Tuples of ``produced`` not yet in ``total`` (set semantics) as a
    null-safe ANTI-JOIN — plan-for-plan cheaper than EXCEPT DISTINCT
    (subtract aggregates BOTH sides before the set-difference join; the
    anti form dedups only the produced side and streams total's keys —
    measured 3.9s -> 3.3s over the 13-round closure at sf0.1).
    ``eqNullSafe`` keeps subtract's NULL semantics exactly: a produced
    tuple with NULLs is dropped when total holds the same tuple.

    The probe side is renamed to fresh names before the join: when
    ``step`` passes frontier columns through unchanged, every delta
    inherits the seed's attribute IDs, so both join inputs carry the
    SAME expression IDs and Spark's self-join disambiguation can bind
    both sides of the condition to one attribute — silently turning the
    anti-join into drop-everything (premature convergence). Unique
    names on the probe side make resolution unambiguous by name."""
    import functools
    import operator

    from pyspark.sql import functions as F

    p = produced.dropDuplicates()
    probe_names = [f"__fix_seen_{i}" for i in range(len(cols))]
    t = total.select(*[F.col(c).alias(n) for c, n in zip(cols, probe_names)])
    cond = functools.reduce(
        operator.and_,
        [p[c].eqNullSafe(F.col(n)) for c, n in zip(cols, probe_names)],
    )
    return p.join(t, on=cond, how="leftanti")


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
        lambda produced, total: _anti_new_only(produced, total, cols),
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
        # one job per pass (r11): lazy checkpoint materialized by the
        # emptiness count, same as _run; the anti-join delta matches
        # subtract's NULL semantics via _anti_new_only
        delta = _anti_new_only(step(total).select(*cols), total, cols
                               ).localCheckpoint(eager=False)
        if delta.count() == 0:
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
