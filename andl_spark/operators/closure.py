"""Transitive closure by path doubling — the log-round complement to
the general `.while()` fixpoint.

Andl expresses reachability as a user-written `.while()` step
(Sample/recursive.andl; our operators/whileop.py runs it semi-naive),
which needs one round PER PATH LENGTH: a depth-1000 dependency chain
costs 1000 sequential Spark jobs, and at cluster scale the per-round
scheduling latency — not data volume — dominates.

For the specific (and most common) recursive query, reachability over
an edge relation, the classic path-doubling algorithm squares the
reachable-path length every round: after round k, every path of
length ≤ 2^k is known, so convergence takes ⌈log₂ diameter⌉ rounds.
Each round is one self-equi-join plus a distinct — both plain
shuffles on the join key, no driver data, AQE-coalesced. This is the
same frontier-vs-doubling trade Datalog engines make; Spark's
per-round fixed cost makes doubling decisively better for deep
graphs (the 256-deep chain: 8 rounds instead of 256).

`fixpoint` remains the general operator for arbitrary step
expressions; this one is the closure fast path (the workload's
`q_while_closure` keeps demonstrating `.while()` itself).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def transitive_closure(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iterations: int = 40,
    stats: dict | None = None,
) -> DataFrame:
    """All (src, dst) pairs where dst is reachable from src over one
    or more edges. Output heading = (src, dst), distinct.

    Path doubling: paths_{k+1} = paths_k ∪ (paths_k ⋈ paths_k), so the
    known-path length doubles each round — ⌈log₂ diameter⌉ rounds
    total, each one key-shuffle join + one distinct, every
    intermediate localCheckpoint'ed (flat lineage, nothing recomputed).
    ``stats['rounds']`` reports rounds used when a dict is passed."""
    paths = (
        edges.select(F.col(src).alias("s"), F.col(dst).alias("d"))
        .filter(F.col(src).isNotNull() & F.col(dst).isNotNull())
        .distinct()
        .localCheckpoint(eager=True)
    )
    n = paths.count()
    rounds = 0
    for _ in range(max_iterations):
        doubled = (
            paths.alias("a")
            .join(paths.alias("b"), F.col("a.d") == F.col("b.s"))
            .select(F.col("a.s").alias("s"), F.col("b.d").alias("d"))
        )
        grown = (
            paths.unionByName(doubled).distinct().localCheckpoint(eager=True)
        )
        rounds += 1
        m = grown.count()
        if m == n:
            if stats is not None:
                stats["rounds"] = rounds
            return grown.select(F.col("s").alias(src), F.col("d").alias(dst))
        paths, n = grown, m
    raise RuntimeError(
        f"transitive_closure did not converge in {max_iterations} rounds")
