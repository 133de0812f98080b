"""Physical-plan assertions — the enforcement arm of the scale design
(SURVEY.md §4).

Instead of hoping Catalyst did the right thing, tests assert it:
filters/projections reached the parquet scan, small dims broadcast,
hot paths stayed inside WholeStageCodegen, no row-at-a-time Python
UDF snuck into a scan. A plan regression then fails CI, not a 100 TB
production run.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    """The text of df.explain('formatted') without printing it."""
    spark = df.sparkSession
    jvm = spark._jvm  # type: ignore[attr-defined]
    return jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")


def assert_pushed_filter(df: DataFrame, fragment: str) -> None:
    """The parquet scan must carry a pushed filter mentioning fragment."""
    plan = formatted_plan(df)
    scans = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
    assert any(fragment in s for s in scans), (
        f"no pushed filter containing {fragment!r}; scans: {scans}"
    )


def assert_read_schema_only(df: DataFrame, table_cols: set[str], allowed: set[str]) -> None:
    """Column pruning: the scan's ReadSchema must not exceed `allowed`."""
    plan = formatted_plan(df)
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", plan):
        cols = {c.split(":")[0].strip() for c in m.group(1).split(",") if c.strip()}
        if cols & table_cols:
            extra = (cols & table_cols) - allowed
            assert not extra, f"scan reads unnecessary columns: {extra}"


def assert_broadcast_join(df: DataFrame, min_count: int = 1) -> None:
    plan = formatted_plan(df)
    n = plan.count("BroadcastHashJoin") + plan.count("BroadcastNestedLoopJoin")
    assert n >= min_count, f"expected ≥{min_count} broadcast joins:\n{plan[:2000]}"


def assert_no_python_row_udf(df: DataFrame) -> None:
    """Arrow-batched (ArrowEvalPython) is the sanctioned Python path;
    row-at-a-time BatchEvalPython in a plan is a scale bug."""
    plan = formatted_plan(df)
    assert "BatchEvalPython" not in plan, "row-at-a-time Python UDF in plan"


def assert_whole_stage_codegen(df: DataFrame) -> None:
    """Formatted mode tags codegen'd operators with "[codegen id : N]" —
    but only once AQE has finalized THIS plan, so execute it (collect —
    count() would build and run a different query execution)."""
    df.collect()
    plan = formatted_plan(df)
    assert "codegen id" in plan, "no WholeStageCodegen spans in plan"


def _top_level_brackets(s: str) -> list[str]:
    """Split 'Arguments: [a], [b, [c]], [d]' into its top-level
    [...] groups (depth-aware — window exprs nest brackets)."""
    groups, depth, start = [], 0, -1
    for i, ch in enumerate(s):
        if ch == "[":
            if depth == 0:
                start = i
            depth += 1
        elif ch == "]":
            depth -= 1
            if depth == 0 and start >= 0:
                groups.append(s[start:i + 1])
                start = -1
    return groups


def global_windows(df: DataFrame) -> list[str]:
    """Arguments of every partition-less Window node in the plan.

    A Window node's formatted Arguments are [exprs], [partitionSpec],
    [orderSpec] — but EMPTY trailing specs are omitted from the text,
    so a partitioned-unordered window prints two groups and a grand
    total just one. A window is single-task iff it has no partition
    spec: three groups → partitioned; two groups → partitioned only
    when the second group is NOT a sort spec (sort items carry
    'NULLS FIRST/LAST'); one group → global. Global means upstream
    Exchange SinglePartition: every row funnels through ONE task —
    the textbook scale-killer."""
    plan = formatted_plan(df)
    hits = []
    for block in plan.split("\n\n"):
        lines = block.strip().splitlines()
        if not lines or not re.match(r"\(\d+\) Window\b", lines[0]):
            continue
        for ln in lines:
            if not ln.startswith("Arguments: "):
                continue
            groups = _top_level_brackets(ln)
            if len(groups) >= 3:
                continue  # explicit partition spec present
            if len(groups) == 2 and "NULLS" not in groups[1]:
                continue  # second group is a partition spec, order empty
            hits.append(ln[:300])
    return hits


def assert_no_global_window(df: DataFrame) -> None:
    """Headline queries must never sort all rows in one task: top-k is
    orderBy+limit (TakeOrderedAndProject — per-partition heap, driver
    merge), ordered folds partition by their group key."""
    hits = global_windows(df)
    assert not hits, f"partition-less Window in plan: {hits}"


def count_shuffles(df: DataFrame) -> int:
    """Exchange nodes in the physical plan (AQE may remove some at
    runtime; this is the static upper bound)."""
    return formatted_plan(df).count("Exchange")


def plan_report(df: DataFrame) -> dict:
    """Scale-posture summary of a plan — the numbers a reviewer checks
    before pointing a query at 100 TB. Static analysis (pre-AQE), so
    shuffle counts are upper bounds."""
    spark = df.sparkSession
    jvm = spark._jvm  # type: ignore[attr-defined]
    # "simple" mode prints the physical tree exactly once (formatted
    # mode repeats every operator in its detail section, double-counting)
    plan = jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "simple")
    fplan = formatted_plan(df)  # pushed-filter details only exist here
    return {
        "shuffles": len(re.findall(r"Exchange (?:hash|range)partitioning|Exchange SinglePartition", plan)),
        "broadcast_joins": plan.count("BroadcastHashJoin") + plan.count("BroadcastNestedLoopJoin"),
        "sortmerge_joins": plan.count("SortMergeJoin"),
        "pushed_filters": sum(
            1 for m in re.findall(r"PushedFilters: \[([^\]]*)\]", fplan) if m.strip()
        ),
        "scans": plan.count("Scan parquet"),
        "arrow_python": plan.count("ArrowEvalPython") + plan.count("FlatMapGroupsInPandas") + plan.count("MapInPandas"),
        "row_python_udf": plan.count("BatchEvalPython"),
        "single_partition_ops": plan.count("Exchange SinglePartition"),
    }
