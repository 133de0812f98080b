"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  — flagship query at sf0.001 (smoke check)
queries()     — every implemented operator from SURVEY.md §2
oracle_sql()  — DuckDB-equivalent SQL per query (correctness gate)
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# The driver may exec this file from any cwd; make the repo importable.
_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from andl_spark import workload  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1 pricing summary) on /root/testdata/sf0.001."""
    return workload.QUERIES["q1_pricing_summary"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(workload.QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(workload.ORACLE)
