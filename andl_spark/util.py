"""Small shared utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_parallelism(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Repartition UP (round-robin) when the input has fewer partitions
    than the cluster has cores — e.g. a single unsplittable parquet
    file feeding a CPU-heavy stage (shingling, Pandas UDF signatures)
    would otherwise run on one core. Never repartitions down, and is a
    no-op for already-parallel inputs, so at production scale (many
    files/row-groups) it costs nothing."""
    sc = df.sparkSession.sparkContext
    target = min_partitions or sc.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
