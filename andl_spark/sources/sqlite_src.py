"""SQLite bridge — the reference's Andl.Sqlite backend, Spark-first.

The reference executes relational ops INSIDE SQLite via generated SQL
(Andl.Runtime/SqlGen.cs, Andl.Sqlite/; Sample/chinook.andl runs against
Sample/Chinook.sqlite). Here the roles invert: SQLite is a *source*,
Spark is the engine. Two paths:

* ``read_sqlite`` — driver-side ingest through Python's stdlib
  ``sqlite3`` (no sqlite-jdbc jar ships in this environment; the jar
  would make this a ``read_jdbc`` call instead). Appropriate for
  reference-sample-scale tables; the data crosses the driver once at
  load and every subsequent operation is distributed.
* ``copy_to_jdbc`` + ``sources.io.read_jdbc`` — the 100 TB-shaped path:
  once the data lives behind any JDBC URL (Derby ships with Spark and
  serves as the in-test stand-in for Postgres), reads are partitioned
  range scans across executors, never a single connection.
"""

from __future__ import annotations

import sqlite3

from pyspark.sql import DataFrame, SparkSession


def sqlite_tables(path: str) -> list[str]:
    with sqlite3.connect(path) as con:
        rows = con.execute(
            "SELECT name FROM sqlite_master WHERE type='table' ORDER BY name"
        ).fetchall()
    return [r[0] for r in rows]


def read_sqlite(spark: SparkSession, path: str, table: str) -> DataFrame:
    """One SQLite table → DataFrame (driver-side ingest, see module doc)."""
    import pandas as pd

    with sqlite3.connect(path) as con:
        pdf = pd.read_sql(f'SELECT * FROM "{table}"', con)
    # NaN-padded object columns confuse Arrow inference; normalize
    for c in pdf.columns:
        if pdf[c].dtype == object:
            pdf[c] = pdf[c].where(pdf[c].notna(), None)
    return spark.createDataFrame(pdf)


def copy_to_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    driver: str,
    mode: str = "overwrite",
) -> None:
    """Stage a DataFrame behind a JDBC URL (each partition writes over
    its own connection — distributed, no driver funnel)."""
    (
        df.write.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("driver", driver)
        .mode(mode)
        .save()
    )
