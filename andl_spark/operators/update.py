"""Relvar update semantics — Andl `update` (insert / delete / update).

Reference: Sample/sample3.andl §Updates —
  insert:  ``update S union rel``            (union of same heading)
  delete:  ``update S .where(p) .select{}``  (remove matching rows)
  update:  ``update S .where(p) .select{* c := e}``

Andl mutates its in-memory/catalog relvar. Spark DataFrames are
immutable, so a Relvar holds the *current* DataFrame and swaps it on
each mutation — same observable semantics, and each new state is a
plain DataFrame any query can use. All three mutations are expressed
as declarative plans (union/antijoin/conditional projection), never
row-at-a-time, so they scale like any other join/agg.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame


class Relvar:
    """A named, mutable relation variable with set semantics."""

    def __init__(self, df: DataFrame, name: str = "relvar"):
        self.name = name
        self.df = df.dropDuplicates()

    def insert(self, rows: DataFrame) -> "Relvar":
        """``update r union rows`` — set union, same heading."""
        if sorted(rows.columns) != sorted(self.df.columns):
            raise ValueError(f"heading mismatch: {rows.columns} vs {self.df.columns}")
        self.df = self.df.unionByName(rows).dropDuplicates()
        return self

    def delete(self, predicate: Column) -> "Relvar":
        """``update r .where(p) .select{}`` — remove matching rows."""
        self.df = self.df.filter(~predicate)
        return self

    def update(self, predicate: Column, assignments: dict[str, Column]) -> "Relvar":
        """``update r .where(p) .select{* c := e}`` — transform matching
        rows in place; expressed as one conditional projection (single
        scan, no join)."""
        from pyspark.sql import functions as F

        cols = {
            c: F.when(predicate, assignments[c]).otherwise(F.col(c)).alias(c)
            if c in assignments
            else F.col(c)
            for c in self.df.columns
        }
        self.df = self.df.select(*cols.values()).dropDuplicates()
        return self

    def transact(self, *ops: Callable[["Relvar"], None]) -> "Relvar":
        """Apply several mutations; roll back to the prior state if any
        raises (snapshot = the old immutable DataFrame — free)."""
        snapshot = self.df
        try:
            for op in ops:
                op(self)
        except Exception:
            self.df = snapshot
            raise
        return self
