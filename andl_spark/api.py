"""AndlSession — the application-facing session, Andl's served-API
parity (Andl.Server / Andl.Thrift / Andl.Gateway re-expressed).

The reference exposes compiled catalog operators over Thrift/REST so
any client platform can call the data model. Spark-first equivalent:
a session that binds a persistent Catalog plus named, parameterized
query functions, all callable through one object — and because it's
plain SparkSession underneath, the same surface serves over Spark
Connect (`sc://host`) to remote clients with zero code change.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from .relation import Relation
from .sources.catalog import Catalog


class AndlSession:
    def __init__(self, spark: SparkSession, catalog_path: str | None = None):
        self.spark = spark
        self.catalog = Catalog(spark, catalog_path) if catalog_path else None
        if self.catalog:
            self.catalog.register_views()
        self._ops: dict[str, Callable[..., DataFrame]] = {}

    # ---- data model ---------------------------------------------------
    def register(self, name: str, df: DataFrame) -> None:
        """Expose a DataFrame to sql() by name (temp view)."""
        df.createOrReplaceTempView(name)

    def table(self, name: str) -> Relation:
        return Relation(self.spark.table(name))

    def sql(self, query: str) -> Relation:
        """Relational queries over every registered/catalog view."""
        return Relation(self.spark.sql(query))

    # ---- operators (Catalog.cs stored operators) ----------------------
    def define(self, name: str, fn: Callable[..., DataFrame]) -> None:
        """Store a named operator — Andl `def f(args) => ...` persisted
        in the catalog; here a Python callable returning a DataFrame."""
        self._ops[name] = fn

    def call(self, name: str, *args, **kwargs) -> Relation:
        try:
            fn = self._ops[name]
        except KeyError:
            raise KeyError(f"no operator {name!r}; defined: {sorted(self._ops)}") from None
        return Relation(fn(*args, **kwargs))

    def operators(self) -> list[str]:
        """Builtin.cs `Operators()` introspection."""
        return sorted(self._ops)

    def variables(self) -> list[str]:
        """Builtin.cs `Variables()`: visible relvars/views."""
        return sorted(t.name for t in self.spark.catalog.listTables())
