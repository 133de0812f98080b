"""AndlSession served-API parity + deferred-evaluation semantics
(SuiteDefer.andl): Andl's def/=> map onto Python callables over lazy
DataFrames, which ARE deferred evaluation."""

import pytest
from pyspark.sql import functions as F

from andl_spark.api import AndlSession


@pytest.fixture()
def session(spark, spdb):
    s = AndlSession(spark)
    s.register("S", spdb["S"])
    s.register("SP", spdb["SP"])
    return s


def test_sql_over_registered(session):
    out = session.sql("SELECT CITY, COUNT(*) AS n FROM S GROUP BY CITY")
    assert {(r["CITY"], r["n"]) for r in out.df.collect()} == {
        ("London", 2), ("Paris", 2), ("Athens", 1)
    }


def test_stored_operator(session):
    # Andl: def supplies_of(city:text) => S .where(CITY = city) join SP
    session.define(
        "supplies_of",
        lambda city: session.sql(
            f"SELECT SP.* FROM S JOIN SP ON S.`S#` = SP.`S#` WHERE CITY = '{city}'"
        ).df,
    )
    assert session.call("supplies_of", "London").count() == 9
    assert "supplies_of" in session.operators()
    assert {"s", "sp"} <= {v.lower() for v in session.variables()}


def test_deferred_reflects_updates(session, spark):
    """SuiteDefer.andl:10-15 — a deferred expression sees later variable
    states. Lazy DataFrames + temp views give the same semantics."""
    session.define("n_suppliers", lambda: session.sql("SELECT COUNT(*) AS n FROM S").df)
    assert session.call("n_suppliers").df.first()["n"] == 5
    # rebind S (Andl := assignment) — the deferred op sees the new value
    session.register("S", session.sql("SELECT * FROM S WHERE CITY = 'Paris'").df)
    assert session.call("n_suppliers").df.first()["n"] == 2


def test_recursive_scalar_function(spark):
    """SuiteDefer.andl fact(6)=720 — scalar recursion is driver-side
    Python (not data-parallel work)."""
    def fact(n: int) -> int:
        return 1 if n <= 1 else n * fact(n - 1)

    assert fact(6) == 720
    # and the data-parallel twin: product fold over seq
    from andl_spark import Relation
    from andl_spark.functions.fold import fold

    prod = (
        Relation.seq(spark, 6, "n").extend(n=F.col("n") + 1)
        .fold_all(f=fold("*", "n")).scalar()
    )
    assert prod == 720
