"""Property-based algebraic laws of the relational operators
(hypothesis): the Third-Manifesto identities the reference's test
suites assert pointwise (SuiteRelDyadic/SuiteRelBasic), checked here
over generated relations.

Spark actions are expensive, so: small generated relations, few
examples, one shared SparkSession, and each law checked with set
semantics via Relation.equals (distributed emptiness probes).
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

from andl_spark.operators.joins import antijoin, compose, natural_join, semijoin
from andl_spark.operators import setops as SO
from andl_spark.operators.divide import rdivide
from andl_spark.relation import Relation

rows = st.lists(
    st.tuples(st.integers(0, 4), st.integers(0, 3)), min_size=0, max_size=12
)

SETTINGS = settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)


def _rel(spark, data, cols="x int, y int"):
    if not data:
        return spark.createDataFrame([], cols)
    return spark.createDataFrame(data, cols)


@SETTINGS
@given(a=rows, b=rows)
def test_union_commutes_intersect_distributes(spark, a, b):
    ra, rb = _rel(spark, a), _rel(spark, b)
    assert Relation(SO.union(ra, rb)).equals(Relation(SO.union(rb, ra)))
    assert Relation(SO.intersect(ra, rb)).equals(Relation(SO.intersect(rb, ra)))


@SETTINGS
@given(a=rows, b=rows)
def test_minus_symdiff_laws(spark, a, b):
    ra, rb = _rel(spark, a), _rel(spark, b)
    # A = (A - B) ∪ (A ∩ B)
    lhs = SO.union(SO.minus(ra, rb), SO.intersect(ra, rb))
    assert Relation(lhs).equals(Relation(ra.dropDuplicates()))
    # symdiff = (A-B) ∪ (B-A)
    sd = SO.union(SO.minus(ra, rb), SO.minus(rb, ra))
    assert Relation(SO.symdiff(ra, rb)).equals(Relation(sd))


@SETTINGS
@given(a=rows, b=rows)
def test_semijoin_antijoin_partition(spark, a, b):
    """semijoin(A,B) ∪ antijoin(A,B) = A — every row matches or not."""
    ra = _rel(spark, a)
    rb = _rel(spark, b, "y int, z int")
    parts = semijoin(ra, rb).unionByName(antijoin(ra, rb))
    assert Relation(parts).equals(Relation(ra.dropDuplicates()))


@SETTINGS
@given(a=rows, b=rows)
def test_natural_join_commutes(spark, a, b):
    ra = _rel(spark, a)
    rb = _rel(spark, b, "y int, z int")
    ab = natural_join(ra, rb)
    ba = natural_join(rb, ra)
    assert Relation(ab).equals(Relation(ba.select(*ab.columns)))


@SETTINGS
@given(a=rows)
def test_rdivide_by_full_image_is_reflexive(spark, a):
    """r ÷ π_y(r) keeps exactly the x whose image is ALL y values of r."""
    ra = _rel(spark, a).dropDuplicates()
    div = ra.select("y").dropDuplicates()
    got = rdivide(ra, div)
    total = div.count()
    want = (
        ra.groupBy("x").agg(F.countDistinct("y").alias("n"))
        .filter(F.col("n") == total).select("x")
    )
    assert Relation(got).equals(Relation(want))


@SETTINGS
@given(a=rows, b=rows)
def test_compose_is_join_minus_common(spark, a, b):
    ra = _rel(spark, a)
    rb = _rel(spark, b, "y int, z int")
    keep = [c for c in ("x", "z")]
    direct = compose(ra, rb)
    via_join = natural_join(ra, rb).select(*keep).dropDuplicates()
    assert Relation(direct).equals(Relation(via_join))
