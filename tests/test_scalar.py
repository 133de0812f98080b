"""Builtin scalar function parity (Builtin.cs semantics)."""

from pyspark.sql import functions as F

from andl_spark.functions import scalar as S


def _one(spark, col):
    return spark.range(1).select(col.alias("v")).first()["v"]


def test_text_functions(spark):
    lit = F.lit("Hello#World")
    assert _one(spark, S.left(lit, 5)) == "Hello"
    assert _one(spark, S.right(lit, 5)) == "World"
    # shorter than n pads to width n (Builtin.cs:926-930 PadLeft;
    # pinned by Test/SuiteBasic.andl:206 right(ss1,10))
    assert _one(spark, S.right(F.lit("ab"), 5)) == "   ab"
    assert _one(spark, S.left(F.lit("ab"), 5)) == "ab   "
    assert _one(spark, S.length(lit)) == 11
    assert _one(spark, S.tolower(lit)) == "hello#world"
    assert _one(spark, S.toupper(lit)) == "HELLO#WORLD"
    assert _one(spark, S.trim(F.lit("  x  "))) == "x"
    assert _one(spark, S.before(lit, "#")) == "Hello"
    assert _one(spark, S.after(lit, "#")) == "World"
    assert _one(spark, S.before(lit, "@")) == ""
    assert _one(spark, S.after(lit, "@")) == ""
    assert _one(spark, S.fill(F.lit("."), 3)) == "..."


def test_regex_match(spark):
    assert _one(spark, S.matches(F.lit("Blake"), "a.*k")) is True
    assert _one(spark, S.matches(F.lit("Jones"), "a.*k")) is False


def test_date_functions(spark):
    d = F.lit("2001-07-04 12:30:00").cast("timestamp")
    assert _one(spark, S.year(d)) == 2001
    assert _one(spark, S.month(d)) == 7
    assert _one(spark, S.day(d)) == 4
    assert _one(spark, S.daysdiff(F.lit("2001-07-10"), d)) == 6
    assert _one(spark, S.dateymd(F.lit(2001), F.lit(7), F.lit(4))).isoformat() == "2001-07-04"


def test_conversions(spark):
    assert _one(spark, S.to_number(F.lit("3.5"))) == 3.5
    assert _one(spark, S.to_text(F.lit(42))) == "42"
    assert _one(spark, S.to_bool(F.lit("true"))) is True
