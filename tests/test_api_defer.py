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


def test_dbix_cd_sample_app(spark):
    """Sample/DbixCdSample.andl end-to-end: build the artist/cd/track
    database with ord()-generated ids, store the query functions as
    named operators, and answer the sample queries through the served
    API."""
    from pyspark.sql import Window
    from andl_spark.api import AndlSession

    s = AndlSession(spark)
    ordw = Window.orderBy("name")

    artist = spark.createDataFrame(
        [("Michael Jackson",), ("Eminem",)], "name string"
    ).withColumn("artistid", F.row_number().over(Window.orderBy(F.lit(1))))
    cd_data = spark.createDataFrame(
        [("Thriller", "Michael Jackson"), ("Bad", "Michael Jackson"),
         ("The Marshall Mathers LP", "Eminem")], "title string, name string"
    ).withColumn("cdid", F.row_number().over(Window.orderBy(F.lit(1))))
    track_data = spark.createDataFrame(
        [("Beat It", "Thriller"), ("Billie Jean", "Thriller"),
         ("Dirty Diana", "Bad"), ("Smooth Criminal", "Bad"),
         ("Leave Me Alone", "Bad"), ("Stan", "The Marshall Mathers LP"),
         ("The Way I Am", "The Marshall Mathers LP")], "title string, cd string"
    ).withColumn("trackid", F.row_number().over(Window.orderBy(F.lit(1))))

    s.register("artist", artist)
    s.register("cd", cd_data.join(artist, "name").select("title", "cdid", "artistid"))
    s.register("track", track_data.join(
        s.table("cd").df.withColumnRenamed("title", "cd"), "cd"
    ).select("trackid", "title", "cdid"))

    s.define("get_tracks_by_cd", lambda t: (
        s.table("cd").df.filter(F.col("title") == t).select("cdid")
        .join(s.table("track").df, "cdid")
    ))
    s.define("get_cds_by_artist", lambda a: (
        s.table("artist").df.filter(F.col("name") == a).select("artistid")
        .join(s.table("cd").df, "artistid")
    ))

    bad_tracks = {r["title"] for r in s.call("get_tracks_by_cd", "Bad").df.collect()}
    assert bad_tracks == {"Dirty Diana", "Smooth Criminal", "Leave Me Alone"}
    mj_cds = {r["title"] for r in s.call("get_cds_by_artist", "Michael Jackson").df.collect()}
    assert mj_cds == {"Thriller", "Bad"}
