"""Parity with Sample/SPPsample1.andl — the classic CIS631 supplier
queries Q1-Q6 over the S/P/SP database, expressed through the Relation
fluent API exactly as the reference writes them (join / sub / ajoin /
rdivide / joinr / self-join-rename). Expected values derived by hand
from the reference CSVs (Test/S.csv, P.csv, SP.csv)."""

from pyspark.sql import functions as F

from andl_spark.operators import joins as J
from andl_spark.relation import Relation


def rel(spdb, name):
    return Relation(spdb[name])


def names(r):
    return sorted(row[0] for row in r.df.collect())


def test_q1_suppliers_of_p2(spdb):
    # (S join SP .where(P# = 'P2')) .select{ SNAME }
    s, sp = rel(spdb, "S"), rel(spdb, "SP")
    got = s.join(sp.where(F.col("P#") == "P2")).project("SNAME")
    assert names(got) == ["Blake", "Clark", "Jones", "Smith"]
    # set-membership form: S .where({{S#}} sub SP.where(P#='P2').select{S#})
    keep = [
        row["S#"]
        for row in spdb["S"].collect()
        if Relation(spdb["S"].filter(F.col("S#") == row["S#"]).select("S#")).sub(
            sp.where(F.col("P#") == "P2").project("S#")
        )
    ]
    assert sorted(keep) == ["S1", "S2", "S3", "S4"]


def test_q2_suppliers_of_red_parts(spdb):
    s, p, sp = rel(spdb, "S"), rel(spdb, "P"), rel(spdb, "SP")
    got = (
        s.project("S#", "SNAME")
        .join(sp.project("S#", "P#"))
        .join(p.project("P#", "COLOR"))
        .where(F.col("COLOR") == "Red")
        .project("SNAME")
    )
    assert names(got) == ["Clark", "Jones", "Smith"]


def test_q3_suppliers_not_supplying_p2(spdb):
    # (S ajoin SP .where(P# = 'P2')) .select{ SNAME }
    s, sp = rel(spdb, "S"), rel(spdb, "SP")
    got = s.antijoin(sp.where(F.col("P#") == "P2")).project("SNAME")
    assert names(got) == ["Adams"]


def test_q4_suppliers_of_all_parts(spdb):
    # relational divide: suppliers whose image over SP covers all of P
    s, p, sp = rel(spdb, "S"), rel(spdb, "P"), rel(spdb, "SP")
    got = sp.project("S#", "P#").rdivide(p.project("P#"))
    assert names(got) == ["S1"]
    assert names(s.semijoin(got).project("SNAME")) == ["Smith"]


def test_q5_suppliers_sharing_a_part_with_s2(spdb):
    # (S join SP .where(S#='S2')).select{P#} joinr SP .select{S#, P#}
    s, sp = rel(spdb, "S"), rel(spdb, "SP")
    p_of_s2 = s.join(sp.where(F.col("S#") == "S2")).project("P#")
    got = Relation(
        J.natural_join(p_of_s2.df, spdb["SP"].select("S#", "P#"), keep="right")
    ).project("S#")
    assert names(got) == ["S1", "S2", "S3", "S4"]


def test_q6_colocated_supplier_pairs(spdb):
    # (S .select{CITY, SA:=S#} join S .select{CITY, SB:=S#}).where(SA<SB).select{*CITY}
    a = Relation(spdb["S"].select("CITY", F.col("S#").alias("SA")))
    b = Relation(spdb["S"].select("CITY", F.col("S#").alias("SB")))
    got = (
        a.join(b)
        .where(F.col("SA") < F.col("SB"))
        .project("SA", "SB")
    )
    pairs = sorted(tuple(r) for r in got.df.collect())
    assert pairs == [("S1", "S4"), ("S2", "S3")]
