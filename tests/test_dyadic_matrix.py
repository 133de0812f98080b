"""Reference parity: the count/degree matrix of Test/SuiteRelDyadic.andl
(lines 14-48) asserted 1:1 over the same S/P/SP supplier data, plus
SuiteRelDyadic's where-clause set-op block and the cross-join case."""

import pytest

from andl_spark.operators import joins as J
from andl_spark.operators import setops as SO
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def spsp(spdb):
    return spdb["S"], spdb["P"], spdb["SP"]


# (fn, kwargs, expected_count, expected_degree) — SuiteRelDyadic.andl:14-48
def test_join_variants(spsp):
    S, P, SP = spsp
    cases = [
        (J.natural_join(S, SP, "all"), 12, 6),    # join
        (J.natural_join(S, SP, "left"), 4, 3),    # joinl
        (J.natural_join(S, SP, "right"), 9, 2),   # joinr
        (J.natural_join(S, SP, "leftc"), 4, 4),   # joinlc
        (J.natural_join(S, SP, "lr"), 12, 5),     # joinlr (compose)
        (J.natural_join(S, SP, "cr"), 12, 3),     # joincr
        (J.antijoin(S, SP), 1, 4),                # ajoin
        (J.antijoin_trimmed(S, SP), 1, 3),        # ajoinl
        (J.antijoin(SP, S), 0, 3),                # rajoin
        (J.antijoin_trimmed(SP, S), 0, 2),        # rajoinr
        (SO.minus(S, SP), 1, 1),                  # minus
        (SO.intersect(S, SP), 4, 1),              # intersect
        (SO.rminus(S, SP), 0, 1),                 # rminus
        (SO.symdiff(S, SP), 1, 1),                # symdiff
        (SO.union(S, SP), 5, 1),                  # union
    ]
    for i, (df, n, deg) in enumerate(cases):
        assert df.count() == n, f"case {i}: count {df.count()} != {n}"
        assert len(df.columns) == deg, f"case {i}: degree {len(df.columns)} != {deg}"


def test_where_setops(spsp):
    """SuiteRelDyadic.andl:50-62."""
    _, P, _ = spsp
    sr = P.filter(F.col("COLOR") == "Red")
    snr = P.filter(F.col("PNAME") == "Screw")
    assert sr.count() == 3 and snr.count() == 2
    assert SO.minus(sr, snr).count() == 2
    assert SO.intersect(sr, snr).count() == 1
    assert SO.rminus(sr, snr).count() == 1
    assert SO.symdiff(sr, snr).count() == 3
    assert SO.union(sr, snr).count() == 4


def test_ajoin_select_and_cross(spsp):
    """SuiteRelDyadic.andl:64-66."""
    S, P, SP = spsp
    # {{SNAME:='Adams'}} = (S ajoin SP.where(P#='P2')).select{SNAME}
    res = (
        J.antijoin(S, SP.filter(F.col("P#") == "P2"))
        .select("SNAME").dropDuplicates().collect()
    )
    assert [r[0] for r in res] == ["Adams"]
    # cross join via no common attributes: 5 * 6 = 30
    cross = J.natural_join(
        S.select("S#").dropDuplicates(), P.select("P#").dropDuplicates()
    )
    assert cross.count() == 30


def test_rdivide_reference(spsp):
    """sample3.andl image/divide: suppliers supplying all of {P1, P2}."""
    from andl_spark.operators.divide import rdivide

    S, P, SP = spsp
    divisor = P.filter(F.col("P#").isin("P1", "P2")).select("P#")
    got = sorted(r[0] for r in rdivide(SP.select("S#", "P#"), divisor).collect())
    assert got == ["S1", "S2"]


def test_image_agg_zero_preserving(spsp):
    """sample3.andl:45 — S5 supplies nothing and must appear with 0."""
    from andl_spark.operators.divide import image_agg

    S, P, SP = spsp
    out = image_agg(
        S.select("S#"),
        SP,
        {"parts": F.count("P#"), "qtys": F.coalesce(F.sum("QTY"), F.lit(0.0))},
    )
    rows = {r["S#"]: (r["parts"], r["qtys"]) for r in out.collect()}
    assert rows["S1"] == (6, 1300.0)
    assert rows["S5"] == (0, 0.0)
