"""Catalog persistence parity — Test/SuiteUpdateCat1.andl writes
scalars, tuples, relations, a user type and OPERATORS under `#catalog
update`; SuiteUpdateCat2.andl opens the same catalog in a brand-new
session and asserts everything (including `def f(x) => ...` operators)
still evaluates. Reference: Catalog.cs stored operators.
"""

import re
from pathlib import Path

import pytest

from andl_spark.lang import AndlSession

REF = Path("/root/reference/Test")


def _asserts(path: Path) -> int:
    return len(re.findall(r"^\s*test_true\(", path.read_text(), re.MULTILINE))


def test_suite_update_cat_roundtrip(spark, tmp_path):
    cat = tmp_path / "andl_catalog"

    s1 = AndlSession(spark, REF, catalog_path=cat)
    s1.run_path(REF / "SuiteUpdateCat1.andl")
    assert s1.failures == []
    assert len(s1.tests) == _asserts(REF / "SuiteUpdateCat1.andl") == 14

    # BRAND-NEW session over the same catalog: everything recompiles
    s2 = AndlSession(spark, REF, catalog_path=cat)
    assert "def3" in s2.defs and "^detus" in s2.types
    s2.run_path(REF / "SuiteUpdateCat2.andl")
    assert s2.failures == []
    assert len(s2.tests) == _asserts(REF / "SuiteUpdateCat2.andl") == 13


def test_operator_roundtrip_minimal(spark, tmp_path):
    """An operator defined under #catalog update survives a new session
    and still drives Spark plans (not just scalar evaluation)."""
    cat = tmp_path / "cat"
    s1 = AndlSession(spark, catalog_path=cat)
    s1.run(
        "#catalog update\n"
        "def double_it(n:0) => n*2\n"
        "^saved := {{ A:=1 }, { A:=2 }, { A:=3 }}\n"
    )
    s2 = AndlSession(spark, catalog_path=cat)
    s2.run("r := ^saved .select{ B := double_it(A) }")
    got = sorted(r["B"] for r in s2.globals["r"].df.collect())
    assert got == [2.0, 4.0, 6.0]
