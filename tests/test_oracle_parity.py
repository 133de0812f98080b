"""Mirror of the driver's correctness gate: every queries() entry with
an oracle must match DuckDB on row count, schema width, and exact
values (order-insensitive) at sf0.001."""

import numpy as np
import pandas as pd
import pytest

from andl_spark import workload

from conftest import SF_SMOKE


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns), ignore_index=True)


@pytest.mark.parametrize("name", sorted(workload.ORACLE))
def test_query_matches_oracle(spark, duck, name):
    got = _canon(workload.QUERIES[name](spark, SF_SMOKE).toPandas())
    want = _canon(duck.execute(workload.ORACLE[name]).fetchdf())
    assert list(got.columns) == list(want.columns), f"columns: {list(got.columns)} vs {list(want.columns)}"
    assert len(got) == len(want), f"row count: {len(got)} vs {len(want)}"
    for c in got.columns:
        g, w = got[c].to_numpy(), want[c].to_numpy()
        if np.issubdtype(g.dtype, np.floating) or np.issubdtype(w.dtype, np.floating):
            assert np.allclose(
                g.astype(float), w.astype(float), rtol=0, atol=1e-9, equal_nan=True
            ), f"float values differ in {c}"
        else:
            assert (g == w).all(), f"values differ in {c}: {g[:5]} vs {w[:5]}"


def test_entry_smoke(spark):
    import importlib.util, os, sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    spec = importlib.util.spec_from_file_location(
        "spark_entry", os.path.join(os.path.dirname(__file__), "..", "__spark_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    df = mod.entry(spark)
    assert df.count() >= 0
    assert set(mod.oracle_sql()) <= set(mod.queries())


def test_no_rows_only_queries_remain():
    """Since round 3 EVERY declared query has a DuckDB oracle (the
    former rows-only set — minhash/simhash/LSH/IVF/sudoku — became
    hash-checked via mirror constructions, literal solved grids, and
    driver-side decode oracles). Declaring a query without an oracle
    again should be a deliberate, visible decision."""
    assert set(workload.QUERIES) == set(workload.ORACLE)
    assert len(workload.QUERIES) == 50  # the driver's correctness budget
