"""Driver-style correctness harness, runnable at ANY scale factor:
executes every declared query in __spark_entry__.queries() against its
oracle_sql() DuckDB twin over the same parquet dir and reports
rows/schema/value matches per query — the scale-rehearsal gate
(VERDICT r3 item 1: "run the full 50-query correctness harness at
sf1").

    python tools/oracle_check.py [sf_dir] [--sample N] [--keys k1,k2]

Prints one JSON line: {"sf_dir": ..., "n": 50, "pass": 50,
"fails": {...}}. Exit code 1 on any mismatch.
"""

from __future__ import annotations

import importlib.util
import json
import os
import sys
import time

import duckdb
import pandas as pd

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def _duck_views(con, sf_dir: str) -> None:
    for t in TABLES:
        path = f"{sf_dir}/{t}.parquet"
        if not os.path.exists(path):
            continue
        # driver layout = single file; generated dirs hold part files
        src = f"{path}/*.parquet" if os.path.isdir(path) else path
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{src}')")


def compare(sdf: pd.DataFrame, odf: pd.DataFrame) -> str | None:
    cols = sorted(sdf.columns)
    if cols != sorted(odf.columns):
        return f"schema {cols} vs {sorted(odf.columns)}"
    if len(sdf) != len(odf):
        return f"rows {len(sdf)} vs {len(odf)}"
    a = sdf[cols].sort_values(cols).reset_index(drop=True)
    b = odf[cols].sort_values(cols).reset_index(drop=True)
    for c in cols:
        av, bv = a[c], b[c]
        if pd.api.types.is_numeric_dtype(av) and pd.api.types.is_numeric_dtype(bv):
            # NULL masks must agree FIRST: one-sided nulls produce a NaN
            # diff that a bare fillna(0) would wave through
            fa, fb = av.astype(float), bv.astype(float)
            if not (fa.isna() == fb.isna()).all():
                return f"null pattern differs in {c}"
            # relative tolerance (numpy.isclose-style): at sf1+ scale
            # aggregate magnitudes make legitimate Spark-vs-DuckDB
            # double-rounding differences exceed any absolute epsilon
            diff = (fa - fb).abs().fillna(0)
            tol = 1e-9 * (1 + pd.concat([fa.abs(), fb.abs()], axis=1).max(axis=1).fillna(0))
            if not (diff <= tol).all():
                return f"values differ in {c} (max {diff.max()})"
        else:
            if not (av.isna() == bv.isna()).all():
                return f"null pattern differs in {c}"
            if not (av.astype(str).values == bv.astype(str).values).all():
                return f"values differ in {c}"
    return None


def main() -> None:
    positional: list[str] = []
    sample = None
    keys_only = None
    spark_only = False
    rowcap = None
    it = iter(sys.argv[1:])
    for a in it:
        # both --flag=value and --flag value are accepted; flags match
        # EXACTLY (a prefix like --samples must be an error, not a
        # misparse) and a missing value is a usage error, not a crash
        flag, _, inline = a.partition("=")
        if a == "--spark-only":
            # oracle-free path (VERDICT r4 item 2): at sf10 some DuckDB
            # twins are themselves super-linear (e.g. the embed-dup
            # bucket self-join) — this mode runs ONLY the Spark side,
            # recording per-query rows + wall time for the sf1→sf10
            # scale-factor table; correctness at sf10 comes from the
            # separate oracle pass over the DuckDB-tractable subset.
            spark_only = True
            continue
        if flag in ("--sample", "--keys", "--rowcap"):
            val = inline if inline else next(it, None)
            if val is None:
                raise SystemExit(f"{flag} requires a value")
            if flag == "--sample":
                sample = int(val)
            elif flag == "--rowcap":
                # results beyond this row count are checked as COUNT
                # vs the oracle's COUNT(*) instead of being collected:
                # a quadratic-BY-SPEC result (SPP Q6 co-located pairs
                # is ~200M rows at sf10) is computable distributed but
                # not driver-collectable — value-hashing it would test
                # the driver's heap, not the engine.
                rowcap = int(val)
            else:
                keys_only = val.split(",")
        elif a.startswith("--"):
            raise SystemExit(f"unknown flag {a}")
        else:
            positional.append(a)
    sf_dir = positional[0] if positional else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")

    from andl_spark.session import get_spark

    spark = get_spark("oracle-check")
    spark.sparkContext.setLogLevel("ERROR")

    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", os.path.join(REPO, "__spark_entry__.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    con = duckdb.connect()
    _duck_views(con, sf_dir)
    qs, osql = mod.queries(), mod.oracle_sql()
    keys = sorted(qs)
    if keys_only:
        keys = [k for k in keys if k in keys_only]
    if sample:
        import random

        random.seed(4)
        keys = random.sample(keys, min(sample, len(keys)))

    fails: dict[str, str] = {}
    times: dict[str, float] = {}
    nrows: dict[str, int] = {}
    for k in keys:
        try:
            t0 = time.monotonic()
            out = qs[k](spark, sf_dir)
            if rowcap is not None:
                # under-cap results: the limit probe IS the full single
                # execution, so its time is the query time. OVERSIZED
                # results: CollectLimit short-circuits after cap+1 rows
                # and its probe time means nothing on its own (review
                # r6) — record builder + probe + count cumulatively,
                # which reduces to the count execution for lazy plans
                # and to the (dominant) eager-builder cost for the
                # near-dup ops that localCheckpoint at build time.
                sdf = out.limit(rowcap + 1).toPandas()
                times[k] = round(time.monotonic() - t0, 3)
                if len(sdf) > rowcap:
                    n = out.count()
                    times[k] = round(time.monotonic() - t0, 3)
                    nrows[k] = n
                    if spark_only or k not in osql:
                        print(f"# {k}: rows-only ({n}, >cap) {times[k]}s",
                              file=sys.stderr)
                        continue
                    on = con.execute(
                        f"SELECT COUNT(*) FROM ({osql[k]})").fetchone()[0]
                    if n != on:
                        fails[k] = f"rowcount {n} vs oracle {on}"
                        print(f"# {k}: FAIL {fails[k]}", file=sys.stderr)
                    else:
                        print(f"# {k}: OK-COUNT ({n} rows, >cap) "
                              f"{times[k]}s", file=sys.stderr)
                    continue
            else:
                sdf = out.toPandas()
                times[k] = round(time.monotonic() - t0, 3)
            nrows[k] = len(sdf)
            if spark_only or k not in osql:
                print(f"# {k}: rows-only ({len(sdf)}) {times[k]}s",
                      file=sys.stderr)
                continue
            odf = con.execute(osql[k]).df()
            err = compare(sdf, odf)
            if err:
                fails[k] = err
                print(f"# {k}: FAIL {err}", file=sys.stderr)
            else:
                print(f"# {k}: OK ({len(sdf)} rows) {times[k]}s",
                      file=sys.stderr)
        except Exception as e:  # noqa: BLE001
            fails[k] = str(e)[:300]
            print(f"# {k}: ERROR {str(e)[:200]}", file=sys.stderr)
    print(json.dumps({
        "sf_dir": sf_dir, "n": len(keys), "pass": len(keys) - len(fails),
        "fails": fails, "times": times, "rows": nrows,
        "spark_only": spark_only,
    }))
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
