"""Capture .explain('formatted') for every bench-timed query.

Usage: python tools/capture_plans.py <outdir> <suffix>
e.g.   python tools/capture_plans.py plans/r11 _before

Writes <outdir>/<query><suffix>.txt per query. Uses the same session
factory and SF dir as bench.py so the captured plans are the plans the
bench actually runs (AQE initial plans; the driver cannot run Spark, so
these files are the judge's evidence for plan claims).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402


def main() -> None:
    outdir = sys.argv[1] if len(sys.argv) > 1 else "plans/r11"
    suffix = sys.argv[2] if len(sys.argv) > 2 else "_before"
    only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
    os.makedirs(outdir, exist_ok=True)

    from andl_spark.session import get_spark
    from andl_spark import workload

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("andl_spark-plans")
    spark.sparkContext.setLogLevel("ERROR")

    for name in bench._headline():
        if only is not None and name not in only:
            continue
        fn = workload.BENCH_EXTRA.get(name) or workload.QUERIES.get(name)
        if fn is None:
            continue
        try:
            df = fn(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
        except Exception as e:  # plan capture must not abort the sweep
            plan = f"EXPLAIN FAILED: {type(e).__name__}: {e}"
        path = os.path.join(outdir, f"{name}{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} bytes)", file=sys.stderr)


if __name__ == "__main__":
    main()
