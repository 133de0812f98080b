"""Stage-level profile of one bench query via the Spark UI REST API.

Deterministic counters (job/stage/task counts, shuffle bytes, input
bytes) are the trustworthy evidence on this container (REPRO.md) —
this tool prints them per stage for one query, plus wall-clock.

Usage:
  SPARK_GRAFT_SF_DIR=... python tools/profile_query.py q3_shipping_priority [--cold]

Runs the query once as warm-up (unless --cold), then once measured;
prints every job/stage of the measured run: task count, executor
run/CPU time, input bytes, shuffle read/write bytes.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _get(base: str, path: str):
    with urllib.request.urlopen(base + path) as r:
        return json.loads(r.read())


def main() -> None:
    name = sys.argv[1]
    cold = "--cold" in sys.argv
    os.environ.setdefault("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf_dir = os.environ["SPARK_GRAFT_SF_DIR"]

    from pyspark.sql import SparkSession

    from andl_spark.session import get_spark  # noqa: F401 (confs doc)
    from andl_spark import workload

    master = (os.environ.get("SPARK_MASTER")
              or f"local[{os.environ.get('SPARK_GRAFT_CPUS', '*')}]")
    spark = (
        SparkSession.builder.master(master)
        .appName("andl_spark-profile")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions",
                os.environ.get("ANDL_SHUFFLE_PARTITIONS", "32"))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("ANDL_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "true")
        .config("spark.ui.port", "4057")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    base = f"http://localhost:{spark.sparkContext.uiWebUrl.rsplit(':', 1)[1]}/api/v1"
    app_id = spark.sparkContext.applicationId

    fn = workload.BENCH_EXTRA.get(name) or workload.QUERIES[name]
    if not cold:
        fn(spark, sf_dir).count()  # warm-up: JVM, footers, codegen

    jobs_before = {j["jobId"] for j in _get(base, f"/applications/{app_id}/jobs")}

    spark.sparkContext.setJobDescription(f"profile:{name}")
    t0 = time.perf_counter()
    df = fn(spark, sf_dir)
    t_build = time.perf_counter() - t0
    n = df.count()
    t_total = time.perf_counter() - t0
    spark.sparkContext.setJobDescription(None)

    jobs = [j for j in _get(base, f"/applications/{app_id}/jobs")
            if j["jobId"] not in jobs_before]
    stage_ids = sorted({s for j in jobs for s in j["stageIds"]})
    stages = {s["stageId"]: s
              for s in _get(base, f"/applications/{app_id}/stages")
              if s["stageId"] in stage_ids}

    print(f"query={name} rows={n} wall={t_total:.3f}s "
          f"(plan build {t_build:.3f}s) jobs={len(jobs)} "
          f"stages={len(stage_ids)}")
    print(f"{'stage':>6} {'tasks':>5} {'run_ms':>8} {'cpu_ms':>8} "
          f"{'input':>10} {'sh_read':>10} {'sh_write':>10}  name")
    tot = dict(run=0, cpu=0, inp=0, sr=0, sw=0, tasks=0)
    for sid in stage_ids:
        s = stages.get(sid)
        if s is None:
            continue
        run = s.get("executorRunTime", 0)
        cpu = s.get("executorCpuTime", 0) // 1_000_000
        inp = s.get("inputBytes", 0)
        sr = s.get("shuffleReadBytes", 0)
        sw = s.get("shuffleWriteBytes", 0)
        nt = s.get("numTasks", 0)
        tot["run"] += run; tot["cpu"] += cpu; tot["inp"] += inp
        tot["sr"] += sr; tot["sw"] += sw; tot["tasks"] += nt
        print(f"{sid:>6} {nt:>5} {run:>8} {cpu:>8} {inp:>10} {sr:>10} "
              f"{sw:>10}  {s.get('name', '')[:60]}")
    print(f"{'TOTAL':>6} {tot['tasks']:>5} {tot['run']:>8} {tot['cpu']:>8} "
          f"{tot['inp']:>10} {tot['sr']:>10} {tot['sw']:>10}")
    print(f"# executor core-seconds: run={tot['run']/1000:.2f} "
          f"cpu={tot['cpu']/1000:.2f}; wall {t_total:.3f}s")
    for j in jobs:
        print(f"# job {j['jobId']}: {j.get('numTasks', 0)} tasks, "
              f"{j.get('status')}, desc={str(j.get('description'))[:70]}")


if __name__ == "__main__":
    main()
