"""Alternated same-session tree-vs-tree A/B (the REPRO.md protocol).

Single-shot suites taken hours apart measure which run hit a container
noise burst, not which tree is faster. This tool answers the tree
question directly: it imports TWO checkouts' `andl_spark` packages in
one process, builds ONE SparkSession, and alternates timed invocations
A,B,A,B,... per query so a burst degrades both trees equally.

Usage:
  git worktree add --detach /tmp/ab_old <old_ref>
  python tools/ab_trees.py /tmp/ab_old [new_tree=repo root] \
      [--queries q1,q2,...] [--reps N] [--out ABTREES_rN.json]

Timing methodology matches bench.py: wall-clock around build + count()
per invocation. Reported per query: every raw sample, median and MIN
per side, and the old/new ratio on the mins (the burst-robust
estimator, REPRO.md).

Import isolation: each tree's `andl_spark.*` modules are imported once
under that tree's sys.path and then *removed* from sys.modules; at
call time the invoking tree's module dict is re-installed so any
late/package-relative import inside operator code resolves to the
right tree. Both trees share the one SparkSession/JVM.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time


def _snapshot() -> dict:
    return {k: v for k, v in list(sys.modules.items())
            if k.split(".")[0] == "andl_spark"}


def _clear() -> None:
    for k in list(sys.modules):
        if k.split(".")[0] == "andl_spark":
            del sys.modules[k]


class Tree:
    """One checkout's workload, importable side by side with another."""

    def __init__(self, path: str, tag: str):
        self.path = os.path.abspath(path)
        self.tag = tag
        saved = _snapshot()
        _clear()
        sys.path.insert(0, self.path)
        try:
            import andl_spark.workload  # noqa: F401
            self.mods = _snapshot()
            self.workload = sys.modules["andl_spark.workload"]
            self.session = sys.modules["andl_spark.session"]
        finally:
            sys.path.remove(self.path)
            _clear()
            sys.modules.update(saved)
        wl = self.workload
        self.queries = dict(getattr(wl, "QUERIES", {}))
        self.queries.update(getattr(wl, "BENCH_EXTRA", {}))

    def run(self, name: str, spark, sf_dir: str) -> tuple[float, int]:
        """Timed build+count of one query under this tree's modules."""
        fn = self.queries[name]
        saved = _snapshot()
        _clear()
        sys.modules.update(self.mods)
        try:
            t0 = time.perf_counter()
            n = fn(spark, sf_dir).count()
            return round(time.perf_counter() - t0, 3), n
        finally:
            _clear()
            sys.modules.update(saved)


def main() -> None:
    args = sys.argv[1:]
    if not args:
        raise SystemExit(__doc__)
    old_path = args[0]
    new_path = args[1] if len(args) > 1 and not args[1].startswith("--") else (
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

    def _opt(flag: str, default: str | None) -> str | None:
        return args[args.index(flag) + 1] if flag in args else default

    reps = int(_opt("--reps", "3"))
    out_path = _opt("--out", None)
    only = _opt("--queries", None)

    old = Tree(old_path, "old")
    new = Tree(new_path, "new")

    # One session, built by the NEW tree's factory (env-driven master,
    # same confs bench.py uses); both trees' queries run on it.
    spark = new.session.get_spark("andl_spark-abtrees")
    spark.sparkContext.setLogLevel("ERROR")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    if only:
        names = [q.strip() for q in only.split(",")]
    else:
        names = [n for n in new.queries
                 if n in old.queries and n != "q_recall_gauges"]
    missing = [n for n in names if n not in old.queries or n not in new.queries]
    if missing:
        raise SystemExit(f"not in both trees: {missing}")

    # Warm-up both trees once (JVM, parquet footers) outside timing.
    for tree in (old, new):
        tree.run(names[0], spark, sf_dir)

    samples: dict[str, dict[str, list[float]]] = {
        n: {"old": [], "new": []} for n in names}
    rows_seen: dict[str, dict[str, int]] = {n: {} for n in names}
    for rep in range(reps):
        for name in names:
            for tree in (old, new):  # strict alternation per query
                sec, nrows = tree.run(name, spark, sf_dir)
                samples[name][tree.tag].append(sec)
                rows_seen[name][tree.tag] = nrows
            print(f"# rep {rep + 1} {name}: old={samples[name]['old'][-1]}s "
                  f"new={samples[name]['new'][-1]}s", file=sys.stderr)

    result = {
        "protocol": "alternated same-session tree A/B (REPRO.md)",
        "old_tree": old.path,
        "new_tree": new.path,
        "sf_dir": sf_dir,
        "cpus": os.environ.get("SPARK_GRAFT_CPUS", "*"),
        "reps": reps,
        "queries": {},
    }
    tot_old = tot_new = 0.0
    for name in names:
        o, nw = samples[name]["old"], samples[name]["new"]
        q = {
            "old_runs": o, "new_runs": nw,
            "old_median": round(statistics.median(o), 3),
            "new_median": round(statistics.median(nw), 3),
            "old_min": round(min(o), 3), "new_min": round(min(nw), 3),
            "speedup_min": round(min(o) / min(nw), 3) if min(nw) else None,
            "rows": rows_seen[name],
        }
        if rows_seen[name].get("old") != rows_seen[name].get("new"):
            q["ROWCOUNT_MISMATCH"] = True
        tot_old += min(o)
        tot_new += min(nw)
        result["queries"][name] = q
    result["total_old_min"] = round(tot_old, 3)
    result["total_new_min"] = round(tot_new, 3)
    result["total_speedup_min"] = round(tot_old / tot_new, 3) if tot_new else None

    text = json.dumps(result, indent=1)
    if out_path:
        with open(out_path, "w") as f:
            f.write(text + "\n")
        print(f"wrote {out_path}", file=sys.stderr)
    print(text)


if __name__ == "__main__":
    main()
