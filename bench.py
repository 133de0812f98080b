"""Benchmark headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

Prints ONE JSON line:
  {"metric": "...", "value": total_sec, "unit": "sec",
   "queries": {name: sec, ...}, "sf": 0.1}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from andl_spark.session import get_spark  # noqa: E402
from andl_spark import workload  # noqa: E402

# r3 renames vs the r1/r2 bench history (BASELINE.md maps them):
#   q_join_natural retired (its join shape is inside q3);
#   q_repetition_filter folded into q_text_quality;
#   q_corpus_stats + q_source_mixture merged into q_corpus_profile.
HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier",
    "q10_returned_items",
    "q14_promo_revenue",
    "q18_large_orders",
    "q_text_quality",
    "q_top_ngrams",
    "q_agg_fold",
    "q_topk_orders",  # formerly timed as q_window_grouped (same plan)
    "q_window_running",
    "q_rdivide",
    "q_image_agg",
    "q_while_closure",
    "q_nest_unnest",
    "q_clean_corpus",
    "q_train_split",
    "q_corpus_profile",
    # new in r3 — no r1 anchor in BASELINE.md (noted there):
    "q_asof_join",
    "q_decontaminate",
    "q_pii_scrub",
]
# pipeline + events headliners (self-registered in workload).
# Excluded from timing: q_recall_gauges (a correctness gauge that
# re-runs the exact baselines on purpose) and the md5 ORACLE-PARITY
# twins q_dedup_minhash/q_dedup_simhash — the production xxhash64
# paths are timed instead via workload.BENCH_EXTRA
# (q_dedup_*_prod; r1's numbers were the fast-hash implementation,
# so BASELINE.md maps r1 q_dedup_minhash -> q_dedup_minhash_prod).
_EXCLUDE = {"q_dedup_minhash", "q_dedup_simhash"}
HEADLINE += [
    name for name in workload.QUERIES
    if name.startswith(("q_dedup", "q_ann", "q_lang", "q_token", "q_ngram", "q_events"))
    and name not in _EXCLUDE
]
HEADLINE += list(workload.BENCH_EXTRA)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)
    spark = get_spark("andl_spark-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Warm-up: JVM + parquet footer caches, one full scan.
    workload.QUERIES["q1_pricing_summary"](spark, sf_dir).collect()

    times: dict[str, float] = {}
    for name in HEADLINE:
        fn = workload.QUERIES.get(name) or workload.BENCH_EXTRA.get(name)
        if fn is None:
            continue
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        n = df.count()  # forces full execution; results stay distributed
        times[name] = round(time.perf_counter() - t0, 3)
        print(f"# {name}: {times[name]}s ({n} rows)", file=sys.stderr)

    print(json.dumps({
        "metric": "headline query wall-clock at sf",
        "value": round(sum(times.values()), 3),
        "unit": "sec",
        "queries": times,
        "sf": sf,
    }))


if __name__ == "__main__":
    main()
