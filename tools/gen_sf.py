"""Scale-up generator: derive an sf-N dataset from an existing sf dir
by replicating every table K times with consistent key offsets, so
referential integrity (customer→orders→lineitem, part/supplier→
lineitem, nation→customer/supplier) and per-key distributions are
preserved exactly. Deterministic — no randomness, same output every
run.

    python tools/gen_sf.py /root/testdata/sf0.1 /tmp/testdata_sf1 10

Design notes (scale rehearsal, VERDICT r3 item 1):
- every BIGINT key column shifts by copy*STRIDE with ONE global
  stride, so cross-table joins stay valid without per-table bookkeeping
- region/nation are fixed dimensions at every TPC-H scale factor —
  copied through unchanged
- document text gets a per-copy suffix token: copies are NEAR-dups of
  each other (realistic templated-web-text shape) instead of 10-way
  EXACT dups, so exact-dedup density stays sane while near-dup
  operators see real clusters
- embeddings perturb one coordinate per copy (deterministic):
  ANN/near-dup structure per copy mirrors the original instead of
  degenerating into identical vectors
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F  # noqa: E402

from andl_spark.session import get_spark, load_tables  # noqa: E402

STRIDE = 100_000_000  # > any key at the target scale; one global offset

#: table → columns that shift by copy*STRIDE (keys + foreign keys)
KEYED = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
FIXED_DIMS = ["region", "nation"]


def scale_table(df: DataFrame, name: str, factor: int) -> DataFrame:
    copies = df.sparkSession.range(factor).withColumnRenamed("id", "__copy")
    out = df.crossJoin(F.broadcast(copies))
    for col in KEYED.get(name, []):
        out = out.withColumn(col, F.col(col) + F.col("__copy") * F.lit(STRIDE))
    if name == "documents":
        # per-copy suffix: near-dup clusters across copies, not exact
        out = out.withColumn(
            "text",
            F.when(F.col("__copy") == 0, F.col("text")).otherwise(
                F.concat(F.col("text"), F.lit(" rev"), F.col("__copy"))),
        ).withColumn(
            "n_chars",
            F.when(F.col("__copy") == 0, F.col("n_chars"))
            .otherwise(F.length("text").cast("long")),
        )
    if name == "embeddings":
        out = out.withColumn(
            "embedding",
            F.transform(
                "embedding",
                lambda x, i: F.when(
                    i == 0, x + F.col("__copy").cast("float") * F.lit(0.001)
                ).otherwise(x),
            ),
        )
    return out.drop("__copy")


#: hot key every skewed fact column collapses onto — custkey/user_id 1
#: exists at every SF (smallest key of the base data)
HOT_KEY = 1

SKEWED = {
    # fact table → (fk column, row-id column that decides hotness)
    "orders": ("o_custkey", "o_orderkey"),
    "events": ("user_id", "event_id"),
    "lineitem": ("l_suppkey", "l_orderkey"),
}


def skew_table(df: DataFrame, name: str, hot_frac: float) -> DataFrame:
    """Zipf-head rehearsal (VERDICT r4 item 3): deterministically remap
    ``hot_frac`` of each fact table's FK rows onto HOT_KEY, so one
    customer owns ~30% of orders, one user ~30% of events, one
    supplier ~30% of lineitems — the pathological key distribution AQE
    skew-join/salting must absorb. Deterministic (keyed on the row id
    modulo 1000), FK-valid (HOT_KEY exists in every dim), and
    content-preserving: only the FK column changes, so per-query
    results remain oracle-checkable on the skewed data itself."""
    if name not in SKEWED:
        return df
    fk, rid = SKEWED[name]
    bound = int(hot_frac * 1000)
    return df.withColumn(
        fk,
        F.when(F.pmod(F.col(rid), F.lit(1000)) < bound, F.lit(HOT_KEY))
        .otherwise(F.col(fk)),
    )


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    hot_frac = 0.0
    for a in sys.argv[1:]:
        if a.startswith("--skew="):
            hot_frac = float(a.split("=", 1)[1])
        elif a.startswith("--"):
            raise SystemExit(f"unknown flag {a}")
    src, dst, factor = args[0], args[1], int(args[2])
    spark = get_spark("gen-sf")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(dst, exist_ok=True)
    # load_tables restores TIMESTAMP(NANOS) columns to TIMESTAMP_NTZ, so
    # the generated files carry plain µs timestamps both engines read
    # natively (values identical — the harness compares at µs grain)
    tables = load_tables(spark, src, register_views=False)
    for name in FIXED_DIMS + list(KEYED):
        df = tables[name]
        out = df if name in FIXED_DIMS else scale_table(df, name, factor)
        if hot_frac > 0:
            out = skew_table(out, name, hot_frac)
        # single files keep the layout identical to the driver's dirs
        n_parts = 1 if name in FIXED_DIMS else min(32, factor * 4)
        tmp = f"{dst}/__tmp_{name}"
        if name == "events":
            # a file-source STREAM replays part files in name order:
            # range-partition by ts so micro-batches arrive in rough
            # time order (a real stream's shape) and watermarks don't
            # mass-drop "late" files — batch readers are unaffected
            out = out.repartitionByRange(n_parts, "ts", "event_id")
        else:
            out = out.repartition(n_parts)
        out.write.mode("overwrite").parquet(tmp)
        # flatten to <dst>/<name>.parquet as a DIRECTORY (spark reads
        # both layouts; keeping the .parquet suffix preserves the
        # load_tables path convention)
        final = f"{dst}/{name}.parquet"
        if os.path.exists(final):
            import shutil

            shutil.rmtree(final)
        os.rename(tmp, final)
        if name == "events":
            # the file STREAM source replays in modification-time order;
            # parallel writers leave ties, so stamp ascending mtimes in
            # part-name (= ts-range) order to pin the arrival sequence
            import glob as _g
            import time as _time

            t0 = _time.time() - 10_000
            for i, f in enumerate(sorted(_g.glob(f"{final}/part-*.parquet"))):
                os.utime(f, (t0 + i * 10, t0 + i * 10))
        # count the WRITTEN files (parquet footer metadata) — counting
        # `out` would re-execute the whole cross-join plan a second time
        n = spark.read.parquet(final).count()
        print(f"{name}: {n} rows -> {final}", file=sys.stderr)


if __name__ == "__main__":
    main()
