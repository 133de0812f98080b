"""Skew salting correctness + bucketed co-located joins (no shuffle)."""

from pyspark.sql import functions as F

from andl_spark.operators.skew import key_histogram, salted_join
from andl_spark.plans.explain import formatted_plan
from andl_spark.sources.catalog import Catalog


def test_salted_join_matches_plain_join(spark):
    # 90% of left rows share one hot key
    left = spark.range(2000).select(
        F.when(F.col("id") % 10 != 0, F.lit(7)).otherwise(F.col("id")).alias("k"),
        F.col("id").alias("v"),
    )
    right = spark.range(100).select(F.col("id").alias("k"), (F.col("id") * 2).alias("w"))
    plain = left.join(right, "k").groupBy("k").agg(F.count(F.lit(1)).alias("n"), F.sum("w").alias("s"))
    salted = salted_join(left, right, ["k"], salt=8).groupBy("k").agg(
        F.count(F.lit(1)).alias("n"), F.sum("w").alias("s")
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_key_histogram_flags_hot_key(spark):
    df = spark.range(1000).select(
        F.when(F.col("id") % 5 != 0, F.lit(1)).otherwise(F.col("id")).alias("k")
    )
    top = key_histogram(df, "k", top=1).first()
    assert top["k"] == 1 and top["count"] == 800


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    cat = Catalog(spark, str(tmp_path / "cat"))
    orders = spark.range(1000).select(
        F.col("id").alias("k"), (F.col("id") % 97).alias("a")
    )
    items = spark.range(5000).select(
        (F.col("id") % 1000).alias("k"), (F.col("id") % 13).alias("b")
    )
    cat.put_bucketed("b_orders", orders, ["k"], n_buckets=8)
    cat.put_bucketed("b_items", items, ["k"], n_buckets=8)

    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", None)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = cat.get_bucketed("b_orders").join(cat.get_bucketed("b_items"), "k")
        plan = formatted_plan(j)
        assert "SortMergeJoin" in plan
        # co-located buckets: join requires no Exchange on either side
        assert "Exchange" not in plan, plan[:1500]
        assert j.count() == 5000
    finally:
        if prev is not None:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_items")


def test_layout_guards_are_symmetric(spark, tmp_path):
    """put() refuses to version a bucketed relvar AND put_bucketed()
    refuses to bucket a versioned one (ADVICE r2): mixing layouts under
    one name would orphan version snapshots / stale metastore paths."""
    import pytest

    cat = Catalog(spark, str(tmp_path / "cat2"))
    df = spark.range(10).select(F.col("id").alias("k"))
    cat.put("versioned_rv", df)
    with pytest.raises(ValueError, match="versioned"):
        cat.put_bucketed("versioned_rv", df, ["k"], n_buckets=4)
    try:
        cat.put_bucketed("bucketed_rv", df, ["k"], n_buckets=4)
        with pytest.raises(ValueError, match="bucketed"):
            cat.put("bucketed_rv", df)
    finally:
        spark.sql("DROP TABLE IF EXISTS bucketed_rv")
    # a LEGACY entry (pre-versioning: no 'layout' key) is a flat
    # parquet table — put_bucketed must refuse it too, not default
    # the missing key to 'bucketed' and clobber the directory
    cat._names["legacy_rv"] = {}
    with pytest.raises(ValueError, match="flat"):
        cat.put_bucketed("legacy_rv", df, ["k"], n_buckets=4)


def test_zipfian_orders_salted_join_equivalence(spark):
    """VERDICT r4 item 3: SuiteRelDyadic join semantics must survive a
    pathological key distribution unchanged. tools/gen_sf.skew_table
    collapses 30% of orders onto one hot customer (the zipf-head
    rehearsal shape); the plain natural join, the salted join, and the
    reference dyadic semantics must all agree row-for-row on it."""
    import importlib.util
    import os

    from andl_spark.operators.joins import natural_join
    from andl_spark.session import load_tables

    from conftest import SF_SMOKE

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "gen_sf", os.path.join(repo, "tools", "gen_sf.py"))
    gen_sf = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(gen_sf)

    t = load_tables(spark, SF_SMOKE, register_views=False)
    orders = gen_sf.skew_table(t["orders"], "orders", 0.3).select(
        "o_orderkey", F.col("o_custkey").alias("c_custkey"), "o_totalprice")
    cust = t["customer"].select("c_custkey", "c_name", "c_nationkey")
    # the hot key really is hot (~30% of all orders)
    top = key_histogram(orders, "c_custkey", top=1).first()
    assert top["c_custkey"] == gen_sf.HOT_KEY
    assert top["count"] >= 0.25 * orders.count()

    plain = natural_join(orders, cust)
    salted = salted_join(orders, cust, ["c_custkey"], salt=8)
    cols = sorted(plain.columns)
    assert sorted(salted.columns) == cols
    assert (sorted(map(tuple, plain.select(*cols).collect()))
            == sorted(map(tuple, salted.select(*cols).collect())))
