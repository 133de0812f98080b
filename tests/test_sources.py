"""Sources/catalog: CSV heading round-trip (reference Sample/*.csv) and
parquet-backed catalog persistence (Catalog.cs parity)."""

import os

from pyspark.sql import functions as F

from andl_spark.sources.catalog import Catalog
from andl_spark.sources.io import heading_to_schema, read_csv, write_parquet


def test_heading_parser():
    s = heading_to_schema("{S#,SNAME,STATUS:number,CITY}")
    assert [f.name for f in s.fields] == ["S#", "SNAME", "STATUS", "CITY"]
    assert s.fields[2].dataType.simpleString() == "double"
    assert s.fields[0].dataType.simpleString() == "string"


def test_read_csv_with_heading(spark, tmp_path):
    p = str(tmp_path / "s.csv")
    with open(p, "w") as f:
        f.write("S#,SNAME,STATUS,CITY\nS1,Smith,20,London\nS2,Jones,10,Paris\n")
    df = read_csv(spark, p, heading="{S#,SNAME,STATUS:number,CITY}")
    rows = df.orderBy("S#").collect()
    assert rows[0]["STATUS"] == 20.0 and rows[1]["CITY"] == "Paris"


def test_reference_sample_csv_loads(spark):
    """The reference's own S.csv must load through our csv source."""
    df = read_csv(spark, "/root/reference/Test/S.csv", heading="{S#,SNAME,STATUS:number,CITY}")
    assert df.count() == 5
    assert {r["CITY"] for r in df.collect()} == {"London", "Paris", "Athens"}


def test_catalog_roundtrip(spark, spdb, tmp_path):
    cat = Catalog(spark, str(tmp_path / "cat"))
    cat.put("S", spdb["S"])
    assert cat.names() == ["S"]
    back = cat.get("S")
    assert back.count() == 5

    rv = cat.relvar("S")
    rv.delete(F.col("S#") == "S3")
    cat.save(rv)
    assert cat.get("S").count() == 4

    # fresh Catalog instance sees persisted state (manifest reload)
    cat2 = Catalog(spark, str(tmp_path / "cat"))
    assert cat2.names() == ["S"] and cat2.get("S").count() == 4
    cat2.drop("S")
    assert cat2.names() == []


def test_write_parquet_partitioned(spark, spdb, tmp_path):
    out = str(tmp_path / "sp")
    write_parquet(spdb["SP"], out, partition_by=["S#"])
    assert os.path.isdir(out)
    back = spark.read.parquet(out)
    assert back.count() == 12


def test_catalog_versioning_and_rollback(spark, spdb, tmp_path):
    """Every put is an immutable snapshot: readers can pin a version,
    rollback is a pointer flip, and updates through Relvar.save create
    new versions instead of clobbering history."""
    from andl_spark.sources.catalog import Catalog

    cat = Catalog(spark, str(tmp_path / "cat"))
    cat.put("S", spdb["S"])
    cat.put("S", spdb["S"].filter(F.col("CITY") == "Paris"))
    assert cat.history("S") == [1, 2]
    assert cat.current_version("S") == 2
    assert cat.get("S").count() == 2            # Paris suppliers
    assert cat.get("S", version=1).count() == 5  # full original pinned
    cat.rollback("S", 1)
    assert cat.get("S").count() == 5
    # reopened catalog sees the same state (manifest round-trip)
    cat2 = Catalog(spark, str(tmp_path / "cat"))
    assert cat2.current_version("S") == 1 and cat2.history("S") == [1, 2]
