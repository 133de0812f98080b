"""The maintenance-plane filesystem shim (VERDICT r7 item 1): bare
paths keep POSIX semantics; URI paths route through the JVM Hadoop
FileSystem of the active session — exercised here on file:// URIs,
the same code path an hdfs://or s3a:// deployment takes. The
streaming-index lifecycle and catalog are driven end-to-end through
the URI backend so the 100 TB crawl loop's pointer flips, reclaim and
GC are proven off the driver-local-POSIX assumption."""

import json
import os

import pytest
from pyspark.sql import functions as F

from andl_spark import fsio


# ---------------------------------------------------------------------
# unit ops, both backends
# ---------------------------------------------------------------------
@pytest.mark.parametrize("scheme", ["bare", "file"])
def test_fsio_roundtrip(spark, tmp_path, scheme):
    root = str(tmp_path / "fs")
    if scheme == "file":
        root = "file://" + root
    sub = fsio.join(root, "a/b")
    fsio.mkdirs(sub)
    assert fsio.exists(sub)
    p = fsio.join(root, "a", "_pointer.json")
    fsio.write_text_atomic(p, json.dumps({"current": 1}))
    assert json.loads(fsio.read_text(p)) == {"current": 1}
    # atomic overwrite-rename: the target swaps, no .tmp residue
    fsio.write_text_atomic(p, json.dumps({"current": 2}))
    assert json.loads(fsio.read_text(p)) == {"current": 2}
    assert sorted(fsio.listdir(fsio.join(root, "a"))) == ["_pointer.json", "b"]
    assert fsio.listdir(fsio.join(root, "missing")) == []
    fsio.delete(fsio.join(root, "a"))
    assert not fsio.exists(fsio.join(root, "a"))
    fsio.delete(fsio.join(root, "a"))  # idempotent on missing


def test_fsio_uri_and_bare_agree_on_disk(spark, tmp_path):
    """The two backends manage the SAME directory tree: a pointer
    flipped through the JVM path reads back through the POSIX path and
    vice versa (what lets a local test fixture drive URI-configured
    production code)."""
    d = str(tmp_path / "shared")
    fsio.mkdirs(d)
    fsio.write_text_atomic("file://" + d + "/p.json", '{"current": 7}')
    assert json.loads(fsio.read_text(d + "/p.json"))["current"] == 7
    fsio.write_text_atomic(d + "/p.json", '{"current": 8}')
    assert json.loads(fsio.read_text("file://" + d + "/p.json"))["current"] == 8


# ---------------------------------------------------------------------
# streaming-index lifecycle on a file:// URI (the JVM backend end-to-end)
# ---------------------------------------------------------------------
def test_neardup_index_lifecycle_on_file_uri(spark, tmp_path):
    """seed → ingest → compact → reclaim → read, with the index and
    pairs paths as file:// URIs: every pointer read/flip, generation
    list and reclaim goes through the Hadoop FileSystem (VERDICT r7
    item 1 'Done' criterion). Results must equal the bare-path run's
    (the existing pins) — here: ingest claims, compaction row-identity,
    and old-generation reclaim."""
    from andl_spark.pipeline import dedup as D
    from andl_spark.streaming.events import (
        _read_gen, compact_neardup_index, neardup_ingest_batch,
        read_neardup_index, seed_neardup_index)

    docs = spark.createDataFrame(
        [(i, f"uri lifecycle body {i % 5} tail{i % 2}") for i in range(30)],
        "doc_id long, text string")
    old = docs.filter(F.col("doc_id") < 15)
    b0 = docs.filter((F.col("doc_id") >= 15) & (F.col("doc_id") < 22))
    b1 = docs.filter(F.col("doc_id") >= 22)

    local_idx = tmp_path / "uri_idx"
    idx = "file://" + str(local_idx)
    pairs = "file://" + str(tmp_path / "uri_pairs")
    seed_neardup_index(D.minhash_signatures(old, "doc_id", "text"), idx)
    assert _read_gen(idx) == 1
    neardup_ingest_batch(b0, 0, idx, pairs, kind="minhash", threshold=0.5)
    neardup_ingest_batch(b1, 1, idx, pairs, kind="minhash", threshold=0.5)
    before = read_neardup_index(spark, idx)
    assert before.count() == 30
    before_ids = {r["doc_id"] for r in before.select("doc_id").collect()}

    compact_neardup_index(spark, idx, target_files=1)
    assert _read_gen(idx) == 2
    after = read_neardup_index(spark, idx)
    assert {r["doc_id"] for r in after.select("doc_id").collect()} == before_ids
    assert {r["_batch_id"] for r in
            after.select("_batch_id").distinct().collect()} == {-1, 1}

    # second compaction reclaims generation 1 (keep-previous discipline)
    compact_neardup_index(spark, idx, target_files=1)
    assert _read_gen(idx) == 3
    gens = {n for n in os.listdir(local_idx) if n.startswith("gen=")}
    assert gens == {"gen=2", "gen=3"}
    assert read_neardup_index(spark, idx).count() == 30


# ---------------------------------------------------------------------
# copy_tree merge semantics (ADVICE r10 high)
# ---------------------------------------------------------------------
@pytest.mark.parametrize("scheme", ["bare", "file"])
def test_copy_tree_merges_into_existing_destination(spark, tmp_path,
                                                    scheme):
    """ADVICE r10 (high): the tiered fold copies ``src/_batch_id=-1``
    into a target dir the parquet write ALREADY CREATED. Hadoop
    FileUtil.copy of a whole directory resolves an existing destination
    to ``dst/<srcName>`` — nesting ``_batch_id=-1/_batch_id=-1`` and
    corrupting the generation layout with a duplicate partition column.
    Both backends must MERGE instead: per-child copies into explicit
    names, existing unrelated entries retained, subdirectories
    recursed."""
    src = tmp_path / "gsrc" / "_batch_id=-1"
    (src / "list_id=3").mkdir(parents=True)
    (src / "list_id=3" / "part-0.parquet").write_text("cell3-bytes")
    (src / "part-seed.parquet").write_text("seed-bytes")
    dst = tmp_path / "gdst" / "_batch_id=-1"
    (dst / "list_id=9").mkdir(parents=True)  # the parquet write's output
    (dst / "list_id=9" / "part-1.parquet").write_text("cell9-bytes")

    s, d = str(src), str(dst)
    if scheme == "file":
        s, d = "file://" + s, "file://" + d
    fsio.copy_tree(s, d)

    assert not (dst / "_batch_id=-1").exists(), "nested partition dir"
    assert (dst / "part-seed.parquet").read_text() == "seed-bytes"
    assert (dst / "list_id=3" / "part-0.parquet").read_text() == "cell3-bytes"
    # pre-existing content of the destination survives the merge
    assert (dst / "list_id=9" / "part-1.parquet").read_text() == "cell9-bytes"


@pytest.mark.parametrize("scheme", ["bare", "file"])
def test_copy_tree_fresh_destination(spark, tmp_path, scheme):
    src = tmp_path / "fsrc"
    (src / "inner").mkdir(parents=True)
    (src / "inner" / "f.txt").write_text("x")
    (src / "top.txt").write_text("y")
    dst = tmp_path / "fdst"
    s, d = str(src), str(dst)
    if scheme == "file":
        s, d = "file://" + s, "file://" + d
    fsio.copy_tree(s, d)
    assert (dst / "inner" / "f.txt").read_text() == "x"
    assert (dst / "top.txt").read_text() == "y"


def test_catalog_on_file_uri(spark, tmp_path):
    """Catalog manifest/GC through the URI backend: put versions, gc
    reclaims old version directories via the Hadoop FileSystem."""
    from andl_spark.sources.catalog import Catalog

    local = tmp_path / "uri_cat"
    cat = Catalog(spark, "file://" + str(local))
    df1 = spark.range(5).withColumnRenamed("id", "x")
    df2 = spark.range(9).withColumnRenamed("id", "x")
    cat.put("t", df1)
    cat.put("t", df2)
    assert cat.get("t").count() == 9
    assert cat.get("t", version=1).count() == 5
    doomed = cat.gc("t", keep_last=1)
    assert doomed == [1]
    assert not (local / "t" / "v1").exists()
    assert cat.get("t").count() == 9
    # a fresh Catalog object reads the manifest back through the shim
    cat2 = Catalog(spark, "file://" + str(local))
    assert cat2.names() == ["t"] and cat2.current_version("t") == 2
    cat2.drop("t")
    assert not (local / "t").exists()
