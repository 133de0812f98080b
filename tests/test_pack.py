"""Sequence packing (pipeline/pack.py): the concatenate-and-chunk
layout against an exact DuckDB window oracle, and first-fit-decreasing
whole-document packing against its invariants."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from andl_spark.pipeline.pack import chunk_sequences, pack_greedy
from andl_spark.session import load_tables
from conftest import SF_SMOKE

BLOCK = 512


@pytest.fixture(scope="module")
def docs(spark):
    """documents with a deterministic whitespace token count."""
    d = load_tables(spark, SF_SMOKE, register_views=False)["documents"]
    return d.select(
        "doc_id",
        F.size(F.split(F.trim(F.col("text")), r"\s+")).cast("long").alias("toks"),
    )


def test_chunk_sequences_matches_sql_oracle(docs, duck):
    """The distributed two-pass prefix sum equals DuckDB's single
    global window, row for row — same start offsets, same block
    spans."""
    got = {
        r["doc_id"]: (r["start_tok"], r["first_block"], r["last_block"],
                      r["n_blocks"], r["block_off"])
        for r in chunk_sequences(docs, "doc_id", "toks", BLOCK).collect()
    }
    want = duck.execute(f"""
        WITH t AS (
          SELECT doc_id,
                 CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT) AS toks
          FROM documents
        ), c AS (
          SELECT doc_id, toks,
                 SUM(toks) OVER (ORDER BY doc_id) AS endt
          FROM t
        )
        SELECT doc_id, endt - toks AS start_tok,
               (endt - toks) // {BLOCK} AS first_block,
               (endt - 1) // {BLOCK} AS last_block,
               CASE WHEN toks = 0 THEN 0
                    ELSE (endt - 1) // {BLOCK} - (endt - toks) // {BLOCK} + 1
               END AS n_blocks,
               (endt - toks) % {BLOCK} AS block_off
        FROM c
    """).fetchall()
    assert len(got) == len(want) > 0
    for doc_id, *vals in want:
        assert got[doc_id] == tuple(vals), doc_id


def test_chunk_sequences_no_global_window(docs):
    """The plan must not collapse into a single window partition: every
    Window node partitions on the range-partition id (the 100 TB shape;
    a bare Window.orderBy would serialize the whole corpus)."""
    plan = chunk_sequences(docs, "doc_id", "toks", BLOCK) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "__pid" in plan
    import re
    for frag in re.findall(r"Window \[[^\]]*\], \[([^\]]*)\]", plan):
        assert "__pid" in frag  # partition spec present, never empty
    assert "BroadcastHashJoin" in plan  # offsets arrive map-side


def test_chunk_sequences_stream_is_gapless(docs):
    """Offsets tile the concatenated stream exactly: sorted by id,
    each doc starts where the previous ended, and the total equals the
    token sum."""
    rows = sorted(
        (r["doc_id"], r["start_tok"], r["toks"])
        for r in chunk_sequences(docs, "doc_id", "toks", BLOCK).collect())
    pos = 0
    for _, start, toks in rows:
        assert start == pos
        pos += toks
    assert pos == sum(t for _, _, t in rows)


def test_sample_by_budget_matches_sql_oracle(spark, duck):
    """Token-budget mixture sampling (pipeline/split.sample_by_budget)
    equals its DuckDB mirror doc for doc, never exceeds a budget, and
    different epochs draw different deterministic subsets."""
    from andl_spark.pipeline.split import (
        sample_by_budget, sample_by_budget_oracle_sql)

    d = load_tables(spark, SF_SMOKE, register_views=False)["documents"]
    # a NULL-key row must be excluded by BOTH engines (NULL bucket)
    d = d.unionByName(spark.createDataFrame(
        [(None, "x", "en", "src0", 10)], d.schema))
    budgets = {"src0": 3000, "src1": 5000, "src2": 100}
    got = sample_by_budget(d, "doc_id", "n_chars", "source", budgets)
    ids = {r["doc_id"] for r in got.select("doc_id").collect()}
    want = {r[0] for r in duck.execute(
        "SELECT doc_id FROM (" + sample_by_budget_oracle_sql(
            "doc_id", "n_chars", "source", "documents", budgets) + ")"
    ).fetchall()}
    assert ids == want and ids  # non-empty, exact doc-level agreement
    # budgets are hard caps per source
    used = {r["source"]: r["t"] for r in got.groupBy("source")
            .agg(F.sum("n_chars").alias("t")).collect()}
    assert set(used) <= set(budgets)
    for s, t in used.items():
        assert t <= budgets[s], (s, t)
    # epoch salting: a different epoch keeps the caps but moves the set
    e1 = {r["doc_id"] for r in sample_by_budget(
        d, "doc_id", "n_chars", "source", budgets, epoch=1)
        .select("doc_id").collect()}
    assert e1 != ids
    # deterministic: same call, same set
    again = {r["doc_id"] for r in sample_by_budget(
        d, "doc_id", "n_chars", "source", budgets).select("doc_id").collect()}
    assert again == ids


def test_sample_by_budget_plan_broadcasts_cutoffs(spark):
    """The corpus-side keep filter must arrive as a broadcast SEMI
    join (the cutoff relation is ≤ N_BUCKETS rows/source); the full
    corpus is never sort-merge-shuffled."""
    from andl_spark.pipeline.split import sample_by_budget

    d = load_tables(spark, SF_SMOKE, register_views=False)["documents"]
    plan = sample_by_budget(
        d, "doc_id", "n_chars", "source", {"src0": 1000}
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan
    assert "SortMergeJoin" not in plan and "CartesianProduct" not in plan


def test_chunk_sequences_string_ids(spark):
    """Non-numeric orderable ids (the pack_greedy-supported shape) use
    sample-estimated boundaries; offsets stay exact and gapless."""
    d = spark.createDataFrame(
        [(f"doc-{i:04d}", i % 7 + 1) for i in range(200)],
        "doc_id string, toks long")
    rows = sorted(
        (r["doc_id"], r["start_tok"], r["toks"])
        for r in chunk_sequences(d, "doc_id", "toks", 16, n_parts=8).collect())
    pos = 0
    for _, start, toks in rows:
        assert start == pos
        pos += toks
    assert len(rows) == 200


def test_pack_greedy_invariants(docs):
    """Every doc lands in exactly one sequence; no sequence exceeds the
    budget (oversized docs get singleton sequences); determinism across
    runs; and packing is tight: every group needs at least
    ceil(group_tokens / budget) sequences and FFD stays within 2x."""
    budget = 2048
    out = pack_greedy(docs, "doc_id", "toks", budget, n_groups=16).cache()
    n_docs = docs.count()
    assert out.count() == n_docs
    assert out.select("doc_id").distinct().count() == n_docs

    per_seq = out.groupBy("seq_id").agg(
        F.sum("toks").alias("t"), F.count("*").alias("n")).collect()
    for r in per_seq:
        assert r["t"] <= budget or r["n"] == 1  # oversized → singleton

    # tightness per group (seq_id encodes group in the high bits)
    stats = (
        out.withColumn("grp", (F.col("seq_id") / (1 << 32)).cast("long"))
        .groupBy("grp")
        .agg(F.sum("toks").alias("toks"),
             F.countDistinct("seq_id").alias("seqs"))
        .collect()
    )
    for r in stats:
        lower = -(-r["toks"] // budget)  # ceil
        assert lower <= r["seqs"] <= 2 * lower + 1, r

    # determinism: a second run assigns identical sequences
    again = pack_greedy(docs, "doc_id", "toks", budget, n_groups=16)
    assert out.join(again, "doc_id") \
        .filter(out["seq_id"] != again["seq_id"]).count() == 0
    out.unpersist()


try:
    from hypothesis import HealthCheck, given, settings, strategies as st

    _doc_rows = st.lists(
        st.tuples(st.integers(0, 10_000),
                  st.integers(0, 300)),  # incl. zero-token and oversized
        min_size=0, max_size=25, unique_by=lambda t: t[0])

    @settings(max_examples=6, deadline=None,
              suppress_health_check=[HealthCheck.function_scoped_fixture,
                                     HealthCheck.too_slow])
    @given(rows=_doc_rows)
    def test_pack_greedy_property(spark, rows):
        """For random corpora (zero-token docs, oversized docs, empty):
        every doc lands exactly once; a sequence is either within
        budget or a single oversized doc; and a zero-token doc never
        rides with an oversized one."""
        budget = 100
        d = spark.createDataFrame(rows, "doc_id long, toks long") if rows \
            else spark.createDataFrame([], "doc_id long, toks long")
        out = pack_greedy(d, "doc_id", "toks", budget, n_groups=4).collect()
        assert sorted(r["doc_id"] for r in out) == sorted(t[0] for t in rows)
        seqs = {}
        for r in out:
            seqs.setdefault(r["seq_id"], []).append(r["toks"])
        for toks in seqs.values():
            assert sum(toks) <= budget or len(toks) == 1
            # an over-budget doc always rides ALONE — even a
            # zero-token doc must not share its sequence
            if any(t > budget for t in toks):
                assert len(toks) == 1
except ImportError:
    pass


def test_pack_greedy_string_ids_and_oversized_bins(spark):
    """Regression pair: (a) a non-numeric id column must flow through
    the Arrow schema unchanged; (b) an oversized doc's sequence is
    CLOSED — even a zero-token doc must not join it (the
    budget-or-singleton invariant)."""
    d = spark.createDataFrame(
        [("big", 500), ("tiny", 0), ("a", 40), ("b", 50)],
        "doc_id string, toks long")
    out = pack_greedy(d, "doc_id", "toks", budget=100, n_groups=1)
    rows = {r["doc_id"]: r["seq_id"] for r in out.collect()}
    assert set(rows) == {"big", "tiny", "a", "b"}
    by_seq = {}
    for doc, seq in rows.items():
        by_seq.setdefault(seq, []).append(doc)
    over = [docs for docs in by_seq.values() if "big" in docs]
    assert over == [["big"]]  # oversized doc rides alone
    for docs in by_seq.values():
        assert sum({"big": 500, "tiny": 0, "a": 40, "b": 50}[x]
                   for x in docs) <= 100 or docs == ["big"]


def test_pack_greedy_matches_linear_first_fit(spark):
    """The r11 segment-tree first-fit must assign bit-identically to
    the reference O(bins)-per-doc linear scan it replaced (leftmost
    open bin with cap >= max(t, 1); an oversized bin stays closed)."""
    import random

    def linear_first_fit(toks, budget):
        bins, assign = [], []
        for t in toks:
            t = int(t)
            for i, cap in enumerate(bins):
                if t <= cap and cap > 0:
                    bins[i] = cap - t
                    assign.append(i)
                    break
            else:
                bins.append(budget - t)
                assign.append(len(bins) - 1)
        return assign

    rng = random.Random(11)
    budget = 64
    rows = [(i, rng.choice([0, 0, rng.randint(1, budget * 2)]))
            for i in range(300)]
    d = spark.createDataFrame(rows, "doc_id long, toks long")
    got = {r["doc_id"]: r["seq_id"]
           for r in pack_greedy(d, "doc_id", "toks", budget,
                                n_groups=1).collect()}
    # FFD order inside the single group: (toks desc, id asc)
    order = sorted(rows, key=lambda t: (-t[1], t[0]))
    want_assign = linear_first_fit([t for _, t in order], budget)
    want = {doc: a for (doc, _), a in zip(order, want_assign)}
    assert got == want
