"""End-to-end curation recipe (pipeline/recipe.py): raw documents in,
packed training sequences out, with every stage's guarantee visible in
the result."""

from pyspark.sql import functions as F

from andl_spark.pipeline.recipe import curate_corpus
from andl_spark.session import load_tables
from conftest import SF_SMOKE


def test_curate_corpus_end_to_end(spark):
    docs = load_tables(spark, SF_SMOKE, register_views=False)["documents"]
    budgets = {f"src{i}": 4_000 for i in range(20)}
    out = curate_corpus(
        docs, eval_pred=F.col("source") == "src0", budgets=budgets,
        lm_floor=-6.0, seq_block=256,
    ).cache()
    rows = out.collect()
    assert rows, "pipeline must keep a non-trivial corpus"
    # eval docs never reach the training output
    assert all(r["source"] != "src0" for r in rows)
    # packed stream is gapless in id order
    ordered = sorted(rows, key=lambda r: r["doc_id"])
    pos = 0
    for r in ordered:
        assert r["start_tok"] == pos
        pos += r["toks"]
    # mixture budgets are hard caps per source
    used = {r["source"]: r["t"] for r in out.groupBy("source")
            .agg(F.sum("toks").alias("t")).collect()}
    assert all(t <= 4_000 for t in used.values())
    # no doc survives twice (dedup + exactly-once packing)
    assert len({r["doc_id"] for r in rows}) == len(rows)
    # PII never reaches the packed corpus
    assert out.filter(F.col("clean_text").rlike(
        r"[\w.+-]+@[\w-]+\.[A-Za-z]{2,}")).count() == 0
    out.unpersist()


def test_eval_docs_bypass_gates_for_decontamination(spark):
    """An eval doc that would FAIL the quality gates still
    decontaminates its training twins — gates and dedup apply to the
    train side only, so eval shingles always reach the decontamination
    join."""
    gib = "qzxv wkjq zzyxw qqqvz xkcd9 jwqp elbow under nine zz yy xx"
    rows = [
        (1, gib, "eval_set"),                    # gibberish eval doc
        (2, gib, "web"),                         # contaminated train twin
        (3, "perfectly normal training text about suppliers and parts "
            "with enough words to pass every single quality gate", "web"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = curate_corpus(
        docs, eval_pred=F.col("source") == "eval_set",
        budgets={"web": 10_000}, lm_floor=-99.0, seq_block=64)
    kept = {r["doc_id"] for r in out.collect()}
    assert 2 not in kept   # the leak is gone
    assert 3 in kept       # clean training doc survives


def test_short_eval_copy_decontaminated_exactly(spark):
    """An eval doc too short to shingle (7 words < n=8) still removes
    its VERBATIM training copy via the exact-fingerprint antijoin; a
    NULL eval predicate counts as train-side, not silently dropped."""
    q = "what is the capital of france paris"
    rows = [
        (1, q, "eval_set"),
        (2, q, "web"),                 # verbatim copy, too short to shingle
        (3, "perfectly normal training text about suppliers and parts "
            "with enough words to pass every single quality gate", "web"),
        (4, "another normal training document with plenty of everyday "
            "words to stay above any floor", None),   # NULL source
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = curate_corpus(
        docs, eval_pred=F.col("source") == "eval_set",
        budgets={"web": 10_000}, lm_floor=-99.0, seq_block=64)
    kept = {r["doc_id"] for r in out.collect()}
    assert 2 not in kept   # exact copy gone despite being unshingleable
    assert 3 in kept
    # doc 4 (NULL predicate → train side) survives gates/dedup; it has
    # no budget entry for source NULL so the mixture drops it — but it
    # must reach that stage, which the budget-keyed variant shows:
    out2 = curate_corpus(
        docs.withColumn("source", F.coalesce("source", F.lit("web"))),
        eval_pred=F.col("source") == "eval_set",
        budgets={"web": 10_000}, lm_floor=-99.0, seq_block=64)
    assert 4 in {r["doc_id"] for r in out2.collect()}


def test_curate_corpus_anchor_mode_same_output(spark):
    """The scale knob (anchor_degree, SCALE_r04.md) changes only the
    pair-enumeration cost, not the curated corpus: the testdata's
    planted near-dup clusters are dense, so the keep_canonical
    decision — and therefore the packed output — is identical."""
    docs = load_tables(spark, SF_SMOKE, register_views=False)["documents"]
    budgets = {f"src{i}": 4_000 for i in range(20)}
    kw = dict(eval_pred=F.col("source") == "src0", budgets=budgets,
              lm_floor=-6.0, seq_block=256)
    exact = curate_corpus(docs, **kw)
    anchored = curate_corpus(docs, anchor_degree=4, **kw)
    a = sorted(map(tuple, exact.collect()))
    b = sorted(map(tuple, anchored.collect()))
    assert a == b and a


def test_curate_corpus_span_dedup_stage(spark):
    """span_dedup_window engages the exact repeated-span stage (r6):
    a later doc repeating another doc's span loses exactly that span
    (not the whole doc), a doc that is ALL later-occurrence spans
    drops out entirely, and the recipe invariants (gapless packing,
    exactly-once, eval exclusion) still hold on the rewritten text."""
    shared = "alpha bravo charlie delta echo foxtrot golf hotel india juliet"
    rows = [
        (1, shared + " unique tail one two three four five six seven", "web"),
        # doc 2: shared 10-span + its own distinct words -> span cut, doc kept
        (2, "prefix words here now " + shared + " suffix piece ok fine", "web"),
        # doc 3: nothing but the shared span -> disappears at this stage
        (3, shared, "web"),
        (4, "completely unrelated training text about parts suppliers "
            "warehouses logistics shipping and procurement", "web"),
        (9, "held out benchmark question nobody copied anywhere", "eval_set"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = curate_corpus(
        docs, eval_pred=F.col("source") == "eval_set",
        budgets={"web": 10_000}, lm_floor=-99.0, seq_block=64,
        span_dedup_window=10,
    ).cache()
    kept = {r["doc_id"]: r for r in out.collect()}
    assert 1 in kept and shared in kept[1]["clean_text"]   # first occurrence
    assert 2 in kept and shared not in kept[2]["clean_text"]
    assert "prefix words here now" in kept[2]["clean_text"]
    assert 3 not in kept                                   # all-span doc gone
    assert 4 in kept and 9 not in kept                     # eval excluded
    # packing invariants survive the rewrite: gapless, toks match text
    ordered = sorted(kept.values(), key=lambda r: r["doc_id"])
    pos = 0
    for r in ordered:
        assert r["start_tok"] == pos
        assert r["toks"] == len(r["clean_text"].split())
        pos += r["toks"]
    out.unpersist()
