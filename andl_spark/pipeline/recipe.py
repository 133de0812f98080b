"""End-to-end training-corpus curation recipe: the §2.8 operators
composed the way a data team would run them, raw documents in,
training-ready packed sequences out.

    raw documents
      → boilerplate line removal      (curate.remove_boilerplate_lines)
      → PII scrub                     (curate.pii_scrub)
      → language / quality / LM gates (text.lang_id, quality_score,
                                       lm_quality_score)
      → exact + near dedup            (dedup.exact_dedup,
                                       minhash pairs → dup_clusters →
                                       keep_canonical)
      → repeated-span dedup, optional (dedup.dedup_spans — Lee et al.
                                       ExactSubstr; span_dedup_window)
      → benchmark decontamination     (exact fingerprint antijoin +
                                       curate.decontaminate shingles)
      → token-budget mixture          (split.sample_by_budget)
      → packed training sequences     (pack.chunk_sequences)

Every stage is a DataFrame→DataFrame operator with its own oracle and
plan tests; this module only sequences them (and is itself tested
end-to-end in tests/test_recipe.py). Stage order matters: boilerplate
and PII rewrite text, so hashing/dedup run AFTER them; the LM trains
on the already-cleaned text so boilerplate doesn't dominate the
vocabulary; decontamination runs after dedup (fewer docs to shingle);
packing runs last on the surviving mixture.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import curate, dedup, pack, split, text


def curate_corpus(
    docs: DataFrame,
    eval_pred,
    budgets: dict[str, int],
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str = "source",
    lm_floor: float = -3.6,
    seq_block: int = 512,
    epoch: int = 0,
    decontaminate_n: int = 8,
    eager: bool = True,
    anchor_degree: int | None = None,
    span_dedup_window: int | None = None,
) -> DataFrame:
    """Run the full curation pipeline; returns one row per surviving
    document with its packed-sequence placement:

    (doc_id, source, clean_text, toks, start_tok, first_block,
     last_block, n_blocks, block_off)

    ``eval_pred`` marks held-out/benchmark docs (they are used for
    decontamination and EXCLUDED from the output; a NULL predicate
    value counts as false — the doc stays on the train side rather
    than silently vanishing); ``budgets`` is the per-source token
    budget for the mixture; ``lm_floor`` drops docs whose average
    unigram log-probability falls below it (gibberish);
    ``decontaminate_n`` is the shingle width for the fuzzy
    decontamination pass — VERBATIM eval copies of ANY length are
    additionally caught by an exact-fingerprint antijoin, so a
    benchmark of 7-word questions still decontaminates its copies.

    ``eager`` (the decontaminate pattern) persists the two
    multi-consumer intermediates (the cleaned base, the sampled
    mixture) and materializes the result before unpersisting — without
    it the uncached clean→scrub→gate chain re-executes for every
    internal action (LM training, minhash counts, packing quantiles).
    Pass ``eager=False`` at true corpus scale and write the
    (single-consumer) result straight to a sink.
    """
    # 1. structural cleaning — line boilerplate, then PII tags
    cleaned = curate.remove_boilerplate_lines(
        docs, id_col, text_col, eager=False)
    tagged = docs.select(
        id_col, source_col,
        F.coalesce(eval_pred.cast("boolean"), F.lit(False))
        .alias("__is_eval"),
    ).join(cleaned.select(F.col("id").alias(id_col), "clean_text"), id_col)
    scrubbed = curate.pii_scrub(
        tagged.select(id_col, F.col("clean_text").alias(text_col)),
        id_col, text_col,
    ).select(F.col("id").alias(id_col),
             F.col("scrubbed").alias(text_col))
    base = tagged.select(id_col, source_col, "__is_eval").join(
        scrubbed, id_col)
    if eager:
        base = base.persist()

    # 2. quality gates — heuristic + corpus-trained LM. Gates and
    # dedup apply to the TRAIN side only: an eval doc must keep its
    # text all the way to decontamination no matter how it scores
    # (dropping it early would leak its contaminated twins through).
    evals = base.filter(F.col("__is_eval"))
    train_side = base.filter(~F.col("__is_eval"))
    lm = text.train_unigram_lm(train_side, text_col)
    scores = text.lm_quality_score(train_side, lm, id_col, text_col)
    gated = (
        train_side.join(scores.withColumnRenamed("id", id_col), id_col)
        .filter((F.col("n_tokens") > 0)
                & (F.col("avg_logp") >= F.lit(lm_floor)))
        .drop("n_tokens", "avg_logp")
    )

    # 3. dedup (train side) — exact fingerprints, then near-dup clusters
    exact = dedup.exact_dedup(gated, id_col, text_col)
    uniq = gated.join(
        exact.filter(~F.col("is_dup")).select(id_col),
        id_col, "left_semi")
    # anchor_degree: the near-dup pairs here ONLY feed keep_canonical
    # (a cluster decision), so at corpus scale pass a small D — pair
    # enumeration stays linear in duplicate-cluster size instead of
    # quadratic (the sf10 lesson, SCALE_r04.md). Default None keeps
    # exact pair semantics for oracle-checked runs.
    pairs = dedup.minhash_lsh_dedup(uniq, id_col, text_col, threshold=0.7,
                                    anchor_degree=anchor_degree)
    canonical = dedup.keep_canonical(uniq, pairs, id_col)

    # 3b. optional exact repeated-span dedup (Lee et al. 2022) — runs
    # AFTER document-level dedup (cheaper: only canonical docs emit
    # spans; a doc-level near-dup's spans are already gone with the
    # doc) and BEFORE decontamination/hashing, which must see the
    # final text. Docs whose every token was a later occurrence drop
    # out here (an empty doc has no training value and would pack a
    # zero-token row).
    spanned = None
    if span_dedup_window is not None:
        # canonical sits on the gate+dedup join chain above the
        # persisted base and now has two consumers (dedup_spans'
        # internals — themselves eager-persisted — and the rejoin's
        # left side): persist it so the chain runs once (review r6)
        if eager:
            canonical = spanned = canonical.persist()
        sd = dedup.dedup_spans(
            canonical, id_col, text_col, window=span_dedup_window,
            eager=eager)
        canonical = canonical.drop(text_col).join(
            sd.filter(F.col("clean_text") != "").select(
                F.col("id").alias(id_col),
                F.col("clean_text").alias(text_col)),
            id_col,
        )

    # 4. decontamination — exact first (verbatim copies of any length,
    # incl. eval docs too short to shingle), then fuzzy n-gram overlap
    fp = text.fingerprint(F.col(text_col))
    eval_fps = evals.select(fp.alias("__fp")).distinct()
    canonical = (
        canonical.withColumn("__fp", fp)
        .join(eval_fps, "__fp", "left_anti")
        .drop("__fp")
    )
    combined = canonical.unionByName(evals)
    leaks = curate.decontaminate(
        combined, id_col, text_col, F.col("__is_eval"),
        n=decontaminate_n, eager=False)
    clean_train = canonical.join(
        leaks.select(F.col("id").alias(id_col)), id_col, "left_anti")

    # 5. mixture + packing
    sized = clean_train.withColumn(
        "toks", text.token_count(text_col).cast("long"))
    mixed = split.sample_by_budget(
        sized, id_col, "toks", source_col, budgets, epoch=epoch)
    if eager:
        mixed = mixed.persist()
    placed = pack.chunk_sequences(mixed, id_col, "toks", seq_block)
    out = (
        mixed.select(id_col, source_col,
                     F.col(text_col).alias("clean_text"))
        .join(placed, id_col)
    )
    if eager:
        out = out.localCheckpoint(eager=True)
        mixed.unpersist()
        if spanned is not None:
            spanned.unpersist()
        base.unpersist()
    return out
