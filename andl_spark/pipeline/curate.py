"""Training-corpus curation operators: benchmark decontamination, PII
scrubbing, and line-level boilerplate removal — first-class pipeline
ops alongside dedup/simsearch (the reference has no corpus tooling;
these extend SURVEY §2.8).

All JVM expressions, no Python UDFs. pii_scrub is purely scan-side;
decontaminate adds one aggregation shuffle + a broadcast semi-join;
remove_boilerplate_lines shuffles twice (line frequency, per-doc
reassembly) with an optimizer-chosen antijoin in between.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import shingle_expr
from ..util import ensure_parallelism


def decontaminate(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    eval_pred: Column,
    n: int = 8,
    max_shingle_freq: int | None = None,
    eager: bool = True,
) -> DataFrame:
    """Flag training documents that share any word-``n``-gram with the
    evaluation split — the benchmark-decontamination pass every
    training pipeline runs before a model sees the corpus (the eval
    set must not leak into training data).

    ``eval_pred`` partitions ``docs`` into eval (true) and train
    (false). Returns ``(id, n_shared)`` — train docs sharing >= 1
    distinct shingle with the eval set, with the count of distinct
    shared shingles.

    Scale shape: the candidate generator is a semi-equi-join of train
    shingles against the DISTINCT eval shingle set. The eval side is
    benchmarks — thousands of documents, not billions — so its
    distinct-shingle relation broadcasts, so the train side pays one
    scan, a map-side join, and a single aggregation shuffle by doc id.
    ``max_shingle_freq`` additionally drops train-side stop-shingles
    (boilerplate present in >N docs) the way ngram_jaccard_pairs does;
    production uses n in 8..13 where natural-language n-grams are
    near-unique. ``eager=False`` skips the shingle-table persist and
    the result checkpoint (plan inspection / composition into a larger
    cached pipeline).
    """
    # NULL eval_pred means "not eval" — without the coalesce a NULL
    # verdict would drop the doc from BOTH sides (train and eval filters
    # both reject NULL), silently excluding it from leak detection.
    # This matches recipe.curate_corpus, which already coalesces.
    eval_pred = F.coalesce(eval_pred.cast("boolean"), F.lit(False))
    # Materialize the COMPACT (id, is_eval, shingle-array) table ONCE:
    # the train side, the eval side, and (with the cap) the frequency
    # aggregation are three DAG branches that would otherwise each
    # re-scan and re-shingle the full corpus. Caching pre-explode
    # stores each shingle once, not once per exploded row — the same
    # design ngram_jaccard_pairs carries.
    base = ensure_parallelism(
        docs.select(id_col, text_col, eval_pred.alias("__is_eval"))
    ).select(
        F.col(id_col).alias("id"),
        "__is_eval",
        shingle_expr(F.split(F.lower(F.trim(F.col(text_col))), r"\s+"), n).alias("sh"),
    )
    if eager:
        base = base.persist()
        base.count()
    sh = base.select("id", "__is_eval", F.explode("sh").alias("shingle"))
    train = sh.filter(~F.col("__is_eval")).select("id", "shingle")
    if max_shingle_freq is not None:
        keep = (
            train.groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("__df"))
            .filter(F.col("__df") <= max_shingle_freq)
            .select("shingle")
        )
        train = train.join(keep, "shingle")
    eval_sh = sh.filter(F.col("__is_eval")).select("shingle").distinct()
    out = (
        train.join(F.broadcast(eval_sh), "shingle")
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    if eager:
        # doc-count-bounded result: materialize it, release the cache
        out = out.localCheckpoint(eager=True)
        base.unpersist()
    return out


#: PII patterns — the common Java-regex/RE2 subset so the DuckDB oracle
#: applies the byte-identical expressions (no lookaround, ASCII \b).
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\+\d{1,2}-\d{3}-\d{4}"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"


def pii_scrub(
    docs: DataFrame,
    id_col: str,
    text_col: str,
) -> DataFrame:
    """Detect and redact PII-shaped spans (emails, phone numbers,
    IPv4 addresses) — the privacy pass of a training-data pipeline.

    Returns ``(id, n_emails, n_phones, n_ips, scrubbed, scrub_len)``
    where ``scrubbed`` replaces each span class with a typed tag.
    Pure scan-side regexp expressions (regexp_extract_all /
    regexp_replace) — no data-dependent shuffle, embarrassingly
    parallel at any corpus size (the only Exchange ever in the plan is
    ensure_parallelism's round-robin fan-out of an under-split local
    input, a no-op on real many-file corpora). Redaction order is fixed
    email → phone → ip so nested-ish matches resolve identically
    everywhere.
    """
    t = F.col(text_col)
    scrubbed = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(t, EMAIL_RE, "<EMAIL>"),
            PHONE_RE, "<PHONE>"),
        IPV4_RE, "<IP>")
    return ensure_parallelism(docs).select(
        F.col(id_col).alias("id"),
        F.size(F.regexp_extract_all(t, F.lit(EMAIL_RE), 0)).cast("long").alias("n_emails"),
        F.size(F.regexp_extract_all(t, F.lit(PHONE_RE), 0)).cast("long").alias("n_phones"),
        F.size(F.regexp_extract_all(t, F.lit(IPV4_RE), 0)).cast("long").alias("n_ips"),
        scrubbed.alias("scrubbed"),
        F.length(scrubbed).cast("long").alias("scrub_len"),
    )


def remove_boilerplate_lines(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    max_line_docs: int = 3,
    min_line_chars: int = 10,
    eager: bool = True,
) -> DataFrame:
    """C4-style line-level boilerplate removal: a (trimmed) line that
    appears in MORE than ``max_line_docs`` distinct documents is
    corpus boilerplate (cookie banners, nav menus, license footers)
    and is stripped from every document; the survivors are reassembled
    in their original order. Lines shorter than ``min_line_chars``
    are never counted as boilerplate (blank/short separators stay).

    Output: (id, clean_text, n_lines, n_removed). A document whose
    every line was boilerplate survives with empty clean_text, and a
    NULL text is treated as '' — the row is never silently dropped.

    Scale: posexplode → one distinct-count shuffle on the line string
    → frequency filter → antijoin the lines table → one per-doc
    reassembly shuffle. The boilerplate relation is left unbroadcast:
    its size is corpus-dependent and the optimizer measures it.
    ``eager`` (the decontaminate pattern) persists the compact split
    table so the three plan branches (frequency, keep, totals) split
    the corpus once instead of three times, and materializes the
    result before unpersisting; at true corpus scale pass
    ``eager=False`` and write the (single-consumer) result straight to
    a sink. The whole rule is engine-portable SQL
    (remove_boilerplate_sql)."""
    base = docs.select(
        F.col(id_col).alias("id"),
        F.split(F.coalesce(F.col(text_col), F.lit("")), "\n").alias("arr"),
    )
    if eager:
        base = base.persist()
    lines = base.select(
        "id", F.posexplode("arr").alias("pos", "line"),
    ).withColumn("key", F.trim(F.col("line")))
    boiler = (
        lines.filter(F.length("key") >= min_line_chars)
        .groupBy("key")
        .agg(F.countDistinct("id").alias("nd"))
        .filter(F.col("nd") > max_line_docs)
        .select("key")
    )
    kept = lines.join(boiler, "key", "left_anti")
    rebuilt = kept.groupBy("id").agg(
        F.concat_ws(
            "\n",
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "line"))),
                lambda s: s["line"],
            ),
        ).alias("clean_text"),
        F.count(F.lit(1)).alias("n_kept"),
    )
    totals = base.select("id", F.size("arr").alias("n_lines"))
    out = (
        totals.join(rebuilt, "id", "left")
        .select(
            "id",
            F.coalesce("clean_text", F.lit("")).alias("clean_text"),
            "n_lines",
            (F.col("n_lines") - F.coalesce("n_kept", F.lit(0)))
            .alias("n_removed"),
        )
    )
    if eager:
        out = out.localCheckpoint(eager=True)
        base.unpersist()
    return out


def remove_boilerplate_sql(
    table: str, id_col: str, text_col: str,
    max_line_docs: int = 3, min_line_chars: int = 10,
) -> str:
    """DuckDB mirror of remove_boilerplate_lines (same trimming,
    thresholds, ordering, and empty-doc preservation)."""
    return f"""
WITH split AS (
  SELECT {id_col} AS id,
         str_split(COALESCE({text_col}, ''), chr(10)) AS arr FROM {table}
), lines0 AS (
  -- parallel unnest zips positions with lines (DuckDB semantics)
  SELECT id, unnest(generate_series(1, len(arr))) - 1 AS pos,
         unnest(arr) AS line
  FROM split
), lines AS (
  SELECT id, pos, line, trim(line) AS key FROM lines0
), boiler AS (
  SELECT key FROM lines
  WHERE length(key) >= {min_line_chars}
  GROUP BY key HAVING COUNT(DISTINCT id) > {max_line_docs}
), kept AS (
  SELECT * FROM lines WHERE key NOT IN (SELECT key FROM boiler)
), rebuilt AS (
  SELECT id, string_agg(line, chr(10) ORDER BY pos) AS clean_text,
         COUNT(*) AS n_kept
  FROM kept GROUP BY id
), totals AS (
  SELECT id, COUNT(*) AS n_lines FROM lines GROUP BY id
)
SELECT totals.id, COALESCE(rebuilt.clean_text, '') AS clean_text,
       totals.n_lines, totals.n_lines - COALESCE(rebuilt.n_kept, 0) AS n_removed
FROM totals LEFT JOIN rebuilt ON totals.id = rebuilt.id
"""
