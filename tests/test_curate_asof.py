"""As-of join semantics/plan shape and corpus-curation operators
(decontamination, PII scrub) — the r3 additions to SURVEY §2.8."""

import pytest
from pyspark.sql import functions as F

from andl_spark.operators.asof import asof_join
from andl_spark.pipeline import curate as C


@pytest.fixture(scope="module")
def state(spark):
    # (key, ts, price, seq): two keys, out-of-order inserts, a tie at ts=20
    rows = [
        ("a", 10, 1.0, 1), ("a", 20, 2.0, 2), ("a", 20, 3.0, 3), ("a", 40, 4.0, 4),
        ("b", 15, 9.0, 5),
    ]
    return spark.createDataFrame(rows, "k string, ts long, price double, seq long")


@pytest.fixture(scope="module")
def probe(spark):
    rows = [("a", 5), ("a", 20), ("a", 25), ("a", 99), ("b", 14), ("b", 16)]
    return spark.createDataFrame(rows, "k string, ts long")


def test_asof_join_semantics(probe, state):
    out = asof_join(probe, state, on=["k"], ts="ts", value_cols=["price"], tie_col="seq")
    got = {(r["k"], r["ts"]): r["asof_price"] for r in out.collect()}
    assert got == {
        ("a", 5): None,     # before any state row
        ("a", 20): 3.0,     # tie at ts=20 → greatest seq wins, deterministic
        ("a", 25): 3.0,
        ("a", 99): 4.0,
        ("b", 14): None,
        ("b", 16): 9.0,
    }
    assert out.count() == probe.count()  # every probe row survives


def test_asof_join_tolerance(probe, state):
    out = asof_join(probe, state, on=["k"], ts="ts",
                    value_cols=["price"], tie_col="seq", tolerance=10)
    got = {(r["k"], r["ts"]): r["asof_price"] for r in out.collect()}
    # ("a", 99)'s match at ts=40 is 59 ticks stale → nulled
    assert got[("a", 99)] is None and got[("a", 25)] == 3.0


def test_asof_join_plan_single_key_shuffle(probe, state):
    """The union+window formulation: no join node at all (so no
    range-join explosion is even possible) — the only exchanges are
    hash partitioning on the key."""
    plan = asof_join(
        probe, state, on=["k"], ts="ts", value_cols=["price"]
    )._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "SortMergeJoin" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert plan.count("Exchange hashpartitioning") == 1


def test_asof_bucketed_matches_single_window(probe, state):
    """bucket_width's two-pass plan (bucket-local window + carry-in
    forward fill) returns exactly the single-window answer, and its
    windows partition on (key, bucket) so a hot key can never
    serialize into one partition."""
    plain = asof_join(probe, state, on=["k"], ts="ts",
                      value_cols=["price"], tie_col="seq")
    for width in (1, 8, 1000):  # incl. width larger than the ts range
        bucketed = asof_join(probe, state, on=["k"], ts="ts",
                             value_cols=["price"], tie_col="seq",
                             bucket_width=width)
        assert sorted(map(tuple, bucketed.collect())) == \
            sorted(map(tuple, plain.collect())), f"width={width}"
    plan = asof_join(probe, state, on=["k"], ts="ts", value_cols=["price"],
                     bucket_width=8)._jdf.queryExecution().executedPlan().toString()
    assert "__bkt" in plan and "CartesianProduct" not in plan


def test_asof_value_col_clash_rejected(probe, state):
    with pytest.raises(ValueError, match="alias"):
        # 'price' as a probe column would be silently merged by the union
        asof_join(probe.withColumn("price", F.lit(0.0)), state,
                  on=["k"], ts="ts", value_cols=["price"])


def test_asof_null_values_not_backfilled(spark):
    """A NULL value in the MATCHING state row stays NULL — it must not
    be back-filled from an older row — and multiple value columns all
    come from the same matched row (never a mix of rows)."""
    state = spark.createDataFrame(
        [("k", 10, 1.0, 7.0), ("k", 30, None, 8.0)],
        "k string, ts long, price double, qty double")
    probe = spark.createDataFrame([("k", 35)], "k string, ts long")
    row = asof_join(probe, state, on=["k"], ts="ts",
                    value_cols=["price", "qty"]).collect()[0]
    # matching row is ts=30: price NULL (not 1.0 from ts=10), qty 8.0
    assert row["asof_price"] is None and row["asof_qty"] == 8.0


def test_asof_bucketed_keeps_null_key_and_ts_rows(spark):
    """Regression: bucketed mode must not lose probe rows with a NULL
    key or NULL ts to its inner equi-joins — they take the
    single-window fallback / sentinel bucket and match plain mode."""
    state = spark.createDataFrame(
        [(None, 10, 1.0), (1, None, 2.0), (1, 20, 3.0)],
        "k int, ts int, price double")
    probe = spark.createDataFrame(
        [(None, 15), (1, None), (1, 5), (1, 25), (None, None)],
        "k int, ts int")
    plain = asof_join(probe, state, on=["k"], ts="ts", value_cols=["price"])
    bucketed = asof_join(probe, state, on=["k"], ts="ts",
                         value_cols=["price"], bucket_width=8)
    key = lambda r: [(x is not None, x or 0) for x in r]
    assert bucketed.count() == probe.count()
    assert sorted(map(tuple, bucketed.collect()), key=key) == \
        sorted(map(tuple, plain.collect()), key=key)


def test_asof_chaining_clash_rejected(probe, state):
    """Chained enrichment must not silently overwrite a prior asof_<c>."""
    first = asof_join(probe, state, on=["k"], ts="ts", value_cols=["price"])
    with pytest.raises(ValueError, match="alias"):
        asof_join(first, state, on=["k"], ts="ts", value_cols=["price"])


def test_asof_tolerance_on_timestamps(spark):
    """tolerance works for timestamp ts columns (unit: seconds)."""
    state = spark.createDataFrame(
        [("k", "2024-01-01 00:00:00", 1.0)],
        "k string, ts string, price double").withColumn("ts", F.col("ts").cast("timestamp"))
    probe = spark.createDataFrame(
        [("k", "2024-01-01 00:00:30"), ("k", "2024-01-01 00:02:00")],
        "k string, ts string").withColumn("ts", F.col("ts").cast("timestamp"))
    out = asof_join(probe, state, on=["k"], ts="ts",
                    value_cols=["price"], tolerance=60)
    got = sorted((str(r["ts"]), r["asof_price"]) for r in out.collect())
    assert got[0][1] == 1.0 and got[1][1] is None  # 30s fresh, 120s stale


try:
    from hypothesis import HealthCheck, given, settings, strategies as st

    _key = st.one_of(st.none(), st.integers(0, 2))
    _ts = st.one_of(st.none(), st.integers(0, 50))
    _probe_rows = st.lists(st.tuples(_key, _ts), min_size=0, max_size=10)
    _state_rows = st.lists(
        st.tuples(_key, _ts, st.one_of(st.none(), st.integers(0, 9))),
        min_size=0, max_size=10)

    def _nsort(rows):
        # sortable despite NULL keys/ts/values (None < any int)
        return sorted(rows, key=lambda t: [(x is not None, x or 0) for x in t])

    @settings(max_examples=8, deadline=None,
              suppress_health_check=[HealthCheck.function_scoped_fixture,
                                     HealthCheck.too_slow])
    @given(p=_probe_rows, s=_state_rows)
    def test_asof_join_matches_bruteforce(spark, p, s):
        """Property: for random keys/ts/NULLs — including NULL keys
        (their own group, as Window.partitionBy groups them) and NULL
        ts (sorts before every real ts) — the distributed as-of join
        equals the obvious per-row brute force (max-ts state row
        at-or-before the probe, greatest seq on ties, its value even
        when NULL)."""
        s = [(k, ts, v, i) for i, (k, ts, v) in enumerate(s)]
        probe = spark.createDataFrame(p, "k int, ts int") if p else \
            spark.createDataFrame([], "k int, ts int")
        state = spark.createDataFrame(s, "k int, ts int, v int, seq int") if s else \
            spark.createDataFrame([], "k int, ts int, v int, seq int")
        got = _nsort(
            (r["k"], r["ts"], r["asof_v"])
            for r in asof_join(probe, state, on=["k"], ts="ts",
                               value_cols=["v"], tie_col="seq").collect()
        )
        def brute(k, ts):
            # NULL state ts precedes everything; a NULL probe ts only
            # sees NULL-ts state rows (state sorts first on the tie)
            cand = [r for r in s if r[0] == k and
                    (r[1] is None or (ts is not None and r[1] <= ts))]
            if not cand:
                return None
            return max(cand, key=lambda r: (r[1] is not None, r[1] or 0, r[3]))[2]
        want = _nsort((k, ts, brute(k, ts)) for k, ts in p)
        assert got == want
        # the skew-proof bucketed plan must give identical results —
        # NULL keys route through its single-window fallback branch
        got_b = _nsort(
            (r["k"], r["ts"], r["asof_v"])
            for r in asof_join(probe, state, on=["k"], ts="ts",
                               value_cols=["v"], tie_col="seq",
                               bucket_width=7).collect()
        )
        assert got_b == want
except ImportError:  # hypothesis is expected in this container
    pass


@pytest.fixture(scope="module")
def corpus(spark):
    """4 train docs, 2 eval docs; train doc 10 copies eval text, train
    doc 11 shares a 4-word boilerplate run with eval, 12/13 clean."""
    rows = [
        (0, "alpha beta gamma delta epsilon zeta", True),
        (1, "one two three four five six seven", True),
        (10, "alpha beta gamma delta epsilon zeta", False),   # full copy
        (11, "xx one two three four yy zz ww", False),         # one shared 4-gram
        (12, "totally different words here entirely", False),
        (13, "nothing in common with anything else", False),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, is_eval boolean")


def test_decontaminate_flags_leaks(corpus):
    out = C.decontaminate(corpus, "doc_id", "text", F.col("is_eval"), n=4)
    got = {r["id"]: r["n_shared"] for r in out.collect()}
    # doc 10: 3 distinct 4-grams of a 6-word text, all shared
    assert got == {10: 3, 11: 1}


def test_decontaminate_stop_shingle_cap(corpus, spark):
    """A boilerplate shingle present in > max_shingle_freq train docs
    is dropped from the candidate join (the fan-out lever)."""
    boiler = [(100 + i, "one two three four boiler " + str(i), False) for i in range(5)]
    big = corpus.union(spark.createDataFrame(
        boiler, "doc_id long, text string, is_eval boolean"))
    uncapped = C.decontaminate(big, "doc_id", "text", F.col("is_eval"), n=4)
    capped = C.decontaminate(big, "doc_id", "text", F.col("is_eval"), n=4,
                             max_shingle_freq=3)
    assert uncapped.count() == 2 + 5          # the 5 boilerplate docs all flagged
    flagged = {r["id"] for r in capped.collect()}
    # capped: 'one two three four' sits in 6 > 3 train docs → dropped,
    # which also clears doc 11 (its only overlap WAS that boilerplate)
    assert flagged == {10}


def test_decontaminate_plan_broadcasts_eval_side(corpus):
    """The eval distinct-shingle relation must arrive at the train side
    as a broadcast (map-side) join — a shuffled join here would move
    the full train shingle table at corpus scale."""
    plan = C.decontaminate(
        corpus, "doc_id", "text", F.col("is_eval"), n=4, eager=False
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan and "CartesianProduct" not in plan


def test_pii_scrub_exact(spark):
    df = spark.createDataFrame(
        [(1, "mail bob.smith+x@corp.example.org or call +1-555-0142 from 192.168.0.1 ok"),
         (2, "no pii here at all")],
        "doc_id long, text string")
    out = {r["id"]: r for r in C.pii_scrub(df, "doc_id", "text").collect()}
    assert (out[1]["n_emails"], out[1]["n_phones"], out[1]["n_ips"]) == (1, 1, 1)
    assert out[1]["scrubbed"] == "mail <EMAIL> or call <PHONE> from <IP> ok"
    assert (out[2]["n_emails"], out[2]["n_phones"], out[2]["n_ips"]) == (0, 0, 0)
    assert out[2]["scrubbed"] == "no pii here at all"


def test_pii_scrub_idempotent(spark):
    """Scrubbing already-scrubbed text is a no-op (tags match no
    pattern) — safe to re-run the pass over a partially-clean corpus."""
    df = spark.createDataFrame([(1, "x a@b.co y +1-555-1234 z 10.0.0.1")],
                               "doc_id long, text string")
    once = C.pii_scrub(df, "doc_id", "text").select(
        F.col("id").alias("doc_id"), F.col("scrubbed").alias("text"))
    twice = C.pii_scrub(once, "doc_id", "text").collect()[0]
    assert twice["scrubbed"] == once.collect()[0]["text"]
    assert (twice["n_emails"], twice["n_phones"], twice["n_ips"]) == (0, 0, 0)

def test_remove_boilerplate_lines_matches_sql_oracle(spark):
    """C4-style line-level boilerplate: a footer shared by >3 docs is
    stripped everywhere, order and short separators are preserved, an
    all-boilerplate doc survives with empty text, and the whole result
    equals the DuckDB mirror row for row."""
    import duckdb

    footer = "subscribe to our newsletter today"
    rows = [(i, f"unique line {i} alpha\n\n{footer}\nline {i} beta")
            for i in range(5)]
    rows.append((10, footer))                   # all-boilerplate doc
    rows.append((11, "standalone content only"))
    rows.append((12, None))                     # NULL text — kept
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["id"]: (r["clean_text"], r["n_lines"], r["n_removed"])
           for r in C.remove_boilerplate_lines(
               df, "doc_id", "text").collect()}
    assert got[0] == ("unique line 0 alpha\n\nline 0 beta", 4, 1)
    assert got[10] == ("", 1, 1)                # preserved, emptied
    assert got[11] == ("standalone content only", 1, 0)
    assert got[12] == ("", 1, 0)                # NULL text never dropped
    con = duckdb.connect()
    con.register("docs_tbl", df.toPandas())
    want = con.execute(C.remove_boilerplate_sql(
        "docs_tbl", "doc_id", "text")).fetchall()
    assert {t[0]: tuple(t[1:]) for t in want} == got
    con.close()


def test_asof_tolerance_nulls_unknown_age_matches(spark):
    """A state row with NULL ts can be picked as the running match (it
    sorts first); under a tolerance its age is unknown, so it must NOT
    survive the staleness bound — while staying distinct from the
    no-match case (both read as NULL value, but no probe row is lost)."""
    state = spark.createDataFrame(
        [("a", None, 5.0, 1)], "k string, ts long, price double, seq long")
    probe = spark.createDataFrame([("a", 10)], "k string, ts long")
    # without tolerance the NULL-ts row IS the last state row seen
    loose = asof_join(probe, state, on=["k"], ts="ts",
                      value_cols=["price"], tie_col="seq")
    assert loose.collect()[0]["asof_price"] == 5.0
    # with tolerance its age is unknowable -> nulled
    tight = asof_join(probe, state, on=["k"], ts="ts",
                      value_cols=["price"], tie_col="seq", tolerance=100)
    rows = tight.collect()
    assert len(rows) == 1 and rows[0]["asof_price"] is None


def test_decontaminate_null_eval_pred_is_train(spark):
    """NULL eval_pred = not eval: the doc still participates as a TRAIN
    doc (can be flagged as a leak) instead of silently vanishing from
    both sides — matching recipe.curate_corpus's coalesce semantics."""
    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta", True),
         (2, "alpha beta gamma delta", None),   # NULL verdict
         (3, "totally unrelated words here", None)],
        "doc_id long, text string, is_eval boolean")
    out = C.decontaminate(docs, "doc_id", "text", F.col("is_eval"), n=4)
    got = {r["id"]: r["n_shared"] for r in out.collect()}
    assert got == {2: 1}  # doc 2 is train-side and leaks; doc 3 clean
