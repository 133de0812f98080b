"""Streaming parity: the same declarative plans over readStream must
produce the batch answer once the finite file source is drained."""

import pytest
from pyspark.sql import functions as F

from andl_spark.session import load_tables
from andl_spark.streaming.events import (
    read_events_stream,
    run_stream_to_memory,
    sessionize,
    stateful_running_count,
    windowed_agg,
)

from conftest import SF_SMOKE


@pytest.fixture(scope="module")
def events_batch(spark):
    return load_tables(spark, SF_SMOKE, register_views=False)["events"]


def _as_sorted_rows(df, cols):
    return sorted(tuple(r) for r in df.select(*cols).collect())


def test_windowed_agg_stream_matches_batch(spark, events_batch):
    batch = windowed_agg(events_batch)
    stream = windowed_agg(read_events_stream(spark, SF_SMOKE))
    assert stream.isStreaming
    run_stream_to_memory(stream, "win_agg")
    got = spark.table("win_agg")
    cols = ["window_start", "event_type", "n", "total_value"]
    assert _as_sorted_rows(got, cols) == _as_sorted_rows(batch, cols)


def test_sessionize_stream_matches_batch(spark, events_batch):
    batch = sessionize(events_batch)
    stream = sessionize(read_events_stream(spark, SF_SMOKE))
    run_stream_to_memory(stream, "sessions")
    got = spark.table("sessions")
    cols = ["user_id", "t_start", "t_end", "n_events"]
    assert _as_sorted_rows(got, cols) == _as_sorted_rows(batch, cols)


def test_stateful_running_count(spark, events_batch):
    stream = stateful_running_count(read_events_stream(spark, SF_SMOKE, max_files_per_trigger=1))
    q = (
        stream.writeStream.format("memory").queryName("running_counts")
        .outputMode("update").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = {r["user_id"]: r["n_events"] for r in spark.table("running_counts").collect()}
    want = {
        r["user_id"]: r["n"]
        for r in events_batch.groupBy("user_id").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    # final state per user must equal the batch count
    assert got == want


def test_dedup_stream_within_watermark(spark, events_batch):
    """Streaming dedup: the same source unioned with itself (every row
    duplicated) must come out exactly once — and equal the batch
    distinct-on-key result."""
    from andl_spark.streaming.events import dedup_stream

    src = read_events_stream(spark, SF_SMOKE)
    doubled = src.union(read_events_stream(spark, SF_SMOKE))
    stream = dedup_stream(doubled, keys=["event_id"])
    q = (
        stream.writeStream.format("memory").queryName("dedup_ev")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = spark.table("dedup_ev")
    assert got.count() == events_batch.select("event_id").distinct().count()
    assert got.select("event_id").distinct().count() == got.count()
    # batch fallback gives the same relation
    assert dedup_stream(events_batch, keys=["event_id"]).count() == got.count()


def test_stream_static_enrichment(spark, events_batch):
    """Stream-static join: events enriched with the customer dimension
    must match the same join run in batch (no state, broadcast dim)."""
    from andl_spark.session import load_tables
    from andl_spark.streaming.events import enrich_with_dim

    dim = (
        load_tables(spark, SF_SMOKE, register_views=False)["customer"]
        .select(F.col("c_custkey").alias("user_id"), "c_name", "c_mktsegment")
    )
    stream = enrich_with_dim(read_events_stream(spark, SF_SMOKE), dim, on="user_id")
    q = (
        stream.writeStream.format("memory").queryName("enriched")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = spark.table("enriched")
    want = enrich_with_dim(events_batch, dim, on="user_id")
    cols = ["event_id", "user_id", "c_name", "c_mktsegment"]
    assert got.count() == events_batch.count()  # left join preserves rows
    assert _as_sorted_rows(got.select(*cols), cols) == _as_sorted_rows(want.select(*cols), cols)


def test_sliding_window_stream_matches_batch(spark, events_batch):
    """1-hour window hopping every 30 min: stream result equals batch,
    and every event lands in exactly 2 overlapping windows."""
    cols = ["window_start", "event_type", "n", "total_value"]
    stream = windowed_agg(read_events_stream(spark, SF_SMOKE), slide="30 minutes")
    run_stream_to_memory(stream, "slide_agg")
    got = spark.table("slide_agg")
    want = windowed_agg(events_batch, slide="30 minutes")
    assert _as_sorted_rows(got, cols) == _as_sorted_rows(want, cols)
    n_events = events_batch.count()
    assert got.agg(F.sum("n")).first()[0] == 2 * n_events


def test_asof_enrichment_stream_matches_batch(spark, events_batch, tmp_path):
    """Streaming point-in-time enrichment: every event picks up the
    state row in force at its own timestamp; the per-micro-batch
    foreachBatch result equals the one-shot batch as-of join exactly
    (micro-batch boundaries are invisible against static state)."""
    from andl_spark.operators.asof import asof_join
    from andl_spark.streaming.events import asof_enrich_stream

    # synthetic slowly-changing state: each user upgrades bronze→silver
    # 12h after their first event (derived in batch, purely static)
    ev = events_batch.filter(F.col("user_id") < 30).select(
        "event_id", "user_id", "ts", "value")
    t0 = ev.groupBy("user_id").agg(F.min("ts").alias("ts"))
    state = (
        t0.withColumn("tier", F.lit("bronze"))
        .union(
            t0.select(
                "user_id",
                (F.col("ts") + F.expr("INTERVAL 12 HOURS")).alias("ts"),
            ).withColumn("tier", F.lit("silver")))
        .select("user_id", "ts", "tier")
    )
    out_dir, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    stream = read_events_stream(spark, SF_SMOKE).filter(F.col("user_id") < 30).select(
        "event_id", "user_id", "ts", "value")
    q = asof_enrich_stream(
        stream, state, on=["user_id"], ts="ts", value_cols=["tier"],
        out_path=out_dir, checkpoint=ckpt)
    q.awaitTermination(120)

    got = spark.read.parquet(out_dir)
    want = asof_join(ev, state, on=["user_id"], ts="ts", value_cols=["tier"])
    cols = ["event_id", "user_id", "asof_tier"]
    assert got.count() == ev.count()
    assert _as_sorted_rows(got, cols) == _as_sorted_rows(want, cols)
    # every user's first event is already bronze (state starts at min ts)
    assert got.filter(F.col("asof_tier").isNull()).count() == 0
    assert {r[0] for r in got.select("asof_tier").distinct().collect()} == {
        "bronze", "silver"}

    # replay idempotence: foreachBatch is at-least-once, so re-running
    # the same input against the SAME sink (fresh checkpoint = every
    # batch replays) must overwrite per-batch partitions, not append
    q2 = asof_enrich_stream(
        stream, state, on=["user_id"], ts="ts", value_cols=["tier"],
        out_path=out_dir, checkpoint=str(tmp_path / "ckpt2"))
    q2.awaitTermination(120)
    again = spark.read.parquet(out_dir)
    assert again.count() == ev.count()  # no duplicate rows after replay
    assert _as_sorted_rows(again, cols) == _as_sorted_rows(want, cols)
