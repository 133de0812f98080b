"""Multimodal (image/audio/video) columns as opaque binary + typed
metadata, with Spark-side plumbing that is real and tested while the
codec step itself is stubbed (no image/audio libraries in this
container).

Design (SURVEY.md §2.8): a media table is
    (media_id long, kind string, payload binary,
     meta struct<width int, height int, sample_rate int, n_frames int>)
Payloads are processed with ``mapInPandas`` so each Arrow batch of
binary blobs reaches Python exactly once, vectorized; decode output is
a fixed-width feature column that downstream ops (ANN, dedup) consume.

At 100 TB: binary columns stay columnar in parquet; repartition by
media_id before decode so batches are balanced; decoded features are
orders of magnitude smaller than payloads — project early, decode
late.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, "
    "meta struct<width:int, height:int, sample_rate:int, n_frames:int>"
)

FEATURE_SCHEMA = "media_id long, kind string, n_bytes long, features array<double>"


def synthesize_media(spark, n: int = 64) -> DataFrame:
    """Deterministic fake media table (in lieu of real blobs): payload
    bytes derived from media_id — stable across runs and engines."""
    df = spark.range(n).select(
        F.col("id").alias("media_id"),
        F.element_at(F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
                     (F.col("id") % 3 + 1).cast("int")).alias("kind"),
        F.encode(F.concat(F.lit("payload-"), F.sha2(F.col("id").cast("string"), 256)), "utf-8")
        .alias("payload"),
        F.struct(
            (F.col("id") % 640 + 1).cast("int").alias("width"),
            (F.col("id") % 480 + 1).cast("int").alias("height"),
            F.lit(16000).cast("int").alias("sample_rate"),
            (F.col("id") % 30 + 1).cast("int").alias("n_frames"),
        ).alias("meta"),
    )
    return df


def decode_image(payload: bytes, meta) -> list[float]:
    """STUB — real implementation needs an image codec (PIL/cv2), not
    present in this container. The deterministic fake below keeps the
    pipeline testable; swap the body for the real decoder in prod."""
    raise NotImplementedError("image codec not available in this environment")


def _fake_features(payload: bytes, dim: int = 8) -> list[float]:
    """Deterministic stand-in for decode→embed: byte-histogram moments.
    Same contract as a real extractor: fixed-dim array<double>."""
    if not payload:
        return [0.0] * dim
    return [float(sum(payload[i::dim]) % 997) for i in range(dim)]


def extract_features(media: DataFrame, dim: int = 8, use_stub: bool = True) -> DataFrame:
    """Vectorized decode/feature-extract over Arrow batches.

    ``use_stub=False`` routes to the real (NotImplemented) codec so the
    call-site contract is explicit."""

    def _stub(payload: bytes) -> list[float]:
        if not payload:
            return [0.0] * dim
        return [float(sum(payload[i::dim]) % 997) for i in range(dim)]

    def _real(payload: bytes):
        raise NotImplementedError("image codec not available in this environment")

    # Self-contained closure: executors of driver-owned sessions can't
    # import andl_spark, so no module-level references allowed here.
    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            feats = [
                _stub(p) if use_stub else _real(p)
                for p in pdf["payload"]
            ]
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "n_bytes": pdf["payload"].map(len).astype("int64"),
                "features": feats,
            })

    # Decode late: only the columns the extractor needs reach Python.
    slim = media.select("media_id", "kind", "payload")
    return slim.mapInPandas(run, FEATURE_SCHEMA)


def frame_sample(media: DataFrame, every_nth: int = 5) -> DataFrame:
    """Video frame-sampling plumbing: one output row per sampled frame
    index (explode of a JVM sequence — the actual frame decode would
    plug into extract_features on the per-frame payload)."""
    frames = F.sequence(F.lit(0), F.col("meta.n_frames") - 1, F.lit(every_nth))
    return media.filter(F.col("kind") == "video").select(
        "media_id", F.explode(frames).alias("frame_idx"), "meta"
    )
