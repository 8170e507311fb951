"""Multimodal column handling: media as opaque ``binary`` + typed
metadata, processed with Arrow-batched ``mapInPandas`` (BASELINE.json
north star).

The container has no image/audio/video libraries, so the decode kernels
are STUBBED (deterministic fakes / NotImplementedError) — but the
Spark-side plumbing is real and tested: schema contract, batch
iteration shape, partition-preserving transforms, binary hashing and
metadata derivation. Swapping a stub for Pillow/librosa/pyav changes
only the inner function body.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = ("doc_id long, media_type string, blob binary, "
                "width int, height int, n_frames int")

FEATURE_SCHEMA = ("doc_id long, media_type string, feat_dim int, "
                  "features array<float>")


def attach_fake_media(docs: DataFrame) -> DataFrame:
    """Derive a deterministic opaque blob + metadata from `documents`
    (test stand-in for an image/audio column; real pipelines read the
    bytes from parquet/tar shards)."""
    blob = F.encode(F.col("text"), "utf-8")
    return docs.select(
        "doc_id",
        F.when(F.col("doc_id") % 3 == 0, "image/png")
         .when(F.col("doc_id") % 3 == 1, "audio/wav")
         .otherwise("video/mp4").alias("media_type"),
        blob.alias("blob"),
        (F.octet_length(blob) % 640).cast("int").alias("width"),
        (F.octet_length(blob) % 480).cast("int").alias("height"),
        (F.col("doc_id") % 32).cast("int").alias("n_frames"))


def _fake_decode(blob: bytes, media_type: str, dim: int) -> list[float]:
    """STUB decode→feature kernel. A real implementation would decode
    the media (Pillow/librosa/pyav) and run feature extraction; the
    container lacks those libs, so this produces a deterministic
    byte-histogram feature instead — same shape, same contract."""
    hist = [0.0] * dim
    for b in blob:
        hist[b % dim] += 1.0
    total = sum(hist) or 1.0
    return [h / total for h in hist]


def extract_media_features(media: DataFrame, dim: int = 16) -> DataFrame:
    """Arrow-batched feature extraction over the binary column.

    ``mapInPandas`` streams record batches through Python once —
    the expensive decode runs vectorized per batch, partition-parallel,
    with no driver collect. At 100 TB this is the only viable shape:
    executors each decode their partition's blobs.
    """
    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "media_type": pdf["media_type"],
                "feat_dim": dim,
                "features": [
                    _fake_decode(blob, mt, dim)
                    for blob, mt in zip(pdf["blob"], pdf["media_type"])
                ],
            })

    return media.mapInPandas(batches, schema=FEATURE_SCHEMA)


def frame_sample(media: DataFrame, every_n: int = 8) -> DataFrame:
    """Frame-sampling plumbing for video rows: one output row per
    sampled frame index — pure expressions (sequence + explode), the
    decode of the actual frame bytes being the stubbed kernel above."""
    return (media
            .filter(F.col("media_type") == "video/mp4")
            .select("doc_id", "media_type",
                    F.explode(F.sequence(
                        F.lit(0),
                        F.greatest(F.col("n_frames") - 1, F.lit(0)),
                        F.lit(every_n))).alias("frame_idx")))


def decode_image(blob: bytes) -> "object":
    """Real image decode — unavailable in this container."""
    raise NotImplementedError(
        "image decoding requires Pillow/opencv, not present in the "
        "container; use extract_media_features' stub kernel for tests")
