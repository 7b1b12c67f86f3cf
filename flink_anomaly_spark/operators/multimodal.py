"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata.

The Spark-side machinery (schemas, partitioning, Arrow batch shapes,
mapInPandas signatures) is real and tested; the actual media decoding
is STUBBED — the image/audio libraries are not in this container, so
``decode_image_stub`` derives deterministic fake features from the
bytes. Swap `_fake_decode` for a real decoder (PIL/torchaudio/ffmpeg)
without touching any Spark plumbing.

Scale design: media bytes stay in executor memory only for the life of
one Arrow batch (`mapInPandas` iterator — never a full-partition
materialization); feature extraction drops the bytes as early as
possible so shuffles carry only features.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from flink_anomaly_spark.partitioning import spread

#: canonical multimodal record: opaque payload + typed metadata
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
    ]
)

FEATURE_SCHEMA = (
    "media_id long, kind string, n_bytes long, sha256 string, "
    "feat array<double>, decode_ok boolean"
)


def documents_as_media(docs: DataFrame) -> DataFrame:
    """Build a deterministic media table from the documents table
    (UTF-8 bytes as the opaque payload) — the container has no real
    media files; the plumbing is identical."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("image").alias("kind"),
        F.encode("text", "UTF-8").alias("payload"),
        F.lit("application/octet-stream").alias("mime"),
        (F.col("n_chars") % 1920).cast("int").alias("width"),
        (F.col("n_chars") % 1080).cast("int").alias("height"),
        # every 5th doc doubles as a "video" with a derived duration so
        # the frame-sampling plan has rows to expand
        F.when(F.col("doc_id") % 5 == 0, F.col("n_chars") * 10)
        .otherwise(F.lit(None))
        .cast("long")
        .alias("duration_ms"),
    )


def _fake_decode(payload: bytes, dim: int = 8) -> list[float]:
    """Deterministic stand-in for a real decoder: derive `dim` floats in
    [0,1) from the sha256 of the payload. Replace with a real decode +
    feature extractor; the signature (bytes -> list[float]) is the
    contract."""
    if payload is None:
        raise NotImplementedError("real media decoding not available in this container")
    h = hashlib.sha256(payload).digest()
    return [int.from_bytes(h[4 * i : 4 * i + 4], "big") / 2**32 for i in range(dim)]


def extract_features(media: DataFrame, batch_hint: int | None = None) -> DataFrame:
    """mapInPandas feature extraction: Arrow-batched, per-partition
    iterator — payload bytes never outlive one batch."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, oks, shas = [], [], []
            for payload in pdf["payload"]:
                try:
                    feats.append(_fake_decode(bytes(payload)))
                    shas.append(hashlib.sha256(bytes(payload)).hexdigest())
                    oks.append(True)
                except (NotImplementedError, TypeError):
                    feats.append(None)
                    shas.append(None)
                    oks.append(False)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [len(bytes(p)) if p is not None else 0 for p in pdf["payload"]],
                    "sha256": shas,
                    "feat": feats,
                    "decode_ok": oks,
                }
            )

    return spread(media).mapInPandas(op, FEATURE_SCHEMA)


RESIZED_SCHEMA = (
    "media_id long, kind string, payload binary, mime string, "
    "width int, height int, duration_ms long"
)


def resize_images(media: DataFrame, target_w: int, target_h: int) -> DataFrame:
    """Resize plumbing: mapInPandas over the opaque payloads, emitting
    the same MEDIA_SCHEMA shape with updated dimensions.

    The pixel work is STUBBED (`_fake_resize` — no image libs in this
    container): it deterministically scales the payload length by the
    area ratio, which preserves the real operator's shape — batch
    iterator in, per-row bytes out, metadata updated — so swapping in
    PIL's ``Image.resize`` touches only the inner function.
    """

    def _fake_resize(payload: bytes, w0: int, h0: int) -> bytes:
        if payload is None:
            raise NotImplementedError("real decode+resize unavailable in this container")
        src_area = max((w0 or 1) * (h0 or 1), 1)
        ratio = min(1.0, (target_w * target_h) / src_area)
        n = max(1, int(len(payload) * ratio))
        return bytes(payload[:n])

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf.copy()
            out["payload"] = [
                _fake_resize(bytes(p) if p is not None else None, w, h)
                for p, w, h in zip(pdf["payload"], pdf["width"], pdf["height"])
            ]
            out["width"] = target_w
            out["height"] = target_h
            yield out[
                ["media_id", "kind", "payload", "mime", "width", "height", "duration_ms"]
            ]

    return spread(media).mapInPandas(op, RESIZED_SCHEMA)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: one output row per planned frame
    (media_id, frame_idx, offset_ms) — pure relational expansion via
    sequence+explode; the per-frame decode would run in mapInPandas.
    Demonstrates the fan-out shape without the (absent) codec."""
    frames = media.filter(F.col("duration_ms").isNotNull()).select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), (F.col("duration_ms") / every_ms).cast("long"))
        ).alias("frame_idx"),
    )
    return frames.withColumn("offset_ms", F.col("frame_idx") * every_ms)
