"""Multimodal-pipeline queries: binary payload plumbing with stubbed
decoding (operators/multimodal.py). The decode stub is deterministic
(sha256-derived features), so even these are fully oracle-checked —
DuckDB's sha256(VARCHAR) equals hashlib.sha256 over the UTF-8 payload
bytes."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_anomaly_spark.operators.multimodal import (
    documents_as_media,
    extract_features,
    frame_sample_plan,
)
from flink_anomaly_spark.plans.registry import register
from flink_anomaly_spark.tables import load_table


@register(
    "multimodal_features",
    oracle="""
    SELECT doc_id AS media_id,
           'image' AS kind,
           octet_length(encode(text)) AS n_bytes,
           sha256(text) AS sha256,
           array_to_string(list_transform(range(0, 8),
             i -> CAST(CAST(('0x' || substr(sha256(text), i*8+1, 8)) AS BIGINT) AS VARCHAR)),
             ',') AS feat_u32_csv,
           true AS decode_ok
    FROM documents
    """,
    doc="mapInPandas feature extraction over opaque binary payloads "
    "(Arrow-batched; bytes never outlive one batch). Decode is a "
    "deterministic sha256-derived stub — swap _fake_decode for a real "
    "decoder without touching the plumbing. The feature vector is "
    "emitted as an exact u32 CSV string (feat[i]*2^32 is integral by "
    "construction) so the output has no top-level array column — "
    "harness canonicalizers sort rows pandas-side and cannot hash "
    "list cells.",
)
def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    feats = extract_features(documents_as_media(docs))
    # feat[i] = k / 2**32 with k a u32, so feat[i]*2**32 is exactly k in
    # double arithmetic; cast('long') is therefore exact (no rounding).
    return feats.select(
        "media_id",
        "kind",
        "n_bytes",
        "sha256",
        F.concat_ws(
            ",",
            F.transform(
                "feat", lambda x: (x * F.lit(4294967296.0)).cast("long").cast("string")
            ),
        ).alias("feat_u32_csv"),
        "decode_ok",
    )


@register(
    "multimodal_frame_plan",
    oracle="""
    SELECT media_id, u.frame_idx AS frame_idx, u.frame_idx * 1000 AS offset_ms
    FROM (SELECT doc_id AS media_id, n_chars * 10 AS duration_ms
          FROM documents WHERE doc_id % 5 = 0) t,
         LATERAL unnest(range(0, duration_ms // 1000 + 1)) AS u(frame_idx)
    """,
    doc="Video frame-sampling plan: sequence+explode fan-out (one row "
    "per planned frame) — the relational half of frame extraction; the "
    "per-frame decode would run in mapInPandas.",
)
def q_multimodal_frame_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return frame_sample_plan(documents_as_media(docs), every_ms=1000)


@register(
    "media_exact_dedup",
    # payload is the UTF-8 encoding of documents.text (documents_as_media),
    # so DuckDB's sha256 over the text hashes the identical bytes
    oracle="""
    SELECT sha256(text) AS fingerprint, min(doc_id) AS keep_id,
           count(*) AS n_copies
    FROM documents GROUP BY sha256(text)
    """,
    doc="Exact multimodal dedup: group opaque binary payloads by sha256 "
    "— the media twin of exact_dedup. The shuffle key is the 32-byte "
    "digest, never the payload bytes; at 100 TB the media bytes stay in "
    "the map stage and only (digest, id) pairs cross the wire.",
)
def q_media_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flink_anomaly_spark.operators.multimodal import documents_as_media

    docs = load_table(spark, sf_dir, "documents")
    media = documents_as_media(docs)
    return (
        media.groupBy(F.sha2(F.col("payload"), 256).alias("fingerprint"))
        .agg(F.min("media_id").alias("keep_id"), F.count("*").alias("n_copies"))
    )
