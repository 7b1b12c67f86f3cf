"""Event-time windows + per-window arg-max (SURVEY §2.7 W1-W3).

Reference semantics: assign event time with 20 s bounded out-of-orderness
(``TestFlinkStreams.java:68-75``), 5 s tumbling window (``:78``),
``maxBy(0, true)`` whole-record arg-max (``:79``).

Spark-first: ``F.window`` is a plain grouping expression in batch
(watermark is a streaming-only concept — the streaming twin lives in
``flink_anomaly_spark.streaming.pipelines``). ``max_by(struct, value)``
reproduces whole-record arg-max; ties are pinned with a secondary key so
results are deterministic under any parallelism (the reference's
``first=true`` tie-break is arrival-order-dependent — SURVEY §7.4).

Sliding and session windows are included: absent from the reference but
free in Spark and part of the same capability family.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def tumbling_argmax(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    duration: str = "5 seconds",
    tiebreak: str | None = None,
    extra_keys: list[str] | None = None,
) -> DataFrame:
    """Per tumbling window, return the whole record with max value.

    ``maxBy(0, true)`` analog: ``max_by(struct(all cols), ord)`` where
    ``ord = struct(value, -tiebreak)`` — struct ordering is
    field-by-field, so ties on value resolve to the SMALLEST tiebreak
    (deterministic under any parallelism, unlike the reference's
    arrival-order ``first=true``, SURVEY §7.4).
    """
    ord_expr: Column
    if tiebreak is not None:
        # struct comparison is lexicographic: max value first, then the
        # NEGATED tiebreak so equal values resolve to the SMALLEST
        # tiebreak (matching "first encountered" under a sorted source).
        ord_expr = F.struct(F.col(value_col), -F.col(tiebreak))
    else:
        ord_expr = F.col(value_col)
    keys = [F.window(ts_col, duration).alias("win")] + [F.col(c) for c in (extra_keys or [])]
    rec = F.max_by(F.struct(*[F.col(c) for c in df.columns]), ord_expr).alias("rec")
    out = df.groupBy(*keys).agg(rec)
    return out.select(
        F.col("win.start").alias("window_start"),
        F.col("win.end").alias("window_end"),
        *[F.col(c) for c in (extra_keys or [])],
        F.col("rec.*"),
    )


def tumbling_agg(
    df: DataFrame,
    ts_col: str,
    duration: str,
    aggs: list[Column],
    extra_keys: list[str] | None = None,
) -> DataFrame:
    """General tumbling-window aggregation (count/sum/avg per window)."""
    keys = [F.window(ts_col, duration).alias("win")] + [F.col(c) for c in (extra_keys or [])]
    out = df.groupBy(*keys).agg(*aggs)
    return out.select(
        F.col("win.start").alias("window_start"),
        F.col("win.end").alias("window_end"),
        *[c for c in out.columns if c != "win"],
    )


def sliding_agg(
    df: DataFrame,
    ts_col: str,
    duration: str,
    slide: str,
    aggs: list[Column],
    extra_keys: list[str] | None = None,
) -> DataFrame:
    """Sliding (hopping) window aggregation — ``F.window(ts, dur, slide)``.
    Each row lands in dur/slide windows; Spark expands then hash-aggregates
    with map-side partial aggregation, so the shuffle carries only partial
    aggregates, not the expanded rows.
    """
    keys = [F.window(ts_col, duration, slide).alias("win")] + [
        F.col(c) for c in (extra_keys or [])
    ]
    out = df.groupBy(*keys).agg(*aggs)
    return out.select(
        F.col("win.start").alias("window_start"),
        F.col("win.end").alias("window_end"),
        *[c for c in out.columns if c != "win"],
    )


def session_agg(
    df: DataFrame,
    ts_col: str,
    gap: str,
    key_cols: list[str],
    aggs: list[Column],
) -> DataFrame:
    """Session windows (gap-based) — ``F.session_window`` in batch mode."""
    out = df.groupBy(F.session_window(ts_col, gap).alias("win"), *key_cols).agg(*aggs)
    return out.select(
        F.col("win.start").alias("window_start"),
        F.col("win.end").alias("window_end"),
        *[c for c in out.columns if c != "win"],
    )


def ohlc_downsample(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    key_cols: list[str],
    duration: str = "1 minute",
    tiebreak: str | None = None,
) -> DataFrame:
    """Time-series downsampling to OHLC bars: per key and tumbling
    bucket, the first (open) / max (high) / min (low) / last (close)
    value plus the event count — the standard resample step before
    charting or feature extraction on a metric stream.

    One hash-agg shuffle on (keys, bucket); ``min_by``/``max_by`` on a
    (ts, tiebreak) struct pin first/last deterministically even when two
    events share a timestamp. No sort anywhere — arg-selection
    aggregates replace the per-window orderBy a naive plan would use.
    """
    ordk = (
        F.struct(F.col(ts_col), F.col(tiebreak))
        if tiebreak
        else F.struct(F.col(ts_col))
    )
    out = df.groupBy(F.window(ts_col, duration).alias("win"), *key_cols).agg(
        F.min_by(F.col(value_col), ordk).alias("open"),
        F.max(value_col).alias("high"),
        F.min(value_col).alias("low"),
        F.max_by(F.col(value_col), ordk).alias("close"),
        F.count("*").alias("n_events"),
    )
    return out.select(
        F.col("win.start").alias("bucket_start"),
        *key_cols,
        "open",
        "high",
        "low",
        "close",
        "n_events",
    )
