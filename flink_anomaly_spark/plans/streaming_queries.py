"""Streaming queries registered with the driver (rows-only checks —
streaming/stateful semantics aren't DuckDB-SQL expressible; the
__spark_entry__ contract records a weaker check for oracle-less
entries). Each runs its streaming pipeline to completion with an
``availableNow`` trigger and returns the sink contents as a batch
DataFrame."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from flink_anomaly_spark.plans.registry import register
from flink_anomaly_spark.streaming.pipelines import (
    run_to_memory,
    stream_events,
    windowed_argmax_stream,
    windowed_count_stream,
)
from flink_anomaly_spark.streaming.stateful import running_concat_stream


@register(
    "streaming_window_count",
    oracle=None,
    doc="W1 live: file-stream source → withWatermark('ts','20 seconds') → "
    "1-day tumbling count/sum per event_type → memory sink (append mode: "
    "windows finalize when the watermark passes).",
)
def q_streaming_window_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    return run_to_memory(windowed_count_stream(stream_events(spark, sf_dir)))


@register(
    "streaming_window_argmax",
    oracle=None,
    doc="W2+W3 live (TestFlinkStreams.java:62-83): streaming tumbling "
    "window + whole-record max_by with deterministic tie-break.",
)
def q_streaming_window_argmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    return run_to_memory(windowed_argmax_stream(stream_events(spark, sf_dir)))


@register(
    "streaming_dedup",
    oracle=None,
    doc="Streaming deduplication with bounded state: "
    "dropDuplicatesWithinWatermark(event_id) — dedup state evicted as "
    "the watermark passes (the streaming face of the dedup family).",
)
def q_streaming_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flink_anomaly_spark.streaming.pipelines import streaming_dedup

    return run_to_memory(streaming_dedup(stream_events(spark, sf_dir)))


@register(
    "streaming_running_concat",
    oracle=None,
    doc="F1 live (Main.java:60-83): applyInPandasWithState keyed running "
    "concatenation — GroupState(single string) ≙ ValueState<String>.",
)
def q_streaming_running_concat(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    # the running-prefix output is O(n²) characters per key BY SPEC
    # (docs/LIMITATIONS.md) — bound the demo input (value ≥ 200 keeps
    # ~1.75% of events: 15 rows at sf0.001, 1.7k at sf0.1) so the
    # memory-sink collection stays driver-sized at any SF
    events = stream_events(spark, sf_dir).filter(F.col("value") >= 200.0)
    return run_to_memory(running_concat_stream(events))
