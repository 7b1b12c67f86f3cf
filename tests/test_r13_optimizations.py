"""Round-13 optimization tests.

Covers the streaming state-partition sizing (OPTIMIZATION_r13.md): the
formula's clamps and override, and — the part that guards the bench's
integrity — that the shared runners RESTORE the session's shuffle
partitions after the streaming query drains, so later batch queries in
the same session never silently inherit a streaming-sized value.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from flink_anomaly_spark.streaming import pipelines as P

SF_SMOKE = "/root/testdata/sf0.001"


def test_state_partitions_formula_clamps(spark, monkeypatch):
    monkeypatch.delenv("SPARK_GRAFT_STREAM_PARTITIONS", raising=False)
    par = spark.sparkContext.defaultParallelism
    # no source built yet -> None (session conf untouched)
    monkeypatch.setattr(P, "_STREAM_SOURCE_BYTES", None)
    assert P.stream_state_partitions(spark) is None
    # tiny source -> the floor of 4 (1 partition over-serializes the
    # stateful stage; measured in OPTIMIZATION_r13.md)
    monkeypatch.setattr(P, "_STREAM_SOURCE_BYTES", 10)
    assert P.stream_state_partitions(spark) == min(4, par) or (
        P.stream_state_partitions(spark) == 4
    )
    # huge source -> capped at cluster width
    monkeypatch.setattr(P, "_STREAM_SOURCE_BYTES", 100 * 1024**4)
    assert P.stream_state_partitions(spark) == par
    # mid-size source -> ceil(bytes / target)
    monkeypatch.setattr(
        P, "_STREAM_SOURCE_BYTES", 5 * P._STATE_PARTITION_TARGET_BYTES + 1
    )
    assert P.stream_state_partitions(spark) == max(4, min(par, 6))


def test_state_partitions_env_override(spark, monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_STREAM_PARTITIONS", "13")
    monkeypatch.setattr(P, "_STREAM_SOURCE_BYTES", None)
    assert P.stream_state_partitions(spark) == 13


def test_source_builders_record_bytes(spark, tmp_path):
    P.stream_events(spark, SF_SMOKE)
    expect = os.path.getsize(os.path.join(SF_SMOKE, "events.parquet"))
    assert P._STREAM_SOURCE_BYTES == expect


def test_run_to_memory_restores_session_shuffle_partitions(spark):
    key = "spark.sql.shuffle.partitions"
    before = spark.conf.get(key)
    events = P.stream_events(spark, SF_SMOKE)
    out = P.run_to_memory(P.windowed_count_stream(events))
    # the streaming query itself ran with the sized partition count,
    # but the session value must be back for subsequent batch queries
    assert spark.conf.get(key) == before
    assert out.count() > 0


def test_inline_literal_guards(spark):
    """r12 ADVICE fixes: the inline literal builders reject degenerate
    input loudly instead of silently emitting wrong literals — empty
    lists (every consumer iterates via F.sequence over the length, and
    an empty range yields a bogus descending [1,0]) and non-integer
    values in inline_int_array (str(int(v)) truncates where the F.lit
    form preserved the float)."""
    from flink_anomaly_spark.operators import similarity as S

    for bad_call in (
        lambda: S.inline_vector([]),
        lambda: S.inline_matrix([]),
        lambda: S.inline_int_array([]),
        lambda: S.inline_int_array([1, 2.5]),
    ):
        with pytest.raises(ValueError):
            bad_call()
    # integral floats keep the old F.lit semantics (pre-rounded
    # micro-unit values arrive as whole floats from some callers)
    row = spark.range(1).select(S.inline_int_array([7.0, -3]).alias("a")).first()
    assert list(row["a"]) == [7, -3]


def test_streaming_result_identical_across_partition_counts(spark, monkeypatch):
    """State-partition count is an execution knob, not a semantic one:
    the windowed aggregation emits identical rows at 4 and at 11
    partitions (the guard that the r13 sizing can never change what a
    streaming query computes)."""
    events = P.stream_events(spark, SF_SMOKE)
    plan = P.windowed_count_stream(events)

    def rows(n):
        monkeypatch.setenv("SPARK_GRAFT_STREAM_PARTITIONS", str(n))
        return sorted(
            map(tuple, P.run_to_memory(plan).collect()),
            key=lambda t: (str(t[0]), str(t[2])),
        )

    assert rows(4) == rows(11)
