"""Per-key running concatenation — the reference's one custom stateful op.

Reference semantics (F1 in SURVEY.md §2.5): a keyed ``RichFlatMapFunction``
holding ``ValueState<String>`` that appends each element's name and emits
the running prefix after every element (``Main.java:60-83``,
``TestFlinkStatefulStreamsRecover.java:184-211``).

Spark-first design
------------------
Batch: a window cumulative aggregation — ``collect_list`` over
``rowsBetween(unboundedPreceding, currentRow)`` then ``concat_ws``.
This is a single hash-shuffle on the key followed by an in-partition
sort: exactly the plan a 1000-executor cluster wants (state never
leaves the executor that owns the key range, no driver involvement).
The reference's arrival order is nondeterministic at parallelism ≥ 2;
we pin an explicit (order_col, tiebreak) sort so results are stable and
oracle-checkable (SURVEY.md §7.4).

Streaming: see ``flink_anomaly_spark.streaming.stateful`` —
``transformWithStateInPandas`` / ``applyInPandasWithState`` holding the
concat string in ``GroupState``, the direct analog of ``ValueState``.

Scale note: the emitted running prefix for a key with n rows is O(n²)
characters total — true in the reference too (it *emits after every
element*). For 100 TB use the ``keyed_concat_total`` variant (one row
per key, O(n) output) unless per-element prefixes are really wanted.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def running_concat(
    df: DataFrame,
    key: str | Column,
    payload: str | Column,
    order_by: list[str | Column],
    sep: str = ",",
    out_col: str = "running_concat",
) -> DataFrame:
    """Emit, for every row, the concatenation of payloads seen so far
    within its key, in (order_by) order — the reference's per-element
    running prefix (``Main.java:70-74``) with deterministic order.
    """
    w = (
        Window.partitionBy(key)
        .orderBy(*order_by)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    payload_str = F.col(payload).cast("string") if isinstance(payload, str) else payload.cast("string")
    return df.withColumn(out_col, F.concat_ws(sep, F.collect_list(payload_str).over(w)))


def keyed_concat_total(
    df: DataFrame,
    key: str | Column,
    payload: str | Column,
    order_by: list[str | Column],
    sep: str = ",",
    out_col: str = "concat_all",
) -> DataFrame:
    """One row per key: the full ordered concatenation (the reference's
    final state value per key after the stream is exhausted).

    Implemented as sort-within-group aggregation: ``sort_array`` over
    ``(order-key, payload)`` structs then join the payloads. Single
    shuffle, map-side partial aggregation applies to collect_list.
    """
    payload_str = F.col(payload).cast("string") if isinstance(payload, str) else payload.cast("string")
    order_cols = [F.col(c) if isinstance(c, str) else c for c in order_by]
    packed = F.struct(*order_cols, payload_str.alias("__payload"))
    return (
        df.groupBy(key)
        .agg(
            F.concat_ws(
                sep,
                F.transform(F.sort_array(F.collect_list(packed)), lambda s: s["__payload"]),
            ).alias(out_col)
        )
    )
