"""Stateful streaming: per-key running concatenation with managed state.

The direct live analog of the reference's ``StatefulConcatenate``
(``Main.java:60-83``): keyed ``ValueState<String>`` accumulating the
concatenation, emitting the running prefix after every element.

Spark-first: ``applyInPandasWithState`` with a single-string state
schema (mirroring the reference's one ValueState). State lives in the
executor-side state store, checkpointed per micro-batch — at scale this
is RocksDB-backed and partitioned by the grouping key, so state never
centralizes.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "key string, event_id long, running_concat string"
STATE_SCHEMA = "concat string"


def _concat_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Per key: fold rows (sorted by ts, event_id within the batch) into
    the state string, emitting the running prefix per row — the same
    emit-after-every-element behavior as Main.java:70-74."""
    (concat,) = state.get if state.exists else ("",)
    for pdf in pdfs:
        pdf = pdf.sort_values(["ts", "event_id"])
        out_ids, out_prefix = [], []
        for eid in pdf["event_id"]:
            concat = f"{concat},{eid}" if concat else str(eid)
            out_ids.append(eid)
            out_prefix.append(concat)
        yield pd.DataFrame(
            {"key": key[0], "event_id": out_ids, "running_concat": out_prefix}
        )
    state.update((concat,))


def running_concat_stream(events: DataFrame, key: str = "event_type") -> DataFrame:
    """Keyed running-concat over a streaming DataFrame (F1 live)."""
    return (
        events.select(F.col(key).alias("key"), "event_id", "ts")
        .groupBy("key")
        .applyInPandasWithState(
            _concat_fn,
            OUTPUT_SCHEMA,
            STATE_SCHEMA,
            "append",
            GroupStateTimeout.NoTimeout,
        )
    )
