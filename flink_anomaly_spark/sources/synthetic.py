"""Custom Python DataSource (Spark 4 `pyspark.sql.datasource` API) —
the connector-extension surface of the engine.

The reference's only sources are in-memory elements and text files
(SURVEY §2.1); real deployments extend the catalog with custom
connectors. `SyntheticEventsDataSource` demonstrates the full contract:
schema declaration, partition planning (one `InputPartition` per
split — Spark schedules each to an executor), per-partition generation,
and **filter pushdown into the source** (`pushFilters` accepts
`event_id` range predicates so pruned rows are never generated — the
Python-source analog of parquet predicate pushdown).

Rows are a pure function of `event_id` (integer arithmetic only), so
any engine — including the DuckDB oracle via `range()` — reproduces
the dataset exactly.
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)


def _row(i: int):
    # deterministic, engine-portable arithmetic (no RNG, no floats
    # until the final exact /10 of an integer)
    return (i, f"type_{i % 5}", ((i * 9973) % 10000) / 10.0)


class _Partition(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


class SyntheticEventsReader(DataSourceReader):
    def __init__(self, options):
        self.n_rows = int(options.get("rows", 1000))
        self.n_parts = int(options.get("partitions", 8))
        self.min_id = 0
        self.max_id = self.n_rows  # exclusive

    def pushFilters(self, filters):
        """Accept event_id range predicates (generation is skipped for
        pruned ids); everything else is left for Spark to evaluate."""
        for f in filters:
            name = type(f).__name__
            col = getattr(f, "attribute", ("",))[0] if getattr(f, "attribute", None) else ""
            if col == "event_id" and name == "GreaterThan":
                self.min_id = max(self.min_id, int(f.value) + 1)
            elif col == "event_id" and name == "GreaterThanOrEqual":
                self.min_id = max(self.min_id, int(f.value))
            elif col == "event_id" and name == "LessThan":
                self.max_id = min(self.max_id, int(f.value))
            elif col == "event_id" and name == "LessThanOrEqual":
                self.max_id = min(self.max_id, int(f.value) + 1)
            else:
                yield f  # unsupported → Spark evaluates it post-scan

    def partitions(self):
        per = max(1, (self.n_rows + self.n_parts - 1) // self.n_parts)
        return [
            _Partition(lo, min(lo + per, self.n_rows))
            for lo in range(0, self.n_rows, per)
        ]

    def read(self, partition: _Partition):
        lo = max(partition.start, self.min_id)
        hi = min(partition.end, self.max_id)
        for i in range(lo, hi):
            yield _row(i)


class SyntheticEventsDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "synthetic_events"

    def schema(self) -> str:
        return "event_id bigint, event_type string, value double"

    def reader(self, schema) -> SyntheticEventsReader:
        return SyntheticEventsReader(self.options)

    def simpleStreamReader(self, schema):
        return SyntheticEventsStreamReader(self.options)


def register_synthetic_source(spark) -> None:
    """Idempotent registration of the custom source format. Python-source
    filter pushdown is opt-in (Spark 4.1) — enable it so pushFilters
    runs (a dynamic SQLConf, safe under any session)."""
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(SyntheticEventsDataSource)


class SyntheticEventsStreamReader(SimpleDataSourceStreamReader):
    """Streaming flavor: a bounded deterministic stream that advances
    ``batch_rows`` ids per micro-batch up to ``rows`` total. Offsets are
    plain dicts (checkpoint-serializable); `read(start)` returns the
    rows of one micro-batch plus the next offset, so restart-from-
    checkpoint resumes exactly (same contract as any replayable source —
    the property Spark's exactly-once state updates rest on)."""

    def __init__(self, options):
        self.total = int(options.get("rows", 1000))
        self.batch_rows = int(options.get("batchRows", 100))

    def initialOffset(self):
        return {"next": 0}

    def read(self, start):
        lo = start["next"]
        hi = min(lo + self.batch_rows, self.total)
        return [_row(i) for i in range(lo, hi)], {"next": hi}

    def readBetweenOffsets(self, start, end):
        return [_row(i) for i in range(start["next"], end["next"])]

