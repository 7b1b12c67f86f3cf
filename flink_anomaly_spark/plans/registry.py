"""Central query registry.

A ``QuerySpec`` couples a Spark DataFrame builder with the equivalent
ANSI SQL for the DuckDB oracle. Column names are aliased identically on
both sides (the driver's compare sorts columns by name before hashing).
Oracle ``None`` ⇒ non-SQL-expressible (streaming/stateful); the driver
records a rows-only check for those.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    name: str
    build: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    doc: str = ""


QUERIES: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None, doc: str = ""):
    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        QUERIES[name] = QuerySpec(name=name, build=fn, oracle=oracle, doc=doc)
        return fn

    return deco


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    _load_all()
    return {name: spec.build for name, spec in QUERIES.items()}


def all_oracles() -> dict[str, str]:
    _load_all()
    return {name: spec.oracle for name, spec in QUERIES.items() if spec.oracle is not None}


_LOADED = False


def _load_all() -> None:
    """Import every plan module so its @register decorators run."""
    global _LOADED
    if _LOADED:
        return
    from flink_anomaly_spark.plans import (  # noqa: F401
        extensions,
        multimodal_queries,
        reference_parity,
        relational_ext,
        streaming_queries,
        tpch,
    )

    _LOADED = True
