"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over ``flink_anomaly_spark.plans.registry`` — every query is
registered there with its DuckDB oracle; see SURVEY.md §2 for the
operator inventory each entry realizes.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from flink_anomaly_spark.plans.registry import all_oracles, all_queries


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (Main.java:23-58 pipeline transposed to events):
    filter → keyBy(event_type) → running stateful concat, on sf0.001."""
    return all_queries()["flagship_running_concat"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return all_queries()


def oracle_sql() -> dict[str, str]:
    return all_oracles()
