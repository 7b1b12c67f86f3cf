"""Query registry: named (Spark builder, DuckDB oracle SQL) pairs.

Each query is the engine-level realization of one operator row from
SURVEY.md §2 (or a north-star extension), expressed over the driver's
parquet tables. ``registry.all_queries()`` / ``registry.all_oracles()``
feed ``__spark_entry__.py``.
"""

from flink_anomaly_spark.plans.registry import QUERIES, QuerySpec, all_oracles, all_queries

__all__ = ["QUERIES", "QuerySpec", "all_queries", "all_oracles"]
