"""Engine function surface: scalar helpers + UDF registration."""

from flink_anomaly_spark.functions.registry import register_builtin_udfs, sql

__all__ = ["register_builtin_udfs", "sql"]
