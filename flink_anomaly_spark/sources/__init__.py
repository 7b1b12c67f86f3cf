"""Source connectors (SURVEY §2.1) and their streaming twins."""

from flink_anomaly_spark.sources.readers import (
    from_elements,
    read_csv,
    read_json,
    read_parquet,
    read_text,
    stream_rate,
    stream_text,
)

__all__ = [
    "from_elements",
    "read_csv",
    "read_json",
    "read_parquet",
    "read_text",
    "stream_rate",
    "stream_text",
]
