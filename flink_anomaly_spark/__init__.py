"""flink_anomaly_spark — a PySpark-native analytics engine.

A brand-new engine with the query and data-processing capabilities of
the reference repo GlebSolovev/flink-anomaly (a Flink DataStream
at-least-once-anomaly probe), re-expressed Spark-first:

- batch DataFrame/SQL operators (Catalyst-optimized) for every operator
  the reference exercises (SURVEY.md §2), oracle-checked against DuckDB;
- Structured Streaming pipelines for the watermark/window/stateful/
  recovery surface;
- large-scale training-data-pipeline extensions (dedup, similarity
  search, text analysis, multimodal plumbing) over the driver's
  documents/embeddings tables.

Nothing here is ported from the reference's Java: the reference defines
WHAT to compute (see file:line citations in docstrings); the HOW is
idiomatic PySpark.
"""

from flink_anomaly_spark.session import get_spark
from flink_anomaly_spark.tables import TABLE_NAMES, load_table, load_tables

__all__ = ["get_spark", "load_table", "load_tables", "TABLE_NAMES"]

__version__ = "0.1.0"
