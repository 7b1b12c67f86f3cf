"""Sources — the reference's S1-S3 plus the formats a Spark engine
provides natively (SURVEY §2.1: the reference has only in-memory
elements and text files; parquet/csv/json are the driver-contract and
real-world formats).

All batch readers return plain DataFrames so Catalyst sees the scan
(pushdown/pruning). Schemas are explicit everywhere — inference is a
correctness and performance hazard at 100 TB.
"""

from __future__ import annotations

from collections.abc import Iterable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def from_elements(spark: SparkSession, rows: Iterable, schema) -> DataFrame:
    """S1/S2 — ``env.fromElements`` / ``fromCollection``
    (``Main.java:39-45``, ``TestFlinkStatefulStreamsRecover.java:171``):
    in-memory finite source. Arrow-backed ``createDataFrame``."""
    return spark.createDataFrame(list(rows), schema)


def read_text(spark: SparkSession, path: str) -> DataFrame:
    """S3 — ``env.readTextFile`` (``TestFlinkStreams.java:104``): one
    ``value: string`` row per line."""
    return spark.read.text(path)


def read_parquet(spark: SparkSession, path: str, schema: T.StructType | None = None) -> DataFrame:
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.parquet(path)


def read_csv(
    spark: SparkSession, path: str, schema: T.StructType | str, header: bool = True
) -> DataFrame:
    """CSV with explicit schema (never inferSchema in production paths)."""
    return spark.read.schema(schema).option("header", str(header).lower()).csv(path)


def read_json(spark: SparkSession, path: str, schema: T.StructType | str) -> DataFrame:
    return spark.read.schema(schema).json(path)


def read_orc(spark: SparkSession, path: str, schema: T.StructType | str | None = None) -> DataFrame:
    """ORC scan (vectorized, predicate-pushdown-capable like parquet)."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.orc(path)


def stream_text(spark: SparkSession, directory: str) -> DataFrame:
    """Streaming twin of S3: unbounded text-file directory source."""
    return spark.readStream.text(directory)


def stream_rate(spark: SparkSession, rows_per_second: int = 10) -> DataFrame:
    """Rate source — the PySpark stand-in for a test MemoryStream
    (SURVEY §2.1 S1 streaming note): emits (timestamp, value) rows."""
    return (
        spark.readStream.format("rate")
        .option("rowsPerSecond", str(rows_per_second))
        .load()
    )


def read_binary_files(
    spark: SparkSession, path: str, glob: str | None = None
) -> DataFrame:
    """Binary-file source for media ingestion: one row per file with
    (path, modificationTime, length, content: binary) — the entry point
    that turns a directory of images/audio/video into the opaque-binary
    media frame the multimodal operators consume
    (``operators.multimodal``). ``pathGlobFilter`` prunes by extension
    at LISTING time (no bytes read for filtered files); pair with
    ``spark.sql.files.maxPartitionBytes`` so many small media files
    coalesce into sane tasks at 100 TB.
    """
    reader = spark.read.format("binaryFile")
    if glob is not None:
        reader = reader.option("pathGlobFilter", glob)
    return reader.load(path)
