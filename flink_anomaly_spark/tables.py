"""Catalog: the driver's deterministic parquet tables (TESTDATA.md).

``spark.read.parquet`` gives vectorized scans with predicate pushdown
and column pruning for free — at 100 TB these scans are partition-pruned
and column-pruned by Catalyst as long as downstream code stays in the
DataFrame API (it does).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


#: columns stored as parquet TIMESTAMP(NANOS), which Spark's vectorized
#: reader rejects. We read them as int64 nanos and truncate to µs —
#: exactly what DuckDB does when it casts TIMESTAMP_NS → TIMESTAMP, so
#: engine and oracle agree to the microsecond.
_NANOS_TS_COLS = {"events": ["ts"]}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one catalog table.

    SIDE EFFECT (documented, deliberate): loading a nanos-timestamp
    table sets ``spark.sql.legacy.parquet.nanosAsLong`` and pins the
    session timezone to UTC — required so the driver's own (unconfigured)
    SparkSession reads events identically to the DuckDB oracle. The
    engine standardizes on UTC everywhere (session.get_spark does the
    same); callers needing a non-UTC session TZ should not mix it with
    this catalog.
    """
    if name not in TABLE_NAMES:
        raise KeyError(f"unknown table {name!r}; known: {TABLE_NAMES}")
    path = os.path.join(sf_dir, f"{name}.parquet")
    nanos_cols = _NANOS_TS_COLS.get(name, [])
    if nanos_cols:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        # timestamp_micros() builds a session-TZ timestamp; pin UTC so
        # the value equals DuckDB's TZ-naive reading in any environment
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        df = spark.read.parquet(path)
        types = dict(df.dtypes)
        for c in nanos_cols:
            # only convert when the column actually read as int64 nanos —
            # re-written copies of the table already carry µs timestamps
            if types.get(c) == "bigint":
                df = df.withColumn(c, F.timestamp_micros(F.expr(f"{c} div 1000")))
        return df
    return spark.read.parquet(path)


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register every table as a temp view (for the SQL API surface)."""
    tables = load_tables(spark, sf_dir)
    for name, df in tables.items():
        df.createOrReplaceTempView(name)
    return tables
