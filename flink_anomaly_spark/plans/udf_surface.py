"""Driver-checked queries exercising the custom-function surface:
a pandas UDAF (applyInPandas grouped aggregate) and a Python UDTF
called through SQL LATERAL syntax.

The reference's UDF surface is Java lambdas/rich functions (SURVEY
§2.10); these are the Spark-native registration counterparts. Both are
API-surface demonstrations kept OFF the scale-critical paths: the
weighted mean is algebraic (the built-in expression form is shown in
the oracle), and `heavy_hitter_terms` is the Catalyst-native scale path
for n-gram counting. They exist so the custom-function machinery is
oracle-verified end-to-end, not just unit-tested.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_anomaly_spark.plans.registry import register
from flink_anomaly_spark.tables import load_table


@register(
    "udaf_weighted_mean",
    oracle="""
    SELECT event_type,
           round(sum(value * (CAST(json_extract_string(props, '$.k') AS BIGINT) + 1))
                 / sum(CAST(json_extract_string(props, '$.k') AS BIGINT) + 1), 4) AS wmean,
           count(*) AS n_events
    FROM events GROUP BY event_type
    """,
    doc="Custom aggregate via the pandas-UDAF surface "
    "(functions.registry.grouped_udaf → applyInPandas): per event "
    "type, the k-weighted mean of value (weight = props.k + 1). One "
    "hash shuffle on the group key; each group aggregates inside an "
    "Arrow batch. The oracle states the same aggregate algebraically — "
    "for production the algebraic form wins (map-side combine); this "
    "query exists to oracle-verify the UDAF machinery itself.",
)
def q_udaf_weighted_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flink_anomaly_spark.functions.registry import grouped_udaf

    events = load_table(spark, sf_dir, "events").select(
        "event_type",
        "value",
        (F.get_json_object("props", "$.k").cast("bigint") + 1).alias("w"),
    )

    def wmean(key_tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        w = pdf["w"].astype("float64")
        # plain sequential sums (not np.average's pairwise path) so the
        # float result tracks the oracle's left-to-right SQL sums
        num = float((pdf["value"].astype("float64") * w).sum())
        den = float(w.sum())
        return pd.DataFrame(
            {
                "event_type": [key_tuple[0]],
                "wmean": [num / den],
                "n_events": [len(pdf)],
            }
        )

    out = grouped_udaf(
        events, "event_type", wmean, "event_type string, wmean double, n_events bigint"
    )
    # round JVM-side: Python's round() is banker's rounding, SQL round is
    # half-away-from-zero — F.round matches the DuckDB oracle exactly
    return out.select("event_type", F.round("wmean", 4).alias("wmean"), "n_events")


@register(
    "udtf_bigram_counts",
    oracle="""
    WITH t AS (
      SELECT list_filter(string_split_regex(text, '\\s+'), tk -> tk != '') AS toks
      FROM documents
    ), grams AS (
      SELECT unnest(CASE WHEN len(toks) >= 2
                         THEN list_transform(range(1, len(toks)),
                                             i -> toks[i] || ' ' || toks[i+1])
                         ELSE [array_to_string(toks, ' ')] END) AS ngram
      FROM t
    )
    SELECT ngram, count(*) AS c FROM grams GROUP BY ngram
    ORDER BY c DESC, ngram ASC LIMIT 15
    """,
    doc="Python UDTF surface (Spark 4 `udtf` + SQL LATERAL join): "
    "explode_ngrams(text, 2) emits each bigram as a table row; the "
    "query counts them and returns the top 15 (deterministic "
    "tie-break). Row-at-a-time Python is the SLOW path by design — "
    "`heavy_hitter_terms` is the Catalyst-native equivalent for "
    "scale — this query oracle-verifies the UDTF registration path.",
)
def q_udtf_bigram_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flink_anomaly_spark.functions.registry import register_udtfs
    from flink_anomaly_spark.tables import register_views

    register_views(spark, sf_dir)
    register_udtfs(spark)
    return spark.sql(
        """
        SELECT ngram, count(*) AS c
        FROM documents, LATERAL explode_ngrams(text, 2)
        GROUP BY ngram
        ORDER BY c DESC, ngram ASC LIMIT 15
        """
    )


@register(
    "synthetic_source_agg",
    oracle="""
    WITH t AS (
      SELECT i AS event_id,
             'type_' || CAST(i % 5 AS VARCHAR) AS event_type,
             ((i * 9973) % 10000) / 10.0 AS value
      FROM (SELECT unnest(range(5000, 20000)) AS i)
    )
    SELECT event_type, count(*) AS n_rows, round(sum(value), 2) AS sum_value
    FROM t GROUP BY event_type
    """,
    doc="Custom Python DataSource surface (Spark 4 connector API): "
    "scan the registered `synthetic_events` format (16 planned input "
    "partitions, rows a pure function of event_id), with the "
    "event_id >= 5000 predicate PUSHED INTO the source via "
    "pushFilters (pruned rows are never generated). The oracle "
    "regenerates the same rows from range() arithmetic — the source "
    "is engine-portable by construction. Ignores sf_dir (the source "
    "is synthetic).",
)
def q_synthetic_source_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flink_anomaly_spark.sources.synthetic import register_synthetic_source

    register_synthetic_source(spark)
    df = (
        spark.read.format("synthetic_events")
        .option("rows", 20000)
        .option("partitions", 16)
        .load()
    )
    return (
        df.filter(F.col("event_id") >= 5000)
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_rows"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
    )
