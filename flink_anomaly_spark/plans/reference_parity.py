"""Reference-parity queries — one per operator row in SURVEY.md §2,
realized over the driver's tables per FIXTURES.md §B.

Citations point at the reference call sites whose semantics each query
reproduces (the implementation is Spark-native, not a port).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_anomaly_spark.operators.relational import map_upper, union_all
from flink_anomaly_spark.operators.stateful import keyed_concat_total, running_concat
from flink_anomaly_spark.operators.windows import tumbling_agg, tumbling_argmax
from flink_anomaly_spark.plans.registry import register
from flink_anomaly_spark.tables import load_table

# ---------------------------------------------------------------------------
# Flagship: filter → keyBy → running stateful concat (Main.java:23-58)
# ---------------------------------------------------------------------------


@register(
    "flagship_running_concat",
    oracle="""
    SELECT event_id, event_type,
           string_agg(CAST(event_id AS VARCHAR), ',')
             OVER (PARTITION BY event_type ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS running_concat
    FROM events
    WHERE value >= 100.0
    """,
    doc="Main.java:23-58 pipeline: failure-filter→keyBy→ValueState concat, "
    "transposed to events (FIXTURES.md A1→B): filter value≥100 → "
    "per-event_type running concat of event_id ordered by (ts, event_id).",
)
def flagship_running_concat(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    filtered = events.filter(F.col("value") >= 100.0)
    out = running_concat(
        filtered,
        key="event_type",
        payload="event_id",
        order_by=["ts", "event_id"],
        sep=",",
        out_col="running_concat",
    )
    return out.select("event_id", "event_type", "running_concat")


# ---------------------------------------------------------------------------
# T1: map / uppercase (TestFlinkStreams.java:56)
# ---------------------------------------------------------------------------


@register(
    "map_upper",
    oracle="SELECT doc_id, upper(text) AS text_upper FROM documents",
    doc="T1 .map(String::toUpperCase) TestFlinkStreams.java:56 → built-in "
    "upper() over documents.text (FIXTURES.md A4).",
)
def q_map_upper(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return map_upper(docs.select("doc_id", "text"), "text", "text_upper").select(
        "doc_id", "text_upper"
    )


# ---------------------------------------------------------------------------
# T3: plain predicate filter (TestFlinkStreams.java:91  person.age >= 18)
# ---------------------------------------------------------------------------


@register(
    "filter_project",
    oracle="""
    SELECT c_custkey, c_name, c_acctbal
    FROM customer
    WHERE c_acctbal >= 0.0 AND c_mktsegment = 'BUILDING'
    """,
    doc="T3 comparison filter TestFlinkStreams.java:91 (age>=18 → "
    "c_acctbal>=0 per FIXTURES.md A2) + projection; both predicates push "
    "down to the parquet scan.",
)
def q_filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    return cust.filter((F.col("c_acctbal") >= 0.0) & (F.col("c_mktsegment") == "BUILDING")).select(
        "c_custkey", "c_name", "c_acctbal"
    )


# ---------------------------------------------------------------------------
# U1: bag union (TestFlinkStreamsRecover.java:92)
# ---------------------------------------------------------------------------


@register(
    "union_bag",
    oracle="""
    SELECT event_id, event_type, value FROM events WHERE value < 150.0
    UNION ALL
    SELECT event_id, event_type, value FROM events WHERE value >= 100.0
    """,
    doc="U1 stream1.union(stream2) TestFlinkStreamsRecover.java:92 — bag "
    "semantics proven by overlapping filters (rows in [100,150) appear "
    "twice). unionAll = zero-shuffle partition append.",
)
def q_union_bag(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events").select("event_id", "event_type", "value")
    return union_all(
        events.filter(F.col("value") < 150.0),
        events.filter(F.col("value") >= 100.0),
    )


# ---------------------------------------------------------------------------
# W1-W3: event-time tumbling window + whole-record arg-max
# (TestFlinkStreams.java:62-83)
# ---------------------------------------------------------------------------


@register(
    "window_argmax",
    oracle="""
    SELECT window_start, window_end, event_id, user_id, event_type, value
    FROM (
      SELECT date_trunc('hour', ts) AS window_start,
             date_trunc('hour', ts) + INTERVAL 1 HOUR AS window_end,
             event_id, user_id, event_type, value,
             row_number() OVER (PARTITION BY date_trunc('hour', ts)
                                ORDER BY value DESC, event_id ASC) AS rn
      FROM events
    ) t
    WHERE rn = 1
    """,
    doc="W2+W3 windowAll(tumbling 5s).maxBy(0,true) TestFlinkStreams.java:78-79 "
    "→ 1h tumbling window (scaled to the data's 30-day span) + "
    "max_by(struct(*), (value, -event_id)) for a deterministic tie-break "
    "(SURVEY §7.4).",
)
def q_window_argmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    out = tumbling_argmax(
        events, ts_col="ts", value_col="value", duration="1 hour", tiebreak="event_id"
    )
    return out.select("window_start", "window_end", "event_id", "user_id", "event_type", "value")


@register(
    "window_count_agg",
    oracle="""
    SELECT date_trunc('day', ts) AS window_start,
           date_trunc('day', ts) + INTERVAL 1 DAY AS window_end,
           event_type,
           count(*) AS n_events,
           round(sum(value), 2) AS sum_value
    FROM events
    GROUP BY 1, 2, 3
    """,
    doc="W1-family keyed tumbling aggregation (count/sum per day per "
    "event_type) — the windowed-agg shape the streaming twin runs with a "
    "watermark (streaming/pipelines.py).",
)
def q_window_count_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return tumbling_agg(
        events,
        ts_col="ts",
        duration="1 day",
        aggs=[F.count("*").alias("n_events"), F.round(F.sum("value"), 2).alias("sum_value")],
        extra_keys=["event_type"],
    )


# ---------------------------------------------------------------------------
# F1 keyed variant: full per-key concatenation
# (TestFlinkStatefulStreamsRecover.java:178-211)
# ---------------------------------------------------------------------------


@register(
    "keyed_concat_total",
    oracle="""
    SELECT event_type,
           string_agg(CAST(event_id AS VARCHAR), ',' ORDER BY ts, event_id)
             AS concat_all
    FROM events
    GROUP BY event_type
    """,
    doc="F1 keyed ValueState concatenation, final state per key "
    "(TestFlinkStatefulStreamsRecover.java:184-211) — sort-within-group "
    "aggregation, one shuffle.",
)
def q_keyed_concat_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return keyed_concat_total(
        events, key="event_type", payload="event_id", order_by=["ts", "event_id"]
    )


# ---------------------------------------------------------------------------
# P1: constant-key grouping (Main.java:52 keyBy(d -> ""))
# ---------------------------------------------------------------------------


@register(
    "global_concat_single_key",
    oracle="""
    SELECT '' AS key,
           string_agg(CAST(event_id AS VARCHAR), ',' ORDER BY ts, event_id)
             AS concat_all
    FROM events
    WHERE value >= 200.0
    """,
    doc="P1 keyBy(d->'') Main.java:52 — constant key = one global group "
    "(no parallelism on the agg, same as Flink; filter first to shrink).",
)
def q_global_concat(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events").filter(F.col("value") >= 200.0)
    out = keyed_concat_total(
        events.withColumn("key", F.lit("")),
        key="key",
        payload="event_id",
        order_by=["ts", "event_id"],
    )
    return out.select("key", "concat_all")
