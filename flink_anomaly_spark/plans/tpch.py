"""Relational-breadth queries over the TPC-H-ish star schema.

The reference has none of these (SURVEY §2.9) — they are required for
the driver's oracle checks to be non-trivial and to exercise the join /
aggregation / sort / window machinery at scale. All pure DataFrame API;
Catalyst plans broadcast joins for the small dims and sort-merge (with
AQE skew handling) for fact-fact joins.

Float aggregates are rounded on BOTH sides (Spark + oracle) so the
driver's value-hash is immune to summation-order ulp drift.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from flink_anomaly_spark.operators.dedup import md5_int32
from flink_anomaly_spark.operators.relational import join_broadcast, top_k, top_k_per_group
from flink_anomaly_spark.plans.fragments import MD5_32
from flink_anomaly_spark.plans.registry import register
from flink_anomaly_spark.tables import load_table

# ---------------------------------------------------------------------------
# TPC-H Q1: pricing summary (hash agg, 8 aggregates, map-side combine)
# ---------------------------------------------------------------------------


@register(
    "tpch_q1_pricing",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2)                                        AS sum_qty,
           round(sum(l_extendedprice), 2)                                   AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 2)                AS sum_disc_price,
           round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)  AS sum_charge,
           round(avg(l_quantity), 4)                                        AS avg_qty,
           round(avg(l_extendedprice), 4)                                   AS avg_price,
           count(*)                                                         AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
    doc="TPC-H Q1 shape: scan-filter-hashagg. Predicate pushes to parquet; "
    "partial aggregation runs map-side so the shuffle carries ≤ "
    "|groups|×partitions rows regardless of input size.",
)
def q_tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.count("*").alias("count_order"),
        )
    )


# ---------------------------------------------------------------------------
# TPC-H Q6: forecasting revenue change — everything pushes to the scan
# ---------------------------------------------------------------------------


@register(
    "tpch_q6_forecast",
    oracle="""
    SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue,
           count(*) AS n_rows
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
    doc="TPC-H Q6 shape: all four predicates push down to the parquet "
    "scan (range + between); the aggregate is a single partial/final "
    "pair — the cheapest possible plan for a 100 TB selective scan.",
)
def q_tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount").between(0.05, 0.07))
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias("revenue"),
            F.count("*").alias("n_rows"),
        )
    )


# ---------------------------------------------------------------------------
# TPC-H Q18: large-volume customers (agg → semi-filter → join chain)
# ---------------------------------------------------------------------------


@register(
    "tpch_q18_big_orders",
    oracle="""
    WITH big AS (
      SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
      HAVING sum(l_quantity) > 150
    )
    SELECT c_custkey, c_name, o_orderkey, o_orderdate,
           round(o_totalprice, 2) AS o_totalprice,
           round(sum(l_quantity), 2) AS total_qty
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (SELECT l_orderkey FROM big)
    GROUP BY c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice
    """,
    doc="TPC-H Q18 shape: pre-aggregate lineitem to find big orders "
    "(partial agg on the fact table), left-semi filter orders, then the "
    "detail join+agg — the agg-before-join pattern that keeps the heavy "
    "join input small at scale.",
)
def q_tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    big = li.groupBy("l_orderkey").agg(F.sum("l_quantity").alias("q")).filter(F.col("q") > 150)
    filtered_orders = orders.join(
        big.select("l_orderkey"), orders.o_orderkey == big.l_orderkey, "left_semi"
    )
    joined = cust.join(filtered_orders, F.col("c_custkey") == F.col("o_custkey")).join(
        li, F.col("o_orderkey") == F.col("l_orderkey")
    )
    return joined.groupBy("c_custkey", "c_name", "o_orderkey", "o_orderdate", "o_totalprice").agg(
        F.round(F.sum("l_quantity"), 2).alias("total_qty")
    ).withColumn("o_totalprice", F.round("o_totalprice", 2))


# ---------------------------------------------------------------------------
# Join chain: revenue per nation (lineitem⋈orders⋈customer⋈nation⋈region)
# ---------------------------------------------------------------------------


@register(
    "revenue_by_nation",
    oracle="""
    SELECT n_name, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA' AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
    GROUP BY n_name
    """,
    doc="TPC-H Q5-ish join chain. nation/region broadcast (25/5 rows at "
    "any SF); customer⋈orders⋈lineitem are key-partitioned joins that AQE "
    "can skew-split. The r_name filter prunes via the broadcast before "
    "the fact shuffle.",
)
def q_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp")
    )
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")

    dim = join_broadcast(
        join_broadcast(cust, nation, F.col("c_nationkey") == F.col("n_nationkey")),
        region,
        F.col("n_regionkey") == F.col("r_regionkey"),
    )
    joined = li.join(orders, F.col("l_orderkey") == F.col("o_orderkey")).join(
        dim, F.col("o_custkey") == F.col("c_custkey")
    )
    return joined.groupBy("n_name").agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue")
    )


# ---------------------------------------------------------------------------
# TPC-H Q3 shape via the SQL-text interface (the engine's SQL surface)
# ---------------------------------------------------------------------------

_Q3_SQL = """
    SELECT l_orderkey,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           o_orderdate, o_orderpriority
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      AND l_shipdate  > TIMESTAMP '1996-01-01 00:00:00'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, o_orderdate ASC, l_orderkey ASC
    LIMIT 10
"""


@register(
    "tpch_q3_sql",
    oracle=_Q3_SQL,
    doc="TPC-H Q3 shape executed through the engine's SQL-text surface "
    "(functions.sql → temp views → Catalyst) — identical SQL runs on "
    "both engines; tie-broken ORDER BY keeps the LIMIT deterministic.",
)
def q_tpch_q3_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flink_anomaly_spark.functions.registry import sql

    return sql(spark, sf_dir, _Q3_SQL)


# ---------------------------------------------------------------------------
# Semi / anti joins
# ---------------------------------------------------------------------------


@register(
    "customers_with_orders_semi",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                  AND o_orderstatus = 'F')
    """,
    doc="Left-semi join (EXISTS) — right side reduced to distinct keys "
    "before the probe, far cheaper than inner+distinct at scale.",
)
def q_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    return cust.join(
        orders, F.col("c_custkey") == F.col("o_custkey"), "left_semi"
    ).select("c_custkey", "c_name")


@register(
    "customers_without_orders_anti",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
    doc="Left-anti join (NOT EXISTS).",
)
def q_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return cust.join(
        orders, F.col("c_custkey") == F.col("o_custkey"), "left_anti"
    ).select("c_custkey", "c_name")


# ---------------------------------------------------------------------------
# MERGE / upsert emulation (CDC-style incremental maintenance)
# ---------------------------------------------------------------------------


@register(
    "merge_upsert_customers",
    oracle="""
    SELECT c_custkey, c_name, c_acctbal
    FROM (
      SELECT c_custkey, c_name, c_acctbal + 100.0 AS c_acctbal
      FROM customer WHERE c_mktsegment = 'BUILDING'
      UNION ALL
      SELECT c_custkey, c_name, c_acctbal
      FROM customer
      WHERE c_custkey NOT IN (SELECT c_custkey FROM customer
                              WHERE c_mktsegment = 'BUILDING')
    ) t
    """,
    doc="MERGE INTO emulation (no Delta in this build): a CDC batch "
    "(BUILDING customers credited +100.00) upserted into the customer "
    "table via updates ∪ (target anti-join updates) — "
    "operators/relational.merge_upsert. The update is an exact binary "
    "add (multiplying would need a round whose decimal-midpoint rule "
    "differs across engines at scale).",
)
def q_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flink_anomaly_spark.operators.relational import merge_upsert

    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name", "c_acctbal")
    updates = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey", "c_name", (F.col("c_acctbal") + 100.0).alias("c_acctbal"))
    )
    return merge_upsert(cust, updates, "c_custkey")


# ---------------------------------------------------------------------------
# Outer / cross joins + null handling
# ---------------------------------------------------------------------------


@register(
    "left_outer_join_nulls",
    oracle="""
    SELECT o_orderkey,
           b.c_custkey AS b_custkey,
           coalesce(b.c_name, 'NO_BUILDING_CUSTOMER') AS cust_label,
           CASE WHEN b.c_custkey IS NULL THEN 0 ELSE 1 END AS matched
    FROM orders o
    LEFT JOIN (SELECT c_custkey, c_name FROM customer
               WHERE c_mktsegment = 'BUILDING') b
      ON o.o_custkey = b.c_custkey
    WHERE o.o_orderkey % 5 = 0
    """,
    doc="Left outer join with null-handling battery (coalesce/CASE on "
    "the unmatched side) — the probe side keeps all rows, broadcastable "
    "build side.",
)
def q_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 5 == 0)
    bldg = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey", "c_name")
    )
    j = orders.join(bldg, orders.o_custkey == bldg.c_custkey, "left")
    return j.select(
        "o_orderkey",
        F.col("c_custkey").alias("b_custkey"),
        F.coalesce("c_name", F.lit("NO_BUILDING_CUSTOMER")).alias("cust_label"),
        F.when(F.col("c_custkey").isNull(), 0).otherwise(1).alias("matched"),
    )


@register(
    "full_outer_join",
    oracle="""
    SELECT coalesce(a.event_id, b.event_id) AS event_id,
           a.value AS low_value, b.value AS high_value
    FROM (SELECT event_id, value FROM events WHERE value < 100) a
    FULL OUTER JOIN (SELECT event_id, value FROM events WHERE value >= 400) b
      ON a.event_id = b.event_id
    """,
    doc="Full outer join of two disjoint event slices — every row "
    "appears exactly once with a null opposite side.",
)
def q_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    a = events.filter(F.col("value") < 100).select(
        F.col("event_id").alias("a_id"), F.col("value").alias("low_value")
    )
    b = events.filter(F.col("value") >= 400).select(
        F.col("event_id").alias("b_id"), F.col("value").alias("high_value")
    )
    j = a.join(b, a.a_id == b.b_id, "full_outer")
    return j.select(
        F.coalesce("a_id", "b_id").alias("event_id"), "low_value", "high_value"
    )


@register(
    "cross_join_grid",
    oracle="""
    SELECT r_name, n_name FROM region CROSS JOIN nation WHERE n_regionkey % 2 = 0
    """,
    doc="Cross join (explicit cartesian of two tiny dims) — Spark plans "
    "BroadcastNestedLoopJoin; only ever sane when one side is O(1).",
)
def q_cross_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = load_table(spark, sf_dir, "region").select("r_name")
    nation = load_table(spark, sf_dir, "nation").filter(F.col("n_regionkey") % 2 == 0)
    return region.crossJoin(nation.select("n_name"))


@register(
    "date_functions",
    oracle="""
    SELECT o_orderkey,
           date_diff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE)) AS ship_delay_days,
           strftime(o_orderdate + INTERVAL 3 MONTH, '%Y-%m-%d') AS plus_3_months,
           strftime(last_day(CAST(o_orderdate AS DATE)), '%Y-%m-%d') AS month_end,
           strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
           CAST(quarter(o_orderdate) AS INT) AS q
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey % 100 = 0 AND l_linenumber = 1
    """,
    doc="Date arithmetic battery (datediff/add_months/last_day/"
    "date_trunc/quarter) over the order→ship timeline. Date outputs are "
    "ISO strings — python date vs pandas Timestamp canonicalize "
    "differently in value-hash comparisons.",
)
def q_date_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 100 == 0)
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_linenumber") == 1)
    j = orders.join(li, orders.o_orderkey == li.l_orderkey)
    return j.select(
        "o_orderkey",
        F.datediff(F.col("l_shipdate").cast("date"), F.col("o_orderdate").cast("date")).alias(
            "ship_delay_days"
        ),
        F.date_format(F.add_months("o_orderdate", 3), "yyyy-MM-dd").alias("plus_3_months"),
        F.date_format(F.last_day("o_orderdate"), "yyyy-MM-dd").alias("month_end"),
        F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM-dd").alias("month_start"),
        F.quarter("o_orderdate").alias("q"),
    )


# ---------------------------------------------------------------------------
# Sort / limit / top-k
# ---------------------------------------------------------------------------


@register(
    "topk_orders",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey ASC
    LIMIT 10
    """,
    doc="Global top-k: Spark plans TakeOrderedAndProject (per-partition "
    "heap + driver merge of k·p rows) — no global sort shuffle at any "
    "scale. Tie-break on o_orderkey keeps the row set deterministic.",
)
def q_topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return top_k(
        orders.select("o_orderkey", "o_custkey", "o_totalprice"),
        [F.col("o_totalprice").desc(), F.col("o_orderkey").asc()],
        10,
    )


@register(
    "topk_events_per_type",
    oracle="""
    SELECT event_type, event_id, value, rn FROM (
      SELECT event_type, event_id, value,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY value DESC, event_id ASC) AS rn
      FROM events) t
    WHERE rn <= 3
    """,
    doc="Top-k per group via ranking window: one hash shuffle on the "
    "group key, per-partition sort, rank filter.",
)
def q_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    out = top_k_per_group(
        events.select("event_type", "event_id", "value"),
        group_cols=["event_type"],
        order_by=[F.col("value").desc(), F.col("event_id").asc()],
        k=3,
    )
    return out.select("event_type", "event_id", "value", "rn")


# ---------------------------------------------------------------------------
# Distinct aggregation / grouping sets
# ---------------------------------------------------------------------------


@register(
    "exact_percentiles",
    oracle="""
    SELECT event_type,
           round(quantile_cont(value, 0.5), 6)  AS median_value,
           round(quantile_cont(value, 0.95), 6) AS p95_value,
           round(min(value), 2) AS min_value,
           round(max(value), 2) AS max_value
    FROM events GROUP BY event_type
    """,
    doc="Exact (interpolated) percentiles per group — Spark percentile "
    "≙ DuckDB quantile_cont (both linear interpolation over the sorted "
    "group). The exact counterpart to approx_stats' sketches.",
)
def q_exact_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return events.groupBy("event_type").agg(
        F.round(F.percentile("value", 0.5), 6).alias("median_value"),
        F.round(F.percentile("value", 0.95), 6).alias("p95_value"),
        F.round(F.min("value"), 2).alias("min_value"),
        F.round(F.max("value"), 2).alias("max_value"),
    )


@register(
    "orders_distinct_agg",
    oracle="""
    SELECT o_orderpriority,
           count(DISTINCT o_custkey) AS n_customers,
           count(*) AS n_orders,
           round(sum(o_totalprice), 2) AS total
    FROM orders
    GROUP BY o_orderpriority
    """,
    doc="Hash aggregation with count(distinct) — Spark expands to a "
    "two-phase partial/final plan automatically.",
)
def q_distinct_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderpriority").agg(
        F.countDistinct("o_custkey").alias("n_customers"),
        F.count("*").alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("total"),
    )


@register(
    "lineitem_rollup",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2) AS sum_qty, count(*) AS n
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    doc="ROLLUP grouping sets — Catalyst Expand + single hash agg.",
)
def q_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"), F.count("*").alias("n")
    )


# ---------------------------------------------------------------------------
# Ranking / analytic window functions
# ---------------------------------------------------------------------------


@register(
    "lineitem_cube",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_extendedprice), 2) AS sum_price, count(*) AS n
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
    doc="CUBE grouping sets (all 4 combinations) — Catalyst Expand + one "
    "hash agg, same plan family as rollup.",
)
def q_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_extendedprice"), 2).alias("sum_price"), F.count("*").alias("n")
    )


@register(
    "lead_lag_window",
    oracle="""
    SELECT event_id, user_id, value,
           lag(value)  OVER w AS prev_value,
           lead(value) OVER w AS next_value,
           round(value - lag(value) OVER w, 4) AS delta
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
    doc="lead/lag analytic functions per user timeline — one shuffle on "
    "user_id, in-partition sort.",
)
def q_lead_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return events.select(
        "event_id",
        "user_id",
        "value",
        F.lag("value").over(w).alias("prev_value"),
        F.lead("value").over(w).alias("next_value"),
        F.round(F.col("value") - F.lag("value").over(w), 4).alias("delta"),
    )


@register(
    "json_extract_props",
    oracle="""
    SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_value
    FROM events
    WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) > 90
    """,
    doc="JSON extraction from the events.props string column — "
    "get_json_object (JVM-side JSON path) + predicate on the extracted "
    "value.",
)
def q_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("bigint")
    return events.select("event_id", k.alias("k_value")).filter(F.col("k_value") > 90)


@register(
    "string_date_functions",
    oracle="""
    SELECT c_custkey,
           regexp_replace(c_name, '[0-9]+', '#')          AS name_masked,
           replace(c_name, 'Customer', 'Cust')            AS name_short,
           concat(c_mktsegment, ':', c_name)              AS tagged,
           lpad(CAST(c_custkey AS VARCHAR), 8, '0')       AS key_padded,
           reverse(c_mktsegment)                          AS seg_rev,
           CAST(strpos(c_name, '1') AS INT)               AS first_one,
           trim(concat(' ', c_name, ' '))                 AS trimmed
    FROM customer
    WHERE c_custkey % 3 = 0
    """,
    doc="Extended string-function battery (regexp_replace/replace/"
    "concat/lpad/reverse/instr/trim) — all JVM built-ins; the RE2-safe "
    "regex works identically in the oracle.",
)
def q_string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").filter(F.col("c_custkey") % 3 == 0)
    return cust.select(
        "c_custkey",
        F.regexp_replace("c_name", "[0-9]+", "#").alias("name_masked"),
        F.expr("replace(c_name, 'Customer', 'Cust')").alias("name_short"),
        F.concat("c_mktsegment", F.lit(":"), "c_name").alias("tagged"),
        F.lpad(F.col("c_custkey").cast("string"), 8, "0").alias("key_padded"),
        F.reverse("c_mktsegment").alias("seg_rev"),
        F.instr("c_name", "1").alias("first_one"),
        F.trim(F.concat(F.lit(" "), "c_name", F.lit(" "))).alias("trimmed"),
    )


@register(
    "array_functions",
    oracle=r"""
    WITH t AS (
      SELECT doc_id,
             list_filter(string_split_regex(text, '\s+'), tk -> tk != '') AS toks
      FROM documents WHERE doc_id % 10 = 0
    )
    SELECT doc_id,
           len(toks)                                          AS n_toks,
           len(list_distinct(toks))                           AS n_uniq,
           array_to_string(list_sort(list_distinct(toks))[1:3], ',') AS first3_sorted,
           list_contains(toks, 'data')                        AS has_data,
           CAST(len(list_filter(toks, tk -> length(tk) > 5)) AS INT) AS n_long
    FROM t
    """,
    doc="Array/higher-order function battery (size/distinct/sort/slice/"
    "contains/filter) over tokenized documents.",
)
def q_array_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 10 == 0)
    toks = F.filter(F.split("text", r"\s+"), lambda t: t != "")
    return docs.select(
        "doc_id",
        F.size(toks).alias("n_toks"),
        F.size(F.array_distinct(toks)).alias("n_uniq"),
        F.concat_ws(",", F.slice(F.array_sort(F.array_distinct(toks)), 1, 3)).alias(
            "first3_sorted"
        ),
        F.array_contains(toks, "data").alias("has_data"),
        F.size(F.filter(toks, lambda t: F.length(t) > 5)).alias("n_long"),
    )


@register(
    "analytic_functions_extended",
    oracle="""
    SELECT c_custkey, c_nationkey, c_acctbal,
           ntile(4)            OVER w AS quartile,
           (rank() OVER w - 1) * 1000000
                // greatest(count(*) OVER p - 1, 1) AS pct_rank_ppm,
           (count(*) OVER wc) * 1000000
                // (count(*) OVER p) AS cume_ppm,
           first_value(c_custkey) OVER w AS richest_key,
           nth_value(c_custkey, 2) OVER w AS second_key
    FROM customer
    WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey),
           p AS (PARTITION BY c_nationkey),
           wc AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
    doc="Extended analytic battery: ntile/percent-rank/cume-dist/"
    "first_value/nth_value per nation. percent_rank and cume_dist are "
    "emitted as EXACT parts-per-million integers ((rank−1)·1e6 div "
    "(N−1)) — the float forms round differently across engines at "
    "decimal midpoints once partitions grow (observed at sf0.1).",
)
def q_analytic_extended(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(F.col("c_acctbal").desc(), F.col("c_custkey"))
    p = Window.partitionBy("c_nationkey")
    wc = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    n_part = F.count("*").over(p)
    return cust.select(
        "c_custkey",
        "c_nationkey",
        "c_acctbal",
        F.ntile(4).over(w).alias("quartile"),
        # integer div on BOTH sides: DuckDB CAST(double→BIGINT) rounds
        # while Spark's cast truncates — `div` / `//` sidestep floats
        F.expr(
            "((rank() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey) - 1)"
            " * 1000000) div greatest(count(*) OVER (PARTITION BY c_nationkey) - 1, 1)"
        ).alias("pct_rank_ppm"),
        F.expr(
            "(count(*) OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey"
            " ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) * 1000000)"
            " div count(*) OVER (PARTITION BY c_nationkey)"
        ).alias("cume_ppm"),
        F.first("c_custkey").over(w).alias("richest_key"),
        F.nth_value("c_custkey", 2).over(w).alias("second_key"),
    )


@register(
    "hash_sample_10pct",
    oracle=f"""
    SELECT doc_id, lang, n_chars
    FROM documents
    WHERE {MD5_32.format(x="CAST(doc_id AS VARCHAR)")} % 100 < 10
    """,
    doc="Deterministic 10% sample via md5-hash-mod on the key — the "
    "reproducible sampling pattern for training pipelines (same rows "
    "selected on every run, any engine, any partitioning; seeded "
    "rand() sampling is neither engine-portable nor rerun-stable).",
)
def q_hash_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.filter(md5_int32(F.col("doc_id").cast("string")) % 100 < 10).select(
        "doc_id", "lang", "n_chars"
    )


@register(
    "train_val_test_split",
    oracle=f"""
    SELECT split, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS total_chars
    FROM (
      SELECT n_chars,
             CASE WHEN h % 100 < 80 THEN 'train'
                  WHEN h % 100 < 90 THEN 'val'
                  ELSE 'test' END AS split
      FROM (SELECT n_chars,
                   {MD5_32.format(x="CAST(doc_id AS VARCHAR)")} AS h
            FROM documents) t
    ) s
    GROUP BY split
    """,
    doc="Deterministic 80/10/10 train/val/test assignment via hash-mod "
    "buckets — stable under reruns, repartitioning, and engine moves; "
    "rolled up to per-split document/char counts.",
)
def q_train_val_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    h = md5_int32(F.col("doc_id").cast("string"))
    split = (
        F.when(h % 100 < 80, "train").when(h % 100 < 90, "val").otherwise("test")
    )
    return (
        docs.select(split.alias("split"), "n_chars")
        .groupBy("split")
        .agg(F.count("*").alias("n_docs"), F.sum("n_chars").alias("total_chars"))
    )


@register(
    "unpivot_lineitem_measures",
    oracle="""
    SELECT l_orderkey, l_linenumber, measure, round(value, 4) AS value FROM (
      SELECT l_orderkey, l_linenumber, 'quantity' AS measure, l_quantity AS value FROM lineitem
      UNION ALL
      SELECT l_orderkey, l_linenumber, 'price', l_extendedprice FROM lineitem
      UNION ALL
      SELECT l_orderkey, l_linenumber, 'discount', l_discount FROM lineitem
      UNION ALL
      SELECT l_orderkey, l_linenumber, 'tax', l_tax FROM lineitem
    ) t WHERE l_orderkey % 50 = 0
    """,
    doc="Unpivot (wide→long) via stack() — four measure columns to "
    "(measure, value) rows; the inverse of pivot_order_status.",
)
def q_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 50 == 0)
    return li.selectExpr(
        "l_orderkey",
        "l_linenumber",
        "stack(4, 'quantity', l_quantity, 'price', l_extendedprice, "
        "'discount', l_discount, 'tax', l_tax) AS (measure, value)",
    ).withColumn("value", F.round("value", 4))


@register(
    "customer_rank_window",
    oracle="""
    SELECT c_custkey, c_nationkey, c_acctbal,
           row_number()  OVER w AS rn,
           rank()        OVER w AS rnk,
           dense_rank()  OVER w AS drnk,
           round(sum(c_acctbal) OVER (PARTITION BY c_nationkey
                 ORDER BY c_acctbal DESC, c_custkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
             AS running_bal
    FROM customer
    WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey)
    """,
    doc="SQL ranking + cumulative analytic window functions (absent from "
    "the reference, §2.9) — one shuffle on the partition key.",
)
def q_rank_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(F.col("c_acctbal").desc(), F.col("c_custkey"))
    wcum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return cust.select(
        "c_custkey",
        "c_nationkey",
        "c_acctbal",
        F.row_number().over(w).alias("rn"),
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.round(F.sum("c_acctbal").over(wcum), 2).alias("running_bal"),
    )


# ---------------------------------------------------------------------------
# Scalar function library (string/date/math) — §2.9 checklist
# ---------------------------------------------------------------------------


@register(
    "scalar_functions",
    oracle="""
    SELECT o_orderkey,
           upper(o_orderpriority)                        AS prio_upper,
           length(o_orderstatus)                         AS status_len,
           substr(o_orderpriority, 1, 1)                 AS prio_code,
           year(o_orderdate)                             AS order_year,
           month(o_orderdate)                            AS order_month,
           round(sqrt(o_totalprice), 4)                  AS price_sqrt,
           round(ln(o_totalprice + 1), 6)                AS price_ln,
           CAST(floor(o_totalprice / 1000) AS BIGINT)    AS price_k
    FROM orders
    WHERE o_orderkey % 7 = 0
    """,
    doc="Scalar string/date/math function battery (reference has only "
    "toUpperCase, §2.9) — all JVM-codegen built-ins.",
)
def q_scalar_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 7 == 0)
    return orders.select(
        "o_orderkey",
        F.upper("o_orderpriority").alias("prio_upper"),
        F.length("o_orderstatus").alias("status_len"),
        F.substring("o_orderpriority", 1, 1).alias("prio_code"),
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month"),
        F.round(F.sqrt("o_totalprice"), 4).alias("price_sqrt"),
        F.round(F.log(F.col("o_totalprice") + 1), 6).alias("price_ln"),
        F.floor(F.col("o_totalprice") / 1000).cast("bigint").alias("price_k"),
    )


# ---------------------------------------------------------------------------
# TPC-H Q10: returned-item revenue per customer (one quarter)
# ---------------------------------------------------------------------------


@register(
    "tpch_q10_returns",
    oracle="""
    SELECT c_custkey, c_name,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           round(c_acctbal, 2) AS c_acctbal, n_name
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-04-01 00:00:00'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey ASC
    LIMIT 20
    """,
    doc="TPC-H Q10 shape: quarter-filtered orders ⋈ returned lineitems "
    "⋈ customer ⋈ broadcast nation, top-20 by lost revenue via "
    "TakeOrdered (no global sort). Both date filters push to the scans.",
)
def q_tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    joined = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
    )
    return (
        joined.groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
        .withColumn("c_acctbal", F.round("c_acctbal", 2))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(20)
    )


# ---------------------------------------------------------------------------
# TPC-H Q14: promotion revenue share (one month)
# ---------------------------------------------------------------------------


@register(
    "tpch_q14_promo",
    oracle="""
    SELECT round(100.0 * sum(CASE WHEN p_type = 'PROMO'
                                  THEN l_extendedprice * (1 - l_discount)
                                  ELSE 0 END)
                 / sum(l_extendedprice * (1 - l_discount)), 4) AS promo_revenue_pct
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-09-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-10-01 00:00:00'
    """,
    doc="TPC-H Q14 shape: month-filtered lineitem ⋈ part (hint-free: "
    "part is SF-proportional, so AQE broadcasts while it fits and "
    "shuffles past the threshold), conditional aggregation ratio — a "
    "single map-side-combined agg beyond the join.",
)
def q_tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-09-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-10-01").cast("timestamp"))
    )
    part = load_table(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            F.round(
                100.0
                * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(0.0))
                / F.sum(rev),
                4,
            ).alias("promo_revenue_pct")
        )
    )


# ---------------------------------------------------------------------------
# TPC-H Q17 shape: small-quantity orders for one brand (correlated avg)
# ---------------------------------------------------------------------------


@register(
    "tpch_q17_small_qty",
    oracle="""
    SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#9'
      AND l_quantity < (SELECT 0.2 * avg(l_quantity)
                        FROM lineitem l2 WHERE l2.l_partkey = p_partkey)
    """,
    doc="TPC-H Q17 shape (adapted: the synthetic part table has no "
    "p_container, so the filter is brand-only): the correlated "
    "avg-quantity subquery is decorrelated into a per-part pre-agg "
    "joined back (hint-free: the pre-agg is part-cardinality, so the "
    "join strategy is AQE-decided). The avg "
    "threshold is exact on both engines (integer-valued quantities sum "
    "exactly in doubles), so the comparison cannot flip.",
)
def q_tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#9")
    li_brand = li.join(part.select("p_partkey"), li.l_partkey == F.col("p_partkey"))
    thr = li_brand.groupBy(F.col("l_partkey").alias("t_partkey")).agg(
        (0.2 * F.avg("l_quantity")).alias("thr")
    )
    return (
        li_brand.join(thr, F.col("l_partkey") == F.col("t_partkey"))
        .filter(F.col("l_quantity") < F.col("thr"))
        .agg(F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"))
    )


# ---------------------------------------------------------------------------
# TPC-H Q19 shape: disjunctive predicates across a join
# ---------------------------------------------------------------------------


@register(
    "tpch_q19_disjunct",
    oracle="""
    SELECT round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#1'  AND p_size BETWEEN 1  AND 15 AND l_quantity BETWEEN 1  AND 11)
       OR (p_brand = 'Brand#9'  AND p_size BETWEEN 10 AND 25 AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#20' AND p_size BETWEEN 20 AND 50 AND l_quantity BETWEEN 20 AND 30)
    """,
    doc="TPC-H Q19 shape (adapted: brand/size/quantity stand in for the "
    "missing container column): an OR of conjunctive predicates "
    "spanning both join sides. Catalyst extracts the common "
    "l_quantity <= 30 / p-side disjunction bounds as pushable filters "
    "before the part join (strategy AQE-decided — part grows with SF); "
    "the full disjunction evaluates post-join.",
)
def q_tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    j = li.join(part, F.col("p_partkey") == F.col("l_partkey"))
    pred = (
        ((F.col("p_brand") == "Brand#1") & F.col("p_size").between(1, 15) & F.col("l_quantity").between(1, 11))
        | ((F.col("p_brand") == "Brand#9") & F.col("p_size").between(10, 25) & F.col("l_quantity").between(10, 20))
        | ((F.col("p_brand") == "Brand#20") & F.col("p_size").between(20, 50) & F.col("l_quantity").between(20, 30))
    )
    return j.filter(pred).agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue")
    )


# ---------------------------------------------------------------------------
# TPC-H Q4 shape: EXISTS semi-join with a cross-side predicate
# ---------------------------------------------------------------------------


@register(
    "tpch_q4_late_orders",
    oracle="""
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1996-07-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey
                    AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
    GROUP BY o_orderpriority
    """,
    doc="TPC-H Q4 shape (adapted: the synthetic lineitem has no "
    "commitdate/receiptdate, so 'late' = shipped >60 days after the "
    "order date). The EXISTS compiles to a LEFT SEMI join whose "
    "condition references both sides; the orders date range pushes to "
    "the parquet scan, and the semi join deduplicates order keys "
    "without materializing the multi-line match.",
)
def q_tpch_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-07-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = orders.join(
        li,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(F.count("*").alias("order_count"))


# ---------------------------------------------------------------------------
# TPC-H Q5 shape: 6-way snowflake join with a same-nation constraint
# ---------------------------------------------------------------------------


@register(
    "tpch_q5_local_supplier",
    oracle="""
    SELECT n_name, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY n_name
    """,
    doc="TPC-H Q5: the classic local-supplier-volume snowflake. "
    "nation/region broadcast (25/5 rows at any SF); supplier is "
    "SF-proportional so its join is hint-free (AQE-decided); "
    "lineitem⋈orders and orders⋈customer shuffle on their natural keys. "
    "The same-nation constraint (c_nationkey = s_nationkey) rides the "
    "supplier join condition instead of a post-join filter, so the "
    "join drops non-local rows immediately.",
)
def q_tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    asia_nations = nation.join(
        F.broadcast(region), nation.n_regionkey == region.r_regionkey
    ).select("n_nationkey", "n_name")
    return (
        li.join(orders.select("o_orderkey", "o_custkey"), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(
            supp,
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(asia_nations), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue")
        )
    )


# ---------------------------------------------------------------------------
# TPC-H Q7 shape: bidirectional nation-pair volume by year
# ---------------------------------------------------------------------------


@register(
    "tpch_q7_volume_shipping",
    oracle="""
    SELECT supp_nation, cust_nation, l_year,
           round(sum(volume), 2) AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             year(l_shipdate) AS l_year,
             l_extendedprice * (1 - l_discount) AS volume
      FROM supplier
      JOIN lineitem ON s_suppkey = l_suppkey
      JOIN orders   ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN nation n1 ON s_nationkey = n1.n_nationkey
      JOIN nation n2 ON c_nationkey = n2.n_nationkey
      WHERE (n1.n_name = 'NATION_18' AND n2.n_name = 'NATION_19')
         OR (n1.n_name = 'NATION_19' AND n2.n_name = 'NATION_18')
    ) shipping
    GROUP BY supp_nation, cust_nation, l_year
    """,
    doc="TPC-H Q7: nation-pair trade volume by ship year. The nation "
    "dim is joined twice under different roles (supplier side / "
    "customer side) — both broadcast (25 rows at any SF) — and the "
    "disjunctive pair filter evaluates after both are attached. The "
    "supplier join is hint-free (SF-proportional, AQE-decided).",
)
def q_tpch_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = load_table(spark, sf_dir, "nation")
    n1 = nation.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_18") & (F.col("cust_nation") == "NATION_19")
    ) | ((F.col("supp_nation") == "NATION_19") & (F.col("cust_nation") == "NATION_18"))
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(pair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue")
        )
    )


# ---------------------------------------------------------------------------
# TPC-H Q8 shape: market-share ratio with a double-role nation dim
# ---------------------------------------------------------------------------


@register(
    "tpch_q8_market_share",
    oracle="""
    SELECT o_year,
           round(sum(CASE WHEN nation = 'NATION_1' THEN volume ELSE 0 END)
                 / sum(volume), 4) AS mkt_share
    FROM (
      SELECT year(o_orderdate) AS o_year,
             l_extendedprice * (1 - l_discount) AS volume,
             n2.n_name AS nation
      FROM part
      JOIN lineitem ON p_partkey = l_partkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation n1 ON c_nationkey = n1.n_nationkey
      JOIN region   ON n1.n_regionkey = r_regionkey
      JOIN nation n2 ON s_nationkey = n2.n_nationkey
      WHERE r_name = 'AMERICA' AND p_type = 'ECONOMY'
    ) all_nations
    GROUP BY o_year
    """,
    doc="TPC-H Q8 shape (adapted: no p_mfgr in the synthetic part "
    "table, so the part filter is p_type). Market share of NATION_1 "
    "suppliers in AMERICA-region ECONOMY sales per order year. The "
    "nation dim joins twice (customer region membership / supplier "
    "nationality); the filtered part key-list semi-reduces lineitem "
    "before the fact join (hint-free — part/supplier are "
    "SF-proportional, AQE picks the strategy); conditional-sum ratio "
    "needs no second pass.",
)
def q_tpch_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_orderdate")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    america_nations = nation.join(
        F.broadcast(region), nation.n_regionkey == region.r_regionkey
    ).select(F.col("n_nationkey").alias("cn_key"))
    n2 = nation.select(F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("nation"))
    volume = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(part.select("p_partkey"), F.col("l_partkey") == F.col("p_partkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(america_nations), F.col("c_nationkey") == F.col("cn_key"), "left_semi")
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("sn_key"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.round(
                F.sum(F.when(F.col("nation") == "NATION_1", volume).otherwise(F.lit(0.0)))
                / F.sum(volume),
                4,
            ).alias("mkt_share")
        )
    )


# ---------------------------------------------------------------------------
# TPC-H Q12 shape: join + dual conditional counts
# ---------------------------------------------------------------------------


@register(
    "tpch_q12_priority_class",
    oracle="""
    SELECT l_returnflag,
           count(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                      THEN 1 END) AS high_line_count,
           count(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                      THEN 1 END) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= o_orderdate + INTERVAL 30 DAY
      AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY l_returnflag
    """,
    doc="TPC-H Q12 shape (adapted: l_returnflag stands in for the "
    "missing l_shipmode, 30-days-late for commit/receipt lag). One "
    "fact-fact shuffle join; the cross-side lateness predicate "
    "evaluates in the join; the two priority-classified counts are a "
    "single-pass conditional aggregation (map-side combined).",
)
def q_tpch_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        orders.join(
            li.select("l_orderkey", "l_shipdate", "l_returnflag"),
            (F.col("o_orderkey") == F.col("l_orderkey"))
            & (F.col("l_shipdate") >= F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")),
        )
        .groupBy("l_returnflag")
        .agg(
            F.count(F.when(high, 1)).alias("high_line_count"),
            F.count(F.when(~high, 1)).alias("low_line_count"),
        )
    )


# ---------------------------------------------------------------------------
# TPC-H Q13 shape: outer join with an ON-clause filter, then a
# distribution-of-counts re-aggregation
# ---------------------------------------------------------------------------


@register(
    "tpch_q13_cust_distribution",
    oracle="""
    SELECT c_count, count(*) AS custdist
    FROM (
      SELECT c_custkey, count(o_orderkey) AS c_count
      FROM customer LEFT JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      GROUP BY c_custkey
    ) c_orders
    GROUP BY c_count
    """,
    doc="TPC-H Q13: order-count distribution over customers. The "
    "priority exclusion lives in the LEFT JOIN's ON clause (filtering "
    "the right side pre-join — NOT a WHERE, which would drop "
    "order-less customers); count(o_orderkey) counts matches only. "
    "Two shuffles: the outer join on custkey and the tiny re-agg on "
    "the count value.",
)
def q_tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") != "1-URGENT")
        .select("o_custkey", "o_orderkey")
    )
    per_cust = (
        cust.join(orders, F.col("c_custkey") == F.col("o_custkey"), "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


# ---------------------------------------------------------------------------
# TPC-H Q15 shape: scalar-max subquery over a derived revenue view
# ---------------------------------------------------------------------------


@register(
    "tpch_q15_top_supplier",
    oracle="""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
    """,
    doc="TPC-H Q15: top supplier by quarterly revenue. The revenue "
    "view aggregates once (|suppliers| rows); the scalar max is a "
    "1-row broadcast joined back (supplier attaches hint-free) — no "
    "second scan of lineitem, no "
    "global sort. Revenue is rounded BEFORE the equality compare on "
    "both engines so summation-order ulp drift cannot flip the winner.",
)
def q_tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    rev = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
            "total_revenue"
        )
    )
    mx = rev.agg(F.max("total_revenue").alias("mx"))
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        rev.join(F.broadcast(mx), F.col("total_revenue") == F.col("mx"))
        .join(supp, F.col("supplier_no") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


# ---------------------------------------------------------------------------
# TPC-H Q22 shape: scalar-avg subquery + NOT EXISTS anti join
# ---------------------------------------------------------------------------


@register(
    "tpch_q22_dormant_customers",
    oracle="""
    SELECT c_nationkey AS cntrycode, count(*) AS numcust,
           round(sum(c_acctbal), 2) AS totacctbal
    FROM customer
    WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0.0)
      AND NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderpriority = '1-URGENT')
    GROUP BY c_nationkey
    """,
    doc="TPC-H Q22 shape (adapted: nationkey stands in for the missing "
    "phone country code; 'dormant' = no urgent orders, since every "
    "synthetic customer has at least one order). Scalar-avg subquery "
    "broadcasts as a 1-row threshold; the NOT EXISTS compiles to a "
    "LEFT ANTI join against the pre-filtered urgent orders.",
)
def q_tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    avg_bal = cust.filter(F.col("c_acctbal") > 0.0).agg(
        F.avg("c_acctbal").alias("avg_bal")
    )
    urgent = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_custkey")
    )
    return (
        cust.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(urgent, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy(F.col("c_nationkey").alias("cntrycode"))
        .agg(
            F.count("*").alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
    )


@register(
    "lineitem_grouping_sets",
    oracle="""
    SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
           coalesce(l_linestatus, 'ALL') AS linestatus,
           grouping(l_returnflag) AS g_flag,
           grouping(l_linestatus) AS g_status,
           count(*) AS n_rows,
           round(sum(l_extendedprice), 2) AS sum_price
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
    """,
    doc="Explicit GROUPING SETS through the SQL-text interface "
    "(complements the DataFrame rollup/cube queries): three grouping "
    "levels in one Expand+HashAggregate pass — Spark's Expand emits "
    "one row per set per input row but partial aggregation collapses "
    "them map-side, so the exchange carries ≤ Σ|groups| rows. "
    "grouping() flags disambiguate real NULLs from subtotal rows.",
)
def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flink_anomaly_spark.functions.registry import sql

    return sql(
        spark,
        sf_dir,
        """
        SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
               coalesce(l_linestatus, 'ALL') AS linestatus,
               grouping(l_returnflag) AS g_flag,
               grouping(l_linestatus) AS g_status,
               count(*) AS n_rows,
               round(sum(l_extendedprice), 2) AS sum_price
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
        """,
    )


# ---------------------------------------------------------------------------
# TPC-H Q21 shape: the "sole late supplier" blame query
# ---------------------------------------------------------------------------


@register(
    "tpch_q21_late_blame",
    oracle="""
    WITH flagged AS (
      SELECT l_orderkey, l_suppkey,
             CASE WHEN l_shipdate > o_orderdate + INTERVAL 60 DAY
                  THEN 1 ELSE 0 END AS late
      FROM lineitem JOIN orders ON o_orderkey = l_orderkey
    ), per_order AS (
      SELECT l_orderkey,
             count(DISTINCT l_suppkey) AS n_supp,
             count(DISTINCT CASE WHEN late = 1 THEN l_suppkey END) AS n_late_supp
      FROM flagged GROUP BY l_orderkey
    ), blame AS (
      SELECT DISTINCT f.l_orderkey, f.l_suppkey
      FROM flagged f JOIN per_order p ON f.l_orderkey = p.l_orderkey
      WHERE f.late = 1 AND p.n_supp >= 2 AND p.n_late_supp = 1
    )
    SELECT s_name, count(*) AS numwait
    FROM blame JOIN supplier ON s_suppkey = l_suppkey
    GROUP BY s_name
    """,
    doc="TPC-H Q21 shape (adapted: 'late' = shipped >60 days after the "
    "order date; no commit/receipt dates in the synthetic schema): "
    "suppliers who were the SOLE late shipper on a multi-supplier "
    "order. The classic EXISTS + NOT-EXISTS pair is decorrelated into "
    "one per-order aggregate (distinct suppliers / distinct late "
    "suppliers) joined back — two passes over the same orderkey "
    "partitioning instead of three correlated subqueries, the rewrite "
    "that keeps this shape one shuffle family at 100 TB.",
)
def q_tpch_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey", "l_shipdate")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    flagged = li.join(orders, F.col("o_orderkey") == F.col("l_orderkey")).select(
        "l_orderkey",
        "l_suppkey",
        (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
        .cast("int")
        .alias("late"),
    )
    per_order = flagged.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct(F.when(F.col("late") == 1, F.col("l_suppkey"))).alias("n_late_supp"),
    )
    blame = (
        flagged.filter(F.col("late") == 1)
        .join(
            per_order.filter((F.col("n_supp") >= 2) & (F.col("n_late_supp") == 1)),
            "l_orderkey",
        )
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    return (
        blame.join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
    )


# ---------------------------------------------------------------------------
# TPC-H Q11 shape: HAVING against a scalar subquery over the same agg
# ---------------------------------------------------------------------------


@register(
    "tpch_q11_important_parts",
    oracle="""
    WITH rev AS (
      SELECT l_partkey, sum(l_extendedprice * (1 - l_discount)) AS value
      FROM lineitem GROUP BY l_partkey
    )
    SELECT l_partkey AS p_partkey, round(value, 2) AS part_value
    FROM rev
    WHERE value > (SELECT avg(value) * 1.2 FROM rev)
    """,
    doc="TPC-H Q11 shape (adapted: lineitem revenue per part stands in "
    "for the missing partsupp stock value): parts whose revenue "
    "exceeds 1.2x the MEAN part revenue (scale-free, unlike the spec's "
    "fraction-of-total, which degenerates as |parts| grows) — a HAVING "
    "against a scalar subquery over the same aggregate. Spark computes the per-part "
    "agg once, derives the 1-row threshold from it, and broadcasts it "
    "back; no second lineitem scan. The raw (unrounded) sums are "
    "compared on both sides; only the emitted value is rounded, so "
    "the threshold predicate and output agree bit-for-bit in shape.",
)
def q_tpch_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    rev = li.groupBy("l_partkey").agg(
        F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("value")
    )
    thr = rev.agg((F.avg("value") * 1.2).alias("thr"))
    return (
        rev.join(F.broadcast(thr))
        .filter(F.col("value") > F.col("thr"))
        .select(
            F.col("l_partkey").alias("p_partkey"),
            F.round("value", 2).alias("part_value"),
        )
    )


# ---------------------------------------------------------------------------
# TPC-H Q2 shape: minimum-cost supplier per part within a region
# ---------------------------------------------------------------------------


@register(
    "tpch_q2_min_cost_supplier",
    oracle="""
    WITH costs AS (
      SELECT l_partkey, l_suppkey, min(l_extendedprice / l_quantity) AS unit_cost
      FROM lineitem GROUP BY l_partkey, l_suppkey
    ), eligible AS (
      SELECT c.l_partkey, c.unit_cost, s.s_suppkey, s.s_acctbal, s.s_name, n.n_name
      FROM costs c
      JOIN supplier s ON c.l_suppkey = s.s_suppkey
      JOIN nation n   ON s.s_nationkey = n.n_nationkey
      JOIN region r   ON n.n_regionkey = r.r_regionkey
      WHERE r.r_name = 'EUROPE'
    ), wanted AS (
      SELECT p_partkey FROM part
      WHERE p_type = 'LARGE' AND p_size BETWEEN 10 AND 20
    ), best AS (
      SELECT e.l_partkey, min(e.unit_cost) AS min_cost
      FROM eligible e JOIN wanted w ON e.l_partkey = w.p_partkey
      GROUP BY e.l_partkey
    )
    SELECT e.s_acctbal, e.s_name, e.n_name, e.l_partkey AS p_partkey,
           e.unit_cost
    FROM eligible e
    JOIN best b ON e.l_partkey = b.l_partkey AND e.unit_cost = b.min_cost
    """,
    doc="TPC-H Q2 shape (adapted: the synthetic schema has no partsupp, "
    "so a supplier's offer price for a part is the minimum observed "
    "unit price min(l_extendedprice/l_quantity) in lineitem). The "
    "correlated min-cost subquery is decorrelated into a per-part "
    "pre-agg joined back on exact cost equality — safe across engines "
    "because the min is one of the candidate doubles, not a recomputed "
    "sum, so equality matches bit-for-bit. The emitted cost is the raw "
    "double, NOT rounded: per-row IEEE division is bit-identical on "
    "both engines, while decimal rounding of a tie like 2549.81375 is "
    "not (observed at sf0.1). nation/region broadcast; the filtered "
    "part list and the region-supplier frame attach hint-free "
    "(SF-proportional); the only large shuffle is the lineitem "
    "(partkey, suppkey) pre-agg, which runs map-side partial first.",
)
def q_tpch_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    wanted = (
        load_table(spark, sf_dir, "part")
        .filter((F.col("p_type") == "LARGE") & F.col("p_size").between(10, 20))
        .select("p_partkey")
    )
    costs = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_cost")
    )
    region_supp = (
        supp.join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey", "s_acctbal", "s_name", "n_name")
    )
    eligible = costs.join(
        region_supp, costs.l_suppkey == F.col("s_suppkey")
    ).join(wanted, costs.l_partkey == F.col("p_partkey"))
    best = eligible.groupBy(F.col("l_partkey").alias("b_partkey")).agg(
        F.min("unit_cost").alias("min_cost")
    )
    return (
        eligible.join(
            best,
            (F.col("l_partkey") == F.col("b_partkey"))
            & (F.col("unit_cost") == F.col("min_cost")),
        )
        .select(
            "s_acctbal",
            "s_name",
            "n_name",
            F.col("l_partkey").alias("p_partkey"),
            "unit_cost",
        )
    )


# ---------------------------------------------------------------------------
# TPC-H Q9 shape: product-type profit by nation and year
# ---------------------------------------------------------------------------


@register(
    "tpch_q9_product_profit",
    oracle="""
    SELECT n_name AS nation, year(o_orderdate) AS o_year,
           round(sum(l_extendedprice * (1 - l_discount)
                     - 0.6 * p_retailprice * l_quantity), 2) AS profit_proxy
    FROM lineitem
    JOIN part     ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN nation   ON n_nationkey = s_nationkey
    WHERE p_name LIKE '%red%'
    GROUP BY n_name, year(o_orderdate)
    """,
    doc="TPC-H Q9 shape (adapted: no partsupp, so unit cost is proxied "
    "as 0.6 x p_retailprice instead of ps_supplycost; the spec's "
    "'%red%' part-name filter is kept verbatim — the synthetic "
    "p_name is '<adjective> <noun>'). Profit per supplier nation per "
    "order year. nation broadcasts; part (filtered ~1/8) and supplier "
    "attach hint-free (SF-proportional, AQE-decided); "
    "the lineitem-orders join is the one fact-fact shuffle, on "
    "orderkey, and the final agg carries |nations| x |years| groups.",
)
def q_tpch_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_name").like("%red%"))
        .select("p_partkey", "p_retailprice")
    )
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    nation = load_table(spark, sf_dir, "nation")
    profit = F.col("l_extendedprice") * (1 - F.col("l_discount")) - 0.6 * F.col(
        "p_retailprice"
    ) * F.col("l_quantity")
    return (
        li.join(part, F.col("p_partkey") == F.col("l_partkey"))
        .join(supp, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(nation), F.col("n_nationkey") == F.col("s_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg(F.round(F.sum(profit), 2).alias("profit_proxy"))
    )


# ---------------------------------------------------------------------------
# TPC-H Q16 shape: supplier count by part attributes with an exclusion list
# ---------------------------------------------------------------------------


@register(
    "tpch_q16_supplier_cnt",
    oracle="""
    WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
    SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
    FROM ps JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#9'
      AND p_type <> 'PROMO'
      AND p_size IN (1, 4, 7, 10, 13, 16, 19, 22)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type, p_size
    """,
    doc="TPC-H Q16 shape (adapted: the part-supplier relation is "
    "DISTINCT (l_partkey, l_suppkey) from lineitem instead of the "
    "missing partsupp, and 'Customer Complaints' suppliers are proxied "
    "by s_acctbal < 0). NOT IN over a non-nullable key column compiles "
    "to an anti join (no null-check penalty: s_suppkey and "
    "l_suppkey are non-null by construction; strategy AQE-decided — "
    "the bad-supplier list is supplier-cardinality); part attaches "
    "hint-free; "
    "the distinct and the count-distinct agg reuse the same "
    "(partkey, suppkey) shuffle partitioning.",
)
def q_tpch_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#9")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 4, 7, 10, 13, 16, 19, 22)
    )
    bad_supp = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    ps = li.select("l_partkey", "l_suppkey").distinct()
    return (
        ps.join(bad_supp, ps.l_suppkey == F.col("s_suppkey"), "left_anti")
        .join(part, F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


# ---------------------------------------------------------------------------
# TPC-H Q20 shape: suppliers with concentrated shipments of target parts
# ---------------------------------------------------------------------------


@register(
    "tpch_q20_part_promotion",
    oracle="""
    WITH target_parts AS (
      SELECT p_partkey FROM part WHERE p_name LIKE 'small%'
    ), shipped AS (
      SELECT l_suppkey,
             sum(CASE WHEN l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
                       AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
                      THEN l_quantity ELSE 0 END) AS qty_1996,
             sum(l_quantity) AS qty_total
      FROM lineitem JOIN target_parts ON p_partkey = l_partkey
      GROUP BY l_suppkey
    ), globe AS (
      SELECT sum(qty_1996) AS g_1996, sum(qty_total) AS g_total FROM shipped
    ), excess AS (
      SELECT l_suppkey FROM shipped, globe
      WHERE qty_1996 * g_total > g_1996 * qty_total
    )
    SELECT s_name, n_name
    FROM supplier
    JOIN excess ON s_suppkey = l_suppkey
    JOIN nation ON n_nationkey = s_nationkey
    """,
    doc="TPC-H Q20 shape (adapted: no partsupp availqty, so the "
    "'excess stock' predicate becomes shipment concentration — "
    "suppliers whose 1996 shipments of 'small%' parts exceed 30% of "
    "their all-time volume of those parts). The nested-subquery chain "
    "(part filter -> lineitem agg -> supplier semi-join) is the Q20 "
    "skeleton. 'Concentrated' = the supplier's 1996 share of target-"
    "part volume exceeds the GLOBAL 1996 share — scale-stable (a fixed "
    "cutoff degenerates as per-supplier shares concentrate toward the "
    "calendar mean at higher SF) and compared via cross-multiplication "
    "of exact integral-double sums, so no division ulp on either "
    "engine. The part key-list semi-reduces the lineitem scan "
    "(hint-free); one agg shuffle on l_suppkey (map-side partials), "
    "then the survivor list (supplier-cardinality worst case) joins "
    "supplier⋈nation hint-free.",
)
def q_tpch_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    target = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_name").like("small%"))
        .select("p_partkey")
    )
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    in_1996 = (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp")) & (
        F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp")
    )
    shipped = (
        li.join(target, F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("l_suppkey")
        .agg(
            F.sum(F.when(in_1996, F.col("l_quantity")).otherwise(0.0)).alias("qty_1996"),
            F.sum("l_quantity").alias("qty_total"),
        )
    )
    globe = shipped.agg(
        F.sum("qty_1996").alias("g_1996"), F.sum("qty_total").alias("g_total")
    )
    excess = (
        shipped.join(F.broadcast(globe))
        .filter(F.col("qty_1996") * F.col("g_total") > F.col("g_1996") * F.col("qty_total"))
        .select("l_suppkey")
    )
    return (
        supp.join(excess, supp.s_suppkey == F.col("l_suppkey"))
        .join(F.broadcast(nation), F.col("n_nationkey") == F.col("s_nationkey"))
        .select("s_name", "n_name")
    )


# ---------------------------------------------------------------------------
# Bloom-prefiltered fact⋈dim join (runtime-filter pattern, DIY bitmap)
# ---------------------------------------------------------------------------


@register(
    "bloom_prefilter_urgent_revenue",
    oracle="""
    SELECT year(o_orderdate) AS o_year, month(o_orderdate) AS o_month,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           count(*) AS n_lines
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE o_orderpriority = '1-URGENT'
      AND o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY o_year, o_month
    """,
    doc="Runtime-bloom-filter join pattern: revenue of 1997 URGENT "
    "orders. The filtered orders (~3% of the table) build a 64 Kbit "
    "Bloom bitmap via map-side-partial bit_or (operators/relational.py "
    "bloom_build — Spark's own bloom_filter_agg is not in the public "
    "registry); lineitem is prefiltered by k=3 broadcast bitmap "
    "lookups BEFORE its join shuffle, so at 100 TB the exchange "
    "carries only probable-match lines (no false negatives; the exact "
    "join removes false positives, which is why a plain-join oracle "
    "is exact). The oracle is the join without the bloom — identical "
    "results by construction.",
)
def q_bloom_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flink_anomaly_spark.operators.relational import bloom_build, bloom_prefilter

    orders_f = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderpriority") == "1-URGENT")
        & (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    bloom = bloom_build(orders_f, F.col("o_orderkey"))
    li_pref = bloom_prefilter(li, F.col("l_orderkey"), bloom)
    return (
        li_pref.join(
            orders_f.select("o_orderkey", "o_orderdate"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy(
            F.year("o_orderdate").alias("o_year"),
            F.month("o_orderdate").alias("o_month"),
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            ),
            F.count("*").alias("n_lines"),
        )
    )


@register(
    "variant_props_stats",
    oracle="""
    SELECT event_type,
           CAST(count(json_extract_string(props, '$.k')) AS BIGINT) AS n_with_k,
           CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
             AS sum_k,
           CAST(count(*) FILTER (WHERE props IS NULL) AS BIGINT) AS n_null_props
    FROM events GROUP BY event_type
    """,
    doc="Spark 4 VARIANT type surface: parse_json(props) into a "
    "variant column, typed extraction via variant_get(v, '$.k', "
    "'bigint'), aggregated per event_type. Variant stores shredded "
    "binary JSON — repeated path extraction skips re-parsing the "
    "string per access, the semi-structured answer to a JSON-heavy "
    "100 TB events table. The oracle reads the same numbers through "
    "DuckDB's JSON functions (variant is an encoding, not a "
    "semantics change).",
)
def q_variant_props_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    v = F.parse_json(F.col("props"))
    k = F.try_variant_get(v, "$.k", "bigint")
    return (
        events.select("event_type", k.alias("k"), F.col("props"))
        .groupBy("event_type")
        .agg(
            F.count("k").alias("n_with_k"),
            F.sum("k").alias("sum_k"),
            F.count_if(F.col("props").isNull()).alias("n_null_props"),
        )
    )


@register(
    "bitmap_distinct_by_type",
    oracle="""
    SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
    FROM events GROUP BY event_type
    """,
    doc="Exact distinct counting via Spark 4's bitmap aggregate family "
    "(bitmap_bucket_number / bitmap_bit_position / "
    "bitmap_construct_agg / bitmap_count): ids bucket into 32k-bit "
    "bitmaps, partial aggs OR bitmaps map-side, and the final count "
    "sums per-bucket popcounts. Same answer as count(DISTINCT) — the "
    "win at scale is that bitmaps are mergeable and storable: "
    "incremental/rollup distinct without re-scanning history (the "
    "oracle checks the semantics on the final number; the bitmap "
    "bytes themselves are engine-private).",
)
def q_bitmap_distinct_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    per_bucket = (
        events.select(
            "event_type",
            F.expr("bitmap_bucket_number(user_id)").alias("bucket"),
            F.expr("bitmap_bit_position(user_id)").alias("pos"),
        )
        .groupBy("event_type", "bucket")
        .agg(F.expr("bitmap_construct_agg(pos)").alias("bm"))
    )
    return per_bucket.groupBy("event_type").agg(
        F.sum(F.expr("bitmap_count(bm)")).cast("bigint").alias("n_users")
    )
