"""Data-governance / layout queries: corpus boilerplate-segment
removal (CCNet/RefinedWeb-style line dedup adapted to segment
granularity), a Deequ-style declarative data-quality constraint suite,
Z-order file-layout assignment for multi-dimensional scan pruning, and
an SCD Type-2 dimension-history build.

These are warehouse/pipeline operators a 100 TB training-data platform
runs around the core dedup/quality passes: boilerplate stripping is the
per-segment sibling of document-level exact dedup; the quality suite is
the pre-ingest gate; Z-order is how the curated output is laid out so
downstream scans prune on (lang × size); SCD2 is the standard
dimension-versioning shape for any slowly-changing metadata table.

Like every plan module, each oracle replicates the Spark computation
EXACTLY (same segmentation, same integer bit-math, same rounding).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from flink_anomaly_spark.operators.text import boilerplate_segment_removal
from flink_anomaly_spark.plans.registry import register
from flink_anomaly_spark.tables import load_table

#: non-overlapping words-per-segment for boilerplate removal. Real
#: corpora use newline-delimited lines (CCNet §4.1 dedups paragraphs by
#: hash); the synthetic corpus has no newlines, so fixed 2-word chunks
#: stand in — small enough that cross-document repeats actually occur.
_SEG = 2

#: a segment is boilerplate when it appears in >= 2% of all documents
#: (document frequency, not occurrence count — a segment repeated many
#: times inside ONE doc is repetition, not boilerplate).
_BOILER_DF_FRAC = 0.02


@register(
    "boilerplate_segment_removal",
    oracle=f"""
    WITH base AS (
      SELECT doc_id, string_split(text, ' ') AS ws,
             CAST(greatest(1, ceil(len(string_split(text, ' ')) / {_SEG}.0)) AS BIGINT)
               AS n_segments
      FROM documents
    ), tot AS (
      SELECT CAST(ceil({_BOILER_DF_FRAC} * count(*)) AS BIGINT) AS min_df FROM documents
    ), seg0 AS (
      SELECT doc_id, n_segments, ws,
             unnest(range(n_segments)) AS seg_idx
      FROM base
    ), segs AS (
      SELECT doc_id, seg_idx,
             array_to_string(ws[seg_idx*{_SEG}+1 : seg_idx*{_SEG}+{_SEG}], ' ') AS seg
      FROM seg0
    ), bl AS (
      SELECT seg FROM segs GROUP BY seg
      HAVING count(DISTINCT doc_id) >= (SELECT min_df FROM tot)
    ), kept AS (
      SELECT s.doc_id, s.seg_idx, s.seg FROM segs s
      WHERE s.seg NOT IN (SELECT seg FROM bl)
    ), re AS (
      SELECT doc_id, count(*) AS n_kept,
             string_agg(seg, ' ' ORDER BY seg_idx) AS cleaned
      FROM kept GROUP BY doc_id
    )
    SELECT b.doc_id, b.n_segments,
           b.n_segments - coalesce(r.n_kept, 0) AS n_removed,
           coalesce(r.cleaned, '') AS cleaned_text
    FROM base b LEFT JOIN re r USING (doc_id)
    """,
    doc="CCNet-style boilerplate removal at segment granularity: chunk "
    "each doc into non-overlapping 2-word segments, drop every segment "
    "whose document frequency is >= 2% of the corpus, reassemble the "
    "survivors in order. Plan: narrow chunking -> 1 shuffle for the "
    "segment DF count -> broadcast anti-join against the (small) "
    "blacklist -> 1 shuffle to reassemble per doc. The blacklist is "
    "tiny by construction (only segments above the DF cutoff); if a "
    "pathological corpus made it large, the anti-join degrades "
    "gracefully to a shuffle join by dropping the broadcast hint.",
)
def q_boilerplate_segment_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return boilerplate_segment_removal(
        docs, "doc_id", "text", seg_words=_SEG, min_df_frac=_BOILER_DF_FRAC
    )


@register(
    "data_quality_suite",
    oracle="""
    SELECT 'customer_rowcount_min' AS check_name,
           CAST(count(*) AS DOUBLE) AS metric,
           CASE WHEN count(*) >= 1 THEN 1 ELSE 0 END AS passed
    FROM customer
    UNION ALL
    SELECT 'customer_custkey_unique',
           round(CAST(count(DISTINCT c_custkey) AS DOUBLE) / greatest(count(*), 1), 6),
           CASE WHEN count(DISTINCT c_custkey) = count(*) THEN 1 ELSE 0 END
    FROM customer
    UNION ALL
    SELECT 'customer_name_complete',
           round(avg(CASE WHEN c_name IS NOT NULL AND c_name != '' THEN 1.0 ELSE 0.0 END), 6),
           CASE WHEN count(*) = count(CASE WHEN c_name IS NOT NULL AND c_name != '' THEN 1 END)
                THEN 1 ELSE 0 END
    FROM customer
    UNION ALL
    SELECT 'orders_custkey_referential',
           round(avg(CASE WHEN c.c_custkey IS NOT NULL THEN 1.0 ELSE 0.0 END), 6),
           CASE WHEN count(*) = count(c.c_custkey) THEN 1 ELSE 0 END
    FROM orders o LEFT JOIN (SELECT DISTINCT c_custkey FROM customer) c
      ON o.o_custkey = c.c_custkey
    UNION ALL
    SELECT 'orders_orderdate_complete',
           round(avg(CASE WHEN o_orderdate IS NOT NULL THEN 1.0 ELSE 0.0 END), 6),
           CASE WHEN count(*) = count(o_orderdate) THEN 1 ELSE 0 END
    FROM orders
    UNION ALL
    SELECT 'lineitem_quantity_positive',
           round(avg(CASE WHEN l_quantity > 0 THEN 1.0 ELSE 0.0 END), 6),
           CASE WHEN count(*) = count(CASE WHEN l_quantity > 0 THEN 1 END) THEN 1 ELSE 0 END
    FROM lineitem
    UNION ALL
    SELECT 'lineitem_discount_in_unit_range',
           round(avg(CASE WHEN l_discount >= 0 AND l_discount <= 1 THEN 1.0 ELSE 0.0 END), 6),
           CASE WHEN count(*) = count(CASE WHEN l_discount >= 0 AND l_discount <= 1 THEN 1 END)
                THEN 1 ELSE 0 END
    FROM lineitem
    UNION ALL
    SELECT 'events_ts_complete',
           round(avg(CASE WHEN ts IS NOT NULL THEN 1.0 ELSE 0.0 END), 6),
           CASE WHEN count(*) = count(ts) THEN 1 ELSE 0 END
    FROM events
    UNION ALL
    SELECT 'documents_docid_unique',
           round(CAST(count(DISTINCT doc_id) AS DOUBLE) / greatest(count(*), 1), 6),
           CASE WHEN count(DISTINCT doc_id) = count(*) THEN 1 ELSE 0 END
    FROM documents
    """,
    doc="Deequ-style declarative constraint suite (Schelter et al., "
    "VLDB 2018 shape): completeness / uniqueness / range / referential "
    "checks over four tables, one (check_name, metric, passed) row per "
    "constraint. Plan: ONE single-pass aggregation per table computes "
    "all of that table's metrics map-side (partial agg -> 1-row "
    "exchange), the referential check joins the distinct dim keys "
    "hint-free (customer is SF-proportional — AQE broadcasts the "
    "key list while it fits, shuffles past the threshold), and the "
    "per-table rows are unioned.",
)
def q_data_quality_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    events = load_table(spark, sf_dir, "events")
    documents = load_table(spark, sf_dir, "documents")

    def row(name: str, metric, passed):
        return F.struct(
            F.lit(name).alias("check_name"),
            metric.cast("double").alias("metric"),
            passed.cast("int").alias("passed"),
        )

    # single-pass per table: every metric for a table comes out of ONE
    # aggregation (map-side partials, 1-row exchange), then explodes
    # into its (check_name, metric, passed) rows.
    cnt = F.count(F.lit(1))
    cust_rows = customer.agg(
        F.explode(
            F.array(
                row("customer_rowcount_min", cnt, (cnt >= 1)),
                row(
                    "customer_custkey_unique",
                    F.round(
                        F.countDistinct("c_custkey") / F.greatest(cnt, F.lit(1)), 6
                    ),
                    F.countDistinct("c_custkey") == cnt,
                ),
                row(
                    "customer_name_complete",
                    F.round(
                        F.avg(
                            (
                                F.col("c_name").isNotNull() & (F.col("c_name") != "")
                            ).cast("double")
                        ),
                        6,
                    ),
                    cnt
                    == F.count(
                        F.when(
                            F.col("c_name").isNotNull() & (F.col("c_name") != ""), 1
                        )
                    ),
                ),
            )
        ).alias("r")
    ).select("r.*")

    dim_keys = customer.select("c_custkey").distinct()
    ref = orders.join(
        dim_keys, orders["o_custkey"] == dim_keys["c_custkey"], "left"
    )
    ref_rows = ref.agg(
        F.explode(
            F.array(
                row(
                    "orders_custkey_referential",
                    F.round(F.avg(F.col("c_custkey").isNotNull().cast("double")), 6),
                    cnt == F.count("c_custkey"),
                )
            )
        ).alias("r")
    ).select("r.*")

    ord_rows = orders.agg(
        F.explode(
            F.array(
                row(
                    "orders_orderdate_complete",
                    F.round(F.avg(F.col("o_orderdate").isNotNull().cast("double")), 6),
                    cnt == F.count("o_orderdate"),
                )
            )
        ).alias("r")
    ).select("r.*")

    li_rows = lineitem.agg(
        F.explode(
            F.array(
                row(
                    "lineitem_quantity_positive",
                    F.round(F.avg((F.col("l_quantity") > 0).cast("double")), 6),
                    cnt == F.count(F.when(F.col("l_quantity") > 0, 1)),
                ),
                row(
                    "lineitem_discount_in_unit_range",
                    F.round(
                        F.avg(
                            (
                                (F.col("l_discount") >= 0) & (F.col("l_discount") <= 1)
                            ).cast("double")
                        ),
                        6,
                    ),
                    cnt
                    == F.count(
                        F.when(
                            (F.col("l_discount") >= 0) & (F.col("l_discount") <= 1), 1
                        )
                    ),
                ),
            )
        ).alias("r")
    ).select("r.*")

    ev_rows = events.agg(
        F.explode(
            F.array(
                row(
                    "events_ts_complete",
                    F.round(F.avg(F.col("ts").isNotNull().cast("double")), 6),
                    cnt == F.count("ts"),
                )
            )
        ).alias("r")
    ).select("r.*")

    doc_rows = documents.agg(
        F.explode(
            F.array(
                row(
                    "documents_docid_unique",
                    F.round(
                        F.countDistinct("doc_id") / F.greatest(cnt, F.lit(1)), 6
                    ),
                    F.countDistinct("doc_id") == cnt,
                )
            )
        ).alias("r")
    ).select("r.*")

    return (
        cust_rows.unionAll(ref_rows)
        .unionAll(ord_rows)
        .unionAll(li_rows)
        .unionAll(ev_rows)
        .unionAll(doc_rows)
    )


#: bits per dimension for the Z-order interleave (16 buckets each,
#: 256 target files).
_ZBITS = 4


def _interleave_sql(a: str, b: str) -> str:
    """DuckDB bit-interleave of two {_ZBITS}-bit ints: bit i of `a` ->
    position 2i, bit i of `b` -> position 2i+1. Mirrors the Spark
    expression bit for bit."""
    terms = []
    for i in range(_ZBITS):
        terms.append(f"((({a} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({b} >> {i}) & 1) << {2 * i + 1})")
    return " + ".join(terms)


def _interleave_spark(a, b):
    z = F.lit(0)
    for i in range(_ZBITS):
        z = z + F.shiftleft(F.shiftright(a, i).bitwiseAND(F.lit(1)), 2 * i)
        z = z + F.shiftleft(F.shiftright(b, i).bitwiseAND(F.lit(1)), 2 * i + 1)
    return z


@register(
    "zorder_file_layout",
    oracle=f"""
    WITH stats AS (
      SELECT min(n_chars) AS mn, max(n_chars) AS mx FROM documents
    ), langs AS (
      SELECT lang, CAST((row_number() OVER (ORDER BY lang)) - 1 AS BIGINT) AS lang_rank
      FROM (SELECT DISTINCT lang FROM documents)
    ), keyed AS (
      SELECT d.doc_id, d.n_chars, d.lang,
             least({2**_ZBITS - 1},
                   CAST(floor(CAST((d.n_chars - s.mn) AS DOUBLE) * {2**_ZBITS}
                              / (s.mx - s.mn + 1)) AS BIGINT)) AS size_bucket,
             l.lang_rank % {2**_ZBITS} AS lang_bucket
      FROM documents d, stats s
      JOIN langs l ON d.lang = l.lang
    ), z AS (
      SELECT doc_id, n_chars, lang,
             {_interleave_sql('size_bucket', 'lang_bucket')} AS zvalue
      FROM keyed
    )
    SELECT zvalue AS file_id, count(*) AS n_docs,
           count(DISTINCT lang) AS n_langs,
           min(n_chars) AS min_chars, max(n_chars) AS max_chars
    FROM z GROUP BY zvalue
    """,
    doc="Z-order (Morton-curve) file-layout assignment over "
    "(size_bucket x lang): discretize n_chars into 16 equal-width bins "
    "from the global min/max, rank langs, bit-interleave the two 4-bit "
    "keys into a zvalue, and report the per-file stats a writer would "
    "produce with df.repartitionByRange(zvalue).write. Interleaving "
    "keeps both dimensions' locality, so a downstream scan filtering "
    "on EITHER lang or size prunes ~sqrt of the files instead of none "
    "— the standard multi-dim layout for 100 TB curated-corpus "
    "output (Delta/Iceberg OPTIMIZE ZORDER does exactly this). Plan: "
    "1-row stats broadcast, tiny lang-rank broadcast, narrow bit-math, "
    "one final groupBy(zvalue) shuffle bounded at 256 rows.",
)
def q_zorder_file_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars", "lang")
    stats = F.broadcast(
        docs.agg(F.min("n_chars").alias("mn"), F.max("n_chars").alias("mx"))
    )
    langs = F.broadcast(
        docs.select("lang")
        .distinct()
        .select(
            "lang",
            (
                F.row_number().over(Window.orderBy("lang")) - 1
            ).cast("bigint").alias("lang_rank"),
        )
    )
    nb = 2**_ZBITS
    keyed = (
        docs.crossJoin(stats)
        .join(langs, "lang")
        .select(
            "doc_id",
            "n_chars",
            "lang",
            F.least(
                F.lit(nb - 1),
                F.floor(
                    (F.col("n_chars") - F.col("mn")).cast("double")
                    * nb
                    / (F.col("mx") - F.col("mn") + 1)
                ).cast("bigint"),
            ).alias("size_bucket"),
            (F.col("lang_rank") % nb).alias("lang_bucket"),
        )
    )
    z = keyed.select(
        "doc_id",
        "n_chars",
        "lang",
        _interleave_spark(F.col("size_bucket"), F.col("lang_bucket")).alias("zvalue"),
    )
    return z.groupBy(F.col("zvalue").alias("file_id")).agg(
        F.count("*").alias("n_docs"),
        F.countDistinct("lang").alias("n_langs"),
        F.min("n_chars").alias("min_chars"),
        F.max("n_chars").alias("max_chars"),
    )


@register(
    "scd2_customer_history",
    oracle="""
    SELECT o_custkey AS custkey,
           CAST(row_number() OVER w AS BIGINT) AS version,
           o_orderdate AS valid_from,
           lead(o_orderdate) OVER w AS valid_to,
           CASE WHEN lead(o_orderdate) OVER w IS NULL THEN 1 ELSE 0 END AS is_current,
           -- running sum over exact integer cents: DuckDB's windowed
           -- sum(double) uses a segment tree whose association order
           -- differs from Spark's sequential running sum, so a
           -- half-cent rounding tie could flip between engines
           -- (round-4 ADVICE fix); integers are associative-exact
           sum(CAST(round(o_totalprice * 100) AS BIGINT))
             OVER (PARTITION BY o_custkey
                   ORDER BY o_orderdate, o_orderkey
                   ROWS BETWEEN UNBOUNDED PRECEDING
                            AND CURRENT ROW) / 100.0 AS cum_spend
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
    doc="SCD Type-2 dimension-history build from the orders fact: each "
    "order opens a new customer version with valid_from = the order "
    "date, valid_to = the next version's start (NULL = current row), "
    "and the running lifetime spend as the versioned attribute — the "
    "standard Kimball slowly-changing-dimension shape every warehouse "
    "maintains for point-in-time joins. Plan: ONE hash exchange on "
    "custkey serves all three window functions (row_number / lead / "
    "running sum share the same partitioning+ordering, Catalyst fuses "
    "them into a single Window node), deterministic (o_orderdate, "
    "o_orderkey) tiebreak.",
)
def q_scd2_customer_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wsum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return orders.select(
        F.col("o_custkey").alias("custkey"),
        F.row_number().over(w).cast("bigint").alias("version"),
        F.col("o_orderdate").alias("valid_from"),
        F.lead("o_orderdate").over(w).alias("valid_to"),
        F.when(F.lead("o_orderdate").over(w).isNull(), 1)
        .otherwise(0)
        .alias("is_current"),
        # exact-cents running sum (see the oracle comment): integer
        # accumulation is association-order-free, so Spark's sequential
        # running sum and DuckDB's segment-tree sum agree bit-for-bit
        (F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint")).over(wsum) / 100.0).alias(
            "cum_spend"
        ),
    )


@register(
    "global_rank_export",
    oracle="""
    WITH offs AS (
      SELECT lang, count(*) AS n,
             sum(count(*)) OVER (ORDER BY lang) - count(*) AS off
      FROM documents GROUP BY lang
    )
    SELECT d.doc_id, d.lang,
           CAST(row_number() OVER (PARTITION BY d.lang ORDER BY d.doc_id)
                + o.off AS BIGINT) AS global_rank
    FROM documents d JOIN offs o ON d.lang = o.lang
    """,
    doc="Scalable global row-number over a total order (lang, doc_id) "
    "WITHOUT the single-partition Window anti-pattern: rank within "
    "each lang partition (one keyed exchange), then add the "
    "cumulative-count offset of all preceding langs (a |langs|-row "
    "aggregate, broadcast). Equals row_number() OVER (ORDER BY lang, "
    "doc_id) — the oracle computes it the same two-phase way so both "
    "engines avoid a global sort; at 100 TB the offset table is KB "
    "while the naive form funnels the corpus through one task. The "
    "same two-phase shape is how zipWithIndex-style ordinal assignment "
    "ships at scale (partition-local ordinal + partition-offset join).",
)
def q_global_rank_export(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    per_lang = F.row_number().over(
        Window.partitionBy("lang").orderBy("doc_id")
    )
    offs = F.broadcast(
        docs.groupBy("lang")
        .agg(F.count("*").alias("n"))
        .select(
            "lang",
            (
                F.sum("n").over(
                    Window.orderBy("lang").rowsBetween(
                        Window.unboundedPreceding, Window.currentRow
                    )
                )
                - F.col("n")
            ).alias("off"),
        )
    )
    return (
        docs.join(offs, "lang")
        .select(
            "doc_id",
            "lang",
            (per_lang + F.col("off")).cast("bigint").alias("global_rank"),
        )
    )


@register(
    "snapshot_diff_orders",
    oracle="""
    WITH v_old AS (
      SELECT o_orderkey, o_orderstatus, o_totalprice
      FROM orders WHERE o_orderkey % 10 != 0
    ), v_new AS (
      SELECT o_orderkey,
             CASE WHEN o_orderkey % 7 = 0 THEN 'X' ELSE o_orderstatus END
               AS o_orderstatus,
             o_totalprice
      FROM orders WHERE o_orderkey % 13 != 0
    ), h_old AS (
      SELECT o_orderkey, o_orderstatus,
             md5(o_orderstatus || '|' || CAST(round(o_totalprice, 2) AS VARCHAR))
               AS row_hash
      FROM v_old
    ), h_new AS (
      SELECT o_orderkey, o_orderstatus,
             md5(o_orderstatus || '|' || CAST(round(o_totalprice, 2) AS VARCHAR))
               AS row_hash
      FROM v_new
    )
    SELECT coalesce(o.o_orderkey, n.o_orderkey) AS orderkey,
           CASE WHEN o.o_orderkey IS NULL THEN 'insert'
                WHEN n.o_orderkey IS NULL THEN 'delete'
                ELSE 'update' END AS change_type,
           o.o_orderstatus AS old_status,
           n.o_orderstatus AS new_status
    FROM h_old o FULL OUTER JOIN h_new n ON o.o_orderkey = n.o_orderkey
    WHERE o.o_orderkey IS NULL OR n.o_orderkey IS NULL
       OR o.row_hash != n.row_hash
    """,
    doc="CDC-style snapshot diff: two simulated table versions "
    "(deterministic transforms of orders: %10 rows absent from v1 -> "
    "inserts, %13 rows absent from v2 -> deletes, %7 rows with a "
    "changed status -> updates) full-outer-joined on the key, "
    "classifying each key as insert / delete / update and dropping "
    "unchanged rows. Change detection compares ONE md5 row-hash per "
    "side instead of column-by-column — at 100 TB with wide tables "
    "the hash is computed in the scan stage and the join exchange "
    "carries (key, 32-byte hash) rather than every column, which is "
    "the standard lakehouse MERGE/verify shape. One keyed exchange "
    "per side, AQE-planned.",
)
def q_snapshot_diff_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")

    def hashed(df: DataFrame) -> DataFrame:
        return df.select(
            "o_orderkey",
            "o_orderstatus",
            F.md5(
                F.concat_ws(
                    "|",
                    F.col("o_orderstatus"),
                    F.round("o_totalprice", 2).cast("string"),
                )
            ).alias("row_hash"),
        )

    v_old = hashed(
        orders.filter(F.col("o_orderkey") % 10 != 0).select(
            "o_orderkey", "o_orderstatus", "o_totalprice"
        )
    )
    v_new = hashed(
        orders.filter(F.col("o_orderkey") % 13 != 0).select(
            "o_orderkey",
            F.when(F.col("o_orderkey") % 7 == 0, F.lit("X"))
            .otherwise(F.col("o_orderstatus"))
            .alias("o_orderstatus"),
            "o_totalprice",
        )
    )
    o = v_old.alias("o")
    n = v_new.alias("n")
    joined = o.join(n, F.col("o.o_orderkey") == F.col("n.o_orderkey"), "full_outer")
    return joined.filter(
        F.col("o.o_orderkey").isNull()
        | F.col("n.o_orderkey").isNull()
        | (F.col("o.row_hash") != F.col("n.row_hash"))
    ).select(
        F.coalesce(F.col("o.o_orderkey"), F.col("n.o_orderkey")).alias("orderkey"),
        F.when(F.col("o.o_orderkey").isNull(), "insert")
        .when(F.col("n.o_orderkey").isNull(), "delete")
        .otherwise("update")
        .alias("change_type"),
        F.col("o.o_orderstatus").alias("old_status"),
        F.col("n.o_orderstatus").alias("new_status"),
    )


def _install_leakage_free_split() -> None:
    """Registered late so it can compose dedup_clusters' builder and
    oracle verbatim — the split stays in lockstep with the cluster
    definition by construction (same pattern as ann_lsh_recall)."""
    from flink_anomaly_spark.operators.dedup import md5_int32
    from flink_anomaly_spark.plans.extensions import _CLUSTERS_ORACLE
    from flink_anomaly_spark.plans.fragments import MD5_32
    from flink_anomaly_spark.plans.registry import QUERIES

    hb = MD5_32.format(x="CAST(cluster_id AS VARCHAR)") + " % 100"
    oracle = f"""
    WITH clusters AS ({_CLUSTERS_ORACLE})
    SELECT id AS doc_id, cluster_id,
           CASE WHEN {hb} < 80 THEN 'train'
                WHEN {hb} < 90 THEN 'val'
                ELSE 'test' END AS split
    FROM clusters
    """

    def build(spark: SparkSession, sf_dir: str) -> DataFrame:
        clusters = QUERIES["dedup_clusters"].build(spark, sf_dir)
        h = md5_int32(F.col("cluster_id").cast("string")) % 100
        return clusters.select(
            F.col("id").alias("doc_id"),
            "cluster_id",
            F.when(h < 80, "train").when(h < 90, "val").otherwise("test").alias(
                "split"
            ),
        )

    register(
        "leakage_free_split",
        oracle=oracle,
        doc="Contamination-safe train/val/test split: assign the WHOLE "
        "near-dup cluster to one split by hashing the cluster id, not "
        "the doc id — a near-duplicate of a test document can never "
        "land in train (the leakage plain per-doc hash splits allow). "
        "Composes dedup_clusters verbatim (builder AND oracle), so the "
        "guarantee tracks the cluster definition; the split itself "
        "adds zero shuffle on top of clustering (narrow hash-mod on "
        "the cluster column).",
    )(build)


_install_leakage_free_split()


@register(
    "encoding_anomaly_flags",
    oracle=r"""
    SELECT doc_id,
           CAST(length(text) - length(replace(text, chr(65533), '')) AS BIGINT)
             AS n_replacement_chars,
           CAST(len(regexp_extract_all(text, 'Ã[Â-Å]|â€|Â[ -¥]')) AS BIGINT)
             AS n_mojibake_marks,
           CAST(len(regexp_extract_all(text, '[\x00-\x08\x0B\x0C\x0E-\x1F]')) AS BIGINT)
             AS n_control_chars,
           CASE WHEN (length(text) - length(replace(text, chr(65533), ''))) > 0
                  OR len(regexp_extract_all(text, 'Ã[Â-Å]|â€|Â[ -¥]')) > 0
                  OR len(regexp_extract_all(text, '[\x00-\x08\x0B\x0C\x0E-\x1F]')) > 0
                THEN 1 ELSE 0 END AS suspect
    FROM documents
    """,
    doc="Encoding-anomaly (mojibake) detection, ftfy-style heuristics: "
    "counts of U+FFFD replacement characters, classic UTF-8-as-Latin-1 "
    "double-encoding marks (A-tilde/a-circumflex lead-byte sequences), "
    "and stray C0 control characters — the three signatures of a "
    "corrupted decode pipeline upstream. Pure narrow Catalyst regexp "
    "counting: pruned 2-column scan, zero shuffle, whole-stage "
    "codegen; at 100 TB this is a free rider on any other full scan.",
)
def q_encoding_anomaly_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    repl = (
        F.length("text") - F.length(F.regexp_replace("text", "�", ""))
    ).cast("bigint")
    moji = F.size(F.regexp_extract_all("text", F.lit("Ã[Â-Å]|â€|Â[ -¥]"), F.lit(0))).cast(
        "bigint"
    )
    ctrl = F.size(
        F.regexp_extract_all(
            "text", F.lit("[\x00-\x08\x0B\x0C\x0E-\x1F]"), F.lit(0)
        )
    ).cast("bigint")
    return docs.select(
        "doc_id",
        repl.alias("n_replacement_chars"),
        moji.alias("n_mojibake_marks"),
        ctrl.alias("n_control_chars"),
        F.when((repl > 0) | (moji > 0) | (ctrl > 0), 1)
        .otherwise(0)
        .alias("suspect"),
    )


#: target output-file capacity for the compaction plan, in characters
#: (stands in for bytes on the synthetic corpus).
_COMPACT_CAPACITY = 4000


@register(
    "compaction_file_plan",
    oracle=f"""
    WITH sized AS (
      SELECT doc_id, lang, n_chars,
             sum(n_chars) OVER (PARTITION BY lang ORDER BY doc_id
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                         AND CURRENT ROW) AS cum_chars
      FROM documents
    ), assigned AS (
      SELECT lang,
             CAST(floor((cum_chars - n_chars) / {_COMPACT_CAPACITY}.0) AS BIGINT)
               AS file_seq,
             doc_id, n_chars
      FROM sized
    )
    SELECT lang, file_seq, count(*) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars,
           min(doc_id) AS first_doc, max(doc_id) AS last_doc
    FROM assigned GROUP BY lang, file_seq
    """,
    doc="Small-files compaction plan (the OPTIMIZE/rewriteDataFiles "
    "shape): within each lang partition, docs are laid into output "
    "files by running cumulative size against a fixed capacity — "
    "file_seq = floor((cumsum - own_size) / capacity), the greedy "
    "first-fit-in-order packing every table-maintenance service uses. "
    "One keyed window exchange (the running sum) + the bounded "
    "per-file aggregate that rides the same partitioning. "
    "Deterministic (doc_id order), so the plan is reproducible — a "
    "writer executes it with partitionBy(lang) + per-file row groups.",
)
def q_compaction_file_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    w = Window.partitionBy("lang").orderBy("doc_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    assigned = docs.select(
        "lang",
        F.floor(
            (F.sum("n_chars").over(w) - F.col("n_chars")) / float(_COMPACT_CAPACITY)
        )
        .cast("bigint")
        .alias("file_seq"),
        "doc_id",
        "n_chars",
    )
    return assigned.groupBy("lang", "file_seq").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("total_chars"),
        F.min("doc_id").alias("first_doc"),
        F.max("doc_id").alias("last_doc"),
    )


@register(
    "incremental_mv_refresh",
    # The oracle recomputes the MV FROM SCRATCH on the new snapshot —
    # it shares none of the delta mechanism, so the hash match proves
    # the incremental algebra (insert:+new, delete:-old, update:
    # -old+new with GROUP-MOVING keys) converges to the full recompute.
    oracle="""
    WITH v_new AS (
      SELECT CASE WHEN o_orderkey % 7 = 0 THEN 'X' ELSE o_orderstatus END
               AS o_orderstatus,
             CAST(round(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders WHERE o_orderkey % 13 != 0)
    SELECT o_orderstatus,
           CAST(count(*) AS BIGINT) AS n_orders,
           round(sum(cents) / 100.0, 2) AS revenue
    FROM v_new GROUP BY o_orderstatus
    """,
    doc="Incremental materialized-view maintenance from a change feed "
    "(the Delta/Iceberg CDF-driven MV refresh): the revenue-per-status "
    "MV over snapshot v1 is merged with DELTA aggregates computed only "
    "from the changed rows (insert:+new, delete:-old, update:-old+new "
    "— including updates that MOVE the group key, status->'X', the "
    "hard case), then groups netting to zero rows are dropped. Money "
    "rides as exact integer cents so delta-order and recompute-order "
    "sums are bit-identical. At 100 TB the refresh cost scales with "
    "|changes|, not |table| — the whole point; the oracle recomputes "
    "from scratch, proving incremental == full.",
)
def q_incremental_mv_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("bigint")
    base = orders.select(
        "o_orderkey", "o_orderstatus", cents.alias("cents")
    )
    v_old = base.filter(F.col("o_orderkey") % 10 != 0)
    v_new = base.filter(F.col("o_orderkey") % 13 != 0).withColumn(
        "o_orderstatus",
        F.when(F.col("o_orderkey") % 7 == 0, F.lit("X")).otherwise(
            F.col("o_orderstatus")
        ),
    )
    mv_old = v_old.groupBy("o_orderstatus").agg(
        F.count("*").alias("n"), F.sum("cents").alias("c")
    )
    old_k = v_old.select(
        "o_orderkey",
        F.col("o_orderstatus").alias("old_st"),
        F.col("cents").alias("old_c"),
    )
    new_k = v_new.select(
        "o_orderkey",
        F.col("o_orderstatus").alias("new_st"),
        F.col("cents").alias("new_c"),
    )
    ch = old_k.join(new_k, "o_orderkey", "full_outer").filter(
        F.col("old_st").isNull()
        | F.col("new_st").isNull()
        | (F.col("old_st") != F.col("new_st"))
        | (F.col("old_c") != F.col("new_c"))
    )
    neg = ch.filter(F.col("old_st").isNotNull()).select(
        F.col("old_st").alias("o_orderstatus"),
        F.lit(-1).cast("bigint").alias("dn"),
        (-F.col("old_c")).alias("dc"),
    )
    pos = ch.filter(F.col("new_st").isNotNull()).select(
        F.col("new_st").alias("o_orderstatus"),
        F.lit(1).cast("bigint").alias("dn"),
        F.col("new_c").alias("dc"),
    )
    delta = neg.union(pos).groupBy("o_orderstatus").agg(
        F.sum("dn").alias("dn"), F.sum("dc").alias("dc")
    )
    refreshed = (
        mv_old.join(delta, "o_orderstatus", "full_outer")
        .select(
            "o_orderstatus",
            (F.coalesce(F.col("n"), F.lit(0)) + F.coalesce(F.col("dn"), F.lit(0))).alias(
                "n_orders"
            ),
            (F.coalesce(F.col("c"), F.lit(0)) + F.coalesce(F.col("dc"), F.lit(0))).alias(
                "cents"
            ),
        )
        .filter(F.col("n_orders") > 0)
    )
    return refreshed.select(
        "o_orderstatus",
        "n_orders",
        F.round(F.col("cents") / 100.0, 2).alias("revenue"),
    )
