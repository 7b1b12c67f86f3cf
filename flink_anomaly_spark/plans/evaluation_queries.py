"""Round-9 session-2 breadth: classifier-evaluation metrics (AUC),
corpus keyness and RAKE keywords, conformal anomaly p-values and LOF,
all-pairs binary cosine, kNN-graph statistics, OLS/ACF time-series
fits, and the Hilbert-curve file layout.

Reference scope note: GlebSolovev/flink-anomaly (Main.java:23-58) is a
DataStream anomaly repro with none of these; they extend the engine's
text/anomaly/similarity/layout families (SURVEY §2.9 breadth) with the
measurement layer a training-data pipeline runs on top of its filters:
"is my quality score actually separating classes" (AUC), "which terms
define each slice" (keyness/RAKE), "which new events are
distribution-free anomalies" (conformal/LOF), "is the trend/seasonality
real" (OLS/ACF), plus the scale-first similarity and layout shapes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from flink_anomaly_spark.plans.fragments import TOKS
from flink_anomaly_spark.plans.registry import register
from flink_anomaly_spark.tables import load_table


@register(
    "quality_score_auc",
    oracle="""
    WITH base AS (
      SELECT source AS g, n_chars AS s,
             CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
      FROM documents
    ),
    byval AS (
      SELECT g, s, CAST(count(*) AS BIGINT) AS m, CAST(sum(y) AS BIGINT) AS p
      FROM base GROUP BY g, s
    ),
    cum AS (
      SELECT g, m, p,
             sum(m) OVER (PARTITION BY g ORDER BY s
                          ROWS UNBOUNDED PRECEDING) - m AS cb
      FROM byval
    ),
    agg AS (
      SELECT g, CAST(sum(m) AS BIGINT) AS n, CAST(sum(p) AS BIGINT) AS np,
             CAST(sum(p * (2*cb + m + 1)) AS BIGINT) AS r2
      FROM cum GROUP BY g
    )
    SELECT g AS source, np AS n_pos, n - np AS n_neg,
           round(CAST(r2 - np*(np+1) AS DOUBLE)
                 / CAST(2*np*(n-np) AS DOUBLE), 6) AS auc
    FROM agg WHERE np > 0 AND n - np > 0
    """,
    doc="Per-source ROC-AUC of the n_chars quality proxy against the "
    "lang='en' label via the Mann-Whitney U identity with midrank tie "
    "handling — the classifier-evaluation metric computed WITHOUT the "
    "O(n_pos*n_neg) pair space: distinct-score tie groups make the "
    "midrank sum a closed form (the Gini/KS value-domain pattern), the "
    "window runs over the score domain per group, every term is exact "
    "BIGINT in the factor-2 form, and the single terminal division is "
    "exactly rounded. Degenerate one-class groups are dropped on both "
    "engines.",
)
def q_quality_score_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from flink_anomaly_spark.operators.mining import score_auc

    docs = load_table(spark, sf_dir, "documents").withColumn(
        "is_en", (F.col("lang") == "en").cast("int")
    )
    return score_auc(docs, group_col="source", score_col="n_chars", label_col="is_en")


def _keyness_oracle() -> str:
    from flink_anomaly_spark.operators.text import chi2_sql

    chi2 = chi2_sql("ntot", "num", "a + b", "c2 + d", "a + c2", "b + d")
    return f"""
    WITH base AS (
      SELECT lang AS g, unnest({TOKS}) AS t FROM documents
    ),
    counts AS (SELECT g, t, CAST(count(*) AS BIGINT) AS a FROM base GROUP BY g, t),
    ttab AS (SELECT t, CAST(sum(a) AS BIGINT) AS tt FROM counts GROUP BY t),
    gtab AS (SELECT g, CAST(sum(a) AS BIGINT) AS gt FROM counts GROUP BY g),
    ntab AS (SELECT CAST(sum(a) AS BIGINT) AS ntot FROM counts),
    sc AS (
      SELECT c.g, c.t, c.a,
             ttab.tt - c.a AS b,
             gtab.gt - c.a AS c2,
             ntab.ntot - gtab.gt - (ttab.tt - c.a) AS d,
             c.a * (ntab.ntot - gtab.gt - (ttab.tt - c.a))
               - (ttab.tt - c.a) * (gtab.gt - c.a) AS num,
             ttab.tt AS ttot, ntab.ntot AS ntot
      FROM counts c JOIN ttab USING (t) JOIN gtab USING (g), ntab
    ),
    f AS (SELECT g, t, a, b, {chi2} AS chi2
          FROM sc WHERE ttot >= 5 AND num > 0),
    r AS (SELECT g, t, a, b, chi2,
                 row_number() OVER (PARTITION BY g
                                    ORDER BY chi2 DESC, t ASC) AS rank
          FROM f)
    SELECT g AS lang, t AS term, a AS n_in_group, b AS n_elsewhere,
           round(chi2, 4) AS chi2, rank
    FROM r WHERE rank <= 5
    """


@register(
    "keyness_chi2_terms",
    oracle=_keyness_oracle(),
    doc="Top-5 terms most distinctive of each language by chi-square "
    "keyness over the 2x2 term/group contingency table (the libm-free "
    "sibling of Dunning'93 log-likelihood keyness): one corpus explode "
    "feeds a (group, term) hash agg; every later frame is TERM-DOMAIN "
    "sized (term totals re-aggregate the counts frame, group totals "
    "broadcast); the chi-square is the SHARED chi2_sql fragment over "
    "exact BIGINT marginals, so both engines rank identical doubles; "
    "top-k ranks the domain frame, never the corpus.",
)
def q_keyness_chi2_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flink_anomaly_spark.operators.text import keyness_chi2_terms

    docs = load_table(spark, sf_dir, "documents")
    return keyness_chi2_terms(
        docs, group_col="lang", text_col="text", min_term_total=5, top_k=5
    )


def _conformal_oracle() -> str:
    from flink_anomaly_spark.operators.anomaly import CONFORMAL_SPLIT_TS

    return f"""
    WITH pts AS (
      SELECT event_id, ts, CAST(round(value*100) AS BIGINT) AS s FROM events
    ),
    calib AS (
      SELECT s, CAST(count(*) AS BIGINT) AS c FROM pts
      WHERE ts < TIMESTAMP '{CONFORMAL_SPLIT_TS}' GROUP BY s
    ),
    test AS (
      SELECT event_id, ts, s FROM pts
      WHERE ts >= TIMESTAMP '{CONFORMAL_SPLIT_TS}'
    ),
    dom AS (
      SELECT s, CAST(sum(c) AS BIGINT) AS c FROM (
        SELECT s, c FROM calib
        UNION ALL
        SELECT DISTINCT s, CAST(0 AS BIGINT) AS c FROM test
      ) GROUP BY s
    ),
    ge AS (
      SELECT s, CAST(sum(c) OVER (ORDER BY s DESC
                                  ROWS UNBOUNDED PRECEDING) AS BIGINT) AS ge
      FROM dom
    ),
    nc AS (
      SELECT CAST(count(*) AS BIGINT) AS n FROM pts
      WHERE ts < TIMESTAMP '{CONFORMAL_SPLIT_TS}'
    )
    SELECT t.event_id, t.ts, t.s AS score_cents, g.ge AS n_calib_ge,
           round(CAST(1 + g.ge AS DOUBLE) / CAST(n + 1 AS DOUBLE), 6) AS p_value
    FROM test t JOIN ge g USING (s), nc
    ORDER BY g.ge ASC, t.event_id ASC
    LIMIT 20
    """


@register(
    "conformal_anomaly_pvalues",
    oracle=_conformal_oracle(),
    doc="Split-conformal anomaly p-values over the events value column "
    "(Vovk et al.): week-1 calibration, exact finite-sample-valid "
    "p = (1 + #{calib >= s})/(n_calib + 1) per test event, top-20 "
    "most anomalous. Distribution-free — no gaussian assumption like "
    "the z-score screens. The exceedance count is a suffix-cumsum over "
    "the merged distinct-cents domain (Gini/KS value-domain pattern, "
    "no quadratic inequality join); selection key is the integer pair "
    "(exceedance, id); the p-value is one exactly-rounded division.",
)
def q_conformal_anomaly_pvalues(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flink_anomaly_spark.operators.anomaly import conformal_anomaly_pvalues

    events = load_table(spark, sf_dir, "events")
    return conformal_anomaly_pvalues(
        events, id_col="event_id", ts_col="ts", value_col="value", top_k=20
    )


def _binary_cosine_oracle(k: int = 3, max_df: int = 20) -> str:
    from flink_anomaly_spark.plans.fragments import shingle_sql

    return f"""
    WITH tk AS (SELECT doc_id, {TOKS} AS toks FROM documents),
    sh AS (SELECT doc_id, unnest(list_distinct({shingle_sql(k)})) AS t FROM tk),
    keep AS (SELECT t FROM sh GROUP BY t HAVING count(*) <= {max_df}),
    p AS (SELECT sh.doc_id, sh.t FROM sh JOIN keep USING (t)),
    sz AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS sz FROM p GROUP BY doc_id),
    co AS (SELECT a.doc_id AS id1, b.doc_id AS id2, CAST(count(*) AS BIGINT) AS c
           FROM p a JOIN p b ON a.t = b.t AND a.doc_id < b.doc_id GROUP BY 1, 2)
    SELECT id1, id2, c AS n_common,
           round(CAST(c AS DOUBLE) / sqrt(CAST(sa.sz * sb.sz AS DOUBLE)), 6)
             AS cos_sim
    FROM co JOIN sz sa ON co.id1 = sa.doc_id JOIN sz sb ON co.id2 = sb.doc_id
    WHERE 4*c*c >= 1*sa.sz*sb.sz
    """


@register(
    "allpairs_binary_cosine",
    oracle=_binary_cosine_oracle(),
    doc="All document pairs with binary cosine >= 0.5 over 3-shingle "
    "sets (Bayardo-Ma-Srikant WWW'07 all-pairs similarity search) — "
    "the length-asymmetric set-similarity screen that catches a short "
    "near-copy of a long page Jaccard misses. Inverted-index self-join "
    "with a df<=20 hot-shingle drop (postings bounded per shingle, "
    "independent of corpus size); membership decided by the exact "
    "integer comparison 4c^2 >= |A||B| (tau^2 as a rational literal); "
    "the reported cosine is one division+sqrt over exact BIGINTs.",
)
def q_allpairs_binary_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flink_anomaly_spark.operators.dedup import allpairs_binary_cosine

    docs = load_table(spark, sf_dir, "documents")
    return allpairs_binary_cosine(
        docs, id_col="doc_id", text_col="text", k_shingle=3, max_df=20,
        tau2_num=1, tau2_den=4,
    )


def _knn_graph_oracle(k: int = 5) -> str:
    from flink_anomaly_spark.plans.relational_ext import _bucket_sql, _pair_dot

    cos = (
        f"{_pair_dot('q.embedding', 'c.embedding')} / "
        f"(sqrt({_pair_dot('q.embedding', 'q.embedding')}) * "
        f"sqrt({_pair_dot('c.embedding', 'c.embedding')}))"
    )
    return f"""
    WITH v AS (SELECT vec_id, embedding, label, {_bucket_sql()} AS bucket
               FROM embeddings),
    scored AS (
      SELECT q.vec_id AS qid, q.label AS qlabel, c.vec_id AS nid,
             round({cos}, 6) AS cos
      FROM v q JOIN v c ON q.bucket = c.bucket AND q.vec_id != c.vec_id
    ),
    edges AS (
      SELECT qid, qlabel, nid, cos FROM (
        SELECT qid, qlabel, nid, cos,
               row_number() OVER (PARTITION BY qid
                                  ORDER BY cos DESC, nid ASC) AS rn
        FROM scored) t
      WHERE rn <= {k}
    ),
    flagged AS (
      SELECT e.qid, e.qlabel, e.cos,
             CASE WHEN r.qid IS NOT NULL THEN 1 ELSE 0 END AS has_rev
      FROM edges e LEFT JOIN edges r ON r.qid = e.nid AND r.nid = e.qid
    ),
    nodes AS (SELECT label, CAST(count(*) AS BIGINT) AS n_nodes
              FROM v GROUP BY label),
    per_label AS (
      SELECT qlabel, CAST(count(*) AS BIGINT) AS n_edges,
             CAST(sum(has_rev) AS BIGINT) AS n_mutual,
             CAST(sum(CAST(round(cos * 1000000) AS BIGINT)) AS BIGINT) AS cm
      FROM flagged GROUP BY qlabel
    )
    SELECT n.label, n.n_nodes, p.n_edges, p.n_mutual,
           round(CAST(cm AS DOUBLE) / (1000000.0 * CAST(p.n_edges AS DOUBLE)), 6)
             AS avg_cos
    FROM nodes n JOIN per_label p ON n.label = p.qlabel
    """


@register(
    "knn_graph_stats",
    oracle=_knn_graph_oracle(),
    doc="Per-label statistics of the LSH-blocked k=5 NN graph: node/"
    "edge counts, MUTUAL-edge count (a in kNN(b) and b in kNN(a) — the "
    "k-reciprocal health proxy), and average neighbor cosine. "
    "Neighbors come from the deterministic 16-bucket LSH blocking "
    "(per-block pair cost bounded); the mutual flag is a self-join of "
    "the n*k edge list on the reversed key; avg cosine is summed in "
    "exact BIGINT micro-units with one terminal division.",
)
def q_knn_graph_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flink_anomaly_spark.operators.similarity import knn_graph_stats

    emb = load_table(spark, sf_dir, "embeddings")
    return knn_graph_stats(
        emb, id_col="vec_id", vec_col="embedding", label_col="label", k=5
    )


@register(
    "ols_trend_daily",
    oracle="""
    WITH daily AS (
      SELECT event_type AS k,
             CAST(date_diff('day', DATE '2024-01-01',
                            CAST(date_trunc('day', ts) AS DATE)) AS BIGINT) AS x,
             CAST(FLOOR(sum(CAST(round(value*100) AS BIGINT)) / 100) AS BIGINT) AS y
      FROM events GROUP BY 1, 2
    ),
    s AS (
      SELECT k, CAST(count(*) AS BIGINT) AS n, CAST(sum(x) AS BIGINT) AS sx,
             CAST(sum(y) AS BIGINT) AS sy, CAST(sum(x*y) AS BIGINT) AS sxy,
             CAST(sum(x*x) AS BIGINT) AS sxx, CAST(sum(y*y) AS BIGINT) AS syy
      FROM daily GROUP BY k
    )
    SELECT k AS event_type, n AS n_days,
           round(CAST(n*sxy - sx*sy AS DOUBLE)
                 / CAST(n*sxx - sx*sx AS DOUBLE), 6) + 0.0 AS slope_per_day,
           round(CAST(sy*sxx - sx*sxy AS DOUBLE)
                 / CAST(n*sxx - sx*sx AS DOUBLE), 6) + 0.0 AS intercept,
           round(CAST(n*sxy - sx*sy AS DOUBLE) * CAST(n*sxy - sx*sy AS DOUBLE)
                 / (CAST(n*sxx - sx*sx AS DOUBLE)
                    * CAST(n*syy - sy*sy AS DOUBLE)), 6) AS r2
    FROM s WHERE n >= 2 AND n*sxx - sx*sx > 0 AND n*syy - sy*sy > 0
    """,
    doc="Per-type OLS trend of daily revenue totals against the day "
    "index — the parametric companion of theil_sen_trend: slope, "
    "intercept and R^2 from closed-form normal equations whose five "
    "sufficient statistics are exact BIGINT sums (association-order-"
    "free), leaving three deterministic scalar double expressions. Day "
    "pre-aggregation makes the cost calendar-bounded; one map-side-"
    "combinable day agg then a |keys|-row hash agg. Signed outputs "
    "carry the +0.0 IEEE -0.0 guard.",
)
def q_ols_trend_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from flink_anomaly_spark.operators.mining import ols_trend_daily

    events = load_table(spark, sf_dir, "events")
    out = ols_trend_daily(
        events, key_col="event_type", ts_col="ts", value_col="value",
        epoch_date="2024-01-01",
    )
    return out.select(
        "event_type",
        "n_days",
        (F.col("slope_per_day") + F.lit(0.0)).alias("slope_per_day"),
        (F.col("intercept") + F.lit(0.0)).alias("intercept"),
        "r2",
    )


def _lof_oracle(k: int = 5, top_k: int = 20) -> str:
    from flink_anomaly_spark.plans.relational_ext import _DIM, _bucket_sql

    sq = (
        "(CAST(q.embedding[i] AS DOUBLE) - CAST(c.embedding[i] AS DOUBLE))"
        " * (CAST(q.embedding[i] AS DOUBLE) - CAST(c.embedding[i] AS DOUBLE))"
    )
    l2 = (
        f"sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
        f"list_transform(range(1, {_DIM + 1}), i -> {sq})), (x,y) -> x+y))"
    )
    return f"""
    WITH v AS (SELECT vec_id, embedding, {_bucket_sql()} AS bucket FROM embeddings),
    pairs AS (
      SELECT q.vec_id AS qid, c.vec_id AS nid, round({l2}, 6) AS d
      FROM v q JOIN v c ON q.bucket = c.bucket AND q.vec_id != c.vec_id
    ),
    edges AS (
      SELECT qid, nid, d FROM (
        SELECT qid, nid, d,
               row_number() OVER (PARTITION BY qid ORDER BY d ASC, nid ASC) AS rn
        FROM pairs) t
      WHERE rn <= {k}
    ),
    kstats AS (SELECT qid, CAST(count(*) AS BIGINT) AS nn, max(d) AS kdist
               FROM edges GROUP BY qid),
    reach AS (
      SELECT e.qid,
             CAST(round(greatest(kb.kdist, e.d) * 1000000) AS BIGINT) AS rm
      FROM edges e JOIN kstats kb ON e.nid = kb.qid
    ),
    lrd AS (
      SELECT r.qid, k2.nn,
             CAST(round(CAST(k2.nn AS DOUBLE) * 1000000000000.0
                        / CAST(greatest(r.s, 1) AS DOUBLE)) AS BIGINT) AS lrd_micro
      FROM (SELECT qid, CAST(sum(rm) AS BIGINT) AS s FROM reach GROUP BY qid) r
      JOIN kstats k2 ON r.qid = k2.qid
    ),
    nbr AS (
      SELECT e.qid, CAST(sum(lb.lrd_micro) AS BIGINT) AS sum_lrd_b
      FROM edges e JOIN lrd lb ON e.nid = lb.qid GROUP BY e.qid
    ),
    scored AS (
      SELECT n.qid, l.nn, l.lrd_micro,
             round(CAST(n.sum_lrd_b AS DOUBLE)
                   / (CAST(l.nn AS DOUBLE)
                      * CAST(greatest(l.lrd_micro, 1) AS DOUBLE)), 6) AS lof
      FROM nbr n JOIN lrd l ON n.qid = l.qid
    )
    SELECT qid AS vec_id, nn AS n_neighbors,
           round(CAST(lrd_micro AS DOUBLE) / 1000000.0, 6) AS lrd, lof
    FROM scored ORDER BY lof DESC, qid ASC LIMIT {top_k}
    """


@register(
    "lof_outliers",
    oracle=_lof_oracle(),
    doc="Local Outlier Factor (Breunig et al. SIGMOD'00) over the "
    "embedding corpus, LSH-blocked, k=5, top-20: the density-RELATIVE "
    "outlier score the global screens cannot express. Every post-kNN "
    "stage is edge-list sized; both density sums ride exact BIGINT "
    "micro-units of 6-rounded doubles (reach distances, then lrd "
    "re-quantized) so no float SUM order can differ between engines; "
    "each density is one deterministic scalar division.",
)
def q_lof_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flink_anomaly_spark.operators.anomaly import lof_outliers

    emb = load_table(spark, sf_dir, "embeddings")
    return lof_outliers(emb, id_col="vec_id", vec_col="embedding", k=5, top_k=20)


def _rake_oracle(top_k: int = 20) -> str:
    from flink_anomaly_spark.operators.text import RAKE_WS_PATTERN, rake_stopword_regex

    pat = rake_stopword_regex()
    return f"""
    WITH ph AS (
      SELECT unnest(string_split(regexp_replace(text, '{pat}', '|', 'g'), '|'))
        AS phrase
      FROM documents
    ),
    ws AS (
      SELECT list_filter(string_split_regex(trim(phrase), '{RAKE_WS_PATTERN}'),
                         tk -> tk != '') AS w
      FROM ph
    ),
    ex AS (
      SELECT len(w) AS plen, unnest(w) AS word FROM ws WHERE len(w) > 0
    ),
    sc AS (
      SELECT word, CAST(count(*) AS BIGINT) AS freq,
             CAST(sum(plen) AS BIGINT) AS degree,
             CAST(sum(plen) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS score
      FROM ex GROUP BY word
    )
    SELECT word, freq, degree, round(score, 4) AS rake_score
    FROM sc ORDER BY score DESC, word ASC LIMIT {top_k}
    """


@register(
    "rake_keywords",
    oracle=_rake_oracle(),
    doc="Corpus-level RAKE keywords (Rose et al. 2010): documents split "
    "into candidate phrases at stopword boundaries (ONE narrow regex "
    "replace + split per row — no shuffle before the aggregation), "
    "each content word scored degree/freq over exact BIGINT sums with "
    "one deterministic division, top-20 by (score desc, word asc) via "
    "TakeOrderedAndProject. The stopword pattern is a single shared "
    "fragment (rake_stopword_regex) so engine and oracle segment "
    "identically.",
)
def q_rake_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flink_anomaly_spark.operators.text import rake_keywords

    docs = load_table(spark, sf_dir, "documents")
    return rake_keywords(docs, text_col="text", top_k=20)


def _hilbert_oracle() -> str:
    from flink_anomaly_spark.plans.fragments import hilbert_steps
    from flink_anomaly_spark.plans.governance import _ZBITS

    nb = 2**_ZBITS
    steps, d_expr = hilbert_steps(_ZBITS)
    inner = f"""
      SELECT d.doc_id, d.n_chars, d.lang,
             least({nb - 1},
                   CAST(floor(CAST((d.n_chars - s.mn) AS DOUBLE) * {nb}
                              / (s.mx - s.mn + 1)) AS BIGINT)) AS hx0,
             l.lang_rank % {nb} AS hy0
      FROM documents d,
           (SELECT min(n_chars) AS mn, max(n_chars) AS mx FROM documents) s
      JOIN (SELECT lang,
                   CAST((row_number() OVER (ORDER BY lang)) - 1 AS BIGINT)
                     AS lang_rank
            FROM (SELECT DISTINCT lang FROM documents)) l
        ON d.lang = l.lang"""
    q = inner
    for name, expr in steps:
        q = f"SELECT *, {expr} AS {name} FROM ({q})"
    return f"""
    SELECT hvalue AS file_id, count(*) AS n_docs,
           count(DISTINCT lang) AS n_langs,
           min(n_chars) AS min_chars, max(n_chars) AS max_chars
    FROM (SELECT *, {d_expr} AS hvalue FROM ({q}))
    GROUP BY hvalue
    """


@register(
    "hilbert_file_layout",
    oracle=_hilbert_oracle(),
    doc="Hilbert-curve file-layout assignment over the SAME (size "
    "bucket x lang rank) keys as zorder_file_layout — the layout "
    "Iceberg/Delta offer beside Z-order because the Hilbert curve has "
    "strictly better locality (every curve step is grid-adjacent; "
    "Morton jumps across the plane at power-of-two seams, so range "
    "scans touch fewer files). The unrolled xy2d transform is ONE "
    "shared %%/CASE fragment (fragments.hilbert_steps, adjacency-"
    "verified) evaluated as narrow bit-math on both engines; plan is "
    "identical to the z-order twin: 1-row stats broadcast, tiny "
    "lang-rank broadcast, one final groupBy(hvalue) bounded at 256 "
    "rows.",
)
def q_hilbert_file_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from flink_anomaly_spark.plans.fragments import hilbert_steps
    from flink_anomaly_spark.plans.governance import _ZBITS

    nb = 2**_ZBITS
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars", "lang")
    stats = F.broadcast(
        docs.agg(F.min("n_chars").alias("mn"), F.max("n_chars").alias("mx"))
    )
    langs = F.broadcast(
        docs.select("lang")
        .distinct()
        .select(
            "lang",
            (F.row_number().over(Window.orderBy("lang")) - 1)
            .cast("bigint")
            .alias("lang_rank"),
        )
    )
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
            ).alias("hx0"),
            (F.col("lang_rank") % nb).alias("hy0"),
        )
    )
    steps, d_expr = hilbert_steps(_ZBITS)
    cur = keyed
    for name, expr in steps:
        cur = cur.withColumn(name, F.expr(expr))
    cur = cur.withColumn("hvalue", F.expr(d_expr))
    return cur.groupBy(F.col("hvalue").alias("file_id")).agg(
        F.count("*").alias("n_docs"),
        F.countDistinct("lang").alias("n_langs"),
        F.min("n_chars").alias("min_chars"),
        F.max("n_chars").alias("max_chars"),
    )


@register(
    "acf_daily",
    oracle="""
    WITH daily AS (
      SELECT event_type AS k, date_trunc('day', ts) AS d,
             CAST(sum(CAST(round(value*10) AS BIGINT)) AS BIGINT) AS y
      FROM events GROUP BY 1, 2
    ),
    e AS (
      SELECT k, d,
             CAST(count(*) OVER w AS BIGINT) AS n,
             CAST(count(*) OVER w AS BIGINT) * y
               - CAST(sum(y) OVER w AS BIGINT) AS e
      FROM daily
      WINDOW w AS (PARTITION BY k)
    ),
    l AS (
      SELECT k, n, e,
             lead(e, 1) OVER w2 AS e1,
             lead(e, 2) OVER w2 AS e2,
             lead(e, 3) OVER w2 AS e3
      FROM e
      WINDOW w2 AS (PARTITION BY k ORDER BY d)
    ),
    g AS (
      SELECT k, max(n) AS nd,
             CAST(sum(e * e) AS BIGINT) AS den,
             CAST(sum(e * e1) AS BIGINT) AS num1,
             CAST(sum(e * e2) AS BIGINT) AS num2,
             CAST(sum(e * e3) AS BIGINT) AS num3
      FROM l GROUP BY k
    )
    SELECT k AS event_type, CAST(nd AS BIGINT) AS n_days,
           round(CAST(num1 AS DOUBLE) / CAST(den AS DOUBLE), 6) + 0.0 AS acf1,
           round(CAST(num2 AS DOUBLE) / CAST(den AS DOUBLE), 6) + 0.0 AS acf2,
           round(CAST(num3 AS DOUBLE) / CAST(den AS DOUBLE), 6) + 0.0 AS acf3
    FROM g WHERE den > 0 AND nd > 3
    """,
    doc="Per-type autocorrelation of daily revenue totals at lags 1-3 "
    "(row-based over observed days, the moving_median convention) — "
    "the persistence screen before forecasting/drift models. The "
    "rational mean is cleared by multiplying both sides by n^2, so "
    "numerators and denominator are exact BIGINT cross-products in "
    "deci-units and each acf is ONE exactly-rounded division (+0.0 "
    "negative-zero guard). One keyed exchange+sort serves the (n, S) "
    "window and all three leads.",
)
def q_acf_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flink_anomaly_spark.operators.mining import acf_daily

    events = load_table(spark, sf_dir, "events")
    return acf_daily(events, key_col="event_type", ts_col="ts", value_col="value",
                     max_lag=3)


@register(
    "pacf_daily",
    oracle="""
    WITH daily AS (
      SELECT event_type AS k, date_trunc('day', ts) AS d,
             CAST(sum(CAST(round(value*10) AS BIGINT)) AS BIGINT) AS y
      FROM events GROUP BY 1, 2
    ),
    e AS (
      SELECT k, d,
             CAST(count(*) OVER w AS BIGINT) AS n,
             CAST(count(*) OVER w AS BIGINT) * y
               - CAST(sum(y) OVER w AS BIGINT) AS e
      FROM daily
      WINDOW w AS (PARTITION BY k)
    ),
    l AS (
      SELECT k, n, e,
             lead(e, 1) OVER w2 AS e1,
             lead(e, 2) OVER w2 AS e2,
             lead(e, 3) OVER w2 AS e3
      FROM e
      WINDOW w2 AS (PARTITION BY k ORDER BY d)
    ),
    g AS (
      SELECT k, max(n) AS nd,
             CAST(sum(e * e) AS BIGINT) AS den,
             CAST(sum(e * e1) AS BIGINT) AS num1,
             CAST(sum(e * e2) AS BIGINT) AS num2,
             CAST(sum(e * e3) AS BIGINT) AS num3
      FROM l GROUP BY k
    ),
    rho AS (
      SELECT k, nd,
             CAST(num1 AS DOUBLE) / CAST(den AS DOUBLE) AS r1,
             CAST(num2 AS DOUBLE) / CAST(den AS DOUBLE) AS r2,
             CAST(num3 AS DOUBLE) / CAST(den AS DOUBLE) AS r3
      FROM g WHERE den > 0 AND nd > 3
    ),
    dl2 AS (
      SELECT k, nd, r1, r2, r3,
             (r2 - r1 * r1) / (1.0 - r1 * r1) AS phi22
      FROM rho WHERE (1.0 - r1 * r1) <> 0.0
    ),
    dl3 AS (
      SELECT k, nd, r1, r2, r3, phi22,
             r1 - phi22 * r1 AS phi21
      FROM dl2
    )
    SELECT k AS event_type, CAST(nd AS BIGINT) AS n_days,
           round(r1, 6) + 0.0 AS pacf1,
           round(phi22, 6) + 0.0 AS pacf2,
           round((r3 - phi21 * r2 - phi22 * r1)
                 / (1.0 - phi21 * r1 - phi22 * r2), 6) + 0.0 AS pacf3
    FROM dl3
    WHERE (1.0 - phi21 * r1 - phi22 * r2) <> 0.0
    """,
    doc="Per-type PARTIAL autocorrelation of daily revenue totals at "
    "lags 1-3 — the AR-order-selection companion of acf_daily (PACF of "
    "an AR(p) cuts off after lag p where the ACF only decays). The "
    "Durbin-Levinson recursion is unrolled to closed form over the "
    "SAME exact-BIGINT sufficient statistics acf_daily divides "
    "(shared _acf_sufficient_stats), so it stays a per-key column "
    "expression — no driver-side fold — and every double op is an "
    "exactly-rounded IEEE step written in identical association order "
    "in both engines. Degenerate innovation variances (|rho| -> 1) "
    "are filtered on the same expression on both sides.",
)
def q_pacf_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flink_anomaly_spark.operators.mining import pacf_daily

    events = load_table(spark, sf_dir, "events")
    return pacf_daily(events, key_col="event_type", ts_col="ts", value_col="value")


@register(
    "dw_autocorr_daily",
    oracle="""
    WITH daily AS (
      SELECT event_type AS k, date_trunc('day', ts) AS d,
             CAST(sum(CAST(round(value*10) AS BIGINT)) AS BIGINT) AS y
      FROM events GROUP BY 1, 2
    ),
    e AS (
      SELECT k, d,
             CAST(count(*) OVER w AS BIGINT) AS n,
             CAST(count(*) OVER w AS BIGINT) * y
               - CAST(sum(y) OVER w AS BIGINT) AS e
      FROM daily
      WINDOW w AS (PARTITION BY k)
    ),
    l AS (
      SELECT k, n, e,
             lag(e, 1) OVER (PARTITION BY k ORDER BY d) AS ep
      FROM e
    ),
    g AS (
      SELECT k, max(n) AS nd,
             CAST(sum(e * e) AS BIGINT) AS den,
             CAST(sum(CASE WHEN ep IS NOT NULL
                           THEN (e - ep) * (e - ep) END) AS BIGINT) AS num
      FROM l GROUP BY k
    )
    SELECT k AS event_type, CAST(nd AS BIGINT) AS n_days,
           round(CAST(num AS DOUBLE) / CAST(den AS DOUBLE), 6) + 0.0 AS dw
    FROM g WHERE den > 0 AND nd >= 2
    """,
    doc="Per-type Durbin-Watson statistic over MEAN-CENTERED daily "
    "revenue totals — the classic 0..4 serial-correlation screen "
    "(~2 none, ->0 positive, ->4 negative) read next to acf1/pacf1. "
    "Honest definition: DW of the level-adjusted series (intercept-"
    "only residuals) — trend-fit residuals are rationals whose exact "
    "squares overflow int64 on both engines. Numerator and "
    "denominator are association-order-free BIGINT sums of squares of "
    "the shared n-scaled centered values; ONE terminal division; the "
    "single keyed exchange+sort serves the window and the lag.",
)
def q_dw_autocorr_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flink_anomaly_spark.operators.mining import dw_autocorr_daily

    events = load_table(spark, sf_dir, "events")
    return dw_autocorr_daily(
        events, key_col="event_type", ts_col="ts", value_col="value"
    )


@register(
    "hodges_lehmann_daily",
    oracle="""
    WITH daily AS (
      SELECT event_type AS k, date_trunc('day', ts) AS d,
             CAST(FLOOR(sum(CAST(round(value*100) AS BIGINT)) / 100)
                  AS BIGINT) AS y
      FROM events GROUP BY 1, 2
    ),
    walsh AS (
      SELECT a.k, CAST(a.y + b.y AS BIGINT) AS s
      FROM daily a JOIN daily b ON a.k = b.k AND a.d <= b.d
    )
    SELECT k AS event_type, CAST(count(*) AS BIGINT) AS n_pairs,
           CAST(median(s) AS DOUBLE) / 2.0 AS hl_location
    FROM walsh GROUP BY k
    """,
    doc="Per-type Hodges-Lehmann location (median of all Walsh "
    "averages (y_i+y_j)/2, i<=j) over whole-unit daily totals — the "
    "robust 'typical daily revenue' companion of the Theil-Sen median "
    "SLOPE (~29% breakdown, more efficient than the plain median near "
    "normality). Walsh SUMS are exact BIGINTs; the median midpoint of "
    "two int64s is exact in a double; /2 is exact scaling. The day "
    "pre-agg bounds the self-join by the CALENDAR (<= days^2/2 pairs "
    "per key — the theil_sen/mann_kendall shape).",
)
def q_hodges_lehmann_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flink_anomaly_spark.operators.mining import hodges_lehmann_daily

    events = load_table(spark, sf_dir, "events")
    return hodges_lehmann_daily(
        events, key_col="event_type", ts_col="ts", value_col="value"
    )


@register(
    "sn_scale_daily",
    oracle="""
    WITH daily AS (
      SELECT event_type AS k, date_trunc('day', ts) AS d,
             CAST(FLOOR(sum(CAST(round(value*100) AS BIGINT)) / 100)
                  AS BIGINT) AS y
      FROM events GROUP BY 1, 2
    ),
    inner_med AS (
      SELECT a.k, a.d AS da,
             CAST(median(abs(a.y - b.y)) AS DOUBLE) AS im
      FROM daily a JOIN daily b ON a.k = b.k AND a.d <> b.d
      GROUP BY a.k, a.d
    )
    SELECT k AS event_type, CAST(count(*) AS BIGINT) AS n_days,
           round(1.1926 * CAST(median(im) AS DOUBLE), 6) + 0.0 AS sn_scale
    FROM inner_med GROUP BY k
    """,
    doc="Per-type Rousseeuw-Croux Sn robust scale over whole-unit "
    "daily totals: 1.1926 * med_i(med_{j!=i} |y_i - y_j|) — the scale "
    "companion of hodges_lehmann_daily's location and theil_sen's "
    "slope (~50% breakdown; unlike MAD, no symmetry assumption). Both "
    "nested medians are the engine-shared INTERPOLATED median (stated "
    "deviation from the paper's high/low order statistics); inner "
    "|differences| are exact BIGINTs, the outer median midpoints two "
    "exact doubles, the consistency factor is one exactly-rounded "
    "multiply. Calendar-bounded day-pair self-join (the theil_sen "
    "shape).",
)
def q_sn_scale_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flink_anomaly_spark.operators.mining import sn_scale_daily

    events = load_table(spark, sf_dir, "events")
    return sn_scale_daily(events, key_col="event_type", ts_col="ts", value_col="value")


@register(
    "robust_daily_outliers",
    oracle="""
    WITH daily AS (
      SELECT event_type AS k, date_trunc('day', ts) AS d,
             CAST(FLOOR(sum(CAST(round(value*100) AS BIGINT)) / 100)
                  AS BIGINT) AS y
      FROM events GROUP BY 1, 2
    ),
    hl AS (
      SELECT k, CAST(median(s) AS DOUBLE) / 2.0 AS hl
      FROM (
        SELECT a.k, CAST(a.y + b.y AS BIGINT) AS s
        FROM daily a JOIN daily b ON a.k = b.k AND a.d <= b.d
      ) GROUP BY k
    ),
    sn AS (
      SELECT k, round(1.1926 * CAST(median(im) AS DOUBLE), 6) + 0.0 AS sn
      FROM (
        SELECT a.k, a.d, CAST(median(abs(a.y - b.y)) AS DOUBLE) AS im
        FROM daily a JOIN daily b ON a.k = b.k AND a.d <> b.d
        GROUP BY a.k, a.d
      ) GROUP BY k
    )
    SELECT daily.k AS event_type, daily.d AS day, daily.y AS day_total,
           round((CAST(daily.y AS DOUBLE) - hl.hl) / sn.sn, 6) + 0.0 AS robust_z
    FROM daily JOIN hl ON daily.k = hl.k JOIN sn ON daily.k = sn.k
    WHERE abs(CAST(daily.y AS DOUBLE) - hl.hl) > 2.0 * sn.sn
    """,
    doc="Robust control chart over whole-unit daily totals: flag days "
    "with |y - HL| > 2*Sn (the warning limit — the 3-sigma action "
    "limit never fires on these corpora and an always-empty result "
    "proves nothing) — the screen the two robust estimators "
    "exist for (mean/stddev charts let outlier days inflate their own "
    "threshold; HL/Sn have 29%/50% breakdown). The flag is the "
    "CROSS-MULTIPLIED no-division form (Sn=0 keys never flag — "
    "degenerate guard for free); the reported robust_z divides once "
    "and rounds once. The oracle embeds the HL and Sn oracle "
    "fragments as CTEs so the estimators cannot drift from their "
    "verified definitions (the kappa precedent).",
)
def q_robust_daily_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flink_anomaly_spark.operators.mining import robust_daily_outliers

    events = load_table(spark, sf_dir, "events")
    return robust_daily_outliers(
        events, key_col="event_type", ts_col="ts", value_col="value"
    )


@register(
    "mann_kendall_trend",
    oracle="""
    WITH daily AS (
      SELECT event_type AS k, date_trunc('day', ts) AS d,
             CAST(FLOOR(sum(CAST(round(value*100) AS BIGINT)) / 100) AS BIGINT) AS y
      FROM events GROUP BY 1, 2
    ),
    s AS (
      SELECT a.k, CAST(sum(sign(b.y - a.y)) AS BIGINT) AS s
      FROM daily a JOIN daily b ON a.k = b.k AND a.d < b.d
      GROUP BY a.k
    ),
    n AS (SELECT k, CAST(count(*) AS BIGINT) AS n FROM daily GROUP BY k),
    ties AS (
      SELECT k, CAST(sum(t*(t-1)*(2*t+5)) AS BIGINT) AS tiecorr
      FROM (SELECT k, y, CAST(count(*) AS BIGINT) AS t FROM daily GROUP BY k, y)
      GROUP BY k
    ),
    j AS (
      SELECT s.k, n.n, s.s,
             n.n*(n.n-1)*(2*n.n+5) - ties.tiecorr AS var18
      FROM s JOIN n USING (k) JOIN ties USING (k)
    )
    SELECT k AS event_type, n AS n_days, s AS s_stat,
           round(CAST(s - CAST(sign(s) AS BIGINT) AS DOUBLE)
                 / sqrt(CAST(var18 AS DOUBLE) / 18.0), 4) + 0.0 AS z_mk,
           abs(round(CAST(s - CAST(sign(s) AS BIGINT) AS DOUBLE)
                     / sqrt(CAST(var18 AS DOUBLE) / 18.0), 4)) > 1.96
             AS significant
    FROM j WHERE n >= 2 AND var18 > 0
    """,
    doc="Mann-Kendall trend test over daily revenue totals per type — "
    "the significance companion of theil_sen_trend (slope) and "
    "ols_trend_daily (parametric fit): S is an exact BIGINT sign sum "
    "over calendar-bounded day pairs, the tie-corrected 18*Var is a "
    "closed-form BIGINT from a domain-sized (key, value) agg, and the "
    "continuity-corrected z is ONE deterministic sqrt+division. "
    "Distribution-free, outlier-robust; the day pre-agg keeps the "
    "pair join <= days^2/2 per key.",
)
def q_mann_kendall_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flink_anomaly_spark.operators.mining import mann_kendall_trend

    events = load_table(spark, sf_dir, "events")
    return mann_kendall_trend(events, key_col="event_type", ts_col="ts",
                              value_col="value")


# ---------------------------------------------------------------------------
# Round 10: Spearman, Fano burstiness, Cohen's kappa, Mahalanobis
# ---------------------------------------------------------------------------


@register(
    "spearman_corr_daily",
    oracle="""
    WITH daily AS (
      SELECT event_type AS k, date_trunc('day', ts) AS d,
             CAST(count(*) AS BIGINT) AS cnt,
             CAST(FLOOR(sum(CAST(round(value*100) AS BIGINT)) / 100) AS BIGINT) AS y
      FROM events GROUP BY k, d
    ),
    ranked AS (
      SELECT k,
             CAST(2 * rank() OVER (PARTITION BY k ORDER BY cnt)
                  + count(*) OVER (PARTITION BY k, cnt) - 1 AS BIGINT) AS rx,
             CAST(2 * rank() OVER (PARTITION BY k ORDER BY y)
                  + count(*) OVER (PARTITION BY k, y) - 1 AS BIGINT) AS ry
      FROM daily
    ),
    s AS (
      SELECT k, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(rx) AS BIGINT) AS sx, CAST(sum(ry) AS BIGINT) AS sy,
             CAST(sum(rx*ry) AS BIGINT) AS sxy,
             CAST(sum(rx*rx) AS BIGINT) AS sxx,
             CAST(sum(ry*ry) AS BIGINT) AS syy
      FROM ranked GROUP BY k
    )
    SELECT k AS event_type, n AS n_days,
           round(CAST(n*sxy - sx*sy AS DOUBLE)
                 / sqrt(CAST(n*sxx - sx*sx AS DOUBLE)
                        * CAST(n*syy - sy*sy AS DOUBLE)), 6) + 0.0
             AS spearman_rho
    FROM s WHERE n >= 3 AND n*sxx - sx*sx > 0 AND n*syy - sy*sy > 0
    """,
    doc="Per-event-type Spearman rank correlation between daily event "
    "COUNT and daily TOTAL (whole units) — the nonparametric "
    "volume-vs-value screen. Integer-midrank trick: doubled midranks "
    "2r + t - 1 from RANK() + tie counts are exact BIGINTs and "
    "Pearson on them equals Pearson on midranks, so all five "
    "sufficient statistics are exact BIGINT sums and rho is one "
    "fixed-shape sqrt+division (IEEE-exact, the mann_kendall z "
    "convention). One (key, day) map-side agg; rank windows partition "
    "by key over calendar-bounded frames; |keys|-row final agg.",
)
def q_spearman_corr_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flink_anomaly_spark.operators.mining import spearman_corr_daily

    events = load_table(spark, sf_dir, "events")
    return spearman_corr_daily(events, key_col="event_type", ts_col="ts", value_col="value")


#: shared verbatim between the batch fano query and its streaming twin
#: (the stream replays the identical day-count build from raw events)
_FANO_ORACLE = """
    WITH daily AS (
      SELECT event_type AS k, date_trunc('day', ts) AS d,
             CAST(count(*) AS BIGINT) AS c
      FROM events GROUP BY k, d
    ),
    s AS (
      SELECT k, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(c) AS BIGINT) AS s1, CAST(sum(c*c) AS BIGINT) AS s2
      FROM daily GROUP BY k
    )
    SELECT k AS event_type, n AS n_days, s1 AS n_events,
           round(CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE), 6) AS mean_daily,
           round(CAST(n*s2 - s1*s1 AS DOUBLE) / CAST(n*s1 AS DOUBLE), 6)
             AS fano_factor,
           CASE WHEN n*s2 - s1*s1 > n*s1 THEN 1 ELSE 0 END AS overdispersed
    FROM s WHERE n >= 2 AND s1 > 0
    """


@register(
    "fano_burstiness_daily",
    oracle=_FANO_ORACLE,
    doc="Per-event-type Fano factor (index of dispersion) of daily "
    "event counts — the burstiness screen (Fano 1947; Church & Gale "
    "1995 for term burstiness): variance/mean of per-day counts, 1 = "
    "Poisson-like, > 1 = bursty (bot/incident signature). Exact "
    "BIGINT moments, ONE terminal division; the overdispersed flag is "
    "the pure integer comparison n*S2 - S1^2 > n*S1. One map-side "
    "(key, day) count agg, then a |keys|-row agg.",
)
def q_fano_burstiness_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flink_anomaly_spark.operators.mining import fano_burstiness_daily

    events = load_table(spark, sf_dir, "events")
    return fano_burstiness_daily(events, key_col="event_type", ts_col="ts")


def _kappa_oracle() -> str:
    from flink_anomaly_spark.plans.quality_queries import (
        _GOPHER_FLAGS_ORACLE,
        _logistic_score_oracle,
    )

    return f"""
    WITH g AS ({_GOPHER_FLAGS_ORACLE}),
    l AS ({_logistic_score_oracle()}),
    j AS (
      SELECT d.lang AS grp,
             CAST(g.keep AS BIGINT) AS ka, CAST(l.keep AS BIGINT) AS kb
      FROM documents d
      JOIN g ON d.doc_id = g.doc_id
      JOIN l ON d.doc_id = l.doc_id
    ),
    cells AS (
      SELECT grp,
             CAST(sum(ka*kb) AS BIGINT) AS a,
             CAST(sum(ka*(1-kb)) AS BIGINT) AS b,
             CAST(sum((1-ka)*kb) AS BIGINT) AS c,
             CAST(sum((1-ka)*(1-kb)) AS BIGINT) AS d
      FROM j GROUP BY grp
    )
    SELECT grp AS lang, a AS both_keep, b AS a_only, c AS b_only,
           d AS both_drop,
           round(CAST((a+b+c+d)*(a+d) - ((a+b)*(a+c) + (c+d)*(b+d)) AS DOUBLE)
                 / CAST((a+b+c+d)*(a+b+c+d)
                        - ((a+b)*(a+c) + (c+d)*(b+d)) AS DOUBLE), 6) + 0.0
             AS kappa
    FROM cells
    WHERE (a+b+c+d)*(a+b+c+d) - ((a+b)*(a+c) + (c+d)*(b+d)) > 0
    """


@register(
    "quality_screen_agreement_kappa",
    oracle=_kappa_oracle(),
    doc="Per-language Cohen's kappa between the two ALREADY-VERIFIED "
    "quality screens (gopher rule-based keep vs logistic-model keep) "
    "— chance-corrected agreement, the standard filter-comparison "
    "metric beyond raw overlap. Cross-multiplied closed form over the "
    "exact BIGINT 2x2 contingency: kappa = (N(a+d) - E)/(N^2 - E), "
    "ONE terminal division, constant-rater groups dropped. The oracle "
    "embeds the two screens' own oracle fragments as CTEs so the "
    "raters cannot drift from their verified definitions. Plan: two "
    "narrow document scans joined on doc_id, one |langs|-row agg — at "
    "100 TB the two feature extractions fuse into one projection; "
    "composition of the verified operators is kept here so the raters "
    "ARE the shipped screens.",
)
def q_quality_screen_agreement_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from flink_anomaly_spark.operators.mining import agreement_kappa
    from flink_anomaly_spark.operators.text import (
        gopher_quality_flags,
        quality_logistic_score,
    )

    docs = load_table(spark, sf_dir, "documents")
    a = gopher_quality_flags(docs, id_col="doc_id", text_col="text").select(
        "doc_id", F.col("keep").alias("keep_a")
    )
    b = quality_logistic_score(docs, id_col="doc_id", text_col="text").select(
        "doc_id", F.col("keep").alias("keep_b")
    )
    j = docs.select("doc_id", "lang").join(a, "doc_id").join(b, "doc_id")
    return agreement_kappa(j, group_col="lang", rater_a_col="keep_a", rater_b_col="keep_b")


def _maha_oracle() -> str:
    from flink_anomaly_spark.operators.anomaly import mahalanobis_oracle_sql

    return mahalanobis_oracle_sql("vec_id", "embedding", "embeddings")


@register(
    "mahalanobis_outliers",
    oracle=_maha_oracle(),
    doc="Top-20 Mahalanobis-distance outliers over the first three "
    "embedding coordinates (VERDICT r9 missing #2) — the classic "
    "multivariate outlier score between the univariate screens and "
    "LOF: m^2 = (x-mu)' Sigma^-1 (x-mu) with correlated-dimension "
    "awareness. No matrix solve crosses the engine boundary: exact "
    "BIGINT sufficient statistics on the MAHA_SCALE integer grid, the "
    "d=3 closed-form SYMMETRIC adjugate/determinant, and the "
    "quadratic form all evaluate the SHARED MAHA3_* SQL fragments — "
    "identical IEEE expression trees over identical integers, so "
    "scores are bit-identical cross-engine. Plan: one narrow 3-int "
    "projection (vectors never shuffle), one 10-statistic map-side "
    "agg to a single broadcast row, one stateless score pass, "
    "TakeOrderedAndProject top-k.",
)
def q_mahalanobis_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flink_anomaly_spark.operators.anomaly import mahalanobis_outliers

    emb = load_table(spark, sf_dir, "embeddings")
    return mahalanobis_outliers(emb, id_col="vec_id", vec_col="embedding", top_k=20)


def _maha_d8_oracle() -> str:
    from flink_anomaly_spark.operators.anomaly import mahalanobis_d_oracle_sql

    return mahalanobis_d_oracle_sql("vec_id", "embedding", "embeddings", d=8)


@register(
    "mahalanobis_outliers_d8",
    oracle=_maha_d8_oracle(),
    doc="Top-20 Mahalanobis outliers over the first EIGHT embedding "
    "coordinates — the higher-dimensional path the d=3 docstring "
    "promised (VERDICT r10 missing #3), implemented WITHOUT a driver-"
    "side solve: the Cholesky factorization of the n^2-scaled "
    "covariance is GENERATED as engine-shared SQL fragments "
    "(maha_chol_fragments) and evaluated as column math on the single "
    "broadcast statistics row; per-row forward substitution gives "
    "m^2 = ||L^-1 dx||^2. Every op is IEEE-exactly-rounded "
    "(+,-,*,/,sqrt — no libm), both engines run the identical "
    "generated expression tree over identical exact-BIGINT "
    "statistics, so scores are bit-identical at any d. Plan: one "
    "narrow 8-int projection, one 45-statistic map-side agg to a "
    "single row, O(d^3) column math on that row, broadcast join, "
    "TakeOrderedAndProject top-k.",
)
def q_mahalanobis_outliers_d8(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flink_anomaly_spark.operators.anomaly import mahalanobis_outliers_d

    emb = load_table(spark, sf_dir, "embeddings")
    return mahalanobis_outliers_d(
        emb, id_col="vec_id", vec_col="embedding", d=8, top_k=20
    )


def _maha_attr_oracle() -> str:
    from flink_anomaly_spark.operators.anomaly import (
        mahalanobis_dim_attribution_oracle_sql,
    )

    return mahalanobis_dim_attribution_oracle_sql("embedding", "embeddings", d=8)


@register(
    "maha_dim_attribution",
    oracle=_maha_attr_oracle(),
    doc="Per-dimension outlier attribution via the whitened "
    "coordinates y = L^-1 dx of the d=8 Mahalanobis system: "
    "sum_rows(y y') = n*I exactly, so |y_i| > 3 is a calibrated "
    "per-dimension z-screen and the counts decompose the "
    "multivariate outliers dimension by dimension (a correlated raw "
    "pair shows up in ONE whitened direction). Same engine-identical "
    "Cholesky machinery as mahalanobis_outliers_d8 (bounded stats "
    "collect, fragment-order evaluation, literal injection); the "
    "flag is one exact-double comparison, counts are integers; emits "
    "exactly d rows including zero counts. One d-counter map-side "
    "aggregate, unpivoted by stack().",
)
def q_maha_dim_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flink_anomaly_spark.operators.anomaly import mahalanobis_dim_attribution

    emb = load_table(spark, sf_dir, "embeddings")
    return mahalanobis_dim_attribution(emb, vec_col="embedding", d=8, z=3.0)


# ---------------------------------------------------------------------------
# Round 10 session 2: CCF, Kendall tau-b, SNM blocking quality
# ---------------------------------------------------------------------------


@register(
    "ccf_daily",
    oracle="""
    WITH daily AS (
      SELECT event_type AS k,
             CAST(date_diff('day', DATE '2024-01-01',
                            CAST(date_trunc('day', ts) AS DATE)) AS BIGINT) AS d,
             CAST(FLOOR(sum(CAST(round(value*100) AS BIGINT)) / 100) AS BIGINT) AS y
      FROM events WHERE event_type IN ('error', 'purchase')
      GROUP BY k, d
    ),
    a AS (SELECT d AS da, y AS ya FROM daily WHERE k = 'error'),
    b AS (SELECT d AS db, y AS yb FROM daily WHERE k = 'purchase'),
    lags AS (SELECT unnest(range(0, 4)) AS lag),
    s AS (
      SELECT l.lag, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(ya) AS BIGINT) AS sx, CAST(sum(yb) AS BIGINT) AS sy,
             CAST(sum(ya*yb) AS BIGINT) AS sxy,
             CAST(sum(ya*ya) AS BIGINT) AS sxx,
             CAST(sum(yb*yb) AS BIGINT) AS syy
      FROM lags l JOIN a ON true JOIN b ON b.db = a.da + l.lag
      GROUP BY l.lag
    )
    SELECT CAST(lag AS BIGINT) AS lag, n AS n_days,
           round(CAST(n*sxy - sx*sy AS DOUBLE)
                 / sqrt(CAST(n*sxx - sx*sx AS DOUBLE)
                        * CAST(n*syy - sy*sy AS DOUBLE)), 6) + 0.0 AS ccf
    FROM s WHERE n >= 3 AND n*sxx - sx*sx > 0 AND n*syy - sy*sy > 0
    ORDER BY lag
    """,
    doc="Cross-correlation between the error and purchase daily totals "
    "at lags 0-3 (does today's error volume predict purchase value in "
    "k days?) — the lead/lag companion of acf_daily and the standard "
    "pairwise screen before causal analysis. Whole-unit daily totals "
    "via the shared explicit FLOOR(cents/100); per lag the five "
    "sufficient statistics over inner-joined (a_d, b_d+lag) pairs are "
    "exact BIGINT, one fixed-shape sqrt+division each. One corpus "
    "agg, then four calendar-bounded tiny joins.",
)
def q_ccf_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flink_anomaly_spark.operators.mining import ccf_daily

    events = load_table(spark, sf_dir, "events")
    return ccf_daily(
        events, key_col="event_type", ts_col="ts", value_col="value",
        key_a="error", key_b="purchase", max_lag=3,
    )


@register(
    "kendall_tau_daily",
    oracle="""
    WITH daily AS (
      SELECT event_type AS k, date_trunc('day', ts) AS d,
             CAST(count(*) AS BIGINT) AS cnt,
             CAST(FLOOR(sum(CAST(round(value*100) AS BIGINT)) / 100) AS BIGINT) AS y
      FROM events GROUP BY k, d
    ),
    pq AS (
      SELECT a.k,
             CAST(sum(CAST(sign(b.cnt - a.cnt) AS BIGINT)
                      * CAST(sign(b.y - a.y) AS BIGINT)) AS BIGINT) AS pq
      FROM daily a JOIN daily b ON a.k = b.k AND a.d < b.d
      GROUP BY a.k
    ),
    n AS (SELECT k, CAST(count(*) AS BIGINT) AS n FROM daily GROUP BY k),
    tx AS (
      SELECT k, CAST(sum(t*(t-1)//2) AS BIGINT) AS tx FROM (
        SELECT k, CAST(count(*) AS BIGINT) AS t FROM daily GROUP BY k, cnt
      ) GROUP BY k
    ),
    ty AS (
      SELECT k, CAST(sum(t*(t-1)//2) AS BIGINT) AS ty FROM (
        SELECT k, CAST(count(*) AS BIGINT) AS t FROM daily GROUP BY k, y
      ) GROUP BY k
    ),
    j AS (
      SELECT pq.k, pq.pq, n.n, tx.tx, ty.ty, n.n*(n.n-1)//2 AS n0
      FROM pq JOIN n USING (k) JOIN tx USING (k) JOIN ty USING (k)
    )
    SELECT k AS event_type, n AS n_days, pq AS p_minus_q,
           round(CAST(pq AS DOUBLE)
                 / sqrt(CAST(n0 - tx AS DOUBLE) * CAST(n0 - ty AS DOUBLE)), 6)
             + 0.0 AS tau_b
    FROM j WHERE n >= 2 AND n0 > tx AND n0 > ty
    """,
    doc="Per-event-type Kendall tau-b between daily count and daily "
    "total — the concordance companion of spearman_corr_daily with "
    "the standard tie correction for heavily-tied telemetry. P-Q is "
    "an exact BIGINT sign-product sum over CALENDAR-BOUNDED day pairs "
    "(the mann_kendall machinery applied bivariate), tie terms are "
    "closed-form from domain-sized aggs (t(t-1) is even, so the "
    "integer halving is lossless), tau is one fixed-shape "
    "sqrt+division.",
)
def q_kendall_tau_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flink_anomaly_spark.operators.mining import kendall_tau_daily

    events = load_table(spark, sf_dir, "events")
    return kendall_tau_daily(events, key_col="event_type", ts_col="ts", value_col="value")


def _snm_blocking_oracle(window: int = 6, threshold: int = 60, key_chars: int = 16) -> str:
    """Composed oracle: the edit_distance_near_dup oracle body is the
    TRUTH set (complete within (lang, source) blocks at ``threshold``),
    the sorted_neighborhood_dup_pairs oracle body is the CANDIDATE
    method — both mirrored verbatim from their registered forms except
    the shared ``threshold`` (the registered SNM screen runs at 80;
    the comparison must score both methods at the SAME cutoff)."""
    return rf"""
    WITH d AS MATERIALIZED (
      SELECT doc_id AS id,
             regexp_replace(text, '[^\x00-\x7F]', '', 'g') AS t,
             lang, source
      FROM documents
    ),
    p AS (SELECT id, t, lang, source, length(t) AS n, length(t) // 100 AS band
          FROM d),
    truth AS MATERIALIZED (
      SELECT a.id AS id_a, b.id AS id_b
      FROM p a JOIN p b
        ON a.lang = b.lang AND a.source = b.source
       AND a.id < b.id
       AND abs(a.band - b.band) <= 1
       AND abs(a.n - b.n) <= {threshold}
      WHERE levenshtein(a.t, b.t) <= {threshold}
    ),
    k AS (
      SELECT id, t, length(t) AS n,
             substr(regexp_replace(lower(t), '[^a-z0-9]', '', 'g'),
                    1, {key_chars}) AS key
      FROM d
    ),
    r AS (
      SELECT id, t, n, row_number() OVER (ORDER BY key, id) AS rk FROM k
    ),
    snm AS MATERIALIZED (
      SELECT least(a.id, b.id) AS id_a, greatest(a.id, b.id) AS id_b
      FROM r a JOIN r b
        ON b.rk > a.rk AND b.rk <= a.rk + {window - 1}
      WHERE abs(a.n - b.n) <= {threshold}
        AND levenshtein(a.t, b.t) <= {threshold}
    ),
    nn AS (SELECT CAST(count(*) AS BIGINT) AS nd FROM d),
    c AS (
      SELECT (SELECT CAST(count(*) AS BIGINT) FROM truth) AS n_truth,
             (SELECT CAST(count(*) AS BIGINT) FROM snm) AS n_snm,
             (SELECT CAST(count(*) AS BIGINT)
              FROM truth t JOIN snm s USING (id_a, id_b)) AS n_common,
             (SELECT nd FROM nn) AS n_docs
    )
    SELECT n_docs, n_truth, n_snm AS n_snm_verified, n_common,
           round(CAST(n_common AS DOUBLE) / CAST(n_truth AS DOUBLE), 6)
             AS recall,
           CAST({window - 1} * n_docs
                - {window} * {window - 1} // 2 AS BIGINT) AS n_candidates,
           round(1.0 - CAST({window - 1} * n_docs
                            - {window} * {window - 1} // 2 AS DOUBLE)
                       / CAST(n_docs * (n_docs - 1) // 2 AS DOUBLE), 6)
             AS reduction_ratio
    FROM c WHERE n_truth > 0
    """


@register(
    "snm_blocking_quality",
    oracle=_snm_blocking_oracle(),
    doc="Record-linkage blocking-quality evaluation (Christen 2012): "
    "pair-completeness (recall) and reduction ratio of the "
    "sorted-neighborhood method against the COMPLETE in-block "
    "edit-distance truth at the same lev<=60 cutoff — the measurement "
    "that tells you whether a cheap O(w*n) blocking is safe to run "
    "instead of the O(sum block^2) exhaustive pass. SNM pairs are "
    "canonicalized (least/greatest) before the intersection; the "
    "candidate count (w-1)*n - w(w-1)/2 and the n(n-1)/2 pair space "
    "are closed-form integers, recall and RR are the only divisions. "
    "One row out; every input is a 1-row aggregate of the two "
    "already-verified pair pipelines.",
)
def q_snm_blocking_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from flink_anomaly_spark.operators.dedup import (
        edit_distance_near_dup,
        sorted_neighborhood_pairs,
    )

    docs = load_table(spark, sf_dir, "documents")
    truth = edit_distance_near_dup(
        docs, id_col="doc_id", text_col="text",
        block_cols=["lang", "source"], band_chars=100, threshold=60,
    ).select("id_a", "id_b")
    snm = sorted_neighborhood_pairs(
        docs, id_col="doc_id", text_col="text",
        window=6, threshold=60, key_chars=16,
    ).select(
        F.least("id_a", "id_b").alias("id_a"),
        F.greatest("id_a", "id_b").alias("id_b"),
    )
    from flink_anomaly_spark.operators.dedup import _persist

    truth = _persist(truth)
    snm = _persist(snm)
    n_truth = truth.agg(F.count("*").cast("bigint").alias("n_truth"))
    n_snm = snm.agg(F.count("*").cast("bigint").alias("n_snm_verified"))
    n_common = truth.join(snm, ["id_a", "id_b"]).agg(
        F.count("*").cast("bigint").alias("n_common")
    )
    n_docs = docs.agg(F.count("*").cast("bigint").alias("n_docs"))
    w = 6
    out = n_docs.join(n_truth).join(n_snm).join(n_common)
    cand = (w - 1) * F.col("n_docs") - F.lit(w * (w - 1) // 2)
    space = F.expr("n_docs * (n_docs - 1) DIV 2")
    return out.filter(F.col("n_truth") > 0).select(
        "n_docs",
        "n_truth",
        "n_snm_verified",
        "n_common",
        F.round(
            F.col("n_common").cast("double") / F.col("n_truth").cast("double"), 6
        ).alias("recall"),
        cand.cast("bigint").alias("n_candidates"),
        F.round(
            F.lit(1.0) - cand.cast("double") / space.cast("double"), 6
        ).alias("reduction_ratio"),
    )


def _dedup_quality_shift_oracle() -> str:
    from flink_anomaly_spark.plans.extensions import _PIPELINE_ORACLE
    from flink_anomaly_spark.plans.quality_queries import _GOPHER_FLAGS_ORACLE

    return f"""
    WITH flags AS ({_GOPHER_FLAGS_ORACLE}),
    surv AS ({_PIPELINE_ORACLE})
    SELECT CASE WHEN s.doc_id IS NOT NULL THEN 'survivor' ELSE 'removed' END
             AS cohort,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(f.keep) AS BIGINT) AS n_keep,
           round(CAST(sum(f.keep) AS DOUBLE) / count(*), 6) AS keep_rate
    FROM flags f LEFT JOIN surv s ON f.doc_id = s.doc_id
    GROUP BY 1
    """


@register(
    "dedup_quality_shift",
    oracle=_dedup_quality_shift_oracle(),
    doc="Does deduplication BIAS the corpus? Gopher keep-rate among "
    "the composed dedup pipeline's survivors vs the removed docs — "
    "the reconciliation report a curation pipeline publishes before "
    "anyone trains on the survivors (near-dup families skew toward "
    "boilerplate, so removal usually RAISES survivor quality; a drop "
    "flags an aggressive blocker). Composes two independently "
    "verified pipelines (the snm_blocking_quality / kappa precedent): "
    "the oracle embeds the gopher-flags and dedup-survivor oracle "
    "fragments as CTEs so neither rater can drift. 2-row output; the "
    "only new shuffles are a doc_id semi-join marker and a 2-group "
    "map-side agg.",
)
def q_dedup_quality_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from flink_anomaly_spark.operators.text import gopher_quality_flags
    from flink_anomaly_spark.plans.extensions import q_dedup_pipeline

    docs = load_table(spark, sf_dir, "documents")
    flags = gopher_quality_flags(docs, id_col="doc_id", text_col="text").select(
        "doc_id", "keep"
    )
    surv = q_dedup_pipeline(spark, sf_dir).withColumn("__s", F.lit(1))
    cohort = F.when(F.col("__s").isNotNull(), F.lit("survivor")).otherwise(
        F.lit("removed")
    )
    return (
        flags.join(surv, "doc_id", "left")
        .groupBy(cohort.alias("cohort"))
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("keep").cast("bigint").alias("n_keep"),
            F.round(
                F.sum("keep").cast("double") / F.count("*"), 6
            ).alias("keep_rate"),
        )
    )
