"""Round-9 session-2 breadth: classifier-evaluation metrics, corpus
keyness, conformal anomaly p-values, all-pairs binary cosine, and
kNN-graph statistics.

Reference scope note: GlebSolovev/flink-anomaly (Main.java:23-58) is a
DataStream anomaly repro with none of these; they extend the engine's
text/anomaly/similarity families (SURVEY §2.9 breadth) with the
measurement layer a training-data pipeline runs on top of its filters:
"is my quality score actually separating classes" (AUC), "which terms
define each slice" (keyness), "which new events are distribution-free
anomalies" (conformal), plus two scale-first similarity shapes.
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
