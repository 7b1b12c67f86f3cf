"""Corpus-quality queries: Gopher-style rule filters, intra-document
repetition profiling, and stratified language rebalancing — the
filter/sample passes a pre-training data pipeline runs after dedup.

Like every plan module, each oracle replicates the Spark computation
EXACTLY (same tokenization, same integer thresholds, same rounding), so
the driver's value-hash comparison is meaningful.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_anomaly_spark.operators.dedup import md5_int32
from flink_anomaly_spark.operators.text import (
    GOPHER_STOPWORDS,
    doc_repetition_profile,
    gopher_quality_flags,
)
from flink_anomaly_spark.plans.fragments import MD5_32 as _MD5_32
from flink_anomaly_spark.plans.fragments import TOKS as _TOKS
from flink_anomaly_spark.plans.fragments import shingle_sql as _shingle_sql
from flink_anomaly_spark.plans.registry import register
from flink_anomaly_spark.tables import load_table

_STOPLIST_SQL = "[" + ",".join(f"'{s}'" for s in GOPHER_STOPWORDS) + "]"


#: full Gopher-rule flag computation over `documents` — shared between
#: the standalone flags query and the composed curation pipeline so the
#: two oracles cannot drift apart
_GOPHER_FLAGS_ORACLE = rf"""
    WITH t AS (
      SELECT doc_id, text, {_TOKS} AS toks FROM documents
    ), s AS (
      SELECT doc_id,
             len(toks) AS n_words,
             greatest(len(toks), 1) AS n1,
             CAST(coalesce(list_sum(list_transform(toks, tk -> length(tk))), 0) AS DOUBLE)
               / greatest(len(toks), 1) AS mean_wl,
             ((length(text) - length(replace(text, '#', '')))
              + (length(text) - length(replace(text, '...', ''))) / 3)
               / CAST(greatest(len(toks), 1) AS DOUBLE) AS symbol_ratio,
             CAST(len(list_filter(toks, tk -> regexp_matches(tk, '[a-zA-Z]'))) AS DOUBLE)
               / greatest(len(toks), 1) AS alpha_frac,
             len(list_intersect(list_distinct(list_transform(toks, tk -> lower(tk))),
                                {_STOPLIST_SQL})) AS stop_hits
      FROM t
    ), f AS (
      SELECT doc_id, n_words, mean_wl, symbol_ratio, alpha_frac, stop_hits,
             CASE WHEN n_words >= 50 AND n_words <= 100000 THEN 1 ELSE 0 END AS pass_word_count,
             CASE WHEN mean_wl >= 3.0 AND mean_wl <= 10.0 THEN 1 ELSE 0 END AS pass_mean_word_len,
             CASE WHEN symbol_ratio <= 0.1 THEN 1 ELSE 0 END AS pass_symbol_ratio,
             CASE WHEN alpha_frac >= 0.8 THEN 1 ELSE 0 END AS pass_alpha_words,
             CASE WHEN stop_hits >= 2 THEN 1 ELSE 0 END AS pass_stopwords
      FROM s
    )
    SELECT doc_id, n_words, round(mean_wl, 4) AS mean_word_len,
           round(symbol_ratio, 4) AS symbol_ratio, round(alpha_frac, 4) AS alpha_frac,
           stop_hits, pass_word_count, pass_mean_word_len, pass_symbol_ratio,
           pass_alpha_words, pass_stopwords,
           pass_word_count * pass_mean_word_len * pass_symbol_ratio
             * pass_alpha_words * pass_stopwords AS keep
    FROM f
    """


@register(
    "gopher_quality_flags",
    oracle=_GOPHER_FLAGS_ORACLE,
    doc="Gopher rule-based quality filter (Rae et al. 2021 A1.1): word "
    "count / mean word length / symbol ratio / alpha-word fraction / "
    "required-stopword rules, one flag each plus the combined keep "
    "decision. Narrow Catalyst-only plan, zero shuffle.",
)
def q_gopher_quality_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return gopher_quality_flags(docs, id_col="doc_id", text_col="text")


def _logistic_score_oracle() -> str:
    from flink_anomaly_spark.operators.text import QUALITY_LOGIT

    w = QUALITY_LOGIT
    z = (
        f"{w['bias']} + {w['w_sqrt_n_tok']}*sqrt(CAST(n_tok AS DOUBLE)) "
        f"+ {w['w_mean_wl']}*mean_wl + {w['w_stop_frac']}*stop_frac"
    )
    return rf"""
    WITH t AS (
      SELECT doc_id, {_TOKS} AS toks FROM documents
    ), f AS (
      SELECT doc_id,
             len(toks) AS n_tok,
             CAST(coalesce(list_sum(list_transform(toks, tk -> length(tk))), 0) AS DOUBLE)
               / greatest(len(toks), 1) AS mean_wl,
             CAST(len(list_filter(toks, tk -> list_contains({_STOPLIST_SQL}, lower(tk)))) AS DOUBLE)
               / greatest(len(toks), 1) AS stop_frac
      FROM t
    ), z AS (
      SELECT doc_id, n_tok, mean_wl, stop_frac, {z} AS zv FROM f
    )
    SELECT doc_id, CAST(n_tok AS BIGINT) AS n_tok,
           round(mean_wl, 4) AS mean_word_len,
           round(stop_frac, 4) AS stop_frac,
           round(0.5 + 0.5 * zv / (1.0 + abs(zv)), 4) AS score,
           CASE WHEN zv >= 0 THEN 1 ELSE 0 END AS keep
    FROM z
    """


@register(
    "quality_logistic_score",
    oracle=_logistic_score_oracle(),
    doc="Model-based quality filter stage (the FineWeb-Edu / DCLM "
    "classifier-filter shape with a transparent fixed linear model — "
    "the Spark plumbing is identical with learned weights): per-doc "
    "features -> linear score -> fast-sigmoid squash -> keep "
    "threshold. Feature transforms avoid libm entirely (sqrt is "
    "IEEE-exact, the squash is z/(1+|z|)), so score and keep are "
    "bit-identical cross-engine with no rounding-boundary risk. "
    "Narrow Catalyst-only plan, zero shuffle; complements the "
    "rule-based gopher_quality_flags and the distributional "
    "unigram_logprob_quality.",
)
def q_quality_logistic_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flink_anomaly_spark.operators.text import quality_logistic_score

    docs = load_table(spark, sf_dir, "documents")
    return quality_logistic_score(docs, id_col="doc_id", text_col="text")


@register(
    "doc_repetition_profile",
    oracle=rf"""
    WITH t AS (
      SELECT doc_id, {_TOKS} AS toks FROM documents
    ), nn AS (
      SELECT doc_id, len(bi) AS n_2grams, len(list_distinct(bi)) AS n_2grams_distinct
      FROM (SELECT doc_id, {_shingle_sql(2)} AS bi FROM t)
    ), e AS (
      SELECT doc_id, unnest(toks) AS tk FROM t
    ), g AS (
      SELECT doc_id, tk, count(*) AS cnt FROM e GROUP BY doc_id, tk
    ), a AS (
      SELECT doc_id, max(cnt) AS top_cnt, sum(cnt) AS n_tok,
             count(*) AS n_tok_distinct
      FROM g GROUP BY doc_id
    )
    SELECT nn.doc_id,
           -- DuckDB sum(BIGINT) returns HUGEINT which pandas renders as
           -- float64 (32.0 vs Spark's bigint 32) — the round-3 driver-red
           -- row; CAST pins the oracle to the Spark column type.
           CAST(coalesce(a.n_tok, 0) AS BIGINT) AS n_tokens,
           round(coalesce(a.top_cnt, 0) / CAST(greatest(coalesce(a.n_tok, 0), 1) AS DOUBLE), 4)
             AS top_token_frac,
           round(1.0 - coalesce(a.n_tok_distinct, 0)
                 / CAST(greatest(coalesce(a.n_tok, 0), 1) AS DOUBLE), 4) AS dup_token_frac,
           round(1.0 - n_2grams_distinct / CAST(greatest(n_2grams, 1) AS DOUBLE), 4)
             AS dup_2gram_frac
    FROM nn LEFT JOIN a USING (doc_id)
    """,
    doc="Gopher repetition filters: most-frequent-token fraction, "
    "duplicate-token fraction, duplicate word-2-gram fraction. 2-gram "
    "stats stay narrow (array ops); top-token stats shuffle only "
    "(doc_id, token) pairs with map-side partial aggregation.",
)
def q_doc_repetition_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return doc_repetition_profile(docs, id_col="doc_id", text_col="text")


@register(
    "unigram_logprob_quality",
    oracle=rf"""
    WITH t AS (
      SELECT doc_id, unnest({_TOKS}) AS tk FROM documents
    ), g AS (
      SELECT doc_id, tk, count(*) AS c FROM t GROUP BY doc_id, tk
    ), v AS (
      SELECT tk, sum(c) AS cnt FROM g GROUP BY tk
    ), tot AS (
      SELECT sum(cnt) AS total FROM v
    ), d AS (
      SELECT g.doc_id, CAST(sum(g.c) AS BIGINT) AS n_tok,
             log2(total) - sum(g.c * log2(v.cnt)) / CAST(sum(g.c) AS DOUBLE) AS s
      FROM g JOIN v USING (tk) CROSS JOIN tot GROUP BY g.doc_id, total
    )
    SELECT doc_id, n_tok, round(s, 4) AS mean_neglog2p,
           CASE ntile(3) OVER (ORDER BY round(s, 6), doc_id)
                WHEN 1 THEN 'head' WHEN 2 THEN 'middle' ELSE 'tail' END
             AS ccnet_bucket
    FROM d
    """,
    doc="CCNet-style LM quality scoring (Wenzek et al. 2020), unigram "
    "flavor: per-doc mean -log2 p(token) under the corpus's own "
    "unigram distribution, bucketed head/middle/tail by corpus "
    "terciles. The oracle's ntile(3) window is the semantic spec; the "
    "engine computes the identical buckets with a two-phase global "
    "rank + the closed-form ntile formula so no single-partition "
    "Window ever sees the corpus.",
)
def q_unigram_logprob_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flink_anomaly_spark.operators.text import unigram_logprob_quality

    docs = load_table(spark, sf_dir, "documents")
    return unigram_logprob_quality(docs, id_col="doc_id", text_col="text")


@register(
    "bigram_logprob_quality",
    oracle=rf"""
    WITH base AS (
      SELECT doc_id, {_TOKS} AS toks FROM documents WHERE len({_TOKS}) >= 1
    ), tk AS (
      SELECT doc_id, unnest(toks) AS w FROM base
    ), uni AS (
      SELECT w, CAST(count(*) AS BIGINT) AS c FROM tk GROUP BY w
    ), tot AS (
      SELECT CAST(sum(c) AS BIGINT) AS n_corpus FROM uni
    ), pidx AS (
      SELECT doc_id, toks, unnest(range(2, len(toks) + 1)) AS i
      FROM base WHERE len(toks) >= 2
    ), pe AS (
      SELECT doc_id, toks[i - 1] AS w1, toks[i] AS w2 FROM pidx
    ), bi AS (
      SELECT w1, w2, CAST(count(*) AS BIGINT) AS cb
      FROM pe GROUP BY w1, w2 HAVING count(*) >= 3
    ), ps AS (
      SELECT pe.doc_id,
             CASE WHEN bi.cb IS NOT NULL THEN log2(bi.cb) - log2(u1.c)
                  ELSE log2(0.4) + log2(u2.c) - log2(n_corpus) END AS lp,
             CASE WHEN bi.cb IS NULL THEN 1 ELSE 0 END AS bo
      FROM pe
      JOIN uni u1 ON pe.w1 = u1.w
      JOIN uni u2 ON pe.w2 = u2.w
      LEFT JOIN bi ON pe.w1 = bi.w1 AND pe.w2 = bi.w2
      CROSS JOIN tot
    ), pagg AS (
      SELECT doc_id, sum(lp) AS slp, CAST(sum(bo) AS BIGINT) AS n_backoff,
             CAST(count(*) AS BIGINT) AS np
      FROM ps GROUP BY doc_id
    ), first AS (
      SELECT base.doc_id, log2(u.c) - log2(n_corpus) AS flp
      FROM base JOIN uni u ON toks[1] = u.w CROSS JOIN tot
    )
    SELECT f.doc_id,
           CAST(coalesce(p.np, 0) + 1 AS BIGINT) AS n_tok,
           coalesce(p.n_backoff, 0) AS n_backoff,
           round(-(f.flp + coalesce(p.slp, 0.0)) / (coalesce(p.np, 0) + 1), 4)
             AS mean_neglog2p
    FROM first f LEFT JOIN pagg p USING (doc_id)
    """,
    doc="Bigram stupid-backoff LM quality scoring (Brants et al. 2007): "
    "per-doc mean -log2 score under a count-pruned (>= 3) bigram model "
    "with alpha = 0.4 unigram backoff, trained on the scored corpus "
    "itself — the order-2 step up from unigram_logprob_quality that "
    "VERDICT r11 queued. n_backoff is the exact-integer hash anchor; "
    "the float mean rounds to 4 (the unigram containment). Pairs build "
    "array-side (no lag window); the pruned model joins back hint-free "
    "(AQE-decided, per the r12 no-forced-broadcast rule).",
)
def q_bigram_logprob_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flink_anomaly_spark.operators.text import bigram_logprob_quality

    docs = load_table(spark, sf_dir, "documents")
    return bigram_logprob_quality(docs, id_col="doc_id", text_col="text")


#: per-language keep rates (out of 1000) for the stratified rebalance:
#: downsample the dominant language, keep the tail. Integer thresholds
#: so both engines compare exact ints — no float-boundary hazard.
STRATA_RATES_PER_MILLE: dict[str, int] = {"en": 300, "de": 600, "es": 600, "fr": 600, "zh": 600}
DEFAULT_RATE_PER_MILLE = 500


@register(
    "stratified_sample_by_lang",
    oracle=f"""
    SELECT doc_id, lang, source
    FROM documents
    WHERE {_MD5_32.format(x="'strat:' || CAST(doc_id AS VARCHAR)")} % 1000 <
          CASE lang WHEN 'en' THEN 300 WHEN 'de' THEN 600 WHEN 'es' THEN 600
                    WHEN 'fr' THEN 600 WHEN 'zh' THEN 600 ELSE 500 END
    """,
    doc="Stratified sampling with per-stratum rates (language "
    "rebalancing): deterministic md5-bucket threshold per row, so the "
    "sample is reproducible across engines, runs, and cluster sizes — "
    "no RNG state, no shuffle, pure filter pushdown-friendly scan.",
)
def q_stratified_sample_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    rate_map = F.create_map(
        *[F.lit(x) for kv in STRATA_RATES_PER_MILLE.items() for x in kv]
    )
    bucket = md5_int32(F.concat_ws("", F.lit("strat:"), F.col("doc_id"))) % 1000
    threshold = F.coalesce(
        F.element_at(rate_map, F.col("lang")), F.lit(DEFAULT_RATE_PER_MILLE)
    )
    # no orderBy: the driver's hash compare is order-insensitive, and a
    # global sort would add the only exchange in an otherwise pure
    # filter-scan plan
    return docs.filter(bucket < threshold).select("doc_id", "lang", "source")


@register(
    "heavy_hitter_terms",
    oracle=rf"""
    WITH e AS (
      SELECT unnest({_TOKS}) AS term FROM documents
    ), tot AS (SELECT count(*) AS n FROM e)
    SELECT term, count(*) AS cnt,
           round(count(*) * 1.0 / (SELECT n FROM tot), 6) AS frac
    FROM e GROUP BY term
    HAVING count(*) * 1000 >= (SELECT n FROM tot)
    ORDER BY cnt DESC, term ASC
    """,
    doc="Exact corpus heavy hitters: tokens occurring in ≥ 0.1% of all "
    "token positions. Explode → one map-side-combined agg on the term "
    "key; the threshold compares exact integers (cnt·1000 ≥ N) so no "
    "float boundary can flip membership. The vocabulary-sized agg "
    "output is the only wide data.",
)
def q_heavy_hitter_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flink_anomaly_spark.operators.text import tokens

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(F.explode(tokens(F.col("text"))).alias("term"))
    total = toks.count()
    return (
        toks.groupBy("term")
        .agg(F.count("*").alias("cnt"))
        .filter(F.col("cnt") * 1000 >= F.lit(total))
        .withColumn("frac", F.round(F.col("cnt") * 1.0 / F.lit(total), 6))
        .orderBy(F.col("cnt").desc(), F.col("term").asc())
    )


@register(
    "sequence_packing",
    oracle=rf"""
    WITH t AS (
      SELECT doc_id, len({_TOKS}) AS n_tok FROM documents
    ), c AS (
      SELECT doc_id, n_tok,
             sum(n_tok) OVER (ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      FROM t
    )
    SELECT doc_id, n_tok,
           -- CAST: DuckDB windowed sum(BIGINT) yields HUGEINT → pandas
           -- float64; Spark emits bigint (round-4 strict-gate fix)
           CAST((cum - n_tok) // 2048 AS BIGINT) AS bin_id,
           CAST((cum - n_tok) % 2048 AS BIGINT) AS bin_offset
    FROM c
    """,
    doc="Concat-and-chunk sequence packing (GPT-style pretraining prep): "
    "each doc's start (bin, offset) in the 2048-token stream laid out "
    "in doc_id order. The exclusive prefix sum runs DISTRIBUTED "
    "(range-partition local cumsum + per-partition offsets broadcast "
    "back), not as a single-partition global window; integer-exact, so "
    "the oracle's plain global-window form matches bit-for-bit.",
)
def q_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flink_anomaly_spark.operators.text import pack_sequences

    docs = load_table(spark, sf_dir, "documents")
    return pack_sequences(docs, id_col="doc_id", text_col="text", seq_len=2048)


@register(
    "char_entropy",
    oracle="""
    WITH ch AS (
      SELECT doc_id, unnest(list_transform(range(1, length(text) + 1),
                                           i -> substr(text, i, 1))) AS c
      FROM documents
    ), g AS (
      SELECT doc_id, c, count(*) AS cnt FROM ch GROUP BY doc_id, c
    ), t AS (
      SELECT doc_id, cnt, sum(cnt) OVER (PARTITION BY doc_id) AS n FROM g
    )
    SELECT doc_id, count(*) AS n_distinct_chars,
           round(-sum((cnt * 1.0 / n) * log2(cnt * 1.0 / n)), 6) AS char_entropy
    FROM t GROUP BY doc_id
    """,
    doc="Character-level Shannon entropy per document — the gibberish/"
    "low-diversity signal real quality filters use (low entropy = "
    "repeated chars, high = random noise). Arrow-vectorized mapInPandas "
    "(UTF-32 codepoint bincount per doc): zero shuffle, no per-char "
    "explode; the pure-Catalyst explode path remains as the "
    "vectorized=False reference, asserted equal in tests. Rounded to 6 "
    "so libm log2 ulp and sum-order drift can't break the hash.",
)
def q_char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flink_anomaly_spark.operators.text import char_entropy_profile

    docs = load_table(spark, sf_dir, "documents")
    return char_entropy_profile(docs, id_col="doc_id", text_col="text")


@register(
    "token_count_histogram",
    oracle=rf"""
    WITH t AS (SELECT len({_TOKS}) AS n_tok FROM documents)
    SELECT least(n_tok // 10, 19) AS bucket,
           least(n_tok // 10, 19) * 10 AS bucket_lo,
           count(*) AS n_docs
    FROM t GROUP BY 1, 2
    """,
    doc="Token-count histogram (width-10 buckets, top-coded at 190+): "
    "the length-distribution profile run before choosing packing / "
    "truncation parameters. Integer bucket arithmetic — exact on both "
    "engines; the exchange carries ≤20 partial rows per map task.",
)
def q_token_count_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flink_anomaly_spark.operators.text import token_count

    docs = load_table(spark, sf_dir, "documents")
    bucket = F.least(F.floor(token_count(F.col("text")) / 10), F.lit(19)).cast("bigint")
    return (
        docs.select(bucket.alias("bucket"))
        .groupBy("bucket")
        .agg(F.count("*").alias("n_docs"))
        .withColumn("bucket_lo", F.col("bucket") * 10)
        .select("bucket", "bucket_lo", "n_docs")
    )


@register(
    "langid_accuracy_by_lang",
    oracle=None,  # set below: wraps the langid oracle in an accuracy rollup
    doc="Self-evaluation of the char-trigram language ID against the "
    "labeled lang column: per-language n / n_correct / accuracy. The "
    "oracle wraps the langid query's own oracle in a GROUP BY, so the "
    "two stay in lockstep by construction.",
)
def q_langid_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flink_anomaly_spark.operators.text import lang_guess_ngram

    docs = load_table(spark, sf_dir, "documents")
    ok = (lang_guess_ngram(F.col("text")) == F.col("lang")).cast("int")
    return (
        docs.select("lang", ok.alias("ok"))
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("ok").alias("n_correct"),
            F.round(F.sum("ok") * 1.0 / F.count("*"), 4).alias("accuracy"),
        )
    )


def _install_langid_accuracy_oracle() -> None:
    from flink_anomaly_spark.plans.extensions import _langid_ngram_oracle
    from flink_anomaly_spark.plans.registry import QUERIES, QuerySpec

    spec = QUERIES["langid_accuracy_by_lang"]
    oracle = f"""
    WITH pred AS ({_langid_ngram_oracle()})
    SELECT lang, count(*) AS n_docs,
           CAST(sum(CASE WHEN lang_ngram = lang THEN 1 ELSE 0 END) AS BIGINT) AS n_correct,
           round(sum(CASE WHEN lang_ngram = lang THEN 1 ELSE 0 END) * 1.0 / count(*), 4)
             AS accuracy
    FROM pred GROUP BY lang
    """
    QUERIES["langid_accuracy_by_lang"] = QuerySpec(
        name=spec.name, build=spec.build, oracle=oracle, doc=spec.doc
    )


_install_langid_accuracy_oracle()


# ---------------------------------------------------------------------------
# Multilingual temperature resampling weights (XLM-R style, alpha=0.5)
# ---------------------------------------------------------------------------


@register(
    "language_sampling_weights",
    oracle=rf"""
    WITH per_lang AS (
      SELECT lang, count(*) AS n_docs,
             CAST(sum(len({_TOKS})) AS BIGINT) AS n_tokens
      FROM documents GROUP BY lang
    ), tot AS (
      SELECT lang, n_docs, n_tokens,
             CAST(n_tokens AS DOUBLE) / sum(n_tokens) OVER () AS p,
             sqrt(CAST(n_tokens AS DOUBLE) / sum(n_tokens) OVER ()) AS w_raw
      FROM per_lang
    )
    SELECT lang, n_docs, n_tokens, round(p, 6) AS token_share,
           round(w_raw / sum(w_raw) OVER (), 6) AS sample_weight
    FROM tot
    """,
    doc="Temperature-based language rebalancing (Conneau et al. 2020 "
    "XLM-R, §3: q_i ∝ p_i^alpha with alpha=0.5): per-language token "
    "share → damped, renormalized sampling weight. One map-side "
    "combined aggregation over the corpus; the normalization windows "
    "run over |languages| rows, so the plan is scan + one shuffle of "
    "|languages| partial aggregates no matter the corpus size.",
)
def q_language_sampling_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    toks = F.filter(F.split(F.col("text"), r"\s+"), lambda t: t != "")
    per_lang = docs.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.size(toks)).alias("n_tokens"),
    )
    # |languages| rows from here on — the unpartitioned windows are a
    # deliberate single-partition pass over a handful of rows
    w = Window.partitionBy()
    p = F.col("n_tokens").cast("double") / F.sum("n_tokens").over(w)
    w_raw = F.sqrt(p)
    return per_lang.select(
        "lang",
        "n_docs",
        "n_tokens",
        F.round(p, 6).alias("token_share"),
        F.round(w_raw / F.sum(w_raw).over(w), 6).alias("sample_weight"),
    )


# ---------------------------------------------------------------------------
# Bigram collocations by PMI
# ---------------------------------------------------------------------------


@register(
    "bigram_pmi_top",
    oracle=rf"""
    WITH t AS (
      SELECT doc_id, {_TOKS} AS toks FROM documents
    ), uni AS (
      SELECT unnest(toks) AS tok FROM t
    ), u AS (
      SELECT tok, count(*) AS c FROM uni GROUP BY tok
    ), bi AS (
      SELECT unnest(list_transform(range(1, len(toks)),
                                   i -> toks[i] || ' ' || toks[i+1])) AS bigram
      FROM t
    ), b AS (
      SELECT split_part(bigram, ' ', 1) AS w1, split_part(bigram, ' ', 2) AS w2,
             count(*) AS c_xy
      FROM bi GROUP BY bigram
    ), n AS (
      SELECT (SELECT sum(c) FROM u) AS n1, (SELECT sum(c_xy) FROM b) AS n2
    ), scored AS (
      SELECT b.w1, b.w2, b.c_xy,
             round(ln((CAST(b.c_xy AS DOUBLE) / n.n2)
                      / ((CAST(u1.c AS DOUBLE) / n.n1)
                         * (CAST(u2.c AS DOUBLE) / n.n1))), 6) + 0.0 AS pmi
      FROM b JOIN u u1 ON b.w1 = u1.tok
             JOIN u u2 ON b.w2 = u2.tok
             CROSS JOIN n
      WHERE b.c_xy >= 10
    )
    SELECT w1, w2, c_xy, pmi FROM scored
    ORDER BY pmi DESC, w1 ASC, w2 ASC LIMIT 20
    """,
    doc="Collocation mining: top-20 token bigrams by pointwise mutual "
    "information (Church & Hanks 1990), min support 10. One explode → "
    "count shuffle each for unigrams and bigrams; the PMI join runs "
    "against the unigram vocabulary, which is broadcast (vocab ≪ "
    "corpus at any scale). Deterministic ordering (pmi, w1, w2) makes "
    "the LIMIT stable across engines.",
)
def q_bigram_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = F.filter(F.split(F.col("text"), r"\s+"), lambda t: t != "")
    t = docs.select(F.col("doc_id"), toks.alias("toks"))
    uni = t.select(F.explode("toks").alias("tok"))
    u = uni.groupBy("tok").agg(F.count("*").alias("c"))
    bigrams = F.when(
        F.size("toks") >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size("toks") - 1),
            lambda i: F.concat(
                F.element_at("toks", i), F.lit(" "), F.element_at("toks", i + 1)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    bi = t.select(F.explode(bigrams).alias("bigram"))
    b_all = bi.groupBy("bigram").agg(F.count("*").alias("c_xy"))
    # n2 counts ALL bigram occurrences — compute it BEFORE min-support
    b = b_all.select(
        F.split_part(F.col("bigram"), F.lit(" "), F.lit(1)).alias("w1"),
        F.split_part(F.col("bigram"), F.lit(" "), F.lit(2)).alias("w2"),
        "c_xy",
    ).filter(F.col("c_xy") >= 10)
    n1 = u.agg(F.sum("c").alias("n1"))
    n2 = b_all.agg(F.sum("c_xy").alias("n2"))
    u1 = u.select(F.col("tok").alias("u1_tok"), F.col("c").alias("c_x"))
    u2 = u.select(F.col("tok").alias("u2_tok"), F.col("c").alias("c_y"))
    pmi = F.round(
        F.log(
            (F.col("c_xy").cast("double") / F.col("n2"))
            / (
                (F.col("c_x").cast("double") / F.col("n1"))
                * (F.col("c_y").cast("double") / F.col("n1"))
            )
        ),
        6,
    ) + F.lit(0.0)  # +0.0 folds IEEE -0.0 (PMI can straddle zero)
    scored = (
        b.join(F.broadcast(u1), F.col("w1") == F.col("u1_tok"))
        .join(F.broadcast(u2), F.col("w2") == F.col("u2_tok"))
        .join(F.broadcast(n1))
        .join(F.broadcast(n2))
        .select("w1", "w2", "c_xy", pmi.alias("pmi"))
    )
    return (
        scored.orderBy(F.col("pmi").desc(), F.col("w1").asc(), F.col("w2").asc())
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Winsorized (percentile-clamped) robust statistics
# ---------------------------------------------------------------------------


@register(
    "winsorized_event_stats",
    oracle="""
    WITH bounds AS (
      SELECT event_type,
             quantile_cont(value, 0.01) AS p01,
             quantile_cont(value, 0.99) AS p99
      FROM events GROUP BY event_type
    ), clamped AS (
      SELECT e.event_type,
             least(greatest(e.value, b.p01), b.p99) AS v
      FROM events e JOIN bounds b ON e.event_type = b.event_type
    )
    SELECT event_type, count(*) AS n_events,
           round(avg(v), 4) AS win_mean,
           round(stddev_samp(v), 4) AS win_std
    FROM clamped GROUP BY event_type
    """,
    doc="Winsorized mean/std per event type: clamp values to the exact "
    "[p01, p99] band, then aggregate — tail-robust statistics for "
    "monitoring pipelines. The percentile pass aggregates per group; "
    "the |groups|-row bounds table broadcasts back onto the fact scan, "
    "so the second pass is map-side clamp + combined aggregation "
    "(Spark percentile ≙ DuckDB quantile_cont, both interpolated).",
)
def q_winsorized_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    bounds = events.groupBy(F.col("event_type").alias("b_type")).agg(
        F.percentile("value", 0.01).alias("p01"),
        F.percentile("value", 0.99).alias("p99"),
    )
    v = F.least(F.greatest(F.col("value"), F.col("p01")), F.col("p99"))
    return (
        events.join(F.broadcast(bounds), F.col("event_type") == F.col("b_type"))
        .select("event_type", v.alias("v"))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.avg("v"), 4).alias("win_mean"),
            F.round(F.stddev_samp("v"), 4).alias("win_std"),
        )
    )


# ---------------------------------------------------------------------------
# Composed curation pipeline: quality filter → exact dedup → near-dup
# removal → per-language corpus report
# ---------------------------------------------------------------------------


def _curation_oracle() -> str:
    from flink_anomaly_spark.plans.extensions import _minhash_oracle

    return rf"""
    WITH keepq AS (
      SELECT doc_id FROM ({_GOPHER_FLAGS_ORACLE})
      WHERE pass_word_count + pass_mean_word_len + pass_symbol_ratio
            + pass_alpha_words + pass_stopwords >= 4
    ), kept AS (
      SELECT d.doc_id, d.text, d.lang FROM documents d
      WHERE d.doc_id IN (SELECT doc_id FROM keepq)
    ), survivors AS (
      SELECT doc_id, text, lang FROM kept
      WHERE doc_id IN (SELECT min(doc_id) FROM kept GROUP BY md5(text))
    ), pairs AS (
      {_minhash_oracle("survivors")}
    ), final AS (
      SELECT doc_id, lang, text FROM survivors
      WHERE doc_id NOT IN (SELECT id2 FROM pairs)
    )
    SELECT lang, count(*) AS n_docs_kept,
           CAST(sum(len({_TOKS})) AS BIGINT) AS n_tokens_kept
    FROM final GROUP BY lang
    """


@register(
    "corpus_curation_pipeline",
    oracle=_curation_oracle(),
    doc="End-to-end pre-training curation pass: Gopher majority-vote "
    "quality filter (>=4 of 5 rules — the synthetic vocabulary can never "
    "satisfy the 2-stopword rule, so the strict 5/5 keep is vacuous) "
    "→ exact dedup (min doc_id per md5) → MinHash-LSH near-dup "
    "removal → per-language kept-document and kept-token report. Each "
    "stage is the already-verified operator (gopher_quality_flags, "
    "exact_dedup, minhash_near_dup_pairs) composed by semi/anti joins "
    "on doc_id — the join keys are ids only, so inter-stage shuffles "
    "carry no text; the final report is one map-side-combined "
    "aggregation.",
)
def q_corpus_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flink_anomaly_spark.operators.dedup import exact_dedup, minhash_near_dup_pairs
    from flink_anomaly_spark.operators.text import gopher_quality_flags as _flags
    from flink_anomaly_spark.plans.extensions import _BANDS, _NUM_PERM

    docs = load_table(spark, sf_dir, "documents")
    flags = _flags(docs, id_col="doc_id", text_col="text")
    vote = (
        F.col("pass_word_count")
        + F.col("pass_mean_word_len")
        + F.col("pass_symbol_ratio")
        + F.col("pass_alpha_words")
        + F.col("pass_stopwords")
    )
    keep_ids = flags.filter(vote >= 4).select("doc_id")
    kept = docs.select("doc_id", "text", "lang").join(keep_ids, "doc_id", "left_semi")
    exact_keep = exact_dedup(kept, content_col="text", id_col="doc_id").select(
        F.col("keep_id").alias("doc_id")
    )
    survivors = kept.join(exact_keep, "doc_id", "left_semi")
    pairs = minhash_near_dup_pairs(
        survivors, id_col="doc_id", text_col="text", k_shingle=3,
        num_perm=_NUM_PERM, bands=_BANDS, jaccard_threshold=0.5,
    )
    losers = pairs.select(F.col("id2").alias("doc_id")).distinct()
    final = survivors.join(losers, "doc_id", "left_anti")
    toks = F.filter(F.split(F.col("text"), r"\s+"), lambda t: t != "")
    return final.groupBy("lang").agg(
        F.count("*").alias("n_docs_kept"),
        F.sum(F.size(toks)).alias("n_tokens_kept"),
    )


@register(
    "tokenizer_fertility_by_lang",
    oracle=rf"""
    WITH t AS (
      SELECT lang,
             len({_TOKS}) AS n_tok,
             len(regexp_extract_all(text, '[a-zA-Z]{{1,4}}|[0-9]{{1,4}}|[^a-zA-Z0-9\s]'))
               AS n_sub,
             length(text) AS n_ch
      FROM documents
    )
    SELECT lang, count(*) AS n_docs,
           CAST(sum(n_tok) AS BIGINT) AS total_tokens,
           CAST(sum(n_sub) AS BIGINT) AS total_subwords,
           round(sum(n_sub) * 1.0 / greatest(sum(n_tok), 1), 4) AS fertility,
           round(sum(n_ch) * 1.0 / greatest(sum(n_tok), 1), 4) AS chars_per_token
    FROM t GROUP BY lang
    """,
    doc="Tokenizer fertility per language (subwords per whitespace "
    "word, BPE-ish 4-char-piece approximation) plus chars/token — the "
    "per-language statistic that converts document budgets into token "
    "budgets when planning a multilingual mixture. Narrow scan + one "
    "|languages|-group map-side-combined aggregation.",
)
def q_tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flink_anomaly_spark.operators.text import bpe_ish_token_count, token_count

    docs = load_table(spark, sf_dir, "documents")
    t = docs.select(
        "lang",
        token_count(F.col("text")).alias("n_tok"),
        bpe_ish_token_count(F.col("text")).alias("n_sub"),
        F.length("text").alias("n_ch"),
    )
    return t.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tok").alias("total_tokens"),
        F.sum("n_sub").alias("total_subwords"),
        F.round(F.sum("n_sub") * 1.0 / F.greatest(F.sum("n_tok"), F.lit(1)), 4).alias(
            "fertility"
        ),
        F.round(F.sum("n_ch") * 1.0 / F.greatest(F.sum("n_tok"), F.lit(1)), 4).alias(
            "chars_per_token"
        ),
    )


@register(
    "temperature_resampled_corpus",
    oracle=rf"""
    WITH per_lang AS (
      SELECT lang, CAST(sum(len({_TOKS})) AS BIGINT) AS n_tokens
      FROM documents GROUP BY lang
    ), shares AS (
      SELECT lang, CAST(n_tokens AS DOUBLE) / sum(n_tokens) OVER () AS p
      FROM per_lang
    ), w AS (
      SELECT lang, p, sqrt(p) / sum(sqrt(p)) OVER () AS tw FROM shares
    ), rates AS (
      SELECT lang,
             CAST(floor(1000000.0 * (tw / p) / max(tw / p) OVER ()) AS BIGINT)
               AS rate_ppm
      FROM w
    )
    SELECT d.doc_id, d.lang
    FROM documents d JOIN rates r ON d.lang = r.lang
    WHERE {_MD5_32.format(x="'mix:' || CAST(d.doc_id AS VARCHAR)")} % 1000000
          < r.rate_ppm
    """,
    doc="Mixture materialization: turn the alpha=0.5 temperature "
    "weights (language_sampling_weights) into an actual resampled "
    "corpus — per-language keep rate ∝ target-weight / current-share, "
    "normalized so the most up-weighted language keeps everything, "
    "applied as a deterministic md5-bucket threshold per doc (no RNG, "
    "reproducible across engines/cluster sizes). The rate table is "
    "|languages| rows broadcast onto a pure filter scan; floor() is "
    "used on BOTH engines (Spark's double->int cast truncates but "
    "DuckDB's rounds).",
)
def q_temperature_resampled_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    toks = F.filter(F.split(F.col("text"), r"\s+"), lambda t: t != "")
    per_lang = docs.groupBy("lang").agg(F.sum(F.size(toks)).alias("n_tokens"))
    w = Window.partitionBy()
    p = F.col("n_tokens").cast("double") / F.sum("n_tokens").over(w)
    tw = F.sqrt(p) / F.sum(F.sqrt(p)).over(w)
    ratio = tw / p
    rates = per_lang.select(
        F.col("lang").alias("r_lang"),
        F.floor(1000000.0 * ratio / F.max(ratio).over(w)).alias("rate_ppm"),
    )
    bucket = md5_int32(F.concat_ws("", F.lit("mix:"), F.col("doc_id"))) % 1000000
    return (
        docs.join(F.broadcast(rates), docs.lang == F.col("r_lang"))
        .filter(bucket < F.col("rate_ppm"))
        .select("doc_id", "lang")
    )


# ---------------------------------------------------------------------------
# Weighted Bernoulli sampling — deterministic, engine-stable
# ---------------------------------------------------------------------------


@register(
    "weighted_doc_sample",
    oracle=f"""
    WITH mx AS (SELECT max(n_chars) AS max_chars FROM documents)
    SELECT doc_id, lang, n_chars
    FROM documents, mx
    WHERE {_MD5_32.format(x="'wsamp:' || CAST(doc_id AS VARCHAR)")}
          < floor(4294967296.0 * n_chars / max_chars)
    """,
    doc="Deterministic weighted Bernoulli sample: keep doc with "
    "probability n_chars/max(n_chars) — longer documents oversampled, "
    "the quality-weighted downsampling pass of a curation pipeline. "
    "The keep decision compares a 32-bit md5 hash of the key against "
    "floor(2^32 * weight): one integer compare per row, identical on "
    "any engine / rerun / partitioning (seeded rand() is neither). The "
    "1-row global max broadcasts; the scan stays narrow (3 columns).",
)
def q_weighted_doc_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    mx = docs.agg(F.max("n_chars").alias("max_chars"))
    u = md5_int32(F.concat(F.lit("wsamp:"), F.col("doc_id").cast("string")))
    thr = F.floor(4294967296.0 * F.col("n_chars") / F.col("max_chars"))
    return (
        docs.join(F.broadcast(mx))
        .filter(u < thr)
        .select("doc_id", "lang", "n_chars")
    )


@register(
    "priority_sample_per_lang",
    oracle=f"""
    WITH p AS (
      SELECT lang, doc_id, n_chars,
             (CAST(n_chars AS DOUBLE) * 4294967296.0)
               / CAST({_MD5_32.format(x="'psamp:' || CAST(doc_id AS VARCHAR)")} + 1 AS DOUBLE) AS q
      FROM documents
    ), r AS (
      SELECT lang, doc_id, n_chars, q,
             row_number() OVER (PARTITION BY lang ORDER BY q DESC, doc_id ASC) AS rn
      FROM p
    ), t AS (
      SELECT lang, coalesce(max(CASE WHEN rn = 21 THEN q END), 0.0) AS tau
      FROM r GROUP BY lang
    )
    SELECT r.lang, r.doc_id, r.n_chars, CAST(r.rn AS BIGINT) AS rn,
           greatest(CAST(r.n_chars AS DOUBLE), t.tau) AS w_est
    FROM r JOIN t USING (lang) WHERE rn <= 20
    """,
    doc="Fixed-size weight-proportional sampling per language via "
    "PRIORITY SAMPLING (Duffield-Lund-Thorup 2007): exactly 20 docs "
    "per lang, long docs proportionally more likely, each kept doc "
    "carrying the unbiased weight estimate max(w, tau) with tau = the "
    "21st priority — the 'k docs per stratum under a token budget' "
    "primitive weighted_doc_sample's Bernoulli pass cannot give. "
    "Priorities are w / hash-uniform computed as ONE IEEE double "
    "division of integer operands (exactly rounded => bit-identical "
    "cross-engine; ln/exp keys would be libm-defined), so the "
    "SELECTION itself is oracle-exact. One stratum-key shuffle; the "
    "rank filter rides Spark 4's WindowGroupLimit per-partition "
    "top-(k+1) pushdown.",
)
def q_priority_sample_per_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flink_anomaly_spark.operators.relational import priority_sample_per_stratum

    docs = load_table(spark, sf_dir, "documents")
    return priority_sample_per_stratum(
        docs, stratum_cols=["lang"], weight_col="n_chars", id_col="doc_id", k=20
    )


# ---------------------------------------------------------------------------
# Quantile (rank) normalization of a per-document score within language
# ---------------------------------------------------------------------------


@register(
    "quality_quantile_normalize",
    oracle="""
    SELECT doc_id, lang,
           percent_rank() OVER (PARTITION BY lang
                                ORDER BY n_chars ASC, doc_id ASC) AS score_pct
    FROM documents
    """,
    doc="Quantile normalization: map each document's raw quality proxy "
    "(n_chars) to its within-language percentile — makes thresholds "
    "comparable across languages with wildly different length "
    "distributions (the cross-lingual filtering problem). percent_rank "
    "over a UNIQUE ordering key (score, doc_id) is (row_number-1)/(n-1) "
    "— an exact integer division, bit-identical on both engines, no "
    "rounding needed. One hash shuffle on lang; per-partition sort; "
    "skew bounded by the largest language (salt via the composite key "
    "if one language dominates a real corpus).",
)
def q_quality_quantile_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(F.col("n_chars").asc(), F.col("doc_id").asc())
    return docs.select(
        "doc_id", "lang", F.percent_rank().over(w).alias("score_pct")
    )


# ---------------------------------------------------------------------------
# Context-window chunking: fixed token windows with stride overlap
# ---------------------------------------------------------------------------

_CHUNK, _STRIDE = 64, 48


@register(
    "doc_token_chunks",
    oracle=f"""
    WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
    sized AS (
      SELECT doc_id, toks, len(toks) AS n,
             CASE WHEN len(toks) <= {_CHUNK} THEN 1
                  ELSE ((len(toks) - {_CHUNK} + {_STRIDE} - 1) // {_STRIDE}) + 1
             END AS n_chunks
      FROM t WHERE len(toks) > 0
    )
    SELECT doc_id, CAST(u.i AS BIGINT) AS chunk_idx,
           least(u.i * {_STRIDE} + {_CHUNK}, n) - u.i * {_STRIDE} AS n_tokens,
           md5(array_to_string(
             toks[u.i * {_STRIDE} + 1 : least(u.i * {_STRIDE} + {_CHUNK}, n)], ' '
           )) AS chunk_md5
    FROM sized, unnest(range(0, n_chunks)) AS u(i)
    """,
    doc=f"Training-window chunking: split each document into "
    f"{_CHUNK}-token windows with stride {_STRIDE} ({_CHUNK - _STRIDE}-"
    "token overlap so no span is cut at a hard boundary) — the "
    "doc→sample explosion step before sequence packing. Entirely "
    "narrow (tokenize → per-row sequence explode → md5), zero shuffle, "
    "zero Python; emitting the chunk md5 instead of the chunk text "
    "keeps the operator's output (and at 100 TB, the downstream "
    "exchange) at 16 bytes per window — downstream joins back to the "
    "text by (doc_id, chunk_idx) only for windows that survive "
    "selection. Chunk count uses integer arithmetic (no float ceil) "
    "on both engines.",
)
def q_doc_token_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = F.filter(F.split(F.col("text"), r"\s+"), lambda t: t != "")
    # zero-token filter on the RAW text (equivalent to size(toks) > 0):
    # a predicate on the computed token array would be pushed below any
    # upstream exchange and force the tokenization into the scan stage
    sized = docs.filter(F.col("text").rlike(r"\S")).select("doc_id", toks.alias("toks"))
    n = F.size("toks")
    n_chunks = F.when(n <= _CHUNK, F.lit(1)).otherwise(
        F.expr(f"((size(toks) - {_CHUNK} + {_STRIDE} - 1) div {_STRIDE}) + 1")
    )
    exploded = sized.select(
        "doc_id",
        "toks",
        n.alias("n"),
        F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_idx"),
    )
    start = F.col("chunk_idx") * _STRIDE
    end = F.least(start + _CHUNK, F.col("n"))
    return exploded.select(
        "doc_id",
        F.col("chunk_idx").cast("bigint").alias("chunk_idx"),
        (end - start).alias("n_tokens"),
        F.md5(F.concat_ws(" ", F.slice("toks", start + 1, end - start))).alias("chunk_md5"),
    )


# ---------------------------------------------------------------------------
# Composed chunk → pack pipeline (windows into fixed training bins)
# ---------------------------------------------------------------------------


@register(
    "chunk_pack_pipeline",
    oracle=f"""
    WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
    sized AS (
      SELECT doc_id, len(toks) AS n,
             CASE WHEN len(toks) <= {_CHUNK} THEN 1
                  ELSE ((len(toks) - {_CHUNK} + {_STRIDE} - 1) // {_STRIDE}) + 1
             END AS n_chunks
      FROM t WHERE len(toks) > 0
    ), chunks AS (
      SELECT doc_id, CAST(u.i AS BIGINT) AS chunk_idx,
             least(u.i * {_STRIDE} + {_CHUNK}, n) - u.i * {_STRIDE} AS n_tokens
      FROM sized, unnest(range(0, n_chunks)) AS u(i)
    ), c AS (
      SELECT doc_id, chunk_idx, n_tokens,
             sum(n_tokens) OVER (ORDER BY doc_id, chunk_idx
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      FROM chunks
    )
    SELECT doc_id, chunk_idx, n_tokens,
           -- CAST: HUGEINT→float64 hazard, see sequence_packing oracle
           CAST((cum - n_tokens) // 2048 AS BIGINT) AS bin_id,
           CAST((cum - n_tokens) % 2048 AS BIGINT) AS bin_offset
    FROM c
    """,
    doc="Composed training-prep tail: stride-64/48 token windows "
    "(doc_token_chunks semantics) packed into 2048-token bins in "
    "(doc_id, chunk_idx) order — window explode feeds the same "
    "DISTRIBUTED exclusive prefix sum as sequence_packing "
    "(range-partition local cumsum + per-partition offsets broadcast "
    "back; never a single-partition global window). Integer-exact, so "
    "the oracle's plain global-window form matches bit-for-bit "
    "whatever the partition boundaries.",
)
def q_chunk_pack_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    toks = F.filter(F.split(F.col("text"), r"\s+"), lambda t: t != "")
    # zero-token filter on the RAW text (equivalent to size(toks) > 0):
    # a predicate on the computed token array would be pushed below any
    # upstream exchange and force the tokenization into the scan stage
    sized = docs.filter(F.col("text").rlike(r"\S")).select("doc_id", toks.alias("toks"))
    n = F.size("toks")
    n_chunks = F.when(n <= _CHUNK, F.lit(1)).otherwise(
        F.expr(f"((size(toks) - {_CHUNK} + {_STRIDE} - 1) div {_STRIDE}) + 1")
    )
    start = F.col("chunk_idx") * _STRIDE
    chunks = sized.select(
        "doc_id",
        n.alias("n"),
        F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_idx"),
    ).select(
        "doc_id",
        F.col("chunk_idx").cast("bigint").alias("chunk_idx"),
        (F.least(start + _CHUNK, F.col("n")) - start).alias("n_tokens"),
    )
    d = chunks.repartitionByRange(32, "doc_id", "chunk_idx").withColumn(
        "__pid", F.spark_partition_id()
    )
    w_local = (
        Window.partitionBy("__pid")
        .orderBy("doc_id", "chunk_idx")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    d = d.withColumn("__local_cum", F.sum("n_tokens").over(w_local))
    w_parts = Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = (
        d.groupBy("__pid")
        .agg(F.sum("n_tokens").alias("__part_total"))
        .withColumn(
            "__part_offset",
            F.coalesce(F.sum("__part_total").over(w_parts), F.lit(0)),
        )
        .select("__pid", "__part_offset")
    )
    startpos = F.col("__local_cum") + F.col("__part_offset") - F.col("n_tokens")
    return (
        d.join(F.broadcast(offsets), "__pid")
        .select(
            "doc_id",
            "chunk_idx",
            "n_tokens",
            F.floor(startpos / 2048).cast("bigint").alias("bin_id"),
            (startpos % 2048).cast("bigint").alias("bin_offset"),
        )
    )


#: synthetic-PII injection, shared between the Spark query and the SQL
#: oracle: the word-soup documents carry no PII, so deterministic
#: emails / phone numbers / IPs are appended by doc_id rule — the
#: operator then has real matches to find and the oracle recomputes
#: them from the same construction.
_PII_TEXT_SQL = (
    "text"
    " || CASE WHEN doc_id % 3 = 0 THEN ' contact user' || CAST(doc_id AS VARCHAR)"
    " || '@example.com' ELSE '' END"
    " || CASE WHEN doc_id % 5 = 0 THEN ' call 555-'"
    " || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ELSE '' END"
    " || CASE WHEN doc_id % 7 = 0 THEN ' from 10.0.' || CAST(doc_id % 256 AS VARCHAR)"
    " || '.' || CAST(doc_id % 100 AS VARCHAR) ELSE '' END"
)


def _pii_text_spark():
    did = F.col("doc_id")
    return F.concat(
        F.col("text"),
        F.when(
            did % 3 == 0,
            F.concat(F.lit(" contact user"), did.cast("string"), F.lit("@example.com")),
        ).otherwise(F.lit("")),
        F.when(
            did % 5 == 0,
            F.concat(F.lit(" call 555-"), F.lpad((did % 10000).cast("string"), 4, "0")),
        ).otherwise(F.lit("")),
        F.when(
            did % 7 == 0,
            F.concat(
                F.lit(" from 10.0."),
                (did % 256).cast("string"),
                F.lit("."),
                (did % 100).cast("string"),
            ),
        ).otherwise(F.lit("")),
    )


def _pii_oracle() -> str:
    from flink_anomaly_spark.operators.text import PII_PATTERNS

    counts = ", ".join(
        f"CAST(len(regexp_extract_all(t, '{pat}')) AS BIGINT) AS n_{name}"
        for name, pat, _ in PII_PATTERNS
    )
    red = "t"
    for _, pat, rep in PII_PATTERNS:
        red = f"regexp_replace({red}, '{pat}', '{rep}', 'g')"
    return f"""
    WITH p AS (SELECT doc_id, {_PII_TEXT_SQL} AS t FROM documents)
    SELECT doc_id, {counts}, md5({red}) AS redacted_md5
    FROM p
    """


@register(
    "pii_redaction_stats",
    oracle=_pii_oracle(),
    doc="PII scrub pass (the C4/Dolma/FineWeb-style regex family): "
    "per-document email/phone/IP match counts plus the md5 of the "
    "fully redacted text — hashing the redacted output means the "
    "oracle verifies the REDACTION ITSELF byte-for-byte, not just the "
    "counts. Patterns live in the Java-regex ∩ RE2 subset so Spark "
    "and DuckDB match identically. Pure codegen regexp map over the "
    "scan: zero shuffle, zero Python at any scale.",
)
def q_pii_redaction_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flink_anomaly_spark.operators.text import redact_pii

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", _pii_text_spark().alias("pii_text")
    )
    out = redact_pii(docs, "doc_id", "pii_text")
    return out.select(
        "doc_id",
        "n_email",
        "n_phone",
        "n_ip",
        F.md5("redacted_text").alias("redacted_md5"),
    )


@register(
    "dsir_importance_weights",
    oracle=rf"""
    WITH t AS (
      SELECT doc_id, lang = 'en' AS is_t, unnest({_TOKS}) AS tk FROM documents
    ), g AS (
      SELECT doc_id, is_t, tk, count(*) AS c FROM t GROUP BY doc_id, is_t, tk
    ), vs AS (
      SELECT tk, sum(c) AS cs FROM g GROUP BY tk
    ), vt AS (
      SELECT tk, sum(c) AS ct FROM g WHERE is_t GROUP BY tk
    ), v AS (
      SELECT vs.tk, vs.cs, coalesce(vt.ct, 0) AS ct
      FROM vs LEFT JOIN vt USING (tk)
    ), tot AS (
      SELECT sum(cs) AS Ts, sum(ct) AS Tt, count(*) AS V FROM v
    ), w AS (
      SELECT tk,
             log2((ct + 1) / CAST(Tt + V AS DOUBLE))
             - log2((cs + 1) / CAST(Ts + V AS DOUBLE)) AS w
      FROM v CROSS JOIN tot
    )
    SELECT g.doc_id, CAST(sum(g.c) AS BIGINT) AS n_tok,
           round(sum(g.c * w.w) / CAST(sum(g.c) AS DOUBLE), 4) + 0.0 AS dsir_logratio
    FROM g JOIN w USING (tk) GROUP BY g.doc_id
    """,
    doc="DSIR importance weights (Xie et al. 2023), unigram flavor: "
    "mean per-token log2-likelihood ratio of the TARGET distribution "
    "(lang='en' docs, standing in for a high-quality seed corpus) over "
    "the SOURCE (whole corpus), add-one smoothed over the source "
    "vocab. High ratio = 'looks like the target' = keep under "
    "importance resampling. Same shuffle floor as "
    "unigram_logprob_quality: one (doc, token) pair shuffle, "
    "vocabulary-sized join tables, 1-row broadcast totals.",
)
def q_dsir_importance_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flink_anomaly_spark.operators.text import dsir_importance_weights

    docs = load_table(spark, sf_dir, "documents")
    return dsir_importance_weights(
        docs, "doc_id", "text", is_target=F.col("lang") == "en"
    )


# ---------------------------------------------------------------------------
# Winnowing fingerprints (rolling-hash k-grams) + BM25 retrieval
# ---------------------------------------------------------------------------

_WINNOW_K = 8
_WINNOW_W = 4


def _winnow_fp_sql() -> str:
    """DuckDB CTE chain producing ``(doc_id, n_grams, fp)`` — the exact
    oracle of :func:`operators.text.winnow_fingerprints` (k=8, w=4).
    The gram hash is the SAME generated Horner chain the Spark side
    compiles (plans/fragments.gram_hash_horner) — shared, cannot drift.
    """
    from flink_anomaly_spark.plans.fragments import gram_hash_horner

    k, w = _WINNOW_K, _WINNOW_W
    horner = gram_hash_horner("clean", "i", k)
    return f"""
    c AS (
      SELECT doc_id, regexp_replace(lower(text), '[^a-z0-9]', '', 'g') AS clean
      FROM documents
    ), g AS (
      SELECT doc_id, CAST(length(clean) - {k - 1} AS BIGINT) AS n_grams,
             list_transform(range(1, length(clean) - {k - 2}), i -> {horner}) AS hs
      FROM c WHERE length(clean) >= {k}
    ), sel AS (
      SELECT doc_id, n_grams,
             CASE WHEN len(hs) >= {w}
                  THEN list_transform(range(1, len(hs) - {w - 2}),
                                      s -> list_min(list_slice(hs, s, s + {w - 1})))
                  ELSE [list_min(hs)] END AS sels
      FROM g
    ), fp AS (
      SELECT doc_id, n_grams, unnest(list_distinct(sels)) AS fp FROM sel
    )
    """


@register(
    "winnowing_fingerprint_stats",
    oracle=f"""
    WITH {_winnow_fp_sql()}
    SELECT doc_id, n_grams, CAST(count(*) AS BIGINT) AS n_fp,
           min(fp) AS fp_min, max(fp) AS fp_max
    FROM fp GROUP BY doc_id, n_grams
    """,
    doc="Winnowing document fingerprints (Schleimer/Wilkerson/Aiken "
    "SIGMOD'03, the MOSS plagiarism-detection selection rule): "
    "normalized char 8-grams → polynomial rolling hash (Horner chain "
    "generated SQL, shared verbatim with the oracle) → min per "
    "4-window → distinct selected hashes. Per-doc fingerprint stats; "
    "density ≈ 2/(w+1) of grams. All array math inside whole-stage "
    "codegen — no UDF, no shuffle before the final 1-key agg.",
)
def q_winnowing_fingerprint_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flink_anomaly_spark.operators.text import winnow_fingerprints

    docs = load_table(spark, sf_dir, "documents")
    fps = winnow_fingerprints(docs, k=_WINNOW_K, w=_WINNOW_W)
    return fps.groupBy("doc_id", "n_grams").agg(
        F.count("*").cast("bigint").alias("n_fp"),
        F.min("fp").alias("fp_min"),
        F.max("fp").alias("fp_max"),
    )


_WINNOW_MAX_POSTINGS = 20
_WINNOW_MIN_SHARED = 8


@register(
    "winnowing_dup_pairs",
    oracle=f"""
    WITH {_winnow_fp_sql()},
    sizes AS (SELECT doc_id, count(*) AS n_fp FROM fp GROUP BY doc_id),
    kept AS (
      SELECT doc_id, fp FROM (
        SELECT doc_id, fp, count(*) OVER (PARTITION BY fp) AS post FROM fp
      ) WHERE post <= {_WINNOW_MAX_POSTINGS}
    ),
    pairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             CAST(count(*) AS BIGINT) AS n_shared
      FROM kept a JOIN kept b ON a.fp = b.fp AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
      HAVING count(*) >= {_WINNOW_MIN_SHARED}
    )
    SELECT doc_a, doc_b, n_shared,
           round(n_shared / CAST(least(sa.n_fp, sb.n_fp) AS DOUBLE), 4) AS overlap
    FROM pairs
    JOIN sizes sa ON sa.doc_id = doc_a
    JOIN sizes sb ON sb.doc_id = doc_b
    """,
    doc="Near-duplicate candidate pairs via shared winnowing "
    "fingerprints — a POSTINGS-LIST join bucketed on the fingerprint "
    "value (docs meet only inside a fingerprint's posting list, never "
    "all-pairs). Fingerprints in more than 20 docs are dropped first: "
    "the stop-fingerprint skew guard, same pattern as the MinHash LSH "
    "max_bucket_size cap. Winnowing guarantees any shared substring of "
    "length k+w-1 = 11 normalized chars still yields a shared "
    "fingerprint.",
)
def q_winnowing_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flink_anomaly_spark.operators.text import winnowing_dup_pairs

    docs = load_table(spark, sf_dir, "documents")
    return winnowing_dup_pairs(
        docs,
        k=_WINNOW_K,
        w=_WINNOW_W,
        max_postings=_WINNOW_MAX_POSTINGS,
        min_shared=_WINNOW_MIN_SHARED,
    )


_BM25_TERMS = ["hash", "join", "vector"]
_BM25_K1 = 1.2
_BM25_B = 0.75


def _bm25_scored_cte(terms: list[str], k1: float, b: float) -> str:
    """CTE chain ending in ``scored(id, dl, score)`` — shared by the
    bm25_topk oracle and the RRF fusion oracle so the two can't
    drift apart."""
    return f"""
    WITH d AS (
      SELECT doc_id AS id, {_TOKS} AS toks FROM documents
    ), base AS (
      SELECT id, len(toks) AS dl,
             list_filter(toks, t -> list_contains(
               [{",".join(f"'{t}'" for t in terms)}], t)) AS qtoks
      FROM d
    ), corpus AS (
      SELECT count(*) AS N, avg(dl) AS avgdl FROM base
    ), tfc AS (
      SELECT id, dl, term, count(*) AS tf FROM (
        SELECT id, dl, unnest(qtoks) AS term FROM base
      ) GROUP BY id, dl, term
    ), dfreq AS (
      SELECT term, count(*) AS df FROM tfc GROUP BY term
    ), scored AS (
      SELECT id, dl,
             round(sum(
               ln(1 + (N - df + 0.5) / (df + 0.5))
               * (tf * ({k1} + 1)
                  / (tf + {k1} * (1 - {b} + {b} * dl / avgdl)))
             ), 6) AS score
      FROM tfc JOIN dfreq USING (term), corpus
      GROUP BY id, dl
    )"""


@register(
    "bm25_topk",
    oracle=f"""
    {_bm25_scored_cte(_BM25_TERMS, _BM25_K1, _BM25_B)}
    SELECT id AS doc_id, CAST(dl AS BIGINT) AS doc_len, score,
           CAST(rank AS BIGINT) AS rank
    FROM (
      SELECT *, row_number() OVER (ORDER BY score DESC, id ASC) AS rank
      FROM scored
    ) t WHERE rank <= 10
    """,
    doc="Okapi BM25 top-10 ranked retrieval for a fixed query bag "
    "(Robertson/Walker public formula; k1=1.2, b=0.75). The query-term "
    "filter is applied BEFORE any shuffle so only query-term postings "
    "leave the scan; df and (N, avgdl) are broadcast back; only docs "
    "containing ≥1 query term reach the final top-k rank. ln() rounded "
    "to 6 pre-rank so libm ulp differences can't flip the hash or the "
    "ordering.",
)
def q_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flink_anomaly_spark.operators.text import bm25_topk

    docs = load_table(spark, sf_dir, "documents")
    return bm25_topk(docs, _BM25_TERMS, k1=_BM25_K1, b=_BM25_B, top_n=10)


# ---------------------------------------------------------------------------
# BPE merge training (fixed 3 merges, unrolled oracle)
# ---------------------------------------------------------------------------

_BPE_MERGES = 3

#: DuckDB leftmost-greedy merge fold — same CASE body as the Spark
#: side's _bpe_merge_fold_sql, with the step's best pair (ml, mr)
#: cross-joined in rather than inlined as literals
_BPE_FOLD = """list_reduce(string_split(sym, '|'), (acc, y) -> CASE
      WHEN acc = ml AND y = mr THEN ml || mr
      WHEN length(acc) > length(ml)
           AND substr(acc, length(acc) - length(ml), 1) = '|'
           AND substr(acc, length(acc) - length(ml) + 1, length(ml)) = ml
           AND y = mr
        THEN substr(acc, 1, length(acc) - length(ml)) || ml || mr
      ELSE acc || '|' || y END)"""


def _bpe_steps_sql(n_merges: int = _BPE_MERGES) -> str:
    """Shared WITH-chain: vocabulary → char symbols → n unrolled
    (pair-count, argmax, merge-fold) steps. Both BPE queries build on
    w{n_merges} so training and application cannot drift."""
    steps = []
    for t in range(1, n_merges + 1):
        steps.append(f"""
    p{t} AS (
      SELECT lhs, rhs, CAST(sum(cnt) AS BIGINT) AS n FROM (
        SELECT cnt, segs[i] AS lhs, segs[i+1] AS rhs FROM (
          SELECT cnt, segs, unnest(range(1, len(segs))) AS i
          FROM (SELECT cnt, string_split(sym, '|') AS segs FROM w{t - 1})
        )
      ) GROUP BY lhs, rhs
    ), b{t} AS (
      SELECT lhs AS ml, rhs AS mr, n FROM p{t} ORDER BY n DESC, lhs, rhs LIMIT 1
    ), w{t} AS (
      SELECT w, cnt, {_BPE_FOLD} AS sym FROM w{t - 1} CROSS JOIN b{t}
    )""")
    return f"""
    WITH v0 AS (
      SELECT w, CAST(count(*) AS BIGINT) AS cnt
      FROM (SELECT unnest({_TOKS}) AS w FROM documents) GROUP BY w
    ), w0 AS (
      SELECT w, cnt,
             array_to_string(list_transform(range(1, length(w)+1),
                                            i -> substr(w, i, 1)), '|') AS sym
      FROM v0
    ),{",".join(steps)}"""


def _bpe_oracle(n_merges: int = _BPE_MERGES) -> str:
    unions = "\n      ".join(
        f"UNION ALL SELECT {t}, ml, mr, n FROM b{t}" for t in range(2, n_merges + 1)
    )
    return f"""
    {_bpe_steps_sql(n_merges)},
    merges AS (
      SELECT 1 AS step, ml AS lhs, mr AS rhs, n FROM b1
      {unions}
      UNION ALL SELECT {n_merges + 1}, '<TOTAL>', '<SYMBOLS>',
        CAST(sum(cnt * len(string_split(sym, '|'))) AS BIGINT) FROM w{n_merges}
    )
    SELECT CAST(step AS BIGINT) AS step, lhs, rhs, n FROM merges
    """


@register(
    "bpe_learn_merges",
    oracle=_bpe_oracle(),
    doc="BPE merge training (Sennrich et al. 2016), unrolled to 3 fixed "
    "steps — fixed-iteration pattern like kmeans_lloyd/pagerank so the "
    "learned merges are deterministic and oracle-exact. Corpus "
    "collapses to its vocabulary (distinct word, count) before any "
    "per-char work; each step = weighted adjacent-pair count → top-1 "
    "TakeOrdered (ties lexicographic) → leftmost-greedy merge fold "
    "over the '|'-delimited symbol string (list_reduce / aggregate "
    "share the same CASE body). Output: one row per learned merge + a "
    "<TOTAL> symbols summary row proving the merged state.",
)
def q_bpe_learn_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flink_anomaly_spark.operators.text import bpe_learn_merges

    docs = load_table(spark, sf_dir, "documents")
    return bpe_learn_merges(docs, n_merges=_BPE_MERGES)


_BPE_BATCH_PASSES = 2  # 2 passes x batch_k=2 = 4 merges


def _bpe_batched_oracle(n_passes: int = _BPE_BATCH_PASSES) -> str:
    """DuckDB mirror of the batched trainer (batch_k = 2): per pass,
    rank all pairs once; ``a{t}`` is rank 1, ``b{t}`` is the best pair
    symbol-disjoint from a's (lhs, rhs, lhs||rhs); both fold
    sequentially into w{t}. Selection sees the FULL ranking (the Spark
    side's oversample=64 horizon is far past any real 2nd-disjoint
    rank). Both folds join LEFT ... ON true (round-7 ADVICE): an empty
    a{t}/b{t} (no pairs left / no symbol-disjoint 2nd pair) yields NULL
    ml/mr, every merge arm of the fold CASE is NULL-false, and the ELSE
    identity arm reconstructs sym unchanged — 'apply what was chosen',
    exactly the Spark trainer's semantics, instead of emptying the
    vocabulary through a CROSS JOIN with an empty relation."""
    steps = []
    for t in range(1, n_passes + 1):
        steps.append(f"""
    p{t} AS (
      SELECT lhs, rhs, CAST(sum(cnt) AS BIGINT) AS n FROM (
        SELECT cnt, segs[i] AS lhs, segs[i+1] AS rhs FROM (
          SELECT cnt, segs, unnest(range(1, len(segs))) AS i
          FROM (SELECT cnt, string_split(sym, '|') AS segs FROM w{t - 1})
        )
      ) GROUP BY lhs, rhs
    ), r{t} AS (
      SELECT lhs, rhs, n,
             row_number() OVER (ORDER BY n DESC, lhs, rhs) AS rk
      FROM p{t}
    ), a{t} AS (
      SELECT lhs AS ml, rhs AS mr, n FROM r{t} WHERE rk = 1
    ), b{t} AS (
      SELECT r.lhs AS ml, r.rhs AS mr, r.n
      FROM r{t} r, a{t} a
      WHERE r.lhs NOT IN (a.ml, a.mr, a.ml || a.mr)
        AND r.rhs NOT IN (a.ml, a.mr, a.ml || a.mr)
      ORDER BY r.rk LIMIT 1
    ), wa{t} AS (
      SELECT w, cnt, {_BPE_FOLD} AS sym FROM w{t - 1} LEFT JOIN a{t} ON true
    ), w{t} AS (
      SELECT w, cnt, {_BPE_FOLD} AS sym FROM wa{t} LEFT JOIN b{t} ON true
    )""")
    scaffold = _bpe_steps_sql(0).rstrip().rstrip(",")
    unions = "\n      ".join(
        f"UNION ALL SELECT {2 * t - 1}, {t}, ml, mr, n FROM a{t} "
        f"UNION ALL SELECT {2 * t}, {t}, ml, mr, n FROM b{t}"
        for t in range(1, n_passes + 1)
    )
    return f"""
    {scaffold},{",".join(steps)},
    merges AS (
      SELECT 0 AS step, 0 AS pass, '' AS lhs, '' AS rhs,
             CAST(0 AS BIGINT) AS n WHERE false
      {unions}
      UNION ALL SELECT {2 * n_passes + 1}, {n_passes}, '<TOTAL>', '<SYMBOLS>',
        CAST(sum(cnt * len(string_split(sym, '|'))) AS BIGINT) FROM w{n_passes}
    )
    SELECT CAST(step AS BIGINT) AS step, CAST(pass AS BIGINT) AS pass,
           lhs, rhs, n
    FROM merges
    """


@register(
    "bpe_learn_merges_batched",
    oracle=_bpe_batched_oracle(),
    doc="Batched BPE training — the production path for real (32k) "
    "vocabularies: per pass, ONE pair count feeds up to batch_k=2 "
    "mutually symbol-disjoint merges (disjointness makes same-pass "
    "counts exactly invariant under each other's rewrites), so driver "
    "round-trips are ~n_merges/batch_k instead of n_merges. 2 passes "
    "x 2 merges here; folds apply sequentially within the pass and "
    "the oracle unrolls the identical greedy selection relationally.",
)
def q_bpe_learn_merges_batched(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flink_anomaly_spark.operators.text import bpe_learn_merges_batched

    docs = load_table(spark, sf_dir, "documents")
    return bpe_learn_merges_batched(
        docs, n_merges=2 * _BPE_BATCH_PASSES, batch_k=2
    )


@register(
    "bpe_fertility_by_lang",
    oracle=f"""
    {_bpe_steps_sql()},
    occ AS (
      SELECT lang, unnest({_TOKS}) AS w FROM documents
    ), j AS (
      SELECT occ.lang, len(string_split(w{_BPE_MERGES}.sym, '|')) AS ns
      FROM occ JOIN w{_BPE_MERGES} USING (w)
    )
    SELECT lang,
           CAST(count(*) AS BIGINT) AS total_words,
           CAST(sum(ns) AS BIGINT) AS total_subwords,
           round(CAST(sum(ns) AS DOUBLE) / count(*), 4) AS fertility
    FROM j GROUP BY lang
    """,
    doc="Trained-BPE fertility per language: train the 3 fixed merges "
    "(same trainer and unrolled-oracle CTE chain as bpe_learn_merges — "
    "the two cannot drift) and APPLY them to the corpus word stream. "
    "The per-word subword count is vocab-sized and BROADCAST into the "
    "exploded corpus (corpus rows never shuffle for the join); final "
    "agg is a |languages|-group map-side combine. The trained "
    "counterpart of tokenizer_fertility_by_lang's regex approximation.",
)
def q_bpe_fertility_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flink_anomaly_spark.operators.text import bpe_fertility_by_lang

    docs = load_table(spark, sf_dir, "documents")
    return bpe_fertility_by_lang(docs, n_merges=_BPE_MERGES)


# ---------------------------------------------------------------------------
# Hybrid retrieval: reciprocal-rank fusion (BM25 + dense cosine)
# ---------------------------------------------------------------------------

_RRF_QID = 7
_RRF_K_EACH = 20
_RRF_K = 60


def _rrf_oracle() -> str:
    dot = (
        "list_reduce(list_prepend(CAST(0.0 AS DOUBLE),"
        " list_transform(range(1, len(qvec)+1),"
        " i -> CAST(qvec[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE))),"
        " (a,b) -> a+b)"
    )
    nq = (
        "sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),"
        " list_transform(range(1, len(qvec)+1),"
        " i -> CAST(qvec[i] AS DOUBLE) * CAST(qvec[i] AS DOUBLE))),"
        " (a,b) -> a+b))"
    )
    nn = (
        "sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),"
        " list_transform(range(1, len(embedding)+1),"
        " i -> CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE))),"
        " (a,b) -> a+b))"
    )
    return f"""
    {_bm25_scored_cte(_BM25_TERMS, _BM25_K1, _BM25_B)},
    lexall AS (
      SELECT id AS doc_id,
             row_number() OVER (ORDER BY score DESC, id ASC) AS r
      FROM scored),
    lex AS (SELECT doc_id, CAST(r AS BIGINT) AS lex_rank
            FROM lexall WHERE r <= {_RRF_K_EACH}),
    q AS (SELECT embedding AS qvec FROM embeddings WHERE vec_id = {_RRF_QID}),
    dsc AS (
      SELECT vec_id AS doc_id, round({dot} / ({nq} * {nn}), 6) AS cos_sim
      FROM embeddings, q WHERE vec_id != {_RRF_QID}),
    dall AS (
      SELECT doc_id,
             row_number() OVER (ORDER BY cos_sim DESC, doc_id ASC) AS r
      FROM dsc),
    dense AS (SELECT doc_id, CAST(r AS BIGINT) AS dense_rank
              FROM dall WHERE r <= {_RRF_K_EACH}),
    fused AS (
      SELECT coalesce(l.doc_id, dn.doc_id) AS doc_id,
             l.lex_rank, dn.dense_rank,
             round(coalesce(1.0 / ({_RRF_K} + l.lex_rank), 0.0)
                 + coalesce(1.0 / ({_RRF_K} + dn.dense_rank), 0.0), 6)
               AS rrf_score
      FROM lex l FULL JOIN dense dn ON l.doc_id = dn.doc_id)
    SELECT doc_id, lex_rank, dense_rank, rrf_score,
           CAST(fr AS BIGINT) AS fused_rank
    FROM (SELECT *, row_number()
            OVER (ORDER BY rrf_score DESC, doc_id ASC) AS fr
          FROM fused) t
    WHERE fr <= 10
    """


@register(
    "rrf_hybrid_retrieval",
    oracle=_rrf_oracle(),
    doc="Reciprocal-rank fusion (Cormack et al. 2009) of BM25 lexical "
    "top-20 and exact-cosine dense top-20 over the aligned "
    "documents/embeddings corpora — the sparse+dense hybrid retrieval "
    "layer of a RAG pipeline. Each retriever is independently "
    "distribution-right (query-term prefilter + broadcast stats; "
    "broadcast query vector) and ends in TakeOrdered, so the fusion "
    "full-outer-joins two <=20-row frames — free at any corpus size. "
    "Rank fusion needs no score calibration; rrf_score rounds to 6 "
    "BEFORE the fused rank so double ulp can't reorder ties.",
)
def q_rrf_hybrid_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flink_anomaly_spark.operators.similarity import hybrid_rrf_retrieval

    return hybrid_rrf_retrieval(
        load_table(spark, sf_dir, "documents"),
        load_table(spark, sf_dir, "embeddings"),
        _BM25_TERMS,
        query_vec_id=_RRF_QID,
        k_each=_RRF_K_EACH,
        k_rrf=_RRF_K,
        top_n=10,
    )


@register(
    "normalized_exact_dedup",
    oracle="""
    WITH n AS (
      SELECT doc_id,
             CASE WHEN length(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))) > 0
                  THEN md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')))
             END AS norm_hash
      FROM documents)
    SELECT doc_id, norm_hash,
           norm_hash IS NULL AS is_empty,
           CAST(count(*) OVER (PARTITION BY coalesce(norm_hash, CAST(doc_id AS VARCHAR))) AS BIGINT) AS group_size,
           doc_id = min(doc_id) OVER (PARTITION BY coalesce(norm_hash, CAST(doc_id AS VARCHAR))) AS is_canonical
    FROM n
    """,
    doc="Fuzzy-exact dedup (C4/Gopher normalize-then-hash): lowercase "
    "+ collapse non-alphanumerics + trim, md5 the canonical form, "
    "window stats per hash with min-id survivor. Normalization is "
    "zero-UDF codegen; the one shuffle carries (id, 32-char hash) "
    "only; duplicate groups are tiny, so no skew at 100 TB. Catches "
    "reformatted copies byte-exact dedup misses, upstream of MinHash. "
    "Empty-after-normalization docs are flagged is_empty with NULL "
    "hash and singleton groups (per-id window key — no giant NULL "
    "partition), not reported as duplicates of each other.",
)
def q_normalized_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flink_anomaly_spark.operators.dedup import normalized_exact_dedup

    return normalized_exact_dedup(
        load_table(spark, sf_dir, "documents"), content_col="text", id_col="doc_id"
    )


# ---------------------------------------------------------------------------
# Round 9: global fixed-size weighted sample (priority sampling, corpus-wide)
# ---------------------------------------------------------------------------


@register(
    "weighted_sample_global",
    oracle=f"""
    WITH p AS (
      SELECT doc_id, n_chars,
             (CAST(n_chars AS DOUBLE) * 4294967296.0)
               / CAST({_MD5_32.format(x="'psampg:' || CAST(doc_id AS VARCHAR)")} + 1 AS DOUBLE) AS q
      FROM documents
    ), r AS (
      SELECT doc_id, n_chars, q,
             row_number() OVER (ORDER BY q DESC, doc_id ASC) AS rn
      FROM p
    ), t AS (
      SELECT coalesce(max(CASE WHEN rn = 51 THEN q END), 0.0) AS tau FROM r
    )
    SELECT r.doc_id, r.n_chars, CAST(r.rn AS BIGINT) AS rn,
           greatest(CAST(r.n_chars AS DOUBLE), t.tau) AS w_est
    FROM r, t WHERE rn <= 50
    """,
    doc="CORPUS-level fixed-size weight-proportional sample — global "
    "priority sampling (Duffield-Lund-Thorup 2007): the 50 highest "
    "w/hash-uniform priorities across ALL documents, each carrying the "
    "unbiased estimate max(w, tau) with tau the global 51st priority. "
    "Completes the sampling matrix: Bernoulli (weighted_doc_sample) / "
    "per-stratum fixed-size (priority_sample_per_lang) / global "
    "fixed-size (here). A-ES exponential keys are deliberately not "
    "used (libm-defined); the w*2^32/(h+1) priority is one exactly-"
    "rounded IEEE division, so SELECTION is oracle-exact. Scale: "
    "orderBy().limit(k+1) = TakeOrderedAndProject — partitions forward "
    "only their top-(k+1); no global sort, no corpus shuffle; the "
    "rank/tau window runs over exactly k+1 rows.",
)
def q_weighted_sample_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flink_anomaly_spark.operators.relational import weighted_sample_global

    docs = load_table(spark, sf_dir, "documents")
    return weighted_sample_global(
        docs, weight_col="n_chars", id_col="doc_id", k=50
    )


# ---------------------------------------------------------------------------
# Round 9: unigram-LM-style tokenizer vocabulary (iterative prune)
# ---------------------------------------------------------------------------


def _unigram_oracle() -> str:
    from flink_anomaly_spark.operators.text import unigram_lm_oracle_sql

    return unigram_lm_oracle_sql("documents")


@register(
    "unigram_lm_vocab",
    oracle=_unigram_oracle(),
    doc="Unigram-LM-style tokenizer vocabulary trainer (the "
    "SentencePiece iterative-prune family, Kudo 2018 — the second "
    "tokenizer trainer next to BPE): seed = top-48 weighted substrings "
    "(len 2-4) + all single chars; 3 EM iterations, each segmenting "
    "the DISTINCT-WORD vocabulary by greedy longest-match (the "
    "WordPiece inference rule — deterministic where Viterbi's float "
    "log-probs are not) and pruning the 8 lowest-(usage, piece) "
    "multi-char pieces; chars never pruned (full coverage). The "
    "oracle unrolls the exact 3 iterations (one recursive greedy-walk "
    "CTE per pass). Corpus collapses to distinct words before any "
    "per-char work; per-iteration driver traffic is one <=100-row "
    "collect; job count O(iters), independent of corpus and vocab "
    "size.",
)
def q_unigram_lm_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flink_anomaly_spark.operators.text import unigram_lm_vocab

    docs = load_table(spark, sf_dir, "documents")
    return unigram_lm_vocab(docs, text_col="text")
