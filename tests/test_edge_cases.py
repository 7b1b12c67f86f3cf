"""Edge-case robustness: empty/whitespace/unicode text through the
text/dedup operators, and Spark↔DuckDB agreement on those inputs (the
oracle contract must hold on adversarial strings, not just the
synthetic corpus)."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from flink_anomaly_spark.operators.dedup import md5_int32, md5_long, shingles
from flink_anomaly_spark.operators.text import text_profile

EDGE_TEXTS = [
    (0, ""),
    (1, "   "),
    (2, "one"),
    (3, "exactly two"),
    (4, "tab\tand\nnewline separated tokens here"),
    (5, "ünïcödé wörds ünïcödé wörds again"),
    (6, "a a a a a a a a"),
    (7, "punctuation! only?? marks... %%% $$$"),
]


def test_text_profile_survives_edge_cases(spark):
    df = spark.createDataFrame(EDGE_TEXTS, "doc_id long, text string")
    rows = {r.doc_id: r for r in text_profile(df, "doc_id", "text").collect()}
    assert rows[0].n_tokens == 0 and rows[0].fingerprint == 0
    assert rows[1].n_tokens == 0
    assert rows[2].n_tokens == 1
    assert rows[4].n_tokens == 6  # tab/newline are \s
    assert all(0.0 <= r.quality <= 1.0 for r in rows.values())


def test_md5_hashes_agree_with_duckdb_on_unicode(spark):
    """md5-derived hashing must match DuckDB byte-for-byte on unicode
    (both hash UTF-8 bytes)."""
    df = spark.createDataFrame(EDGE_TEXTS, "doc_id long, text string")
    got = {
        r.doc_id: (r.h32, r.h60)
        for r in df.select(
            "doc_id",
            md5_int32(F.col("text")).alias("h32"),
            md5_long(F.col("text")).alias("h60"),
        ).collect()
    }
    con = duckdb.connect()
    for doc_id, text in EDGE_TEXTS:
        h32, h60 = con.execute(
            "SELECT CAST(('0x' || substr(md5(?),1,8)) AS BIGINT),"
            "       CAST(('0x' || substr(md5(?),1,15)) AS BIGINT)",
            [text, text],
        ).fetchone()
        assert got[doc_id] == (h32, h60), f"md5 mismatch on {text!r}"


def test_shingles_edge_cases(spark):
    df = spark.createDataFrame(EDGE_TEXTS, "doc_id long, text string")
    got = {r.doc_id: r.sh for r in df.select("doc_id", shingles(F.col("text"), 3).alias("sh")).collect()}
    assert got[0] == [""]  # empty text → single empty shingle
    assert got[1] == [""]  # whitespace-only → same
    assert got[2] == ["one"]
    assert got[3] == ["exactly two"]
    assert got[6] == ["a a a"] * 6  # repeated tokens keep duplicates pre-distinct


def test_text_profile_oracle_agreement_on_edges(spark):
    """Run the text_profile computation AND its DuckDB oracle over the
    edge strings — the full oracle contract on adversarial input."""
    from flink_anomaly_spark.plans.registry import QUERIES, _load_all

    _load_all()
    oracle_sql = QUERIES["text_profile"].oracle
    df = spark.createDataFrame(EDGE_TEXTS, "doc_id long, text string")
    spark_rows = {
        r.doc_id: (r.n_tokens, r.n_subwords, r.n_chars_computed, r.quality, r.lang_guess, r.fingerprint)
        for r in text_profile(df, "doc_id", "text").collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE documents AS SELECT * FROM (VALUES " +
                ",".join(f"({i}, ?)" for i, _ in EDGE_TEXTS) + ") t(doc_id, text)",
                [t for _, t in EDGE_TEXTS])
    def canon(t):
        # fetchall yields Decimal for round() of DECIMAL arithmetic; the
        # gate's fetchdf converts to float64 — mirror that here
        return tuple(float(v) if type(v).__name__ == "Decimal" else v for v in t)

    duck_rows = {
        r[0]: canon(r[1:])
        for r in con.execute(oracle_sql).fetchall()
    }
    for doc_id in spark_rows:
        s, d = canon(spark_rows[doc_id]), duck_rows[doc_id]
        assert s == d, f"doc {doc_id}: spark {s} != duck {d}"
