"""Unit tests for the register-based sketches (operators/sketches.py):
HLL register construction / estimate bounds and count-min's one-sided
error guarantee."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from flink_anomaly_spark.operators.sketches import (
    countmin_term_estimates,
    hll_distinct_estimate,
)


def test_hll_estimate_within_theory_bound(spark):
    # 5000 distinct ids; HLL with m=256 has relative std error
    # 1.04/sqrt(m) = 6.5% — assert within 4 sigma
    df = spark.range(5000).select(F.col("id").alias("k"))
    row = hll_distinct_estimate(df, "k", p=8).collect()[0]
    assert row["exact_distinct"] == 5000
    assert row["m"] == 256
    rel = abs(row["est_distinct"] - 5000) / 5000
    assert rel < 4 * 1.04 / math.sqrt(256)
    # rel_err_pct is computed pre-rounding; both outputs round to 4
    # decimals, so recomputing from the rounded estimate agrees to ~1e-4
    assert abs(row["rel_err_pct"] - (row["est_distinct"] - 5000) / 50) < 2e-4


def test_hll_duplicates_do_not_move_estimate(spark):
    # cardinality sketch: duplicating every value leaves registers
    # (hence the estimate) identical
    base = spark.range(2000).select(F.col("id").alias("k"))
    doubled = base.union(base)
    a = hll_distinct_estimate(base, "k", p=8).collect()[0]
    b = hll_distinct_estimate(doubled, "k", p=8).collect()[0]
    assert a["est_distinct"] == b["est_distinct"]
    assert a["v_present"] == b["v_present"]


def test_hll_small_range_linear_counting_branch(spark):
    # 10 distinct << 2.5*m triggers LinearCounting: est = m*ln(m/Z);
    # with V buckets hit, Z = m - V and the estimate must match the
    # closed form exactly (to the query's 4-decimal rounding)
    df = spark.range(10).select(F.col("id").alias("k"))
    row = hll_distinct_estimate(df, "k", p=8).collect()[0]
    m, v = row["m"], row["v_present"]
    expected = round(m * math.log(m / (m - v)), 4)
    assert row["est_distinct"] == expected


def test_hll_nulls_excluded(spark):
    df = spark.createDataFrame(
        [(None,), ("a",), ("b",), (None,)], "k string"
    )
    row = hll_distinct_estimate(df, "k", p=8).collect()[0]
    assert row["exact_distinct"] == 2
    assert row["v_present"] == 2


def test_countmin_never_undercounts(spark, docs_df=None):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = countmin_term_estimates(docs, d=3, w=16, top_n=15).collect()
    assert len(out) == 15
    assert all(r["overcount"] >= 0 for r in out)
    assert all(r["cms_est"] == r["exact_cnt"] + r["overcount"] for r in out)
    # deliberately undersized sketch (3x16 cells, 31-term vocab):
    # collisions must actually occur or the demo shows nothing
    assert any(r["overcount"] > 0 for r in out)


def test_countmin_wide_sketch_is_exact(spark):
    # with w >> vocab the chance of a term colliding in ALL d rows is
    # negligible — every estimate collapses to the exact count
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = countmin_term_estimates(docs, d=4, w=4096, top_n=15).collect()
    assert all(r["overcount"] == 0 for r in out)
