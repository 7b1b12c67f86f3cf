"""Unit tests for the round-9 session-2 operators: Mann-Whitney AUC,
chi-square keyness, conformal p-values, binary-cosine all-pairs, and
kNN-graph stats. Each is checked against an independent pure-Python
reference on synthetic data (the 3-SF oracle gate covers the parquet
corpus separately)."""

from __future__ import annotations

import random


# ---------------------------------------------------------------------------
# score_auc
# ---------------------------------------------------------------------------


def _brute_auc(pairs):
    """AUC by literal pair counting: P(s_pos > s_neg) + 0.5*P(==)."""
    pos = [s for s, y in pairs if y == 1]
    neg = [s for s, y in pairs if y == 0]
    if not pos or not neg:
        return None
    wins = sum(1.0 if p > n else 0.5 if p == n else 0.0 for p in pos for n in neg)
    return wins / (len(pos) * len(neg))


def test_score_auc_matches_pair_counting(spark):
    from flink_anomaly_spark.operators.mining import score_auc

    rng = random.Random(9)
    rows = []
    for g in ["a", "b", "c"]:
        for i in range(120):
            y = rng.randint(0, 1)
            # heavy ties: scores drawn from a small integer domain,
            # positives shifted so AUC is far from 0.5 in group b
            s = rng.randint(0, 15) + (5 * y if g == "b" else 0)
            rows.append((g, s, y))
    df = spark.createDataFrame(rows, "g string, s long, y int")
    got = {r.g: r for r in score_auc(df, "g", "s", "y").collect()}
    for g in ["a", "b", "c"]:
        pairs = [(s, y) for gg, s, y in rows if gg == g]
        expect = _brute_auc(pairs)
        assert abs(got[g].auc - expect) < 1e-6, g
        assert got[g].n_pos == sum(y for _, y in pairs)
    assert got["b"].auc > 0.75


def test_score_auc_drops_one_class_groups(spark):
    from flink_anomaly_spark.operators.mining import score_auc

    rows = [("only_pos", 5, 1), ("only_pos", 7, 1), ("ok", 1, 0), ("ok", 2, 1)]
    df = spark.createDataFrame(rows, "g string, s long, y int")
    got = score_auc(df, "g", "s", "y").collect()
    assert [r.g for r in got] == ["ok"]
    assert got[0].auc == 1.0


def test_score_auc_all_tied_is_half(spark):
    from flink_anomaly_spark.operators.mining import score_auc

    rows = [("g", 3, y) for y in [0, 1, 0, 1, 1]]
    df = spark.createDataFrame(rows, "g string, s long, y int")
    assert score_auc(df, "g", "s", "y").collect()[0].auc == 0.5


# ---------------------------------------------------------------------------
# keyness_chi2_terms
# ---------------------------------------------------------------------------


def _brute_chi2(a, b, c, d):
    n = a + b + c + d
    num = a * d - b * c
    return float(n) * num * num / ((a + b) * (c + d) * (a + c) * (b + d))


def test_keyness_finds_planted_group_terms(spark):
    from flink_anomaly_spark.operators.text import keyness_chi2_terms

    rng = random.Random(17)
    common = ["alpha", "beta", "gamma", "delta"]
    rows = []
    for i in range(60):
        g = "g1" if i % 2 == 0 else "g2"
        marker = "xmarker" if g == "g1" else "ymarker"
        toks = [rng.choice(common) for _ in range(10)] + [marker] * 3
        rng.shuffle(toks)
        rows.append((g, " ".join(toks)))
    df = spark.createDataFrame(rows, "g string, text string")
    got = keyness_chi2_terms(df, "g", "text", min_term_total=5, top_k=2)
    top = {r.g: r.term for r in got.collect() if r.rank == 1}
    assert top == {"g1": "xmarker", "g2": "ymarker"}


def test_keyness_chi2_value_matches_contingency(spark):
    from flink_anomaly_spark.operators.text import keyness_chi2_terms

    # g1: 6x "hot" + 4x "cold"; g2: 1x "hot" + 9x "cold"
    rows = [("g1", " ".join(["hot"] * 6 + ["cold"] * 4)),
            ("g2", " ".join(["hot"] * 1 + ["cold"] * 9))]
    df = spark.createDataFrame(rows, "g string, text string")
    got = {(r.g, r.term): r for r in
           keyness_chi2_terms(df, "g", "text", min_term_total=1, top_k=5).collect()}
    # hot is overrepresented in g1: a=6, b=1, c=4, d=9
    r = got[("g1", "hot")]
    assert r.n_in_group == 6 and r.n_elsewhere == 1
    assert abs(r.chi2 - round(_brute_chi2(6, 1, 4, 9), 4)) < 1e-9
    # underrepresented terms (ad <= bc) are excluded: no ("g1","cold")
    assert ("g1", "cold") not in got
    assert ("g2", "cold") in got


def test_keyness_min_total_filters_rare_terms(spark):
    from flink_anomaly_spark.operators.text import keyness_chi2_terms

    rows = [("g1", "rare common common"), ("g2", "common common common")]
    df = spark.createDataFrame(rows, "g string, text string")
    got = keyness_chi2_terms(df, "g", "text", min_term_total=2, top_k=5).collect()
    assert all(r.term != "rare" for r in got)


# ---------------------------------------------------------------------------
# conformal_anomaly_pvalues
# ---------------------------------------------------------------------------


def test_conformal_pvalues_match_bruteforce(spark):
    import datetime

    from flink_anomaly_spark.operators.anomaly import conformal_anomaly_pvalues

    rng = random.Random(21)
    base = datetime.datetime(2024, 1, 1)
    split = datetime.datetime(2024, 1, 8)
    rows = []
    for i in range(400):
        ts = base + datetime.timedelta(minutes=30 * i)
        # small integer domain forces heavy score ties
        rows.append((i, ts, rng.randint(0, 40) / 1.0))
    df = spark.createDataFrame(rows, "event_id long, ts timestamp, value double")
    got = conformal_anomaly_pvalues(
        df, "event_id", "ts", "value", split_ts="2024-01-08", top_k=10
    ).collect()
    calib = [round(v * 100) for _, ts, v in rows if ts < split]
    tests = [(i, round(v * 100)) for i, ts, v in rows if ts >= split]
    brute = sorted(
        (sum(1 for c in calib if c >= s), i) for i, s in tests
    )[:10]
    assert [(r.n_calib_ge, r.event_id) for r in got] == brute
    for r in got:
        assert abs(r.p_value - round((1 + r.n_calib_ge) / (len(calib) + 1), 6)) < 1e-12
    # the most anomalous test event has the HIGHEST score (ge smallest)
    assert got[0].score_cents == max(s for _, s in tests)


def test_conformal_test_score_above_all_calib_gets_min_p(spark):
    import datetime

    from flink_anomaly_spark.operators.anomaly import conformal_anomaly_pvalues

    rows = [
        (1, datetime.datetime(2024, 1, 2), 1.0),
        (2, datetime.datetime(2024, 1, 3), 2.0),
        (3, datetime.datetime(2024, 1, 9), 99.0),  # above every calib score
        (4, datetime.datetime(2024, 1, 9), 1.5),
    ]
    df = spark.createDataFrame(rows, "event_id long, ts timestamp, value double")
    got = {r.event_id: r for r in conformal_anomaly_pvalues(
        df, "event_id", "ts", "value", split_ts="2024-01-08", top_k=10
    ).collect()}
    assert got[3].n_calib_ge == 0 and got[3].p_value == round(1 / 3, 6)
    assert got[4].n_calib_ge == 1 and got[4].p_value == round(2 / 3, 6)


# ---------------------------------------------------------------------------
# allpairs_binary_cosine
# ---------------------------------------------------------------------------


def _shingle_set(text, k=3):
    toks = text.split()
    if len(toks) < k:
        return {" ".join(toks)}
    return {" ".join(toks[i:i + k]) for i in range(len(toks) - k + 1)}


def test_binary_cosine_matches_bruteforce(spark):
    import math

    from flink_anomaly_spark.operators.dedup import allpairs_binary_cosine

    rng = random.Random(33)
    vocab = [f"w{i}" for i in range(40)]
    docs = []
    for i in range(30):
        docs.append((i, " ".join(rng.choice(vocab) for _ in range(25))))
    # exact clone + a prefix-trimmed near-copy: guaranteed hits
    docs.append((100, docs[0][1]))
    docs.append((101, " ".join(docs[1][1].split()[3:])))
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {(r.id1, r.id2): r for r in allpairs_binary_cosine(
        df, "doc_id", "text", k_shingle=3, max_df=10, tau2_num=1, tau2_den=4
    ).collect()}
    # brute force over the capped universe
    sets = {i: _shingle_set(t) for i, t in docs}
    from collections import Counter

    dfc = Counter(s for ss in sets.values() for s in ss)
    capped = {i: {s for s in ss if dfc[s] <= 10} for i, ss in sets.items()}
    expect = {}
    ids = sorted(capped)
    for ai in range(len(ids)):
        for bi in range(ai + 1, len(ids)):
            a, b = ids[ai], ids[bi]
            c = len(capped[a] & capped[b])
            sa, sb = len(capped[a]), len(capped[b])
            if c and sa and sb and 4 * c * c >= sa * sb:
                expect[(a, b)] = c / math.sqrt(sa * sb)
    assert set(got) == set(expect)
    assert (0, 100) in got
    for key, r in got.items():
        assert abs(r.cos_sim - round(expect[key], 6)) < 1e-9


def test_binary_cosine_df_cap_drops_hot_shingles(spark):
    from flink_anomaly_spark.operators.dedup import allpairs_binary_cosine

    # every doc shares the same hot shingle; with max_df=2 it is dropped
    # and only the planted pair survives on its private shingles
    rows = [(i, "hot hot hot " + f"u{i} v{i} w{i} x{i}") for i in range(5)]
    rows.append((9, "hot hot hot u0 v0 w0 x0"))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = allpairs_binary_cosine(
        df, "doc_id", "text", k_shingle=3, max_df=2, tau2_num=1, tau2_den=4
    ).collect()
    assert [(r.id1, r.id2) for r in got] == [(0, 9)]


# ---------------------------------------------------------------------------
# knn_graph_stats
# ---------------------------------------------------------------------------


def test_knn_graph_stats_matches_bruteforce(spark):
    import math

    from flink_anomaly_spark.operators.similarity import (
        hyperplane_matrix,
        knn_graph_stats,
    )

    rng = random.Random(5)
    dim, n, k, n_planes = 8, 60, 3, 2
    rows = [
        (i, [rng.uniform(-1, 1) for _ in range(dim)], i % 3) for i in range(n)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    got = {r.label: r for r in knn_graph_stats(
        df, "vec_id", "embedding", "label", k=k, n_planes=n_planes
    ).collect()}

    # pure-python replica: same planes, same float32 inputs, same
    # rounding and tiebreak
    import numpy as np

    planes = hyperplane_matrix(n_planes, dim)
    vecs = {i: np.array(v, dtype=np.float32).astype(float) for i, v, _ in rows}
    labels = {i: l for i, _, l in rows}

    def bucket(v):
        return sum(
            (1 << j) for j, w in enumerate(planes) if float(np.dot(v, w)) >= 0
        )

    bk = {i: bucket(v) for i, v in vecs.items()}
    edges = {}
    for q in vecs:
        cands = []
        for c in vecs:
            if c == q or bk[c] != bk[q]:
                continue
            cos = float(np.dot(vecs[q], vecs[c])) / (
                math.sqrt(float(np.dot(vecs[q], vecs[q])))
                * math.sqrt(float(np.dot(vecs[c], vecs[c])))
            )
            cands.append((round(cos, 6), c))
        cands.sort(key=lambda t: (-t[0], t[1]))
        edges[q] = cands[:k]
    neigh = {q: {c for _, c in es} for q, es in edges.items()}
    for lab in sorted({l for _, _, l in rows}):
        qs = [q for q in vecs if labels[q] == lab]
        n_edges = sum(len(edges[q]) for q in qs)
        n_mutual = sum(
            1 for q in qs for _, c in edges[q] if q in neigh.get(c, set())
        )
        micro = sum(round(cos * 1e6) for q in qs for cos, _ in edges[q])
        r = got[lab]
        assert r.n_nodes == len(qs)
        assert r.n_edges == n_edges
        assert r.n_mutual == n_mutual
        assert abs(r.avg_cos - round(micro / (1e6 * n_edges), 6)) < 1e-12


# ---------------------------------------------------------------------------
# streaming_benford_final
# ---------------------------------------------------------------------------


def test_streaming_benford_equals_batch_replay(spark):
    from pyspark.sql import functions as F

    from flink_anomaly_spark.operators.anomaly import benford_windowed_chi2
    from flink_anomaly_spark.plans.registry import all_queries
    from flink_anomaly_spark.tables import load_table
    from tests.conftest import SF_SMOKE

    q = all_queries()
    live = sorted(map(tuple, q["streaming_benford_final"](spark, SF_SMOKE).collect()))
    # batch replay: identical day-digit histogram from the batch table
    # through the SAME finalize
    ev = load_table(spark, SF_SMOKE, "events")
    cents = F.round(F.col("value") * 100).cast("bigint")
    day_digits = (
        ev.select(
            F.date_trunc("day", F.col("ts")).alias("window_start"),
            F.substring(cents.cast("string"), 1, 1).cast("int").alias("digit"),
        )
        .groupBy("window_start", "digit")
        .agg(F.count("*").cast("bigint").alias("c"))
    )
    batch = sorted(map(tuple, benford_windowed_chi2(day_digits).collect()))
    assert live == batch and len(live) > 0


def test_benford_finalize_excludes_nonpositive_digit_rows(spark):
    import datetime

    from flink_anomaly_spark.operators.anomaly import benford_windowed_chi2

    d0 = datetime.datetime(2024, 1, 1)
    rows = [(d0, 1, 30), (d0, 9, 10), (d0, 0, 99), (d0, None, 7)]
    df = spark.createDataFrame(rows, "window_start timestamp, digit int, c long")
    got = benford_windowed_chi2(df).collect()
    assert len(got) == 1
    r = got[0]
    # n counts only digits 1-9; the 0/NULL rows (non-positive cents)
    # are outside the Benford domain
    assert r.n == 40
    assert abs(r.leading_one_share - 0.75) < 1e-12


# ---------------------------------------------------------------------------
# ols_trend_daily
# ---------------------------------------------------------------------------


def test_ols_trend_matches_closed_form(spark):
    import datetime

    from flink_anomaly_spark.operators.mining import ols_trend_daily

    rng = random.Random(7)
    base = datetime.datetime(2024, 1, 1)
    rows = []
    # key "up": strong positive trend + noise; key "flat": pure noise
    for d in range(20):
        for _ in range(5):
            rows.append(("up", base + datetime.timedelta(days=d, hours=rng.randint(0, 23)),
                         10.0 * d + rng.uniform(0, 2)))
            rows.append(("flat", base + datetime.timedelta(days=d, hours=rng.randint(0, 23)),
                         rng.uniform(0, 2)))
    df = spark.createDataFrame(rows, "k string, ts timestamp, value double")
    got = {r.k: r for r in ols_trend_daily(df, "k", "ts", "value").collect()}

    def brute(key):
        daily = {}
        for kk, ts, v in rows:
            if kk != key:
                continue
            x = (ts.date() - base.date()).days
            daily[x] = daily.get(x, 0) + round(v * 100)
        xs, ys = zip(*sorted((x, c // 100) for x, c in daily.items()))
        n = len(xs)
        sx, sy = sum(xs), sum(ys)
        sxy = sum(x * y for x, y in zip(xs, ys))
        sxx, syy = sum(x * x for x in xs), sum(y * y for y in ys)
        slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
        intercept = (sy * sxx - sx * sxy) / (n * sxx - sx * sx)
        r2 = (n * sxy - sx * sy) ** 2 / ((n * sxx - sx * sx) * (n * syy - sy * sy))
        return slope, intercept, r2

    for key in ("up", "flat"):
        slope, intercept, r2 = brute(key)
        assert abs(got[key].slope_per_day - slope) < 1e-5, key
        assert abs(got[key].intercept - intercept) < 1e-5, key
        assert abs(got[key].r2 - r2) < 1e-5, key
    assert got["up"].r2 > 0.99 and abs(got["up"].slope_per_day - 50.0) < 1.0
    assert got["flat"].r2 < 0.3


def test_ols_trend_drops_degenerate_keys(spark):
    import datetime

    from flink_anomaly_spark.operators.mining import ols_trend_daily

    d0 = datetime.datetime(2024, 1, 1)
    rows = [
        ("one_day", d0, 1.0), ("one_day", d0, 2.0),        # zero x variance
        ("const", d0, 5.0),
        ("const", d0 + datetime.timedelta(days=1), 5.0),    # zero y variance
        ("ok", d0, 1.0), ("ok", d0 + datetime.timedelta(days=1), 2.0),
    ]
    df = spark.createDataFrame(rows, "k string, ts timestamp, value double")
    got = ols_trend_daily(df, "k", "ts", "value").collect()
    assert [r.k for r in got] == ["ok"]
    assert abs(got[0].slope_per_day - 1.0) < 1e-9
    assert got[0].r2 == 1.0


# ---------------------------------------------------------------------------
# lof_outliers
# ---------------------------------------------------------------------------


def test_lof_matches_pure_python_replica(spark):
    import math

    import numpy as np

    from flink_anomaly_spark.operators.anomaly import lof_outliers
    from flink_anomaly_spark.operators.similarity import hyperplane_matrix

    rng = random.Random(13)
    dim, n, k, n_planes = 6, 80, 4, 2
    rows = [
        (i, [rng.uniform(-1, 1) for _ in range(dim)]) for i in range(n)
    ]
    # plant a far-away singleton INSIDE a populated bucket region: an
    # outlier relative to its neighbors' density
    rows.append((500, [5.0] * dim))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = lof_outliers(df, "vec_id", "embedding", k=k, n_planes=n_planes, top_k=15)
    got = got.collect()

    planes = hyperplane_matrix(n_planes, dim)
    vecs = {i: np.array(v, dtype=np.float32).astype(float) for i, v in rows}
    bk = {
        i: sum((1 << j) for j, w in enumerate(planes) if float(np.dot(v, w)) >= 0)
        for i, v in vecs.items()
    }
    edges = {}
    for q in vecs:
        cands = sorted(
            (round(math.sqrt(float(np.dot(vecs[q] - vecs[c], vecs[q] - vecs[c]))), 6), c)
            for c in vecs if c != q and bk[c] == bk[q]
        )[:k]
        if cands:
            edges[q] = cands
    kdist = {q: max(d for d, _ in es) for q, es in edges.items()}
    nn = {q: len(es) for q, es in edges.items()}
    lrd = {}
    for q, es in edges.items():
        s = sum(round(max(kdist[c], d) * 1e6) for d, c in es)
        lrd[q] = round(nn[q] * 1e12 / max(s, 1))
    lof = {
        q: round(sum(lrd[c] for _, c in es) / (nn[q] * max(lrd[q], 1)), 6)
        for q, es in edges.items()
    }
    expect = sorted(((-v, q) for q, v in lof.items()))[:15]
    assert [(r.vec_id, r.lof) for r in got] == [(q, -v) for v, q in expect]
    for r in got:
        assert abs(r.lrd - round(lrd[r.vec_id] / 1e6, 6)) < 1e-9
        assert r.n_neighbors == nn[r.vec_id]


# ---------------------------------------------------------------------------
# streaming_twap_final
# ---------------------------------------------------------------------------


def test_streaming_twap_equals_batch(spark):
    from flink_anomaly_spark.plans.registry import all_queries
    from tests.conftest import SF_SMOKE

    q = all_queries()
    live = sorted(map(tuple, q["streaming_twap_final"](spark, SF_SMOKE).collect()))
    batch = sorted(map(tuple, q["twap_daily"](spark, SF_SMOKE).collect()))
    assert live == batch and len(live) > 0


def test_twap_stream_multi_batch_state_carry(spark, tmp_path):
    """Rows of one (key, day) split across micro-batches must fold into
    ONE state (gap across the batch boundary included) and emit exactly
    one final row per (key, day) on timeout."""
    import datetime
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from flink_anomaly_spark.streaming.pipelines import run_to_memory
    from flink_anomaly_spark.streaming.stateful import twap_stream

    d = str(tmp_path / "twap_src")
    os.makedirs(d)
    t0 = datetime.datetime(2024, 1, 1, 0, 0, 0)

    def write(path, rows):
        tbl = pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
                "event_type": pa.array(["a"] * len(rows), pa.string()),
                "value": pa.array([r[2] for r in rows], pa.float64()),
            }
        )
        pq.write_table(tbl, path)

    # batch 1: two observations; batch 2: one more + a sentinel far out
    write(os.path.join(d, "a_batch1.parquet"),
          [(1, t0, 10.0), (2, t0 + datetime.timedelta(hours=6), 20.0)])
    write(os.path.join(d, "b_batch2.parquet"),
          [(3, t0 + datetime.timedelta(hours=18), 40.0),
           (9, t0 + datetime.timedelta(days=5), 0.0)])
    os.utime(os.path.join(d, "a_batch1.parquet"), (1_000_000_000, 1_000_000_000))
    os.utime(os.path.join(d, "b_batch2.parquet"), (2_000_000_000, 2_000_000_000))
    events = (
        spark.readStream.schema(
            "event_id long, ts timestamp, event_type string, value double"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(d)
    )
    got = run_to_memory(twap_stream(events, key="event_type")).collect()
    rows = [r for r in got if str(r.day).startswith("2024-01-01")]
    assert len(rows) == 1
    r = rows[0]
    assert r.n_events == 3
    assert r.active_us == 86_400_000_000
    # 10 for 6h, 20 for 12h, 40 for 6h -> (10*6 + 20*12 + 40*6)/24 = 22.5
    expect_num = (1000 * 6 + 2000 * 12 + 4000 * 6) * 3_600_000_000
    assert r.twap_num == expect_num
    assert abs(r.twap - 22.5) < 1e-12


# ---------------------------------------------------------------------------
# rake_keywords
# ---------------------------------------------------------------------------


def test_rake_matches_pure_python(spark):
    import re
    from collections import defaultdict

    from flink_anomaly_spark.operators.text import STOPWORDS, rake_keywords

    rng = random.Random(41)
    content = ["spark", "engine", "query", "plan", "shuffle", "join"]
    docs = []
    for i in range(40):
        toks = []
        for _ in range(12):
            toks.append(rng.choice(content))
            if rng.random() < 0.3:
                toks.append(rng.choice(STOPWORDS))
        docs.append((i, " ".join(toks)))
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = rake_keywords(df, "text", top_k=10).collect()

    pat = re.compile(r"\b(" + "|".join(STOPWORDS) + r")\b")
    freq, degree = defaultdict(int), defaultdict(int)
    for _, text in docs:
        for phrase in pat.sub("|", text).split("|"):
            ws = [w for w in phrase.strip().split() if w]
            for w in ws:
                freq[w] += 1
                degree[w] += len(ws)
    expect = sorted(
        ((degree[w] / freq[w], w) for w in freq), key=lambda t: (-t[0], t[1])
    )[:10]
    assert [(r.word, r.freq, r.degree) for r in got] == [
        (w, freq[w], degree[w]) for _, w in expect
    ]
    for r in got:
        assert abs(r.rake_score - round(degree[r.word] / freq[r.word], 4)) < 1e-9


def test_rake_phrase_boundaries_at_stopwords(spark):
    from flink_anomaly_spark.operators.text import rake_keywords

    # "big data" always co-occur in one phrase; "solo" stands alone:
    # equal freq, but degree favors the phrase members
    docs = [(i, "big data the solo") for i in range(5)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r.word: r for r in rake_keywords(df, "text", top_k=10).collect()}
    assert got["big"].degree == 10 and got["big"].freq == 5
    assert got["solo"].degree == 5
    assert got["big"].rake_score == 2.0 and got["solo"].rake_score == 1.0
    assert "the" not in got


# ---------------------------------------------------------------------------
# hilbert_steps / hilbert_file_layout
# ---------------------------------------------------------------------------


def _xy2d_ref(n, x, y):
    """Pure-Python Hilbert xy2d with the n-1 flip (the fragment's
    variant — every intermediate stays in [0, n))."""
    d = 0
    s = n // 2
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x, y = n - 1 - x, n - 1 - y
            x, y = y, x
        s //= 2
    return d


def test_hilbert_fragment_is_bijective_adjacent_and_matches_reference():
    import duckdb

    from flink_anomaly_spark.plans.fragments import hilbert_steps

    for bits in (2, 4):
        n = 2**bits
        steps, d_expr = hilbert_steps(bits)
        q = (
            f"SELECT x AS hx0, y AS hy0 FROM (SELECT unnest(range({n})) x), "
            f"(SELECT unnest(range({n})) y)"
        )
        for name, expr in steps:
            q = f"SELECT *, {expr} AS {name} FROM ({q})"
        rows = duckdb.sql(
            f"SELECT hx0, hy0, {d_expr} AS d FROM ({q})"
        ).fetchall()
        pos = {d: (x, y) for x, y, d in rows}
        assert len(pos) == n * n  # bijective onto [0, n^2)
        assert set(pos) == set(range(n * n))
        # the Hilbert property: consecutive curve steps are grid-adjacent
        for d in range(n * n - 1):
            (x1, y1), (x2, y2) = pos[d], pos[d + 1]
            assert abs(x1 - x2) + abs(y1 - y2) == 1, d
        assert all(_xy2d_ref(n, x, y) == d for x, y, d in rows)


def test_hilbert_layout_partitions_the_corpus(spark):
    from flink_anomaly_spark.plans.registry import all_queries
    from tests.conftest import SF_SMOKE

    q = all_queries()
    got = q["hilbert_file_layout"](spark, SF_SMOKE).collect()
    zorder = q["zorder_file_layout"](spark, SF_SMOKE).collect()
    # both layouts place every document exactly once
    assert sum(r.n_docs for r in got) == sum(r.n_docs for r in zorder)
    assert all(0 <= r.file_id < 256 for r in got)


# ---------------------------------------------------------------------------
# acf_daily
# ---------------------------------------------------------------------------


def test_acf_matches_pure_python(spark):
    import datetime

    from flink_anomaly_spark.operators.mining import acf_daily

    rng = random.Random(3)
    base = datetime.datetime(2024, 1, 1)
    rows = []
    for d in range(24):
        # key "per2": period-2 alternation -> acf1 < 0, acf2 > 0;
        # key "noise": iid
        for _ in range(4):
            rows.append(("per2", base + datetime.timedelta(days=d, hours=3),
                         100.0 if d % 2 == 0 else 10.0))
            rows.append(("noise", base + datetime.timedelta(days=d, hours=5),
                         rng.uniform(0, 100)))
    df = spark.createDataFrame(rows, "k string, ts timestamp, value double")
    got = {r.k: r for r in acf_daily(df, "k", "ts", "value", max_lag=3).collect()}

    def brute(key):
        daily = {}
        for kk, ts, v in rows:
            if kk != key:
                continue
            x = (ts.date() - base.date()).days
            daily[x] = daily.get(x, 0) + round(v * 10)
        ys = [y for _, y in sorted(daily.items())]
        n = len(ys)
        s = sum(ys)
        e = [n * y - s for y in ys]
        den = sum(x * x for x in e)
        return [
            sum(e[t] * e[t + k] for t in range(n - k)) / den for k in (1, 2, 3)
        ], n

    for key in ("per2", "noise"):
        expect, n = brute(key)
        assert got[key].n_days == n
        for k in (1, 2, 3):
            assert abs(getattr(got[key], f"acf{k}") - expect[k - 1]) < 1e-6, (key, k)
    assert got["per2"].acf1 < -0.9 and got["per2"].acf2 > 0.9


def test_acf_drops_short_and_constant_keys(spark):
    import datetime

    from flink_anomaly_spark.operators.mining import acf_daily

    d0 = datetime.datetime(2024, 1, 1)
    rows = [("short", d0 + datetime.timedelta(days=d), float(d)) for d in range(3)]
    rows += [("const", d0 + datetime.timedelta(days=d), 7.0) for d in range(10)]
    rows += [("ok", d0 + datetime.timedelta(days=d), float(d % 3)) for d in range(10)]
    df = spark.createDataFrame(rows, "k string, ts timestamp, value double")
    got = acf_daily(df, "k", "ts", "value", max_lag=3).collect()
    assert [r.k for r in got] == ["ok"]


# ---------------------------------------------------------------------------
# mann_kendall_trend
# ---------------------------------------------------------------------------


def test_mann_kendall_matches_pure_python(spark):
    import datetime
    import math

    from flink_anomaly_spark.operators.mining import mann_kendall_trend

    rng = random.Random(11)
    base = datetime.datetime(2024, 1, 1)
    rows = []
    for d in range(25):
        for _ in range(3):
            rows.append(("up", base + datetime.timedelta(days=d, hours=2),
                         5.0 * d + rng.uniform(0, 3)))
            # heavy ties: values from a 3-point domain
            rows.append(("tied", base + datetime.timedelta(days=d, hours=4),
                         float(rng.choice([10, 10, 20]))))
    df = spark.createDataFrame(rows, "k string, ts timestamp, value double")
    got = {r.k: r for r in mann_kendall_trend(df, "k", "ts", "value").collect()}

    def brute(key):
        daily = {}
        for kk, ts, v in rows:
            if kk != key:
                continue
            x = (ts.date() - base.date()).days
            daily[x] = daily.get(x, 0) + round(v * 100)
        ys = [c // 100 for _, c in sorted(daily.items())]
        n = len(ys)
        s = sum(
            (ys[j] > ys[i]) - (ys[j] < ys[i])
            for i in range(n) for j in range(i + 1, n)
        )
        from collections import Counter

        ties = Counter(ys)
        var18 = n * (n - 1) * (2 * n + 5) - sum(
            t * (t - 1) * (2 * t + 5) for t in ties.values()
        )
        sgn = (s > 0) - (s < 0)
        z = (s - sgn) / math.sqrt(var18 / 18.0)
        return n, s, round(z, 4)

    for key in ("up", "tied"):
        n, s, z = brute(key)
        r = got[key]
        assert (r.n_days, r.s_stat) == (n, s), key
        assert abs(r.z_mk - z) < 1e-9, key
    assert got["up"].significant and got["up"].z_mk > 3
    assert abs(got["tied"].z_mk) < got["up"].z_mk


def test_mann_kendall_drops_constant_keys(spark):
    import datetime

    from flink_anomaly_spark.operators.mining import mann_kendall_trend

    d0 = datetime.datetime(2024, 1, 1)
    rows = [("const", d0 + datetime.timedelta(days=d), 5.0) for d in range(8)]
    rows += [("ok", d0 + datetime.timedelta(days=d), float(d)) for d in range(8)]
    df = spark.createDataFrame(rows, "k string, ts timestamp, value double")
    got = mann_kendall_trend(df, "k", "ts", "value").collect()
    assert [r.k for r in got] == ["ok"]
    assert got[0].s_stat == 28  # strictly increasing: all pairs +1
