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


# ---------------------------------------------------------------------------
# round-6 batch 2: scene cuts, normalized dedup, streaming top-k
# ---------------------------------------------------------------------------


def test_video_frame_pair_sad_hand_computed(spark):
    from flink_anomaly_spark.operators.multimodal import (
        encode_y4m,
        video_frame_pair_sad,
    )

    # 2x2 clip, 3 frames: SADs are |5-1|*4 = hand-computable
    frames = [bytes([1, 1, 1, 1]), bytes([5, 3, 1, 255]), bytes([5, 3, 2, 0])]
    payload = encode_y4m(2, 2, frames)
    media = spark.createDataFrame(
        [(1, payload)], "media_id long, payload binary"
    )
    rows = {r.pair_idx: r for r in video_frame_pair_sad(media).collect()}
    assert rows[0].sad == 4 + 2 + 0 + 254
    assert rows[1].sad == 0 + 0 + 1 + 255
    assert rows[0].width == 2 and rows[0].height == 2


def test_normalized_exact_dedup_catches_reformatted_copy(spark):
    from flink_anomaly_spark.operators.dedup import normalized_exact_dedup

    df = spark.createDataFrame(
        [
            (1, "Hello, World!"),
            (2, "hello   world"),
            (3, "HELLO-WORLD"),
            (4, "goodbye world"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in normalized_exact_dedup(df, "text", "doc_id").collect()}
    assert out[1].group_size == 3 and out[1].is_canonical
    assert out[2].group_size == 3 and not out[2].is_canonical
    assert out[3].norm_hash == out[1].norm_hash
    assert out[4].group_size == 1 and out[4].is_canonical
    assert not out[1].is_empty and not out[4].is_empty


def test_normalized_exact_dedup_empty_docs_are_not_duplicates(spark):
    # ADVICE r6: punctuation/whitespace-only and NULL texts must NOT
    # collapse into one md5('') duplicate group — each is a singleton
    # with NULL hash and is_empty set (and no giant NULL-key window
    # partition exists: the window key falls back to the doc id).
    from flink_anomaly_spark.operators.dedup import normalized_exact_dedup

    df = spark.createDataFrame(
        [
            (1, "!!! ... ---"),
            (2, "   "),
            (3, ""),
            (4, None),
            (5, "real text"),
            (6, "REAL text!"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in normalized_exact_dedup(df, "text", "doc_id").collect()}
    for i in (1, 2, 3, 4):
        assert out[i].is_empty
        assert out[i].norm_hash is None
        assert out[i].group_size == 1
        assert out[i].is_canonical
    assert out[5].group_size == 2 and not out[5].is_empty
    assert out[6].norm_hash == out[5].norm_hash


def test_streaming_topk_rank_invariants(spark):
    from flink_anomaly_spark.plans.registry import all_queries

    out = all_queries()["streaming_topk_per_window_final"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    by_win = {}
    for r in out:
        by_win.setdefault(r.window_start, []).append(r)
    assert out, "no windows emitted"
    for rows in by_win.values():
        ranks = sorted(r.rank for r in rows)
        assert ranks == list(range(1, len(ranks) + 1)) and len(ranks) <= 3
        ordered = sorted(rows, key=lambda r: (-r.n_events, r.event_type))
        assert [r.rank for r in ordered] == ranks


# ---------------------------------------------------------------------------
# round-6 batch 3: audio ZCR, matryoshka recall, MV refresh, 2-level flush
# ---------------------------------------------------------------------------


def test_audio_zero_crossings_hand_computed(spark):
    from flink_anomaly_spark.operators.multimodal import (
        audio_zero_crossings,
        encode_wav,
    )
    import numpy as np

    s = np.array([5, -3, -2, 4, 0, -1, 50], dtype="<i2")
    media = spark.createDataFrame(
        [(1, encode_wav(8000, s.tobytes()))], "media_id long, payload binary"
    )
    row = audio_zero_crossings(media, quiet_below=10).collect()[0]
    # sign products: (5,-3)<0, (-3,-2)>0, (-2,4)<0, (4,0)=0, (0,-1)=0, (-1,50)<0
    assert row.zero_crossings == 3
    assert row.n_quiet == 6  # |5|,|-3|,|-2|,|4|,|0|,|-1| < 10; only 50 is loud
    assert row.n_samples == 7


def test_matryoshka_recall_bounds_and_full_dim_sanity(spark):
    from flink_anomaly_spark.plans.registry import all_queries

    rows = {
        r.dims: r.recall_at_10
        for r in all_queries()["ann_matryoshka_recall"](
            spark, "/root/testdata/sf0.001"
        ).collect()
    }
    assert set(rows) == {8, 16, 32}
    assert all(0.0 <= v <= 1.0 for v in rows.values())
    # a 32-dim prefix of a 64-dim space must retain SOME neighbors
    assert rows[32] > 0.0


def test_incremental_mv_refresh_group_move(spark):
    """Hand-built change set with a group-moving update: MV algebra
    must match a from-scratch recompute (tiny mirror of the registered
    query's oracle construction)."""
    from pyspark.sql import functions as F

    old = spark.createDataFrame(
        [(1, "A", 100), (2, "A", 200), (3, "B", 300)], "k long, st string, c long"
    )
    new = spark.createDataFrame(
        [(1, "B", 100), (2, "A", 200), (4, "C", 50)], "k long, st string, c long"
    )
    mv_old = old.groupBy("st").agg(F.count("*").alias("n"), F.sum("c").alias("c"))
    ch = (
        old.select("k", F.col("st").alias("os"), F.col("c").alias("oc"))
        .join(new.select("k", F.col("st").alias("ns"), F.col("c").alias("nc")), "k", "full_outer")
        .filter(
            F.col("os").isNull() | F.col("ns").isNull()
            | (F.col("os") != F.col("ns")) | (F.col("oc") != F.col("nc"))
        )
    )
    neg = ch.filter(F.col("os").isNotNull()).select(
        F.col("os").alias("st"), F.lit(-1).alias("dn"), (-F.col("oc")).alias("dc"))
    pos = ch.filter(F.col("ns").isNotNull()).select(
        F.col("ns").alias("st"), F.lit(1).alias("dn"), F.col("nc").alias("dc"))
    delta = neg.union(pos).groupBy("st").agg(F.sum("dn").alias("dn"), F.sum("dc").alias("dc"))
    got = sorted(
        mv_old.join(delta, "st", "full_outer")
        .select("st",
                (F.coalesce("n", F.lit(0)) + F.coalesce("dn", F.lit(0))).alias("n"),
                (F.coalesce("c", F.lit(0)) + F.coalesce("dc", F.lit(0))).alias("c"))
        .filter(F.col("n") > 0).collect()
    )
    want = sorted(new.groupBy("st").agg(F.count("*").alias("n"), F.sum("c").alias("c")).collect())
    assert [tuple(r) for r in got] == [tuple(r) for r in want]


def test_two_level_flush_emits_trailing_hour(spark):
    from flink_anomaly_spark.plans.registry import all_queries

    q = all_queries()
    fin = q["streaming_two_level_agg_final"](spark, "/root/testdata/sf0.001").collect()
    non = q["streaming_two_level_agg"](spark, "/root/testdata/sf0.001").collect()
    assert len(fin) > len(non), "EOS flush must finalize the trailing hour(s)"
    assert max(r.window_end for r in fin) > max(r.window_end for r in non)


def test_sketch_param_guards(spark):
    import pytest

    from flink_anomaly_spark.operators.sketches import (
        countmin_term_estimates,
        hll_distinct_estimate,
    )

    df = spark.range(5).select(F.col("id").alias("k"))
    with pytest.raises(ValueError, match=r"p must be"):
        hll_distinct_estimate(df, "k", p=2)
    with pytest.raises(ValueError, match=r"need d"):
        countmin_term_estimates(df.selectExpr("'a b' AS text"), d=0)


# ---------------------------------------------------------------------------
# round-6 batch 4: edit-distance near-dup, hot-key skew report
# ---------------------------------------------------------------------------


def test_edit_distance_near_dup_planted_and_parity(spark, duck):
    from flink_anomaly_spark.operators.dedup import edit_distance_near_dup

    df = spark.createDataFrame(
        [
            (1, "kitten sat on the mat", "en", "s"),
            (2, "sitting sat on the mat", "en", "s"),   # lev 3 from doc 1
            (3, "completely different words here", "en", "s"),
            (4, "kitten sat on the mat", "de", "s"),    # other block
        ],
        "doc_id long, text string, lang string, source string",
    )
    out = edit_distance_near_dup(
        df, "doc_id", "text", ["lang", "source"], band_chars=100, threshold=10
    ).collect()
    pairs = {(r.id_a, r.id_b): r.lev for r in out}
    assert pairs == {(1, 2): 3}
    # engine parity of the distance function itself
    assert duck.execute("SELECT levenshtein('kitten','sitting')").fetchone()[0] == 3
    got = spark.sql("SELECT levenshtein('kitten','sitting')").collect()[0][0]
    assert got == 3


def test_edit_distance_band_guard(spark):
    import pytest

    from flink_anomaly_spark.operators.dedup import edit_distance_near_dup

    df = spark.createDataFrame([(1, "x", "en", "s")],
                               "doc_id long, text string, lang string, source string")
    with pytest.raises(ValueError, match="pigeonhole"):
        edit_distance_near_dup(df, "doc_id", "text", ["lang"], band_chars=50,
                               threshold=60)


def test_edit_distance_cross_band_pair_found(spark):
    """A qualifying pair straddling a band boundary must be returned
    (the adjacent-band pigeonhole, not same-band-only blocking)."""
    from flink_anomaly_spark.operators.dedup import edit_distance_near_dup

    a = "x" * 98          # band 0
    b = "x" * 102         # band 1, lev = 4
    df = spark.createDataFrame(
        [(1, a, "en", "s"), (2, b, "en", "s")],
        "doc_id long, text string, lang string, source string",
    )
    out = edit_distance_near_dup(
        df, "doc_id", "text", ["lang", "source"], band_chars=100, threshold=10
    ).collect()
    assert [(r.id_a, r.id_b, r.lev) for r in out] == [(1, 2, 4)]


def test_hot_key_skew_report_hand_computed(spark):
    from flink_anomaly_spark.operators.relational import hot_key_skew_report

    df = spark.createDataFrame(
        [("a",)] * 60 + [("b",)] * 30 + [("c",)] * 10, "k string"
    )
    rows = {r.key: r for r in hot_key_skew_report(df, "k", n_partitions=10,
                                                  top_n=3).collect()}
    assert rows["a"].key_rows == 60 and rows["a"].total_rows == 100
    assert rows["a"].share_pct == 60.0
    assert rows["a"].skew_ratio == 6.0 and rows["a"].suggested_salt == 6
    assert rows["c"].skew_ratio == 1.0 and rows["c"].suggested_salt == 1


def test_audio_zcr_8bit_recentered_and_stereo_channel0(spark):
    """8-bit PCM is unsigned (midpoint 128) and stereo samples are
    interleaved — the ZCR features must recenter and take channel 0
    (code-review round-6 finding)."""
    import numpy as np

    from flink_anomaly_spark.operators.multimodal import audio_zero_crossings

    # 8-bit mono: 28,228,28,228 = ±100 around 128 → 3 crossings, 0 quiet
    def wav8(samples):
        import struct
        data = bytes(samples)
        hdr = b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVEfmt " + \
              struct.pack("<IHHIIHH", 16, 1, 1, 8000, 8000, 1, 8) + \
              b"data" + struct.pack("<I", len(data))
        return hdr + data

    def wav16_stereo(left, right):
        import struct
        inter = []
        for a, b in zip(left, right):
            inter += [a, b]
        data = np.array(inter, dtype="<i2").tobytes()
        hdr = b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVEfmt " + \
              struct.pack("<IHHIIHH", 16, 1, 2, 8000, 32000, 4, 16) + \
              b"data" + struct.pack("<I", len(data))
        return hdr + data

    media = spark.createDataFrame(
        [
            (1, wav8([28, 228, 28, 228])),
            # L alternates sign (3 crossings); R constant — interleaved
            # sign products would be garbage
            (2, wav16_stereo([500, -500, 500, -500], [7, 7, 7, 7])),
        ],
        "media_id long, payload binary",
    )
    rows = {r.media_id: r for r in audio_zero_crossings(media, quiet_below=100).collect()}
    assert rows[1].zero_crossings == 3 and rows[1].n_quiet == 0
    assert rows[2].zero_crossings == 3 and rows[2].n_samples == 4


def test_gap_fill_forward_daily_planted_gaps(spark):
    """Planted hourly series with a 3-hour hole: the hole must be
    forward-filled with the prior value and counted in n_filled."""
    from flink_anomaly_spark.operators.relational import gap_fill_forward_daily

    rows = [
        (1, "2024-01-01 00:15:00", 10.0, 1),
        (1, "2024-01-01 00:45:00", 20.0, 2),   # same hour: later wins
        (1, "2024-01-01 04:30:00", 40.0, 3),   # hours 1-3 are the hole
        (2, "2024-01-01 10:00:00", 5.0, 4),    # single-hour user
    ]
    df = spark.createDataFrame(rows, "user_id long, ts string, value double, event_id long") \
              .selectExpr("user_id", "CAST(ts AS TIMESTAMP) ts", "value", "event_id")
    out = {(r.user_id,): r for r in gap_fill_forward_daily(
        df, "user_id", "ts", "value", "event_id").collect()}
    u1 = out[(1,)]
    # grid hours 00..04 = 5 hours; hours 1,2,3 filled with 20.0
    assert u1.n_hours == 5 and u1.n_filled == 3
    assert u1.avg_value == round((20.0 + 20.0*3 + 40.0) / 5, 6)
    u2 = out[(2,)]
    assert u2.n_hours == 1 and u2.n_filled == 0 and u2.avg_value == 5.0


def test_hll_empty_and_all_null_input_estimates_zero(spark):
    # ADVICE r6: sum over zero register rows is NULL — the sketch must
    # coalesce it so an empty (or all-NULL) input yields a DEFINED 0
    # estimate (LinearCounting with zero buckets hit: m*ln(m/m) = 0)
    # and rel_err_pct 0.0 instead of a NULL from the 0-division.
    empty = spark.createDataFrame([], "k string")
    row = hll_distinct_estimate(empty, "k", p=8).collect()[0]
    assert row["v_present"] == 0
    assert row["est_distinct"] == 0.0
    assert row["exact_distinct"] == 0
    assert row["rel_err_pct"] == 0.0

    nulls = spark.createDataFrame([(None,), (None,)], "k string")
    row = hll_distinct_estimate(nulls, "k", p=8).collect()[0]
    assert row["est_distinct"] == 0.0
    assert row["rel_err_pct"] == 0.0


def test_cms_stream_cells_match_batch_build(spark):
    """Streaming per-window CMS cells must equal the batch cell build
    over the same events (same salted-md5 bucketing) and stay bounded
    by d*w rows per window — the constant-state frequency twin of the
    HLL register test."""
    import tempfile

    from pyspark.sql import functions as F

    from flink_anomaly_spark.operators.sketches import _cms_bucket
    from flink_anomaly_spark.streaming.pipelines import (
        cms_cell_stream,
        run_to_memory,
        stream_events_with_final_flush,
    )
    from flink_anomaly_spark.tables import load_table

    sf = "/root/testdata/sf0.001"
    d, w = 3, 16
    work = tempfile.mkdtemp(prefix="eos_flush_")
    events = stream_events_with_final_flush(spark, sf, work)
    cells = run_to_memory(cms_cell_stream(events, key_col="user_id", d=d, w=w))
    got = {(r.window_start, r.r, r.b): r.cell for r in cells.collect()}
    key = F.col("user_id").cast("string")
    batch = (
        load_table(spark, sf, "events")
        .filter(F.col("user_id").isNotNull())
        .select(
            F.window("ts", "1 hour").alias("win"),
            F.explode(
                F.array(
                    *[
                        F.struct(F.lit(r).alias("r"), _cms_bucket(key, r, w).alias("b"))
                        for r in range(d)
                    ]
                )
            ).alias("rb"),
        )
        .groupBy(F.col("win.start").alias("ws"), "rb.r", "rb.b")
        .agg(F.count("*").alias("cell"))
    )
    want = {(r.ws, r.r, r.b): r.cell for r in batch.collect()}
    assert got == want
    from collections import Counter

    per_window = Counter(ws for ws, _, _ in got)
    assert per_window and max(per_window.values()) <= d * w


def test_cms_windowed_estimates_upper_bound_and_absent_zero(spark):
    """CMS point estimates are one-sided (est >= true count per window)
    and a monitored key absent from a window estimates >= 0 with
    absent CELLS counted as 0, never dropped from the min."""
    import tempfile

    from pyspark.sql import functions as F

    from flink_anomaly_spark.operators.sketches import cms_windowed_point_estimates
    from flink_anomaly_spark.streaming.pipelines import (
        cms_cell_stream,
        run_to_memory,
        stream_events_with_final_flush,
    )
    from flink_anomaly_spark.tables import load_table

    sf = "/root/testdata/sf0.001"
    keys = [1, 2, 3, 4, 999999999]  # last key appears in no window
    work = tempfile.mkdtemp(prefix="eos_flush_")
    events = stream_events_with_final_flush(spark, sf, work)
    cells = run_to_memory(cms_cell_stream(events, key_col="user_id", d=3, w=16))
    est = {
        (r.window_start, r.user_id): r.cms_est
        for r in cms_windowed_point_estimates(cells, keys=keys, d=3, w=16).collect()
    }
    true = {
        (r.ws, r.user_id): r.n
        for r in load_table(spark, sf, "events")
        .filter(F.col("user_id").isin(keys))
        .groupBy(F.window("ts", "1 hour")["start"].alias("ws"), "user_id")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert est, "no estimates emitted"
    for (ws, k), e in est.items():
        assert e >= true.get((ws, k), 0)
    # every (window, key) pair exists in the output, even absent keys
    n_windows = len({ws for ws, _ in est})
    assert len(est) == n_windows * len(keys)


def test_histogram_quantile_within_bin_width_and_mergeable(spark):
    """The histogram sketch's estimate must sit within one bin width of
    the exact quantile, and two half-corpus histograms must merge (by
    adding counts) to the full-corpus sketch — the property that makes
    it a sketch."""
    from pyspark.sql import functions as F

    from flink_anomaly_spark.operators.sketches import histogram_quantile_sketch
    from flink_anomaly_spark.tables import load_table

    events = load_table(spark, "/root/testdata/sf0.001", "events")
    lo, hi, n_bins = 0.0, 512.0, 64
    width = (hi - lo) / n_bins
    out = {r.q: r for r in histogram_quantile_sketch(events, "value", lo, hi, n_bins).collect()}
    exact = events.agg(
        F.expr("percentile(value, array(0.5, 0.9, 0.99))").alias("p")
    ).collect()[0].p
    for q, ex in zip((0.5, 0.9, 0.99), exact):
        assert abs(out[q].est - ex) <= width, (q, out[q].est, ex)
    # mergeability: sketch(A ∪ B) == sketch built from summed halves —
    # estimates over the union must equal the one-pass sketch
    half_a = events.filter(F.col("event_id") % 2 == 0)
    half_b = events.filter(F.col("event_id") % 2 == 1)
    merged = histogram_quantile_sketch(half_a.union(half_b), "value", lo, hi, n_bins)
    got = {r.q: r.est for r in merged.collect()}
    assert got == {q: out[q].est for q in got}
