"""Shuffle audit: measured shuffle-write bytes and task counts per
headline query — the evidence behind the "shuffle-minimal" operator
claims (docs/DEPLOY.md). Uses the local Spark status REST API (UI
enabled just for this probe session).

    python tools/shuffle_audit.py

Writes docs/SHUFFLE_AUDIT.md.
"""

from __future__ import annotations

import json
import sys
import urllib.request

sys.path.insert(0, ".")

from flink_anomaly_spark.plans.registry import all_queries
from flink_anomaly_spark.session import get_spark

SF = "/root/testdata/sf0.1"

PROBE = [
    ("tpch_q1_pricing", "1 exchange: partial→final hash agg"),
    ("tpch_q6_forecast", "1 tiny exchange: single-row partial agg merge"),
    ("revenue_by_nation", "fact-side exchanges only; dims broadcast"),
    ("flagship_running_concat", "1 exchange on event_type"),
    ("asof_last_signup", "1 exchange: union-tag window, no join"),
    ("topk_orders", "no shuffle: TakeOrderedAndProject"),
    ("minhash_near_dup_pairs", "band keys + candidate ids only"),
    ("exact_dedup", "16-byte md5 keys, partial-agg combined"),
    ("simhash_near_dup_pairs", "(id, band, chunk, fp) rows — 28 bytes each"),
    ("embedding_ann_ivf", "narrow cell assign; probe join carries n_probe cells"),
    ("ngram_decontamination", "gram strings only; train side pre-distincted"),
    ("ewma_smoothing", "1 exchange: analytic window on user_id"),
    ("mad_outliers", "keyed agg+join exchanges on user_id (AQE-reused)"),
    # round-3 operators
    ("gopher_quality_flags", "no inherent shuffle (bytes = spread() of the 1-file local input; no-op on split inputs)"),
    ("doc_repetition_profile", "(doc_id, token) pairs only, partial-agg combined"),
    ("embedding_dim_stats", "agg exchange is ~dim rows/task; bytes = spread() of the 1-file input"),
    ("embedding_int8_quantize", "narrow encode; bytes = spread() of the 1-file input"),
    ("ohlc_resample", "1 exchange: (event_type, 1-min bucket) partial aggs"),
    ("heavy_hitter_terms", "vocabulary-sized term agg, map-side combined"),
    ("stratified_sample_by_lang", "pure filter scan: zero inherent shuffle"),
    # late round-3 operators
    ("char_entropy", "zero inherent shuffle: vectorized codepoint bincount (bytes = spread() of the 1-file input)"),
    ("bigram_pmi_top", "unigram+bigram count exchanges; vocab-sized PMI join broadcasts"),
    ("winsorized_event_stats", "percentile agg + clamp agg on event_type; bounds broadcast back"),
    ("canonical_doc_per_cluster", "clustering exchanges + one (cluster_id, n_chars) rank shuffle — ids only"),
    ("corpus_curation_pipeline", "stage joins are doc_id-only semi/anti; minhash band exchange dominates"),
    ("tpch_q5_local_supplier", "two fact exchanges (orderkey, custkey); supplier/nation/region broadcast"),
    ("udaf_weighted_mean", "one exchange on event_type into Arrow-batched groups"),
    ("lineitem_grouping_sets", "Expand collapsed map-side: exchange carries Σ|groups| partials"),
    ("embedding_covariance", "O(batches x d^2) partial outer-product rows; corpus size stays map-side"),
    ("event_sessionization", "one user_id exchange: flag + ordinal + start share the window"),
    ("cross_doc_repeated_ngrams", "(doc_id, gram) posting shuffles; no all-pairs"),
    ("minhash_estimate_accuracy", "band shuffle + signature-carrying candidate joins"),
    ("tpch_q21_late_blame", "decorrelated per-order agg join-back on orderkey"),
    ("temperature_resampled_corpus", "|languages|-row rate broadcast onto a filter scan"),
    ("tokenizer_fertility_by_lang", "|languages| map-side-combined partials"),
    # final round-3 operators
    ("bloom_prefilter_urgent_revenue", "bitmap build ≤ m/64 rows; probe side shrinks BEFORE its join exchange"),
    ("incremental_dedup_new_batch", "tagged band keys + cross-set candidate ids; md5 keys for the exact join"),
    ("neardup_triangle_count", "wedge joins over the LSH-bounded edge list only"),
    ("doc_token_chunks", "zero inherent shuffle: tokenize → window explode → md5"),
    ("weighted_doc_sample", "zero inherent shuffle: 1-row max broadcast onto a filter scan"),
    ("quality_quantile_normalize", "one lang exchange; rank window rides it"),
    ("embedding_random_projection", "zero shuffle: 16 codegen'd add-chains per row"),
    ("tpch_q2_min_cost_supplier", "one (partkey,suppkey) pre-agg exchange; all dims + min join-back broadcast"),
    ("tpch_q9_product_profit", "one fact-fact exchange (orderkey); part/supplier/nation broadcast"),
    ("prefix_filter_jaccard_pairs", "8-byte gram-md5 exchange keys; df rides the tok partitioning (no agg+join-back)"),
    ("rfm_customer_segments", "one custkey agg exchange; ntiles sort |customers| pre-agg rows; 64-group matrix agg"),
    ("cohort_retention", "min-ts agg, distinct, and join share one user_id exchange layout"),
    ("table_column_profile", "stack-unpivot then ONE grouped agg; 4 groups map-side combined"),
    ("boilerplate_segment_removal", "segment-DF exchange + doc_id reassembly; blacklist broadcast"),
    ("data_quality_suite", "1-row partial-agg merges per table; dim keys broadcast for the FK check"),
    ("zorder_file_layout", "narrow bit-math; one ≤256-group zvalue exchange"),
    ("scd2_customer_history", "ONE custkey exchange serves row_number/lead/running-sum (fused Window)"),
    ("global_rank_export", "one lang exchange for the keyed rank; |langs|-row offset broadcast"),
    ("snapshot_diff_orders", "exchanges carry (key, 32-byte row-hash), not the full row"),
    ("encoding_anomaly_flags", "zero inherent shuffle: narrow regexp counts on a 2-column scan"),
    ("compaction_file_plan", "one lang exchange: running-sum window + per-file agg share it"),
    # round-4 operators
    ("semantic_decontamination", "corpus x eval equi-join on the LSH bucket; eval side broadcast (benchmarks are small)"),
    ("unigram_logprob_quality", "(doc_id, token) pair exchange + vocab join + two-phase rank; no single-partition window over the corpus"),
    ("bigram_logprob_quality", "(w1,w2) pair-count exchange + pruned-model join-back (AQE-decided side) + per-doc agg; pairs built array-side, no lag window"),
    # round-6 session-2 operators
    ("hll_distinct_users", "bucket groupBy-max partials (<=256 rows/task); sketch state constant in data"),
    ("countmin_top_terms", "token stream collapses map-side to vocab; 3x16 cell table + TakeOrdered top terms"),
    ("rrf_hybrid_retrieval", "both retrievers TakeOrdered to <=20 rows before the fusion full-outer join"),
    ("normalized_exact_dedup", "one (id, 32-hex-hash) exchange; normalization is zero-UDF codegen"),
    ("edit_distance_near_dup", "round-robin candidate spread (tiny-row/heavy-CPU stage); banded lev post-barrier"),
    ("hot_key_skew_report", "map-side-partial key counts, TakeOrdered, 1-row broadcast total"),
    ("incremental_mv_refresh", "delta aggregates sized by |changes|; MV merge is a tiny full-outer join"),
    ("ann_matryoshka_recall", "broadcast query side per truncation; three 1-row recall aggs union at the tail"),
    ("video_scene_cut_stats", "decode fan-out inside the Arrow batch; only (id, pair, sad) rows cross exchanges"),
    ("audio_zcr_stats", "all-integer per-clip rows out of the decode stage; one media_id hash agg"),
    # round-7 operators
    ("exact_substring_spans", "(id, start, hash64) gram postings; interval merge is per-row array math"),
    ("bpe_learn_merges_batched", "vocab-sized pair-count exchanges, one per PASS (not per merge)"),
    ("priority_sample_per_lang", "one lang exchange; WindowGroupLimit trims to top-(k+1) per map partition first"),
    ("value_histogram_quantiles", "<=64 bin partials per map task; all downstream frames are sketch-sized"),
    # round-8 operators
    ("pareto_frontier_parts", "distinct-price agg exchange only; dominance bounds broadcast back — the corpus never shuffles"),
    ("frequent_item_pairs", "basket-keyed item self-join + map-side-combined pair partials; <=cap^2/2 pairs per basket"),
    ("theil_sen_trend", "day pre-agg exchange; the O(days^2) pair join runs over calendar-bounded rows per key"),
    ("cusum_changepoints", "ONE event_type sort exchange shared by all four window aggregates (closed-form Page recursion)"),
    ("asof_join_nearest", "1 exchange: union-tag window; both directional candidates from one sort"),
    ("sorted_neighborhood_dup_pairs", "prefix-rank exchange + 8-byte rank-key candidate join; exactly (w-1)*n candidates"),
    ("containment_dup_pairs", "capped postings joins on 60-bit gram keys; hot grams dropped before the self-join"),
    ("hbos_outliers", "two broadcast-sized histogram aggs joined back; TakeOrdered on the integer key — no corpus shuffle"),
    ("benford_deviation", "one hash agg: nine conditional digit counts in a single pass"),
    ("ks_drift_matrix", "grid-bounded ECDF exchanges (value domain, not corpus); integer sup key"),
    ("moving_median_daily", "day agg + one keyed window sort over calendar-bounded frames"),
    ("copurchase_bfs_distances", "per-level ids-only frontier joins over the support-filtered edge list"),
    ("seasonality_profile", "two map-side-combined aggs; totals broadcast"),
    ("hll_register_rollup_weekly", "<=256 register rows per day shuffled; weekly merge is register max"),
    ("hard_negatives_topk", "broadcast query side; corpus streams once into a tiny-key top-k window"),
    ("negative_sampling_pairs", "two-phase ordinal rank + 8-byte ordinal equi-join; offsets and N broadcast"),
    ("token_gini_by_lang", "distinct-count-domain window per lang; all-BIGINT rank sums, map-side combined"),
    ("histogram_quantiles_weekly", "<=64 bin partials per (week, day) map task; all downstream frames are sketch-sized"),
    # round-9 operators
    ("tv_drift_daily", "(day, bin) count exchange only — 16-bin grid and reference broadcast; TV is a per-day BIGINT fold"),
    ("unigram_lm_vocab", "words-frame aggs per EM pass (vocab-collapsed corpus); piece set broadcast to the Arrow matcher"),
    ("sorted_neighborhood_multipass", "3 prefix-rank exchanges + id-pair union distinct + round-robin respread before ONE levenshtein verify"),
    ("weighted_sample_global", "no corpus shuffle: TakeOrderedAndProject top-(k+1); rank/tau window over k+1 rows"),
    ("mmr_diversified_topk", "brute-force pool scan (queries broadcast); k argmax rounds over persisted (queries x pool) frames"),
    ("twap_daily", "ONE (key, day) sort exchange shared by the lead() gap and the final agg"),
    # round-9 session-2 operators
    ("quality_score_auc", "(group, score) domain agg + domain window; corpus never re-shuffles"),
    ("keyness_chi2_terms", "(group, term) hash agg is the only corpus-sized exchange; totals broadcast; domain-frame top-k"),
    ("conformal_anomaly_pvalues", "distinct-cents domain cumsum + score equi-join; TakeOrdered selection"),
    ("allpairs_binary_cosine", "df-capped shingle postings self-join; sizes join on id; integer threshold pre-filters the cosine"),
    ("knn_graph_stats", "LSH-bucket pair join + one qid window; mutual flag is an edge-list self-join"),
    ("ols_trend_daily", "one day agg + one |keys|-row moment agg — calendar-bounded like theil_sen"),
    ("lof_outliers", "bucket pair join + qid window; k-dist/reach/density stages are edge-list joins/aggs"),
    ("rake_keywords", "word-domain hash agg only; phrase split is per-row narrow"),
    ("hilbert_file_layout", "narrow unrolled xy2d bit-math; final exchange bounded at 256 groups"),
    ("acf_daily", "one day agg + ONE keyed sort serving the (n,S) window and all three leads"),
    ("mann_kendall_trend", "day agg + calendar-bounded pair self-join (the theil_sen shape, x100-probed there); tie terms from a domain-sized (key, value) agg"),
    # round 10
    ("spearman_corr_daily", "one day agg; rank windows partition by KEY over calendar-bounded frames; |keys|-row moment agg"),
    ("fano_burstiness_daily", "one map-side (key, day) count agg, then a |keys|-row moment agg"),
    ("quality_screen_agreement_kappa", "two narrow doc scans exchange (doc_id, flag) pairs; |langs|-row contingency agg"),
    ("mahalanobis_outliers", "one 10-BIGINT stats row broadcast; vectors never shuffle; TakeOrdered top-k"),
    ("kcore_neardup", "6 peels x (degree agg + 2 node-keyed semi-joins, AQE-planned) over the LSH-verified edge list, which only shrinks"),
    # round 10 session 2
    ("ccf_daily", "one corpus day agg, then 4 calendar-bounded lag joins of two |days|-row frames"),
    ("kendall_tau_daily", "day agg + calendar-bounded day-pair self-join (the mann_kendall shape) + two domain-sized tie aggs"),
    ("snm_blocking_quality", "two verified pair pipelines reduced to 1-row counts; the intersection joins id pairs only"),
    ("neardup_clustering_coeff", "ordered wedge joins over the LSH-verified edge list; corner explode feeds a map-side per-node agg"),
    # round 11
    ("pacf_daily", "acf_daily's single keyed exchange+sort; Durbin-Levinson is column math on the |keys|-row aggregate"),
    ("mahalanobis_outliers_d8", "one 45-BIGINT stats row (bounded d^2 collect); per-row substitution is literal math; TakeOrdered top-k"),
    ("pagerank_neardup", "per iteration: rank-onto-edges join + dst agg; node frames AQE-planned (no forced broadcast)"),
    ("dw_autocorr_daily", "acf_daily's single keyed exchange+sort; DW is one BIGINT ratio on the |keys|-row aggregate"),
    ("hodges_lehmann_daily", "calendar-bounded Walsh-pair self-join; |keys|-row median agg"),
    ("sn_scale_daily", "calendar-bounded day-pair self-join; (key, day) median then |keys|-row median"),
    ("neardup_component_size_histogram", "the CC pipeline's exchanges; both added GROUP BYs are component-/size-domain sized"),
    ("media_phash_dct", "narrow mapInPandas decode+DCT; only (id, 8-byte fingerprint, popcount) rows reach an exchange"),
    ("robust_daily_outliers", "the HL + Sn calendar-bounded pair joins; |keys|-row frames join back onto the daily frame"),
    ("maha_dim_attribution", "stateless literal-substitution scan; ONE d-counter map-side agg to a single row, stack()ed to d rows"),
    ("dedup_quality_shift", "the dedup pipeline's own exchanges + a doc_id marker join + a 2-group map-side agg"),
]


def rest(spark, path: str):
    port = spark.sparkContext.uiWebUrl.rsplit(":", 1)[1]
    with urllib.request.urlopen(f"http://localhost:{port}/api/v1/{path}") as r:
        return json.load(r)


def main() -> None:
    spark = get_spark("shuffle-audit", extra_conf={"spark.ui.enabled": "true"})
    app_id = spark.sparkContext.applicationId
    qs = all_queries()

    import time

    def stable_stages():
        """The status store is fed by an async listener bus — poll until
        the completed-stage count stops moving so no stage's bytes are
        attributed to the wrong query (or dropped)."""
        prev = -1
        for _ in range(50):
            cur = rest(spark, f"applications/{app_id}/stages?status=complete")
            if len(cur) == prev:
                return cur
            prev = len(cur)
            time.sleep(0.2)
        return cur

    rows = []
    for name, note in PROBE:
        before = {s["stageId"]: s for s in stable_stages()}
        qs[name](spark, SF).write.mode("overwrite").format("noop").save()
        after = stable_stages()
        new = [s for s in after if s["stageId"] not in before]
        shuffle_write = sum(s.get("shuffleWriteBytes", 0) for s in new)
        tasks = sum(s.get("numCompleteTasks", 0) for s in new)
        rows.append((name, shuffle_write, len(new), tasks, note))

    lines = [
        "# SHUFFLE_AUDIT — measured shuffle bytes per headline query (sf0.1)",
        "",
        "Generated by `python tools/shuffle_audit.py` (Spark status REST API;",
        "noop sink, so bytes are pure plan cost). Shuffle-write bytes are the",
        "data actually crossing stage boundaries — the quantity that dominates",
        "cost at 100 TB.",
        "",
        "| query | shuffle write | stages | tasks | why this is the floor |",
        "|---|---|---|---|---|",
    ]
    for name, sw, stages, tasks, note in rows:
        human = f"{sw / 1024:.1f} KiB" if sw < 1 << 20 else f"{sw / (1 << 20):.2f} MiB"
        lines.append(f"| {name} | {human} | {stages} | {tasks} | {note} |")
    lines.append("")
    with open("docs/SHUFFLE_AUDIT.md", "w") as f:
        f.write("\n".join(lines))
    print("\n".join(lines))


if __name__ == "__main__":
    main()
