"""Regenerate docs/PLANS.md: the final (post-AQE) physical plans of the
headline queries, with the scale-relevant properties called out.

    python tools/dump_plans.py
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

from flink_anomaly_spark.plans.contracts import physical_plan
from flink_anomaly_spark.plans.registry import all_queries
from flink_anomaly_spark.session import get_spark

SF = "/root/testdata/sf0.001"

HEADLINE = {
    "tpch_q1_pricing": "Predicate pushed to parquet; map-side partial_sum before the single exchange.",
    "revenue_by_nation": "nation/region broadcast; fact joins hash-partitioned; AQE re-plans at runtime.",
    "topk_orders": "TakeOrderedAndProject — per-partition heap, no global sort shuffle.",
    "flagship_running_concat": "One hash exchange on the key; window sort stays inside the partition.",
    "asof_last_signup": "Union-tag as-of join: one exchange + one window, no join node.",
    "minhash_near_dup_pairs": "Band shuffle carries (id, band, bucket) only; shingles re-joined for verified candidates.",
    # round-3 operators
    "gopher_quality_flags": "Narrow Catalyst-only rule filter: pruned scan, no inherent exchange.",
    "ohlc_resample": "One (event_type, bucket) hash exchange; min_by/max_by arg-selection, no per-window sort.",
    "embedding_int8_quantize": "Narrow encode against inlined min/max literals; no wide exchange after index build.",
    "funnel_transitions": "lag window and per-user agg share one user_id exchange.",
    "cumulative_distinct_users": "min-day/user + day agg + |days|-row window — the linear expanding-distinct rewrite.",
    "tpch_q5_local_supplier": "Snowflake join: nation/region broadcast, supplier hint-free (AQE-decided; broadcast at this scale), same-nation constraint in the join condition.",
    "corpus_curation_pipeline": "Quality vote -> exact dedup -> minhash removal composed by doc_id-only semi/anti joins; final report map-side combined.",
    "char_entropy": "Zero-shuffle Arrow mapInPandas (UTF-32 bincount) — no per-char explode, no exchange.",
    "lineitem_grouping_sets": "Expand over 3 grouping sets collapsed by map-side partial agg before the single exchange.",
    "pagerank_neardup": "Iterative: per-step lineage truncated (checkpointed ranks), edge list materialized once; final plan reads the step-3 frame only.",
    "synthetic_source_agg": "Custom Python DataSource scan with the event_id predicate pushed into the source (PushedFilters on the BatchScan).",
    # final round-3 operators
    "bloom_prefilter_urgent_revenue": "Bitmap build <= m/64 rows via partial bit_or; probe side filtered by 3 broadcast bitmap lookups BEFORE its join exchange.",
    "prefix_filter_jaccard_pairs": "Prefix postings (rarest grams only) feed the candidate self-join; full shingle arrays travel only to verify survivors.",
    "incremental_dedup_new_batch": "One tagged signature pass; band join constrained corpus x batch, so intra-set candidates never materialize.",
    "embedding_random_projection": "Zero-exchange whole-stage-codegen projection: 16 left-associated add-chains per row.",
    "tpch_q2_min_cost_supplier": "Decorrelated min-cost join-back: one (partkey,suppkey) pre-agg exchange; nation/region broadcast, part/supplier frames hint-free (AQE-decided).",
    # governance/layout operators
    "boilerplate_segment_removal": "Segment-DF exchange + broadcast blacklist anti-join; doc reassembly is the only other shuffle.",
    "zorder_file_layout": "Narrow Morton bit-math against 1-row stats + |langs|-row rank broadcasts; final exchange bounded at 256 groups.",
    "scd2_customer_history": "ONE custkey exchange: row_number/lead/running-sum fused into a single Window node.",
    "global_rank_export": "Keyed rank + |langs|-row offset broadcast — global row_number with no single-partition Window over the corpus.",
    "snapshot_diff_orders": "Full-outer diff where exchanges carry (key, md5 row-hash), not the full row width.",
    # round-4/5 operators
    "semantic_decontamination": "Eval side broadcast into the LSH-bucket equi-join; corpus streams with no exchange for the join.",
    "unigram_logprob_quality": "(doc, token) pair shuffle with partial counts; vocab join; two-phase global rank — no single-partition Window.",
    "kmeans_lloyd_outliers": "Final scoring pass: literal-inlined centroids, join-free narrow map into TakeOrderedAndProject (per-iteration update aggs run at plan build).",
    "media_pixel_stats": "Arrow mapInPandas encode -> decode -> stats; payload bytes never cross an exchange, only fixed-width stat rows.",
    "kmv_distinct_users": "Distinct-of-hash partial agg + TakeOrdered bottom-k; 1-row broadcast exact count rides along.",
    "dsir_importance_weights": "Same pair-shuffle floor as the unigram LM op; totals broadcast; per-token score join.",
    "pii_redaction_stats": "Zero-exchange whole-stage-codegen regexp map over the scan.",
    "bitmap_distinct_by_type": "Two-level bitmap agg: per-(type, bucket) bitmap construct, then popcount sum — mergeable distinct.",
    # round-7 operators
    "edit_distance_near_dup": "Probe side round-robin repartitioned BELOW the block-key hash join (single-split input would serialize the banded levenshtein into one task — the round-6 driver's 12s); survivors repartition for downstream parallelism.",
    "exact_substring_spans": "(id, start, hash64) postings; hash-count groupBy + postings join; interval merge + span slice are per-row array math after one id agg.",
    "priority_sample_per_lang": "WindowGroupLimit: per-partition top-(k+1) precedes the single lang exchange; tau + estimate ride the same window layout.",
    "value_histogram_quantiles": "Partial->final 64-bin hash agg is the only data-sized exchange; every later frame is sketch-sized (bins x quantiles).",
    # round-9 session-2 operators
    "quality_score_auc": "Score-domain rank-sum AUC: (group, score) partial agg is the only data-sized exchange; the midrank window runs over the score domain per group.",
    "conformal_anomaly_pvalues": "Calib histogram + zero-count test scores merged on the distinct-cents domain; one domain-sized suffix-cumsum window; test events hash-join the domain map into TakeOrderedAndProject.",
    "lof_outliers": "LSH-bucket pair join -> one qid window for kNN edges; every later stage (k-dist, reachability, both density sums) is edge-list sized joins/aggs; final TakeOrdered.",
    "allpairs_binary_cosine": "df-capped shingle postings self-join; integer cross-multiplied threshold filters BEFORE the cosine projection; sizes join on id only.",
    "hilbert_file_layout": "Narrow unrolled xy2d arithmetic against 1-row stats + |langs|-row rank broadcasts; final exchange bounded at 256 groups (the z-order twin's plan).",
    "rake_keywords": "Regex phrase split is per-row narrow; the (word) hash agg is the only exchange, word-domain sized; TakeOrderedAndProject top-k.",
    # round-10 operators
    "mahalanobis_outliers": "One 10-statistic map-side agg to a single broadcast row; per-row quadratic form is join-free narrow math into TakeOrderedAndProject; vectors never cross an exchange.",
    "spearman_corr_daily": "One (key, day) partial agg; both rank windows share the per-key partitioning; |keys|-row moment agg.",
    "quality_screen_agreement_kappa": "Two narrow document scans exchange (doc_id, flag) pairs only; |langs|-row contingency agg; kappa is per-group scalar math.",
    "kcore_neardup": "Six peels, each one degree agg + two broadcast semi-joins over the checkpoint-truncated, only-shrinking edge list (O(1) lineage).",
    "ccf_daily": "One (key, day) partial agg persisted; each lag is a tiny integer-day equi-join of two calendar-bounded frames into a 1-row moment agg.",
    "kendall_tau_daily": "Day agg persisted; sign-product pair join is calendar-bounded per key; tie aggs are domain-sized; tau is per-key scalar math.",
    "neardup_clustering_coeff": "Two ordered-edge wedge joins (the triangle-count plan) + corner explode into a map-side per-node agg; degree frame broadcast-joined.",
}


def main() -> None:
    spark = get_spark("plan-dump", cpus=8)
    qs = all_queries()
    out = [
        "# PLANS — final physical plans of the headline queries",
        "",
        "Generated by `python tools/dump_plans.py` (post-AQE plans at "
        "sf0.001; plan *shape* is scale-invariant, statistics are not).",
        "",
    ]
    for name, note in HEADLINE.items():
        df = qs[name](spark, SF)
        df.collect()  # materialize so AQE publishes the final plan
        plan = physical_plan(df, "formatted")
        # keep the operator tree, drop the verbose per-node detail
        tree = plan.split("\n\n")[0]
        out += [f"## {name}", "", note, "", "```", tree.rstrip(), "```", ""]
    with open("docs/PLANS.md", "w") as f:
        f.write("\n".join(out))
    print("wrote docs/PLANS.md")


if __name__ == "__main__":
    main()
