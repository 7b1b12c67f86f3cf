"""Scale probe: replicate the sf0.1 tables N× into /tmp and measure how
headline query wall-clock scales — evidence that the plans are linear
(scan/agg) or near-linear (window, join) rather than quadratic.

    python tools/scale_probe.py [N]

Writes docs/SCALE_NOTES.md.
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from flink_anomaly_spark.plans.registry import all_queries
from flink_anomaly_spark.session import get_spark
from flink_anomaly_spark.tables import TABLE_NAMES, load_table

BASE_SF = "/root/testdata/sf0.1"

#: queries whose scaling behavior we certify (the O(n²)-output flagship
#: is intentionally excluded — its OUTPUT grows quadratically by spec,
#: see operators/stateful.py)
PROBE = [
    "tpch_q1_pricing",
    "tpch_q6_forecast",
    "revenue_by_nation",
    "window_argmax",
    "keyed_concat_total",
    "zscore_outliers",
    "topk_orders",
    "exact_dedup",
    "asof_last_signup",
    # round-3 additions: narrow text/embedding pipelines + the IVF probe
    # join (pair-generating dedup ops are NOT probed on replicated docs —
    # replication makes every doc a 30-way duplicate, a pathological
    # quadratic-pairs corpus that measures the wrong thing; their scaling
    # evidence is the per-SF shuffle audit instead)
    "langid_char_ngram",
    "gopher_quality_flags",
    "doc_repetition_profile",
    "embedding_dim_stats",
    "embedding_int8_quantize",
    "embedding_ann_ivf",
    "ohlc_resample",
    # late round-3 additions (pair-generating dedup/eval ops stay
    # excluded per the replication policy above)
    "char_entropy",
    "winsorized_event_stats",
    "bigram_pmi_top",
    "language_sampling_weights",
    "embedding_covariance",
    "udaf_weighted_mean",
    "tpch_q5_local_supplier",
    "tpch_q13_cust_distribution",
    "lineitem_grouping_sets",
    # final round-3 additions (pair-generating ops — prefix filter,
    # incremental dedup, triangles — stay excluded per the replication
    # policy; their scaling evidence is the shuffle audit)
    "bloom_prefilter_urgent_revenue",
    "embedding_random_projection",
    "doc_token_chunks",
    "weighted_doc_sample",
    "quality_quantile_normalize",
    "cohort_retention",
    "table_column_profile",
    "tpch_q2_min_cost_supplier",
    "tpch_q9_product_profit",
    "tpch_q16_supplier_cnt",
    "tpch_q20_part_promotion",
    # governance/layout additions (boilerplate removal is replication-
    # safe: DF thresholds are corpus-FRACTION-based, so replicating docs
    # and corpus together leaves every segment's relative DF unchanged)
    "boilerplate_segment_removal",
    "data_quality_suite",
    "zorder_file_layout",
    "scd2_customer_history",
    "global_rank_export",
    "snapshot_diff_orders",
]

#: fact-shift key per replicated table (dims stay unreplicated)
_SHIFT_KEYS = {
    "events": "event_id",
    "lineitem": "l_orderkey",
    "orders": "o_orderkey",
    "documents": "doc_id",
    "embeddings": "vec_id",
}


def replicate(spark, n: int, out_dir: str) -> None:
    for t in TABLE_NAMES:
        df = load_table(spark, BASE_SF, t)
        if t in _SHIFT_KEYS:
            key = _SHIFT_KEYS[t]
            parts = [df]
            for i in range(1, n):
                parts.append(df.withColumn(key, F.col(key) + F.lit(i * 10_000_000)))
            df = parts[0]
            for p in parts[1:]:
                df = df.unionByName(p)
        df.write.mode("overwrite").parquet(os.path.join(out_dir, f"{t}.parquet"))


def time_queries(spark, sf_dir: str) -> dict[str, float]:
    out = {}
    qs = all_queries()
    for name in PROBE:
        qs[name](spark, sf_dir).write.mode("overwrite").format("noop").save()  # warm
        t0 = time.perf_counter()
        qs[name](spark, sf_dir).write.mode("overwrite").format("noop").save()
        out[name] = time.perf_counter() - t0
    return out


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    spark = get_spark("scale-probe")
    big_dir = tempfile.mkdtemp(prefix="scaleprobe_")
    try:
        # time the baseline BEFORE the replicate write job — measuring it
        # after inherits that job's GC/page-cache noise and produces
        # nonsense ratios
        base = time_queries(spark, BASE_SF)
        replicate(spark, n, big_dir)
        big = time_queries(spark, big_dir)
        lines = [
            "# SCALE_NOTES — measured wall-clock scaling",
            "",
            f"Facts (events/lineitem/orders) replicated ×{n} from sf0.1 "
            f"(≈{n * 0.1:g} SF-equivalent, ~{n * 600}k lineitem rows); dims unchanged. "
            "Ratio ≈ N ⇒ linear; ratio ≪ N ⇒ fixed overhead dominates at sf0.1.",
            "",
            "| query | sf0.1 s | ×{n} s | ratio |".replace("{n}", str(n)),
            "|---|---|---|---|",
        ]
        for name in PROBE:
            r = big[name] / base[name] if base[name] > 0 else float("nan")
            lines.append(f"| {name} | {base[name]:.2f} | {big[name]:.2f} | {r:.1f}× |")
        lines.append("")
        # preserve the hand-written narrative sections (everything from
        # the first "## " heading onward)
        tail = ""
        try:
            cur = open("docs/SCALE_NOTES.md").read()
            idx = cur.find("\n## ")
            if idx != -1:
                tail = cur[idx:]
        except OSError:
            pass
        with open("docs/SCALE_NOTES.md", "w") as f:
            f.write("\n".join(lines) + tail)
        print("\n".join(lines))
    finally:
        shutil.rmtree(big_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
