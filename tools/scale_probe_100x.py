"""x100 scale probe for the three shuffle-heaviest query shapes.

The x10/x30 probe (tools/scale_probe.py) certifies wall-clock scaling
for the narrow/agg shapes but deliberately EXCLUDES the pair-generating
dedup operators: replicating documents verbatim makes every doc an
N-way near-duplicate, a pathological quadratic-pairs corpus that
measures the wrong thing. This probe pushes one more decade (x100) for
the three shapes the round-3 shuffle audit ranked heaviest —
``tpch_q21_late_blame``, ``prefix_filter_jaccard_pairs``,
``cross_doc_repeated_ngrams`` — and synthesizes NON-DUPLICATE
replicas so the workload grows linearly the way a real 100x corpus
would:

- facts (lineitem/orders): key-shifted copies (orderkeys disjoint per
  replica), exactly like the x10 probe;
- documents: every token gets a replica-id suffix
  (``concat(tok, 'r', rep)``), so replica token/gram SPACES are
  disjoint — cross-replica Jaccard ~ 0, no artificial near-dup pairs,
  and the gram-key shuffle grows like a genuinely bigger corpus.

Recorded per query at base and x100: wall seconds, shuffle-write
bytes (Spark status REST, same method as tools/shuffle_audit.py), and
shuffle BYTES PER INPUT FACT ROW — the number that must stay ~flat for
the plan to survive a 100 TB scale-up (flat bytes/row = total shuffle
grows linearly with data; growing bytes/row = a super-linear shuffle
lurking). Appends/refreshes the "## x100 scale probe" section of
docs/SCALE_NOTES.md.

    python tools/scale_probe_100x.py [N]          # default 100
"""

from __future__ import annotations

import json
import os
import re
import shutil
import sys
import tempfile
import time
import urllib.request

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from flink_anomaly_spark.plans.registry import all_queries
from flink_anomaly_spark.session import get_spark
from flink_anomaly_spark.tables import TABLE_NAMES, load_table

BASE_SF = "/root/testdata/sf0.1"

#: (query, fact table whose row count normalizes shuffle bytes)
PROBE = [
    ("tpch_q21_late_blame", "lineitem"),
    ("prefix_filter_jaccard_pairs", "documents"),
    ("cross_doc_repeated_ngrams", "documents"),
    # round-4 extension: the composed 5-stage curation pipeline (the
    # bench's most expensive query — disjoint replica token spaces keep
    # its MinHash/exact-dedup stages honest) and the CCNet-style LM
    # quality op (heaviest (doc_id, token) shuffle + two-phase ntile)
    ("corpus_curation_pipeline", "documents"),
    ("unigram_logprob_quality", "documents"),
    # round-5 extension: the winnowing postings join (fingerprint-
    # bucketed pair generation — disjoint replica gram spaces keep the
    # postings lists base-sized) and the span-removal transform (gram
    # hash-count groupBy + postings join + array reconstruction)
    ("winnowing_dup_pairs", "documents"),
    ("span_dedup_clean", "documents"),
    # round-6 extension (VERDICT r5 #7): the BPE trainer (vocab-sized
    # pair-count groupBy per merge step — replica-suffixed tokens grow
    # the vocab x n, the worst case for it) and the Lloyd-trained PQ
    # index (assignment is a narrow literal-inlined map; the ONLY
    # shuffle is the k*dim fixed-point model partials, which must stay
    # ~constant-size — i.e. B/row should DROP ~n-fold at x n)
    ("bpe_learn_merges", "documents"),
    ("embedding_ann_pq_lloyd", "embeddings"),
    # round-6 session-2 extension: the fixed-register sketches (B/row
    # must DROP ~n-fold — the shuffle is m registers / d*w cells, not
    # data), the normalize-then-hash dedup (one (id, hash) exchange —
    # flat B/row), and the blocked edit-distance pairs (replica-
    # suffixed SOURCES keep blocks base-sized, so candidates — and the
    # banded-levenshtein CPU — grow linearly, not quadratically)
    ("hll_distinct_users", "events"),
    ("countmin_top_terms", "documents"),
    ("normalized_exact_dedup", "documents"),
    ("edit_distance_near_dup", "documents"),
    # round-7 extension (VERDICT r6 #5): the remaining session-2
    # shapes. gap_fill grows events-per-user under key-shifted events
    # (the per-key hour grid is calendar-bounded, so B/row must DROP);
    # the KMV AnotB reduces each side to k=256 hashes before set
    # algebra (B/row must DROP ~n-fold); IVFPQ-rerank's only wide ops
    # are the two TakeOrdereds over the persisted encode (B/row ~0).
    # rrf caveat: the disjoint-token corpus empties the lexical
    # postings (query terms are base-vocabulary), so its x100 row
    # measures the dense side + scan floor — documented in SCALE_NOTES.
    ("gap_fill_forward_daily", "events"),
    ("kmv_custkey_difference", "orders"),
    ("embedding_ann_ivfpq_rerank", "embeddings"),
    ("rrf_hybrid_retrieval", "documents"),
    # round-8 extension: the pair-mining self-join (key-shifted
    # orderkeys keep baskets base-sized — pairs must grow linearly,
    # flat B/row), the CUSUM keyed sort (flat B/row), the grid-bounded
    # KS ECDF and the domain-bounded skyline (B/row must DROP ~n-fold —
    # their exchanges carry the VALUE DOMAIN, not the corpus), and the
    # two new dedup blockers over disjoint-token replicas (SNM rank
    # candidates are exactly (w-1)·n; containment postings lists stay
    # base-sized).
    ("frequent_item_pairs", "lineitem"),
    ("cusum_changepoints", "events"),
    ("ks_drift_matrix", "events"),
    ("pareto_frontier_parts", "part"),
    ("sorted_neighborhood_dup_pairs", "documents"),
    ("containment_dup_pairs", "documents"),
    # round-9 extension part 1 (VERDICT r8 #7): the remaining round-8
    # shapes. theil_sen/seasonality-class day pre-aggs and the two
    # sketch ROLLUPS carry calendar/register-bounded exchanges (B/row
    # must DROP ~n-fold); asof's union-sort and negative sampling's
    # ordinal exchanges are corpus-linear (flat B/row); copurchase BFS
    # edges stay basket-bounded under key-shifted orderkeys.
    ("theil_sen_trend", "events"),
    ("copurchase_bfs_distances", "lineitem"),
    ("asof_join_nearest", "events"),
    ("negative_sampling_pairs", "documents"),
    ("hll_register_rollup_weekly", "events"),
    ("histogram_quantiles_weekly", "events"),
    # round-9 extension part 2: the new round-9 shapes. twap's keyed
    # (type, day) sort is corpus-linear (flat); tv_drift's (day, bin)
    # exchange is grid-bounded (DROPS); weighted_sample_global is
    # TakeOrdered-only (B/row ~0); multipass SNM candidates are exactly
    # 3(w-1)·n (flat); the unigram trainer's aggregates are vocab-sized
    # over replica-suffixed tokens (its worst case, like the BPE row);
    # MMR's iterative stage is (queries·pool)-bounded after the
    # brute-force pool scan (B/row ~0).
    ("twap_daily", "events"),
    ("tv_drift_daily", "events"),
    ("weighted_sample_global", "documents"),
    ("sorted_neighborhood_multipass", "documents"),
    ("unigram_lm_vocab", "documents"),
    ("mmr_diversified_topk", "embeddings"),
    # round-9 session-2 extension: AUC/conformal/OLS exchanges are
    # score-/cents-/calendar-DOMAIN bounded (B/row must DROP ~n-fold);
    # keyness and RAKE aggregate the replica-suffixed token vocab (xn
    # vocab — their worst case, like the BPE row — linear, flat
    # B/row); binary cosine's df-capped postings stay base-sized under
    # disjoint replica shingles (flat B/row); hilbert's final exchange
    # is 256 rows (DROPS). knn_graph_stats and lof_outliers are NOT
    # probed: verbatim-replicated vectors are the pathological N-way-
    # duplicate corpus for within-bucket pair generation (the same
    # exclusion as embedding_near_dup_lsh) — their per-bucket pair
    # bound is documented in SCALE_NOTES prose instead.
    ("quality_score_auc", "documents"),
    ("keyness_chi2_terms", "documents"),
    ("conformal_anomaly_pvalues", "events"),
    ("allpairs_binary_cosine", "documents"),
    ("ols_trend_daily", "events"),
    ("rake_keywords", "documents"),
    ("hilbert_file_layout", "documents"),
    # round-10 extension: mann_kendall gets its OWN row (VERDICT r9 #8
    # asked for the delegation to theil_sen to be stated or measured —
    # now both: the day pre-agg is theil_sen's, the extra tie-term agg
    # is day-frame bounded, B/row must DROP ~n-fold). Spearman/Fano are
    # the same calendar-bounded signature (DROP). Kappa exchanges one
    # (doc_id, flag) pair per screen (flat B/row). Mahalanobis
    # exchanges a single 10-BIGINT stats row + TakeOrdered (DROPS;
    # verbatim-replicated vectors are fine here — no pair space, just a
    # bigger mean/covariance population). kcore_neardup: disjoint
    # replica token spaces keep each replica's near-dup edges internal,
    # so the peeled edge list grows linearly (flat B/row).
    ("mann_kendall_trend", "events"),
    ("spearman_corr_daily", "events"),
    ("fano_burstiness_daily", "events"),
    ("quality_screen_agreement_kappa", "documents"),
    ("mahalanobis_outliers", "embeddings"),
    ("kcore_neardup", "documents"),
    # round-10 session 2: ccf/kendall are the calendar-bounded day-agg
    # signature (B/row DROPS ~n-fold); snm_blocking_quality reduces two
    # pair pipelines to 1-row counts — its exchanges are the pipelines'
    # own (flat, see their rows) plus the id-pair intersection;
    # clustering coeff re-shuffles only the LSH-verified edge list and
    # its corner explode (flat B/row, the kcore argument).
    ("ccf_daily", "events"),
    ("kendall_tau_daily", "events"),
    ("snm_blocking_quality", "documents"),
    ("neardup_clustering_coeff", "documents"),
    # round-11 (VERDICT r10 #3): the forced |nodes|-frame broadcasts
    # came OFF the graph family — these rows re-measure the hint-free
    # plans (AQE picks broadcast at probe scale, shuffle past the
    # threshold; the per-iteration exchanges are the edge list + the
    # node-sized degree/keep frames, flat B/row either way).
    ("pagerank_neardup", "documents"),
    # round-12: the bigram stupid-backoff scorer. Replica-suffixed
    # tokens make BOTH model sides grow xn (unigram vocab and the
    # count-pruned bigram table — its worst case, like the BPE/unigram
    # trainer rows); the (w1,w2) pair stream is corpus-linear; the
    # pruned-model join-back is hint-free, so past the broadcast
    # threshold its model side crosses the exchange once (the
    # edit_distance one-time-transition class, bounded B/row).
    ("bigram_logprob_quality", "documents"),
]

_KEY_SHIFT = {
    "lineitem": ["l_orderkey"],
    "orders": ["o_orderkey"],
    "documents": ["doc_id"],
    # replica 0 is the identity shift, so the PQ init/query ids
    # (vec_id 0..15, 42) keep existing in the replicated corpus
    "embeddings": ["vec_id"],
    "events": ["event_id"],
    # round 8: the skyline probe needs a bigger part table; key-shifted
    # partkeys leave the (price, size) distribution identical, so the
    # frontier itself stays domain-sized while the corpus grows x n
    "part": ["p_partkey"],
}


def replicate(spark, n: int, out_dir: str) -> None:
    """Write x-n replicas of the probe's fact tables into out_dir;
    symlink every other table unchanged. One broadcast-nested-loop
    cross join against a n-row range — a narrow x-n fan-out, no
    driver-side loops or n-branch union plans."""
    reps = spark.range(n).select(F.col("id").alias("__rep"))
    for t in TABLE_NAMES:
        dst = os.path.join(out_dir, f"{t}.parquet")
        if t not in _KEY_SHIFT:
            os.symlink(os.path.join(BASE_SF, f"{t}.parquet"), dst)
            continue
        df = load_table(spark, BASE_SF, t).crossJoin(F.broadcast(reps))
        for k in _KEY_SHIFT[t]:
            df = df.withColumn(k, F.col(k) + F.col("__rep") * F.lit(100_000_000))
        if t == "documents":
            # disjoint token space per replica (see module docstring);
            # n_chars drifts slightly vs text but no probe query uses it
            df = df.withColumn(
                "text",
                F.expr(
                    "concat_ws(' ', transform(split(text, '\\\\s+'), "
                    "t -> concat(t, 'r', CAST(__rep AS STRING))))"
                ),
            )
            # disjoint BLOCK space per replica: a 100x corpus has ~100x
            # the sources, not 100x-bigger blocks — without this the
            # block-quadratic shapes (edit_distance_near_dup) would be
            # probed on a pathological corpus where every block is
            # n-way inflated (round-6 session-2)
            df = df.withColumn(
                "source", F.concat("source", F.lit("r"), F.col("__rep").cast("string"))
            )
        df.drop("__rep").write.mode("overwrite").parquet(dst)


def rest(spark, path: str):
    port = spark.sparkContext.uiWebUrl.rsplit(":", 1)[1]
    with urllib.request.urlopen(f"http://localhost:{port}/api/v1/{path}") as r:
        return json.load(r)


def stable_stages(spark, app_id):
    prev = -1
    for _ in range(50):
        cur = rest(spark, f"applications/{app_id}/stages?status=complete")
        if len(cur) == prev:
            return cur
        prev = len(cur)
        time.sleep(0.2)
    return cur


def measure(spark, app_id, sf_dir: str) -> dict[str, dict]:
    from flink_anomaly_spark.operators.dedup import release_cached

    qs = all_queries()
    out = {}
    for name, fact in PROBE:
        qs[name](spark, sf_dir).write.mode("overwrite").format("noop").save()  # warm
        release_cached()  # the warm run's persisted intermediates
        before = {s["stageId"] for s in stable_stages(spark, app_id)}
        t0 = time.perf_counter()
        qs[name](spark, sf_dir).write.mode("overwrite").format("noop").save()
        wall = time.perf_counter() - t0
        new = [s for s in stable_stages(spark, app_id) if s["stageId"] not in before]
        sw = sum(s.get("shuffleWriteBytes", 0) for s in new)
        rows = load_table(spark, sf_dir, fact).count()
        out[name] = {"wall": wall, "shuffle": sw, "rows": rows}
        # x100 persisted frames (pair-mining items, containment gram
        # arrays, KS ECDF) are multi-GB — un-released they accumulate
        # across the 23 probe entries and starve later broadcast builds
        # (observed: OOM on the round-8 first full run)
        release_cached()
    return out


def _existing_rows() -> dict[str, str]:
    """Parse the committed probe table so a SUBSET run (names on argv)
    can re-measure only new/changed shapes and keep every other row —
    re-running all ~47 entries costs ~an hour (allpairs x100 alone is
    ~12 min), which would make adding one probe row prohibitive."""
    try:
        cur = open("docs/SCALE_NOTES.md").read()
    except OSError:
        return {}
    m = re.search(r"\n## x100 scale probe.*?\n\|---.*?\n(.*?)(?:\n\n|\n?$)", cur, re.S)
    if not m:
        return {}
    rows = {}
    for line in m.group(1).splitlines():
        parts = line.split("|")
        if len(parts) > 2:
            rows[parts[1].strip()] = line
    return rows


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit() else 100
    only = {a for a in sys.argv[2:]} if len(sys.argv) > 2 else None
    global PROBE
    full_order = [name for name, _ in PROBE]
    kept_rows = _existing_rows()
    if only:
        missing = only - {name for name, _ in PROBE}
        if missing:
            raise SystemExit(f"not in PROBE: {sorted(missing)}")
        PROBE = [(name, fact) for name, fact in PROBE if name in only]
    spark = get_spark("scale-probe-100x", extra_conf={"spark.ui.enabled": "true"})
    app_id = spark.sparkContext.applicationId
    big_dir = tempfile.mkdtemp(prefix="scaleprobe100_")
    try:
        base = measure(spark, app_id, BASE_SF)
        replicate(spark, n, big_dir)
        big = measure(spark, app_id, big_dir)
        lines = [
            f"## x100 scale probe (rounds 4-10) — shuffle bytes/row at x{n} facts",
            "",
            f"Generated by `python tools/scale_probe_100x.py {n}`. Documents are",
            "replicated with DISJOINT per-replica token spaces (every token gets",
            "a replica suffix) so the pair-generating shapes scale like a real",
            "bigger corpus instead of a pathological N-way-duplicate one; facts",
            "are key-shifted. `B/row` = shuffle-write bytes / input fact rows —",
            "flat B/row across a 100x scale-up means total shuffle grows",
            "linearly with data, i.e. the plan's shuffle survives 100 TB.",
            "",
            f"| query | sf0.1 s | x{n} s | sf0.1 shuffle | x{n} shuffle | sf0.1 B/row | x{n} B/row | B/row ratio |",
            "|---|---|---|---|---|---|---|---|",
        ]
        measured = {name for name, _ in PROBE}
        for name in full_order:
            if name not in measured:
                # subset run: carry the committed row forward untouched
                if name in kept_rows:
                    lines.append(kept_rows[name])
                continue
            b, g = base[name], big[name]
            bpr_b = b["shuffle"] / b["rows"]
            bpr_g = g["shuffle"] / g["rows"]
            fmt = lambda x: f"{x / (1 << 20):.1f} MiB" if x >= 1 << 20 else f"{x / 1024:.1f} KiB"
            # a zero-shuffle base (TakeOrdered-only plans, e.g.
            # weighted_sample_global) has no meaningful ratio
            ratio = f"{bpr_g / bpr_b:.2f}x" if bpr_b > 0 else ("0 (none)" if bpr_g == 0 else "n/a (base 0)")
            lines.append(
                f"| {name} | {b['wall']:.2f} | {g['wall']:.2f} | {fmt(b['shuffle'])} "
                f"| {fmt(g['shuffle'])} | {bpr_b:.1f} | {bpr_g:.1f} | {ratio} |"
            )
        lines.append("")
        section = "\n".join(lines)
        cur = open("docs/SCALE_NOTES.md").read()
        marker = "\n## x100 scale probe"
        if marker in cur:
            head, rest_ = cur.split(marker, 1)
            # stop at the next section that is NOT this probe's own table
            # ("## x100 probe analysis" is hand-written and must survive)
            nxt = re.search(r"\n## (?!x100 scale probe)", rest_)
            cur = head + (rest_[nxt.start() :] if nxt else "")
        with open("docs/SCALE_NOTES.md", "w") as f:
            f.write(cur.rstrip("\n") + "\n\n" + section)
        print(section)
    finally:
        shutil.rmtree(big_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
