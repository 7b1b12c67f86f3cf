"""Optimization-round probe: per-query wall time, Spark job count, and
the FINAL (post-AQE) executed plan with Exchange / Python-eval node
counts — the measurement harness guide §1 asks for, without the UI.

    python tools/opt_probe.py <sf_dir> <query> [<query> ...]
    python tools/opt_probe.py --plans-dir plans/r12 --suffix before \
        <sf_dir> <query> ...   # also dump explain("formatted") files

Timing protocol matches bench.py (1 warm + best-of-2 timed, noop sink,
release_cached between runs) so numbers are comparable to
BENCH_DETAIL.json rows. Job count comes from a per-query job group —
each Spark action (collect/count/checkpoint/broadcast-build) surfaces
as one or more jobs, so this is the direct measure of how many passes
an operator's builder+plan actually runs.
"""

from __future__ import annotations

import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from flink_anomaly_spark.operators.dedup import release_cached
from flink_anomaly_spark.plans.registry import all_queries
from flink_anomaly_spark.session import get_spark


def final_plan(df) -> str:
    """executedPlan AFTER an action: with AQE this is the final adaptive
    plan (isFinalPlan=true), the one explain() cannot show pre-run."""
    return df._jdf.queryExecution().executedPlan().toString()


def formatted_explain(df) -> str:
    """explain("formatted") as a string (what df.explain prints)."""
    jvm = df.sparkSession._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return df._jdf.queryExecution().explainString(mode)


def node_counts(plan: str) -> dict[str, int]:
    pats = {
        "Exchange": r"\bExchange (?:hash|range|Single|rangepartitioning)",
        "BroadcastExchange": r"\bBroadcastExchange\b",
        "SortMergeJoin": r"\bSortMergeJoin\b",
        "BroadcastHashJoin": r"\bBroadcastHashJoin\b",
        "ShuffledHashJoin": r"\bShuffledHashJoin\b",
        "ArrowEvalPython": r"\bArrowEvalPython\b",
        "BatchEvalPython": r"\bBatchEvalPython\b",
        "MapInPandas": r"\bMapInPandas\b",
        "Sort": r"\+- Sort \[",
        "HashAggregate": r"\bHashAggregate\b",
        "WholeStageCodegen": r"\bWholeStageCodegen\b",
        "InMemoryTableScan": r"\bInMemoryTableScan\b",
        "ReusedExchange": r"\bReusedExchange\b",
        "Scan parquet": r"Scan parquet",
    }
    return {k: len(re.findall(p, plan)) for k, p in pats.items() if re.findall(p, plan)}


def main() -> None:
    args = sys.argv[1:]
    plans_dir = None
    suffix = "probe"
    if "--plans-dir" in args:
        i = args.index("--plans-dir")
        plans_dir = args[i + 1]
        del args[i : i + 2]
    if "--suffix" in args:
        i = args.index("--suffix")
        suffix = args[i + 1]
        del args[i : i + 2]
    sf_dir, names = args[0], args[1:]
    qs = all_queries()
    spark = get_spark("opt_probe")
    sc = spark.sparkContext
    tracker = sc.statusTracker()
    for name in names:
        fn = qs[name]
        # warm run (codegen, parquet footers, python workers)
        fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
        release_cached()
        best, best_jobs, best_build, plan, best_df = float("inf"), -1, 0.0, "", None
        for run in range(2):
            group = f"{name}-r{run}"
            sc.setJobGroup(group, name)
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            t_build = time.perf_counter() - t0
            df.write.mode("overwrite").format("noop").save()
            dt = time.perf_counter() - t0
            jobs = len(tracker.getJobIdsForGroup(group))
            sc.setJobGroup("idle", "idle")
            if dt < best:
                # keep build time from the SAME run as the headline
                # number (r12 ADVICE: reporting the LAST run's build
                # against the BEST run's wall mixed two runs)
                best, best_jobs, best_build = dt, jobs, t_build
                plan = final_plan(df)
                best_df = df
            release_cached()
        print(
            f"{name}: {best:.3f}s  jobs={best_jobs}  build={best_build:.3f}s  "
            f"{node_counts(plan)}",
            flush=True,
        )
        if plans_dir:
            os.makedirs(plans_dir, exist_ok=True)
            with open(os.path.join(plans_dir, f"{name}_{suffix}.txt"), "w") as f:
                f.write(f"== explain(\"formatted\") — {name} ==\n")
                # reuse the timed run's frame: re-calling the builder
                # re-runs its eager work (collects/checkpoints) for
                # iterative operators
                f.write(formatted_explain(best_df))
                f.write(
                    "\n\n== FINAL executed plan (post-AQE, after the timed "
                    f"noop run; {best:.3f}s, {best_jobs} jobs) ==\n"
                )
                f.write(plan)


if __name__ == "__main__":
    main()
