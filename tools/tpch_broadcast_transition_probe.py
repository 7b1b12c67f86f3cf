"""TPC-H broadcast→shuffle transition probe (round 12, VERDICT r11 #4).

Round 12 removed the forced ``F.broadcast`` hints on SF-proportional
TPC-H frames (part / supplier / partsupp-derived — VERDICT r11 "What's
wrong" #1). The x100 probe measures the corpus/document pipelines but
no TPC-H query had been pushed past the point where its former
broadcast side outgrows the session's 64 MB
``spark.sql.autoBroadcastJoinThreshold`` — exactly the regime the hint
removal exists for. This probe manufactures that regime and records
the transition the way the edit_distance precedent did:

- ``part`` and ``supplier`` replicate xP (replicated part compresses
  to ~100 KB/1k-replicas on disk and column pruning shrinks the
  estimate further, so the threshold crossing needs x2000+ — measured,
  not assumed: x400 re-compressed to 40 MB and still broadcast);
- ``lineitem`` / ``orders`` replicate xL with matching
  l_orderkey/o_orderkey shifts, and every lineitem row is REMAPPED to
  a deterministic part/supplier replica
  (``key + pmod(xxhash64(orderkey, linenumber), P) * 1e8``) so the
  fact stream references the FULL replicated dim space — the build
  side cannot be pruned to its base slice;
- at base sf0.1 and at the scaled dir, ``tpch_q14_promo`` and
  ``tpch_q9_product_profit`` run to a noop sink; recorded per scale:
  wall seconds, shuffle-write bytes (Spark status REST, the
  shuffle_audit method), shuffle bytes per lineitem row, and the JOIN
  STRATEGY nodes of the FINAL adaptive plan (executedPlan() AFTER the
  action: AQE mutates the cached AdaptiveSparkPlan to its final form).

Pass = the base plan broadcasts part/supplier (BroadcastHashJoin);
mid-scale, AQE re-picks the SMALLEST runtime side as broadcast build
(the side-flips the removed hints forbade); past the threshold on
BOTH sides the strategy switches to a shuffle join WITHOUT a code
change, with B/lineitem-row bounded (each join side crosses an
exchange once — linear, not super-linear). A forced ``broadcast(part)``
hint would instead have built a tens-of-millions-row hash table on
every executor: the OOM class at 100 TB TPC-H, where part is ~2 TB.

    python tools/tpch_broadcast_transition_probe.py [P:L ...]

e.g. ``2000:20 6000:100``. Default ``2000:20 6000:100`` — the first
point lands in the ADAPTIVE regime (one side still under the 64 MB
threshold at runtime: AQE flips the build side to the month-filtered
lineitem slice for q14 / the '%red%'-filtered part slice for q9 —
both flips the removed hints would have FORBIDDEN), the second pushes
BOTH join sides past the threshold so the strategy switches to a
shuffle join. Appends/refreshes the "## TPC-H broadcast" section of
docs/SCALE_NOTES.md.
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
SHIFT = 100_000_000
# q20 carries the worst-of-set frame the hints used to force: `excess`
# is partsupp-cardinality (SF*800k at spec scale) before its semi-use
QUERIES = ("tpch_q14_promo", "tpch_q9_product_profit", "tpch_q20_part_promotion")


def replicate(spark, p: int, fact: int, out_dir: str) -> None:
    reps_p = spark.range(p).select(F.col("id").alias("__rep"))
    reps_l = spark.range(fact).select(F.col("id").alias("__rep"))
    for t in TABLE_NAMES:
        dst = os.path.join(out_dir, f"{t}.parquet")
        if t in ("part", "supplier"):
            key = "p_partkey" if t == "part" else "s_suppkey"
            df = (
                load_table(spark, BASE_SF, t)
                .crossJoin(F.broadcast(reps_p))
                .withColumn(key, F.col(key) + F.col("__rep") * F.lit(SHIFT))
            )
        elif t == "lineitem":
            df = (
                load_table(spark, BASE_SF, t)
                .crossJoin(F.broadcast(reps_l))
                .withColumn("l_orderkey", F.col("l_orderkey") + F.col("__rep") * F.lit(SHIFT))
                .withColumn(
                    "l_partkey",
                    F.col("l_partkey")
                    + F.pmod(F.xxhash64("l_orderkey", "l_linenumber"), F.lit(p)) * F.lit(SHIFT),
                )
                .withColumn(
                    "l_suppkey",
                    F.col("l_suppkey")
                    + F.pmod(F.xxhash64("l_linenumber", "l_orderkey"), F.lit(p)) * F.lit(SHIFT),
                )
            )
        elif t == "orders":
            df = (
                load_table(spark, BASE_SF, t)
                .crossJoin(F.broadcast(reps_l))
                .withColumn("o_orderkey", F.col("o_orderkey") + F.col("__rep") * F.lit(SHIFT))
            )
        else:
            os.symlink(os.path.join(BASE_SF, f"{t}.parquet"), dst)
            continue
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


def join_strategies(plan: str) -> dict[str, int]:
    return {
        node: plan.count(node)
        for node in ("BroadcastHashJoin", "SortMergeJoin", "ShuffledHashJoin")
        if plan.count(node)
    }


def measure(spark, app_id, sf_dir: str) -> dict[str, dict]:
    from flink_anomaly_spark.operators.dedup import release_cached

    qs = all_queries()
    out = {}
    li_rows = load_table(spark, sf_dir, "lineitem").count()
    part_rows = load_table(spark, sf_dir, "part").count()
    for name in QUERIES:
        df = qs[name](spark, sf_dir)
        df.write.mode("overwrite").format("noop").save()  # warm + finalizes AQE
        # the SAME DataFrame's QueryExecution now holds the final plan
        plan = df._jdf.queryExecution().executedPlan().toString()
        release_cached()
        before = {s["stageId"] for s in stable_stages(spark, app_id)}
        t0 = time.perf_counter()
        qs[name](spark, sf_dir).write.mode("overwrite").format("noop").save()
        wall = time.perf_counter() - t0
        new = [s for s in stable_stages(spark, app_id) if s["stageId"] not in before]
        sw = sum(s.get("shuffleWriteBytes", 0) for s in new)
        release_cached()
        out[name] = {
            "wall": wall,
            "shuffle": sw,
            "li_rows": li_rows,
            "part_rows": part_rows,
            "joins": join_strategies(plan),
        }
    return out


def fmt_bytes(b: float) -> str:
    return f"{b / 1024:.1f} KiB" if b < 2**20 else f"{b / 2**20:.2f} MiB"


def main() -> None:
    points = [
        (int(a.split(":")[0]), int(a.split(":")[1])) for a in sys.argv[1:]
    ] or [(2000, 20), (6000, 100)]
    spark = get_spark("tpch-transition-probe", extra_conf={"spark.ui.enabled": "true"})
    app_id = spark.sparkContext.applicationId
    results = [("base sf0.1", measure(spark, app_id, BASE_SF))]
    for p, fact in points:
        big_dir = tempfile.mkdtemp(prefix="tpchtrans_")
        try:
            replicate(spark, p, fact, big_dir)
            results.append((f"part x{p} / fact x{fact}", measure(spark, app_id, big_dir)))
        finally:
            shutil.rmtree(big_dir, ignore_errors=True)

    args = " ".join(f"{p}:{fact}" for p, fact in points)
    lines = [
        "",
        "## TPC-H broadcast→shuffle transition probe (round 12)",
        "",
        f"`tools/tpch_broadcast_transition_probe.py {args}`: part/supplier xP",
        "(the largest point pushes part past the 64 MB auto-broadcast",
        "threshold even after column pruning), lineitem/orders xL with every",
        "lineitem row remapped onto the full replicated dim key space. Same",
        "hint-free query code at every scale; the strategy column is read",
        "from the FINAL adaptive plan after execution.",
        "",
        "| query | scale | part rows | wall | shuffle write | B/lineitem row | join strategies |",
        "|---|---|---|---|---|---|---|",
    ]
    for name in QUERIES:
        for label, m in ((lbl, r[name]) for lbl, r in results):
            joins = ", ".join(f"{k} x{v}" for k, v in m["joins"].items()) or "(none)"
            lines.append(
                f"| {name} | {label} | {m['part_rows']:,} | {m['wall']:.2f}s "
                f"| {fmt_bytes(m['shuffle'])} "
                f"| {m['shuffle'] / max(m['li_rows'], 1):.1f} | {joins} |"
            )
    block = "\n".join(lines) + "\n"
    path = "docs/SCALE_NOTES.md"
    cur = open(path).read()
    cur = re.sub(r"\n## TPC-H broadcast→shuffle transition probe.*?(?=\n## |\Z)", "", cur, flags=re.S)
    open(path, "w").write(cur.rstrip("\n") + "\n" + block)
    print(block)


if __name__ == "__main__":
    main()
