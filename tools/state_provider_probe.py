"""State-store provider probe (VERDICT r6 #6): measure the stateful
streaming queries' state footprint and wall-clock under BOTH providers
— HDFSBackedStateStore (executor-heap maps) and RocksDB (local-disk
LSM) — so the DEPLOY.md provider guidance is a measured trade, not a
slogan.

What it records per (query, provider): min-of-2 wall seconds plus the
per-stateful-operator MAX rows / MAX bytes held across micro-batches
(from StreamingQueryProgress.stateOperators, captured by
run_to_memory). The stream-stream interval joins dominate the
streaming bench precisely because their state is the join INPUT
buffered for the interval horizon — rows_total there is the real
memory bill at a production watermark lag.

    python tools/state_provider_probe.py [sf_dir]

Prints a markdown table (paste into docs/DEPLOY.md) and writes
STATE_PROVIDER_PROBE.json next to the repo root artifacts.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from flink_anomaly_spark.plans.registry import all_queries
from flink_anomaly_spark.session import enable_rocksdb_state, get_spark

#: The state-heavy subset: both stream-stream interval joins (state =
#: buffered join input), the two-level chained agg (two stateful
#: stages), a plain windowed agg as the light-state baseline, and the
#: constant-state HLL sketch (the counter-example: state bounded by
#: registers, not events).
PROBE = [
    "streaming_interval_join",
    "streaming_interval_join_left_final",
    "streaming_two_level_agg_final",
    "streaming_window_count_final",
    "streaming_hll_distinct_final",
]

PROVIDERS = {
    "hdfs": "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider",
    "rocksdb": "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
}


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    spark = get_spark("state-provider-probe")
    qs = all_queries()
    from flink_anomaly_spark.streaming import pipelines as p

    results: dict[str, dict] = {}
    for prov, cls in PROVIDERS.items():
        if prov == "rocksdb":
            enable_rocksdb_state(spark)
        else:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", cls)
        for name in PROBE:
            best, metrics = float("inf"), None
            for _ in range(2):
                t0 = time.perf_counter()
                qs[name](spark, sf_dir).write.mode("overwrite").format("noop").save()
                wall = time.perf_counter() - t0
                if wall < best:
                    best, metrics = wall, p.LAST_STATE_METRICS
            results.setdefault(name, {})[prov] = {
                "wall": round(best, 2),
                "state": metrics,
            }
    out_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "STATE_PROVIDER_PROBE.json",
    )
    json.dump({"sf_dir": sf_dir, "results": results}, open(out_path, "w"), indent=1)
    print("| query | provider | wall s | max state rows | max state MiB |")
    print("|---|---|---|---|---|")
    for name, by_prov in results.items():
        for prov, r in by_prov.items():
            rows = sum(op["max_rows_total"] for op in (r["state"] or []))
            mem = sum(op["max_memory_bytes"] for op in (r["state"] or []))
            print(
                f"| {name} | {prov} | {r['wall']:.2f} | {rows} "
                f"| {mem / (1 << 20):.1f} |"
            )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
