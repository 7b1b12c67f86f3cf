"""Runnable flagship job — the reference's ``Main.main`` transposed
(``Main.java:23-58``): unstable-data stream → failure-injecting filter →
keyBy → stateful running concatenation → print sink, with checkpointed
recovery. Where Flink AT_LEAST_ONCE shows duplicated concatenations
after restart, this engine's run ends with a verified exactly-once
state.

    python -m flink_anomaly_spark
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import functions as F

from flink_anomaly_spark.session import get_spark
from flink_anomaly_spark.streaming.recovery import make_failing_filter
from flink_anomaly_spark.streaming.stateful import running_concat_stream


def main() -> None:
    spark = get_spark("flink-anomaly-flagship")
    base = tempfile.mkdtemp(prefix="flagship_")
    src_dir, out_dir, out_ckpt, flag_dir = (
        os.path.join(base, d) for d in ("src", "out", "ckpt", "flags")
    )
    os.makedirs(flag_dir)
    os.makedirs(src_dir)

    # the reference's fixture (Main.java:39-45): a..e, d & e fail once
    rows = [("a", 0), ("b", 1), ("c", 2), ("d", 3), ("e", 4)]
    spark.createDataFrame(
        [(name, i, "", i) for name, i in rows],
        "name string, event_id long, key string, ord long",
    ).coalesce(1).write.parquet(src_dir, mode="overwrite")

    unstable = make_failing_filter(flag_dir, fail_ids={3, 4})  # d, e

    def build():
        stream = (
            spark.readStream.schema("name string, event_id long, key string, ord long")
            .parquet(src_dir)
            .filter(unstable(F.col("event_id")))
            .withColumn("ts", F.timestamp_micros(F.col("ord")))
        )
        return running_concat_stream(stream, key="key")

    results: list = []
    restarts = 0
    while True:
        # parquet (transactional file) sink: the memory sink cannot
        # recover from a checkpoint, and the file sink's commit log is
        # what makes the restart exactly-once
        q = (
            build()
            .writeStream.format("parquet")
            .option("path", out_dir)
            .outputMode("append")
            .option("checkpointLocation", out_ckpt)
            .trigger(availableNow=True)
            .start()
        )
        try:
            q.awaitTermination()
            break
        except Exception as e:  # injected UnstableDataFailedException
            restarts += 1
            print(f"[restart {restarts}] recovered from: {type(e).__name__}")
            if restarts > 10:  # the reference's fixedDelayRestart(10) budget
                raise

    out = spark.read.parquet(out_dir).orderBy("event_id")
    out.show(truncate=False)  # K1 print sink (Main.java:54)
    final = out.orderBy(F.length("running_concat").desc()).first()
    ids = final.running_concat.split(",")
    assert len(ids) == len(set(ids)) == 5, f"DUPLICATES in state: {final.running_concat}"
    print(
        f"exactly-once verified after {restarts} restart(s): "
        f"final state = {final.running_concat!r}"
    )
    shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()
