"""Manifest-committed table format (flink_anomaly_spark/manifest_table.py):
append-without-rewrite commits, snapshot isolation, time travel,
rollback, small-file-only compaction, and exactly-once streaming
appends with the idempotence ledger inside the commit."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from flink_anomaly_spark.manifest_table import ManifestTable, stream_append
from tests.conftest import SF_SMOKE


def _df(spark, lo, hi, tag):
    return spark.range(lo, hi).select(F.col("id"), F.lit(tag).alias("tag"))


def test_append_history_time_travel_rollback(spark, tmp_path):
    t = ManifestTable.create(str(tmp_path / "t"), schema_ddl="id bigint, tag string")
    t.append(_df(spark, 0, 10, "a"))
    t.append(_df(spark, 10, 30, "b"))
    assert t.read(spark).count() == 30
    # time travel along the commit chain
    assert t.read(spark, version=1).count() == 10
    assert t.read(spark, version=0).count() == 0  # the empty create commit
    with pytest.raises(IndexError):
        t.read(spark, version=99)
    hist = t.history()
    assert [h["version"] for h in hist] == [2, 1, 0]
    # rollback is a NEW commit with the old content — itself in history
    t.rollback(1)
    assert t.read(spark).count() == 10
    assert t.history()[0]["version"] == 3
    t.rollback(2)  # roll the rollback back
    assert t.read(spark).count() == 30
    # overwrite replaces the file set but keeps history
    t.overwrite(_df(spark, 0, 5, "z"))
    assert t.read(spark).count() == 5
    assert t.read(spark, version=2).count() == 30


def test_snapshot_isolation_under_concurrent_append(spark, tmp_path):
    """A reader's file set is pinned by the manifest it opened: an
    append committed AFTER the read plan was built must not leak into
    the result (the property a plain-directory read does not have)."""
    t = ManifestTable.create(str(tmp_path / "t"))
    t.append(_df(spark, 0, 10, "a"))
    snapshot = t.read(spark)  # plan pinned to manifest v1's files
    t.append(_df(spark, 10, 1000, "b"))
    assert snapshot.count() == 10  # unaffected by the later commit
    assert t.read(spark).count() == 1000


def test_idempotent_append_by_batch_id(spark, tmp_path):
    t = ManifestTable.create(str(tmp_path / "t"))
    t.append(_df(spark, 0, 10, "a"), batch_id=0)
    man = t.append(_df(spark, 0, 10, "a"), batch_id=0)  # replay: no-op
    assert t.read(spark).count() == 10
    assert man["batch_ids"] == [0]
    t.append(_df(spark, 10, 20, "b"), batch_id=1)
    assert t.read(spark).count() == 20


def test_compact_rewrites_only_small_files(spark, tmp_path):
    t = ManifestTable.create(str(tmp_path / "t"))
    # one "large" batch written as a single file, then many small ones
    t.append(_df(spark, 0, 1000, "big").coalesce(1))
    big_files = set(t.latest()["files"])
    for i in range(5):
        t.append(_df(spark, 1000 + i, 1001 + i, "small").coalesce(1))
    before = t.latest()
    assert len(before["files"]) == 6
    # threshold above the small files but below the big one is hard to
    # guarantee with parquet overheads, so compact everything below a
    # generous bound and assert the big file SURVIVES by path when it
    # exceeds the bound we pick from its actual size
    big_size = max(
        os.path.getsize(os.path.join(t.path, f)) for f in before["files"]
    )
    man = t.compact(spark, small_file_bytes=big_size)  # strictly-below bound
    assert big_files <= set(man["files"])  # untouched, not rewritten
    assert len(man["files"]) == 2  # big + one consolidated file
    assert t.read(spark).count() == 1005
    # compaction is a commit: pre-compaction snapshot still readable
    assert t.read(spark, version=before["version"]).count() == 1005


def test_stream_append_exactly_once_effects(spark, tmp_path):
    """foreachBatch is at-least-once, but the batch-id ledger inside
    the manifest makes streaming appends exactly-once: re-running the
    drained stream with the same checkpoint adds nothing, and a forced
    replay of an already-committed batch id is a no-op."""
    from flink_anomaly_spark.streaming.pipelines import stream_events

    t = ManifestTable.create(str(tmp_path / "t"))
    ck = str(tmp_path / "ck")
    events = stream_events(spark, SF_SMOKE).select("event_id", "event_type", "value")
    q = stream_append(events, t, ck)
    q.awaitTermination()
    n = t.read(spark).count()
    assert n > 0
    committed = list(t.latest()["batch_ids"])
    # restart with the same checkpoint: source has nothing new
    q2 = stream_append(
        stream_events(spark, SF_SMOKE).select("event_id", "event_type", "value"), t, ck
    )
    q2.awaitTermination()
    assert t.read(spark).count() == n
    # forced replay of a committed batch id (crash-between-commit-and-
    # checkpoint simulation): the manifest ledger rejects it
    t.append(_df(spark, 0, 5, "dup").select(F.col("id").alias("event_id"),
                                            F.lit("x").alias("event_type"),
                                            F.lit(0.0).alias("value")),
             batch_id=committed[0])
    assert t.read(spark).count() == n


def test_data_skipping_prunes_files_with_sorted_layout(spark, tmp_path):
    """Manifest-level data skipping: per-file min/max harvested from
    parquet footers at commit time prune whole files for a range
    predicate. With a range-sorted write (repartitionByRange — the
    zorder/clustering story) file ranges are disjoint, so a narrow
    predicate reads ~1 of N files; results always equal the unpruned
    filter."""
    t = ManifestTable.create(str(tmp_path / "t"))
    df = spark.range(0, 10_000).select(F.col("id"), (F.col("id") % 7).alias("m"))
    t.append(df.repartitionByRange(8, "id"))
    assert len(t.latest()["files"]) == 8
    kept, total = t.prune_files("id", 100, 200)
    assert total == 8 and len(kept) == 1  # disjoint sorted ranges
    got = t.read_where(spark, "id", 100, 200)
    assert got.count() == 101
    assert got.agg(F.min("id"), F.max("id")).collect()[0] == (100, 200)
    # an unsorted append degrades pruning but never correctness
    t.append(df.repartition(4))
    kept2, total2 = t.prune_files("id", 100, 200)
    assert total2 == 12 and len(kept2) >= 5  # 1 sorted + all 4 unsorted
    assert t.read_where(spark, "id", 100, 200).count() == 202
    # open-ended ranges and a no-match range
    kept3, _ = t.prune_files("id", lo=9990)
    assert t.read_where(spark, "id", lo=9990).count() == 20
    kept4, _ = t.prune_files("id", 50_000, 60_000)
    assert t.read_where(spark, "id", 50_000, 60_000).count() == 0
    # string-column stats work too
    t2 = ManifestTable.create(str(tmp_path / "t2"))
    t2.append(
        spark.createDataFrame([("apple", 1), ("pear", 2)], ["w", "n"]).coalesce(1)
    )
    t2.append(
        spark.createDataFrame([("zebra", 3)], ["w", "n"]).coalesce(1)
    )
    kept5, total5 = t2.prune_files("w", "aa", "q")
    assert total5 == 2 and len(kept5) == 1
    assert t2.read_where(spark, "w", "aa", "q").count() == 2
