"""Direct tests for the source/sink helpers (SURVEY §2.1-2.2) not
already covered by the round-trip tests."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from flink_anomaly_spark.sinks import write_parquet, write_text
from flink_anomaly_spark.sources.readers import from_elements, read_text, stream_rate
from flink_anomaly_spark.tables import load_table
from tests.conftest import SF_SMOKE


def test_from_elements_schema(spark):
    """S1/S2: in-memory source with explicit schema."""
    df = from_elements(
        spark,
        [("a", 0, 250), ("b", 0, 250), ("d", 1, 250)],
        "name string, failure_times int, wait_millis long",
    )
    assert df.count() == 3
    assert df.schema.simpleString() == (
        "struct<name:string,failure_times:int,wait_millis:bigint>"
    )


def test_write_text_rolling_policy(spark, tmp_path):
    """K2's rolling policy analog: maxRecordsPerFile must split output
    into multiple part files (the reference rolls on size/time,
    TestFlinkStreams.java:107-115)."""
    docs = load_table(spark, SF_SMOKE, "documents").select(
        F.col("text").cast("string").alias("value")
    )
    out = str(tmp_path / "rolled")
    write_text(docs.coalesce(1), out, max_records_per_file=100)
    parts = [f for f in os.listdir(out) if f.startswith("part-")]
    # 500 docs / 100 per file → 5 part files from a single task
    assert len(parts) == 5, parts
    back = spark.read.text(out)
    assert back.count() == docs.count()


def test_write_parquet_partitioned_layout(spark, tmp_path):
    events = load_table(spark, SF_SMOKE, "events")
    out = str(tmp_path / "by_type")
    write_parquet(events, out, partition_by=["event_type"])
    dirs = {d for d in os.listdir(out) if d.startswith("event_type=")}
    assert len(dirs) == 5  # one directory per event type


def test_rate_source_is_streaming(spark):
    df = stream_rate(spark, rows_per_second=5)
    assert df.isStreaming
    assert set(df.columns) == {"timestamp", "value"}


def test_read_text_lines(spark, tmp_path):
    p = tmp_path / "x.txt"
    p.write_text("alpha\nbeta\n")
    got = sorted(r.value for r in read_text(spark, str(p)).collect())
    assert got == ["alpha", "beta"]


def test_binary_file_source_feeds_media_dedup(spark, tmp_path):
    """binaryFile source: one row per file with the opaque content
    column; glob filtering prunes at listing time; and the content
    flows straight into the sha256 exact-dedup used by the multimodal
    family (two identical payloads collapse to one group)."""
    from flink_anomaly_spark.sources.readers import read_binary_files

    payload = bytes(range(256))
    (tmp_path / "a.bin").write_bytes(payload)
    (tmp_path / "b.bin").write_bytes(payload)          # exact duplicate
    (tmp_path / "c.bin").write_bytes(payload[::-1])
    (tmp_path / "skip.txt").write_bytes(b"not media")
    df = read_binary_files(spark, str(tmp_path), glob="*.bin")
    assert {"path", "modificationTime", "length", "content"} <= set(df.columns)
    rows = df.collect()
    assert len(rows) == 3  # skip.txt pruned by the glob
    assert all(r.length == 256 for r in rows)
    groups = (
        df.groupBy(F.sha2("content", 256).alias("fp"))
        .agg(F.count("*").alias("n"), F.min("path").alias("keep_path"))
        .collect()
    )
    assert sorted(g.n for g in groups) == [1, 2]


def test_write_audit_publish_promotes_only_on_pass(spark, tmp_path):
    """WAP: a passing audit atomically promotes the staging dir; a
    failing audit leaves the published table untouched (old version
    still readable) and keeps staging for inspection."""
    from flink_anomaly_spark.sinks import write_audit_publish

    final = str(tmp_path / "docs")
    v1 = spark.range(0, 100).select(F.col("id"), F.lit("v1").alias("tag"))

    def audit_nonempty(df):
        return ("nonempty", df.count() > 0)

    def audit_unique(df):
        return ("id_unique", df.select("id").distinct().count() == df.count())

    res = write_audit_publish(v1, final, [audit_nonempty, audit_unique])
    assert res == [("nonempty", True), ("id_unique", True)]
    assert not os.path.exists(final + "._staging")
    assert spark.read.parquet(final).count() == 100

    # v2 violates uniqueness -> must NOT replace v1
    v2 = v1.unionAll(v1).select("id", F.lit("v2").alias("tag"))
    res = write_audit_publish(v2, final, [audit_nonempty, audit_unique])
    assert ("id_unique", False) in res
    pub = spark.read.parquet(final)
    assert pub.count() == 100
    assert pub.select("tag").distinct().collect()[0][0] == "v1"
    # staging left for inspection
    assert os.path.exists(final + "._staging")


def test_write_audit_publish_pointer_swap_never_drops_table(spark, tmp_path):
    """The publish step must be a pointer swap, not rmtree+rename: at no
    point may final_path stop resolving, a superseded version dir is
    cleaned up after the swap, and a third passing publish over the
    symlink works the same as the second (round-4 ADVICE fix)."""
    import glob

    from flink_anomaly_spark.sinks import write_audit_publish

    final = str(tmp_path / "docs")
    ok = [lambda df: ("nonempty", df.count() > 0)]

    for tag, n in (("v1", 10), ("v2", 20), ("v3", 30)):
        frame = spark.range(0, n).select(F.col("id"), F.lit(tag).alias("tag"))
        res = write_audit_publish(frame, final, ok)
        assert res == [("nonempty", True)]
        pub = spark.read.parquet(final)
        assert pub.count() == n
        assert pub.select("tag").distinct().collect()[0][0] == tag
        # published path is now a pointer into a complete version dir
        assert os.path.islink(final)
        assert os.path.isdir(os.path.realpath(final))
    # only the live version dir remains — superseded versions cleaned
    assert len(glob.glob(final + ".v-*")) == 1
    # a failing audit over the symlinked table leaves it untouched
    bad = spark.range(0, 5).select(F.col("id"), F.lit("v4").alias("tag"))
    res = write_audit_publish(bad, final, [lambda df: ("big_enough", df.count() >= 10)])
    assert res == [("big_enough", False)]
    assert spark.read.parquet(final).select("tag").distinct().collect()[0][0] == "v3"


def test_write_audit_publish_migration_and_crash_recovery(spark, tmp_path):
    """Round-5 ADVICE (medium): first publish over a LEGACY PLAIN
    DIRECTORY pre-migrates it to the versioned layout before any
    write/audit work, and a crash inside that migration (final_path
    missing, orphan .v- dir present) is recovered on the next call by
    restoring the pointer to the newest version."""
    import glob
    import shutil

    from flink_anomaly_spark.sinks import write_audit_publish

    final = str(tmp_path / "docs")
    ok = [lambda df: ("nonempty", df.count() > 0)]

    # 1) legacy layout: a plain parquet directory, no symlink
    spark.range(0, 10).select(F.col("id"), F.lit("legacy").alias("tag")).write.parquet(final)
    assert os.path.isdir(final) and not os.path.islink(final)
    res = write_audit_publish(
        spark.range(0, 20).select(F.col("id"), F.lit("v2").alias("tag")), final, ok
    )
    assert res == [("nonempty", True)]
    assert os.path.islink(final)  # migrated to pointer layout
    assert spark.read.parquet(final).select("tag").distinct().collect()[0][0] == "v2"

    # 2) migration even happens when the AUDIT FAILS (no promote): the
    # table is still readable through the new pointer afterwards
    final2 = str(tmp_path / "docs2")
    spark.range(0, 10).select(F.col("id"), F.lit("legacy").alias("tag")).write.parquet(final2)
    res = write_audit_publish(
        spark.range(0, 3).select(F.col("id"), F.lit("bad").alias("tag")),
        final2,
        [lambda df: ("big_enough", df.count() >= 10)],
    )
    assert res == [("big_enough", False)]
    assert os.path.islink(final2)
    assert spark.read.parquet(final2).select("tag").distinct().collect()[0][0] == "legacy"

    # 3) simulate a crash between demote and re-link: pointer gone,
    # version dir orphaned — next publish must first restore the
    # pointer (recovery), then publish normally
    os.remove(final)
    assert not os.path.lexists(final)
    versions_before = set(glob.glob(final + ".v-*"))
    assert versions_before  # the orphan exists
    res = write_audit_publish(
        spark.range(0, 30).select(F.col("id"), F.lit("v3").alias("tag")), final, ok
    )
    assert res == [("nonempty", True)]
    assert spark.read.parquet(final).select("tag").distinct().collect()[0][0] == "v3"
    # recovery alone (crash again, then a FAILING publish): table must
    # resolve to the restored previous version, never be missing
    os.remove(final)
    write_audit_publish(
        spark.range(0, 1).select(F.col("id"), F.lit("bad").alias("tag")),
        final,
        [lambda df: ("big_enough", df.count() >= 10)],
    )
    assert os.path.islink(final)
    assert spark.read.parquet(final).select("tag").distinct().collect()[0][0] == "v3"
    shutil.rmtree(str(tmp_path), ignore_errors=True)


def test_parquet_schema_evolution_merge(spark, tmp_path):
    """Schema evolution across table versions (a column added later):
    reading the whole directory with mergeSchema must union the
    schemas, null-filling the old files - the lake behavior a 100 TB
    table accumulated over months depends on. Without mergeSchema,
    Spark picks an arbitrary file's schema, silently dropping the new
    column for some read orders."""
    root = tmp_path / "evolving"
    spark.createDataFrame([(1, "a")], "id long, name string").write.parquet(
        str(root / "batch=1")
    )
    spark.createDataFrame(
        [(2, "b", 0.9)], "id long, name string, quality double"
    ).write.parquet(str(root / "batch=2"))
    merged = (
        spark.read.option("mergeSchema", "true")
        .option("basePath", str(root))
        .parquet(str(root / "batch=*"))
    )
    assert set(merged.columns) == {"id", "name", "quality", "batch"}
    rows = {r.id: r for r in merged.collect()}
    assert rows[1].quality is None and rows[2].quality == 0.9
    assert rows[1].batch == 1 and rows[2].batch == 2


def test_ignore_corrupt_files_salvages_scan(spark, tmp_path):
    """A single corrupt parquet file must not kill a scan spanning
    thousands of files: with ignoreCorruptFiles the valid files'
    rows survive (a 10-hour 100 TB job should not die at hour 9 on one
    bad object); without it the scan raises, which is the safe
    default (silent data loss must be opted into)."""
    import pytest as _pytest

    root = tmp_path / "lake"
    spark.range(0, 50).write.parquet(str(root))
    # a truncated/corrupt part file inside the same table directory
    (root / "part-zz-corrupt.snappy.parquet").write_bytes(
        b"PAR1 this is not a real parquet file"
    )
    key = "spark.sql.files.ignoreCorruptFiles"
    old = spark.conf.get(key)
    try:
        # explicit schema: footers are then only read at SCAN time,
        # which is where ignoreCorruptFiles applies (schema inference
        # would die on the corrupt footer during analysis either way)
        spark.conf.set(key, "true")
        got = spark.read.schema("id long").parquet(str(root))
        assert got.count() == 50
        spark.conf.set(key, "false")
        with _pytest.raises(Exception):
            spark.read.schema("id long").parquet(str(root)).count()
    finally:
        spark.conf.set(key, old)


def test_permissive_json_quarantines_malformed(spark, tmp_path):
    """PERMISSIVE JSON parsing: malformed lines land in
    _corrupt_record instead of failing the job — the ingest contract
    for scraped/third-party feeds where some fraction of lines is
    always broken. FAILFAST raises, for pipelines that prefer to halt."""
    import pytest as _pytest

    p = tmp_path / "feed.jsonl"
    p.write_text('{"id": 1, "v": "ok"}\n{broken json!!\n{"id": 2, "v": "fine"}\n')
    schema = "id long, v string, _corrupt_record string"
    df = spark.read.schema(schema).option("mode", "PERMISSIVE").json(str(p))
    rows = df.collect()
    good = {r.id: r.v for r in rows if r.id is not None}
    bad = [r for r in rows if r._corrupt_record is not None]
    assert good == {1: "ok", 2: "fine"}
    assert len(bad) == 1 and "broken" in bad[0]._corrupt_record
    with _pytest.raises(Exception):
        spark.read.schema("id long, v string").option("mode", "FAILFAST").json(str(p)).collect()


def test_write_parquet_codec_and_file_size_bounds(spark, tmp_path):
    """Per-write codec selection (zstd files carry the codec in their
    names and round-trip) and maxRecordsPerFile (the batch rolling
    policy: a single task's output splits into bounded files)."""
    docs = load_table(spark, SF_SMOKE, "documents").coalesce(1)
    out = str(tmp_path / "zstd_rolled")
    write_parquet(docs, out, compression="zstd", max_records_per_file=100)
    parts = [f for f in os.listdir(out) if f.startswith("part-")]
    assert len(parts) == 5  # 500 docs / 100 per file, single task
    assert all(".zstd.parquet" in f for f in parts), parts
    assert spark.read.parquet(out).count() == docs.count()


def test_wap_time_travel_and_rollback(spark, tmp_path):
    """Snapshot retention + time travel + rollback on the WAP table
    (round 5): keep_versions retains superseded version dirs,
    read_table_version reads them (Delta VERSION AS OF), rollback_table
    atomically re-points the live table (Delta RESTORE) and is itself
    reversible; retention evicts beyond the window."""
    from flink_anomaly_spark.sinks import (
        list_table_versions,
        read_table_version,
        rollback_table,
        write_audit_publish,
    )

    final = str(tmp_path / "docs")
    ok = [lambda df: ("nonempty", df.count() > 0)]
    for tag, n in (("v1", 10), ("v2", 20), ("v3", 30)):
        frame = spark.range(0, n).select(F.col("id"), F.lit(tag).alias("tag"))
        assert write_audit_publish(frame, final, ok, keep_versions=2) == [
            ("nonempty", True)
        ]
    # live + 2 retained
    assert len(list_table_versions(final)) == 3
    assert read_table_version(spark, final, 0).count() == 30
    assert read_table_version(spark, final, 1).count() == 20
    assert read_table_version(spark, final, 2).count() == 10
    import pytest as _pytest

    with _pytest.raises(IndexError):
        read_table_version(spark, final, 3)

    # v3 turns out bad -> restore v2; readers never lose the table
    rollback_table(final, 1)
    assert spark.read.parquet(final).select("tag").distinct().collect()[0][0] == "v2"
    # the rollback is reversible: v3 is now the newest superseded dir
    assert read_table_version(spark, final, 1).select("tag").distinct().collect()[0][0] == "v3"
    rollback_table(final, 1)
    assert spark.read.parquet(final).select("tag").distinct().collect()[0][0] == "v3"

    # retention window: a 4th publish with keep_versions=1 evicts older
    frame = spark.range(0, 40).select(F.col("id"), F.lit("v4").alias("tag"))
    write_audit_publish(frame, final, ok, keep_versions=1)
    vs = list_table_versions(final)
    assert len(vs) == 2
    assert spark.read.parquet(final).count() == 40
    assert read_table_version(spark, final, 1).count() == 30  # v3 kept
    # default keep_versions=0 reverts to live-only (the old behavior)
    frame = spark.range(0, 50).select(F.col("id"), F.lit("v5").alias("tag"))
    write_audit_publish(frame, final, ok)
    assert len(list_table_versions(final)) == 1


def test_table_changes_cdf(spark, tmp_path):
    """Change data feed between retained WAP versions: inserts, deletes,
    and updates (delete+insert pair) with bag semantics."""
    from flink_anomaly_spark.sinks import table_changes, write_audit_publish

    final = str(tmp_path / "t")
    ok = [lambda df: ("nonempty", df.count() > 0)]
    v1 = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c"), (3, "c")], ["id", "val"]
    )  # duplicate row on purpose
    write_audit_publish(v1, final, ok, keep_versions=2)
    v2 = spark.createDataFrame(
        [(1, "a"), (2, "B"), (3, "c"), (4, "d")], ["id", "val"]
    )  # 2 updated, one dup copy of 3 removed, 4 inserted
    write_audit_publish(v2, final, ok, keep_versions=2)
    changes = {
        ((r.id, r.val), r._change_type): 1
        for r in table_changes(spark, final, from_back=1).collect()
    }
    assert set(changes) == {
        ((2, "B"), "insert"),
        ((4, "d"), "insert"),
        ((2, "b"), "delete"),
        ((3, "c"), "delete"),  # multiplicity drop 2 -> 1
    }
    # no-change diff is empty
    assert table_changes(spark, final, from_back=0, to_back=0).count() == 0


def test_compact_table_executes_and_is_reversible(spark, tmp_path):
    """Compaction executor: many small files -> few, row count audited
    and preserved, pre-compaction version retained so the maintenance
    action itself can be rolled back."""
    from flink_anomaly_spark.sinks import (
        compact_table,
        list_table_versions,
        rollback_table,
        write_audit_publish,
    )

    final = str(tmp_path / "t")
    df = spark.range(0, 2000).select(
        F.col("id"), F.concat(F.lit("row"), F.col("id")).alias("val")
    )
    # publish with deliberately tiny files (many part files)
    write_audit_publish(
        df.repartition(16), final, [lambda d: ("nonempty", d.count() > 0)]
    )
    stats = compact_table(spark, final, target_file_bytes=1 << 30)
    assert stats["files_before"] == 16
    assert stats["files_after"] == 1
    assert stats["audits"] == [("row_count_preserved", True)]
    assert spark.read.parquet(final).count() == 2000
    # the pre-compaction version is retained -> rollback restores it
    assert len(list_table_versions(final)) == 2
    rollback_table(final, 1)
    assert spark.read.parquet(final).count() == 2000
