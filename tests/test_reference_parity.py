"""Reference-parity unit tests on the FIXTURES.md §A shapes — the exact
record sets the reference's tests feed through its pipelines, asserted
mechanically (the reference mostly eyeballs logs; SURVEY.md §5)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from flink_anomaly_spark.operators.relational import filter_rows, map_upper, union_all
from flink_anomaly_spark.operators.stateful import keyed_concat_total, running_concat
from flink_anomaly_spark.operators.windows import tumbling_argmax


def test_running_concat_emits_prefixes(spark):
    """A1: Main.java:39-45 rows (a..e) through the stateful concat —
    expect running prefixes a, a,b, a,b,c ... per the single '' key
    (Main.java:52 keyBy(d -> ''))."""
    rows = [("a", 0), ("b", 1), ("c", 2), ("d", 3), ("e", 4)]
    df = spark.createDataFrame(rows, "name string, ord int").withColumn("key", F.lit(""))
    out = running_concat(df, key="key", payload="name", order_by=["ord"], sep=",")
    got = [r.running_concat for r in out.orderBy("ord").collect()]
    assert got == ["a", "a,b", "a,b,c", "a,b,c,d", "a,b,c,d,e"]


def test_keyed_concat_groups(spark):
    """A1 keyed-groups variant (TestFlinkStatefulStreamsRecover.java:120-131):
    a-d in group A, e-h in group B → final state per key."""
    rows = [(n, g, i) for i, (n, g) in enumerate(
        [("a", "A"), ("b", "A"), ("c", "A"), ("d", "A"),
         ("e", "B"), ("f", "B"), ("g", "B"), ("h", "B")])]
    df = spark.createDataFrame(rows, "name string, grp string, ord int")
    out = keyed_concat_total(df, key="grp", payload="name", order_by=["ord"])
    got = {r.grp: r.concat_all for r in out.collect()}
    assert got == {"A": "a,b,c,d", "B": "e,f,g,h"}


def test_filter_adults(spark):
    """A2: person age>=18 (TestFlinkStreams.java:85-95) → Fred, Wilma."""
    df = spark.createDataFrame(
        [("Fred", 35), ("Wilma", 35), ("Pebbles", 2)], "name string, age int"
    )
    got = sorted(r.name for r in filter_rows(df, F.col("age") >= 18).collect())
    assert got == ["Fred", "Wilma"]


def test_map_uppercase(spark):
    """T1: uppercase map (TestFlinkStreams.java:53-59)."""
    df = spark.createDataFrame([("Conquer",), ("Flink",), ("!",)], "value string")
    got = sorted(r.value for r in map_upper(df, "value").collect())
    assert got == ["!", "CONQUER", "FLINK"]


def test_window_argmax_reference_rows(spark):
    """A3: the three timed tuples of TestFlinkStreams.java:63-79 through
    a 5 s tumbling window + whole-record arg-max: elements 17 & 16 share
    a window (17 wins); 15 is alone in its window."""
    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        (15, t0 + dt.timedelta(minutes=2)),
        (17, t0 + dt.timedelta(minutes=25, seconds=1)),
        (16, t0 + dt.timedelta(minutes=25)),
    ]
    df = spark.createDataFrame(rows, "value int, ts timestamp")
    out = tumbling_argmax(df, ts_col="ts", value_col="value", duration="5 seconds")
    got = sorted(r.value for r in out.collect())
    assert got == [15, 17]


def test_union_bag_semantics(spark):
    """U1: union keeps duplicates (TestFlinkStreamsRecover.java:92)."""
    a = spark.createDataFrame([("x",), ("y",)], "v string")
    b = spark.createDataFrame([("y",), ("z",)], "v string")
    got = sorted(r.v for r in union_all(a, b).collect())
    assert got == ["x", "y", "y", "z"]


def test_text_file_roundtrip(spark, tmp_path):
    """A4: readTextFile → file sink → read back, lines preserved
    (TestFlinkStreams.java:98-128, the reference's one mechanical assert)."""
    src = tmp_path / "in.txt"
    src.write_text("love\nflink\nhardly\n")
    df = spark.read.text(str(src))
    out_dir = str(tmp_path / "out")
    df.coalesce(1).write.text(out_dir)
    back = spark.read.text(out_dir)
    assert sorted(r.value for r in back.collect()) == ["flink", "hardly", "love"]
