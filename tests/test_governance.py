"""Tests for the governance/layout operators: boilerplate-segment
removal, the data-quality constraint suite, Z-order layout, and SCD2
history. (Oracle equivalence is covered by the registered oracles;
these pin the operator-level invariants the oracles can't see.)"""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_anomaly_spark.operators.text import boilerplate_segment_removal
from flink_anomaly_spark.plans.governance import _interleave_spark
from flink_anomaly_spark.plans.registry import all_queries
from tests.conftest import SF_SMOKE

_Q = all_queries()


def test_boilerplate_removes_known_segment_keeps_rest(spark):
    """A 2-word segment present in >= min_df docs is stripped from every
    doc; unique segments survive verbatim, in order."""
    rows = [(i, "ad banner unique%d text%d tail%d word" % (i, i, i)) for i in range(10)]
    rows.append((99, "only unique words here nothing shared"))
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = boilerplate_segment_removal(
        df, "doc_id", "text", seg_words=2, min_df_frac=0.5
    ).collect()
    by_id = {r.doc_id: r for r in out}
    # "ad banner" appears in 10/11 docs (> 50%) -> removed everywhere
    for i in range(10):
        r = by_id[i]
        assert r.n_removed == 1
        assert r.cleaned_text == "unique%d text%d tail%d word" % (i, i, i)
        assert r.n_segments == 3
    # the odd doc shares nothing -> untouched
    assert by_id[99].n_removed == 0
    assert by_id[99].cleaned_text == "only unique words here nothing shared"


def test_boilerplate_fully_boilerplate_doc_empties(spark):
    """A doc made ENTIRELY of corpus-wide boilerplate must come back as
    the empty string (the left join + coalesce path), not vanish."""
    rows = [(i, "buy now") for i in range(5)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = boilerplate_segment_removal(
        df, "doc_id", "text", seg_words=2, min_df_frac=0.5
    ).collect()
    assert len(out) == 5
    assert all(r.cleaned_text == "" and r.n_removed == 1 for r in out)


def test_boilerplate_noop_on_registry_corpus_is_subsequence(spark):
    """On the real corpus: cleaned_text's words are always an ordered
    subsequence of the original words, and removal counts reconcile."""
    out = _Q["boilerplate_segment_removal"](spark, SF_SMOKE)
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").select("doc_id", "text")
    joined = out.join(docs, "doc_id").collect()
    assert len(joined) == 500
    for r in joined[:50]:
        orig = r.text.split(" ")
        kept = r.cleaned_text.split(" ") if r.cleaned_text else []
        # ordered-subsequence check
        it = iter(orig)
        assert all(w in it for w in kept), r.doc_id
        assert 0 <= r.n_removed <= r.n_segments


def test_quality_suite_all_pass_on_clean_synthetic_data(spark):
    out = _Q["data_quality_suite"](spark, SF_SMOKE).collect()
    assert len(out) == 9
    assert {r.check_name for r in out} == {
        "customer_rowcount_min",
        "customer_custkey_unique",
        "customer_name_complete",
        "orders_custkey_referential",
        "orders_orderdate_complete",
        "lineitem_quantity_positive",
        "lineitem_discount_in_unit_range",
        "events_ts_complete",
        "documents_docid_unique",
    }
    assert all(r.passed == 1 for r in out), [
        (r.check_name, r.metric) for r in out if r.passed != 1
    ]
    for r in out:
        if r.check_name != "customer_rowcount_min":
            assert 0.0 <= r.metric <= 1.0


def test_zorder_interleave_is_bijective_on_4bit_pairs(spark):
    """All 256 (a, b) pairs map to 256 distinct z-values in [0, 256) —
    and match the classic python bit-interleave."""
    pairs = spark.createDataFrame(
        [(a, b) for a in range(16) for b in range(16)], ["a", "b"]
    )
    got = {
        (r.a, r.b): r.z
        for r in pairs.select(
            "a", "b", _interleave_spark(F.col("a"), F.col("b")).alias("z")
        ).collect()
    }

    def ref(a, b):
        z = 0
        for i in range(4):
            z |= ((a >> i) & 1) << (2 * i)
            z |= ((b >> i) & 1) << (2 * i + 1)
        return z

    assert all(got[(a, b)] == ref(a, b) for a in range(16) for b in range(16))
    assert len(set(got.values())) == 256
    assert all(0 <= z < 256 for z in got.values())


def test_zorder_layout_partitions_corpus_exactly_once(spark):
    out = _Q["zorder_file_layout"](spark, SF_SMOKE)
    total = out.agg(F.sum("n_docs")).collect()[0][0]
    n_docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").count()
    assert total == n_docs
    rows = out.collect()
    assert all(0 <= r.file_id < 256 for r in rows)
    assert all(r.min_chars <= r.max_chars for r in rows)


def test_scd2_versions_chain(spark):
    """Per customer: versions are 1..n, valid_to chains to the next
    valid_from, exactly one current row, cum_spend nondecreasing."""
    rows = (
        _Q["scd2_customer_history"](spark, SF_SMOKE)
        .filter(F.col("custkey") <= 20)
        .orderBy("custkey", "version")
        .collect()
    )
    assert rows
    by_cust: dict = {}
    for r in rows:
        by_cust.setdefault(r.custkey, []).append(r)
    for hist in by_cust.values():
        assert [r.version for r in hist] == list(range(1, len(hist) + 1))
        assert sum(1 for r in hist if r.is_current) == 1
        assert hist[-1].is_current == 1
        for prev, nxt in zip(hist, hist[1:]):
            assert prev.valid_to == nxt.valid_from
            assert prev.cum_spend <= nxt.cum_spend + 1e-9


def test_global_rank_is_total_order_permutation(spark):
    rows = _Q["global_rank_export"](spark, SF_SMOKE).collect()
    ranks = sorted(r.global_rank for r in rows)
    assert ranks == list(range(1, len(rows) + 1))
    # rank order must agree with the (lang, doc_id) total order
    by_rank = sorted(rows, key=lambda r: r.global_rank)
    keys = [(r.lang, r.doc_id) for r in by_rank]
    assert keys == sorted(keys)


def test_snapshot_diff_classifies_by_construction(spark):
    out = {r.orderkey: r for r in _Q["snapshot_diff_orders"](spark, SF_SMOKE).collect()}
    keys = [
        r.o_orderkey
        for r in spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
        .select("o_orderkey")
        .collect()
    ]
    for k in keys:
        in_old, in_new = k % 10 != 0, k % 13 != 0
        if in_old and not in_new:
            assert out[k].change_type == "delete", k
        elif in_new and not in_old:
            assert out[k].change_type == "insert", k
        elif in_old and in_new and k % 7 == 0:
            assert out[k].change_type == "update", k
            assert out[k].new_status == "X"
        elif in_old and in_new:
            assert k not in out or out[k].change_type == "update", k
            # unchanged rows (status not rewritten) must NOT appear
            if k % 7 != 0:
                assert k not in out, k


def test_leakage_free_split_keeps_clusters_whole(spark):
    """No near-dup cluster straddles splits (the contamination guard),
    and the split fractions are near 80/10/10 over clusters."""
    rows = _Q["leakage_free_split"](spark, SF_SMOKE).collect()
    splits_per_cluster: dict = {}
    for r in rows:
        splits_per_cluster.setdefault(r.cluster_id, set()).add(r.split)
    assert all(len(s) == 1 for s in splits_per_cluster.values())
    by_split = {"train": 0, "val": 0, "test": 0}
    for cid, s in splits_per_cluster.items():
        by_split[next(iter(s))] += 1
    n = sum(by_split.values())
    assert by_split["train"] / n > 0.6
    assert by_split["val"] / n < 0.25 and by_split["test"] / n < 0.25


def test_encoding_anomalies_detected_on_injected_corruption(spark, tmp_path):
    """Inject the three corruption signatures into a synthetic documents
    table; each must be counted, and clean text must not be flagged."""
    rows = [
        (1, "perfectly clean ascii text", "en", "web", 26),
        (2, "bad char � here � twice", "en", "web", 20),
        (3, "double encoded donâ€™t quote", "en", "web", 28),
        (4, "control\x07bell and\x01soh chars", "en", "web", 26),
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    out = {r.doc_id: r for r in _Q["encoding_anomaly_flags"](spark, str(tmp_path)).collect()}
    assert out[1].suspect == 0
    assert out[2].n_replacement_chars == 2 and out[2].suspect == 1
    assert out[3].n_mojibake_marks >= 1 and out[3].suspect == 1
    assert out[4].n_control_chars == 2 and out[4].suspect == 1


def test_encoding_clean_corpus_not_flagged(spark):
    out = _Q["encoding_anomaly_flags"](spark, SF_SMOKE)
    assert out.filter(F.col("suspect") == 1).count() == 0


def test_compaction_plan_covers_corpus_and_respects_capacity(spark):
    """Every doc lands in exactly one file; no file exceeds capacity by
    more than one document's worth (first-fit-in-order invariant); doc
    ranges of consecutive files within a lang never interleave."""
    from flink_anomaly_spark.plans.governance import _COMPACT_CAPACITY

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    max_doc = docs.agg(F.max("n_chars")).collect()[0][0]
    rows = _Q["compaction_file_plan"](spark, SF_SMOKE).collect()
    assert sum(r.n_docs for r in rows) == docs.count()
    by_lang: dict = {}
    for r in rows:
        assert r.total_chars <= _COMPACT_CAPACITY + max_doc
        by_lang.setdefault(r.lang, []).append(r)
    for files in by_lang.values():
        files.sort(key=lambda r: r.file_seq)
        assert [f.file_seq for f in files] == list(range(len(files)))
        for a, b in zip(files, files[1:]):
            assert a.last_doc < b.first_doc
