"""Round-12 optimization contracts.

Every optimization this round is REQUIRED to be result-invisible: the
inline literal helpers must be bit-identical to the unrolled F.lit form
they replaced, and the kcore/BFS fixpoint early-exits must produce
exactly the full fixed-iteration unroll's output (the oracle still runs
the full unroll). These tests pin those equivalences.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# inline literal helpers (similarity.inline_vector/_matrix/_int_array)
# ---------------------------------------------------------------------------

AWKWARD_DOUBLES = [
    0.0,
    -0.0,
    1.0,
    -1.0,
    0.1,
    1e-17,
    -7.891011121314e-05,
    1.5e300,
    123456.789012345,
    2.2250738585072014e-308,  # smallest normal
]


def test_inline_vector_bit_identical_to_unrolled_lits(spark):
    from flink_anomaly_spark.operators.similarity import inline_vector

    unrolled = F.array(*[F.lit(float(x)) for x in AWKWARD_DOUBLES])
    parsed = inline_vector(AWKWARD_DOUBLES)
    row = spark.range(1).select(unrolled.alias("u"), parsed.alias("p")).first()
    assert len(row.u) == len(row.p)
    for a, b in zip(row.u, row.p):
        # hex() distinguishes -0.0 from 0.0 and every ulp
        assert a.hex() == b.hex()


def test_inline_matrix_bit_identical_through_dot_fold(spark):
    import random

    from flink_anomaly_spark.operators.similarity import dot, inline_matrix

    rng = random.Random(7)
    rows = [[rng.uniform(-1, 1) for _ in range(16)] for _ in range(4)]
    v = [rng.uniform(-1, 1) for _ in range(16)]
    m = inline_matrix(rows)
    sel = []
    for i, r in enumerate(rows):
        sel.append(dot(F.lit(v), F.array(*[F.lit(float(x)) for x in r])).alias(f"u{i}"))
        sel.append(dot(F.lit(v), F.element_at(m, i + 1)).alias(f"p{i}"))
    got = spark.range(1).select(*sel).first()
    for i in range(len(rows)):
        assert getattr(got, f"u{i}").hex() == getattr(got, f"p{i}").hex()


def test_inline_int_array_matches_lit_type_and_values(spark):
    from flink_anomaly_spark.operators.similarity import inline_int_array

    vals = [0, 1, -5, 2147483647]
    df = spark.range(1).select(
        F.array(*[F.lit(v) for v in vals]).alias("u"),
        inline_int_array(vals).alias("p"),
    )
    assert df.schema["u"].dataType == df.schema["p"].dataType
    row = df.first()
    assert list(row.u) == list(row.p) == vals


def test_inline_rejects_non_finite():
    from flink_anomaly_spark.operators.similarity import inline_vector

    for bad in (float("nan"), float("inf"), float("-inf")):
        with pytest.raises(ValueError):
            inline_vector([1.0, bad])


def test_cell_scores_transform_equals_unrolled_form(spark):
    """_cell_scores was rewritten from k unrolled per-centroid structs
    to one transform over an inline_matrix literal; the array value —
    including the (cos, neg, cell) tie-break fields array_max compares
    — must be unchanged."""
    import random

    from flink_anomaly_spark.operators.similarity import _cell_scores, cosine

    rng = random.Random(11)
    cents = [[rng.uniform(-1, 1) for _ in range(8)] for _ in range(3)]
    vecs = [[rng.uniform(-1, 1) for _ in range(8)] for _ in range(5)]
    df = spark.createDataFrame([(v,) for v in vecs], "v array<double>")
    unrolled = F.array(
        *[
            F.struct(
                cosine(F.col("v"), F.array(*[F.lit(float(x)) for x in c])).alias("cos"),
                F.lit(-ci).alias("neg"),
                F.lit(ci).alias("cell"),
            )
            for ci, c in enumerate(cents)
        ]
    )
    got = df.select(
        F.array_max(_cell_scores(F.col("v"), cents)).alias("new"),
        F.array_max(unrolled).alias("old"),
    ).collect()
    for r in got:
        assert r.new.cell == r.old.cell
        assert r.new.cos.hex() == r.old.cos.hex()


# ---------------------------------------------------------------------------
# kcore / BFS fixpoint early-exit == full unroll
# ---------------------------------------------------------------------------


def _sym(spark, und):
    e = spark.createDataFrame(und, "a long, b long")
    return e.select(F.col("a").alias("src"), F.col("b").alias("dst")).unionByName(
        e.select(F.col("b").alias("src"), F.col("a").alias("dst"))
    )


def test_kcore_early_exit_still_peels_unconverged_chains(spark):
    """A long chain peels one layer per iteration — the fixpoint test
    must NOT fire early on it: kcore(n_iter=2) is the documented
    partial peel, kcore(n_iter=12) the converged core."""
    from flink_anomaly_spark.operators.graph import kcore

    chain = [(i, i + 1) for i in range(12)]
    edges = _sym(spark, chain)
    partial = {r.node for r in kcore(edges, k=2, n_iter=2).collect()}
    full = {r.node for r in kcore(edges, k=2, n_iter=12).collect()}
    # each peel removes the two current endpoints' edges
    assert full == set()  # a chain has no 2-core
    assert partial  # 2 peels have NOT emptied a 13-node chain
    assert partial == {r.node for r in kcore(edges, k=2, n_iter=2).collect()}


def test_kcore_early_exit_equals_full_unroll_when_converged(spark):
    from flink_anomaly_spark.operators.graph import kcore

    und = [(1, 2), (2, 3), (1, 3), (4, 5), (5, 6), (6, 7)]
    edges = _sym(spark, und)
    got2 = sorted(map(tuple, kcore(edges, k=2, n_iter=2).collect()))
    got9 = sorted(map(tuple, kcore(edges, k=2, n_iter=9).collect()))
    assert got2 == got9 == [(1, 2), (2, 2), (3, 2)]


def test_kcore_empty_edges_short_circuits(spark):
    from flink_anomaly_spark.operators.graph import kcore

    edges = spark.createDataFrame([], "src long, dst long")
    assert kcore(edges, k=2, n_iter=6).collect() == []


def test_bfs_early_exit_equals_full_unroll(spark):
    """Seeds reach everything in 2 hops; depths 2..6 must agree (the
    early exit detects the dead frontier instead of running 4 no-op
    levels)."""
    from flink_anomaly_spark.operators.graph import bfs_distances

    edges = _sym(spark, [(1, 2), (2, 3), (1, 4)])
    seeds = spark.createDataFrame([(1,)], "id long")
    d2 = sorted(map(tuple, bfs_distances(edges, seeds, max_depth=2).collect()))
    d6 = sorted(map(tuple, bfs_distances(edges, seeds, max_depth=6).collect()))
    assert d2 == d6 == [(1, 0), (2, 1), (3, 2), (4, 1)]


def test_bfs_early_exit_does_not_fire_on_live_frontier(spark):
    from flink_anomaly_spark.operators.graph import bfs_distances

    chain = [(i, i + 1) for i in range(8)]
    edges = _sym(spark, chain)
    seeds = spark.createDataFrame([(0,)], "id long")
    d3 = {r.id: r.dist for r in bfs_distances(edges, seeds, max_depth=3).collect()}
    assert d3 == {0: 0, 1: 1, 2: 2, 3: 3}  # partial, exactly 3 levels
