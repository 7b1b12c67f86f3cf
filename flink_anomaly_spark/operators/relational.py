"""Relational operators: map/filter/union (reference parity) plus the
join/aggregation/sort/top-k breadth the reference lacks (SURVEY §2.9)
but the driver's TPC-H-ish testdata implies.

Everything here is pure DataFrame API — Catalyst handles pushdown,
pruning, join strategy selection (broadcast for the small dims), and
whole-stage codegen. No UDFs anywhere in this module.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# Reference-parity primitives
# ---------------------------------------------------------------------------


def map_upper(df: DataFrame, col: str, out_col: str | None = None) -> DataFrame:
    """1→1 scalar transform — reference T1 ``.map(String::toUpperCase)``
    (``TestFlinkStreams.java:56``). Built-in ``upper``, no UDF.
    """
    return df.withColumn(out_col or col, F.upper(F.col(col)))


def filter_rows(df: DataFrame, predicate: Column) -> DataFrame:
    """Predicate filter — reference T2/T3 (``TestFlinkStreams.java:91``,
    ``Main.java:48``). Native Catalyst predicate → parquet pushdown.
    """
    return df.filter(predicate)


def union_all(*dfs: DataFrame) -> DataFrame:
    """Bag union — reference U1 ``stream1.union(stream2)``
    (``TestFlinkStreamsRecover.java:92``). Bag semantics (no dedup).
    unionAll is a zero-shuffle plan node: partitions are appended.
    """
    out = dfs[0]
    for df in dfs[1:]:
        out = out.unionAll(df)
    return out


# ---------------------------------------------------------------------------
# Joins (broadcast the small side; Catalyst/AQE pick physical strategy)
# ---------------------------------------------------------------------------


def join_broadcast(fact: DataFrame, dim: DataFrame, on, how: str = "inner") -> DataFrame:
    """Equi-join with an explicit broadcast hint on the dimension side.

    At 100 TB the fact side never shuffles for this join — each executor
    streams its parquet splits against a replicated hash map.
    """
    return fact.join(F.broadcast(dim), on, how)


def join_shuffle(left: DataFrame, right: DataFrame, on, how: str = "inner") -> DataFrame:
    """Large-large equi-join: let Catalyst pick sort-merge vs shuffle-hash,
    with AQE skew-splitting enabled (session.py). Both sides hash-shuffle
    on the join key.
    """
    return left.join(right, on, how)


def semi_join(left: DataFrame, right: DataFrame, on) -> DataFrame:
    """EXISTS — left rows with a match; right columns dropped, right side
    deduplicated by the engine (cheaper than inner+distinct)."""
    return left.join(right, on, "left_semi")


def anti_join(left: DataFrame, right: DataFrame, on) -> DataFrame:
    """NOT EXISTS."""
    return left.join(right, on, "left_anti")


# ---------------------------------------------------------------------------
# Top-K and ranking
# ---------------------------------------------------------------------------


def top_k(df: DataFrame, order_by: list[Column], k: int) -> DataFrame:
    """Global top-k: ``orderBy().limit(k)`` — Spark plans TakeOrderedAndProject,
    which computes a per-partition top-k then merges k·p rows on the
    driver: no global sort shuffle, scales to arbitrary input size.
    """
    return df.orderBy(*order_by).limit(k)


def top_k_per_group(
    df: DataFrame,
    group_cols: list[str],
    order_by: list[Column],
    k: int,
    rank_col: str = "rn",
) -> DataFrame:
    """Top-k per group via row_number window — single hash shuffle on the
    group key, per-partition sort, early filter on rank."""
    from pyspark.sql import Window

    w = Window.partitionBy(*group_cols).orderBy(*order_by)
    return df.withColumn(rank_col, F.row_number().over(w)).filter(F.col(rank_col) <= k)
