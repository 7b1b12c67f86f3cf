"""Physical-plan contracts: assertions about the plans Catalyst must
produce for the engine's queries — the codified version of the
".explain and iterate" loop, so a regression in pushdown / join
strategy / top-k planning fails tests instead of silently costing 10×
at 100 TB.
"""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


def assert_parquet_pushdown(df: DataFrame, fragment: str) -> None:
    """The scan must push a filter down to parquet (PushedFilters)."""
    plan = physical_plan(df)
    assert "PushedFilters: [" in plan, f"no pushed filters in plan:\n{plan}"
    assert fragment in plan, f"expected pushed filter {fragment!r} in plan:\n{plan}"


def assert_column_pruned(df: DataFrame, absent_col: str) -> None:
    """The parquet ReadSchema must NOT include ``absent_col``."""
    plan = physical_plan(df)
    read = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert read, f"no ReadSchema in plan:\n{plan}"
    assert all(absent_col not in ln for ln in read), (
        f"column {absent_col!r} not pruned from scan:\n" + "\n".join(read)
    )


def assert_broadcast_join(df: DataFrame) -> None:
    plan = physical_plan(df)
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan, (
        f"expected a broadcast join:\n{plan}"
    )


def assert_take_ordered(df: DataFrame) -> None:
    """Global top-k must plan TakeOrderedAndProject (per-partition heap +
    driver merge), never a full sort shuffle."""
    plan = physical_plan(df)
    assert "TakeOrderedAndProject" in plan, f"expected TakeOrderedAndProject:\n{plan}"


def assert_whole_stage_codegen(df: DataFrame) -> None:
    """The hot path must run inside whole-stage codegen (`* `-starred
    operators / `[codegen id : N]` annotations in the formatted plan).
    Under AQE the final plan only materializes after an action — run one
    first if the plan is still `isFinalPlan=false`."""
    plan = physical_plan(df)
    if "isFinalPlan=false" in plan and "[codegen id" not in plan:
        df.collect()  # materialize so AQE publishes the final plan (count() would explain a different QueryExecution)
        plan = physical_plan(df)
    assert "[codegen id" in plan or "WholeStageCodegen" in plan, f"no codegen spans:\n{plan}"


def assert_no_roundrobin_exchange(df: DataFrame) -> None:
    """No round-robin repartition anywhere in the plan — a
    ``repartition(n)`` of an already-well-split input is a full shuffle
    of the corpus for nothing at 100 TB (``partitioning.spread`` must
    no-op when the scan yields enough splits)."""
    plan = physical_plan(df)
    assert "RoundRobinPartitioning" not in plan, (
        f"unexpected round-robin exchange:\n{plan}"
    )


def assert_single_shuffle(df: DataFrame) -> None:
    """At most one Exchange — for operators advertised as one-shuffle
    (window aggs, as-of join)."""
    plan = physical_plan(df)
    ops = [ln for ln in plan.splitlines() if "Exchange" in ln and "hashpartitioning" in ln]
    assert len(ops) <= 1, f"expected ≤1 hash exchange, found {len(ops)}:\n{plan}"
