"""Every registered query vs its DuckDB oracle at sf0.001 — the local
replica of the driver's t2 correctness gate (row count + column names +
order-insensitive value hash)."""

from __future__ import annotations

import pytest

from flink_anomaly_spark.plans.registry import all_oracles, all_queries
from tests.conftest import SF_SMOKE
from tools.check_oracle import normalize

_QUERIES = all_queries()
_ORACLES = all_oracles()


@pytest.mark.parametrize("name", sorted(_QUERIES))
def test_query_matches_oracle(spark, duck, name):
    sdf = _QUERIES[name](spark, SF_SMOKE)
    if name not in _ORACLES:
        # rows-only check: every registered query must produce rows at
        # sf0.001 (>= 0 would be vacuous); count() avoids the full
        # canonicalization work
        assert sdf.count() > 0
        return
    s_n, s_cols, s_hash = normalize(sdf)
    odf = duck.execute(_ORACLES[name]).fetchdf()
    o_n, o_cols, o_hash = normalize(odf)
    assert s_n == o_n, f"row count {s_n} != oracle {o_n}"
    assert s_cols == o_cols, f"columns {s_cols} != oracle {o_cols}"
    assert s_hash == o_hash, "order-insensitive value hash mismatch"


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert set(df.columns) == {"event_id", "event_type", "running_concat"}


def test_registry_consistency():
    # every oracle key must have a query
    assert set(_ORACLES) <= set(_QUERIES)
