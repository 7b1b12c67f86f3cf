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


def test_canonicalizer_distinguishes_int_from_float():
    """The local gate's value canonicalizer must preserve the int/float
    distinction the driver's canonicalizer preserves: DuckDB sum(BIGINT)
    returns HUGEINT -> pandas float64, so an oracle emitting 32.0
    against Spark's bigint 32 must FAIL locally (the round-3
    doc_repetition_profile bug slipped through the old '%.12g'
    formatting, which printed 32.0 as '32')."""
    import numpy as np
    import pandas as pd

    from tools.check_oracle import _canon, normalize

    assert _canon(np.int64(32)) != _canon(np.float64(32.0))
    assert _canon(32) == _canon(np.int64(32))
    assert _canon(32.0) == _canon(np.float64(32.0))
    # shortest-round-trip repr keeps full double precision
    assert _canon(0.1 + 0.2) != _canon(0.3)
    spark_like = pd.DataFrame({"n": pd.array([32, 7], dtype="int64")})
    oracle_like = pd.DataFrame({"n": pd.array([32.0, 7.0], dtype="float64")})
    assert normalize(spark_like)[2] != normalize(oracle_like)[2]
