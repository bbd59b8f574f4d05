"""Every registered query must match its DuckDB oracle — the driver's t2
gate, run locally at the driver's own scale (sf0.01, override with
SPARK_GRAFT_PARITY_SF) and with dtype-family strictness so that
driver-hash artifacts (int64 vs float64) fail here first."""

from __future__ import annotations

import os

import pytest

from spark_pipeline_spark.queries import REGISTRY
from spark_pipeline_spark.session import release_query_caches
from tests.conftest import SF_ORACLE
from tests.oracle import compare, register_views

PARITY_SF = os.environ.get("SPARK_GRAFT_PARITY_SF", SF_ORACLE)


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_matches_oracle(spark, duck, name):
    q = REGISTRY[name]
    try:
        df = q.fn(spark, PARITY_SF)
        if q.oracle is None:
            assert df.count() >= 0  # rows-only check (driver's weaker gate)
            return
        register_views(duck, PARITY_SF)
        problems = compare(df, duck, q.oracle)
        assert not problems, f"{name}: {problems}"
    finally:
        release_query_caches()
