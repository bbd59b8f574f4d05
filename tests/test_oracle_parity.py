"""Every registered query must match its DuckDB oracle (the driver's t2
gate, run locally at sf0.001 for speed — the driver uses sf0.01)."""

from __future__ import annotations

import pytest

from spark_pipeline_spark.queries import REGISTRY
from tests.conftest import SF_SMALL
from tests.oracle import compare, register_views


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_matches_oracle(spark, duck, name):
    q = REGISTRY[name]
    df = q.fn(spark, SF_SMALL)
    if q.oracle is None:
        assert df.count() >= 0  # rows-only check (driver's weaker gate)
        return
    register_views(duck, SF_SMALL)
    problems = compare(df, duck, q.oracle)
    assert not problems, f"{name}: {problems}"
