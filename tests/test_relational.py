"""Oracle-checked tests for every registered query (the local replica of the
driver's t2 gate), plus plan-shape assertions for the scale-critical ones
(SURVEY §5 layer 2)."""

from __future__ import annotations

import pytest

from proteus_engine_spark.queries.registry import REGISTRY
from tests.conftest import SF_DIR, assert_matches_oracle

ORACLE_QUERIES = sorted(name for name, q in REGISTRY.items() if q.oracle is not None)
ROWS_ONLY_QUERIES = sorted(name for name, q in REGISTRY.items() if q.oracle is None)


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_query_matches_oracle(spark, duck, name):
    q = REGISTRY[name]
    df = q.fn(spark, SF_DIR)
    assert_matches_oracle(df, duck, q.oracle)


@pytest.mark.parametrize("name", ROWS_ONLY_QUERIES)
def test_query_runs(spark, name):
    q = REGISTRY[name]
    df = q.fn(spark, SF_DIR)
    n = df.count()
    assert n >= 0
    assert df.schema is not None


def test_q3_plan_broadcasts_customer(spark):
    """Q3's customer side must broadcast — a shuffled customer join would be
    a needless 100 TB-side shuffle at scale."""
    plan = REGISTRY["q3_shipping_priority"].fn(spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_q6_pushes_filters_to_scan(spark):
    """Q6's predicates must reach the parquet scan (PushedFilters)."""
    df = REGISTRY["q6_forecast_revenue"].fn(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan
    assert "l_shipdate" in plan.split("PushedFilters")[1][:400]
