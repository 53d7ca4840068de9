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


def test_q1_uses_partial_aggregation(spark):
    """Q1 must partial-aggregate map-side: two HashAggregate levels with the
    shuffle carrying only 6 groups of partial states."""
    plan = REGISTRY["q1_pricing_summary"].fn(spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("HashAggregate") >= 2
    assert plan.count("Exchange") == 1


def test_dedup_exact_prunes_columns(spark):
    """dedup_exact must read only (doc_id, text) — shuffling other document
    columns would multiply the 100 TB shuffle for no reason."""
    plan = REGISTRY["dedup_exact"].fn(spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()
    rs = plan.split("ReadSchema: ")[1].split("\n")[0]
    assert "doc_id" in rs and "text" in rs
    assert "lang" not in rs and "source" not in rs and "n_chars" not in rs


def test_minhash_signature_single_shuffle(spark):
    """The MinHash signature stage must shuffle once (the explicit
    repartition); groupBy(doc_id) reuses that partitioning, and the
    shuffled payload is partial minima, not shingle strings."""
    from proteus_engine_spark.datapipe.dedup import minhash_signatures

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    plan = minhash_signatures(docs)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1


def test_sim_bruteforce_broadcasts_queries(spark):
    """Brute-force top-k must broadcast the query side (nested-loop over the
    corpus scan) — shuffling the corpus against 5 queries would be wrong at
    any scale."""
    plan = REGISTRY["sim_topk_bruteforce"].fn(spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan


def test_embedding_cosine_gemm_single_shuffle(spark):
    """The blocked gemm scorer must shuffle the vectors exactly once (on
    the block key, into applyInPandas) — the fold path's self-join
    exchanges both sides, which doubles the vector traffic at 100 TB."""
    from proteus_engine_spark.datapipe.dedup import embedding_cosine_pairs

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    plan = (
        embedding_cosine_pairs(emb, threshold=0.35, block_col="label")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange") == 1
    assert "FlatMapGroupsInPandas" in plan
