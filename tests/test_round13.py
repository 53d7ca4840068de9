"""Round-13 additions: the q11 single-task-window fix (plan-asserted),
the span-REMOVAL tier of exact-substring dedup, and the salted-split
recall driver gate's invariants."""

from __future__ import annotations

import pytest

SF = "/root/testdata/sf0.001"


# ----------------------------- q11: no unpartitioned window in the plan


def test_q11_plan_has_no_window_and_broadcasts_the_total(spark):
    """The global (total_cents, n_parts) must come from a 1-row broadcast
    — NOT `sum(...) OVER ()`: the grouped frame is parts-cardinality, and
    an unpartitioned window sorts it in a single task at scale. Assert on
    the executed plan: zero Window nodes, and the totals ride a
    BroadcastExchange/BroadcastNestedLoopJoin."""
    from proteus_engine_spark.queries.registry import REGISTRY

    df = REGISTRY["q11_important_stock"].fn(spark, SF)
    df.collect()  # final (post-AQE) plan
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    assert "Broadcast" in plan


def test_q11_totals_match_group_sum(spark):
    """Cross-check the broadcast totals path against an independent
    recomputation: every returned part must satisfy the 2x-mean cut
    recomputed from the full grouped frame."""
    from pyspark.sql import functions as F

    from proteus_engine_spark.queries.relational_ext import derived_partsupp
    from proteus_engine_spark.queries.registry import REGISTRY
    from proteus_engine_spark.sources import load_table

    out = {r.ps_partkey: r.value_cents
           for r in REGISTRY["q11_important_stock"].fn(spark, SF).collect()}
    ps = derived_partsupp(spark, SF)
    cohort = load_table(spark, SF, "supplier").filter(F.col("s_nationkey") % 5 == 2)
    g = (
        ps.join(cohort, F.col("ps_suppkey") == F.col("s_suppkey"))
        .groupBy("ps_partkey")
        .agg(F.sum(F.col("ps_cost_cents") * F.col("ps_availqty")).alias("v"))
        .collect()
    )
    total = sum(r.v for r in g)
    n = len(g)
    expect = {r.ps_partkey: r.v for r in g if r.v * n > 2 * total}
    assert out == expect


# ------------------------------------------- remove_duplicate_spans


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_remove_duplicate_spans_cuts_shared_span_only(spark):
    """Two docs share one 4-token span inside otherwise-unique text: the
    shared tokens (and every token covered by a duplicated window) are
    cut from both; unique tokens survive in order."""
    from proteus_engine_spark.datapipe.dedup import remove_duplicate_spans

    shared = "alpha beta gamma delta"
    rows = [
        (1, f"one two three {shared} four five six"),
        (2, f"seven eight nine {shared} ten eleven twelve"),
        (3, "completely unique text with no repeats at all here"),
    ]
    out = {r.doc_id: r for r in
           remove_duplicate_spans(_docs(spark, rows), k=4).collect()}
    assert out[1].text_clean == "one two three four five six"
    assert out[1].n_tokens == 10 and out[1].n_removed == 4
    assert out[2].text_clean == "seven eight nine ten eleven twelve"
    assert out[3].n_removed == 0
    assert out[3].text_clean == rows[2][1]


def test_remove_duplicate_spans_overlapping_windows_cover_union(spark):
    """A duplicated region longer than k removes the UNION of all covered
    positions — two docs sharing a 6-token run at k=4 lose all 6 tokens
    (three overlapping duplicated windows), not just the first 4."""
    from proteus_engine_spark.datapipe.dedup import remove_duplicate_spans

    run = "a b c d e f"
    rows = [(1, f"x1 {run} y1"), (2, f"x2 {run} y2")]
    out = {r.doc_id: r for r in
           remove_duplicate_spans(_docs(spark, rows), k=4).collect()}
    assert out[1].text_clean == "x1 y1"
    assert out[1].n_removed == 6
    assert out[2].text_clean == "x2 y2"


def test_remove_duplicate_spans_edge_docs(spark):
    """Short docs (< k tokens) pass through uncut even when identical;
    a fully-duplicated doc comes back as the empty string with every
    token counted removed; output is one row per input doc."""
    from proteus_engine_spark.datapipe.dedup import remove_duplicate_spans

    dup = "w1 w2 w3 w4 w5"
    rows = [(1, "tiny doc"), (2, "tiny doc"), (3, dup), (4, dup)]
    out = {r.doc_id: r for r in
           remove_duplicate_spans(_docs(spark, rows), k=5).collect()}
    assert len(out) == 4
    assert out[1].text_clean == "tiny doc" and out[1].n_removed == 0
    assert out[2].text_clean == "tiny doc"
    assert out[3].text_clean == "" and out[3].n_removed == 5
    assert out[4].text_clean == ""


def test_remove_duplicate_spans_consistent_with_scoring_tier(spark):
    """The removal tier and the scoring tier must agree on WHICH docs are
    touched: on the sf0.001 documents corpus, exactly the docs with
    n_dup_spans > 0 in duplicate_spans() have n_removed > 0 (docs shorter
    than k are absent from the scoring tier and uncut here)."""
    from proteus_engine_spark.datapipe.dedup import (
        duplicate_spans,
        remove_duplicate_spans,
    )
    from proteus_engine_spark.sources import load_table

    docs = load_table(spark, SF, "documents")
    scored = {r.doc_id for r in duplicate_spans(docs, k=10).collect()
              if r.n_dup_spans > 0}
    removed = {r.doc_id for r in remove_duplicate_spans(docs, k=10).collect()
               if r.n_removed > 0}
    assert scored == removed
    assert len(removed) > 0  # the corpus genuinely exercises the cut


# ------------------------------------------------- semantic dedup (SemDeDup)


def test_semantic_dedup_keeps_lowest_id_per_duplicate_group(spark):
    """Production path (Lloyd-refined quantizer, n_iter=2): three groups
    of near-identical vectors along distinct directions + two singletons.
    Seeds are the lowest-id vectors, so ids 0-3 are deliberately spread
    across groups (one per direction) — Lloyd converges each group into
    its own cluster, and within each group exactly the lowest id
    survives; singletons always survive."""
    from proteus_engine_spark.datapipe.dedup import semantic_dedup

    def v(base, eps):
        return [float(b + e) for b, e in zip(base, eps)]

    g1, g2, g3 = [1.0, 0, 0, 0], [0, 1.0, 0, 0], [0, 0, 1.0, 0]
    s1, s2 = [0.6, -0.6, 0.4, 0.3], [-0.5, 0.3, -0.6, 0.55]
    rows = [
        (0, v(g1, [0, 0.01, 0, 0])), (4, v(g1, [0, 0, 0.02, 0])), (5, v(g1, [0.01, 0, 0, 0.01])),
        (1, v(g2, [0.02, 0, 0, 0])), (6, v(g2, [0, 0.01, 0.01, 0])), (7, v(g2, [0, 0, 0, 0.02])),
        (2, v(g3, [0, 0.02, 0, 0])), (8, v(g3, [0.01, 0, 0.01, 0])), (9, v(g3, [0, 0, 0.02, 0])),
        (3, v(s1, [0, 0, 0, 0])), (10, v(s2, [0, 0, 0, 0])),
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = {r.vec_id: r for r in
           semantic_dedup(emb, dim=4, n_clusters=4, n_iter=2, threshold=0.9).collect()}
    assert len(out) == 11
    kept = {i for i, r in out.items() if r.kept}
    assert kept == {0, 1, 2, 3, 10}
    # group members co-cluster (the within-cluster prune saw each group whole)
    assert out[0].cluster == out[4].cluster == out[5].cluster
    assert out[1].cluster == out[6].cluster == out[7].cluster
    assert out[2].cluster == out[8].cluster == out[9].cluster


def test_semantic_dedup_drop_rule_is_sound(spark):
    """On the real embeddings corpus: every dropped vector must have a
    lower-id same-cluster neighbor with cosine >= threshold (recomputed
    independently from the returned clusters + raw vectors), and the
    lowest id of every cluster is always kept."""
    import math

    from proteus_engine_spark.datapipe.dedup import semantic_dedup
    from proteus_engine_spark.sources import load_table

    emb = load_table(spark, SF, "embeddings").limit(200)
    out = semantic_dedup(emb, n_iter=1, threshold=0.35).collect()
    vecs = {r.vec_id: r.embedding for r in
            emb.select("vec_id", "embedding").collect()}

    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        return round(d / (math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(x * x for x in b))), 6)

    by_cluster: dict[int, list] = {}
    for r in out:
        by_cluster.setdefault(r.cluster, []).append(r)
    n_dropped = 0
    for members in by_cluster.values():
        members.sort(key=lambda r: r.vec_id)
        assert members[0].kept  # lowest id of the cluster always survives
        for i, r in enumerate(members):
            if not r.kept:
                n_dropped += 1
                assert any(
                    cos(vecs[m.vec_id], vecs[r.vec_id]) >= 0.35
                    for m in members[:i]
                )
    assert n_dropped > 0  # the corpus genuinely exercises the prune


# --------------------------------------- cap-metrics probe degradation


def test_bucket_cap_metrics_degrades_without_private_probe(spark):
    """_BucketCapMetrics probes completion via pyspark-private
    Observation._jo; a pyspark upgrade that renames the attribute (or its
    getOrEmpty method) must degrade to the explicit stats_df fallback — a
    real measurement — never crash the accessor."""
    from pyspark.sql import functions as F

    from proteus_engine_spark.datapipe.dedup import _BucketCapMetrics

    stats = spark.range(1).select(
        F.lit(3).alias("oversized_buckets"),
        F.lit(42).alias("oversized_bucket_docs"),
        F.lit(17).alias("max_bucket_docs"),
    )

    class _NoJo:  # the post-rename shape: no _jo at all
        pass

    m = _BucketCapMetrics(_NoJo(), stats)
    assert m.get == {
        "oversized_buckets": 3,
        "oversized_bucket_docs": 42,
        "max_bucket_docs": 17,
    }

    class _RenamedMethod:  # _jo exists but its accessor surface changed
        class _J:
            def __getattr__(self, name):
                raise AttributeError(name)

        _jo = _J()

    m2 = _BucketCapMetrics(_RenamedMethod(), stats)
    assert m2.get["oversized_buckets"] == 3


# ------------------------------------------- salted-recall gate invariants


def test_salted_recall_gate_booleans_hold(spark):
    """The driver gate's measured booleans hold at the smallest SF (the
    derived 120-doc probe is SF-independent as long as documents has 120
    ids, which every driver SF does)."""
    from proteus_engine_spark.queries.registry import REGISTRY

    row = REGISTRY["dedup_lsh_salted_recall"].fn(spark, SF).collect()[0]
    assert row.n_exact_pairs == 7140  # C(120,2)
    assert row.survivors_qualify is True
    assert row.recall_floor_met is True
