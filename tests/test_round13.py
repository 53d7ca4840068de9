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


# ----------------------------- Bloom-prefiltered decontamination


class TestBloomDecontam:
    def _frames(self, spark):
        from pyspark.sql import functions as F

        from proteus_engine_spark.sources import load_table

        docs = load_table(spark, SF, "documents")
        return (
            docs.filter(F.col("doc_id") % 53 != 0),
            docs.filter(F.col("doc_id") % 53 == 0),
        )

    def test_bloom_output_identical_to_exact_path(self, spark):
        """A Bloom filter has no false negatives and survivors re-pass the
        exact join, so the prefiltered counts must EQUAL the exact path's
        for any (m_bits, k) — checked at the default and at a deliberately
        tiny bitmap (256 bits: high FP rate, everything still correct)."""
        from proteus_engine_spark.datapipe.decontam import (
            ngram_overlap_counts,
            ngram_overlap_counts_bloom,
        )

        corpus, ev = self._frames(spark)
        exact = {
            r.doc_id: r.n_shared_grams
            for r in ngram_overlap_counts(corpus, ev, n=3).collect()
        }
        assert exact, "split must produce a non-empty overlap set"
        for m_bits, k in ((1 << 23, 3), (256, 2)):
            got = {
                r.doc_id: r.n_shared_grams
                for r in ngram_overlap_counts_bloom(
                    corpus, ev, n=3, m_bits=m_bits, k_hashes=k
                ).collect()
            }
            assert got == exact

    def test_bloom_actually_prunes(self, spark):
        """At the default sizing the prefilter must remove most of the
        corpus gram stream (the entire point of the tier). Measured by
        running the probe stage standalone: survivors << total grams."""
        import numpy as np
        from pyspark.sql import functions as F

        from proteus_engine_spark.datapipe import decontam as dc

        corpus, ev = self._frames(spark)
        n = 3
        from proteus_engine_spark.datapipe.dedup import shingle_array
        from proteus_engine_spark.datapipe.textstats import _tokens

        grams = corpus.select(
            F.explode(
                F.when(F.size(_tokens("text")) >= n, shingle_array("text", k=n))
                .otherwise(F.array().cast("array<string>"))
            ).alias("gram")
        ).select(F.xxhash64("gram").alias("gh"))
        total = grams.count()
        # Rebuild the same bitmap the operator builds and probe in numpy.
        ev_grams = ev.select(
            F.explode(
                F.when(F.size(_tokens("text")) >= n, shingle_array("text", k=n))
                .otherwise(F.array().cast("array<string>"))
            ).alias("gram")
        ).select(F.xxhash64("gram").alias("gh")).distinct()
        m_bits, k = 1 << 23, 3
        pos = ev_grams.select(
            F.explode(F.array(*dc._gram_positions(F.col("gh"), m_bits, k))).alias("p")
        ).distinct()
        bits = np.zeros(m_bits >> 3, dtype=np.uint8)
        p = np.array([r.p for r in pos.collect()], dtype=np.int64)
        np.bitwise_or.at(bits, p >> 3, (1 << (p & 7)).astype(np.uint8))
        probe = grams.select(
            "gh", F.array(*dc._gram_positions(F.col("gh"), m_bits, k)).alias("bp")
        ).collect()
        hits = 0
        for r in probe:
            bp = np.array(r.bp, dtype=np.int64)
            if (((bits[bp >> 3] >> (bp & 7)) & 1) == 1).all():
                hits += 1
        # The synthetic corpus is contamination-heavy vs a real pipeline,
        # so just require REAL pruning, not a production ratio.
        assert hits < total * 0.9
        assert hits > 0

    def test_bloom_validation(self, spark):
        from proteus_engine_spark.datapipe.decontam import ngram_overlap_counts_bloom

        corpus, ev = self._frames(spark)
        with pytest.raises(ValueError, match="power of two"):
            ngram_overlap_counts_bloom(corpus, ev, m_bits=1000)
        with pytest.raises(ValueError, match="k_hashes"):
            ngram_overlap_counts_bloom(corpus, ev, k_hashes=0)

    def test_decontaminate_bloom_wrapper_matches_exact(self, spark):
        from proteus_engine_spark.datapipe.decontam import decontaminate

        corpus, ev = self._frames(spark)
        kept_exact = {r.doc_id for r in decontaminate(corpus, ev, n=3).collect()}
        # the bloom tier is a prefilter inside the counts; the wrapper
        # parity check goes through the counts equality above, so here
        # just pin the anti-join contract: kept = corpus - flagged
        from proteus_engine_spark.datapipe.decontam import ngram_overlap_counts_bloom

        flagged = {
            r.doc_id for r in ngram_overlap_counts_bloom(corpus, ev, n=3).collect()
        }
        all_ids = {r.doc_id for r in corpus.select("doc_id").collect()}
        assert kept_exact == all_ids - flagged


# ----------------------------- Fuzzy (MinHash bipartite) decontamination


class TestFuzzyDecontam:
    def _frames(self, spark):
        from pyspark.sql import functions as F

        from proteus_engine_spark.sources import load_table

        docs = load_table(spark, SF, "documents")
        return (
            docs.filter(F.col("doc_id") % 10 != 5),
            docs.filter(F.col("doc_id") % 10 == 5),
        )

    def test_fuzzy_pairs_equal_exact_bipartite_jaccard(self, spark):
        """The exact-verified LSH output must equal the brute-force
        bipartite Jaccard pair set at this threshold (the corpus's
        qualifying pairs all have J >= 0.9 — recall-1 territory for
        64 perms / 16 bands)."""
        from pyspark.sql import functions as F

        from proteus_engine_spark.datapipe.decontam import fuzzy_overlap_pairs
        from proteus_engine_spark.datapipe.dedup import shingle_array

        corpus, ev = self._frames(spark)
        got = {
            (r.doc_id, r.eval_id): round(r.jaccard, 6)
            for r in fuzzy_overlap_pairs(corpus, ev, jaccard_threshold=0.5).collect()
        }
        c = corpus.select(F.col("doc_id").alias("cid"), shingle_array("text").alias("cs"))
        e = ev.select(F.col("doc_id").alias("eid"), shingle_array("text").alias("es"))
        jac = (
            F.size(F.array_intersect("cs", "es")).cast("double")
            / F.size(F.array_union("cs", "es"))
        ).alias("j")
        want = {
            (r.cid, r.eid): round(r.j, 6)
            for r in c.crossJoin(e).select("cid", "eid", jac)
            .filter(F.col("j") >= 0.5)
            .collect()
        }
        assert got == want
        assert want, "split must cross at least one planted near-dup pair"

    def test_fuzzy_decontaminate_drops_exactly_flagged(self, spark):
        from proteus_engine_spark.datapipe.decontam import (
            fuzzy_decontaminate,
            fuzzy_overlap_pairs,
        )

        corpus, ev = self._frames(spark)
        flagged = {
            r.doc_id
            for r in fuzzy_overlap_pairs(corpus, ev, jaccard_threshold=0.5).collect()
        }
        kept = {r.doc_id for r in fuzzy_decontaminate(corpus, ev).collect()}
        all_ids = {r.doc_id for r in corpus.select("doc_id").collect()}
        assert kept == all_ids - flagged

    def test_fuzzy_validation(self, spark):
        from proteus_engine_spark.datapipe.decontam import fuzzy_overlap_pairs

        corpus, ev = self._frames(spark)
        with pytest.raises(ValueError, match="divide"):
            fuzzy_overlap_pairs(corpus, ev, num_perm=64, bands=7)


class TestBloomDecontamEdges:
    def test_bloom_empty_eval_set_flags_nothing(self, spark):
        """An empty benchmark builds an all-zero bitmap: every corpus gram
        is pruned map-side and the output is empty — same answer as the
        exact path, with the join input already empty."""
        from proteus_engine_spark.datapipe.decontam import ngram_overlap_counts_bloom

        corpus, ev = TestBloomDecontam._frames(self, spark)
        empty = ev.filter("doc_id < 0")
        assert ngram_overlap_counts_bloom(corpus, empty, n=3).count() == 0

    def test_bloom_short_docs_contribute_no_grams(self, spark):
        """Docs shorter than n tokens emit no grams on either side (the
        decontam convention) — a corpus of only short docs yields an
        empty overlap set even against a contaminated eval side."""
        from proteus_engine_spark.datapipe.decontam import ngram_overlap_counts_bloom

        corpus, ev = TestBloomDecontam._frames(self, spark)
        short = corpus.selectExpr(
            "doc_id",
            "array_join(slice(split(lower(text), '\\\\s+'), 1, 2), ' ') AS text",
        )
        assert ngram_overlap_counts_bloom(short, ev, n=3).count() == 0
