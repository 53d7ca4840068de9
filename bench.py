#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Timing = median of 3 warm runs per query (1 discarded warm-up), action =
full materialization via a count over the result (no driver collect of
payload rows).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Headline set: the TPC-H anchors + one representative per operator family,
# including the datapipe / streaming / temporal extensions.
HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q9_product_type_profit",
    "q13_customer_distribution",
    "q21_waiting_supplier",
    "q5_local_supplier_volume",
    "q6_forecast_revenue",
    "q10_returned_items",
    "q18_large_volume_customer",
    "sort_topk_per_group",
    "over_running_agg",
    "agg_grouping_sets",
    "window_session",
    "dedup_exact",
    "dedup_minhash_lsh",
    "zip_with_index_bulk",
    "dedup_embedding_cosine",
    "sim_topk_bruteforce",
    "asof_join_events",
    "stream_tumble_agg",
    "cep_signup_purchase",
    # added round 7 (exclude from cross-round like-for-like totals):
    # the graph library's heaviest two — iterative pagerank and the
    # span-batched shared-neighbor pipeline
    "graph_pagerank",
    "graph_jaccard",
    # added round 8 (exclude from cross-round like-for-like totals):
    # the new training-data pipeline family — n-gram repetition signals
    # (tagged explode + doc-keyed aggs), regex PII redaction (pure
    # codegen), and md5-threshold stratified sampling (scan-fused filter)
    "text_repetition_stats",
    "pii_redaction",
    "corpus_stratified_sample",
    # added round 10 (exclude from cross-round like-for-like totals):
    # benchmark decontamination (hashed n-gram overlap join) and
    # concat-then-chunk sequence packing (two-phase parallel prefix sum)
    "text_decontaminate",
    "corpus_pack_sequences",
    "text_tfidf_top_terms",
    # added round 11 (exclude from cross-round like-for-like totals):
    # corpus-LM bigram quality scoring (single-pass doc-bigram model)
    "text_bigram_logprob",
    # added round 12 (exclude from cross-round like-for-like totals):
    # DeltaTrigger on GlobalWindows — the custom-stateful trigger path's
    # per-element value walk (watermark-buffered applyInPandasWithState)
    "stream_delta_trigger_fires",
    # added round 13 (exclude from cross-round like-for-like totals):
    # the span-REMOVAL tier of exact-substring dedup (explode + anti-join
    # + ordered reassembly) and SemDeDup cluster-then-prune over the
    # embeddings table (k-means quantizer + within-cluster BLAS cosine)
    "text_remove_duplicate_spans",
    "dedup_semantic",
    # added round 13, second batch (exclude from like-for-like totals):
    # Bloom runtime-filter decontamination (broadcast-bitmap map-side
    # prune — NOTE: slower than plain text_decontaminate at sf0.1, where
    # the synthetic corpus is contamination-heavy and the exact join is
    # cheap; the tier exists for the <<1%-contamination 100 TB shape and
    # its fixed costs — the build job + Arrow probe pass — are what this
    # datapoint tracks), zero-shuffle sliding-window chunking, and the
    # md5 epoch-shuffle permutation (parallel range sort + two-phase rank)
    "text_decontaminate_bloom",
    "corpus_chunk_windows",
    "corpus_shuffle_order",
    # added round 13, third batch (exclude from like-for-like totals):
    # the Gopher seven-rule heuristic filter (zero-shuffle scan-fused),
    # DSIR importance-resampling selection (one (doc,bucket) shuffle +
    # broadcast model + two-phase rank), and SQ8 scalar-quantization ANN
    # (exact min/max train, one-scan uint8 encode, asymmetric scoring)
    "text_gopher_rules",
    "corpus_dsir_select",
    "sim_ann_sq8",
    # added round 13, fourth batch (exclude from like-for-like totals):
    # Okapi BM25 batch retrieval (broadcast query terms prune the
    # postings shuffle; one corpus-sized doc-length count) and the
    # Naive Bayes source classifier (aggregation-trained dense model,
    # exact integer micro-nat scoring)
    "text_bm25_topk",
    "text_nb_source_classify",
    # added round 13, fifth batch (exclude from like-for-like totals):
    # kNN label transfer on the BLAS partial-top-k path, the composed
    # end-to-end pipeline run (filter ∧ dedup keep → kept report), and
    # gap-based batch sessionization (user-partitioned lag + cumsum)
    "sim_knn_classify",
    "corpus_pipeline_e2e",
    "events_sessionize",
    # added round 14 (exclude from cross-round like-for-like totals):
    # one representative each of the r13 events-analytics and sketch
    # families (r13 verdict item 7) — rolling DAU/WAU/MAU (constant-
    # bounded offset explode + distinct-frame counts) and the Count-Min
    # table + heavy-hitter probe (pure-codegen seeded bucketing)
    "events_active_users",
    "agg_count_min_bounds",
    # added round 15 (exclude from cross-round like-for-like totals):
    # one representative each of the r15 families — chained stateful
    # streaming (tumble → session windows-on-windows in one query) and
    # NB margin calibration (full-score frame + percentile-cut deciles)
    "stream_session_windows_chained",
    "classify_calibration_bins",
    # added round 16 (exclude from cross-round like-for-like totals):
    # one representative each of the r16 families — nested state-counted
    # CEP loops (quantified inner step inside a quantified group) and the
    # banded perceptual-hash near-dup tier (mapInPandas dHash + exact
    # 4x15-bit Hamming bucketing)
    "cep_group_inner_quantifier",
    "multimodal_phash_neardup",
    # added round 17 (exclude from cross-round like-for-like totals):
    # one representative each of the r17 families — subset-semantics CEP
    # (allowCombinations on an inner loop of a quantified group: branch
    # growth is data-bounded by the value>100 slice) and the streaming
    # member of the media dedup tier (in-stream fingerprinting +
    # watermark-bounded dedup state + bipartite banded stream-static join)
    "cep_group_inner_combinations",
    "stream_dedup_media_phash",
]


def main() -> None:
    from proteus_engine_spark.queries.registry import REGISTRY
    from proteus_engine_spark.session import get_session

    spark = get_session(app_name="proteus-bench")
    sf = SF_DIR.rstrip("/").split("sf")[-1]

    names = [n for n in HEADLINE if n in REGISTRY]
    extra = os.environ.get("PROTEUS_BENCH_QUERIES")
    if extra:
        names = [n.strip() for n in extra.split(",") if n.strip() in REGISTRY]

    def timed(action) -> float:
        """Median-of-3 warm runs; queries that come in under ~1s get 2
        extra runs (median-of-5) — sub-second timings showed ±30-66%
        run-to-run swings from sandbox I/O state (r10 adjudication), and
        the wider median is the cheap half of the fix (the attributable
        half is the I/O calibration probe below)."""
        action()  # warm-up run (JIT, codegen, file-listing caches)
        runs = []
        for _ in range(3):
            t0 = time.perf_counter()
            action()
            runs.append(time.perf_counter() - t0)
        if statistics.median(runs) < 1.0:
            for _ in range(2):
                t0 = time.perf_counter()
                action()
                runs.append(time.perf_counter() - t0)
        return round(statistics.median(runs), 4)

    # Three fixed-shape calibration probes, independent of every engine
    # change, recorded so cross-round wall-clock drift is ATTRIBUTABLE
    # (all EXCLUDED from the headline total):
    # - calibration_sec: sum over a 200M-row range — pure whole-stage
    #   codegen, no I/O; moves with CPU throttling/load only.
    # - calibration_io_sec: full warm parquet scan+agg of lineitem
    #   including the wide string column — moves with page-cache and
    #   filesystem contention, which the CPU probe is blind to (the r10
    #   "1.23x regression" was exactly this, on unchanged code).
    # Judge drift on the probe that matches the query class: scan-heavy
    # queries against io, compute-heavy against cpu, join/agg-heavy
    # (the TPC-H cluster) against shuffle.
    calibration = timed(
        lambda: spark.range(200_000_000).selectExpr("sum(id)").collect()
    )
    calibration_io = timed(
        lambda: spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
        .selectExpr(
            "count(*)",
            "sum(l_extendedprice)",
            "sum(l_quantity)",
            "max(l_returnflag)",
            "sum(length(cast(l_shipdate as string) || l_linestatus))",
        )
        .collect()
    )
    # - calibration_shuffle_sec: fixed 32-way groupBy + forced sort-merge
    #   self-join on a CACHED 20M-row synthetic frame — no I/O, and unlike
    #   the single-threaded CPU probe it exercises exchange + sort across
    #   all cores, so sandbox co-tenancy on the multi-core shuffle path
    #   (the r12 "1.3x TPC-H cluster on unchanged code" — invisible to
    #   both other probes) becomes attributable.
    shuffle_src = (
        spark.range(20_000_000)
        .selectExpr("id % 1000000 AS k", "id % 97 AS v")
        .repartition(32)
        .persist()
    )
    shuffle_src.count()  # materialize the cache outside the timed region
    calibration_shuffle = timed(
        lambda: shuffle_src.groupBy("k")
        .sum("v")
        .join(shuffle_src.hint("merge"), "k")
        .selectExpr("sum(`sum(v)` + v)")
        .collect()
    )
    shuffle_src.unpersist()

    timings: dict[str, float] = {}
    for name in names:
        fn = REGISTRY[name].fn
        # §1.5: label every query's jobs so UI/event-log traces are
        # attributable when the bench runs with the UI enabled.
        spark.sparkContext.setJobDescription(f"bench: {name}")
        timings[name] = timed(lambda: fn(spark, SF_DIR).count())
    spark.sparkContext.setJobDescription(None)

    total = round(sum(timings.values()), 4)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "calibration_sec": calibration,
                "calibration_io_sec": calibration_io,
                "calibration_shuffle_sec": calibration_shuffle,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
