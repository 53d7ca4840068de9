"""Import all query modules so their @register calls populate REGISTRY.

The driver's correctness gate checks a bounded prefix of the registry in
insertion order (round 1 recorded exactly the first 50 entries), so the
registry is explicitly re-ordered after import: queries that still need a
driver-verified row go first, queries already green in a previous round's
CORRECTNESS_r*.json go last. Update _GATE_PRIORITY each round.
"""

from proteus_engine_spark.queries.registry import REGISTRY, oracles, queries

from proteus_engine_spark.queries import (  # noqa: F401
    datapipe_q,
    functions_q,
    graph_q,
    ml_q,
    relational,
    relational_ext,
    resilience_q,
    streaming_q,
    surface_q,
    temporal_q,
    windows_q,
)

# Round-14 priority window (the driver checks the first ~50 registry
# entries; r11-r13 all recorded exactly 50). The r13 verdict's #1 order:
# dedicate the ENTIRE window to the never-driver-checked backlog (59
# registry queries had no CORRECTNESS row after r13) and freeze registry
# growth. Composition: the 24 r13 gates that were already queued at
# r13 positions 53-76 lead (same order), then 26 more of the r13 wave —
# including every query whose semantics CHANGED this round and must be
# driver-checked in its fixed form: corpus_weighted_sample (iterated
# 3-step Lehmer uniforms — the r13-advice medium fix; one step was
# monotone for small sequential ids), events_cohort_retention (floor
# week division on both engines, not Spark div-truncate),
# agg_count_min_bounds (analytic 3N/256 overcount bound replacing the
# tuned 2N/256), corpus_bigram_pmi (top-k rewritten TakeOrdered —
# the r13 verdict's one scale-killer), and sim_knn_classify (gemm
# midpoint risk now documented at the gate). Positions 51-56 hold the
# six remaining never-checked gates (text_concordance,
# corpus_fixed_n_sample, corpus_bucketed_batches,
# events_value_histogram, events_interarrival_stats,
# events_transition_matrix — all zero-or-simple-shuffle shapes with
# tri-scale local greens, the lowest-risk deferrals); they plus
# cep_group_times_state (the ONE new r14 gate: state-counted
# times(n)/optional on CEP GroupPatterns, verdict item 4) lead the r15
# window. ml_als_factorization / ml_svm_classify / ml_outlier_sos /
# corpus_bpe_merges stay OUT of any window: they register oracle=None
# (iterative solves are not SQL-expressible; a rows-only row must not
# burn a window slot — bitwise pure-Python mirrors in pytest instead).
# r15 window plan: the 7 leads above (6 deferrals + cep_group_times_state)
# first, then oldest-green-first in the <=4-round staleness cycle:
# csv_roundtrip_agg / from_rows_dim_join (latest green r9 — they slipped
# from the r13 window at positions 51-52), then 41 of the 44 queries
# whose latest driver green is r10 (pre-r14 latest-green histogram:
# r9:2, r10:44, r11:50, r12:50, r13:50). 7 + 2 + 41 = 50; the remaining
# 3 r10 rows lead r16.
_GATE_PRIORITY = [
    # --- the 24 r13 gates queued at r13 positions 53-76, same order
    "dedup_lsh_salted_recall",
    "text_remove_duplicate_spans",
    "dedup_semantic",
    "text_decontaminate_bloom",
    "text_decontaminate_fuzzy",
    "corpus_quality_buckets",
    "corpus_chunk_windows",
    "corpus_shuffle_order",
    "text_winnowing_fingerprints",
    "agg_approx_distinct_bounds",
    "avro_roundtrip_agg",
    "orc_roundtrip_agg",
    "json_roundtrip_agg",
    "sim_ann_pq",
    "sim_ann_ivfpq",
    "corpus_interleave_weighted",
    "corpus_token_budget_sample",
    "dedup_exact_normalized",
    "text_gopher_rules",
    "corpus_dsir_select",
    "sim_ann_sq8",
    "stream_gopher_filter",
    "corpus_bpe_token_counts",
    "corpus_source_report",
    # --- 26 more never-checked gates; r14-changed queries first
    "corpus_weighted_sample",
    "events_cohort_retention",
    "agg_count_min_bounds",
    "corpus_bigram_pmi",
    "sim_knn_classify",
    "text_bm25_topk",
    "text_nb_source_classify",
    "dedup_incremental",
    "corpus_ngram_diversity",
    "sim_hard_negatives",
    "corpus_source_similarity",
    "sim_hybrid_rrf",
    "stream_incremental_dedup",
    "dedup_cluster_keep_best",
    "corpus_source_divergence",
    "agg_heavy_hitters_bounds",
    "corpus_pipeline_e2e",
    "stream_count_min_table",
    "dedup_incremental_fuzzy",
    "stream_window_approx_distinct",
    "events_funnel_conversion",
    "events_sessionize",
    "events_rfm_scores",
    "events_anomaly_mad",
    "events_active_users",
    "events_value_gini",
    # --- positions 51-56: the six deferrals, leading r15
    "text_concordance",
    "corpus_fixed_n_sample",
    "corpus_bucketed_batches",
    "events_value_histogram",
    "events_interarrival_stats",
    "events_transition_matrix",
    # --- position 57: the one new r14 gate, queued behind the backlog
    "cep_group_times_state",
]


def _reorder() -> None:
    ordered = {n: REGISTRY[n] for n in _GATE_PRIORITY if n in REGISTRY}
    for n, q in REGISTRY.items():
        if n not in ordered:
            ordered[n] = q
    REGISTRY.clear()
    REGISTRY.update(ordered)


_reorder()

__all__ = ["REGISTRY", "queries", "oracles"]
