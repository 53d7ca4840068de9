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

# Round-15 priority window (the driver checks the first ~50 registry
# entries; r11-r14 all recorded exactly 50). This executes the r15 plan
# the r14 registry comment documented and the r14 verdict ordered
# verbatim: positions 1-7 are the last never-driver-checked
# oracle-bearing gates (the six low-risk deferrals + the one new r14
# gate cep_group_times_state), positions 8-9 the two r9-stale greens,
# positions 10-50 are 41 of the 44 queries whose latest driver green is
# r10 (pre-r15 latest-green histogram: r9:2, r10:44, r11-r14:50 each).
# 7 + 2 + 41 = 50 → after r15 the oracle-bearing never-checked count is
# 0 and max registry staleness drops to <=5 rounds.
#
# STANDING POLICY (r14 verdict item 6): every oracle-bearing gate must
# re-enter a driver window at least every 5 rounds. Each round's window
# is composed never-driver-checked-first, then oldest-green-first;
# registry growth is capped at what the next window can absorb beyond
# rotation (~5-10 gates/round).
#
# ml_als_factorization / ml_svm_classify / ml_outlier_sos /
# corpus_bpe_merges stay OUT of any window: they register oracle=None
# (iterative solves are not SQL-expressible; a rows-only row must not
# burn a window slot — bitwise pure-Python mirrors in pytest instead).
#
# r16 window plan: the 7 new r15 gates (queued at positions 51-57
# below — cep_group_stream_timeouts, agg_approx_quantile_bounds,
# classify_calibration_bins, stream_session_windows_chained,
# stream_window_quantile_bounds, cep_group_allow_combinations,
# cep_group_times_range; never checked, all tri-scale green in
# scripts/triscale/r15_delta.json AND merged into the refreshed full
# records scripts/triscale/sf0_*.json)
# first, then the 3 r10-greens deferred from this window (distinct_rows,
# sort_limit_offset, subquery_in — native SQL shapes, the lowest-risk
# deferrals), then oldest-green-first from the r11 wave (50 queries,
# latest green r11) fills the remaining 40 slots; the 10-query r11 tail
# leads r17. Note the feasibility bound on the staleness policy: with
# ~258 oracle-bearing gates and a 50-slot window, steady-state max
# staleness is ceil(N/50) = 6 rounds — the 5-round target holds for the
# bulk, the small per-round remainder runs one round later; additions
# stay capped so the ceiling never exceeds 6.
_GATE_PRIORITY = [
    # --- positions 1-7: the last never-driver-checked oracle gates
    "text_concordance",
    "corpus_fixed_n_sample",
    "corpus_bucketed_batches",
    "events_value_histogram",
    "events_interarrival_stats",
    "events_transition_matrix",
    "cep_group_times_state",
    # --- positions 8-9: latest green r9
    "csv_roundtrip_agg",
    "from_rows_dim_join",
    # --- positions 10-50: 41 of the 44 r10-greens (alphabetical);
    #     distinct_rows / sort_limit_offset / subquery_in defer to r16
    "agg_collect",
    "agg_cube",
    "agg_distinct",
    "agg_grouping_sets",
    "agg_having",
    "agg_minby_maxby",
    "agg_reduce_group_sorted",
    "agg_rollup",
    "agg_stats_exact",
    "cep_allow_combinations",
    "cep_greedy_click_run",
    "cogroup_counts",
    "corpus_pack_sequences",
    "corpus_vocab_stats",
    "dedup_cluster_keep",
    "graph_adamic_adar",
    "graph_clustering_coeff",
    "graph_community_detection",
    "graph_hits",
    "graph_jaccard",
    "graph_label_propagation",
    "graph_summarize",
    "iter_connected_components",
    "multimodal_audio_features",
    "multimodal_decode",
    "multimodal_frame_sample",
    "multimodal_resize",
    "sim_ann_ivf",
    "stream_count_evictor_fires",
    "stream_late_rows_observed",
    "stream_side_input_broadcast",
    "stream_side_input_keyed",
    "stream_split_select",
    "stream_tumble_time_evictor",
    "text_decontaminate",
    "text_length_percentiles",
    "udf_scalar_weighted",
    "window_count_tumbling",
    "window_tumble_sql",
    "zip_with_index_bulk",
    "zip_with_index_ranked",
    # --- positions 51+: new r15 gates (never checked — lead r16),
    #     then the 3 deferred r10-greens
    "cep_group_stream_timeouts",
    "agg_approx_quantile_bounds",
    "classify_calibration_bins",
    "stream_session_windows_chained",
    "stream_window_quantile_bounds",
    "cep_group_allow_combinations",
    "cep_group_times_range",
    "distinct_rows",
    "sort_limit_offset",
    "subquery_in",
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
