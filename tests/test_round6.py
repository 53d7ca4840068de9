"""Round-6 fixes and features.

- CEP greedy hand-off must enter the next step with place() semantics so
  an optional step right after a greedy loop forks its skip-twin
  (flink-cep parity: optional forks on entry regardless of how the state
  was reached — NFA.java optional-state branching).
- gemm cosine scorer edge cases: duplicate input ids emit no self-pairs
  (fold-path strict-inequality parity), null vectors are filtered instead
  of crashing np.stack, and the tiled gram computation is result-identical
  to a single full gram matrix.
"""

from __future__ import annotations

import pandas as pd
import pytest

from proteus_engine_spark.streaming.cep import Pattern, _run_nfa


def _frame(events):
    """events: (event_id, ts_ms, event_type)"""
    return pd.DataFrame(
        {
            "event_id": [e[0] for e in events],
            "ts": pd.to_datetime([e[1] for e in events], unit="ms"),
            "event_type": [e[2] for e in events],
        }
    )


def _etype(t):
    return lambda r: r["event_type"] == t


def _greedy_opt_pattern():
    return (
        Pattern.begin("a", _etype("a"))
        .one_or_more(consecutive=True)
        .greedy()
        .followed_by("b", _etype("b"))
        .optional()
        .followed_by("c", _etype("c"))
    )


def test_greedy_then_optional_skipped():
    # The run-breaking event satisfies the step AFTER the optional one: the
    # hand-off must fork the optional's skip-twin and offer the breaking
    # event to it, or this match is silently lost.
    m, _, _ = _run_nfa(
        _frame([(1, 0, "a"), (2, 1, "a"), (3, 2, "c")]), _greedy_opt_pattern(), "ts", "event_id"
    )
    # one match per run suffix (events 1-2 and event 2 alone), maximal each
    assert sorted((x["a"][2], x["c"][0]) for x in m) == [(1, 3), (2, 3)]
    assert all("b" not in x for x in m)


def test_greedy_then_optional_taken_and_skipped_branches():
    # b breaks the greedy run and is consumed by the optional step in one
    # branch; the skip-twin waits for c directly. Both branches complete on
    # the later c (fork-on-entry: with- and without-optional matches).
    m, _, _ = _run_nfa(
        _frame([(1, 0, "a"), (2, 1, "a"), (3, 2, "b"), (4, 3, "c")]),
        _greedy_opt_pattern(), "ts", "event_id",
    )
    got = sorted((x["a"][2], x.get("b", (0,))[0], x["c"][0]) for x in m)
    assert got == [(1, 0, 4), (1, 3, 4), (2, 0, 4), (2, 3, 4)]


def test_greedy_then_optional_last_completes_on_handoff():
    # optional as the LAST step: entering it at hand-off forks a twin that
    # has already completed the pattern — the maximal run alone is a match.
    pat = (
        Pattern.begin("a", _etype("a"))
        .one_or_more(consecutive=True)
        .greedy()
        .followed_by("b", _etype("b"))
        .optional()
    )
    m, _, _ = _run_nfa(
        _frame([(1, 0, "a"), (2, 1, "a"), (3, 2, "x")]), pat, "ts", "event_id"
    )
    assert sorted(x["a"][2] for x in m) == [1, 2]
    assert all("b" not in x for x in m)


# ---------------- gemm scorer edge cases ----------------


def _emb_df(spark, rows):
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.DoubleType())),
            T.StructField("label", T.StringType()),
        ]
    )
    return spark.createDataFrame(rows, schema)


def test_gemm_duplicate_ids_emit_no_self_pairs(spark):
    from proteus_engine_spark.datapipe.dedup import embedding_cosine_pairs

    rows = [
        (1, [1.0, 0.0], "x"),
        (1, [1.0, 0.0], "x"),  # duplicate id, identical vector
        (2, [1.0, 0.1], "x"),
    ]
    pairs = embedding_cosine_pairs(
        _emb_df(spark, rows), threshold=0.9, block_col="label", scorer="gemm"
    ).collect()
    assert all(r["id_a"] != r["id_b"] for r in pairs)
    assert all(r["id_a"] < r["id_b"] for r in pairs)
    # (1, 2) appears (once per duplicate row collision is deduped only in
    # LSH mode; block mode scores each row) — just assert presence.
    assert {(r["id_a"], r["id_b"]) for r in pairs} == {(1, 2)}


def test_gemm_null_vector_filtered_not_crash(spark):
    from proteus_engine_spark.datapipe.dedup import embedding_cosine_pairs

    rows = [
        (1, [1.0, 0.0], "x"),
        (2, None, "x"),  # null vector: fold path yields null cos_sim
        (3, [1.0, 0.05], "x"),
    ]
    for scorer in ("gemm", "fold"):
        pairs = embedding_cosine_pairs(
            _emb_df(spark, rows), threshold=0.9, block_col="label", scorer=scorer
        ).collect()
        assert {(r["id_a"], r["id_b"]) for r in pairs} == {(1, 3)}, scorer


def test_gemm_tiling_matches_full_gram(spark, monkeypatch):
    from proteus_engine_spark.datapipe import dedup

    rows = [
        (i, [float((i * 7 + j * 3) % 5) + 0.1 for j in range(8)], "x") for i in range(23)
    ]
    df = _emb_df(spark, rows)
    kw = dict(threshold=0.5, block_col="label", scorer="gemm")
    full = {
        (r["id_a"], r["id_b"]): r["cos_sim"]
        for r in dedup.embedding_cosine_pairs(df, **kw).collect()
    }
    monkeypatch.setattr(dedup, "_GEMM_TILE", 4)
    tiled = {
        (r["id_a"], r["id_b"]): r["cos_sim"]
        for r in dedup.embedding_cosine_pairs(df, **kw).collect()
    }
    assert full == tiled
    assert len(full) > 0


# ---------------- streaming bounded OVER ----------------


def test_bounded_over_agg_carries_tail_across_batches(spark):
    """ROWS 2 PRECEDING..CURRENT per key across a micro-batch boundary:
    the carried tail (last n-1 cents) must seed the next batch's windows
    (RowTimeBoundedRowsOver retraction-state parity)."""
    from proteus_engine_spark.streaming.stateful import bounded_over_agg
    from tests.test_streaming import EV_SCHEMA, _ev, _two_batch_stream

    a = [_ev(i, i + 1, 1, "x", float(i + 1)) for i in range(4)]   # values 1..4
    b = [_ev(i, i + 1, 1, "x", float(i + 1)) for i in range(4, 6)]  # 5, 6
    out = bounded_over_agg(
        _two_batch_stream(spark, a, b, EV_SCHEMA), "user_id", "ts", "value",
        n_rows=3, watermark_delay="0 seconds",
    )
    q = out.writeStream.outputMode("append").format("memory").queryName("bover_test").start()
    q.processAllAvailable()
    q.stop()
    rows = sorted(spark.table("bover_test").collect(), key=lambda r: r["event_id"])
    # The last event's ts EQUALS the final watermark (delay 0) and stays
    # buffered: release is strictly below the watermark, because Spark
    # still admits equal-ts arrivals after the watermark reaches them —
    # releasing at == wm would let such a peer slot after its flush.
    assert [r["w_sum"] for r in rows] == [1.0, 3.0, 6.0, 9.0, 12.0]
    assert [r["w_cnt"] for r in rows] == [1, 2, 3, 3, 3]
    assert rows[-1]["w_avg"] == 4.0


# ---------------- CEP allowCombinations ----------------


def test_allow_combinations_matches_docs_table():
    """FlinkCEP docs combinations table: after the pinned first loop event
    a1, every combination of later events matches — a1; a1a2; a1a3;
    a1a2a3 — reported as (last_event, count)."""
    pat = (
        Pattern.begin("s", _etype("s"))
        .followed_by("a", _etype("a"))
        .one_or_more()
        .allow_combinations()
    )
    m, _, _ = _run_nfa(
        _frame([(0, 0, "s"), (1, 1, "a"), (2, 2, "a"), (3, 3, "a")]), pat, "ts", "event_id"
    )
    assert sorted((x["a"][0], x["a"][2]) for x in m) == [(1, 1), (2, 2), (3, 2), (3, 3)]


def test_allow_combinations_skips_non_matching_and_keeps_branches():
    # a x a: the skip branch and the eager branch coincide on non-matching
    # events; combinations still adds the {a1, a3}-style gap subsets when a
    # matching event is skipped: a1; a1a2; a1a4; a1a2a4
    pat = (
        Pattern.begin("s", _etype("s"))
        .followed_by("a", _etype("a"))
        .one_or_more()
        .allow_combinations()
    )
    m, _, _ = _run_nfa(
        _frame([(0, 0, "s"), (1, 1, "a"), (2, 2, "a"), (3, 3, "x"), (4, 4, "a")]),
        pat, "ts", "event_id",
    )
    assert sorted((x["a"][0], x["a"][2]) for x in m) == [
        (1, 1), (2, 2), (4, 2), (4, 3)
    ]


def test_allow_combinations_validation():
    with pytest.raises(ValueError, match="looping"):
        Pattern.begin("a", _etype("a")).allow_combinations()
    # consecutive (and therefore greedy, which requires it) is rejected
    with pytest.raises(ValueError, match="consecutive"):
        Pattern.begin("a", _etype("a")).one_or_more(consecutive=True).allow_combinations()
    with pytest.raises(ValueError, match="consecutive"):
        Pattern.begin("a", _etype("a")).one_or_more().allow_combinations().greedy()
