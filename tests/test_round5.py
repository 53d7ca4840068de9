"""Round-5 features: CEP negation (notNext / notFollowedBy, incl. trailing
absence-with-within), negation validation, prefilter soundness with
negative steps, streaming parity for trailing negation.

Reference semantics: flink-cep Pattern.notNext (Pattern.java:267),
notFollowedBy (Pattern.java:298), NFAITCase negation cases.
"""

from __future__ import annotations

import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from proteus_engine_spark.streaming.cep import (
    Pattern,
    _run_nfa,
    match_pattern,
    match_pattern_stream,
)
from tests.test_streaming import EV_SCHEMA, _ev, _two_batch_stream


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


# ---------------- notNext ----------------


def test_not_next_immediate_violation_kills():
    pat = Pattern.begin("a", _etype("signup")).not_next("b", _etype("error")).followed_by(
        "c", _etype("purchase")
    )
    m, _, _ = _run_nfa(_frame([(1, 0, "signup"), (2, 1, "error"), (3, 2, "purchase")]),
                       pat, "ts", "event_id")
    assert m == []


def test_not_next_guard_event_offered_to_next_step():
    # the immediately-next event is the purchase itself: guard passes and
    # the same event completes the match.
    pat = Pattern.begin("a", _etype("signup")).not_next("b", _etype("error")).followed_by(
        "c", _etype("purchase")
    )
    m, _, _ = _run_nfa(_frame([(1, 0, "signup"), (2, 1, "purchase")]), pat, "ts", "event_id")
    assert [(x["a"][0], x["c"][0]) for x in m] == [(1, 2)]


def test_not_next_checks_only_the_immediate_event():
    # error AFTER a benign immediate event does not kill (guard is one-shot).
    pat = Pattern.begin("a", _etype("signup")).not_next("b", _etype("error")).followed_by(
        "c", _etype("purchase")
    )
    m, _, _ = _run_nfa(
        _frame([(1, 0, "signup"), (2, 1, "click"), (3, 2, "error"), (4, 3, "purchase")]),
        pat, "ts", "event_id",
    )
    assert [(x["a"][0], x["c"][0]) for x in m] == [(1, 4)]


# ---------------- notFollowedBy (mid-pattern) ----------------


def test_not_followed_by_mid_pattern_guard_persists():
    pat = Pattern.begin("a", _etype("signup")).not_followed_by(
        "b", _etype("error")
    ).followed_by("c", _etype("purchase"))
    # error anywhere between signup and purchase kills
    m, _, _ = _run_nfa(
        _frame([(1, 0, "signup"), (2, 1, "click"), (3, 2, "error"), (4, 3, "purchase")]),
        pat, "ts", "event_id",
    )
    assert m == []
    # benign events are skipped; purchase consumes
    m, _, _ = _run_nfa(
        _frame([(1, 0, "signup"), (2, 1, "click"), (3, 2, "purchase")]),
        pat, "ts", "event_id",
    )
    assert [(x["a"][0], x["c"][0]) for x in m] == [(1, 3)]
    # error AFTER the purchase is irrelevant
    m, _, _ = _run_nfa(
        _frame([(1, 0, "signup"), (2, 1, "purchase"), (3, 2, "error")]),
        pat, "ts", "event_id",
    )
    assert [(x["a"][0], x["c"][0]) for x in m] == [(1, 2)]


# ---------------- trailing notFollowedBy (absence detection) ----------------


def test_trailing_not_followed_by_completes_on_window_expiry():
    pat = (
        Pattern.begin("a", _etype("signup"))
        .not_followed_by("b", _etype("purchase"))
        .within(5_000)
    )
    # purchase inside the window → guard violated, no match
    m, _, _ = _run_nfa(_frame([(1, 0, "signup"), (2, 1000, "purchase"),
                               (3, 9000, "click")]), pat, "ts", "event_id")
    assert m == []
    # no purchase; a later event past the window confirms the absence
    m, _, _ = _run_nfa(_frame([(1, 0, "signup"), (2, 1000, "click"),
                               (3, 9000, "click")]), pat, "ts", "event_id")
    assert [x["a"][0] for x in m] == [1]
    # purchase arriving AFTER expiry is itself the trigger, not a violation
    m, _, _ = _run_nfa(_frame([(1, 0, "signup"), (2, 9000, "purchase")]),
                       pat, "ts", "event_id")
    assert [x["a"][0] for x in m] == [1]
    # window still open at end of input → partial stays open, no match
    m, open_, _ = _run_nfa(_frame([(1, 0, "signup"), (2, 1000, "click")]),
                           pat, "ts", "event_id")
    assert m == [] and len(open_) == 1


# ---------------- followedByAny / until / timesOrMore ----------------


def test_followed_by_any_matches_every_event():
    pat = Pattern.begin("s", _etype("signup")).followed_by_any("p", _etype("purchase"))
    m, _, _ = _run_nfa(
        _frame([(1, 0, "signup"), (2, 1, "purchase"), (3, 2, "click"), (4, 3, "purchase")]),
        pat, "ts", "event_id",
    )
    # followedBy would consume only event 2; followedByAny fires for both
    assert sorted((x["s"][0], x["p"][0]) for x in m) == [(1, 2), (1, 4)]


def test_followed_by_first_only_contrast():
    pat = Pattern.begin("s", _etype("signup")).followed_by("p", _etype("purchase"))
    m, _, _ = _run_nfa(
        _frame([(1, 0, "signup"), (2, 1, "purchase"), (3, 2, "purchase")]),
        pat, "ts", "event_id",
    )
    assert sorted((x["s"][0], x["p"][0]) for x in m) == [(1, 2)]


def test_times_or_more_emits_from_floor():
    pat = Pattern.begin("c", _etype("click")).times_or_more(2)
    ev = _frame([(1, 0, "click"), (2, 1, "click"), (3, 2, "click")])
    m, _, _ = _run_nfa(ev, pat, "ts", "event_id")
    # overlapping starts (each click opens a partial): runs {1,2}, {1,2,3}
    # from start 1 and {2,3} from start 2 reach the floor of 2
    assert sorted((x["c"][0], x["c"][2]) for x in m) == [(2, 2), (3, 2), (3, 3)]


def test_until_closes_the_loop():
    pat = (
        Pattern.begin("c", _etype("click"))
        .one_or_more()
        .until(_etype("stop"))
    )
    ev = _frame([(1, 0, "click"), (2, 1, "click"), (3, 2, "stop"), (4, 3, "click")])
    m, _, _ = _run_nfa(ev, pat, "ts", "event_id")
    # prefixes before the stop only (overlapping starts included); the
    # click after the stop opens a NEW partial
    got = sorted((x["c"][0], x["c"][2]) for x in m)
    assert got == [(1, 1), (2, 1), (2, 2), (4, 1)]


def test_until_requires_looping_step():
    with pytest.raises(ValueError):
        Pattern.begin("a", _etype("x")).until(_etype("y"))


def test_until_expr_gates_prefilter():
    pat = (
        Pattern.begin("c", _etype("click"), expr="event_type = 'click'")
        .one_or_more()
        .until(_etype("stop"))
    )
    assert pat.prefilter_expr() is None  # until without expr → unsound
    pat2 = (
        Pattern.begin("c", _etype("click"), expr="event_type = 'click'")
        .one_or_more()
        .until(_etype("stop"), expr="event_type = 'stop'")
    )
    assert pat2.prefilter_expr() == "(event_type = 'click') OR (event_type = 'stop')"


# ---------------- validation & prefilter ----------------


def test_negation_validation():
    with pytest.raises(ValueError):  # notNext cannot be last
        match_rdy = Pattern.begin("a", _etype("x")).not_next("b", _etype("y"))
        match_rdy.validate()
    with pytest.raises(ValueError):  # trailing notFollowedBy needs within
        Pattern.begin("a", _etype("x")).not_followed_by("b", _etype("y")).validate()
    with pytest.raises(ValueError):  # consecutive negatives
        Pattern.begin("a", _etype("x")).not_next("b", _etype("y")).not_followed_by(
            "c", _etype("z")
        )
    with pytest.raises(ValueError):  # quantifier on negative step
        Pattern.begin("a", _etype("x")).not_followed_by("b", _etype("y")).times(2)
    with pytest.raises(ValueError):  # optional on negative step
        Pattern.begin("a", _etype("x")).not_followed_by("b", _etype("y")).optional()


def test_negation_prefilter_soundness():
    # mid-pattern notFollowedBy: forbidden expr joins the OR
    pat = (
        Pattern.begin("a", _etype("signup"), expr="event_type = 'signup'")
        .not_followed_by("b", _etype("error"), expr="event_type = 'error'")
        .followed_by("c", _etype("purchase"), expr="event_type = 'purchase'")
    )
    assert pat.prefilter_expr() == (
        "(event_type = 'signup') OR (event_type = 'error') OR (event_type = 'purchase')"
    )
    # trailing notFollowedBy: any event can trigger expiry → no prefilter
    pat2 = (
        Pattern.begin("a", _etype("signup"), expr="event_type = 'signup'")
        .not_followed_by("b", _etype("purchase"), expr="event_type = 'purchase'")
        .within(1000)
    )
    assert pat2.prefilter_expr() is None
    # notNext inspects the literal next event → no prefilter
    pat3 = (
        Pattern.begin("a", _etype("signup"), expr="event_type = 'signup'")
        .not_next("b", _etype("error"), expr="event_type = 'error'")
        .followed_by("c", _etype("purchase"), expr="event_type = 'purchase'")
    )
    assert pat3.prefilter_expr() is None


# ---------------- property: NFA vs brute-force reference ----------------


def _brute_force_guarded(events, within_ms):
    """Independent reference for begin(A).notFollowedBy(B).followedBy(C)
    .within(W): for each A at i, scan forward; the first B-or-C event
    decides (B → dead, C in-window → match); the within bound kills the
    partial before any event past it is considered."""
    out = []
    for i, (eid_a, t_a, ty_a) in enumerate(events):
        if ty_a != "a":
            continue
        for eid, t, ty in events[i + 1:]:
            if t - t_a > within_ms:
                break  # partial timed out before this event acted
            if ty == "b":
                break  # guard violated
            if ty == "c":
                out.append((eid_a, eid))
                break
    return out


@given(
    st.lists(st.sampled_from(["a", "b", "c", "x"]), min_size=0, max_size=24),
    st.integers(min_value=1, max_value=12),
)
@settings(max_examples=200, deadline=None)
def test_not_followed_by_matches_brute_force(types, within):
    events = [(i, i * 1000, ty) for i, ty in enumerate(types)]
    pat = (
        Pattern.begin("A", _etype("a"))
        .not_followed_by("B", _etype("b"))
        .followed_by("C", _etype("c"))
        .within(within * 1000)
    )
    m, _, _ = _run_nfa(_frame(events), pat, "ts", "event_id")
    got = sorted((x["A"][0], x["C"][0]) for x in m)
    assert got == sorted(_brute_force_guarded(events, within * 1000))


@given(st.lists(st.sampled_from(["a", "b", "c", "x"]), min_size=0, max_size=24))
@settings(max_examples=200, deadline=None)
def test_not_next_matches_brute_force(types):
    events = [(i, i * 1000, ty) for i, ty in enumerate(types)]
    pat = Pattern.begin("A", _etype("a")).not_next("B", _etype("b")).followed_by(
        "C", _etype("c")
    )
    m, _, _ = _run_nfa(_frame(events), pat, "ts", "event_id")
    got = sorted((x["A"][0], x["C"][0]) for x in m)
    # reference: A at i; the immediate next event must not be b; then the
    # first c at or after i+1 completes
    want = []
    for i, (_, _, ty) in enumerate(events):
        if ty != "a" or i + 1 >= len(events):
            continue
        if events[i + 1][2] == "b":
            continue
        nxt = next((e for e in events[i + 1:] if e[2] == "c"), None)
        if nxt is not None:
            want.append((i, nxt[0]))
    assert got == sorted(want)


# ---------------- end-to-end (batch + stream) ----------------


def test_match_pattern_negation_schema_excludes_negative_steps(spark):
    rows = [_ev(0, 1, 1, "signup"), _ev(1, 2, 1, "purchase"),
            _ev(2, 10, 2, "signup"), _ev(3, 11, 2, "error"), _ev(4, 12, 2, "purchase")]
    df = spark.createDataFrame(rows, EV_SCHEMA)
    pat = (
        Pattern.begin("signup", _etype("signup"))
        .not_followed_by("error", _etype("error"))
        .followed_by("purchase", _etype("purchase"))
    )
    out = match_pattern(df, pat, key_col="user_id")
    assert out.columns == ["user_id", "signup_id", "signup_ts", "purchase_id", "purchase_ts"]
    got = [(r["user_id"], r["signup_id"], r["purchase_id"]) for r in out.collect()]
    assert got == [(1, 0, 1)]  # user 2's partial dies on the error


def test_cep_stream_trailing_negation_matches_batch(spark):
    """Trailing absence detection must survive a micro-batch boundary: the
    signup arrives in batch 0, the expiry-triggering event in batch 1."""
    a = [_ev(0, 1, 1, "signup"), _ev(1, 2, 1, "click")]
    b = [_ev(2, 30, 1, "click"),  # past the 10-min window → confirms absence
         _ev(3, 31, 2, "signup"), _ev(4, 32, 2, "purchase"), _ev(5, 50, 2, "click")]
    pat = (
        Pattern.begin("signup", _etype("signup"))
        .not_followed_by("purchase", _etype("purchase"))
        .within(600_000)
    )
    stream = _two_batch_stream(spark, a, b, EV_SCHEMA)
    out = match_pattern_stream(stream, pat, key_col="user_id")
    q = out.writeStream.outputMode("append").format("memory").queryName("cep_neg_test").start()
    q.processAllAvailable()
    q.stop()
    stream_rows = sorted(
        (r["user_id"], r["signup_id"]) for r in spark.table("cep_neg_test").collect()
    )
    batch_df = spark.createDataFrame(a + b, EV_SCHEMA)
    batch_rows = sorted(
        (r["user_id"], r["signup_id"])
        for r in match_pattern(batch_df, pat, key_col="user_id").collect()
    )
    # user 1: no purchase ever, click at +29min confirms → match.
    # user 2: purchase 1 min after signup → guard violated.
    assert stream_rows == batch_rows == [(1, 0)]


# ---------------- greedy ----------------


def test_greedy_consumes_maximal_run():
    """a a a b: greedy emits exactly ONE match per run suffix (cnt = run
    length from that start), never shorter prefixes."""
    pat = (
        Pattern.begin("a", _etype("click"))
        .one_or_more(consecutive=True)
        .greedy()
        .followed_by("b", _etype("purchase"))
    )
    frame = _frame([(1, 100, "click"), (2, 200, "click"), (3, 300, "click"), (4, 400, "purchase")])
    matches, _, _ = _run_nfa(frame, pat, "ts", "event_id")
    got = sorted((m["a"][2], m["b"][0]) for m in matches)  # (cnt, purchase_id)
    assert got == [(1, 4), (2, 4), (3, 4)]  # one per start, maximal each


def test_non_greedy_emits_every_prefix():
    """Same input WITHOUT greedy: each start emits every prefix count —
    the behavior greedy suppresses."""
    pat = (
        Pattern.begin("a", _etype("click"))
        .one_or_more(consecutive=True)
        .followed_by("b", _etype("purchase"))
    )
    frame = _frame([(1, 100, "click"), (2, 200, "click"), (3, 300, "click"), (4, 400, "purchase")])
    matches, _, _ = _run_nfa(frame, pat, "ts", "event_id")
    got = sorted((m["a"][2], m["b"][0]) for m in matches)
    assert got == [(1, 4), (1, 4), (1, 4), (2, 4), (2, 4), (3, 4)]


def test_greedy_handoff_event_can_be_consumed():
    """The run-breaking event itself satisfying the next step: click click
    purchase — the purchase both ends the loop and matches step b."""
    pat = (
        Pattern.begin("a", _etype("click"))
        .one_or_more(consecutive=True)
        .greedy()
        .followed_by("b", _etype("purchase"))
    )
    frame = _frame([(1, 100, "click"), (2, 200, "click"), (3, 300, "purchase")])
    matches, _, _ = _run_nfa(frame, pat, "ts", "event_id")
    got = sorted((m["a"][2], m["b"][0]) for m in matches)
    assert got == [(1, 3), (2, 3)]


def test_greedy_relaxed_skip_after_handoff():
    """click click error purchase: the error breaks the run and is handed
    to the relaxed purchase step, which skips it and takes the purchase."""
    pat = (
        Pattern.begin("a", _etype("click"))
        .one_or_more(consecutive=True)
        .greedy()
        .followed_by("b", _etype("purchase"))
    )
    frame = _frame(
        [(1, 100, "click"), (2, 200, "click"), (3, 300, "error"), (4, 400, "purchase")]
    )
    matches, _, _ = _run_nfa(frame, pat, "ts", "event_id")
    got = sorted((m["a"][2], m["b"][0]) for m in matches)
    assert got == [(1, 4), (2, 4)]


def test_greedy_run_with_no_following_event_emits_nothing():
    pat = (
        Pattern.begin("a", _etype("click"))
        .one_or_more(consecutive=True)
        .greedy()
        .followed_by("b", _etype("purchase"))
    )
    frame = _frame([(1, 100, "click"), (2, 200, "click")])
    matches, partials, _ = _run_nfa(frame, pat, "ts", "event_id")
    assert matches == []
    assert len(partials) == 2  # both runs still open in the loop


def test_greedy_validation():
    with pytest.raises(ValueError, match="looping"):
        Pattern.begin("a", _etype("click")).greedy()
    with pytest.raises(ValueError, match="consecutive"):
        Pattern.begin("a", _etype("click")).one_or_more().greedy()
    with pytest.raises(ValueError, match="until"):
        (
            Pattern.begin("a", _etype("click"))
            .one_or_more(consecutive=True)
            .until(_etype("error"))
            .greedy()
        )
    with pytest.raises(ValueError, match="last step"):
        (
            Pattern.begin("a", _etype("click"))
            .one_or_more(consecutive=True)
            .greedy()
            .validate()
        )
    # timesOrMore floor gates the hand-off
    pat = (
        Pattern.begin("a", _etype("click"))
        .times_or_more(2, consecutive=True)
        .greedy()
        .followed_by("b", _etype("purchase"))
    )
    frame = _frame([(1, 100, "click"), (2, 200, "purchase")])
    matches, _, _ = _run_nfa(frame, pat, "ts", "event_id")
    assert matches == []  # single click never reaches the floor of 2


def test_cep_stream_greedy_matches_batch(spark):
    """A greedy run straddling a micro-batch boundary must keep extending
    (no premature hand-off at the batch edge): clicks in batch 0 continue
    in batch 1 before the purchase."""
    a = [_ev(0, 1, 1, "click"), _ev(1, 2, 1, "click")]
    b = [_ev(2, 3, 1, "click"), _ev(3, 4, 1, "purchase")]
    pat = (
        Pattern.begin("click", _etype("click"))
        .one_or_more(consecutive=True)
        .greedy()
        .followed_by("purchase", _etype("purchase"))
        .within(7_200_000)
    )
    stream = _two_batch_stream(spark, a, b, EV_SCHEMA)
    out = match_pattern_stream(stream, pat, key_col="user_id")
    q = out.writeStream.outputMode("append").format("memory").queryName("cep_greedy_test").start()
    q.processAllAvailable()
    q.stop()
    stream_rows = sorted(
        (r["user_id"], r["click_cnt"], r["purchase_id"])
        for r in spark.table("cep_greedy_test").collect()
    )
    batch_df = spark.createDataFrame(a + b, EV_SCHEMA)
    batch_rows = sorted(
        (r["user_id"], r["click_cnt"], r["purchase_id"])
        for r in match_pattern(batch_df, pat, key_col="user_id").collect()
    )
    # one match per run suffix, each maximal: cnt 3, 2, 1 — never prefixes
    assert stream_rows == batch_rows == [(1, 1, 3), (1, 2, 3), (1, 3, 3)]
