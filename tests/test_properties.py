"""Property-based tests (hypothesis) for the engine's pure-function cores:
the pre-Catalyst SQL group-window rewrite and the CEP NFA transition
function. These run without a SparkSession, so hypothesis can afford many
examples."""

from __future__ import annotations

import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from proteus_engine_spark.plans.sql_rewrite import rewrite_group_windows
from proteus_engine_spark.streaming.cep import Pattern, _run_nfa

UNITS = ["SECOND", "MINUTE", "HOUR", "DAY", "WEEK", "MONTH", "YEAR"]


@given(n=st.integers(min_value=1, max_value=9999), unit=st.sampled_from(UNITS))
@settings(max_examples=60)
def test_rewrite_tumble_any_interval(n, unit):
    sql = f"SELECT TUMBLE_START(ts, INTERVAL '{n}' {unit}) AS s FROM t GROUP BY TUMBLE(ts, INTERVAL '{n}' {unit})"
    out = rewrite_group_windows(sql)
    assert "TUMBLE" not in out.upper().replace("WINDOW", "")
    plural = "s" if n != 1 else ""
    assert f"window(ts, '{n} {unit.lower()}{plural}')" in out
    assert "window.start" in out


@given(
    n1=st.integers(min_value=1, max_value=999),
    n2=st.integers(min_value=1, max_value=999),
    u1=st.sampled_from(UNITS),
    u2=st.sampled_from(UNITS),
)
@settings(max_examples=40)
def test_rewrite_hop_slide_size_order(n1, n2, u1, u2):
    """HOP(ts, slide, size) → window(ts, size, slide) — argument order must
    swap (Calcite puts slide first, Spark puts size first)."""
    sql = f"SELECT 1 FROM t GROUP BY HOP(ts, INTERVAL '{n1}' {u1}, INTERVAL '{n2}' {u2})"
    out = rewrite_group_windows(sql)
    s1 = f"{n1} {u1.lower()}{'s' if n1 != 1 else ''}"
    s2 = f"{n2} {u2.lower()}{'s' if n2 != 1 else ''}"
    assert f"window(ts, '{s2}', '{s1}')" in out


@given(data=st.data())
@settings(max_examples=50, deadline=None)
def test_rewrite_is_idempotent(data):
    n = data.draw(st.integers(min_value=1, max_value=99))
    unit = data.draw(st.sampled_from(UNITS))
    sql = f"SELECT SESSION_END(ts, INTERVAL '{n}' {unit}) FROM t GROUP BY SESSION(ts, INTERVAL '{n}' {unit})"
    once = rewrite_group_windows(sql)
    assert rewrite_group_windows(once) == once


def _events_df(seq):
    """seq: list of (event_type:int 0/1/2, ts_ms). Build the pandas frame
    the NFA consumes (ts as datetime64[ms])."""
    return pd.DataFrame(
        {
            "event_id": range(len(seq)),
            "event_type": [t for t, _ in seq],
            "ts": pd.to_datetime([ms for _, ms in seq], unit="ms"),
        }
    )


def _reference_matches(seq, within_ms):
    """Independent brute-force oracle for the 2-step relaxed pattern
    A(type=0) followedBy B(type=1): every A opens a partial; it consumes
    the FIRST later B within the window. Overlapping matches allowed."""
    out = []
    for i, (ta, ms_a) in enumerate(seq):
        if ta != 0:
            continue
        for j in range(i + 1, len(seq)):
            tb, ms_b = seq[j]
            if ms_b - ms_a > within_ms:
                break
            if tb == 1:
                out.append((i, j))
                break
    return out


@given(
    seq=st.lists(
        st.tuples(st.integers(min_value=0, max_value=2), st.integers(min_value=0, max_value=50)),
        max_size=40,
    ),
    within=st.integers(min_value=1, max_value=60),
)
@settings(max_examples=150, deadline=None)
def test_nfa_matches_brute_force_two_step(seq, within):
    """The NFA must agree with an independently written brute-force matcher
    on arbitrary event sequences (types 0/1/2, monotone timestamps)."""
    seq = sorted(((t, ms) for t, ms in seq), key=lambda x: x[1])
    # de-duplicate timestamps so ordering is unambiguous
    seq = [(t, ms + i) for i, (t, ms) in enumerate(seq)]
    pat = (
        Pattern.begin("a", lambda r: r["event_type"] == 0)
        .followed_by("b", lambda r: r["event_type"] == 1)
        .within(within)
    )
    df = _events_df(seq)
    matches, _open, _timeouts = _run_nfa(df, pat, "ts", "event_id")
    got = sorted((m["a"][0], m["b"][0]) for m in matches)
    expect = sorted(_reference_matches(seq, within))
    assert got == expect


# ---------------- AfterMatchSkipStrategy invariants ----------------


def _skip_run(types, skip=None, name=None):
    import pandas as pd

    from proteus_engine_spark.streaming.cep import Pattern, _run_nfa

    pat = (
        Pattern.begin("a", lambda r: r["event_type"] == "a")
        .one_or_more()
        .followed_by("b", lambda r: r["event_type"] == "b")
    )
    if skip:
        pat = pat.after_match_skip(skip, name)
    df = pd.DataFrame(
        {
            "event_id": range(len(types)),
            "ts": pd.to_datetime(range(len(types)), unit="ms"),
            "event_type": types,
        }
    )
    m, _o, _t = _run_nfa(df, pat, "ts", "event_id")
    return m


@given(st.lists(st.sampled_from(["a", "b", "x"]), min_size=1, max_size=14))
@settings(max_examples=150, deadline=None)
def test_skip_strategies_invariants(types):
    """On random event sequences (AfterMatchSkipStrategy.java semantics):
    - every strategy's match set is a subset of no_skip's;
    - skip_past_last_event keeps matches pairwise event-disjoint except
      when they complete on the same element (same-element emissions
      never prune each other). (No ordering between skip_to_first and
      skip_to_last sets is asserted: their bars stop being comparable
      once their emission sets diverge.)"""
    def keyset(m):
        return frozenset(m["__ids__"])

    base = {keyset(m) for m in _skip_run(types)}
    past = [keyset(m) for m in _skip_run(types, "skip_past_last_event")]
    first = {keyset(m) for m in _skip_run(types, "skip_to_first", "a")}
    last = {keyset(m) for m in _skip_run(types, "skip_to_last", "a")}
    assert set(past) <= base and first <= base and last <= base
    for i, m1 in enumerate(past):
        for m2 in past[i + 1:]:
            if max(m1) != max(m2):  # different completion elements
                assert not (m1 & m2), (types, sorted(m1), sorted(m2))
