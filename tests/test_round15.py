"""Round-15 regression tests.

1. The r14-advice medium fix (streaming/cep.py): the followedByAny
   non-consuming fork must gate only the FIRST repeat of a quantified
   group — a loop-back (gloop) partial is BETWEEN repeats and follows
   the group's between-repeat rule (relaxed consume-first), not the
   attach contiguity. Skip-till-any between repeats needs
   allowCombinations, per the reference (Pattern.java:316's
   followedByAny vs the allowCombinations quantifier flag).
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from proteus_engine_spark.streaming.cep import GroupPattern, Pattern, _scan


def _run(gp, types):
    pat, _ = gp.compile()
    rows = [{"et": t, "id": i} for i, t in enumerate(types)]
    matches, _, _ = _scan(rows, [i * 1000 for i in range(len(types))], pat, "id")
    return matches


def _fba_group(n):
    """e followedByAny (x NEXT y) times(n). Alphabet: 0='e', 1='x', 2='y'."""
    return (
        GroupPattern.begin(Pattern.begin("e", lambda r: r["et"] == 0))
        .followed_by_any(
            Pattern.begin("x", lambda r: r["et"] == 1).next(
                "y", lambda r: r["et"] == 2
            )
        )
        .times(n)
    )


def test_followed_by_any_times_advice_repro():
    """r14-advice repro: e followedByAny (x NEXT y) times(2) over
    e,x,y,x,y,x,y must emit exactly 2 matches — one per skip-till-any
    ENTRY anchor whose chain reaches depth 2 (x1y2→x3y4 and x5y6 has no
    second repeat, x3y4→x5y6). Before the fix the between-repeat
    loop-back also forked, duplicating the x5y6-ending match."""
    seq = [0, 1, 2, 1, 2, 1, 2]
    got = sorted(
        (m["e"][0], m["x"][0], m["y"][0], m["__gcnt__1"])
        for m in _run(_fba_group(2), seq)
    )
    assert got == [(0, 3, 4, 2), (0, 5, 6, 2)]


def _fba_chains(types, e_idx):
    """Brute-force model: skip-till-any entry anchors a chain at EVERY
    (x,y) pair after the 'e'; between repeats the chain is relaxed
    consume-first (the next repeat is the first x-anchored pair after
    the previous repeat's y — an unpaired x kills the chain because the
    inner 'y' step is strict)."""
    pairs = {
        i: i + 1
        for i in range(len(types) - 1)
        if types[i] == 1 and types[i + 1] == 2
    }
    chains = []
    for s in pairs:
        if s <= e_idx:
            continue
        chain = [(s, pairs[s])]
        while True:
            last_y = chain[-1][1]
            nxt = next(
                (t for t in range(last_y + 1, len(types)) if types[t] == 1), None
            )
            if nxt is None or nxt not in pairs:
                break
            chain.append((nxt, pairs[nxt]))
        chains.append(chain)
    return chains


@given(
    seq=st.lists(st.integers(min_value=0, max_value=3), max_size=20),
    n=st.integers(min_value=1, max_value=3),
)
@settings(max_examples=200, deadline=None)
def test_followed_by_any_times_matches_brute_force(seq, n):
    """followedByAny attach × times(n): one match per (e, entry-anchor)
    pair whose chain reaches depth >= n — entry is skip-till-any, the
    repeats themselves chain consume-first."""
    got = sorted(
        (m["e"][0], m["x"][0], m["y"][0], m["__gcnt__1"])
        for m in _run(_fba_group(n), seq)
    )
    exp = sorted(
        (e_idx, chain[n - 1][0], chain[n - 1][1], n)
        for e_idx, t in enumerate(seq)
        if t == 0
        for chain in _fba_chains(seq, e_idx)
        if len(chain) >= n
    )
    assert got == exp
