"""CEP subset: sequential pattern matching with contiguity modes and a
time bound, on batch and streaming DataFrames.

Reference: flink-libraries/flink-cep — Pattern.begin/next/followedBy/where/
within (pattern/Pattern.java:123–536), CEP.pattern (CEP.java:38),
PatternStream.select (PatternStream.java:92), NFA runtime (cep/nfa/
NFA.java). Scope per SURVEY §7 step 6: begin + next (strict contiguity) +
followedBy (relaxed contiguity) + within, single-match-per-step (no
quantifiers/groups yet — documented).

Match semantics (mirrors the reference NFA defaults): every event
satisfying step 0 opens a partial match; `next` requires the immediately
following event (per key, event-time order) to satisfy the step or the
partial dies; `followedBy` skips non-matching events and consumes the
FIRST matching one; `within` bounds last.ts - first.ts. Overlapping matches
are emitted (no after-match skip), like the reference's default
NoSkipStrategy.

Implementation: the NFA transition core is a pure function over a sorted
per-key event list; batch runs it inside applyInPandas (one shuffle on the
key), streaming inside applyInPandasWithState with open partials carried in
state. At 100 TB the per-key sort is the only superlinear cost — the same
bound the reference's keyed NFA state has.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable

import pandas as pd
from pyspark.sql import DataFrame


@dataclass(frozen=True)
class Step:
    name: str
    predicate: Callable[[pd.Series], bool]
    contiguity: str = "followedBy"  # 'begin' | 'next' | 'followedBy'
    expr: str | None = None  # optional Spark SQL mirror of `predicate`


@dataclass
class Pattern:
    """Pattern.begin(...).next/.followedBy(...).where(...).within(...)

    Each step takes the row predicate as a Python callable plus an optional
    ``expr`` — a Spark SQL string with the same semantics. When every step
    is relaxed-contiguity (begin/followedBy) and every step carries an
    expr, the engine pre-filters the input to ``OR``-of-exprs JVM-side
    before the Python NFA: relaxed contiguity skips non-matching rows
    anyway, so dropping them early is semantics-preserving predicate
    pushdown — at scale this turns "ship every event to Python" into
    "ship only candidate events". Patterns with a `next` step disable the
    prefilter (strict contiguity must see every row).
    """

    steps: list[Step] = field(default_factory=list)
    within_ms: int | None = None

    @staticmethod
    def begin(
        name: str, predicate: Callable[[pd.Series], bool], expr: str | None = None
    ) -> "Pattern":
        return Pattern(steps=[Step(name, predicate, "begin", expr)])

    def next(
        self, name: str, predicate: Callable[[pd.Series], bool], expr: str | None = None
    ) -> "Pattern":
        self.steps.append(Step(name, predicate, "next", expr))
        return self

    def followed_by(
        self, name: str, predicate: Callable[[pd.Series], bool], expr: str | None = None
    ) -> "Pattern":
        self.steps.append(Step(name, predicate, "followedBy", expr))
        return self

    def within(self, ms: int) -> "Pattern":
        self.within_ms = ms
        return self

    def prefilter_expr(self) -> str | None:
        """OR-of-step-exprs when pushdown is sound (all relaxed, all
        declared), else None."""
        if any(s.contiguity == "next" for s in self.steps):
            return None
        if any(s.expr is None for s in self.steps):
            return None
        return " OR ".join(f"({s.expr})" for s in self.steps)


def _run_nfa(
    events: pd.DataFrame,
    pattern: Pattern,
    ts_col: str,
    id_col: str,
    partials: list[dict] | None = None,
) -> tuple[list[dict], list[dict]]:
    """Pure NFA scan over one key's time-ordered events. Returns (matches,
    open partials); matches are {step_name: (event_id, ts_millis)}.
    `partials` seeds state carried from a previous micro-batch.

    Hot path: rows are plain dicts (predicates index by column name) and
    the event-time millis column is vectorized up front — no pandas object
    construction per row.
    """
    matches: list[dict] = []
    partials = list(partials or [])
    # datetime64[any unit] → epoch millis, vectorized
    ts_ms = events[ts_col].values.astype("datetime64[ms]").astype("int64").tolist()
    rows = events.to_dict("records")

    for s, t in zip(rows, ts_ms):
        survivors: list[dict] = []
        for p in partials:
            if pattern.within_ms is not None and t - p["t0"] > pattern.within_ms:
                continue  # timed out
            step = pattern.steps[p["idx"]]
            if step.predicate(s):
                ev = dict(p["events"])
                ev[step.name] = (int(s[id_col]), t)
                if p["idx"] + 1 == len(pattern.steps):
                    matches.append(ev)
                else:
                    survivors.append({"idx": p["idx"] + 1, "events": ev, "t0": p["t0"]})
            elif step.contiguity == "next":
                continue  # strict contiguity broken → partial dies
            else:
                survivors.append(p)  # relaxed: skip this event
        partials = survivors
        first = pattern.steps[0]
        if first.predicate(s):
            ev = {first.name: (int(s[id_col]), t)}
            if len(pattern.steps) == 1:
                matches.append(ev)
            else:
                partials.append({"idx": 1, "events": ev, "t0": t})
    return matches, partials


def _match_columns(pattern: Pattern) -> list[str]:
    cols = []
    for st in pattern.steps:
        cols += [f"{st.name}_id", f"{st.name}_ts"]
    return cols


def match_pattern(
    df: DataFrame,
    pattern: Pattern,
    key_col: str,
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Batch CEP (CEP.pattern + PatternStream.select equivalent on a bounded
    input): one shuffle on the key; per-key sort + NFA scan in Arrow batches."""
    out_cols = [key_col] + _match_columns(pattern)
    schema = f"{key_col} long, " + ", ".join(
        f"{c} long" for c in _match_columns(pattern)
    )

    def per_key(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values([ts_col, id_col], kind="mergesort")
        found, _open = _run_nfa(pdf, pattern, ts_col, id_col)
        rows = []
        for m in found:
            row = [pdf[key_col].iloc[0]]
            for st in pattern.steps:
                eid, tms = m[st.name]
                row += [int(eid), int(tms)]
            rows.append(row)
        return pd.DataFrame(rows, columns=out_cols)

    # Semantics-preserving predicate pushdown for relaxed-contiguity
    # patterns: only candidate rows cross into Python (and the filter
    # reaches the parquet scan).
    pre = pattern.prefilter_expr()
    if pre is not None:
        df = df.filter(pre)
    # Explicit hash repartition on the key: satisfies applyInPandas'
    # clustering requirement with a width AQE won't coalesce — the Python
    # NFA is CPU-bound, not byte-bound.
    n_parts = df.sparkSession.sparkContext.defaultParallelism
    return df.repartition(n_parts, key_col).groupBy(key_col).applyInPandas(per_key, schema=schema)


def match_pattern_stream(
    stream: DataFrame,
    pattern: Pattern,
    key_col: str,
    ts_col: str = "ts",
    id_col: str = "event_id",
    watermark_delay: str | None = None,
) -> DataFrame:
    """Streaming CEP: open partial matches persist in keyed state across
    micro-batches (the NFA ComputationState equivalent); completed matches
    append. Within a batch events are NFA-scanned in event-time order; state
    carries (step index, matched events, window start) per partial.

    State is bounded when ``pattern.within_ms`` is set: expired partials are
    pruned against the batch's max event time before the state write, empty
    state is removed, and — when ``watermark_delay`` is given — an
    event-time timer drops the state of keys that go idle (the reference
    prunes the same way via NFA window cleanup timers, nfa/NFA.java)."""
    import pickle

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_cols = [key_col] + _match_columns(pattern)
    schema = f"{key_col} long, " + ", ".join(f"{c} long" for c in _match_columns(pattern))
    use_event_timeout = watermark_delay is not None and pattern.within_ms is not None

    def transition(key, pdfs, state: GroupState):
        if state.hasTimedOut:
            # Idle key: every surviving partial is past its window (the
            # timer is armed at max open-window expiry) — drop the state.
            state.remove()
            return
        partials = pickle.loads(state.get[0]) if state.exists else []
        batches = [p for p in pdfs]
        if not batches:
            return
        pdf = pd.concat(batches).sort_values([ts_col, id_col], kind="mergesort")
        # Same pure NFA as batch, seeded with the carried-over partials.
        matches, partials = _run_nfa(pdf, pattern, ts_col, id_col, partials)
        if pattern.within_ms is not None and partials:
            # Prune partials already expired at the batch horizon — they can
            # never complete (any future event is even later).
            horizon = int(pdf[ts_col].values.astype("datetime64[ms]").astype("int64").max())
            partials = [p for p in partials if horizon - p["t0"] <= pattern.within_ms]
        if partials:
            state.update((pickle.dumps(partials),))
            if use_event_timeout:
                state.setTimeoutTimestamp(
                    max(p["t0"] for p in partials) + pattern.within_ms + 1
                )
        elif state.exists:
            state.remove()
        if matches:
            out = []
            for m in matches:
                row = [key[0]]
                for st in pattern.steps:
                    eid, tms = m[st.name]
                    row += [eid, tms]
                out.append(row)
            yield pd.DataFrame(out, columns=out_cols)

    pre = pattern.prefilter_expr()
    if pre is not None:
        stream = stream.filter(pre)
    if watermark_delay is not None:
        stream = stream.withWatermark(ts_col, watermark_delay)
    timeout_conf = (
        GroupStateTimeout.EventTimeTimeout if use_event_timeout else GroupStateTimeout.NoTimeout
    )
    return stream.groupBy(key_col).applyInPandasWithState(
        transition, schema, "blob binary", "append", timeout_conf
    )
