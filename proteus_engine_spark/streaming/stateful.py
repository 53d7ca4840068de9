"""Custom stateful streaming operators on applyInPandasWithState.

Reference targets (SURVEY §2.9 / §7 step 6):
- count windows        — KeyedStream.countWindow (KeyedStream.java:383,393)
- ProcessFunction      — ProcessFunction.java:51 processElement/onTimer
  with keyed state (flink-core/.../api/common/state/*.java) and timers.

Both use the same machinery: groupBy(key).applyInPandasWithState — keyed
state lives in Spark's state store (checkpointed, scaled per key group,
the RocksDB-backend equivalent), timers map to GroupStateTimeout.

Scale: state per key is O(1) for count windows (running agg + remainder
buffer bounded by window size); Arrow batches amortize the Python crossing.
Within a micro-batch, rows are presented sorted by (ts, tiebreak) before
the transition function runs — deterministic replay, the same guarantee
the reference gets from watermarked event-time order in its window
operator.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def field_ddl(df: DataFrame, col: str) -> str:
    """`name type` DDL for one column, taken from the frame's own schema —
    output/state schemas must not hard-code a key type the API doesn't
    actually constrain (a string or int key is as legal as a long one)."""
    return f"{col} {df.schema[col].dataType.simpleString()}"


def _ingest_and_release(st, pdfs, state, ts_col, id_col, value_col):
    """Shared watermark-buffer step for event-time stateful operators
    (the RowTime*Over / RowTimeSortProcessFunction MapState-by-timestamp
    discipline): append arrivals to the keyed buffer as (ts_us, id,
    cents), then split out — in (ts, id) order — the rows the watermark
    has passed. Microsecond event time is kept end-to-end (emitted ts and
    sort order must match batch oracles bit-for-bit); only the release
    comparison floors to ms, because Spark's watermark is ms-floored.

    Release order is globally correct per key across batches: everything
    released earlier had ts strictly below the then-watermark, and Spark
    admits any arrival with ts >= the watermark (it drops only strictly
    older rows), so new arrivals always sort after everything already
    released. Returns (watermark_ms, ready_rows)."""
    import numpy as np

    wm = state.getCurrentWatermarkMs()
    frontier = st.get("frontier", 0)
    if not state.hasTimedOut:
        batches = [p for p in pdfs if len(p)]
        if batches:
            pdf = pd.concat(batches)
            ts_us = pdf[ts_col].values.astype("datetime64[us]").astype("int64")
            # Late-event drop (the reference operators discard elements at
            # or below the last watermark they processed): Spark's own
            # late filter lags one micro-batch behind eviction, so a row
            # below this key's last release frontier CAN still arrive —
            # buffering it would emit it below already-released peers.
            on_time = (ts_us // 1000) >= frontier
            if not on_time.all():
                pdf = pdf[on_time]
                ts_us = ts_us[on_time]
            ids = pdf[id_col].to_numpy()
            if value_col is None:
                cents = np.zeros(len(pdf), dtype="int64")
            else:
                cents = np.rint(
                    pdf[value_col].to_numpy(dtype="float64") * 100
                ).astype("int64")
            st["buf"].extend(zip(ts_us.tolist(), ids.tolist(), cents.tolist()))
    st["frontier"] = max(frontier, wm)
    # STRICTLY below the watermark: Spark's late-row filter only drops
    # rows strictly older than the watermark, so an arrival with ts
    # exactly == wm is still admitted in a later batch — releasing at
    # <= wm would flush its peers first and break the global (ts, id)
    # release order (and the "peers never straddle a flush" invariant
    # the RANGE/peer-group aggregates rely on).
    ready = sorted(e for e in st["buf"] if e[0] // 1000 < wm)
    st["buf"] = [e for e in st["buf"] if e[0] // 1000 >= wm]
    return wm, ready


def _persist_or_clear(st, state, wm, keep_if):
    """Persist the buffer state and arm the event-time timer at the next
    pending row's timestamp (so buffered rows flush when the watermark
    advances without new data for this key), or drop the key's state
    entirely when nothing remains."""
    import pickle

    if st["buf"] or keep_if:
        state.update((pickle.dumps(st),))
        # A buffered row at ts releases only when wm > ts, so the timer
        # is ts + 1 (also keeps it strictly above the current watermark,
        # as EventTimeTimeout requires — buffered rows all have ts >= wm
        # after the strict release).
        pending = [t // 1000 + 1 for t, _i, _c in st["buf"]]
        if pending:
            state.setTimeoutTimestamp(min(pending))
    elif state.exists:
        state.remove()


def count_window_agg(
    stream: DataFrame,
    key_col: str,
    order_cols: list[str],
    value_col: str,
    window_size: int,
    id_col: str = "event_id",
) -> DataFrame:
    """Tumbling count window per key: emit (key, win_id, n, total_value,
    first_id, last_id) every `window_size` rows.

    State = (next window id, rows-so-far buffer for the open window) — the
    buffer never exceeds window_size rows. Emission happens as soon as a
    window fills (mid-batch included), matching CountTrigger.of(size) FIRE
    semantics; the open remainder window stays in state awaiting more rows.
    """
    id_type = stream.schema[id_col].dataType.simpleString()
    out_schema = (
        f"{field_ddl(stream, key_col)}, win_id long, n long, "
        f"total_value double, first_id {id_type}, last_id {id_type}"
    )
    state_schema = f"win_id long, buf_n long, buf_sum double, buf_first {id_type}"

    def transition(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        import numpy as np

        if state.exists:
            win_id, buf_n, buf_sum, buf_first = state.get
        else:
            win_id, buf_n, buf_sum, buf_first = 0, 0, 0.0, None
        frames: list[pd.DataFrame] = []
        # A key whose micro-batch spans several Arrow chunks must be sorted
        # GLOBALLY before window assignment — per-chunk sorts with state
        # carried across chunks would order rows by chunk arrival, not
        # (order_cols), and chunking is a serialization detail
        # (arrow.maxRecordsPerBatch), not a semantic boundary.
        chunks = [c for c in pdfs if len(c)]
        whole = (
            pd.concat(chunks, ignore_index=True) if len(chunks) > 1
            else chunks[0] if chunks else None
        )
        for pdf in ([whole] if whole is not None else []):
            pdf = pdf.sort_values(order_cols, kind="mergesort")
            ids = pdf[id_col].to_numpy()
            vals = pdf[value_col].to_numpy(dtype="float64")
            n = len(pdf)
            # Window id per row: batch-level cumcount offset by the carried
            # open-window fill — no per-row Python (the reference's
            # CountTrigger counts in JVM state; here it's one integer div).
            pos = buf_n + np.arange(n)
            win = win_id + pos // window_size
            starts = np.flatnonzero(np.r_[True, win[1:] != win[:-1]])
            sums = np.add.reduceat(vals, starts)
            counts = np.diff(np.r_[starts, n])
            wins = win[starts]
            firsts = ids[starts].copy()
            lasts = ids[np.r_[starts[1:] - 1, n - 1]]
            if buf_n > 0:  # merge the carried open window into its group
                sums[0] += buf_sum
                counts[0] += buf_n
                firsts[0] = buf_first
            closed = counts == window_size
            if closed.any():
                frames.append(
                    pd.DataFrame(
                        {
                            key_col: np.full(int(closed.sum()), key[0]),
                            "win_id": wins[closed],
                            "n": counts[closed],
                            "total_value": sums[closed],
                            "first_id": firsts[closed],
                            "last_id": lasts[closed],
                        }
                    )
                )
            if closed[-1]:
                win_id, buf_n, buf_sum, buf_first = int(wins[-1]) + 1, 0, 0.0, None
            else:
                win_id, buf_n = int(wins[-1]), int(counts[-1])
                # .item() keeps the id's own type (long OR string — the
                # schema no longer hard-codes long)
                buf_sum = float(sums[-1])
                buf_first = firsts[-1].item() if hasattr(
                    firsts[-1], "item") else firsts[-1]
        state.update((win_id, buf_n, buf_sum, buf_first))
        yield from frames

    return stream.groupBy(key_col).applyInPandasWithState(
        transition, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
    )


def event_time_sort(
    stream: DataFrame,
    key_col: str,
    ts_col: str,
    id_col: str = "event_id",
    watermark_delay: str = "10 minutes",
) -> DataFrame:
    """Event-time sorted emission per key (DataStreamSort parity —
    flink-table/.../plan/nodes/datastream/DataStreamSort.scala:42 allows
    only ascending rowtime sort on streams; runtime
    RowTimeSortProcessFunction buffers rows per key until the watermark
    passes, then emits in event-time order).

    Spark shape: rows are watermark-buffered in keyed state (the
    RowTimeSortProcessFunction MapState) and released in (ts, id) order
    once the watermark passes them, each assigned a contiguous per-key
    sequence number — so seq IS the global per-key event-time rank, even
    under out-of-order arrival across micro-batches. Rows later than the
    final watermark stay buffered (append semantics). State is the
    in-flight rows inside the watermark delay plus a counter."""
    out_schema = (
        f"{field_ddl(stream, key_col)}, {field_ddl(stream, id_col)}, "
        f"{ts_col} timestamp, seq long"
    )

    def transition(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        import pickle

        st = pickle.loads(state.get[0]) if state.exists else {"buf": [], "seq": 0}
        wm, ready = _ingest_and_release(st, pdfs, state, ts_col, id_col, None)
        if ready:
            n = len(ready)
            out = pd.DataFrame(
                {
                    key_col: key[0],
                    id_col: [i for _t, i, _c in ready],
                    ts_col: pd.to_datetime([t for t, _i, _c in ready], unit="us"),
                    "seq": range(st["seq"] + 1, st["seq"] + n + 1),
                }
            )
            st["seq"] += n
            yield out
        _persist_or_clear(st, state, wm, keep_if=st["seq"] > 0)

    return (
        stream.select(key_col, id_col, ts_col)
        .withWatermark(ts_col, watermark_delay)
        .groupBy(key_col)
        .applyInPandasWithState(
            transition, out_schema, "blob binary", "append",
            GroupStateTimeout.EventTimeTimeout,
        )
    )


def running_over_agg(
    stream: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    id_col: str = "event_id",
    watermark_delay: str = "10 minutes",
    time_mode: str = "event",
    frame: str = "rows",
) -> DataFrame:
    """Streaming OVER aggregation: per-key running SUM/COUNT/AVG in
    event-time order, ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW —
    one output row per input row, emitted as the stream flows.
    ``frame="range"`` selects the peer-inclusive variant
    (RowTimeUnboundedRangeOver vs RowTimeUnboundedRowsOver — the
    reference ships BOTH, RowTimeUnboundedOver.scala subclasses): all
    rows sharing a timestamp report the aggregate over the whole peer
    group, the SQL default `RANGE UNBOUNDED PRECEDING` frame. Peers are
    always released in one watermark flush (equal ts), so the group is
    complete when computed; `frame="range"` requires event time mode.

    Reference: DataStreamOverAggregate.scala:45 routes unbounded
    processing/event-time OVER windows to RowTimeUnboundedOver.scala /
    ProcTimeUnboundedOver.scala — a keyed ProcessFunction holding the
    running accumulator in ValueState, emitting (row + aggregate) per
    element. Spark has no streaming Window-function support, so this is the
    same shape on applyInPandasWithState: state = (count, exact sum), one
    emitted row per event.

    Determinism: the running sum is accumulated in integer cents (exact),
    converted to double per row — addition-order independent, so the result
    hash-matches a batch SQL `SUM(CAST(value AS DECIMAL(18,2))) OVER
    (... ROWS UNBOUNDED PRECEDING)`. In the default ``time_mode="event"``
    rows are watermark-buffered and released in (ts, id) order — the
    RowTimeUnboundedOver discipline, correct under out-of-order arrival;
    rows later than the final watermark stay buffered (append semantics).
    ``time_mode="proc"`` (ProcTimeUnboundedOver.scala) accumulates in
    arrival order and emits immediately. State is O(1) per key plus, in
    event mode, the in-flight rows inside the watermark delay.
    """
    if time_mode not in ("event", "proc"):
        raise ValueError(f"unknown time_mode {time_mode!r}: 'event' or 'proc'")
    if frame not in ("rows", "range"):
        raise ValueError(f"unknown frame {frame!r}: 'rows' or 'range'")
    if frame == "range" and time_mode == "proc":
        raise ValueError(
            "frame='range' needs event time: processing-time peers are an "
            "arrival-order accident (the reference's ProcTime variants "
            "treat each element as its own peer group)"
        )
    out_schema = (
        f"{field_ddl(stream, key_col)}, {field_ddl(stream, id_col)}, "
        f"{ts_col} timestamp, running_sum double, running_cnt long, "
        "running_avg double"
    )

    def emit(key, ready, st):
        import numpy as np

        cents = np.asarray([c for _t, _i, c in ready], dtype="int64")
        if frame == "range":
            # peer-inclusive: every row of a ts group reports the group's
            # closing cumulative (carried state applies wholly — peers
            # never straddle a flush)
            ts_arr = np.asarray([t for t, _i, _c in ready], dtype="int64")
            hi = np.searchsorted(ts_arr, ts_arr, side="right")
            csum = np.cumsum(cents)
            run = st["sum"] + csum[hi - 1]
            counts = st["cnt"] + hi
            st["cnt"] = int(counts[-1])
            st["sum"] = int(st["sum"] + csum[-1])
        else:
            run = st["sum"] + np.cumsum(cents)
            counts = st["cnt"] + np.arange(1, len(cents) + 1)
            st["cnt"] = int(counts[-1])
            st["sum"] = int(run[-1])
        return pd.DataFrame(
            {
                key_col: key[0],
                id_col: [i for _t, i, _c in ready],
                ts_col: pd.to_datetime([t for t, _i, _c in ready], unit="us"),
                "running_sum": run / 100.0,
                "running_cnt": counts,
                "running_avg": (run / 100.0) / counts,
            }
        )

    if time_mode == "proc":
        return _proc_time_over(
            stream, key_col, ts_col, value_col, id_col, out_schema, emit,
            init_state={"buf": [], "cnt": 0, "sum": 0},
        )

    def transition(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        import pickle

        st = (
            pickle.loads(state.get[0])
            if state.exists
            else {"buf": [], "cnt": 0, "sum": 0}
        )
        wm, ready = _ingest_and_release(st, pdfs, state, ts_col, id_col, value_col)
        if ready:
            yield emit(key, ready, st)
        _persist_or_clear(st, state, wm, keep_if=st["cnt"] > 0)

    return (
        stream.select(key_col, id_col, ts_col, value_col)
        .withWatermark(ts_col, watermark_delay)
        .groupBy(key_col)
        .applyInPandasWithState(
            transition, out_schema, "blob binary", "append",
            GroupStateTimeout.EventTimeTimeout,
        )
    )


def bounded_over_agg(
    stream: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    n_rows: int,
    id_col: str = "event_id",
    watermark_delay: str = "10 minutes",
    time_mode: str = "event",
) -> DataFrame:
    """Streaming bounded OVER aggregation: per-key SUM/COUNT/AVG over
    ``ROWS BETWEEN (n_rows-1) PRECEDING AND CURRENT ROW`` in event-time
    order — one output row per input row once the watermark passes it.
    ``time_mode="proc"`` selects the processing-time variant
    (ProcTimeBoundedRowsOver.scala): arrival-order windows, immediate
    emission, no watermark — see _proc_time_over.

    Reference: DataStreamOverAggregate.scala:250-276 routes bounded
    ROWS-preceding OVER windows to RowTimeBoundedRowsOver.scala — a keyed
    ProcessFunction that buffers rows in MapState keyed by timestamp and
    only processes a timestamp once the watermark passes it (onTimer),
    retracting the row that falls out of the window. Same discipline here:
    arrivals are buffered in keyed state and released in (ts, id) order
    only at ts <= watermark — so event-time order (and hence window
    contents) is correct under OUT-OF-ORDER arrival across micro-batches,
    not just on in-order replay. Released rows' last ``n_rows - 1`` values
    carry forward as the window tail (exact integer cents).

    Release order is globally correct per key: everything released so far
    had ts <= previous watermark, and Spark drops late arrivals below the
    watermark upstream of the stateful operator, so new arrivals always
    sort after everything already emitted.

    State is O(n_rows + in-flight rows inside the watermark delay) per
    key — the same bound the reference's MapState-by-timestamp carries.
    Rows later than the final watermark stay buffered (append semantics;
    oracles exclude the watermark-delay tail).
    """
    import pickle

    import numpy as np

    if n_rows < 1:
        raise ValueError("n_rows must be >= 1")
    if time_mode not in ("event", "proc"):
        raise ValueError(f"unknown time_mode {time_mode!r}: 'event' or 'proc'")
    out_schema = (
        f"{field_ddl(stream, key_col)}, {field_ddl(stream, id_col)}, "
        f"{ts_col} timestamp, w_sum double, w_cnt long, w_avg double"
    )

    def emit(key, ready, st):
        import numpy as np

        cents = np.asarray([c for _t, _i, c in ready], dtype="int64")
        carried = np.asarray(st["tail"], dtype="int64")
        allc = np.concatenate([carried, cents])
        csum = np.concatenate([[0], np.cumsum(allc)])
        gi = len(carried) + np.arange(len(cents))
        start = np.maximum(0, gi - n_rows + 1)
        wsum = (csum[gi + 1] - csum[start]) / 100.0
        wcnt = gi + 1 - start
        st["tail"] = allc[len(allc) - min(len(allc), n_rows - 1):].tolist()
        return pd.DataFrame(
            {
                key_col: key[0],
                id_col: [i for _t, i, _c in ready],
                ts_col: pd.to_datetime([t for t, _i, _c in ready], unit="us"),
                "w_sum": wsum,
                "w_cnt": wcnt,
                "w_avg": wsum / wcnt,
            }
        )

    if time_mode == "proc":
        return _proc_time_over(
            stream, key_col, ts_col, value_col, id_col, out_schema, emit,
            init_state={"buf": [], "tail": []},
        )

    def transition(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        import pickle

        st = pickle.loads(state.get[0]) if state.exists else {"buf": [], "tail": []}
        wm, ready = _ingest_and_release(st, pdfs, state, ts_col, id_col, value_col)
        if ready:
            yield emit(key, ready, st)
        _persist_or_clear(st, state, wm, keep_if=bool(st["tail"]))

    return (
        stream.select(key_col, id_col, ts_col, value_col)
        .withWatermark(ts_col, watermark_delay)
        .groupBy(key_col)
        .applyInPandasWithState(
            transition, out_schema, "blob binary", "append",
            GroupStateTimeout.EventTimeTimeout,
        )
    )


def _proc_time_over(
    stream, key_col, ts_col, value_col, id_col, out_schema, emit, init_state
):
    """Processing-time OVER harness (ProcTimeBoundedRowsOver.scala /
    ProcTimeBoundedRangeOver.scala / ProcTimeUnboundedOver.scala): rows
    are processed in ARRIVAL order — no watermark, no buffering, every
    row emits in the micro-batch it arrives in. Within a micro-batch
    arrival order is refined to (ts, id) for deterministic replay (the
    reference's per-element processing has no intra-batch notion). The
    carried state (window tail / accumulator) is whatever `emit`
    maintains in the shared state dict."""
    import pickle

    def transition(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        import numpy as np

        import copy

        # deep copy: init_state's container values must not be shared
        # across keys (a future emit() that mutates in place would
        # otherwise leak state between keys in the same worker)
        st = pickle.loads(state.get[0]) if state.exists else copy.deepcopy(init_state)
        # Concatenate the key's Arrow chunks before the (ts, id) refinement
        # sort — per-chunk sorts would leave the micro-batch in chunk order
        # whenever one key spans multiple chunks (arrow.maxRecordsPerBatch),
        # breaking the documented deterministic-replay ordering.
        chunks = [c for c in pdfs if len(c)]
        whole = (
            pd.concat(chunks, ignore_index=True) if len(chunks) > 1
            else chunks[0] if chunks else None
        )
        for pdf in ([whole] if whole is not None else []):
            pdf = pdf.sort_values([ts_col, id_col], kind="mergesort")
            ts_us = pdf[ts_col].values.astype("datetime64[us]").astype("int64")
            ids = pdf[id_col].to_numpy()
            if value_col is None:
                cents = np.zeros(len(pdf), dtype="int64")
            else:
                cents = np.rint(
                    pdf[value_col].to_numpy(dtype="float64") * 100
                ).astype("int64")
            rows = list(zip(ts_us.tolist(), ids.tolist(), cents.tolist()))
            yield emit(key, rows, st)
        state.update((pickle.dumps(st),))

    cols = [key_col, id_col, ts_col] + ([value_col] if value_col else [])
    return stream.select(*cols).groupBy(key_col).applyInPandasWithState(
        transition, out_schema, "blob binary", "append",
        GroupStateTimeout.NoTimeout,
    )


def bounded_range_over_agg(
    stream: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    range_ms: int,
    id_col: str = "event_id",
    watermark_delay: str = "10 minutes",
    time_mode: str = "event",
) -> DataFrame:
    """Streaming bounded RANGE OVER aggregation: per-key SUM/COUNT/AVG over
    ``RANGE BETWEEN INTERVAL range_ms PRECEDING AND CURRENT ROW`` in
    event-time order — one output row per input row once the watermark
    passes it. ``time_mode="proc"`` is the ProcTimeBoundedRangeOver.scala
    variant: arrival-order processing, immediate emission, frames over the
    ts column which — as with the reference's processing time — is assumed
    per-key non-decreasing across batches.

    Reference: RowTimeBoundedRangeOver.scala (dispatched from
    DataStreamOverAggregate.scala:250-276) — the last remaining streaming
    OVER shape: a keyed ProcessFunction that buffers rows by timestamp,
    processes each timestamp at the watermark, and retracts rows whose
    timestamp falls more than `range_ms` behind. SQL RANGE semantics: the
    frame of a row at time t is ALL rows with ts in [t - range_ms, t]
    inclusive — peers at the same ts share one frame that includes all of
    them (they are always released in the same watermark flush, so the
    frame is complete when computed).

    Same watermark-buffer discipline as bounded_over_agg; the retained
    window state is rows with ts >= watermark - range_ms (any future row
    has ts >= the watermark under strict release, so nothing older can
    re-enter a frame) — the exact cleanup bound of the reference's
    retraction loop. Vectorized via one
    cumsum + two searchsorted calls per flush, no per-row Python loop.
    """
    if range_ms < 0:
        raise ValueError("range_ms must be >= 0")
    if time_mode not in ("event", "proc"):
        raise ValueError(f"unknown time_mode {time_mode!r}: 'event' or 'proc'")
    out_schema = (
        f"{field_ddl(stream, key_col)}, {field_ddl(stream, id_col)}, "
        f"{ts_col} timestamp, w_sum double, w_cnt long, w_avg double"
    )

    range_us = range_ms * 1000

    def emit(key, ready, st, wm_us=None):
        # Microsecond event time throughout (frame membership [t-range, t]
        # must be judged at full source precision to match the batch RANGE
        # oracle). Carried window rows are already ts-sorted; released
        # rows all have ts above every carried ts (watermark monotonicity;
        # the proc contract assumes the same), so concatenation preserves
        # sort order. Retention floor: in event mode the watermark (any
        # future row is above it), in proc mode the last processed ts.
        import numpy as np

        car_ts = np.asarray([t for t, _c in st["win"]], dtype="int64")
        car_c = np.asarray([c for _t, c in st["win"]], dtype="int64")
        rdy_ts = np.asarray([t for t, _i, _c in ready], dtype="int64")
        rdy_c = np.asarray([c for _t, _i, c in ready], dtype="int64")
        all_ts = np.concatenate([car_ts, rdy_ts])
        all_c = np.concatenate([car_c, rdy_c])
        csum = np.concatenate([[0], np.cumsum(all_c)])
        lo = np.searchsorted(all_ts, rdy_ts - range_us, side="left")
        hi = np.searchsorted(all_ts, rdy_ts, side="right")
        wsum = (csum[hi] - csum[lo]) / 100.0
        wcnt = hi - lo
        floor = (wm_us if wm_us is not None else int(rdy_ts[-1])) - range_us
        # Keep ts >= floor (side="left"): release is strictly below the
        # watermark, so a future row can sit exactly AT the watermark and
        # its frame [wm - range, wm] still needs history at exactly
        # wm - range; dropping ts == floor would shave that frame edge.
        keep = np.searchsorted(all_ts, floor, side="left")
        st["win"] = list(zip(all_ts[keep:].tolist(), all_c[keep:].tolist()))
        return pd.DataFrame(
            {
                key_col: key[0],
                id_col: [i for _t, i, _c in ready],
                ts_col: pd.to_datetime(rdy_ts, unit="us"),
                "w_sum": wsum,
                "w_cnt": wcnt,
                "w_avg": wsum / wcnt,
            }
        )

    if time_mode == "proc":
        return _proc_time_over(
            stream, key_col, ts_col, value_col, id_col, out_schema, emit,
            init_state={"buf": [], "win": []},
        )

    def transition(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        import pickle

        st = pickle.loads(state.get[0]) if state.exists else {"buf": [], "win": []}
        wm, ready = _ingest_and_release(st, pdfs, state, ts_col, id_col, value_col)
        if ready:
            yield emit(key, ready, st, wm_us=wm * 1000)
        _persist_or_clear(st, state, wm, keep_if=bool(st["win"]))

    return (
        stream.select(key_col, id_col, ts_col, value_col)
        .withWatermark(ts_col, watermark_delay)
        .groupBy(key_col)
        .applyInPandasWithState(
            transition, out_schema, "blob binary", "append",
            GroupStateTimeout.EventTimeTimeout,
        )
    )


def process_keyed(
    stream: DataFrame,
    key_cols: list[str],
    func: Callable[[tuple, pd.DataFrame, dict[str, Any]], tuple[pd.DataFrame, dict[str, Any]]],
    out_schema: str,
    timeout: str = "NoTimeout",
    timeout_duration_ms: int | None = None,
    on_timeout: Callable[[tuple, dict[str, Any]], pd.DataFrame | None] | None = None,
    event_time_col: str | None = None,
) -> DataFrame:
    """ProcessFunction shim (ProcessFunction.java:51): user code sees
    (key, batch, mutable state dict) and returns (emitted rows, new state);
    `on_timeout` is the onTimer equivalent (:85), fired by the state store
    when the key is idle past `timeout_duration_ms` — measured in processing
    time for ProcessingTimeTimeout, or in event time past the watermark for
    EventTimeTimeout (requires `event_time_col` and a watermarked input;
    the timer is re-armed each batch at max(batch event time) + duration,
    i.e. an event-time idle-gap timer, the session-gap shape of
    ProcessFunction.java:85 onTimer).

    The state dict is pickled into a single binary state column — arbitrary
    Python state, the ValueState/ListState/MapState union. Keep it compact:
    it is shipped through the state store every batch.
    """
    import pickle

    state_schema = "blob binary"
    timeout_conf = {
        "NoTimeout": GroupStateTimeout.NoTimeout,
        "ProcessingTimeTimeout": GroupStateTimeout.ProcessingTimeTimeout,
        "EventTimeTimeout": GroupStateTimeout.EventTimeTimeout,
    }[timeout]
    if timeout == "EventTimeTimeout" and (event_time_col is None or timeout_duration_ms is None):
        raise ValueError(
            "EventTimeTimeout requires event_time_col and timeout_duration_ms "
            "(and a withWatermark() on the input stream)"
        )

    def transition(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            user_state = pickle.loads(state.get[0]) if state.exists else {}
            if on_timeout is not None:
                emitted = on_timeout(key, user_state)
                if emitted is not None and len(emitted):
                    yield emitted
            state.remove()
            return
        user_state = pickle.loads(state.get[0]) if state.exists else {}
        batches = [pdf for pdf in pdfs]
        batch = pd.concat(batches) if batches else pd.DataFrame()
        emitted, new_state = func(key, batch, user_state)
        state.update((pickle.dumps(new_state),))
        if timeout == "ProcessingTimeTimeout" and timeout_duration_ms is not None:
            state.setTimeoutDuration(timeout_duration_ms)
        elif timeout == "EventTimeTimeout" and len(batch):
            max_ts_ms = int(
                batch[event_time_col].to_numpy().astype("datetime64[ms]").astype("int64").max()
            )
            # Clamp above the CURRENT watermark: Spark admits rows against
            # the PREVIOUS batch's watermark (one-batch lag, see the module
            # header), so an all-laggard batch can put max_ts + duration at
            # or below the frontier — setTimeoutTimestamp would then throw
            # and kill the query. Clamped, the idle timer fires on the next
            # watermark advance, which is when the key is provably idle.
            wm = state.getCurrentWatermarkMs()
            state.setTimeoutTimestamp(max(max_ts_ms + timeout_duration_ms, wm + 1))
        if emitted is not None and len(emitted):
            yield emitted

    return stream.groupBy(*key_cols).applyInPandasWithState(
        transition, out_schema, state_schema, "append", timeout_conf
    )


def windowed_heavy_hitters(
    stream: DataFrame,
    item_col: str,
    ts_col: str = "ts",
    window_ms: int = 3_600_000,
    k: int = 64,
    shards: int = 4,
) -> DataFrame:
    """Per-window Misra-Gries heavy hitters ON THE STREAM — the streaming
    member of the heavy-hitter arc (bounds/grouped/merge are batch-gated),
    the same composed-sketch family as stream_window_quantile_bounds /
    stream_window_approx_distinct, but with the sketch state hand-held in
    keyed state because Spark has no built-in MG aggregate (the
    ProcessFunction-with-timers shape, ProcessFunction.java:51,85 — keyed
    state plus an event-time timer at window end).

    Keying is (window, shard-of-item): each shard holds an INDEPENDENT
    k-counter summary over ITS hash-disjoint token subset, so per-window
    parallelism is `shards` tasks instead of one, and the per-token bound
    only tightens — a token lives in exactly one shard, whose total
    N_shard <= N_w, so undercount <= N_shard/(k+1) <= N_w/(k+1) and every
    item above the window threshold is present in its shard. Summaries
    from different shards never share items, so concatenating them IS the
    merged window summary (the disjoint-universe case of the Agarwal
    merge the agg_heavy_hitters_merge gate certifies). State per key is
    <= 2k counters; a window's keys emit and clear when the watermark
    passes the window end (event-time timeout), so live state is bounded
    by the windows inside the watermark horizon, never the stream length.

    Emits (window_id long, item string, est long) on window close; the
    final windows inside the watermark tail never close (append
    semantics), matching the batch-oracle cut of every stream_* gate.
    Requires a withWatermark() on `ts_col` upstream."""
    import pickle

    import numpy as np
    from pyspark.sql import functions as F

    if k < 1 or shards < 1:
        raise ValueError("k and shards must be >= 1")
    out_schema = "window_id long, item string, est long"

    def transition(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        w = int(key[0])
        if state.hasTimedOut:
            st = pickle.loads(state.get[0]) if state.exists else {"c": {}}
            state.remove()
            if st["c"]:
                yield pd.DataFrame(
                    {
                        "window_id": np.full(len(st["c"]), w, dtype="int64"),
                        "item": list(st["c"].keys()),
                        "est": np.fromiter(
                            st["c"].values(), dtype="int64", count=len(st["c"])
                        ),
                    }
                )
            return
        st = pickle.loads(state.get[0]) if state.exists else {"c": {}}
        counters = st["c"]
        for pdf in pdfs:
            if not len(pdf):
                continue
            counts = pdf["item"].value_counts()
            for item, c in counts.items():
                counters[item] = counters.get(item, 0) + int(c)
            if len(counters) > k:
                cut = sorted(counters.values(), reverse=True)[k]
                counters = {i: c - cut for i, c in counters.items() if c - cut > 0}
        st["c"] = counters
        state.update((pickle.dumps(st),))
        # window-end timer, clamped strictly above the current watermark
        # (Spark rejects a timeout at or below it; data for this window
        # implies window_end > wm, the clamp covers the ms-floor edge)
        wm = state.getCurrentWatermarkMs()
        state.setTimeoutTimestamp(max((w + 1) * window_ms, wm + 1))

    keyed = stream.select(
        F.expr(f"unix_millis({ts_col}) div {int(window_ms)}")
        .alias("window_id"),
        F.pmod(F.xxhash64(F.col(item_col)), F.lit(shards)).alias("shard"),
        F.col(item_col).cast("string").alias("item"),
        F.col(ts_col),
    )
    return keyed.groupBy("window_id", "shard").applyInPandasWithState(
        transition, out_schema, "blob binary", "append",
        GroupStateTimeout.EventTimeTimeout,
    )
