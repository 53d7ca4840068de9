"""Streaming OVER-window SQL dispatch — SURVEY §4.1 / §2.5.

Reference: on streams, Flink SQL routes OVER windows through
DataStreamOverAggregate.scala (:45 unbounded, :250-276 bounded), picking
one of six runtime operators by (bound shape × time attribute):
RowTime/ProcTime × Unbounded/BoundedRows/BoundedRange Over. Spark SQL has
no streaming OVER support at all, so — as with the group-window rewrite in
`plans.sql_rewrite` — the dispatch happens on the SQL text, before the
plan: `stream_over_sql` parses the canonical OVER clause and routes to the
matching stateful operator in `streaming.stateful`, which is exactly the
decision DataStreamOverAggregate makes from the Calcite logical window.

Supported (the reference's own dispatch matrix):
  <agg>(<col>) OVER (PARTITION BY k ORDER BY ts
                     [ROWS BETWEEN n PRECEDING AND CURRENT ROW
                      | RANGE BETWEEN INTERVAL 'x' <unit> PRECEDING AND CURRENT ROW
                      | ROWS/RANGE UNBOUNDED PRECEDING])
with <agg> ∈ SUM|COUNT|AVG; ORDER BY must be the event-time column
ascending (DataStreamOverAggregate rejects anything else, :112-130 — same
error here). `time_mode="proc"` selects the ProcTime* operators.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame

_UNIT_MS = {
    "SECOND": 1_000,
    "MINUTE": 60_000,
    "HOUR": 3_600_000,
    "DAY": 86_400_000,
}

_OVER_RE = re.compile(
    r"^\s*(?P<agg>SUM|COUNT|AVG)\s*\(\s*(?P<col>[A-Za-z_]\w*)\s*\)\s+OVER\s*\(\s*"
    r"PARTITION\s+BY\s+(?P<key>[A-Za-z_]\w*)\s+"
    r"ORDER\s+BY\s+(?P<ts>[A-Za-z_]\w*)(?:\s+ASC)?\s*"
    r"(?P<frame>"
    r"ROWS\s+BETWEEN\s+(?P<nrows>\d+)\s+PRECEDING\s+AND\s+CURRENT\s+ROW"
    r"|RANGE\s+BETWEEN\s+INTERVAL\s+'(?P<rn>\d+)'\s+(?P<runit>SECOND|MINUTE|HOUR|DAY)S?\s+PRECEDING\s+AND\s+CURRENT\s+ROW"
    r"|(?:ROWS|RANGE)\s+(?:BETWEEN\s+)?UNBOUNDED\s+PRECEDING(?:\s+AND\s+CURRENT\s+ROW)?"
    r")?\s*\)\s*$",
    re.IGNORECASE,
)

_OUT_COL = {"SUM": "{w}_sum", "COUNT": "{w}_cnt", "AVG": "{w}_avg"}


def stream_over_sql(
    stream: DataFrame,
    over_expr: str,
    id_col: str = "event_id",
    watermark_delay: str = "10 minutes",
    time_mode: str = "event",
    alias: str | None = None,
) -> DataFrame:
    """Parse one canonical OVER expression and run the matching streaming
    operator. Returns (key, id, ts, <alias>) — the aggregated column named
    ``alias`` (default: the operator's native name, e.g. ``w_sum``).

    Raises ValueError on shapes the reference also rejects (descending
    rowtime order, FOLLOWING bounds, unknown aggregates) — there is no
    silent fallback to a batch window, which would be semantically wrong
    on a stream.
    """
    from proteus_engine_spark.streaming.stateful import (
        bounded_over_agg,
        bounded_range_over_agg,
        running_over_agg,
    )

    m = _OVER_RE.match(over_expr.strip())
    if not m:
        raise ValueError(
            "unsupported streaming OVER shape (the engine dispatches the "
            "DataStreamOverAggregate matrix: PARTITION BY k ORDER BY "
            "rowtime ASC with ROWS n PRECEDING / RANGE INTERVAL x "
            f"PRECEDING / UNBOUNDED PRECEDING): {over_expr!r}"
        )
    agg = m.group("agg").upper()
    key, ts, col = m.group("key"), m.group("ts"), m.group("col")
    frame = (m.group("frame") or "").upper()

    if m.group("nrows") is not None:
        out = bounded_over_agg(
            stream, key, ts, col, n_rows=int(m.group("nrows")) + 1,
            id_col=id_col, watermark_delay=watermark_delay, time_mode=time_mode,
        )
        native = _OUT_COL[agg].format(w="w")
    elif m.group("rn") is not None:
        range_ms = int(m.group("rn")) * _UNIT_MS[m.group("runit").upper()]
        out = bounded_range_over_agg(
            stream, key, ts, col, range_ms=range_ms,
            id_col=id_col, watermark_delay=watermark_delay, time_mode=time_mode,
        )
        native = _OUT_COL[agg].format(w="w")
    elif "UNBOUNDED" in frame or frame == "":
        # ROWS UNBOUNDED → RowTimeUnboundedRowsOver; RANGE UNBOUNDED or no
        # frame clause (the SQL default is RANGE) → the peer-inclusive
        # RowTimeUnboundedRangeOver — the reference dispatches both (:45)
        # proc time: every element is its own peer group (ProcTime*Over),
        # so the rows/range distinction collapses to rows
        peer_frame = (
            "rows" if frame.startswith("ROWS") or time_mode == "proc" else "range"
        )
        out = running_over_agg(
            stream, key, ts, col,
            id_col=id_col, watermark_delay=watermark_delay, time_mode=time_mode,
            frame=peer_frame,
        )
        native = _OUT_COL[agg].format(w="running")
    else:  # pragma: no cover — regex shape guarantees one of the above
        raise ValueError(f"unreachable frame {frame!r}")

    keep = [key, id_col, ts, native]
    out = out.select(*keep)
    if alias:
        out = out.withColumnRenamed(native, alias)
    return out
