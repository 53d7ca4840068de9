"""SQL-level rewrite: Flink/Calcite group-window functions → Spark window
expressions.

This is the single reference-optimizer capability Catalyst does not supply
natively (SURVEY §4.1 conclusion): the reference turns TUMBLE/HOP/SESSION
SQL calls into LogicalWindowAggregate via
DataSetLogicalWindowAggregateRule / DataStreamLogicalWindowAggregateRule
(/root/reference/flink-libraries/flink-table/src/main/scala/org/apache/
flink/table/plan/rules/ — wired at FlinkRuleSets.scala:155,186), with the
auxiliary accessors TUMBLE_START/.../SESSION_END registered at
FunctionCatalog.scala:405–419.

Here the rewrite happens on the SQL text, before Catalyst ever sees it —
Spark SQL already accepts `window(ts, '1 hour')` / `session_window(ts,
'10 minutes')` in GROUP BY, so the rewrite is a syntax adapter, not a
planner extension:

  TUMBLE(ts, INTERVAL '1' HOUR)                 → window(ts, '1 hour')
  HOP(ts, INTERVAL '5' MINUTE, INTERVAL '1' HOUR)
                                                → window(ts, '1 hour', '5 minutes')
  SESSION(ts, INTERVAL '30' MINUTE)             → session_window(ts, '30 minutes')
  TUMBLE_START/END, HOP_START/END               → window.start / window.end
  SESSION_START/END                             → session_window.start / .end

Calcite composite intervals (INTERVAL '1:30' HOUR TO MINUTE) and the
*_ROWTIME/_PROCTIME auxiliaries are out of scope (documented; rowtime IS
the timestamp column in this engine).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession

_UNIT = {
    "SECOND": "second",
    "MINUTE": "minute",
    "HOUR": "hour",
    "DAY": "day",
    "WEEK": "week",
    "MONTH": "month",
    "YEAR": "year",
}

# INTERVAL '5' MINUTE  /  INTERVAL '90' SECOND(2)
_INTERVAL_RE = r"INTERVAL\s+'(?P<n>\d+)'\s+(?P<unit>SECOND|MINUTE|HOUR|DAY|WEEK|MONTH|YEAR)(?:\(\d+\))?"


def _interval_to_duration(m_n: str, m_unit: str) -> str:
    n = int(m_n)
    unit = _UNIT[m_unit.upper()]
    return f"{n} {unit}{'s' if n != 1 else ''}"


def _compile(name: str, n_intervals: int) -> re.Pattern:
    ivals = r"\s*,\s*".join(
        _INTERVAL_RE.replace("(?P<n>", f"(?P<n{i}>").replace("(?P<unit>", f"(?P<unit{i}>")
        for i in range(n_intervals)
    )
    return re.compile(
        rf"\b{name}\s*\(\s*(?P<ts>[A-Za-z_][\w.]*)\s*,\s*{ivals}\s*\)", re.IGNORECASE
    )


_TUMBLE = _compile("TUMBLE", 1)
_HOP = _compile("HOP", 2)
_SESSION = _compile("SESSION", 1)
_TUMBLE_AUX = _compile("TUMBLE_(?P<acc>START|END)", 1)
_HOP_AUX = _compile("HOP_(?P<acc>START|END)", 2)
_SESSION_AUX = _compile("SESSION_(?P<acc>START|END)", 1)


def rewrite_group_windows(sql: str) -> str:
    """Rewrite Flink 1.4 group-window SQL into Spark SQL. Auxiliary
    accessors must be rewritten before the window functions themselves
    (TUMBLE_START would otherwise half-match TUMBLE)."""

    def tumble_aux(m: re.Match) -> str:
        return f"window.{m.group('acc').lower()}"

    def hop_aux(m: re.Match) -> str:
        return f"window.{m.group('acc').lower()}"

    def session_aux(m: re.Match) -> str:
        return f"session_window.{m.group('acc').lower()}"

    def tumble(m: re.Match) -> str:
        dur = _interval_to_duration(m.group("n0"), m.group("unit0"))
        return f"window({m.group('ts')}, '{dur}')"

    def hop(m: re.Match) -> str:
        slide = _interval_to_duration(m.group("n0"), m.group("unit0"))
        size = _interval_to_duration(m.group("n1"), m.group("unit1"))
        return f"window({m.group('ts')}, '{size}', '{slide}')"

    def session(m: re.Match) -> str:
        gap = _interval_to_duration(m.group("n0"), m.group("unit0"))
        return f"session_window({m.group('ts')}, '{gap}')"

    out = _TUMBLE_AUX.sub(tumble_aux, sql)
    out = _HOP_AUX.sub(hop_aux, out)
    out = _SESSION_AUX.sub(session_aux, out)
    out = _TUMBLE.sub(tumble, out)
    out = _HOP.sub(hop, out)
    out = _SESSION.sub(session, out)
    return out


def proteus_sql(spark: SparkSession, sql: str) -> DataFrame:
    """sqlQuery entry point (TableEnvironment.sqlQuery parity,
    TableEnvironment.scala:555): apply the engine's pre-Catalyst rewrites,
    then hand the statement to Spark SQL."""
    return spark.sql(rewrite_group_windows(sql))
