"""The reference's scalar/aggregate function catalog, re-expressed on
pyspark.sql.functions.

Reference: Table API registrations /root/reference/flink-libraries/
flink-table/src/main/scala/org/apache/flink/table/validate/
FunctionCatalog.scala:150–253 (Table API names) and :274–419 (SQL operator
table); implementations are code-generated in flink-table/.../codegen/calls/
{BuiltInMethods,ScalarOperators,FunctionGenerator}.scala. Here every name
maps to a JVM-side Column expression — nothing goes through Python at row
level, so the whole catalog stays inside whole-stage codegen.

Names are UPPERCASE, matching the SQL operator table. Entries marked
`superset` in __doc__ comments exist in Spark but not the 1.4 reference —
kept because users of our engine get them for free.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(x) -> Column:
    return F.col(x) if isinstance(x, str) else (x if isinstance(x, Column) else F.lit(x))


# --- comparison / logic (FunctionCatalog.scala:281–313,340–352) -------------


def _between(x, lo, hi) -> Column:
    return _c(x).between(_c(lo), _c(hi))


def _not_between(x, lo, hi) -> Column:
    return ~_c(x).between(_c(lo), _c(hi))


def _is_distinct_from(a, b) -> Column:
    return ~_c(a).eqNullSafe(_c(b))


def _is_not_distinct_from(a, b) -> Column:
    return _c(a).eqNullSafe(_c(b))


def _similar_to(x, pattern) -> Column:
    # SQL SIMILAR TO is a full-match regex with SQL wildcards; Flink delegates
    # to java.util.regex after rewriting. We accept a java regex (documented
    # deviation: no %/_ rewriting) and anchor it.
    return _c(x).rlike(pattern)


# --- temporal (FunctionCatalog.scala:229–238, 373–381, 401) -----------------


def _extract(unit: str, ts) -> Column:
    unit = unit.upper()
    m = {
        "YEAR": F.year,
        "MONTH": F.month,
        "DAY": F.dayofmonth,
        "HOUR": F.hour,
        "MINUTE": F.minute,
        "SECOND": F.second,
        "QUARTER": F.quarter,
        "WEEK": F.weekofyear,
        "DOW": F.dayofweek,
        "DOY": F.dayofyear,
    }
    if unit not in m:
        raise ValueError(f"EXTRACT unit {unit!r} unsupported")
    return m[unit](_c(ts))


def _floor_time(ts, unit: str) -> Column:
    return F.date_trunc(unit.lower(), _c(ts))


def _ceil_time(ts, unit: str) -> Column:
    """CEIL(ts TO unit): next unit boundary unless already on one."""
    t = _c(ts)
    fl = F.date_trunc(unit.lower(), t)
    delta = {"hour": "1 hour", "day": "1 day", "minute": "1 minute", "month": None, "year": None}
    u = unit.lower()
    if u == "month":
        nxt = F.add_months(fl, 1)
    elif u == "year":
        nxt = F.add_months(fl, 12)
    else:
        nxt = fl + F.expr(f"INTERVAL {delta[u]}")
    return F.when(t == fl, fl).otherwise(nxt)


def _timestamp_add(unit: str, n, ts) -> Column:
    return F.timestamp_add(unit.upper(), _c(n), _c(ts))


def _temporal_overlaps(s1, e1, s2, e2) -> Column:
    """temporalOverlaps (BuiltInMethods TEMPORAL_OVERLAPS): [s1,e1) vs [s2,e2)."""
    return (_c(s1) <= _c(e2)) & (_c(s2) <= _c(e1))


# --- math helpers -----------------------------------------------------------


def _cot(x) -> Column:
    return F.lit(1.0) / F.tan(_c(x))


def _rand_integer(*args) -> Column:
    """RAND_INTEGER([seed,] bound) → uniform int in [0, bound)."""
    if len(args) == 1:
        return F.floor(F.rand() * _c(args[0])).cast("int")
    return F.floor(F.rand(args[0]) * _c(args[1])).cast("int")


def _log(*args) -> Column:
    # LOG(x) = ln(x); LOG(base, x)
    if len(args) == 1:
        return F.log(_c(args[0]))
    return F.log(float(args[0]) if isinstance(args[0], (int, float)) else args[0], _c(args[1]))


# --- catalog table ----------------------------------------------------------

FUNCTION_CATALOG: dict[str, Callable[..., Column]] = {
    # comparison / logic
    "AND": lambda a, b: _c(a) & _c(b),
    "OR": lambda a, b: _c(a) | _c(b),
    "NOT": lambda a: ~_c(a),
    "EQUALS": lambda a, b: _c(a) == _c(b),
    "NOT_EQUALS": lambda a, b: _c(a) != _c(b),
    "GREATER_THAN": lambda a, b: _c(a) > _c(b),
    "GREATER_THAN_OR_EQUAL": lambda a, b: _c(a) >= _c(b),
    "LESS_THAN": lambda a, b: _c(a) < _c(b),
    "LESS_THAN_OR_EQUAL": lambda a, b: _c(a) <= _c(b),
    "IS_NULL": lambda a: _c(a).isNull(),
    "IS_NOT_NULL": lambda a: _c(a).isNotNull(),
    "IS_TRUE": lambda a: _c(a).eqNullSafe(F.lit(True)),
    "IS_FALSE": lambda a: _c(a).eqNullSafe(F.lit(False)),
    "IS_NOT_TRUE": lambda a: ~_c(a).eqNullSafe(F.lit(True)),
    "IS_NOT_FALSE": lambda a: ~_c(a).eqNullSafe(F.lit(False)),
    "IS_DISTINCT_FROM": _is_distinct_from,
    "IS_NOT_DISTINCT_FROM": _is_not_distinct_from,
    "BETWEEN": _between,
    "NOT_BETWEEN": _not_between,
    "LIKE": lambda x, p: _c(x).like(p),
    "SIMILAR_TO": _similar_to,
    "IN": lambda x, *vals: _c(x).isin(*vals),
    "CASE": lambda cond, then, otherwise: F.when(_c(cond), _c(then)).otherwise(_c(otherwise)),
    "NULLIF": lambda a, b: F.nullif(_c(a), _c(b)),
    "COALESCE": lambda *xs: F.coalesce(*[_c(x) for x in xs]),
    # string (FunctionCatalog.scala:181–195, 353–361)
    "CHAR_LENGTH": lambda x: F.length(_c(x)),
    "CHARACTER_LENGTH": lambda x: F.length(_c(x)),
    "UPPER": lambda x: F.upper(_c(x)),
    "LOWER": lambda x: F.lower(_c(x)),
    "INITCAP": lambda x: F.initcap(_c(x)),
    "SUBSTRING": lambda x, pos, length=2147483647: F.substring(_c(x), pos, length),
    "OVERLAY": lambda x, replace, pos, length=None: (
        F.overlay(_c(x), _c(replace), pos, length if length is not None else -1)
    ),
    "TRIM": lambda x: F.trim(_c(x)),
    "LTRIM": lambda x: F.ltrim(_c(x)),
    "RTRIM": lambda x: F.rtrim(_c(x)),
    "POSITION": lambda needle, haystack: F.instr(_c(haystack), needle),
    "CONCAT": lambda *xs: F.concat(*[_c(x) for x in xs]),
    "CONCAT_WS": lambda sep, *xs: F.concat_ws(sep, *[_c(x) for x in xs]),
    # math (FunctionCatalog.scala:198–226, 362–398)
    "PLUS": lambda a, b: _c(a) + _c(b),
    "MINUS": lambda a, b: _c(a) - _c(b),
    "TIMES": lambda a, b: _c(a) * _c(b),
    "DIVIDE": lambda a, b: _c(a) / _c(b),
    "ABS": lambda x: F.abs(_c(x)),
    "CEIL": lambda x: F.ceil(_c(x)),
    "FLOOR": lambda x: F.floor(_c(x)),
    "EXP": lambda x: F.exp(_c(x)),
    "LN": lambda x: F.log(_c(x)),
    "LOG": _log,
    "LOG10": lambda x: F.log10(_c(x)),
    "POWER": lambda a, b: F.pow(_c(a), _c(b)),
    "MOD": lambda a, b: _c(a) % _c(b),
    "SQRT": lambda x: F.sqrt(_c(x)),
    "SIN": lambda x: F.sin(_c(x)),
    "COS": lambda x: F.cos(_c(x)),
    "TAN": lambda x: F.tan(_c(x)),
    "COT": _cot,
    "ASIN": lambda x: F.asin(_c(x)),
    "ACOS": lambda x: F.acos(_c(x)),
    "ATAN": lambda x: F.atan(_c(x)),
    "DEGREES": lambda x: F.degrees(_c(x)),
    "RADIANS": lambda x: F.radians(_c(x)),
    "SIGN": lambda x: F.signum(_c(x)),
    "ROUND": lambda x, d=0: F.round(_c(x), d),
    "PI": lambda: F.lit(3.141592653589793),
    "E": lambda: F.lit(2.718281828459045),
    "RAND": lambda seed=None: F.rand(seed) if seed is not None else F.rand(),
    "RAND_INTEGER": _rand_integer,
    # temporal
    "EXTRACT": _extract,
    "YEAR": lambda ts: F.year(_c(ts)),
    "QUARTER": lambda ts: F.quarter(_c(ts)),
    "MONTH": lambda ts: F.month(_c(ts)),
    "WEEK": lambda ts: F.weekofyear(_c(ts)),
    "DAYOFYEAR": lambda ts: F.dayofyear(_c(ts)),
    "DAYOFMONTH": lambda ts: F.dayofmonth(_c(ts)),
    "DAYOFWEEK": lambda ts: F.dayofweek(_c(ts)),
    "HOUR": lambda ts: F.hour(_c(ts)),
    "MINUTE": lambda ts: F.minute(_c(ts)),
    "SECOND": lambda ts: F.second(_c(ts)),
    "FLOOR_TO": _floor_time,
    "CEIL_TO": _ceil_time,
    "CURRENT_DATE": lambda: F.current_date(),
    "CURRENT_TIME": lambda: F.date_format(F.current_timestamp(), "HH:mm:ss"),
    "CURRENT_TIMESTAMP": lambda: F.current_timestamp(),
    "LOCALTIME": lambda: F.date_format(F.localtimestamp(), "HH:mm:ss"),
    "LOCALTIMESTAMP": lambda: F.localtimestamp(),
    "TIMESTAMP_ADD": _timestamp_add,
    "TEMPORAL_OVERLAPS": _temporal_overlaps,
    "DATE_FORMAT": lambda ts, fmt: F.date_format(_c(ts), fmt),
    # array / row / collection (FunctionCatalog.scala:241–247, 332–337)
    "ARRAY": lambda *xs: F.array(*[_c(x) for x in xs]),
    "CARDINALITY": lambda x: F.size(_c(x)),
    "ITEM": lambda arr, i: F.element_at(_c(arr), i),
    "AT": lambda arr, i: F.element_at(_c(arr), i),
    "ELEMENT": lambda arr: F.element_at(_c(arr), 1),
    "ROW": lambda *xs: F.struct(*[_c(x) for x in xs]),
    "MAP": lambda *kv: F.create_map(*[_c(x) for x in kv]),
    "CAST": lambda x, t: _c(x).cast(t),
    # grouped window auxiliaries (FunctionCatalog.scala:405–419) — the
    # window() expression carries start/end; these unpack it.
    "TUMBLE_START": lambda w: _c(w)["start"],
    "TUMBLE_END": lambda w: _c(w)["end"],
    "HOP_START": lambda w: _c(w)["start"],
    "HOP_END": lambda w: _c(w)["end"],
    "SESSION_START": lambda w: _c(w)["start"],
    "SESSION_END": lambda w: _c(w)["end"],
}

# aggregate functions (FunctionCatalog.scala:320–330); SUM0 in
# operators.aggregates.sum0
AGG_CATALOG: dict[str, Callable[..., Column]] = {
    "SUM": lambda x: F.sum(_c(x)),
    "SUM0": lambda x: F.coalesce(F.sum(_c(x)), F.lit(0)),
    "COUNT": lambda x: F.count(_c(x)),
    "COLLECT": lambda x: F.collect_list(_c(x)),
    "MIN": lambda x: F.min(_c(x)),
    "MAX": lambda x: F.max(_c(x)),
    "AVG": lambda x: F.avg(_c(x)),
    "STDDEV_POP": lambda x: F.stddev_pop(_c(x)),
    "STDDEV_SAMP": lambda x: F.stddev_samp(_c(x)),
    "VAR_POP": lambda x: F.var_pop(_c(x)),
    "VAR_SAMP": lambda x: F.var_samp(_c(x)),
}


def fn(name: str, *args) -> Column:
    """Invoke a catalog function by its reference name."""
    key = name.upper()
    if key in FUNCTION_CATALOG:
        return FUNCTION_CATALOG[key](*args)
    if key in AGG_CATALOG:
        return AGG_CATALOG[key](*args)
    raise KeyError(f"function {name!r} not in reference catalog; use pyspark.sql.functions directly")
