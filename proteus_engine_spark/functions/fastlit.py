"""Single-round-trip constructors for wide literal/column arrays.

Every ``F.lit()`` / ``F.col()`` / ``F.array()`` call is at least one py4j
round trip (~0.5-1 ms of driver wall-clock each under local[] — measured
r17 optimization round, guide §7.3 driver-overhead class). A literal
array built element-wise therefore costs O(n) round trips: the 64-dim
SQ8 (lo, step) tables cost ~260 trips, the 64-permutation MinHash
aggregate list ~320. These helpers build the IDENTICAL Catalyst
expression through one ``F.expr`` parse:

- a double is rendered with ``repr`` (shortest round-trip decimal) inside
  ``CAST('…' AS DOUBLE)``, which constant-folds to the same
  ``Literal(double)`` at analysis time — verified optimizedPlan-equal
  (modulo exprIds) against the ``F.array(*[F.lit(x) …])`` form;
- strings are escaped for the default (non-legacy) string-literal parser;
- column names are emitted backquoted, so any name ``F.col`` accepts
  without dots works here too.

Scale note: this is pure DRIVER-side construction cost — it matters for
interactive/bench latency and for iterative drivers (one loop body per
iteration), never for executor throughput.
"""

from __future__ import annotations

import math
from typing import Iterable, Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F


def _dbl_sql(x: float) -> str:
    x = float(x)
    if math.isnan(x):
        return "CAST('NaN' AS DOUBLE)"
    if math.isinf(x):
        return f"CAST('{'-' if x < 0 else ''}Infinity' AS DOUBLE)"
    return f"CAST('{x!r}' AS DOUBLE)"


def _str_sql(s: str) -> str:
    return "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"


def double_array(values: Iterable[float]) -> Column:
    """``array<double>`` literal in one py4j round trip."""
    return F.expr(f"array({', '.join(_dbl_sql(x) for x in values)})")


def double_array_2d(rows: Iterable[Sequence[float]]) -> Column:
    """``array<array<double>>`` literal (e.g. a PQ codebook) in one trip."""
    inner = (f"array({', '.join(_dbl_sql(x) for x in row)})" for row in rows)
    return F.expr(f"array({', '.join(inner)})")


def string_array(values: Iterable[str]) -> Column:
    """``array<string>`` literal in one py4j round trip."""
    return F.expr(f"array({', '.join(_str_sql(s) for s in values)})")


def column_array(names: Iterable[str]) -> Column:
    """``array(col_a, col_b, …)`` over existing columns in one trip."""
    return F.expr(f"array({', '.join(f'`{n}`' for n in names)})")


def band_struct_array(hash_col: str, bands: int, width: int, mask: int) -> Column:
    """The banded-Hamming explode payload — ``array(struct(b, bv), …)``
    with ``bv = shiftright(hash, width*b) & mask`` — in one trip.
    Identical tree to the element-wise ``F.struct(F.lit(b), …)`` form."""
    items = ", ".join(
        f"struct({b} AS b, shiftright(`{hash_col}`, {width * b}) & {mask} AS bv)"
        for b in range(bands)
    )
    return F.expr(f"array({items})")
