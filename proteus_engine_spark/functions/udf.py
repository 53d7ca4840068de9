"""UDF / UDTF / UDAF surface (SURVEY §2.10).

Reference: ScalarFunction (/root/reference/flink-libraries/flink-table/src/
main/scala/org/apache/flink/table/functions/ScalarFunction.scala:47),
TableFunction (TableFunction.scala:82, consumed via lateral join in
DataSetCorrelate.scala:42), AggregateFunction
(AggregateFunction.scala:97,103,115 — createAccumulator/accumulate/merge/
getValue contracts), registration via TableEnvironment.registerFunction
(TableEnvironment.scala:325).

Spark-first mapping with the performance ladder made explicit:
- ScalarFunction  → arrow-vectorized pandas_udf when the eval is
  vectorizable, else a row udf (both registered for SQL use). The reference
  code-generates the call site; Spark inlines the UDF call the same way,
  but the Python crossing is the cost — hence pandas/Arrow default.
- TableFunction   → Python UDTF (lateral-join capable) or explode of an
  array-returning scalar — both produce a Generate node like the
  reference's correlate.
- AggregateFunction → pandas_udf GROUPED_AGG: Spark handles partial
  aggregation/merge placement; `retract` has no equivalent because state
  rollback is the engine's job (SURVEY §2.10 note).
"""

from __future__ import annotations

from collections.abc import Callable

import numpy as np
import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql import functions as F


class ScalarFunction:
    """ScalarFunction.scala:47 parity: subclass with an ``eval`` method.

    ``vectorized`` defaults to True: ``eval`` receives/returns pandas
    Series (Arrow path — ~10-100× the row path), so a default subclass
    lands on the fast plan (no BatchEvalPython node). Set
    ``vectorized = False`` only for genuinely non-vectorizable per-row
    logic — that opt-out warns, since a row-at-a-time Python UDF in a
    hot path is the classic 100 TB scale-killer."""

    vectorized = True
    return_type = "string"

    def eval(self, *args):  # pragma: no cover - contract
        raise NotImplementedError

    @staticmethod
    def _is_batch_return(out) -> bool:
        """True for any sized sequence the Arrow worker itself accepts —
        the worker only requires __len__ (it length-checks the batch), so
        pd.Series, pd.DataFrame, 1-d np.ndarray, list and tuple all
        serialize. str/bytes are excluded even though they have __len__
        (a scalar string return is exactly the silent-broadcast bug the
        contract exists to catch), and so are 0-d/2-d ndarrays (a 0-d
        array is a disguised scalar — np.asarray(x.sum()) — and len()
        on it raises; better the contract error here than a bare
        'Data must be 1-dimensional' deep in the worker)."""
        if isinstance(out, np.ndarray):
            return out.ndim == 1
        if isinstance(out, (pd.Series, pd.DataFrame, list, tuple)):
            return True
        return False

    def _probe_vectorized(self) -> None:
        """vectorized=True means eval receives pandas Series — a scalar
        eval ported from the reference (``str(x).upper()``, ``x + 1`` on
        assumed scalars) would silently broadcast or return a non-batch
        value and produce WRONG values, not an error. Probe eval with
        empty Series at to_udf() time: a scalar return is a hard error
        pointing at the fix. Any sized sequence the worker serializes
        (Series/DataFrame/ndarray/list/tuple) is accepted. A probe that
        itself raises is inconclusive (the eval may need real dtypes) —
        the runtime wrapper still enforces the contract with the same
        message. NOTE: the probe runs eval once with empty input at
        plan-construction time — evals should tolerate an empty batch
        (they can see one at runtime anyway) and keep side effects out
        of eval."""
        import inspect

        try:
            sig = inspect.signature(self.eval)
            n_args = len(
                [
                    p
                    for p in sig.parameters.values()
                    if p.kind
                    in (p.POSITIONAL_ONLY, p.POSITIONAL_OR_KEYWORD)
                ]
            )
        except (TypeError, ValueError):
            return
        try:
            out = self.eval(*(pd.Series([], dtype=object) for _ in range(n_args)))
        except Exception:
            return  # inconclusive — runtime wrapper still checks
        if not self._is_batch_return(out):
            raise TypeError(
                f"{type(self).__name__}.eval returned "
                f"{type(out).__name__}, not a batch (pandas Series/"
                "DataFrame, ndarray, list): vectorized defaults to True "
                "(eval receives Series and must return one value per "
                "input row on the Arrow path). Rewrite eval over Series, "
                "or set vectorized = False for row-at-a-time semantics"
            )

    def to_udf(self):
        if self.vectorized:
            self._probe_vectorized()
            eval_fn = self.eval
            cls_name = type(self).__name__

            is_batch = self._is_batch_return

            def vector_eval(*series: pd.Series) -> pd.Series:
                out = eval_fn(*series)
                if not is_batch(out):
                    raise TypeError(
                        f"{cls_name}.eval returned {type(out).__name__}, "
                        "not a batch (Series/DataFrame/ndarray/list) — "
                        "vectorized=True evals receive Series and must "
                        "return one value per input row; set "
                        "vectorized = False for row-at-a-time semantics"
                    )
                if isinstance(out, (pd.Series, pd.DataFrame)):
                    return out
                return pd.Series(out)

            return F.pandas_udf(vector_eval, returnType=self.return_type)
        import warnings

        warnings.warn(
            f"{type(self).__name__}: vectorized=False selects the "
            "row-at-a-time Python UDF path (~10-100x slower than the "
            "Arrow path); write eval over pandas Series if possible",
            stacklevel=2,
        )
        return F.udf(self.eval, returnType=self.return_type)


class TableFunction:
    """TableFunction.scala:82 parity: ``eval(*args)`` yields output rows
    (tuples). Consumed via ``lateral_join`` below — the
    join(udtf(...)) / LATERAL TABLE equivalent."""

    output_schema = "out string"

    def eval(self, *args):  # pragma: no cover - contract
        raise NotImplementedError


class AggregateFunction:
    """AggregateFunction.scala contracts: create_accumulator/accumulate/
    get_value; ``merge`` is implicit (Spark splits the aggregation into
    partial+final itself, so only the full-group reduction is needed)."""

    return_type = "double"

    def create_accumulator(self):  # pragma: no cover - contract
        raise NotImplementedError

    def accumulate(self, acc, *args):  # pragma: no cover - contract
        raise NotImplementedError

    def get_value(self, acc):  # pragma: no cover - contract
        raise NotImplementedError

    def to_udaf(self):
        def agg(*cols: pd.Series) -> float:
            acc = self.create_accumulator()
            for vals in zip(*cols):
                acc = self.accumulate(acc, *vals)
            return self.get_value(acc)

        return F.pandas_udf(agg, returnType=self.return_type)


def register_function(spark: SparkSession, name: str, f) -> None:
    """TableEnvironment.registerFunction parity (TableEnvironment.scala:325):
    makes the function callable from SQL."""
    if isinstance(f, ScalarFunction):
        spark.udf.register(name, f.to_udf())
    elif isinstance(f, AggregateFunction):
        spark.udf.register(name, f.to_udaf())
    elif callable(f):
        spark.udf.register(name, f)
    else:
        raise TypeError(f"cannot register {type(f)}")


def lateral_join(df, tf: TableFunction, *arg_cols: str, outer: bool = False):
    """join(udtf(...)) / LATERAL TABLE parity (DataSetCorrelate.scala:42).

    Implemented as mapInPandas fan-out: each input row yields 0..n output
    rows appended to the input columns — the Generate/correlate plan shape.
    ``outer=True`` keeps rows with no output (leftOuterJoinLateral), padding
    with NULLs."""
    from pyspark.sql.types import _parse_datatype_string

    in_schema = df.schema
    out_fields = tf.output_schema
    full_schema = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in in_schema)
    full_schema = f"{full_schema}, {out_fields}"
    # Parse the output DDL properly — splitting on "," miscounts for types
    # that contain commas (decimal(10,2), map<string,int>, struct<...>).
    out_struct = _parse_datatype_string(out_fields)
    out_names = [f.name for f in out_struct.fields]
    n_out_cols = len(out_names)

    def fan_out(batches):
        import numpy as np

        for pdf in batches:
            # Per-row UDTF eval is inherent (user Python yields rows), but
            # the fan-out itself is columnar: replicate input rows with one
            # positional take instead of building tuples per row.
            counts = np.zeros(len(pdf), dtype=np.int64)
            out_cols: list[list] = [[] for _ in range(n_out_cols)]
            # Zero-arg table functions still eval once per input row (the
            # reference's correlate does the same for constant UDTF calls).
            args = (
                zip(*(pdf[c].tolist() for c in arg_cols))
                if arg_cols
                else (() for _ in range(len(pdf)))
            )
            for i, vals in enumerate(args):
                emitted = list(tf.eval(*vals))
                if not emitted and outer:
                    emitted = [(None,) * n_out_cols]
                counts[i] = len(emitted)
                for out_row in emitted:
                    for j in range(n_out_cols):
                        out_cols[j].append(out_row[j])
            rep = pdf.iloc[np.repeat(np.arange(len(pdf)), counts)].reset_index(drop=True)
            for j, name in enumerate(out_names):
                rep[name] = pd.Series(out_cols[j], dtype=object)
            yield rep

    return df.mapInPandas(fan_out, schema=full_schema)
