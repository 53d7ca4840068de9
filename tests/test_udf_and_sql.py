"""Tests for the UDF/UDTF/UDAF shims (§2.10) and the group-window SQL
rewrite (§4.1's one custom planner piece)."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from proteus_engine_spark.functions.udf import (
    AggregateFunction,
    ScalarFunction,
    TableFunction,
    lateral_join,
    register_function,
)
from proteus_engine_spark.plans import proteus_sql, rewrite_group_windows
from tests.conftest import SF_DIR


class HashCode(ScalarFunction):
    """The reference docs' canonical ScalarFunction example (hashCode)."""

    vectorized = True
    return_type = "int"

    def eval(self, s: pd.Series) -> pd.Series:
        return s.map(lambda x: sum(ord(c) for c in x) % 1000).astype("int32")


class SplitTF(TableFunction):
    output_schema = "word string, word_len int"

    def eval(self, text):
        for w in str(text).split(" "):
            yield (w, len(w))


class GeometricMean(AggregateFunction):
    return_type = "double"

    def create_accumulator(self):
        return (0.0, 0)

    def accumulate(self, acc, v):
        import math

        s, n = acc
        return (s + math.log(v), n + 1)

    def get_value(self, acc):
        import math

        s, n = acc
        return float(math.exp(s / n)) if n else None


def test_scalar_function_sql(spark):
    register_function(spark, "hash_code", HashCode())
    spark.createDataFrame([("abc",), ("xyz",)], "s string").createOrReplaceTempView("t_sf")
    got = {r["h"] for r in spark.sql("SELECT hash_code(s) AS h FROM t_sf").collect()}
    assert got == {(97 + 98 + 99) % 1000, (120 + 121 + 122) % 1000}


def test_table_function_lateral(spark):
    df = spark.createDataFrame([(1, "hello world"), (2, "a")], "id long, text string")
    out = lateral_join(df, SplitTF(), "text").collect()
    assert {(r["id"], r["word"], r["word_len"]) for r in out} == {
        (1, "hello", 5), (1, "world", 5), (2, "a", 1),
    }


def test_table_function_outer(spark):
    class Empty(TableFunction):
        output_schema = "x int"

        def eval(self, _):
            return []

    df = spark.createDataFrame([(1,)], "id long")
    assert lateral_join(df, Empty(), "id", outer=True).collect()[0]["x"] is None
    assert lateral_join(df, Empty(), "id", outer=False).count() == 0


def test_aggregate_function(spark):
    register_function(spark, "geo_mean", GeometricMean())
    df = spark.createDataFrame([(1, 2.0), (1, 8.0), (2, 3.0)], "k long, v double")
    df.createOrReplaceTempView("t_af")
    got = {r["k"]: r["g"] for r in spark.sql("SELECT k, geo_mean(v) AS g FROM t_af GROUP BY k").collect()}
    assert got[1] == pytest.approx(4.0)
    assert got[2] == pytest.approx(3.0)


def test_rewrite_tumble():
    sql = "SELECT TUMBLE_START(ts, INTERVAL '1' HOUR) AS ws, COUNT(*) FROM e GROUP BY TUMBLE(ts, INTERVAL '1' HOUR)"
    out = rewrite_group_windows(sql)
    assert "window(ts, '1 hour')" in out
    assert "window.start AS ws" in out
    assert "TUMBLE" not in out


def test_rewrite_hop_and_session():
    assert (
        rewrite_group_windows("HOP(ts, INTERVAL '5' MINUTE, INTERVAL '1' HOUR)")
        == "window(ts, '1 hour', '5 minutes')"
    )
    assert (
        rewrite_group_windows("SESSION(rowtime, INTERVAL '30' MINUTE)")
        == "session_window(rowtime, '30 minutes')"
    )
    assert rewrite_group_windows("SESSION_END(ts, INTERVAL '30' MINUTE)") == "session_window.end"


def test_proteus_sql_end_to_end(spark, duck):
    from proteus_engine_spark.sources import load_table
    from tests.conftest import assert_matches_oracle

    load_table(spark, SF_DIR, "events").createOrReplaceTempView("events_sql")
    df = proteus_sql(
        spark,
        """
        SELECT TUMBLE_START(ts, INTERVAL '1' HOUR) AS window_start,
               event_type, COUNT(*) AS n
        FROM events_sql
        GROUP BY TUMBLE(ts, INTERVAL '1' HOUR), event_type
        """,
    )
    assert_matches_oracle(
        df,
        duck,
        """
        SELECT time_bucket(INTERVAL 1 HOUR, ts) AS window_start, event_type, COUNT(*) AS n
        FROM events GROUP BY 1, 2
        """,
    )


class _DefaultUpper(ScalarFunction):
    """No ``vectorized`` attribute: must default to the Arrow path."""

    return_type = "string"

    def eval(self, s: pd.Series) -> pd.Series:
        return s.str.upper()


class _RowUpper(ScalarFunction):
    vectorized = False
    return_type = "string"

    def eval(self, s):
        return str(s).upper()


def test_scalar_function_defaults_to_arrow_plan(spark):
    """A default subclass produces a pandas_udf plan — ArrowEvalPython,
    never the row-at-a-time BatchEvalPython node."""
    df = spark.createDataFrame([("abc",), ("xyz",)], "s string")
    out = df.select(_DefaultUpper().to_udf()(F.col("s")).alias("u"))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" in plan
    assert sorted(r["u"] for r in out.collect()) == ["ABC", "XYZ"]


def test_scalar_function_row_path_warns(spark):
    df = spark.createDataFrame([("abc",),], "s string")
    with pytest.warns(UserWarning, match="row-at-a-time"):
        udf = _RowUpper().to_udf()
    assert df.select(udf(F.col("s")).alias("u")).collect()[0]["u"] == "ABC"
