"""Unit tests for the §2.8 function catalog: every entry must build a Column
and evaluate on a one-row frame (golden checks for the tricky ones)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from proteus_engine_spark.functions import FUNCTION_CATALOG, fn
from proteus_engine_spark.functions.catalog import AGG_CATALOG


def test_catalog_covers_reference_names():
    # The names the reference registers (FunctionCatalog.scala) that must
    # exist in our catalog — spot list per SURVEY §2.8.
    required = [
        "AND", "OR", "NOT", "EQUALS", "NOT_EQUALS", "IS_NULL", "IS_NOT_NULL",
        "IS_DISTINCT_FROM", "BETWEEN", "LIKE", "SIMILAR_TO", "IN", "CASE",
        "NULLIF", "COALESCE", "CHAR_LENGTH", "UPPER", "LOWER", "INITCAP",
        "SUBSTRING", "OVERLAY", "TRIM", "POSITION", "CONCAT", "CONCAT_WS",
        "ABS", "CEIL", "FLOOR", "EXP", "LN", "LOG", "LOG10", "POWER", "MOD",
        "SQRT", "SIN", "COS", "TAN", "COT", "ASIN", "ACOS", "ATAN", "DEGREES",
        "RADIANS", "SIGN", "ROUND", "PI", "E", "RAND", "RAND_INTEGER",
        "EXTRACT", "QUARTER", "CURRENT_DATE", "CURRENT_TIMESTAMP",
        "LOCALTIMESTAMP", "TIMESTAMP_ADD", "TEMPORAL_OVERLAPS", "DATE_FORMAT",
        "ARRAY", "CARDINALITY", "ITEM", "ELEMENT", "ROW", "CAST",
        "TUMBLE_START", "TUMBLE_END", "HOP_START", "HOP_END",
        "SESSION_START", "SESSION_END",
    ]
    missing = [n for n in required if n not in FUNCTION_CATALOG]
    assert not missing, f"missing catalog entries: {missing}"
    for agg in ["SUM", "SUM0", "COUNT", "COLLECT", "MIN", "MAX", "AVG",
                "STDDEV_POP", "STDDEV_SAMP", "VAR_POP", "VAR_SAMP"]:
        assert agg in AGG_CATALOG


@pytest.fixture(scope="module")
def row(spark):
    return spark.createDataFrame(
        [(5, -3.7, "Hello World", None)], "i int, d double, s string, nul string"
    )


def _val(row_df, col):
    return row_df.select(col.alias("v")).collect()[0]["v"]


def test_goldens(row):
    assert _val(row, fn("SUM0", "nul")) == 0  # SUM over all-null → 0, not NULL
    assert _val(row, fn("COT", F.lit(1.0))) == pytest.approx(1 / math.tan(1.0))
    assert _val(row, fn("CHAR_LENGTH", "s")) == 11
    assert _val(row, fn("POSITION", "World", "s")) == 7  # 1-based, SQL POSITION
    assert _val(row, fn("IS_DISTINCT_FROM", "nul", F.lit("x"))) is True
    assert _val(row, fn("IS_NOT_DISTINCT_FROM", "nul", F.lit(None))) is True
    assert _val(row, fn("NULLIF", "i", F.lit(5))) is None
    assert _val(row, fn("CARDINALITY", fn("ARRAY", F.lit(1), F.lit(2)))) == 2
    assert _val(row, fn("ITEM", fn("ARRAY", F.lit(10), F.lit(20)), 2)) == 20
    assert _val(row, fn("ELEMENT", fn("ARRAY", F.lit(42)))) == 42
    assert _val(row, fn("MOD", "i", F.lit(3))) == 2
    assert _val(row, fn("SIGN", "d")) == -1.0
    assert _val(row, fn("SUBSTRING", "s", 7)) == "World"
    assert _val(row, fn("SUBSTRING", "s", 1, 5)) == "Hello"
    assert _val(row, fn("INITCAP", F.lit("hello world"))) == "Hello World"
    assert _val(row, fn("OVERLAY", "s", F.lit("Spark"), 7, 5)) == "Hello Spark"
    assert 0 <= _val(row, fn("RAND_INTEGER", 42, 10)) < 10


def test_rand_integer_bound(row):
    vals = {_val(row, fn("RAND_INTEGER", seed, 5)) for seed in range(20)}
    assert vals <= set(range(5))


def test_temporal_overlaps(row):
    t = lambda s: F.lit(s).cast("timestamp")
    assert _val(row, fn("TEMPORAL_OVERLAPS", t("2024-01-01"), t("2024-01-10"),
                        t("2024-01-05"), t("2024-01-20"))) is True
    assert _val(row, fn("TEMPORAL_OVERLAPS", t("2024-01-01"), t("2024-01-02"),
                        t("2024-01-05"), t("2024-01-06"))) is False


def test_unknown_function_raises():
    with pytest.raises(KeyError):
        fn("NO_SUCH_FUNCTION", "x")
