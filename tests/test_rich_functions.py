"""Rich-function context parity: broadcast variables + accumulators inside
Arrow-batched UDFs (RichFunction/RuntimeContext, RuntimeContext.java:120,
183; withBroadcastSet)."""

from __future__ import annotations

from pyspark.sql import functions as F

from proteus_engine_spark.functions.rich import runtime_context


def test_broadcast_variable_in_map_in_pandas(spark):
    ctx = runtime_context(spark, broadcasts={"rates": {"EUR": 1.1, "GBP": 1.3}})

    df = spark.createDataFrame(
        [("EUR", 100.0), ("GBP", 200.0), ("EUR", 50.0)], "ccy string, amount double"
    )

    def convert(batches):
        rates = ctx.broadcast_variable("rates")
        for pdf in batches:
            pdf["usd"] = pdf["amount"] * pdf["ccy"].map(rates)
            yield pdf

    out = df.mapInPandas(convert, schema="ccy string, amount double, usd double")
    got = sorted(r["usd"] for r in out.collect())
    assert got == [
        __import__("pytest").approx(v) for v in (55.0, 110.0, 260.0)
    ]


def test_accumulator_counts_processed_rows(spark):
    ctx = runtime_context(spark, counters=["n_rows"])
    counter = ctx.counter("n_rows")

    df = spark.range(1000).repartition(8)

    def count_rows(batches):
        for pdf in batches:
            counter.add(len(pdf))
            yield pdf

    out = df.mapInPandas(count_rows, schema="id long")
    assert out.count() == 1000
    assert counter.value == 1000


def test_unknown_names_raise(spark):
    import pytest

    ctx = runtime_context(spark)
    with pytest.raises(KeyError):
        ctx.broadcast_variable("missing")
    with pytest.raises(KeyError):
        ctx.counter("missing")
