"""JDBC source/sink (SURVEY §2.1).

Reference: flink-connectors/flink-jdbc — JDBCInputFormat (driver/url/query
builder, fetchSize, and the ParameterValuesProvider split for parallel
reads: NumericBetweenParametersProvider shards a numeric range across
subtasks) and JDBCOutputFormat (driver/url/insert-query/batchInterval).

Spark-first mapping: `spark.read.jdbc` / `DataFrameWriter.jdbc` already
carry the whole surface — the reference's NumericBetweenParametersProvider
IS Spark's partitionColumn/lowerBound/upperBound/numPartitions quartet
(each partition issues one range-predicated query, so a 1000-executor
cluster fans the scan out server-side), fetchSize maps to fetchsize, and
JDBCOutputFormat.batchInterval maps to batchsize. These wrappers validate
the option coupling the reference enforces at build() time (partitioned
reads need the full quartet; dbtable XOR query) and keep the call sites
declarative so Catalyst can push filters into the JDBC scan
(PushedFilters show up in the plan for JDBC relations).

The environment ships an embedded Derby driver inside Spark's own jars,
so unlike Kafka this connector is end-to-end testable in-process: the
gate round-trips a real table through `jdbc:derby:` and aggregates the
read-back.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

DERBY_EMBEDDED_DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


def source_options(
    url: str,
    table: str | None = None,
    query: str | None = None,
    driver: str | None = None,
    user: str | None = None,
    password: str | None = None,
    fetch_size: int | None = None,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int | None = None,
) -> dict[str, str]:
    """JDBCInputFormat option translation (JDBCInputFormat.java builder):
    exactly one of table/query; the parallel-read quartet is all-or-none,
    mirroring the reference's requirement that a ParameterValuesProvider
    accompany a parameterized query."""
    if (table is None) == (query is None):
        raise ValueError("exactly one of table / query is required")
    quartet = (partition_column, lower_bound, upper_bound, num_partitions)
    if any(v is not None for v in quartet) and any(v is None for v in quartet):
        raise ValueError(
            "partitioned reads need ALL of partition_column/lower_bound/"
            "upper_bound/num_partitions (NumericBetweenParametersProvider parity)"
        )
    if partition_column is not None and query is not None:
        raise ValueError("partitioned reads require table, not query")
    opts: dict[str, str] = {"url": url}
    if table is not None:
        opts["dbtable"] = table
    else:
        opts["query"] = query  # type: ignore[assignment]
    if driver is not None:
        opts["driver"] = driver
    if user is not None:
        opts["user"] = user
    if password is not None:
        opts["password"] = password
    if fetch_size is not None:
        opts["fetchsize"] = str(fetch_size)
    if partition_column is not None:
        opts["partitionColumn"] = partition_column
        opts["lowerBound"] = str(lower_bound)
        opts["upperBound"] = str(upper_bound)
        opts["numPartitions"] = str(num_partitions)
    return opts


def sink_options(
    url: str,
    table: str,
    driver: str | None = None,
    user: str | None = None,
    password: str | None = None,
    batch_size: int | None = None,
    isolation_level: str | None = None,
    truncate: bool = False,
) -> dict[str, str]:
    """JDBCOutputFormat option translation: batchInterval → batchsize;
    truncate keeps the existing table's DDL on overwrite (the reference
    never drops the target table either)."""
    opts: dict[str, str] = {"url": url, "dbtable": table}
    if driver is not None:
        opts["driver"] = driver
    if user is not None:
        opts["user"] = user
    if password is not None:
        opts["password"] = password
    if batch_size is not None:
        opts["batchsize"] = str(batch_size)
    if isolation_level is not None:
        opts["isolationLevel"] = isolation_level
    if truncate:
        opts["truncate"] = "true"
    return opts


def read_jdbc(spark: SparkSession, **kwargs) -> DataFrame:
    """JDBCInputFormat parity: declarative JDBC scan. With the partition
    quartet, each Spark partition issues one range-predicated query —
    the scan parallelizes server-side instead of bottlenecking on a
    single connection; filters/projections push into the remote query."""
    reader = spark.read.format("jdbc")
    for k, v in source_options(**kwargs).items():
        reader = reader.option(k, v)
    return reader.load()


def write_jdbc(df: DataFrame, mode: str = "append", **kwargs) -> None:
    """JDBCOutputFormat parity: batched inserts, one connection per
    partition — writer parallelism is the DataFrame's partitioning, the
    reference's one-output-format-per-subtask layout."""
    writer = df.write.format("jdbc").mode(mode)
    for k, v in sink_options(**kwargs).items():
        writer = writer.option(k, v)
    writer.save()
