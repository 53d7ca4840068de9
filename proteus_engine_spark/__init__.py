"""proteus_engine_spark — a PySpark-native analytics engine with the query
and data-processing capabilities of proteus-h2020/proteus-engine (an Apache
Flink 1.4 fork; see SURVEY.md).

Architecture: Spark-first. The reference's planner/codegen/shuffle/state
machinery is subsumed by Catalyst + Tungsten + Structured Streaming; this
package provides

- ``session``   — tuned SparkSession factory (AQE, UTC, Arrow).
- ``sources``   — batch/stream table registration over parquet/csv/json.
- ``operators`` — the relational operator surface of the reference
  (joins incl. hints/semi/anti, aggregations incl. grouping sets,
  set ops, sort/limit/offset, group windows, OVER windows).
- ``functions`` — the reference's scalar/aggregate function catalog
  (Flink FunctionCatalog names → pyspark.sql.functions expressions).
- ``plans``     — SQL-level rewrites (TUMBLE/HOP/SESSION → window()).
- ``streaming`` — watermarks, windowed aggs, stream-static side inputs,
  interval joins, stateful ops (count windows, process function, CEP).
- ``datapipe``  — LLM-training-data operators: dedup (exact/minhash/
  simhash/jaccard), similarity search, text analysis, multimodal columns.
- ``queries``   — the registry binding every implemented operator to a
  runnable query + DuckDB oracle (the correctness gate surface).
"""

from proteus_engine_spark.session import get_session

__all__ = ["get_session"]
__version__ = "0.1.0"
