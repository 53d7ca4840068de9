"""Type system mapping (SURVEY §1.3): the reference's TypeInformation
lattice → Spark DataTypes.

Reference: BasicTypeInfo (/root/reference/flink-core/src/main/java/org/
apache/flink/api/common/typeinfo/BasicTypeInfo.java), SqlTimeTypeInfo
(typeinfo/SqlTimeTypeInfo.java), Table API Types
(flink-libraries/flink-table/src/main/scala/org/apache/flink/table/api/
Types.scala:41–119), tuple/case-class/POJO/Row composites
(flink-core/.../typeutils/), arrays (PrimitiveArrayTypeInfo,
BasicArrayTypeInfo), GenericTypeInfo (Kryo fallback).

Everything in this engine is a Spark SQL type — there is no Kryo-style
generic fallback by design (generic blobs defeat columnar execution and
pushdown; at 100 TB that is the difference between scanning bytes and
scanning values). CHAR maps to STRING, TIME has no Spark type and maps to
STRING ("HH:mm:ss"), MULTISET(e) maps to MAP(e, INT) — all documented
deviations.
"""

from __future__ import annotations

from pyspark.sql import types as T

# BasicTypeInfo / Types.scala name → Spark DataType
TYPE_MAP: dict[str, T.DataType] = {
    "STRING": T.StringType(),
    "BOOLEAN": T.BooleanType(),
    "BYTE": T.ByteType(),
    "SHORT": T.ShortType(),
    "INT": T.IntegerType(),
    "LONG": T.LongType(),
    "FLOAT": T.FloatType(),
    "DOUBLE": T.DoubleType(),
    "CHAR": T.StringType(),  # no CharType in Spark runtime — documented
    "DATE": T.DateType(),
    "VOID": T.NullType(),
    "BIG_INT": T.DecimalType(38, 0),
    "BIG_DEC": T.DecimalType(38, 18),
    "DECIMAL": T.DecimalType(38, 18),
    # SqlTimeTypeInfo
    "SQL_DATE": T.DateType(),
    "SQL_TIME": T.StringType(),  # no TimeType — "HH:mm:ss" strings, documented
    "SQL_TIMESTAMP": T.TimestampType(),
    # intervals (Types.scala:46–47)
    "INTERVAL_MONTHS": T.YearMonthIntervalType(),
    "INTERVAL_MILLIS": T.DayTimeIntervalType(),
}


def to_spark_type(name: str) -> T.DataType:
    key = name.upper()
    if key not in TYPE_MAP:
        raise KeyError(f"no mapping for reference type {name!r}")
    return TYPE_MAP[key]


def row_type(fields: list[tuple[str, str]]) -> T.StructType:
    """RowTypeInfo / ROW(...) (Types.scala:59,71) → StructType."""
    return T.StructType([T.StructField(n, to_spark_type(t), True) for n, t in fields])


def array_type(element: str) -> T.ArrayType:
    """PRIMITIVE_ARRAY / OBJECT_ARRAY / BasicArrayTypeInfo → ArrayType."""
    return T.ArrayType(to_spark_type(element))


def map_type(key: str, value: str) -> T.MapType:
    """MAP(k,v) (Types.scala:110) → MapType."""
    return T.MapType(to_spark_type(key), to_spark_type(value))


def multiset_type(element: str) -> T.MapType:
    """MULTISET(e) (Types.scala:119) → MAP(e, INT) — element → multiplicity
    (Spark has no multiset; COLLECT aggregates to collect_list)."""
    return T.MapType(to_spark_type(element), T.IntegerType())
