"""Pure-Python Avro Object Container File source/sink — the Avro format
surface (reference: flink-formats/flink-avro AvroOutputFormat.java:87 /
AvroInputFormat.java:68) WITHOUT the spark-avro jar this container
lacks: the binary encoding is ~200 lines of the Avro 1.11 spec
(zigzag varints, length-prefixed strings/bytes, container magic +
metadata map + sync-marker-delimited blocks, null/deflate codecs)
implemented with stdlib struct/zlib/json only, and Spark distributes
it — the writer runs one encoder per input partition (mapInPandas over
the partition's Arrow batches, each emitting one container file), the
reader is ``binaryFile`` + a mapInPandas decoder (one task per file),
so both directions scale with partition/file count exactly like the
jar-backed data source would.

Supported schema subset (the gate's tables need no more; unsupported
types raise loudly): records of boolean | int | long | float | double |
string | bytes fields, each optionally nullable via a ["null", T]
union. Codecs: "null" and "deflate" (raw DEFLATE, the spec's codec).

Spec interop is PROVEN, not just self-round-tripped (r14): the codec is
byte-level cross-validated against the reference Apache Avro Java
implementation (avro-1.12.1.jar, bundled in Spark's JVM) in BOTH
directions and both codecs — our containers parse in Java's
DataFileReader value-for-value (long extremes, NaN-free float edges,
unicode, nulls, empty bytes), Java DataFileWriter output parses here,
and Spark-written per-partition files parse in Java. See
tests/test_avro_interop.py.

Scale notes: files land on the filesystem visible to the executors —
local[? ] here; on a real cluster the same per-partition writer targets
a shared filesystem/object-store mount, the standard Spark file-sink
layout (one part file per task, no driver funnel). Readers get
whole-file parallelism; a single giant container file would serialize
on one task (binaryFile does not split), which matches how Avro is
produced by partition-parallel writers — many medium files.
"""

from __future__ import annotations

import io
import json
import struct
import zlib
from hashlib import md5

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

_MAGIC = b"Obj\x01"
_SPARK_TO_AVRO = {
    T.BooleanType(): "boolean",
    T.IntegerType(): "int",
    T.LongType(): "long",
    T.FloatType(): "float",
    T.DoubleType(): "double",
    T.StringType(): "string",
    T.BinaryType(): "bytes",
}
_AVRO_TO_SPARK = {v: k for k, v in _SPARK_TO_AVRO.items()}


# ---------------------------------------------------------------- encoding


def _write_long(out: io.BytesIO, n: int) -> None:
    """Zigzag + little-endian base-128 varint (Avro spec 'long')."""
    z = (n << 1) ^ (n >> 63)
    while True:
        b = z & 0x7F
        z >>= 7
        if z:
            out.write(bytes([b | 0x80]))
        else:
            out.write(bytes([b]))
            return


def _write_value(out: io.BytesIO, v, typ: str, nullable: bool) -> None:
    if nullable:
        if v is None:
            _write_long(out, 0)  # union branch 0 = null
            return
        _write_long(out, 1)
    elif v is None:
        raise ValueError(f"None in non-nullable {typ} field")
    if typ == "long" or typ == "int":
        _write_long(out, int(v))
    elif typ == "double":
        out.write(struct.pack("<d", float(v)))
    elif typ == "float":
        out.write(struct.pack("<f", float(v)))
    elif typ == "string":
        b = str(v).encode("utf-8")
        _write_long(out, len(b))
        out.write(b)
    elif typ == "bytes":
        b = bytes(v)
        _write_long(out, len(b))
        out.write(b)
    elif typ == "boolean":
        out.write(b"\x01" if v else b"\x00")
    else:
        raise ValueError(f"unsupported Avro type {typ!r}")


def _schema_json(name: str, fields: list[tuple[str, str, bool]]) -> str:
    return json.dumps(
        {
            "type": "record",
            "name": name,
            "fields": [
                {"name": n, "type": (["null", t] if nl else t)}
                for n, t, nl in fields
            ],
        }
    )


def encode_container(
    rows,
    fields: list[tuple[str, str, bool]],
    sync: bytes,
    codec: str = "null",
    record_name: str = "row",
    block_rows: int = 50_000,
) -> bytes:
    """Encode an iterable of tuples (field order) as one Avro Object
    Container File. ``fields`` is [(name, avro_type, nullable)]."""
    if codec not in ("null", "deflate"):
        raise ValueError(f"unsupported codec {codec!r}")
    if len(sync) != 16:
        raise ValueError("sync marker must be 16 bytes")
    out = io.BytesIO()
    out.write(_MAGIC)
    meta = {
        "avro.schema": _schema_json(record_name, fields).encode(),
        "avro.codec": codec.encode(),
    }
    _write_long(out, len(meta))
    for k, v in sorted(meta.items()):
        kb = k.encode()
        _write_long(out, len(kb))
        out.write(kb)
        _write_long(out, len(v))
        out.write(v)
    _write_long(out, 0)  # map terminator
    out.write(sync)

    buf = io.BytesIO()
    n_in_block = 0

    def _flush() -> None:
        nonlocal buf, n_in_block
        if not n_in_block:
            return
        payload = buf.getvalue()
        if codec == "deflate":
            # raw DEFLATE (no zlib header/checksum), per the spec
            c = zlib.compressobj(wbits=-15)
            payload = c.compress(payload) + c.flush()
        _write_long(out, n_in_block)
        _write_long(out, len(payload))
        out.write(payload)
        out.write(sync)
        buf, n_in_block = io.BytesIO(), 0

    for row in rows:
        for v, (_, t, nl) in zip(row, fields):
            _write_value(buf, v, t, nl)
        n_in_block += 1
        if n_in_block >= block_rows:
            _flush()
    _flush()
    return out.getvalue()


# ---------------------------------------------------------------- decoding


class _Reader:
    def __init__(self, data: bytes):
        self.d = data
        self.p = 0

    def long(self) -> int:
        shift = z = 0
        while True:
            b = self.d[self.p]
            self.p += 1
            z |= (b & 0x7F) << shift
            if not b & 0x80:
                break
            shift += 7
        return (z >> 1) ^ -(z & 1)

    def raw(self, n: int) -> bytes:
        b = self.d[self.p : self.p + n]
        if len(b) != n:
            raise ValueError("truncated Avro data")
        self.p += n
        return b

    def value(self, typ: str, nullable: bool):
        if nullable:
            if self.long() == 0:
                return None
        if typ in ("long", "int"):
            return self.long()
        if typ == "double":
            return struct.unpack("<d", self.raw(8))[0]
        if typ == "float":
            return struct.unpack("<f", self.raw(4))[0]
        if typ == "string":
            return self.raw(self.long()).decode("utf-8")
        if typ == "bytes":
            return self.raw(self.long())
        if typ == "boolean":
            return self.raw(1) == b"\x01"
        raise ValueError(f"unsupported Avro type {typ!r}")


def _parse_schema(js: str) -> list[tuple[str, str, bool]]:
    s = json.loads(js)
    if s.get("type") != "record":
        raise ValueError(f"unsupported top-level Avro schema {s.get('type')!r}")
    fields = []
    for f in s["fields"]:
        t = f["type"]
        if isinstance(t, list):
            if len(t) != 2 or "null" not in t:
                raise ValueError(f"unsupported union {t!r}")
            typ = t[0] if t[1] == "null" else t[1]
            fields.append((f["name"], typ, True))
        else:
            fields.append((f["name"], t, False))
    return fields


def decode_container(data: bytes):
    """Decode one container file -> (fields, list of tuples)."""
    r = _Reader(data)
    if r.raw(4) != _MAGIC:
        raise ValueError("not an Avro object container file (bad magic)")
    meta = {}
    while True:
        n = r.long()
        if n == 0:
            break
        if n < 0:  # spec: negative count is followed by a byte size
            n = -n
            r.long()
        for _ in range(n):
            k = r.raw(r.long()).decode()
            meta[k] = r.raw(r.long())
    codec = meta.get("avro.codec", b"null").decode()
    if codec not in ("null", "deflate"):
        raise ValueError(f"unsupported codec {codec!r}")
    fields = _parse_schema(meta["avro.schema"].decode())
    sync = r.raw(16)
    rows = []
    while r.p < len(r.d):
        count = r.long()
        size = r.long()
        payload = r.raw(size)
        if codec == "deflate":
            payload = zlib.decompress(payload, wbits=-15)
        br = _Reader(payload)
        for _ in range(count):
            rows.append(tuple(br.value(t, nl) for _, t, nl in fields))
        if r.raw(16) != sync:
            raise ValueError("sync marker mismatch (corrupt block boundary)")
    return fields, rows


# ---------------------------------------------------------- Spark surface


def _fields_of(schema: T.StructType) -> list[tuple[str, str, bool]]:
    fields = []
    for f in schema.fields:
        avro = _SPARK_TO_AVRO.get(f.dataType)
        if avro is None:
            raise ValueError(
                f"field {f.name!r}: Spark type {f.dataType.simpleString()} has "
                "no mapping in this Avro codec (supported: boolean, int, long, "
                "float, double, string, binary)"
            )
        fields.append((f.name, avro, f.nullable))
    return fields


def write_avro(
    df: DataFrame,
    path: str,
    codec: str = "null",
    mode: str = "overwrite",
    block_rows: int = 50_000,
) -> int:
    """Write ``df`` as one Avro container file per partition under
    ``path`` (part-{partition}.avro — the standard file-sink layout).
    Runs as a mapInPandas pass: each task streams its Arrow batches
    through the encoder and writes exactly one file; empty partitions
    write nothing. Returns the total row count written. The sync marker
    is md5(schema ‖ partition id) — deterministic across reruns."""
    import os
    import shutil

    if mode == "overwrite" and os.path.isdir(path):
        shutil.rmtree(path)
    elif mode == "error" and os.path.isdir(path):
        raise ValueError(f"path exists: {path}")
    os.makedirs(path, exist_ok=True)
    fields = _fields_of(df.schema)
    sj = _schema_json("row", fields)

    def _write(batches):
        import pandas as pd
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        rows = []
        for pdf in batches:
            # None-preserving row tuples (numpy NaN must not leak into
            # long/string fields: object-cast first)
            rows.extend(pdf.astype(object).where(pd.notna(pdf), None).itertuples(index=False, name=None))
        if rows:
            sync = md5(f"{sj}|{pid}".encode()).digest()
            blob = encode_container(rows, fields, sync, codec=codec, block_rows=block_rows)
            with open(f"{path}/part-{pid:05d}.avro", "wb") as fh:
                fh.write(blob)
        yield pd.DataFrame({"n_rows": [len(rows)]})

    manifest = df.mapInPandas(_write, "n_rows long").collect()
    return sum(r.n_rows for r in manifest)


def _infer_schema(path: str) -> T.StructType:
    """Derive the Spark schema from the FIRST container file's embedded
    writer schema (header-only read — the metadata map precedes any data
    block, so this never scans rows). One driver-side file open, same as
    every schema-inferring Spark source's footer/header peek."""
    import glob

    files = sorted(glob.glob(f"{path}/*.avro"))
    if not files:
        raise ValueError(f"no .avro files under {path}")
    with open(files[0], "rb") as fh:
        head = fh.read(1 << 20)  # metadata map is a few hundred bytes
    r = _Reader(head)
    if r.raw(4) != _MAGIC:
        raise ValueError(f"{files[0]}: not an Avro object container file")
    meta = {}
    while True:
        n = r.long()
        if n == 0:
            break
        if n < 0:
            n = -n
            r.long()
        for _ in range(n):
            k = r.raw(r.long()).decode()
            meta[k] = r.raw(r.long())
    fields = _parse_schema(meta["avro.schema"].decode())
    return T.StructType(
        [T.StructField(n, _AVRO_TO_SPARK[t], nl) for n, t, nl in fields]
    )


def read_avro(spark: SparkSession, path: str, schema=None) -> DataFrame:
    """Read a directory of Avro container files written by ``write_avro``
    (or any producer within the supported subset). ``schema`` is the
    expected Spark schema (DDL string or StructType) — mapInPandas needs
    a static output schema; the embedded writer schema of every file is
    validated against it (field names + types; nullability is the
    writer's to declare — decoding always follows the FILE's unions) so
    a silently mismatched file fails loudly instead of mis-decoding.
    With ``schema=None`` the schema is inferred from the first file's
    embedded writer schema (header-only driver read)."""
    if schema is None:
        schema = _infer_schema(path)
    if isinstance(schema, str):
        schema = T._parse_datatype_string(schema)
    want = _fields_of(schema)
    names = [n for n, _, _ in want]

    binary = spark.read.format("binaryFile").load(f"{path}/*.avro")

    def _decode(batches):
        import pandas as pd

        for pdf in batches:
            for blob in pdf["content"]:
                got, rows = decode_container(bytes(blob))
                if [(n, t) for n, t, _ in got] != [(n, t) for n, t, _ in want]:
                    raise ValueError(
                        f"Avro file schema {got} does not match expected {want}"
                    )
                yield pd.DataFrame(rows, columns=names, dtype=object)

    return binary.select("content").mapInPandas(_decode, schema)
