"""Pure-Python Avro Object Container File codec + Spark DataSource.

The container ships core ``avro-1.12.1.jar`` but not the
``spark-avro`` datasource module, so ``format("avro")`` raises — the
r2–r4 rounds gated Avro behind that error. This module closes the gap
with a from-spec implementation of the PUBLIC Avro 1.11.x binary
encoding and object container format (https://avro.apache.org/docs/
— magic ``Obj\\x01``, JSON schema in the header metadata map,
zigzag-varint longs, little-endian IEEE floats, length-prefixed
bytes/strings, sync-marker-delimited blocks, ``null``/``deflate``
codecs — deflate is raw zlib, stdlib):

- :func:`read_avro_records` / :func:`write_avro_records` — file-level
  codec, usable standalone and unit-tested against hand-written
  golden bytes (NOT just round-trip, so an encoder+decoder symmetric
  bug cannot hide).
- :class:`AvroFileDataSource` — ``format("avropy")``: Spark 4 Python
  DataSource (the same extension lane as the synthevents source),
  one input partition per ``.avro`` part file so a directory scan
  parallelizes across executors. Avro blocks are sync-splittable in
  principle (seek + scan for the 16-byte marker, the classic Hadoop
  input-format trick); per-file is the honest unit here because the
  fallback writer produces one file per upstream partition anyway.
- :func:`write_avro_py` — distributed sink fallback: each executor
  partition writes its own container file via ``foreachPartition``
  (no driver collect).

Scope (documented, not silently partial): all primitives, records,
enums (as strings), fixed (as bytes), arrays, string-keyed maps, and
``["null", T]`` nullable unions; logical types ``timestamp-micros``,
``timestamp-millis`` and ``date``. General multi-branch unions and
recursive schemas raise ``NotImplementedError`` loudly.

Python-side decode is the true cost (row-oriented by spec); the gate
this closes is FORMAT availability, not scan throughput — a real
cluster would still prefer the JVM spark-avro module, which
``read_avro``/``write_avro`` try first.
"""

from __future__ import annotations

import glob
import io
import json
import os
import struct
import zlib
from datetime import date, datetime, timedelta, timezone
from typing import Any, Iterator

MAGIC = b"Obj\x01"
SYNC = bytes(range(16))  # deterministic sync marker for our writer
_EPOCH_DATE = date(1970, 1, 1)
_EPOCH_DT = datetime(1970, 1, 1, tzinfo=timezone.utc)


# --- binary primitives (Avro spec: zigzag varint longs) ----------------------


def zigzag_encode(n: int) -> int:
    return (n << 1) ^ (n >> 63) if n >= 0 else ((-n) << 1) - 1


def zigzag_decode(u: int) -> int:
    return (u >> 1) ^ -(u & 1)


def write_long(out: io.BytesIO, n: int) -> None:
    # zigzag: Python's arithmetic >> makes this exact for negatives too
    u = (n << 1) ^ (n >> 63)
    while True:
        b = u & 0x7F
        u >>= 7
        if u:
            out.write(bytes((b | 0x80,)))
        else:
            out.write(bytes((b,)))
            return


def read_long(buf: bytes, pos: int) -> tuple[int, int]:
    u, shift = 0, 0
    while True:
        b = buf[pos]
        pos += 1
        u |= (b & 0x7F) << shift
        if not b & 0x80:
            return zigzag_decode(u), pos
        shift += 7


def write_bytes(out: io.BytesIO, b: bytes) -> None:
    write_long(out, len(b))
    out.write(b)


def read_bytes(buf: bytes, pos: int) -> tuple[bytes, int]:
    n, pos = read_long(buf, pos)
    return buf[pos : pos + n], pos + n


# --- schema model -------------------------------------------------------------


class AvroType:
    """Decode/encode tree node for one avro schema element."""

    def __init__(self, kind: str, node: Any):
        self.kind = kind
        self.node = node
        self.logical = node.get("logicalType") if isinstance(node, dict) else None
        self.items: AvroType | None = None
        self.values: AvroType | None = None
        self.fields: list[tuple[str, AvroType]] = []
        self.symbols: list[str] = []
        self.size = 0
        self.nullable = False
        self.null_index = 0


_PRIMITIVES = {
    "null",
    "boolean",
    "int",
    "long",
    "float",
    "double",
    "bytes",
    "string",
}


def parse_schema(node: Any) -> AvroType:
    if isinstance(node, str):
        if node in _PRIMITIVES:
            return AvroType(node, {})
        raise NotImplementedError(f"named-type reference not supported: {node}")
    if isinstance(node, list):  # union
        if len(node) == 2 and "null" in node:
            other = node[0] if node[1] == "null" else node[1]
            t = parse_schema(other)
            t.nullable = True
            t.null_index = node.index("null")
            return t
        raise NotImplementedError(f"general unions not supported: {node}")
    kind = node["type"]
    if kind in _PRIMITIVES:
        return AvroType(kind, node)
    t = AvroType(kind, node)
    if kind == "record":
        t.fields = [(f["name"], parse_schema(f["type"])) for f in node["fields"]]
    elif kind == "array":
        t.items = parse_schema(node["items"])
    elif kind == "map":
        t.values = parse_schema(node["values"])
    elif kind == "enum":
        t.symbols = list(node["symbols"])
    elif kind == "fixed":
        t.size = int(node["size"])
    else:
        raise NotImplementedError(f"avro type not supported: {kind}")
    return t


# --- value decode/encode -------------------------------------------------------


def decode_value(t: AvroType, buf: bytes, pos: int) -> tuple[Any, int]:
    if t.nullable:
        idx, pos = read_long(buf, pos)
        if idx == t.null_index:
            return None, pos
    k = t.kind
    if k == "null":
        return None, pos
    if k == "boolean":
        return buf[pos] == 1, pos + 1
    if k in ("int", "long"):
        v, pos = read_long(buf, pos)
        if t.logical == "timestamp-micros":
            return _EPOCH_DT + timedelta(microseconds=v), pos
        if t.logical == "timestamp-millis":
            return _EPOCH_DT + timedelta(milliseconds=v), pos
        if t.logical == "date":
            return _EPOCH_DATE + timedelta(days=v), pos
        return v, pos
    if k == "float":
        return struct.unpack_from("<f", buf, pos)[0], pos + 4
    if k == "double":
        return struct.unpack_from("<d", buf, pos)[0], pos + 8
    if k == "bytes":
        return read_bytes(buf, pos)
    if k == "string":
        b, pos = read_bytes(buf, pos)
        return b.decode("utf-8"), pos
    if k == "fixed":
        return buf[pos : pos + t.size], pos + t.size
    if k == "enum":
        i, pos = read_long(buf, pos)
        return t.symbols[i], pos
    if k == "record":
        out = []
        for _, ft in t.fields:
            v, pos = decode_value(ft, buf, pos)
            out.append(v)
        return tuple(out), pos
    if k == "array":
        items = []
        while True:
            n, pos = read_long(buf, pos)
            if n == 0:
                return items, pos
            if n < 0:  # block with byte-size prefix (spec-allowed)
                _, pos = read_long(buf, pos)
                n = -n
            for _ in range(n):
                v, pos = decode_value(t.items, buf, pos)
                items.append(v)
    if k == "map":
        m: dict[str, Any] = {}
        while True:
            n, pos = read_long(buf, pos)
            if n == 0:
                return m, pos
            if n < 0:
                _, pos = read_long(buf, pos)
                n = -n
            for _ in range(n):
                kb, pos = read_bytes(buf, pos)
                v, pos = decode_value(t.values, buf, pos)
                m[kb.decode("utf-8")] = v
    raise NotImplementedError(k)


def encode_value(t: AvroType, v: Any, out: io.BytesIO) -> None:
    if t.nullable:
        if v is None:
            write_long(out, t.null_index)
            return
        write_long(out, 1 - t.null_index)
    k = t.kind
    if k == "null":
        return
    if k == "boolean":
        out.write(b"\x01" if v else b"\x00")
    elif k in ("int", "long"):
        if t.logical == "timestamp-micros":
            if v.tzinfo is None:
                # Spark hands executors naive datetimes in the OS-local
                # timezone (TimestampType.fromInternal); astimezone
                # interprets naive as local — replace(tzinfo=utc) would
                # shift the instant by the host UTC offset
                v = v.astimezone(timezone.utc)
            v = int((v - _EPOCH_DT) // timedelta(microseconds=1))
        elif t.logical == "timestamp-millis":
            if v.tzinfo is None:
                v = v.astimezone(timezone.utc)
            v = int((v - _EPOCH_DT) // timedelta(milliseconds=1))
        elif t.logical == "date":
            v = (v - _EPOCH_DATE).days
        write_long(out, int(v))
    elif k == "float":
        out.write(struct.pack("<f", v))
    elif k == "double":
        out.write(struct.pack("<d", v))
    elif k == "bytes":
        write_bytes(out, bytes(v))
    elif k == "fixed":
        out.write(bytes(v))
    elif k == "string":
        write_bytes(out, v.encode("utf-8"))
    elif k == "enum":
        write_long(out, t.symbols.index(v))
    elif k == "record":
        for (_, ft), fv in zip(t.fields, v):
            encode_value(ft, fv, out)
    elif k == "array":
        if v:
            write_long(out, len(v))
            for item in v:
                encode_value(t.items, item, out)
        write_long(out, 0)
    elif k == "map":
        if v:
            write_long(out, len(v))
            for mk, mv in v.items():
                write_bytes(out, mk.encode("utf-8"))
                encode_value(t.values, mv, out)
        write_long(out, 0)
    else:
        raise NotImplementedError(k)


# --- object container file ------------------------------------------------------


def _parse_header(buf: bytes, path: str) -> tuple[dict[str, bytes], bytes, int]:
    """(metadata, sync marker, header length) from container bytes.
    Raises IndexError when ``buf`` is a too-short prefix — callers
    reading incrementally catch that and fetch more."""
    if buf[:4] != MAGIC:
        raise ValueError(f"not an avro container file: {path}")
    pos = 4
    meta: dict[str, bytes] = {}
    while True:
        n, pos = read_long(buf, pos)
        if n == 0:
            break
        if n < 0:
            _, pos = read_long(buf, pos)
            n = -n
        for _ in range(n):
            kb, pos = read_bytes(buf, pos)
            vb, pos = read_bytes(buf, pos)
            meta[kb.decode("utf-8")] = vb
    sync = buf[pos : pos + 16]
    if len(sync) != 16:
        raise IndexError("header truncated before sync marker")
    return meta, sync, pos + 16


def read_avro_header(path: str) -> dict:
    """Writer schema_json from the container HEADER only — reads the
    file incrementally (64 KiB, doubling), never the whole file; the
    schema-inference path must not slurp a multi-GB part file."""
    size = 1 << 16
    with open(path, "rb") as fh:
        buf = b""
        while True:
            chunk = fh.read(size - len(buf))
            buf += chunk
            try:
                meta, _sync, _hlen = _parse_header(buf, path)
                return json.loads(meta["avro.schema"])
            except IndexError:
                if not chunk:  # real EOF: genuinely truncated
                    raise ValueError(f"truncated avro header in {path}") from None
                size *= 2


def read_avro_records(path: str) -> tuple[dict, Iterator[tuple]]:
    """(schema_json, record iterator) for one container file."""
    with open(path, "rb") as fh:
        buf = fh.read()
    meta, sync, pos = _parse_header(buf, path)
    schema_json = json.loads(meta["avro.schema"])
    codec = meta.get("avro.codec", b"null").decode("utf-8")
    if codec not in ("null", "deflate"):
        raise NotImplementedError(f"avro codec not supported: {codec}")
    t = parse_schema(schema_json)

    def records() -> Iterator[tuple]:
        p = pos
        while p < len(buf):
            count, p = read_long(buf, p)
            size, p = read_long(buf, p)
            block = buf[p : p + size]
            p += size
            if buf[p : p + 16] != sync:
                raise ValueError(f"sync marker mismatch in {path}")
            p += 16
            if codec == "deflate":
                block = zlib.decompress(block, -15)
            bp = 0
            for _ in range(count):
                v, bp = decode_value(t, block, bp)
                yield v

    return schema_json, records()


def write_avro_records(
    path: str,
    schema_json: dict,
    rows: Iterator[tuple],
    codec: str = "deflate",
    block_rows: int = 4096,
) -> int:
    """Write one container file; returns the record count."""
    t = parse_schema(schema_json)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    n_total = 0
    with open(path, "wb") as fh:
        fh.write(MAGIC)
        head = io.BytesIO()
        meta = {
            "avro.schema": json.dumps(schema_json).encode("utf-8"),
            "avro.codec": codec.encode("utf-8"),
        }
        write_long(head, len(meta))
        for k, v in meta.items():
            write_bytes(head, k.encode("utf-8"))
            write_bytes(head, v)
        write_long(head, 0)
        fh.write(head.getvalue())
        fh.write(SYNC)
        batch: list[tuple] = []

        def flush() -> None:
            nonlocal n_total
            if not batch:
                return
            body = io.BytesIO()
            for r in batch:
                encode_value(t, r, body)
            data = body.getvalue()
            if codec == "deflate":
                co = zlib.compressobj(6, zlib.DEFLATED, -15)
                data = co.compress(data) + co.flush()
            blk = io.BytesIO()
            write_long(blk, len(batch))
            write_long(blk, len(data))
            fh.write(blk.getvalue())
            fh.write(data)
            fh.write(SYNC)
            n_total += len(batch)
            batch.clear()

        for r in rows:
            batch.append(r)
            if len(batch) >= block_rows:
                flush()
        flush()
    return n_total


# --- avro <-> spark schema mapping ----------------------------------------------

_AVRO_TO_DDL = {
    "boolean": "boolean",
    "int": "int",
    "long": "bigint",
    "float": "float",
    "double": "double",
    "bytes": "binary",
    "string": "string",
    "fixed": "binary",
    "enum": "string",
}


def _avro_field_ddl(t: AvroType) -> str:
    if t.logical in ("timestamp-micros", "timestamp-millis"):
        return "timestamp"
    if t.logical == "date":
        return "date"
    if t.kind == "array":
        return f"array<{_avro_field_ddl(t.items)}>"
    if t.kind == "map":
        return f"map<string,{_avro_field_ddl(t.values)}>"
    if t.kind in _AVRO_TO_DDL:
        return _AVRO_TO_DDL[t.kind]
    raise NotImplementedError(t.kind)


def avro_schema_to_ddl(schema_json: dict) -> str:
    t = parse_schema(schema_json)
    if t.kind != "record":
        raise ValueError("top-level avro schema must be a record")
    return ", ".join(f"{name} {_avro_field_ddl(ft)}" for name, ft in t.fields)


def spark_schema_to_avro(schema, name: str = "row") -> dict:
    """StructType -> avro record schema (nullable fields as
    ["null", T] unions, Spark's own avro mapping)."""
    from pyspark.sql import types as T

    def conv(dt, nullable: bool):
        if isinstance(dt, T.BooleanType):
            a: Any = "boolean"
        elif isinstance(dt, T.IntegerType):
            a = "int"
        elif isinstance(dt, T.LongType):
            a = "long"
        elif isinstance(dt, T.FloatType):
            a = "float"
        elif isinstance(dt, T.DoubleType):
            a = "double"
        elif isinstance(dt, T.StringType):
            a = "string"
        elif isinstance(dt, T.BinaryType):
            a = "bytes"
        elif isinstance(dt, T.TimestampType):
            a = {"type": "long", "logicalType": "timestamp-micros"}
        elif isinstance(dt, T.DateType):
            a = {"type": "int", "logicalType": "date"}
        elif isinstance(dt, T.ArrayType):
            a = {"type": "array", "items": conv(dt.elementType, dt.containsNull)}
        elif isinstance(dt, T.MapType):
            if not isinstance(dt.keyType, T.StringType):
                raise NotImplementedError("avro maps are string-keyed")
            a = {"type": "map", "values": conv(dt.valueType, dt.valueContainsNull)}
        else:
            raise NotImplementedError(f"no avro mapping for {dt}")
        return ["null", a] if nullable else a

    return {
        "type": "record",
        "name": name,
        "fields": [
            {"name": f.name, "type": conv(f.dataType, f.nullable)}
            for f in schema.fields
        ],
    }


# --- Spark DataSource ------------------------------------------------------------


def _avro_files(path: str, options: dict | None = None) -> list[str]:
    """File listing honoring the JVM reader's listing options:
    pathGlobFilter (fnmatch on the basename), recursiveFileLookup,
    ignoreExtension (accept files without .avro)."""
    # Spark's Python DataSource lowercases option keys — normalize so
    # callers can use the JVM reader's camelCase spellings
    options = {str(k).lower(): v for k, v in (options or {}).items()}
    if os.path.isfile(path):
        return [path]
    recursive = str(options.get("recursivefilelookup", "false")).lower() == "true"
    no_ext = str(options.get("ignoreextension", "false")).lower() == "true"
    pattern = options.get("pathglobfilter") or ("*" if no_ext else "*.avro")
    if recursive:
        files = sorted(
            glob.glob(os.path.join(path, "**", pattern), recursive=True)
        )
    else:
        files = sorted(glob.glob(os.path.join(path, pattern)))
    # the JVM file index always drops marker/hidden files (_SUCCESS,
    # .crc, ...) regardless of the glob — match that
    files = [
        f
        for f in files
        if os.path.isfile(f) and not os.path.basename(f)[:1] in ("_", ".")
    ]
    if not files:
        raise FileNotFoundError(f"no matching avro files under {path}")
    return files


def _register_avropy(spark) -> None:
    """Idempotent registration of the avropy format."""
    spark.dataSource.register(AvroFileDataSource)


try:  # the DataSource API needs a pyspark runtime; keep the codec importable without it
    from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

    class _AvroPartition(InputPartition):
        def __init__(self, path: str):
            self.path = path

    class AvroFileDataSource(DataSource):
        """``format("avropy")`` — pure-Python Avro container reader.
        Options: ``path`` (file or directory of ``*.avro``)."""

        @classmethod
        def name(cls) -> str:
            return "avropy"

        def schema(self) -> str:
            # header-only schema inference: never slurps the data blocks
            first = _avro_files(self.options["path"], self.options)[0]
            return avro_schema_to_ddl(read_avro_header(first))

        def reader(self, schema) -> "AvroFileReader":
            return AvroFileReader(self.options, [f.name for f in schema.fields])

    class AvroFileReader(DataSourceReader):
        def __init__(self, options: dict, field_names: list[str]):
            self.path = options["path"]
            self.options = dict(options)
            self.field_names = field_names

        def partitions(self) -> list[_AvroPartition]:
            # one partition per part file: the fallback writer emits a
            # file per upstream partition, so a round-trip preserves
            # parallelism; sync-marker block splitting is the upgrade
            # path for single giant files.
            return [_AvroPartition(p) for p in _avro_files(self.path, self.options)]

        def read(self, partition: _AvroPartition) -> Iterator[tuple]:
            schema_json, records = read_avro_records(partition.path)
            writer_names = [f["name"] for f in schema_json["fields"]]
            if writer_names == self.field_names:
                yield from records
                return
            # user-pinned schema: project by NAME against the writer
            # schema (the avroSchema-evolution contract), never by
            # position
            idx = {n: i for i, n in enumerate(writer_names)}
            missing = [n for n in self.field_names if n not in idx]
            if missing:
                raise ValueError(
                    f"fields {missing} not in writer schema {writer_names}"
                )
            sel = [idx[n] for n in self.field_names]
            for r in records:
                yield tuple(r[i] for i in sel)

except ImportError:  # pragma: no cover - pyspark always present in this repo
    AvroFileDataSource = None  # type: ignore[assignment]


def write_avro_py(df, path: str, codec: str = "deflate", part_offset: int = 0) -> None:
    """Distributed fallback sink: each partition writes its own
    container file (no driver collect). ``snappy`` maps to
    ``deflate`` — the spec's required codec that stdlib zlib provides;
    python-snappy is not in the container. ``part_offset`` shifts the
    part numbering so append-mode writes never collide with a prior
    write's files."""
    if codec in ("snappy", "zstandard", "bzip2", "xz"):
        codec = "deflate"
    schema_json = spark_schema_to_avro(df.schema)
    os.makedirs(path, exist_ok=True)

    def write_part(rows: Iterator) -> None:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId() + part_offset
        it = iter(rows)
        try:
            first = next(it)
        except StopIteration:
            return  # empty partition: no file (parquet does the same)
        import itertools

        write_avro_records(
            os.path.join(path, f"part-{pid:05d}.avro"),
            schema_json,
            (tuple(r) for r in itertools.chain([first], it)),
            codec=codec,
        )

    df.foreachPartition(write_part)
