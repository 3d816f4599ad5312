"""Pure-Python Avro source/sink (sources/avro_py.py): golden-bytes
spec conformance (NOT just round-trip — a symmetric encoder+decoder
bug cannot hide from hand-written bytes), file-level round-trips over
every supported type, and the Spark read_avro/write_avro fallback
end-to-end (the jar-gated path r2-r4 could only error-gate)."""

from __future__ import annotations

import datetime as dt
import io
import json
import math
import os

import pytest

from lime_etl_spark.sources.avro_py import (
    read_avro_records,
    read_long,
    write_avro_records,
    write_long,
)


def _enc(n: int) -> bytes:
    out = io.BytesIO()
    write_long(out, n)
    return out.getvalue()


def test_varint_zigzag_golden():
    """The Avro spec's own table of example encodings."""
    assert _enc(0) == b"\x00"
    assert _enc(-1) == b"\x01"
    assert _enc(1) == b"\x02"
    assert _enc(-2) == b"\x03"
    assert _enc(2) == b"\x04"
    assert _enc(-64) == b"\x7f"
    assert _enc(64) == b"\x80\x01"
    assert _enc(-8193) == b"\x81\x80\x01"
    # int64 extremes survive
    for n in (2**63 - 1, -(2**63), 12345678901234):
        v, pos = read_long(_enc(n), 0)
        assert v == n and pos == len(_enc(n))


def test_container_file_golden_bytes(tmp_path):
    """Decode a container file whose bytes are HAND-ASSEMBLED from the
    spec (magic, metadata map, sync, one block of two records) —
    independent of our writer."""
    schema = {
        "type": "record",
        "name": "r",
        "fields": [
            {"name": "a", "type": "long"},
            {"name": "b", "type": "string"},
        ],
    }
    sj = json.dumps(schema).encode()
    sync = b"0123456789abcdef"

    def vint(n: int) -> bytes:  # local zigzag varint, written from the spec
        u = (n << 1) ^ (n >> 63)
        out = b""
        while True:
            b, u = u & 0x7F, u >> 7
            out += bytes((b | 0x80,) if u else (b,))
            if not u:
                return out

    body = (
        vint(27) + vint(3) + b"foo"  # record (27, "foo")
        + vint(1) + vint(0)  # record (1, "")
    )
    blob = (
        b"Obj\x01"
        + vint(2)  # two metadata entries
        + vint(11) + b"avro.schema" + vint(len(sj)) + sj
        + vint(10) + b"avro.codec" + vint(4) + b"null"
        + vint(0)  # end of metadata map
        + sync
        + vint(2) + vint(len(body)) + body + sync  # one block
    )
    p = tmp_path / "golden.avro"
    p.write_bytes(blob)
    got_schema, records = read_avro_records(str(p))
    assert got_schema == schema
    assert list(records) == [(27, "foo"), (1, "")]


def test_file_roundtrip_all_types(tmp_path):
    """Every supported shape through write→read, both codecs."""
    schema = {
        "type": "record",
        "name": "r",
        "fields": [
            {"name": "i", "type": "int"},
            {"name": "l", "type": "long"},
            {"name": "f", "type": "float"},
            {"name": "d", "type": "double"},
            {"name": "s", "type": "string"},
            {"name": "by", "type": "bytes"},
            {"name": "bo", "type": "boolean"},
            {"name": "n", "type": ["null", "long"]},
            {"name": "ts", "type": {"type": "long", "logicalType": "timestamp-micros"}},
            {"name": "dt", "type": {"type": "int", "logicalType": "date"}},
            {"name": "ar", "type": {"type": "array", "items": "long"}},
            {"name": "mp", "type": {"type": "map", "values": "long"}},
            {"name": "en", "type": {"type": "enum", "name": "e", "symbols": ["A", "B"]}},
        ],
    }
    rows = [
        (
            -5, 2**62, 1.5, math.pi, "héllo ✓", b"\x00\xff", True, None,
            dt.datetime(2024, 3, 1, 12, 30, 45, 123456, tzinfo=dt.timezone.utc),
            dt.date(2024, 2, 29), [1, -2, 3], {"x": 7, "y": -8}, "B",
        ),
        (
            0, -1, -0.25, -1e300, "", b"", False, 42,
            dt.datetime(1969, 12, 31, 23, 59, 59, tzinfo=dt.timezone.utc),
            dt.date(1969, 1, 1), [], {}, "A",
        ),
    ]
    for codec in ("null", "deflate"):
        p = str(tmp_path / f"t_{codec}.avro")
        n = write_avro_records(p, schema, iter(rows), codec=codec)
        assert n == 2
        _, records = read_avro_records(p)
        got = list(records)
        assert got == rows


def test_multiblock_and_negative_block_counts(tmp_path):
    """block_rows smaller than the row count → multiple blocks, all
    decoded; and a large file stays byte-deterministic."""
    schema = {
        "type": "record",
        "name": "r",
        "fields": [{"name": "x", "type": "long"}],
    }
    rows = [(i * i - 500,) for i in range(10_000)]
    p1, p2 = str(tmp_path / "a.avro"), str(tmp_path / "b.avro")
    write_avro_records(p1, schema, iter(rows), block_rows=777)
    write_avro_records(p2, schema, iter(rows), block_rows=777)
    assert open(p1, "rb").read() == open(p2, "rb").read()  # deterministic
    _, records = read_avro_records(p1)
    assert list(records) == rows


def test_unsupported_shapes_raise():
    from lime_etl_spark.sources.avro_py import parse_schema

    with pytest.raises(NotImplementedError):
        parse_schema(["long", "string"])  # general union
    with pytest.raises(NotImplementedError):
        parse_schema({"type": "record", "name": "r",
                      "fields": [{"name": "x", "type": "SomeNamedRef"}]})


def test_spark_avro_end_to_end(spark, tmp_path):
    """read_avro/write_avro through Spark: distributed fallback sink
    (one container file per partition, no driver collect) and the
    avropy DataSource scan with one input partition per file."""
    from pyspark.sql import functions as F

    from lime_etl_spark.sources.readers import read_avro, write_avro

    df = (
        spark.range(0, 1000, 1, 4)
        .select(
            F.col("id").alias("n"),
            (F.col("id") * 2.5).alias("v"),
            F.concat(F.lit("row-"), F.col("id")).alias("s"),
            F.when(F.col("id") % 3 == 0, F.col("id")).alias("maybe"),
            F.timestamp_micros(F.col("id") * 1000000).alias("ts"),
        )
    )
    path = str(tmp_path / "avro_out")
    write_avro(df, path)
    parts = [f for f in os.listdir(path) if f.endswith(".avro")]
    assert len(parts) == 4  # one file per upstream partition

    back = read_avro(spark, path)
    assert back.rdd.getNumPartitions() == 4  # one scan partition per file
    assert sorted(back.columns) == sorted(df.columns)
    a = sorted(map(tuple, df.collect()))
    b = sorted(map(tuple, back.collect()))
    assert a == b

    # reader-side schema pinning: project a column subset BY NAME
    pinned = read_avro(
        spark,
        path,
        avro_schema=json.dumps(
            {
                "type": "record",
                "name": "row",
                "fields": [
                    {"name": "s", "type": "string"},
                    {"name": "n", "type": "long"},
                ],
            }
        ),
    )
    assert pinned.columns == ["s", "n"]
    assert pinned.count() == 1000
    assert pinned.where(pinned.s == "row-7").collect()[0].n == 7


def test_spark_avro_events_table_roundtrip(spark, sf_dir, tmp_path):
    """The engine's own events table through the avro lane: the
    archive-dump format users actually hit (Kafka dumps)."""
    from lime_etl_spark.sources.readers import load_table, read_avro, write_avro

    ev = load_table(spark, sf_dir, "events")
    path = str(tmp_path / "events_avro")
    write_avro(ev, path)
    back = read_avro(spark, path)
    assert back.count() == ev.count()
    assert sorted(back.columns) == sorted(ev.columns)
    x = sorted(map(tuple, ev.collect()))
    y = sorted(map(tuple, back.collect()))
    assert x == y


def test_read_avro_header_matches_full_parse(tmp_path):
    from lime_etl_spark.sources.avro_py import (
        read_avro_header,
        read_avro_records,
        write_avro_records,
    )

    schema = {
        "type": "record",
        "name": "r",
        "fields": [{"name": "a", "type": "long"}, {"name": "b", "type": "string"}],
    }
    p = str(tmp_path / "h.avro")
    write_avro_records(p, schema, [(i, f"s{i}") for i in range(5000)], codec="deflate")
    full_schema, _rows = read_avro_records(p)
    assert read_avro_header(p) == full_schema


def test_naive_datetimes_encode_as_local_time_not_utc(tmp_path):
    """Spark executors hand the writer naive OS-local datetimes; the
    encoder must interpret them as LOCAL (astimezone), not stamp them
    UTC — on a non-UTC host that would shift every instant."""
    import time

    from lime_etl_spark.sources.avro_py import read_avro_records, write_avro_records

    schema = {
        "type": "record",
        "name": "r",
        "fields": [
            {"name": "ts", "type": {"type": "long", "logicalType": "timestamp-micros"}}
        ],
    }
    old_tz = os.environ.get("TZ")
    os.environ["TZ"] = "America/New_York"
    time.tzset()
    try:
        naive_local = dt.datetime(2026, 1, 1, 0, 0, 0)  # EST = 05:00Z
        p = str(tmp_path / "tz.avro")
        write_avro_records(p, schema, [(naive_local,)], codec="null")
        _s, rows = read_avro_records(p)
        (got,) = list(rows)[0]
        assert got == dt.datetime(2026, 1, 1, 5, 0, 0, tzinfo=dt.timezone.utc)
    finally:
        if old_tz is None:
            os.environ.pop("TZ", None)
        else:
            os.environ["TZ"] = old_tz
        time.tzset()


def test_write_avro_append_and_ignore_modes(spark, tmp_path):
    from lime_etl_spark.sources.readers import read_avro, write_avro

    out = str(tmp_path / "modes")
    df1 = spark.range(3).selectExpr("id AS a")
    df2 = spark.range(3, 7).selectExpr("id AS a")
    write_avro(df1, out)
    write_avro(df2, out, mode="append")
    got = sorted(r["a"] for r in read_avro(spark, out).collect())
    assert got == [0, 1, 2, 3, 4, 5, 6]  # append unions, never clobbers
    write_avro(spark.range(100).selectExpr("id AS a"), out, mode="ignore")
    got = sorted(r["a"] for r in read_avro(spark, out).collect())
    assert got == [0, 1, 2, 3, 4, 5, 6]  # ignore leaves existing data
    with pytest.raises(FileExistsError):
        write_avro(df1, out, mode="error")
    # the JVM writer validates the mode string before save(); either
    # layer rejecting loudly is the contract
    with pytest.raises(Exception, match="bogus|unknown write mode"):
        write_avro(df1, out, mode="bogus")


def test_read_avro_listing_options(spark, tmp_path):
    from lime_etl_spark.sources.readers import read_avro, write_avro

    out = str(tmp_path / "opts")
    write_avro(spark.range(4).selectExpr("id AS a"), out)
    n_parts = len([f for f in os.listdir(out) if f.endswith(".avro")])
    assert n_parts >= 2
    one = sorted(f for f in os.listdir(out) if f.endswith(".avro"))[0]
    subset = read_avro(spark, out, options={"pathGlobFilter": one}).collect()
    assert 0 < len(subset) < 4  # the filter really restricted the listing
    with pytest.raises(NotImplementedError, match="not supported"):
        read_avro(spark, out, options={"mergeSchema": "true"})


def test_missing_module_sniff_is_specific():
    from lime_etl_spark.sources.readers import _is_missing_avro_module

    assert _is_missing_avro_module(
        Exception("Failed to find data source: avro. Avro is built-in ...")
    )
    # unrelated errors that merely mention avro must NOT reroute
    assert not _is_missing_avro_module(
        Exception("Unable to find field x in Avro schema of file find_events.avro")
    )
    assert not _is_missing_avro_module(Exception("corrupt block in part-0.avro"))


def test_listing_skips_marker_files(tmp_path, spark):
    from lime_etl_spark.sources.avro_py import _avro_files
    from lime_etl_spark.sources.readers import read_avro, write_avro

    out = str(tmp_path / "markers")
    write_avro(spark.range(3).selectExpr("id AS a"), out)
    open(os.path.join(out, "_SUCCESS"), "w").close()
    open(os.path.join(out, ".part-x.avro.crc"), "w").close()
    files = _avro_files(out, {"ignoreExtension": "true"})
    assert all(not os.path.basename(f).startswith(("_", ".")) for f in files)
    assert sorted(r["a"] for r in read_avro(spark, out).collect()) == [0, 1, 2]


def test_missing_module_sniff_accepts_both_phrasings():
    from lime_etl_spark.sources.readers import _is_missing_avro_module

    assert _is_missing_avro_module(
        Exception("[DATA_SOURCE_NOT_FOUND] Failed to find the data source: avro.")
    )


def test_ignore_mode_keys_off_path_existence(tmp_path, spark):
    from lime_etl_spark.sources.readers import write_avro

    out = tmp_path / "exists_no_avro"
    out.mkdir()
    (out / "other.dat").write_text("x")
    write_avro(spark.range(2).selectExpr("id AS a"), str(out), mode="ignore")
    assert not list(out.glob("*.avro"))  # JVM semantics: path exists -> skip
    # and mode strings are case-insensitive like SaveMode
    write_avro(spark.range(2).selectExpr("id AS a"), str(tmp_path / "ci"), mode="Overwrite")
    assert list((tmp_path / "ci").glob("*.avro"))
