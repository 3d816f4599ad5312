"""PNG codec (operators/png_codec.py): externally-produced golden
fixture, forward-filter independence (the test implements the spec's
FORWARD filters, the codec implements the INVERSE — not symmetric
copies), palette expansion, CRC enforcement, loud gates, and the
multimodal integration (decode_media / features / ahash / resize
parity between PPM and PNG payloads of the SAME pixels)."""

from __future__ import annotations

import base64
import struct
import zlib
from binascii import crc32

import numpy as np
import pytest
from pyspark.sql import functions as F

from lime_etl_spark.operators import multimodal as mm
from lime_etl_spark.operators.png_codec import PNG_MAGIC, decode_png, encode_png

# 1x1 RGBA PNG produced by a real encoder (ubiquitous web fixture)
_KNOWN_1PX = (
    "iVBORw0KGgoAAAANSUhEUgAAAAEAAAABCAYAAAAfFcSJAAAADUlEQVR42mNk+M9QDwAD"
    "hgGAWjR9awAAAABJRU5ErkJggg=="
)


def _chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", crc32(ctype + data) & 0xFFFFFFFF)
    )


def _forward_filter(px: np.ndarray, ftypes: list[int]) -> bytes:
    """Spec section 9 FORWARD filters, implemented independently of the
    codec's inverse path."""
    h, w, ch = px.shape
    flat = px.reshape(h, w * ch).astype(np.int32)
    out = bytearray()
    prev = np.zeros(w * ch, dtype=np.int32)
    for y in range(h):
        ft = ftypes[y % len(ftypes)]
        row = flat[y]
        enc = row.copy()
        for i in range(w * ch):
            a = int(row[i - ch]) if i >= ch else 0
            b = int(prev[i])
            c = int(prev[i - ch]) if i >= ch else 0
            if ft == 1:
                enc[i] = (row[i] - a) & 0xFF
            elif ft == 2:
                enc[i] = (row[i] - b) & 0xFF
            elif ft == 3:
                enc[i] = (row[i] - ((a + b) >> 1)) & 0xFF
            elif ft == 4:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                enc[i] = (row[i] - pred) & 0xFF
        out += bytes((ft,)) + enc.astype(np.uint8).tobytes()
        prev = row
    return bytes(out)


def _assemble(w: int, h: int, colortype: int, body: bytes, plte: bytes = b"") -> bytes:
    ihdr = struct.pack(">IIBBBBB", w, h, 8, colortype, 0, 0, 0)
    blob = PNG_MAGIC + _chunk(b"IHDR", ihdr)
    if plte:
        blob += _chunk(b"PLTE", plte)
    return blob + _chunk(b"IDAT", zlib.compress(body)) + _chunk(b"IEND", b"")


def test_known_external_png_decodes():
    raw = base64.b64decode(_KNOWN_1PX)
    w, h, ch, px = decode_png(raw)
    assert (w, h, ch) == (1, 1, 4)
    assert px.shape == (1, 1, 4)


def test_crc_corruption_fails_loudly():
    raw = bytearray(base64.b64decode(_KNOWN_1PX))
    raw[-20] ^= 0xFF  # flip a byte inside a chunk body
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(raw))


def test_all_five_filters_invert_exactly():
    """Pixels filtered FORWARD in the test (independent spec
    implementation, one filter type per row covering 0..4) must come
    back exactly through the codec's inverse path."""
    rng = np.arange(7 * 5 * 3, dtype=np.uint8).reshape(5, 7, 3) * 37 % 251
    body = _forward_filter(rng, ftypes=[0, 1, 2, 3, 4])
    blob = _assemble(7, 5, colortype=2, body=body)
    w, h, ch, px = decode_png(blob)
    assert (w, h, ch) == (7, 5, 3)
    assert (px == rng).all()


def test_palette_expansion():
    pal = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255])  # R, G, B entries
    idx = np.array([[0, 1], [2, 0]], dtype=np.uint8)
    body = b"".join(b"\x00" + idx[y].tobytes() for y in range(2))
    blob = _assemble(2, 2, colortype=3, body=body, plte=pal)
    w, h, ch, px = decode_png(blob)
    assert (w, h, ch) == (2, 2, 3)
    assert px[0, 0].tolist() == [255, 0, 0]
    assert px[0, 1].tolist() == [0, 255, 0]
    assert px[1, 0].tolist() == [0, 0, 255]


def test_unsupported_gates_are_loud():
    ihdr16 = struct.pack(">IIBBBBB", 1, 1, 16, 2, 0, 0, 0)
    blob = PNG_MAGIC + _chunk(b"IHDR", ihdr16) + _chunk(b"IEND", b"")
    with pytest.raises(NotImplementedError, match="8-bit"):
        decode_png(blob)
    ihdr_i = struct.pack(">IIBBBBB", 1, 1, 8, 2, 0, 0, 1)
    blob = PNG_MAGIC + _chunk(b"IHDR", ihdr_i) + _chunk(b"IEND", b"")
    with pytest.raises(NotImplementedError, match="interlace"):
        decode_png(blob)


def test_roundtrip_all_channel_counts():
    for ch in (1, 2, 3, 4):
        arr = (np.arange(6 * 4 * ch, dtype=np.uint8).reshape(4, 6, ch) * 31) % 253
        w, h, got_ch, px = decode_png(encode_png(arr))
        assert (w, h, got_ch) == (6, 4, ch)
        assert (px == arr).all()


def _png_media_df(spark, n=12):
    rows = []
    for i in range(n):
        w0, h0 = 16 + (i % 3) * 8, 16 + (i % 2) * 8
        px = np.frombuffer(
            mm._payload(10_000 + i, w0 * h0 * 3), dtype=np.uint8
        ).reshape(h0, w0, 3)
        rows.append((10_000 + i, bytearray(encode_png(px)), w0, h0))
    return spark.createDataFrame(
        rows, "media_id long, content binary, w int, h int"
    )


def test_decode_media_handles_png(spark):
    df = _png_media_df(spark)
    decoded = {r["media_id"]: r for r in mm.decode_media(df).collect()}
    src = {r["media_id"]: r for r in df.collect()}
    assert len(decoded) == len(src)
    for mid, r in decoded.items():
        assert r["media_type"] == "image"
        assert (r["width"], r["height"]) == (src[mid]["w"], src[mid]["h"])


def test_png_and_ppm_same_pixels_same_features_and_ahash(spark):
    """Cross-container invariant: identical pixels through PPM and PNG
    must yield IDENTICAL feature vectors and a-hashes — the decode
    layer, not the container, defines the content."""
    px = np.frombuffer(mm._payload(777, 32 * 24 * 3), dtype=np.uint8).reshape(
        24, 32, 3
    )
    ppm = b"P6\n32 24\n255\n" + px.tobytes()
    png = encode_png(px)
    df = spark.createDataFrame(
        [(1, bytearray(ppm)), (2, bytearray(png))],
        "media_id long, content binary",
    )
    feats = {r["media_id"]: r["features"] for r in mm.extract_features(df, dim=8).collect()}
    assert feats[1] == feats[2]
    hashes = {r["media_id"]: r["ahash"] for r in mm.media_ahash(df).collect()}
    assert hashes[1] == hashes[2]


def test_resize_keeps_png_container(spark):
    df = _png_media_df(spark, n=4).select(
        "media_id",
        F.lit("image").alias("media_type"),
        "content",
        F.struct(
            F.col("w").alias("width"),
            F.col("h").alias("height"),
            F.lit(3).alias("channels"),
            F.lit(None).cast("int").alias("sample_rate"),
            F.lit(None).cast("int").alias("duration_ms"),
            F.lit("png").alias("codec"),
        ).alias("meta"),
    )
    out = mm.resize_images(df, 8, 8).collect()
    assert len(out) == 4
    for r in out:
        raw = bytes(r["content"])
        assert raw[:8] == PNG_MAGIC  # PNG stays PNG
        w, h, ch, _px = decode_png(raw)
        assert (w, h, ch) == (8, 8, 3)
        assert r["meta"]["width"] == 8 and r["meta"]["height"] == 8


def test_png_dims_header_only_and_crc_gate():
    from lime_etl_spark.operators.png_codec import png_dims

    px = np.arange(5 * 7 * 3, dtype=np.uint8).reshape(5, 7, 3)
    raw = encode_png(px)
    assert png_dims(raw) == (7, 5)
    corrupted = bytearray(raw)
    corrupted[18] ^= 0xFF  # inside IHDR data -> CRC must catch it
    with pytest.raises(ValueError, match="CRC"):
        png_dims(bytes(corrupted))
