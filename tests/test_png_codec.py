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


def _raw_png(samples: np.ndarray, bitdepth: int, colortype: int, pal=None) -> bytes:
    """Hand-build a filter-0 PNG at any depth (test-side independent
    of encode_png, which only does 8-bit)."""
    import zlib

    h, w, ch = samples.shape
    body = bytearray()
    for y in range(h):
        body.append(0)
        if bitdepth == 16:
            body += samples[y].astype(">u2").tobytes()
        elif bitdepth == 8:
            body += samples[y].astype(np.uint8).tobytes()
        else:  # pack MSB-first sub-byte samples
            bits = np.unpackbits(samples[y].reshape(-1, 1).astype(np.uint8), axis=1)[
                :, 8 - bitdepth :
            ].reshape(-1)
            body += np.packbits(bits).tobytes()
    out = PNG_MAGIC + _chunk(
        b"IHDR", struct.pack(">IIBBBBB", w, h, bitdepth, colortype, 0, 0, 0)
    )
    if pal is not None:
        out += _chunk(b"PLTE", pal.astype(np.uint8).tobytes())
    return out + _chunk(b"IDAT", zlib.compress(bytes(body))) + _chunk(b"IEND", b"")


def test_16bit_decodes_via_high_byte():
    rng = np.random.default_rng(5)
    s = rng.integers(0, 65536, (5, 7, 3), dtype=np.uint16).astype(np.int64)
    w, h, ch, px = decode_png(_raw_png(s, 16, 2))
    assert (w, h, ch) == (7, 5, 3)
    assert (px == (s >> 8).astype(np.uint8)).all()
    g = rng.integers(0, 65536, (4, 6, 1), dtype=np.uint16).astype(np.int64)
    assert (decode_png(_raw_png(g, 16, 0))[3] == (g >> 8).astype(np.uint8)).all()


def test_sub_byte_gray_scales_exactly():
    rng = np.random.default_rng(6)
    for d in (1, 2, 4):
        levels = (1 << d) - 1
        s = rng.integers(0, levels + 1, (6, 11, 1)).astype(np.int64)
        w, h, ch, px = decode_png(_raw_png(s, d, 0))
        assert (w, h, ch) == (11, 6, 1)
        assert (px == (s * (255 // levels)).astype(np.uint8)).all()


def test_sub_byte_palette_expands():
    rng = np.random.default_rng(7)
    pal = rng.integers(0, 256, (16, 3), dtype=np.uint8)
    idx = rng.integers(0, 16, (9, 5, 1)).astype(np.int64)
    w, h, ch, px = decode_png(_raw_png(idx, 4, 3, pal))
    assert (w, h, ch) == (5, 9, 3)
    assert (px == pal[idx[:, :, 0]]).all()


def test_illegal_depth_and_interlace_fail_loudly():
    ihdr = struct.pack(">IIBBBBB", 1, 1, 16, 3, 0, 0, 0)  # 16-bit palette: illegal
    blob = PNG_MAGIC + _chunk(b"IHDR", ihdr) + _chunk(b"IEND", b"")
    with pytest.raises(ValueError, match="illegal PNG bit depth"):
        decode_png(blob)
    ihdr = struct.pack(">IIBBBBB", 1, 1, 8, 2, 0, 0, 7)  # unknown interlace
    blob = PNG_MAGIC + _chunk(b"IHDR", ihdr) + _chunk(b"IEND", b"")
    with pytest.raises(ValueError, match="interlace"):
        decode_png(blob)


def test_adam7_interlaced_decodes_exactly(spark):
    """Adam7 (gated until r6): the JVM PNG writer in progressive mode
    emits a REAL interlaced stream; it must decode bit-exactly."""
    rng = np.random.default_rng(8)
    px = rng.integers(0, 256, (21, 13, 3), dtype=np.uint8)
    jvm = spark._jvm
    img = jvm.javax.imageio.ImageIO.read(
        jvm.java.io.ByteArrayInputStream(bytearray(encode_png(px)))
    )
    writer = jvm.javax.imageio.ImageIO.getImageWritersByFormatName("png").next()
    param = writer.getDefaultWriteParam()
    param.setProgressiveMode(jvm.javax.imageio.ImageWriteParam.MODE_DEFAULT)
    bos = jvm.java.io.ByteArrayOutputStream()
    ios = jvm.javax.imageio.ImageIO.createImageOutputStream(bos)
    writer.setOutput(ios)
    writer.write(None, jvm.javax.imageio.IIOImage(img, None, None), param)
    ios.flush()
    writer.dispose()
    theirs = bytes(bos.toByteArray())
    assert theirs[28] == 1, "JVM writer did not emit an Adam7 stream"
    w, h, ch, got = decode_png(theirs)
    assert (w, h, ch) == (13, 21, 3)
    assert (got == px).all()


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
