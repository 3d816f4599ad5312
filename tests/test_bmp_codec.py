"""BMP codec tests — lossless, so all checks are exact equality;
javax.imageio (via the Spark JVM) is the independent oracle."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from lime_etl_spark.operators.bmp_codec import decode_bmp, encode_bmp


def _noise(h: int, w: int, seed: int = 3) -> np.ndarray:
    return np.random.default_rng(seed).integers(0, 256, (h, w, 3), dtype=np.uint8)


def test_roundtrip_exact_with_row_padding():
    for w in (31, 32, 33, 34):  # exercise all 4-byte padding residues
        px = _noise(7, w, seed=w)
        W, H, ch, out = decode_bmp(encode_bmp(px))
        assert (W, H, ch) == (w, 7, 3)
        assert np.array_equal(out, px)


def test_grayscale_input_promoted_to_rgb():
    g = np.random.default_rng(1).integers(0, 256, (5, 9), dtype=np.uint8)
    _w, _h, _ch, out = decode_bmp(encode_bmp(g))
    assert np.array_equal(out, np.repeat(g[:, :, None], 3, axis=2))


def test_top_down_rows_decode():
    px = _noise(6, 8)
    raw = bytearray(encode_bmp(px[::-1]))  # encode flipped, then mark top-down
    struct.pack_into("<i", raw, 22, -6)
    _w, _h, _ch, out = decode_bmp(bytes(raw))
    assert np.array_equal(out, px[::-1][::-1])  # = px flipped then re-read
    # decoding the top-down file must equal the bottom-up original image
    assert np.array_equal(out, px)


def test_8bit_palette_bmp_decodes():
    # hand-built 8-bit palette BMP: 3 colors, 5x4, bottom-up
    pal = np.array([[250, 10, 30], [0, 200, 100], [5, 5, 255]], dtype=np.uint8)
    idx = np.array([[0, 1, 2, 1, 0], [2, 2, 0, 1, 1], [1, 0, 1, 2, 0], [0, 0, 2, 2, 1]], dtype=np.uint8)
    stride = (5 + 3) & ~3
    body = np.zeros((4, stride), np.uint8)
    body[:, :5] = idx[::-1]
    pal_bgra = np.zeros((3, 4), np.uint8)
    pal_bgra[:, :3] = pal[:, [2, 1, 0]]
    data_offset = 54 + 12
    raw = (
        b"BM"
        + struct.pack("<IHHI", data_offset + body.size, 0, 0, data_offset)
        + struct.pack("<IiiHHIIiiII", 40, 5, 4, 1, 8, 0, body.size, 0, 0, 3, 3)
        + pal_bgra.tobytes()
        + body.tobytes()
    )
    _w, _h, _ch, out = decode_bmp(raw)
    assert np.array_equal(out, pal[idx])


def test_compressed_and_exotic_depth_gates():
    raw = bytearray(encode_bmp(_noise(4, 4)))
    struct.pack_into("<I", raw, 30, 1)  # BI_RLE8
    with pytest.raises(NotImplementedError, match="compressed"):
        decode_bmp(bytes(raw))
    raw = bytearray(encode_bmp(_noise(4, 4)))
    struct.pack_into("<H", raw, 28, 16)
    with pytest.raises(NotImplementedError, match="16-bit"):
        decode_bmp(bytes(raw))


def test_not_a_bmp_raises():
    with pytest.raises(ValueError, match="not a BMP"):
        decode_bmp(b"GIF89a")


def test_imageio_cross_checks(spark):
    jvm = spark._jvm
    px = _noise(9, 13)
    mine = encode_bmp(px)
    img = jvm.javax.imageio.ImageIO.read(jvm.java.io.ByteArrayInputStream(bytearray(mine)))
    assert img is not None
    w, h = img.getWidth(), img.getHeight()
    a = np.array(img.getRGB(0, 0, w, h, None, 0, w), dtype=np.int64).reshape(h, w)
    ref = np.stack([(a >> 16) & 255, (a >> 8) & 255, a & 255], axis=2).astype(np.uint8)
    assert np.array_equal(ref, px)
    bos = jvm.java.io.ByteArrayOutputStream()
    assert jvm.javax.imageio.ImageIO.write(img, "bmp", bos)
    theirs = bytes(bos.toByteArray())
    _w, _h, _ch, out = decode_bmp(theirs)
    assert np.array_equal(out, px)
