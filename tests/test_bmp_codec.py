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


def test_unsupported_compression_gate():
    raw = bytearray(encode_bmp(_noise(4, 4)))
    struct.pack_into("<I", raw, 30, 3)  # BI_BITFIELDS: still gated
    with pytest.raises(NotImplementedError, match="compressed"):
        decode_bmp(bytes(raw))


def _bmp(w, h, bpp, compression, pal, body: bytes) -> bytes:
    data_offset = 54 + len(pal) * 4
    pal_bgra = np.zeros((len(pal), 4), np.uint8)
    pal_bgra[:, [2, 1, 0]] = pal
    return (
        b"BM"
        + struct.pack("<IHHI", data_offset + len(body), 0, 0, data_offset)
        + struct.pack("<IiiHHIIiiII", 40, w, h, 1, bpp, compression, len(body), 0, 0, len(pal), len(pal))
        + pal_bgra.tobytes()
        + body
    )


def test_rle8_runs_absolute_and_escapes():
    """BI_RLE8 (gated until r6): runs, absolute mode (word-aligned),
    end-of-line, delta, end-of-bitmap — checked against the pixels the
    escapes describe."""
    pal = np.array([[0, 0, 0], [255, 0, 0], [0, 255, 0], [0, 0, 255]], np.uint8)
    # image 7x3 (file rows bottom-up). Build row programs:
    body = bytes(
        [
            4, 1,  # row 0 (bottom): 4x index1
            0, 3, 2, 3, 1, 0,  # absolute: 3 literals (2,3,1) + word pad
            0, 0,  # end of line
            2, 2,  # row 1: 2x index2
            0, 2, 3, 1,  # delta: dx=3 dy=1 (rest of row1 + start of row2 stays 0)
            1, 3,  # row 2 at x=5: 1x index3
            0, 1,  # end of bitmap
        ]
    )
    raw = _bmp(7, 3, 8, 1, pal, body)
    w, h, ch, px = decode_bmp(raw)
    assert (w, h, ch) == (7, 3, 3)
    expect_idx = np.zeros((3, 7), np.uint8)
    expect_idx[0] = [1, 1, 1, 1, 2, 3, 1]  # bottom file row
    expect_idx[1, :2] = 2
    expect_idx[2, 5] = 3
    assert np.array_equal(px, pal[expect_idx][::-1])  # top-down output


def test_rle8_matches_imageio(spark):
    """The JVM's BMP reader is the independent oracle for the RLE8
    decode path."""
    pal = np.array([[9, 8, 7], [250, 1, 2], [3, 200, 5], [6, 7, 250]], np.uint8)
    body = bytes([3, 1, 2, 2, 3, 3, 0, 0, 8, 2, 0, 1])  # 2 rows of 8
    raw = _bmp(8, 2, 8, 1, pal, body)
    _w, _h, _ch, mine = decode_bmp(raw)
    jvm = spark._jvm
    img = jvm.javax.imageio.ImageIO.read(jvm.java.io.ByteArrayInputStream(bytearray(raw)))
    assert img is not None
    a = np.array(img.getRGB(0, 0, 8, 2, None, 0, 8), dtype=np.int64).reshape(2, 8)
    ref = np.stack([(a >> 16) & 255, (a >> 8) & 255, a & 255], axis=2).astype(np.uint8)
    assert np.array_equal(mine, ref)


def test_rle4_nibble_runs():
    pal = np.array([[0, 0, 0], [10, 20, 30], [40, 50, 60]], np.uint8)
    # one row, 5 pixels: run of 5 alternating nibbles of 0x12 -> 1,2,1,2,1
    body = bytes([5, 0x12, 0, 0, 0, 1])
    w, h, ch, px = decode_bmp(_bmp(5, 1, 4, 2, pal, body))
    assert (w, h, ch) == (5, 1, 3)
    assert np.array_equal(px[0], pal[[1, 2, 1, 2, 1]])


def test_16bit_x1r5g5b5_decodes():
    # two pixels: pure red (31<<10) and mid gray (16,16,16)
    v = np.array([[31 << 10, (16 << 10) | (16 << 5) | 16]], np.uint16)
    body = v.astype("<u2").tobytes()  # w*2=4 bytes, already 4-aligned
    w, h, ch, px = decode_bmp(_bmp(2, 1, 16, 0, np.zeros((0, 3), np.uint8), body))
    assert (w, h, ch) == (2, 1, 3)
    assert tuple(px[0, 0]) == (255, 0, 0)
    assert tuple(px[0, 1]) == (132, 132, 132)  # (16<<3)|(16>>2)


def test_1bit_and_4bit_uncompressed(spark):
    pal2 = np.array([[0, 0, 0], [255, 255, 255]], np.uint8)
    # 1-bit, 10 px wide: bits 1010101010 + pad -> stride 4 bytes
    rowbits = np.array([1, 0, 1, 0, 1, 0, 1, 0, 1, 0], np.uint8)
    packed = np.packbits(rowbits).tobytes()
    body = packed + bytes(4 - len(packed))
    w, h, ch, px = decode_bmp(_bmp(10, 1, 1, 0, pal2, body))
    assert np.array_equal(px[0], pal2[rowbits])
    # the JVM reader agrees
    jvm = spark._jvm
    raw = _bmp(10, 1, 1, 0, pal2, body)
    img = jvm.javax.imageio.ImageIO.read(jvm.java.io.ByteArrayInputStream(bytearray(raw)))
    a = np.array(img.getRGB(0, 0, 10, 1, None, 0, 10), dtype=np.int64).reshape(1, 10)
    ref = np.stack([(a >> 16) & 255, (a >> 8) & 255, a & 255], axis=2).astype(np.uint8)
    assert np.array_equal(px, ref)
    # 4-bit: indices 0..2 over a 3-color palette
    pal3 = np.array([[1, 2, 3], [4, 5, 6], [7, 8, 9]], np.uint8)
    idx = np.array([0, 1, 2, 1, 0], np.uint8)
    nib = np.zeros(6, np.uint8)
    nib[: len(idx)] = idx
    packed4 = bytes([(nib[i] << 4) | nib[i + 1] for i in range(0, 6, 2)])
    body4 = packed4 + bytes(4 - len(packed4) % 4)
    w, h, ch, px4 = decode_bmp(_bmp(5, 1, 4, 0, pal3, body4))
    assert np.array_equal(px4[0], pal3[idx])


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
