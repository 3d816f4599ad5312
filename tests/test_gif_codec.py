"""From-spec GIF codec tests (LZW, palettes, animation, interlace).

GIF is lossless, so every cross-check is EXACT equality. The
independent oracle is javax.imageio through the session Spark JVM.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from lime_etl_spark.operators.gif_codec import (
    _lzw_decode,
    _lzw_encode,
    decode_gif,
    encode_gif,
)


def _palette_image(h: int, w: int, n_colors: int = 40, seed: int = 3):
    rng = np.random.default_rng(seed)
    pal = rng.integers(0, 256, (n_colors, 3), dtype=np.uint8)
    idx = rng.integers(0, n_colors, (h, w))
    return pal[idx]


# ---------------------------------------------------------------------------
# LZW layer
# ---------------------------------------------------------------------------


def test_lzw_roundtrip_random_indices():
    rng = np.random.default_rng(1)
    for n_sym, n in ((4, 50), (64, 3000), (256, 20000)):
        idx = rng.integers(0, n_sym, n).astype(np.uint8)
        mcs = max(2, (n_sym - 1).bit_length())
        out = _lzw_decode(mcs, _lzw_encode(mcs, idx), n)
        assert np.array_equal(out, idx), (n_sym, n)


def test_lzw_dictionary_reset_path():
    # long low-entropy run forces the dictionary past 4096 → clear code
    idx = np.tile(np.arange(8, dtype=np.uint8), 30000)
    out = _lzw_decode(3, _lzw_encode(3, idx), len(idx))
    assert np.array_equal(out, idx)


def test_lzw_truncated_stream_fails_loudly():
    with pytest.raises(ValueError, match="truncated"):
        _lzw_decode(2, b"", 10)


# ---------------------------------------------------------------------------
# container round-trips
# ---------------------------------------------------------------------------


def test_single_frame_exact_roundtrip():
    px = _palette_image(22, 31)
    w, h, frames = decode_gif(encode_gif(px))
    assert (w, h) == (31, 22) and len(frames) == 1
    assert np.array_equal(frames[0][1], px)


def test_multiframe_delays_and_pixels():
    f1, f2 = _palette_image(10, 12, seed=4), _palette_image(10, 12, seed=5)
    w, h, frames = decode_gif(encode_gif([(40, f1), (120, f2)]))
    assert [d for d, _f in frames] == [40, 120]
    assert np.array_equal(frames[0][1], f1) and np.array_equal(frames[1][1], f2)


def test_too_many_colors_gate():
    rng = np.random.default_rng(0)
    with pytest.raises(NotImplementedError, match="palette"):
        encode_gif(rng.integers(0, 256, (40, 40, 3), dtype=np.uint8))


def test_multi_palette_animation_uses_local_tables():
    """r6 review finding: frames whose COMBINED colors exceed 256 must
    re-encode via per-frame local color tables (legal GIF89a), not
    raise — only a single frame over 256 gates."""
    rng = np.random.default_rng(44)
    pal_a = rng.integers(0, 128, (200, 3), dtype=np.uint8)
    pal_b = rng.integers(128, 256, (200, 3), dtype=np.uint8)
    f1 = pal_a[rng.integers(0, 200, (24, 20))]
    f2 = pal_b[rng.integers(0, 200, (24, 20))]
    raw = encode_gif([(30, f1), (60, f2)])
    assert raw[10] & 0x80 == 0, "multi-palette stream must carry no global table"
    w, h, frames = decode_gif(raw)
    assert (w, h, len(frames)) == (20, 24, 2)
    assert [d for d, _ in frames] == [30, 60]
    assert np.array_equal(frames[0][1], f1)
    assert np.array_equal(frames[1][1], f2)


def test_multi_palette_resize_end_to_end(spark):
    """The failure the review reproduced: resize_images on an animated
    GIF with >256 combined colors must succeed."""
    from pyspark.sql import functions as F

    from lime_etl_spark.operators import multimodal as mm

    rng = np.random.default_rng(45)
    pal_a = rng.integers(0, 128, (180, 3), dtype=np.uint8)
    pal_b = rng.integers(128, 256, (180, 3), dtype=np.uint8)
    f1 = pal_a[rng.integers(0, 180, (24, 24))]
    f2 = pal_b[rng.integers(0, 180, (24, 24))]
    df = spark.createDataFrame(
        [(1, bytearray(encode_gif([(20, f1), (40, f2)])))],
        "media_id long, content binary",
    ).select(
        "media_id",
        F.lit("image").alias("media_type"),
        "content",
        F.struct(
            F.lit(24).alias("width"),
            F.lit(24).alias("height"),
            F.lit(3).alias("channels"),
            F.lit(None).cast("int").alias("sample_rate"),
            F.lit(None).cast("int").alias("duration_ms"),
            F.lit("gif").alias("codec"),
        ).alias("meta"),
    )
    out = bytes(mm.resize_images(df, 8, 8).collect()[0]["content"])
    _w, _h, frames = decode_gif(out)
    assert len(frames) == 2 and [d for d, _ in frames] == [20, 40]


def test_not_a_gif_raises():
    with pytest.raises(ValueError, match="not a GIF"):
        decode_gif(b"BM000000")


# ---------------------------------------------------------------------------
# hand-assembled streams: interlace and transparency (my encoder emits
# neither, so these bytes are built directly from the spec — a
# symmetric codec bug cannot satisfy them)
# ---------------------------------------------------------------------------


def _hand_gif(px: np.ndarray, interlace: bool = False) -> bytes:
    h, w = px.shape[:2]
    colors = np.unique(px.reshape(-1, 3), axis=0)
    lut = {tuple(c): i for i, c in enumerate(colors.tolist())}
    bits = max(1, (len(colors) - 1).bit_length())
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | (bits - 1), 0, 0)
    out += colors.astype(np.uint8).tobytes() + bytes(3 * ((1 << bits) - len(colors)))
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0x40 if interlace else 0)
    idx = np.array([lut[tuple(p)] for p in px.reshape(-1, 3).tolist()], np.uint8)
    idx = idx.reshape(h, w)
    if interlace:  # store rows in pass order 0,8.. / 4,12.. / 2,6.. / 1,3..
        order = (
            list(range(0, h, 8))
            + list(range(4, h, 8))
            + list(range(2, h, 4))
            + list(range(1, h, 2))
        )
        idx = idx[order]
    mcs = max(2, bits)
    out.append(mcs)
    data = _lzw_encode(mcs, idx.reshape(-1))
    for i in range(0, len(data), 255):
        out.append(len(data[i : i + 255]))
        out += data[i : i + 255]
    out += b"\x00\x3b"
    return bytes(out)


def test_interlaced_image_deinterlaces_exactly():
    px = _palette_image(13, 9, n_colors=16, seed=8)
    plain = decode_gif(_hand_gif(px, interlace=False))[2][0][1]
    inter = decode_gif(_hand_gif(px, interlace=True))[2][0][1]
    assert np.array_equal(plain, px) and np.array_equal(inter, px)


def test_transparency_keeps_prior_canvas():
    f1 = _palette_image(8, 8, n_colors=7, seed=9)
    f2 = f1.copy()
    f2[:4] = f2[:4] // 2  # second frame changes the top half only
    raw = bytearray(encode_gif([(10, f1), (10, f2)]))
    # locate frame 2's GCE (the second 0x21 0xF9 block) and mark the
    # palette index of f2's bottom-left pixel transparent
    gce2 = raw.index(b"\x21\xf9", raw.index(b"\x21\xf9") + 2)
    w, h, frames0 = decode_gif(bytes(raw))
    pal = np.unique(np.concatenate([f1.reshape(-1, 3), f2.reshape(-1, 3)]), axis=0)
    lut = {tuple(c): i for i, c in enumerate(pal.tolist())}
    t_ix = lut[tuple(f2[7, 0].tolist())]
    raw[gce2 + 3] |= 0x01  # transparent-color flag
    raw[gce2 + 6] = t_ix  # transparent index
    _w, _h, frames = decode_gif(bytes(raw))
    out2 = frames[1][1]
    # the transparent color's pixels show frame 1 underneath...
    mask = np.all(f2 == pal[t_ix], axis=2)
    assert mask.any()
    assert np.array_equal(out2[mask], f1[mask])
    # ...and everything else is frame 2
    assert np.array_equal(out2[~mask], f2[~mask])


def test_disposal_restore_to_previous():
    """GIF89a disposal 3 (gated until r6): after a frame renders, its
    rectangle reverts to the PRE-render canvas — proven by a fully
    transparent frame 3 compositing to frame 1, not frame 2."""
    f1 = _palette_image(8, 8, n_colors=5, seed=1)
    f2 = _palette_image(8, 8, n_colors=5, seed=2)
    solid = np.full((8, 8, 3), 7, np.uint8)
    raw = bytearray(encode_gif([(10, f1), (10, f2), (10, solid)]))
    pal = np.unique(
        np.concatenate([f.reshape(-1, 3) for f in (f1, f2, solid)]), axis=0
    )
    lut = {tuple(c): i for i, c in enumerate(pal.tolist())}
    g1 = raw.index(b"\x21\xf9")
    g2 = raw.index(b"\x21\xf9", g1 + 2)
    g3 = raw.index(b"\x21\xf9", g2 + 2)
    raw[g2 + 3] |= 3 << 2  # frame 2 disposal: restore to previous
    raw[g3 + 3] |= 0x01  # frame 3: fully transparent
    raw[g3 + 6] = lut[(7, 7, 7)]
    _w, _h, frames = decode_gif(bytes(raw))
    assert np.array_equal(frames[0][1], f1)
    assert np.array_equal(frames[1][1], f2)
    assert np.array_equal(frames[2][1], f1), "canvas must revert to pre-frame-2 state"


# ---------------------------------------------------------------------------
# independent oracle: javax.imageio
# ---------------------------------------------------------------------------


def _imageio_read(spark, data: bytes) -> np.ndarray:
    jvm = spark._jvm
    img = jvm.javax.imageio.ImageIO.read(jvm.java.io.ByteArrayInputStream(bytearray(data)))
    assert img is not None
    w, h = img.getWidth(), img.getHeight()
    a = np.array(img.getRGB(0, 0, w, h, None, 0, w), dtype=np.int64).reshape(h, w)
    return np.stack([(a >> 16) & 255, (a >> 8) & 255, a & 255], axis=2).astype(np.uint8)


def test_imageio_reads_my_gif_exactly(spark):
    px = _palette_image(22, 31)
    assert np.array_equal(_imageio_read(spark, encode_gif(px)), px)


def test_my_decoder_reads_imageio_gif_exactly(spark):
    px = _palette_image(22, 31)
    jvm = spark._jvm
    img = jvm.javax.imageio.ImageIO.read(
        jvm.java.io.ByteArrayInputStream(bytearray(encode_gif(px)))
    )
    bos = jvm.java.io.ByteArrayOutputStream()
    assert jvm.javax.imageio.ImageIO.write(img, "gif", bos)
    theirs = bytes(bos.toByteArray())
    assert theirs.startswith(b"GIF") and theirs != encode_gif(px)
    _w, _h, frames = decode_gif(theirs)
    assert np.array_equal(frames[0][1], px)


def test_gif_info_header_walk_matches_decode():
    from lime_etl_spark.operators.gif_codec import gif_info

    f1, f2 = _palette_image(10, 12, seed=4), _palette_image(10, 12, seed=5)
    raw = encode_gif([(40, f1), (120, f2)])
    assert gif_info(raw) == (12, 10, 2, 160)
    single = encode_gif(f1)
    assert gif_info(single) == (12, 10, 1, 0)
    inter = _hand_gif(_palette_image(13, 9, n_colors=16, seed=8), interlace=True)
    assert gif_info(inter) == (9, 13, 1, 0)


def test_gif_info_last_gce_wins_like_decode():
    from lime_etl_spark.operators.gif_codec import gif_info

    f1 = _palette_image(6, 6, n_colors=4, seed=2)
    raw = bytearray(encode_gif([(40, f1), (90, f1)]))
    # plant an EXTRA GCE before frame 1: decode_gif keeps the last one
    first_gce = raw.index(b"\x21\xf9")
    extra = bytes(raw[first_gce : first_gce + 8])  # copy of a full GCE block
    planted = bytes(raw[:first_gce]) + extra + bytes(raw[first_gce:])
    w, h, frames = decode_gif(planted)
    assert gif_info(planted)[3] == sum(d for d, _f in frames)
